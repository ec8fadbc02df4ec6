"""Minimal geometry model + WKT parser (no GEOS/shapely dependency).

Re-expresses the reference's Feature geometry surface
(/root/reference/src/feature.h:25-235, geometry via GEOS) for a pure
numpy engine.  Supported, matching the reference's kernel
(/root/reference/src/raster_cell_intersection.cpp:133-155, 269-279):

- POLYGON / MULTIPOLYGON        -> areal (coverage fraction per cell)
- LINESTRING / MULTILINESTRING  -> linear (traversal length per cell)
- GEOMETRYCOLLECTION            -> recursed; mixed areal+linear rejected
- POINT / MULTIPOINT            -> rejected ("unsupported geometry")

A parsed geometry is a ``Geometry`` with ``kind`` in {"areal","linear"}
and ``rings``: a list of (N,2) float64 arrays.  For areal geometries the
ring orientation is normalized so that accumulating the signed scanline
area directly yields exterior-minus-holes coverage (exterior rings CCW
in x/y, holes CW), mirroring the reference's normalization at
raster_cell_intersection.cpp:459-488.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

__all__ = ["Geometry", "parse_wkt", "ring_signed_area", "bbox_of"]


@dataclass
class Geometry:
    kind: str  # "areal" | "linear"
    # areal: each element is one ring (closed, orientation-normalized:
    #   exterior CCW => positive signed area; holes CW => negative).
    # linear: each element is one open linestring path.
    rings: list = field(default_factory=list)
    _bbox: tuple | None = None
    _is_rect: bool | None = None

    @property
    def bbox(self):
        if self._bbox is None:
            self._bbox = bbox_of(self.rings)
        return self._bbox

    def is_rectangle(self) -> bool:
        """Axis-aligned single-rectangle test -> rectangle fast path
        (cf. reference raster_cell_intersection.cpp:425-428).  Cached:
        one zone is evaluated against many tiles."""
        if self._is_rect is None:
            self._is_rect = self._compute_is_rect()
        return self._is_rect

    def _compute_is_rect(self) -> bool:
        if self.kind != "areal" or len(self.rings) != 1:
            return False
        r = self.rings[0]
        if len(r) != 5:
            return False
        xs, ys = r[:, 0], r[:, 1]
        if xs[0] != xs[4] or ys[0] != ys[4]:
            return False
        # consecutive edges alternate horizontal/vertical
        dx = np.diff(xs)
        dy = np.diff(ys)
        return bool(np.all((dx == 0) | (dy == 0)) and np.sum(dx != 0) == 2 and np.sum(dy != 0) == 2)


def ring_signed_area(ring: np.ndarray) -> float:
    """Shoelace signed area in x/y coordinates (CCW positive)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def bbox_of(rings) -> tuple[float, float, float, float]:
    if not rings:
        # empty geometry: an inverted bbox makes every tile-range
        # predicate false, so the zone flows through to the final left
        # join and gets empty-stat defaults (like the reference writing
        # a row for every feature)
        return float("inf"), float("inf"), float("-inf"), float("-inf")
    xmin = min(float(r[:, 0].min()) for r in rings)
    xmax = max(float(r[:, 0].max()) for r in rings)
    ymin = min(float(r[:, 1].min()) for r in rings)
    ymax = max(float(r[:, 1].max()) for r in rings)
    return xmin, ymin, xmax, ymax


_NUM = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"
_COORD_RE = re.compile(_NUM)


def _parse_coord_seq(body: str) -> np.ndarray:
    nums = [float(t) for t in _COORD_RE.findall(body)]
    if len(nums) % 2 != 0:
        raise ValueError(f"odd coordinate count in WKT fragment: {body[:80]}")
    return np.asarray(nums, dtype=np.float64).reshape(-1, 2)


def _split_top_level(body: str) -> list[str]:
    """Split a comma-separated list at paren depth 0."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(body[start:i])
            start = i + 1
    parts.append(body[start:])
    return [p.strip() for p in parts if p.strip()]


def _strip_outer_parens(s: str) -> str:
    s = s.strip()
    if not (s.startswith("(") and s.endswith(")")):
        raise ValueError(f"expected parenthesized WKT body: {s[:80]}")
    return s[1:-1]


def _normalize_polygon_rings(rings: list[np.ndarray]) -> list[np.ndarray]:
    out = []
    for i, ring in enumerate(rings):
        if len(ring) < 4:
            raise ValueError("polygon ring with < 4 points")
        if ring[0, 0] != ring[-1, 0] or ring[0, 1] != ring[-1, 1]:
            ring = np.vstack([ring, ring[:1]])
        a = ring_signed_area(ring)
        want_ccw = i == 0  # exterior CCW, holes CW
        if (a < 0) == want_ccw:
            ring = ring[::-1].copy()
        out.append(ring)
    return out


def _head(s: str):
    m = re.match(r"\s*([A-Za-z]+)\s*", s)
    if not m:
        raise ValueError(f"bad WKT: {s[:80]}")
    return m.group(1).upper(), s[m.end():].strip()


def parse_wkt(wkt: str) -> Geometry:
    tag, rest = _head(wkt)
    if rest.upper().startswith("EMPTY"):
        kind = "linear" if "LINESTRING" in tag else "areal"
        return Geometry(kind=kind, rings=[])
    if tag == "POLYGON":
        body = _strip_outer_parens(rest)
        rings = [_parse_coord_seq(p) for p in _split_top_level(body)]
        return Geometry("areal", _normalize_polygon_rings(rings))
    if tag == "MULTIPOLYGON":
        body = _strip_outer_parens(rest)
        rings: list[np.ndarray] = []
        for poly in _split_top_level(body):
            pb = _strip_outer_parens(poly)
            rings.extend(_normalize_polygon_rings([_parse_coord_seq(p) for p in _split_top_level(pb)]))
        return Geometry("areal", rings)
    if tag == "LINESTRING":
        body = _strip_outer_parens(rest)
        return Geometry("linear", [_parse_coord_seq(body)])
    if tag == "MULTILINESTRING":
        body = _strip_outer_parens(rest)
        return Geometry("linear", [_parse_coord_seq(_strip_outer_parens(p) if p.startswith("(") else p)
                                   for p in _split_top_level(body)])
    if tag == "GEOMETRYCOLLECTION":
        body = _strip_outer_parens(rest)
        kinds, rings = set(), []
        for part in _split_top_level(body):
            g = parse_wkt(part)
            kinds.add(g.kind)
            rings.extend(g.rings)
        if len(kinds) > 1:
            # reference rejects mixed areal/linear collections
            # (raster_cell_intersection.cpp:269-279)
            raise ValueError("GeometryCollection mixing areal and linear parts is unsupported")
        return Geometry(kinds.pop() if kinds else "areal", rings)
    raise ValueError(f"unsupported geometry type: {tag}")
