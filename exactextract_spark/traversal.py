"""Exact per-cell covered-polygon reassembly (the reference's
"left-hand rings" construction, /root/reference/src/traversal_areas.cpp:94-258,
perimeter_distance.cpp:20-66, cell.cpp:186-190).

Given a cell box and the portions of a polygon's rings that pass
through it ("traversals": entry point on the box boundary → path →
exit point, plus rings fully contained in the box), reassemble the
covered region as proper polygons:

- each traversal chain is parameterized by the perimeter distance of
  its endpoints (measured from the bottom-left corner, increasing up
  the left edge, then along the top, down the right, and back along
  the bottom — the reference convention);
- starting from any unvisited chain, the next chain is the one whose
  entry point is nearest COUNTER-clockwise (decreasing measure) from
  the current exit point; the four box corners participate as
  single-point chains, so the walk picks up box-boundary arcs between
  an exit and the next entry.  The result is a set of CCW rings
  bounding the covered region (the "left-hand rule": polygon interior
  lies left of the ring direction);
- closed rings fully inside the box keep their own orientation (CCW
  shell / CW hole);
- holes with no shell mean the box boundary itself is the shell.

Unlike subdivide's former Sutherland–Hodgman clip, this produces a
true MultiPolygon when a concave polygon exits and re-enters the cell
(no degenerate bridging edges) — matching the reference's WKT output
(test_traversal_areas.cpp goldens transcribed in
tests/test_traversal.py).

The traversal producer here is original: rings are clipped against
the box with a parametric (Liang–Barsky-style) segment clip whose
crossing points are snapped exactly onto the box boundary so the
perimeter parameterization's exact ==-comparisons hold.
"""

from __future__ import annotations

import numpy as np

__all__ = ["perimeter_distance", "box_traversals", "visit_rings",
           "left_hand_rings", "covered_polygons", "polygons_wkt",
           "ring_area"]


def perimeter_distance(x0: float, y0: float, x1: float, y1: float,
                       x: float, y: float) -> float:
    """Perimeter measure of a boundary point: 0 at the bottom-left
    corner, increasing up the left edge → top → right → bottom
    (reference perimeter_distance.cpp:20-44; note this direction is
    CLOCKWISE in x/y, so CCW travel means decreasing measure)."""
    if x == x0:
        return y - y0
    if y == y1:
        return (y1 - y0) + (x - x0)
    if x == x1:
        return (x1 - x0) + (y1 - y0) + (y1 - y)
    if y == y0:
        return (x1 - x0) + 2.0 * (y1 - y0) + (x1 - x)
    raise ValueError(f"point ({x}, {y}) not on box boundary")


def _ccw_distance(m_exit: float, m_entry: float, perimeter: float) -> float:
    """CCW perimeter distance from an exit measure to an entry measure
    (reference perimeter_distance.cpp:58-66)."""
    if m_entry <= m_exit:
        return m_exit - m_entry
    return perimeter + m_exit - m_entry


def _clip_segment(ax, ay, bx, by, x0, y0, x1, y1):
    """Clip segment a→b to the closed box.  Returns
    ((cx0, cy0), (cx1, cy1), t_lo, t_hi) with crossing coordinates
    snapped exactly onto the box boundary, or None when the segment
    misses the box (or only grazes it at a single parameter value)."""
    dx = bx - ax
    dy = by - ay
    if dx == 0.0:
        if ax < x0 or ax > x1:
            return None
        t_xlo, t_xhi = 0.0, 1.0
        b_xlo = b_xhi = None
    else:
        ta = (x0 - ax) / dx
        tb = (x1 - ax) / dx
        if ta <= tb:
            t_xlo, t_xhi, b_xlo, b_xhi = ta, tb, x0, x1
        else:
            t_xlo, t_xhi, b_xlo, b_xhi = tb, ta, x1, x0
    if dy == 0.0:
        if ay < y0 or ay > y1:
            return None
        t_ylo, t_yhi = 0.0, 1.0
        b_ylo = b_yhi = None
    else:
        ta = (y0 - ay) / dy
        tb = (y1 - ay) / dy
        if ta <= tb:
            t_ylo, t_yhi, b_ylo, b_yhi = ta, tb, y0, y1
        else:
            t_ylo, t_yhi, b_ylo, b_yhi = tb, ta, y1, y0

    t_lo = max(t_xlo, t_ylo, 0.0)
    t_hi = min(t_xhi, t_yhi, 1.0)
    if t_hi <= t_lo:
        return None

    def _pt(t, snap_x, snap_y):
        px = snap_x if snap_x is not None else ax + t * dx
        py = snap_y if snap_y is not None else ay + t * dy
        # clamp: interpolation on the free axis can land an ulp outside
        return (min(max(px, x0), x1), min(max(py, y0), y1))

    p_lo = _pt(t_lo,
               b_xlo if (t_lo == t_xlo and dx != 0.0 and t_lo > 0.0) else None,
               b_ylo if (t_lo == t_ylo and dy != 0.0 and t_lo > 0.0) else None)
    p_hi = _pt(t_hi,
               b_xhi if (t_hi == t_xhi and dx != 0.0 and t_hi < 1.0) else None,
               b_yhi if (t_hi == t_yhi and dy != 0.0 and t_hi < 1.0) else None)
    return p_lo, p_hi, t_lo, t_hi


def box_traversals(ring: np.ndarray, x0: float, y0: float,
                   x1: float, y1: float):
    """Split one closed ring into its traversals of the box.

    Returns (chains, closed): ``chains`` is a list of coordinate lists
    whose first/last points lie exactly on the box boundary; ``closed``
    is [ring] when the ring lies entirely inside the (closed) box."""
    xs, ys = ring[:, 0], ring[:, 1]
    inside = (xs >= x0) & (xs <= x1) & (ys >= y0) & (ys <= y1)
    if inside.all():
        return [], [[(float(x), float(y)) for x, y in ring]]
    chains: list[list[tuple[float, float]]] = []
    cur: list[tuple[float, float]] | None = None
    # candidate pre-filter (vectorized): an edge can only contribute
    # when an endpoint is inside or its bbox overlaps the box.  A
    # skipped edge never carries an open chain (an open `cur` implies
    # the previous edge ended inside, i.e. this edge's start is
    # inside), so iterating only candidates is behavior-identical —
    # and turns a 20k-edge coastline ring into a handful of loop
    # iterations per cell instead of 20k.
    eax, eay = xs[:-1], ys[:-1]
    ebx, eby = xs[1:], ys[1:]
    overlap = ((np.maximum(eax, ebx) >= x0) & (np.minimum(eax, ebx) <= x1) &
               (np.maximum(eay, eby) >= y0) & (np.minimum(eay, eby) <= y1))
    cand = np.flatnonzero(inside[:-1] | inside[1:] | overlap)
    for i in cand:
        ax, ay, bx, by = float(xs[i]), float(ys[i]), float(xs[i + 1]), float(ys[i + 1])
        a_in, b_in = bool(inside[i]), bool(inside[i + 1])
        if a_in and b_in:
            if cur is None:
                cur = [(ax, ay)]
            cur.append((bx, by))
            continue
        seg = _clip_segment(ax, ay, bx, by, x0, y0, x1, y1)
        if seg is None:
            if cur is not None:
                chains.append(cur)
                cur = None
            continue
        p_lo, p_hi, t_lo, t_hi = seg
        if a_in:
            # exits the box at p_hi
            if cur is None:
                cur = [(ax, ay)]
            cur.append(p_hi)
            chains.append(cur)
            cur = None
        elif b_in:
            # enters the box at p_lo
            if cur is not None:
                chains.append(cur)
            cur = [p_lo, (bx, by)]
        else:
            # passes through
            if cur is not None:
                chains.append(cur)
                cur = None
            chains.append([p_lo, p_hi])
    if cur is not None:
        # the ring wraps: the open tail continues into the first chain
        if chains and inside[0] and chains[0][0] == (float(xs[0]), float(ys[0])):
            chains[0] = cur[:-1] + chains[0]
        else:
            chains.append(cur)
    # drop degenerate chains (single unique coordinate)
    out = []
    for c in chains:
        if any(p != c[0] for p in c[1:]):
            out.append(c)
    return out, []


def ring_area(coords) -> float:
    """Signed shoelace area of a closed coordinate list (CCW > 0)."""
    a = 0.0
    for i in range(len(coords) - 1):
        a += coords[i][0] * coords[i + 1][1] - coords[i + 1][0] * coords[i][1]
    return 0.5 * a


class _Chain:
    __slots__ = ("start", "stop", "coords", "visited")

    def __init__(self, start, stop, coords):
        self.start = start
        self.stop = stop
        self.coords = coords
        self.visited = False


def visit_rings(box, coord_lists):
    """Identify the CCW rings formed by the coordinate lists and the
    box boundary (reference traversal_areas.cpp:94-158).  Yields
    (coords, is_ccw) pairs; closed input rings keep their own
    orientation.  Returns (rings, found_any)."""
    x0, y0, x1, y1 = box
    rings: list[tuple[list, bool]] = []
    chains: list[_Chain] = []
    found = False
    for coords in coord_lists:
        if not any(p != coords[0] for p in coords[1:]):
            continue
        if coords[0] == coords[-1]:
            found = True
            rings.append((coords, ring_area(coords) > 0.0))
        else:
            chains.append(_Chain(
                perimeter_distance(x0, y0, x1, y1, *coords[0]),
                perimeter_distance(x0, y0, x1, y1, *coords[-1]),
                coords))

    height = y1 - y0
    width = x1 - x0
    perimeter = 2.0 * (height + width)

    # box corners as single-point chains
    chains.append(_Chain(0.0, 0.0, [(x0, y0)]))
    chains.append(_Chain(height, height, [(x0, y1)]))
    chains.append(_Chain(height + width, height + width, [(x1, y1)]))
    chains.append(_Chain(2.0 * height + width, 2.0 * height + width, [(x1, y0)]))

    def next_chain(cur, kill):
        best = None
        best_d = float("inf")
        for cand in chains:
            if cand.visited and cand is not kill:
                continue
            d = _ccw_distance(cur.stop, cand.start, perimeter)
            if d < best_d:
                best_d = d
                best = cand
        return best

    for chain_ref in chains:
        if chain_ref.visited or len(chain_ref.coords) == 1:
            continue
        coords: list[tuple[float, float]] = []
        chain = chain_ref
        while True:
            chain.visited = True
            coords.extend(chain.coords)
            chain = next_chain(chain, chain_ref)
            if chain is chain_ref:
                break
        coords.append(coords[0])
        if any(p != coords[0] for p in coords[1:]):
            found = True
            rings.append((coords, True))
    return rings, found


def _point_in_ring(x, y, coords) -> bool:
    """Even-odd test (hole-to-shell assignment)."""
    inside = False
    for i in range(len(coords) - 1):
        (ax, ay), (bx, by) = coords[i], coords[i + 1]
        if (ay > y) != (by > y) and x < (bx - ax) * (y - ay) / (by - ay) + ax:
            inside = not inside
    return inside


def left_hand_rings(box, coord_lists):
    """Assemble the covered region inside ``box`` bounded by the
    traversals/rings of ``coord_lists`` into polygons — the reference
    left_hand_rings (traversal_areas.cpp:191-256).

    Returns a list of polygons, each ``[shell, hole, ...]`` coordinate
    lists; an empty list when the covered region is empty.  Raises
    ValueError when no ring can be formed (coverage is either 0 or
    100% and cannot be determined from the traversals alone)."""
    rings, found = visit_rings(box, coord_lists)
    if not found:
        raise ValueError(
            "Cannot determine coverage fraction (it is either 0 or 100%)")
    shells = []
    holes = []
    for coords, is_ccw in rings:
        if ring_area(coords) == 0.0:
            continue
        (shells if is_ccw else holes).append(coords)

    x0, y0, x1, y1 = box
    if not shells and holes:
        # only holes: the box boundary is the shell (CCW)
        shells.append([(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)])

    if not shells:
        return []
    if not holes:
        return [[s] for s in shells]
    if len(shells) == 1:
        return [[shells[0], *holes]]
    # multiple shells + holes: assign each hole to the shell containing
    # one of its vertices (reference uses GEOSPolygonize_valid).  A
    # vertex lying exactly on a shell edge makes the even-odd test
    # indeterminate, so try successive vertices; if NO vertex of the
    # hole tests inside any shell, raise so the caller's
    # Sutherland–Hodgman fallback kicks in instead of silently
    # dropping the hole (which would overstate the covered area).
    polys = [[s] for s in shells]
    for h in holes:
        owner = None
        for hx, hy in h[:-1]:
            for poly in polys:
                if _point_in_ring(hx, hy, poly[0]):
                    owner = poly
                    break
            if owner is not None:
                break
        if owner is None:
            raise ValueError(
                "cannot assign hole to a shell (every hole vertex sits "
                "on a shell boundary)")
        owner.append(h)
    return polys


def covered_polygons(geom_rings, x0, y0, x1, y1):
    """Covered polygons of a cell box for an areal geometry given as a
    list of orientation-normalized rings (geom.Geometry.rings).
    Returns a polygon list as in left_hand_rings."""
    coord_lists = []
    for ring in geom_rings:
        chains, closed = box_traversals(ring, x0, y0, x1, y1)
        coord_lists.extend(chains)
        coord_lists.extend(closed)
    return left_hand_rings((x0, y0, x1, y1), coord_lists)


def polygons_wkt(polys) -> str:
    """WKT of a polygon list (POLYGON / MULTIPOLYGON)."""
    def _poly(rings):
        return "(" + ", ".join(
            "(" + ", ".join(f"{x:.17g} {y:.17g}" for x, y in r) + ")"
            for r in rings) + ")"
    if not polys:
        return "POLYGON EMPTY"
    if len(polys) == 1:
        return "POLYGON " + _poly(polys[0])
    return "MULTIPOLYGON (" + ", ".join(_poly(p) for p in polys) + ")"
