"""Differential testing: the scanline kernel vs an independent,
obviously-correct oracle — per-cell Sutherland–Hodgman polygon clipping
+ shoelace area (O(cells x verts), the naive algorithm the reference's
background docs contrast against).  Any bug in the edge-splitting /
suffix-fill machinery shows up as a per-cell mismatch."""

import numpy as np
import pytest

from exactextract_spark.geom import parse_wkt, ring_signed_area
from exactextract_spark.kernel import cell_lengths, coverage_fraction


# ---------------------------------------------------------------- oracle --
def _clip_halfplane(pts, inside, intersect):
    out = []
    n = len(pts)
    for i in range(n):
        cur, nxt = pts[i], pts[(i + 1) % n]
        cin, nin = inside(cur), inside(nxt)
        if cin:
            out.append(cur)
            if not nin:
                out.append(intersect(cur, nxt))
        elif nin:
            out.append(intersect(cur, nxt))
    return out


def _clip_ring_rect(ring, x0, y0, x1, y1):
    pts = [tuple(p) for p in ring[:-1]]
    for side in range(4):
        if not pts:
            return []
        if side == 0:
            inside = lambda p: p[0] >= x0
            def intersect(a, b, c=x0, ax=0):
                t = (c - a[ax]) / (b[ax] - a[ax])
                return (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))
        elif side == 1:
            inside = lambda p: p[0] <= x1
            def intersect(a, b, c=x1, ax=0):
                t = (c - a[ax]) / (b[ax] - a[ax])
                return (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))
        elif side == 2:
            inside = lambda p: p[1] >= y0
            def intersect(a, b, c=y0, ax=1):
                t = (c - a[ax]) / (b[ax] - a[ax])
                return (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))
        else:
            inside = lambda p: p[1] <= y1
            def intersect(a, b, c=y1, ax=1):
                t = (c - a[ax]) / (b[ax] - a[ax])
                return (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))
        pts = _clip_halfplane(pts, inside, intersect)
    return pts


def _shoelace(pts):
    if len(pts) < 3:
        return 0.0
    a = 0.0
    for i in range(len(pts)):
        x0c, y0c = pts[i]
        x1c, y1c = pts[(i + 1) % len(pts)]
        a += x0c * y1c - x1c * y0c
    return 0.5 * a


def coverage_oracle(geom, xmin, ymax, dx, dy, nrows, ncols):
    out = np.zeros((nrows, ncols))
    for r in range(nrows):
        for c in range(ncols):
            cx0 = xmin + c * dx
            cy1 = ymax - r * dy
            area = 0.0
            for ring in geom.rings:
                clipped = _clip_ring_rect(ring, cx0, cy1 - dy, cx0 + dx, cy1)
                area += _shoelace(clipped)
            out[r, c] = area / (dx * dy)
    return out


def _star(rng, n, cx, cy, rmax):
    ang = (np.arange(n) + rng.uniform(0.05, 0.95, n)) * (2 * np.pi / n)
    rad = rng.uniform(0.3, rmax, n)
    xs = cx + rad * np.cos(ang)
    ys = cy + rad * np.sin(ang)
    pts = ", ".join(f"{x} {y}" for x, y in zip(xs, ys))
    return f"({pts}, {xs[0]} {ys[0]})"


# ---------------------------------------------------------------- tests --
def test_differential_random_polygons():
    rng = np.random.default_rng(42)
    for case in range(40):
        n = int(rng.integers(4, 14))
        wkt = f"POLYGON ({_star(rng, n, rng.uniform(1, 7), rng.uniform(1, 7), 4.0)})"
        g = parse_wkt(wkt)
        got = coverage_fraction(g, 0, 8, 1, 1, 8, 8).astype(np.float64)
        want = np.clip(coverage_oracle(g, 0, 8, 1, 1, 8, 8), 0, 1)
        np.testing.assert_allclose(got, want, atol=2e-7, err_msg=wkt)


def test_differential_polygons_with_holes():
    rng = np.random.default_rng(7)
    for case in range(15):
        outer = _star(rng, int(rng.integers(5, 10)), 4, 4, 3.8)
        hole = _star(rng, int(rng.integers(4, 7)), 4, 4, 1.2)
        g = parse_wkt(f"POLYGON ({outer}, {hole})")
        got = coverage_fraction(g, 0, 8, 1, 1, 8, 8).astype(np.float64)
        want = np.clip(coverage_oracle(g, 0, 8, 1, 1, 8, 8), 0, 1)
        np.testing.assert_allclose(got, want, atol=2e-7)


def test_differential_fractional_grid():
    rng = np.random.default_rng(3)
    for case in range(10):
        wkt = f"POLYGON ({_star(rng, int(rng.integers(4, 9)), 1.1, 0.9, 0.8)})"
        g = parse_wkt(wkt)
        got = coverage_fraction(g, -0.3, 2.1, 0.35, 0.25, 9, 8).astype(np.float64)
        want = np.clip(coverage_oracle(g, -0.3, 2.1, 0.35, 0.25, 9, 8), 0, 1)
        np.testing.assert_allclose(got, want, atol=3e-7)


def _seg_len_in_cell(x0, y0, x1, y1, cx0, cy0, cx1, cy1):
    # param clip of segment to rect
    t0, t1 = 0.0, 1.0
    dx, dy = x1 - x0, y1 - y0
    for p, q in ((-dx, x0 - cx0), (dx, cx1 - x0), (-dy, y0 - cy0), (dy, cy1 - y0)):
        if p == 0:
            if q < 0:
                return 0.0
            continue
        t = q / p
        if p < 0:
            t0 = max(t0, t)
        else:
            t1 = min(t1, t)
    if t1 <= t0:
        return 0.0
    return (t1 - t0) * np.hypot(dx, dy)


def test_differential_lines():
    rng = np.random.default_rng(11)
    for case in range(25):
        n = int(rng.integers(2, 8))
        xs = rng.uniform(-1, 9, n)
        ys = rng.uniform(-1, 9, n)
        pts = ", ".join(f"{x} {y}" for x, y in zip(xs, ys))
        g = parse_wkt(f"LINESTRING ({pts})")
        got = cell_lengths(g, 0, 8, 1, 1, 8, 8).astype(np.float64)
        want = np.zeros((8, 8))
        for i in range(n - 1):
            for r in range(8):
                for c in range(8):
                    want[r, c] += _seg_len_in_cell(
                        xs[i], ys[i], xs[i + 1], ys[i + 1],
                        c, 8 - r - 1, c + 1, 8 - r)
        np.testing.assert_allclose(got, want, atol=1e-5)
