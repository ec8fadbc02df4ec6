"""Property-based fuzzing (hypothesis): WKT parser round-trips, grid
algebra invariants, kernel conservation on arbitrary simple polygons."""

import numpy as np
from hypothesis import given, settings, strategies as st

from exactextract_spark.geom import parse_wkt, ring_signed_area
from exactextract_spark.grid import RasterGrid
from exactextract_spark.kernel import coverage_fraction
from exactextract_spark.ops import parse_op

coord = st.floats(min_value=-1e4, max_value=1e4, allow_nan=False,
                  allow_infinity=False)


@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=12),
       st.sampled_from(["", " ", "  "]))
@settings(max_examples=200, deadline=None)
def test_wkt_polygon_roundtrip_bbox(pts, pad):
    body = ",".join(f"{pad}{x} {y}" for x, y in pts)
    wkt = f"POLYGON (({body}, {pts[0][0]} {pts[0][1]}))"
    g = parse_wkt(wkt)
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    assert g.bbox == (min(xs), min(ys), max(xs), max(ys))
    assert g.kind == "areal"
    # exterior normalized CCW — up to float noise for degenerate
    # (zero-area) rings, where the shoelace sign is not stable
    scale = max(1.0, max(abs(v) for p in pts for v in p)) ** 2
    assert ring_signed_area(g.rings[0]) >= -1e-12 * scale


@given(st.floats(0.001, 1000), st.floats(0.001, 1000),
       st.integers(1, 500), st.integers(1, 500),
       st.floats(-1e6, 1e6), st.floats(-1e6, 1e6))
@settings(max_examples=200, deadline=None)
def test_grid_cell_roundtrip(dx, dy, nr, nc, x0, y0):
    g = RasterGrid(x0, y0, x0 + nc * dx, y0 + nr * dy, dx, dy)
    assert g.nrows == nr and g.ncols == nc
    r = min(nr - 1, nr // 2)
    c = min(nc - 1, nc // 3)
    assert g.row_for_y(g.y_for_row(r)) == r
    assert g.col_for_x(g.x_for_col(c)) == c
    assert g.cell_id(r, c) == r * nc + c


@given(st.integers(4, 10), st.integers(0, 10 ** 6))
@settings(max_examples=100, deadline=None)
def test_kernel_conservation_fuzz(n, seed):
    rng = np.random.default_rng(seed)
    ang = (np.arange(n) + rng.uniform(0.05, 0.95, n)) * (2 * np.pi / n)
    rad = rng.uniform(0.3, 3.5, n)
    xs = 5 + rad * np.cos(ang)
    ys = 5 + rad * np.sin(ang)
    pts = ", ".join(f"{x} {y}" for x, y in zip(xs, ys))
    g = parse_wkt(f"POLYGON (({pts}, {xs[0]} {ys[0]}))")
    cov = coverage_fraction(g, 0, 10, 1, 1, 10, 10).astype(np.float64)
    assert cov.min() >= 0 and cov.max() <= 1
    assert cov.sum() == np.float64(cov.sum())  # no NaN
    np.testing.assert_allclose(cov.sum(), abs(ring_signed_area(g.rings[0])),
                               rtol=1e-5)


@given(st.sampled_from(["count", "sum", "mean", "variety", "median"]),
       st.floats(0.01, 1.0),
       st.sampled_from(["fraction", "none", "area_cartesian"]))
@settings(max_examples=100, deadline=None)
def test_descriptor_roundtrip(stat, mc, cw):
    d = f"out=%s(min_coverage_frac=%r, coverage_weight=%s)" % (stat, mc, cw)
    op = parse_op(d)
    assert op.name == "out" and op.stat == stat
    assert op.min_coverage_frac == mc
    assert op.coverage_weight == cw
