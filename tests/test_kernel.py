"""Coverage-kernel goldens transcribed from the reference
(/root/reference/test/test_raster_cell_intersection.cpp and
python/tests/test_exact_extract.py) plus conservation/decomposition
properties.  No Spark involved."""

import math

import numpy as np
import pytest

from exactextract_spark.geom import parse_wkt, ring_signed_area
from exactextract_spark.kernel import cell_lengths, coverage_fraction

SQ = "POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))"
GOLDEN = np.array([[0.25, 0.5, 0.25], [0.5, 1.0, 0.5], [0.25, 0.5, 0.25]],
                  dtype=np.float32)


def cov3(wkt):
    return coverage_fraction(parse_wkt(wkt), 0, 3, 1, 1, 3, 3)


def test_basic_rectangle():
    # test_raster_cell_intersection.cpp:53-69
    np.testing.assert_array_equal(cov3(SQ), GOLDEN)


def test_basic_rectangle_general_path():
    # redundant vertex defeats the rectangle fast path
    g = "POLYGON ((0.5 0.5, 1.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))"
    np.testing.assert_allclose(cov3(g), GOLDEN, atol=1e-7)


def test_geometry_collection():
    # test_raster_cell_intersection.cpp:84-100
    g = ("GEOMETRYCOLLECTION ("
         "MULTIPOLYGON (((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5)),"
         "((1.5 1.5, 2.5 1.5, 2.5 2.5, 1.5 2.5, 1.5 1.5))),"
         "POLYGON ((0.5 1.5, 1.5 1.5, 1.5 2.5, 0.5 2.5, 0.5 1.5)),"
         "POLYGON ((1.5 0.5, 2.5 0.5, 2.5 1.5, 1.5 1.5, 1.5 0.5)))")
    np.testing.assert_allclose(cov3(g), GOLDEN, atol=1e-7)


def test_hole():
    g = "POLYGON ((0 0, 3 0, 3 3, 0 3, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
    expected = np.ones((3, 3), dtype=np.float32)
    expected[1, 1] = 0.0
    np.testing.assert_array_equal(cov3(g), expected)


def test_rectangular_line():
    # test_raster_cell_intersection.cpp:71-82
    g = parse_wkt("LINESTRING (0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5)")
    got = cell_lengths(g, 0, 3, 1, 1, 3, 3)
    expected = np.array([[1, 1, 1], [1, 0, 1], [1, 1, 1]], dtype=np.float32)
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_diagonal_line():
    g = parse_wkt("LINESTRING (0.5 0.5, 1.5 1.5, 2.5 0.5)")
    got = cell_lengths(g, 0, 3, 1, 1, 3, 3)
    s = math.sqrt(2) / 2
    expected = np.array([[0, 0, 0], [0, 2 * s, 0], [s, 0, s]], dtype=np.float32)
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_point_rejected():
    with pytest.raises(ValueError, match="[Uu]nsupported geometry"):
        parse_wkt("POINT (0 0)")


def test_mixed_collection_rejected():
    with pytest.raises(ValueError, match="mixing"):
        parse_wkt("GEOMETRYCOLLECTION (POLYGON ((0 0, 1 0, 1 1, 0 0)),"
                  "LINESTRING (0 0, 1 1))")


def test_area_conservation_concave():
    wkt = "POLYGON ((0.3 0.2, 4.7 0.9, 3.1 2.6, 4.4 4.8, 1.2 4.1, 2.0 2.5, 0.3 0.2))"
    g = parse_wkt(wkt)
    cov = coverage_fraction(g, 0, 5, 1, 1, 5, 5).astype(np.float64)
    assert cov.min() >= 0.0 and cov.max() <= 1.0
    assert cov.sum() == pytest.approx(ring_signed_area(g.rings[0]), rel=1e-6)


def test_tile_decomposition_matches_full():
    """Windowed evaluation (how Spark tiles run) must reproduce the
    full-grid result — geometry crossing tile borders, holes and all."""
    wkt = ("POLYGON ((0.3 0.2, 4.7 0.9, 3.1 2.6, 4.4 4.8, 1.2 4.1, 2.0 2.5, 0.3 0.2),"
           "(2.2 1.0, 2.9 1.1, 2.5 1.9, 2.2 1.0))")
    g = parse_wkt(wkt)
    full = coverage_fraction(g, 0, 5, 1, 1, 5, 5)
    tiles = np.zeros((5, 5), np.float32)
    for r0, c0, nr, nc in [(0, 0, 2, 3), (0, 3, 2, 2), (2, 0, 3, 3), (2, 3, 3, 2)]:
        w = coverage_fraction(g, 0 + c0, 5 - r0, 1, 1, nr, nc)
        tiles[r0:r0 + nr, c0:c0 + nc] = w
    np.testing.assert_allclose(tiles, full, atol=2e-7)


def test_polygon_exceeding_grid():
    # polygon hangs off every side: interior cells still fully covered
    g = parse_wkt("POLYGON ((-2 -2, 5 -2, 5 5, -2 5, -2 -2))")
    cov = coverage_fraction(g, 0, 3, 1, 1, 3, 3)
    np.testing.assert_array_equal(cov, np.ones((3, 3), np.float32))


def test_multipolygon_parts_sum():
    g = parse_wkt("MULTIPOLYGON (((0 0, 1.5 0, 1.5 1, 0 1, 0 0)),"
                  "((1.5 0, 3 0, 3 1, 1.5 1, 1.5 0)))")
    cov = coverage_fraction(g, 0, 3, 1, 1, 3, 3)
    np.testing.assert_allclose(cov[2], [1, 1, 1], atol=1e-7)


def test_random_polygons_conservation():
    rng = np.random.default_rng(7)
    for _ in range(25):
        n = int(rng.integers(4, 12))
        # star-shaped (hence simple) polygon: evenly-spread jittered
        # angles keep every cyclic gap < pi
        ang = (np.arange(n) + rng.uniform(0.05, 0.95, n)) * (2 * np.pi / n)
        rad = rng.uniform(0.5, 4.0, n)
        cx, cy = rng.uniform(2, 6, 2)
        xs = cx + rad * np.cos(ang)
        ys = cy + rad * np.sin(ang)
        pts = ", ".join(f"{x} {y}" for x, y in zip(xs, ys))
        wkt = f"POLYGON (({pts}, {xs[0]} {ys[0]}))"
        g = parse_wkt(wkt)
        cov = coverage_fraction(g, 0, 10, 1, 1, 10, 10).astype(np.float64)
        assert cov.min() >= 0 and cov.max() <= 1
        # polygon fully inside [0,10]x[0,10] up to clipping; compute
        # expected area as shoelace clipped — here ensure within bbox
        if xs.min() >= 0 and xs.max() <= 10 and ys.min() >= 0 and ys.max() <= 10:
            assert cov.sum() == pytest.approx(abs(ring_signed_area(g.rings[0])), rel=1e-5)
