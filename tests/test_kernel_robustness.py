"""Kernel robustness cases of the classes the reference regression-tests
(vertex-on-gridline, slivers, ring start/end mid-cell, degenerate
rings, tiny/huge coordinates).  Oracles are first principles: shoelace
conservation, [0,1] bounds, symmetry, windowed-vs-full equality."""

import numpy as np
import pytest

from exactextract_spark.geom import parse_wkt, ring_signed_area
from exactextract_spark.kernel import coverage_fraction


def cov(wkt, x0=0, ytop=10, n=10):
    return coverage_fraction(parse_wkt(wkt), x0, ytop, 1, 1, n, n).astype(np.float64)


def test_vertices_exactly_on_gridlines():
    c = cov("POLYGON ((1 1, 4 1, 4 4, 1 4, 1 1))")
    assert c.sum() == pytest.approx(9.0)
    assert c[9 - 1, 0] == 0.0  # strictly outside stays 0
    np.testing.assert_array_equal(c[7:9, 1:3], np.ones((2, 2)))


def test_vertex_on_gridline_general_path():
    # non-rectangle with several vertices exactly on integer gridlines
    w = "POLYGON ((1 1, 5 1, 5 3, 3 5, 1 3, 1 1))"
    c = cov(w)
    g = parse_wkt(w)
    assert c.sum() == pytest.approx(abs(ring_signed_area(g.rings[0])), rel=1e-7)
    assert c.min() >= 0 and c.max() <= 1


def test_ring_start_mid_cell():
    # ring starts/ends inside a cell (reference re-queues the partial
    # start traversal, raster_cell_intersection.cpp:378-385)
    w = "POLYGON ((1.5 1.2, 4.5 1.2, 4.5 4.7, 1.5 4.7, 1.5 1.2))"
    c = cov(w)
    assert c.sum() == pytest.approx(3.0 * 3.5, rel=1e-7)


def test_sliver_polygon():
    w = "POLYGON ((0.5 0.5, 9.5 0.5, 9.5 0.500001, 0.5 0.500001, 0.5 0.5))"
    c = cov(w)
    assert c.sum() == pytest.approx(9 * 1e-6, rel=1e-3)
    assert c.min() >= 0


def test_degenerate_zero_area_ring():
    c = cov("POLYGON ((2 2, 5 2, 2 2, 2 2))")
    assert c.sum() == 0.0


def test_huge_coordinates_window():
    # far-away geometry: nothing leaks into the window
    c = cov("POLYGON ((1e9 1e9, 2e9 1e9, 2e9 2e9, 1e9 2e9, 1e9 1e9))")
    assert c.sum() == 0.0


def test_negative_coordinate_grid():
    g = parse_wkt("POLYGON ((-2.5 -2.5, -0.5 -2.5, -0.5 -0.5, -2.5 -0.5, -2.5 -2.5))")
    c = coverage_fraction(g, -3, 0, 1, 1, 3, 3)
    assert c.sum() == pytest.approx(4.0)
    assert c[1, 1] == 1.0


def test_polygon_covering_exactly_one_cell():
    c = cov("POLYGON ((3 3, 4 3, 4 4, 3 4, 3 3))")
    assert c.sum() == pytest.approx(1.0)
    assert c[10 - 4, 3] == 1.0


def test_fractional_resolution():
    g = parse_wkt("POLYGON ((0.125 0.125, 0.625 0.125, 0.625 0.625, 0.125 0.625, 0.125 0.125))")
    c = coverage_fraction(g, 0, 1, 0.25, 0.25, 4, 4).astype(np.float64)
    assert c.sum() * 0.0625 == pytest.approx(0.25, rel=1e-6)


def test_translation_invariance():
    base = "POLYGON ((0.3 0.2, 4.7 0.9, 3.1 2.6, 4.4 4.8, 1.2 4.1, 2.0 2.5, 0.3 0.2))"
    c1 = cov(base, x0=0, ytop=10)
    g2 = parse_wkt(base)
    for r in g2.rings:
        r[:, 0] += 3.0
        r[:, 1] += 2.0
    c2 = coverage_fraction(g2, 3, 12, 1, 1, 10, 10).astype(np.float64)
    np.testing.assert_allclose(c1, c2, atol=1e-7)


def test_gh_178_regression():
    """Transcribed from the reference's real-world regression
    (test_exact_extract.py:1666-1709): jagged lat/lon polygon on a
    ~9e-5-degree grid at large coordinate offsets — the float-roundoff
    class the reference's grid snap-fudging exists for.  Expected count
    (sum of coverage) from the reference: 95.1929023920793."""
    wkt = ("POLYGON ((117.103213 4.271759,117.102853 4.271848,117.102853 4.272028,"
           "117.102314 4.272028,117.102224 4.272208,117.102045 4.272208,"
           "117.102045 4.271759,117.101775 4.271759,117.101775 4.271669,"
           "117.102045 4.271399,117.102045 4.271489,117.102314 4.271489,"
           "117.102224 4.271669,117.102404 4.271759,117.102404 4.27122,"
           "117.102584 4.27122,117.10265 4.271154,117.103074 4.271366,"
           "117.103033 4.271489,117.103123 4.271489,117.103213 4.271759))")
    g = parse_wkt(wkt)
    c = coverage_fraction(g, 117.09683458943421, 4.273195975028152,
                          8.983152841204135e-05, 8.983152841195037e-05,
                          34, 72).astype(np.float64)
    assert c.sum() == pytest.approx(95.1929023920793)


def test_many_holes():
    holes = ",".join(
        f"({x}.2 {y}.2, {x}.8 {y}.2, {x}.8 {y}.8, {x}.2 {y}.8, {x}.2 {y}.2)"
        for x in range(1, 9, 2) for y in range(1, 9, 2))
    w = f"POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), {holes})"
    c = cov(w)
    g = parse_wkt(w)
    area = sum(ring_signed_area(r) for r in g.rings)
    assert c.sum() == pytest.approx(area, rel=1e-7)
