"""Stress cases of the reference's real-world regression class
(antarctica.wkt / russia.wkt analogs): very-many-vertex jagged global
polygons over a geographic grid, crossing grid edges, evaluated both
whole-grid and tiled."""

import time

import numpy as np
import pytest

from exactextract_spark.geom import Geometry, parse_wkt, ring_signed_area
from exactextract_spark.kernel import coverage_fraction


def _jagged_ring(n, cx, cy, rx, ry, seed):
    """Coastline-like ring: radius is a smooth random walk, so edges are
    short (like real antarctica.wkt vertices), not radial spikes."""
    rng = np.random.default_rng(seed)
    ang = (np.arange(n) + rng.uniform(0.02, 0.98, n)) * (2 * np.pi / n)
    steps = rng.uniform(-1, 1, n)
    walk = np.cumsum(steps)
    walk -= np.linspace(0, walk[-1], n)  # close the loop
    rad = 0.7 + 0.25 * walk / (np.abs(walk).max() + 1e-9)
    xs = cx + rx * rad * np.cos(ang)
    ys = cy + ry * rad * np.sin(ang)
    ring = np.column_stack([xs, ys])
    return np.vstack([ring, ring[:1]])


def test_antarctica_class_polygon():
    """20k-vertex jagged polygon spanning nearly the whole grid and
    hanging off every edge, 360x180 geographic grid."""
    ring = _jagged_ring(20000, 0, -20, 220, 110, seed=1)  # exceeds grid bounds
    g = Geometry("areal", [ring if ring_signed_area(ring) > 0 else ring[::-1].copy()])
    t0 = time.time()
    cov = coverage_fraction(g, -180, 90, 1, 1, 180, 360).astype(np.float64)
    dt = time.time() - t0
    assert dt < 6.0, f"kernel too slow on 20k vertices: {dt:.2f}s"
    assert cov.min() >= 0 and cov.max() <= 1

    # tiled evaluation must agree with whole-grid
    tiles = np.zeros((180, 360), np.float32)
    for r0 in range(0, 180, 64):
        for c0 in range(0, 360, 64):
            nr = min(64, 180 - r0)
            nc = min(64, 360 - c0)
            tiles[r0:r0 + nr, c0:c0 + nc] = coverage_fraction(
                g, -180 + c0, 90 - r0, 1, 1, nr, nc)
    np.testing.assert_allclose(tiles, cov, atol=3e-7)


def test_many_part_multipolygon():
    """Russia-class: many disjoint parts, mixed sizes, some far outside
    the window."""
    parts = []
    rng = np.random.default_rng(5)
    for i in range(120):
        cx, cy = rng.uniform(-250, 250, 2)
        ring = _jagged_ring(int(rng.integers(5, 40)), cx, cy, 8, 6, seed=100 + i)
        if ring_signed_area(ring) < 0:
            ring = ring[::-1].copy()
        parts.append(ring)
    g = Geometry("areal", parts)
    cov = coverage_fraction(g, -180, 90, 1, 1, 180, 360).astype(np.float64)
    assert cov.min() >= -0.0 and cov.max() <= 1.0
    # conservation for the parts fully inside the window
    inside_area = sum(
        ring_signed_area(r) for r in parts
        if r[:, 0].min() > -180 and r[:, 0].max() < 180
        and r[:, 1].min() > -90 and r[:, 1].max() < 90)
    total_area = sum(abs(ring_signed_area(r)) for r in parts)
    # fully-inside parts are a lower bound (minus overlap clipping);
    # all parts' area is an upper bound
    assert cov.sum() >= inside_area * 0.9
    assert cov.sum() <= total_area


def test_high_resolution_small_polygon():
    """Tiny polygon on a fine grid: fractional dx/dy, sub-cell slivers."""
    g = parse_wkt("POLYGON ((0.001 0.001, 0.009 0.002, 0.008 0.009, 0.002 0.008, 0.001 0.001))")
    cov = coverage_fraction(g, 0, 0.01, 0.0001, 0.0001, 100, 100).astype(np.float64)
    area = cov.sum() * 0.0001 * 0.0001
    assert area == pytest.approx(abs(ring_signed_area(g.rings[0])), rel=1e-6)
