"""subdivide: per-cell covered polygons (reference subdivide.cpp).
Verified by area conservation against the exact coverage kernel and by
closed-form intersection rectangles."""

import numpy as np
import pytest

from exactextract_spark.geom import parse_wkt, ring_signed_area
from exactextract_spark.io import tiles_from_array
from exactextract_spark.subdivide import subdivide


def _wkt_area(wkt: str) -> float:
    g = parse_wkt(wkt)
    # rings normalized exterior-CCW / holes-CW by the parser
    return sum(ring_signed_area(r) for r in g.rings)


def test_subdivide_rect_closed_form(spark):
    tiles = tiles_from_array(spark, np.zeros((10, 10)))
    zones = spark.createDataFrame(
        [("z", "POLYGON ((1.25 2.5, 4.75 2.5, 4.75 6.25, 1.25 6.25, 1.25 2.5))")],
        ["zone_id", "geometry"])
    rows = subdivide(zones, tiles).collect()
    # covered columns 1..4 (x 1.25..4.75), cell rows for y 2.5..6.25
    # span [2,3)..[6,7) -> 5 rows x 4 cols
    assert len(rows) == 20
    tot = sum(r["coverage"] for r in rows)
    assert tot == pytest.approx(3.5 * 3.75)
    for r in rows:
        # bbox == zone ∩ cell, and the WKT area matches the coverage
        gr, gc = divmod(r["cell_id"], 10)
        cx0, cy1 = float(gc), 10.0 - gr
        assert r["x0"] == pytest.approx(max(1.25, cx0))
        assert r["x1"] == pytest.approx(min(4.75, cx0 + 1))
        assert r["y0"] == pytest.approx(max(2.5, cy1 - 1))
        assert r["y1"] == pytest.approx(min(6.25, cy1))
        assert _wkt_area(r["wkt"]) == pytest.approx(r["coverage"])


def test_subdivide_polygon_area_conservation(spark):
    tiles = tiles_from_array(spark, np.zeros((20, 20)), tile=8)
    wkt = ("POLYGON ((2 2, 17 3, 18 16, 9 18, 3 14, 2 2), "
           "(6 6, 11 6, 11 10, 6 10, 6 6))")
    zones = spark.createDataFrame([("p", wkt)], ["zone_id", "geometry"])
    rows = subdivide(zones, tiles).collect()
    g = parse_wkt(wkt)
    want_area = sum(ring_signed_area(r) for r in g.rings)
    got_area = sum(r["coverage"] for r in rows)  # dx=dy=1
    assert got_area == pytest.approx(want_area, rel=1e-9)
    # per-cell: clipped-polygon area == kernel coverage (float32 tol)
    for r in rows:
        assert _wkt_area(r["wkt"]) == pytest.approx(r["coverage"], abs=1e-6)
    # cells are unique and within the zone bbox
    assert len({r["cell_id"] for r in rows}) == len(rows)


def test_subdivide_multitile_equals_singletile(spark):
    z = [("a", "POLYGON ((1 1, 14 2, 12 13, 2 12, 1 1))")]
    zones = spark.createDataFrame(z, ["zone_id", "geometry"])
    small = subdivide(zones, tiles_from_array(spark, np.zeros((16, 16)), tile=4))
    big = subdivide(zones, tiles_from_array(spark, np.zeros((16, 16)), tile=64))
    a = {r["cell_id"]: r["coverage"] for r in small.collect()}
    b = {r["cell_id"]: r["coverage"] for r in big.collect()}
    assert a == b


def test_subdivide_concave_reentry_multipolygon(spark):
    """A concave (U-shaped) zone exits and re-enters a cell: the cell's
    piece must be a true MULTIPOLYGON (reference cell.cpp:186-190 via
    left_hand_rings), not a single bridged ring."""
    tiles = tiles_from_array(spark, np.zeros((2, 2)), tile=2, dx=10.0, dy=10.0)
    # grid: 2x2 cells of 10x10, x in [0,20], y in [0,20]
    # U shape inside cell (0..10, 10..20): prongs x[1,3] and x[6,9],
    # connected below y=12 inside the lower cell
    wkt = ("POLYGON ((1 2, 9 2, 9 17, 6 17, 6 8, 3 8, 3 18, 1 18, 1 2))")
    zones = spark.createDataFrame([("u", wkt)], ["zone_id", "geometry"])
    rows = {r["cell_id"]: r for r in subdivide(zones, tiles).collect()}
    g = parse_wkt(wkt)
    want_area = sum(ring_signed_area(r) for r in g.rings)
    got_area = sum(r["coverage"] * 100.0 for r in rows.values())
    assert got_area == pytest.approx(want_area, rel=1e-6)
    top_left = rows[0]  # cell row 0, col 0 -> y [10,20], x [0,10]
    assert top_left["wkt"].startswith("MULTIPOLYGON")
    # two prongs: x[1,3] y[10,18] = 16, x[6,9] y[10,17] = 21
    assert _wkt_area(top_left["wkt"]) == pytest.approx(37.0, rel=1e-9)
    assert top_left["coverage"] * 100.0 == pytest.approx(37.0, abs=1e-4)
    # every piece's WKT area matches its coverage
    for r in rows.values():
        assert _wkt_area(r["wkt"]) == pytest.approx(
            r["coverage"] * 100.0, abs=1e-3)


def test_subdivide_shuffle_strategy_equals_broadcast(spark):
    tiles = tiles_from_array(spark, np.zeros((16, 16)), tile=8)
    zones = spark.createDataFrame(
        [("a", "POLYGON ((1 1, 14 2, 12 13, 2 12, 1 1))"),
         ("b", "POLYGON ((3.5 3.5, 9.5 3.5, 9.5 9.5, 3.5 9.5, 3.5 3.5))")],
        ["zone_id", "geometry"])
    bc = subdivide(zones, tiles, strategy="broadcast").collect()
    sh = subdivide(zones, tiles, strategy="shuffle").collect()
    key = lambda r: (r["zone_id"], r["cell_id"])
    assert sorted(map(tuple, bc), key=lambda t: (t[0], t[1])) == \
        sorted(map(tuple, sh), key=lambda t: (t[0], t[1]))


def test_subdivide_cli(spark, tmp_path):
    from exactextract_spark.cli import main
    from exactextract_spark.io import tiles_from_array

    zones = spark.createDataFrame(
        [("z", "POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))")],
        ["zone_id", "geometry"])
    zones.write.parquet(str(tmp_path / "z.parquet"))
    tiles_from_array(spark, np.zeros((4, 4))).write.parquet(str(tmp_path / "t.parquet"))
    rc = main(["--polygons", str(tmp_path / "z.parquet"),
               "--raster", f"v={tmp_path}/t.parquet", "--subdivide",
               "--output", str(tmp_path / "o.parquet"), "--cores", "8"])
    assert rc == 0
    rows = spark.read.parquet(str(tmp_path / "o.parquet")).collect()
    assert len(rows) == 9
    assert sum(r["coverage"] for r in rows) == pytest.approx(4.0)


def test_batch_polygons_wkt_matches_scalar():
    """_batch_polygons_wkt must encode the same geometry as
    polygons_wkt — including the MULTIPOLYGON and hole (multi-ring)
    branches, exercised explicitly below since boundary cells of
    grid-aligned fixtures rarely produce them (string formatting may
    differ — shortest repr vs %.17g — but the PARSED coordinates must
    be identical floats)."""
    import numpy as np

    from exactextract_spark.kernel import coverage_fraction
    from exactextract_spark.subdivide import _batch_polygons_wkt, _offsets
    from exactextract_spark.traversal import covered_polygons, polygons_wkt

    def compare(cells_polys):
        want = [polygons_wkt(p) for p in cells_polys]
        cell_np, poly_nr, ring_nc, cx, cy = [], [], [], [], []
        for polys in cells_polys:
            cell_np.append(len(polys))
            for poly in polys:
                poly_nr.append(len(poly))
                for ring in poly:
                    ring_nc.append(len(ring))
                    xs, ys = zip(*ring)
                    cx.extend(xs)
                    cy.extend(ys)
        got = _batch_polygons_wkt(
            _offsets(cell_np), _offsets(poly_nr), _offsets(ring_nc),
            np.asarray(cx), np.asarray(cy)).to_pylist()
        assert len(got) == len(want)
        for g_wkt, w_wkt in zip(got, want):
            gg, gw = parse_wkt(g_wkt), parse_wkt(w_wkt)
            assert len(gg.rings) == len(gw.rings), (g_wkt, w_wkt)
            for ra, rb in zip(gg.rings, gw.rings):
                assert np.array_equal(ra, rb), (g_wkt, w_wkt)
        return got

    # explicit structural coverage: single poly / poly+hole /
    # MULTIPOLYGON / MULTIPOLYGON with a hole in the second part
    sq = [(0.1, 0.2), (0.9, 0.2), (0.9, 0.8), (0.1, 0.8), (0.1, 0.2)]
    sq2 = [(x + 2, y) for x, y in sq]
    hole = [(0.3, 0.4), (0.3, 0.6), (0.6, 0.6), (0.6, 0.4), (0.3, 0.4)]
    got = compare([
        [[sq]],
        [[sq, hole]],
        [[sq], [sq2]],
        [[sq], [sq2, [(x + 2, y) for x, y in hole]]],
    ])
    assert got[0].startswith("POLYGON ((")
    assert got[1].count("(") == 3  # shell + hole
    assert got[2].startswith("MULTIPOLYGON (((")
    assert got[3].startswith("MULTIPOLYGON")

    # plus every boundary cell of a real concave+hole polygon through
    # the actual traversal pipeline (off-gridline coords so concave
    # re-entry cells genuinely occur)
    wkt = ("POLYGON ((1.2 2.3, 9.4 2.3, 9.4 17.3, 6.4 17.3, 6.4 8.3, "
           "3.4 8.3, 3.4 17.7, 1.2 17.7, 1.2 2.3), "
           "(1.5 3.1, 2.5 3.1, 2.5 4.6, 1.5 4.6, 1.5 3.1))")
    g = parse_wkt(wkt)
    G = 20
    cov = coverage_fraction(g, 0.0, float(G), 1.0, 1.0, G, G)
    cells_polys = []
    for r in range(G):
        for c in range(G):
            if not (0.0 < cov[r, c] < 1.0):
                continue
            box = (float(c), float(G - 1 - r), float(c + 1), float(G - r))
            try:
                polys = covered_polygons(g.rings, *box)
            except ValueError:
                continue
            if polys:
                cells_polys.append(polys)
    assert cells_polys
    compare(cells_polys)


def test_subdivide_long_chord_zone(spark):
    """A triangle with ~50-cell chords through the FULL pipeline (the
    scanline edge expansion path): per-cell WKT area must equal the
    kernel coverage for every boundary piece, and total area must be
    conserved."""
    from exactextract_spark.io import tiles_from_array
    from exactextract_spark.subdivide import subdivide

    G = 64
    data = np.arange(G * G, dtype=np.float64).reshape(G, G)
    tiles = tiles_from_array(spark, data)
    wkt = "POLYGON ((1.3 1.7, 62.4 5.2, 30.8 61.1, 1.3 1.7))"
    zones = spark.createDataFrame([("t", wkt)], ["zone_id", "geometry"])
    rows = subdivide(zones, tiles).collect()
    assert len(rows) > 1000
    total = 0.0
    for r in rows:
        total += r["coverage"]
        if 0.0 < r["coverage"] < 1.0:
            assert _wkt_area(r["wkt"]) == pytest.approx(
                r["coverage"], abs=2e-6), r["cell_id"]
    from exactextract_spark.geom import parse_wkt as _p
    from exactextract_spark.traversal import ring_area
    shell = _p(wkt).rings[0]
    want = abs(ring_area([tuple(p) for p in shell]))
    assert total == pytest.approx(want, rel=1e-6)
