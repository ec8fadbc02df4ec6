"""RasterView-style disaggregation: weights at a coarser resolution
consumed on the value grid (reference raster.h:327-395)."""

import numpy as np
import pytest

from exactextract_spark.extract import exact_extract
from exactextract_spark.io import tiles_from_array
from exactextract_spark.regrid import regrid_to

SQ = "POLYGON ((0.5 0.5, 7.5 0.5, 7.5 7.5, 0.5 7.5, 0.5 0.5))"
OPS = ["weighted_mean", "weighted_sum", "weighted_count"]


def test_coarse_weights_match_manual_disaggregation(spark):
    vals = np.arange(64, dtype=np.float64).reshape(8, 8)
    wc = np.array([[1, 2], [3, 4]], dtype=np.float64)  # 2x2 @ dx=4
    tiles = tiles_from_array(spark, vals)
    grid = dict(grid_xmin=0.0, grid_ymax=8.0, dx=1.0, dy=1.0,
                grid_nrows=8, grid_ncols=8, tile=64)
    coarse = tiles_from_array(spark, wc, dx=4.0, dy=4.0, ymax=8.0)
    fine_w = regrid_to(coarse, grid)
    zones = spark.createDataFrame([("z0", SQ)], ["zone_id", "geometry"])
    got = exact_extract(zones, tiles, OPS, weight_tiles=fine_w, grid=grid).collect()[0]

    manual = tiles_from_array(spark, np.repeat(np.repeat(wc, 4, 0), 4, 1))
    want = exact_extract(zones, tiles, OPS, weight_tiles=manual, grid=grid).collect()[0]
    for k in OPS:
        assert got[k] == pytest.approx(want[k])


def test_regrid_across_tile_borders(spark):
    """Fine grid spanning multiple tiles, factor 2: the per-tile join +
    RasterView index arithmetic must agree with global np.repeat."""
    rng = np.random.default_rng(3)
    wc = rng.uniform(0, 10, (50, 50))
    grid = dict(grid_xmin=0.0, grid_ymax=100.0, dx=1.0, dy=1.0,
                grid_nrows=100, grid_ncols=100, tile=64)
    coarse = tiles_from_array(spark, wc, dx=2.0, dy=2.0, ymax=100.0)
    fine = regrid_to(coarse, grid)
    from exactextract_spark.io import decode_tile
    want = np.repeat(np.repeat(wc, 2, 0), 2, 1)
    for r in fine.collect():
        block = decode_tile(bytes(r["values"]), "float64", r["nrows"], r["ncols"])
        exp = want[r["row0"]:r["row0"] + r["nrows"], r["col0"]:r["col0"] + r["ncols"]]
        np.testing.assert_array_equal(block, exp)


def test_incompatible_grids_rejected(spark):
    wc = np.ones((3, 3))
    coarse = tiles_from_array(spark, wc, dx=1.5, dy=1.5, ymax=4.5)
    grid = dict(grid_xmin=0.0, grid_ymax=8.0, dx=1.0, dy=1.0,
                grid_nrows=8, grid_ncols=8, tile=64)
    with pytest.raises(ValueError, match="integer"):
        regrid_to(coarse, grid)


def test_regrid_with_origin_offset(spark):
    """Coarse origin offset by integer multiples of the fine resolution
    (reference raster.h:345-360 allows this)."""
    wc = np.arange(16, dtype=np.float64).reshape(4, 4)
    # coarse grid: dx=2, origin (2, top 9) -> offsets of 2 and 1 fine cells
    coarse = tiles_from_array(spark, wc, dx=2.0, dy=2.0, xmin=2.0, ymax=9.0)
    grid = dict(grid_xmin=0.0, grid_ymax=8.0, dx=1.0, dy=1.0,
                grid_nrows=8, grid_ncols=8, tile=64)
    fine = regrid_to(coarse, grid)
    from exactextract_spark.io import decode_tile
    r = fine.collect()[0]
    block = decode_tile(bytes(r["values"]), "float64", r["nrows"], r["ncols"])
    # expected: fine cell (r, c): src_row = (r + off_r)//2 with
    # off_r = (9-8)/1 = 1... computed directly:
    for rr in range(8):
        for cc in range(8):
            sr = (rr + 1) // 2          # off_r = (9 - 8) / 1 = 1
            sc = (cc + (0 - 2)) // 2    # off_c = (0 - 2) / 1 = -2
            if 0 <= sr < 4 and 0 <= sc < 4:
                assert block[rr, cc] == wc[sr, sc], (rr, cc)
            else:
                assert np.isnan(block[rr, cc]), (rr, cc)


def test_regrid_crossing_coarse_tile_borders(spark):
    """Coarse tiles SMALLER than one fine tile's source window: a fine
    tile reads from up to 4 coarse tiles (tile sizes are independent)."""
    rng = np.random.default_rng(5)
    wc = rng.uniform(0, 10, (30, 30))
    coarse = tiles_from_array(spark, wc, dx=3.0, dy=3.0, ymax=90.0, tile=8)
    grid = dict(grid_xmin=0.0, grid_ymax=90.0, dx=1.0, dy=1.0,
                grid_nrows=90, grid_ncols=90, tile=64)
    fine = regrid_to(coarse, grid, tile=64)
    from exactextract_spark.io import decode_tile
    want = np.repeat(np.repeat(wc, 3, 0), 3, 1)
    rows = fine.collect()
    assert len(rows) == 4  # 90/64 -> 2x2 fine tiles
    for r in rows:
        block = decode_tile(bytes(r["values"]), "float64", r["nrows"], r["ncols"])
        exp = want[r["row0"]:r["row0"] + r["nrows"], r["col0"]:r["col0"] + r["ncols"]]
        np.testing.assert_array_equal(block, exp)


def test_transparent_weight_regrid_in_extractor(spark):
    """ZonalExtractor must regrid a coarser weight table automatically —
    the reference's implicit common_grid path (grid.h:278-305)."""
    vals = np.arange(64, dtype=np.float64).reshape(8, 8)
    wc = np.array([[1, 2], [3, 4]], dtype=np.float64)
    tiles = tiles_from_array(spark, vals)
    grid = dict(grid_xmin=0.0, grid_ymax=8.0, dx=1.0, dy=1.0,
                grid_nrows=8, grid_ncols=8, tile=64)
    coarse = tiles_from_array(spark, wc, dx=4.0, dy=4.0, ymax=8.0)
    zones = spark.createDataFrame([("z0", SQ)], ["zone_id", "geometry"])
    # pass the COARSE table directly — no manual regrid_to
    got = exact_extract(zones, tiles, OPS, weight_tiles=coarse, grid=grid).collect()[0]
    manual = tiles_from_array(spark, np.repeat(np.repeat(wc, 4, 0), 4, 1))
    want = exact_extract(zones, tiles, OPS, weight_tiles=manual, grid=grid).collect()[0]
    for k in OPS:
        assert got[k] == pytest.approx(want[k])


def test_regrid_int_raster_without_nodata_out_of_extent_raises(spark):
    wc = np.ones((2, 2), dtype=np.int32)
    coarse = tiles_from_array(spark, wc, dx=2.0, dy=2.0, ymax=4.0)
    grid = dict(grid_xmin=0.0, grid_ymax=8.0, dx=1.0, dy=1.0,
                grid_nrows=8, grid_ncols=8, tile=64)
    with pytest.raises(Exception, match="nodata"):
        regrid_to(coarse, grid).collect()


def test_regrid_carries_scale_offset_and_mask(spark):
    """A coarse weight raster with on-read scale/offset and a mask band
    disaggregates with the transform carried through and the mask
    regridded alongside (unmapped fine cells become mask=0)."""
    wc = np.array([[2, 4], [6, 8]], dtype=np.float64)
    mask = np.array([[1, 1], [1, 0]], dtype=np.uint8)
    coarse = tiles_from_array(spark, wc, dx=4.0, dy=4.0, ymax=8.0,
                              scale=0.5, offset=1.0, mask=mask)
    grid = dict(grid_xmin=0.0, grid_ymax=8.0, dx=1.0, dy=1.0,
                grid_nrows=8, grid_ncols=8, tile=64)
    fine = regrid_to(coarse, grid)
    vals = np.arange(64, dtype=np.float64).reshape(8, 8)
    tiles = tiles_from_array(spark, vals)
    zones = spark.createDataFrame(
        [("z", "POLYGON ((0 0, 8 0, 8 8, 0 8, 0 0))")], ["zone_id", "geometry"])
    got = exact_extract(zones, tiles, ["weighted_sum", "weighted_count"],
                        weight_tiles=fine, grid=grid).collect()[0]

    # manual: fine weights = (repeat(wc)*0.5 + 1), masked quadrant -> NaN
    wf = np.repeat(np.repeat(wc, 4, 0), 4, 1) * 0.5 + 1.0
    wf[4:, 4:] = np.nan
    # undefined weights (no default) make the weighted stats undefined
    # (reference: NaN; engine: NULL, or NaN with undefined="nan")
    assert got["weighted_sum"] is None and got["weighted_count"] is None

    # restrict to a zone inside the valid-mask area -> exact sums
    zones2 = spark.createDataFrame(
        [("z", "POLYGON ((0 4, 8 4, 8 8, 0 8, 0 4))")], ["zone_id", "geometry"])
    got2 = exact_extract(zones2, tiles, ["weighted_sum"],
                         weight_tiles=fine, grid=grid).collect()[0]
    want = float((vals[:4, :] * wf[:4, :]).sum())  # top half: rows 0..3
    assert got2["weighted_sum"] == pytest.approx(want)


def test_weight_scale_offset_in_extractor(spark):
    """Weight tiles with scale/offset on the SAME grid: transform applied
    on read, equal to pre-scaled weights."""
    vals = np.arange(64, dtype=np.float64).reshape(8, 8)
    wraw = (np.arange(64, dtype=np.float64) % 7).reshape(8, 8)
    tiles = tiles_from_array(spark, vals)
    zones = spark.createDataFrame([("z0", SQ)], ["zone_id", "geometry"])
    wt = tiles_from_array(spark, wraw, raster_id="w", scale=2.0, offset=0.5)
    got = exact_extract(zones, tiles, OPS, weight_tiles=wt).collect()[0]
    wman = tiles_from_array(spark, wraw * 2.0 + 0.5, raster_id="w")
    want = exact_extract(zones, tiles, OPS, weight_tiles=wman).collect()[0]
    for k in OPS:
        assert got[k] == pytest.approx(want[k])
