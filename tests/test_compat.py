"""Reference-compatibility surface: CRS validation (reference
exact_extract.py:297-360), result dtypes for integer rasters
(operation.cpp:115-206; transcribed from reference python tests
test_exact_extract.py:841-930), and input-order-preserving output
(exact_extract.py:497-501)."""

import warnings

import numpy as np
import pytest
from pyspark.sql import functions as F, types as T

from exactextract_spark.extract import crs_matches, exact_extract
from exactextract_spark.io import tiles_from_array


def _zones(spark, rows, crs=None):
    df = spark.createDataFrame(rows, ["zone_id", "geometry"])
    if crs is not None:
        df = df.withColumn("crs", F.lit(crs))
    return df


def test_crs_matches_semantics():
    assert crs_matches(None, "EPSG:4326")
    assert crs_matches("EPSG:4326", None)
    assert crs_matches("EPSG:4326", "EPSG:4326")
    # genuinely different CRSs mismatch whether or not pyproj resolves them
    assert not crs_matches("EPSG:4326", "EPSG:3857")
    # an unparseable CRS string must REPORT a mismatch, never raise
    # (this feeds a warn-only path)
    assert not crs_matches("EPSG:4326", "not-a-crs !!")


def test_crs_match_no_warning(spark):
    tiles = tiles_from_array(spark, np.arange(9.0).reshape(3, 3)) \
        .withColumn("crs", F.lit("EPSG:4326"))
    zones = _zones(spark, [("z", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")],
                   crs="EPSG:4326")
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        exact_extract(zones, tiles, ["count"]).collect()


def test_crs_mismatch_warns(spark):
    tiles = tiles_from_array(spark, np.arange(9.0).reshape(3, 3)) \
        .withColumn("crs", F.lit("EPSG:3857"))
    zones = _zones(spark, [("z", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")],
                   crs="EPSG:4326")
    with pytest.warns(RuntimeWarning, match="does not exactly match raster"):
        exact_extract(zones, tiles, ["count"])


def test_crs_weight_mismatch_warns(spark):
    tiles = tiles_from_array(spark, np.arange(9.0).reshape(3, 3))
    wtiles = tiles_from_array(spark, np.ones((3, 3))) \
        .withColumn("crs", F.lit("EPSG:3857"))
    zones = _zones(spark, [("z", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")],
                   crs="EPSG:4326")
    with pytest.warns(RuntimeWarning,
                      match="does not exactly match weighting raster"):
        exact_extract(zones, tiles, ["weighted_mean"], weight_tiles=wtiles)


def test_incompatible_extents_raise(spark):
    from exactextract_spark.regrid import regrid_to

    coarse = tiles_from_array(spark, np.ones((4, 4)), dx=1.5, dy=1.5, ymax=6.0)
    fine = dict(grid_xmin=0.0, grid_ymax=6.0, dx=1.0, dy=1.0,
                grid_nrows=6, grid_ncols=6)
    with pytest.raises(ValueError, match="Incompatible extents"):
        regrid_to(coarse, fine).collect()


# --- result dtype goldens (reference test_gdal_data_types /
# test_unsigned_values_preserved) ---------------------------------------

@pytest.mark.parametrize("dtype,want_int", [
    ("int16", True), ("int32", True), ("uint8", True),
    ("float32", False), ("float64", False),
])
def test_mode_result_type(spark, dtype, want_int):
    arr = np.array([[1, 1, 1], [2, 2, 2], [3, 2, 3]], dtype=np.dtype(dtype))
    tiles = tiles_from_array(spark, arr, nodata=2)
    zones = _zones(spark, [("z", "POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))")])
    res = exact_extract(zones, tiles, ["mode"], compat=True)
    f = dict(zip(res.columns, [x.dataType for x in res.schema.fields]))
    row = res.first()
    assert row["mode"] == 1
    if want_int:
        assert isinstance(f["mode"], T.LongType)
        assert isinstance(row["mode"], int)
    else:
        assert isinstance(f["mode"], T.DoubleType)
        assert isinstance(row["mode"], float)


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "uint32"])
def test_unsigned_values_preserved(spark, dtype):
    max_val = np.iinfo(np.dtype(dtype)).max
    arr = np.array([[max_val, max_val], [max_val - 1, max_val - 1]],
                   dtype=np.dtype(dtype))
    tiles = tiles_from_array(spark, arr, nodata=float(max_val - 1))
    zones = _zones(spark, [("z", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")])
    row = exact_extract(zones, tiles, ["sum", "mode"], compat=True).first()
    assert row["sum"] == 2 * max_val
    assert row["mode"] == max_val


def test_preserve_order(spark):
    tiles = tiles_from_array(spark, np.arange(64.0).reshape(8, 8))
    rows = [(f"z{i}", f"POLYGON (({x} 0, {x + 1} 0, {x + 1} 1, {x} 1, {x} 0))")
            for i, x in enumerate([5, 1, 7, 3, 0, 6, 2, 4])]
    zones = spark.createDataFrame(rows, ["zone_id", "geometry"])
    res = exact_extract(zones, tiles, ["count", "mean"], preserve_order=True)
    got = [r["zone_id"] for r in res.collect()]
    assert got == [r[0] for r in rows]
    # default: no ordering guarantee, but the same row SET
    res2 = exact_extract(zones, tiles, ["count", "mean"])
    assert sorted(r["zone_id"] for r in res2.collect()) == sorted(got)


def test_compat_empty_zone_int_stats_nan_in_pandas(spark):
    """compat mode with an integer raster and a zone off the raster:
    the LongType stat columns stay SQL NULL (long cannot hold NaN),
    and toPandas() renders them as float64 NaN — the reference's
    pandas output shape for missing integer stats."""
    import numpy as np

    arr = np.array([[1, 1], [2, 2]], dtype=np.int32)
    tiles = tiles_from_array(spark, arr)
    zones = _zones(spark, [
        ("in", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
        ("off", "POLYGON ((50 50, 51 50, 51 51, 50 51, 50 50))")])
    res = exact_extract(zones, tiles, ["mode", "mean"], compat=True)
    pdf = res.toPandas().set_index("zone_id")
    assert pdf.loc["in", "mode"] == 2
    assert np.isnan(pdf.loc["off", "mode"])   # long NULL -> pandas NaN
    assert np.isnan(pdf.loc["off", "mean"])   # double NaN (coalesced)
    assert pdf["mode"].dtype == np.float64
