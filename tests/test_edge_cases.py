"""API edge cases: empty inputs, include_cols projection, invalid
geometry errors, duplicate names."""

import numpy as np
import pytest

from exactextract_spark.extract import exact_extract
from exactextract_spark.io import tiles_from_array

ARANGE9 = np.arange(1, 10, dtype=np.float64).reshape(3, 3)
SQ = "POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))"


def test_empty_zones(spark):
    tiles = tiles_from_array(spark, ARANGE9)
    zones = spark.createDataFrame([], "zone_id string, geometry string")
    out = exact_extract(zones, tiles, ["count", "mean"])
    assert out.count() == 0
    assert set(out.columns) == {"zone_id", "count", "mean"}


def test_include_cols_projection(spark):
    tiles = tiles_from_array(spark, ARANGE9)
    zones = spark.createDataFrame(
        [("z0", SQ, "farmland")], ["zone_id", "geometry", "landuse"])
    r = exact_extract(zones, tiles, ["mean"], include_cols=["landuse"]).collect()[0]
    assert r["landuse"] == "farmland"
    assert r["mean"] == pytest.approx(5.0)


def test_invalid_wkt_raises(spark):
    tiles = tiles_from_array(spark, ARANGE9)
    zones = spark.createDataFrame([("z0", "POLYGON ((not wkt")], ["zone_id", "geometry"])
    with pytest.raises(Exception):
        exact_extract(zones, tiles, ["count"]).collect()


def test_duplicate_output_names_rejected(spark):
    tiles = tiles_from_array(spark, ARANGE9)
    zones = spark.createDataFrame([("z0", SQ)], ["zone_id", "geometry"])
    with pytest.raises(ValueError, match="duplicate"):
        exact_extract(zones, tiles, ["mean", "mean"])


def test_zone_bigger_than_raster(spark):
    tiles = tiles_from_array(spark, ARANGE9)
    zones = spark.createDataFrame(
        [("big", "POLYGON ((-10 -10, 20 -10, 20 20, -10 20, -10 -10))")],
        ["zone_id", "geometry"])
    r = exact_extract(zones, tiles, ["count", "sum"]).collect()[0]
    assert r["count"] == pytest.approx(9.0)
    assert r["sum"] == pytest.approx(45.0)


def test_multipolygon_zone(spark):
    tiles = tiles_from_array(spark, ARANGE9)
    zones = spark.createDataFrame(
        [("mp", "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))")],
        ["zone_id", "geometry"])
    r = exact_extract(zones, tiles, ["count", "sum"]).collect()[0]
    assert r["count"] == pytest.approx(2.0)
    assert r["sum"] == pytest.approx(7.0 + 3.0)  # cells value 7 (r2c0) and 3 (r0c2)
