"""point_in_polygon scale shape: candidate pruning must be a tile-key
EQUI-join (never BroadcastNestedLoopJoin), identical results across the
broadcast and shuffle strategies and with/without an explicit grid."""

import pytest

from exactextract_spark.fixtures import SynthConfig, build_docs, build_points
from exactextract_spark import io as eio
from exactextract_spark.spatial import point_in_polygon


@pytest.fixture(scope="module")
def pip_fixture(spark):
    cfg = SynthConfig(G=128, Z=60)
    docs = build_docs(spark, cfg).cache()
    zones = eio.zones_from_docs(docs)
    points = build_points(spark, cfg)
    return cfg, zones, points


@pytest.mark.parametrize("kwargs", [
    {},                              # auto lattice, broadcast
    {"broadcast_limit": 0},          # shuffle: geometry rides the join
])
def test_pip_strategies_agree(spark, pip_fixture, kwargs):
    cfg, zones, points = pip_fixture
    base = sorted((r["point_id"], r["zone_id"]) for r in
                  point_in_polygon(points, zones, grid=cfg.grid_dict()).collect())
    assert len(base) > 0
    got = sorted((r["point_id"], r["zone_id"]) for r in
                 point_in_polygon(points, zones, **kwargs).collect())
    assert got == base


def test_pip_plan_is_equijoin(spark, pip_fixture):
    cfg, zones, points = pip_fixture
    for kwargs in ({}, {"broadcast_limit": 0}):
        df = point_in_polygon(points, zones, grid=cfg.grid_dict(), **kwargs)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Join" in plan


def test_pip_nonconvex_zone(spark):
    """Ray-cast correctness on a concave polygon with a hole."""
    zones = spark.createDataFrame(
        [("c", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 8 2, 8 8, 2 8, 2 2))")],
        ["zone_id", "geometry"])
    pts = spark.createDataFrame(
        [(0, 1.0, 1.0),    # in ring, outside hole -> inside
         (1, 5.0, 5.0),    # inside hole -> outside
         (2, 11.0, 5.0),   # outside bbox
         (3, 9.0, 9.0)],   # in ring
        ["point_id", "x", "y"])
    got = sorted(r["point_id"] for r in point_in_polygon(pts, zones).collect())
    assert got == [0, 3]


def test_knn_tiles_thin_grid(spark):
    """A 1-row tile lattice needs a ring radius of k along the row —
    sqrt(k) would under-produce candidates near the grid edge."""
    grid = dict(grid_xmin=0.0, grid_ymax=8.0, dx=1.0, dy=1.0,
                grid_nrows=8, grid_ncols=8 * 64, tile=8)
    # 1 tile row (8 cells tall, tile=8), 64 tile columns
    from exactextract_spark.spatial import knn_tiles
    pts = spark.createDataFrame([(0, 1.0, 4.0)], ["point_id", "x", "y"])
    got = knn_tiles(pts, grid, k=6, tile=8).collect()
    assert len(got) == 6
    # true nearest 6 tiles from column 0: columns 0..5
    assert sorted(r["tile_col"] for r in got) == [0, 1, 2, 3, 4, 5]
    assert all(r["tile_row"] == 0 for r in got)
