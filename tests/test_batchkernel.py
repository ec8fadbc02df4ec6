"""The batch-vectorized kernel path (batchkernel.py, the default) must
produce exactly the same results as the per-pair path
(EXACTEXTRACT_BATCH=0) across the full stat surface."""

import numpy as np
import pytest

from exactextract_spark.extract import exact_extract
from exactextract_spark.io import tiles_from_array

ZOO = [
    ("rect", "POLYGON ((0.5 0.5, 7.25 0.5, 7.25 6.75, 0.5 6.75, 0.5 0.5))"),
    ("rect_band", "POLYGON ((3 3, 18.5 3, 18.5 19.5, 3 19.5, 3 3))"),
    ("tri", "POLYGON ((1 10, 9 10, 5 18, 1 10))"),
    ("star", "POLYGON ((10 2, 14 6, 19 5, 15 10, 18 15, 12 13, 8 18, "
             "8.5 12, 3 11, 9 8, 10 2))"),
    ("hole", "POLYGON ((2 2, 12 2, 12 12, 2 12, 2 2), (5 5, 9 5, 9 9, 5 5))"),
    ("mp", "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), "
           "((15 15, 19 15, 19 19, 15 19, 15 15)))"),
    ("offgrid", "POLYGON ((-5 -5, 4.5 -5, 4.5 4.25, -5 4.25, -5 -5))"),
    ("tiny", "POLYGON ((6.1 6.1, 6.4 6.1, 6.25 6.35, 6.1 6.1))"),
    ("outside", "POLYGON ((40 40, 45 40, 45 45, 40 45, 40 40))"),
]

OPS = ["count", "sum", "mean", "min", "max", "variance", "stdev",
       "weighted_mean", "weighted_sum", "weighted_variance",
       "min_center_x", "min_center_y", "max_center_x", "max_center_y",
       "variety", "majority", "minority", "median", "quantile(q=0.3)",
       "sum_mc=sum(min_coverage_frac=0.6)",
       "cnt_none=count(coverage_weight=none)",
       "sum_dv=sum(default_value=5)",
       "hist_bw=variety(bin_width=10)"]


def _run(spark, monkeypatch, batch: bool, tile: int = 6):
    monkeypatch.setenv("EXACTEXTRACT_BATCH", "1" if batch else "0")
    rng = np.random.default_rng(7)
    data = rng.integers(0, 50, size=(20, 20)).astype(np.float64)
    data[3, 4] = -999
    data[11, 7] = np.nan
    w = (np.arange(400, dtype=np.float64) % 7).reshape(20, 20)
    zdf = spark.createDataFrame(ZOO, ["zone_id", "geometry"])
    t = tiles_from_array(spark, data, nodata=-999, tile=tile)
    wt = tiles_from_array(spark, w, tile=tile, raster_id="w")
    res = exact_extract(zdf, t, OPS, weight_tiles=wt)
    return {r["zone_id"]: r.asDict() for r in res.collect()}


@pytest.mark.parametrize("tile", [6, 32])
def test_batch_equals_perpair(spark, monkeypatch, tile):
    want = _run(spark, monkeypatch, batch=False, tile=tile)
    got = _run(spark, monkeypatch, batch=True, tile=tile)
    assert set(got) == set(want)
    for z in want:
        for k, v in want[z].items():
            if v is None or (isinstance(v, float) and np.isnan(v)):
                assert got[z][k] is None or \
                    (isinstance(got[z][k], float) and np.isnan(got[z][k])), (z, k, got[z][k], v)
            else:
                assert got[z][k] == v, (z, k, got[z][k], v)


def test_batch_equals_perpair_unweighted_with_chunking(spark, monkeypatch):
    """Tiny chunk budget forces multiple flushes per partition."""
    monkeypatch.setenv("EXACTEXTRACT_BATCH", "1")
    import exactextract_spark.batchkernel as bk
    import exactextract_spark.extract as ex
    monkeypatch.setattr(bk, "CHUNK_CELLS", 64)

    data = np.arange(1, 401, dtype=np.float64).reshape(20, 20)
    zdf = spark.createDataFrame(ZOO, ["zone_id", "geometry"])
    t = tiles_from_array(spark, data, tile=6)
    got = {r["zone_id"]: r.asDict()
           for r in exact_extract(zdf, t, ["count", "sum", "min", "max",
                                           "median"]).collect()}
    monkeypatch.setenv("EXACTEXTRACT_BATCH", "0")
    want = {r["zone_id"]: r.asDict()
            for r in exact_extract(zdf, t, ["count", "sum", "min", "max",
                                            "median"]).collect()}
    assert got == want
