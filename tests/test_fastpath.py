"""The (opt-in) batch-vectorized rectangle path must produce exactly
the same partials as the per-pair kernel."""

import numpy as np
import pytest

from exactextract_spark import fastpath


@pytest.fixture()
def enable_fastpath(monkeypatch):
    monkeypatch.setattr(fastpath, "FAST_MAX_CELLS", 1 << 30)
    # extract imports FAST_MAX_CELLS by value inside run_kernel; patch
    # the module attribute it reads at call time
    yield


def test_fastpath_equals_perpair(spark, monkeypatch):
    from exactextract_spark.extract import exact_extract
    from exactextract_spark.io import tiles_from_array

    data = np.arange(1, 401, dtype=np.float64).reshape(20, 20)
    data[3, 4] = -999
    w = (np.arange(400, dtype=np.float64) % 7).reshape(20, 20)
    zones = [("a", "POLYGON ((0.5 0.5, 7.25 0.5, 7.25 6.75, 0.5 6.75, 0.5 0.5))"),
             ("b", "POLYGON ((3 3, 18.5 3, 18.5 19.5, 3 19.5, 3 3))"),
             ("c", "POLYGON ((12.125 0.25, 19.875 0.25, 19.875 9.5, 12.125 9.5, 12.125 0.25))"),
             # non-rect zone exercises the mixed routing
             ("d", "POLYGON ((1 10, 9 10, 5 18, 1 10))")]
    ops = ["count", "sum", "mean", "min", "max", "variance",
           "weighted_mean", "min_center_x", "max_center_y",
           "sum_mc=sum(min_coverage_frac=0.6)",
           "cnt_none=count(coverage_weight=none)",
           "sum_dv=sum(default_value=5)"]

    def run():
        zdf = spark.createDataFrame(zones, ["zone_id", "geometry"])
        t = tiles_from_array(spark, data, nodata=-999, tile=6)
        wt = tiles_from_array(spark, w, tile=6, raster_id="w")
        res = exact_extract(zdf, t, ops, weight_tiles=wt)
        return {r["zone_id"]: r.asDict() for r in res.collect()}

    monkeypatch.setattr(fastpath, "FAST_MAX_CELLS", 0)
    want = run()
    monkeypatch.setattr(fastpath, "FAST_MAX_CELLS", 1 << 30)
    got = run()
    assert set(got) == set(want)
    for z in want:
        for k, v in want[z].items():
            if v is None:
                assert got[z][k] is None, (z, k)
            else:
                assert got[z][k] == pytest.approx(v), (z, k, got[z][k], v)
