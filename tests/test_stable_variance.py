"""Numerically-stable variance (per-pair West + Chan merge): must match
the true variance on pathological data (huge mean, tiny variance) where
the algebraic sum-of-squares form loses all precision — the failure
mode the reference avoids with West's algorithm (variance.h:20-72) at
the cost of refusing to parallelize; the Chan merge keeps both."""

import numpy as np
import pytest

from exactextract_spark.extract import exact_extract
from exactextract_spark.io import tiles_from_array

SQ = "POLYGON ((0.5 0.5, 19.5 0.5, 19.5 19.5, 0.5 19.5, 0.5 0.5))"


def test_stable_variance_pathological(spark):
    rng = np.random.default_rng(0)
    data = 1e9 + rng.normal(0, 1, (20, 20))
    zones = spark.createDataFrame([("z0", SQ)], ["zone_id", "geometry"])
    tiles = tiles_from_array(spark, data, tile=5)  # forces cross-tile merge
    r = exact_extract(zones, tiles, [
        "v_alg=variance", "v_st=variance(stable=true)",
        "s_st=stdev(stable=true)", "cv_st=coefficient_of_variation(stable=true)",
        "count"]).collect()[0]

    # true coverage-weighted variance via one careful numpy pass
    cov = np.ones((20, 20))
    cov[0, :] = cov[-1, :] = cov[:, 0] = cov[:, -1] = 0.5
    cov[0, 0] = cov[0, -1] = cov[-1, 0] = cov[-1, -1] = 0.25
    w = cov.ravel()
    x = data.ravel()
    mu = np.average(x, weights=w)
    true_var = np.average((x - mu) ** 2, weights=w)

    assert r["v_st"] == pytest.approx(true_var, rel=1e-9)
    assert r["s_st"] == pytest.approx(np.sqrt(true_var), rel=1e-9)
    assert r["cv_st"] == pytest.approx(np.sqrt(true_var) / mu, rel=1e-6)
    # demonstrate that the algebraic form genuinely degrades here
    assert abs(r["v_alg"] - true_var) > abs(r["v_st"] - true_var)


def test_stable_matches_algebraic_on_normal_data(spark):
    data = np.arange(1, 401, dtype=np.float64).reshape(20, 20)
    zones = spark.createDataFrame([("z0", SQ)], ["zone_id", "geometry"])
    tiles = tiles_from_array(spark, data, tile=7)
    r = exact_extract(zones, tiles,
                      ["v_alg=variance", "v_st=variance(stable=true)"]).collect()[0]
    assert r["v_st"] == pytest.approx(r["v_alg"], rel=1e-12)


def test_bin_width_bounded_histogram(spark):
    """bin_width quantization: bounded state for continuous rasters;
    median within one bin of the exact median, variety == #bins."""
    rng = np.random.default_rng(1)
    data = rng.uniform(0, 100, (20, 20))
    zones = spark.createDataFrame([("z0", SQ)], ["zone_id", "geometry"])
    tiles = tiles_from_array(spark, data, tile=7)
    r = exact_extract(zones, tiles, [
        "med_exact=median", "med_b=median(bin_width=5)",
        "var_exact=variety", "var_b=variety(bin_width=5)"]).collect()[0]
    assert r["var_exact"] > 300          # ~every interior cell distinct
    assert r["var_b"] <= 20              # 100/5 bins
    assert abs(r["med_b"] - r["med_exact"]) <= 5.0
