"""Custom Python-op (UDF) surface — contract transcribed from the
reference (test_exact_extract.py:1277-1472)."""

import numpy as np
import pytest

ARANGE9 = np.arange(1, 10, dtype=np.int32).reshape(3, 3)
SQ = "POLYGON ((0.5 0.5, 2.5 0.5, 2.5 2.5, 0.5 2.5, 0.5 0.5))"


def test_custom_function_matches_builtin(extract_mem):
    def py_mean(values, coverage):
        return float(np.average(values, weights=coverage))

    r = extract_mem(ARANGE9, SQ, ["mean", py_mean])
    assert r["py_mean"] == pytest.approx(r["mean"])


def test_custom_weighted_function(extract_mem):
    w = np.sqrt(np.arange(9, dtype=np.float64)).reshape(3, 3)

    def py_weighted_mean(values, coverage, weights):
        return float(np.average(values, weights=coverage * weights))

    r = extract_mem(ARANGE9, SQ, ["weighted_mean", py_weighted_mean], weights=w)
    assert r["py_weighted_mean"] == pytest.approx(r["weighted_mean"])


def test_custom_function_gets_masked_array(extract_mem):
    def probe(values, coverage):
        # encode (is-masked-array, n_values, n_cov) in the return value
        ok = 1 if type(values).__name__ == "MaskedArray" else 0
        return float(ok * 1000 + len(values) * 10 + len(coverage) % 10)

    r = extract_mem(ARANGE9, SQ, [probe])
    assert r["probe"] == 1099.0  # masked array, 9 values, 9 coverages


def test_custom_function_not_called_for_missing(extract_mem, spark):
    calls = []

    def probe(values, coverage):
        calls.append(len(values))
        return 1.0

    rows = extract_mem(ARANGE9, {
        "in": SQ,
        "out": "POLYGON ((50 50, 51 50, 51 51, 50 51, 50 50))"}, [probe])
    assert rows["out"]["probe"] is None
    assert rows["in"]["probe"] == 1.0


def test_custom_function_array_return(extract_mem):
    from exactextract_spark.ops import wrap_callable

    def first3(values, coverage):
        return np.asarray(values[:3], dtype=np.float64)

    op = wrap_callable(first3, result_type="array<double>")
    r = extract_mem(ARANGE9, SQ, [op])
    assert list(r["first3"]) == [1.0, 2.0, 3.0]


def test_custom_function_bad_signature():
    from exactextract_spark.ops import wrap_callable

    for bad in (lambda: 1, lambda a: 1, lambda a, b, c, d: 1):
        with pytest.raises(ValueError, match="must take 2 or 3 argument"):
            wrap_callable(bad)


def test_custom_function_missing_weights():
    from exactextract_spark.ops import wrap_callable

    def f(a, b, c):
        return 1

    with pytest.raises(ValueError, match="No weights provided"):
        wrap_callable(f)


def test_custom_function_error_propagates(extract_mem):
    def boom(values, coverage):
        raise RuntimeError("errors are propagated")

    with pytest.raises(Exception, match="errors are propagated"):
        extract_mem(ARANGE9, SQ, [boom])
