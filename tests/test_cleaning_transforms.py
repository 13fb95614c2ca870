"""Cleaning + transform parity vs a tiny pandas reference implementation
(SURVEY §5.2.2 — exact reference semantics as in-test oracle)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from kgfarm_spark.functions.cleaning import (
    bfill,
    ffill,
    fill_nulls,
    interpolate_linear,
    normalize_null_tokens,
    null_scan,
)
from kgfarm_spark.functions.selection import (
    anova_f_scores,
    pearson_corr_matrix,
    prune_correlated,
)
from kgfarm_spark.functions.transforms import (
    apply_standard_scaler,
    fit_ordinal_encoder,
    apply_ordinal_encoder,
    fit_standard_scaler,
    log_transform,
)


def test_interpolate_matches_pandas(spark):
    """pandas df.interpolate() then ffill then bfill — the reference
    cleaning chain (interface/apis.py:211-216)."""
    vals = [None, 1.0, None, None, 7.0, None, 4.0, None]
    pdf = pd.DataFrame({"i": range(len(vals)), "x": vals})
    expected = pdf["x"].interpolate().ffill().bfill().tolist()

    df = spark.createDataFrame(pdf.astype({"i": "int64"}), "i long, x double")
    out = interpolate_linear(df, ["x"], key=None, order="i").orderBy("i").collect()
    got = [r["x"] for r in out]
    assert np.allclose(got, expected), (got, expected)


def test_interpolate_leading_trailing(spark):
    vals = [None, None, 2.0, 4.0, None, None]
    pdf = pd.DataFrame({"i": range(len(vals)), "x": vals})
    expected = pdf["x"].interpolate().ffill().bfill().tolist()
    df = spark.createDataFrame(pdf.astype({"i": "int64"}), "i long, x double")
    got = [r["x"] for r in interpolate_linear(df, ["x"], key=None, order="i").orderBy("i").collect()]
    assert np.allclose(got, expected)


def test_ffill_bfill_per_key(spark):
    df = spark.createDataFrame(
        [("a", 0, None), ("a", 1, 5.0), ("a", 2, None), ("b", 0, None)],
        "k string, i int, x double",
    )
    f = {(r["k"], r["i"]): r["x"] for r in ffill(df, ["x"], "k", "i").collect()}
    assert f[("a", 2)] == 5.0 and f[("a", 0)] is None and f[("b", 0)] is None
    b = {(r["k"], r["i"]): r["x"] for r in bfill(df, ["x"], "k", "i").collect()}
    assert b[("a", 0)] == 5.0 and b[("a", 2)] is None


def test_normalize_and_null_scan(spark):
    df = spark.createDataFrame(
        [("NA", 1.0), ("ok", None), (" ", 2.0), ("NoNe", 3.0), ("val", 4.0)],
        "s string, x double",
    )
    norm = normalize_null_tokens(df)
    scan = {r["column_name"]: r["missing_count"] for r in null_scan(norm).collect()}
    assert scan == {"s": 3, "x": 1}


def test_fill_nulls_mean_and_mode(spark):
    df = spark.createDataFrame(
        [(1.0, "a"), (3.0, None), (None, "b"), (None, "a")],
        "x double, c string",
    )
    out = fill_nulls(df).collect()
    xs = sorted(r["x"] for r in out)
    assert xs == [1.0, 2.0, 2.0, 3.0]
    cs = [r["c"] for r in out]
    assert cs.count("a") == 3  # mode fill, smallest-mode tie-break


def test_standard_scaler_matches_sklearn_formula(spark):
    data = [float(v) for v in [1, 2, 3, 4, 100]]
    df = spark.createDataFrame([(v,) for v in data], "x double")
    params = fit_standard_scaler(df, ["x"])
    out = sorted(r["x"] for r in apply_standard_scaler(df, params).collect())
    mean = np.mean(data)
    std = np.std(data)  # ddof=0, sklearn StandardScaler
    assert np.allclose(out, sorted((np.array(data) - mean) / std))


def test_log_transform_reference_shape(spark):
    """log(x + |min| + 1e-4) with min over the column (apis.py:63-71)."""
    data = [-2.0, 0.0, 5.0]
    df = spark.createDataFrame([(v,) for v in data], "x double")
    out = sorted(r["x"] for r in log_transform(df, ["x"]).collect())
    expected = sorted(math.log(v + 2.0 + 1e-4) for v in data)
    assert np.allclose(out, expected)


def test_ordinal_encoder_fit_transform_leakproof(spark):
    train = spark.createDataFrame([("b",), ("a",), ("c",)], "c string")
    test = spark.createDataFrame([("a",), ("zz",)], "c string")
    params = fit_ordinal_encoder(train, ["c"])
    out = {r["c"] for r in apply_ordinal_encoder(test, params).collect()}
    assert out == {0, None}  # unseen 'zz' → null, not a new code


def test_anova_f_matches_numpy(spark):
    rng = np.random.RandomState(7)
    y = rng.randint(0, 3, 300)
    x1 = y * 2.0 + rng.randn(300)          # informative
    x2 = rng.randn(300)                    # noise
    pdf = pd.DataFrame({"y": y, "x1": x1, "x2": x2})
    df = spark.createDataFrame(pdf)
    scores = anova_f_scores(df, ["x1", "x2"], "y")

    def f_classif_one(x, y):
        classes = np.unique(y)
        n, k = len(x), len(classes)
        grand = x.mean()
        ssb = sum(len(x[y == c]) * (x[y == c].mean() - grand) ** 2 for c in classes)
        ssw = sum(((x[y == c] - x[y == c].mean()) ** 2).sum() for c in classes)
        return (ssb / (k - 1)) / (ssw / (n - k))

    assert np.isclose(scores["x1"], f_classif_one(x1, y), rtol=1e-8)
    assert np.isclose(scores["x2"], f_classif_one(x2, y), rtol=1e-8)
    assert scores["x1"] > scores["x2"]


def test_corr_prune_keeps_higher_scored(spark):
    rng = np.random.RandomState(3)
    a = rng.randn(200)
    pdf = pd.DataFrame({"a": a, "b": a * 1.001 + 1e-6 * rng.randn(200), "c": rng.randn(200)})
    df = spark.createDataFrame(pdf)
    corr = pearson_corr_matrix(df, ["a", "b", "c"])
    assert corr[("a", "b")] > 0.99
    kept = prune_correlated({"a": 2.0, "b": 1.0, "c": 0.5}, corr)
    assert kept == ["a", "c"]


def test_quantile_transformer_fit_apply_leakfree(spark):
    import numpy as np

    from kgfarm_spark.functions.transforms import (
        apply_quantile_transformer,
        fit_quantile_transformer,
    )

    train = spark.range(1000).select((F.col("id").cast("double")).alias("v"))
    test = spark.createDataFrame(
        [(-50.0,), (0.0,), (499.5,), (999.0,), (2000.0,)], "v double"
    )
    params = fit_quantile_transformer(train, ["v"], n_quantiles=101)
    got = [r["v"] for r in apply_quantile_transformer(test, params).collect()]
    expected = np.interp(
        [-50.0, 0.0, 499.5, 999.0, 2000.0],
        np.asarray(params["v"]),
        np.linspace(0, 1, 101),
    )
    np.testing.assert_allclose(got, expected, rtol=1e-9)
    assert got[0] == 0.0 and got[-1] == 1.0  # clipping outside train range
    assert abs(got[2] - 0.5) < 0.02  # median of train maps near 0.5


def test_power_transformer_yeo_johnson(spark):
    import numpy as np

    from kgfarm_spark.functions.transforms import (
        _yeo_johnson_np,
        apply_power_transformer,
        fit_power_transformer,
    )

    # heavily right-skewed data → λ well below 1 (log-like correction)
    rng = np.random.default_rng(3)
    x = np.exp(rng.normal(0, 1, 800))
    df = spark.createDataFrame([(float(v),) for v in x], "v double")
    params = fit_power_transformer(df, ["v"])
    lam = params["v"]
    assert lam < 0.5

    # Spark expression equals the numpy twin at the fitted λ
    got = np.array(
        [r["v"] for r in apply_power_transformer(df, params).orderBy("v").collect()]
    )
    expected = np.sort(_yeo_johnson_np(np.asarray(x, dtype=np.float64), lam))
    np.testing.assert_allclose(got, expected, rtol=1e-9)

    # the transform reduces skewness toward symmetry
    def skew(a):
        a = (a - a.mean()) / a.std()
        return float((a**3).mean())

    assert abs(skew(expected)) < abs(skew(x)) / 5


def test_power_transformer_identity_on_symmetric(spark):
    import numpy as np

    from kgfarm_spark.functions.transforms import fit_power_transformer

    rng = np.random.default_rng(4)
    x = rng.normal(0, 1, 800)
    df = spark.createDataFrame([(float(v),) for v in x], "v double")
    lam = fit_power_transformer(df, ["v"])["v"]
    assert 0.7 < lam < 1.3  # near-identity for already-normal data
