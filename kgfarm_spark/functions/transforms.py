"""Transformation operators: scalers, encoders, unary transforms — the
reference's M16/F4-F6 appliers (interface/apis.py:40-100, 363-418;
operations/api.py:400-447) as aggregate-stat expressions.

Fit/transform discipline: ``fit_*`` computes statistics on one DataFrame
(train) and returns a params dict; ``apply_*`` applies them to any
DataFrame (test) — fixing the reference's fit-on-test OHE quirk
(apis.py:333-345; north_rule demands zero leakage).

Scale notes: every scaler is ONE aggregate pass (fit) + a codegen'd
column expression (transform) — no shuffle in the transform. Quantile
transform at scale is a percent_rank window (ties share mass); encoders
build a dictionary DataFrame and broadcast-join it.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

EPS = 1e-4  # the reference's unary-transform epsilon (interface/apis.py:63-84)


# ---------------------------------------------------------------------------
# Scalers (fit → params dict → apply)
# ---------------------------------------------------------------------------


def fit_standard_scaler(df: DataFrame, cols: list[str]) -> dict:
    """(x - mean) / std, population std (sklearn StandardScaler ddof=0)."""
    aggs = []
    for c in cols:
        aggs.append(F.avg(c).alias(f"{c}__mean"))
        aggs.append(F.stddev_pop(c).alias(f"{c}__std"))
    row = df.agg(*aggs).first()
    return {c: {"mean": row[f"{c}__mean"], "std": row[f"{c}__std"]} for c in cols}


def apply_standard_scaler(df: DataFrame, params: dict) -> DataFrame:
    out = df
    for c, p in params.items():
        std = p["std"] if p["std"] else 1.0  # sklearn: zero-variance → 1
        out = out.withColumn(c, (F.col(c) - F.lit(p["mean"])) / F.lit(std))
    return out


def fit_minmax_scaler(df: DataFrame, cols: list[str]) -> dict:
    aggs = []
    for c in cols:
        aggs.append(F.min(c).alias(f"{c}__min"))
        aggs.append(F.max(c).alias(f"{c}__max"))
    row = df.agg(*aggs).first()
    return {c: {"min": row[f"{c}__min"], "max": row[f"{c}__max"]} for c in cols}


def apply_minmax_scaler(df: DataFrame, params: dict) -> DataFrame:
    out = df
    for c, p in params.items():
        rng = (p["max"] - p["min"]) or 1.0
        out = out.withColumn(c, (F.col(c) - F.lit(p["min"])) / F.lit(rng))
    return out


def fit_robust_scaler(df: DataFrame, cols: list[str], exact: bool = False) -> dict:
    """(x - median) / IQR (sklearn RobustScaler). percentile_approx by
    default (one-pass at scale); exact percentiles for parity tests."""
    fn = "percentile" if exact else "percentile_approx"
    aggs = []
    for c in cols:
        aggs.append(F.expr(f"{fn}(`{c}`, 0.5)").alias(f"{c}__med"))
        aggs.append(F.expr(f"{fn}(`{c}`, 0.25)").alias(f"{c}__q1"))
        aggs.append(F.expr(f"{fn}(`{c}`, 0.75)").alias(f"{c}__q3"))
    row = df.agg(*aggs).first()
    return {
        c: {"median": row[f"{c}__med"], "iqr": row[f"{c}__q3"] - row[f"{c}__q1"]}
        for c in cols
    }


def apply_robust_scaler(df: DataFrame, params: dict) -> DataFrame:
    out = df
    for c, p in params.items():
        iqr = p["iqr"] or 1.0
        out = out.withColumn(c, (F.col(c) - F.lit(p["median"])) / F.lit(iqr))
    return out


def quantile_rank_transform(df: DataFrame, cols: list[str]) -> DataFrame:
    """Scale path for the reference's QuantileTransformer (M16): map each
    value to its quantile via percent_rank — a window over value order.
    (Exact sklearn parity needs the full sorted reference set; SURVEY §7
    'what's hard' #2 documents this approximation.)"""
    out = df
    for c in cols:
        w = Window.partitionBy().orderBy(F.col(c).asc())
        out = out.withColumn(c, F.percent_rank().over(w))
    return out


def fit_quantile_transformer(
    df: DataFrame, cols: list[str], n_quantiles: int = 100
) -> dict:
    """Leakage-free QuantileTransformer (M16, sklearn shape): FIT learns an
    n_quantiles reference grid per column on the train frame (one
    percentile_approx pass for all columns); APPLY maps any frame's values
    to [0,1] by piecewise-linear interpolation against that grid — test
    rows never influence the mapping (north_rule zero-leakage; fixes the
    reference's fit-on-concat quirks, apis.py:328-331)."""
    qs = [i / (n_quantiles - 1) for i in range(n_quantiles)]
    qlist = "array(" + ",".join(str(q) for q in qs) + ")"
    aggs = [
        F.expr(f"percentile_approx(`{c}`, {qlist}, 10000)").alias(c) for c in cols
    ]
    row = df.agg(*aggs).first()
    return {c: [float(v) for v in row[c]] for c in cols}


def apply_quantile_transformer(df: DataFrame, params: dict) -> DataFrame:
    """np.interp against the fitted grid inside an Arrow-batched pandas
    UDF (vectorized; grids are tiny literals closed over per column)."""
    from pyspark.sql.functions import pandas_udf

    def make_udf(grid):
        g = np.asarray(grid, dtype=np.float64)
        pos = np.linspace(0.0, 1.0, len(g))

        @pandas_udf("double")
        def q_map(s: pd.Series) -> pd.Series:
            return pd.Series(np.interp(s.to_numpy(dtype=np.float64), g, pos))

        return q_map

    out = df
    for c, grid in params.items():
        out = out.withColumn(c, make_udf(grid)(F.col(c).cast("double")))
    return out


def _yeo_johnson_np(x, lam: float):
    """numpy Yeo-Johnson ψ(x, λ) — used for the fit and as the test twin."""
    import numpy as np

    pos = x >= 0
    out = np.empty_like(x, dtype=np.float64)
    if abs(lam) > 1e-12:
        out[pos] = ((x[pos] + 1.0) ** lam - 1.0) / lam
    else:
        out[pos] = np.log1p(x[pos])
    if abs(lam - 2.0) > 1e-12:
        out[~pos] = -(((-x[~pos] + 1.0) ** (2.0 - lam)) - 1.0) / (2.0 - lam)
    else:
        out[~pos] = -np.log1p(-x[~pos])
    return out


def fit_power_transformer(
    df: DataFrame, cols: list[str], sample_limit: int = 100_000
) -> dict:
    """PowerTransformer (Yeo-Johnson) λ fit — M16's last member. λ is a
    1-D MLE, not distributable exactly; per SURVEY §7 'what's hard' #2 the
    fit runs driver-side on a deterministic hash-ordered sample capped at
    ``sample_limit`` rows (the reference also samples before recommending,
    operations/api.py:309-313). Golden-section search maximizes the
    Yeo-Johnson profile log-likelihood LL(λ) = −n/2·log σ²(ψ) +
    (λ−1)·Σ sign(x)·log(|x|+1). The APPLY side is a pure column
    expression — no Python at transform time."""
    import numpy as np

    params = {}
    for c in cols:
        vals_df = df.select(F.col(c).cast("double").alias("v")).filter(
            F.col("v").isNotNull()
        )
        sampled = (
            vals_df.withColumn("__h", F.md5(F.col("v").cast("string")))
            .orderBy("__h")
            .limit(sample_limit)
        )
        x = np.array([r["v"] for r in sampled.collect()], dtype=np.float64)
        if len(x) < 2:
            params[c] = 1.0
            continue

        const = np.sum(np.sign(x) * np.log1p(np.abs(x)))

        def nll(lam):
            t = _yeo_johnson_np(x, lam)
            var = t.var()
            if var <= 0 or not np.isfinite(var):
                return np.inf
            return 0.5 * len(x) * np.log(var) - (lam - 1.0) * const

        lo, hi = -5.0, 5.0
        phi = (np.sqrt(5.0) - 1.0) / 2.0
        a, b = lo, hi
        c1, c2 = b - phi * (b - a), a + phi * (b - a)
        f1, f2 = nll(c1), nll(c2)
        for _ in range(80):
            if f1 < f2:
                b, c2, f2 = c2, c1, f1
                c1 = b - phi * (b - a)
                f1 = nll(c1)
            else:
                a, c1, f1 = c1, c2, f2
                c2 = a + phi * (b - a)
                f2 = nll(c2)
        params[c] = round(float((a + b) / 2.0), 6)
    return params


def apply_power_transformer(df: DataFrame, params: dict) -> DataFrame:
    """Yeo-Johnson with fitted λ as a codegen'd column expression."""
    out = df
    for c, lam in params.items():
        x = F.col(c).cast("double")
        if abs(lam) > 1e-12:
            pos_expr = (F.pow(x + 1.0, F.lit(lam)) - 1.0) / F.lit(lam)
        else:
            pos_expr = F.log1p(x)
        if abs(lam - 2.0) > 1e-12:
            neg_expr = -(F.pow(-x + 1.0, F.lit(2.0 - lam)) - 1.0) / F.lit(2.0 - lam)
        else:
            neg_expr = -F.log1p(-x)
        out = out.withColumn(c, F.when(x >= 0, pos_expr).otherwise(neg_expr))
    return out


# ---------------------------------------------------------------------------
# Unary transforms (F4-F6; exact reference shape incl. epsilon and
# column-min shift — interface/apis.py:63-84)
# ---------------------------------------------------------------------------


def _col_mins(df: DataFrame, cols: list[str]) -> dict:
    row = df.agg(*[F.min(c).alias(c) for c in cols]).first()
    return {c: row[c] for c in cols}


def log_transform(df: DataFrame, cols: list[str]) -> DataFrame:
    """log(x + |min(x)| + 1e-4) — min over the COLUMN (apis.py:63-71)."""
    mins = _col_mins(df, cols)
    out = df
    for c in cols:
        out = out.withColumn(c, F.log(F.col(c) + abs(mins[c]) + EPS))
    return out


def sqrt_transform(df: DataFrame, cols: list[str]) -> DataFrame:
    """sqrt(x + |min(x)| + 1e-4) (apis.py:73-81)."""
    mins = _col_mins(df, cols)
    out = df
    for c in cols:
        out = out.withColumn(c, F.sqrt(F.col(c) + abs(mins[c]) + EPS))
    return out


def square_transform(df: DataFrame, cols: list[str]) -> DataFrame:
    """np.square (apis.py:82-84)."""
    out = df
    for c in cols:
        out = out.withColumn(c, F.pow(F.col(c), 2))
    return out


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


def fit_ordinal_encoder(df: DataFrame, cols: list[str]) -> dict:
    """sklearn OrdinalEncoder parity: categories sorted ascending get codes
    0..k-1. Dictionary per column built distributed, collected (dictionaries
    are small by definition), applied as a broadcast-join-free literal map
    when tiny or a broadcast join otherwise."""
    params = {}
    for c in cols:
        vals = [
            r[c]
            for r in df.select(c).filter(F.col(c).isNotNull()).distinct().orderBy(c).collect()
        ]
        params[c] = {v: i for i, v in enumerate(vals)}
    return params


def apply_ordinal_encoder(df: DataFrame, params: dict) -> DataFrame:
    out = df
    for c, mapping in params.items():
        expr = None
        for v, code in mapping.items():
            cond = F.col(c) == F.lit(v)
            expr = F.when(cond, code) if expr is None else expr.when(cond, code)
        out = out.withColumn(c, expr.otherwise(F.lit(None)).cast("int") if expr is not None else F.lit(None).cast("int"))
    return out


def one_hot_encode(
    df: DataFrame, cols: list[str], max_distinct: int = 5, categories: dict | None = None
) -> tuple[DataFrame, dict]:
    """OHE with the reference's cardinality guard (≤5 distinct,
    operations/api.py:296-305): emits <col>_<value> 0/1 columns, drops the
    original. ``categories`` (from a fit frame) makes transform leakage-free
    (handle_unknown='ignore': unseen values → all zeros, apis.py:340)."""
    cats = categories or {}
    out = df
    for c in cols:
        if c not in cats:
            vals = [
                r[c]
                for r in df.select(c).filter(F.col(c).isNotNull()).distinct().orderBy(c).collect()
            ]
            if len(vals) > max_distinct:
                continue
            cats[c] = vals
        for v in cats[c]:
            out = out.withColumn(
                f"{c}_{v}", (F.col(c) == F.lit(v)).cast("int")
            )
        out = out.drop(c)
    return out, cats
