"""Cleaning operators: null-token normalization, null scan, fills,
ffill/bfill, linear interpolation — reference parity per SURVEY §2.2/§2.4/§2.5.

Reference semantics reproduced:
- null tokens {'none','n/a','na','nan','missing','?','',' '} → null
  (interface/apis.py:103-108 anchored word tokens, literal specials)
- per-column null scan sorted desc (operations/api.py:685-699)
- mean/median/mode fills (operations/api.py:943-960)
- pandas ``interpolate()`` chain: linear over row order, then ffill, then
  bfill (interface/apis.py:211-216) — reimplemented as window expressions
  (interior gaps linear, trailing nulls carry last value, leading nulls
  back-filled), no per-row Python.

Scale notes: fills compute their statistics in ONE aggregate pass and
apply them as literal expressions (no second shuffle); interpolation is a
single window spec per key — one shuffle, reused across all columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: interface/apis.py:103-108
NULL_WORD_TOKENS = ("none", "n/a", "na", "nan", "missing")
NULL_LITERAL_TOKENS = ("?", "", " ")


def normalize_null_tokens(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Replace the reference's null-token set with real nulls on string
    columns (P5). Case-insensitive whole-string match for word tokens,
    literal match for '?', '', ' '."""
    cols = cols or [c for c, t in df.dtypes if t == "string"]
    out = df
    for c in cols:
        is_nullish = F.lower(F.col(c)).isin(*NULL_WORD_TOKENS) | F.col(c).isin(
            *NULL_LITERAL_TOKENS
        )
        out = out.withColumn(c, F.when(is_nullish, F.lit(None)).otherwise(F.col(c)))
    return out


def null_scan(df: DataFrame) -> DataFrame:
    """Per-column missing counts, columns with missing>0, sorted desc —
    reference A1 (operations/api.py:685-699). One aggregate pass."""
    row = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in df.columns]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("column_name"), F.col(c).alias("missing_count"))
            for c in df.columns
        ]
    )
    return (
        row.select(F.explode(pairs).alias("p"))
        .select("p.*")
        .filter(F.col("missing_count") > 0)
        .orderBy(F.col("missing_count").desc(), F.col("column_name"))
    )


def fill_stats(
    df: DataFrame,
    numeric_cols: list[str],
    categorical_cols: list[str],
    exact: bool = False,
) -> dict:
    """Mean/median for numeric, mode for categorical, in minimal passes
    (reference A4/A5: df.mean()/df.median()/Series.mode()[0]). ``exact``
    uses interpolated exact percentiles (pandas median parity) instead of
    the one-pass sketch — parity tests only; the sketch is the scale path."""
    pctl = "percentile" if exact else "percentile_approx"
    stats: dict[str, float | str] = {}
    if numeric_cols:
        aggs = []
        for c in numeric_cols:
            aggs.append(F.avg(c).alias(f"{c}__mean"))
            aggs.append(F.expr(f"{pctl}(`{c}`, 0.5)").alias(f"{c}__median"))
        row = df.agg(*aggs).first()
        for c in numeric_cols:
            stats[f"{c}__mean"] = row[f"{c}__mean"]
            stats[f"{c}__median"] = row[f"{c}__median"]
    for c in categorical_cols:
        # mode with deterministic tie-break (count desc, value asc) —
        # pandas Series.mode()[0] is the smallest of the modes
        m = (
            df.filter(F.col(c).isNotNull())
            .groupBy(c)
            .count()
            .orderBy(F.col("count").desc(), F.col(c).asc())
            .first()
        )
        stats[f"{c}__mode"] = None if m is None else m[c]
    return stats


def fill_nulls(
    df: DataFrame,
    numeric_strategy: str = "mean",
    numeric_cols: list[str] | None = None,
    categorical_cols: list[str] | None = None,
    exact: bool = False,
) -> DataFrame:
    """SimpleImputer parity (M10): numeric mean/median, categorical mode."""
    num_types = {"int", "bigint", "double", "float", "smallint", "tinyint"}
    if numeric_cols is None:
        numeric_cols = [c for c, t in df.dtypes if t in num_types]
    if categorical_cols is None:
        categorical_cols = [c for c, t in df.dtypes if t == "string"]
    stats = fill_stats(df, numeric_cols, categorical_cols, exact=exact)
    out = df
    for c in numeric_cols:
        v = stats[f"{c}__{'mean' if numeric_strategy == 'mean' else 'median'}"]
        if v is not None:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    for c in categorical_cols:
        v = stats[f"{c}__mode"]
        if v is not None:
            out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


def _order_window(key: str | None, order: str):
    if key:
        return Window.partitionBy(key).orderBy(order)
    return Window.partitionBy().orderBy(order)


def ffill(df: DataFrame, cols: list[str], key: str | None, order: str) -> DataFrame:
    """W2: last(ignorenulls) over unbounded-preceding frame."""
    w = _order_window(key, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def bfill(df: DataFrame, cols: list[str], key: str | None, order: str) -> DataFrame:
    """W2 symmetric: first(ignorenulls) over unbounded-following frame."""
    w = _order_window(key, order).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    out = df
    for c in cols:
        out = out.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return out


def interpolate_linear(
    df: DataFrame,
    cols: list[str],
    key: str | None = None,
    order: str = "__row_order",
    then_ffill_bfill: bool = True,
) -> DataFrame:
    """pandas ``df.interpolate()`` parity (W1, interface/apis.py:211-216):
    linear over row order for interior gaps; trailing nulls carry the last
    value (pandas limit_direction='forward'); leading nulls stay null
    unless ``then_ffill_bfill`` (the reference chains ffill+bfill after).

    Window algebra: for each null row locate (prev value, prev position)
    and (next value, next position) via last/first(ignorenulls) over
    one-sided frames, then blend linearly on position distance.
    """
    wb = _order_window(key, order).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = _order_window(key, order).rowsBetween(Window.currentRow, Window.unboundedFollowing)
    wn = _order_window(key, order)
    out = df.withColumn("__pos", F.row_number().over(wn).cast("double"))

    for c in cols:
        val = F.col(c).cast("double")
        prev_v = F.last(val, ignorenulls=True).over(wb)
        prev_p = F.last(F.when(val.isNotNull(), F.col("__pos")), ignorenulls=True).over(wb)
        next_v = F.first(val, ignorenulls=True).over(wf)
        next_p = F.first(F.when(val.isNotNull(), F.col("__pos")), ignorenulls=True).over(wf)
        interior = prev_v + (next_v - prev_v) * (F.col("__pos") - prev_p) / (next_p - prev_p)
        filled = (
            F.when(val.isNotNull(), val)
            .when(prev_v.isNotNull() & next_v.isNotNull(), interior)
            .when(prev_v.isNotNull(), prev_v)  # trailing → ffill (pandas default)
        )
        if then_ffill_bfill:
            filled = F.coalesce(filled, next_v)  # leading → bfill (apis.py:216)
        out = out.withColumn(c, filled)
    return out.drop("__pos")


def drop_outlier_rows_iqr(
    df: DataFrame, cols: list[str], k: float = 1.5, exact: bool = False
) -> DataFrame:
    """Distributed stand-in for the reference's LocalOutlierFactor masking
    (M9, interface/apis.py:187-192 — LOF is not exactly distributable;
    SURVEY §7 'what's hard' #2): Tukey-fence outlier filter using
    percentile bounds computed in one pass (``exact`` uses interpolated
    exact percentiles for parity tests; the sketch is the scale path).
    Exact LOF parity for small frames lives in the pandas-UDF path (see
    transforms.lof_mask)."""
    pctl = "percentile" if exact else "percentile_approx"
    aggs = []
    for c in cols:
        aggs.append(F.expr(f"{pctl}(`{c}`, 0.25)").alias(f"{c}__q1"))
        aggs.append(F.expr(f"{pctl}(`{c}`, 0.75)").alias(f"{c}__q3"))
    row = df.agg(*aggs).first()
    cond = F.lit(True)
    for c in cols:
        q1, q3 = row[f"{c}__q1"], row[f"{c}__q3"]
        if q1 is None or q3 is None:
            continue
        iqr = q3 - q1
        cond = cond & (
            F.col(c).isNull()
            | F.col(c).between(q1 - k * iqr, q3 + k * iqr)
        )
    return df.filter(cond)
