"""Oracle-checked queries: window fills/interpolation, robust/quantile
scaling, unary transforms, IQR outlier filter, mutual information,
join discovery, set ops, sampling/rebalancing, task typing
(SURVEY §2.3/§2.4/§2.5/§2.7/§2.9 families not covered by entry_profiling).

Registered into kgfarm_spark.entry_queries.QUERIES/ORACLES at import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgfarm_spark.entry_queries import _cte, register
from kgfarm_spark.functions.cleaning import (
    bfill,
    drop_outlier_rows_iqr,
    ffill,
    fill_nulls,
    interpolate_linear,
)
from kgfarm_spark.functions.profiling import discover_joins, task_type
from kgfarm_spark.functions.sampling import deterministic_sample, rebalance_classes
from kgfarm_spark.functions.selection import mutual_information_binned
from kgfarm_spark.functions.transforms import (
    apply_robust_scaler,
    fit_robust_scaler,
    quantile_rank_transform,
    sqrt_transform,
    square_transform,
)
from kgfarm_spark.sources.transcripts import load_table, oracle_ctes, transcripts


# ---------------------------------------------------------------------------
# W2: forward/backward fill as window expressions (interface/apis.py:214-216)
# ---------------------------------------------------------------------------


@register(
    "ffill_bfill_tool",
    oracle_ctes()
    + """
SELECT conv_id, turn_idx,
       coalesce(
         last_value(tool IGNORE NULLS) OVER
           (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         first_value(tool IGNORE NULLS) OVER
           (PARTITION BY conv_id ORDER BY turn_idx
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
       ) AS tool_filled
FROM transcripts
""",
)
def q_ffill_bfill(spark: SparkSession, sf: str) -> DataFrame:
    t = transcripts(spark, sf).select(
        "conv_id", "turn_idx", F.col("tool").alias("tool_filled")
    )
    out = ffill(t, ["tool_filled"], key="conv_id", order="turn_idx")
    out = bfill(out, ["tool_filled"], key="conv_id", order="turn_idx")
    return out


# ---------------------------------------------------------------------------
# W1: pandas interpolate() parity chain (linear → ffill → bfill,
# interface/apis.py:211-216) as pure window algebra
# ---------------------------------------------------------------------------


@register(
    "interpolate_series",
    oracle_ctes()
    + """
, s AS (
  SELECT conv_id, turn_idx,
         CASE WHEN turn_idx % 3 = 1 THEN NULL
              ELSE CAST(length(text) AS DOUBLE) END AS val
  FROM transcripts
), p AS (
  SELECT conv_id, turn_idx, val,
         CAST(row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
              AS DOUBLE) AS pos
  FROM s
), x AS (
  SELECT conv_id, turn_idx, val, pos,
    last_value(val IGNORE NULLS) OVER wb AS prev_v,
    last_value(CASE WHEN val IS NOT NULL THEN pos END IGNORE NULLS)
      OVER wb AS prev_p,
    first_value(val IGNORE NULLS) OVER wf AS next_v,
    first_value(CASE WHEN val IS NOT NULL THEN pos END IGNORE NULLS)
      OVER wf AS next_p
  FROM p
  WINDOW wb AS (PARTITION BY conv_id ORDER BY turn_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY conv_id ORDER BY turn_idx
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT conv_id, turn_idx,
       round(coalesce(
         CASE WHEN val IS NOT NULL THEN val
              WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                THEN prev_v + (next_v - prev_v) * (pos - prev_p)
                                                / (next_p - prev_p)
              WHEN prev_v IS NOT NULL THEN prev_v END,
         next_v), 4) AS val_interp
FROM x
""",
)
def q_interpolate(spark: SparkSession, sf: str) -> DataFrame:
    t = transcripts(spark, sf).select(
        "conv_id",
        "turn_idx",
        F.when(F.col("turn_idx") % 3 == 1, None)
        .otherwise(F.length("text").cast("double"))
        .alias("val"),
    )
    out = interpolate_linear(t, ["val"], key="conv_id", order="turn_idx")
    return out.select(
        "conv_id", "turn_idx", F.round("val", 4).alias("val_interp")
    )


# ---------------------------------------------------------------------------
# A4/A5/M10: median + mode fills (operations/api.py:943-960)
# ---------------------------------------------------------------------------


@register(
    "fill_median_mode",
    """
WITH holes AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal,
         CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS seg
  FROM customer
)
SELECT c_custkey,
       round(coalesce(bal, (SELECT quantile_cont(bal, 0.5) FROM holes)), 4)
         AS bal_filled,
       coalesce(seg, (SELECT seg FROM holes WHERE seg IS NOT NULL
                      GROUP BY seg ORDER BY count(*) DESC, seg ASC LIMIT 1))
         AS seg_filled
FROM holes
""",
)
def q_fill_median_mode(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
        F.when(F.col("c_custkey") % 11 == 0, None)
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    out = fill_nulls(
        cust,
        numeric_strategy="median",
        numeric_cols=["bal"],
        categorical_cols=["seg"],
        exact=True,
    )
    return out.select(
        "c_custkey",
        F.round("bal", 4).alias("bal_filled"),
        F.col("seg").alias("seg_filled"),
    )


# ---------------------------------------------------------------------------
# M16: robust scaler ((x - median) / IQR) and quantile-rank transform
# ---------------------------------------------------------------------------


@register(
    "robust_scale",
    """
WITH s AS (SELECT quantile_cont(c_acctbal, 0.5) med,
                  quantile_cont(c_acctbal, 0.75) - quantile_cont(c_acctbal, 0.25) iqr
           FROM customer)
SELECT c_custkey,
       round((c_acctbal - s.med) / s.iqr, 4) AS bal_scaled
FROM customer, s
""",
)
def q_robust_scale(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    params = fit_robust_scaler(cust, ["c_acctbal"], exact=True)
    out = apply_robust_scaler(cust, params)
    return out.select("c_custkey", F.round("c_acctbal", 4).alias("bal_scaled"))


@register(
    "quantile_rank",
    """
SELECT c_custkey,
       round(percent_rank() OVER (ORDER BY c_acctbal), 6) AS bal_qtile
FROM customer
""",
)
def q_quantile_rank(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_acctbal")
    out = quantile_rank_transform(cust, ["c_acctbal"])
    return out.select("c_custkey", F.round("c_acctbal", 6).alias("bal_qtile"))


# ---------------------------------------------------------------------------
# F5/F6: sqrt / square unary transforms (interface/apis.py:73-84)
# ---------------------------------------------------------------------------


@register(
    "sqrt_square_transform",
    """
WITH s AS (SELECT min(l_discount) mn FROM lineitem)
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_discount + abs(s.mn) + 0.0001), 4) AS discount_sqrt,
       round(l_tax * l_tax, 4) AS tax_squared
FROM lineitem, s
""",
)
def q_sqrt_square(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_discount", "l_tax"
    )
    out = sqrt_transform(li, ["l_discount"])
    out = square_transform(out, ["l_tax"])
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_discount", 4).alias("discount_sqrt"),
        F.round("l_tax", 4).alias("tax_squared"),
    )


# ---------------------------------------------------------------------------
# M9 (scale stand-in): Tukey-fence outlier row filter
# ---------------------------------------------------------------------------


@register(
    "iqr_outlier_filter",
    """
WITH s AS (SELECT quantile_cont(c_acctbal, 0.25) q1,
                  quantile_cont(c_acctbal, 0.75) q3 FROM customer)
SELECT c_custkey, round(c_acctbal, 4) AS bal
FROM customer, s
WHERE c_acctbal IS NULL
   OR c_acctbal BETWEEN s.q1 - 1.5 * (s.q3 - s.q1)
                    AND s.q3 + 1.5 * (s.q3 - s.q1)
""",
)
def q_iqr_outlier(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_acctbal")
    out = drop_outlier_rows_iqr(cust, ["c_acctbal"], k=1.5, exact=True)
    return out.select("c_custkey", F.round("c_acctbal", 4).alias("bal"))


# ---------------------------------------------------------------------------
# M15: binned mutual information (scale path of mutual_info_classif)
# ---------------------------------------------------------------------------


@register(
    "mutual_info_binned",
    """
WITH mm AS (SELECT min(l_quantity) mn, max(l_quantity) mx, count(*) n
            FROM lineitem),
b AS (SELECT least(floor((l_quantity - mm.mn) / ((mm.mx - mm.mn) / 10)), 9)
        AS bin, l_returnflag AS y
      FROM lineitem, mm WHERE l_quantity IS NOT NULL),
pxy AS (SELECT bin, y, CAST(count(*) AS DOUBLE) / (SELECT n FROM mm) AS p
        FROM b GROUP BY bin, y),
px AS (SELECT bin, sum(p) AS p FROM pxy GROUP BY bin),
py AS (SELECT y, sum(p) AS p FROM pxy GROUP BY y)
SELECT 'l_quantity' AS feature,
       round(greatest(sum(pxy.p * ln(pxy.p / (px.p * py.p))), 0.0), 4) AS mi
FROM pxy JOIN px USING (bin) JOIN py USING (y)
""",
)
def q_mutual_info(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    scores = mutual_information_binned(li, ["l_quantity"], "l_returnflag", bins=10)
    return spark.createDataFrame(
        [(c, round(v, 4)) for c, v in scores.items()], "feature string, mi double"
    )


# ---------------------------------------------------------------------------
# J4: join discovery (search_enrichment_options replacement)
# ---------------------------------------------------------------------------

# static schema enumeration for the oracle (reference-type-compatible
# candidate pairs over {region, nation, supplier}; region has < 3 columns
# so it is never a PK side — A13 gate)
_DISCOVER_PAIRS = [
    ("nation", "n_nationkey", "region", "r_regionkey"),
    ("nation", "n_nationkey", "supplier", "s_suppkey"),
    ("nation", "n_nationkey", "supplier", "s_nationkey"),
    ("nation", "n_name", "region", "r_name"),
    ("nation", "n_name", "supplier", "s_name"),
    ("supplier", "s_suppkey", "region", "r_regionkey"),
    ("supplier", "s_suppkey", "nation", "n_nationkey"),
    ("supplier", "s_suppkey", "nation", "n_regionkey"),
    ("supplier", "s_name", "region", "r_name"),
    ("supplier", "s_name", "nation", "n_name"),
]


def _discover_oracle() -> str:
    branches = []
    for pk_t, pk_c, fk_t, fk_c in _DISCOVER_PAIRS:
        branches.append(
            f"""
SELECT '{pk_t}' AS pk_table, '{pk_c}' AS pk_col,
       '{fk_t}' AS fk_table, '{fk_c}' AS fk_col,
       round(CAST((SELECT count(DISTINCT {fk_c}) FROM {fk_t}
                   WHERE {fk_c} IN (SELECT {pk_c} FROM {pk_t})) AS DOUBLE)
             / (SELECT count(DISTINCT {fk_c}) FROM {fk_t}), 6) AS joinability
WHERE (SELECT count(*) FILTER (WHERE {pk_c} IS NULL) FROM {pk_t}) = 0
  AND (SELECT CAST(count(DISTINCT {pk_c}) AS DOUBLE) / count(*)
       FROM {pk_t}) >= 0.95"""
        )
    return (
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(branches)
        + "\n) cand WHERE joinability >= 0.9"
    )


@register("discover_joins_small", _discover_oracle())
def q_discover_joins(spark: SparkSession, sf: str) -> DataFrame:
    tables = {
        name: load_table(spark, sf, name) for name in ("region", "nation", "supplier")
    }
    return discover_joins(spark, tables)


# ---------------------------------------------------------------------------
# O2/W4: sort + head top-k
# ---------------------------------------------------------------------------


@register(
    "topk_acctbal",
    """
SELECT c_custkey, round(c_acctbal, 4) AS bal
FROM customer
ORDER BY c_acctbal DESC, c_custkey ASC
LIMIT 20
""",
)
def q_topk(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    return (
        cust.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", F.round("c_acctbal", 4).alias("bal"))
    )


# ---------------------------------------------------------------------------
# U5/P4: anti join (unmapped = all − mapped); U2/U4: union + dedup
# ---------------------------------------------------------------------------


@register(
    "customers_without_big_orders",
    """
SELECT c_custkey FROM customer
WHERE c_custkey NOT IN (
  SELECT o_custkey FROM orders
  WHERE o_totalprice > 300000 AND o_custkey IS NOT NULL
)
""",
)
def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    big = load_table(spark, sf, "orders").filter(F.col("o_totalprice") > 300000)
    return cust.join(
        big, cust["c_custkey"] == big["o_custkey"], "left_anti"
    ).select("c_custkey")


@register(
    "union_nation_keys",
    """
SELECT DISTINCT nk FROM (
  SELECT c_nationkey AS nk FROM customer
  UNION ALL
  SELECT s_nationkey AS nk FROM supplier
) u
""",
)
def q_union_dedup(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load_table(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.unionByName(supp).distinct()


# ---------------------------------------------------------------------------
# A12: ML-task typing from target cardinality (interface/apis.py:118-126)
# ---------------------------------------------------------------------------


@register(
    "task_type_detection",
    """
SELECT 'is_positive_bal' AS target,
       CASE WHEN count(DISTINCT CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) = 2
              THEN 'binary'
            WHEN count(DISTINCT CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) > 2
             AND CAST(count(DISTINCT CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
                      AS DOUBLE) / count(*) < 0.5 THEN 'multiclass'
            ELSE 'regression' END AS task
FROM customer
UNION ALL
SELECT 'o_orderstatus',
       CASE WHEN count(DISTINCT o_orderstatus) = 2 THEN 'binary'
            WHEN count(DISTINCT o_orderstatus) > 2
             AND CAST(count(DISTINCT o_orderstatus) AS DOUBLE) / count(*) < 0.5
              THEN 'multiclass'
            ELSE 'regression' END
FROM orders
UNION ALL
SELECT 'c_acctbal',
       CASE WHEN count(DISTINCT c_acctbal) = 2 THEN 'binary'
            WHEN count(DISTINCT c_acctbal) > 2
             AND CAST(count(DISTINCT c_acctbal) AS DOUBLE) / count(*) < 0.5
              THEN 'multiclass'
            ELSE 'regression' END
FROM customer
""",
)
def q_task_type(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer")
    orders = load_table(spark, sf, "orders")
    binary_frame = cust.select(
        F.when(F.col("c_acctbal") > 0, 1).otherwise(0).alias("y")
    )
    rows = [
        ("is_positive_bal", task_type(binary_frame, "y")),
        ("o_orderstatus", task_type(orders, "o_orderstatus")),
        ("c_acctbal", task_type(cust, "c_acctbal")),
    ]
    return spark.createDataFrame(rows, "target string, task string")


# ---------------------------------------------------------------------------
# A11: deterministic class rebalancing (downsample to minority count)
# ---------------------------------------------------------------------------


@register(
    "class_rebalance",
    """
WITH counted AS (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_orderkey, l_linenumber) AS rn
  FROM lineitem
), mc AS (
  SELECT min(c) AS min_count FROM (
    SELECT count(*) AS c FROM lineitem GROUP BY l_returnflag
  ) t
)
SELECT l_returnflag, l_orderkey, l_linenumber
FROM counted, mc
WHERE rn <= mc.min_count
""",
)
def q_rebalance(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_linenumber"
    )
    return rebalance_classes(li, "l_returnflag", ["l_orderkey", "l_linenumber"])


# ---------------------------------------------------------------------------
# SURVEY §7 #4: partition-invariant deterministic sample
# ---------------------------------------------------------------------------


@register(
    "deterministic_sample",
    """
SELECT c_custkey FROM customer
ORDER BY md5(CAST(c_custkey AS VARCHAR))
LIMIT 100
""",
)
def q_det_sample(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").select("c_custkey")
    return deterministic_sample(cust, ["c_custkey"], 100)


# ---------------------------------------------------------------------------
# M10 completion: KNN imputation (interface/apis.py:218-224). The
# reference calls KNNImputer().fit_transform on ONE column reshaped to
# (-1, 1) — in 1-D every NaN row has zero observed features, so sklearn's
# documented fallback makes it EXACTLY mean imputation; the oracle pins
# that degenerate parity. The general multi-column kernel is
# pytest-twinned (tests/test_cleaning_transforms.py).
# ---------------------------------------------------------------------------


@register(
    "knn_impute_1d",
    """
WITH base AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 17 = 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer
), m AS (SELECT avg(bal) AS mean_bal FROM base)
SELECT c_custkey, round(coalesce(bal, m.mean_bal), 4) AS bal_imputed
FROM base, m
""",
)
def q_knn_impute_1d(spark: SparkSession, sf: str) -> DataFrame:
    from kgfarm_spark.functions.cleaning import knn_impute

    cust = load_table(spark, sf, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 17 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    out = knn_impute(cust, ["bal"], key=None, max_group_rows=200_000)
    return out.select("c_custkey", F.round("bal", 4).alias("bal_imputed"))


# ---------------------------------------------------------------------------
# M9 completion: LOF outlier masking (interface/apis.py:187-192) —
# non-SQL kernel, rows-only gate; exact-parity pytest twin lives in
# tests/test_cleaning_transforms.py.
# ---------------------------------------------------------------------------


@register("lof_outliers")
def q_lof_outliers(spark: SparkSession, sf: str) -> DataFrame:
    from kgfarm_spark.functions.cleaning import lof_mask

    cust = load_table(spark, sf, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    out = lof_mask(
        cust, ["c_acctbal"], n_neighbors=10, key="c_nationkey",
        max_group_rows=50_000,
    )
    return out.filter(F.col("is_outlier")).select("c_custkey").orderBy("c_custkey")


@register(
    "group_split",
    _cte(
        """
, u AS (
  SELECT conv_id, turn_idx,
         CAST('0x' || substr(md5(conv_id || '#split'), 1, 8) AS BIGINT)
           / 4294967296.0 AS u
  FROM transcripts
)
SELECT conv_id, turn_idx,
       CASE WHEN u < 0.05 THEN 'test'
            WHEN u < 0.95 THEN 'train'
            ELSE 'val' END AS split
FROM u
"""
    ),
)
def q_group_split(spark: SparkSession, sf: str) -> DataFrame:
    """Leakage-safe conversation-level split (sampling.group_split):
    every turn of a conversation lands in the same train/val/test split
    via md5-uniform group assignment — a pure projection, zero shuffle."""
    from kgfarm_spark.functions.sampling import group_split
    from kgfarm_spark.sources.transcripts import transcripts

    return group_split(
        transcripts(spark, sf), "conv_id",
        {"train": 0.9, "val": 0.05, "test": 0.05},
    ).select("conv_id", "turn_idx", "split")
