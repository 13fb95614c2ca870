"""Oracle-checked queries: profiling, entity detection, cleaning,
transforms, selection (SURVEY §2.2/§2.4/§2.8/§2.9 families).

Registered into kgfarm_spark.entry_queries.QUERIES/ORACLES at import.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgfarm_spark.entry_queries import register
from kgfarm_spark.functions.cleaning import (
    normalize_null_tokens,
    null_scan,
)
from kgfarm_spark.functions.profiling import (
    detect_entities,
    elect_default_entities,
    pkfk_features,
    profile_table,
)
from kgfarm_spark.functions.selection import anova_f_scores, pearson_corr_matrix
from kgfarm_spark.functions.transforms import (
    apply_minmax_scaler,
    apply_ordinal_encoder,
    apply_standard_scaler,
    fit_minmax_scaler,
    fit_ordinal_encoder,
    fit_standard_scaler,
    log_transform,
    one_hot_encode,
)
from kgfarm_spark.sources.transcripts import load_table, oracle_ctes

# table → columns with their reference types (for oracle generation)
_TPCH_PROFILE_TABLES = {
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "orders": [
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ],
    "nation": ["n_nationkey", "n_name", "n_regionkey"],
    "region": ["r_regionkey", "r_name"],
    "supplier": ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
}

_REF_TYPE_SQL = {
    "BIGINT": "N_int", "INTEGER": "N_int", "DOUBLE": "N_float",
    "VARCHAR": "T", "TIMESTAMP": "T_date",
}


def _profile_sql(table: str, cols: list[str]) -> str:
    """DuckDB oracle for profile_table(exact=True): one UNION ALL branch
    per column computing the same stats."""
    branches = []
    for c in cols:
        branches.append(
            f"""
SELECT '{table}' AS table_name, '{c}' AS column_name,
  CASE typeof(any_value({c}))
       WHEN 'BIGINT' THEN 'N_int' WHEN 'INTEGER' THEN 'N_int'
       WHEN 'DOUBLE' THEN 'N_float' WHEN 'FLOAT' THEN 'N_float'
       WHEN 'VARCHAR' THEN 'T' ELSE 'T_date' END AS data_type,
  count(*) AS total_count,
  count(DISTINCT {c}) AS distinct_count,
  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_count,
  CAST(min({c}) AS STRING) AS min_value,
  CAST(max({c}) AS STRING) AS max_value,
  round(CAST(count(DISTINCT {c}) AS DOUBLE) / count(*), 6) AS uniqueness
FROM {table}"""
        )
    return "\nUNION ALL\n".join(branches)


@register("profile_orders", _profile_sql("orders", _TPCH_PROFILE_TABLES["orders"]))
def q_profile_orders(spark: SparkSession, sf: str) -> DataFrame:
    out = profile_table(load_table(spark, sf, "orders"), "orders", exact=True)
    return out.withColumn("uniqueness", F.round("uniqueness", 6))


def _entities_oracle() -> str:
    profs = "\nUNION ALL\n".join(
        _profile_sql(t, cols) for t, cols in _TPCH_PROFILE_TABLES.items()
    )
    return f"""
WITH profiles AS ({profs}),
counted AS (
  SELECT p.*, count(*) OVER (PARTITION BY table_name) AS n_cols FROM profiles p
)
SELECT table_name, column_name, data_type, uniqueness,
       CASE WHEN data_type LIKE 'N%' THEN 'INT64' ELSE 'STRING' END AS value_type
FROM counted
WHERE n_cols >= 3 AND missing_count = 0 AND uniqueness >= 0.95
  AND data_type <> 'T_date'
"""


@register("detect_entities_tpch", _entities_oracle())
def q_detect_entities(spark: SparkSession, sf: str) -> DataFrame:
    profs = None
    for t, _ in _TPCH_PROFILE_TABLES.items():
        p = profile_table(load_table(spark, sf, t), t, exact=True)
        profs = p if profs is None else profs.unionByName(p)
    out = detect_entities(profs.withColumn("uniqueness", F.round("uniqueness", 6)))
    return out


def _default_entities_oracle() -> str:
    return f"""
WITH ents AS ({_entities_oracle()})
SELECT table_name, column_name AS default_entity, data_type, uniqueness, value_type
FROM ents
QUALIFY row_number() OVER (PARTITION BY table_name
                           ORDER BY uniqueness DESC, column_name ASC) = 1
"""


@register("elect_default_entities", _default_entities_oracle())
def q_elect_default_entities(spark: SparkSession, sf: str) -> DataFrame:
    return elect_default_entities(q_detect_entities(spark, sf))


@register(
    "null_scan_transcripts",
    oracle_ctes()
    + """
SELECT 'tool' AS column_name,
       CAST(sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS missing_count
FROM transcripts
HAVING sum(CASE WHEN tool IS NULL THEN 1 ELSE 0 END) > 0
""",
)
def q_null_scan(spark: SparkSession, sf: str) -> DataFrame:
    from kgfarm_spark.sources.transcripts import transcripts

    return null_scan(transcripts(spark, sf))


@register(
    "normalize_null_tokens",
    """
SELECT doc_id,
       CASE WHEN lower(dirty) IN ('none','n/a','na','nan','missing')
              OR dirty IN ('?','',' ')
            THEN NULL ELSE dirty END AS cleaned
FROM (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0 THEN 'N/A'
              WHEN doc_id % 5 = 1 THEN '?'
              WHEN doc_id % 5 = 2 THEN 'missing'
              ELSE lang END AS dirty
  FROM documents
) d
""",
)
def q_normalize_null_tokens(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    dirty = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0, "N/A")
        .when(F.col("doc_id") % 5 == 1, "?")
        .when(F.col("doc_id") % 5 == 2, "missing")
        .otherwise(F.col("lang"))
        .alias("dirty"),
    )
    return normalize_null_tokens(dirty, ["dirty"]).withColumnRenamed("dirty", "cleaned")


@register(
    "fill_mean",
    """
WITH holes AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 7 = 0 THEN NULL ELSE c_acctbal END AS bal
  FROM customer
)
SELECT c_custkey,
       round(coalesce(bal, (SELECT avg(bal) FROM holes)), 4) AS bal_filled
FROM holes
""",
)
def q_fill_mean(spark: SparkSession, sf: str) -> DataFrame:
    from kgfarm_spark.functions.cleaning import fill_nulls

    cust = load_table(spark, sf, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
    )
    out = fill_nulls(cust, numeric_strategy="mean", numeric_cols=["bal"], categorical_cols=[])
    return out.select("c_custkey", F.round("bal", 4).alias("bal_filled"))


@register(
    "standard_scale",
    """
WITH s AS (SELECT avg(l_quantity) m,
                  stddev_pop(l_quantity) sd FROM lineitem)
SELECT l_orderkey, l_linenumber,
       round((l_quantity - s.m) / s.sd, 4) AS quantity_scaled
FROM lineitem, s
""",
)
def q_standard_scale(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    params = fit_standard_scaler(li, ["l_quantity"])
    out = apply_standard_scaler(li, {"l_quantity": params["l_quantity"]})
    return out.select(
        "l_orderkey", "l_linenumber", F.round("l_quantity", 4).alias("quantity_scaled")
    )


@register(
    "minmax_scale",
    """
WITH s AS (SELECT min(l_extendedprice) mn, max(l_extendedprice) mx FROM lineitem)
SELECT l_orderkey, l_linenumber,
       round((l_extendedprice - s.mn) / (s.mx - s.mn), 4) AS price_scaled
FROM lineitem, s
""",
)
def q_minmax_scale(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    params = fit_minmax_scaler(li, ["l_extendedprice"])
    out = apply_minmax_scaler(li, params)
    return out.select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 4).alias("price_scaled")
    )


@register(
    "log_transform",
    """
WITH s AS (SELECT min(l_extendedprice) mn FROM lineitem)
SELECT l_orderkey, l_linenumber,
       round(ln(l_extendedprice + abs(s.mn) + 0.0001), 4) AS price_log
FROM lineitem, s
""",
)
def q_log_transform(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    out = log_transform(li, ["l_extendedprice"])
    return out.select(
        "l_orderkey", "l_linenumber", F.round("l_extendedprice", 4).alias("price_log")
    )


@register(
    "ordinal_encode",
    """
SELECT o_orderkey,
       CAST(dense_rank() OVER (ORDER BY o_orderpriority) - 1 AS BIGINT) AS priority_code
FROM orders
""",
)
def q_ordinal_encode(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders")
    params = fit_ordinal_encoder(orders, ["o_orderpriority"])
    out = apply_ordinal_encoder(orders, params)
    return out.select("o_orderkey", F.col("o_orderpriority").alias("priority_code"))


@register(
    "one_hot_encode",
    """
SELECT o_orderkey,
       CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS o_orderstatus_F,
       CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS o_orderstatus_O,
       CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END AS o_orderstatus_P
FROM orders
""",
)
def q_one_hot(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_orderstatus")
    out, _ = one_hot_encode(orders, ["o_orderstatus"], max_distinct=5)
    return out


_ANOVA_FEATURES = ["l_quantity", "l_extendedprice", "l_discount"]


def _anova_oracle() -> str:
    branches = []
    for c in _ANOVA_FEATURES:
        branches.append(
            f"""
SELECT '{c}' AS feature,
  round(
    ((sum(s*s/n) - (sum(s)*sum(s))/sum(n)) / (count(*) - 1))
    / ((sum(ss) - sum(s*s/n)) / (sum(n) - count(*))), 4) AS f_value
FROM (
  SELECT l_returnflag, count(*) AS n, sum({c}) AS s, sum({c}*{c}) AS ss
  FROM lineitem GROUP BY l_returnflag
) cls"""
        )
    return "\nUNION ALL\n".join(branches)


@register("anova_f_scores", _anova_oracle())
def q_anova(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    scores = anova_f_scores(li, _ANOVA_FEATURES, "l_returnflag")
    return spark.createDataFrame(
        [(c, round(v, 4)) for c, v in scores.items()], "feature string, f_value double"
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_oracle() -> str:
    branches = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            branches.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"round(corr({a}, {b}), 4) AS pearson_r FROM lineitem"
            )
    return "\nUNION ALL\n".join(branches)


@register("pearson_corr", _corr_oracle())
def q_pearson(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    corr = pearson_corr_matrix(li, _CORR_COLS)
    return spark.createDataFrame(
        [(a, b, round(r, 4)) for (a, b), r in corr.items()],
        "col_a string, col_b string, pearson_r double",
    )


_PKFK_EDGES = [
    ("nation", "n_nationkey", "customer", "c_nationkey"),
    ("nation", "n_nationkey", "supplier", "s_nationkey"),
    ("region", "r_regionkey", "nation", "n_regionkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
]


def _pkfk_oracle() -> str:
    branches = []
    for pk_t, pk_c, fk_t, fk_c in _PKFK_EDGES:
        branches.append(
            f"""
SELECT '{pk_t}' AS pk_table, '{pk_c}' AS pk_col,
       '{fk_t}' AS fk_table, '{fk_c}' AS fk_col,
  round((SELECT CAST(count(DISTINCT {fk_c}) FILTER (WHERE {fk_c} IN (SELECT {pk_c} FROM {pk_t})) AS DOUBLE)
           / count(DISTINCT {fk_c}) FROM {fk_t}), 6) AS containment,
  round((SELECT CAST(count(DISTINCT {fk_c}) AS DOUBLE) / count({fk_c}) FROM {fk_t}), 6) AS fk_uniqueness,
  (SELECT CASE WHEN max({pk_c}) >= (SELECT max({fk_c}) FROM {fk_t})
                AND min({pk_c}) <= (SELECT min({fk_c}) FROM {fk_t})
               THEN 1 ELSE 0 END FROM {pk_t}) AS range_contained
FROM (SELECT 1) one"""
        )
    return "\nUNION ALL\n".join(branches)


@register("pkfk_containment", _pkfk_oracle())
def q_pkfk(spark: SparkSession, sf: str) -> DataFrame:
    rows = []
    for pk_t, pk_c, fk_t, fk_c in _PKFK_EDGES:
        feats = pkfk_features(
            load_table(spark, sf, fk_t), fk_c, load_table(spark, sf, pk_t), pk_c
        )
        rows.append(
            (
                pk_t, pk_c, fk_t, fk_c,
                round(feats["containment"], 6),
                round(feats["fk_uniqueness"], 6),
                feats["range_contained"],
            )
        )
    return spark.createDataFrame(
        rows,
        "pk_table string, pk_col string, fk_table string, fk_col string, "
        "containment double, fk_uniqueness double, range_contained int",
    )
