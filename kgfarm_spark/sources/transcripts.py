"""Transcript-table source (BASELINE.json ``input_hint`` schema).

The engine's flagship input is a table of multi-turn conversation/agent
transcripts ``(conv_id:string, turn_idx:int, role:string, text:string,
tool:string, ts:timestamp)``. The sandbox has no Iceberg transcript table,
so we *derive* one deterministically from the driver's ``events`` parquet
with a transform that is expressible in both Spark DataFrame ops and ANSI
SQL — which lets every transcript-level operator carry an exact DuckDB
oracle (driver contract, __spark_entry__.py).

At production scale this module is replaced by
``spark.read.format("iceberg").load("catalog.db.transcripts")`` — the
downstream operators only see the input_hint schema, never this derivation.

Scale notes: the derivation contains one window (row_number per user) —
a single shuffle on the conversation key, which is exactly the partitioning
every downstream per-conversation window op wants, so Catalyst reuses the
exchange. On a real Iceberg table turn_idx is stored, no shuffle happens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Shared ANSI-SQL definitions (valid in BOTH Spark SQL and DuckDB) so the
# DuckDB oracle sees byte-identical derived tables.
# ---------------------------------------------------------------------------

#: transcripts := deterministic reshaping of the `events` table.
#: role encodes event_type; text is a pure string concat (no float
#: formatting — Spark/DuckDB float-to-string differ); ties on ts broken
#: by event_id so row_number is deterministic.
TRANSCRIPTS_SQL = """
SELECT
  'conv_' || lpad(CAST(user_id AS STRING), 6, '0')                       AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
       AS INT)                                                           AS turn_idx,
  CASE event_type
       WHEN 'click'    THEN 'user'
       WHEN 'view'     THEN 'user'
       WHEN 'purchase' THEN 'assistant'
       WHEN 'signup'   THEN 'system'
       ELSE 'tool' END                                                   AS role,
  event_type || ':' || props                                             AS text,
  CASE WHEN event_type = 'error'    THEN 'code'
       WHEN event_type = 'purchase' THEN 'search'
       ELSE NULL END                                                     AS tool,
  ts
FROM events
"""

#: probes := the feature_queries frame (FIXTURES.md §2): entity×timestamp
#: rows the point-in-time join resolves. Three flavors — shifted (normal
#: backward match), tie (query_ts == a turn ts; backward INCLUDES it, the
#: reference keeps ts_fv == ts_e via strict `<` at operations/api.py:551),
#: and miss (unknown conv_id → null-result path).
PROBES_SQL = """
SELECT conv_id,
       ts + INTERVAL 37 MINUTE                                   AS query_ts,
       conv_id || '#' || CAST(turn_idx AS STRING) || '#shift'    AS probe_id
FROM transcripts WHERE turn_idx % 7 = 3
UNION ALL
SELECT conv_id,
       ts                                                        AS query_ts,
       conv_id || '#' || CAST(turn_idx AS STRING) || '#tie'      AS probe_id
FROM transcripts WHERE turn_idx % 13 = 2
UNION ALL
SELECT 'conv_miss'                                               AS conv_id,
       ts                                                        AS query_ts,
       conv_id || '#' || CAST(turn_idx AS STRING) || '#miss'     AS probe_id
FROM transcripts WHERE turn_idx % 31 = 5
"""


def oracle_ctes() -> str:
    """WITH-clause prefix for DuckDB oracle SQL strings."""
    return (
        "WITH transcripts AS (" + TRANSCRIPTS_SQL + "),\n"
        "probes AS (" + PROBES_SQL + ")\n"
    )


# ---------------------------------------------------------------------------
# Spark-side loaders (DataFrame API — the idiomatic-engine path)
# ---------------------------------------------------------------------------

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan for a driver table. Column pruning + predicate pushdown
    happen automatically once callers select/filter (verified in tests via
    explain: PushedFilters / ReadSchema)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of TRANSCRIPTS_SQL (kept in exact semantic lockstep)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        F.concat(F.lit("conv_"), F.lpad(F.col("user_id").cast("string"), 6, "0")).alias("conv_id"),
        (F.row_number().over(w) - 1).cast("int").alias("turn_idx"),
        F.when(F.col("event_type").isin("click", "view"), "user")
        .when(F.col("event_type") == "purchase", "assistant")
        .when(F.col("event_type") == "signup", "system")
        .otherwise("tool")
        .alias("role"),
        F.concat(F.col("event_type"), F.lit(":"), F.col("props")).alias("text"),
        F.when(F.col("event_type") == "error", "code")
        .when(F.col("event_type") == "purchase", "search")
        .alias("tool"),
        F.col("ts"),
    )


def probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of PROBES_SQL."""
    t = transcripts(spark, sf_dir)
    shifted = t.filter(F.col("turn_idx") % 7 == 3).select(
        "conv_id",
        (F.col("ts") + F.expr("INTERVAL 37 MINUTE")).alias("query_ts"),
        F.concat(F.col("conv_id"), F.lit("#"), F.col("turn_idx").cast("string"), F.lit("#shift")).alias("probe_id"),
    )
    tie = t.filter(F.col("turn_idx") % 13 == 2).select(
        "conv_id",
        F.col("ts").alias("query_ts"),
        F.concat(F.col("conv_id"), F.lit("#"), F.col("turn_idx").cast("string"), F.lit("#tie")).alias("probe_id"),
    )
    miss = t.filter(F.col("turn_idx") % 31 == 5).select(
        F.lit("conv_miss").alias("conv_id"),
        F.col("ts").alias("query_ts"),
        F.concat(F.col("conv_id"), F.lit("#"), F.col("turn_idx").cast("string"), F.lit("#miss")).alias("probe_id"),
    )
    return shifted.unionByName(tie).unionByName(miss)
