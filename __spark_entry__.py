"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` / ``oracle_sql()`` — per-operator DataFrame builders and
DuckDB oracle SQL (driver compares row-count + schema + value-hash at
sf0.01). The queries map to SURVEY.md §2's operator inventory; the
transcript table is derived deterministically from ``events`` (see
kgfarm_spark/sources/transcripts.py) so every transcript operator has an
exact SQL oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kgfarm_spark.entry_queries import QUERIES, ORACLES, flagship


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: backfill transcript features then point-in-time-resolve the
    probe frame against them (reference enrich() re-expressed Spark-first)."""
    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
