"""SparkSession factory tuned for the engine.

Design notes for 100 TB / 1000-executor scale (tested on local[N]):
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting.
- Arrow on: every pandas-UDF stage moves data in columnar batches.
- shuffle.partitions is a *starting* value; AQE coalesces down, and the
  skew-join config splits hot conv_id partitions at runtime.
- maxPartitionBytes default 128 MiB keeps scan tasks executor-memory-safe.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kgfarm_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (driver contract)
    or ``local[*]``. On a real cluster this is supplied by spark-submit
    and the local default is ignored.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus) if cpus else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Lazy plans + Catalyst: all engine ops are declarative DataFrame
        # specs; AQE re-plans at runtime (coalesce small shuffles, split
        # skewed ones — hot conv_id handling per SURVEY.md §2.12).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for every pandas-UDF boundary (input_hint: vectorized
        # pandas/Arrow UDFs, no per-row Python).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Deterministic timestamp behavior regardless of host TZ.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
