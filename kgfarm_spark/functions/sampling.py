"""Deterministic sampling + class rebalancing (reference A11/A12 and the
deterministic-sampling requirement of SURVEY §7 'what's hard' #4).

The reference samples with ``df.sample(n, random_state=1)``
(interface/apis.py:235, operations/api.py:309-313, 996-999) and rebalances
by downsampling the majority class to the minority count with a seed
(training_manager/build_data_transformation_recommender.py:134-144).
Spark's fraction-based ``sample`` depends on partitioning, so for
cross-engine / cross-parallelism determinism we order by a content hash
(md5 of the key) and cut — same result at local[8] and local[32], and
expressible in ANSI SQL for the DuckDB oracle.

Scale notes: the hash-order sample is a top-K by hash — Catalyst executes
``orderBy(...).limit(n)`` as TakeOrderedAndProject (per-partition top-n +
driver merge of n·p rows), no full sort materialization. Rebalancing is
one window over the class key — a single shuffle on the class column;
heavily-skewed classes are bounded by the limit itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _hash_key(key_cols: list[str]):
    return F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols]))


def deterministic_sample(df: DataFrame, key_cols: list[str], n: int) -> DataFrame:
    """Partition-invariant n-row sample: order by md5(key), take n."""
    return (
        df.withColumn("__h", _hash_key(key_cols))
        .orderBy("__h")
        .limit(n)
        .drop("__h")
    )


def rebalance_classes(
    df: DataFrame, target: str, order_cols: list[str]
) -> DataFrame:
    """Downsample every class to the minority-class count (A11),
    deterministically: within each class keep the first ``min_count`` rows
    under ``order_cols`` ordering. One groupBy (class counts, broadcast
    back as a literal) + one window shuffle on the class column."""
    counts = df.groupBy(target).count().collect()
    if not counts:
        return df
    min_count = min(r["count"] for r in counts)
    w = Window.partitionBy(target).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= min_count)
        .drop("__rn")
    )
