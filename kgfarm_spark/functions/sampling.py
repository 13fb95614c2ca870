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


def group_split(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float] | None = None,
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test splitting at GROUP granularity: every
    row of a group (a conversation, a user, a document cluster) lands in
    the same split, so per-group structure never leaks across the
    train/eval boundary — the failure mode of row-level randomSplit on
    conversational data, where sibling turns of one conversation end up
    in both train and test and the eval score is contaminated.

    Membership is a pure function of ``md5(group_id || '#' || seed)``
    mapped to [0,1) and cut at the cumulative weights (splits ordered by
    name for determinism) — partition-invariant, resumable, and
    reproducible across engines (the exact recipe of
    ``stratified_mix_sample``, packing.py). Changing ``seed`` redraws
    the assignment; weights must sum to 1 (validated to 1e-9).

    Plan shape: a pure projection — zero shuffles, zero aggregates; the
    split column is computable at scan time on 10^12 rows.
    """
    if weights is not None and (
        not weights or any(w < 0 for w in weights.values())
    ):
        raise ValueError(f"weights must be a non-empty non-negative dict, got {weights}")
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    # the cross-engine md5-uniform recipe (operators/packing._md5_uniform);
    # lazy import — functions/ must not import operators/ at module scope.
    # NULL group keys coalesce to a sentinel so they hash like one regular
    # group (all NULL-group rows land together in ONE deterministic split)
    # instead of NULL-propagating past every cut into the last split.
    from kgfarm_spark.operators.packing import _md5_uniform

    u = _md5_uniform(
        F.concat(
            F.coalesce(F.col(group_col).cast("string"), F.lit("__null__")),
            F.lit("#" + seed),
        )
    )
    expr = None
    cum = 0.0
    names = sorted(weights)
    for name in names[:-1]:
        cum += weights[name]
        branch = (
            F.when(u < cum, F.lit(name))
            if expr is None
            else expr.when(u < cum, F.lit(name))
        )
        expr = branch
    expr = (
        F.lit(names[-1]) if expr is None else expr.otherwise(F.lit(names[-1]))
    )
    return df.withColumn(out_col, expr)
