"""Skew handling: hot-key detection, salted two-phase aggregation, and
salted broadcast-fanout joins (north_rule: "conv_id bucketing with salted
repartition for hot-conversation skew"; SURVEY §4.2 custom item 3).

The reference is single-process pandas and has no notion of skew; these
are the engine's scale-path additions. Per-conversation WINDOW ops do not
need salting (a window is bounded by one conversation's length — see
operators/windows.py), but global per-key AGGREGATES and JOINS against a
skewed key do:

- ``salted_two_phase_agg``: groupBy(key, salt) partial → groupBy(key)
  final. The partial pass spreads a hot key over ``n_salt`` reducers; the
  final pass merges n_salt tiny rows per key. Classic map-side-combine
  generalization — identical results to a direct groupBy (pytest-checked)
  at 1/n_salt the per-reducer peak.
- ``salted_fanout_join``: replicate the small side n_salt× (explode) and
  scatter the big side deterministically, so one hot key's probe rows
  spread across n_salt tasks. Exact join parity (pytest-checked).
- ``detect_hot_keys``: deterministic hash-sampled counts (no rand();
  partition-invariant) → keys whose estimated row count exceeds the
  threshold. Feeds a hybrid plan: salt only the hot keys, leave the
  long tail on the direct path.

AQE's runtime skew-split (on by default in session.py) handles residual
skew; these operators are for *planned* skew where the hot keys are known
or detectable up front — at 10^12 turns you don't want to discover the
hot conversation after a 2-hour straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: deterministic per-row scatter — hash the full row identity, never rand()
#: (partition-invariant, resumable; SURVEY §7 determinism requirement)
def _row_salt(cols: list[str], n_salt: int):
    return F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(n_salt)).cast("int")


def detect_hot_keys(
    df: DataFrame,
    key: str,
    sample_cols: list[str],
    threshold_rows: int,
    sample_mod: int = 100,
) -> DataFrame:
    """Estimate per-key row counts from a deterministic 1/sample_mod
    hash-sample of rows (sampled on row identity, NOT on the key — a
    key-hash sample would keep or drop whole keys). Returns keys whose
    extrapolated count exceeds ``threshold_rows``."""
    sampled = df.filter(
        F.pmod(F.xxhash64(*[F.col(c) for c in [key, *sample_cols]]), F.lit(sample_mod)) == 0
    )
    return (
        sampled.groupBy(key)
        .agg((F.count(F.lit(1)) * sample_mod).alias("est_rows"))
        .filter(F.col("est_rows") > threshold_rows)
    )


_MERGEABLE = {"sum", "count", "max", "min", "avg"}


def salted_two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """groupBy(key).agg(...) with a salted partial phase.

    ``aggs`` maps output name → (function, column) with function in
    {sum, count, max, min, avg}. avg is decomposed into sum+count partials
    and recombined exactly.
    """
    bad = {f for f, _ in aggs.values()} - _MERGEABLE
    if bad:
        raise ValueError(f"non-mergeable agg functions: {bad}")
    salt_cols = salt_cols or [c for c in df.columns if c != key]
    salted = df.withColumn("__salt", _row_salt([key, *salt_cols], n_salt))

    partial_exprs, final_exprs = [], []
    for out, (fn, col) in aggs.items():
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "count":
            partial_exprs.append(F.count(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"__ps_{out}"))
            partial_exprs.append(F.count(col).alias(f"__pc_{out}"))
            final_exprs.append(
                (F.sum(f"__ps_{out}") / F.sum(f"__pc_{out}")).alias(out)
            )
    partial = salted.groupBy(key, "__salt").agg(*partial_exprs)
    return partial.groupBy(key).agg(*final_exprs)


def salted_fanout_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` is skewed on ``key``: replicate ``small``
    n_salt× and scatter ``big`` rows deterministically over the salt
    space, so a hot key's rows land on n_salt different reducers.
    Result is exactly ``big.join(small, key, how)`` — for the supported
    ``how`` values only. right/full outer would emit every unmatched
    small-side row once PER REPLICA (n_salt duplicates), so they are
    rejected rather than silently wrong."""
    supported = {"inner", "left", "left_outer", "leftouter", "left_semi",
                 "leftsemi", "left_anti", "leftanti"}
    if how not in supported:
        raise ValueError(
            f"salted_fanout_join supports {sorted(supported)}; got {how!r}. "
            "right/full outer joins would duplicate unmatched small-side "
            "rows n_salt times — use AQE skew-join or swap the sides."
        )
    scatter_cols = [c for c in big.columns]
    big_s = big.withColumn("__salt", _row_salt(scatter_cols, n_salt))
    small_s = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = big_s.join(small_s, [key, "__salt"], how)
    return out.drop("__salt")


def hybrid_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    hot_keys: DataFrame,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """The hybrid plan the module docstring promises: salt ONLY the hot
    keys, leave the long tail on the direct join path.

    ``hot_keys`` is a one-column frame of skewed key values (typically
    ``detect_hot_keys(...)`` output). The big side splits into hot/cold by
    a broadcast semi/anti join; the hot slice goes through
    salted_fanout_join (per-key fan-out bounded by n_salt reducers), the
    cold slice through a plain equi-join, and the union is exactly
    ``big.join(small, key, how)`` for the supported join types. Cost: the
    small side is replicated n_salt× only against the hot slice, not the
    whole table."""
    hk = F.broadcast(hot_keys.select(F.col(hot_keys.columns[0]).alias(key)).distinct())
    big_hot = big.join(hk, key, "left_semi")
    big_cold = big.join(hk, key, "left_anti")
    hot_out = salted_fanout_join(big_hot, small, key, n_salt=n_salt, how=how)
    cold_out = big_cold.join(small, key, how)
    return hot_out.unionByName(cold_out)
