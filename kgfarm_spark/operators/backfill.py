"""Fused backfill + point-in-time resolve — the optimized flagship path.

The naive plan (backfill_features → asof_join) shuffles the transcript
table TWICE on conv_id: once for the cumulative windows, once for the
union-window as-of join. But a probe row is just a zero-contribution
event on the same (conv_id, ts) axis — so we can union probes INTO the
transcript stream first and compute the cumulative features in a single
window pass where probe rows contribute nothing and simply read the
running state. ONE shuffle of |turns|+|probes| rows total, and the
``text`` column is projected down to ``length(text)`` before the
exchange (shuffle bytes ∝ fixed-width columns only).

Equivalent to asof_join(probes, backfill_features(t), direction=
'backward', mode='latest') — same oracle SQL, verified by the driver
gate — but with half the shuffle volume. At 10^12 turns this is the
difference between 2 PB and 1 PB of shuffle I/O.

Leakage-free by construction: every window frame ends at the current
row, and probe rows are ordered AFTER transcript rows at equal ts
(inclusive backward semantics, reference api.py:551 strict ``<``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def backfill_asof_fused(
    transcripts: DataFrame,
    probes: DataFrame,
    key: str = "conv_id",
    ts: str = "ts",
    probe_ts: str = "query_ts",
    tolerance: str | None = None,
) -> DataFrame:
    """Resolve each probe (key, probe_ts) to the cumulative transcript
    features as of that instant. Returns probe columns + matched_ts +
    the backfill feature set (same names as windows.backfill_features).
    """
    probe_cols = [c for c in probes.columns if c != key]

    turn_side = transcripts.select(
        F.col(key),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),  # turns sort before probes at equal ts
        F.col("turn_idx").cast("long").alias("__tb"),
        F.lit(True).alias("__is_turn"),
        F.length("text").cast("long").alias("__text_len"),
        F.col("tool").isNotNull().alias("__has_tool"),
        (F.col("role") == "user").alias("__is_user"),
        (F.col("role") == "assistant").alias("__is_assistant"),
        *[F.lit(None).cast(probes.schema[c].dataType).alias(f"__p_{c}") for c in probe_cols],
    )
    probe_side = probes.select(
        F.col(key),
        F.col(probe_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(False).alias("__is_turn"),
        F.lit(None).cast("long").alias("__text_len"),
        F.lit(None).cast("boolean").alias("__has_tool"),
        F.lit(None).cast("boolean").alias("__is_user"),
        F.lit(None).cast("boolean").alias("__is_assistant"),
        *[F.col(c).alias(f"__p_{c}") for c in probe_cols],
    )
    u = turn_side.unionByName(probe_side)

    cum = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_turn1 = F.when(F.col("__is_turn"), F.lit(1)).otherwise(F.lit(0)).cast("long")
    turn_len = F.when(F.col("__is_turn"), F.col("__text_len"))

    # ONE select so Catalyst emits a single Window operator for all eight
    # expressions (chained withColumn + scalar wrappers like coalesce
    # interleave Projects between Window nodes, which blocks the
    # CollapseWindow rule → 8 sequential window passes instead of 1)
    state = u.select(
        "*",
        F.last(F.when(F.col("__is_turn"), F.col("__ts")), ignorenulls=True)
        .over(cum)
        .alias("matched_ts"),
        F.sum(is_turn1).over(cum).alias("turns_so_far"),
        F.coalesce(
            F.sum(F.when(F.col("__has_tool"), 1).otherwise(0).cast("long")).over(cum),
            F.lit(0),
        ).alias("tool_calls_so_far"),
        F.sum(turn_len).over(cum).alias("text_len_sum"),
        F.avg(turn_len).over(cum).alias("text_len_avg"),
        F.max(turn_len).over(cum).alias("text_len_max"),
        F.coalesce(
            F.sum(F.when(F.col("__is_user"), 1).otherwise(0).cast("long")).over(cum),
            F.lit(0),
        ).alias("user_turns_so_far"),
        F.coalesce(
            F.sum(F.when(F.col("__is_assistant"), 1).otherwise(0).cast("long")).over(cum),
            F.lit(0),
        ).alias("assistant_turns_so_far"),
    )

    out = state.filter(F.col("__side") == 1)

    # tolerance / no-match: null out the feature block exactly like a
    # missed as-of join (matched_ts outside [probe_ts - tol, probe_ts])
    valid = F.col("matched_ts").isNotNull()
    if tolerance is not None:
        valid = valid & (F.col("matched_ts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}"))

    feature_cols = [
        "matched_ts",
        "turns_so_far",
        "tool_calls_so_far",
        "text_len_sum",
        "text_len_avg",
        "text_len_max",
        "user_turns_so_far",
        "assistant_turns_so_far",
    ]
    sel = [F.col(key)] + [F.col(f"__p_{c}").alias(c) for c in probe_cols]
    for c in feature_cols:
        sel.append(F.when(valid, F.col(c)).alias(c))
    out = out.select(*sel)
    return out.withColumn(
        "tool_call_rate", F.col("tool_calls_so_far") / F.col("turns_so_far")
    )
