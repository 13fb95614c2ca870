"""Point-in-time (as-of) join — the engine's flagship operator.

Generalizes the reference's ``enrich()`` (equi join + freshness-window
interval filter, /root/reference/operations/api.py:518-571, J1+J2 in
SURVEY.md §2.3). The reference iterates joined rows in a Python loop with
``datetime.strptime`` per row; here the same semantics are a declarative
DataFrame plan Catalyst can optimize.

Two result modes:

- ``mode='latest'`` — Feast-style point-in-time-correct join: for each left
  row take the single best right row (backward = most recent right row with
  ``r.ts <= l.ts``; forward = next; nearest = closer of the two). This is
  the north_rule's as-of join.
- ``mode='all_in_window'`` — exact reference-J2 parity: keep *every* right
  row with ``r.ts ∈ [l.ts - tolerance, l.ts]`` (the reference keeps ties,
  strict ``<`` at api.py:551). A plain equi+range join.

Two physical strategies for ``latest``:

- ``'union_window'`` (default): tag both sides, union, one shuffle on the
  key, then ``last(value, ignorenulls)`` over an ordered window carries the
  most recent right payload onto each left row. Cost: ONE shuffle of
  |L|+|R| rows, no fan-out, no join explosion — robust when a single left
  timestamp matches thousands of right rows. This is the 100 TB path: it
  shuffles each input exactly once on the conversation key (the same
  partitioning downstream window features need, so the exchange is reused).
- ``'merge_asof'``: cogrouped ``applyInPandas`` running ``pd.merge_asof``
  per key bucket — Arrow-vectorized; useful when both sides are already
  bucketed by the key and per-key data fits a pandas batch.

Tie semantics (deterministic, oracle-checked): among right rows sharing the
match timestamp, both directions take the greatest ``tiebreak`` value;
``nearest`` prefers the backward candidate on equal distance.

Zero temporal leakage by construction: a backward match can never read a
right row with ``ts`` greater than the left timestamp (north_rule).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _tolerance_expr(tolerance: str | None) -> str | None:
    """Normalize a tolerance spec like '10 days' / '1 hour' to INTERVAL SQL."""
    if tolerance is None:
        return None
    return f"INTERVAL {tolerance}"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] = "conv_id",
    left_ts: str = "query_ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance: str | None = None,
    mode: str = "latest",
    right_cols: Sequence[str] | None = None,
    tiebreak: str | None = None,
    strategy: str = "union_window",
    probe_pushdown: bool = False,
) -> DataFrame:
    """As-of join ``left`` (entity frame) against ``right`` (feature view).

    Args:
        on: equi key column(s) present on both sides (e.g. ``conv_id``).
        left_ts / right_ts: event-time columns (both inclusive at equality —
            reference keeps ``ts_fv == ts_e``, api.py:551 strict ``<``).
        direction: 'backward' | 'forward' | 'nearest' (latest mode only).
        tolerance: max distance, e.g. ``'10 days'`` (reference freshness
            default, api.py:518) or ``'1 hour'``; None = unbounded.
        mode: 'latest' (one best match, left rows preserved — left outer)
            or 'all_in_window' (reference interval-join parity — inner).
        right_cols: right payload columns to carry (default: all non-key,
            non-ts columns). The matched right timestamp is always emitted
            as ``matched_ts``.
        tiebreak: right column ordering equal-ts matches (e.g. 'turn_idx').
        strategy: 'union_window' | 'merge_asof' (latest mode only).
        probe_pushdown: broadcast the left frame's distinct key set and
            left-semi reduce the right side BEFORE the join/window
            shuffle. Exactness-preserving for every mode/direction (an
            as-of match shares the probe's key by definition). Set it
            when the left frame touches a small fraction of the right
            side's keys — see backfill.backfill_asof_fused for the
            measured 9.5× and the when-not-to note.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if probe_pushdown:
        right = right.join(F.broadcast(left.select(*keys).distinct()), keys, "left_semi")
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_ts]
    right_cols = list(right_cols)

    if mode == "all_in_window":
        return _interval_join(left, right, keys, left_ts, right_ts, tolerance, right_cols)
    if mode != "latest":
        raise ValueError(f"unknown mode: {mode!r}")

    if strategy == "merge_asof":
        return _merge_asof_strategy(
            left, right, keys, left_ts, right_ts, direction, tolerance, right_cols
        )
    if strategy != "union_window":
        raise ValueError(f"unknown strategy: {strategy!r}")

    if direction == "nearest":
        return _union_window_nearest(
            left, right, keys, left_ts, right_ts, tolerance, right_cols, tiebreak
        )
    return _union_window(left, right, keys, left_ts, right_ts, direction, tolerance, right_cols, tiebreak)


# ---------------------------------------------------------------------------
# all_in_window: exact reference J2 semantics (interval join)
# ---------------------------------------------------------------------------


def _interval_join(left, right, keys, left_ts, right_ts, tolerance, right_cols):
    """keep iff right_ts BETWEEN left_ts - tolerance AND left_ts (inclusive
    both ends — api.py:543-553 deletes iff ts_e < ts_fv OR ts_e - f > ts_fv).

    Physical plan: equi join on the key (Catalyst picks broadcast vs
    shuffled), range predicate applied as join condition so it's evaluated
    during the join, not after a full fan-out materialization."""
    r = right.select(
        *[F.col(k).alias(f"__r_{k}") for k in keys],
        F.col(right_ts).alias("matched_ts"),
        *[F.col(c) for c in right_cols],
    )
    cond = F.lit(True)
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"__r_{k}"))
    cond = cond & (F.col("matched_ts") <= F.col(left_ts))
    if tolerance is not None:
        cond = cond & (
            F.col("matched_ts") >= F.col(left_ts) - F.expr(_tolerance_expr(tolerance))
        )
    out = left.join(r, cond, "inner")
    return out.drop(*[f"__r_{k}" for k in keys])


# ---------------------------------------------------------------------------
# latest via union + window (one shuffle, fan-out safe)
# ---------------------------------------------------------------------------


def _union_window(left, right, keys, left_ts, right_ts, direction, tolerance, right_cols, tiebreak):
    # selectExpr: the whole projection crosses py4j once and parses
    # JVM-side — the per-column Column form cost hundreds of round-trips
    # per query construction (guide §1: the profile showed construction,
    # not executors). Identical Catalyst expressions.
    ltypes = {c: left.schema[c].dataType.simpleString() for c in left.columns}
    payload_sql = "struct(`" + right_ts + "` AS matched_ts" + "".join(
        f", `{c}`" for c in right_cols
    ) + ")"
    r_side = right.selectExpr(
        *[f"`{k}`" for k in keys],
        f"`{right_ts}` AS __ts",
        "0 AS __side",
        (f"CAST(`{tiebreak}` AS BIGINT) AS __tb" if tiebreak else "CAST(0 AS BIGINT) AS __tb"),
        f"{payload_sql} AS __payload",
        *[f"CAST(NULL AS {ltypes[c]}) AS `__l_{c}`" for c in left.columns],
    )
    ptype = r_side.schema["__payload"].dataType.simpleString()
    l_side = left.selectExpr(
        *[f"`{k}`" for k in keys],
        f"`{left_ts}` AS __ts",
        "1 AS __side",
        "CAST(NULL AS BIGINT) AS __tb",
        f"CAST(NULL AS {ptype}) AS __payload",
        *[f"`{c}` AS `__l_{c}`" for c in left.columns],
    )
    u = r_side.unionByName(l_side)

    if direction == "backward":
        # rows ordered by time; at equal ts right rows (side 0) precede the
        # left row so the inclusive match is picked; among equal-ts right
        # rows the LAST seen (max tiebreak) wins.
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    elif direction == "forward":
        # reverse traversal; max tiebreak wins among equal-ts right rows
        # (same tie rule as backward → oracle ORDER BY ts ASC, tb DESC).
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.col("__ts").desc(), F.col("__side").asc(), F.col("__tb").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        raise ValueError(f"unknown direction: {direction!r}")

    carried = u.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)

    match = "__match"
    if tolerance is not None:
        tol = _tolerance_expr(tolerance)
        if direction == "backward":
            in_tol = f"__match.matched_ts >= __ts - {tol}"
        else:
            in_tol = f"__match.matched_ts <= __ts + {tol}"
        match = f"(CASE WHEN {in_tol} THEN __match END)"

    return out.selectExpr(
        *[f"`__l_{c}` AS `{c}`" for c in left.columns],
        f"{match}.matched_ts AS matched_ts",
        *[f"{match}.`{c}` AS `{c}`" for c in right_cols],
    )


def _union_window_nearest(left, right, keys, left_ts, right_ts, tolerance, right_cols, tiebreak):
    """direction='nearest' in ONE shuffle: both sides union once, the
    backward match (last payload over ts-asc traversal) and the forward
    match (last payload over ts-desc traversal) are computed as two window
    columns over the same exchange — the hash partitioning on the key is
    shared, only the intra-partition sort runs twice. Replaces the old
    two-union + rejoin plan (3 exchanges → 1).

    Closer match wins; backward preferred on equal distance
    (deterministic, oracle-checked)."""
    payload = F.struct(
        F.col(right_ts).alias("matched_ts"), *[F.col(c) for c in right_cols]
    )
    r_side = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(tiebreak) if tiebreak else F.lit(0)).cast("long").alias("__tb"),
        payload.alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}") for c in left.columns],
    )
    l_side = left.select(
        *keys,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        F.lit(None).cast(r_side.schema["__payload"].dataType).alias("__payload"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    u = r_side.unionByName(l_side)

    # same tie rules as the single-direction paths: at equal ts the right
    # row is visible to the left row in BOTH traversals (side 0 sorts
    # first), and among equal-ts rights max tiebreak wins
    w_back = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").desc(), F.col("__side").asc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "*",
        F.last("__payload", ignorenulls=True).over(w_back).alias("__b"),
        F.last("__payload", ignorenulls=True).over(w_fwd).alias("__f"),
    )
    out = carried.filter(F.col("__side") == 1)

    b, f_ = F.col("__b"), F.col("__f")
    if tolerance is not None:
        tol = F.expr(_tolerance_expr(tolerance))
        b = F.when(b["matched_ts"] >= F.col("__ts") - tol, b)
        f_ = F.when(f_["matched_ts"] <= F.col("__ts") + tol, f_)

    def _secs(c: Column) -> Column:
        # timestamp_ntz cannot cast straight to double in Spark 4; route via
        # ltz (session TZ pinned to UTC in session.py — deterministic).
        return c.cast("timestamp").cast("double")

    bdist = _secs(F.col("__ts")) - _secs(b["matched_ts"])
    fdist = _secs(f_["matched_ts"]) - _secs(F.col("__ts"))
    use_back = f_["matched_ts"].isNull() | (
        b["matched_ts"].isNotNull() & (bdist <= fdist)
    )
    match = F.when(use_back, b).otherwise(f_)
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        match["matched_ts"].alias("matched_ts"),
        *[match[c].alias(c) for c in right_cols],
    )


# ---------------------------------------------------------------------------
# latest via cogrouped pd.merge_asof (Arrow path)
# ---------------------------------------------------------------------------


def _merge_asof_strategy(left, right, keys, left_ts, right_ts, direction, tolerance, right_cols):
    import pandas as pd  # local import: executors only

    out_schema_fields = []
    for c in left.columns:
        out_schema_fields.append(f"`{c}` {left.schema[c].dataType.simpleString()}")
    out_schema_fields.append("`matched_ts` timestamp")
    for c in right_cols:
        out_schema_fields.append(f"`{c}` {right.schema[c].dataType.simpleString()}")
    out_schema = ", ".join(out_schema_fields)

    tol_td = pd.Timedelta(tolerance) if tolerance is not None else None
    l_cols = list(left.columns)

    def merge(l_pdf: "pd.DataFrame", r_pdf: "pd.DataFrame") -> "pd.DataFrame":
        l_pdf = l_pdf.sort_values(left_ts, kind="mergesort")
        if r_pdf.empty:
            out = l_pdf.copy()
            out["matched_ts"] = pd.NaT
            for c in right_cols:
                out[c] = None
            return out[l_cols + ["matched_ts"] + list(right_cols)]
        r_pdf = r_pdf[[right_ts] + list(right_cols)].sort_values(right_ts, kind="mergesort")
        r_pdf = r_pdf.rename(columns={right_ts: "matched_ts"})
        out = pd.merge_asof(
            l_pdf,
            r_pdf,
            left_on=left_ts,
            right_on="matched_ts",
            direction=direction,
            tolerance=tol_td,
            allow_exact_matches=True,
        )
        return out[l_cols + ["matched_ts"] + list(right_cols)]

    return (
        left.groupBy(*keys)
        .cogroup(right.groupBy(*keys))
        .applyInPandas(merge, schema=out_schema)
    )
