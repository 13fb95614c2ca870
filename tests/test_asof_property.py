"""Property-based as-of join testing (hypothesis): for random small
(transcript, probe) frames — including ties, empty windows, duplicate
timestamps, unknown keys — the union-window implementation must match a
brute-force pure-Python oracle for every direction and tolerance.

Kept to a bounded number of examples because each example is a Spark
round-trip; the per-example frames are adversarially shaped (timestamps
drawn from a 5-value grid so ties and exact-tolerance edges are common).
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from kgfarm_spark.operators.asof import asof_join

BASE = dt.datetime(2024, 1, 1)
#: 5-point grid, 1 hour apart → frequent ties + exact-tolerance hits
TS_GRID = [BASE + dt.timedelta(hours=h) for h in range(5)]
KEYS = ["a", "b"]

turn = st.tuples(st.sampled_from(KEYS), st.sampled_from(TS_GRID), st.integers(0, 9))
probe = st.tuples(st.sampled_from(KEYS + ["missing"]), st.sampled_from(TS_GRID))

TOL = dt.timedelta(hours=1)


def _oracle(turns, probes, direction):
    """Brute force: per probe, best turn within tolerance; ties on ts
    broken by larger turn_idx (the engine's tiebreak)."""
    out = []
    for i, (k, qts) in enumerate(probes):
        cand = []
        for tk, tts, idx in turns:
            if tk != k:
                continue
            if direction == "backward" and not (qts - TOL <= tts <= qts):
                continue
            if direction == "forward" and not (qts <= tts <= qts + TOL):
                continue
            cand.append((tts, idx))
        if not cand:
            out.append((i, None, None))
            continue
        if direction == "backward":
            # latest ts wins; equal ts → higher turn_idx (engine tiebreak)
            best = max(cand, key=lambda c: (c[0], c[1]))
        else:
            # earliest ts wins; equal ts → higher turn_idx
            best = min(cand, key=lambda c: (c[0], -c[1]))
        out.append((i, best[0], best[1]))
    return sorted(out)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    turns=st.lists(turn, min_size=0, max_size=12),
    probes=st.lists(probe, min_size=1, max_size=6),
)
def test_asof_matches_bruteforce(spark, direction, turns, probes):
    # dedupe (key, ts, idx) so the engine tiebreak is well-defined
    turns = sorted(set(turns))
    t_df = spark.createDataFrame(
        [(k, ts, i) for k, ts, i in turns] or [("__empty", BASE, 0)],
        "conv_id string, ts timestamp, turn_idx int",
    )
    if not turns:
        t_df = t_df.filter("conv_id <> '__empty'")
    p_df = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(probes)],
        "conv_id string, query_ts timestamp, probe_id int",
    )
    got = asof_join(
        p_df, t_df, on="conv_id", left_ts="query_ts", right_ts="ts",
        direction=direction, tolerance="1 HOUR",
        right_cols=["turn_idx"], tiebreak="turn_idx",
    )
    got_rows = sorted(
        (r["probe_id"],
         r["matched_ts"],
         r["turn_idx"])
        for r in got.collect()
    )
    assert got_rows == _oracle(turns, probes, direction)


def _oracle_nearest(turns, probes):
    out = []
    for i, (k, qts) in enumerate(probes):
        back = [
            (tts, idx) for tk, tts, idx in turns
            if tk == k and qts - TOL <= tts <= qts
        ]
        fwd = [
            (tts, idx) for tk, tts, idx in turns
            if tk == k and qts <= tts <= qts + TOL
        ]
        b = max(back, key=lambda c: (c[0], c[1])) if back else None
        f = min(fwd, key=lambda c: (c[0], -c[1])) if fwd else None
        if b is None and f is None:
            out.append((i, None, None))
            continue
        if f is None:
            best = b
        elif b is None:
            best = f
        else:
            bdist = (qts - b[0]).total_seconds()
            fdist = (f[0] - qts).total_seconds()
            best = b if bdist <= fdist else f  # backward wins ties
        out.append((i, best[0], best[1]))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    turns=st.lists(turn, min_size=0, max_size=12),
    probes=st.lists(probe, min_size=1, max_size=6),
)
def test_asof_nearest_matches_bruteforce(spark, turns, probes):
    turns = sorted(set(turns))
    t_df = spark.createDataFrame(
        [(k, ts, i) for k, ts, i in turns] or [("__empty", BASE, 0)],
        "conv_id string, ts timestamp, turn_idx int",
    )
    if not turns:
        t_df = t_df.filter("conv_id <> '__empty'")
    p_df = spark.createDataFrame(
        [(k, ts, i) for i, (k, ts) in enumerate(probes)],
        "conv_id string, query_ts timestamp, probe_id int",
    )
    got = asof_join(
        p_df, t_df, on="conv_id", left_ts="query_ts", right_ts="ts",
        direction="nearest", tolerance="1 HOUR",
        right_cols=["turn_idx"], tiebreak="turn_idx",
    )
    got_rows = sorted(
        (r["probe_id"], r["matched_ts"], r["turn_idx"]) for r in got.collect()
    )
    assert got_rows == _oracle_nearest(turns, probes)
