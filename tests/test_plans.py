"""Physical-plan regression tests — lock in the shuffle/window shape the
100 TB design depends on (BENCH.md §2 derives its extrapolation from
exactly these properties). If a refactor re-introduces a second exchange
or splits the fused Window pass, these fail before the benchmark does.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from kgfarm_spark.operators.asof import asof_join
from kgfarm_spark.operators.backfill import backfill_asof_fused
from kgfarm_spark.operators.windows import backfill_features, rolling_aggregates
from kgfarm_spark.sources.datagen import gen_probes, gen_transcripts


def _counts(df) -> dict:
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    return {
        "exchange": len(re.findall(r"\(\d+\) Exchange", plan)),
        "window": len(re.findall(r"\(\d+\) Window", plan)),
        "sort": len(re.findall(r"\(\d+\) Sort", plan)),
        "scan": len(re.findall(r"\(\d+\) Scan", plan)),
        "pushed": "PushedFilters: [" in plan and "PushedFilters: []" not in plan,
    }


@pytest.fixture(scope="module")
def stored(spark, tmp_path_factory):
    """Transcripts + probes as STORED tables — the production shape (the
    sf-testdata derivation adds sandbox-only scans; see transcripts.py)."""
    d = tmp_path_factory.mktemp("plans")
    t = gen_transcripts(spark, n_turns=2000, n_convs=10, seed=3)
    t.write.mode("overwrite").parquet(str(d / "t"))
    tt = spark.read.parquet(str(d / "t"))
    gen_probes(spark, tt).write.mode("overwrite").parquet(str(d / "p"))
    return tt, spark.read.parquet(str(d / "p"))


def test_fused_flagship_single_shuffle_single_window(stored):
    t, p = stored
    c = _counts(backfill_asof_fused(t, p, tolerance="1 DAY"))
    assert c["exchange"] == 1, "fused flagship must shuffle exactly once"
    assert c["window"] == 1, "all cumulative features must share ONE Window pass"
    assert c["sort"] == 1, "one sort, reused by the window"
    assert c["scan"] == 2


def test_backfill_single_window(stored):
    t, _ = stored
    c = _counts(backfill_features(t))
    assert (c["exchange"], c["window"], c["sort"]) == (1, 1, 1)


def test_rolling_single_window(stored):
    t, _ = stored
    c = _counts(rolling_aggregates(t))
    assert (c["exchange"], c["window"], c["sort"]) == (1, 1, 1)


def test_asof_union_window_single_shuffle(stored):
    t, p = stored
    out = asof_join(
        p, t, on="conv_id", left_ts="query_ts", right_ts="ts",
        direction="backward", tolerance="1 DAY", right_cols=["turn_idx", "role"],
    )
    c = _counts(out)
    assert c["exchange"] == 1, "union-window as-of must shuffle exactly once"


def test_probe_scan_prunes_columns(stored):
    t, p = stored
    fused = backfill_asof_fused(t, p, tolerance="1 DAY")
    jvm = fused.sparkSession._jvm
    plan = fused._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the probe-side scan must read only its 3 columns (pruning), and the
    # transcript text column must not survive past the projection
    assert "ReadSchema: struct<conv_id:string,query_ts:timestamp,probe_id:string>" in plan.replace(
        "timestamp_ntz", "timestamp"
    )


def test_bucketed_table_zero_shuffle(spark, tmp_path):
    """Storage-layout win (100 TB design): over a table bucketed+sorted by
    conv_id (= Iceberg `bucket(N, conv_id)` layout), per-conversation
    window ops need ZERO exchanges — the scan's bucketing satisfies the
    window's required distribution. This is why the production table spec
    in BENCH.md mandates conv_id bucketing."""
    t = gen_transcripts(spark, n_turns=2000, n_convs=10, seed=5)
    try:
        (
            t.write.mode("overwrite")
            .option("path", str(tmp_path / "tx_bucketed"))
            .bucketBy(8, "conv_id")
            .sortBy("conv_id", "turn_idx")
            .saveAsTable("tx_bucketed_test")
        )
        c = _counts(backfill_features(spark.table("tx_bucketed_test")))
        assert c["exchange"] == 0, "bucketed layout must eliminate the shuffle"
        assert c["window"] == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS tx_bucketed_test")


def test_asof_nearest_single_shuffle_no_join(stored):
    t, p = stored
    out = asof_join(
        p, t, on="conv_id", left_ts="query_ts", right_ts="ts",
        direction="nearest", tolerance="1 DAY",
        right_cols=["turn_idx", "role"], tiebreak="turn_idx",
    )
    jvm = out.sparkSession._jvm
    plan = out._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    c = _counts(out)
    assert c["exchange"] == 1, "nearest must share ONE exchange for both directions"
    assert "Join" not in plan, "nearest must not rejoin the two directions"


def test_guarded_flagship_window_partitions_by_bucket(stored):
    """The hot-conversation guard's entire point at the plan level: the
    big cumulative Window must partition by (conv_id, __ob), never by
    conv_id alone — and the guard's extra passes must all be cheap
    aggregates (no second big Window over the union)."""
    t, p = stored
    df = backfill_asof_fused(t, p, tolerance="1 DAY", hot_conv_turns=50, n_hot_buckets=4)
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # every windowspecdefinition over __ts (the big cumulative pass) must
    # carry __ob in its partition spec
    big_specs = [
        s for s in re.findall(r"windowspecdefinition\(([^)]*)\)", plan) if "__ts" in s
    ]
    assert big_specs, "expected the cumulative window spec in the plan"
    for s in big_specs:
        assert "__ob" in s, f"cumulative window not bucket-partitioned: {s}"
    # the carry prefix windows (over __ob ordering) are per-key tiny
    assert "Window" in plan


def test_sessionize_guard_no_forced_carry_broadcast(stored):
    """VERDICT r03 'Wrong #1': the sessionize guard's carry frame has one
    row per (conversation, bucket) for EVERY conversation — its join must
    be left to AQE (which broadcasts only when the runtime size fits),
    never forced with a broadcast hint (guaranteed OOM at 10^9 convs).
    The analyzed plan is where hints live; assert none exist."""
    from kgfarm_spark.operators.windows import sessionize

    t, _ = stored
    df = sessionize(t, gap="30 MINUTE", max_turns_per_task=100)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed
    # still bucket-partitioned: the cumsum window carries __ob
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    specs = [
        s
        for s in re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        if "turn_idx" in s and "__new_session" not in s
    ]
    assert any("__ob" in s for s in specs), "cumsum window must partition by (key, __ob)"


def test_bucketed_backfill_window_partitions_by_bucket(stored):
    t, _ = stored
    df = backfill_features(t, max_turns_per_task=100)
    jvm = df.sparkSession._jvm
    plan = df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    big_specs = [
        s
        for s in re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        if "turn_idx" in s and "__ob" in s
    ]
    assert big_specs, "cumulative window must partition by (conv_id, __ob)"


def test_minhash_verify_join_composite_key(spark):
    """Round-4 shuffle fix: the exact-Jaccard verify joins doc B's
    shingles on the COMPOSITE (id_b, shingle) key. A regression to the
    id-only join re-materializes |shingles(A)| x |shingles(B)| rows per
    candidate pair before filtering (~30x the join output)."""
    from kgfarm_spark.operators.dedup import minhash_lsh_dedup_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta {i}") for i in range(20)],
        "doc_id long, text string",
    )
    df = minhash_lsh_dedup_pairs(docs, "doc_id", "text", n=3, threshold=0.5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    joins = [ln for ln in plan.splitlines() if "HashJoin" in ln or "SortMergeJoin" in ln]
    composite = [ln for ln in joins if re.search(r"\[id_b#\d+L?, shingle#\d+\]", ln)]
    assert composite, f"verify join must key on (id_b, shingle); joins seen:\n" + "\n".join(joins)


def test_gopher_filter_two_scans(spark):
    """Plan-shape regression: the two stateless Gopher rule sets chain
    into ONE corpus scan (quality_gate append -> line_rules append), so
    the full filter reads the corpus exactly twice — stateless chain +
    repetition aggregate — not once per rule set."""
    from kgfarm_spark.operators.textstats import gopher_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    plan = gopher_filter(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") == 2
