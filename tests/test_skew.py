"""Skew operators: salted two-phase aggregation and fanout join must be
EXACTLY equivalent to their direct counterparts (same rows, same values),
and hot-key detection must find the planted hot key deterministically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgfarm_spark.operators.skew import (
    detect_hot_keys,
    salted_fanout_join,
    salted_two_phase_agg,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # conv_hot has 5000 rows; 50 other convs have 20 each (Zipf-ish head)
    hot = spark.range(5000).select(
        F.lit("conv_hot").alias("conv_id"),
        F.col("id").alias("v"),
        (F.col("id") % 7).alias("w"),
    )
    tail = spark.range(1000).select(
        F.concat(F.lit("conv_"), (F.col("id") % 50).cast("string")).alias("conv_id"),
        F.col("id").alias("v"),
        (F.col("id") % 7).alias("w"),
    )
    return hot.unionByName(tail)


def test_two_phase_agg_matches_direct(spark, skewed):
    aggs = {
        "n": ("count", "v"),
        "v_sum": ("sum", "v"),
        "v_max": ("max", "v"),
        "v_min": ("min", "v"),
        "w_avg": ("avg", "w"),
    }
    salted = salted_two_phase_agg(skewed, "conv_id", aggs, n_salt=8)
    direct = skewed.groupBy("conv_id").agg(
        F.count("v").alias("n"),
        F.sum("v").alias("v_sum"),
        F.max("v").alias("v_max"),
        F.min("v").alias("v_min"),
        F.avg("w").alias("w_avg"),
    )
    s = {r["conv_id"]: r.asDict() for r in salted.collect()}
    d = {r["conv_id"]: r.asDict() for r in direct.collect()}
    assert s == d


def test_two_phase_rejects_non_mergeable(skewed):
    with pytest.raises(ValueError):
        salted_two_phase_agg(skewed, "conv_id", {"m": ("median", "v")})


def test_fanout_join_matches_direct(spark, skewed):
    dim = spark.createDataFrame(
        [("conv_hot", "HOT"), ("conv_1", "T1"), ("conv_2", "T2")],
        "conv_id string, tag string",
    )
    salted = salted_fanout_join(skewed, dim, "conv_id", n_salt=8)
    direct = skewed.join(dim, "conv_id", "inner")
    assert salted.count() == direct.count()
    s = sorted(map(str, salted.select("conv_id", "v", "w", "tag").collect()))
    d = sorted(map(str, direct.select("conv_id", "v", "w", "tag").collect()))
    assert s == d


def test_fanout_join_salt_actually_spreads(spark, skewed):
    # the hot key's rows must land in >1 salt bucket
    from kgfarm_spark.operators.skew import _row_salt

    n = (
        skewed.filter(F.col("conv_id") == "conv_hot")
        .select(_row_salt(["conv_id", "v", "w"], 8).alias("s"))
        .distinct()
        .count()
    )
    assert n > 4


def test_detect_hot_keys(spark, skewed):
    hot = detect_hot_keys(skewed, "conv_id", ["v"], threshold_rows=1000, sample_mod=10)
    keys = [r["conv_id"] for r in hot.collect()]
    assert keys == ["conv_hot"]
    # deterministic: same result twice
    keys2 = [r["conv_id"] for r in hot.collect()]
    assert keys == keys2


def test_stage_metrics_degrades_without_ui(spark):
    # the shared test session runs with spark.ui.enabled=false — metrics
    # must degrade to empty, never fail the job
    from kgfarm_spark.plans.metrics import StageMetrics

    with StageMetrics(spark) as m:
        spark.range(10).count()
    assert m.stages == []
    assert m.summary()["n_stages"] == 0


def test_hybrid_skew_join_exact_parity(spark):
    """hybrid_skew_join (salt only detected hot keys, direct path for the
    tail) must equal the plain join for inner and left, with hot keys from
    detect_hot_keys feeding it end-to-end."""
    from kgfarm_spark.operators.skew import detect_hot_keys, hybrid_skew_join

    rows = [(f"k{i % 50}" if i % 4 else "HOT", i, float(i)) for i in range(20_000)]
    big = spark.createDataFrame(rows, "k string, i long, v double")
    small = spark.createDataFrame(
        [(f"k{i}", f"dim{i}") for i in range(40)] + [("HOT", "dimhot")],
        "k string, d string",
    )

    hot = detect_hot_keys(big, "k", ["i"], threshold_rows=1000)
    assert "HOT" in {r["k"] for r in hot.collect()}

    for how in ("inner", "left"):
        exp = big.join(small, "k", how)
        got = hybrid_skew_join(big, small, "k", hot, n_salt=8, how=how)
        key = lambda r: (r["k"], r["i"], r["v"], r["d"])
        assert sorted(map(key, got.collect())) == sorted(map(key, exp.collect()))
