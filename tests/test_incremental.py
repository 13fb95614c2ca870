"""Incremental (cross-shard) Bloom-filter dedup: the result must be
EXACT (equal to the plain anti-join) regardless of filter sizing —
false positives are cleared by the verify join, false negatives are
impossible — with the probe map-side and only candidates joining."""

import pytest
from pyspark.sql import functions as F

from kgfarm_spark.operators.incremental import (
    bloom_fpr,
    build_history_filter,
    dedup_against_history,
)


def _corpus(spark):
    hist = spark.createDataFrame(
        [(i, f"history doc {i} body") for i in range(200)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        # 0-49: exact dups of history docs; 50-99 novel; one NULL text
        [(1000 + i, f"history doc {i} body") for i in range(50)]
        + [(2000 + i, f"novel doc {i} body") for i in range(50)]
        + [(3000, None)],
        "doc_id long, text string",
    )
    return hist, new


def _expected(hist, new):
    """Plain anti-join on text — the semantics the bloom path must hit."""
    return {
        r["doc_id"]
        for r in new.join(
            hist.select("text").distinct().withColumnRenamed("text", "__t"),
            new["text"] == F.col("__t"),
            "left_anti",
        ).collect()
    }


@pytest.mark.parametrize("broadcast_candidates", [True, False])
def test_bloom_dedup_exact(spark, broadcast_candidates):
    hist, new = _corpus(spark)
    model = build_history_filter(hist, n_bits=1 << 14, k=4)
    out = dedup_against_history(
        new, model, hist, broadcast_candidates=broadcast_candidates
    )
    got = {r["doc_id"] for r in out.collect()}
    assert got == _expected(hist, new)
    # NULL text is always novel
    assert 3000 in got
    # all 50 true dups were removed, all 50 novels survived
    assert got == {2000 + i for i in range(50)} | {3000}


def test_bloom_dedup_exact_under_heavy_false_positives(spark):
    """An undersized filter (64 bits for 200 docs) fires on nearly
    everything — the verify join must still produce the exact result,
    and the audit flag must show the false positives."""
    hist, new = _corpus(spark)
    model = build_history_filter(hist, n_bits=64, k=2)
    assert bloom_fpr(model) > 0.5  # saturated on purpose
    out = dedup_against_history(new, model, hist).collect()
    assert {r["doc_id"] for r in out} == _expected(hist, new)
    # survivors that the saturated filter flagged = cleared false positives
    assert any(r["bloom_candidate"] for r in out if r["doc_id"] != 3000)


def test_bloom_no_false_negatives(spark):
    """Every true duplicate must be a candidate (bloom guarantee) —
    checked via the audit flag on a well-sized filter."""
    hist, new = _corpus(spark)
    model = build_history_filter(hist, n_bits=1 << 16, k=6)
    flagged = dedup_against_history(new, model, hist)
    # none of the removed dups appear; all survivors present exactly once
    rows = flagged.collect()
    assert len(rows) == len({r["doc_id"] for r in rows})
    # fpr of a well-sized filter is tiny
    assert bloom_fpr(model) < 0.01


def test_bloom_validation(spark):
    hist, _ = _corpus(spark)
    with pytest.raises(ValueError, match="multiple of 8"):
        build_history_filter(hist, n_bits=12)
    with pytest.raises(ValueError, match="k must be"):
        build_history_filter(hist, k=9)


def test_bloom_dedup_streams_unchanged(spark, tmp_path):
    """The batch operator IS the streaming twin: probe = stateless
    broadcast projection, verify = per-batch stream-static left-outer
    (broadcast_candidates=False) — no state store. Stream output must
    equal the batch call on the same shard."""
    hist, new = _corpus(spark)
    new = new.filter(F.col("text").isNotNull())  # parquet schema simplicity
    model = build_history_filter(hist, n_bits=1 << 14, k=4)

    src = str(tmp_path / "ingest")
    new.write.mode("overwrite").parquet(src)
    batch_ids = {
        r["doc_id"]
        for r in dedup_against_history(
            spark.read.parquet(src), model, hist, broadcast_candidates=False
        ).collect()
    }

    stream = spark.readStream.schema(new.schema).parquet(src)
    q = (
        dedup_against_history(stream, model, hist, broadcast_candidates=False)
        .writeStream.format("memory")
        .queryName("bloom_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r["doc_id"] for r in spark.sql("select * from bloom_stream_out").collect()}
    assert got == batch_ids and len(got) > 0
