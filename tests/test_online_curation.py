"""Online curation (streaming/online.py): fit-frozen model parity with
the batch operators, and stream-vs-batch equality of curate_stream.

The contract is EXACT agreement with the engine's own batch operators on
the fitted corpus (max_vocab=None): score == unigram_logprob, bucket ==
ccnet_buckets, top_bigram_frac == repetition_signals — the apply path
re-derives nothing, it replays frozen JVM-computed artifacts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def model(spark):
    from kgfarm_spark.streaming.online import fit_curation_model

    return fit_curation_model(_docs(spark), max_vocab=None)


def test_score_matches_unigram_logprob_exactly(spark, model):
    from kgfarm_spark.operators.textstats import unigram_logprob
    from kgfarm_spark.streaming.online import score_with_model

    docs = _docs(spark)
    got = {
        r["doc_id"]: (r["n_words"], r["logprob_sum"], r["mean_logprob"])
        for r in score_with_model(docs, model).collect()
    }
    want = {
        r["doc_id"]: (r["n_words"], r["logprob_sum"], r["mean_logprob"])
        for r in unigram_logprob(docs).collect()
    }
    assert got == want and len(got) > 0


def test_bucket_matches_ccnet_buckets_exactly(spark, model):
    from kgfarm_spark.operators.textstats import ccnet_buckets
    from kgfarm_spark.streaming.online import score_with_model

    docs = _docs(spark)
    got = {r["doc_id"]: r["bucket"] for r in score_with_model(docs, model).collect()}
    want = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(docs).collect()}
    assert got == want
    assert {"head", "middle", "tail"} == set(got.values())


def test_top_bigram_frac_matches_repetition_signals(spark, model):
    from kgfarm_spark.operators.textstats import repetition_signals
    from kgfarm_spark.streaming.online import score_with_model

    docs = _docs(spark)
    got = {
        r["doc_id"]: r["top_bigram_frac"]
        for r in score_with_model(docs, model).collect()
    }
    want = {
        r["doc_id"]: r["top_bigram_frac"]
        for r in repetition_signals(docs).collect()
    }
    assert got == want


def test_capped_vocab_oov_floor_and_json_roundtrip(spark):
    from kgfarm_spark.streaming.online import (
        CurationModel,
        fit_curation_model,
        score_with_model,
    )

    docs = _docs(spark)
    full = fit_curation_model(docs, max_vocab=None)
    capped = fit_curation_model(docs, max_vocab=10)  # corpus vocab is 31 words
    assert len(capped.vocab) == 10
    assert capped.n_total == full.n_total
    # OOV floor sits below every real word's logprob
    assert capped.oov_logprob < min(full.vocab.values())
    # capped vocab = top-10 by count: every kept logprob >= every dropped
    kept_min = min(capped.vocab.values())
    dropped = {h: lp for h, lp in full.vocab.items() if h not in capped.vocab}
    assert all(lp <= kept_min for lp in dropped.values())
    # scoring still total and deterministic; n_words unaffected by vocab
    a = score_with_model(docs, capped).select("doc_id", "n_words", "mean_logprob")
    b = score_with_model(docs, capped).select("doc_id", "n_words", "mean_logprob")
    assert sorted(map(repr, a.collect())) == sorted(map(repr, b.collect()))

    rt = CurationModel.from_json(capped.to_json())
    assert rt == capped

    with pytest.raises(ValueError, match="max_vocab"):
        fit_curation_model(docs, max_vocab=0)
    with pytest.raises(ValueError, match="cuts"):
        fit_curation_model(docs, cuts=(0.7, 0.3))
    with pytest.raises(ValueError, match="__toks"):
        score_with_model(docs.withColumn("__toks", F.lit(1)), capped)


def test_curate_stream_matches_batch_twin(spark, tmp_path, model):
    """The full streaming chain (availableNow over a parquet source,
    dedup state keyed on fingerprint within the watermark) must emit the
    same curated multiset as the identical chain run on the batch frame.
    Ids differ for duplicate groups (first-arrival vs arbitrary batch
    pick), so equality is on the content: (text, n_words, mean_logprob,
    bucket)."""
    from kgfarm_spark.streaming.online import curate_stream

    docs = _docs(spark).withColumn(
        "ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(secs=F.col("doc_id").cast("double")),
    )
    # plant exact duplicates (same text, later ts) to exercise the dedup
    dups = docs.filter(F.col("doc_id") % 7 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 MINUTE"))
    corpus = docs.unionByName(dups)
    src = str(tmp_path / "stream_src")
    corpus.write.mode("overwrite").parquet(src)
    corpus = spark.read.parquet(src)

    batch_out = curate_stream(corpus, model, watermark=None)
    key = lambda rows: sorted(
        (r["text"], r["n_words"], r["mean_logprob"], r["bucket"]) for r in rows
    )
    want = key(batch_out.collect())

    stream = spark.readStream.schema(corpus.schema).parquet(src)
    q = (
        curate_stream(stream, model, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("curated_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = key(spark.sql("select * from curated_stream_out").collect())
    assert got == want and len(got) > 0
    # the curated set is smaller than the input and duplicates collapsed
    assert len(got) < corpus.count()
    texts = [t for t, *_ in got]
    assert len(texts) == len(set(texts))


def test_dsir_logweight_matches_dsir_importance_exactly(spark):
    """Frozen DSIR table parity: fit with dsir_target (max_vocab=None),
    apply stateless — dsir_logweight must equal the batch
    dsir_importance statistic bit-for-bit (the lambda table is
    JVM-computed at fit, so no libm drift), and survive a JSON
    round-trip."""
    from kgfarm_spark.operators.textstats import dsir_importance
    from kgfarm_spark.streaming.online import (
        CurationModel,
        fit_curation_model,
        score_with_model,
    )

    docs = _docs(spark)
    target = F.col("doc_id") % 3 == 0
    m = fit_curation_model(docs, max_vocab=None, dsir_target=target)
    assert m.dsir_lambda is not None and m.dsir_alpha == 0.5

    got = {
        r["doc_id"]: (r["n_words"], r["dsir_logweight"])
        for r in score_with_model(docs, m).collect()
    }
    want = {
        r["doc_id"]: (r["n_words"], r["dsir_logweight"])
        for r in dsir_importance(docs, target).collect()
    }
    assert got == want and len(got) > 0

    rt = CurationModel.from_json(m.to_json())
    assert rt == m
    # a model fit WITHOUT a target has no dsir column
    plain = fit_curation_model(docs, max_vocab=None)
    assert "dsir_logweight" not in score_with_model(docs, plain).columns
    with pytest.raises(ValueError, match="dsir_alpha"):
        fit_curation_model(docs, dsir_target=target, dsir_alpha=0.0)


def test_bpe_apply_broadcast_streams_unchanged(spark, tmp_path):
    """Tokenize-at-ingest: bpe_apply(method='broadcast') is a stateless
    Arrow kernel over a broadcast census, so the identical call works on
    a readStream frame and must emit exactly the batch tokens — the
    tokenizer-model analog of score_with_model's frozen-artifact
    pattern."""
    from kgfarm_spark.operators.bpe import bpe_apply, bpe_train

    docs = _docs(spark).limit(200).localCheckpoint()
    _, seg = bpe_train(docs, "text", n_merges=8)
    seg = seg.localCheckpoint()

    src = str(tmp_path / "tok_src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        bpe_apply(stream, seg, "text", "doc_id")
        .writeStream.format("memory")
        .queryName("bpe_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in spark.sql("select * from bpe_stream_out").collect()
    }
    want = {
        r["doc_id"]: list(r["tokens"])
        for r in bpe_apply(docs, seg, "text", "doc_id").collect()
    }
    assert got == want and len(got) == 200




def test_unigram_apply_streams_unchanged(spark, tmp_path):
    """The unigram tokenizer's Viterbi apply is the same stateless
    broadcast shape as bpe_apply: identical call on a readStream frame,
    identical tokens (tokenize-at-ingest for the SentencePiece-style
    model)."""
    from kgfarm_spark.operators.unigram import unigram_apply, unigram_train

    docs = _docs(spark).limit(200).localCheckpoint()
    pieces = unigram_train(docs, "text", vocab_size=300, max_piece_len=4,
                           seed_size=1000, em_iters=1,
                           strategy="local").localCheckpoint()

    src = str(tmp_path / "uni_src")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    q = (
        unigram_apply(stream, pieces, "text", "doc_id", max_piece_len=4)
        .writeStream.format("memory")
        .queryName("uni_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: list(r["tokens"])
        for r in spark.sql("select * from uni_stream_out").collect()
    }
    want = {
        r["doc_id"]: list(r["tokens"])
        for r in unigram_apply(docs, pieces, "text", "doc_id",
                               max_piece_len=4).collect()
    }
    assert got == want and len(got) == 200


# --- property: fit→freeze→apply parity on adversarial corpora ---------------
from hypothesis import HealthCheck, given, settings, strategies as st

# unicode-whitespace-adjacent text: ASCII words, tabs/CR/LF/NBSP runs,
# digits-only tokens, empty and None docs — the token-drift surface
_piece = st.one_of(
    st.sampled_from(["alpha", "beta", "w12", "9", "...", "#tag", "é", "日本"]),
    st.sampled_from([" ", "\t", "\n", "\r\n", " ", "  "]),
)
_doc = st.one_of(st.none(), st.lists(_piece, max_size=12).map("".join))


@given(texts=st.lists(_doc, min_size=1, max_size=25))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fit_apply_parity_property(spark, texts):
    """For ANY corpus (unicode whitespace, NBSP-glued words, None/empty
    docs), frozen-apply == unigram_logprob and frozen buckets ==
    ccnet_buckets — tokenization and hashing can never drift because
    both stay JVM-side."""
    from kgfarm_spark.operators.textstats import ccnet_buckets, unigram_logprob
    from kgfarm_spark.streaming.online import fit_curation_model, score_with_model

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).repartition(4)
    m = fit_curation_model(docs, max_vocab=None)
    got = {
        r["doc_id"]: (r["n_words"], r["logprob_sum"], r["mean_logprob"], r["bucket"])
        for r in score_with_model(docs, m).collect()
    }
    lm = {r["doc_id"]: (r["n_words"], r["logprob_sum"], r["mean_logprob"])
          for r in unigram_logprob(docs).collect()}
    bk = {r["doc_id"]: r["bucket"] for r in ccnet_buckets(docs).collect()}
    assert got == {i: (*lm[i], bk[i]) for i in lm}, texts


def test_compact_curated_sink_end_to_end(spark, tmp_path, model):
    """The full streaming architecture: curate_stream appends to a
    parquet sink, then the batch compactor removes near-duplicates the
    per-event chain cannot see (planted high-Jaccard variants that
    differ by one word, so exact fingerprint dedup keeps both)."""
    from kgfarm_spark.streaming.online import compact_curated_sink, curate_stream

    docs = _docs(spark).withColumn(
        "ts",
        F.to_timestamp(F.lit("2026-01-01 00:00:00"))
        + F.make_interval(secs=F.col("doc_id").cast("double")),
    )
    # near-dup twins: append IN-VOCABULARY tokens -> different
    # fingerprint, near-1 Jaccard, same CCNet bucket (an OOV suffix
    # would tank mean_logprob and the select would drop the twin as
    # tail — correct behavior, wrong fixture); longer twin must win
    # the compaction
    twins = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" the table scan")).alias("text"),
        "ts",
    )
    src = str(tmp_path / "raw_src")
    docs.unionByName(twins).write.mode("overwrite").parquet(src)

    sink = str(tmp_path / "curated_sink")
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = (
        curate_stream(stream, model, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    sunk = spark.read.parquet(sink)
    n_sunk = sunk.count()
    # both twin halves survive the exact-fingerprint stream dedup
    survivors = {r["doc_id"] for r in sunk.select("doc_id").collect()}
    twin_pairs = [(i, i + 200000) for i in range(0, 615, 5)
                  if i in survivors and i + 200000 in survivors]
    assert twin_pairs, "fixture must land at least one full twin pair in the sink"

    out = str(tmp_path / "compacted")
    kept, stats = compact_curated_sink(
        spark, sink, out_path=out, neardup_kw={"threshold": 0.6}
    )
    assert stats["rows_in"] == n_sunk and stats["out_path"] == out
    assert stats["rows_out"] == n_sunk - stats["dropped"] > 0
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    for base_id, twin_id in twin_pairs:
        # longer twin wins, base dropped
        assert twin_id in kept_ids and base_id not in kept_ids, (base_id, twin_id)
    # compacted parquet really on disk and re-readable
    assert spark.read.parquet(out).count() == stats["rows_out"]


def test_bucket_drift_zero_on_fit_corpus(spark, model):
    """On the fit corpus itself the observed bucket rates equal the
    fitted-cut expectations up to the empty-doc mass (empty docs are
    forced 'tail' outside the ranking), so head/middle drift ≈ 0 and
    tail absorbs the empties; on a shifted shard (tail-only docs) drift
    is grossly nonzero."""
    from kgfarm_spark.streaming.online import bucket_drift, score_with_model

    docs = _docs(spark)
    scored = score_with_model(docs, model)
    n_empty = scored.filter(F.col("n_words") == 0).count()
    n = docs.count()
    drift = {r["bucket"]: r for r in bucket_drift(scored, model).collect()}
    assert set(drift) == {"head", "middle", "tail"}
    for b in ("head", "middle"):
        # rank terciles are exact up to ties; empties only inflate tail
        assert abs(drift[b]["drift"]) <= n_empty / n + 0.02, drift[b]
    assert abs(sum(r["rate"] for r in drift.values()) - 1.0) < 1e-6

    # a shard drawn ONLY from the fitted tail: tail rate 1.0, drift ~ 2/3
    tail_ids = [r["doc_id"] for r in scored.filter("bucket = 'tail'").collect()]
    shard = scored.filter(F.col("doc_id").isin(tail_ids[:50]))
    d2 = {r["bucket"]: r for r in bucket_drift(shard, model).collect()}
    assert set(d2) == {"tail"} and d2["tail"]["rate"] == 1.0
    assert d2["tail"]["drift"] > 0.6


def test_reserved_name_guards(spark, model):
    """score_with_model and curate_stream must REFUSE input frames whose
    columns collide with stage outputs — withColumn would silently
    replace them and the mid-chain select(*pre_cols) would propagate the
    clobbered values (the r06 self-review finding; house rule from
    curation.py's up-front validation)."""
    from kgfarm_spark.streaming.online import curate_stream, score_with_model

    docs = _docs(spark)
    for bad in ("bucket", "n_words", "mean_logprob"):
        with pytest.raises(ValueError, match=bad):
            score_with_model(docs.withColumn(bad, F.lit(1)), model)
    for bad in ("keep", "fingerprint", "alpha_ok"):
        with pytest.raises(ValueError, match=bad):
            curate_stream(docs.withColumn(bad, F.lit(1)), model)
    # dsir_logweight is reserved only when the model carries a DSIR table
    score_with_model(docs.withColumn("dsir_logweight", F.lit(1)), model)
