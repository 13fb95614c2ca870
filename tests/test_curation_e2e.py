"""End-to-end curation pipeline (curation.curate) — VERDICT r05 #1.

The individual stages are each oracle-checked through __spark_entry__;
these tests pin the COMPOSITION: per-stage counts, stage-boundary
equivalence against hand-composed stages, doc-id stability, partition
invariance, and the toggles.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

#: pinned per-stage counts for the driver query's exact configuration at
#: sf0.001 (deterministic: every stage is partition-invariant)
PINNED_STAGES = [
    ("input", 615, 0),
    ("gopher_filter", 396, 219),
    ("exact_dedup", 351, 45),
    ("neardup_lsh", 301, 50),
    ("decontaminate", 230, 71),
    ("ccnet_select", 153, 77),
    ("pack_sequences", 153, 0),
]


def _corpus(spark):
    from kgfarm_spark.entry_pipeline import _dup_corpus

    return _dup_corpus(spark, SF_SMOKE)


def test_e2e_stage_counts_pinned(spark):
    from kgfarm_spark.entry_queries import QUERIES
    import kgfarm_spark.entry_pipeline  # noqa: F401  (registers)

    rows = QUERIES["curation_pipeline_e2e"](spark, SF_SMOKE).collect()
    got = [(r["stage"], r["rows"], r["dropped"]) for r in rows]
    assert got == PINNED_STAGES


def test_e2e_matches_hand_composed_stages(spark):
    """curate()'s surviving id set must equal composing the public stage
    operators by hand — the composition adds orchestration, never
    semantics. Catches schema drift / id instability between stages."""
    from kgfarm_spark.curation import curate
    from kgfarm_spark.operators.dedup import (
        decontaminate,
        dedup_keep_component_best,
        exact_dedup,
        minhash_lsh_dedup_pairs,
    )
    from kgfarm_spark.operators.textstats import (
        ccnet_buckets,
        fingerprint,
        gopher_filter,
    )

    corpus = _corpus(spark)
    train = corpus.filter(F.col("doc_id") % 97 != 0)
    evalb = corpus.filter(F.col("doc_id") % 97 == 0).select("text")

    packed, manifest = curate(
        train,
        eval_df=evalb,
        neardup_kw={"threshold": 0.5},
        decontaminate_kw={"n": 3, "min_overlap": 2},
        pack_budget=512,
    )
    got_ids = sorted(r["doc_id"] for r in packed.select("doc_id").collect())

    # hand-compose the same chain
    cur = train.join(
        gopher_filter(train).filter(F.col("keep")).select("doc_id"), "doc_id"
    )
    cur = exact_dedup(
        fingerprint(cur), on=["fingerprint"], order_col="doc_id"
    ).drop("fingerprint")
    pairs = minhash_lsh_dedup_pairs(cur, "doc_id", "text", n=3, threshold=0.5)
    scored = cur.withColumn("__len", F.length(F.coalesce(F.col("text"), F.lit(""))))
    cur = dedup_keep_component_best(scored, pairs, "doc_id", "__len").drop("__len")
    dirty = decontaminate(cur, evalb, n=3, min_overlap=2)
    cur = cur.join(dirty.select("doc_id"), "doc_id", "left_anti")
    keep = (
        ccnet_buckets(cur)
        .filter(F.col("bucket").isin("head", "middle"))
        .select("doc_id")
    )
    cur = cur.join(keep, "doc_id")
    want_ids = sorted(r["doc_id"] for r in cur.select("doc_id").collect())

    assert got_ids == want_ids
    assert manifest["surviving_rows"] == len(want_ids)
    # packing layout invariants: exclusive prefix sums are consistent
    rows = sorted(packed.collect(), key=lambda r: r["doc_id"])
    acc = 0
    for r in rows:
        assert r["tokens_before"] == acc
        assert r["seq_id"] == acc // 512
        acc += r["n_tokens"]


def test_e2e_partition_invariant(spark):
    from kgfarm_spark.curation import curate

    corpus = _corpus(spark)
    outs = []
    for nparts in (2, 16):
        packed, manifest = curate(
            corpus.repartition(nparts),
            neardup_kw={"threshold": 0.5},
            pack_budget=256,
        )
        outs.append(
            (
                [(s["stage"], s["rows"], s["dropped"]) for s in manifest["stages"]],
                sorted(map(tuple, packed.select("doc_id", "seq_id").collect())),
            )
        )
    assert outs[0] == outs[1]


def test_e2e_toggles_and_validation(spark):
    from kgfarm_spark.curation import curate

    docs = _corpus(spark).limit(80).localCheckpoint()

    # minimal chain: no gopher, no neardup, no scorer — just exact dedup
    # + packing; manifest reflects exactly the stages that ran
    packed, manifest = curate(
        docs, gopher=False, neardup=None, scorer=None, pack_budget=128
    )
    names = [s["stage"] for s in manifest["stages"]]
    assert names == ["input", "exact_dedup", "pack_sequences"]
    assert packed.count() == manifest["surviving_rows"]

    # dsir scorer path
    _, m2 = curate(
        docs,
        gopher=False,
        neardup=None,
        scorer="dsir",
        dsir_target=F.col("doc_id") % 2 == 0,
        dsir_k=10,
        pack_budget=128,
    )
    assert [s["stage"] for s in m2["stages"]][-2:] == ["dsir_select", "pack_sequences"]
    assert m2["surviving_rows"] == 10

    with pytest.raises(ValueError, match="neardup"):
        curate(docs, neardup="fuzzy")
    with pytest.raises(ValueError, match="scorer"):
        curate(docs, scorer="kenlm")
    with pytest.raises(ValueError, match="dsir_target"):
        curate(docs, scorer="dsir")


def test_e2e_manifest_written(spark, tmp_path):
    import json

    from kgfarm_spark.curation import curate

    docs = _corpus(spark).limit(40).localCheckpoint()
    path = str(tmp_path / "manifest.json")
    _, manifest = curate(
        docs, gopher=False, neardup=None, scorer=None, manifest_path=path
    )
    on_disk = json.load(open(path))
    assert on_disk["surviving_rows"] == manifest["surviving_rows"]
    assert [s["stage"] for s in on_disk["stages"]] == [
        s["stage"] for s in manifest["stages"]
    ]


def test_facade_curate(spark):
    from kgfarm_spark.api import FeatureFarm

    ff = FeatureFarm(spark)
    docs = _corpus(spark).limit(60).localCheckpoint()
    packed, manifest = ff.curate(docs, gopher=False, neardup=None, scorer=None)
    assert packed.count() == manifest["surviving_rows"] > 0


def test_e2e_durable_checkpoint_dir(spark, tmp_path):
    """checkpoint_dir switches stage boundaries to parquet writes — same
    counts and surviving ids as the localCheckpoint path, with per-stage
    paths recorded in the manifest and real files on disk."""
    import os

    from kgfarm_spark.curation import curate

    docs = _corpus(spark).limit(120).localCheckpoint()
    packed_a, m_a = curate(
        docs, gopher=False, neardup="jaccard",
        neardup_kw={"threshold": 0.5}, scorer=None, pack_budget=256,
    )
    ck = str(tmp_path / "stages")
    packed_b, m_b = curate(
        docs, gopher=False, neardup="jaccard",
        neardup_kw={"threshold": 0.5}, scorer=None, pack_budget=256,
        checkpoint_dir=ck,
    )
    key = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert key(packed_a) == key(packed_b)
    a_counts = [(s["stage"], s["rows"], s["dropped"]) for s in m_a["stages"]]
    b_counts = [(s["stage"], s["rows"], s["dropped"]) for s in m_b["stages"]]
    assert a_counts == b_counts
    for s in m_b["stages"]:
        if s["stage"] != "pack_sequences":
            assert "checkpoint" in s and os.path.isdir(s["checkpoint"]), s


def test_reserved_names_cover_id_and_text(spark):
    """Review finding (r06): id_col='fingerprint' must be rejected — the
    dedup stage would overwrite then drop the id column."""
    from kgfarm_spark.curation import curate

    docs = _corpus(spark).limit(10).selectExpr(
        "doc_id AS fingerprint", "text"
    )
    with pytest.raises(ValueError, match="fingerprint"):
        curate(docs, id_col="fingerprint")
    docs2 = _corpus(spark).limit(10).selectExpr("doc_id", "text AS n_tokens")
    with pytest.raises(ValueError, match="n_tokens"):
        curate(docs2, text_col="n_tokens")


def test_semantic_neardup_stage(spark):
    """neardup='semantic' routes the near-dup stage through SemDeDup
    (IVF-cell cosine pairs over emb_col); planted duplicate embeddings
    collapse to one survivor (longest text wins)."""
    from kgfarm_spark.curation import curate

    base = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("doc_id"), "embedding"
    ).limit(200)
    docs = base.withColumn(
        "text", F.concat(F.lit("doc body "), F.col("doc_id").cast("string"))
    )
    # plant exact-duplicate embeddings with LONGER text (should win)
    dups = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "embedding",
        F.concat(F.col("text"), F.lit(" longer duplicate twin")).alias("text"),
    )
    corpus = docs.unionByName(dups).localCheckpoint()
    n_dups = dups.count()

    packed, manifest = curate(
        corpus,
        gopher=False,
        exact=False,
        neardup="semantic",
        emb_col="embedding",
        neardup_kw={"threshold": 0.999, "n_cells": 4, "nprobe": 4},
        scorer=None,
        pack_budget=128,
    )
    st = {s["stage"]: s for s in manifest["stages"]}
    assert st["neardup_semantic"]["dropped"] == n_dups
    # the longer twin survives, the original is dropped
    ids = {r["doc_id"] for r in packed.select("doc_id").collect()}
    assert all(i + 100000 in ids and i not in ids
               for i in range(0, 200, 10) if i % 10 == 0)

    with pytest.raises(ValueError, match="emb_col"):
        curate(corpus, neardup="semantic")
    with pytest.raises(ValueError, match="emb_col"):
        curate(corpus, neardup="semantic", emb_col="missing_vec")


def test_resume_skips_completed_stages(spark, tmp_path):
    """resume=True re-reads completed stage parquet instead of
    recomputing: same counts/ids as the cold run, every resumed record
    flagged; changing a mid-chain parameter invalidates that stage and
    everything downstream while the untouched head still resumes."""
    from kgfarm_spark.curation import curate

    docs = _corpus(spark).limit(120).localCheckpoint()
    ck = str(tmp_path / "stages")
    kw = dict(gopher=False, neardup="jaccard", neardup_kw={"threshold": 0.5},
              scorer="ccnet", keep_buckets=("head", "middle"), pack_budget=256)
    packed_a, m_a = curate(docs, checkpoint_dir=ck, **kw)
    packed_b, m_b = curate(docs, checkpoint_dir=ck, resume=True, **kw)

    key = lambda df: sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert key(packed_a) == key(packed_b)
    a = [(s["stage"], s["rows"], s["dropped"]) for s in m_a["stages"]]
    b = [(s["stage"], s["rows"], s["dropped"]) for s in m_b["stages"]]
    assert a == b
    for s in m_b["stages"]:
        if s["stage"] == "pack_sequences":
            assert "resumed" not in s  # always recomputed (final, cheap)
        else:
            assert s.get("resumed") is True, s

    # change a TAIL param: head resumes, the changed stage recomputes
    kw2 = dict(kw, keep_buckets=("head",))
    _, m_c = curate(docs, checkpoint_dir=ck, resume=True, **kw2)
    st = {s["stage"]: s for s in m_c["stages"]}
    assert st["input"].get("resumed") is True
    assert st["exact_dedup"].get("resumed") is True
    assert st["neardup_jaccard"].get("resumed") is True
    assert "resumed" not in st["ccnet_select"]
    assert st["ccnet_select"]["rows"] <= st["neardup_jaccard"]["rows"]

    # change a HEAD param: nothing downstream may resume (chain fp flips)
    kw3 = dict(kw, neardup_kw={"threshold": 0.4})
    _, m_d = curate(docs, checkpoint_dir=ck, resume=True, **kw3)
    st_d = {s["stage"]: s for s in m_d["stages"]}
    assert st_d["input"].get("resumed") is True
    assert st_d["exact_dedup"].get("resumed") is True
    assert "resumed" not in st_d["neardup_jaccard"]
    assert "resumed" not in st_d["ccnet_select"]

    with pytest.raises(ValueError, match="checkpoint_dir"):
        curate(docs, resume=True)


def test_tokenizer_aware_packing(spark):
    """curate(tokenizer=('bpe'|'unigram', model)) packs by REAL model
    tokens: the pack stage's total_tokens must equal the sum of the
    apply kernel's token counts over the surviving docs, and a bad
    tokenizer arg must fail fast (before any stage runs)."""
    from kgfarm_spark.curation import curate
    from kgfarm_spark.operators.bpe import bpe_apply, bpe_train
    from kgfarm_spark.operators.unigram import unigram_apply, unigram_train

    docs = _corpus(spark)
    _, seg = bpe_train(docs, "text", n_merges=8, strategy="local")
    kw = dict(
        gopher=False, exact=True, neardup=None, scorer=None, pack_budget=64
    )
    packed, manifest = curate(docs, tokenizer=("bpe", seg), **kw)
    pack_stage = manifest["stages"][-1]
    assert pack_stage["tokenizer"] == "bpe"
    # surviving docs = exact-dedup output; recount independently
    survivors = packed.select("doc_id")
    want = (
        bpe_apply(docs.join(survivors, "doc_id"), seg, "text", "doc_id")
        .select(F.sum(F.size("tokens")).alias("t"))
        .first()["t"]
    )
    assert pack_stage["total_tokens"] == want

    pieces = unigram_train(docs, "text", vocab_size=80, max_piece_len=4,
                           seed_size=500, em_iters=1, strategy="local")
    packed_u, man_u = curate(docs, tokenizer=("unigram", pieces), **kw)
    up = man_u["stages"][-1]
    assert up["tokenizer"] == "unigram"
    want_u = (
        unigram_apply(docs.join(packed_u.select("doc_id"), "doc_id"),
                      pieces, "text", "doc_id", max_piece_len=4)
        .select(F.sum(F.size("tokens")).alias("t"))
        .first()["t"]
    )
    # unigram_apply default max_piece_len must match training's pieces:
    # trained with max_piece_len=4, and no trained piece exceeds 4 chars,
    # so decoding with the default window (8) finds the same segments
    assert up["total_tokens"] == want_u

    from kgfarm_spark.operators.wordpiece import wordpiece_apply, wordpiece_train

    _, vocab = wordpiece_train(docs, "text", n_merges=8)
    packed_w, man_w = curate(docs, tokenizer=("wordpiece", vocab), **kw)
    wp = man_w["stages"][-1]
    assert wp["tokenizer"] == "wordpiece"
    want_w = (
        wordpiece_apply(docs.join(packed_w.select("doc_id"), "doc_id"),
                        vocab, "text", "doc_id")
        .select(F.sum(F.size("tokens")).alias("t"))
        .first()["t"]
    )
    assert wp["total_tokens"] == want_w

    with pytest.raises(ValueError, match="tokenizer"):
        curate(docs, tokenizer=("sentencepiece", seg), **kw)
    with pytest.raises(ValueError, match="tokenizer"):
        curate(docs, tokenizer="bpe", **kw)


def test_materialize_returns_training_sequences(spark):
    """curate(materialize=True, tokenizer=...) must return actual
    budget-sized sequences of real model tokens whose concatenation
    reproduces the surviving corpus's tokens in id order."""
    from kgfarm_spark.curation import curate
    from kgfarm_spark.operators.bpe import bpe_apply, bpe_train

    docs = _corpus(spark)
    _, seg = bpe_train(docs, "text", n_merges=8, strategy="local")
    seqs, manifest = curate(
        docs, tokenizer=("bpe", seg), materialize=True, pad_token="<pad>",
        gopher=False, exact=True, neardup=None, scorer=None, pack_budget=64,
    )
    rows = seqs.orderBy("seq_id").collect()
    assert manifest["stages"][-1]["materialized"] is True
    assert all(len(r["tokens"]) == 64 for r in rows)  # padded to budget
    assert all(r["n_tokens"] == 64 for r in rows[:-1])
    flat = [t for r in rows for t in r["tokens"] if t != "<pad>"]
    survivors = seqs.sparkSession.createDataFrame(
        [(r["seq_id"],) for r in rows], "seq_id long")  # noqa: F841
    # recompute the surviving corpus's tokens independently: exact dedup
    # is the only dropping stage here, so re-derive it from the manifest
    # row count via the layout-mode twin
    layout, man2 = curate(
        docs, tokenizer=("bpe", seg),
        gopher=False, exact=True, neardup=None, scorer=None, pack_budget=64,
    )
    kept = layout.select("doc_id")
    want = [t for r in bpe_apply(docs.join(kept, "doc_id"), seg,
                                 "text", "doc_id")
            .orderBy("doc_id").collect() for t in r["tokens"]]
    assert flat == want
    assert manifest["stages"][-1]["total_tokens"] == len(want)
