"""Measured MinHash-LSH candidate recall vs true Jaccard (VERDICT r02
'wrong #3'): the production preset must catch near-dups at the typical
0.7-0.8 thresholds; the gate preset (8/4, oracle-portable) is expected
to be lossier at 0.5. The corpus is seeded and the hash functions are
deterministic, so recall here is a FIXED number, not a sample.

Theory: P(candidate | J) = 1 - (1 - J^r)^b with r rows/band, b bands.
  gate 8/4 (r=2, b=4):      P(0.5)=0.68  P(0.7)=0.94  P(0.9)=1.00
  production 128/32 (r=4):  P(0.5)=0.87  P(0.7)=1.00  P(0.9)=1.00
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgfarm_spark.operators.dedup import (
    LSH_PRODUCTION,
    lsh_candidate_pairs,
    minhash_signatures,
)

N_PAIRS = 40
DOC_WORDS = 100


def _controlled_corpus(spark, jaccard: float):
    """N_PAIRS doc pairs with word-set Jaccard ≈ ``jaccard``; vocab is
    disjoint across pairs (recall is measured, precision isn't the point).
    With unigram shingles (n=1) the shingle set IS the word set, so the
    target Jaccard is exact by construction: |A|=|B|=DOC_WORDS sharing m
    words → J = m/(2·DOC_WORDS - m)."""
    m = round(2 * DOC_WORDS * jaccard / (1 + jaccard))
    rows = []
    for p in range(N_PAIRS):
        shared = [f"p{p}s{i}" for i in range(m)]
        a_only = [f"p{p}a{i}" for i in range(DOC_WORDS - m)]
        b_only = [f"p{p}b{i}" for i in range(DOC_WORDS - m)]
        rows.append((2 * p, " ".join(shared + a_only)))
        rows.append((2 * p + 1, " ".join(shared + b_only)))
    return spark.createDataFrame(rows, "doc_id long, text string"), m / (
        2 * DOC_WORDS - m
    )


def _recall(spark, jaccard: float, num_hashes: int, bands: int, portable: bool):
    df, true_j = _controlled_corpus(spark, jaccard)
    sigs = minhash_signatures(
        df, "doc_id", "text", n=1, num_hashes=num_hashes, portable=portable
    )
    cand = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(sigs, "doc_id", num_hashes, bands).collect()
    }
    hits = sum((2 * p, 2 * p + 1) in cand for p in range(N_PAIRS))
    return hits / N_PAIRS, true_j


@pytest.mark.parametrize(
    "jaccard,min_recall",
    [(0.5, 0.75), (0.7, 0.97), (0.9, 1.0)],
)
def test_production_preset_recall(spark, jaccard, min_recall):
    recall, true_j = _recall(
        spark,
        jaccard,
        LSH_PRODUCTION["num_hashes"],
        LSH_PRODUCTION["bands"],
        LSH_PRODUCTION["portable"],
    )
    assert abs(true_j - jaccard) < 0.02
    assert recall >= min_recall, (jaccard, recall)


def test_gate_preset_is_lossier_at_low_jaccard(spark):
    """The 8/4 gate preset exists for oracle portability, not production
    recall — document the gap it leaves at J=0.5."""
    prod, _ = _recall(spark, 0.5, 128, 32, False)
    gate, _ = _recall(spark, 0.5, 8, 4, True)
    assert prod >= gate
    assert gate >= 0.4  # still a usable candidate generator at gate scale


def test_similarity_edge_inputs(spark):
    """Review findings: empty query sets return empty (not AxisError),
    k<1 and NULL query ids raise clearly, empty corpus fit raises."""
    import pytest

    from kgfarm_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_twophase,
        fit_ivf_centroids,
        ivf_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    empty_q = emb.filter("vec_id < 0").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    assert cosine_topk_twophase(emb, empty_q, k=3).count() == 0
    assert ivf_topk(emb, empty_q, k=3, n_cells=4).count() == 0
    q = emb.limit(2).select(F.col("vec_id").alias("query_id"), "embedding")
    for fn in (cosine_topk, cosine_topk_twophase, ivf_topk):
        with pytest.raises(ValueError, match="k must be"):
            fn(emb, q, k=0)
    null_q = q.withColumn("query_id", F.lit(None).cast("long"))
    with pytest.raises(ValueError, match="NULL"):
        cosine_topk_twophase(emb, null_q, k=3)
    with pytest.raises(ValueError, match="empty"):
        fit_ivf_centroids(emb.filter("vec_id < 0"))
