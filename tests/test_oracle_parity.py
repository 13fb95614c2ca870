"""Driver-contract parity: every queries() entry matches its oracle_sql()
on DuckDB at sf0.001 (row count + schema + order-insensitive value hash) —
the same gate the driver runs at sf0.01."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def _norm(v):
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return f"{v:.6g}"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def df_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted("|".join(_norm(v) for v in row) for row in pdf.itertuples(index=False))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def _query_names():
    from kgfarm_spark.entry_queries import ORACLES, QUERIES

    return sorted(n for n in QUERIES if n in ORACLES)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(spark, duck, name):
    from kgfarm_spark.entry_queries import ORACLES, QUERIES

    spdf = QUERIES[name](spark, SF_SMOKE).toPandas()
    opdf = duck.execute(ORACLES[name]).df()
    assert len(spdf) == len(opdf), f"row count {len(spdf)} != oracle {len(opdf)}"
    assert sorted(spdf.columns) == sorted(opdf.columns)
    assert df_hash(spdf) == df_hash(opdf), f"value hash mismatch for {name}"


def test_entry_smoke(spark):
    import __spark_entry__ as m

    df = m.entry(spark)
    assert df.count() > 0
    assert set(["conv_id", "query_ts", "probe_id", "matched_ts"]).issubset(df.columns)


def test_queries_have_oracles():
    from kgfarm_spark.entry_queries import ORACLES, QUERIES

    missing = set(QUERIES) - set(ORACLES)
    # non-SQL-expressible ops may be rows-only; keep the list explicit
    # (learned kernels — seeded MLP / MinHash / softmax heads — carry
    # exact-parity pytest twins in tests/test_embeddings.py instead)
    allowed_rows_only = {
        "numeric_column_embeddings",
        "minhash_column_embeddings",
        "transform_recommendations",
        "cleaning_recommendations",
        "feature_selection_scores",
        "multimodal_features",
        "auto_pipeline_model_eval",  # pyspark.ml fit — pinned metrics in test_golden_e2e
        "quantile_transform_fitted",
        "power_transform_yeo_johnson",
        "lof_outliers",      # LOF kernel — loop-twin tested in test_cleaning_transforms
        "pkfk_classified",   # trained classifier head — tested in test_pkfk_model
        "simhash_neardup",   # xxhash64 fingerprint (JVM-only) — banded==brute pinned in test_pipeline_ops
        "semantic_neardup",  # IVF k-means quantizer — full-probe==brute pinned in test_pipeline_ops
        "bpe_merges",        # iterative argmax+re-segment loop (non-SQL) — exact
                             # parity vs the textbook pure-Python BPE in TestBPE
        "curation_pipeline_e2e",  # LSH components + exact-rank chain (non-SQL
                             # end-to-end); per-stage counts pinned + hand-composed
                             # stage equivalence in test_curation_e2e
        "unigram_pieces",    # iterative EM fit (non-SQL) — independent pure-Python
                             # EM twin parity in TestUnigramTokenizer; seed stage
                             # oracle-checked via unigram_seed_counts
        "pq_topk_ann",       # per-subspace k-means codebooks (non-SQL) — exact-
                             # covering == brute force + recall pins + partition
                             # invariance in TestProductQuantization
        "wordpiece_merges",  # iterative argmax-by-score loop (non-SQL) — exact
                             # parity vs the rescan twin in test_wordpiece;
                             # round-0 scores oracle-checked via wordpiece_pair_scores
        "pack_nosplit",      # greedy close-on-overflow recurrence (non-associative,
                             # non-SQL) — pure-Python twin parity in test_pack_nosplit
        "conversation_curation_e2e",  # LSH components chain (non-SQL e2e);
                             # stages oracle-checked individually, per-stage
                             # counts pinned in test_conversations
        "sft_token_masks",   # trained WordPiece vocab + max-munch offsets
                             # (non-SQL) — masked-surface == rendered
                             # assistant lines char-for-char in
                             # test_wordpiece::test_sft_token_masks; the
                             # span arithmetic is oracle-checked via
                             # chat_turn_spans
        "sft_packed_sequences",  # same trained-vocab tokenization under-
                             # neath; the packing arithmetic IS oracle-
                             # checked (materialize_sequences) and the
                             # mask transport is pytest-pinned
                             # (test_pack_sft_sequences_roundtrip)
    }
    assert missing <= allowed_rows_only
