"""quality_model: exact parity of the distributed full-batch GD fit and
scoring against a pure-numpy twin, plus the Pareto acceptance rule."""

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgfarm_spark.operators.quality_model import (
    pareto_select,
    quality_classifier_fit,
    quality_classifier_score,
)

DIM = 32


def _bucket(word: str) -> int:
    return int(hashlib.md5(word.encode()).hexdigest()[:8], 16) % DIM


def _twin(rows, iters, lr):
    """Pure-numpy full-batch GD twin over (id, y, text) rows."""
    feats, ys, ids = [], [], []
    for i, y, txt in rows:
        words = [w for w in (txt or "").split() if w]
        if not words:
            continue
        x = np.zeros(DIM)
        for w in words:
            x[_bucket(w)] += 1.0
        feats.append(x / len(words))
        ys.append(y)
        ids.append(i)
    X, Y = np.array(feats), np.array(ys, dtype=float)
    w, b = np.zeros(DIM), 0.0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
        r = p - Y
        w -= lr * (X.T @ r) / len(Y)
        b -= lr * r.mean()
    return w, b, ids, X


CORPUS = [
    (0, 1, "good prose with varied words and structure here"),
    (1, 1, "another well formed document about ideas and form"),
    (2, 0, "spam spam spam spam buy buy buy"),
    (3, 0, "xx yy xx yy xx yy zz"),
    (4, 1, "clear exposition of a concept in plain words"),
    (5, 0, "aaa bbb aaa bbb aaa"),
    (6, 0, ""),          # token-less: excluded from fit, scores sigmoid(bias)
    (7, 1, None),        # NULL text: same
    (8, 0, "mixed words spam buy prose here"),
]


def test_fit_matches_numpy_twin(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, y int, text string")
    model = quality_classifier_fit(
        df, F.col("y") == 1, dim=DIM, iters=5, lr=2.0
    )
    w_twin, b_twin, _, _ = _twin(CORPUS, iters=5, lr=2.0)
    w_got = np.zeros(DIM)
    for b, v in model["weights"].items():
        w_got[b] = v
    assert np.allclose(w_got, w_twin, atol=1e-12)
    assert abs(model["bias"] - b_twin) < 1e-12


def test_score_matches_numpy_twin_and_empty_docs(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, y int, text string")
    model = quality_classifier_fit(df, F.col("y") == 1, dim=DIM, iters=5, lr=2.0)
    got = {
        r["doc_id"]: r["quality_score"]
        for r in quality_classifier_score(df, model).collect()
    }
    w, b, ids, X = _twin(CORPUS, iters=5, lr=2.0)
    expected = dict(zip(ids, np.round(1.0 / (1.0 + np.exp(-(X @ w + b))), 6)))
    for i in ids:
        assert got[i] == pytest.approx(expected[i], abs=1e-9)
    # token-less docs score sigmoid(bias)
    empty = round(1.0 / (1.0 + math.exp(-b)), 6)
    assert got[6] == pytest.approx(empty, abs=1e-9)
    assert got[7] == pytest.approx(empty, abs=1e-9)
    # the fit separates: quality docs outscore junk
    assert min(got[0], got[1], got[4]) > max(got[2], got[3], got[5])


def test_fit_partition_invariant(spark):
    df = spark.createDataFrame(CORPUS, "doc_id long, y int, text string")
    m1 = quality_classifier_fit(df.repartition(1), F.col("y") == 1, dim=DIM, iters=3)
    m8 = quality_classifier_fit(df.repartition(8), F.col("y") == 1, dim=DIM, iters=3)
    assert m1["bias"] == pytest.approx(m8["bias"], abs=1e-12)
    for b in set(m1["weights"]) | set(m8["weights"]):
        assert m1["weights"].get(b, 0.0) == pytest.approx(
            m8["weights"].get(b, 0.0), abs=1e-12
        )


def test_pareto_select_rule(spark):
    scored = spark.createDataFrame(
        [(i, 1.0 if i < 10 else 0.0) for i in range(200)],
        "doc_id long, quality_score double",
    )
    kept = pareto_select(scored, alpha=9.0).collect()
    ids = {r["doc_id"] for r in kept}
    # score 1.0 always passes (pareto_key > 0 always)
    assert set(range(10)) <= ids
    # score 0.0 passes only on the rare pareto tail (key > 1)
    zero_kept = [i for i in ids if i >= 10]
    assert len(zero_kept) < 50
    # the rule is the documented inequality, reproducible
    for r in kept:
        assert r["pareto_key"] > 1.0 - r["quality_score"]


def test_validation(spark):
    df = spark.createDataFrame([(1, 1, "a b")], "doc_id long, y int, text string")
    with pytest.raises(ValueError, match="iters"):
        quality_classifier_fit(df, F.col("y") == 1, iters=0)
    with pytest.raises(ValueError, match="dim"):
        quality_classifier_fit(df, F.col("y") == 1, dim=0)
    with pytest.raises(ValueError, match="alpha"):
        pareto_select(df.withColumn("quality_score", F.lit(0.5)), alpha=0)
    empty = spark.createDataFrame([(1, 1, "")], "doc_id long, y int, text string")
    with pytest.raises(ValueError, match="no documents"):
        quality_classifier_fit(empty, F.col("y") == 1)
