"""M12 at reference fidelity: a TRAINED PK-FK classifier head.

The reference trains RF/SVM classifiers on hand-labeled groundtruth CSVs
(kg_augmentor/pkfk_classification/primary_key_foreign_key_classifier.py:39-69)
and gates join discovery on the model, not on a bare containment
threshold — because containment alone is fooled by dense integer key
ranges (e.g. TPC-H ``l_linenumber`` ⊆ ``s_suppkey`` has containment 1.0
but is not a foreign key). This module reproduces that lifecycle with
public knowledge only:

- groundtruth = the TPC-H specification's foreign-key relationships
  (public; TPC benchmark docs), over the repo's own synthetic testdata;
- features   = the 6 per-pair features of ``pkfk_features`` (uniqueness
  both sides, containment, cardinality ratio, range containment,
  name-suffix flag) plus an engineered ``coverage`` feature (fraction of
  the PK side matched), built DISTRIBUTED: profile stats are
  metadata-scale, containment comes from the shared melted
  inclusion-dependency pass (profiling.containment_frame) — job count
  scales with tables, not pairs;
- model      = binary logistic regression (numpy full-batch GD, seeded,
  standardized features), trained offline by ``tools/train_pkfk.py``
  and frozen to ``pkfk_weights.json``;
- scoring    = a pure Spark column EXPRESSION (sigmoid of the frozen
  affine form) — classifying a million candidate pairs costs zero
  Python in the row path.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgfarm_spark.functions.profiling import (
    PKFK_NAME_SUFFIX_RE,
    _ref_type,
    candidate_pairs,
    containment_frame,
    detect_entities,
    profile_table,
    range_contained_flag,
)

#: TPC-H foreign-key relationships (public spec) restricted to the repo's
#: testdata tables — (pk_table, pk_col, fk_table, fk_col).
TPCH_FK_GROUNDTRUTH: list[tuple[str, str, str, str]] = [
    ("region", "r_regionkey", "nation", "n_regionkey"),
    ("nation", "n_nationkey", "customer", "c_nationkey"),
    ("nation", "n_nationkey", "supplier", "s_nationkey"),
    ("customer", "c_custkey", "orders", "o_custkey"),
    ("orders", "o_orderkey", "lineitem", "l_orderkey"),
    ("part", "p_partkey", "lineitem", "l_partkey"),
    ("supplier", "s_suppkey", "lineitem", "l_suppkey"),
]

FEATURES = [
    "fk_uniqueness",
    "pk_uniqueness",
    "containment",
    "cardinality_ratio",
    "range_contained",
    "name_suffix_flag",
    # engineered (model-only, beyond pkfk_features): fraction of the PK
    # side matched = containment x cardinality_ratio. True FKs cover most
    # of their PK; dense-integer-range traps (l_linenumber within
    # s_suppkey) cover almost none - linearly inseparable without it.
    "coverage",
]

_WEIGHTS_FILE = os.path.join(os.path.dirname(__file__), "pkfk_weights.json")
_WEIGHTS_CACHE: dict | None = None


def pkfk_candidate_features(
    spark,
    tables: dict[str, DataFrame],
    uniqueness_threshold: float = 0.95,
    exact: bool = True,
) -> DataFrame:
    """Per-candidate-pair feature frame, fully distributed. One profile
    pass per table (metadata-scale collect; ``exact=False`` switches to
    one-pass HLL distinct counts for the 100 TB mode — pair with a lower
    uniqueness_threshold), one melted containment pass for ALL pairs; the
    per-pair scalar features are derived from profile stats driver-side
    (pairs are metadata) and the result stays a DataFrame."""
    import re

    profs = {n: profile_table(df, n, exact=exact) for n, df in tables.items()}
    stats: dict[tuple[str, str], dict] = {}
    for n, p in profs.items():
        for r in p.collect():
            stats[(n, r["column_name"])] = {
                "total": r["total_count"],
                "distinct": r["distinct_count"],
                "missing": r["missing_count"],
                "min": r["min_value"],
                "max": r["max_value"],
            }
    ents = {
        n: {r["column_name"] for r in detect_entities(p, uniqueness_threshold).collect()}
        for n, p in profs.items()
    }
    types = {
        n: {f.name: _ref_type(f.dataType) for f in df.schema.fields}
        for n, df in tables.items()
    }
    pairs = candidate_pairs(tables, ents, types)
    schema = (
        "pk_table string, pk_col string, fk_table string, fk_col string, "
        "fk_uniqueness double, pk_uniqueness double, cardinality_ratio double, "
        "range_contained int, name_suffix_flag int"
    )
    if not pairs:
        return spark.createDataFrame([], schema + ", containment double")

    def _f(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return None

    rows = []
    for pk_t, pk_c, fk_t, fk_c in pairs:
        fk, pk = stats[(fk_t, fk_c)], stats[(pk_t, pk_c)]
        fk_n = fk["total"] - fk["missing"]
        pk_n = pk["total"] - pk["missing"]
        fk_mn, fk_mx = _f(fk["min"]), _f(fk["max"])
        pk_mn, pk_mx = _f(pk["min"]), _f(pk["max"])
        range_contained = range_contained_flag(pk_mn, pk_mx, fk_mn, fk_mx)
        rows.append(
            (
                pk_t, pk_c, fk_t, fk_c,
                fk["distinct"] / fk_n if fk_n else 0.0,
                pk["distinct"] / pk_n if pk_n else 0.0,
                (fk["distinct"] / pk["distinct"]) if pk["distinct"] else 0.0,
                range_contained,
                1 if PKFK_NAME_SUFFIX_RE.search(fk_c) else 0,
            )
        )
    pair_df = spark.createDataFrame(rows, schema)
    cont = containment_frame(spark, tables, pairs, types)
    keys = ["pk_table", "pk_col", "fk_table", "fk_col"]
    out = pair_df.join(F.broadcast(cont), keys, "left").fillna(
        0.0, subset=["containment"]
    )
    return out.withColumn(
        "coverage", F.col("containment") * F.col("cardinality_ratio")
    )


# ---------------------------------------------------------------------------
# Training (offline; tools/train_pkfk.py) + frozen-weight scoring
# ---------------------------------------------------------------------------


def train_pkfk_logreg(X, y, lr: float = 0.5, iters: int = 5000, l2: float = 1e-3):
    """Deterministic binary logistic regression on standardized features
    with BALANCED class weights (true FKs are a handful among hundreds of
    candidate pairs — unweighted GD collapses to the majority class, the
    same reason the reference balances its groundtruth CSVs).
    Returns (w, b, mu, sd, train_accuracy)."""
    import numpy as np

    X = np.asarray(X, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    mu = X.mean(axis=0)
    sd = X.std(axis=0) + 1e-9
    Xs = (X - mu) / sd
    w = np.zeros(X.shape[1])
    b = 0.0
    n = len(y)
    n_pos = max(y.sum(), 1.0)
    n_neg = max(n - y.sum(), 1.0)
    # sklearn class_weight='balanced': n / (2 * class count)
    sw = np.where(y > 0.5, n / (2.0 * n_pos), n / (2.0 * n_neg))
    sw_sum = sw.sum()
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xs @ w + b)))
        g = ((p - y) * sw) / sw_sum
        w -= lr * (Xs.T @ g + l2 * w)
        b -= lr * g.sum()
    acc = float(((Xs @ w + b > 0) == (y > 0.5)).mean())
    return w, b, mu, sd, acc


def load_pkfk_weights() -> dict:
    global _WEIGHTS_CACHE
    if _WEIGHTS_CACHE is None:
        if not os.path.exists(_WEIGHTS_FILE):
            raise FileNotFoundError(
                f"{_WEIGHTS_FILE} missing — run `python tools/train_pkfk.py`"
            )
        with open(_WEIGHTS_FILE) as f:
            _WEIGHTS_CACHE = json.load(f)
    return _WEIGHTS_CACHE


def pkfk_score_column(weights: dict | None = None):
    """P(is foreign key) as a pure Spark column expression over the
    FEATURES columns: sigmoid(w · (x-mu)/sd + b). Whole-stage codegen,
    no UDF."""
    w = weights or load_pkfk_weights()
    z = F.lit(float(w["b"]))
    for name, wi, mi, si in zip(FEATURES, w["w"], w["mu"], w["sd"]):
        z = z + F.lit(float(wi)) * ((F.col(name) - F.lit(float(mi))) / F.lit(float(si)))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def classify_pkfk(features: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Add pkfk_prob + is_pkfk to a pkfk_candidate_features frame using
    the frozen trained head — the reference's classifier gate
    (primary_key_foreign_key_classifier.py) as a column expression."""
    return features.withColumn("pkfk_prob", pkfk_score_column()).withColumn(
        "is_pkfk", (F.col("pkfk_prob") >= threshold).cast("int")
    )


def discover_joins_classified(
    spark, tables: dict[str, DataFrame], threshold: float = 0.5
) -> DataFrame:
    """Join discovery gated on the TRAINED classifier instead of a bare
    containment threshold (reference lifecycle: features → model →
    predicted relations)."""
    feats = pkfk_candidate_features(spark, tables)
    return (
        classify_pkfk(feats, threshold)
        .filter(F.col("is_pkfk") == 1)
        .select(
            "pk_table", "pk_col", "fk_table", "fk_col",
            F.round("pkfk_prob", 6).alias("pkfk_prob"),
            F.round("containment", 6).alias("containment"),
        )
        .orderBy(F.col("pkfk_prob").desc(), "pk_table", "pk_col", "fk_table", "fk_col")
    )
