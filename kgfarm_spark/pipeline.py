"""End-to-end feature-engineering pipeline — the reference's flagship
``engineer_features(train, test, target)`` lifecycle (§3.1 of SURVEY.md;
interface/apis.py:238-424) re-expressed lazily over Spark DataFrames.

Stage order (reference order, apis.py:241-419):
  1. task typing from target cardinality (apis.py:118-126)
  2. dtype split (apis.py:128-137)
  3. importance pruning — ANOVA-F (classification) / correlation-with-
     target (regression) scores, keep-all fallback when < 10% survive
     (apis.py:244-279)
  4. correlation pruning — drop the lower-importance member of each pair
     with |corr| > 0.90 (apis.py:281-304)
  5. transforms — categorical → scaling → unary, all FIT ON TRAIN ONLY
     (fixing the reference's fit-on-test OHE quirk, apis.py:333-345;
     north_rule demands zero leakage)

Returns lazy (train, test) DataFrames — nothing materializes until the
caller acts. Every fitted statistic is a driver-side scalar broadcast
into column expressions, so the transform stage adds NO shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgfarm_spark.functions.profiling import task_type
from kgfarm_spark.functions.selection import (
    anova_f_scores,
    pearson_corr_matrix,
    prune_correlated,
)
from kgfarm_spark.functions.transforms import (
    apply_ordinal_encoder,
    apply_standard_scaler,
    fit_ordinal_encoder,
    fit_standard_scaler,
    log_transform,
    one_hot_encode,
)

_NUM_TYPES = {"int", "bigint", "double", "float", "smallint", "tinyint"}
_OHE_MAX_DISTINCT = 5  # operations/api.py:296-305 cardinality guard


def engineer_features(
    train: DataFrame,
    test: DataFrame,
    target: str,
    corr_threshold: float = 0.90,
    importance_keep_frac: float = 0.10,
    unary_log_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame, dict]:
    """Returns (train, test, report). ``report`` records every decision
    (task, kept/dropped features, fitted transforms) — the engine's
    stand-in for the reference's generated notebook (S8 lineage artifact)."""
    numeric = [c for c, t in train.dtypes if t in _NUM_TYPES and c != target]
    categorical = [c for c, t in train.dtypes if t == "string" and c != target]

    task = task_type(train, target)

    # --- importance (classification: ANOVA F; regression: |corr|) -------
    if numeric:
        if task in ("binary", "multiclass"):
            scores = anova_f_scores(train, numeric, target)
        else:
            corr_t = pearson_corr_matrix(train, numeric + [target])
            scores = {
                c: abs(corr_t.get((c, target), corr_t.get((target, c), 0.0)))
                for c in numeric
            }
        median_score = sorted(scores.values())[len(scores) // 2]
        kept = [c for c in numeric if scores[c] >= median_score * 0.01]
        # keep-all fallback (apis.py:266-279): if < 10% survive, keep all
        if len(kept) < max(1, int(importance_keep_frac * len(numeric))):
            kept = list(numeric)
    else:
        scores, kept = {}, []

    # --- correlation pruning (apis.py:281-304) ---------------------------
    if len(kept) > 1:
        corr = pearson_corr_matrix(train, kept)
        kept = prune_correlated({c: scores[c] for c in kept}, corr, corr_threshold)

    dropped = [c for c in numeric if c not in kept]
    train = train.drop(*dropped)
    test = test.drop(*dropped)

    # --- transforms: categorical → scaling → unary (inference.py:218-221)
    fitted: dict = {}
    low_card, high_card = [], []
    for c in categorical:
        d = train.agg(F.count_distinct(F.col(c)).alias("d")).first()["d"]
        (low_card if d <= _OHE_MAX_DISTINCT else high_card).append(c)

    if low_card:
        train, cats = one_hot_encode(train, low_card, _OHE_MAX_DISTINCT)
        test, _ = one_hot_encode(test, low_card, _OHE_MAX_DISTINCT, categories=cats)
        fitted["one_hot"] = {c: list(v) for c, v in cats.items()}
    if high_card:
        enc = fit_ordinal_encoder(train, high_card)
        train = apply_ordinal_encoder(train, enc)
        test = apply_ordinal_encoder(test, enc)
        fitted["ordinal"] = {c: len(m) for c, m in enc.items()}

    if kept:
        params = fit_standard_scaler(train, kept)
        train = apply_standard_scaler(train, params)
        test = apply_standard_scaler(test, params)
        fitted["standard_scaler"] = params

    for c in unary_log_cols or []:
        if c in train.columns:
            train = log_transform(train, [c])
            test = log_transform(test, [c])
            fitted.setdefault("log", []).append(c)

    report = {
        "task": task,
        "importance_scores": {c: float(s) for c, s in scores.items()},
        "kept_numeric": kept,
        "dropped_numeric": dropped,
        "fitted": {k: sorted(v) if isinstance(v, list) else sorted(v.keys()) for k, v in fitted.items()},
    }
    return train, test, report
