"""End-to-end feature-engineering pipeline — the reference's flagship
``engineer_features(train, test, target)`` lifecycle (§3.1 of SURVEY.md;
interface/apis.py:238-424) re-expressed lazily over Spark DataFrames,
with the reference's exact thresholds, caps, and fallbacks.

Stage order (reference order, apis.py:241-419):
  1. task typing from target cardinality (apis.py:118-126)
  2. dtype split (apis.py:128-137)
  3. importance pruning (apis.py:244-279): mutual information
     (classification; binned estimator — the documented scale path for
     sklearn's kNN-based mutual_info_classif) or f_regression
     (regression — EXACT, derived from Pearson r), keep score > θ1
     (default 0.00; regression uses θ1+5, apis.py:255-256), sorted desc;
     size caps: top-20 when (≥5 MB and ≥100 numeric features) or ≥20 MB
     (apis.py:266-267); keep-all fallback when < 10% survive or ≤ 1
     (apis.py:268-269)
  4. correlation pruning (apis.py:281-304): drop the lower-importance
     member of each pair with corr > θ2 (default 0.90); keep-all fallback
     when < 10% survive or ≤ 1 (apis.py:299-302)
  5. transforms — categorical → scaling → unary order
     (inference.py:218-221), all FIT ON TRAIN ONLY (fixing the
     reference's fit-on-test OHE quirk, apis.py:333-345; north_rule
     demands zero leakage)

Returns lazy (train, test) DataFrames — nothing materializes until the
caller acts. Every fitted statistic is a driver-side scalar broadcast
into column expressions, so the transform stage adds NO shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgfarm_spark.functions.profiling import task_type
from kgfarm_spark.functions.selection import (
    f_regression_scores,
    mutual_information_binned,
    pearson_corr_matrix,
    prune_correlated,
)
from kgfarm_spark.functions.transforms import (
    ORDINAL_COLLECT_MAX,
    apply_ordinal_encoder,
    apply_standard_scaler,
    fit_ordinal_encoder,
    fit_standard_scaler,
    log_transform,
    one_hot_encode,
)

_NUM_TYPES = {"int", "bigint", "double", "float", "smallint", "tinyint"}
_OHE_MAX_DISTINCT = 5  # operations/api.py:296-305 cardinality guard


def _estimated_size_mb(df: DataFrame) -> float:
    """Catalyst's size estimate for the plan — the Spark analog of the
    reference's ``memory_usage(deep=True)`` gate (apis.py:240)."""
    try:
        return float(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().toString()
        ) / (1024 * 1024)
    except Exception:
        return 0.0


def engineer_features(
    train: DataFrame,
    test: DataFrame,
    target: str,
    information_gain_thresh: float = 0.00,
    correlation_thresh: float = 0.90,
    unary_log_cols: list[str] | None = None,
    exclude: list[str] | None = None,
) -> tuple[DataFrame, DataFrame, dict]:
    """Returns (train, test, report). ``report`` records every decision
    (task, kept/dropped features, fitted transforms) — the engine's
    stand-in for the reference's generated notebook (S8 lineage artifact).

    ``exclude``: identifier columns (entity keys, probe ids) carried
    through untouched — never scored, encoded, or scaled. An id column is
    not a feature, and ordinal-encoding a high-cardinality key is a
    distributed sort + join spent on noise (first measured on the 48M
    e2e bench, where encoding conv_id/probe_id dominated the chain)."""
    skip = {target, *(exclude or [])}
    numeric = [c for c, t in train.dtypes if t in _NUM_TYPES and c not in skip]
    categorical = [c for c, t in train.dtypes if t == "string" and c not in skip]

    task = task_type(train, target)
    df_size = _estimated_size_mb(train)

    # --- 3. importance pruning (apis.py:244-279) -------------------------
    theta1 = information_gain_thresh
    if numeric:
        if task in ("binary", "multiclass"):
            scores = mutual_information_binned(train, numeric, target)
        else:
            scores = f_regression_scores(train, numeric, target)
            theta1 = theta1 + 5  # apis.py:255-256
        pruning_info = dict(
            sorted(
                ((c, s) for c, s in scores.items() if s > theta1),
                key=lambda kv: kv[1],
                reverse=True,
            )
        )
        if (df_size >= 5 and len(numeric) >= 100) or df_size >= 20:
            kept = list(pruning_info)[:20]  # apis.py:266-267
        elif len(pruning_info) < int(0.1 * len(numeric)) or len(pruning_info) <= 1:
            kept = list(numeric)  # keep-all fallback, apis.py:268-269
        else:
            kept = list(pruning_info)
    else:
        scores, pruning_info, kept = {}, {}, []

    # --- 4. correlation pruning (apis.py:281-304) -------------------------
    if len(kept) > 1:
        corr = pearson_corr_matrix(train, kept)
        survivors = prune_correlated(
            {c: scores.get(c, 0.0) for c in kept}, corr, correlation_thresh
        )
        if len(survivors) < int(0.1 * len(kept)) or len(survivors) <= 1:
            kept = list(numeric)  # keep-all fallback, apis.py:299-302
        else:
            kept = survivors

    dropped = [c for c in numeric if c not in kept]
    train = train.drop(*dropped)
    test = test.drop(*dropped)

    # --- 5. transforms: categorical → scaling → unary (inference.py:218-221)
    fitted: dict = {}
    low_card, high_card = [], []
    if categorical:
        # ONE cardinality probe for every categorical column (was one
        # Spark job per column — guide §1.2: don't pay a scheduling
        # round per scalar you could batch)
        row = train.agg(
            *[F.count_distinct(F.col(c)).alias(c) for c in categorical]
        ).first()
        for c in categorical:
            (low_card if row[c] <= _OHE_MAX_DISTINCT else high_card).append(c)

    if low_card:
        train, cats = one_hot_encode(train, low_card, _OHE_MAX_DISTINCT)
        test, _ = one_hot_encode(test, low_card, _OHE_MAX_DISTINCT, categories=cats)
        fitted["one_hot"] = {c: list(v) for c, v in cats.items()}
    if high_card:
        enc = fit_ordinal_encoder(train, high_card)
        train = apply_ordinal_encoder(train, enc)
        test = apply_ordinal_encoder(test, enc)
        # a >1000-distinct column's mapping is a DISTRIBUTED (value, code)
        # frame — never len()-able on the driver by design; record the
        # threshold instead of forcing a count job into the fit path
        fitted["ordinal"] = {
            c: (len(m) if isinstance(m, dict) else f">{ORDINAL_COLLECT_MAX} (distributed)")
            for c, m in enc.items()
        }

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
        "df_size_mb": round(df_size, 3),
        "importance_scores": {c: float(s) for c, s in scores.items()},
        "kept_numeric": kept,
        "dropped_numeric": dropped,
        "fitted": {k: sorted(v) if isinstance(v, list) else sorted(v.keys()) for k, v in fitted.items()},
    }
    return train, test, report


def run_auto_pipeline(
    entity_df: DataFrame,
    feature_view: DataFrame,
    target: str,
    on: str,
    entity_ts: str,
    view_ts: str,
    freshness_days: int = 10,
    split_mod: int = 5,
    split_key: str | None = None,
    manifest_path: str | None = None,
    id_cols: list[str] | None = None,
    fit_model: bool = False,
    model_seed: int = 0,
) -> tuple[DataFrame, DataFrame, dict]:
    """The reference's full-automation path (§3.3,
    operations/pipeline_generator.py:208-221: identify → enrich → clean →
    transform → select → split → train → evaluate) as one lazy chain,
    emitting a lineage manifest (stage name, params, output rows) instead
    of a generated notebook (S8). The split is deterministic (hash of
    ``split_key``), not randomSplit — resumable and partition-invariant.

    ``fit_model=True`` appends the reference's ``train_model`` /
    ``evaluate_model`` stages (pipeline_generator.py:152-191) as
    distributed ``pyspark.ml`` fits picked by task type (ml.py) — the
    held-out metrics land in the manifest under the ``evaluate_model``
    stage, the engine's analog of the reference's f1 printout + model
    pickle."""
    import json
    import time

    from kgfarm_spark.functions.cleaning import fill_nulls, normalize_null_tokens
    from kgfarm_spark.operators.asof import asof_join

    stages: list[dict] = []

    def record(name: str, df: DataFrame, **params):
        # per-stage metrics (north_rule): rows + wall seconds to
        # materialize this stage's frame (cumulative plan cost — each
        # stage's count re-executes its lazy prefix)
        t0 = time.monotonic()
        rows = df.count()
        stages.append(
            {"stage": name, "rows": rows, "sec": round(time.monotonic() - t0, 3), **params}
        )
        return df

    # 1. enrich: point-in-time latest within the freshness window
    enriched = asof_join(
        entity_df, feature_view, on=on, left_ts=entity_ts, right_ts=view_ts,
        tolerance=f"{freshness_days} DAYS", direction="backward", mode="latest",
    )
    # materialize the enriched frame ONCE (optimization guide §5:
    # caching pays when a frame is reused and recomputation is
    # expensive): everything downstream — the clean-stage mean/mode
    # fits, both split filters, every feature-selection and transform
    # fit, the per-stage row counts, and the caller's final action —
    # re-executed this as-of join's full lazy prefix, ~12 times per
    # pipeline run. One localCheckpoint truncates the plan; all fit
    # passes now scan the materialized rows. Per-call only — a new
    # pipeline run recomputes from its inputs. eager=False: the
    # stage-count action right below materializes it inside its own job
    # (no separate synchronous checkpoint job).
    enriched = enriched.localCheckpoint(eager=False)
    enriched = record("enrich", enriched, freshness_days=freshness_days, on=on)

    # 2. clean: null-token normalization + mean/mode fill
    cleaned = fill_nulls(normalize_null_tokens(enriched))
    cleaned = record("clean", cleaned, strategy="normalize+fill_mean_mode")

    # 3. deterministic split (hash of the split key)
    key = split_key or on
    train = cleaned.filter(F.abs(F.xxhash64(F.col(key))) % split_mod != 0)
    test = cleaned.filter(F.abs(F.xxhash64(F.col(key))) % split_mod == 0)
    record("split_train", train, split_mod=split_mod, split_key=key)
    record("split_test", test)

    # 4. select + transform (fit on train only). The entity/join key,
    # split key, and any declared id columns are identifiers, not
    # features — they ride through for lineage/join-back but are never
    # scored or encoded.
    drop_ts = [c for c in ("matched_ts", entity_ts) if c in train.columns]
    ids = [c for c in {on, key, *(id_cols or [])} if c in train.columns]
    tr, te, report = engineer_features(
        train.drop(*drop_ts), test.drop(*drop_ts), target, exclude=ids
    )
    record("engineer_features", tr, **{k: report[k] for k in ("task", "kept_numeric", "dropped_numeric")})

    if fit_model:
        from kgfarm_spark.ml import evaluate_model, train_model

        t0 = time.monotonic()
        model, minfo = train_model(
            tr, target, task=report["task"], exclude=ids, seed=model_seed
        )
        stages.append(
            {"stage": "train_model", "sec": round(time.monotonic() - t0, 3), **minfo}
        )
        t0 = time.monotonic()
        metrics = evaluate_model(model, te, target, report["task"])
        stages.append(
            {
                "stage": "evaluate_model",
                "sec": round(time.monotonic() - t0, 3),
                "metrics": metrics,
            }
        )
        report["model"] = {**minfo, "metrics": metrics}

    manifest = {"stages": stages, "report": report}
    if manifest_path:
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
    return tr, te, manifest
