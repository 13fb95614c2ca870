"""Model-training tail of the automated pipeline — the reference's
``train_model`` / ``evaluate_model`` stages
(operations/pipeline_generator.py:152-191) completing §3.3 parity.

The reference fits driver-side sklearn models (RandomForest /
GradientBoosting / GaussianNB) on the pandas frame and reports an
f1 score. That shape collapses at 10^12-turn scale — the prepared
train frame never fits on one machine — so here the stage is
``pyspark.ml``: the estimator is distributed (each L-BFGS / normal-
equation iteration is a treeAggregate over the executors), the fitted
model is a small driver object broadcast back for scoring, and the
metric evaluation is one distributed aggregate over the test frame.
Model choice follows the reference's task switch: classification →
LogisticRegression (the reference raises for anything else,
pipeline_generator.py:176-178; regression handled here with
LinearRegression on the exact normal-equations solver for bit-stable
coefficients).

Determinism: the split is already hash-deterministic upstream
(pipeline.run_auto_pipeline), the label indexing is alphabetical (not
frequency order, which ties arbitrarily), LinearRegression uses
solver='normal' (closed form), and LogisticRegression's objective
aggregation is a fixed-depth treeAggregate — metrics reproduce to
float tolerance across runs (test_golden_e2e pins them with allclose).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUM_TYPES = {"int", "bigint", "double", "float", "smallint", "tinyint"}

_CLS_TASKS = ("binary", "multiclass")


def _feature_cols(df: DataFrame, target: str, exclude: list[str] | None) -> list[str]:
    skip = {target, *(exclude or [])}
    return [c for c, t in df.dtypes if t in _NUM_TYPES and c not in skip]


def train_model(
    train: DataFrame,
    target: str,
    task: str,
    feature_cols: list[str] | None = None,
    exclude: list[str] | None = None,
    seed: int = 0,
    max_iter: int = 25,
    reg_param: float = 0.01,
):
    """Fit the task-appropriate ``pyspark.ml`` estimator on the prepared
    train frame. Returns (fitted PipelineModel, info dict).

    classification (binary/multiclass) → LogisticRegression;
    regression → LinearRegression(solver='normal', exact closed form).
    The label column for classification is alphabetically indexed so the
    class ↔ index mapping never depends on class frequencies (which can
    tie and break determinism across partitionings). Rows with a null in
    any feature are dropped by the assembler (handleInvalid='skip') —
    the upstream clean stage fills nulls, so this only guards frames fed
    in without it."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StringIndexer, VectorAssembler
    from pyspark.ml.regression import LinearRegression

    feats = feature_cols or _feature_cols(train, target, exclude)
    if not feats:
        raise ValueError("train_model: no numeric feature columns to fit on")

    # an entirely-null feature (e.g. an enrich column whose as-of window
    # never matched) would make handleInvalid='skip' drop EVERY row and
    # the fit die with an opaque "Nothing has been added to this
    # summarizer" — detect and drop such columns in one aggregate
    nn = train.select(
        *[F.count(F.col(c)).alias(c) for c in feats]
    ).first()
    dead = [c for c in feats if nn[c] == 0]
    feats = [c for c in feats if nn[c] > 0]
    if not feats:
        raise ValueError(
            f"train_model: every candidate feature column is entirely null "
            f"on the train split ({dead}) — nothing to fit on"
        )

    assembler = VectorAssembler(
        inputCols=feats, outputCol="__features", handleInvalid="skip"
    )
    if task in _CLS_TASKS:
        indexer = StringIndexer(
            inputCol=target, outputCol="__label", stringOrderType="alphabetAsc",
            handleInvalid="error",
        )
        est = LogisticRegression(
            featuresCol="__features", labelCol="__label",
            maxIter=max_iter, regParam=reg_param, standardization=True,
        )
        stages = [indexer, assembler, est]
        algo = "logistic_regression"
    elif task == "regression":
        est = LinearRegression(
            featuresCol="__features", labelCol=target,
            regParam=reg_param, solver="normal",
        )
        stages = [assembler, est]
        algo = "linear_regression"
    else:
        raise ValueError(f"train_model: unsupported task {task!r}")

    model = Pipeline(stages=stages).fit(train)
    info = {
        "algorithm": algo,
        "task": task,
        "features": list(feats),
        "n_features": len(feats),
        "dropped_all_null": dead,
        "max_iter": max_iter,
        "reg_param": reg_param,
        "seed": seed,
    }
    return model, info


def evaluate_model(model, test: DataFrame, target: str, task: str) -> dict:
    """Score the held-out frame and compute the task metrics as ONE
    distributed evaluation each (no driver-side collect of predictions):
    classification → f1 (the reference's reported metric,
    pipeline_generator.py:185-186) + accuracy; regression → rmse + r2."""
    from pyspark.ml.evaluation import (
        MulticlassClassificationEvaluator,
        RegressionEvaluator,
    )

    pred = model.transform(test)
    if task in _CLS_TASKS:
        pred = pred.select("__label", "prediction").localCheckpoint(eager=False)
        out = {}
        for m in ("f1", "accuracy"):
            ev = MulticlassClassificationEvaluator(
                labelCol="__label", predictionCol="prediction", metricName=m
            )
            out[m] = round(ev.evaluate(pred), 6)
        return out
    pred = pred.select(target, "prediction").localCheckpoint(eager=False)
    out = {}
    for m in ("rmse", "r2"):
        ev = RegressionEvaluator(
            labelCol=target, predictionCol="prediction", metricName=m
        )
        out[m] = round(ev.evaluate(pred), 6)
    return out
