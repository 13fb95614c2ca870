"""Golden e2e — the engine twin of the reference CI
(tests/test_apis.py: three end-to-end tests on titanic.csv, run by
GitHub Actions). Same fixture shape (FIXTURES.md §4, seeded synthetic),
same assertion shapes:

- cleaning recommendation returns a ranked list of exactly the three
  cleaning ops (reference expects ['Fill','Interpolate','Impute'] from
  its trained model, tests/test_apis.py:16-22 — our deterministic
  stand-in heads assert the rank-shape, not the trained order),
- transformation recommendation returns (transform, features) groups
  (tests/test_apis.py:24-32),
- engineer_features returns train/test with EQUAL column counts
  (tests/test_apis.py:34-44 asserts exactly this).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgfarm_spark.api import FeatureFarm
from kgfarm_spark.functions.cleaning import normalize_null_tokens, null_scan
from kgfarm_spark.functions.embeddings import (
    melt_numeric,
    melt_strings,
    minhash_column_embeddings,
    numeric_column_embeddings,
    string_column_embeddings,
)


@pytest.fixture(scope="module")
def titanic_like(spark):
    """891 rows, seeded — FIXTURES.md §4 schema."""
    import numpy as np

    rng = np.random.default_rng(7)  # reference CI seeds np.random.seed(7)
    n = 891
    sexes = np.where(rng.random(n) < 0.65, "male", "female")
    embarked_pool = np.array(["S", "C", "Q", "?", "na", None], dtype=object)
    embarked = embarked_pool[rng.integers(0, 6, n)]
    age = rng.normal(30, 12, n).round(1)
    age_null = rng.random(n) < 0.2
    fare = np.exp(rng.normal(2.5, 1.0, n)).round(4)  # right-skewed
    cabin_pool = np.array([None, "C85", "E46", "B28"], dtype=object)
    cabin = cabin_pool[
        np.where(rng.random(n) < 0.75, 0, rng.integers(1, 4, n))
    ]
    rows = [
        (
            int(i + 1),
            int(rng.random() < 0.38),
            int(rng.integers(1, 4)),
            f"Passenger, No. {i}",
            str(sexes[i]),
            None if age_null[i] else float(age[i]),
            int(rng.integers(0, 4)),
            int(rng.integers(0, 3)),
            float(fare[i]),
            cabin[i],
            embarked[i],
        )
        for i in range(n)
    ]
    schema = (
        "passenger_id bigint, survived int, pclass int, name string, "
        "sex string, age double, sibsp int, parch int, fare double, "
        "cabin string, embarked string"
    )
    return spark.createDataFrame(rows, schema)


def test_null_normalization_and_scan(spark, titanic_like):
    cleaned = normalize_null_tokens(titanic_like, ["embarked"])
    toks = cleaned.filter(F.col("embarked").isin("?", "na")).count()
    assert toks == 0
    missing = {r["column_name"] for r in null_scan(cleaned).collect()}
    assert {"age", "cabin", "embarked"} <= missing


def test_entity_detection_on_fixture(spark, titanic_like):
    farm = FeatureFarm(spark)
    profiles = farm.profile(titanic_like, "titanic", exact=True)
    ents = farm.detect_entities(profiles)
    rows = {r["column_name"]: r for r in ents.collect()}
    assert "passenger_id" in rows
    assert rows["passenger_id"]["uniqueness"] == 1.0
    assert rows["passenger_id"]["value_type"] == "INT64"


def test_cleaning_recommendation_exact_ranked_list(spark, titanic_like):
    # Reference CI pins an exact ranked list for ITS dataset
    # (tests/test_apis.py:16-24: ['Fill','Interpolate','Impute']). The
    # heads here are trained on the repo's own synthetic corpus
    # (tools/train_heads.py, val_acc frozen in head_weights.json), so this
    # fixture's ranking is pinned exactly: Fill first (iid random
    # missingness — the same first element as the reference CI list) and
    # Interpolate last, correctly, since nothing here is series-like.
    farm = FeatureFarm(spark)
    num_long = melt_numeric(titanic_like, "titanic", ["age", "fare", "sibsp"])
    str_long = melt_strings(titanic_like, "titanic", ["sex", "embarked"])
    ranked = farm.recommend_cleaning_operations(
        numeric_column_embeddings(num_long), string_column_embeddings(str_long)
    )
    assert ranked == ["Fill", "Impute", "Interpolate"]
    assert ranked[-1] == "Interpolate"  # semantic: iid frame, not a series


def test_transformation_recommendation_exact(spark, titanic_like):
    # frozen heads → exact pinned recommendation groups (reference CI
    # spirit: tests/test_apis.py:27-32 pins the transformation list)
    farm = FeatureFarm(spark)
    num_long = melt_numeric(titanic_like, "titanic", ["age", "fare", "sibsp", "parch"])
    recs = farm.recommend_transformations(num_long)
    assert recs.columns == ["recommended_transformation", "features"]
    got = {
        r["recommended_transformation"]: list(r["features"]) for r in recs.collect()
    }
    assert got == {"Log": ["age", "fare"]}  # skewed columns → Log, pinned


def test_categorical_and_outlier_recommendations_exact(spark, titanic_like):
    from kgfarm_spark.functions.embeddings import (
        detect_outliers_flag,
        minhash_column_embeddings,
        recommend_categorical,
    )

    str_long = melt_strings(titanic_like, "titanic", ["sex", "embarked"])
    cat = recommend_categorical(minhash_column_embeddings(str_long))
    got = {r["recommended_transformation"]: list(r["features"]) for r in cat.collect()}
    # 2-3 distinct values per column → OneHot, matching the reference's
    # ≤5-distinct OHE guard the head was trained to reproduce
    assert got == {"OneHotEncoder": ["embarked", "sex"]}

    num_long = melt_numeric(titanic_like, "titanic", ["age", "fare", "sibsp"])
    assert detect_outliers_flag(numeric_column_embeddings(num_long)) is True


def test_engineer_features_column_count_parity(spark, titanic_like):
    # the reference CI's core assertion: train/test column counts equal
    farm = FeatureFarm(spark)
    df = normalize_null_tokens(titanic_like.drop("name", "cabin"), ["embarked"])
    df = farm.clean(df, "Fill")
    train = df.filter(F.col("passenger_id") % 5 != 0)
    test = df.filter(F.col("passenger_id") % 5 == 0)
    tr, te, report = farm.engineer_features(train, test, "survived")
    assert len(tr.columns) == len(te.columns)
    assert sorted(tr.columns) == sorted(te.columns)
    assert report["task"] == "binary"


def test_run_auto_pipeline_e2e(spark, tmp_path):
    """§3.3 full automation: enrich (point-in-time) → clean → split →
    engineer, emitting a lineage manifest with per-stage rows."""
    import json

    from kgfarm_spark.pipeline import run_auto_pipeline
    from kgfarm_spark.sources.transcripts import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice",
        F.col("o_orderdate").alias("event_timestamp"),
    )
    events = load_table(spark, SF_SMOKE, "events").select(
        F.col("user_id").alias("o_custkey"),
        F.col("ts").alias("fv_ts"),
        F.col("value").alias("g_value"),
        "event_type",
    )
    mpath = str(tmp_path / "manifest.json")
    tr, te, manifest = run_auto_pipeline(
        orders, events, target="o_orderstatus", on="o_custkey",
        entity_ts="event_timestamp", view_ts="fv_ts",
        freshness_days=10000, manifest_path=mpath,
    )
    names = [s["stage"] for s in manifest["stages"]]
    assert names == ["enrich", "clean", "split_train", "split_test", "engineer_features"]
    n_train = next(s["rows"] for s in manifest["stages"] if s["stage"] == "split_train")
    n_test = next(s["rows"] for s in manifest["stages"] if s["stage"] == "split_test")
    n_enriched = manifest["stages"][0]["rows"]
    assert n_train + n_test == n_enriched
    assert sorted(tr.columns) == sorted(te.columns)
    with open(mpath) as f:
        assert json.load(f)["report"]["task"] in ("binary", "multiclass")


def test_auto_pipeline_model_eval_pinned_metrics(spark):
    """§3.3 train/evaluate tail (VERDICT r04 #3, reference
    pipeline_generator.py:152-191): the full chain with fit_model=True
    must produce the train_model + evaluate_model manifest stages, and
    the held-out metrics must be DETERMINISTIC — pinned values, measured
    identical to 6 dp at local[4] and local[8] (alphabetical label
    indexing + hash split + fixed-depth objective aggregation)."""
    from kgfarm_spark.entry_queries import QUERIES
    import kgfarm_spark.entry_ml  # noqa: F401 — registers the query
    from tests.conftest import SF_SMOKE

    rows = {
        r["stage"]: r["value"]
        for r in QUERIES["auto_pipeline_model_eval"](spark, SF_SMOKE).collect()
    }
    assert set(rows) == {
        "enrich", "clean", "split_train", "split_test", "engineer_features",
        "train_model", "evaluate_model", "metric:f1", "metric:accuracy",
    }
    assert rows["split_train"] + rows["split_test"] == rows["enrich"]
    # pinned deterministic metrics (sf0.001 fixture; tolerance covers
    # float-sum order drift on other core counts, not semantic change)
    assert rows["metric:f1"] == pytest.approx(0.925751, abs=1e-3)
    assert rows["metric:accuracy"] == pytest.approx(0.903226, abs=1e-3)
    # strictly above chance and below perfect: the fit actually learned
    # the point-in-time signal, and the label is not degenerate
    assert 0.6 < rows["metric:f1"] < 0.99


def test_train_model_regression_and_all_null_guard(spark):
    """train_model picks LinearRegression (exact normal-equations solver)
    for regression tasks, and drops an entirely-null feature column
    instead of letting handleInvalid='skip' silently empty the frame."""
    from kgfarm_spark.ml import evaluate_model, train_model

    df = (
        spark.range(400)
        .withColumn("x1", (F.col("id") % 37).cast("double"))
        .withColumn("x2", (F.col("id") % 11).cast("double"))
        .withColumn("dead", F.lit(None).cast("double"))
        .withColumn("y", F.col("x1") * 2.0 + F.col("x2") * -1.5 + F.lit(3.0))
        .drop("id")
    )
    model, info = train_model(df, "y", task="regression", reg_param=0.0)
    assert info["algorithm"] == "linear_regression"
    assert info["dropped_all_null"] == ["dead"]
    metrics = evaluate_model(model, df, "y", "regression")
    assert metrics["r2"] == pytest.approx(1.0, abs=1e-6)  # exact linear fit
    assert metrics["rmse"] == pytest.approx(0.0, abs=1e-3)

    with pytest.raises(ValueError, match="unsupported task"):
        train_model(df, "y", task="clustering")


def test_engineer_features_distributed_ordinal(spark):
    """A categorical column above ORDINAL_COLLECT_MAX distinct values must
    flow through engineer_features via the DISTRIBUTED (value, code)
    mapping — the 48M e2e bench first hit this path (round 4): the fit
    report tried len() on the mapping DataFrame and crashed."""
    from pyspark.sql import functions as F

    from kgfarm_spark.functions.transforms import ORDINAL_COLLECT_MAX
    from kgfarm_spark.pipeline import engineer_features

    n = ORDINAL_COLLECT_MAX * 2  # train keeps ~80% — still above the cap
    df = (
        spark.range(n)
        .withColumn("hi_card", F.concat(F.lit("v"), F.col("id").cast("string")))
        .withColumn("x", (F.col("id") % 97).cast("double"))
        .withColumn("label", (F.col("id") % 2).cast("int"))
        .drop("id")
    )
    train = df.filter(F.abs(F.xxhash64("hi_card")) % 5 != 0)
    test = df.subtract(train)
    tr, te, report = engineer_features(train, test, target="label")
    assert report["fitted"]["ordinal"] == ["hi_card"]
    # codes are dense 0..k-1 over train's sorted distinct values
    k = train.select("hi_card").distinct().count()
    codes = tr.select("hi_card").filter(F.col("hi_card").isNotNull())
    mx = codes.agg(F.max("hi_card")).first()[0]
    assert mx == k - 1
    assert tr.schema["hi_card"].dataType.simpleString() == "bigint"
