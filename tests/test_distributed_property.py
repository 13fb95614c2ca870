"""Property-based testing for the round-2 distributed kernels: for random
small frames (heavy ties, null runs, null heads/tails) the range-bucketed
implementations must equal their single-task global-window equivalents.

Bounded example counts — each example is a Spark round-trip; frames are
drawn from small value grids so ties and bucket-boundary collisions are
common (the adversarial cases for the bucket + carry construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

# value grid of 6 → many ties; None rate ~1/3
cell = st.one_of(st.none(), st.integers(0, 5).map(float))
frame = st.lists(cell, min_size=3, max_size=60)

HS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=frame)
@HS
def test_quantile_rank_property(spark, vals):
    from kgfarm_spark.functions.transforms import quantile_rank_transform

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, x double"
    ).repartition(4)
    got = {r["i"]: r["x"] for r in quantile_rank_transform(df, ["x"], n_buckets=3).collect()}
    w = Window.partitionBy().orderBy(F.col("x").asc())
    exp = {
        r["i"]: r["pr"]
        for r in df.select("i", F.percent_rank().over(w).alias("pr")).collect()
    }
    assert got.keys() == exp.keys()
    for i in exp:
        assert abs(got[i] - exp[i]) < 1e-12, (i, vals)


@given(vals=frame)
@HS
def test_unkeyed_fill_and_interpolate_property(spark, vals):
    from kgfarm_spark.functions.cleaning import bfill, ffill, interpolate_linear

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "i long, x double"
    ).repartition(4)

    w_f = Window.partitionBy().orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    w_b = Window.partitionBy().orderBy("i").rowsBetween(0, Window.unboundedFollowing)
    exp_f = {r["i"]: r["e"] for r in df.select("i", F.last("x", ignorenulls=True).over(w_f).alias("e")).collect()}
    exp_b = {r["i"]: r["e"] for r in df.select("i", F.first("x", ignorenulls=True).over(w_b).alias("e")).collect()}
    got_f = {r["i"]: r["x"] for r in ffill(df, ["x"], key=None, order="i").collect()}
    got_b = {r["i"]: r["x"] for r in bfill(df, ["x"], key=None, order="i").collect()}
    assert got_f == exp_f, vals
    assert got_b == exp_b, vals

    exp_i = pd.Series(vals, dtype="float64").interpolate().ffill().bfill().tolist()
    got_i = [
        r["x"] for r in interpolate_linear(df, ["x"], key=None, order="i").orderBy("i").collect()
    ]
    got_arr = np.array([np.nan if v is None else v for v in got_i], dtype=float)
    exp_arr = np.array(exp_i, dtype=float)
    assert np.allclose(got_arr, exp_arr, equal_nan=True), vals


def test_quantile_rank_fit_jobs_independent_of_column_count(spark):
    """VERDICT r02 wrong #4: the quantile-rank FIT must not serialize two
    driver actions per column. The batched fit runs ONE boundaries agg +
    ONE melted count groupBy, so the job count during construction is the
    same for 2 columns as for 4 (AQE inflates absolute counts — compare,
    don't pin)."""
    from kgfarm_spark.functions.transforms import quantile_rank_transform

    rows = [(i, float(i % 17), float(i % 5), float(i % 11), float(i % 3))
            for i in range(500)]
    df = spark.createDataFrame(rows, "i long, a double, b double, c double, d double")
    tracker = spark.sparkContext.statusTracker()

    def fit_jobs(cols):
        group = f"qrank_fit_{len(cols)}"
        spark.sparkContext.setJobGroup(group, "fit")
        try:
            quantile_rank_transform(df, cols, n_buckets=4)  # lazy result: fit only
        finally:
            spark.sparkContext.setJobGroup("", "")
        return len(tracker.getJobIdsForGroup(group))

    j2, j4 = fit_jobs(["a", "b"]), fit_jobs(["a", "b", "c", "d"])
    assert j2 == j4, (j2, j4)

    # and the batched fit is still exact on a multi-column frame
    out = quantile_rank_transform(df, ["a", "b"], n_buckets=4)
    from pyspark.sql import Window

    w_a = Window.partitionBy().orderBy(F.col("a").asc())
    w_b = Window.partitionBy().orderBy(F.col("b").asc())
    exp = df.select(
        "i",
        F.percent_rank().over(w_a).alias("ea"),
        F.percent_rank().over(w_b).alias("eb"),
    )
    merged = {r["i"]: (r["ea"], r["eb"]) for r in exp.collect()}
    for r in out.select("i", "a", "b").collect():
        ea, eb = merged[r["i"]]
        assert abs(r["a"] - ea) < 1e-12 and abs(r["b"] - eb) < 1e-12
