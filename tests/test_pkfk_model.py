"""M12 trained PK-FK classifier: groundtruth recall, trap rejection,
pure-expression scoring (no Python in the scoring path)."""

from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"
TABLES = "region nation customer supplier part orders lineitem".split()


@pytest.fixture(scope="module")
def tpch(spark):
    return {t: spark.read.parquet(f"{SF}/{t}.parquet") for t in TABLES}


def test_classifier_recalls_groundtruth_and_rejects_traps(spark, tpch):
    from kgfarm_spark.functions.pkfk_model import (
        TPCH_FK_GROUNDTRUTH,
        classify_pkfk,
        pkfk_candidate_features,
    )

    feats = pkfk_candidate_features(spark, tpch)
    scored = classify_pkfk(feats).collect()
    key = lambda r: (r["pk_table"], r["pk_col"], r["fk_table"], r["fk_col"])
    predicted = {key(r) for r in scored if r["is_pkfk"] == 1}
    candidates = {key(r) for r in scored}
    gt_in_candidates = set(TPCH_FK_GROUNDTRUTH) & candidates

    # every groundtruth FK among the candidates is recalled
    assert gt_in_candidates, "candidate enumeration lost all groundtruth pairs"
    assert gt_in_candidates <= predicted

    # the dense-integer-range trap: containment 1.0 but NOT a foreign key
    trap = next(
        (r for r in scored
         if key(r) == ("supplier", "s_suppkey", "lineitem", "l_linenumber")),
        None,
    )
    assert trap is not None
    assert trap["containment"] == 1.0   # containment alone is fooled
    assert trap["is_pkfk"] == 0          # the trained head is not

    # precision: few false positives overall
    fp = predicted - set(TPCH_FK_GROUNDTRUTH)
    assert len(fp) <= 6, sorted(fp)


def test_discover_joins_classified_shape(spark, tpch):
    from kgfarm_spark.functions.pkfk_model import (
        TPCH_FK_GROUNDTRUTH,
        discover_joins_classified,
    )

    out = discover_joins_classified(spark, tpch)
    rows = out.collect()
    assert out.columns == [
        "pk_table", "pk_col", "fk_table", "fk_col", "pkfk_prob", "containment"
    ]
    got = {(r["pk_table"], r["pk_col"], r["fk_table"], r["fk_col"]) for r in rows}
    assert ("orders", "o_orderkey", "lineitem", "l_orderkey") in got
    assert ("customer", "c_custkey", "orders", "o_custkey") in got
    assert all(r["pkfk_prob"] >= 0.5 for r in rows)


def test_pkfk_scoring_is_pure_expression(spark, tpch):
    """The frozen head scores via a codegen'd column expression — no
    Python UDF in the plan."""
    from kgfarm_spark.functions.pkfk_model import classify_pkfk, pkfk_candidate_features

    feats = pkfk_candidate_features(spark, {"nation": tpch["nation"], "customer": tpch["customer"], "supplier": tpch["supplier"]})
    plan = classify_pkfk(feats)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_classifier_generalizes_to_sf001_holdout(spark):
    """Natural holdout: the head is trained on sf0.001; at sf0.01 (10x the
    data, different value distributions) it must keep full groundtruth
    recall with few false positives. (The surviving FPs are key-range
    pairs like part.p_partkey <- o_custkey whose profile features are
    genuinely FK-shaped - a known limit of metadata-only features.)"""
    from kgfarm_spark.functions.pkfk_model import (
        TPCH_FK_GROUNDTRUTH,
        classify_pkfk,
        pkfk_candidate_features,
    )

    tables = {
        t: spark.read.parquet(f"/root/testdata/sf0.01/{t}.parquet")
        for t in TABLES
    }
    rows = classify_pkfk(pkfk_candidate_features(spark, tables)).collect()
    key = lambda r: (r["pk_table"], r["pk_col"], r["fk_table"], r["fk_col"])
    cand = {key(r) for r in rows}
    pred = {key(r) for r in rows if r["is_pkfk"] == 1}
    gt_in = set(TPCH_FK_GROUNDTRUTH) & cand
    assert len(gt_in) >= 6
    assert gt_in <= pred                      # full recall at 10x scale
    assert len(pred - set(TPCH_FK_GROUNDTRUTH)) <= 4  # precision floor
