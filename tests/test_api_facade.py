"""FeatureFarm facade: the reference-verb surface drives the engine
end-to-end (load → profile → entities → discovery → enrich → clean →
select → engineer) on the smoke-scale testdata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgfarm_spark.api import FeatureFarm
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def farm(spark):
    return FeatureFarm(spark, data_dir=SF_SMOKE)


def test_profile_entities_discovery(farm):
    profiles = farm.profile(farm.load_table("nation"), "nation", exact=True)
    ents = farm.detect_entities(profiles)
    names = {r["column_name"] for r in ents.collect()}
    assert "n_nationkey" in names
    best = farm.default_entities(ents).collect()
    assert len(best) == 1

    opts = farm.search_enrichment_options(
        {"nation": farm.load_table("nation"), "region": farm.load_table("region")}
    )
    rows = {(r["pk_col"], r["fk_col"]) for r in opts.collect()}
    assert ("n_nationkey", "r_regionkey") in rows


def test_enrich_interval_vs_asof(farm, spark):
    from kgfarm_spark.sources.transcripts import probes, transcripts

    t = transcripts(spark, SF_SMOKE)
    p = probes(spark, SF_SMOKE)
    interval = farm.enrich(p, t, on="conv_id", entity_ts="query_ts", view_ts="ts",
                           freshness_days=1)
    latest = farm.asof_enrich(p, t, on="conv_id", entity_ts="query_ts", view_ts="ts",
                              freshness_days=1)
    n_probes = p.count()
    assert latest.count() == n_probes  # left outer: every probe preserved
    assert interval.count() >= latest.filter(F.col("matched_ts").isNotNull()).count()


def test_clean_and_engineer(farm, spark):
    cust = farm.load_table("customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 9 == 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
        "c_mktsegment",
    )
    cleaned = farm.clean(cust, "Fill", numeric_cols=["bal"])
    assert cleaned.filter(F.col("bal").isNull()).count() == 0

    orders = farm.load_table("orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    train = orders.filter(F.col("o_orderkey") % 2 == 1)
    test = orders.filter(F.col("o_orderkey") % 2 == 0)
    tr, te, report = farm.engineer_features(train, test, "o_orderstatus")
    assert report["task"] in ("binary", "multiclass")
    assert set(tr.columns) == set(te.columns)
