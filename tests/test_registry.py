"""FeatureRegistry — the §3.4 catalog-build lifecycle: 1:1 feature-view
numbering, entity detection + default election, PK-FK fallback mapping
for tables without detectable entities, and the registry verbs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kgfarm_spark.sources.registry import (
    build_registry,
    clean_column_name,
    entity_name,
)
from kgfarm_spark.sources.transcripts import load_table
from tests.conftest import SF_SMOKE


def test_name_cleaning_reference_rules():
    # F7: strip digits, trailing id/number tokens, collapse __, empty→entity
    assert clean_column_name("customer_id") == "customer"
    assert clean_column_name("col__name2") == "col_name"
    assert clean_column_name("id") == "entity"
    # F8: column + _ + table, scrubbed
    assert entity_name("user id", "events.csv") == "userid_events"
    assert entity_name("a-b", "t") == "a_b_t"


@pytest.fixture(scope="module")
def registry(spark):
    tables = {
        name: load_table(spark, SF_SMOKE, name)
        for name in ("nation", "supplier", "region")
    }
    return build_registry(spark, tables)


def test_feature_view_numbering(registry):
    fvs = {r["table_name"]: r["feature_view"] for r in registry.get_feature_views().collect()}
    # sorted: nation, region, supplier → zero-padded 1..3 (digits=1)
    assert fvs == {
        "nation": "Feature_view_1",
        "region": "Feature_view_2",
        "supplier": "Feature_view_3",
    }


def test_entities_and_defaults(registry):
    ents = registry.get_entities().collect()
    by_table = {}
    for r in ents:
        by_table.setdefault(r["table_name"], []).append(r)
    # nation + supplier have detectable entities; exactly one default each
    for t in ("nation", "supplier"):
        defaults = [r for r in by_table[t] if r["mapping"] == "hasDefaultEntity"]
        assert len(defaults) == 1
    # region (2 columns < 3) has no detectable entity → PK-FK fallback:
    # r_regionkey is referenced by nation.n_regionkey → default entity
    assert "region" in by_table
    fb = by_table["region"]
    assert any(
        r["column_name"] == "r_regionkey" and r["mapping"] in ("hasDefaultEntity", "hasMultipleEntities")
        for r in fb
    )
    # entity naming rule (F8)
    for r in ents:
        assert r["entity_name"] == entity_name(r["column_name"], r["table_name"]) or "_" in r["entity_name"]


def test_registry_verbs(registry, spark):
    r2 = registry.update_entity("nation", "n_name")
    nat = {
        row["column_name"]: row["mapping"]
        for row in r2.get_entities().filter(F.col("table_name") == "nation").collect()
    }
    assert nat["n_name"] == "hasDefaultEntity"
    assert all(m != "hasDefaultEntity" for c, m in nat.items() if c != "n_name")

    before = r2.get_feature_views().count()
    r3 = r2.drop_feature_view(["Feature_view_2"])
    assert r3.get_feature_views().count() == before - 1
    assert r3.get_entities().filter(F.col("table_name") == "region").count() == 0
