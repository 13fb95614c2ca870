"""Feature-view / entity registry — the engine's replacement for the
reference's KG-build lifecycle (§3.4 of SURVEY.md: kg_augmentor/
augment_LiDS.generate_farm_graph, augment_LiDS.py:255-263). Instead of
RDF triples in Stardog, the catalog is two plain DataFrames the rest of
the engine joins against.

Reference semantics reproduced:
- 1:1 table → feature view with zero-padded numbering
  (``Feature_view_01`` … — augment_LiDS.py:130-146, digits =
  len(str(n_tables))).
- entity naming: ``column + '_' + table`` with '-'→'_', '__'→'_',
  spaces stripped (augment_LiDS.py:161-162) — reference F8; column-name
  cleaning (strip digits / trailing id/number tokens, '__'→'_',
  empty→'entity') — reference F7 (augment_LiDS.py:57-87).
- entity detection thresholds via functions.profiling.detect_entities
  (uniqueness ≥ 0.95, zero missing, non-date, ≥3 columns).
- default-entity election per table: argmax uniqueness
  (augment_LiDS.py:89-126).
- unmapped feature views fall back to PK-FK relations: a table with one
  qualifying relation gets that column as ``hasDefaultEntity``; multiple
  relations → ``hasMultipleEntities`` (augment_LiDS.py:186-222,
  duplicate detection at 193-195 = SURVEY A7).

Registry verbs mirror operations/api.py: ``get_feature_views``
(api.py:84), ``get_entities`` (api.py:79), ``update_entity``
(api.py:167), ``drop_feature_view`` (api.py:157).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgfarm_spark.functions.profiling import (
    _ref_type,
    detect_entities,
    elect_default_entities,
    pkfk_features,
    profile_table,
)


def clean_column_name(name: str) -> str:
    """Reference F7 (augment_LiDS.py:57-87): lowercase-ish cleanup —
    strip digits, drop trailing 'id'/'number' tokens, collapse '__',
    empty result → 'entity'."""
    out = re.sub(r"\d+", "", name)
    out = re.sub(r"(_?(id|number))+$", "", out, flags=re.IGNORECASE)
    out = re.sub(r"__+", "_", out).strip("_ ")
    return out or "entity"


def entity_name(column: str, table: str) -> str:
    """Reference F8 (augment_LiDS.py:161-162)."""
    return (
        f"{column}_{table.replace('.csv', '')}"
        .replace("-", "_")
        .replace("__", "_")
        .replace(" ", "")
    )


class FeatureRegistry:
    """Built once per catalog; all state is two DataFrames."""

    def __init__(self, spark: SparkSession, feature_views: DataFrame, entities: DataFrame):
        self.spark = spark
        self._feature_views = feature_views
        self._entities = entities

    # ---- verbs (operations/api.py:79-170) --------------------------------
    def get_feature_views(self) -> DataFrame:
        return self._feature_views

    def get_entities(self) -> DataFrame:
        return self._entities

    def drop_feature_view(self, fv_names: list[str]) -> "FeatureRegistry":
        self._feature_views = self._feature_views.filter(
            ~F.col("feature_view").isin(fv_names)
        )
        self._entities = self._entities.join(
            self._feature_views.select("table_name"), "table_name", "left_semi"
        )
        return self

    def update_entity(self, table: str, column: str) -> "FeatureRegistry":
        """Force ``column`` to be the default entity of ``table``
        (api.py:167-170)."""
        self._entities = self._entities.withColumn(
            "mapping",
            F.when(
                (F.col("table_name") == table) & (F.col("column_name") == column),
                F.lit("hasDefaultEntity"),
            )
            .when(
                (F.col("table_name") == table) & (F.col("mapping") == "hasDefaultEntity"),
                F.lit("hasEntity"),
            )
            .otherwise(F.col("mapping")),
        )
        return self


def build_registry(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    pkfk_containment_threshold: float = 0.9,
) -> FeatureRegistry:
    """The §3.4 'catalog build': profile → detect entities → elect
    defaults → map unmapped tables via PK-FK fallback."""
    names = sorted(tables)
    digits = len(str(len(names)))

    fv_rows = [
        (t, f"Feature_view_{str(i + 1).zfill(digits)}") for i, t in enumerate(names)
    ]
    feature_views = spark.createDataFrame(
        fv_rows, "table_name string, feature_view string"
    )

    profs = None
    for t in names:
        p = profile_table(tables[t], t, exact=True)
        profs = p if profs is None else profs.unionByName(p)
    ents = detect_entities(profs)
    defaults = elect_default_entities(ents).select(
        "table_name", F.col("default_entity").alias("column_name")
    ).withColumn("__is_default", F.lit(True))

    entities = (
        ents.join(defaults, ["table_name", "column_name"], "left")
        .withColumn(
            "mapping",
            F.when(F.col("__is_default"), "hasDefaultEntity").otherwise("hasEntity"),
        )
        .drop("__is_default")
    )
    entities = entities.withColumn(
        "entity_name",
        F.regexp_replace(
            F.regexp_replace(
                F.concat_ws("_", F.col("column_name"), F.col("table_name")), "-", "_"
            ),
            "__",
            "_",
        ),
    )

    # --- unmapped fallback via PK-FK relations (augment_LiDS.py:186-222) --
    mapped = {r["table_name"] for r in entities.select("table_name").distinct().collect()}
    unmapped = [t for t in names if t not in mapped]
    fallback_rows = []
    for t in unmapped:
        # a PK-side relation: some other table's column is contained in one
        # of t's columns → that column of t acts as the entity
        rels = []
        for pk_c in tables[t].columns:
            pk_type = _ref_type(tables[t].schema[pk_c].dataType)
            for fk_t in names:
                if fk_t == t:
                    continue
                for fk_c in tables[fk_t].columns:
                    if _ref_type(tables[fk_t].schema[fk_c].dataType) != pk_type:
                        continue
                    feats = pkfk_features(tables[fk_t], fk_c, tables[t], pk_c)
                    if feats["containment"] >= pkfk_containment_threshold:
                        rels.append((pk_c, feats["pk_uniqueness"]))
                        break
        seen = {}
        for pk_c, uniq in rels:
            seen.setdefault(pk_c, uniq)
        multi = len(seen) > 1  # A7 duplicate flag (augment_LiDS.py:193-195)
        for pk_c, uniq in seen.items():
            fallback_rows.append(
                (
                    t, pk_c, "T", float(uniq), "STRING",
                    "hasMultipleEntities" if multi else "hasDefaultEntity",
                    entity_name(pk_c, t),
                )
            )
    if fallback_rows:
        fb = spark.createDataFrame(
            fallback_rows,
            "table_name string, column_name string, data_type string, "
            "uniqueness double, value_type string, mapping string, entity_name string",
        )
        entities = entities.unionByName(fb)

    return FeatureRegistry(spark, feature_views, entities)
