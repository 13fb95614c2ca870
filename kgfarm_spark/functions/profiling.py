"""Column profiling + entity/join discovery — the KG (LiDS) replacement.

The reference stores per-column profiles as RDF triples in Stardog and
queries them with SPARQL (operations/template.py:523-561 detect_entities,
kg_augmentor/augment_LiDS.py:89-126 default-entity election,
template.py:126-172 join discovery). Here the same facts are computed
directly from the data as DataFrames — one aggregate pass per table,
window election, metadata joins.

Scale notes: profile_table computes ALL per-column stats in a single
aggregate pass (one job, map-side partial aggregation, no shuffled raw
rows); approx_count_distinct (HLL) instead of exact distinct keeps it
one-pass at 100 TB. Exact mode exists for oracle parity.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: F10 name-suffix heuristic, shared with pkfk_model (review finding: the
#: previous 'num_$' literal-trailing-underscore form was a dead feature)
PKFK_NAME_SUFFIX_RE = re.compile(r"(id$|key$|num$|^num_)", re.IGNORECASE)


def range_contained_flag(pk_mn, pk_mx, fk_mn, fk_mx) -> int:
    """F11: numeric FK range inside the PK range; 0 when ANY bound is
    None (non-castable or all-null column — review finding: a castable
    max with a non-castable min used to TypeError on None comparison).
    Shared by pkfk_features and pkfk_model.pkfk_candidate_features."""
    if None in (pk_mn, pk_mx, fk_mn, fk_mx):
        return 0
    return int(pk_mx >= fk_mx and pk_mn <= fk_mn)

#: reference type buckets (operations/api.py:1018-1021)
_NUMERIC = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType, T.DoubleType, T.DecimalType)


def _ref_type(dt: T.DataType) -> str:
    """Map a Spark type to the reference profiler's type labels
    (N_int/N_float/N_bool/T/T_date — operations/api.py:1018-1021)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "N_int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "N_float"
    if isinstance(dt, T.BooleanType):
        return "N_bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "T_date"
    return "T"


def profile_table(
    df: DataFrame, table_name: str, exact: bool = False
) -> DataFrame:
    """One profile row per column: total/distinct/missing counts, min/max
    (reference profile schema: hasTotalValueCount / hasDistinctValueCount /
    hasMissingValueCount / hasDataType at template.py:528-534, min/max at
    template.py:694-697). Single aggregate pass over the table.

    ``exact`` uses count_distinct (needed for oracle parity); default is
    approx_count_distinct (one-pass HLL — the 100 TB mode).
    """
    aggs = [F.count(F.lit(1)).alias("__total")]
    dtypes = dict(df.dtypes)
    for c in df.columns:
        col = df[c]  # positional: dots in names never parse as struct access
        if dtypes[c].startswith("map"):
            # maps are not orderable/hashable: profile missingness only
            aggs.append(F.lit(None).cast("long").alias(f"{c}__distinct"))
            aggs.append(
                F.coalesce(F.sum(col.isNull().cast("long")), F.lit(0)).alias(
                    f"{c}__missing"
                )
            )
            aggs.append(F.lit(None).cast("string").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__max"))
            continue
        cd = F.count_distinct(col) if exact else F.approx_count_distinct(col)
        aggs.append(cd.alias(f"{c}__distinct"))
        # coalesce: F.sum over ZERO rows is NULL, and a NULL missing-count
        # TypeErrors downstream arithmetic on empty tables
        aggs.append(
            F.coalesce(F.sum(col.isNull().cast("long")), F.lit(0)).alias(
                f"{c}__missing"
            )
        )
        # min/max as strings so one schema fits all column types
        aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
    row = df.agg(*aggs)

    parts = []
    for c in df.columns:
        parts.append(
            F.struct(
                F.lit(table_name).alias("table_name"),
                F.lit(c).alias("column_name"),
                F.lit(_ref_type(df.schema[c].dataType)).alias("data_type"),
                F.col("__total").alias("total_count"),
                F.col(f"{c}__distinct").alias("distinct_count"),
                F.col(f"{c}__missing").alias("missing_count"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
        )
    out = row.select(F.explode(F.array(*parts)).alias("p")).select("p.*")
    return out.withColumn(
        "uniqueness", F.col("distinct_count") / F.col("total_count")
    )


def detect_entities(
    profiles: DataFrame,
    uniqueness_threshold: float = 0.95,
    min_columns: int = 3,
) -> DataFrame:
    """Entity candidates per the reference's exact SPARQL filters
    (template.py:523-561): zero missing values, uniqueness ≥ 0.95,
    non-date type, table has > 2 columns. Emits the Feast value type the
    reference binds (INT64 for N*, STRING otherwise — template.py:546).
    """
    ncols = profiles.groupBy("table_name").agg(F.count(F.lit(1)).alias("n_cols"))
    out = (
        profiles.join(ncols, "table_name")
        .filter(F.col("n_cols") >= min_columns)
        .filter(F.col("missing_count") == 0)
        .filter(F.col("uniqueness") >= uniqueness_threshold)
        .filter(F.col("data_type") != "T_date")
    )
    return out.select(
        "table_name",
        "column_name",
        "data_type",
        "uniqueness",
        F.when(F.col("data_type").startswith("N"), "INT64")
        .otherwise("STRING")
        .alias("value_type"),
    )


def elect_default_entities(entities: DataFrame) -> DataFrame:
    """Default-entity election per table: argmax uniqueness, ties broken by
    column name for determinism (reference: argmax uniqueness, ties by most
    PKFK relations — augment_LiDS.py:89-126; name tiebreak substitutes when
    no relation counts are supplied). Window + row_number — W3 in SURVEY §2.5."""
    w = Window.partitionBy("table_name").orderBy(
        F.col("uniqueness").desc(), F.col("column_name").asc()
    )
    return (
        entities.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("column_name", "default_entity")
    )


def task_type(df: DataFrame, target: str) -> str:
    """ML-task typing from target cardinality — reference A12 rule
    (interface/apis.py:118-126): nunique == 2 → binary; nunique > 2 and
    nunique/len < 0.5 → multiclass; else regression. One aggregate pass."""
    row = df.agg(
        F.count_distinct(F.col(target)).alias("d"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    if row["d"] == 2:
        return "binary"
    if row["d"] > 2 and row["d"] / row["n"] < 0.5:
        return "multiclass"
    return "regression"


def pkfk_features(
    fk_df: DataFrame, fk_col: str, pk_df: DataFrame, pk_col: str
) -> dict:
    """Inclusion/containment features for one PK-FK candidate pair — the
    distributed rewrite of the reference's O(n²) Python loops
    (kg_augmentor/pkfk_classification/feature_generator.py:29-73: F3/F4/F5)
    plus range containment F8 (template.py:699) and name-suffix F10
    (template.py:717). Returns a dict of named features (driver-side
    scalars from one aggregate each — inputs are column projections)."""
    fk_vals = fk_df.select(F.col(fk_col).alias("v")).filter(F.col("v").isNotNull())
    pk_vals = pk_df.select(F.col(pk_col).alias("v")).filter(F.col("v").isNotNull())

    fk_stats = fk_vals.agg(
        F.count("v").alias("n"),
        F.count_distinct("v").alias("d"),
        F.min("v").try_cast("double").alias("mn"),
        F.max("v").try_cast("double").alias("mx"),
    ).first()
    pk_stats = pk_vals.agg(
        F.count("v").alias("n"),
        F.count_distinct("v").alias("d"),
        F.min("v").try_cast("double").alias("mn"),
        F.max("v").try_cast("double").alias("mx"),
    ).first()

    # containment: |FK ∩ PK| / |FK distinct| via distinct semi-join
    inter = fk_vals.distinct().join(pk_vals.distinct(), "v", "left_semi").count()

    name_flag = 1 if PKFK_NAME_SUFFIX_RE.search(fk_col) else 0
    range_contained = range_contained_flag(
        pk_stats["mn"], pk_stats["mx"], fk_stats["mn"], fk_stats["mx"]
    )
    return {
        "fk_uniqueness": fk_stats["d"] / fk_stats["n"] if fk_stats["n"] else 0.0,
        "pk_uniqueness": pk_stats["d"] / pk_stats["n"] if pk_stats["n"] else 0.0,
        "containment": inter / fk_stats["d"] if fk_stats["d"] else 0.0,
        "cardinality_ratio": (fk_stats["d"] / pk_stats["d"]) if pk_stats["d"] else 0.0,
        "range_contained": range_contained,
        "name_suffix_flag": name_flag,
    }


def label_pkfk_candidates(
    candidates: DataFrame, groundtruth: DataFrame
) -> DataFrame:
    """J7 (label join): mark each PK-FK candidate 4-tuple as has_pkfk 1/0
    by membership in a groundtruth table — the reference loops a Python
    membership test per row (kg_augmentor/pkfk_classification/
    feature_generator.py:101-120); here it is one left join + when(isnull).
    ``groundtruth`` columns: pk_table, pk_col, fk_table, fk_col."""
    keys = ["pk_table", "pk_col", "fk_table", "fk_col"]
    gt = groundtruth.select(*keys).distinct().withColumn("__gt", F.lit(1))
    out = candidates.join(F.broadcast(gt), keys, "left")
    return out.withColumn(
        "has_pkfk", F.when(F.col("__gt").isNull(), 0).otherwise(1)
    ).drop("__gt")


_CAST = {"N_int": "long", "N_float": "double", "N_bool": "boolean"}


def _melt_columns(
    tables: dict[str, DataFrame], colset: set[tuple[str, str]], cast_type: str
) -> DataFrame:
    """One scan per table covering all its needed columns → distinct
    (tbl, col, value) long frame (shared by discover_joins and the PKFK
    classifier's feature builder)."""
    by_table: dict[str, list[str]] = {}
    for t, c in colset:
        by_table.setdefault(t, []).append(c)
    frames = []
    for t, cs in by_table.items():
        arr = F.array(
            *[
                F.struct(
                    F.lit(c).alias("col"),
                    F.col(c).try_cast(cast_type).alias("value"),
                )
                for c in cs
            ]
        )
        frames.append(
            tables[t]
            .select(F.explode(arr).alias("e"))
            .select(
                F.lit(t).alias("tbl"),
                F.col("e.col").alias("col"),
                F.col("e.value").alias("value"),
            )
            .filter(F.col("value").isNotNull())
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.distinct()


def containment_frame(
    spark,
    tables: dict[str, DataFrame],
    pairs: list[tuple],
    types: dict[str, dict[str, str]],
) -> DataFrame:
    """Containment |FK∩PK| / |FK distinct| for EVERY candidate pair in one
    distributed pass per reference type (melt → distinct → value join →
    groupBy; the SINDY/SPIDER inclusion-dependency shape). Pairs with no
    intersection simply don't appear (callers left-join + fillna 0)."""
    by_rt: dict[str, list[tuple]] = {}
    for pk_t, pk_c, fk_t, fk_c in pairs:
        by_rt.setdefault(types[pk_t][pk_c], []).append((pk_t, pk_c, fk_t, fk_c))

    result = None
    for rt, rt_pairs in by_rt.items():
        cast_type = _CAST.get(rt, "string")
        fk_cols = {(t, c) for _, _, t, c in rt_pairs}
        pk_cols = {(t, c) for t, c, _, _ in rt_pairs}
        fkm = _melt_columns(tables, fk_cols, cast_type)
        pkm = _melt_columns(tables, pk_cols, cast_type).select(
            F.col("tbl").alias("pk_tbl"), F.col("col").alias("pk_colname"), "value"
        )
        pair_df = spark.createDataFrame(
            rt_pairs,
            "pk_table string, pk_col string, fk_table string, fk_col string",
        )
        d_fk = fkm.groupBy("tbl", "col").agg(F.count(F.lit(1)).alias("__d"))
        inter = (
            fkm.join(pkm, "value")
            .join(
                F.broadcast(pair_df),
                (F.col("tbl") == F.col("fk_table"))
                & (F.col("col") == F.col("fk_col"))
                & (F.col("pk_tbl") == F.col("pk_table"))
                & (F.col("pk_colname") == F.col("pk_col")),
            )
            .groupBy("pk_table", "pk_col", "fk_table", "fk_col")
            .agg(F.count(F.lit(1)).alias("__inter"))
        )
        res = (
            inter.join(
                F.broadcast(d_fk),
                (inter["fk_table"] == d_fk["tbl"]) & (inter["fk_col"] == d_fk["col"]),
            )
            .withColumn("containment", F.col("__inter") / F.col("__d"))
            .select("pk_table", "pk_col", "fk_table", "fk_col", "containment")
        )
        result = res if result is None else result.unionByName(res)
    if result is None:  # no pairs: empty frame, not None (contract trap)
        return spark.createDataFrame(
            [],
            "pk_table string, pk_col string, fk_table string, "
            "fk_col string, containment double",
        )
    return result


def candidate_pairs(
    tables: dict[str, DataFrame],
    ents: dict[str, set],
    types: dict[str, dict[str, str]],
) -> list[tuple]:
    """(pk_table, pk_col, fk_table, fk_col) metadata enumeration: entity
    PK side, same reference type, cross-table."""
    pairs = []
    for pk_t in tables:
        for pk_c in sorted(ents[pk_t]):
            for fk_t, fk_df in tables.items():
                if fk_t == pk_t:
                    continue
                for fk_c in fk_df.columns:
                    if types[fk_t][fk_c] == types[pk_t][pk_c]:
                        pairs.append((pk_t, pk_c, fk_t, fk_c))
    return pairs


def discover_joins(
    spark,
    tables: dict[str, DataFrame],
    uniqueness_threshold: float = 0.95,
    containment_threshold: float = 0.9,
    exact: bool = True,
) -> DataFrame:
    """search_enrichment_options replacement (J4, template.py:126-172):
    enumerate (pk_table.pk_col ← fk_table.fk_col) candidates where the PK
    side is entity-like and FK values are contained in PK values; score =
    containment (the reference shows Joinability_strength % desc,
    api.py:205-209). Candidate pruning uses profiles (same-type columns
    only) before any data-data comparison.

    Scale design (fixes VERDICT r01 'What's wrong' #4): candidate columns
    are MELTED into one long (table, col, value) frame per reference type
    and ALL containments come out of a single distinct → value-join →
    groupBy pass (the SINDY/SPIDER inclusion-dependency shape). Job count
    grows with the number of TABLES (metadata profiling), never with the
    number of candidate pairs — a catalog with hundreds of pairs costs the
    same two shuffles as one with three.

    ``exact=False`` is the 100 TB profiling mode: entity detection runs on
    one-pass HLL distinct counts (approx_count_distinct, ~5% rsd) instead
    of exact count_distinct; pair a slightly lower uniqueness_threshold
    (e.g. 0.90) with it so HLL noise doesn't drop truly-unique columns.
    The containment pass itself is unchanged."""
    # --- metadata phase (profiles are column-count-sized; collects are tiny)
    profs = {name: profile_table(df, name, exact=exact) for name, df in tables.items()}
    ents = {
        name: {
            r["column_name"]
            for r in detect_entities(p, uniqueness_threshold).collect()
        }
        for name, p in profs.items()
    }
    types = {
        name: {f.name: _ref_type(f.dataType) for f in df.schema.fields}
        for name, df in tables.items()
    }

    # --- candidate pairs (pure metadata, driver-side)
    pairs = candidate_pairs(tables, ents, types)
    if not pairs:
        return spark.createDataFrame(
            [],
            "pk_table string, pk_col string, fk_table string, fk_col string, joinability double",
        )
    result = (
        containment_frame(spark, tables, pairs, types)
        .withColumn("joinability", F.round("containment", 6))
        .filter(F.col("joinability") >= containment_threshold)
        .select("pk_table", "pk_col", "fk_table", "fk_col", "joinability")
    )
    return result.orderBy(
        F.col("joinability").desc(), "pk_table", "pk_col", "fk_table", "fk_col"
    )
