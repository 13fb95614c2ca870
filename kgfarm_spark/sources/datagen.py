"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

Generates an input_hint-shaped transcripts table of arbitrary size with
NO Python in the row path: ``spark.range`` + hash-derived columns, all
JVM-side expressions (whole-stage codegen), fully seeded — unlike the
reference's unseeded generator (helpers/generate_synthetic_datasets.py:44-52,
``datetime.now() - random days``).

Properties exercised by tests:
- Zipf-ish skew over conv_id (a few hot conversations — skew handling);
- strictly increasing ts per conversation (cumulative positive gaps);
- occasional gaps > session threshold (sessionize boundaries);
- seeded Markov-ish role draw; tool set on a subset of turns;
- deterministic pseudo-text of variable length.

Used for: scaling benchmarks (bench.py --scaling generates millions of
turns), skew tests, leakage property tests. NOT used for driver oracles
(those derive transcripts from the driver's events.parquet so DuckDB can
reproduce them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def gen_transcripts(
    spark: SparkSession,
    n_turns: int = 1_000_000,
    n_convs: int = 10_000,
    seed: int = 42,
    skew: float = 2.0,
    session_gap_minutes: int = 30,
    partitions: int | None = None,
) -> DataFrame:
    """Build a deterministic transcripts DataFrame of ``n_turns`` rows.

    ``skew`` > 1 concentrates turns on low conv ids (u^skew mapping —
    Zipf-ish: conv 0 is the hottest). Same (n_turns, n_convs, seed) →
    identical table at any parallelism (hash-derived, order-free).
    """
    df = spark.range(0, n_turns, 1, partitions or spark.sparkContext.defaultParallelism)

    # uniform [0,1) from a seeded 64-bit hash; power-law map to conv ids
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    u = (h % 1_000_003).cast("double") / 1_000_003.0
    conv_num = F.floor(F.pow(u, F.lit(skew)) * n_convs).cast("long")
    df = df.withColumn("__conv", conv_num)

    # per-turn gap seconds: mostly 5..300s, every ~17th turn a long gap
    # (2-4 h) to create session boundaries
    h2 = F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1)))
    short_gap = (h2 % 295 + 5).cast("long")
    long_gap = (h2 % 7200 + 7200).cast("long")
    gap = F.when(h2 % 17 == 0, long_gap).otherwise(short_gap)
    df = df.withColumn("__gap", gap)

    w = Window.partitionBy("__conv").orderBy("id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    h3 = F.abs(F.xxhash64(F.col("id"), F.lit(seed + 2)))
    role = (
        F.when(h3 % 10 < 4, "user")
        .when(h3 % 10 < 8, "assistant")
        .when(h3 % 10 < 9, "system")
        .otherwise("tool")
    )
    tool = F.when(
        (role.isin("tool", "assistant")) & (h3 % 3 == 0),
        F.element_at(
            F.array(F.lit("search"), F.lit("code"), F.lit("browse"), F.lit("files")),
            ((h3 % 4) + 1).cast("int"),
        ),
    )
    words = F.array(
        *[F.lit(x) for x in "the quick spark shuffles data over keys and windows".split()]
    )
    text = F.concat_ws(
        " ",
        F.slice(words, 1, ((h3 % 9) + 1).cast("int")),
    )

    out = (
        df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int"))
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1704067200)  # 2024-01-01T00:00:00Z
                + (F.col("__conv") % 86400)
                + F.sum("__gap").over(cum)
            ),
        )
        .select(
            F.concat(F.lit("conv_"), F.lpad(F.col("__conv").cast("string"), 8, "0")).alias("conv_id"),
            "turn_idx",
            role.alias("role"),
            text.alias("text"),
            tool.alias("tool"),
            "ts",
        )
    )
    return out


def gen_documents(
    spark: SparkSession,
    n_docs: int = 1_000_000,
    seed: int = 42,
    words_per_doc: int = 30,
    vocab: int = 100_000,
    dup_pct: int = 5,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic document table (doc_id, text) for dedup scale
    benches. ``dup_pct``% of docs are NEAR-duplicates of an earlier doc
    (same word sequence except the last 3 words → high shingle Jaccard,
    < 1.0), so LSH has real work at any scale. All JVM expressions
    (hash-derived words via one transform() per row at generation time
    only — the generated table is written to parquet once)."""
    df = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)
    h = F.abs(F.xxhash64(F.col("id"), F.lit(seed)))
    is_dup = (F.pmod(h, F.lit(100)) < dup_pct) & (F.col("id") > 1000)
    src = F.when(is_dup, F.col("id") - (F.pmod(h, F.lit(1000)) + 1)).otherwise(F.col("id"))
    df = df.withColumn("__src", src).withColumn("__dup", is_dup)
    tail_start = words_per_doc - 3
    # word i seeds from the source doc, except a dup row's 3-word tail
    # which seeds from its own id (near-dup, not exact)
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(0), F.lit(words_per_doc - 1)),
            lambda i: F.concat(
                F.lit("w"),
                F.pmod(
                    F.abs(
                        F.xxhash64(
                            F.when(F.col("__dup") & (i >= tail_start), F.col("id")).otherwise(
                                F.col("__src")
                            ),
                            i,
                            F.lit(seed + 1),
                        )
                    ),
                    F.lit(vocab),
                ).cast("string"),
            ),
        ),
    )
    return df.select(F.col("id").alias("doc_id"), text.alias("text"))


def gen_embeddings(
    spark: SparkSession,
    n_vecs: int = 1_000_000,
    dim: int = 64,
    seed: int = 42,
    n_clusters: int = 256,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic embedding table (vec_id, embedding array<float>) for
    ANN scale benches: cluster center + per-vector jitter, so IVF/LSH
    bucketing has real structure to exploit. JVM-only generation."""
    df = spark.range(0, n_vecs, 1, partitions or spark.sparkContext.defaultParallelism)
    c = F.pmod(F.abs(F.xxhash64(F.col("id"), F.lit(seed))), F.lit(n_clusters))
    df = df.withColumn("__c", c)

    def unit(a, b, s):
        return (
            F.pmod(F.abs(F.xxhash64(a, b, F.lit(s))), F.lit(10007)).cast("double")
            / 10007.0
            - 0.5
        )

    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: unit(F.col("__c"), d, seed + 1) + 0.25 * unit(F.col("id"), d, seed + 2),
    )
    return df.select(
        F.col("id").alias("vec_id"), emb.cast("array<float>").alias("embedding")
    )


def gen_probes(
    spark: SparkSession,
    transcripts_df: DataFrame,
    every_nth: int = 7,
    shift_minutes: int = 37,
) -> DataFrame:
    """Probe frame over a generated transcripts table (for bench/tests)."""
    return transcripts_df.filter(F.col("turn_idx") % every_nth == 3).select(
        "conv_id",
        (F.col("ts") + F.expr(f"INTERVAL {shift_minutes} MINUTE")).alias("query_ts"),
        F.concat(
            F.col("conv_id"), F.lit("#"), F.col("turn_idx").cast("string")
        ).alias("probe_id"),
    )
