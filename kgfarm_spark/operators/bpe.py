"""Distributed BPE tokenizer induction (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

A 100 TB corpus can't run the textbook in-memory BPE loop, but the
classic map-reduce decomposition holds: the merge statistics only depend
on the WORD CENSUS (distinct word, count) — corpus-linear work happens
once, in the census groupBy; every merge round after that is
census-sized, i.e. distinct-words-sized, typically 4-6 orders of
magnitude smaller than the corpus. Each round is one explode + one
map-side-combined aggregate over the cached census, a 1-row driver
collect (the argmax pair — the model step, legitimately driver-side),
and one codegen'd fold projection applying the merge. No Python in any
row path: the greedy left-to-right merge application is a higher-order
``aggregate`` lambda on the symbols array.

Parity: ``tests/test_pipeline_ops.py`` checks the merge sequence and
final segmentations are EXACTLY equal to a pure-Python reference BPE on
the same corpus (same greedy semantics, same deterministic tie-break:
max count, then lexicographically smallest (left, right) pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_census(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) census — the only corpus-linear pass in BPE training.
    One explode + one map-side-combined groupBy; whitespace tokenization
    to match the rest of the textstats family."""
    words = F.explode(F.split(F.trim(F.col(text_col)), r"\s+"))
    return (
        df.select(words.alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _adjacent_pairs(syms_col: str) -> F.Column:
    """Array of adjacent (l, r) symbol structs; empty for 1-symbol words."""
    return F.when(
        F.size(F.col(syms_col)) >= 2,
        F.expr(
            f"transform(sequence(0, size({syms_col}) - 2), "
            f"i -> struct({syms_col}[i] AS l, {syms_col}[i + 1] AS r))"
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def pair_counts(census: DataFrame) -> DataFrame:
    """Occurrence-weighted adjacent-symbol pair counts over a census that
    carries a ``__syms`` array (or over raw words via ``bpe_pair_counts``).
    Overlapping pairs count individually ('aaa' contributes (a,a) twice) —
    the textbook get_stats semantics."""
    if "__syms" not in census.columns:
        census = census.withColumn("__syms", F.split("word", ""))
    return (
        census.select("count", F.explode(_adjacent_pairs("__syms")).alias("__p"))
        .groupBy(F.col("__p.l").alias("left"), F.col("__p.r").alias("right"))
        .agg(F.sum("count").alias("pair_count"))
    )


def bpe_pair_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Round-0 BPE pair statistics straight off a document table: the
    character-bigram counts (weighted by word frequency) that pick the
    first merge. Oracle-checkable — the census + lateral position explode
    is plain SQL in both engines."""
    return pair_counts(word_census(df, text_col))


def _apply_merge(syms_col: F.Column, left: str, right: str) -> F.Column:
    """Greedy left-to-right application of one merge (left, right) ->
    left||right over a symbols array, as a pure JVM fold — the acc-array
    grows by slices, fine for word-length arrays."""
    l, r = F.lit(left), F.lit(right)
    return F.aggregate(
        syms_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (x == r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(left + right))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges over a document table. Returns
    ``(merges, segmented_census)``:

    - ``merges``: (rank, left, right, pair_count) — the model, in merge
      order. Tie-break is deterministic: max pair_count, then smallest
      (left, right) lexicographically, so two runs (and the pure-Python
      twin) produce the identical sequence.
    - ``segmented_census``: (word, count, symbols) — every distinct word
      with its final subword segmentation, ready to broadcast-join back
      onto the corpus as the tokenizer's apply step.

    Per round: one aggregate over the MATERIALIZED census (distinct-
    words sized, not corpus sized), one 1-row collect, one fold
    projection. Each round ``localCheckpoint``s the new census — the
    house rule from ``dedup_components``: persist alone leaves the
    LOGICAL plan growing by one fold layer per round, and Catalyst
    re-analyzes that ever-deeper tree every round (measured on the 5M-
    doc bench corpus: round wall time doubled every ~3 rounds — 1.5 s
    at round 5, 18.6 s at round 14 — and the driver OOM'd before round
    20). Checkpointing truncates lineage so every round plans against a
    constant-size leaf. Superseded checkpoint blocks are freed by the
    context cleaner once unreferenced; Py4J finalization is not prompt,
    so the loop forces a gc.collect() every 8 rounds — resident census
    copies stay bounded at ~8 snapshots regardless of n_merges (review
    finding: without this, a many-round run on a huge vocabulary piles
    up checkpoint blocks until nondeterministic GC).
    """
    import gc

    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    spark = df.sparkSession
    census = (
        word_census(df, text_col)
        .withColumn("__syms", F.split("word", ""))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            pair_counts(census)
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(1)
            .collect()
        )
        if not top:
            break
        row = top[0]
        merges.append((rank, row["left"], row["right"], row["pair_count"]))
        census = census.withColumn(
            "__syms", _apply_merge(F.col("__syms"), row["left"], row["right"])
        ).localCheckpoint(eager=True)
        if (rank + 1) % 8 == 0:
            gc.collect()
    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )
    segmented = census.select("word", "count", F.col("__syms").alias("symbols"))
    return merges_df, segmented


#: broadcast-path vocabulary cap: beyond this the driver-side dict stops
#: being "model-sized" — callers with a larger census use method='join'.
MAX_BROADCAST_VOCAB = 5_000_000


def bpe_apply(
    df: DataFrame,
    segmented_census: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
    method: str = "broadcast",
) -> DataFrame:
    """Tokenize a document table with a learned segmentation. Words
    absent from the census (unseen at train time) fall back to their
    character segmentation — the standard open-vocabulary behavior.

    Token semantics are identical on both paths and match training:
    split on runs of ASCII whitespace (the Java ``\\s`` class — exactly
    what ``word_census`` uses) and DROP empty tokens, so NULL/blank/
    whitespace-only text gives ``[]`` and a U+00A0 non-breaking space
    stays inside its word on both engines. The result is PER ROW (one
    output row per input row, duplicate and NULL ids included) — the
    equality is pytest-pinned, including the unicode/duplicate/NULL-id
    edges.

    ``method='broadcast'`` (default): the census is the tokenizer MODEL
    — collect it to a dict (capped at ``MAX_BROADCAST_VOCAB`` entries
    with a clear error, checked with a single limit+collect job),
    broadcast it, and tokenize map-side in an Arrow-batched
    ``mapInPandas`` kernel. ZERO corpus shuffle: tokenization cost rides
    the scan — the 100 TB shape. Measured at 5M docs / 150M words: 2.9x
    the join path (BENCH.md 5b).

    ``method='join'``: pure-JVM fallback for a census too large to
    broadcast — posexplode to (row-key, position, word), hash-join the
    census, reassemble per-ROW token arrays in word order (the internal
    ``monotonically_increasing_id`` row key makes reassembly immune to
    duplicate or NULL ids). Corpus-linear but pays one explode shuffle +
    one groupBy reassembly.
    """
    if method == "broadcast":
        return _bpe_apply_broadcast(df, segmented_census, text_col, id_col, out_col)
    if method != "join":
        raise ValueError(f"method must be 'broadcast' or 'join', got {method!r}")
    rows = df.select(
        F.col(id_col).alias("__oid"), F.col(text_col).alias("__t")
    ).withColumn("__rk", F.monotonically_increasing_id())
    occ = rows.select(
        "__rk",
        "__oid",
        F.posexplode_outer(F.split(F.col("__t"), r"\s+")).alias("__pos", "__w"),
    )
    model = segmented_census.select(
        F.col("word").alias("__w"), F.col("symbols").alias("__syms")
    )
    joined = occ.join(model, "__w", "left").select(
        "__rk",
        "__oid",
        "__pos",
        # empty tokens (leading/trailing whitespace, blank text) drop out
        # here: the WHEN yields NULL and collect_list skips NULLs
        F.when(
            F.col("__w").isNotNull() & (F.length("__w") > 0),
            F.coalesce(F.col("__syms"), F.split("__w", "")),
        ).alias("__syms"),
    )
    per_row = joined.groupBy("__rk").agg(
        F.first("__oid").alias(id_col),
        F.flatten(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__syms").isNotNull(),
                            F.struct("__pos", "__syms"),
                        )
                    )
                ),
                lambda x: x["__syms"],
            )
        ).alias(out_col),
    )
    return per_row.select(id_col, out_col)


#: the Java \s class — [ \t\n\x0B\f\r] — so the Python kernel splits
#: exactly like the JVM paths (Python's str.split()/re \s are Unicode-
#: aware and would diverge on e.g. non-breaking spaces)
_JAVA_WS = None


def _java_ws():
    global _JAVA_WS
    if _JAVA_WS is None:
        import re

        _JAVA_WS = re.compile("[ \t\n\x0b\f\r]+")
    return _JAVA_WS


def _bpe_apply_broadcast(
    df: DataFrame,
    segmented_census: DataFrame,
    text_col: str,
    id_col: str,
    out_col: str,
) -> DataFrame:
    """Map-side tokenization: broadcast the (word -> symbols) dict, Arrow
    batches in, token arrays out. No shuffle anywhere in the plan."""
    rows = segmented_census.select("word", "symbols").limit(
        MAX_BROADCAST_VOCAB + 1
    ).collect()
    if len(rows) > MAX_BROADCAST_VOCAB:
        raise ValueError(
            f"census exceeds MAX_BROADCAST_VOCAB ({MAX_BROADCAST_VOCAB}); "
            f"use bpe_apply(..., method='join')"
        )
    spark = df.sparkSession
    seg_map = {r["word"]: list(r["symbols"]) for r in rows}
    bc = spark.sparkContext.broadcast(seg_map)
    in_schema = df.select(id_col, text_col).schema
    id_field = in_schema[id_col]
    out_schema = f"{id_col} {id_field.dataType.simpleString()}, {out_col} array<string>"
    ws = _java_ws()

    def tokenize(batches):
        import pandas as pd

        m = bc.value
        for pdf in batches:
            texts = pdf[text_col]
            toks = [
                []
                if t is None
                else [
                    s
                    for w in ws.split(t)
                    if w
                    for s in m.get(w, list(w))
                ]
                for t in texts
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    return df.select(id_col, text_col).mapInPandas(tokenize, out_schema)
