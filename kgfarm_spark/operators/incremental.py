"""Incremental (cross-shard) exact dedup against a historical corpus.

The corpus-dedup family (``operators/dedup.py``) dedups WITHIN a frame.
Production ingestion is incremental: today's shard (10^7-10^9 docs) must
dedup against the ENTIRE historical corpus (10^11+ docs / 100 TB), and a
full new-vs-history join re-shuffles the history on every ingest — the
one cost an incremental pipeline cannot pay.

The standard fix is a **Bloom filter over the history's fingerprints**:

- ``build_history_filter`` makes ONE corpus-linear pass over the
  history (map-side per-partition bitmaps via ``mapInPandas``, OR-folded
  on the driver — the only driver object is the n_bits/8-byte bitmap,
  model-sized and independent of corpus row count);
- ``dedup_against_history`` probes the broadcast bitmap map-side over
  the new shard (ZERO shuffle — an Arrow projection), so only the
  *candidate* rows (true duplicates + the false-positive rate ε of the
  filter) ever reach the exact verification join against the history.
  Verification makes the result EXACT: Bloom filters have no false
  negatives, so non-candidates are provably novel, and candidates are
  confirmed by fingerprint equi-join. At ε = 1% and a 0.1% true-dup
  rate, the join input is ~1.1% of the shard — a ~90× shuffle cut, and
  the history side is semi-join-pruned to the candidate fingerprints
  (DSv2 runtime filtering prunes its files at the scan).

Sizing at 100 TB: n_bits ≈ 1.44 · k · |history| for the target ε
(k = 6, ε ≈ 1%: ~10 bits/doc → 10^11 docs = 125 GB, which no longer
broadcasts whole — shard the filter by ``fingerprint mod S`` into S
independent bitmaps and probe each shard's ingest partition against its
own (the probe stays map-side because the shard id is a pure function
of the fingerprint). This module keeps the single-bitmap case; the
sharding wrapper is a partition-by + per-shard call.

Fingerprints are md5(text) (32 hex chars); bit positions come from k
disjoint 8-hex windows of sha2-256(text) (64 hex chars, so k <= 8) —
independent by construction, no double-hashing correlation.

Reference parity: the reference engine dedups eagerly per load
(feature_discovery profiling drops repeated rows in-memory); this is
the same exact-dedup semantics made incremental-at-scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bit_positions(text_col, n_bits: int, k: int) -> list:
    """k independent bit positions: disjoint 8-hex windows of
    sha2-256(text), each parsed as a 32-bit int mod n_bits. Pure
    JVM-side column expressions (conv/substring), no Python."""
    h = F.sha2(text_col, 256)
    return [
        (
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("bigint")
            % F.lit(n_bits)
        ).cast("long")
        for i in range(k)
    ]


def build_history_filter(
    df: DataFrame,
    text_col: str = "text",
    n_bits: int = 1 << 23,
    k: int = 6,
) -> dict:
    """ONE corpus-linear pass over the history → a Bloom-filter model
    ``{"n_bits", "k", "bitmap": bytes, "n_docs"}``.

    Each task folds its partition's bit positions into a local
    ``n_bits/8``-byte numpy bitmap (``mapInPandas``, Arrow-batched); a
    SECOND single-task fold ORs the per-partition bitmaps so the driver
    collects exactly ONE bitmap — at 10k input partitions a flat
    collect would land P × n_bits/8 bytes on the driver at once, while
    the tree fold streams them through one executor task Arrow-batch by
    Arrow-batch. Driver-resident memory is n_bits/8 — model-sized,
    never corpus- or partition-count-sized.
    """
    if n_bits < 8 or n_bits % 8:
        raise ValueError(f"n_bits must be a positive multiple of 8, got {n_bits}")
    if not 1 <= k <= 8:
        raise ValueError(f"k must be in [1, 8] (8-hex windows of sha256), got {k}")

    # NULL text never equi-matches anything (SQL NULL semantics), so it
    # has no business in the filter — and sha2(NULL) is NULL, which
    # would NULL the positions
    pos = df.filter(F.col(text_col).isNotNull()).select(
        F.array(*_bit_positions(F.col(text_col), n_bits, k)).alias("__pos")
    )
    n_bytes = n_bits // 8

    def _fold(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        seen = 0
        for pdf in batches:
            if not len(pdf):
                continue
            seen += len(pdf)
            # all position arrays are length k — one flat vectorized set
            # (bitwise_or.at accumulates duplicates correctly)
            flat = np.concatenate(pdf["__pos"].to_numpy()).astype(np.int64)
            np.bitwise_or.at(
                bm, flat >> 3, (1 << (flat & 7)).astype(np.uint8)
            )
        yield pd.DataFrame({"bm": [bm.tobytes()], "n": [seen]})

    def _fold2(batches):
        bm = np.zeros(n_bytes, dtype=np.uint8)
        seen = 0
        for pdf in batches:
            for raw, n in zip(pdf["bm"], pdf["n"]):
                bm |= np.frombuffer(raw, dtype=np.uint8)
                seen += int(n)
        yield pd.DataFrame({"bm": [bm.tobytes()], "n": [seen]})

    parts = pos.mapInPandas(_fold, "bm binary, n long")
    row = (
        parts.coalesce(1).mapInPandas(_fold2, "bm binary, n long").collect()[0]
    )
    bitmap = np.frombuffer(row["bm"], dtype=np.uint8)
    return {
        "n_bits": n_bits,
        "k": k,
        "bitmap": bitmap.tobytes(),
        "n_docs": int(row["n"]),
    }


def bloom_fpr(model: dict) -> float:
    """Expected false-positive rate of a built filter:
    (fraction of set bits) ** k — the standard estimate, computed from
    the actual bitmap so it reflects the true load, not the sizing
    assumption."""
    bm = np.frombuffer(model["bitmap"], dtype=np.uint8)
    frac = float(np.unpackbits(bm).mean())
    return frac ** model["k"]


def dedup_against_history(
    new_df: DataFrame,
    model: dict,
    history: DataFrame,
    text_col: str = "text",
    broadcast_candidates: bool = True,
) -> DataFrame:
    """EXACT incremental dedup: rows of ``new_df`` whose ``text_col``
    does not appear in ``history`` — at the cost of a Bloom probe
    (map-side, zero shuffle) plus a verification join over only the
    candidate rows.

    - non-candidates (any of the k bits unset) are provably novel —
      Bloom filters have no false negatives — and bypass the join;
    - candidates verify by md5-fingerprint semi-join against the
      history; with ``broadcast_candidates`` the candidate fingerprint
      set broadcasts and the history is semi-join-pruned map-side (the
      right shape when candidates ≪ history; set False when the shard's
      dup rate makes the candidate set itself too large to broadcast —
      the join then shuffles candidates only, never non-candidates).

    Returns the surviving rows of ``new_df`` (original schema) plus a
    ``bloom_candidate`` audit flag (True = the filter fired and the
    verify join cleared it — the false-positive census).
    """
    bitmap = np.frombuffer(model["bitmap"], dtype=np.uint8)
    n_bits, k = model["n_bits"], model["k"]
    spark = new_df.sparkSession
    bc = spark.sparkContext.broadcast(bitmap)

    @F.pandas_udf("boolean")
    def _probe(pos: pd.Series) -> pd.Series:
        bm = bc.value
        if not len(pos):
            return pd.Series([], dtype=bool)
        # every row's position array is length k — stack to (n, k) and
        # test all bits vectorized
        mat = np.stack(pos.to_numpy()).astype(np.int64)
        bits = (bm[mat >> 3] >> (mat & 7).astype(np.uint8)) & 1
        return pd.Series(bits.all(axis=1))

    # NULL text is always novel (NULL never equi-matches in SQL — the
    # history filter skipped NULLs too); probe over a coalesced copy so
    # the Arrow kernel never sees NULL positions, then mask the flag
    pos_safe = _bit_positions(F.coalesce(F.col(text_col), F.lit("")), n_bits, k)
    flagged = new_df.withColumn(
        "bloom_candidate",
        F.col(text_col).isNotNull() & _probe(F.array(*pos_safe)),
    )
    novel = flagged.filter(~F.col("bloom_candidate"))

    cand = flagged.filter(F.col("bloom_candidate")).withColumn(
        "__fp", F.md5(F.col(text_col))
    )
    hist_fp = history.select(F.md5(F.col(text_col)).alias("__fp"))
    if broadcast_candidates:
        cand_fps = cand.select("__fp").distinct()
        hits = hist_fp.join(F.broadcast(cand_fps), "__fp", "left_semi").distinct()
        survivors = cand.join(hits, "__fp", "left_anti").drop("__fp")
    else:
        # anti-join via left-outer + null filter: identical semantics in
        # batch, and (unlike left_anti) a supported stream-static shape —
        # so THIS function is also the streaming twin: call it on a
        # readStream frame with broadcast_candidates=False and the probe
        # stays a stateless projection, the verify a per-batch
        # stream-static join (no state store at all). Parity is
        # pytest-pinned in test_incremental.
        marked = hist_fp.distinct().withColumn("__hit", F.lit(1))
        survivors = (
            cand.join(marked, "__fp", "left_outer")
            .filter(F.col("__hit").isNull())
            .drop("__fp", "__hit")
        )
    return novel.unionByName(survivors)
