"""Online (ingest-time) corpus curation: fit corpus-level artifacts
OFFLINE on a reference corpus, freeze them into a small serializable
model, and apply them STATELESS on an unbounded ingest stream.

Why this split exists: the batch ``curation.curate`` chain contains two
corpus-coupled stages — the CCNet bucket split (needs the corpus score
DISTRIBUTION to place the head/middle/tail cuts) and the unigram LM
(needs the corpus word census). Neither can run on an unbounded stream
as written: the distribution and the census only exist after seeing all
the data. Production ingest pipelines (the CCNet recipe itself: Wenzek
et al. 2020 train the KenLM + fit the perplexity terciles on a
reference snapshot, then score each new shard against the FROZEN model)
resolve this by fit-then-freeze — exactly the engine's M16/M17
fit-on-train / apply-frozen discipline (transforms.py), applied to the
curation family.

The frozen model makes every apply-side operation a per-row projection:

- the vocabulary lookup is a broadcast dict keyed by the SAME JVM
  ``xxhash64`` used at fit time (hashing stays JVM-side at apply —
  Python never re-tokenizes, so fit/apply tokenization can never
  drift);
- the CCNet bucket is a comparison against two frozen score thresholds
  (the minimum rounded score of the fitted head / middle buckets —
  ``percent_rank`` is monotone in score, so threshold-compare
  reproduces the fitted rank-bucket labels EXACTLY, ties included);
- the Gopher repetition caps are per-document counts, computed inside
  the same Arrow batch as the score lookup.

The result: ``curate_stream`` runs the full gate → dedup → score →
select chain with ONE state store (``dropDuplicatesWithinWatermark`` on
the content fingerprint, state bounded by the watermark horizon) and
zero shuffles — the shape that survives 10^12-row streams on a
1000-executor cluster, where any corpus-wide reaggregation per
micro-batch would be the bottleneck.

Reference parity: this is the streaming twin of the reference's batch
curation semantics (see curation.py's stage docstrings for the per-stage
citations); the reference has no streaming path — the contract here is
exact agreement with the engine's own batch operators, pinned by
tests/test_online_curation.py (score == unigram_logprob, buckets ==
ccnet_buckets, repetition == repetition_signals, stream == batch twin).
"""

from __future__ import annotations

import json
import math
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kgfarm_spark.operators.textstats import _words

#: apply-side working columns (reserved-name house rule, curation.py)
_WORK_COLS = ("__toks", "__hashes", "__score")


@dataclass(frozen=True)
class CurationModel:
    """Frozen curation artifacts: unigram LM vocabulary (word-hash →
    natural-log probability), the OOV floor, and the CCNet bucket score
    thresholds fitted on the reference corpus. Plain data — JSON
    round-trips for shipping to another session/cluster."""

    vocab: dict[int, float]
    n_total: int
    oov_logprob: float
    thr_head: float
    thr_middle: float
    cuts: tuple[float, float]
    max_vocab: int | None
    #: optional frozen DSIR importance table: xxhash64(word) → per-token
    #: log importance ratio ln p_target(w) − ln p_raw(w) (Xie et al.
    #: 2023), add-alpha smoothed over the fitted vocabulary; words
    #: unseen at fit time contribute `dsir_oov` (the zero-count ratio)
    dsir_lambda: dict[int, float] | None = None
    dsir_oov: float = 0.0
    dsir_alpha: float | None = None

    def to_json(self) -> str:
        d = {
            # JSON objects key on strings; keep hashes as int-strings
            "vocab": {str(k): v for k, v in self.vocab.items()},
            "n_total": self.n_total,
            "oov_logprob": self.oov_logprob,
            "thr_head": self.thr_head,
            "thr_middle": self.thr_middle,
            "cuts": list(self.cuts),
            "max_vocab": self.max_vocab,
            "dsir_lambda": None
            if self.dsir_lambda is None
            else {str(k): v for k, v in self.dsir_lambda.items()},
            "dsir_oov": self.dsir_oov,
            "dsir_alpha": self.dsir_alpha,
        }
        return json.dumps(d)

    @staticmethod
    def from_json(s: str) -> "CurationModel":
        d = json.loads(s)
        return CurationModel(
            vocab={int(k): float(v) for k, v in d["vocab"].items()},
            n_total=int(d["n_total"]),
            oov_logprob=float(d["oov_logprob"]),
            thr_head=float(d["thr_head"]),
            thr_middle=float(d["thr_middle"]),
            cuts=tuple(d["cuts"]),
            max_vocab=d["max_vocab"],
            dsir_lambda=None
            if d.get("dsir_lambda") is None
            else {int(k): float(v) for k, v in d["dsir_lambda"].items()},
            dsir_oov=float(d.get("dsir_oov", 0.0)),
            dsir_alpha=d.get("dsir_alpha"),
        )


def fit_curation_model(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    cuts: tuple[float, float] = (0.333333, 0.666667),
    max_vocab: int | None = 1_000_000,
    dsir_target: Column | None = None,
    dsir_alpha: float = 0.5,
) -> CurationModel:
    """Fit the frozen curation model on a reference corpus snapshot.

    Census: one explode → groupBy(xxhash64(word)) count (the
    unigram_logprob shape); with ``max_vocab`` set, only the top-V words
    by count (ties → smaller hash, deterministic) are kept in the
    shipped vocabulary — V rows cross the driver, never the corpus.
    Words outside the vocabulary score at the OOV floor
    ``ln(1 / (n_total + 1))`` (below every real word's probability).

    Thresholds: the corpus is bucketed by the engine's own
    ``ccnet_buckets`` (exact distributed percent_rank) and the MINIMUM
    rounded ``mean_logprob`` of the head and middle buckets is frozen.
    percent_rank is monotone and ties share a rank, so
    ``score >= threshold`` reproduces the fitted labels exactly.
    ``max_vocab=None`` keeps the full census — then apply-side scores on
    the fitted corpus equal ``unigram_logprob`` to the last bit (the
    parity test); a capped vocabulary trades exactness on the TAIL of
    the distribution for a bounded model size (the production setting:
    1M entries ≈ 18 MB shipped once per executor).

    ``dsir_target`` (optional boolean Column over the fit corpus, e.g. a
    quality verdict): additionally freezes the DSIR importance table —
    per-word log ratio ln p_target − ln p_raw with add-``dsir_alpha``
    smoothing over the fitted vocabulary (dsir_importance's exact
    statistic, JVM-computed) — so ingest-time scoring emits
    ``dsir_logweight`` without a corpus pass. Words unseen at fit time
    contribute the zero-count ratio ``ln((n_raw+αV)/(n_target+αV))``.
    """
    from kgfarm_spark.operators.textstats import ccnet_buckets

    if not (0.0 < cuts[0] < cuts[1] < 1.0):
        raise ValueError(f"cuts must be ascending in (0, 1), got {cuts}")
    if max_vocab is not None and max_vocab < 1:
        raise ValueError(f"max_vocab must be >= 1 or None, got {max_vocab}")
    if not dsir_alpha > 0:
        raise ValueError(f"dsir_alpha must be > 0, got {dsir_alpha}")

    tgt = (
        dsir_target.cast("int")
        if dsir_target is not None
        else F.lit(0)
    )
    census = (
        df.select(
            tgt.alias("__tgt"),
            F.explode(_words(F.coalesce(F.col(text_col), F.lit("")))).alias("__w"),
        )
        .select("__tgt", F.xxhash64("__w").alias("__h"))
        .groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__cnt"), F.sum("__tgt").alias("__ct"))
    )
    census = census.localCheckpoint(eager=True)  # census pass paid once
    totals = census.agg(
        F.sum("__cnt").alias("__n"),
        F.sum("__ct").alias("__nt"),
        F.count(F.lit(1)).alias("__v"),
    ).first()
    n_total = totals["__n"] or 0
    kept = census
    if max_vocab is not None:
        kept = census.orderBy(F.desc("__cnt"), F.asc("__h")).limit(max_vocab)
    # logs computed JVM-side — bit-identical to unigram_logprob's
    # F.log(cnt/n) and dsir_importance's smoothed ratio, so apply-side
    # sums can never drift from the batch operators by a libm-vs-JVM ulp
    a, v = float(dsir_alpha), totals["__v"] or 0
    nt = totals["__nt"] or 0
    lam = F.log(
        (F.col("__ct") + F.lit(a)) / F.lit(float(nt) + a * v)
    ) - F.log(
        (F.col("__cnt") + F.lit(a)) / F.lit(float(n_total) + a * v)
    )
    rows = kept.select(
        "__h",
        F.log(F.col("__cnt") / F.lit(float(n_total))).alias("__lp"),
        lam.alias("__lam"),
    ).collect()
    vocab = {r["__h"]: r["__lp"] for r in rows}
    dsir_lambda = (
        {r["__h"]: r["__lam"] for r in rows} if dsir_target is not None else None
    )
    dsir_oov = (
        math.log((n_total + a * v) / (nt + a * v))
        if dsir_target is not None and n_total
        else 0.0
    )

    buckets = ccnet_buckets(df, id_col, text_col, cuts=cuts)
    mins = {
        r["bucket"]: r["m"]
        for r in buckets.filter(F.col("n_words") > 0)
        .groupBy("bucket")
        .agg(F.min("mean_logprob").alias("m"))
        .collect()
    }
    # an empty fitted bucket freezes an unreachable threshold: +inf for
    # head means "nothing scores head", matching the fitted labeling
    return CurationModel(
        vocab=vocab,
        n_total=int(n_total),
        oov_logprob=math.log(1.0 / (n_total + 1)) if n_total else 0.0,
        thr_head=float(mins.get("head", math.inf)),
        thr_middle=float(mins.get("middle", math.inf)),
        cuts=cuts,
        max_vocab=max_vocab,
        dsir_lambda=dsir_lambda,
        dsir_oov=dsir_oov,
        dsir_alpha=dsir_alpha if dsir_target is not None else None,
    )


def _score_udf(spark, model: CurationModel):
    """Arrow-batched scorer: token hashes (JVM xxhash64) + token strings
    in, per-doc (logprob_sum, top_bigram_frac, dsir_sum) out. The model
    tables ship once per executor as a SparkContext broadcast; inside
    the batch the lookups are vectorized pandas ``map``s over the
    concatenated hash runs — no per-word Python."""
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(
        (model.vocab, model.oov_logprob, model.dsir_lambda, model.dsir_oov)
    )

    @pandas_udf(
        "struct<logprob_sum:double, top_bigram_frac:double, dsir_sum:double>"
    )
    def score(hashes: pd.Series, toks: pd.Series) -> pd.DataFrame:
        vocab, oov, dlam, doov = bc.value
        lens = np.fromiter((len(h) for h in hashes), dtype=np.int64, count=len(hashes))
        dsums = np.zeros(len(hashes))
        if lens.sum():
            flat = np.concatenate([np.asarray(h, dtype=np.int64) for h in hashes])
            lp = pd.Series(flat).map(vocab).fillna(oov).to_numpy()
            # segment sums: exclusive prefix boundaries over the flat run
            bounds = np.zeros(len(hashes) + 1, dtype=np.int64)
            np.cumsum(lens, out=bounds[1:])
            csum = np.concatenate(([0.0], np.cumsum(lp)))
            sums = csum[bounds[1:]] - csum[bounds[:-1]]
            if dlam is not None:
                dl = pd.Series(flat).map(dlam).fillna(doov).to_numpy()
                dcs = np.concatenate(([0.0], np.cumsum(dl)))
                dsums = dcs[bounds[1:]] - dcs[bounds[:-1]]
        else:
            sums = np.zeros(len(hashes))
        # Gopher top-bigram fraction: exact integer counts per doc —
        # identical to repetition_signals' groupBy census by construction
        # (same _words tokens, same bigram pairs)
        from collections import Counter

        def top_bg(t):
            if t is None or len(t) < 2:
                return 0.0
            c = Counter(zip(t, t[1:]))
            return max(c.values()) / (len(t) - 1)

        tbf = np.fromiter((top_bg(t) for t in toks), dtype=np.float64, count=len(toks))
        return pd.DataFrame(
            {"logprob_sum": sums, "top_bigram_frac": tbf, "dsir_sum": dsums}
        )

    return score


def score_with_model(
    df: DataFrame,
    model: CurationModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score documents against the frozen model — a stateless per-row
    projection that runs identically on a batch frame and a readStream
    frame (zero state, zero shuffle; the streaming fast path).

    Appends ``n_words``, ``logprob_sum``, ``mean_logprob`` (both rounded
    to 6, the unigram_logprob contract) and the frozen-threshold
    ``bucket`` label; when the model carries a DSIR table (fit with
    ``dsir_target``), also ``dsir_logweight``. With ``max_vocab=None``
    at fit time, output on the fitted corpus equals ``unigram_logprob``
    + ``ccnet_buckets`` + ``dsir_importance`` exactly (pinned by
    tests)."""
    out_cols = {"n_words", "logprob_sum", "mean_logprob", "top_bigram_frac",
                "bucket"}
    if model.dsir_lambda is not None:
        out_cols.add("dsir_logweight")
    clash = (set(_WORK_COLS) | out_cols) & set(df.columns)
    if clash:
        # withColumn would silently REPLACE same-named input columns,
        # breaking the "all input columns +" contract (house rule:
        # validate reserved names up front, curation.py:133)
        raise ValueError(
            f"column names {sorted(clash)} collide with score_with_model's "
            f"working/output columns; rename them first"
        )
    spark = df.sparkSession
    toks = _words(F.coalesce(F.col(text_col), F.lit("")))
    prep = df.withColumn("__toks", toks).withColumn(
        "__hashes", F.transform(F.col("__toks"), lambda w: F.xxhash64(w))
    )
    scored = prep.withColumn(
        "__score", _score_udf(spark, model)("__hashes", "__toks")
    )
    n_words = F.size("__toks")
    lp_sum = F.col("__score.logprob_sum")
    out = (
        scored.withColumn("n_words", n_words)
        .withColumn("logprob_sum", F.round(lp_sum, 6))
        .withColumn(
            "mean_logprob",
            F.round(
                F.when(n_words > 0, lp_sum / n_words).otherwise(0.0), 6
            ),
        )
        .withColumn("top_bigram_frac", F.round("__score.top_bigram_frac", 6))
        .withColumn(
            "bucket",
            F.when(F.col("n_words") == 0, "tail")
            .when(F.col("mean_logprob") >= model.thr_head, "head")
            .when(F.col("mean_logprob") >= model.thr_middle, "middle")
            .otherwise("tail"),
        )
    )
    if model.dsir_lambda is not None:
        out = out.withColumn("dsir_logweight", F.round("__score.dsir_sum", 6))
    return out.drop(*_WORK_COLS)


def curate_stream(
    stream: DataFrame,
    model: CurationModel,
    id_col: str = "doc_id",
    text_col: str = "text",
    event_ts: str = "ts",
    watermark: str | None = "1 hour",
    keep_buckets: tuple[str, ...] = ("head", "middle"),
    gate_kw: dict | None = None,
    line_kw: dict | None = None,
    max_dup_line_frac: float = 0.30,
    max_top_bigram_frac: float = 0.20,
) -> DataFrame:
    """The full ingest-time curation chain on a streaming frame:

        Gopher gate (stateless) → content-fingerprint dedup (ONE state
        store, bounded by ``watermark``) → frozen-model LM score →
        CCNet bucket select

    — the streaming twin of ``curation.curate``'s gopher/exact/ccnet
    stages. Near-dedup (MinHash-LSH) is deliberately absent: candidate
    generation needs corpus-wide band buckets, which is a periodic BATCH
    compaction job over the curated sink in this architecture, not a
    per-event operation. Returns the curated streaming DataFrame (all
    input columns + ``n_words``/``mean_logprob``/``bucket``) ready for
    ``writeStream``; also works verbatim on a batch frame — the dedup
    then runs all-time (``watermark`` only applies to streams; Spark
    rejects the watermark variant on batch) — which is what the
    stream-vs-batch parity tests compare against.

    State story at 10^12 rows: every stage except the dedup is a per-row
    projection; the dedup keys on the 16-byte md5 fingerprint with
    ``dropDuplicatesWithinWatermark``, so state is O(events inside the
    watermark horizon), not O(corpus).
    """
    from kgfarm_spark.operators.textstats import (
        fingerprint,
        gopher_line_rules,
        quality_gate,
    )
    from kgfarm_spark.streaming.stream import stream_exact_dedup

    pre_cols = list(stream.columns)
    # the gate/line/fingerprint stages withColumn their flag outputs,
    # which would silently REPLACE same-named input columns — and the
    # mid-chain select(*pre_cols) would then propagate the clobbered
    # values downstream (house rule: validate reserved names up front,
    # curation.py:133; score_with_model guards its own output names)
    reserved = {
        "keep", "fingerprint",
        # quality_gate flags
        "words_ok", "word_len_ok", "punct_ok", "digit_ok", "stopword_ok",
        # gopher_line_rules flags
        "hash_word_ratio", "ellipsis_word_ratio", "bullet_line_frac",
        "ellipsis_line_frac", "alpha_word_frac", "hash_ok", "ellipsis_ok",
        "bullet_ok", "ellipsis_line_ok", "alpha_ok",
    } & set(pre_cols)
    if reserved:
        raise ValueError(
            f"column names {sorted(reserved)} collide with curate_stream's "
            f"stage output columns; rename them first"
        )
    # 1. stateless Gopher verdicts, one chained codegen projection
    gated = quality_gate(
        stream, id_col, text_col, append=True, **(gate_kw or {})
    ).filter(F.col("keep"))
    gated = gopher_line_rules(
        gated.select(*pre_cols), id_col, text_col, append=True, **(line_kw or {})
    ).filter(F.col("keep"))
    # dup-line fraction is a per-row array expression (the
    # repetition_signals formula verbatim; its docstring notes the line
    # half never needed the shuffle)
    from kgfarm_spark.operators.textstats import _clean_lines

    lines = _clean_lines(F.coalesce(F.col(text_col), F.lit("")))
    dup_line_frac = F.round(
        F.when(
            F.size(lines) > 0,
            1.0 - F.size(F.array_distinct(lines)) / F.size(lines),
        ).otherwise(0.0),
        6,
    )
    gated = gated.select(*pre_cols).filter(dup_line_frac <= max_dup_line_frac)

    # 2. exact dedup on the normalized content fingerprint — the chain's
    # only stateful operator. On a BATCH frame the watermark variant is
    # unsupported by Spark (dropDuplicatesWithinWatermark raises on
    # batch) and meaningless — route to the all-time dedup so the same
    # call runs verbatim on both (the parity tests' batch twin)
    wm = watermark if stream.isStreaming else None
    deduped = stream_exact_dedup(
        fingerprint(gated, text_col), ["fingerprint"], event_ts, wm
    ).drop("fingerprint")

    # 3. frozen-model scoring + the top-bigram repetition cap (computed
    # in the same Arrow batch) + CCNet bucket select
    scored = score_with_model(deduped, model, id_col, text_col)
    return (
        scored.filter(F.col("top_bigram_frac") <= max_top_bigram_frac)
        .filter(F.col("bucket").isin(*keep_buckets))
        .drop("top_bigram_frac", "logprob_sum")
    )


def compact_curated_sink(
    spark,
    sink_path: str,
    out_path: str | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    neardup_kw: dict | None = None,
) -> tuple[DataFrame, dict]:
    """The periodic BATCH compaction leg of the streaming architecture:
    MinHash-LSH near-dedup over a ``curate_stream`` parquet sink.

    ``curate_stream`` deliberately omits near-dedup — candidate
    generation needs corpus-wide band buckets, which no per-event
    operator can provide. The production shape is ingest-curate →
    append to a sink → compact the sink on a schedule; this runs the
    batch engine's LSH pair discovery + quality-aware keep-best (longer
    text wins, the ``curate()`` rule) over the accumulated sink and
    returns ``(kept_df, stats)``. With ``out_path`` the compacted
    corpus is written there (never in place — the stream keeps
    appending to ``sink_path`` while the compactor runs; swap paths
    downstream), and ``stats`` records rows in/out and the write path.

    Scale: identical plan to ``curate()``'s neardup stage — LSH bands
    linear in docs, components in O(cluster diameter) rounds; nothing
    here is sink-size quadratic."""
    from kgfarm_spark.operators.dedup import (
        dedup_keep_component_best,
        minhash_lsh_dedup_pairs,
    )

    docs = spark.read.parquet(sink_path)
    if "__len" in docs.columns:
        raise ValueError("column name __len collides with the compactor's "
                         "working column; rename it first")
    # accumulated-sink compaction is corpus-scale by contract → verify
    # pushdown on by default (see minhash_lsh_dedup_pairs; 5M-doc
    # measurement in OPTIMIZATION_r07.md)
    kw = {"n": 3, "threshold": 0.7, "verify_pushdown": True,
          **(neardup_kw or {})}
    t0 = time.monotonic()
    n_in = docs.count()
    pairs = minhash_lsh_dedup_pairs(docs, id_col, text_col, **kw)
    scored = docs.withColumn(
        "__len", F.length(F.coalesce(F.col(text_col), F.lit("")))
    )
    kept = dedup_keep_component_best(scored, pairs, id_col, "__len").drop("__len")
    stats: dict = {"rows_in": n_in, **{k: str(v) for k, v in kw.items()}}
    if out_path:
        kept.write.mode("overwrite").parquet(out_path)
        kept = spark.read.parquet(out_path)
        stats["out_path"] = out_path
    n_out = kept.count()
    stats.update(
        rows_out=n_out,
        dropped=n_in - n_out,
        sec=round(time.monotonic() - t0, 3),
    )
    return kept, stats


def bucket_drift(scored: DataFrame, model: CurationModel) -> DataFrame:
    """Shard-drift monitor for the frozen model: observed bucket rates
    on a scored shard vs the rates the fitted cuts imply (head =
    1 − cuts[1], middle = cuts[1] − cuts[0], tail = cuts[0] — exact on
    the fit corpus by percent_rank's construction). A shard whose
    distribution shifted away from the reference snapshot shows
    ``drift`` far from 0 (e.g. a new source scoring mostly ``tail``
    means the frozen census no longer describes the ingest — time to
    refit). One |buckets|-row aggregate over an already-scored frame.
    Feed it ``score_with_model`` output BEFORE any bucket select (a
    curated sink is filtered to keep_buckets, so its rates renormalize
    over the kept buckets and the drift reads falsely high).

    Returns ``(bucket, n, rate, expected_rate, drift)`` with
    ``drift = rate − expected_rate``, rounded to 6.
    """
    lo, hi = model.cuts
    expected = {"head": 1.0 - hi, "middle": hi - lo, "tail": lo}
    exp_map = F.create_map(
        *[F.lit(x) for kv in expected.items() for x in kv]
    )
    # |buckets| <= 3 rows: the unpartitioned window is fine at any scale
    total = F.sum("n").over(Window.partitionBy())
    return (
        scored.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rate", F.round(F.col("n") / total, 6))
        .withColumn("expected_rate", F.round(exp_map[F.col("bucket")], 6))
        .withColumn(
            "drift", F.round(F.col("rate") - exp_map[F.col("bucket")], 6)
        )
    )
