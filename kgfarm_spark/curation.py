"""End-to-end corpus curation: the runner that chains the individually
oracle-checked curation operators into the real user story —

    gopher_filter → exact dedup → MinHash-LSH near-dedup (quality-aware
    keep-best) → benchmark decontamination → LM scoring / selection
    (CCNet buckets or DSIR resampling) → sequence packing

— with a per-stage lineage manifest (stage name, params, surviving rows,
dropped rows, wall seconds), mirroring ``pipeline.run_auto_pipeline``
(the reference's §3.3 automation path; reference
operations/pipeline_generator.py:208-221 chains its stages the same
way, eagerly on pandas — here every stage is a lazy Spark plan with an
explicit materialization boundary).

Stage-boundary contract (where composition bugs live — VERDICT r05 #1):

- **Schema**: every stage consumes and produces ``(id_col, text_col)``
  plus whatever metadata columns ride along untouched. Verdict/score
  columns produced by a stage are JOINED on ``id_col`` and dropped
  after filtering — they never leak into the next stage's input.
- **Doc-id stability**: no stage rewrites ids; every stage filters the
  same id space, so cross-stage audits (which doc died where) are a
  join away. ``id_col`` must be unique (pack_sequences enforces its
  ordering contract on it).
- **Materialization scope**: each surviving corpus is
  ``localCheckpoint(eager=True)``-ed at the stage boundary, so (a) the
  manifest's row count pays each stage's cost exactly once, (b) no
  downstream stage re-executes the upstream chain (LSH would otherwise
  re-run inside the scorer's three passes), and (c) superseded blocks
  are freed by the context cleaner (the packing.py advisor lesson). On
  a real cluster the same boundary is where you would checkpoint to
  durable storage; the manifest records it per stage.

Scale: every stage is one of the engine's audited linear-shuffle plans
(see each operator's docstring); the chain adds NO extra shuffles — the
stage boundary is a narrow filter + checkpoint write.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgfarm_spark.operators.textstats import _words


def _checkpointed(df: DataFrame) -> DataFrame:
    return df.localCheckpoint(eager=True)


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_df: DataFrame | None = None,
    *,
    gopher: bool = True,
    gopher_kw: dict | None = None,
    exact: bool = True,
    neardup: str | None = "lsh",
    neardup_kw: dict | None = None,
    emb_col: str | None = None,
    decontaminate_kw: dict | None = None,
    scorer: str | None = "ccnet",
    keep_buckets: tuple[str, ...] = ("head", "middle"),
    dsir_target: Column | None = None,
    dsir_k: int | None = None,
    pack_budget: int = 2048,
    tokenizer: tuple | None = None,
    materialize: bool = False,
    pad_token=None,
    manifest_path: str | None = None,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> tuple[DataFrame, dict]:
    """Run the full curation chain over ``docs``; returns
    ``(packed_df, manifest)`` where ``packed_df`` is the
    ``pack_sequences`` layout of the surviving corpus (one row per doc:
    seq_id / offset / crosses_boundary) and ``manifest`` records every
    stage. Pass ``eval_df`` to decontaminate against a benchmark set.
    ``materialize=True`` returns ACTUAL budget-sized token sequences
    instead of the layout (``materialize_sequences``; one row per
    sequence, optional ``pad_token`` on the final short one) — with
    ``tokenizer=('bpe'|'unigram'|'wordpiece', model)`` those are real
    model tokens, i.e. training-ready shards.

    Stage toggles: ``gopher=False`` skips quality filtering;
    ``neardup`` is ``'lsh'`` (MinHash-LSH candidates, exact-Jaccard
    verify, quality-aware keep-best — the scale path), ``'jaccard'``
    (exact all-pairs-over-shingle-join — small corpora / audits),
    ``'semantic'`` (SemDeDup: IVF-cell-partitioned cosine pairs over
    ``emb_col`` — the embedding-space near-dup scale path; pass
    ``neardup_kw`` like ``{'threshold': 0.95, 'n_cells': 1024}``), or
    ``None``; ``scorer`` is ``'ccnet'`` (keep ``keep_buckets`` of the
    head/middle/tail split), ``'dsir'`` (Gumbel top-``dsir_k`` toward
    ``dsir_target``), or ``None``.

    ``checkpoint_dir``: when set, each stage's surviving corpus is
    written to ``<dir>/<stage>`` as parquet and re-read — the DURABLE
    stage boundary a real cluster uses (a failed stage restarts from the
    previous stage's files; the manifest records each path for audit).
    Default is ``localCheckpoint`` (executor-local blocks, session-
    scoped — right for tests and single-session runs).

    ``resume=True`` (needs ``checkpoint_dir``): completed stages are
    NOT recomputed — each stage directory carries a ``<stage>._meta.json``
    with a chain fingerprint (sha256 over the input schema, the column
    bindings, and every upstream stage's name + params); a stage is
    reused only when its fingerprint matches the current call AND its
    parquet write completed (``_SUCCESS``), so changing any upstream
    parameter invalidates that stage and everything after it. This is
    the restart path for a multi-hour corpus run: a crash in stage k
    re-reads stage k-1's files and recomputes only k onward. Trust
    model: the DATA is not re-hashed (that would cost a full scan per
    stage) — point ``checkpoint_dir`` at a fresh directory when the
    input corpus changes under the same schema. Resumed stage records
    carry ``"resumed": true`` and the read-back wall seconds.
    """
    from kgfarm_spark.operators.dedup import (
        decontaminate,
        dedup_keep_component_best,
        exact_dedup,
        jaccard_pairs,
        minhash_lsh_dedup_pairs,
    )
    from kgfarm_spark.operators.packing import pack_sequences
    from kgfarm_spark.operators.textstats import (
        ccnet_buckets,
        dsir_resample,
        fingerprint,
        gopher_filter,
    )

    # stage-internal working columns — a user column with one of these
    # names would be silently overwritten then dropped (house rule:
    # validate reserved names up front, r05 transforms lesson)
    # id_col/text_col get NO exemption: id_col='fingerprint' would be
    # overwritten by the dedup stage's content hash then dropped —
    # breaking the module's "no stage rewrites ids" contract (review
    # finding); same for text_col
    reserved = {"fingerprint", "__len", "n_tokens", "__tokens"} & (
        set(docs.columns) | {id_col, text_col}
    )
    if reserved:
        raise ValueError(
            f"column names {sorted(reserved)} collide with curate()'s "
            f"working columns; rename them first"
        )
    if tokenizer is not None and (
        not isinstance(tokenizer, tuple) or len(tokenizer) != 2
        or tokenizer[0] not in ("bpe", "unigram", "wordpiece")
    ):
        # fail fast — stage 6 is the LAST stage; a bad tokenizer arg
        # must not cost five stages of work first
        raise ValueError(
            "tokenizer must be ('bpe', segmented_census), "
            "('unigram', pieces_df), or ('wordpiece', vocab_df), "
            f"got {tokenizer!r}"
        )
    if neardup not in ("lsh", "jaccard", "semantic", None):
        raise ValueError(
            f"neardup must be 'lsh', 'jaccard', 'semantic', or None, got {neardup!r}"
        )
    if neardup == "semantic" and not emb_col:
        raise ValueError("neardup='semantic' needs emb_col (embedding column)")
    if neardup == "semantic" and emb_col not in docs.columns:
        raise ValueError(f"emb_col {emb_col!r} not in input columns")
    if scorer not in ("ccnet", "dsir", None):
        raise ValueError(f"scorer must be 'ccnet', 'dsir', or None, got {scorer!r}")
    if scorer == "dsir" and (dsir_target is None or dsir_k is None):
        raise ValueError("scorer='dsir' needs dsir_target (Column) and dsir_k (int)")
    if resume and checkpoint_dir is None:
        raise ValueError("resume=True needs checkpoint_dir (durable stage files)")

    # chain fingerprint: input schema + column bindings, then folded
    # per-stage over (stage name, params) — any upstream change flips
    # every downstream stage's fingerprint, so resume can never splice
    # a stale tail onto a new head
    chain_fp = hashlib.sha256(
        repr((id_col, text_col, docs.schema.simpleString(),
              None if eval_df is None else eval_df.schema.simpleString())).encode()
    ).hexdigest()

    def _fold_fp(stage: str, params: dict, fp_extra: str = "") -> str:
        nonlocal chain_fp
        chain_fp = hashlib.sha256(
            (chain_fp + stage + repr(sorted(params.items())) + fp_extra).encode()
        ).hexdigest()
        return chain_fp

    def _meta_path(stage: str) -> str:
        return f"{checkpoint_dir.rstrip('/')}/{stage}._meta.json"

    def _materialize_stage(df2: DataFrame, stage: str) -> tuple[DataFrame, dict]:
        if checkpoint_dir is None:
            return _checkpointed(df2), {}
        path = f"{checkpoint_dir.rstrip('/')}/{stage}"
        df2.write.mode("overwrite").parquet(path)
        return df2.sparkSession.read.parquet(path), {"checkpoint": path}

    def _write_meta(stage: str, rows: int) -> None:
        if checkpoint_dir is None:
            return
        with open(_meta_path(stage), "w") as f:
            json.dump({"fp": chain_fp, "rows": rows}, f)

    stages: list[dict] = []
    t_begin = time.monotonic()

    def stage_done(name: str, params: dict, fp_extra: str = "") -> bool:
        """Advance the fingerprint chain for `name`; when resuming and
        the stage's durable files are complete under the SAME
        fingerprint, read them back in place of recomputing and report
        whether the caller may skip the build. `fp_extra` carries
        fingerprint-relevant inputs (kw dicts, column exprs) that would
        clutter the manifest record."""
        nonlocal cur, n_cur
        fp = _fold_fp(name, params, fp_extra)
        if not resume:
            return False
        path = f"{checkpoint_dir.rstrip('/')}/{name}"
        try:
            with open(_meta_path(name)) as f:
                meta = json.load(f)
        except (OSError, ValueError):
            return False
        if meta.get("fp") != fp or not os.path.exists(
            os.path.join(path, "_SUCCESS")
        ):
            return False
        t0 = time.monotonic()
        nxt = docs.sparkSession.read.parquet(path)
        prev = n_cur
        cur, n_cur = nxt, int(meta["rows"])
        stages.append(
            {
                "stage": name,
                "rows": n_cur,
                "dropped": (prev - n_cur) if prev is not None else 0,
                "sec": round(time.monotonic() - t0, 3),
                "resumed": True,
                **params,
                "checkpoint": path,
            }
        )
        return True

    n_cur: int | None = None
    if not stage_done("input", {}):
        cur, extra0 = _materialize_stage(docs, "input")
        n_cur = cur.count()
        _write_meta("input", n_cur)
        stages.append(
            {"stage": "input", "rows": n_cur, "dropped": 0, "sec": 0.0, **extra0}
        )

    def advance(name: str, nxt: DataFrame, t_start: float | None = None, **params) -> DataFrame:
        # t_start lets a stage include its BUILD cost: several operators
        # run eager driver actions at construction time (components
        # iterations in keep-best, the exact-rank fits in ccnet_buckets,
        # the offsets collect in pack) — timing only the materialize
        # under-attributed those stages by minutes at 5M docs
        nonlocal cur, n_cur
        t0 = time.monotonic() if t_start is None else t_start
        nxt, extra = _materialize_stage(nxt, name)
        n = nxt.count()
        _write_meta(name, n)
        stages.append(
            {
                "stage": name,
                "rows": n,
                "dropped": n_cur - n,
                "sec": round(time.monotonic() - t0, 3),
                **params,
                **extra,
            }
        )
        cur, n_cur = nxt, n
        return nxt

    # 1. Gopher quality filter (Rae et al. 2021 Table A1, full set)
    if gopher:
        params = {"rules": "quality_gate+line_rules+repetition"}
        if not stage_done("gopher_filter", params,
                          fp_extra=repr(sorted((gopher_kw or {}).items()))):
            t0 = time.monotonic()
            verdict = gopher_filter(cur, id_col, text_col, **(gopher_kw or {}))
            advance(
                "gopher_filter",
                cur.join(verdict.filter(F.col("keep")).select(id_col), id_col),
                t_start=t0,
                **params,
            )

    # 2. Exact dedup on the normalized content fingerprint (md5 of
    # lowercased, punctuation-stripped, whitespace-collapsed text) —
    # keeps the smallest id per group, deterministic
    if exact:
        params = {"key": "md5(normalized text)"}
        if not stage_done("exact_dedup", params):
            t0 = time.monotonic()
            fp = fingerprint(cur, text_col)
            advance(
                "exact_dedup",
                exact_dedup(fp, on=["fingerprint"], order_col=id_col).drop(
                    "fingerprint"
                ),
                t_start=t0,
                **params,
            )

    # 3. Near-dedup: pair discovery + connected components + quality-
    # aware resolution (keep the LONGEST doc per cluster; ties -> larger
    # id). LSH is the scale path (linear in docs x bands); 'jaccard' is
    # the exact all-pairs variant for small corpora.
    if neardup:
        if neardup == "semantic":
            kw = {"threshold": 0.95, **(neardup_kw or {})}
        elif neardup == "lsh":
            # curate() is corpus-scale by contract → verify-side
            # candidate pushdown on by default here (measured at 5M
            # docs: 181 → 140 s; it only loses on sub-second corpora,
            # where curate() is the wrong entry point anyway)
            kw = {"n": 3, "threshold": 0.7, "verify_pushdown": True,
                  **(neardup_kw or {})}
        else:
            kw = {"n": 3, "threshold": 0.7, **(neardup_kw or {})}
        params = {k: str(v) for k, v in kw.items()}
        if not stage_done("neardup_" + neardup, params, fp_extra=repr(emb_col)):
            t0 = time.monotonic()
            if neardup == "semantic":
                from kgfarm_spark.operators.dedup import semantic_neardup_pairs

                pairs = semantic_neardup_pairs(cur, id_col, emb_col, **kw)
            else:
                pair_fn = (
                    minhash_lsh_dedup_pairs if neardup == "lsh" else jaccard_pairs
                )
                pairs = pair_fn(cur, id_col, text_col, **kw)
            scored = cur.withColumn(
                "__len", F.length(F.coalesce(F.col(text_col), F.lit("")))
            )
            kept = dedup_keep_component_best(scored, pairs, id_col, "__len").drop(
                "__len"
            )
            advance("neardup_" + neardup, kept, t_start=t0, **params)

    # 4. Benchmark decontamination (GPT-3 appendix C): drop training
    # docs sharing n-grams with the eval set
    if eval_df is not None:
        kw = {"n": 13, "min_overlap": 1, **(decontaminate_kw or {})}
        if not stage_done("decontaminate", dict(kw)):
            t0 = time.monotonic()
            dirty = decontaminate(cur, eval_df, id_col, text_col, **kw)
            advance(
                "decontaminate",
                cur.join(dirty.select(id_col), id_col, "left_anti"),
                t_start=t0,
                **kw,
            )

    # 5. LM scoring / selection
    if scorer == "ccnet":
        params = {"keep_buckets": list(keep_buckets)}
        if not stage_done("ccnet_select", params):
            t0 = time.monotonic()
            buckets = ccnet_buckets(cur, id_col, text_col)
            keep = buckets.filter(F.col("bucket").isin(*keep_buckets)).select(id_col)
            advance("ccnet_select", cur.join(keep, id_col), t_start=t0, **params)
    elif scorer == "dsir":
        # str(Column) renders the target expression tree — enough to
        # invalidate resume when the caller changes the DSIR target
        if not stage_done("dsir_select", {"k": dsir_k}, fp_extra=str(dsir_target)):
            t0 = time.monotonic()
            chosen = dsir_resample(cur, dsir_target, dsir_k, id_col, text_col)
            advance("dsir_select", cur.join(chosen.select(id_col), id_col),
                    t_start=t0, k=dsir_k)

    # 6. Tokenize (the house _words tokenizer — empty tokens dropped)
    # and pack into fixed-budget training sequences. t0 BEFORE the
    # builder: pack_sequences runs its expensive driver actions at
    # construction time (percentile boundaries, the eager checkpoint of
    # the tokenized corpus, the per-bucket offsets collect) — timing
    # only the final agg under-attributed this stage (review finding)
    t0 = time.monotonic()
    if tokenizer is not None:
        # pack by REAL model tokens (a budget of 2048 means 2048
        # tokenizer tokens, not whitespace words): both apply paths are
        # broadcast-model Arrow kernels, zero shuffle, so this swap
        # changes the counting column, not the plan shape
        kind, model = tokenizer
        if kind == "bpe":
            from kgfarm_spark.operators.bpe import bpe_apply

            tok_df = bpe_apply(cur, model, text_col, id_col, out_col="__tokens")
        elif kind == "wordpiece":
            from kgfarm_spark.operators.wordpiece import wordpiece_apply

            tok_df = wordpiece_apply(
                cur, model, text_col, id_col, out_col="__tokens"
            )
        else:
            from kgfarm_spark.operators.unigram import unigram_apply

            # Viterbi window derived from the model — a fixed default
            # smaller than the longest trained piece would silently
            # never emit it
            ml = model.agg(F.max(F.length("piece"))).first()[0] or 1
            tok_df = unigram_apply(
                cur, model, text_col, id_col, out_col="__tokens",
                max_piece_len=int(ml),
            )
        toks = tok_df.select(id_col, F.size("__tokens").alias("n_tokens"))
    else:
        tok_df = cur.select(
            id_col, text_col,
            _words(F.coalesce(F.col(text_col), F.lit(""))).alias("__tokens"),
        )
        toks = tok_df.select(id_col, F.size("__tokens").alias("n_tokens"))
    if materialize:
        # skip the separate layout pass: materialize_sequences runs
        # pack_sequences internally over the same counts
        from kgfarm_spark.operators.packing import materialize_sequences

        packed = materialize_sequences(
            tok_df.select(id_col, F.col("__tokens").alias("tokens")),
            id_col, "tokens", budget=pack_budget, pad_token=pad_token,
        )
    else:
        packed = pack_sequences(toks, id_col, "n_tokens", budget=pack_budget)
    total_tokens = packed.agg(
        F.sum("n_tokens").alias("t"), F.count(F.lit(1)).alias("n")
    ).first()
    n_tok = int(total_tokens["t"] or 0)
    stages.append(
        {
            "stage": "pack_sequences",
            "rows": total_tokens["n"],
            "dropped": 0,
            "sec": round(time.monotonic() - t0, 3),
            "budget": pack_budget,
            "tokenizer": tokenizer[0] if tokenizer else "whitespace",
            # materialized: "rows" counts SEQUENCES (one row each);
            # layout mode counts documents
            "materialized": materialize,
            "total_tokens": n_tok,
            # ceil(total/budget): seq ids are 0..(t-1)//budget, so an
            # exactly-divisible total must NOT add a phantom sequence
            "n_sequences": (n_tok + pack_budget - 1) // pack_budget,
        }
    )

    manifest = {
        "stages": stages,
        "wall_sec": round(time.monotonic() - t_begin, 3),
        "input_rows": stages[0]["rows"],
        "surviving_rows": n_cur,
        "survival_rate": round(n_cur / max(stages[0]["rows"], 1), 6),
    }
    if manifest_path:
        with open(manifest_path, "w") as f:
            json.dump(manifest, f, indent=1, default=str)
    return packed, manifest
