"""Conversation-level curation over the transcript table.

The corpus-curation family (``operators/dedup.py``, ``textstats.py``,
``packing.py``) treats a *document* as its unit. Chat / agent training
data is different: the unit is a multi-turn **conversation** spread over
rows of the input_hint table ``(conv_id, turn_idx, role, text, tool,
ts)``. This module supplies the conversation-native layer a lab curating
transcript data needs before the document machinery applies:

- ``conv_integrity``   — per-conversation validation flags (contiguous
  turn indices, monotone timestamps, role alternation, empty-text
  fraction) so malformed conversations are dropped *before* they are
  rendered into training text;
- ``render_chat``      — deterministic chat-template rendering: one
  training string per conversation, ``<|role|>text`` lines joined in
  turn order (the KGFarm reference flattens entity histories the same
  way before featurization, feature_discovery/src: profile text concat);
- ``dedup_conversations`` — conversation-level exact dedup on the
  rendered string's md5 fingerprint (min-conv_id winner election, the
  same rule as ``exact_dedup``);
- ``curate_conversations`` — the end-to-end adapter: integrity filter →
  render → exact dedup → (optional) MinHash-LSH near-dup with
  keep-longest resolution → sequence packing, each stage counted in a
  manifest.

Scale shape (10^12-turn table, 10^9 conversations): every op here is a
single shuffle keyed on ``conv_id`` — the SAME partitioning the as-of /
window family uses, so Catalyst reuses the exchange when stages chain.
``render_chat`` uses collect_list per conversation, bounded by
conversation length (the reference's per-entity assumption; a
pathological multi-million-turn conversation should be length-capped
with ``max_turns`` — enforced, not assumed). Dedup shuffles on a 32-hex
md5 fingerprint — uniformly distributed by construction, no skew.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def conv_integrity(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-conversation structural validation flags.

    Returns one row per conversation:
      (conv_id, n_turns, is_contiguous, ts_monotone, first_role,
       n_roles, role_alternation_frac, empty_text_frac, has_tool,
       duration_sec, integrity_ok)

    - ``is_contiguous``: turn_idx runs 0..n-1 with no gaps/dupes
      (min=0, max=n-1, n distinct = n);
    - ``ts_monotone``: ts is non-decreasing in turn order;
    - ``role_alternation_frac``: fraction of adjacent turn pairs whose
      roles differ (1.0 = strictly alternating; low values flag
      degenerate single-speaker logs);
    - ``empty_text_frac``: fraction of turns with NULL/empty text;
    - ``integrity_ok``: contiguous AND monotone AND some non-empty text.

    One lag window + one groupBy, both keyed on ``conv_col`` — a single
    shuffle; the aggregate is map-side combinable.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(conv_col).orderBy(idx_col)
    has_tool_col = "tool" in df.columns
    turns = df.select(
        conv_col,
        idx_col,
        role_col,
        ts_col,
        *(["tool"] if has_tool_col else []),
        F.coalesce(F.col(text_col), F.lit("")).alias("__txt"),
        F.lag(role_col).over(w).alias("__prev_role"),
        F.lag(ts_col).over(w).alias("__prev_ts"),
    )
    n = F.count(F.lit(1))
    out = turns.groupBy(conv_col).agg(
        n.cast("int").alias("n_turns"),
        (
            (F.min(idx_col) == F.lit(0))
            & (F.max(idx_col) == (n - F.lit(1)))
            & (F.count_distinct(F.col(idx_col)) == n)
        ).alias("is_contiguous"),
        F.coalesce(
            F.bool_and(F.col(ts_col) >= F.col("__prev_ts")), F.lit(True)
        ).alias("ts_monotone"),
        F.min_by(F.col(role_col), F.col(idx_col)).alias("first_role"),
        F.count_distinct(F.col(role_col)).cast("int").alias("n_roles"),
        F.round(
            F.coalesce(
                F.sum(
                    F.when(F.col("__prev_role").isNull(), None)
                    .when(F.col(role_col) != F.col("__prev_role"), 1.0)
                    .otherwise(0.0)
                )
                / F.nullif(n - F.lit(1), F.lit(0)).cast("double"),
                F.lit(0.0),
            ),
            4,
        ).alias("role_alternation_frac"),
        F.round(
            F.avg(F.when(F.col("__txt") == "", 1.0).otherwise(0.0)), 4
        ).alias("empty_text_frac"),
        F.max(
            F.col("tool").isNotNull() if has_tool_col else F.lit(False)
        ).alias("has_tool"),
        # whole-second duration: exact MICROSECOND difference then floor —
        # per-endpoint second-truncation (unix_timestamp) diverges from the
        # oracle on fractional seconds, and works on TIMESTAMP_NTZ inputs
        F.floor(
            F.timestamp_diff("MICROSECOND", F.min(ts_col), F.max(ts_col))
            / F.lit(1_000_000)
        )
        .cast("bigint")
        .alias("duration_sec"),
    )
    return out.withColumn(
        "integrity_ok",
        F.col("is_contiguous")
        & F.col("ts_monotone")
        & (F.col("empty_text_frac") < F.lit(1.0)),
    )


def render_chat(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    max_turns: int | None = None,
) -> DataFrame:
    """Render each conversation to ONE deterministic training string:
    ``<|role|>text`` per turn, joined by newline in ``idx_col`` order.

    Returns (conv_id, n_turns, chat_text, n_chars).

    ``max_turns`` caps rendered turns per conversation (the first
    ``max_turns`` in turn order) — the guard against a pathological
    conversation whose rendered string would not fit an executor task.
    With the cap, per-group state is bounded by ``max_turns`` rows.

    Plan: collect_list of (turn_idx, line) structs per conversation +
    array_sort + array_join — one shuffle on ``conv_col``, no Python in
    the row path, no global window. NULL text renders as '' (parity
    with DuckDB ``string_agg`` which skips NULLs only when the whole
    line is NULL — we coalesce so neither side ever drops a line).
    """
    line = F.concat(
        F.lit("<|"),
        F.col(role_col),
        F.lit("|>"),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    base = df.select(conv_col, F.col(idx_col).alias("__idx"), line.alias("__line"))
    if max_turns is not None:
        if max_turns < 1:
            raise ValueError(f"max_turns must be >= 1, got {max_turns}")
        base = base.filter(F.col("__idx") < max_turns)
    sorted_lines = F.array_sort(
        F.collect_list(F.struct(F.col("__idx"), F.col("__line")))
    )
    return (
        base.groupBy(conv_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_turns"),
            F.array_join(
                F.transform(sorted_lines, lambda s: s["__line"]), "\n"
            ).alias("chat_text"),
        )
        .withColumn("n_chars", F.length("chat_text").cast("int"))
    )


def dedup_conversations(
    rendered: DataFrame,
    conv_col: str = "conv_id",
    text_col: str = "chat_text",
) -> DataFrame:
    """Conversation-level exact dedup over the rendered chat string.

    Returns the surviving rows of ``rendered`` plus
    (fingerprint, dup_count): per distinct md5(chat_text) the
    min-``conv_col`` conversation wins (the ``exact_dedup`` rule);
    ``dup_count`` is the cluster size, kept for curation audits.

    Two aggregates keyed on the 32-hex fingerprint (uniform, skew-free),
    then one equi-join back on (fingerprint, conv_id) to recover the
    winner's full row — never a window over the corpus.
    """
    if "fingerprint" in rendered.columns or "dup_count" in rendered.columns:
        raise ValueError(
            "input already has a 'fingerprint'/'dup_count' column; rename it"
        )
    fp = rendered.withColumn("fingerprint", F.md5(F.col(text_col)))
    winners = fp.groupBy("fingerprint").agg(
        F.min(conv_col).alias(conv_col),
        F.count(F.lit(1)).cast("int").alias("dup_count"),
    )
    return fp.join(winners, ["fingerprint", conv_col])


def curate_conversations(
    df: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str = "ts",
    min_turns: int = 1,
    max_turns: int | None = None,
    neardup: bool = False,
    neardup_kw: dict | None = None,
    pack_budget: int | None = 2048,
    truncate_budget: int | None = None,
    sft_vocab: DataFrame | None = None,
    train_role: str = "assistant",
) -> tuple[DataFrame, dict]:
    """Conversation-native curation: integrity filter → render →
    exact dedup → optional MinHash-LSH near-dup (keep the LONGEST
    conversation per cluster — chat data's quality proxy) → optional
    sequence packing of the surviving rendered corpus.

    Returns ``(result_df, manifest)``. With ``pack_budget`` set the
    result is the ``pack_sequences`` layout over whitespace token
    counts of the rendered strings (feed ``tokenizer=...`` paths via
    ``curation.curate`` on the rendered frame for model tokens);
    otherwise the surviving rendered conversations.

    ``truncate_budget`` inserts a ``truncate_to_context`` stage on the
    SURVIVING conversations' turns (drop history from the front until
    each fits the token budget) before the output stage; with it set,
    ``max_turns`` applies only to the dedup-stage rendering and is NOT
    re-applied downstream (it keeps the OLDEST turns, which would
    contradict the truncation's keep-the-SUFFIX contract), and the
    output fingerprint is recomputed from the truncated text. ``sft_vocab``
    (a WordPiece vocabulary frame) switches the output to training-ready
    ``sft_token_masks`` sequences — render → offset tokenize →
    ``train_role`` loss masks — the full raw-turns-to-trainable-batch
    story; it composes with ``truncate_budget`` and is mutually
    exclusive with ``pack_budget`` (masks are per-conversation, packing
    is corpus-layout — pack the mask output downstream if both are
    wanted).

    Every stage is one conv-keyed or fingerprint-keyed shuffle; the
    manifest records per-stage survivor counts (computed lazily — each
    ``count()`` is a job, acceptable at fit time and how ``curate()``
    itself audits stages).
    """
    from kgfarm_spark.operators.dedup import (
        dedup_keep_component_best,
        minhash_lsh_dedup_pairs,
    )

    if sft_vocab is not None and pack_budget is not None:
        # validate BEFORE any Spark job runs — this used to raise only
        # after integrity + render + dedup (+ LSH) had already executed
        raise ValueError(
            "sft_vocab and pack_budget are mutually exclusive — mask "
            "output is per-conversation; pack it downstream if needed"
        )

    manifest: dict = {"stages": []}

    flags = conv_integrity(df, conv_col, idx_col, role_col, text_col, ts_col)
    ok = flags.filter(
        F.col("integrity_ok") & (F.col("n_turns") >= F.lit(min_turns))
    ).select(conv_col)
    kept_turns = df.join(ok, conv_col)  # broadcast-able only if small; conv-keyed shuffle otherwise
    manifest["stages"].append({"stage": "integrity", "convs": ok.count()})

    rendered = render_chat(
        kept_turns, conv_col, idx_col, role_col, text_col, max_turns=max_turns
    )
    # localCheckpoint: the dedup result feeds the stage count plus (in the
    # LSH path) shingling, candidate verify, and keep-best — without
    # storage the render+dedup chain re-evaluates per consumer (the
    # curate() stage-boundary recipe; context cleaner frees the blocks)
    deduped = dedup_conversations(rendered, conv_col).localCheckpoint(eager=True)
    manifest["stages"].append({"stage": "exact_dedup", "convs": deduped.count()})

    if neardup:
        kw = {"n": 3, "num_hashes": 32, "bands": 8, "threshold": 0.7,
              "portable": False, **(neardup_kw or {})}
        pairs = minhash_lsh_dedup_pairs(deduped, conv_col, "chat_text", **kw)
        deduped = dedup_keep_component_best(deduped, pairs, conv_col, "n_turns")
        manifest["stages"].append({"stage": "neardup_lsh", "convs": deduped.count()})

    if truncate_budget is not None or sft_vocab is not None:
        # back to TURN granularity for the survivors (the rendered frame
        # has no per-turn rows); one conv-keyed semi-join
        survivor_turns = kept_turns.join(
            deduped.select(conv_col), conv_col, "left_semi"
        )
        # once the token-budget truncation has bounded each conversation,
        # max_turns must NOT be re-applied downstream: it filters
        # turn_idx < max_turns — the conversation's OLDEST turns — which
        # intersected with the truncated SUFFIX of high indices drops the
        # most recent turns (or the whole conversation), inverting the
        # recency contract (review finding, reproduced)
        downstream_max_turns = None if truncate_budget is not None else max_turns
        if truncate_budget is not None:
            survivor_turns = truncate_to_context(
                survivor_turns, budget=truncate_budget,
                conv_col=conv_col, idx_col=idx_col, text_col=text_col,
            ).drop("n_tokens", "tokens_from_end")
            manifest["stages"].append(
                {"stage": "truncate",
                 "convs": survivor_turns.select(conv_col).distinct().count(),
                 "budget": truncate_budget}
            )
        if sft_vocab is not None:
            masks = sft_token_masks(
                survivor_turns, sft_vocab, conv_col, idx_col, role_col,
                text_col, train_role=train_role,
                max_turns=downstream_max_turns,
            )
            manifest["stages"].append(
                {"stage": "sft_masks", "convs": masks.count()}
            )
            return masks, manifest
        # truncation without masks: re-render the truncated survivors;
        # the fingerprint is RECOMPUTED from the truncated text (the
        # pre-truncation md5 would not match its own chat_text — review
        # finding); dup_count stays the PRE-truncation duplicate count
        rendered = render_chat(
            survivor_turns, conv_col, idx_col, role_col, text_col,
            max_turns=downstream_max_turns,
        )
        deduped = rendered.withColumn(
            "fingerprint", F.md5("chat_text")
        ).join(deduped.select(conv_col, "dup_count"), conv_col)

    if pack_budget is None:
        return deduped, manifest

    from kgfarm_spark.operators.packing import pack_sequences

    tokens = deduped.select(
        F.xxhash64(F.col(conv_col)).alias("__cid"),
        F.size(
            F.filter(
                F.split(F.col("chat_text"), r"\s+"), lambda t: F.length(t) > 0
            )
        ).alias("n_tokens"),
    )
    packed = pack_sequences(tokens, id_col="__cid", budget=pack_budget)
    manifest["stages"].append(
        {"stage": "pack", "convs": packed.count(), "budget": pack_budget}
    )
    return packed, manifest


def chat_turn_spans(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    max_turns: int | None = None,
) -> DataFrame:
    """Per-turn character spans over the ``render_chat`` string — the
    loss-mask primitive for chat training: supervised fine-tuning masks
    the loss to assistant turns only, which needs the exact
    [start_char, end_char) of every turn inside the rendered training
    string. Returns one row per turn:

      (conv_id, turn_idx, role, start_char, end_char)

    with ``chat_text[start_char:end_char] == '<|role|>text'`` for the
    string produced by ``render_chat`` on the same frame (pytest-pinned;
    the ``max_turns`` cap matches too). Turns whose rendered line is
    NULL (NULL role) are skipped by ``render_chat``'s array_join and are
    likewise absent here, keeping offsets aligned.

    One cumulative-sum window keyed on ``conv_col`` — the SAME
    partitioning as render_chat/conv_integrity, so Catalyst reuses the
    exchange when the ops chain. Offsets count characters (codepoints),
    matching F.length/DuckDB length on both engines.
    """
    from pyspark.sql import Window

    line = F.concat(
        F.lit("<|"),
        F.col(role_col),
        F.lit("|>"),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    base = df.select(
        conv_col,
        F.col(idx_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
        line.alias("__line"),
    ).filter(F.col("__line").isNotNull())
    if max_turns is not None:
        if max_turns < 1:
            raise ValueError(f"max_turns must be >= 1, got {max_turns}")
        base = base.filter(F.col("turn_idx") < max_turns)
    w = (
        Window.partitionBy(conv_col)
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(
        F.sum(F.length("__line") + F.lit(1)).over(w), F.lit(0)
    ).cast("bigint")
    return base.select(
        conv_col,
        "turn_idx",
        "role",
        start.alias("start_char"),
        (start + F.length("__line")).cast("bigint").alias("end_char"),
    )


def sft_token_masks(
    df: DataFrame,
    vocab: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    train_role: str = "assistant",
    max_turns: int | None = None,
) -> DataFrame:
    """Training-ready SFT token sequences with loss masks: render each
    conversation (``render_chat``), tokenize it offset-preserving with a
    WordPiece vocabulary, and mark exactly the tokens lying inside
    ``train_role`` turns:

      (conv_id, tokens, loss_mask, n_tokens, n_train_tokens)

    ``loss_mask[i]`` is True iff token i's character span falls entirely
    inside a '<|train_role|>text' line of the rendered string — the
    standard supervised-fine-tuning recipe (train on assistant tokens,
    mask user/system/tool context). The '<|role|>' header fuses with the
    first word of the turn (no whitespace after the tag), so the
    header token trains with its turn — the usual chat-template
    convention. A whitespace token never crosses the newline between
    turns, so spans either nest fully or not at all.

    Plan: render + span windows are conv-keyed (one exchange each,
    shared key); spans are collected SORTED per conversation and handed
    to the tokenizing kernel, which walks tokens and spans together
    with a two-pointer merge — O(tokens + spans) per conversation. The
    first version masked with a per-token ``exists()`` over the span
    list, which is O(tokens × spans): on a Zipf-hot conversation (the
    16M-turn bench table's hottest conversation holds ~10^5 turns) that
    is a ~10^11-comparison single row — the measured wall. Tokens and
    spans are both ordered and spans are disjoint, so the merge is the
    exact same answer at linear cost.
    """
    from kgfarm_spark.operators.wordpiece import (
        _resolve_vocab_set,
        py_wordpiece_offsets,
    )

    rendered = render_chat(
        df, conv_col, idx_col, role_col, text_col, max_turns=max_turns
    )
    spans = (
        chat_turn_spans(df, conv_col, idx_col, role_col, text_col, max_turns)
        .filter(F.col("role") == train_role)
        .groupBy(conv_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("start_char"), F.col("end_char")))
            ).alias("__spans")
        )
    )
    vset = _resolve_vocab_set(vocab)
    bc = df.sparkSession.sparkContext.broadcast(vset)

    @F.pandas_udf(
        "struct<tokens:array<string>,loss_mask:array<boolean>,"
        "n_tokens:int,n_train_tokens:int>"
    )
    def _tok_mask(texts: pd.Series, span_lists: pd.Series) -> pd.DataFrame:
        v = bc.value
        memo: dict = {}
        rows = []
        for t, sp in zip(texts, span_lists):
            toks, starts, ends = py_wordpiece_offsets(t or "", v, memo=memo)
            mask = [False] * len(toks)
            if sp is not None and len(sp):
                j = 0
                n_sp = len(sp)
                for i, (s, e) in enumerate(zip(starts, ends)):
                    while j < n_sp and sp[j]["end_char"] < e:
                        j += 1
                    if j < n_sp and sp[j]["start_char"] <= s and e <= sp[j]["end_char"]:
                        mask[i] = True
            rows.append(
                {
                    "tokens": toks,
                    "loss_mask": mask,
                    "n_tokens": len(toks),
                    "n_train_tokens": sum(mask),
                }
            )
        return pd.DataFrame(rows)

    joined = rendered.join(spans, conv_col, "left")
    return joined.select(
        conv_col,
        _tok_mask(F.col("chat_text"), F.col("__spans")).alias("__m"),
    ).select(
        conv_col,
        F.col("__m.tokens").alias("tokens"),
        F.col("__m.loss_mask").alias("loss_mask"),
        F.col("__m.n_tokens").alias("n_tokens"),
        F.col("__m.n_train_tokens").alias("n_train_tokens"),
    )


def preference_pairs(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    prompt_role: str = "user",
    response_role: str = "assistant",
    score_col: str | None = None,
    context_k: int = 0,
) -> DataFrame:
    """Preference-pair construction (the DPO/RLHF reward-modeling input,
    Rafailov et al. 2023): collect every (prompt → response) exchange —
    a ``prompt_role`` turn immediately followed by a ``response_role``
    turn — group the exchanges by identical prompt text, and for every
    prompt with at least two distinct responses emit ONE training pair

      (prompt, chosen, rejected, chosen_score, rejected_score,
       n_candidates)

    where ``chosen``/``rejected`` are the highest/lowest-scoring
    responses. ``score_col`` names a per-turn reward column (a model
    score, a human rating); when None the score is response length — a
    deterministic stand-in documented as such, NOT a real reward. Ties
    on score break by response text (lexicographic), so the pair is a
    pure function of the data at any partitioning.

    ``context_k > 0`` grounds the grouping in dialogue history: two
    exchanges only pair if the previous ``context_k`` turns (rendered in
    the ``render_chat`` template) match too — the realistic DPO grouping
    where "same prompt" means same conversational state, not merely the
    same last message. The group key carries the context as an md5
    fingerprint (the SHUFFLED key is 32 hex chars however long the
    history is) and the output gains a ``context_fp`` column.

    Plan shape: ONE conv-keyed window (lead + the optional context
    frame — the same exchange every transcript op reuses), a
    (prompt, response)-keyed distinct-response dedupe, then the
    prompt-keyed extremum aggregate. Every aggregate combines map-side
    (count/max/max_by), so a viral prompt with millions of candidate
    responses costs its partitions one running extremum each — no skew
    straggler, no per-group materialization; the dedupe key is FINER
    than the prompt key, so it is strictly less skewed.
    """
    if context_k < 0:
        raise ValueError(f"need context_k >= 0, got {context_k}")
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    ctx_cols = []
    if context_k > 0:
        line = F.concat(
            F.lit("<|"),
            F.col(role_col),
            F.lit("|>"),
            F.coalesce(F.col(text_col), F.lit("")),
        )
        w_ctx = w.rowsBetween(-context_k, -1)
        items = F.collect_list(
            F.struct(F.col(idx_col).alias("i"), line.alias("l"))
        ).over(w_ctx)
        ctx_cols = [
            F.md5(
                F.array_join(
                    F.transform(F.array_sort(items), lambda s: s["l"]), "\n"
                )
            ).alias("context_fp")
        ]
    nxt = df.select(
        F.col(role_col),
        F.col(text_col).alias("prompt"),
        *ctx_cols,
        F.lead(role_col).over(w).alias("__next_role"),
        F.lead(text_col).over(w).alias("__response"),
        *(
            [F.lead(score_col).over(w).alias("__score")]
            if score_col is not None
            else []
        ),
    ).filter(
        (F.col(role_col) == prompt_role)
        & (F.col("__next_role") == response_role)
        # a NULL completion is not a candidate: it must neither inflate
        # n_candidates nor (under score_col) be electable as chosen
        & F.col("__response").isNotNull()
        # under score_col an UNSCORED response is not a candidate either:
        # struct(NULL, text) sorts lowest, so it was silently elected as
        # `rejected` with a NULL rejected_score (r06 advisor finding)
        & (
            F.col("__score").isNotNull()
            if score_col is not None
            else F.lit(True)
        )
    )
    group_cols = (["context_fp"] if context_k > 0 else []) + ["prompt"]
    # dedupe to DISTINCT responses first (per-response best score), so
    # the extremum selection below can never elect the same text as both
    # chosen and rejected — without this, score_col with rewards 0.9/0.1
    # on two copies of the SAME response emitted a degenerate pair
    per_resp = nxt.groupBy(*group_cols, "__response").agg(
        F.count(F.lit(1)).alias("__cnt"),
        *(
            [F.max(F.col("__score").cast("double")).alias("__best")]
            if score_col is not None
            else []
        ),
    )
    if score_col is not None:
        score = F.col("__best")
        key = F.struct(score.alias("s"), F.col("__response").alias("r"))
    else:
        score = F.length("__response").cast("double")
        # string key == struct ordering, but also valid ANSI SQL for the
        # DuckDB oracle (lpad fixes the numeric prefix's sort width; 12
        # digits covers any response below 10^12 chars — lpad TRUNCATES
        # beyond its width, which would invert the ordering)
        key = F.concat(
            F.lpad(F.length("__response").cast("string"), 12, "0"),
            F.lit("|"),
            F.col("__response"),
        )
    pairs = (
        per_resp.groupBy(*group_cols)
        .agg(
            F.sum("__cnt").cast("int").alias("n_candidates"),
            F.max_by("__response", key).alias("chosen"),
            F.min_by("__response", key).alias("rejected"),
            F.max_by(score, key).alias("__cs"),
            F.min_by(score, key).alias("__rs"),
            (F.max(key) != F.min(key)).alias("__has_pair"),
        )
        .filter("__has_pair")
    )
    return pairs.select(
        *group_cols,
        "n_candidates",
        "chosen",
        "rejected",
        F.col("__cs").cast("int").alias("chosen_score")
        if score_col is None
        else F.round("__cs", 4).alias("chosen_score"),
        F.col("__rs").cast("int").alias("rejected_score")
        if score_col is None
        else F.round("__rs", 4).alias("rejected_score"),
    )


def dialogue_context_examples(
    df: DataFrame,
    k: int = 4,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    target_role: str = "assistant",
) -> DataFrame:
    """Next-response training examples: for every ``target_role`` turn,
    the rendered context of (up to) the previous ``k`` turns and the
    turn's own text as the prediction target —

      (conv_id, turn_idx, context, target, n_context_turns)

    ``context`` is '<|role|>text' lines joined by newline — exactly the
    ``render_chat`` template, so a model fine-tuned on these examples
    sees the same surface form the full-conversation SFT path renders.
    Targets with NO context (a conversation-opening turn) are dropped —
    there is nothing to condition on.

    Plan shape: ONE conv-keyed window (the canonical transcript
    shuffle); the k-row frame bounds per-row state, and the collected
    frame is sorted by turn index before joining, so the context string
    is deterministic at any partitioning. Cost is O(k) per turn — at
    100 TB the window carries k small structs per row, never the whole
    conversation.
    """
    if k < 1:
        raise ValueError(f"need k >= 1, got {k}")
    line = F.concat(
        F.lit("<|"),
        F.col(role_col),
        F.lit("|>"),
        F.coalesce(F.col(text_col), F.lit("")),
    )
    w = (
        Window.partitionBy(conv_col)
        .orderBy(idx_col)
        .rowsBetween(-k, -1)
    )
    items = F.collect_list(
        F.struct(F.col(idx_col).alias("i"), line.alias("l"))
    ).over(w)
    out = df.select(
        conv_col,
        F.col(idx_col),
        F.col(role_col).alias("__role"),
        F.coalesce(F.col(text_col), F.lit("")).alias("target"),
        F.array_join(
            F.transform(F.array_sort(items), lambda s: s["l"]), "\n"
        ).alias("context"),
        F.size(items).cast("int").alias("n_context_turns"),
    )
    return out.filter(
        (F.col("__role") == target_role) & (F.col("n_context_turns") > 0)
    ).select(conv_col, idx_col, "context", "target", "n_context_turns")


def truncate_to_context(
    df: DataFrame,
    budget: int = 2048,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    """Context-window truncation: keep, per conversation, the maximal
    SUFFIX of turns whose summed token count fits ``budget`` — the
    standard way a chat corpus is fitted to a model's context length
    (recent turns matter most; history is dropped from the front). The
    final turn is ALWAYS kept, even alone over budget — truncation must
    never emit an empty conversation. Tokens are whitespace words of
    ``text_col`` (the same counter the packing family uses); swap in a
    real tokenizer count upstream by pre-computing a column and passing
    its name via ``text_col=None``-style wrappers if needed.

    Output: the surviving rows plus ``n_tokens`` (this turn) and
    ``tokens_from_end`` (inclusive running total from the conversation's
    end) — so downstream can see how full the window is.

    Plan shape: ONE conv-keyed window (descending turn order — the same
    single shuffle every transcript op reuses); the running sum is
    per-row O(1) frame state. No collect, no second pass.
    """
    if budget < 1:
        raise ValueError(f"need budget >= 1, got {budget}")
    n_tokens = F.size(
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda x: F.length(x) > 0,
        )
    ).cast("int")
    w_desc = (
        Window.partitionBy(conv_col)
        .orderBy(F.col(idx_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(conv_col)
    out = (
        df.withColumn("n_tokens", n_tokens)
        .withColumn(
            "tokens_from_end", F.sum("n_tokens").over(w_desc).cast("bigint")
        )
        .withColumn("__last_idx", F.max(idx_col).over(w_all))
    )
    return out.filter(
        (F.col("tokens_from_end") <= budget)
        | (F.col(idx_col) == F.col("__last_idx"))
    ).drop("__last_idx")


def tool_usage_profile(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Per-conversation tool-usage features for agent-transcript
    modeling: how much, how varied, and which tool dominates —

      (conv_id, n_turns, n_tool_turns, n_distinct_tools, top_tool,
       top_tool_count, first_tool_idx)

    ``top_tool`` is the most-used tool with ties broken by tool name
    (lexicographic max), so the profile is a pure function of the data.
    Conversations that never used a tool appear with zero counts and
    NULL top_tool — agents-vs-chat stratification needs the zeros.

    Plan shape: one (conv, tool) aggregate then one conv aggregate —
    both combine map-side; the second input has at most |tools| rows
    per conversation.
    """
    per_tool = (
        df.groupBy(conv_col, tool_col)
        .agg(F.count(F.lit(1)).alias("__cnt"),
             F.min(F.when(F.col(tool_col).isNotNull(), F.col(idx_col)))
             .alias("__first"))
    )
    key = F.when(
        F.col(tool_col).isNotNull(),
        F.struct(F.col("__cnt").alias("c"), F.col(tool_col).alias("t")),
    )
    return (
        per_tool.groupBy(conv_col)
        .agg(
            F.sum("__cnt").cast("int").alias("n_turns"),
            F.sum(
                F.when(F.col(tool_col).isNotNull(), F.col("__cnt")).otherwise(0)
            ).cast("int").alias("n_tool_turns"),
            F.count(F.when(F.col(tool_col).isNotNull(), F.lit(1))).cast("int")
            .alias("n_distinct_tools"),
            F.max_by(tool_col, key).alias("top_tool"),
            F.max_by(
                F.when(F.col(tool_col).isNotNull(), F.col("__cnt")), key
            ).cast("int").alias("top_tool_count"),
            F.min("__first").cast("int").alias("first_tool_idx"),
        )
    )


def tool_transition_matrix(
    df: DataFrame,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    tool_col: str = "tool",
) -> DataFrame:
    """Corpus-wide tool→tool transition counts: over each conversation's
    tool-using turns in turn order, count every consecutive
    (prev_tool, tool) pair —

      (prev_tool, tool, n_transitions)

    — the first-order Markov structure of agent tool use (which tool
    follows which), the feature a routing/planning model trains on.

    Plan shape: filter to tool turns (usually a small fraction), ONE
    conv-keyed lag window over the filtered rows, one global
    (prev, tool) aggregate whose cardinality is |tools|² — tiny — so
    the final shuffle is a broadcast-sized reduction.
    """
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    used = df.filter(F.col(tool_col).isNotNull()).select(
        conv_col, idx_col, F.col(tool_col).alias("tool")
    )
    pairs = used.select(
        F.lag("tool").over(w).alias("prev_tool"), "tool"
    ).filter(F.col("prev_tool").isNotNull())
    return (
        pairs.groupBy("prev_tool", "tool")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_transitions"))
    )
