"""Oracle-checked queries: conversation-level curation family
(operators/conversations.py) over the derived transcript table.

Chat/agent training data curates at CONVERSATION granularity — these
queries check the conversation-native layer (integrity validation,
deterministic chat rendering, conversation-level dedup) against DuckDB
running the identical logic on the same derived table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgfarm_spark.entry_queries import register, _cte
from kgfarm_spark.operators.conversations import (
    conv_integrity,
    curate_conversations,
    dedup_conversations,
    render_chat,
)
from kgfarm_spark.sources.transcripts import transcripts


@register(
    "conv_integrity",
    _cte(
        """
, pairs AS (
  SELECT conv_id, turn_idx, role, ts, tool,
         coalesce(text, '') AS txt,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
         lag(ts)   OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_ts
  FROM transcripts
)
SELECT conv_id,
       CAST(count(*) AS INT) AS n_turns,
       (min(turn_idx) = 0 AND max(turn_idx) = count(*) - 1
        AND count(DISTINCT turn_idx) = count(*))                 AS is_contiguous,
       coalesce(bool_and(ts >= prev_ts), TRUE)                   AS ts_monotone,
       min_by(role, turn_idx)                                    AS first_role,
       CAST(count(DISTINCT role) AS INT)                         AS n_roles,
       round(coalesce(sum(CASE WHEN prev_role IS NULL THEN NULL
                                WHEN role <> prev_role THEN 1.0
                                ELSE 0.0 END)
                      / nullif(count(*) - 1, 0), 0.0), 4)        AS role_alternation_frac,
       round(avg(CASE WHEN txt = '' THEN 1.0 ELSE 0.0 END), 4)   AS empty_text_frac,
       max(tool IS NOT NULL)                                     AS has_tool,
       CAST(floor(date_diff('microsecond', min(ts), max(ts))
                  / 1000000) AS BIGINT)                           AS duration_sec,
       ((min(turn_idx) = 0 AND max(turn_idx) = count(*) - 1
         AND count(DISTINCT turn_idx) = count(*))
        AND coalesce(bool_and(ts >= prev_ts), TRUE)
        AND avg(CASE WHEN txt = '' THEN 1.0 ELSE 0.0 END) < 1.0) AS integrity_ok
FROM pairs
GROUP BY conv_id
"""
    ),
)
def q_conv_integrity(spark: SparkSession, sf: str) -> DataFrame:
    """Per-conversation structural validation
    (conversations.conv_integrity): contiguity, ts monotonicity, role
    alternation, empty-text fraction — one conv-keyed shuffle."""
    return conv_integrity(transcripts(spark, sf))


_RENDER_SQL = """
, rendered AS (
  SELECT conv_id,
         CAST(count(*) AS INT) AS n_turns,
         string_agg('<|' || role || '|>' || coalesce(text, ''),
                    chr(10) ORDER BY turn_idx) AS chat_text
  FROM transcripts
  GROUP BY conv_id
)
"""


@register(
    "render_chat",
    _cte(
        _RENDER_SQL
        + """
SELECT conv_id, n_turns, chat_text,
       CAST(length(chat_text) AS INT) AS n_chars
FROM rendered
"""
    ),
)
def q_render_chat(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic chat-template rendering (conversations.render_chat):
    one training string per conversation, '<|role|>text' lines in turn
    order — collect_list+array_sort, no global window, no Python."""
    return render_chat(transcripts(spark, sf))


@register(
    "dedup_conversations",
    _cte(
        _RENDER_SQL
        + """
, fp AS (
  SELECT conv_id, n_turns, chat_text,
         CAST(length(chat_text) AS INT) AS n_chars,
         md5(chat_text) AS fingerprint
  FROM rendered
),
win AS (
  SELECT fingerprint, min(conv_id) AS conv_id,
         CAST(count(*) AS INT) AS dup_count
  FROM fp GROUP BY fingerprint
)
SELECT f.conv_id, f.n_turns, f.chat_text, f.n_chars, f.fingerprint,
       w.dup_count
FROM fp f JOIN win w ON f.fingerprint = w.fingerprint
                    AND f.conv_id = w.conv_id
"""
    ),
)
def q_dedup_conversations(spark: SparkSession, sf: str) -> DataFrame:
    """Conversation-level exact dedup (conversations.dedup_conversations):
    md5 fingerprint of the rendered chat, min-conv_id winner election —
    fingerprint-keyed aggregates, skew-free by construction."""
    return dedup_conversations(render_chat(transcripts(spark, sf)))


@register("conversation_curation_e2e")  # rows-only BY CONTRACT: the chain
# includes MinHash-LSH near-dup (iterative components) — not one-shot-SQL.
# Every stage is individually oracle-checked (conv_integrity, render_chat,
# dedup_conversations above; LSH/keep-best/packing via dedup_minhash_lsh,
# dedup_keep_best, pack_sequences); the composition's per-stage counts are
# pinned in tests/test_conversations.py on a handcrafted corpus.
def q_conversation_curation_e2e(spark: SparkSession, sf: str) -> DataFrame:
    """Conversation-native curation end-to-end
    (conversations.curate_conversations): integrity filter → render →
    exact dedup → LSH near-dup keep-longest → pack; the corpus is
    augmented with exact-duplicate conversations (every 5th, '_dup'
    suffix, shifted ids keep winner election deterministic) so dedup has
    guaranteed positives at every scale factor. Returns the per-stage
    manifest (stage, convs) — deterministic at any partitioning."""
    t = transcripts(spark, sf)
    dup = t.filter(
        F.abs(F.xxhash64("conv_id")) % 5 == 0
    ).withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("_dup")))
    corpus = t.unionByName(dup)
    packed, manifest = curate_conversations(
        corpus,
        min_turns=2,
        neardup=True,
        neardup_kw={"threshold": 0.7},
        pack_budget=512,
    )
    rows = [(s["stage"], int(s["convs"])) for s in manifest["stages"]]
    return spark.createDataFrame(rows, "stage string, convs long")


@register(
    "chat_turn_spans",
    _cte(
        """
, lines AS (
  SELECT conv_id, turn_idx, role,
         '<|' || role || '|>' || coalesce(text, '') AS line
  FROM transcripts
)
SELECT conv_id, turn_idx, role,
       CAST(coalesce(sum(length(line) + 1) OVER (
              PARTITION BY conv_id ORDER BY turn_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_char,
       CAST(coalesce(sum(length(line) + 1) OVER (
              PARTITION BY conv_id ORDER BY turn_idx
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            + length(line) AS BIGINT) AS end_char
FROM lines WHERE line IS NOT NULL
"""
    ),
)
def q_chat_turn_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Per-turn character spans over the rendered chat string
    (conversations.chat_turn_spans) — the loss-mask primitive for
    assistant-only supervised fine-tuning; spans index exactly into
    render_chat's chat_text (pytest-pinned slice equality)."""
    from kgfarm_spark.operators.conversations import chat_turn_spans

    return chat_turn_spans(transcripts(spark, sf))


@register(
    "preference_pairs",
    _cte(
        """
, nxt AS (
  SELECT conv_id, turn_idx, role, text AS prompt,
         lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS next_role,
         lead(text) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS response
  FROM transcripts
),
cand AS (
  SELECT prompt, response,
         lpad(CAST(length(response) AS VARCHAR), 12, '0') || '|' || response AS key
  FROM nxt WHERE role = 'user' AND next_role = 'assistant'
    AND response IS NOT NULL
)
SELECT prompt,
       CAST(count(*) AS INT) AS n_candidates,
       max_by(response, key) AS chosen,
       min_by(response, key) AS rejected,
       CAST(length(max_by(response, key)) AS INT) AS chosen_score,
       CAST(length(min_by(response, key)) AS INT) AS rejected_score
FROM cand
GROUP BY prompt
HAVING max(key) <> min(key)
"""
    ),
)
def q_preference_pairs(spark: SparkSession, sf: str) -> DataFrame:
    """DPO/reward-model pair construction
    (conversations.preference_pairs): user→assistant exchanges grouped
    by identical prompt; highest/lowest-scoring distinct responses
    become (chosen, rejected). One conv window + one map-side-combining
    prompt aggregate — viral prompts don't straggle."""
    from kgfarm_spark.operators.conversations import preference_pairs

    return preference_pairs(transcripts(spark, sf))


@register(
    "dialogue_context",
    _cte(
        """
, lines AS (
  SELECT conv_id, turn_idx, role, coalesce(text, '') AS txt,
         '<|' || role || '|>' || coalesce(text, '') AS line
  FROM transcripts
),
ctx AS (
  SELECT conv_id, turn_idx, role, txt,
         string_agg(line, chr(10)) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS context,
         CAST(count(*) OVER (
           PARTITION BY conv_id ORDER BY turn_idx
           ROWS BETWEEN 4 PRECEDING AND 1 PRECEDING) AS INT) AS n_context_turns
  FROM lines
)
SELECT conv_id, turn_idx, context, txt AS target, n_context_turns
FROM ctx WHERE role = 'assistant' AND n_context_turns > 0
"""
    ),
)
def q_dialogue_context(spark: SparkSession, sf: str) -> DataFrame:
    """Next-response examples (conversations.dialogue_context_examples):
    per assistant turn, the previous ≤4 turns rendered in the
    render_chat template as conditioning context. ONE conv-keyed window,
    O(k) frame state per row."""
    from kgfarm_spark.operators.conversations import (
        dialogue_context_examples,
    )

    return dialogue_context_examples(transcripts(spark, sf), k=4)


@register("sft_token_masks")  # rows-only BY CONTRACT: the WordPiece
# vocabulary is trained (iterative likelihood-ratio merges) and the
# tokenizer is max-munch over that vocabulary — not one-shot ANSI SQL.
# Exact parity is pytest-pinned (tests/test_wordpiece.py::
# test_sft_token_masks reconstructs the masked tokens' surfaces
# char-for-char against the rendered assistant lines); the span
# arithmetic underneath is oracle-checked via chat_turn_spans.
def q_sft_token_masks(spark: SparkSession, sf: str) -> DataFrame:
    """Training-ready SFT sequences (conversations.sft_token_masks):
    render → offset-preserving WordPiece tokenize → mark tokens inside
    assistant turns. Returns per-conversation token/mask counts (arrays
    themselves stay distributed; counts are deterministic)."""
    from kgfarm_spark.operators.conversations import sft_token_masks
    from kgfarm_spark.operators.wordpiece import wordpiece_train

    t = transcripts(spark, sf)
    corpus = render_chat(t).select(F.col("chat_text").alias("text"))
    _, vocab = wordpiece_train(corpus, n_merges=30)
    out = sft_token_masks(t, vocab)
    return out.select(
        "conv_id", "n_tokens", "n_train_tokens"
    ).orderBy("conv_id")


@register(
    "truncate_to_context",
    _cte(
        r"""
, tok AS (
  SELECT conv_id, turn_idx, role, text, tool, ts,
         CAST(len(list_filter(regexp_split_to_array(coalesce(text, ''), '\s+'),
                              x -> length(x) > 0)) AS INT) AS n_tokens
  FROM transcripts
),
cum AS (
  SELECT *, CAST(sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS tokens_from_end,
         max(turn_idx) OVER (PARTITION BY conv_id) AS last_idx
  FROM tok
)
SELECT conv_id, turn_idx, role, text, tool, ts, n_tokens, tokens_from_end
FROM cum WHERE tokens_from_end <= 8 OR turn_idx = last_idx
"""
    ),
)
def q_truncate_to_context(spark: SparkSession, sf: str) -> DataFrame:
    """Context-window truncation (conversations.truncate_to_context):
    per conversation, the maximal turn SUFFIX fitting the token budget
    (final turn always kept) — ONE conv-keyed descending window."""
    from kgfarm_spark.operators.conversations import truncate_to_context

    return truncate_to_context(transcripts(spark, sf), budget=8)


@register(
    "tool_usage_profile",
    _cte(
        """
, per_tool AS (
  SELECT conv_id, tool, count(*) AS cnt,
         min(CASE WHEN tool IS NOT NULL THEN turn_idx END) AS first_idx
  FROM transcripts GROUP BY conv_id, tool
)
SELECT conv_id,
       CAST(sum(cnt) AS INT) AS n_turns,
       CAST(sum(CASE WHEN tool IS NOT NULL THEN cnt ELSE 0 END) AS INT)
           AS n_tool_turns,
       CAST(count(CASE WHEN tool IS NOT NULL THEN 1 END) AS INT)
           AS n_distinct_tools,
       max_by(tool, CASE WHEN tool IS NOT NULL THEN
              lpad(CAST(cnt AS VARCHAR), 9, '0') || '|' || tool END)
           AS top_tool,
       CAST(max_by(CASE WHEN tool IS NOT NULL THEN cnt END,
              CASE WHEN tool IS NOT NULL THEN
              lpad(CAST(cnt AS VARCHAR), 9, '0') || '|' || tool END) AS INT)
           AS top_tool_count,
       CAST(min(first_idx) AS INT) AS first_tool_idx
FROM per_tool GROUP BY conv_id
"""
    ),
)
def q_tool_usage_profile(spark: SparkSession, sf: str) -> DataFrame:
    """Per-conversation tool-usage features
    (conversations.tool_usage_profile): counts, variety, dominant tool
    — two map-side-combining aggregates, zero windows."""
    from kgfarm_spark.operators.conversations import tool_usage_profile

    return tool_usage_profile(transcripts(spark, sf))


@register(
    "tool_transitions",
    _cte(
        """
, used AS (
  SELECT conv_id, turn_idx, tool FROM transcripts WHERE tool IS NOT NULL
),
pairs AS (
  SELECT lag(tool) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_tool,
         tool
  FROM used
)
SELECT prev_tool, tool, CAST(count(*) AS BIGINT) AS n_transitions
FROM pairs WHERE prev_tool IS NOT NULL GROUP BY prev_tool, tool
"""
    ),
)
def q_tool_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """Corpus-wide tool→tool transition counts
    (conversations.tool_transition_matrix): the first-order Markov
    structure of agent tool use — filtered lag window + a |tools|²-row
    aggregate."""
    from kgfarm_spark.operators.conversations import tool_transition_matrix

    return tool_transition_matrix(transcripts(spark, sf))


@register("sft_packed_sequences")  # rows-only BY CONTRACT: trained
# WordPiece vocab + max-munch tokenization underneath (non-SQL); the
# packing arithmetic it rides on IS oracle-checked (materialize_sequences,
# pack_sequences) and the zip/unzip mask transport is pytest-pinned
# (tests/test_pack_nosplit::test_pack_sft_sequences_roundtrip —
# concat-roundtrip of tokens AND masks, pad-never-trains).
def q_sft_packed_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Training batches end-to-end (packing.pack_sft_sequences over
    conversations.sft_token_masks): render → tokenize-with-offsets →
    assistant loss masks → fixed-budget packed sequences with masks
    riding along. Returns per-sequence counts (deterministic at any
    partitioning; arrays stay distributed)."""
    from kgfarm_spark.operators.conversations import sft_token_masks
    from kgfarm_spark.operators.packing import pack_sft_sequences
    from kgfarm_spark.operators.wordpiece import wordpiece_train

    t = transcripts(spark, sf)
    corpus = render_chat(t).select(F.col("chat_text").alias("text"))
    _, vocab = wordpiece_train(corpus, n_merges=30)
    masks = sft_token_masks(t, vocab)
    packed = pack_sft_sequences(masks, budget=256, pad_token="[PAD]")
    return packed.select(
        "seq_id",
        "n_tokens",
        "n_docs",
        "n_pad",
        F.size(F.filter("loss_mask", lambda m: m)).cast("int").alias(
            "n_train_tokens"
        ),
    ).orderBy("seq_id")
