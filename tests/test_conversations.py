"""Conversation-level curation ops (operators/conversations.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kgfarm_spark.operators.conversations import (
    conv_integrity,
    curate_conversations,
    dedup_conversations,
    render_chat,
)


def _ts(m):
    return dt.datetime(2024, 1, 1, 12, m)


@pytest.fixture(scope="module")
def convs(spark):
    rows = [
        # c1: well-formed 3-turn alternating conversation
        ("c1", 0, "user", "hi", None, _ts(0)),
        ("c1", 1, "assistant", "hello", None, _ts(1)),
        ("c1", 2, "user", "bye", "search", _ts(2)),
        # c2: gap in turn_idx (0, 2) -> not contiguous
        ("c2", 0, "user", "a", None, _ts(0)),
        ("c2", 2, "assistant", "b", None, _ts(1)),
        # c3: non-monotone ts
        ("c3", 0, "user", "x", None, _ts(5)),
        ("c3", 1, "assistant", "y", None, _ts(3)),
        # c4: all-empty text
        ("c4", 0, "user", "", None, _ts(0)),
        ("c4", 1, "user", None, None, _ts(1)),
        # c5: exact duplicate of c1's content
        ("c5", 0, "user", "hi", None, _ts(7)),
        ("c5", 1, "assistant", "hello", None, _ts(8)),
        ("c5", 2, "user", "bye", None, _ts(9)),
        # c6: single turn
        ("c6", 0, "system", "boot", None, _ts(0)),
    ]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )


def test_conv_integrity_flags(convs):
    out = {r["conv_id"]: r.asDict() for r in conv_integrity(convs).collect()}
    assert out["c1"]["is_contiguous"] and out["c1"]["ts_monotone"]
    assert out["c1"]["integrity_ok"]
    assert out["c1"]["n_turns"] == 3
    assert out["c1"]["first_role"] == "user"
    assert out["c1"]["role_alternation_frac"] == 1.0
    assert out["c1"]["has_tool"] is True
    assert out["c1"]["duration_sec"] == 120
    assert not out["c2"]["is_contiguous"]
    assert not out["c2"]["integrity_ok"]
    assert not out["c3"]["ts_monotone"]
    assert not out["c3"]["integrity_ok"]
    assert out["c4"]["empty_text_frac"] == 1.0
    assert not out["c4"]["integrity_ok"]  # no non-empty text
    assert out["c6"]["integrity_ok"]
    assert out["c6"]["role_alternation_frac"] == 0.0  # no adjacent pairs
    assert out["c6"]["duration_sec"] == 0


def test_render_chat_exact_string(convs):
    out = {r["conv_id"]: r for r in render_chat(convs).collect()}
    assert out["c1"]["chat_text"] == "<|user|>hi\n<|assistant|>hello\n<|user|>bye"
    assert out["c1"]["n_turns"] == 3
    assert out["c1"]["n_chars"] == len(out["c1"]["chat_text"])
    # NULL text renders as '' (line kept, not dropped)
    assert out["c4"]["chat_text"] == "<|user|>\n<|user|>"
    # out-of-order input still renders in turn order
    shuffled = convs.orderBy(F.rand(7))
    out2 = {r["conv_id"]: r["chat_text"] for r in render_chat(shuffled).collect()}
    assert out2 == {k: v["chat_text"] for k, v in out.items()}


def test_render_chat_max_turns(convs):
    out = {r["conv_id"]: r for r in render_chat(convs, max_turns=2).collect()}
    assert out["c1"]["chat_text"] == "<|user|>hi\n<|assistant|>hello"
    assert out["c1"]["n_turns"] == 2
    with pytest.raises(ValueError, match="max_turns"):
        render_chat(convs, max_turns=0)


def test_dedup_conversations(convs):
    rendered = render_chat(convs)
    kept = dedup_conversations(rendered)
    ids = {r["conv_id"]: r["dup_count"] for r in kept.collect()}
    # c5 renders identically to c1 -> min-id winner c1 with dup_count 2
    assert "c1" in ids and ids["c1"] == 2
    assert "c5" not in ids
    assert ids["c2"] == 1
    # survivors keep the rendered columns
    assert {"conv_id", "n_turns", "chat_text", "n_chars", "fingerprint", "dup_count"} == set(
        kept.columns
    )
    with pytest.raises(ValueError, match="fingerprint"):
        dedup_conversations(kept)


def test_curate_conversations_e2e(convs):
    packed, manifest = curate_conversations(convs, min_turns=1, pack_budget=8)
    stages = {s["stage"]: s["convs"] for s in manifest["stages"]}
    # c2 (gap), c3 (non-monotone), c4 (all empty) dropped by integrity;
    # c5 dropped as exact dup of c1 -> 2 survivors (c1, c6)
    assert stages["integrity"] == 3
    assert stages["exact_dedup"] == 2
    assert stages["pack"] == 2
    # packing layout covers every surviving conversation exactly once
    assert packed.count() == 2
    assert packed.agg(F.count_distinct("__cid")).collect()[0][0] == 2

    survivors, m2 = curate_conversations(convs, pack_budget=None)
    assert {r["conv_id"] for r in survivors.select("conv_id").collect()} == {"c1", "c6"}


def test_curate_conversations_neardup(spark):
    # two near-identical long conversations + one distinct; keep-longest
    base = [("n%d" % i, i) for i in range(20)]
    rows = []
    for cid, extra in [("a", 0), ("b", 1), ("z", 0)]:
        words = ["common text turn number %d" % i for i in range(12 + extra)]
        if cid == "z":
            words = ["totally different subject matter line %d xyzzy" % i for i in range(12)]
        for i, wtext in enumerate(words):
            rows.append((cid, i, "user" if i % 2 == 0 else "assistant", wtext, None, _ts(i)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    kept, manifest = curate_conversations(
        df, neardup=True, neardup_kw={"threshold": 0.5}, pack_budget=None
    )
    ids = {r["conv_id"] for r in kept.select("conv_id").collect()}
    # a (12 turns) and b (13 turns) are near-dups -> keep the longer b
    assert ids == {"b", "z"}


def test_chat_turn_spans_index_into_rendered_string(spark):
    from kgfarm_spark.operators.conversations import chat_turn_spans, render_chat

    rows = [
        ("c1", 0, "user", "hello there", "2024-01-01 00:00:00"),
        ("c1", 1, "assistant", "hi! how can I help", "2024-01-01 00:00:05"),
        ("c1", 2, "user", None, "2024-01-01 00:00:09"),          # NULL text -> ''
        ("c1", 3, "assistant", "multi\nline reply", "2024-01-01 00:00:12"),
        ("c2", 0, "system", "", "2024-01-01 01:00:00"),
        ("c2", 1, None, "orphan line", "2024-01-01 01:00:01"),   # NULL role: skipped
        ("c2", 2, "user", "after the gap", "2024-01-01 01:00:02"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts string"
    )
    rendered = {
        r["conv_id"]: r["chat_text"] for r in render_chat(df).collect()
    }
    spans = chat_turn_spans(df).collect()
    # NULL-role turn is absent from spans AND from the rendered string
    assert ("c2", 1) not in {(r["conv_id"], r["turn_idx"]) for r in spans}
    for r in spans:
        chunk = rendered[r["conv_id"]][r["start_char"]:r["end_char"]]
        assert chunk.startswith(f"<|{r['role']}|>")
    # exact slice equality for a known turn
    c1 = {r["turn_idx"]: r for r in spans if r["conv_id"] == "c1"}
    s = c1[1]
    assert rendered["c1"][s["start_char"]:s["end_char"]] == "<|assistant|>hi! how can I help"
    # spans tile the string: each next start = previous end + 1 (the newline)
    ordered = [c1[i] for i in sorted(c1)]
    for a, b in zip(ordered, ordered[1:]):
        assert b["start_char"] == a["end_char"] + 1
    assert ordered[-1]["end_char"] == len(rendered["c1"])


def test_chat_turn_spans_max_turns_matches_render(spark):
    from kgfarm_spark.operators.conversations import chat_turn_spans, render_chat

    rows = [("c", i, "user" if i % 2 == 0 else "assistant", f"turn {i}",
             "2024-01-01 00:00:00") for i in range(6)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts string"
    )
    text = render_chat(df, max_turns=3).collect()[0]["chat_text"]
    spans = chat_turn_spans(df, max_turns=3).collect()
    assert len(spans) == 3
    assert max(r["end_char"] for r in spans) == len(text)


def test_preference_pairs(spark):
    from kgfarm_spark.operators.conversations import preference_pairs

    rows = [
        # prompt "q1": three exchanges, responses of lengths 3/5/5 —
        # chosen = "ccccc" (len 5, lexicographic winner of the len-5
        # tie), rejected = "aaa" (len 3)
        ("c1", 0, "user", "q1", _ts(0)),
        ("c1", 1, "assistant", "aaa", _ts(1)),
        ("c2", 0, "user", "q1", _ts(0)),
        ("c2", 1, "assistant", "bbbbb", _ts(1)),
        ("c3", 0, "user", "q1", _ts(0)),
        ("c3", 1, "assistant", "ccccc", _ts(1)),
        # prompt "q2": two exchanges, SAME response text -> no pair
        ("c4", 0, "user", "q2", _ts(0)),
        ("c4", 1, "assistant", "same", _ts(1)),
        ("c5", 0, "user", "q2", _ts(0)),
        ("c5", 1, "assistant", "same", _ts(1)),
        # prompt "q3": single exchange -> no pair
        ("c6", 0, "user", "q3", _ts(0)),
        ("c6", 1, "assistant", "only", _ts(1)),
        # user turn NOT followed by assistant -> not an exchange
        ("c7", 0, "user", "q1", _ts(0)),
        ("c7", 1, "user", "zzzzzzzzz", _ts(1)),
        # assistant with no preceding user prompt -> not an exchange
        ("c8", 0, "system", "s", _ts(0)),
        ("c8", 1, "assistant", "xxxxxxxxxx", _ts(1)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    out = {r["prompt"]: r for r in preference_pairs(df).collect()}
    assert set(out) == {"q1"}
    p = out["q1"]
    assert p["chosen"] == "ccccc"
    assert p["rejected"] == "aaa"
    assert p["chosen_score"] == 5 and p["rejected_score"] == 3
    assert p["n_candidates"] == 3
    # partition invariance: same pair at 1 partition
    one = preference_pairs(df.coalesce(1)).collect()
    assert {(r["prompt"], r["chosen"], r["rejected"]) for r in one} == {
        ("q1", "ccccc", "aaa")
    }


def test_preference_pairs_score_col(spark):
    from kgfarm_spark.operators.conversations import preference_pairs

    rows = [
        # explicit reward column inverts the length ordering
        ("c1", 0, "user", "q", 0.0, _ts(0)),
        ("c1", 1, "assistant", "longer-answer", 0.1, _ts(1)),
        ("c2", 0, "user", "q", 0.0, _ts(0)),
        ("c2", 1, "assistant", "short", 0.9, _ts(1)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "reward double, ts timestamp",
    )
    p = preference_pairs(df, score_col="reward").collect()[0]
    assert p["chosen"] == "short" and p["rejected"] == "longer-answer"
    assert p["chosen_score"] == 0.9 and p["rejected_score"] == 0.1


def test_dialogue_context_examples(spark):
    from kgfarm_spark.operators.conversations import (
        dialogue_context_examples,
    )

    rows = [
        ("c1", 0, "user", "u0", _ts(0)),
        ("c1", 1, "assistant", "a1", _ts(1)),
        ("c1", 2, "user", "u2", _ts(2)),
        ("c1", 3, "tool", "t3", _ts(3)),
        ("c1", 4, "user", "u4", _ts(4)),
        ("c1", 5, "assistant", "a5", _ts(5)),
        # conversation OPENING with assistant -> no context, dropped
        ("c2", 0, "assistant", "orphan", _ts(0)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    out = {r["turn_idx"]: r for r in dialogue_context_examples(df, k=4).collect()}
    assert set(out) == {1, 5}
    assert out[1]["context"] == "<|user|>u0"
    assert out[1]["n_context_turns"] == 1
    # turn 5 sees exactly the previous 4 turns (1..4), NOT turn 0
    assert out[5]["context"] == (
        "<|assistant|>a1\n<|user|>u2\n<|tool|>t3\n<|user|>u4"
    )
    assert out[5]["n_context_turns"] == 4
    assert out[5]["target"] == "a5"
    # context lines match the render_chat template surface
    chat = render_chat(df.filter(F.col("conv_id") == "c1")).first()["chat_text"]
    assert out[5]["context"] in chat


def test_truncate_to_context(spark):
    from kgfarm_spark.operators.conversations import truncate_to_context

    rows = [
        # c1: token counts 3/2/4/1 from the end: turn3=1, turn2=5, turn1=7,
        # turn0=10 -> budget 6 keeps turns {2,3}; final turn always kept
        ("c1", 0, "user", "a b c", _ts(0)),
        ("c1", 1, "assistant", "d e", _ts(1)),
        ("c1", 2, "user", "f g h i", _ts(2)),
        ("c1", 3, "assistant", "j", _ts(3)),
        # c2: single turn LONGER than budget -> still kept
        ("c2", 0, "user", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", _ts(0)),
        # c3: null text counts 0 tokens
        ("c3", 0, "user", None, _ts(0)),
        ("c3", 1, "assistant", "x y", _ts(1)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    out = truncate_to_context(df, budget=6)
    got = {(r["conv_id"], r["turn_idx"]): r for r in out.collect()}
    assert set(got) == {("c1", 2), ("c1", 3), ("c2", 0), ("c3", 0), ("c3", 1)}
    assert got[("c1", 3)]["tokens_from_end"] == 1
    assert got[("c1", 2)]["tokens_from_end"] == 5
    assert got[("c2", 0)]["n_tokens"] == 10  # over budget, kept as last turn
    assert got[("c3", 0)]["n_tokens"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        truncate_to_context(df, budget=0)


def test_tool_usage_profile_and_transitions(spark):
    from kgfarm_spark.operators.conversations import (
        tool_transition_matrix,
        tool_usage_profile,
    )

    rows = [
        # c1: tools code, code, search, code -> top=code(3);
        # transitions code->code, code->search, search->code
        ("c1", 0, "user", "q", None, _ts(0)),
        ("c1", 1, "tool", "t", "code", _ts(1)),
        ("c1", 2, "tool", "t", "code", _ts(2)),
        ("c1", 3, "tool", "t", "search", _ts(3)),
        ("c1", 4, "tool", "t", "code", _ts(4)),
        # c2: tie 1-1 between 'a' and 'b' -> lexicographic max 'b' wins
        ("c2", 0, "tool", "t", "a", _ts(0)),
        ("c2", 1, "tool", "t", "b", _ts(1)),
        # c3: no tools at all
        ("c3", 0, "user", "q", None, _ts(0)),
        ("c3", 1, "assistant", "r", None, _ts(1)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    prof = {r["conv_id"]: r for r in tool_usage_profile(df).collect()}
    assert prof["c1"]["n_turns"] == 5
    assert prof["c1"]["n_tool_turns"] == 4
    assert prof["c1"]["n_distinct_tools"] == 2
    assert prof["c1"]["top_tool"] == "code"
    assert prof["c1"]["top_tool_count"] == 3
    assert prof["c1"]["first_tool_idx"] == 1
    assert prof["c2"]["top_tool"] == "b"  # count tie -> lexicographic max
    assert prof["c3"]["n_tool_turns"] == 0
    assert prof["c3"]["top_tool"] is None
    assert prof["c3"]["first_tool_idx"] is None

    trans = {
        (r["prev_tool"], r["tool"]): r["n_transitions"]
        for r in tool_transition_matrix(df).collect()
    }
    assert trans == {
        ("code", "code"): 1,
        ("code", "search"): 1,
        ("search", "code"): 1,
        ("a", "b"): 1,
    }


def test_group_split_no_leakage(spark):
    from kgfarm_spark.functions.sampling import group_split

    rows = [(f"c{i}", j, "user", "t", _ts(j)) for i in range(200) for j in range(3)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    out = group_split(df, "conv_id")
    # every turn of a conversation gets the SAME split
    per_conv = (
        out.groupBy("conv_id")
        .agg(F.count_distinct("split").alias("n"))
        .collect()
    )
    assert all(r["n"] == 1 for r in per_conv)
    # rough proportions at 200 groups (train 0.9 -> expect the majority)
    counts = {
        r["split"]: r["n"]
        for r in out.select("conv_id", "split").distinct()
        .groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts.get("train", 0) > 150
    assert set(counts) <= {"train", "val", "test"}
    # deterministic across partitioning; redrawn under another seed
    again = {r["conv_id"]: r["split"]
             for r in group_split(df.repartition(7), "conv_id")
             .select("conv_id", "split").distinct().collect()}
    first = {r["conv_id"]: r["split"]
             for r in out.select("conv_id", "split").distinct().collect()}
    assert again == first
    other = {r["conv_id"]: r["split"]
             for r in group_split(df, "conv_id", seed="different")
             .select("conv_id", "split").distinct().collect()}
    assert other != first
    import pytest as _pytest

    with _pytest.raises(ValueError):
        group_split(df, "conv_id", {"train": 0.5, "val": 0.1})


def test_preference_pairs_context_grounded(spark):
    from kgfarm_spark.operators.conversations import preference_pairs

    rows = [
        # SAME user prompt "q", DIFFERENT preceding context -> with
        # context_k they must NOT pair; without, they do
        ("c1", 0, "system", "setup-A", _ts(0)),
        ("c1", 1, "user", "q", _ts(1)),
        ("c1", 2, "assistant", "answer-one", _ts(2)),
        ("c2", 0, "system", "setup-B", _ts(0)),
        ("c2", 1, "user", "q", _ts(1)),
        ("c2", 2, "assistant", "resp", _ts(2)),
        # SAME context AND prompt -> pairs under both modes
        ("c3", 0, "system", "setup-A", _ts(0)),
        ("c3", 1, "user", "q", _ts(1)),
        ("c3", 2, "assistant", "a-much-longer-answer", _ts(2)),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    flat = preference_pairs(df).collect()
    assert len(flat) == 1 and flat[0]["n_candidates"] == 3

    ctx = preference_pairs(df, context_k=2).collect()
    # only the setup-A group has >=2 distinct responses
    assert len(ctx) == 1
    p = ctx[0]
    assert p["n_candidates"] == 2
    assert p["chosen"] == "a-much-longer-answer"
    assert p["rejected"] == "answer-one"
    assert len(p["context_fp"]) == 32
    import pytest as _pytest

    with _pytest.raises(ValueError):
        preference_pairs(df, context_k=-1)


def test_preference_pairs_no_degenerate_pair(spark):
    from kgfarm_spark.operators.conversations import preference_pairs

    rows = [
        # identical response text with different rewards: NOT a pair
        # (one distinct response) — the pre-fix code emitted
        # chosen == rejected == 'same'
        ("c1", 0, "user", "q", 0.1, _ts(0)),
        ("c1", 1, "assistant", "same", 0.1, _ts(1)),
        ("c2", 0, "user", "q", 0.9, _ts(0)),
        ("c2", 1, "assistant", "same", 0.9, _ts(1)),
        # two copies of 'dup' (rewards 0.2, 0.8) + one 'other' (0.5):
        # distinct-response dedupe keeps dup@0.8 vs other@0.5
        ("c3", 0, "user", "p", 0.0, _ts(0)),
        ("c3", 1, "assistant", "dup", 0.2, _ts(1)),
        ("c4", 0, "user", "p", 0.0, _ts(0)),
        ("c4", 1, "assistant", "dup", 0.8, _ts(1)),
        ("c5", 0, "user", "p", 0.0, _ts(0)),
        ("c5", 1, "assistant", "other", 0.5, _ts(1)),
        # NULL response is not a candidate under score_col either
        ("c6", 0, "user", "r", 0.0, _ts(0)),
        ("c6", 1, "assistant", None, 0.99, _ts(1)),
        ("c7", 0, "user", "r", 0.0, _ts(0)),
        ("c7", 1, "assistant", "real", 0.5, _ts(1)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "reward double, ts timestamp",
    )
    out = {r["prompt"]: r for r in
           preference_pairs(df, score_col="reward").collect()}
    assert "q" not in out          # one distinct response -> no pair
    assert "r" not in out          # NULL filtered -> one candidate left
    p = out["p"]
    assert p["chosen"] == "dup" and p["rejected"] == "other"
    assert p["chosen_score"] == 0.8 and p["rejected_score"] == 0.5
    assert p["n_candidates"] == 3  # occurrences, not distinct responses
    # default (length) path: NULL responses don't inflate n_candidates
    flat = {r["prompt"]: r for r in preference_pairs(df).collect()}
    assert "r" not in flat and flat["p"]["n_candidates"] == 3


def test_group_split_null_group_key(spark):
    from kgfarm_spark.functions.sampling import group_split

    rows = [(None, 0), (None, 1), ("c1", 0)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int")
    out = group_split(df, "conv_id").collect()
    null_splits = {r["split"] for r in out if r["conv_id"] is None}
    # all NULL-group rows land together, in a hash-chosen (not
    # fall-through-default) split
    assert len(null_splits) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        group_split(df, "conv_id", {})


def test_curate_conversations_sft_tail(spark, convs):
    from kgfarm_spark.operators.conversations import curate_conversations
    from kgfarm_spark.operators.wordpiece import wordpiece_train

    corpus = render_chat(convs).select(F.col("chat_text").alias("text"))
    _, vocab = wordpiece_train(corpus, n_merges=10)
    out, manifest = curate_conversations(
        convs, min_turns=2, pack_budget=None, sft_vocab=vocab,
        truncate_budget=4,
    )
    stages = [s["stage"] for s in manifest["stages"]]
    assert stages == ["integrity", "exact_dedup", "truncate", "sft_masks"]
    rows = {r["conv_id"]: r for r in out.collect()}
    # survivors carry masks consistent with their token streams
    for r in rows.values():
        assert len(r["loss_mask"]) == r["n_tokens"]
        assert r["n_train_tokens"] == sum(r["loss_mask"])
    # c1 survives curation (c5 is its duplicate and loses the min-id
    # election... c1 < c5, so c1 survives) and has assistant tokens
    assert "c1" in rows and rows["c1"]["n_train_tokens"] > 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate_conversations(convs, sft_vocab=vocab, pack_budget=512)


def test_hashed_embedding_conversation_retrieval(spark):
    """The text→vector bridge: near-identical conversations cosine-match
    far above unrelated ones, with no external encoder."""
    from kgfarm_spark.operators.similarity import (
        cosine_topk,
        hashed_text_embedding,
    )

    rows = [
        ("a", "the quick brown fox jumps over the lazy dog"),
        ("b", "the quick brown fox jumps over the lazy cat"),  # near-dup of a
        ("c", "spark shuffles partitions across the cluster nodes"),
        ("d", ""),        # zero words -> dropped
        ("e", None),      # null -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    emb = hashed_text_embedding(df, dim=64)
    got = {r["doc_id"]: r for r in emb.collect()}
    assert set(got) == {"a", "b", "c"}
    # unit norm
    for r in got.values():
        assert abs(sum(x * x for x in r["emb"]) - 1.0) < 1e-9
    assert got["a"]["n_words"] == 9
    # retrieval: a's nearest non-self neighbor is b, and the a-b cosine
    # dominates a-c
    corpus = emb.select(F.col("doc_id").alias("id"), F.col("emb").alias("v"))
    q = corpus.filter(F.col("id") == "a").select(
        F.col("id").alias("qid"), F.col("v")
    )
    top = cosine_topk(
        corpus, q, id_col="id", vec_col="v", query_id_col="qid", k=2,
    ).collect()
    ranked = [r["neighbor_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert ranked == ["b", "c"]  # self excluded; near-dup first
    sims = {r["neighbor_id"]: r["cosine"] for r in top}
    assert sims["b"] > 0.7 > sims["c"]
    # partition invariance
    again = {r["doc_id"]: r["emb"]
             for r in hashed_text_embedding(df.repartition(5), dim=64).collect()}
    assert all(again[k] == got[k]["emb"] for k in got)


def test_curate_truncate_keeps_recent_turns_with_max_turns(spark):
    """Regression (review finding): truncate_budget + max_turns used to
    re-apply 'turn_idx < max_turns' AFTER suffix truncation, dropping
    the most recent turns or whole conversations."""
    from kgfarm_spark.operators.conversations import curate_conversations

    rows = [("c1", i, "user" if i % 2 == 0 else "assistant",
             "w1 w2 w3", _ts(i)) for i in range(8)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )
    out, manifest = curate_conversations(
        df, min_turns=2, max_turns=3, truncate_budget=6, pack_budget=None
    )
    got = out.collect()
    assert len(got) == 1  # the conversation survives
    r = got[0]
    # the truncated suffix is turns 6-7 (3 tokens each, budget 6)
    assert r["chat_text"] == "<|user|>w1 w2 w3\n<|assistant|>w1 w2 w3"
    # fingerprint matches the TRUNCATED text, not the pre-truncation one
    import hashlib
    assert r["fingerprint"] == hashlib.md5(r["chat_text"].encode()).hexdigest()
    # early validation: no Spark jobs before the exclusivity error
    from kgfarm_spark.operators.wordpiece import wordpiece_train

    corpus = render_chat(df).select(F.col("chat_text").alias("text"))
    _, vocab = wordpiece_train(corpus, n_merges=5)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        curate_conversations(df, sft_vocab=vocab, pack_budget=512)


def test_preference_pairs_null_score_not_elected(spark):
    """r06 advisor finding: under score_col, an UNSCORED (NULL-reward)
    response must not be a candidate — it used to sort lowest and get
    silently elected as `rejected` with a NULL rejected_score."""
    from kgfarm_spark.operators.conversations import preference_pairs

    rows = [
        ("c1", 0, "user", "q", 0.9, _ts(0)),
        ("c1", 1, "assistant", "scored-hi", 0.9, _ts(1)),
        ("c2", 0, "user", "q", 0.2, _ts(0)),
        ("c2", 1, "assistant", "scored-lo", 0.2, _ts(1)),
        ("c3", 0, "user", "q", None, _ts(0)),
        ("c3", 1, "assistant", "unscored", None, _ts(1)),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "reward double, ts timestamp",
    )
    out = preference_pairs(df, score_col="reward").collect()
    assert len(out) == 1
    p = out[0]
    assert p["chosen"] == "scored-hi" and p["rejected"] == "scored-lo"
    assert p["n_candidates"] == 2  # the unscored response is not counted
    assert p["rejected_score"] == 0.2

    # all-NULL-score prompts emit no pair at all (not a NULL-score pair)
    rows_all_null = [
        ("c1", 0, "user", "q", None, _ts(0)),
        ("c1", 1, "assistant", "a", None, _ts(1)),
        ("c2", 0, "user", "q", None, _ts(0)),
        ("c2", 1, "assistant", "b", None, _ts(1)),
    ]
    df2 = spark.createDataFrame(
        rows_all_null,
        "conv_id string, turn_idx int, role string, text string, "
        "reward double, ts timestamp",
    )
    assert preference_pairs(df2, score_col="reward").count() == 0
