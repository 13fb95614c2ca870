"""Property-based tests (hypothesis) for the round-6 training-example
constructors: chunking coverage/reconstruction, truncation suffix
invariants, and preference-pair extremum correctness vs a brute-force
twin — random small inputs, Spark result checked against pure Python.
"""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

word = st.text(alphabet="abcxyz", min_size=1, max_size=4)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(word, min_size=1, max_size=40),
    window=st.integers(min_value=1, max_value=8),
    stride_off=st.integers(min_value=0, max_value=7),
)
def test_chunk_documents_coverage_property(spark, words, window, stride_off):
    from kgfarm_spark.operators.packing import chunk_documents

    stride = max(1, min(window, 1 + stride_off))
    df = spark.createDataFrame([(1, " ".join(words))], "doc_id long, text string")
    out = sorted(
        chunk_documents(df, window=window, stride=stride).collect(),
        key=lambda r: r["chunk_idx"],
    )
    n = len(words)
    # chunk i is exactly words[i*stride : i*stride + window]
    for r in out:
        i = r["chunk_idx"]
        want = words[i * stride : i * stride + window]
        assert r["chunk_text"].split(" ") == want
        assert r["n_tokens"] == len(want)
    # coverage: every word index is inside at least one chunk
    covered = set()
    for r in out:
        covered.update(range(r["chunk_idx"] * stride,
                             r["chunk_idx"] * stride + r["n_tokens"]))
    assert covered == set(range(n))
    # chunk count matches the closed form
    import math
    want_k = 1 if n <= window else math.ceil((n - window) / stride) + 1
    assert len(out) == want_k


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    counts=st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=10),
    budget=st.integers(min_value=1, max_value=12),
)
def test_truncate_to_context_property(spark, counts, budget):
    from kgfarm_spark.operators.conversations import truncate_to_context

    rows = [("c", i, "user", " ".join(f"w{j}" for j in range(k)) or None)
            for i, k in enumerate(counts)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    kept = sorted(r["turn_idx"] for r in truncate_to_context(df, budget=budget).collect())
    # brute force: maximal suffix fitting budget, final turn always kept
    want, total = [], 0
    for i in range(len(counts) - 1, -1, -1):
        total += counts[i]
        if total <= budget or i == len(counts) - 1:
            if total <= budget or not want:
                want.append(i)
            else:
                break
        else:
            break
    assert kept == sorted(want)
    # kept set is a contiguous SUFFIX of turn indices
    assert kept == list(range(min(kept), len(counts)))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    responses=st.lists(
        st.text(alphabet="pqr", min_size=1, max_size=5), min_size=1, max_size=8
    ),
)
def test_preference_pairs_extrema_property(spark, responses):
    from kgfarm_spark.operators.conversations import preference_pairs

    rows = []
    for i, resp in enumerate(responses):
        rows.append((f"c{i}", 0, "user", "q"))
        rows.append((f"c{i}", 1, "assistant", resp))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")
    got = preference_pairs(df).collect()
    key = lambda r: (len(r), r)
    distinct = set(responses)
    if len(distinct) < 2:
        assert got == []
        return
    assert len(got) == 1
    p = got[0]
    assert p["chosen"] == max(distinct, key=key)
    assert p["rejected"] == min(distinct, key=key)
    assert p["n_candidates"] == len(responses)
    assert p["chosen_score"] == len(p["chosen"])
    assert p["rejected_score"] == len(p["rejected"])
