"""WordPiece tokenizer: likelihood-ratio merges + max-munch apply.

Completes the tokenizer triad next to ``operators/bpe.py`` (frequency
merges) and ``operators/unigram.py`` (SentencePiece EM): WordPiece
(Schuster & Nakajima 2012; the BERT tokenizer) merges the adjacent
symbol pair maximizing the unigram-LM likelihood gain

    score(a, b) = count(ab) / (count(a) · count(b))

instead of the raw pair count, and applies the learned vocabulary by
greedy longest-match-first (max-munch) with ``##`` continuation pieces.

Scale shape mirrors the BPE module's division of labor:

- the ONE corpus-linear pass is the word census (reused from
  ``bpe.word_census`` — explode + map-side-combined groupBy);
- ``wordpiece_pair_scores`` (round-0 statistics) is distributed and
  SQL-replicable — the oracle-checked surface;
- the merge LOOP runs on the collected census (``strategy='local'``,
  cap-guarded like ``bpe_train`` — the census is the model-sized
  object, Heaps-law sublinear in corpus size). Exactness: an
  incremental pair-index trainer whose max-selection re-pushes every
  pair incident to a touched symbol (scores move when either ENDPOINT
  count moves — the lazy-heap trick BPE uses is not sufficient here
  because a merge can RAISE other pairs' scores via shrinking endpoint
  counts); pytest pins it against a naive full-rescan twin.
- ``wordpiece_apply`` broadcasts the vocabulary and max-munches each
  distinct word in an Arrow kernel (zero shuffle — the ``bpe_apply``
  broadcast shape, with a distinct-word memo inside each batch).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgfarm_spark.operators.bpe import MAX_LOCAL_VOCAB, word_census


def py_wp_symbols(word: str) -> list[str]:
    """WordPiece initial segmentation: first char bare, continuations
    ``##``-prefixed ('hello' → ['h', '##e', '##l', '##l', '##o'])."""
    return [word[0]] + ["##" + c for c in word[1:]]


def _wp_sym_expr(word) -> F.Column:
    """JVM twin of ``py_wp_symbols``: split to chars, prefix '##' on
    every position but the first."""
    chars = F.split(word, "")
    return F.concat(
        F.slice(chars, 1, 1),
        F.transform(
            F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))),
            lambda c: F.concat(F.lit("##"), c),
        ),
    )


def wordpiece_pair_scores(
    df: DataFrame,
    text_col: str = "text",
    pretokenize: str = "whitespace",
) -> DataFrame:
    """Round-0 WordPiece statistics straight off a document table:
    (left, right, pair_count, left_count, right_count, score) for every
    adjacent symbol pair, occurrence-weighted, score rounded to 9
    decimals (the ranking signal for the first merge).

    Distributed and oracle-checkable: census + position explode + two
    hash joins onto the symbol census — the ``bpe_pair_counts`` shape
    plus a symbol-count join."""
    census = word_census(df, text_col, pretokenize).withColumn(
        "__syms", _wp_sym_expr(F.col("word"))
    )
    pos = census.select(
        "count",
        F.explode(
            F.expr(
                "transform(sequence(0, size(__syms) - 1), "
                "i -> struct(__syms[i] AS s, i AS p))"
            )
        ).alias("__sp"),
        F.col("__syms").alias("__a"),
    )
    sym = pos.groupBy(F.col("__sp.s").alias("sym")).agg(
        F.sum("count").alias("sym_count")
    )
    pairs = (
        pos.filter(F.col("__sp.p") < F.size("__a") - 1)
        .select(
            "count",
            F.col("__sp.s").alias("left"),
            F.expr("__a[__sp.p + 1]").alias("right"),
        )
        .groupBy("left", "right")
        .agg(F.sum("count").alias("pair_count"))
    )
    return (
        pairs.join(sym.withColumnRenamed("sym", "left"), "left")
        .withColumnRenamed("sym_count", "left_count")
        .join(sym.withColumnRenamed("sym", "right"), "right")
        .withColumnRenamed("sym_count", "right_count")
        .select(
            "left",
            "right",
            "pair_count",
            "left_count",
            "right_count",
            F.round(
                F.col("pair_count")
                / (F.col("left_count") * F.col("right_count")).cast("double"),
                9,
            ).alias("score"),
        )
    )


def _fuse(left: str, right: str) -> str:
    """WordPiece merge: 'un' + '##able' → 'unable'; '##a' + '##b' → '##ab'.
    The right symbol of an in-word adjacency is always a continuation."""
    return left + (right[2:] if right.startswith("##") else right)


def py_wordpiece_train(
    words: list[str], counts: list[int], n_merges: int
) -> list[tuple[int, str, str, float]]:
    """Naive full-rescan textbook trainer — the parity reference.
    Tie-break: max score, then smallest (left, right) lexicographically.
    Pairs are counted occurrence-weighted; symbol counts likewise."""
    syms = [py_wp_symbols(w) for w in words]
    merges: list[tuple[int, str, str, float]] = []
    for rank in range(n_merges):
        pair_count: dict = {}
        sym_count: dict = {}
        for s, c in zip(syms, counts):
            for x in s:
                sym_count[x] = sym_count.get(x, 0) + c
            for p in zip(s, s[1:]):
                pair_count[p] = pair_count.get(p, 0) + c
        best, best_score = None, None
        for (l, r), pc in pair_count.items():
            sc = pc / (sym_count[l] * sym_count[r])
            if (
                best is None
                or sc > best_score
                or (sc == best_score and (l, r) < best)
            ):
                best, best_score = (l, r), sc
        if best is None:
            break
        l, r = best
        fused = _fuse(l, r)
        for i, s in enumerate(syms):
            out: list[str] = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = fused
                else:
                    out.append(x)
            syms[i] = out
        merges.append((rank, l, r, best_score))
    return merges


def _local_wp_loop(
    syms: list, counts: list, n_merges: int
) -> list[tuple[int, str, str, float]]:
    """Incremental exact WordPiece trainer over a collected census.

    Like ``bpe._local_merge_loop`` but score-driven, which breaks the
    plain lazy-heap: a merge that shrinks an endpoint's symbol count
    RAISES every sibling pair's score, so stale heap entries can
    under-estimate and the true max would never resurface. Fix: track
    the set of symbols whose count changed each merge and eagerly
    re-push every pair incident to them (via a symbol→pairs index).
    Output is EXACTLY the rescan twin's (pytest-pinned)."""
    import heapq

    pair_count: dict = {}
    sym_count: dict = {}
    pair_words: dict = {}
    sym_pairs: dict = {}
    for i, s in enumerate(syms):
        c = counts[i]
        for x in s:
            sym_count[x] = sym_count.get(x, 0) + c
        for p in zip(s, s[1:]):
            pair_count[p] = pair_count.get(p, 0) + c
            pair_words.setdefault(p, set()).add(i)

    def _score(p) -> float:
        return pair_count[p] / (sym_count[p[0]] * sym_count[p[1]])

    def _index(p) -> None:
        sym_pairs.setdefault(p[0], set()).add(p)
        sym_pairs.setdefault(p[1], set()).add(p)

    heap: list = []
    for p in pair_count:
        _index(p)
        heapq.heappush(heap, (-_score(p), p[0], p[1]))
    merges: list[tuple[int, str, str, float]] = []
    while len(merges) < n_merges and heap:
        negs, left, right = heapq.heappop(heap)
        p = (left, right)
        if p not in pair_count:
            continue
        live = _score(p)
        if live != -negs:
            heapq.heappush(heap, (-live, left, right))
            continue
        # deterministic tie-break: among equal scores the heap yields the
        # smallest (left, right) because the tuple orders on them next
        merges.append((len(merges), left, right, live))
        fused = _fuse(left, right)
        touched_syms = {left, right, fused}
        from collections import Counter

        for i in sorted(pair_words.get(p, ())):
            s = syms[i]
            c = counts[i]
            before_p = Counter(zip(s, s[1:]))
            before_s = Counter(s)
            out: list[str] = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = fused
                else:
                    out.append(x)
            syms[i] = out
            after_p = Counter(zip(out, out[1:]))
            after_s = Counter(out)
            for x in before_s.keys() | after_s.keys():
                d = after_s.get(x, 0) - before_s.get(x, 0)
                if d:
                    nc = sym_count.get(x, 0) + d * c
                    if nc > 0:
                        sym_count[x] = nc
                    else:
                        sym_count.pop(x, None)
                    touched_syms.add(x)
            for q in before_p.keys() | after_p.keys():
                d = after_p.get(q, 0) - before_p.get(q, 0)
                if d:
                    nc = pair_count.get(q, 0) + d * c
                    if nc > 0:
                        pair_count[q] = nc
                    else:
                        pair_count.pop(q, None)
                    touched_syms.add(q[0])
                    touched_syms.add(q[1])
                if after_p.get(q, 0) > 0:
                    pair_words.setdefault(q, set()).add(i)
                    _index(q)
                else:
                    w = pair_words.get(q)
                    if w is not None:
                        w.discard(i)
        pair_words.pop(p, None)
        pair_count.pop(p, None)
        # eager re-push: any pair touching a count-changed symbol has a
        # moved score (possibly UP) — re-push its live value
        for x in touched_syms:
            for q in list(sym_pairs.get(x, ())):
                if q in pair_count:
                    heapq.heappush(heap, (-_score(q), q[0], q[1]))
                else:
                    sym_pairs[x].discard(q)
    return merges


def wordpiece_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    pretokenize: str = "whitespace",
    min_count: int = 1,
    max_local_vocab: int = MAX_LOCAL_VOCAB,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` WordPiece merges. Returns ``(merges, vocab)``:

    - ``merges``: (rank, left, right, score) in merge order (score
      rounded to 9 decimals for display; selection uses full doubles);
    - ``vocab``: (piece) — initial symbols plus every fused piece, the
      max-munch dictionary for ``wordpiece_apply``.

    One corpus-linear census pass, then the exact incremental trainer
    on the collected census (cap-guarded at ``max_local_vocab`` — the
    ``bpe_train(strategy='local')`` contract; prune with ``min_count``
    past the cap)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    spark = df.sparkSession
    census = word_census(df, text_col, pretokenize)
    if min_count > 1:
        census = census.filter(F.col("count") >= min_count)
    pdf = census.toPandas()
    if len(pdf) > max_local_vocab:
        raise ValueError(
            f"census has {len(pdf):,} distinct words > max_local_vocab="
            f"{max_local_vocab:,}; raise min_count to prune the tail"
        )
    words = pdf["word"].tolist()
    counts = [int(c) for c in pdf["count"].tolist()]
    syms = [py_wp_symbols(w) for w in words]
    merges = _local_wp_loop(syms, counts, n_merges)
    vocab = sorted(
        {x for s in ([py_wp_symbols(w) for w in words]) for x in s}
        | {_fuse(l, r) for _, l, r, _ in merges}
    )
    merges_df = spark.createDataFrame(
        [(rk, l, r, float(round(sc, 9))) for rk, l, r, sc in merges]
        or [(-1, "", "", 0.0)],
        "rank int, left string, right string, score double",
    ).filter(F.col("rank") >= 0)
    vocab_df = spark.createDataFrame([(v,) for v in vocab], "piece string")
    return merges_df, vocab_df


def py_wordpiece_apply(
    word: str, vocab: set, unk: str = "[UNK]", max_word_len: int = 200
) -> list[str]:
    """Greedy longest-match-first (BERT WordPiece): repeatedly take the
    longest vocab piece matching the current prefix (continuations are
    looked up WITH the '##'); any miss makes the whole word ``unk``."""
    if len(word) > max_word_len:
        return [unk]
    out: list[str] = []
    i = 0
    while i < len(word):
        j = len(word)
        piece = None
        while j > i:
            cand = word[i:j] if i == 0 else "##" + word[i:j]
            # a word-initial RAW prefix must not match a '##'-prefixed
            # CONTINUATION entry (a literal '##ab' word vs the
            # continuation piece '##ab'): the '##' convention encodes
            # position, and a false match desyncs every downstream
            # offset derivation that subtracts the marker length
            # (r06 advisor finding)
            if cand in vocab and not (i == 0 and cand.startswith("##")):
                piece = cand
                break
            j -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        i = j
    return out


def wordpiece_apply(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    pretokenize: str = "whitespace",
    unk: str = "[UNK]",
    max_word_len: int = 200,
    max_vocab_broadcast: int = 5_000_000,
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize the corpus with a learned WordPiece vocabulary:
    (id, tokens array<string>, n_tokens). The vocabulary broadcasts
    (vocab-sized, cap-guarded) and each Arrow batch max-munches its rows
    with a distinct-word memo — zero shuffle, the ``bpe_apply``
    broadcast shape."""
    from kgfarm_spark.operators.bpe import _pretok_expr

    n_vocab = vocab.count()
    if n_vocab > max_vocab_broadcast:
        raise ValueError(
            f"vocab has {n_vocab:,} pieces > max_vocab_broadcast="
            f"{max_vocab_broadcast:,}"
        )
    vset = {r["piece"] for r in vocab.collect()}
    bc = df.sparkSession.sparkContext.broadcast(vset)

    @F.pandas_udf("array<string>")
    def _tok(words: pd.Series) -> pd.Series:
        v = bc.value
        memo: dict = {}
        out = []
        for arr in words:
            toks: list[str] = []
            for w in arr:
                got = memo.get(w)
                if got is None:
                    got = py_wordpiece_apply(w, v, unk, max_word_len)
                    memo[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    words_col = _pretok_expr(F.coalesce(F.col(text_col), F.lit("")), pretokenize)
    return df.select(
        id_col, _tok(words_col).alias(out_col)
    ).withColumn("n_tokens", F.size(out_col).cast("int"))


# Java \s (the _pretok_expr whitespace definition) is ASCII-only — the
# offset kernel must split EXACTLY like the JVM path or tokens desync
import re

_JAVA_NONWS = re.compile(r"[^ \t\n\x0b\f\r]+")


def _word_offset_pieces(
    w: str, vocab: set, unk: str, max_word_len: int
) -> tuple[list[str], list[int], list[int]]:
    """One word → (pieces, word-relative starts, word-relative ends).
    Pure function of the word — the memoizable unit."""
    pieces = py_wordpiece_apply(w, vocab, unk, max_word_len)
    if pieces == [unk]:
        return [unk], [0], [len(w)]
    starts: list[int] = []
    ends: list[int] = []
    i = 0
    for p in pieces:
        ln = len(p) - 2 if p.startswith("##") else len(p)
        starts.append(i)
        ends.append(i + ln)
        i += ln
    return pieces, starts, ends


def py_wordpiece_offsets(
    text: str,
    vocab: set,
    unk: str = "[UNK]",
    max_word_len: int = 200,
    memo: dict | None = None,
) -> tuple[list[str], list[int], list[int]]:
    """Max-munch with character offsets: returns (tokens, starts, ends)
    with ``text[starts[i]:ends[i]]`` the surface of token i (an UNK or
    over-length word yields one token covering the whole word). The
    token sequence equals ``py_wordpiece_apply`` over the same words.

    ``memo`` (word → relative pieces/offsets) amortizes the O(len²)
    max-munch across repeated words — on Zipf-distributed text the hit
    rate is the repetition rate, the same distinct-word memo as
    ``wordpiece_apply``/``unigram_apply``."""
    toks: list[str] = []
    starts: list[int] = []
    ends: list[int] = []
    for m in _JAVA_NONWS.finditer(text):
        w = m.group()
        base = m.start()
        hit = memo.get(w) if memo is not None else None
        if hit is None:
            hit = _word_offset_pieces(w, vocab, unk, max_word_len)
            if memo is not None:
                memo[w] = hit
        pieces, rel_s, rel_e = hit
        toks.extend(pieces)
        starts.extend(base + s for s in rel_s)
        ends.extend(base + e for e in rel_e)
    return toks, starts, ends


def _resolve_vocab_set(
    vocab: DataFrame, max_vocab_broadcast: int = 5_000_000
) -> set:
    """Collect a WordPiece vocabulary frame to the broadcastable piece
    set, cap-guarded like ``bpe_apply``'s broadcast path."""
    n_vocab = vocab.count()
    if n_vocab > max_vocab_broadcast:
        raise ValueError(
            f"vocab has {n_vocab:,} pieces > max_vocab_broadcast="
            f"{max_vocab_broadcast:,}"
        )
    return {r["piece"] for r in vocab.collect()}


def wordpiece_tokenize_with_offsets(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    unk: str = "[UNK]",
    max_word_len: int = 200,
    max_vocab_broadcast: int = 5_000_000,
) -> DataFrame:
    """Offset-preserving tokenization: (id, tokens, starts, ends) with
    ``text[starts[i]:ends[i]]`` each token's surface — the primitive
    that lets char-level annotations (loss-mask spans, PII spans,
    decontamination hits) transfer onto token sequences. Broadcast
    vocab, Arrow kernel, zero shuffle (the ``wordpiece_apply`` shape;
    the whitespace scan replicates the JVM pre-tokenizer's ASCII-\\s
    semantics so both paths see identical words)."""
    vset = _resolve_vocab_set(vocab, max_vocab_broadcast)
    bc = df.sparkSession.sparkContext.broadcast(vset)

    @F.pandas_udf(
        "struct<tokens:array<string>,starts:array<int>,ends:array<int>>"
    )
    def _tok(texts: pd.Series) -> pd.DataFrame:
        v = bc.value
        memo: dict = {}  # distinct-word pieces/offsets, shared per batch
        rows = []
        for t in texts:
            toks, st, en = py_wordpiece_offsets(
                t or "", v, unk, max_word_len, memo=memo
            )
            rows.append({"tokens": toks, "starts": st, "ends": en})
        return pd.DataFrame(rows)

    out = df.select(
        id_col,
        _tok(F.coalesce(F.col(text_col), F.lit(""))).alias("__t"),
    )
    return out.select(
        id_col,
        F.col("__t.tokens").alias("tokens"),
        F.col("__t.starts").alias("starts"),
        F.col("__t.ends").alias("ends"),
    ).withColumn("n_tokens", F.size("tokens").cast("int"))
