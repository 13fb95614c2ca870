"""SentencePiece-style unigram-LM tokenizer induction (Kudo 2018,
"Subword Regularization: Improving Neural Network Translation Models
with Multiple Subword Candidates" — the `--model_type=unigram` trainer
every SentencePiece deployment runs).

Scale decomposition mirrors ``operators/bpe.py``: every statistic the
trainer needs is a function of the WORD CENSUS (distinct word, count) —
the corpus-linear work happens once, in the census groupBy; the
candidate-piece seeding is one census-sized substring explode; each EM
iteration is one embarrassingly-parallel pass over the census (words
are independent given the piece probabilities, which broadcast as a
vocab-sized dict) with a piece-keyed groupBy-sum reduce. Nothing in the
merge^H^H^H^H^Hfit loop ever touches the corpus again.

Algorithm (the standard reimplementation of Kudo §3.2, deviations
noted):

1. **Seed**: occurrence-weighted substring census up to
   ``max_piece_len`` chars; keep every single character (coverage
   guarantee) plus the top ``seed_size`` multi-char substrings by
   count. (SentencePiece seeds from suffix-array top substrings; the
   frequency-ranked substring census is the standard equivalent.)
2. **EM**: E-step computes expected piece counts per census word by
   forward-backward over the segmentation lattice (log-space); M-step
   renormalizes. Distributed E-step = ``mapInPandas`` over census
   partitions + groupBy-sum; 'local' = the same kernel over the
   collected census (model-sized by the Heaps-law argument —
   ``bpe_train(strategy='local')``'s rationale).
3. **Prune**: after each EM round, keep all single chars + the top
   ``shrink``-fraction of multi-char pieces ranked by expected count
   (rounded to 6, ties by piece — deterministic and
   partition-invariant). This is the common expected-count
   approximation of Kudo's exact leave-one-out likelihood loss; the
   docstring-level contract is determinism + parity with the
   pure-Python twin, not bit-parity with the SentencePiece binary.
4. Repeat 2-3 until the vocabulary fits ``vocab_size``, then one final
   EM settles the probabilities.

Apply (``unigram_apply``) is Viterbi decoding per pre-token with the
piece log-probs broadcast — the ``bpe_apply`` broadcast shape: JVM
pre-tokenization, Arrow-batched Python Viterbi (word-length dynamic
program, no per-row Python UDF), zero shuffle. Characters unseen at
train time decode at the OOV floor so every string is segmentable.

Parity: tests/test_pipeline_ops.py pins the trainer against an
independent pure-Python EM reference (same seed, same schedule):
identical vocabulary sets, probabilities to 1e-9, identical Viterbi
segmentations; strategy='local' == 'distributed'; partition invariance.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgfarm_spark.operators.bpe import word_census

_NEG = float("-inf")


def substring_census(census: DataFrame, max_piece_len: int = 8) -> DataFrame:
    """Occurrence-weighted substring counts over a (word, count) census —
    the unigram trainer's seed statistic. One census-sized explode
    (≤ len × max_piece_len substrings per distinct word) + one
    map-side-combined groupBy; the corpus is never touched."""
    if max_piece_len < 1:
        raise ValueError(f"max_piece_len must be >= 1, got {max_piece_len}")
    subs = F.expr(
        f"flatten(transform(sequence(1, least(length(word), {max_piece_len})), "
        f"l -> transform(sequence(1, length(word) - l + 1), "
        f"i -> substring(word, i, l))))"
    )
    return (
        census.select(F.explode(subs).alias("piece"), "count")
        .groupBy("piece")
        .agg(F.sum("count").alias("piece_count"))
    )


def unigram_seed_counts(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 8,
    pretokenize: str = "whitespace",
) -> DataFrame:
    """Seed-stage statistics straight off a document table (the
    oracle-checkable face of the trainer): word census → substring
    census. Returns (piece, piece_count)."""
    return substring_census(word_census(df, text_col, pretokenize), max_piece_len)


def _em_word(word: str, c: int, logp: dict, max_len: int):
    """Forward-backward expected piece counts for ONE census word with
    frequency ``c``. Returns (piece → expected count, c·log Z) or None
    when the word cannot be segmented from the current vocabulary
    (cannot happen while all its single chars are kept)."""
    n = len(word)
    alpha = [_NEG] * (n + 1)
    alpha[0] = 0.0
    for j in range(1, n + 1):
        acc = _NEG
        for i in range(max(0, j - max_len), j):
            ai = alpha[i]
            if ai == _NEG:
                continue
            lp = logp.get(word[i:j])
            if lp is None:
                continue
            x = ai + lp
            acc = x if acc == _NEG else (
                acc + math.log1p(math.exp(x - acc)) if acc >= x
                else x + math.log1p(math.exp(acc - x))
            )
        alpha[j] = acc
    z = alpha[n]
    if z == _NEG:
        return None
    beta = [_NEG] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        acc = _NEG
        for j in range(i + 1, min(n, i + max_len) + 1):
            bj = beta[j]
            if bj == _NEG:
                continue
            lp = logp.get(word[i:j])
            if lp is None:
                continue
            x = lp + bj
            acc = x if acc == _NEG else (
                acc + math.log1p(math.exp(x - acc)) if acc >= x
                else x + math.log1p(math.exp(acc - x))
            )
        beta[i] = acc
    out: dict = {}
    for i in range(n):
        ai = alpha[i]
        if ai == _NEG:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            if beta[j] == _NEG:
                continue
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                continue
            e = math.exp(ai + lp + beta[j] - z) * c
            if e > 0.0:
                out[p] = out.get(p, 0.0) + e
    return out, z * c


def _estep_distributed(census: DataFrame, logp: dict, max_len: int) -> dict:
    """One distributed E-step: broadcast the piece log-probs (vocab-
    sized), run the forward-backward kernel per census partition inside
    Arrow batches, reduce per-piece expected counts with a groupBy-sum,
    collect the vocab-sized result."""
    import pandas as pd

    spark = census.sparkSession
    bc = spark.sparkContext.broadcast((logp, max_len))

    def gen(batches):
        lp, ml = bc.value
        acc: dict = {}
        for pdf in batches:
            for w, c in zip(pdf["word"], pdf["count"]):
                r = _em_word(w, int(c), lp, ml)
                if r is None:
                    continue
                for k, v in r[0].items():
                    acc[k] = acc.get(k, 0.0) + v
        yield pd.DataFrame(
            {"piece": list(acc.keys()), "e": list(acc.values())}
        )

    rows = (
        census.mapInPandas(gen, "piece string, e double")
        .groupBy("piece")
        .agg(F.sum("e").alias("e"))
        .collect()
    )
    bc.unpersist()
    return {r["piece"]: r["e"] for r in rows}


def _estep_local(pairs: list, logp: dict, max_len: int) -> dict:
    """strategy='local' twin of the E-step over the collected census."""
    acc: dict = {}
    for w, c in pairs:
        r = _em_word(w, c, logp, max_len)
        if r is None:
            continue
        for k, v in r[0].items():
            acc[k] = acc.get(k, 0.0) + v
    return acc


def _mstep(e_counts: dict) -> dict:
    total = sum(e_counts.values())
    return {p: math.log(v / total) for p, v in e_counts.items() if v > 0.0}


def _char_floor(e_counts: dict, chars: set) -> dict:
    """Pin every alphabet character into the expected counts with a
    floor of 1e-10 × total mass. EM legitimately drives a character's
    expected count to EXACT zero once multi-char pieces fully cover
    every word containing it — but dropping it breaks the coverage
    guarantee the moment a later prune removes the covering piece (the
    word becomes unsegmentable and silently contributes nothing; the
    trainer then collapses onto whatever fragments remain — observed on
    the smoke corpus: final vocab ['est', 'new']). SentencePiece pins
    single characters for exactly this reason (required_chars in the
    trainer). The floor is relative, so the fix is scale-free."""
    total = sum(e_counts.values()) or 1.0
    eps = 1e-10 * total
    out = dict(e_counts)
    for ch in chars:
        if out.get(ch, 0.0) < eps:
            out[ch] = eps
    return out


def _prune(logp_pieces: dict, e_counts: dict, keep_multi: int) -> dict:
    """Keep every single-char piece (coverage guarantee) + the top
    ``keep_multi`` multi-char pieces by expected count. Ranking rounds
    to 6 decimals with the piece string as tie-break, so the result is
    deterministic and identical across partitionings/strategies."""
    chars = {p for p in logp_pieces if len(p) == 1}
    multi = sorted(
        (p for p in logp_pieces if len(p) > 1),
        key=lambda p: (-round(e_counts.get(p, 0.0), 6), p),
    )[:keep_multi]
    return {p: logp_pieces[p] for p in chars | set(multi)}


#: census-collect cap for strategy='local' (the bpe_train rationale)
MAX_LOCAL_VOCAB = 5_000_000


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 2000,
    max_piece_len: int = 8,
    seed_size: int = 100_000,
    em_iters: int = 2,
    shrink: float = 0.75,
    pretokenize: str = "whitespace",
    strategy: str = "distributed",
    min_count: int = 1,
    max_local_vocab: int = MAX_LOCAL_VOCAB,
    stats: dict | None = None,
) -> DataFrame:
    """Train a unigram-LM tokenizer; returns the piece table
    ``(piece, logprob)`` (natural log, the model ``unigram_apply``
    decodes with).

    ``strategy='distributed'`` runs each E-step as a Spark pass over
    the census (the 100 TB shape: corpus-linear work only in the census
    groupBy, EM passes census-sized, model vocab-sized). ``'local'``
    collects the census once (cap-guarded at ``max_local_vocab``) and
    runs the identical kernel in-driver — the right call whenever the
    census fits, exactly like ``bpe_train(strategy='local')``.
    ``min_count`` prunes census words rarer than the threshold before
    training (the Heaps-law tail lever), in both strategies.

    Determinism: the EM fixed point depends only on the seed and the
    schedule; pruning ranks on 6-decimal-rounded expected counts with
    lexicographic tie-break, so vocabularies are identical across
    partitionings and strategies (pytest-pinned).
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    if seed_size < 1:
        raise ValueError(f"seed_size must be >= 1, got {seed_size}")
    if em_iters < 1:
        raise ValueError(f"em_iters must be >= 1, got {em_iters}")
    if not 0.0 < shrink < 1.0:
        raise ValueError(f"shrink must be in (0, 1), got {shrink}")
    if strategy not in ("distributed", "local"):
        raise ValueError(
            f"strategy must be 'distributed' or 'local', got {strategy!r}"
        )
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    spark = df.sparkSession
    census = word_census(df, text_col, pretokenize)
    if min_count > 1:
        census = census.filter(F.col("count") >= min_count)
    census = census.localCheckpoint(eager=True)  # census pass paid once

    # --- seed: all single chars + top multi-char substrings by count
    subs = substring_census(census, max_piece_len)
    seed_chars = subs.filter(F.length("piece") == 1)
    seed_multi = (
        subs.filter(F.length("piece") > 1)
        .orderBy(F.desc("piece_count"), F.asc("piece"))
        .limit(seed_size)
    )
    seed_rows = seed_chars.unionByName(seed_multi).collect()
    counts0 = {r["piece"]: float(r["piece_count"]) for r in seed_rows}
    if not counts0:
        return spark.createDataFrame([], "piece string, logprob double")
    logp = _mstep(counts0)

    pairs = None
    if strategy == "local":
        pdf = census.toPandas()
        if len(pdf) > max_local_vocab:
            raise ValueError(
                f"census has {len(pdf):,} distinct words > max_local_vocab="
                f"{max_local_vocab:,}; raise min_count to prune the tail or "
                "use strategy='distributed'"
            )
        pairs = list(zip(pdf["word"].tolist(), (int(c) for c in pdf["count"])))

    def estep(lp: dict) -> dict:
        if pairs is not None:
            return _estep_local(pairs, lp, max_piece_len)
        return _estep_distributed(census, lp, max_piece_len)

    alphabet = {p for p in logp if len(p) == 1}
    n_chars = len(alphabet)
    passes = 0
    while True:
        e: dict = {}
        for _ in range(em_iters):
            e = _char_floor(estep(logp), alphabet)
            logp = _mstep(e)
            passes += 1
        n_multi = sum(1 for p in logp if len(p) > 1)
        target_multi = max(vocab_size - n_chars, 0)
        if n_multi <= target_multi:
            break
        keep = max(target_multi, int(n_multi * shrink))
        logp = _prune(logp, e, keep)
        # renormalize over the kept pieces (their expected mass)
        logp = _mstep({p: e.get(p, 0.0) for p in logp})
    if stats is not None:
        stats["em_passes"] = passes
        stats["vocab"] = len(logp)
    return spark.createDataFrame(
        sorted(logp.items()), "piece string, logprob double"
    )


def py_viterbi(
    word: str, logp: dict, max_len: int, oov_logprob: float
) -> list[str]:
    """Deterministic Viterbi segmentation of one pre-token: maximize the
    piece log-prob sum; characters missing from the vocabulary score at
    ``oov_logprob`` so every string is segmentable. Ties prefer the
    LONGER final piece at each position (first-best under the i-
    ascending scan with strict improvement)."""
    n = len(word)
    if n == 0:
        return []
    best = [_NEG] * (n + 1)
    back = [0] * (n + 1)
    best[0] = 0.0
    for j in range(1, n + 1):
        for i in range(max(0, j - max_len), j):
            if best[i] == _NEG:
                continue
            p = word[i:j]
            lp = logp.get(p)
            if lp is None:
                if j - i > 1:
                    continue
                lp = oov_logprob  # single-char OOV fallback
            s = best[i] + lp
            if s > best[j]:
                best[j] = s
                back[j] = i
    out = []
    j = n
    while j > 0:
        i = back[j]
        out.append(word[i:j])
        j = i
    return out[::-1]


def unigram_apply(
    df: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "tokens",
    pretokenize: str = "whitespace",
    max_piece_len: int = 8,
) -> DataFrame:
    """Tokenize a document table with a trained piece table — the
    ``bpe_apply`` broadcast shape: the vocab-sized (piece, logprob)
    table ships once per executor, pre-tokenization runs JVM-side
    (the same ``_pretok_expr`` the census used, so train/apply word
    boundaries can never drift), and the Viterbi DP runs Arrow-batched
    per pre-token. Zero shuffle anywhere in the plan. OOV floor =
    (min piece logprob − ln 100): strictly below every trained piece,
    deterministic, so unseen characters survive as single-char tokens.

    Returns the input plus ``out_col: array<string>``; NULL text → []."""
    import pandas as pd

    from kgfarm_spark.operators.bpe import _pretok_expr

    if out_col in df.columns:
        raise ValueError(
            f"out_col {out_col!r} collides with an input column; rename it"
        )
    spark = df.sparkSession
    rows = pieces.collect()
    logp = {r["piece"]: float(r["logprob"]) for r in rows}
    oov = (min(logp.values()) if logp else 0.0) - math.log(100.0)
    bc = spark.sparkContext.broadcast((logp, max_piece_len, oov))
    pre = df.withColumn(
        "__pretoks", _pretok_expr(F.coalesce(F.col(text_col), F.lit("")), pretokenize)
    )

    def gen(batches):
        lp, ml, ov = bc.value
        cache: dict = {}
        for pdf in batches:
            toks = []
            for arr in pdf["__pretoks"]:
                doc: list[str] = []
                for w in arr:
                    seg = cache.get(w)
                    if seg is None:
                        seg = py_viterbi(w, lp, ml, ov)
                        if len(cache) < 1_000_000:
                            cache[w] = seg
                    doc.extend(seg)
                toks.append(doc)
            pdf = pdf.copy()
            pdf[out_col] = pd.Series(toks, index=pdf.index, dtype=object)
            yield pdf

    schema = ", ".join(
        f"`{f.name}` {pre.schema[f.name].dataType.simpleString()}"
        for f in pre.schema.fields
    ) + f", `{out_col}` array<string>"
    res = pre.mapInPandas(gen, schema)
    return res.drop("__pretoks")
