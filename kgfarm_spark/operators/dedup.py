"""Deduplication operators over document tables — the training-data
pipeline family (task brief): exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Everything is expressed as DataFrame ops (explode → join → agg); the hash
kernels use md5 (portable — the DuckDB oracle computes bit-identical
signatures) plus a fast xxhash64 variant for production use.

Scale notes:
- exact_dedup: one shuffle on the dedup key (hash groupBy).
- jaccard_pairs: shingle-explode (|D|·s rows) → self-join on shingle.
  The shingle join is THE scale hazard (hot shingles fan out
  quadratically); ``max_shingle_freq`` drops shingles seen in > N docs —
  stopword-shingles carry no dedup signal but dominate join cost.
- MinHash+LSH: replaces the quadratic shingle join with a band-bucket
  join: candidates share a band signature; only candidates get the exact
  Jaccard verification. This is the 100 TB path (cost ≈ |D|·bands).
- SimHash: one pass, no join for the fingerprint; near-dup via bucket
  grouping on the fingerprint (exact-bucket) or banded bits
  (``simhash_neardup_pairs`` — pigeonhole-complete Hamming-ball search).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Production near-dup preset (VERDICT r02 'wrong #3'). The gate default
#: (num_hashes=8, bands=4 → 2 rows/band, portable md5 so DuckDB can check
#: it) has candidate probability P(J) = 1-(1-J^r)^b ≈ 0.68 at Jaccard 0.5
#: — fine for the oracle gate, too lossy for production near-dup at the
#: typical 0.7-0.8 thresholds. This preset (r=4, 32 bands, xxhash64) gives
#: theoretical P(0.5)=0.87, P(0.7)=0.9996, P(0.9)≈1-1e-18; the MEASURED
#: deterministic recall curve on a controlled-Jaccard corpus is pinned in
#: tests/test_lsh_recall.py and recorded in BENCH.md §4.
LSH_PRODUCTION = {"num_hashes": 128, "bands": 32, "portable": False}


def exact_dedup(df: DataFrame, on: list[str], order_col: str) -> DataFrame:
    """Keep one row per duplicate group (lowest ``order_col``). A1-style
    hash groupBy, one shuffle. A content hash of the row is the second
    sort key, so ties on ``order_col`` pick a DETERMINISTIC survivor
    (review finding: row_number over a non-unique ordering picks
    whichever row the shuffle delivered first); rows identical in every
    column remain interchangeable, which is harmless. Map-typed columns
    are excluded from the tie-break hash — xxhash64 does not support
    MapType, so hashing the full row failed analysis on any frame with a
    map column (advisor finding, r05); rows tied on order_col AND every
    hashable column then remain shuffle-ordered, the pre-r05 behavior,
    only for frames whose sole distinguishing columns are maps."""
    # recursive check: xxhash64 rejects MAP anywhere in the type tree
    # (struct<m: map<...>>, array<map<...>>), not just top level
    hashable = [c for c, t in df.dtypes if "map<" not in t]
    tie = (
        F.xxhash64(F.struct(*hashable)).asc()
        if hashable
        else F.lit(0).asc()
    )
    w = Window.partitionBy(*on).orderBy(F.col(order_col).asc(), tie)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def word_shingles(df: DataFrame, text_col: str, n: int = 3) -> DataFrame:
    """Add ``shingle`` (exploded, distinct per doc) — n-word shingles.
    The text is tokenized ONCE into a pre-projected array column (the
    naive inline expression re-splits the string per sub-expression), and
    per-doc dedup happens via array_distinct BEFORE the explode — no
    wide dropDuplicates shuffle carrying the full text per shingle.
    Tokenization is \\s+ with empty tokens dropped and NULL text
    coalesced (review finding: the earlier single-space split embedded
    '' tokens in shingles, so a doc differing from its duplicate only by
    a doubled space got near-disjoint shingles and every
    jaccard/minhash/decontaminate consumer missed it — now consistent
    with duplicate_ngram_spans and the textstats tokenizer)."""
    toks = df.withColumn(
        "__toks",
        F.filter(
            F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
            lambda w: F.length(w) > 0,
        ),
    )
    sh = F.when(
        F.size("__toks") >= n,
        F.expr(
            f"array_distinct(transform(sequence(0, size(__toks) - {n}), "
            f"i -> concat_ws(' ', slice(__toks, i + 1, {n}))))"
        ),
    ).otherwise(F.array())
    return toks.withColumn("shingle", F.explode(sh)).drop("__toks")


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) distinct pairs — zero shuffles (array_distinct
    dedups within the doc; ids are unique so no cross-row dedup needed)."""
    return word_shingles(df.select(id_col, text_col), text_col, n).select(
        id_col, "shingle"
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = 1000,
) -> DataFrame:
    """All pairs (a < b) with n-gram Jaccard ≥ threshold.

    |A∩B| from a self-join on shingle; |A∪B| = |A|+|B|-|A∩B| from per-doc
    shingle counts. ``max_shingle_freq`` prunes super-frequent shingles
    before the join (skew guard — see module docstring). Sizes are
    computed from the UNPRUNED shingle set: pruning only shrinks the
    join (|A∩B| can only undercount, so pruning stays conservative) —
    sizing after the prune inflated Jaccard for hot-shingle-dominated
    docs, disagreeing with minhash_lsh_dedup_pairs' unpruned verify
    score on the same pair (review finding)."""
    s = _doc_shingles(df, id_col, text_col, n)
    sizes = s.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
    if max_shingle_freq is not None:
        freq = s.groupBy("shingle").agg(F.count(F.lit(1)).alias("__f"))
        s = s.join(freq.filter(F.col("__f") <= max_shingle_freq), "shingle").drop("__f")
    a = s.select(F.col(id_col).alias("id_a"), "shingle")
    b = s.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("__sza")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("__inter") / (F.col("__sza") + F.col("__szb") - F.col("__inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def dedup_by_pairs(df: DataFrame, pairs: DataFrame, id_col: str) -> DataFrame:
    """Drop the higher id of each near-dup pair (greedy, deterministic —
    the reference's correlation pruning uses the same keep-one-of-pair
    shape, interface/apis.py:287-293).

    Note the greedy rule can over-drop on chains (pairs (a,b) and (b,c)
    drop BOTH b and c even when a,c are not near-dups). That matches the
    reference's pair semantics; for cluster-correct keep-one-per-group
    semantics use ``dedup_components`` + ``dedup_keep_component_min``."""
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def dedup_components(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over the near-dup pair graph — (id, component)
    with component = the MINIMUM id reachable from ``id``. This is the
    cluster-resolution step industrial dedup needs: near-dup relations
    are not transitive pair-by-pair, but a dup CLUSTER (a-b, b-c) must
    elect exactly one representative.

    Algorithm: iterative min-label propagation over the undirected edge
    list, accelerated with POINTER DOUBLING — each round every node
    first adopts min(own label, neighbors' labels), then shortcuts to
    its label's label (component ← label(component)). The shortcut step
    halves the remaining path length every round (the same diameter-
    halving idea as the large-star/small-star CC algorithm, Kiveris et
    al., "Connected Components in MapReduce and Beyond", SoCC'14), so a
    chain of length L converges in O(log L) rounds instead of O(L):
    a 10k-deep chain fits comfortably inside the default max_iter=20.
    Each round is two joins + one groupBy (3 shuffles) over the EDGE
    list / label table only (never the corpus). Convergence is checked
    with one count per round (driver scalar), and intermediate frames
    are localCheckpointed to keep the plan from growing exponentially
    across iterations."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    edges = pairs.select(
        F.col("id_a").alias("__src"), F.col("id_b").alias("__dst")
    )
    und = edges.union(
        edges.select(F.col("__dst").alias("__src"), F.col("__src").alias("__dst"))
    )
    und = und.localCheckpoint(eager=True)
    labels = (
        und.select(F.col("__src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for _ in range(max_iter):
        # candidate label per node: min over neighbors' current labels
        nbr = (
            und.join(labels.withColumnRenamed("id", "__dst"), "__dst")
            .groupBy("__src")
            .agg(F.min("component").alias("__nbr_min"))
            .withColumnRenamed("__src", "id")
        )
        after_nbr = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("__nbr_min"), F.col("component"))
                ).alias("component"),
            )
            # checkpointed because BOTH sides of the shortcut join read it
            .localCheckpoint(eager=True)
        )
        # pointer doubling: component ← label(component). Since labels
        # only ever DECREASE toward the component min, label(component)
        # <= component, so F.least is a no-op guard for the root rows
        # (whose component may not appear as an id after the nbr step).
        shortcut = after_nbr.select(
            F.col("id").alias("component"), F.col("component").alias("__cc")
        )
        new_labels = (
            after_nbr.join(shortcut, "component", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("__cc"), F.col("component"))
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # silent early stop would return WRONG components for clusters
        # whose diameter exceeds max_iter — fail loudly instead
        raise RuntimeError(
            f"dedup_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing); the pair graph contains a "
            "chain longer than max_iter — raise max_iter"
        )
    return labels


def dedup_keep_component_min(
    df: DataFrame, pairs: DataFrame, id_col: str, max_iter: int = 20
) -> DataFrame:
    """Keep exactly ONE row (the minimum id) per near-dup component, and
    every row that appears in no pair. Cluster-correct alternative to
    ``dedup_by_pairs`` (see its over-drop note)."""
    comp = dedup_components(pairs, max_iter=max_iter)
    losers = comp.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


def dedup_keep_component_best(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    score_col: str,
    max_iter: int = 20,
) -> DataFrame:
    """Keep the BEST-``score_col`` row per near-dup component (ties break
    toward the larger id — struct-max, deterministic), plus every row in
    no pair. The quality-aware resolution production dedup pipelines use
    instead of the arbitrary min-id rule: score with length, LM score
    (``unigram_logprob``), or a quality-gate signal so the cluster's most
    useful duplicate survives.

    Cost over ``dedup_keep_component_min``: one extra groupBy over the
    LABELED rows only (component members, usually a small fraction of
    the corpus) — the argmax is a map-side-combinable struct max, never
    a window over the whole table."""
    comp = dedup_components(pairs, max_iter=max_iter)
    labeled = df.join(
        comp.withColumnRenamed("id", id_col).select(id_col, "component"),
        id_col,
    ).select(id_col, "component", score_col)
    winners = (
        labeled.groupBy("component")
        .agg(
            F.max(
                F.struct(F.col(score_col).alias("s"), F.col(id_col).alias("i"))
            ).alias("__w")
        )
        .select(F.col("__w.i").alias(id_col))
    )
    losers = labeled.join(winners, id_col, "left_anti").select(id_col)
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    portable: bool = True,
    shingles: DataFrame | None = None,
    with_sizes: bool = False,
) -> DataFrame:
    """Per-doc MinHash signature: component i = min over shingles of
    h(shingle, i). ``portable=True`` uses md5 hex strings (bit-identical
    in DuckDB → oracle-checkable); False uses xxhash64 (faster, JVM-only).
    One explode + one groupBy — no joins. ``shingles`` accepts a
    precomputed (id, shingle) frame so callers that also need the
    shingles (the LSH verify stage) can share it — pass a persisted /
    checkpointed frame for a true single tokenize pass (a shared LAZY
    frame still recomputes per consumer; only storage dedupes work).
    ``with_sizes=True`` adds the per-doc shingle-set size as ``__sz`` in
    the same aggregate (free: same grouping pass)."""
    s = shingles if shingles is not None else _doc_shingles(df, id_col, text_col, n)
    if portable:
        aggs = [
            F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}")).cast("binary"))).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh_{i}")
            for i in range(num_hashes)
        ]
    if with_sizes:
        aggs.append(F.count(F.lit(1)).alias("__sz"))
    return s.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """Band the signature (rows = num_hashes/bands per band); docs sharing
    any band bucket become candidate pairs. Bucket join replaces the
    all-pairs comparison.

    Bucket key width matters at scale: the band rows are |D|·bands and the
    bucket is their shuffle key. With md5 (string) components the key must
    stay the concat string so the DuckDB oracle reproduces it
    bit-for-bit; with xxhash64 (bigint) components the key is re-hashed to
    ONE int64 (band id salted in) — ~10x fewer shuffle-key bytes at 128
    hashes/32 bands. A 2^-64 bucket collision can only MERGE buckets,
    i.e. add a false candidate that the exact Jaccard verify discards —
    recall is unaffected."""
    if not (1 <= bands <= num_hashes) or num_hashes % bands != 0:
        raise ValueError(
            f"bands must divide num_hashes with 1 <= bands <= num_hashes; "
            f"got num_hashes={num_hashes}, bands={bands} (bands > num_hashes "
            f"would make every bucket constant — a silent O(n^2) cross join)"
        )
    rows_per_band = num_hashes // bands
    compact = dict(signatures.dtypes).get("mh_0") == "bigint"
    buckets = []
    for b in range(bands):
        raw = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        if compact:
            buckets.append(F.xxhash64(F.lit(b), *raw))
        else:
            buckets.append(F.concat_ws("|", F.lit(str(b)), *[c.cast("string") for c in raw]))
    sig = signatures.select(
        id_col, F.explode(F.array(*buckets)).alias("bucket")
    )
    # in-bucket pair enumeration via ONE groupBy + explode instead of a
    # bucket self-join: the join consumed the ``sig`` frame twice, so the
    # entire signature computation (tokenize + k-way min-hash — the
    # query's hottest aggregate) ran once per join side (optimization
    # guide §2.4: duplicated subtrees). collect_set subsumes the old
    # per-(id, bucket) DISTINCT (one shuffle instead of two); sort_array
    # makes it deterministic; the nested transform emits exactly the
    # (a < b) pairs the join produced, same skew profile (a hot bucket
    # was one join task before, one agg row now). Shuffle volume halves:
    # |sig| rows grouped once vs two join inputs.
    ids = (
        sig.groupBy("bucket")
        .agg(F.sort_array(F.collect_set(F.col(id_col))).alias("__ids"))
        .filter(F.size("__ids") >= 2)
    )
    pair_arr = F.expr(
        "flatten(transform(__ids, (x, i) -> "
        "transform(slice(__ids, i + 2, size(__ids) - i - 1), "
        "y -> struct(x AS id_a, y AS id_b))))"
    )
    return (
        ids.select(F.explode(pair_arr).alias("__p"))
        .select("__p.id_a", "__p.id_b")
        .distinct()
    )


def minhash_lsh_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.5,
    portable: bool = True,
    materialize: bool = True,
    verify_pushdown: bool = False,
) -> DataFrame:
    """LSH candidates → exact Jaccard verification ≥ threshold.
    Same output contract as jaccard_pairs but candidate-pruned.
    Production use: ``minhash_lsh_dedup_pairs(df, id, text,
    **LSH_PRODUCTION, threshold=0.7)``.

    ``materialize=True`` (default) computes the per-doc signature AND
    shingle-set size in ONE aggregate over one tokenize pass and
    localCheckpoints the result — an O(|docs|) table (44+ bytes/doc ·
    num_hashes). Before, the k-way min-hash aggregate (this operator's
    hottest stage — k md5 calls per shingle occurrence) was lazily
    recomputed by every consumer of the signature/size frames, costing
    2-3 full corpus tokenize+hash passes per run (optimization guide
    §3.3: materialize an intermediate that several branches reuse; §2.4
    duplicated subtrees). The checkpoint lives only inside this plan —
    every new call recomputes it from the input. Pass ``False`` to keep
    the fully lazy plan (e.g. when composing into a larger plan that is
    itself checkpointed).

    ``verify_pushdown=True`` semi-join-reduces the corpus to candidate
    doc ids BEFORE the verify-side re-shingling (guide §3.2): the two
    verify passes then tokenize only dup-candidate docs instead of the
    full corpus. Exactness-preserving (the verify joins already restrict
    to candidate ids — the filter just lands below the tokenizer). Turn
    it on when corpus text bytes dominate (large docs / low dup rate):
    it trades two corpus-wide tokenize passes for two broadcasts of the
    candidate id set plus recomputing the banding aggregate per
    consumer. At sub-second corpus sizes the extra stage waves cost more
    than the tokenize they save (measured at sf0.1: +0.7 s), hence the
    default off; at 100 TB with KB-sized docs the pushdown is the right
    side of the trade."""
    s = _doc_shingles(df, id_col, text_col, n)
    sigs = minhash_signatures(
        df, id_col, text_col, n, num_hashes, portable, shingles=s,
        with_sizes=materialize,
    )
    if materialize:
        # eager=False: the checkpoint materializes inside the query's
        # first job instead of a separate synchronous build-time job
        # (one fewer job round-trip); BlockManager's per-partition block
        # locks guarantee each partition is computed once even when AQE
        # materializes consumer stages concurrently
        sigs = sigs.localCheckpoint(eager=False)
        sizes = sigs.select(id_col, "__sz")
        sigs = sigs.drop("__sz")
    else:
        sizes = s.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
    cand = lsh_candidate_pairs(sigs, id_col, num_hashes, bands)
    if verify_pushdown:
        # NOTE: cand itself is NOT checkpointed — its consumers (two
        # semi-filters + the verify join) each recompute only the
        # banding aggregate over the already-materialized signature
        # table, which measured cheaper than one more eager checkpoint
        # job's stage barriers.
        ids_a = cand.select(F.col("id_a").alias(id_col)).distinct()
        ids_b = cand.select(F.col("id_b").alias(id_col)).distinct()
        s_a = _doc_shingles(
            df.join(F.broadcast(ids_a), id_col, "left_semi"), id_col, text_col, n
        )
        s_b = _doc_shingles(
            df.join(F.broadcast(ids_b), id_col, "left_semi"), id_col, text_col, n
        )
    else:
        s_a = s_b = s
    # intersection count: expand each candidate pair by doc A's shingles,
    # then join doc B on the COMPOSITE key (id_b, shingle). Joining on
    # id_b alone and filtering shingle equality afterwards materializes
    # |shingles(A)| x |shingles(B)| rows per pair before the filter
    # (~800 rows/pair at 30-word docs) — the composite key emits exactly
    # the intersection rows (~|A∩B|), a ~30x cut in the verify stage's
    # join output at any scale.
    inter = (
        cand.join(s_a.select(F.col(id_col).alias("id_a"), "shingle"), "id_a")
        .join(s_b.select(F.col(id_col).alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("__inter"))
    )
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("__sz").alias("__sza")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("__sz").alias("__szb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("__inter") / (F.col("__sza") + F.col("__szb") - F.col("__inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash fingerprint, portable construction: token bit b :=
    high bit of hex digit b of md5(token); fingerprint bit b := majority
    over tokens. One explode + one groupBy; emitted as a 16-char '0'/'1'
    string (``simhash``). Oracle-checkable (md5+substr only)."""
    words = df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("__w"))
    words = words.withColumn("__h", F.md5(F.col("__w").cast("binary")))
    aggs = []
    for b in range(16):
        bit = F.substring(F.col("__h"), b + 1, 1).isin(
            "8", "9", "a", "b", "c", "d", "e", "f"
        )
        aggs.append(
            F.sum(F.when(bit, 1).otherwise(-1)).alias(f"__s{b}")
        )
    agg = words.groupBy(id_col).agg(*aggs)
    fp = F.concat(
        *[F.when(F.col(f"__s{b}") > 0, "1").otherwise("0") for b in range(16)]
    )
    return agg.select(id_col, fp.alias("simhash"))


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash via xxhash64 (production variant, JVM-only hash):
    same majority construction over shiftright-extracted bits."""
    words = df.select(id_col, F.explode(F.split(F.col(text_col), " ")).alias("__w"))
    words = words.withColumn("__h", F.xxhash64("__w"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"__s{b}")
        for b in range(64)
    ]
    agg = words.groupBy(id_col).agg(*aggs)
    fp = None
    for b in range(64):
        bit = F.when(F.col(f"__s{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = bit * F.lit(1 << b).cast("long") if b < 63 else F.when(F.col(f"__s{b}") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
        fp = term if fp is None else fp + term
    return agg.select(id_col, fp.alias("simhash"))


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
) -> DataFrame:
    """All pairs (a < b) whose 64-bit SimHash fingerprints differ in at
    most ``max_hamming`` bits — the banded-bits near-dup path promised by
    the module docstring.

    Pigeonhole-complete candidate generation: the fingerprint splits into
    ``max_hamming + 1`` bands, and any pair within the Hamming budget must
    agree EXACTLY on at least one band, so a self-join on (band id, band
    value) finds every qualifying pair — no all-pairs comparison. Each
    band row carries the full fingerprint (one extra long), so the exact
    Hamming verify is a bit_count(xor) on the joined row — no join back
    to the fingerprint table. Cost ≈ |D|·(max_hamming+1) band rows
    shuffled on a high-cardinality (band, value) key; hot buckets only
    form when many docs share a band verbatim, i.e. they are real
    near-dup clusters. Output: (id_a, id_b, hamming).

    ``max_hamming`` is capped at 15: beyond that the bands get so narrow
    (width = 64 // (max_hamming+1) < 4 bits) that band collisions stop
    pruning anything, and at >= 63 the width degenerates to 0 (mask 0 →
    full cross join). The pigeonhole argument holds for non-divisor band
    counts too — the uncovered high bits simply never relax a band
    match (see test_simhash_nondivisor_bands parity case)."""
    if not (0 <= max_hamming <= 15):
        raise ValueError(
            f"max_hamming must be in 0..15, got {max_hamming}; wider Hamming "
            "budgets make the band width < 4 bits and the candidate join "
            "degenerates toward a cross join"
        )
    n_bands = max_hamming + 1
    width = 64 // n_bands
    fp = simhash64(df, id_col, text_col)
    # -1 is all-ones in two's complement: the single-band (max_hamming=0)
    # case masks the full fingerprint, and (1<<64)-1 overflows a long
    mask = -1 if width >= 64 else (1 << width) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftrightunsigned(F.col("simhash"), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("val"),
            )
            for b in range(n_bands)
        ]
    )
    rows = fp.select(id_col, "simhash", F.explode(bands).alias("__b")).select(
        id_col, "simhash", F.col("__b.band").alias("__band"), F.col("__b.val").alias("__val")
    )
    a = rows.select(
        F.col(id_col).alias("id_a"), F.col("simhash").alias("__fa"), "__band", "__val"
    )
    b_ = rows.select(
        F.col(id_col).alias("id_b"), F.col("simhash").alias("__fb"), "__band", "__val"
    )
    return (
        a.join(b_, ["__band", "__val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-dup
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold. Brute-force quadratic —
    correctness baseline; the scale path buckets by LSH first
    (similarity.hyperplane_lsh_bucket)."""
    from kgfarm_spark.operators.similarity import dot_expr, norm_expr

    # per-row norm hoisted out of the O(n²) pair expression; zero norms
    # map to denominator 1 (the arrow-kernel convention: a zero vector's
    # dot is 0, so its cosine is 0 and it matches nothing at t>0) —
    # without the guard 0/0 = NaN, and Spark orders NaN ABOVE every
    # threshold, so a zero vector paired with EVERYTHING (review finding;
    # same class the repo fixed in similarity.cosine_topk, abd8754)
    guard = lambda c: F.when(F.col(c) > 0, F.col(c)).otherwise(F.lit(1.0))
    a = df.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    ).withColumn("__na", norm_expr("__va"))
    b = df.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    ).withColumn("__nb", norm_expr("__vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", dot_expr("__va", "__vb") / (guard("__na") * guard("__nb"))
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# Exact duplicate-span detection (Lee et al. 2021 "Deduplicating Training
# Data Makes Language Models Better", at word-n-gram granularity) and
# C4-style corpus-wide line dedup (Raffel et al. 2020 §2.2: "we discard
# all but one of any three-sentence span occurring more than once").
# ---------------------------------------------------------------------------


def duplicate_ngram_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document duplicated-span statistics: for every word ``n``-gram
    position in a document, is that exact span present in ≥ ``min_docs``
    DISTINCT documents corpus-wide? Returns one row per input document:
    ``(id, n_spans, dup_spans, dup_span_frac)``.

    This is the n-gram-hash flavor of exact-substring dedup (the
    suffix-array construction of Lee et al. doesn't distribute; the
    rolling n-gram census is the standard map-reduce re-expression).

    Scale shape — three shuffles, all linear in corpus word count:
      1. explode spans (|corpus words| rows), groupBy 64-bit span hash →
         distinct-doc count per span (map-side partial agg applies);
      2. shuffle join (span occurrences ⋈ span census) on the hash —
         both sides hash-partitioned, no broadcast of anything large;
      3. groupBy document for the final fractions.
    Grouping on ``xxhash64(span)`` instead of the span string cuts
    shuffle width ~n·wordlen bytes → 8 bytes; a 64-bit collision merges
    two span groups with probability ~2⁻⁶⁴ per pair (the oracle groups
    by the raw string — identical results absent a collision).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_docs < 2:
        raise ValueError(f"min_docs must be >= 2, got {min_docs}")
    # \s+ split with empty tokens dropped (review finding: a trailing
    # newline left a '' tail token — trim strips only spaces — shifting
    # every span hash so the duplicate went unflagged)
    words = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda w: F.length(w) > 0,
    )
    base = df.select(F.col(id_col).alias("__id"), words.alias("__w"))
    spans = F.when(
        F.size("__w") >= n,
        F.expr(
            f"transform(sequence(0, size(__w) - {n}), "
            f"i -> xxhash64(array_join(slice(__w, i + 1, {n}), ' ')))"
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    occ = base.select("__id", F.explode_outer(spans).alias("__h"))
    # only spans meeting the min_docs bar matter downstream — filtering
    # the census BEFORE the flag join drops the (dominant) unique-span
    # mass from the join's build side: at the 5M-doc bench corpus this
    # cuts the census-side shuffle from ~|unique spans| rows to just the
    # duplicated ones, and a left-join miss encodes "not duplicated"
    dup_spans = (
        occ.filter(F.col("__h").isNotNull())
        .groupBy("__h")
        .agg(F.count_distinct("__id").alias("__docs"))
        .filter(F.col("__docs") >= min_docs)
        .select("__h")
    )
    flagged = occ.join(dup_spans.withColumn("__dup1", F.lit(1)), "__h", "left").select(
        "__id",
        F.col("__h").isNotNull().cast("int").alias("__is_span"),
        F.col("__dup1").alias("__dup"),
    )
    per_doc = flagged.groupBy("__id").agg(
        F.sum("__is_span").alias("n_spans"),
        F.coalesce(F.sum("__dup"), F.lit(0)).alias("dup_spans"),
    )
    return per_doc.select(
        F.col("__id").alias(id_col),
        "n_spans",
        "dup_spans",
        # plain IEEE division, no round(): both engines evaluate the
        # identical double expression -> bit-identical (oracle convention)
        F.when(
            F.col("n_spans") > 0, F.col("dup_spans") / F.col("n_spans")
        ).otherwise(0.0).alias("dup_span_frac"),
    )


def dedup_lines_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = False,
) -> DataFrame:
    """C4-style corpus-wide line dedup: every line (newline-split unit —
    C4 uses three-sentence spans; the unit is whatever the upstream
    splitter emitted) that occurs more than once across the WHOLE corpus
    is kept only at its first occurrence, where "first" is the globally
    deterministic minimum of ``(doc id, line index)``. Documents are
    reassembled with surviving lines in original order; documents whose
    every line was a later duplicate come back with empty text.

    Returns ``(id, text, n_lines, n_lines_kept)``.

    ``normalize=True`` matches lines case-/whitespace-insensitively
    (lower + collapse internal whitespace) while PRESERVING the original
    line text in the output — the usual C4 behavior.

    BLANK lines (empty after trimming \\t/\\r/space) are structural
    paragraph separators, not content — they are ALWAYS kept and never
    enter the dedup census (review finding: treating '' as dedupable
    content deleted every blank line in the corpus except the single
    globally-first one, silently collapsing paragraph structure in
    nearly every document).

    Scale shape — no corpus-wide window, no driver materialization:
      1. explode lines with their index (one row per line);
      2. groupBy line key → ``min(struct(id, idx))`` (map-side partial
         min, then one shuffle keyed by the line hash);
      3. join occurrences to winners on (key, id, idx) — hash join,
         both sides partitioned by key;
      4. groupBy document, ``sort_array(collect_list(struct(idx, line)))``
         to reassemble (per-doc lists are document-sized, never
         corpus-sized).
    """
    # NULL text normalizes to '' (one empty line) so every document gets
    # well-defined non-null counts; without this, the null explode row's
    # NULL index poisons __keep into NULL for whichever null-text doc
    # wins the empty-key election
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.posexplode_outer(lines).alias("__idx", "__line"),
    )
    key = (
        F.regexp_replace(F.lower(F.trim(F.col("__line"))), r"\s+", " ")
        if normalize
        else F.col("__line")
    )
    blank = (
        F.length(F.regexp_replace(F.col("__line"), r"^[\t\r ]+|[\t\r ]+$", ""))
        == 0
    )
    occ = base.withColumn(
        "__k", F.when(~blank, F.xxhash64(key))
    )
    winners = (
        occ.filter(F.col("__k").isNotNull())
        .groupBy("__k")
        .agg(F.min(F.struct("__id", "__idx")).alias("__first"))
    )
    kept = (
        occ.join(winners, "__k", "left")
        .withColumn(
            "__keep",
            F.col("__k").isNull()  # blank separator: always keep
            | (
                (F.col("__first.__id") == F.col("__id"))
                & (F.col("__first.__idx") == F.col("__idx"))
            ),
        )
    )
    out = kept.groupBy("__id").agg(
        F.count("__idx").alias("n_lines"),
        F.sum(F.col("__keep").cast("int")).alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("__keep"), F.struct("__idx", "__line"))
                    )
                ),
                lambda s: s["__line"],
            ),
            "\n",
        ).alias("text"),
    )
    return out.select(
        F.col("__id").alias(id_col), "text", "n_lines", "n_lines_kept"
    )


def decontaminate(
    docs: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share at
    least ``min_overlap`` distinct word n-grams with an evaluation /
    benchmark set (the GPT-3 appendix-C recipe uses 13-grams; reference
    has no equivalent — this is a training-data-pipeline op from the
    task brief, sibling of the dedup family).

    Returns ``(id_col, n_overlap)`` for contaminated documents only —
    callers anti-join this against the corpus to drop them, or keep the
    counts for an audit table.

    Scale shape: the eval side is small by construction (benchmarks are
    10^4–10^6 shingles next to a 100 TB corpus), so its distinct shingle
    set is **broadcast** — the corpus side is probed map-side with NO
    shuffle of corpus shingles; only the matched (doc, shingle) hits
    (rare) enter the single groupBy(doc) shuffle. Corpus cost is one
    scan + tokenize, independent of eval-set count.
    """
    doc_sh = _doc_shingles(docs, id_col, text_col, n)
    eval_sh = (
        word_shingles(eval_set.select(text_col), text_col, n)
        .select("shingle")
        .distinct()
    )
    hits = doc_sh.join(F.broadcast(eval_sh), "shingle")
    return (
        hits.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
    )


def semantic_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 16,
    nprobe: int = 1,
    centroids=None,
    kernel: str = "arrow",
    max_cell_rows: int = 200_000,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023:
    cluster the embedding space, compare only WITHIN clusters): assign
    every vector to its ``nprobe`` nearest IVF cells, emit pairs sharing
    a cell with cosine ≥ ``threshold``. This is the scale path for
    ``embedding_neardup_pairs`` — the quadratic pair join shrinks from
    |corpus|² to Σ|cell|², and each cell's pairs compute independently
    (cell-partitioned self-join, no broadcast of the corpus).

    ``nprobe=1`` is the classic SemDeDup trade (pairs straddling a cell
    boundary are missed); raising ``nprobe`` multi-probes neighboring
    cells at nprobe× the rows (``nprobe=n_cells`` degenerates to exact
    brute force — the pytest parity anchor). Pairs found via two shared
    cells dedupe through the final ``distinct()`` on (id_a, id_b).

    ``kernel='arrow'`` (default) computes each cell's pairs with one
    Arrow-batched numpy matmul (`applyInPandas` per cell — normalized
    block-wise N·Nᵀ, strict upper triangle); ``'expr'`` is the pure-JVM
    join-expression twin (same pairs, pytest-pinned). The arrow kernel
    is ~100× faster per candidate (BENCH.md §5b) because the JVM
    higher-order-function cosine is interpreted per element;
    ``max_cell_rows`` bounds per-task memory and fails loudly with
    "raise n_cells" advice instead of letting one giant cell OOM.

    Returns (id_a, id_b, cosine) with id_a < id_b.
    """
    import numpy as np
    import pandas as pd

    from kgfarm_spark.operators.similarity import (
        _sq_dists,
        dot_expr,
        fit_ivf_centroids,
        norm_expr,
    )

    if nprobe < 1 or nprobe > n_cells:
        raise ValueError(f"nprobe must be in 1..{n_cells}, got {nprobe}")
    if centroids is None:
        centroids = fit_ivf_centroids(
            df, vec_col=vec_col, n_cells=n_cells, id_col=id_col
        )
    # a tiny corpus (or caller-supplied centroids) can carry fewer cells
    # than requested — probing more cells than exist is a no-op, so clamp
    nprobe = min(nprobe, len(centroids))
    bc = df.sparkSession.sparkContext.broadcast(np.asarray(centroids, dtype=np.float64))

    id_type = df.schema[id_col].dataType.simpleString()
    src = df.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    out_schema = f"__id {id_type}, __v array<double>, __cell int"

    def assign(batches):
        cents = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            v = np.array(list(pdf["__v"]), dtype=np.float64)
            near = np.argsort(_sq_dists(v, cents), axis=1, kind="stable")[:, :nprobe]
            idx = np.repeat(np.arange(len(pdf)), nprobe)
            yield pd.DataFrame(
                {
                    "__id": pdf["__id"].values[idx],
                    "__v": pdf["__v"].values[idx],
                    "__cell": near.reshape(-1).astype("int32"),
                }
            )

    # both join sides derive from `cells`; without materialization the
    # Python/Arrow assignment stage would run twice per action
    cells = src.mapInPandas(assign, out_schema).localCheckpoint(eager=True)

    if kernel == "arrow":
        # per-cell BLAS: normalize once, block-wise N_b @ N^T, upper
        # triangle >= threshold. ~100x the JVM expression path's
        # per-candidate throughput (BENCH.md §5b); block_rows bounds the
        # similarity buffer at block_rows x |cell| doubles. A cell far
        # above ~10^5 rows signals too few cells for the corpus — the
        # guard raises with that advice rather than OOMing an executor.
        pair_schema = f"id_a {id_type}, id_b {id_type}, cosine double"
        block_rows = 1024

        def per_cell(pdf):
            n_rows = len(pdf)
            if n_rows > max_cell_rows:
                raise ValueError(
                    f"IVF cell with {n_rows} rows exceeds max_cell_rows="
                    f"{max_cell_rows}; raise n_cells (or max_cell_rows)"
                )
            if n_rows < 2:
                return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
            v = np.array(list(pdf["__v"]), dtype=np.float64)
            norms = np.linalg.norm(v, axis=1)
            norms[norms == 0.0] = 1.0  # zero vectors match nothing at t>0
            nv = v / norms[:, None]
            ids = pdf["__id"].values
            order = np.argsort(ids, kind="stable")  # id_a < id_b by value
            nv, ids = nv[order], ids[order]
            out_a, out_b, out_c = [], [], []
            for lo in range(0, n_rows, block_rows):
                hi = min(lo + block_rows, n_rows)
                sims = nv[lo:hi] @ nv.T
                rows, cols = np.nonzero(sims >= threshold)
                keep = (rows + lo) < cols  # strict upper triangle
                out_a.append(ids[rows[keep] + lo])
                out_b.append(ids[cols[keep]])
                out_c.append(sims[rows[keep], cols[keep]])
            return pd.DataFrame(
                {
                    "id_a": np.concatenate(out_a) if out_a else [],
                    "id_b": np.concatenate(out_b) if out_b else [],
                    "cosine": np.concatenate(out_c) if out_c else [],
                }
            )

        # (id_a, id_b) dedup, not distinct() over the cosine double —
        # multi-probe pairs computed in differently-shaped cell matmuls
        # can differ in the last ulp (review finding)
        return (
            cells.groupBy("__cell")
            .applyInPandas(per_cell, pair_schema)
            .dropDuplicates(["id_a", "id_b"])
        )

    if kernel != "expr":
        raise ValueError(f"kernel must be 'arrow' or 'expr', got {kernel!r}")
    a = cells.select(
        F.col("__cell"),
        F.col("__id").alias("id_a"),
        F.col("__v").alias("__va"),
        norm_expr("__v").alias("__na"),
    )
    b = cells.select(
        F.col("__cell"),
        F.col("__id").alias("id_b"),
        F.col("__v").alias("__vb"),
        norm_expr("__v").alias("__nb"),
    )
    # zero-norm guard matches the arrow kernel (norms==0 -> 1.0), so the
    # two kernels stay pytest-pinned twins even on zero vectors; dedup of
    # multi-probe duplicates is by (id_a, id_b) — distinct() over the
    # cosine double would rely on bit-identical results across
    # differently-shaped per-cell computations (review finding)
    guard = lambda c: F.when(F.col(c) > 0, F.col(c)).otherwise(F.lit(1.0))
    pairs = (
        a.join(b, "__cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine", dot_expr("__va", "__vb") / (guard("__na") * guard("__nb"))
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs


def ngram_novelty(
    docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Per-document n-gram novelty against a LARGE reference corpus: the
    fraction of the document's distinct word n-grams absent from the
    reference —

      (id, n_shingles, n_novel, novelty)

    — the data-freshness / incremental-value measure of a candidate
    shard against what a model has already seen. This is the
    non-broadcastable sibling of ``decontaminate``: there the eval set
    is tiny so its shingles broadcast and the corpus is probed map-side;
    here the reference IS a corpus (yesterday's 100 TB), so the plan is
    a shuffle join on the shingle key — hash-uniform by construction, no
    skew. Documents with fewer than ``n`` words have no shingles and
    report ``novelty`` NULL (nothing to measure, distinct from 0.0 =
    "entirely seen").

    Scale shape: distinct-per-doc shingles explode once per side
    (``word_shingles`` — array_distinct before the explode), the
    reference dedups to its distinct shingle set (one shuffle, done once
    and reusable via checkpoint for many shards), and the join + per-doc
    aggregate are both shingle/doc-keyed and map-side combining.
    """
    doc_sh = _doc_shingles(docs, id_col, text_col, n)
    ref_sh = (
        word_shingles(reference.select(text_col), text_col, n)
        .select("shingle")
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    per_doc = (
        doc_sh.join(ref_sh, "shingle", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_shingles"),
            F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0))
            .cast("int")
            .alias("n_novel"),
        )
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.round(
                F.col("n_novel") / F.nullif(F.col("n_shingles"), F.lit(0)),
                4,
            ).alias("novelty"),
        )
    )
