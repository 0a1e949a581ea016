"""Similarity search over an embedding column (array<float>).

Two paths:
- brute-force cosine top-k: the exact baseline. Broadcast the (small) query
  set against the corpus — one scan, no shuffle of the corpus, a windowed
  top-k per query. At 100 TB the corpus side stays partition-local.
- LSH bucketing (random-hyperplane signs): the scale path. Signature
  assignment is a projection (no shuffle); candidate generation joins only
  within buckets. Hyperplanes are derived from a deterministic integer
  formula so signatures are reproducible across engines and runs — at
  production scale you'd broadcast a seeded random matrix instead.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot_sql(a: str, b: str, dim: int) -> str:
    """Unrolled sequential dot as ONE Spark-SQL string. "0D + t1 + t2 ..."
    parses left-associative — exactly the fold's summation order — and
    terms past a shorter array coalesce to +0.0 (an IEEE identity), so the
    unrolled form is bit-identical to the fold. try_element_at (not
    element_at) keeps out-of-range access null under ANSI mode."""
    terms = " + ".join(
        f"coalesce(CAST(try_element_at({a}, {i}) AS DOUBLE)"
        f" * CAST(try_element_at({b}, {i}) AS DOUBLE), 0D)"
        for i in range(1, dim + 1)
    )
    return f"(0D + {terms})"


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Sequential left-associative sum — same summation order as a SQL
    list_sum, so results are bit-stable across engines.

    With ``dim`` known statically (``a``/``b`` are then column NAMES) the
    sum is UNROLLED into a plain expression tree: higher-order functions
    (aggregate/zip_with/transform) are CodegenFallback — interpreted per
    row — while the unrolled form runs inside whole-stage codegen (~10x on
    the quadratic pair joins). The tree is built by parsing ONE generated
    SQL string: composing it from thousands of Python Column calls costs
    seconds of py4j round-trips per plan build (measured 7-8s per query at
    plan time). dim=None keeps the generic fold for Column inputs of
    unknown width."""
    if dim is None:
        if isinstance(a, str):
            a = F.col(a)
        if isinstance(b, str):
            b = F.col(b)
        return F.aggregate(
            F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    return F.expr(_dot_sql(a, b, dim))


def norm(a: Column | str, dim: int | None = None) -> Column:
    if dim is None:
        a = F.col(a) if isinstance(a, str) else a
        return F.sqrt(dot(a, a))
    return F.expr(f"sqrt({_dot_sql(a, a, dim)})")


def safe_norm(a: Column | str, dim: int | None = None) -> Column:
    """Norm for COSINE DENOMINATORS: never exactly 0, so a zero vector's
    cosine against anything is 0 (its numerator is exactly 0) — ranked
    last, never NaN. Raw ``norm`` in a denominator turns one all-zero
    embedding (padding / failed-encoder row) into 0/0 = NaN, and NaN
    sorts as the LARGEST double under desc ordering — the zero vector
    would become the rank-1 neighbour of every query.

    Spelled ``sqrt(dot + 1e-300)``, NOT ``when(n == 0, 1).otherwise(n)``:
    a when/otherwise would evaluate the 64-term unrolled dot TWICE
    (Spark's subexpression elimination does not span CASE branches —
    measured ~1.6x on the whole cosine family), while the additive
    epsilon is absorbed bit-exactly for every norm above 1e-140 (any
    real embedding) and costs one literal. Oracles are unaffected:
    their coalesce(nullif(sqrt(..), 0), 1) spelling yields the same
    cosine (0) for zero vectors and identical bits everywhere else."""
    if dim is None:
        a = F.col(a) if isinstance(a, str) else a
        return F.sqrt(dot(a, a) + F.lit(1e-300))
    return F.expr(f"sqrt({_dot_sql(a, a, dim)} + 1e-300)")


def cosine(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    if dim is None:
        return dot(a, b) / (norm(a) * norm(b))
    return F.expr(
        f"({_dot_sql(a, b, dim)}"
        f" / (sqrt({_dot_sql(a, a, dim)}) * sqrt({_dot_sql(b, b, dim)})))"
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbours per query vector (brute force baseline).
    ``queries`` is broadcast; ties broken on neighbour id. Pass ``dim``
    when the embedding width is known so the cosine unrolls into codegen
    (see ``dot``)."""
    # norms are per-VECTOR quantities: compute them in the pre-join
    # projections (n + q rows), never per candidate pair, which also keeps
    # the per-pair expression tree small enough to analyze cheaply
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        safe_norm(vec_col, dim).alias("qnrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbour_id"),
        F.col(vec_col).alias("cvec"),
        safe_norm(vec_col, dim).alias("cnrm"),
    )
    joined = c.join(F.broadcast(q), F.col("neighbour_id") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "neighbour_id",
        (dot("qvec", "cvec", dim) / (F.col("qnrm") * F.col("cnrm"))).alias(
            "cos"
        ),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbour_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbour_id",
            "rank",
            F.round(F.col("cos") + F.signum("cos") * 1e-9, 6).alias("cosine"),
        )
    )


def hyperplane_sign(i: int, j: int) -> float:
    """Deterministic pseudo-random +/-1 for dimension i, plane j — plain
    integer arithmetic reproducible in any engine (the oracle SQL repeats
    the same formula). Evaluated at PLAN TIME: the signs become literal
    coefficients in the bucket expression, not per-row arithmetic."""
    return 1.0 if ((i * 131071 + j * 524287) % 97) % 2 == 0 else -1.0


def lsh_bucket(vec: str, planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH bucket id: bit j = sign(dot(vec, plane_j)),
    from a column NAME. Each plane dot is unrolled with literal +/-1
    coefficients into one generated SQL string (see ``dot`` for why
    unrolled beats the interpreted HOF fold and why one F.expr beats
    thousands of Column calls); multiplying by literal +/-1.0 and
    left-associative order keep it bit-identical to the fold the oracle
    mirrors."""
    cases = []
    for j in range(planes):
        d = " + ".join(
            f"coalesce(CAST(try_element_at({vec}, {i}) AS DOUBLE)"
            f" * ({hyperplane_sign(i, j)}D), 0D)"
            for i in range(1, dim + 1)
        )
        cases.append(f"(CASE WHEN (0D + {d}) > 0D THEN {1 << j} ELSE 0 END)")
    return F.expr(f"CAST({' + '.join(cases)} AS BIGINT)")


def ann_buckets(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Assign every vector its LSH bucket (the ANN index build step)."""
    return corpus.select(
        F.col(id_col).alias("vec_id"),
        lsh_bucket(vec_col, planes, dim).alias("bucket"),
    )


def ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    dim: int | None = 64,
) -> DataFrame:
    """IVF coarse quantizer: the ``n_centroids`` LOWEST-id corpus vectors
    — the deterministic stand-in for a k-means pass (the assignment/
    probe machinery is identical either way, and determinism keeps the
    operator oracle-checkable). orderBy + limit (a TakeOrdered) instead
    of ``id < K``: identical rows on dense 0-based ids (the testdata and
    every oracle), but still K real centroids when ids are sparse,
    1-based, or offset — a bare range filter silently under-selects
    there and downstream BLAS kernels crash on an empty closure."""
    return corpus.orderBy(id_col).limit(n_centroids).select(
        F.col(id_col).alias("cent_id"),
        F.col(vec_col).alias("cvec"),
        safe_norm(vec_col, dim).alias("cnrm"),
    )


def _cent_matrices(cents: list[tuple[int, list[float]]]):
    """(ids, C, Cn) numpy closure payload for the BLAS assignment."""
    import numpy as np

    ids = np.array([cid for cid, _ in cents], dtype=np.int64)
    C = np.array([cv for _, cv in cents], dtype=np.float64)
    Cn = np.sqrt((C * C).sum(axis=1))
    Cn[Cn == 0] = 1.0
    return ids, C, Cn


def kmeans_assign(
    df: DataFrame,
    vec_col: str,
    cents: list[tuple[int, list[float]]],
    out_cols: str,
    nprobe: int = 1,
) -> DataFrame:
    """Nearest-centroid id (cosine argmax, ties to lowest id) as ONE
    Arrow-batched BLAS pass (``mapInPandas``): V @ C.T per batch, centroid
    matrix shipped in the closure — no join, no shuffle; the corpus
    streams through once. ``out_cols`` is the output schema: every input
    column to carry through plus ``cent_id int`` (cent_id is appended by
    the kernel).

    ``nprobe > 1`` emits the ``nprobe`` nearest centroids as that many
    output rows per input row (cosine-ranked, ties to lowest id) — the
    multi-probe query-side routing, still zero-shuffle: the per-batch
    argsort replaces the n x K window ranking of ``ivf_assign``.

    Why not codegen: the literal-coefficient unrolled form (K=8 x dim=64
    = 512-term expression) exceeds the JIT method budget and evaluates
    INTERPRETED — measured ~0.4 ms/row, vs well under 1 us/row for the
    blocked matmul. Same finding and fix as ``cosine_pairs_bucketed``.
    Argmax ties break to the lowest centroid id (np.argmax returns the
    first maximum; the matrix rows are ordered by cent_id — and for
    nprobe > 1 a stable argsort on -cos preserves that order)."""
    import numpy as np
    import pandas as pd

    ids, C, Cn = _cent_matrices(cents)
    # NB: naive comma split — fine for the flat/array column types used
    # here, would break on map<k,v> carry columns
    carry = [c.strip().split()[0] for c in out_cols.split(",")]

    def op(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Vn = np.sqrt((V * V).sum(axis=1))
            Vn[Vn == 0] = 1.0
            # round to 12 decimals BEFORE the argmax (mirrored by
            # round(..., 12) in the oracles' ORDER BY): BLAS pairwise
            # summation and the oracle's sequential list_sum fold can
            # land 1 ulp apart, and an exact-cosine tie (e.g. permuted
            # duplicate centroids) then flips the assignment between
            # engines — measured ~45% flip rate on crafted ties.
            # Collapsing sub-1e-12 differences makes both sides break
            # the tie on cent_id identically (ADVICE r4).
            S = np.round((V @ C.T) / (Vn[:, None] * Cn[None, :]), 12)
            if nprobe == 1:
                out = pdf[carry].copy()
                out["cent_id"] = ids[S.argmax(axis=1)].astype(np.int32)
                yield out
            else:
                # stable sort on -cos: equal cosines keep cent_id order.
                # Clamp to K: nprobe > len(cents) must emit K rows per
                # vector (parity with the ivf_assign window path), not
                # crash on a ravel/repeat length mismatch (ADVICE r4)
                width = min(nprobe, S.shape[1])
                top = np.argsort(-S, axis=1, kind="stable")[:, :width]
                out = pdf[carry].loc[
                    pdf.index.repeat(width)
                ].reset_index(drop=True)
                out["cent_id"] = ids[top.ravel()].astype(np.int32)
                yield out

    return df.mapInPandas(op, out_cols + ", cent_id int")


def ivf_kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 8,
    dim: int = 64,
    iters: int = 2,
) -> list[tuple[int, list[float]]]:
    """IVF coarse quantizer via deterministic seeded Lloyd's iterations.

    Init = the first ``n_centroids`` corpus vectors (the round-1 stand-in,
    kept as the fixed seed so the whole pass stays oracle-checkable); then
    ``iters`` fixed iterations of assign + update fused into ONE
    Arrow-batched pass per iteration: each batch BLAS-assigns its vectors
    (``kmeans_assign`` math) and emits per-centroid partial sums, so only
    ~K x dim x n_batches partial rows leave the executors. Component means
    are eps-rounded to 9 decimals, absorbing engine/summation-order float
    drift so the DuckDB oracle's replayed iterations agree; a cluster
    that loses all members falls back to its INITIAL vector (mirrored by
    the oracle's coalesce against cent0). The per-iteration driver sync is
    the classic Spark k-means shape; the corpus never shuffles."""
    import numpy as np

    # orderBy + limit, NOT `id < K` (the ivf_centroids fix): identical
    # rows on dense 0-based ids, but still K real seeds when ids are
    # sparse/1-based/offset — the bare range filter silently trained
    # fewer centroids there (or zero, crashing _cent_matrices)
    init_rows = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(
            F.col(id_col).cast("int").alias("cent_id"),
            _as_double(F.col(vec_col)).alias("cvec"),
        )
        .collect()
    )
    init = {r.cent_id: [float(x) for x in r.cvec] for r in init_rows}
    cents = sorted(init.items())
    src = corpus.select(F.col(vec_col).alias("vec"))
    for _ in range(iters):
        ids, C, Cn = _cent_matrices(cents)

        def op(batches):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
                Vn = np.sqrt((V * V).sum(axis=1))
                Vn[Vn == 0] = 1.0
                # same 12-decimal pre-argmax rounding as kmeans_assign,
                # mirrored by round(..., 12) in the kassign oracle CTEs
                S = np.round(
                    (V @ C.T) / (Vn[:, None] * Cn[None, :]), 12
                )
                a = S.argmax(axis=1)
                rows = {"cent_id": [], "n": [], "s": []}
                for j in np.unique(a):
                    m = a == j
                    rows["cent_id"].append(int(ids[j]))
                    rows["n"].append(int(m.sum()))
                    rows["s"].append(V[m].sum(axis=0).tolist())
                yield pd.DataFrame(rows)

        partials = src.mapInPandas(
            op, "cent_id int, n long, s array<double>"
        ).collect()
        sums: dict[int, tuple[int, "np.ndarray"]] = {}
        for r in sorted(partials, key=lambda r: (r.cent_id,)):
            n0, s0 = sums.get(r.cent_id, (0, np.zeros(dim)))
            sums[r.cent_id] = (n0 + r.n, s0 + np.array(r.s))
        new = []
        for cid, _ in cents:
            if cid in sums and sums[cid][0] > 0:
                n0, s0 = sums[cid]
                mean = s0 / n0
                mean = np.round(mean + np.sign(mean) * 1e-12, 9)
                new.append((cid, [float(x) for x in mean]))
            else:
                new.append((cid, init[cid]))
        cents = new
    return cents


def ivf_assign(
    corpus: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    dim: int | None = 64,
) -> DataFrame:
    """IVF assignment: each vector's ``nprobe`` nearest centroids
    (cosine-ranked; ties to the lowest centroid id). nprobe=1 is the index
    build (every vector in exactly one inverted list); nprobe>1 is the
    multi-probe query-side routing. Centroids broadcast; the corpus is
    scanned once and never shuffled — the n x K score matrix is map-side."""
    cent = centroids
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        norm(vec_col, dim).alias("vnrm"),
    )
    scored = c.join(F.broadcast(cent)).select(
        "vec_id",
        "cent_id",
        # 12-decimal rounding before the rank, matching kmeans_assign's
        # pre-argmax rounding so the two assignment paths stay
        # bit-identical on exact-cosine ties (ADVICE r4)
        F.round(
            dot("vec", "cvec", dim) / (F.col("vnrm") * F.col("cnrm")),
            12,
        ).alias("cos"),
    )
    if nprobe == 1:
        # argmax as max(struct(cos, -cent_id)): lexicographic struct max =
        # highest cos, ties to lowest centroid — with map-side partial
        # aggregation, so only (vec_id, best) ever shuffles. The window
        # form below shuffles the full n x K score matrix instead.
        return scored.groupBy("vec_id").agg(
            (-F.max(F.struct(F.col("cos"), (-F.col("cent_id")).alias("nc")))[
                "nc"
            ]).alias("cent_id")
        )
    w = W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cent_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("vec_id", "cent_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 1,
    dim: int | None = 64,
    kmeans_iters: int = 0,
    cents: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF search: route each query to its ``nprobe`` nearest centroids'
    inverted lists, exact-cosine rerank within those lists only. Both sides
    are assigned against the SAME corpus-derived centroids; the index side
    is always nprobe=1, so each corpus vector lives in exactly one list and
    multi-probe candidates need no dedup. Corpus-side work is one
    assignment pass + one partition-local rerank of ~nprobe*n/K candidates
    per query — nprobe is the recall/cost dial of the coarse-quantizer path
    (vs planes for hyperplane LSH, ann_topk_bucketed).

    ``kmeans_iters > 0`` upgrades the coarse quantizer from the first-K
    seed to seeded Lloyd's centroids (:func:`ivf_kmeans_centroids`); the
    centroids ship in the BLAS kernel's closure, so BOTH assignment passes
    lose their broadcast join — each side is one Arrow-batched matmul pass.
    The first-K seed takes the SAME closure path (the K seed vectors are
    a bounded K x dim driver collect, exactly like reusing a built
    index) — measured ~1.8x faster than the broadcast-join shape at
    sf0.1 because it drops the n x K expansion, the argmax groupBy
    shuffle, and the corpus re-join. Multi-probe routing (nprobe > 1)
    rides the same closure kernel: the per-batch argsort emits nprobe
    routing rows per query, replacing ``ivf_assign``'s n x K window
    shuffle. Pass ``cents`` (an :func:`ivf_kmeans_centroids` result) to
    reuse an already built index — the build is a distinct lifecycle
    step, search should not re-run Lloyd's. The DataFrame-centroid
    broadcast path remains only for dim-less callers."""
    if kmeans_iters == 0 and cents is None and dim:
        # first-K seed as closure centroids: one bounded K x dim collect
        # buys zero-shuffle assignment on both sides (same argmax + lowest-
        # id tie-break as ivf_assign, so results are identical)
        cents = [
            (int(r.cent_id), [float(x) for x in r.cvec])
            for r in sorted(
                ivf_centroids(corpus, id_col, vec_col, n_centroids, dim)
                .select("cent_id", "cvec")
                .collect(),
                key=lambda r: r.cent_id,
            )
        ]
        if not cents:
            raise ValueError(
                "ivf_topk: empty corpus — no centroids to seed the index"
            )
    if kmeans_iters > 0 or cents is not None:
        assert dim is not None
        if cents is None:
            cents = ivf_kmeans_centroids(
                corpus, id_col, vec_col, n_centroids, dim, iters=kmeans_iters
            )
        # each side's kernel schema derives from ITS OWN frame: typing
        # the query rows with the corpus's id/vector types would make
        # Arrow fail (or silently truncate double query vectors to
        # float32) whenever the two frames differ
        idt = corpus.schema[id_col].dataType.simpleString()
        vt = corpus.schema[vec_col].dataType.simpleString()
        q_idt = queries.schema[id_col].dataType.simpleString()
        q_vt = queries.schema[vec_col].dataType.simpleString()
        corpus_lists = kmeans_assign(
            corpus.select(
                F.col(id_col).alias("neighbour_id"),
                F.col(vec_col).alias("cvec"),
            ),
            "cvec",
            cents,
            f"neighbour_id {idt}, cvec {vt}",
        ).withColumn("cnrm", safe_norm("cvec", dim))
        q = kmeans_assign(
            queries.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("qvec"),
            ),
            "qvec",
            cents,
            f"query_id {q_idt}, qvec {q_vt}",
            nprobe=nprobe,
        ).withColumn("qnrm", safe_norm("qvec", dim))
    else:
        cent = ivf_centroids(corpus, id_col, vec_col, n_centroids, dim)
        c_assign = ivf_assign(
            corpus, cent, id_col, vec_col, dim=dim
        ).withColumnRenamed("vec_id", "aid")
        corpus_lists = corpus.join(
            c_assign, corpus[id_col] == F.col("aid")
        ).select(
            F.col("aid").alias("neighbour_id"),
            F.col(vec_col).alias("cvec"),
            norm(vec_col, dim).alias("cnrm"),
            "cent_id",
        )
        q_assign = ivf_assign(
            queries, cent, id_col, vec_col, nprobe=nprobe, dim=dim
        ).withColumnRenamed("vec_id", "qid")
        q = queries.join(q_assign, queries[id_col] == F.col("qid")).select(
            F.col("qid").alias("query_id"),
            F.col(vec_col).alias("qvec"),
            norm(vec_col, dim).alias("qnrm"),
            "cent_id",
        )
    j = corpus_lists.join(F.broadcast(q), on="cent_id").filter(
        F.col("neighbour_id") != F.col("query_id")
    )
    scored = j.select(
        "query_id",
        "neighbour_id",
        (dot("qvec", "cvec", dim) / (F.col("qnrm") * F.col("cnrm"))).alias(
            "cos"
        ),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbour_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbour_id",
            "rank",
            F.round(F.col("cos") + F.signum("cos") * 1e-9, 6).alias("cosine"),
        )
    )


def cosine_pairs_bucketed(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.3,
    planes: int = 6,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs, LSH-bucket prefiltered.

    Candidates are pairs landing in the same hyperplane bucket; only those
    get the exact cosine (and the threshold filter). The bucket join replaces
    the O(n^2) pair space with sum-over-buckets m_b^2/2 — with p planes the
    expected candidate volume drops by ~2^p. Approximate by design (a
    qualifying pair split by a hyperplane is missed); callers needing exact
    recall use brute force or multi-table banding as in MinHash LSH.

    The within-bucket kernel is ``applyInPandas`` + one blocked BLAS
    matmul (V @ V.T) per bucket — the quadratic inner loop is exactly what
    BLAS is for. Measured at sf0.1 (311k candidate pairs): expression-tree
    shapes ran 4-8s (interpreted HOF fold per pair, or an unrolled 64-term
    sum too big to JIT); this runs well under 1s. Only the n bucket
    assignments shuffle (one hash partitioning by bucket), never pairs.
    Row blocks cap the scorematrix at BLOCK x m_b so a skewed mega-bucket
    is memory-bounded (its m_b^2 compute is the operator's contract; salt
    with extra planes or band like MinHash LSH if that bites).
    BLAS summation order differs from the oracle's sequential fold by
    ~1e-15; the shared round(x + sign(x)*1e-9, 6) guard absorbs it."""
    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
    )

    idt = corpus.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField("d1", idt, True),
            StructField("d2", idt, True),
            StructField("cosine", DoubleType(), True),
        ]
    )
    b = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        lsh_bucket(vec_col, planes, dim).alias("bucket"),
    )

    def _pairs(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("vid")
        ids = pdf["vid"].to_numpy()
        V = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
        nrm = np.sqrt((V * V).sum(axis=1))
        # zero-vector guard (same as kmeans_assign/semdedup): 0/0 would
        # emit NaN cosines, and NaN > threshold silently DROPS every
        # pair touching the zero vector; clamping the norm to 1 yields
        # cosine 0, which the threshold filter excludes deterministically
        nrm[nrm == 0] = 1.0
        m = ids.size
        d1s, d2s, cs = [], [], []
        block = 4096
        for lo in range(0, m, block):
            hi = min(lo + block, m)
            G = V[lo:hi] @ V.T  # (hi-lo) x m scores, one BLAS call
            C = G / (nrm[lo:hi, None] * nrm[None, :])
            # upper triangle only: global col index > global row index
            r, c = np.nonzero(
                (C > threshold) & (np.arange(m)[None, :] > np.arange(lo, hi)[:, None])
            )
            cos = C[r, c]
            d1s.append(ids[r + lo])
            d2s.append(ids[c])
            cs.append(np.round(cos + np.sign(cos) * 1e-9, 6))
        return pd.DataFrame(
            {
                "d1": np.concatenate(d1s) if d1s else np.array([], dtype=ids.dtype),
                "d2": np.concatenate(d2s) if d2s else np.array([], dtype=ids.dtype),
                "cosine": np.concatenate(cs) if cs else np.array([], dtype=float),
            }
        )

    return b.groupBy("bucket").applyInPandas(_pairs, schema=out_schema)


def ann_topk_bucketed(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """LSH-bucketed ANN top-k: probe only the query's bucket, exact cosine
    rerank inside it. The corpus is scanned once, partition-local, and only
    the (tiny) query set broadcasts — the scale path next to the brute-force
    cosine_topk baseline. Fewer planes => bigger buckets => better recall at
    higher rerank cost; planes is the recall/cost dial."""
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        safe_norm(vec_col, dim).alias("qnrm"),
        lsh_bucket(vec_col, planes, dim).alias("bucket"),
    )
    cb = corpus.select(
        F.col(id_col).alias("neighbour_id"),
        F.col(vec_col).alias("cvec"),
        safe_norm(vec_col, dim).alias("cnrm"),
        lsh_bucket(vec_col, planes, dim).alias("bucket"),
    )
    j = cb.join(F.broadcast(qb), on="bucket").filter(
        F.col("neighbour_id") != F.col("query_id")
    )
    scored = j.select(
        "query_id",
        "neighbour_id",
        (dot("qvec", "cvec", dim) / (F.col("qnrm") * F.col("cnrm"))).alias(
            "cos"
        ),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbour_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbour_id",
            "rank",
            F.round(F.col("cos") + F.signum("cos") * 1e-9, 6).alias("cosine"),
        )
    )


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    n_cand: int = 8,
    lam: float = 0.7,
    mu: float = 0.3,
    dim: int | None = None,
) -> DataFrame:
    """Maximal-marginal-relevance diversified re-ranking (Carbonell &
    Goldstein '98): per query, greedily pick k of the top-``n_cand``
    relevance candidates maximizing

        step 1:   lam * rel(d)
        step i>1: lam * rel(d) - mu * max_{s in chosen} cos(d, s)

    ties on the candidate id. ``lam``/``mu`` are independent literals
    (NOT mu = 1 - lam) so both engines parse the identical decimal — the
    float of ``1 - 0.7`` differs from the literal ``0.3`` by one ulp,
    enough to flip a knife-edge argmax.

    Scale: candidate generation is the existing broadcast-query cosine
    pass (swap in the LSH/IVF path for huge corpora) — the corpus never
    shuffles; the greedy itself is inherently sequential per query but
    bounded to ``n_cand`` rows, so it runs as ONE Arrow grouped map
    keyed by query_id — O(k * n_cand^2) per group, parallel across
    queries. Pair cosines inside the kernel use cumsum (sequential
    left-associative) summation so they are bit-identical to a SQL
    list_sum fold over the same doubles."""
    import numpy as np
    import pandas as pd

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        safe_norm(vec_col, dim).alias("qnrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("doc"),
        F.col(vec_col).alias("cvec"),
        safe_norm(vec_col, dim).alias("cnrm"),
    )
    joined = c.join(F.broadcast(q), F.col("doc") != F.col("query_id"))
    scored = joined.select(
        "query_id",
        "doc",
        "cvec",
        (dot("qvec", "cvec", dim) / (F.col("qnrm") * F.col("cnrm"))).alias(
            "rel"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.col("rel").desc(), F.col("doc"))
    cand = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n_cand)
        .drop("rnk")
    )

    def _greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc").reset_index(drop=True)
        V = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cvec"]])
        prods = V[:, None, :] * V[None, :, :]
        dots = np.cumsum(prods, axis=-1)[..., -1]
        nrm = np.sqrt(np.cumsum(V * V, axis=-1)[..., -1])
        # zero-norm clamp (the safe_norm convention): one zero-vector
        # candidate would put NaN rows in S and poison every later
        # argmax step into arbitrary picks
        nrm[nrm == 0] = 1.0
        S = dots / (nrm[:, None] * nrm[None, :])
        rel = pdf["rel"].to_numpy()
        n = len(pdf)
        chosen: list[int] = []
        out_scores: list[float] = []
        for step in range(min(k, n)):
            if step == 0:
                sc = lam * rel
            else:
                sc = lam * rel - mu * S[:, chosen].max(axis=1)
            sc = sc.copy()
            sc[chosen] = -np.inf
            pick = int(np.argmax(sc))  # first max -> doc-asc tie-break
            chosen.append(pick)
            out_scores.append(float(sc[pick]))
        return pd.DataFrame(
            {
                # no int() cast: id columns keep their source type
                "query_id": [pdf["query_id"].iloc[0]] * len(chosen),
                "doc": pdf["doc"].iloc[chosen].to_numpy(),
                "mmr_rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
                "mmr_score": out_scores,
            }
        )

    # id types PROPAGATE from the inputs (cosine_pairs_bucketed pattern)
    # instead of hardcoding long — string/decimal ids must work too
    qid_t = cand.schema["query_id"].dataType.simpleString()
    doc_t = cand.schema["doc"].dataType.simpleString()
    out = cand.groupBy("query_id").applyInPandas(
        _greedy,
        f"query_id {qid_t}, doc {doc_t}, mmr_rank int, mmr_score double",
    )
    return out.select(
        "query_id",
        "doc",
        "mmr_rank",
        F.round(
            F.col("mmr_score") + F.signum("mmr_score") * 1e-9, 6
        ).alias("mmr"),
    )


def semdedup(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    cents: list[tuple[int, list[float]]],
    threshold: float = 0.8,
) -> DataFrame:
    """Semantic deduplication by cluster-then-prune (SemDeDup, Abbas et
    al. 2023, arXiv:2303.09540): assign every vector to its nearest
    k-means centroid, then WITHIN each cluster flag vectors that have a
    smaller-id neighbour above the cosine threshold; callers keep the
    unflagged representatives.

    Scale shape: the centroid assignment is the zero-shuffle Arrow/BLAS
    pass (:func:`kmeans_assign`); the only shuffle keys on ``cent_id``;
    pair work is one in-memory V@V.T per cluster, quadratic ONLY in the
    cluster size — which the operator of a 100 TB corpus bounds by
    scaling K with N (the paper's design point), never all-pairs across
    the corpus. Smaller-id-wins makes the kept set deterministic and
    engine-independent.

    Output: one row per vector — ``cent_id``, ``max_sim_smaller`` (max
    cosine to any smaller-id cluster-mate; null when none) and ``keep``.
    Rounding is left to the caller so the plan's float recipe stays in
    one place."""
    import numpy as np
    import pandas as pd

    # id AND vector types propagate from the input (see mmr_rerank):
    # hardcoding array<float> would silently truncate a double
    # embedding column to float32 before the pair cosines, flipping
    # threshold-edge keep verdicts vs the double-precision oracle
    id_t = df.schema[id_col].dataType.simpleString()
    vec_t = df.schema[vec_col].dataType.simpleString()
    assigned = kmeans_assign(
        df.select(id_col, vec_col),
        vec_col,
        cents,
        f"{id_col} {id_t}, {vec_col} {vec_t}",
    )
    schema = (
        f"{id_col} {id_t}, cent_id int, max_sim_smaller double,"
        " keep boolean"
    )

    def _prune(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        n = np.sqrt((V * V).sum(axis=1))
        n[n == 0] = 1.0
        # dot first, normalize after — the same float path as the SQL
        # oracle's list_sum/(sqrt*sqrt) (see cosine_pairs_bucketed)
        S = (V @ V.T) / (n[:, None] * n[None, :])
        S[np.triu_indices(len(S))] = -np.inf  # keep j < i only (incl. diag)
        ms = S.max(axis=1)
        has = np.isfinite(ms)
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "cent_id": pdf["cent_id"],
                # object column: Arrow maps None -> SQL NULL (a float NaN
                # would survive as NaN and diverge from the oracle)
                "max_sim_smaller": pd.Series(
                    [float(v) if h else None for v, h in zip(ms, has)],
                    dtype="object",
                ),
                "keep": ~has | (ms < threshold),
            }
        )

    return assigned.groupBy("cent_id").applyInPandas(_prune, schema)


def scalar_quantization_error(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    levels: int = 255,
    dim: int | None = None,
) -> DataFrame:
    """Per-vector reconstruction error of int8-style scalar quantization
    — the standard 4x memory reduction applied to ANN indexes before
    product quantization is worth its complexity (FAISS SQ8 analog,
    public knowledge).

    Train: per-dimension min/max in ONE aggregation pass (2 x dim agg
    expressions — no explode, no shuffle beyond the final combine; the
    trained range table is 2 x dim scalars, broadcast by construction).
    Encode/decode: a pure projection — code = round((v - mn) / (mx - mn)
    * levels), reconstruction mn + code / levels * (mx - mn); a
    zero-range dimension reconstructs exactly. Output: per-vector max
    absolute reconstruction error, the quantizer-acceptance metric.

    Stays entirely in whole-stage codegen: arrays_zip + transform +
    array_max are JVM HOFs over dim-sized arrays (well under the JIT
    expression budget that bans the unrolled-literal shapes)."""
    v = _as_double(F.col(vec_col))
    if dim is None:
        # probe costs one tiny job at plan-build time; callers on a hot
        # path (or on possibly-empty inputs) pass dim explicitly
        row = df.select(F.col(vec_col)).first()
        if row is None or row[0] is None:
            raise ValueError(
                "cannot infer vector dim from an empty/null-first input;"
                " pass dim explicitly"
            )
        dim = len(row[0])
    # try_element_at (the _dot_sql convention): a ragged vector shorter
    # than dim must contribute NULL to the min/max — raw element_at
    # aborts the whole stats aggregation under ANSI
    stats = df.select(
        *[
            F.min(F.try_element_at(v, F.lit(i + 1))).alias(f"mn{i}")
            for i in range(dim)
        ],
        *[
            F.max(F.try_element_at(v, F.lit(i + 1))).alias(f"mx{i}")
            for i in range(dim)
        ],
    ).select(
        F.array(*[F.col(f"mn{i}") for i in range(dim)]).alias("mns"),
        F.array(*[F.col(f"mx{i}") for i in range(dim)]).alias("mxs"),
    )
    z = F.arrays_zip(v.alias("v"), F.col("mns").alias("mn"),
                     F.col("mxs").alias("mx"))
    rng = lambda s: s["mx"] - s["mn"]  # noqa: E731
    deq = lambda s: F.when(rng(s) == 0, s["v"]).otherwise(  # noqa: E731
        s["mn"] + F.round((s["v"] - s["mn"]) / rng(s) * levels)
        / levels * rng(s)
    )
    err = F.array_max(F.transform(z, lambda s: F.abs(s["v"] - deq(s))))
    return (
        df.crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.round(err + F.lit(1e-9), 6).alias("max_abs_err"),
        )
    )


def jl_signs(k: int = 16, dim: int = 64) -> list[list[int]]:
    """Deterministic Rademacher (+1/-1) Johnson-Lindenstrauss projection
    matrix, derived from md5 so any engine (or auditor) can regenerate
    it: sign[j][i] = +1 iff the first hex digit of md5("j_i") < 8. The
    matrix is embedded as LITERALS in both the Spark expression and the
    SQL oracle — at 100 TB this is exactly the "broadcast a seeded
    matrix" pattern (the matrix is k x dim regardless of corpus size);
    deriving it at plan-build time keeps runtime hashing out of the per-
    row loop entirely."""
    import hashlib

    return [
        [
            1
            if int(hashlib.md5(f"{j}_{i}".encode()).hexdigest()[0], 16) < 8
            else -1
            for i in range(1, dim + 1)
        ]
        for j in range(k)
    ]


def jl_dist2_sql(diff: str, elem_fmt: str, k: int = 16, dim: int = 64) -> str:
    """Squared L2 norm of the k-dim JL projection of vector ``diff``, as
    ONE SQL string valid in BOTH Spark SQL and DuckDB (the caller picks
    the element accessor via ``elem_fmt``, e.g.
    ``"coalesce(CAST(try_element_at({v}, {i}) AS DOUBLE), 0D)"`` for
    Spark or ``"CAST({v}[{i}] AS DOUBLE)"`` for DuckDB). Projection is
    linear, so distance in projected space is the projection of the
    difference — one pass, no per-side projections. Every sum is written
    left-associative in index order, so both engines fold identically."""
    signs = jl_signs(k, dim)
    comps = []
    for j in range(k):
        terms = "".join(
            (" + " if s > 0 else " - ") + elem_fmt.format(v=diff, i=i + 1)
            for i, s in enumerate(signs[j])
        )
        comps.append(f"((0.0{terms}) / {float(k) ** 0.5!r})")
    total = " + ".join(f"pow({c}, 2)" for c in comps)
    return f"(0.0 + {total})"


def pca_fit(
    corpus: DataFrame, vec_col: str = "embedding", dim: int = 64, k: int = 8
):
    """Fit a k-component PCA over an embedding column the 100 TB way:
    each partition emits ONE Gram partial (count, column sums, X^T X as
    a dim^2 array) from a single Arrow/BLAS pass, the driver folds the
    bounded partials (partition-id-sorted so the float fold is
    deterministic) and eigendecomposes the dim x dim covariance —
    O(dim^2) driver state, never O(rows). Eigenvectors are
    sign-canonicalized (largest-|coordinate| entry positive) so the fit
    is reproducible run to run. Returns ``(mu, W, evr)``: mean vector,
    (k, dim) component rows, and the explained-variance ratios.

    This is the TRAINED counterpart to the data-oblivious ``jl_signs``
    projection: JL preserves distances without looking at the data; PCA
    spends one corpus pass to pack the most variance into the fewest
    components (lower reconstruction error at the same k)."""
    import numpy as np

    src = corpus.select(_as_double(F.col(vec_col)).alias("vec"))

    def op(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            n += len(V)
            s += V.sum(axis=0)
            g += V.T @ V
        if n:
            yield pd.DataFrame(
                {"pid": [pid], "n": [n], "s": [s.tolist()],
                 "g": [g.ravel().tolist()]}
            )

    parts = src.mapInPandas(
        op, "pid int, n long, s array<double>, g array<double>"
    ).collect()
    n = 0
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for r in sorted(parts, key=lambda r: r.pid):
        n += r.n
        s += np.array(r.s)
        g += np.array(r.g).reshape(dim, dim)
    mu = s / n
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(-evals)[:k]
    W = evecs[:, order].T.copy()
    for row in W:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    evr = (evals[order] / evals.sum()).tolist()
    return mu, W, evr


def pca_project(
    corpus: DataFrame,
    mu,
    W,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project each vector onto the fitted components and score the
    squared reconstruction error — one Arrow/BLAS pass per batch, the
    (k, dim) matrix rides the task closure (broadcast-sized), zero
    shuffle. Output: id, pc1, pc2, recon_err."""
    import numpy as np

    mu = np.asarray(mu, dtype=np.float64)
    Wm = np.asarray(W, dtype=np.float64)
    src = corpus.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    )

    def op(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["vec"].to_numpy()).astype(np.float64) - mu
            P = V @ Wm.T
            R = P @ Wm
            err = ((V - R) ** 2).sum(axis=1)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "pc1": P[:, 0],
                    "pc2": P[:, 1],
                    "recon_err": err,
                }
            )

    id_t = corpus.schema[id_col].dataType.simpleString()
    return src.mapInPandas(
        op, f"id {id_t}, pc1 double, pc2 double, recon_err double"
    )
