"""Training-data pipeline plumbing: deterministic dataset splits,
sequence packing, TF-IDF term weighting.

These are the corpus-management ops a pre-training pipeline runs after
dedup/quality filtering (SURVEY.md §2 training-data extensions). All are
pure Column expressions; the only floats (TF-IDF's ln) go through the
repo's eps-round guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from n2khab_mhq_data_spark.llmdata.text import tokens

HASH_PRIME = 1_000_003


def _id_hash(id_col: Column) -> Column:
    """Portable integer id hash in [0, HASH_PRIME) — the ONE home of the
    ``(id * 131071 + 524287) mod p`` recipe every sampler and splitter
    shares (was inlined four times; changing the constants in one site
    and not the others would silently break the cross-engine
    stability contract). ``pmod`` keeps negative ids in range. The id
    is widened to LONG first: an IntegerType id would overflow int32 at
    id >= 16384 — wrapping negative (a different pct than any 64-bit
    re-computation of the documented recipe) in non-ANSI mode, aborting
    under ANSI."""
    return F.pmod(id_col.cast("long") * 131071 + 524287, F.lit(HASH_PRIME))


def split_hash(id_col: Column) -> Column:
    """Deterministic 0..99 percentile bucket from an integer id — plain
    integer arithmetic reproducible in any engine (same recipe as the
    repo's portable hashes). Splitting by hash, not by position, keeps
    assignments stable under corpus growth and needs no shuffle.

    ``pmod`` (not ``%``, which keeps the dividend's sign) so NEGATIVE ids
    still land in 0..99 — with ``%`` every negative id hashed to a
    negative pct and fell into 'train', silently skewing the 80/10/10
    contract. Same convention as operators/skew.with_salt.

    A NULL id fails FAST: the when-ladder consumers build on this
    (``pct < 80``) is never true for NULL, so a null id silently fell
    through to the 'test' bucket — every corrupt/outer-joined row
    concentrated in the evaluation split."""
    return F.when(
        id_col.isNull(),
        F.raise_error(
            F.lit("split_hash: NULL id — splits need a non-null key")
        ).cast("bigint"),
    ).otherwise(F.pmod(_id_hash(id_col), 100))


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign every row a deterministic train/val/test split label.
    A projection — no shuffle, no state, no RNG; rerunning on a grown
    corpus never reassigns an existing id."""
    pct = split_hash(F.col(id_col))
    return df.select(
        F.col(id_col),
        pct.cast("long").alias("pct"),
        F.when(pct < train_pct, "train")
        .when(pct < train_pct + val_pct, "val")
        .otherwise("test")
        .alias("split"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    part_col: str,
    budget: int = 2048,
) -> DataFrame:
    """Budget-quantized sequential packing: within each ``part_col`` shard,
    docs (ordered by id) are assigned to the context-window bin their
    preceding token cumsum lands in — bin = floor(cum_before / budget).
    Deterministic and one window pass; unlike first-fit greedy packing it
    lets a doc overshoot its bin boundary rather than opening a new bin,
    which is the standard streaming-friendly approximation (exact greedy
    needs a sequential scan per shard).

    Scale: the window partitions by the shard column, so packing
    parallelizes across shards and no global ordering exists — exactly
    how a multi-file tokenizer run behaves. Integer-only arithmetic.
    Returns per-bin stats (the pack manifest)."""
    tok = F.size(tokens(F.col(text_col))).cast("long")
    w = (
        W.partitionBy("shard")
        .orderBy("doc")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tok").over(w), F.lit(0).cast("long"))
    binned = df.select(
        F.col(part_col).alias("shard"),
        F.col(id_col).alias("doc"),
        tok.alias("n_tok"),
    ).withColumn("bin", F.floor(cum_before / budget))
    return binned.groupBy("shard", "bin").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("token_sum"),
        F.min("doc").alias("first_doc"),
        F.max("doc").alias("last_doc"),
    )


def tfidf_topk(
    df: DataFrame, text_col: str, id_col: str, k: int = 3
) -> DataFrame:
    """Top-k TF-IDF terms per document: tf = in-doc occurrences, idf =
    ln((N+1)/(df+1)) + 1 (smoothed), ties broken on the token string.

    One shuffle builds the (doc, token) tf table; document frequency is a
    window over the SAME partitioning; the 1-row corpus-size dim
    broadcasts. Scores are eps-rounded for engine portability; ranking
    compares raw doubles — both engines compute ln via their libm, which
    agrees to the ulp on these inputs (differentially checked)."""
    tf = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens(F.col(text_col))).alias("tok"),
        )
        .groupBy("doc", "tok")
        .agg(F.count("*").alias("tf"))
    )
    docfreq = tf.withColumn("df", F.count("*").over(W.partitionBy("tok")))
    ndocs = df.select(
        F.countDistinct(id_col).cast("double").alias("n_docs")
    )
    scored = docfreq.join(F.broadcast(ndocs)).select(
        "doc",
        "tok",
        (
            F.col("tf")
            * (
                F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
                + F.lit(1.0)
            )
        ).alias("score"),
    )
    w = W.partitionBy("doc").orderBy(F.col("score").desc(), F.col("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc",
            "tok",
            "rank",
            F.round(F.col("score") + F.signum("score") * 1e-9, 6).alias(
                "tfidf"
            ),
        )
    )


def bm25_index(
    df: DataFrame, text_col: str, id_col: str
) -> tuple[DataFrame, DataFrame]:
    """The corpus-side BM25 artifacts — the (doc, term, tf) postings
    table and the (doc, dl) doc-length table. Query-independent, so a
    retrieval pipeline materializes them ONCE per corpus version (this
    is literally what building a search index means); bm25_topk accepts
    them prebuilt via ``index=``."""
    tf = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(tokens(F.col(text_col))).alias("term"),
        )
        .groupBy("doc", "term")
        .agg(F.count("*").alias("tf"))
    )
    doclen = tf.groupBy("doc").agg(F.sum("tf").alias("dl"))
    return tf, doclen


def bm25_topk(
    df: DataFrame,
    queries_df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """BM25 ranked retrieval: top-k documents per query (Robertson/
    Sparck-Jones idf as used by Lucene, always positive):

        idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(q,d) = sum_t idf(t) * tf * (k1+1)
                                  / (tf + k1 * (1 - b + b * dl/avgdl))

    ``queries_df`` is a small (query_id, term) relation — one row per
    query term, duplicate terms deduped so a repeated term scores once
    (the standard bag-of-query-TERMS simplification).

    Scale: the (doc, term) tf table is one shuffle over the corpus;
    doc-frequency and doc-length hang off it as map-side-combinable
    aggregations (df additionally prunable to query terms only —
    expressed here as an agg AFTER the semi-filtering broadcast join so
    only matched terms shuffle); the query relation and the 1-row corpus
    stats broadcast. Per-query scoring touches only postings of query
    terms — selectivity |query vocab| / |vocab| — and the final top-k is
    a bounded per-query window. Nothing is ever all-docs x all-queries.
    Scores eps-rounded for engine portability; ranking compares raw
    doubles (libm ln agrees to the ulp — the tfidf_topk precedent)."""
    tf, doclen = index if index is not None else bm25_index(
        df, text_col, id_col
    )
    stats = doclen.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    qterms = queries_df.select("query_id", "term").distinct()
    # postings of query terms only; df computed on the pruned postings
    posts = tf.join(F.broadcast(qterms.select("term").distinct()), "term")
    dfreq = posts.groupBy("term").agg(F.count("*").alias("df"))
    contrib = (
        posts.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(qterms), "term")
        .join(doclen, "doc")
        .join(F.broadcast(stats))
    )
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    scored = contrib.groupBy("query_id", "doc").agg(
        F.sum(idf * F.col("tf") * (k1 + 1.0) / norm).alias("score"),
        F.count("*").alias("n_terms_hit"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), "doc")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc",
            "rank",
            "n_terms_hit",
            F.round(F.col("score") + F.lit(1e-9), 6).alias("bm25"),
        )
    )


def rrf_fuse(
    legs: dict[str, DataFrame],
    k: int = 5,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher '09) of named
    retrieval runs — the standard hybrid-retrieval combiner (lexical
    BM25 + dense cosine being the canonical pair):

        rrf(q, d) = sum over legs where d appears:  1 / (c + rank)

    Each leg is a (query_id, doc, rank) relation. Missing legs simply
    contribute nothing (no imputed rank). Ties on doc id.

    Scale: each leg is already a bounded top-n per query, so the fused
    relation is at most ``n_legs * n`` rows per query — the union +
    groupBy shuffles only that bounded set, never the corpus; the final
    top-k is a per-query window over <= n_legs * n rows. Float safety:
    every addend 1/(c+rank) is an exact IEEE division of small integers,
    and a doc appears in at most ``n_legs`` legs, so the sum has <= 2-3
    terms — engine-order-proof (2-term FP addition is commutative)."""
    tagged = None
    for name, df in legs.items():
        t = df.select(
            "query_id", "doc", "rank", F.lit(name).alias("leg")
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    assert tagged is not None, "rrf_fuse needs at least one leg"
    fused = tagged.groupBy("query_id", "doc").agg(
        F.sum(1.0 / (F.lit(float(c)) + F.col("rank"))).alias("score"),
        F.count("*").alias("n_legs"),
        F.min(F.col("rank")).alias("best_rank"),
    )
    w = W.partitionBy("query_id").orderBy(F.col("score").desc(), "doc")
    return (
        fused.withColumn("rrf_rank", F.row_number().over(w))
        .filter(F.col("rrf_rank") <= k)
        .select(
            "query_id",
            "doc",
            "rrf_rank",
            "n_legs",
            "best_rank",
            F.round(F.col("score") + F.lit(1e-9), 6).alias("rrf"),
        )
    )


def retrieval_metrics(
    run: DataFrame,
    qrels: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval-quality metrics of a ranked ``run``
    (query_id, doc, rank) against graded relevance judgments ``qrels``
    (query_id, doc, rel >= 1) — the eval harness a retrieval/RAG
    curation pipeline runs after every index change:

        mrr      = 1 / rank of the first relevant hit        (0 if none)
        dcg@k    = sum over hits: (2^rel - 1) / log2(rank+1)
        idcg@k   = same over the ideal ordering of qrels (top k)
        ndcg@k   = dcg / idcg
        recall@k = distinct relevant docs retrieved / total relevant

    Every query present in qrels gets a row (zero metrics when the run
    retrieved nothing relevant, or retrieved nothing at all).

    Scale: the run is already bounded to top-k per query and qrels is a
    judgment set (human- or rule-sized) — both shuffle on query_id only;
    the hit join is qrels-broadcast when qrels is small, and never
    touches the corpus. Float safety: dcg/idcg sum <= k log-terms of
    similar magnitude; results eps-rounded."""
    run = run.filter(F.col("rank") <= k)
    qr = qrels.select("query_id", "doc", F.col("rel").cast("int"))
    gain = F.pow(F.lit(2.0), F.col("rel")) - 1.0
    # ideal ordering: judgments by grade desc (doc asc tie-break is
    # value-neutral — equal grades contribute identical terms)
    iw = W.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc")
    )
    # r12 (duplicate-scan sweep, guide §2.4): idcg and n_rel ride ONE
    # aggregate over the windowed judgments — the old separate
    # ideal/totals legs re-evaluated the qrels subtree twice (a full
    # judgment-source pass each when qrels derives from the corpus, as
    # in eval_retrieval_metrics) and paid an extra join to glue them
    # back. The top-k filter folds into the sum's when(): every query
    # keeps its row (pos=1 always qualifies), so the output is
    # unchanged row-for-row.
    base = (
        qr.withColumn("pos", F.row_number().over(iw))
        .groupBy("query_id")
        .agg(
            F.sum(
                F.when(
                    F.col("pos") <= k, gain / F.log2(F.col("pos") + 1.0)
                )
            ).alias("idcg"),
            F.count("*").alias("n_rel"),
        )
    )
    hits = run.join(F.broadcast(qr), ["query_id", "doc"])
    per_q = hits.groupBy("query_id").agg(
        F.sum(gain / F.log2(F.col("rank") + 1.0)).alias("dcg"),
        (1.0 / F.min("rank")).alias("mrr"),
        F.count("*").alias("n_hits"),
    )
    out = (
        base.join(F.broadcast(per_q), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            "n_rel",
            F.round(
                F.coalesce(F.col("mrr"), F.lit(0.0)) + 1e-9, 6
            ).alias("mrr"),
            F.round(
                F.coalesce(F.col("dcg") / F.col("idcg"), F.lit(0.0))
                + 1e-9,
                6,
            ).alias("ndcg"),
            F.round(
                (
                    F.coalesce(F.col("n_hits"), F.lit(0))
                    / F.col("n_rel").cast("double")
                )
                + 1e-9,
                6,
            ).alias("recall"),
        )
    )
    return out


def quality_filter(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Composite keep/drop verdict over the heuristic quality signals —
    the final gate of a filtering pipeline, with machine-readable reason
    codes (ordered, comma-joined) so downstream audits can attribute
    every drop. One projection; thresholds compare doubles both engines
    derive from identical integer counts, so verdicts are bit-stable."""
    from n2khab_mhq_data_spark.llmdata.text import quality_metrics

    m = quality_metrics(F.col(text_col))
    reasons = F.concat_ws(
        ",",
        # NULL text first: every metric comparison below is NULL for it
        # and concat_ws SKIPS NULLs, so without an explicit reason a
        # NULL-text doc would score reasons='' and keep=true — the
        # worst document passing the final gate
        F.when(F.col(text_col).isNull(), "null_text"),
        F.when(m["n_tokens"] < 20, "too_short"),
        F.when(m["n_tokens"] > 1000, "too_long"),
        F.when(m["punct_ratio"] > 0.10, "puncty"),
        F.when(m["stopword_ratio"] < 0.02, "low_stopword"),
    )
    return df.select(
        F.col(id_col),
        reasons.alias("reasons"),
        (reasons == "").alias("keep"),
    )


def hash_sample(df: DataFrame, id_col: str, k: int = 100) -> DataFrame:
    """Deterministic uniform-ish sample: the k rows with the smallest
    portable hash of their id (ties impossible — the hash is injective
    mod p for id < p). The RNG-free analog of reservoir sampling: stable
    across runs and engines, and growing the corpus only swaps rows at
    the hash boundary. orderBy + limit compiles to TakeOrderedAndProject:
    each partition contributes its local top k and the driver merges —
    the full table is never shuffled (a global row_number window would
    move every row to one partition). ``pmod`` keeps negative ids in
    [0, p) — the module-wide convention set by ``split_hash``."""
    h = _id_hash(F.col(id_col))
    return (
        df.select(F.col(id_col), h.alias("h"))
        .orderBy(F.col("h").asc(), F.col(id_col))
        .limit(k)
    )


def redact_text(text: Column) -> Column:
    """PII-style scrub: emails then digit runs (phone-ish), each replaced
    by a typed tag. Order matters (emails can contain digits); patterns
    are RE2-safe so any engine's regex applies them identically."""
    t = F.regexp_replace(
        text, r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"
    )
    return F.regexp_replace(t, r"[0-9][0-9 ()+-]{6,}[0-9]", "<PHONE>")


def pack_greedy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    part_col: str,
    budget: int = 2048,
) -> DataFrame:
    """EXACT first-fit greedy packing (the quantized variant's precise
    sibling): walk each shard's docs in id order, close the current bin
    whenever adding the next doc would exceed the budget; an oversized
    doc gets a bin of its own. Inherently sequential per shard — an
    ``applyInPandas`` kernel (one cumsum-style Python pass per shard
    group), parallel ACROSS shards, which is how tokenizer runs shard
    anyway. Returns the per-doc bin assignment."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("shard", df.schema[part_col].dataType, True),
            StructField("doc", df.schema[id_col].dataType, True),
            StructField("n_tok", LongType(), True),
            StructField("bin", LongType(), True),
        ]
    )
    src = df.select(
        F.col(part_col).alias("shard"),
        F.col(id_col).alias("doc"),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tok"),
    )

    def _pack(pdf):
        pdf = pdf.sort_values("doc").reset_index(drop=True)
        bins = []
        b, fill = 0, None
        for n in pdf["n_tok"]:
            n = int(n)
            if fill is None:
                fill = n
            elif fill + n > budget:
                b += 1
                fill = n
            else:
                fill += n
            bins.append(b)
        pdf["bin"] = bins
        return pdf[["shard", "doc", "n_tok", "bin"]]

    return src.groupBy("shard").applyInPandas(_pack, schema=out_schema)


def stratified_hash_sample(
    df: DataFrame, id_col: str, stratum_col: str, per_stratum: int = 25
) -> DataFrame:
    """Deterministic stratified sample: within each stratum, the
    ``per_stratum`` rows with the smallest portable id hash — equal-size
    strata regardless of group skew, stable across runs/engines/growth
    (same contract as ``hash_sample``, per group). The window partitions
    by stratum, so it parallelizes across strata and never globally
    sorts."""
    h = _id_hash(F.col(id_col))
    w = W.partitionBy("stratum").orderBy(F.col("h").asc(), F.col(id_col))
    return (
        df.select(
            F.col(stratum_col).alias("stratum"), F.col(id_col), h.alias("h")
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_stratum)
        .select("stratum", id_col, "h")
    )


def weighted_hash_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column | str,
    k: int = 50,
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-Res): key = u^(1/w) with u derived from the
    portable id hash instead of an RNG; the k largest keys are the
    sample, so inclusion probability scales with weight yet reruns are
    bit-stable. orderBy + limit compiles to TakeOrderedAndProject (local
    top-k per partition, no full shuffle). Ranking compares doubles both
    engines derive from identical integers via pow — the repo's float
    recipe (eps-rounded output, integer tie-break) applies."""
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    # Efraimidis-Spirakis requires w > 0: a NEGATIVE weight makes
    # u^(1/w) > 1, beating every legitimate key (in (0,1]) — the
    # worst-weighted rows would fill the whole sample; w = 0 NULLs the
    # key and silently drops the row. Fail fast; callers with
    # log-weights (dsir_logweights) exp() them first.
    w = F.when(
        w.isNull() | (w <= 0),
        F.raise_error(
            F.lit(
                "weighted_hash_sample: weights must be > 0"
                " (exp() log-weights before sampling)"
            )
        ).cast("double"),
    ).otherwise(w)
    u = (_id_hash(F.col(id_col)) + 1.0) / (HASH_PRIME + 1.0)
    key = F.pow(u, 1.0 / w)
    return (
        df.select(F.col(id_col), key.alias("key"))
        .orderBy(F.col("key").desc(), F.col(id_col))
        .limit(k)
        .select(
            id_col,
            F.round(F.col("key") + F.lit(1e-9), 6).alias("sample_key"),
        )
    )


def dsir_logweights(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    target: Column,
    buckets: int = 1024,
) -> DataFrame:
    """Data Selection via Importance Resampling weights (DSIR, Xie et
    al. 2023, arXiv:2302.03169): per-document log importance weight
    ``log p_target(x) - log p_raw(x)`` under bag-of-hashed-ngrams unigram
    models — the standard recipe for steering a raw crawl toward a
    target domain before training.

    Features are word unigrams + bigrams hashed into ``buckets`` cells
    with the repo's portable md5 hash, so recorded weights reproduce on
    any engine. Both bucket models use add-1 smoothing over the SAME
    bucket universe.

    Scale shape: one explode + one groupBy(bucket) builds both models
    (map-side combine collapses the gram stream; the model is
    ``buckets`` rows — broadcast size by construction); the per-doc pass
    joins the broadcast model and re-aggregates on the doc id. No
    driver-side collect; the corpus is scanned twice (model fit +
    scoring), which is DSIR's own two-pass structure."""
    from n2khab_mhq_data_spark.llmdata.text import word_bigrams
    from n2khab_mhq_data_spark.operators.pinning import row_hash

    ws = tokens(F.col(text_col))
    bigrams = word_bigrams(ws)
    grams = docs.select(
        F.col(id_col).alias("doc"),
        target.alias("is_target"),
        F.explode(F.concat(ws, bigrams)).alias("g"),
    ).select(
        "doc",
        "is_target",
        F.pmod(row_hash(F.col("g")), F.lit(buckets)).alias("bucket"),
    )
    counts = grams.groupBy("bucket").agg(
        F.count("*").alias("n_raw"),
        F.count(F.when(F.col("is_target"), 1)).alias("n_tgt"),
    )
    # model totals as a window over the <= buckets-row counts table
    # (domain-bounded — the benign planning-table window class), NOT a
    # separate aggregate leg: the totals/model pair otherwise evaluates
    # the gram explode twice more on top of the scoring pass (the plan
    # showed 3 full tokenize+hash passes where DSIR's own structure
    # needs 2). Same integers, same float ops.
    wall = W.partitionBy()
    model = counts.select(
        "bucket",
        (
            F.log(
                (F.col("n_tgt") + 1)
                / (F.sum("n_tgt").over(wall) + buckets)
            )
            - F.log(
                (F.col("n_raw") + 1)
                / (F.sum("n_raw").over(wall) + buckets)
            )
        ).alias("logratio"),
    )
    per_doc = (
        grams.join(F.broadcast(model), "bucket")
        .groupBy("doc")
        .agg(F.sum("logratio").alias("logw"))
    )
    lw = F.coalesce(F.col("logw"), F.lit(0.0))
    return (
        docs.select(F.col(id_col).alias("doc"))
        .join(per_doc, "doc", "left")
        .select(
            F.col("doc").alias(id_col),
            F.round(lw + F.signum(lw) * 1e-9, 6).alias("dsir_logweight"),
        )
    )


def budget_waterfill(
    per_group: DataFrame,
    budget: Column,
    group_col: str = "source",
    size_col: str = "n_tokens",
) -> DataFrame:
    """Water-filling token-budget allocation: give every group up to a
    common level L, where L is chosen so allocations sum to ``budget``
    (groups smaller than L keep everything; bigger groups are capped).
    This is the classic fair-allocation step of mixture planning — cap
    the over-represented domains, keep the tails whole.

    Closed form via windows (no iteration): sort groups by size
    ascending; with prefix sum P_k and k-1 groups already saturated, the
    candidate level is L_k = (B - P_{k-1}) / (S - k + 1). L_k is
    feasible iff L_k <= n_k, and the true level is the MAX over feasible
    candidates (for k past the pivot the candidate only shrinks). One
    window pass + one tiny self-attach — all on the per-group table,
    whose grain (number of domains/sources) is planning-table small by
    construction; the corpus-sized work happened in the upstream
    aggregation that produced ``per_group``.
    """
    from pyspark.sql.window import Window as W

    w = W.orderBy("n", "grp")
    sized = per_group.select(
        F.col(group_col).alias("grp"),
        F.col(size_col).cast("double").alias("n"),
    )
    ordered = sized.select(
        "grp",
        "n",
        F.row_number().over(w).alias("rk"),
        (F.sum("n").over(w) - F.col("n")).alias("p_before"),
        F.count("*").over(
            W.orderBy(F.lit(1)).rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("s"),
    )
    cand = ordered.withColumn(
        "lk",
        (budget - F.col("p_before")) / (F.col("s") - F.col("rk") + 1),
    )
    level = cand.filter(F.col("lk") <= F.col("n")).agg(
        F.max("lk").alias("level")
    )
    return (
        cand.crossJoin(F.broadcast(level))
        .select(
            F.col("grp").alias(group_col),
            F.col("n").cast("bigint").alias(size_col),
            F.round(F.least(F.col("n"), F.col("level")) + F.lit(1e-9), 6)
            .alias("allocation"),
            F.round(
                F.least(F.col("n"), F.col("level")) / F.col("n")
                + F.lit(1e-9),
                6,
            ).alias("keep_rate"),
        )
    )


def leakage_safe_split(
    docs: DataFrame,
    near_pairs: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Near-dup-aware train/val/test split: every document in one
    near-dup component is assigned the split of the component's
    CANONICAL id (min doc id), so a pair of near-duplicates can never
    straddle the train/test boundary — the standard guard against
    evaluation leakage that a plain per-doc hash split does not give.

    Shape: connected components over the near-dup pair graph (the same
    iterative min-label kernel as dedup_components), one LEFT join to
    attach each doc's component (docs outside any pair keep their own
    id), then the deterministic ``split_hash`` projection on the group
    id. At scale the component table is far smaller than the corpus
    (only docs with a near-dup), so AQE broadcasts it; the split itself
    adds no shuffle."""
    from n2khab_mhq_data_spark.llmdata.dedup import connected_components

    comp = connected_components(near_pairs, "d1", "d2").withColumnRenamed(
        "doc", id_col
    )
    gid = F.coalesce(F.col("component_id"), F.col(id_col))
    pct = split_hash(gid)
    return (
        docs.select(id_col)
        # shuffle_hash: no ordering is reused downstream and the
        # component table is the far smaller side — skip the SMJ sorts
        # (AQE upgrades to broadcast when comp is tiny)
        .join(comp.hint("shuffle_hash"), id_col, "left")
        .select(
            F.col(id_col),
            gid.alias("group_id"),
            pct.cast("long").alias("pct"),
            F.when(pct < train_pct, "train")
            .when(pct < train_pct + val_pct, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


def temporal_split(
    df: DataFrame,
    ts_col: str,
    cutoff: str,
    embargo: str = "0 seconds",
) -> DataFrame:
    """Leakage-safe TEMPORAL split: rows strictly before ``cutoff`` are
    train, rows at or after ``cutoff + embargo`` are test, and rows
    inside the embargo window are EXCLUDED (split = null) — the purged
    split of time-ordered ML evaluation (forecasting, event models):
    features computed near the boundary leak label information across
    it, so a gap is removed instead of risking adjacency leakage.

    Pure projection — no shuffle, no UDF; the cutoff/embargo arithmetic
    folds to literals so the comparison is codegen against the scan."""
    cut = F.lit(cutoff).cast("timestamp")
    test_from = F.to_timestamp(
        F.lit(cutoff).cast("timestamp") + F.expr(f"INTERVAL {embargo}")
    )
    return df.withColumn(
        "split",
        F.when(F.col(ts_col) < cut, "train")
        .when(F.col(ts_col) >= test_from, "test")
        .otherwise(F.lit(None).cast("string")),
    )
