"""Record linkage — blocked sorted-neighborhood candidate pairs with
edit-distance scoring.

The reference reconciles entity tables across survey cycles by exact keys
(K9 reconciliation cascade, mhq_terr_inboveg_fieldmap.Rmd); real-world
registries additionally need *fuzzy* matching for typo'd identifiers.
This operator family is the classic scalable recipe:

1. **Blocking** keeps the pair space linear: records are hashed into
   blocks and only within-block pairs are compared. A single blocking
   pass misses near-matches that straddle a block boundary, so we run
   the standard *overlapping* variant — a second pass with boundaries
   shifted by half a block — and union the candidates (Hernandez &
   Stolfo's multi-pass sorted-neighborhood method).
2. **Sorted neighborhood** inside each block: sort by the linkage key
   and compare each record to its next ``window - 1`` neighbors via
   ``lead()``. Every window is a ``partitionBy(block)`` window — there
   is no global-sort single-partition bottleneck, so the plan holds at
   any scale.
3. **Edit-distance scoring** with the built-in JVM ``levenshtein``
   (whole-stage codegen; no Python in the loop).

Cost model at 100 TB: pairs = rows x (window - 1) x 2 passes — strictly
linear in input; the shuffle key is the block id whose cardinality the
caller controls via ``block_expr``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    block_exprs: list[Column],
    window: int = 3,
    max_dist: int = 2,
) -> DataFrame:
    """Candidate pairs ``(id1, id2, key1, key2, lev_dist)`` from one
    sorted-neighborhood pass per blocking expression, unioned and
    deduped; only pairs with ``levenshtein <= max_dist`` survive.

    ``block_exprs`` — one Column per blocking pass (e.g. the same hash
    with shifted boundaries). ``window`` — neighborhood width: each
    record is compared to its ``window - 1`` successors in key order.
    Pairs are canonicalized ``id1 < id2`` so multi-pass duplicates
    collapse in the final ``distinct``.
    """
    if window < 2:
        raise ValueError(
            f"window={window} generates no comparisons (each record is"
            " compared to its window - 1 successors; need window >= 2)"
        )
    if not block_exprs:
        raise ValueError(
            "block_exprs is empty — pass at least one blocking pass"
            " (use F.lit(0) for a single global sort)"
        )
    passes = []
    for block in block_exprs:
        base = df.select(
            F.col(id_col).alias("id"), F.col(key_col).alias("key"),
            block.alias("blk"),
        )
        w = W.partitionBy("blk").orderBy("key", "id")
        # ALL lead steps ride ONE window spec in ONE select: Spark plans
        # a single Exchange + Sort shared by every lead(, step), where a
        # select-per-step would re-shuffle and re-sort the corpus
        # (window - 1) times per blocking pass — the dominant cost at
        # scale. The (nid, nkey) pairs then unpack via explode.
        neighbors = F.array(
            *[
                F.struct(
                    F.lead("id", step).over(w).alias("nid"),
                    F.lead("key", step).over(w).alias("nkey"),
                )
                for step in range(1, window)
            ]
        )
        # two steps: window functions may not appear inside a generator,
        # so materialize the lead array in a projection first, then
        # explode the plain column
        nxt = (
            base.select("id", "key", neighbors.alias("nbs"))
            .select("id", "key", F.explode("nbs").alias("nb"))
            .select("id", "key", "nb.nid", "nb.nkey")
            .filter(F.col("nid").isNotNull())
        )
        passes.append(
            nxt.select(
                F.least("id", "nid").alias("id1"),
                F.greatest("id", "nid").alias("id2"),
                F.when(F.col("id") < F.col("nid"), F.col("key"))
                .otherwise(F.col("nkey")).alias("key1"),
                F.when(F.col("id") < F.col("nid"), F.col("nkey"))
                .otherwise(F.col("key")).alias("key2"),
                F.levenshtein("key", "nkey").alias("lev_dist"),
            )
        )
    out = passes[0]
    for p in passes[1:]:
        out = out.unionAll(p)
    return out.filter(F.col("lev_dist") <= max_dist).distinct()


def edit_distance_join_deletion(
    df: DataFrame,
    id_col: str,
    key_col: str,
    block_cols: list[str] | None = None,
    hot_bucket_cap: int = 1024,
) -> DataFrame:
    """EXACT edit-distance <= 1 self-join via the deletion-neighborhood
    (FastSS / SymSpell family) — the LOSSLESS complement to
    ``sorted_neighborhood_pairs``, which is a heuristic that can miss a
    true match landing outside every block window.

    Each key emits ``len + 1`` join keys: itself plus every
    single-character deletion. Two strings at Levenshtein distance <= 1
    MUST share one of these keys — a substitution at position i makes
    both i-deletions equal; an insert/delete makes the longer string's
    deletion equal the shorter string itself (present as its identity
    key); equal strings share the identity key. So joining on the
    variant key is a complete candidate generator, and the built-in JVM
    ``levenshtein`` verification makes it exact: provably the same
    output as the quadratic all-pairs join.

    ``block_cols`` adds composite blocking: variants only join within
    equal block-attribute groups (ER practice — candidates must agree
    on the hard keys before fuzzy-matching the soft one), which also
    divides per-variant fan-out by the block cardinality.

    Scale: candidate volume is sum over variant keys of (docs sharing
    that key choose 2) — driven by true near-match density, not corpus
    size; the one shuffle is hash-partitioned on an 8-byte
    xxhash64(block, variant) key (exactness preserved — see the bucket
    comment below). Variant generation is a codegen
    ``transform``/``explode`` (no Python). Verification cost is
    |candidates| levenshteins, each on a short key. Nothing is
    quadratic in the corpus.
    """
    # join-equality semantics for the hard keys: a record with a NULL
    # block attribute can never agree with anything (NULL = x is never
    # true), so it generates NO candidates. concat_ws would instead
    # SKIP the NULL element, colliding (a, NULL) with (NULL, a) and
    # with ("a",) — emitting pairs the equality contract (and the SQL
    # oracle's plain-equality join) forbids. Filter them out, then the
    # sentinel-joined key is collision-free for the survivors.
    src = df
    if block_cols:
        for c in block_cols:
            src = src.filter(F.col(c).isNotNull())
        blk = F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in block_cols]
        )
    else:
        blk = F.lit("")
    base = src.select(
        F.col(id_col).alias("id"), F.col(key_col).alias("key"),
        blk.alias("blk"),
    )
    key = F.col("key")
    variants = F.array_union(
        F.array(key),
        F.transform(
            F.sequence(F.lit(1), F.length(key)),
            lambda i: F.concat(
                key.substr(F.lit(1), i - F.lit(1)),
                key.substr(i + F.lit(1), F.length(key)),
            ),
        ),
    )
    # r12 (guide §2.3 — shuffle keys, not payloads): the bucket key is
    # xxhash64(blk, var) — 8 bytes — instead of the (blk, var) string
    # pair (~25-40 bytes/row at the registered callers, over a
    # rows x (len+1) exploded table). Unlike the ngram-longs trade this
    # is EXACT, not a disclosed collision window: candidates are
    # re-verified on the carried originals (blk equality + levenshtein
    # <= 1 below), so a 64-bit collision can only route extra rows into
    # a bucket whose false pairs the verification drops — and any true
    # pair it surfaces is already in the output via its own shared
    # variant (the deletion-neighborhood completeness argument). The
    # hot-bucket cap is likewise routing-only: a collision-merged
    # bucket may switch route, both routes emit the same pairs.
    v = base.select(
        "id", "key", "blk", F.explode(variants).alias("var")
    ).select("id", "key", "blk", F.xxhash64("blk", "var").alias("h"))
    # bucket-explode instead of a variant-table SELF-join (the
    # minhash_lsh_candidates shape): Spark materializes no CTEs, so the
    # join form evaluated the 15-variants-per-key explode TWICE and
    # shuffled both branches; grouping each (blk, var) bucket once and
    # exploding its member list pays ONE evaluation and ONE shuffle —
    # measured ~2x on the candidate stage (sf1.0 link_golden_record
    # 17.9 -> 13.0 s). Bucket fan-out is the same m^2 the join had.
    #
    # BOUNDED buffers: a collect_list group must fit one aggregation
    # buffer in memory — unlike a join, which spills. Member lists are
    # *usually* bounded by per-variant doc frequency, but nothing
    # enforces that, and one hot (blk, var) bucket (a default key, an
    # empty-string block) at 100 TB is an executor OOM. So route by
    # bucket size, counted with a window over the SAME (blk, var)
    # shuffle the groupBy needs: buckets <= cap take the collect_list
    # path with a provably bounded buffer; hotter buckets take the
    # spillable self-join path (AQE reuses the window's shuffle stage
    # for all branches — identical subplans). Both routes produce the
    # same pair set for their buckets; a bucket lives in exactly one
    # route, and the union's distinct collapses pairs that appear under
    # several variants regardless of route.
    w_bucket = W.partitionBy("h")
    sized = v.withColumn("m", F.count("*").over(w_bucket)).filter(
        F.col("m") >= 2  # singleton buckets can't pair — skip both routes
    )
    small = (
        sized.filter(F.col("m") <= hot_bucket_cap)
        .groupBy("h")
        .agg(F.collect_list(F.struct("id", "key", "blk")).alias("ds"))
        .select(F.explode("ds").alias("x"), "ds")
        .select("x", F.explode("ds").alias("y"))
        .select(F.col("x.id").alias("id1"), F.col("y.id").alias("id2"),
                F.col("x.key").alias("key1"), F.col("y.key").alias("key2"),
                F.col("x.blk").alias("blk1"), F.col("y.blk").alias("blk2"))
    )
    hot = sized.filter(F.col("m") > hot_bucket_cap).select(
        "h", "id", "key", "blk"
    )
    ha, hb = hot.alias("ha"), hot.alias("hb")
    hot_pairs = ha.join(
        hb, F.col("ha.h") == F.col("hb.h")
    ).select(
        F.col("ha.id").alias("id1"), F.col("hb.id").alias("id2"),
        F.col("ha.key").alias("key1"), F.col("hb.key").alias("key2"),
        F.col("ha.blk").alias("blk1"), F.col("hb.blk").alias("blk2"),
    )
    cand = (
        small.unionByName(hot_pairs)
        # blk equality is part of the pair predicate (it rode the exact
        # bucket key before hashing; now it is verified explicitly)
        .filter((F.col("id1") < F.col("id2"))
                & (F.col("blk1") == F.col("blk2")))
        .select("id1", "id2", "key1", "key2")
        # a pair can share several variants (e.g. equal keys share all);
        # collapse BEFORE the levenshtein so each pair is verified once
        .distinct()
    )
    # compute the levenshtein ONCE as a column, filter on it, keep it —
    # the old filter-then-reproject spelling evaluated it twice (CSE
    # does not span the Filter/Project operator boundary)
    return cand.withColumn(
        "lev_dist", F.levenshtein("key1", "key2").cast("int")
    ).filter(F.col("lev_dist") <= 1)
