"""Deduplication operators for 100 TB corpora.

Four tiers, cheapest first (the standard pre-training pipeline):
1. exact        — md5 hash groupBy (one shuffle on a 16-byte key)
2. simhash      — 16-bit signature, near-dup candidates by hamming distance
3. minhash LSH  — shingle -> minhash signature -> banded bucket join
4. exact verify — n-gram Jaccard on candidate pairs only

Scale notes are on each function; the common theme is: never materialize the
O(n^2) pair space — only bucket-collision candidates ever reach a join, and
hot buckets (stop-gram buckets) are capped explicitly rather than silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from n2khab_mhq_data_spark.llmdata.text import tokens, word_shingles
from n2khab_mhq_data_spark.operators.ckpt import release

HASH_PRIME = 1_000_003


def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: md5-hash groupBy, canonical = lowest id. One shuffle on
    the digest (uniform 128-bit key — no skew by construction).

    NULL text is EXCLUDED up front: md5(NULL) is NULL and groupBy treats
    NULLs as equal, so a corpus with N missing-text docs would report
    them as one N-copy duplicate cluster under a NULL hash — and a
    downstream canonicalization would drop N-1 documents that were
    never byte-identical, only absent. Missing text is a quality
    problem, not duplication."""
    return (
        df.filter(F.col(text_col).isNotNull())
        .select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").cast("long").alias("n_copies"),
        )
    )


def shingle_table(df: DataFrame, text_col: str, id_col: str, k: int = 3) -> DataFrame:
    """(id, gram) long table of distinct k-word shingles."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(word_shingles(F.col(text_col), k)).alias("gram"),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.8,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via a gram self-join.

    At scale the self-join explodes on stop-grams (a gram shared by m docs
    contributes m^2/2 pairs) — ``max_doc_freq`` drops grams above a document
    frequency cap, the standard trick; dropping a near-universal gram cannot
    create false positives above a high threshold. Left None here because
    the oracle must see the uncapped semantics.
    """
    sh = shingle_table(df, text_col, id_col, k)
    # grams ride as xxhash64 longs from the explode on (the
    # dedup_prefix_filter r10 pattern: the gram-string shuffle had
    # filled the disk at the 5M-doc tier): every downstream exchange —
    # the doc-keyed size window, the frequency aggregate, the pair
    # self-join — moves 8-byte keys instead of k-word strings, and the
    # join hashes longs. Shingles are distinct per doc, so counts are
    # unchanged short of a 64-bit collision.
    sh = sh.select("doc", F.xxhash64("gram").alias("gram"))
    # Carry each doc's shingle count THROUGH the pair join as a window
    # column instead of a separate sizes table: removes one full shingle
    # computation and two post-aggregation joins (measured 4.9s -> 2.1s at
    # sf0.1). The window shuffles on doc — the same partitioning a sizes
    # groupBy would have needed anyway.
    sh = sh.withColumn("n", F.count("*").over(W.partitionBy("doc")))
    if max_doc_freq is not None:
        # cap AFTER attaching sizes: denominators stay exact; the cap only
        # prunes which grams can generate candidate pairs
        freq = sh.groupBy("gram").agg(F.count("*").alias("df_"))
        sh = (
            sh.join(freq.filter(F.col("df_") <= max_doc_freq), "gram", "left_semi")
        )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.gram") == F.col("b.gram")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("d1"), F.col("b.doc").alias("d2"))
        .agg(
            F.count("*").alias("inter"),
            F.first("a.n").alias("n1"),
            F.first("b.n").alias("n2"),
        )
    )
    jac = F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter"))
    return (
        inter.filter(jac > threshold)
        .select(
            "d1", "d2", F.round(jac + F.lit(1e-9), 6).alias("jaccard")
        )
    )


def prefix_filter_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """EXACT Jaccard-threshold self-join via AllPairs/PPJoin prefix
    filtering (Bayardo et al., WWW'07; Xiao et al., WWW'08) — the lossless
    scale path for set-similarity, complementing the lossy df-cap
    (``ngram_jaccard_pairs(max_doc_freq=...)``) and probabilistic LSH
    (``minhash_dedup_pairs``) routes.

    Order each document's shingle set by ascending global document
    frequency (rarest first, gram string as tie-break — a total order).
    Any pair with Jaccard >= t must share a gram inside BOTH documents'
    first ``n - ceil(t*n) + 1`` grams under that order, so candidate
    generation joins only the prefixes: stop-grams sit at the END of
    every ordering and never generate candidates, killing the m^2/2
    stop-gram fan-out WITHOUT changing the answer. A length filter
    (min(n1,n2) >= t*max(n1,n2), from J <= |A|/|B|) prunes candidates
    before verification; verification is two doc-keyed joins against the
    per-doc sorted gram arrays and a codegen ``array_intersect`` — never
    a second gram-grain shuffle.

    Scale: freq table is vocabulary-grain (SMJ on gram); the per-doc
    window shuffles on doc — bounded rows per doc; the prefix self-join's
    fan-out per gram is its PREFIX document frequency, which the rarest-
    first order drives toward 1. Output is provably identical to the
    uncapped quadratic join, which is exactly what the registered oracle
    computes."""
    sh = shingle_table(df, text_col, id_col, k)
    # grams ride as xxhash64 LONGS from here on (the r9 minhash trick,
    # applied r10 after the x100-tier run spilled the gram-string
    # shuffle past the disk): Jaccard needs only set membership, which
    # is collision-exact at ~1e-15 per candidate pair (|A|x|B|/2^64),
    # and 8 fixed bytes vs a ~25-35 byte 3-word shingle shrinks the
    # df_ window shuffle, both prefix join legs, and the verification
    # arrays ~4x. Seed -2 keeps this hash family disjoint from the
    # minhash signature seeds (0..n-1) and its verification seed (-1).
    # The rarest-first order's tie-break moves from gram string to gram
    # hash — still a total order, so the prefix theorem holds.
    sh = sh.select("doc", F.expr("xxhash64(gram, -2)").alias("gram"))
    # document frequency as a gram-partitioned window instead of a
    # groupBy+join: one shuffle on gram, no second scan of the shingle
    # table. The doc-grain window right after re-shuffles on doc and both
    # doc windows (count + row_number) share that single exchange.
    sh = sh.withColumn("df_", F.count("*").over(W.partitionBy("gram")))
    w_doc = W.partitionBy("doc")
    ranked = sh.withColumn("n", F.count("*").over(w_doc)).withColumn(
        "r", F.row_number().over(w_doc.orderBy("df_", "gram"))
    )
    pref = ranked.filter(
        F.col("r") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    ).select("doc", "gram", "n")
    # candidate stage: prefix SELF-JOIN, not bucket-explode. Measured
    # (sf1.0, warm median-of-3): self-join 3.9 s vs bucket-explode
    # 8-10 s. Rarest-first ordering keeps per-gram fan-out near 1, so
    # most buckets have size 1 and the collect_list aggregation buffer
    # + double-explode shape only adds cost — plus an unbounded
    # per-bucket array, an OOM hazard one hot gram would trigger at
    # 100 TB, where the join shape shuffles and SPILLS instead. The
    # plan does re-evaluate the shingle+window pipeline per branch
    # (4 scans total with verification); persisting `ranked` was ALSO
    # measured and loses (4.3 s) — materializing the wide shingle
    # table costs more than the re-evaluations it saves.
    #
    # SHUFFLE_MERGE hints on every unbounded side (r10, caught by the
    # 1000x-tier demo): the window/agg-derived pref and sets tables
    # carry no stats, the static planner under-estimates them below
    # autoBroadcastJoinThreshold, and at 10x sf1.0 (500k docs) the
    # resulting driver-side HashedRelation build OOMs outright
    # ("Not enough memory to build and broadcast the table"). These
    # tables are DOC-GRAIN — unbounded at 100 TB by definition — so
    # broadcasting them is wrong at any threshold; sort-merge shuffles
    # and spills (the j4_full_outer argument). Same-JVM A/B cost at
    # the bench tiers is recorded in SCALE.md round-10.
    a, b = pref.hint("shuffle_merge").alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("d1"),
            F.col("b.doc").alias("d2"),
            F.col("a.n").alias("n1"),
            F.col("b.n").alias("n2"),
        )
        .filter(
            F.least("n1", "n2") >= F.lit(threshold) * F.greatest("n1", "n2")
        )
        .select("d1", "d2")
        .distinct()
    )
    # verification sets grouped from the already-doc-partitioned window
    # output: the groupBy collapses to a partial agg on the same exchange
    # collect_list, not collect_set: shingle_table grams are already
    # distinct per doc, and array_intersect is order-insensitive
    sets = ranked.groupBy("doc").agg(
        F.collect_list("gram").alias("grams"),
        F.count("*").cast("long").alias("n"),
    )
    ver = cand.join(
        sets.hint("shuffle_merge").select(
            F.col("doc").alias("d1"),
            F.col("grams").alias("g1"),
            F.col("n").alias("n1"),
        ),
        "d1",
    ).join(
        sets.hint("shuffle_merge").select(
            F.col("doc").alias("d2"),
            F.col("grams").alias("g2"),
            F.col("n").alias("n2"),
        ),
        "d2",
    )
    inter = F.size(F.array_intersect("g1", "g2")).cast("long")
    jac = inter / (F.col("n1") + F.col("n2") - inter)
    return (
        ver.filter(jac > threshold)
        .select("d1", "d2", F.round(jac + F.lit(1e-9), 6).alias("jaccard"))
    )


def lsh_band_buckets(
    sig: DataFrame, num_hashes: int = 64, bands: int = 32
) -> DataFrame:
    """(doc, band, bh) banded-bucket rows — the shared projection of
    ``minhash_lsh_candidates`` and the streaming gate's asymmetric
    store probe (which joins BATCH buckets against STORE buckets
    instead of re-aggregating the whole store's buckets per trigger)."""
    r = num_hashes // bands
    structs = ", ".join(
        "named_struct('band', {b}, 'bh', xxhash64({cols}))".format(
            b=b, cols=", ".join(f"h{b * r + i}" for i in range(r))
        )
        for b in range(bands)
    )
    return sig.select(
        "doc", F.explode(F.expr(f"array({structs})")).alias("bb")
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))


def minhash_lsh_candidates(
    sig: DataFrame,
    num_hashes: int = 64,
    bands: int = 32,
    hot_bucket_cap: int = 4096,
) -> DataFrame:
    """Banded LSH: hash each band of the signature, join docs landing in the
    same (band, band_hash) bucket. rows-per-band r = num_hashes/bands; with
    r=2, b=32 a pair at Jaccard 0.8 is missed with prob (1-0.64)^32 ~ 6e-15.
    Candidates MUST be verified (exact Jaccard) downstream."""
    buckets = lsh_band_buckets(sig, num_hashes, bands)
    # Pairs by exploding each bucket's doc list instead of a bucket
    # self-join: the signature pipeline feeding ``sig`` is then evaluated
    # once, not twice (Spark materializes no CTEs — every extra plan
    # branch re-runs the aggregation above the reused shuffle). A stop
    # band-bucket's m^2 pair blowup exists under either shape, but the
    # collect_list additionally requires one bucket's doc LIST to fit an
    # aggregation buffer — a join spills, an agg buffer OOMs. So route
    # by bucket size, counted with a window over the SAME (band, bh)
    # shuffle the groupBy needs: buckets <= cap keep the single-
    # evaluation explode path with a provably bounded buffer; hotter
    # buckets (a stop band-hash — e.g. the all-identical signature of
    # boilerplate docs) fall back to the spillable self-join. A bucket
    # lives in exactly one route; the union's distinct dedups pairs
    # that collide in several bands regardless of route.
    #
    # r10 adjudication of the r9 VERDICT's '+24% routing overhead'
    # item: a same-JVM strictly-alternating A/B (tools/ab_same_jvm.py,
    # 7 rounds sf0.1 + 5 rounds sf1.0) measured THIS shape at ~1.05x
    # of the no-routing floor (sf0.1 2.29 vs 2.13, sf1.0 3.38 vs 3.27
    # — within the <=1.1x done-bar), while the verdict's suggested
    # post-aggregation F.size(ds) routing measured +34% at sf1.0
    # (4.39s: each extra plan branch replays the reduce-side
    # collect_list over EVERY bucket, singletons included, which the
    # window pre-prunes) and a single-branch chunked-explode
    # alternative +10-15% (the chunk-pair repartition shuffles the
    # full list volume). The separate-process warm medians behind the
    # +24% figure ordered the same two variants both ways across four
    # sessions — drift, not code. Keep the window shape; no rewrite
    # without a same-JVM A/B.
    w_bucket = W.partitionBy("band", "bh")
    sized = buckets.withColumn("m", F.count("*").over(w_bucket)).filter(
        F.col("m") >= 2
    )
    small = (
        sized.filter(F.col("m") <= hot_bucket_cap)
        .groupBy("band", "bh")
        .agg(F.collect_list("doc").alias("ds"))
        .select(F.explode("ds").alias("d1"), "ds")
        .select("d1", F.explode("ds").alias("d2"))
    )
    hot = sized.filter(F.col("m") > hot_bucket_cap).select(
        "band", "bh", "doc"
    )
    # SHUFFLE_MERGE: the hot rows are the >cap buckets — unbounded by
    # construction (a stop bucket is hot precisely when it is huge), and
    # the no-stats window subtree invites the planner to BROADCAST them,
    # which OOMs the driver at the exact moment the hot route is needed
    # (the prefix_filter 10x-tier incident class, r10 plan audit
    # BCAST_DERIVED)
    hot_pairs = (
        hot.hint("shuffle_merge")
        .alias("ha")
        .join(
            hot.alias("hb"),
            (F.col("ha.band") == F.col("hb.band"))
            & (F.col("ha.bh") == F.col("hb.bh")),
        )
        .select(F.col("ha.doc").alias("d1"), F.col("hb.doc").alias("d2"))
    )
    return (
        small.unionByName(hot_pairs)
        .filter(F.col("d1") < F.col("d2"))
        .distinct()
    )


def minhash_combined(sh: DataFrame, num_hashes: int = 64) -> DataFrame:
    """ONE aggregation producing both the minhash signature (``num_hashes``
    seeded min-aggs) and the verification gram set per doc — the shared
    shuffled/aggregated child for every signature + verification consumer
    (3.6s -> 2.8s at sf0.1 vs re-shingling per consumer). This is the
    SINGLE definition of the signature scheme: the streaming near-dup
    store persists these rows, so batch and streaming paths stay
    byte-compatible by construction.

    The verification set stores xxhash64(gram, -1) LONGS, not the gram
    strings: Jaccard needs only set intersection/size, which is
    collision-exact at ~2e-15 per candidate pair (|A|x|B|/2^64), and a
    3-word shingle averages ~25-35 bytes vs 8 fixed — the partial
    collect_set shuffle and both verification joins shrink ~4x
    (measured sf1.0: dedup_minhash_lsh 4.27 -> see SCALE.md). Seed -1
    keeps the verification hash disjoint from the signature's seed
    family 0..num_hashes-1."""
    sig_aggs = [
        F.expr(f"min(xxhash64(gram, {j})) AS h{j}") for j in range(num_hashes)
    ]
    return sh.groupBy("doc").agg(
        F.collect_set(F.expr("xxhash64(gram, -1)")).alias("grams"),
        *sig_aggs,
    )


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Full MinHash+LSH near-dup pipeline: shingle -> signature -> banded
    buckets -> candidate pairs -> exact-Jaccard verification. Output equals
    exact ngram_jaccard_pairs (up to the ~1e-14 LSH miss probability) at a
    fraction of the join volume."""
    combined = minhash_combined(
        shingle_table(df, text_col, id_col, k), num_hashes
    )
    cand = minhash_lsh_candidates(combined, num_hashes, bands)

    # SHUFFLE_MERGE: the verification sets are DOC-GRAIN (unbounded at
    # 100 TB; ~100 hashed grams per doc) behind a no-stats aggregation —
    # the planner's size underestimate broadcasts them otherwise
    # (r10 plan audit BCAST_DERIVED; prefix_filter's identical shape
    # OOM'd live at the 10x tier)
    g1 = combined.hint("shuffle_merge").select(
        F.col("doc").alias("d1"), F.col("grams").alias("g1")
    )
    g2 = combined.hint("shuffle_merge").select(
        F.col("doc").alias("d2"), F.col("grams").alias("g2")
    )
    inter = F.size(F.array_intersect("g1", "g2"))
    union = F.size("g1") + F.size("g2") - inter
    jac = inter.cast("double") / union
    return (
        cand.join(g1, "d1")
        .join(g2, "d2")
        .filter(jac > threshold)
        .select("d1", "d2", F.round(jac + F.lit(1e-9), 6).alias("jaccard"))
    )


def simhash_pairs(
    sig: DataFrame,
    bits: int = 16,
    bands: int = 2,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs from SimHash signatures.

    Band the ``bits``-bit signature into ``bands`` equal slices; docs whose
    signatures agree on ANY band become candidates (pigeonhole: a pair at
    hamming < bands always collides on some band — with 2 bands, hamming-1
    pairs are guaranteed, hamming 2..max may be missed, the standard
    recall/cost dial); candidates are then verified with the exact hamming
    distance.

    Shape: pair DISTINCT SIGNATURES, not docs — the signature space is
    bounded by 2^bits regardless of corpus size, so the band self-join and
    the dedup of band collisions run on at most 2^bits rows while the
    doc-level expansion (two explodes over the per-signature doc lists) is
    exactly the output contract and nothing more. At sf0.1 this replaced a
    3.1M-pair join + 2.7M-row distinct with a 940-signature join (3.2s ->
    sub-second). At 100 TB a signature holding m docs still expands to its
    m^2/2 same-signature pairs — that blowup IS the requested output;
    pipelines that only need canonical assignment should aggregate
    min(doc) per signature instead of enumerating pairs."""
    r = bits // bands
    mask = (1 << r) - 1
    sigs = sig.groupBy("simhash").agg(F.collect_list("doc").alias("docs"))
    band_rows = [
        F.struct(
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * r).bitwiseAND(mask).alias("bh"),
        )
        for b in range(bands)
    ]
    sb = sigs.select(
        "simhash", F.explode(F.array(*band_rows)).alias("bb")
    ).select("simhash", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))
    x, y = sb.alias("x"), sb.alias("y")
    hamming = F.bit_count(
        F.col("x.simhash").bitwiseXOR(F.col("y.simhash"))
    ).cast("int")
    sp = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.simhash") <= F.col("y.simhash")),
        )
        .select(
            F.col("x.simhash").alias("s1"),
            F.col("y.simhash").alias("s2"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    # expand qualifying signature pairs to doc pairs: docs carry exactly
    # one signature, so distinct signatures hold disjoint doc sets and
    # least/greatest emits every unordered doc pair exactly once
    d1s = sigs.select(F.col("simhash").alias("s1"), F.col("docs").alias("docs1"))
    d2s = sigs.select(F.col("simhash").alias("s2"), F.col("docs").alias("docs2"))
    # broadcast the signature-PAIR table (bounded by band collisions over
    # <= 2^bits signatures), never the doc lists — those sum to the whole
    # corpus id column at scale
    return (
        F.broadcast(sp)
        .join(d1s, "s1")
        .select("s2", "hamming", F.explode("docs1").alias("da"))
        .join(d2s, "s2")
        .select("hamming", "da", F.explode("docs2").alias("db"))
        .filter(F.col("da") != F.col("db"))
        .filter((F.col("da") < F.col("db")) | (F.col("hamming") > 0))
        .select(
            F.least("da", "db").alias("d1"),
            F.greatest("da", "db").alias("d2"),
            "hamming",
        )
    )


#: production simhash modulus: largest prime below 2^56, so the oracle's
#: BIGINT ``acc*31 + code`` never overflows (31p + max_codepoint < 2^63)
#: while signatures carry 56 usable bits
WIDE_PRIME = 72057594037927931
#: post-mix multiplier ((2^64 golden-ratio constant) mod WIDE_PRIME): one
#: modular multiplication diffuses the polynomial hash across all 56
#: bits — base-31 polynomials of SHORT tokens (31^len << 2^56) would
#: otherwise leave the high signature bits constant-zero, gutting the
#: high band's selectivity. Exact in Python ints; exact in DuckDB via
#: HUGEINT (the product overflows int64 by design).
WIDE_MIX = 15614961330585387


def _char_hash(tok: str, mod: int = HASH_PRIME, mix: int | None = None) -> int:
    """Portable polynomial char hash (h = (h*31 + code) mod p, seed 7),
    optionally post-mixed by a modular multiplication: identical
    arithmetic is expressible in any SQL engine, unlike xxhash64 — used
    by simhash so the DuckDB oracle can reproduce signatures
    bit-for-bit. Plain Python: evaluated once per DISTINCT token inside
    the kernel below, never per row."""
    h = 7
    for ch in tok:
        h = (h * 31 + ord(ch)) % mod
    if mix is not None:
        h = (h * mix) % mod
    return h


def simhash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    bits: int = 16,
    mod: int = HASH_PRIME,
    mix: int | None = None,
) -> DataFrame:
    """SimHash signature: per distinct token, a portable polynomial hash;
    per bit, sum(+/-1); signature bit = (sum > 0). Integer-only arithmetic
    -> no float drift, fully oracle-checkable.

    Shape: a vectorized ``mapInPandas`` kernel — no shuffle (the previous
    explode + 16-bit-sum groupBy shuffled one row per token and evaluated
    an interpreted HOF char hash per token occurrence). Token hashes are
    memoized per Arrow batch and expanded to +/-1 bit rows once per
    DISTINCT token; each doc's bit sums are one small matmul over its
    distinct-token index vector. Natural-language vocabularies follow
    Zipf's law, so the memo table stays tiny relative to the corpus."""
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("doc", df.schema[id_col].dataType, True),
            StructField("simhash", LongType(), True),
        ]
    )
    src = df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("t"))

    def _sig(batches):
        import re

        import numpy as np
        import pandas as pd

        ws = re.compile(r"\s+")
        for pdf in batches:
            vocab: dict[str, int] = {}
            bit_rows: list[np.ndarray] = []
            doc_tok_idx: list[list[int]] = []
            ids = []
            for doc, text in zip(pdf["doc"].values, pdf["t"].values):
                if text is None:
                    continue
                idxs = []
                # Spark's split(trim(text), '\\s+') yields [""] for an
                # all-whitespace doc; re.split on the stripped string
                # reproduces that
                for tok in set(ws.split(text.strip())):
                    i = vocab.get(tok)
                    if i is None:
                        i = len(vocab)
                        vocab[tok] = i
                        h = _char_hash(tok, mod, mix)
                        bit_rows.append(
                            np.where(
                                (h >> np.arange(bits)) & 1 == 1, 1, -1
                            ).astype(np.int64)
                        )
                    idxs.append(i)
                ids.append(doc)
                doc_tok_idx.append(idxs)
            if not ids:
                continue
            B = np.stack(bit_rows)  # vocab x bits of +/-1
            sigs = []
            weights = np.int64(1) << np.arange(bits)
            for idxs in doc_tok_idx:
                s = B[idxs].sum(axis=0)
                sigs.append(int(((s > 0) * weights).sum()))
            yield pd.DataFrame({"doc": ids, "simhash": sigs})

    return src.mapInPandas(_sig, schema=out_schema)


def _iter_ckpt(df: DataFrame, reliable: bool) -> DataFrame:
    """LAZY checkpoint for iterative-loop state: the caller's very next
    action (the convergence fingerprint collect) is the materializing
    job, so each round costs ONE Spark job instead of an eager-
    checkpoint job plus a fingerprint job. ``reliable=True`` switches to
    durable ``checkpoint()`` (executor-loss-safe for long 100 TB runs;
    requires ``setCheckpointDir``)."""
    return df.checkpoint(False) if reliable else df.localCheckpoint(False)


def _convergence_fingerprint(df: DataFrame, *cols: str) -> tuple:
    """Order-insensitive (count, bit_xor of portable row hash) over
    ``cols`` — equal fingerprints across rounds mean the iterative state
    stopped changing. One tiny aggregate; no join against the previous
    round's state."""
    from n2khab_mhq_data_spark.operators.pinning import row_hash

    (row,) = (
        df.select(row_hash(*cols).alias("h"))
        .agg(F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x"))
        .collect()
    )
    return (row.n, row.x)


def _confirm_unchanged(old: DataFrame, new: DataFrame, cols: list[str]) -> bool:
    """Exact set-equality confirmation for the round that FIRST reports
    fingerprint convergence: a 64-bit (count, bit_xor) fingerprint can in
    principle collide (or xor-cancel between rounds) and terminate an
    iterative algorithm early with silently wrong state.  Both callers
    iterate over duplicate-free states (labels keyed by unique node;
    ``small_star`` output is ``.distinct()``), so with counts already
    equal (part of the fingerprint) a one-directional anti-join proving
    ``new ⊆ old`` proves set equality.  Runs once per algorithm, only on
    the apparent convergence round — one extra bounded join, not a
    per-round diff."""
    return new.join(old, cols, "left_anti").limit(1).count() == 0


def connected_components(
    edges: DataFrame,
    a_col: str = "d1",
    b_col: str = "d2",
    max_iter: int = 20,
    reliable: bool = False,
) -> DataFrame:
    """EXACT connected components over an undirected edge list by
    iterated min-label propagation (hash-to-min) — the fixpoint that
    ``dedup_canonicalize``'s single star-contraction round approximates
    (exact there only for clique-shaped components; exact here for any
    graph: chains, stars, bridges).

    The driver loop controls CONVERGENCE only — each round is fully
    distributed (ONE hash join of the pre-built bidirectional edge list
    against the labels plus one groupBy, both on the node key) and the
    rounds needed track the component diameter (near-dup components are
    near-cliques: 2-3). ``localCheckpoint`` truncates lineage so the
    per-round plan stays constant-size instead of growing with
    iterations; the EDGE LIST is checkpointed once up front — without
    materialization the (often expensive) pair pipeline feeding it would
    re-run every round (measured 7s -> 2s at sf0.1 on the near-dup
    graph). Rounds batch 2 then 4 propagation steps per checkpoint
    (monotone min-label cannot oscillate), and convergence is an EXACT
    in-state probe: the round's last step carries each node's pre-step
    label as ``__old``, and an empty ``comp != __old`` filter proves
    the fixpoint (see the loop comment).

    ``reliable=True`` switches to reliable ``checkpoint()`` against the
    session's configured checkpoint dir (``sparkContext.setCheckpointDir``
    to durable storage first). localCheckpoint blocks live on executors —
    on a long 100 TB run, one lost executor mid-iteration kills the job;
    reliable checkpoints survive executor loss at the cost of a
    write-to-storage per round."""

    def ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if reliable else df.localCheckpoint()

    raw = edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    # both directions once up front: each round then needs a SINGLE
    # edges-to-labels join to propagate labels across every edge both
    # ways, and the node universe is just e's distinct left endpoints
    e = ckpt(
        raw.union(raw.select(F.col("b").alias("a"), F.col("a").alias("b")))
    )
    nodes = e.select(F.col("a").alias("node")).distinct()

    labels = _iter_ckpt(
        nodes.select("node", F.col("node").alias("comp")), reliable
    )
    prev_ckpt = labels
    comp_t = labels.schema["comp"].dataType.simpleString()

    def step(lab: DataFrame) -> DataFrame:
        prop = e.join(lab, e["a"] == lab["node"]).select(
            F.col("b").alias("node"), "comp"
        )
        return (
            lab.unionByName(prop)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )

    # BATCHED propagation steps per materialized round: min-label is
    # monotone (labels only decrease), so unrolling cannot oscillate.
    # Same join/shuffle count to converge, FEWER checkpoint
    # materializations and probe jobs — at 100 TB each skipped
    # checkpoint is a full label-table copy that never gets written
    # (guide §5), and locally each skipped round is one driver sync +
    # one probe job (the sf0.1 suite is stage-barrier bound, r11
    # scaling block). Schedule: the FIRST round runs 2 steps —
    # near-clique components (the common near-dup shape; fixpoint in
    # 1-2 steps, measured for dedup_components at sf0.1) converge there
    # with zero wasted shuffles — and every later round runs 4 (r12:
    # deeper graphs halve their round count; the golden-record linkage
    # graph needs exactly 6 steps = 2 rounds instead of 3). The LAST
    # step of each round carries each node's pre-step label as
    # ``__old`` through its aggregate (the labels branch contributes
    # exactly one non-null per node, the propagation branch nulls —
    # min() keeps the label), so convergence is an EXACT in-state
    # emptiness probe: a final step that changed nothing IS the
    # fixpoint by monotonicity. The step budget (2 * max_iter) is
    # unchanged from the 2-step-round contract.
    converged = False
    total_steps, max_steps = 0, 2 * max_iter
    while total_steps < max_steps:
        n_steps = min(2 if total_steps == 0 else 4, max_steps - total_steps)
        cur = labels
        for _ in range(n_steps - 1):
            cur = step(cur)
        prop2 = e.join(cur, e["a"] == cur["node"]).select(
            F.col("b").alias("node"),
            "comp",
            F.expr(f"CAST(NULL AS {comp_t})").alias("__old"),
        )
        new = _iter_ckpt(
            cur.withColumn("__old", F.col("comp"))
            .unionByName(prop2)
            .groupBy("node")
            .agg(
                F.min("comp").alias("comp"),
                F.min("__old").alias("__old"),
            ),
            reliable,
        )
        total_steps += n_steps
        converged = new.filter(
            F.col("comp") != F.col("__old")
        ).isEmpty()
        # the superseded round's checkpoint blocks are dead the moment
        # `new` is materialized (the emptiness probe above) — free
        # them NOW instead of letting them pile up for GC
        # (operators/ckpt.py). Release the CHECKPOINT handle (the
        # projection below wraps it and release() only acts on a bare
        # LogicalRDD root).
        release(prev_ckpt)
        prev_ckpt = new
        labels = new.select("node", "comp")
        if converged:
            break
    if not converged:
        # exhausting max_iter means labels are STILL PROPAGATING —
        # returning them would silently under-merge components
        # (splitting a near-dup chain across train/test is the exact
        # leakage the consumers guard against). Fail loudly; min-label
        # needs O(component diameter) rounds — raise max_iter or use
        # connected_components_twophase (O(log^2 n)) for deep chains.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter}"
            " rounds (component diameter exceeds max_iter)"
        )
    # the edge list fed only the loop; the returned labels plan is a
    # self-contained checkpoint — free the edge blocks too
    release(e)
    return labels.select(
        F.col("node").alias("doc"), F.col("comp").alias("component_id")
    )


def connected_components_twophase(
    edges: DataFrame,
    a_col: str = "d1",
    b_col: str = "d2",
    max_iter: int = 30,
    reliable: bool = False,
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    contraction (the two-phase MapReduce CC algorithm, Kiveris et al.
    2014) — same exact output as :func:`connected_components`, but
    converging in O(log^2 n) rounds instead of O(component diameter), so
    high-diameter near-dup graphs (chains of pairwise-similar docs) stop
    dominating wall-clock at 100 TB.

    Per round, each phase is ONE groupBy on the star center plus a join
    back to the neighbor list — the same shuffle key both phases, and
    strictly fewer shuffles per round than min-label propagation's two
    edge-label joins once diameter exceeds ~4. Convergence is detected by
    an order-insensitive edge-set fingerprint (count + bit_xor of a
    portable row hash): one tiny aggregate per round instead of a
    join-and-count diff.

    Keep :func:`connected_components` as the oracle sibling — identical
    labels, simpler invariants."""

    def ckpt(df: DataFrame) -> DataFrame:
        return df.checkpoint() if reliable else df.localCheckpoint()

    # materialize the raw pair projection ONCE — both the edge list and
    # the node universe derive from it, and the pair pipeline feeding
    # `edges` is usually the expensive part (building nodes from the raw
    # DataFrame would re-run it a second time)
    raw = ckpt(edges.select(F.col(a_col).alias("a"), F.col(b_col).alias("b")))
    # undirected edge list, self-loops dropped, canonical (min, max) dedup
    e0 = (
        raw.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
        )
        .distinct()
    )
    # node universe from the RAW pairs: a self-loop-only node has no row
    # in e0 but is still its own component (parity with
    # connected_components)
    nodes = (
        raw.select(F.col("a").alias("node"))
        .union(raw.select(F.col("b")))
        .distinct()
    )
    e = ckpt(e0)


    # Each phase computes its per-center minimum with a WINDOW over the
    # center partition instead of a groupBy + self-join: one shuffle per
    # phase (the window's hash partitioning), no join at all. Dedup
    # happens once per round (small_star's trailing distinct) — duplicate
    # intermediate edges can't change a min.
    def large_star(ed: DataFrame) -> DataFrame:
        # directed both ways: for each center u, m = min(N(u) ∪ {u});
        # re-link strictly larger neighbors to m
        nbr = ed.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).union(ed.select(F.col("b"), F.col("a")))
        m = F.min(F.least("v", "u")).over(W.partitionBy("u"))
        return (
            nbr.withColumn("m", m)
            .filter(F.col("v") > F.col("u"))
            .select(
                F.least("v", "m").alias("a"), F.greatest("v", "m").alias("b")
            )
            .filter(F.col("a") != F.col("b"))
        )

    def small_star(ed: DataFrame) -> DataFrame:
        # orient larger -> smaller: center u keeps neighbors v < u;
        # all of them (and u) re-link to the minimum
        nbr = ed.select(F.col("b").alias("u"), F.col("a").alias("v"))
        linked = nbr.withColumn(
            "m", F.min("v").over(W.partitionBy("u"))
        )
        relink = linked.select(
            F.col("v").alias("a"), F.col("m").alias("b")
        ).union(linked.select(F.col("u"), F.col("m")))
        return (
            relink.filter(F.col("a") != F.col("b"))
            .select(
                F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
            )
            .distinct()
        )

    fp = _convergence_fingerprint(e, "a", "b")
    for _ in range(max_iter):
        prev = e
        e = _iter_ckpt(small_star(large_star(e)), reliable)
        nfp = _convergence_fingerprint(e, "a", "b")
        converged = nfp == fp and _confirm_unchanged(prev, e, ["a", "b"])
        # free the superseded round's star-edge blocks immediately (the
        # returned plan references only the FINAL e plus `nodes` -> raw;
        # see operators/ckpt.py for the lifecycle argument)
        release(prev)
        if converged:
            break
        fp = nfp
    else:
        # same posture as connected_components: unconverged star edges
        # mean labels are still moving — never return them silently
        raise RuntimeError(
            f"connected_components_twophase did not converge in"
            f" {max_iter} rounds"
        )
    # converged: stars rooted at component minima; roots label themselves
    return (
        nodes.join(e, nodes["node"] == e["b"], "left")
        .select("node", F.coalesce(e["a"], nodes["node"]).alias("comp"))
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
        .select(
            F.col("node").alias("doc"), F.col("comp").alias("component_id")
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing >=
    ``min_hits`` distinct word ``k``-grams with any benchmark document
    (the standard test-set-overlap removal before training). Returns the
    corpus ids with ``n_contaminated_grams`` and a ``contaminated`` flag —
    callers anti-join or filter on it.

    Scale shape: the benchmark side is small by nature (eval sets), so its
    DISTINCT gram set broadcasts; the corpus streams through one shingle
    projection + broadcast semi-ish join + groupBy on the doc id. The
    corpus is never shuffled by gram — only (doc, hit) pairs aggregate,
    and map-side combine collapses them per partition."""
    corpus_grams = shingle_table(corpus, text_col, id_col, k)
    bench_grams = (
        shingle_table(benchmark, text_col, id_col, k)
        .select("gram")
        .distinct()
    )
    hits = corpus_grams.join(F.broadcast(bench_grams), "gram", "inner")
    per_doc = hits.groupBy("doc").agg(
        F.count("*").alias("n_contaminated_grams")
    )
    ids = corpus.select(F.col(id_col).alias("doc"))
    return ids.join(per_doc, "doc", "left").select(
        F.col("doc").alias(id_col),
        F.coalesce("n_contaminated_grams", F.lit(0)).alias(
            "n_contaminated_grams"
        ),
        (
            F.coalesce("n_contaminated_grams", F.lit(0)) >= min_hits
        ).alias("contaminated"),
    )


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    min_hits: int = 1,
    m_bits: int = 1 << 17,
    n_hashes: int = 3,
) -> DataFrame:
    """Sketch-routed benchmark decontamination — identical output to
    :func:`decontaminate`, different scale shape: instead of
    broadcasting the benchmark's distinct gram STRINGS, collapse them
    into a Bloom filter (``m_bits`` bits, ``n_hashes`` double-hashed
    probes over the portable ``xxhash64``) and prefilter corpus grams
    JVM-side against the bitmap; only the sketch's survivors (true hits
    + ~(1-e^(-jn/m))^j false positives) take the exact broadcast-join
    verification, so the exact join's build side no longer scales with
    the benchmark-suite gram count.

    Spark shape: the filter BUILD is one distributed aggregation —
    gram -> j bit positions (explode) -> per-word ``bit_or`` — whose
    result is at most ``m_bits / 64`` longs (2048 for the default 128
    Kbit filter), collected under the same bounded-driver-state
    contract as the k-means K x dim partials and shipped back as ONE
    array literal. The PROBE is pure whole-stage-codegen bit arithmetic
    (element_at + bitwise AND per hash) — no Python, no shuffle, and
    the corpus is still never shuffled by gram. Exact verification
    removes every false positive, which is what lets the exact-path
    oracle pin this query value-for-value."""
    corpus_grams = shingle_table(corpus, text_col, id_col, k)
    bench_grams = (
        shingle_table(benchmark, text_col, id_col, k)
        .select("gram")
        .distinct()
    )
    n_words = m_bits // 64

    def positions(col: str):
        # reduce each hash mod m BEFORE combining: h1 + j*h2 on raw
        # 64-bit hashes overflows (ANSI arithmetic throws); the reduced
        # form is congruent mod m and stays < (n_hashes + 1) * m
        h1 = F.pmod(F.xxhash64(F.col(col)), F.lit(m_bits))
        h2 = F.pmod(F.xxhash64(F.col(col), F.lit(1)), F.lit(m_bits))
        return [
            F.pmod(h1 + F.lit(j) * h2, F.lit(m_bits)) for j in range(n_hashes)
        ]

    words = (
        bench_grams.select(F.explode(F.array(*positions("gram"))).alias("p"))
        .select(
            (F.col("p") / 64).cast("int").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .collect()
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r.w] = r.bits
    # ONE array Literal node (r11): F.array(*[F.lit(x) ...]) built a
    # CreateArray with n_words (=2048) child literals, and the probe
    # references the bitmap once per hash — the analyzed tree carried
    # n_hashes x n_words literal nodes, dominating the query's
    # analysis/optimization time (measured: ~3.5-4.5 s of driver-side
    # plan build per call at the bench tier, vs ~1.7 s of execution).
    # A list literal is a single Literal(ArrayData) node; same values,
    # same probe expression, same result.
    bm = F.lit(bitmap)

    # r11: the probe is ONE filter over pure expressions. The previous
    # shape added six intermediate columns via a withColumn chain, and
    # each withColumn call re-analyzes the whole (literal-carrying)
    # plan — measured ~1.4 s of plan-build per call at the bench tier.
    # The repeated `p` subexpression per probe (word index + bit) is
    # shared at runtime by whole-stage codegen's subexpression
    # elimination; same probe arithmetic, same rows survive.
    cond = F.lit(True)
    for p in positions("gram"):
        bit = F.call_function(
            "shiftleft", F.lit(1).cast("long"), F.pmod(p, F.lit(64)).cast("int")
        )
        word = F.element_at(bm, (p / 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(bit) != 0)
    cand = corpus_grams.filter(cond)
    hits = cand.join(F.broadcast(bench_grams), "gram", "inner")
    per_doc = hits.groupBy("doc").agg(
        F.count("*").alias("n_contaminated_grams")
    )
    ids = corpus.select(F.col(id_col).alias("doc"))
    return ids.join(per_doc, "doc", "left").select(
        F.col("doc").alias(id_col),
        F.coalesce("n_contaminated_grams", F.lit(0)).alias(
            "n_contaminated_grams"
        ),
        (
            F.coalesce("n_contaminated_grams", F.lit(0)) >= min_hits
        ).alias("contaminated"),
    )


def duplicated_spans(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact duplicated-substring detection (the artifact of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 — simplified from suffix arrays to fixed-length
    token windows): every ``span``-token window occurring in >=
    ``min_docs`` distinct documents, with its positions — the worklist a
    substring-removal pass consumes.

    One projection builds all windows with their 1-based token position
    (slice + concat inside a ``transform``; no join against the
    tokenizer); ONE shuffle on the gram key computes both the distinct-
    doc count (collect_set size — the W6 idiom, since count-distinct
    windows don't exist) and the occurrence count as windows over the
    same partitioning. Spans hash to md5 in the output so the worklist
    rows stay narrow; at 100 TB the gram key space is bounded the same
    way shingle tables are (cap via max doc frequency before pairing if
    a boilerplate span explodes a partition)."""
    ws = tokens(F.col(text_col))
    base = docs.select(F.col(id_col).alias("doc"), ws.alias("ws")).filter(
        F.size("ws") >= span
    )
    grams = base.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("ws") - span + 1),
                lambda i: F.concat_ws(" ", F.slice("ws", i, span)),
            )
        ).alias("pos0", "gram"),
    ).select("doc", (F.col("pos0") + 1).alias("pos"), "gram")
    w = W.partitionBy("gram")
    return (
        grams.withColumn("n_docs", F.size(F.collect_set("doc").over(w)))
        .withColumn("n_occurrences", F.count("*").over(w))
        .filter(F.col("n_docs") >= min_docs)
        .select(
            "doc",
            "pos",
            F.md5("gram").alias("span_hash"),
            "n_docs",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
        )
    )


def duplicated_runs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Maximal duplicated token RUNS per document — consecutive
    duplicated ``span``-windows merged by gap-and-islands, which is what
    a substring-removal pass actually cuts (Lee et al. 2022 removes the
    full repeated region, not one fixed window). A run covering
    positions [start, end] spans ``end - start + span`` tokens.

    One extra shuffle beyond :func:`duplicated_spans` (the per-doc
    window + run groupBy, both on the doc key)."""
    spans = duplicated_spans(docs, text_col, id_col, span, min_docs)
    w = W.partitionBy("doc").orderBy("pos")
    islands = spans.withColumn(
        "island", F.col("pos") - F.row_number().over(w)
    )
    return (
        islands.groupBy("doc", "island")
        .agg(
            F.min("pos").alias("start_pos"),
            F.max("pos").alias("end_pos"),
            F.count("*").cast("long").alias("n_windows"),
        )
        .select(
            "doc",
            "start_pos",
            "end_pos",
            "n_windows",
            (F.col("end_pos") - F.col("start_pos") + span)
            .cast("long")
            .alias("run_tokens"),
        )
    )


def lsh_recall_audit(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    min_jaccard: float = 0.6,
    num_hashes: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Per-Jaccard-bin recall of the banded-LSH candidate generator
    against exact n-gram Jaccard ground truth: ``(bin, n_pairs,
    n_captured, recall)`` for true pairs above ``min_jaccard``.

    This is the threshold-tuning audit run before trusting an LSH
    config on a new corpus: the banding s-curve says a pair at Jaccard
    j survives with prob 1-(1-j^r)^b, so with r=2/b=32 everything
    above 0.6 must be captured (miss prob <= (1-0.36)^32 ~ 6e-7) —
    the audit proves the deployed signature/banding code actually
    delivers that, per bin, on real data.

    Ground truth is the exact gram self-join — quadratic on stop-grams,
    so at 100 TB this audit runs on a hash-sampled slice (the recall
    estimate needs only enough pairs per bin), exactly like
    ann_recall_at_10's brute-force leg.
    """
    # ONE shingle aggregation (minhash_combined) feeds BOTH legs: exact
    # ground truth re-derives the long gram table by exploding the stored
    # gram sets (the shared shuffle is reused; the corpus regex/tokenize
    # pass runs once), candidates come from the same rows' signatures —
    # the minhash_dedup_pairs sharing pattern
    combined = minhash_combined(
        shingle_table(df, text_col, id_col, k), num_hashes
    )
    long = combined.select(
        "doc", F.size("grams").alias("n"), F.explode("grams").alias("gram")
    )
    right = long.select(
        F.col("doc").alias("d2"), F.col("n").alias("n2"),
        F.col("gram"),
    )
    pairs = (
        long.select(
            F.col("doc").alias("d1"), F.col("n").alias("n1"), "gram"
        )
        .join(right, "gram")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2", "n1", "n2")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("inter")
    )
    truth = pairs.filter(jac > min_jaccard).select(
        "d1", "d2", F.round(jac + F.lit(1e-9), 6).alias("jaccard")
    )
    cand = minhash_lsh_candidates(
        combined, num_hashes, bands
    ).withColumn("hit", F.lit(1))
    return (
        truth.withColumn("bin", F.floor(F.col("jaccard") * 10) / 10)
        .join(cand, ["d1", "d2"], "left")
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_captured"),
        )
        .select(
            "bin",
            "n_pairs",
            "n_captured",
            F.round(
                F.col("n_captured").cast("double") / F.col("n_pairs"), 6
            ).alias("recall"),
        )
    )


def remove_duplicated_runs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """The REMOVAL pass the duplicated-run detector feeds (Lee et al.
    2022 cut the repeated regions out of the corpus; detection alone is
    only half the operator): every token position covered by a
    duplicated run is dropped and the document re-joined from its
    surviving tokens. Policy: duplicated regions are removed from EVERY
    occurrence (the conservative decontamination-style variant — a
    keep-one-canonical policy is a caller-side tweak of the run table,
    not a different plan shape).

    Spark shape: runs aggregate to one interval-array row per affected
    doc (orders of magnitude smaller than the corpus), joined back on
    the doc key — AQE broadcasts it; the token surgery itself is pure
    codegen HOFs (``filter`` with a positional lambda + ``exists`` over
    the interval array + ``array_join``): no UDF, no extra shuffle.
    Output keeps before/after token counts and the run count per doc —
    the removal-rate observability a curation run reports."""

    runs = duplicated_runs(docs, text_col, id_col, span, min_docs)
    ivs = runs.groupBy("doc").agg(
        F.collect_list(
            F.struct(
                F.col("start_pos").alias("s"),
                (F.col("end_pos") + span - 1).alias("e"),
            )
        ).alias("ivs"),
        F.count("*").cast("long").alias("n_runs"),
    )
    toks = tokens(F.col(text_col))
    base = docs.select(
        F.col(id_col), toks.alias("ws")
    ).join(ivs, F.col(id_col) == ivs["doc"], "left")
    iv_arr = F.coalesce(
        F.col("ivs"), F.array().cast("array<struct<s:int,e:int>>")
    )
    kept = F.filter(
        F.col("ws"),
        lambda t, i: ~F.exists(
            iv_arr, lambda v: (i + 1 >= v["s"]) & (i + 1 <= v["e"])
        ),
    )
    return base.select(
        id_col,
        F.array_join(kept, " ").alias("text_clean"),
        F.size("ws").cast("long").alias("n_tokens"),
        F.size(kept).cast("long").alias("n_tokens_clean"),
        F.coalesce(F.col("n_runs"), F.lit(0)).alias("n_runs"),
    )
