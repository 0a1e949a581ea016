"""Graph-analytics + record-linkage queries: co-occurrence graph health
metrics (degree distribution, triangles / clustering) and blocked fuzzy
record linkage.

These are the read-side companions to the near-dup graph machinery in
``llmdata/dedup.py`` (which builds pair graphs and components): before a
pipeline canonicalizes on connected components it should know the
candidate graph's degree tail and transitivity, and registry-style
tables need fuzzy (edit-distance) linkage beyond the reference's exact
reconciliation keys (mhq_terr_inboveg_fieldmap.Rmd's K9 cascade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from n2khab_mhq_data_spark.catalog import load
from n2khab_mhq_data_spark.operators.ckpt import release
from n2khab_mhq_data_spark.operators.graph import (
    cooccurrence_edges,
    degree_histogram,
    triangle_stats,
)
from n2khab_mhq_data_spark.operators.linkage import sorted_neighborhood_pairs
from n2khab_mhq_data_spark.plans import query

# shared oracle CTE: the support-pruned co-purchase graph — part pairs
# sharing at least 2 orders (canonical a < b). Support >= 2 is the
# market-basket noise gate AND the scale control: it prunes the random
# 1-support pairs (~97% of edges here) before any graph pass.
_EDGES_SQL = """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS a FROM lineitem
    ), e AS (
      SELECT i1.a AS a, i2.a AS b
      FROM items i1 JOIN items i2 ON i1.g = i2.g AND i1.a < i2.a
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
"""

_DEGREE_SQL = """
    , d AS (
      SELECT node, count(*) AS degree
      FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
      GROUP BY node
    )
"""


# co-purchase edge-list memo — the same lifecycle argument as the
# near-dup pair memo (plans/llm.py::_near_pairs): the support-pruned
# (a, b, support) edge list at min_support=2 is the shared intermediate
# FIVE graph queries consume (degree histogram, triangles, pagerank,
# link prediction, lift), and a real pipeline materializes the edge
# list once, not per consumer. localCheckpoint'ed (the pruned list is
# orders of magnitude smaller than lineitem), keyed by the lineitem
# parquet fingerprint so regenerated data invalidates; entries from
# dead sessions are evicted wholesale. bench.py times the build as a
# declared build step so per-query numbers stay order-independent.
_COPURCHASE_EDGES: dict[tuple, DataFrame] = {}


def _li_fingerprint(sf_dir: str) -> tuple:
    from n2khab_mhq_data_spark.plans import parquet_fingerprint

    return parquet_fingerprint(sf_dir, "lineitem")


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The memoized (a, b, support) co-purchase edge list; consumers
    that need plain edges select ("a", "b") — identical to the unkept
    path."""
    from n2khab_mhq_data_spark.plans import evict_dead_sessions

    evict_dead_sessions(_COPURCHASE_EDGES, spark)
    key = (sf_dir, _li_fingerprint(sf_dir))
    df = _COPURCHASE_EDGES.get(key)
    if df is None:
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        df = cooccurrence_edges(
            li, "l_orderkey", "l_partkey", min_support=2,
            keep_support=True,
        ).localCheckpoint()
        _COPURCHASE_EDGES[key] = df
    return df


@query(
    "graph_copurchase_degree",
    _EDGES_SQL
    + _DEGREE_SQL
    + """
    SELECT degree, CAST(count(*) AS BIGINT) AS n_nodes
    FROM d GROUP BY degree
    """,
)
def graph_copurchase_degree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the support-pruned co-purchase graph
    (parts sharing >= 2 orders). Pair generation is a self-join
    co-partitioned on the order key — fan-out bounded by lines-per-order;
    the support gate keeps the edge set sparse."""
    edges = _copurchase_edges(spark, sf_dir).select("a", "b")
    return degree_histogram(edges)


@query(
    "graph_triangle_stats",
    _EDGES_SQL
    + _DEGREE_SQL
    + """
    , n AS (
      SELECT CAST(count(*) AS BIGINT) AS n_nodes,
             CAST(sum(degree * (degree - 1) // 2) AS BIGINT) AS n_wedges
      FROM d
    ), m AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e),
    t AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles
      FROM e e1
      JOIN e e2 ON e1.b = e2.a
      JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
    )
    SELECT n_nodes, n_edges, n_wedges, n_triangles,
           round(3.0 * n_triangles / nullif(n_wedges, 0) + 1e-9, 6)
             AS global_cc
    FROM n, m, t
    """,
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering statistics of the co-purchase graph. The Spark
    side counts triangles with the degree-ordered orientation (skew-safe
    at scale); the oracle runs the naive canonical a<b<c enumeration —
    the counts are provably identical."""
    edges = _copurchase_edges(spark, sf_dir).select("a", "b")
    # the memo already holds a localCheckpoint'ed edge list
    return triangle_stats(edges, checkpoint=False)


@query(
    "link_sorted_neighborhood",
    """
    WITH c AS (
      SELECT c_custkey AS id, c_name AS key,
             CAST(substr(c_name, 10, 9) AS BIGINT) AS sfx
      FROM customer
    ), b AS (
      SELECT id, key, sfx // 256 AS blk FROM c
      UNION ALL
      SELECT id, key, -((sfx + 128) // 256 + 1) AS blk FROM c
    ), n AS (
      SELECT id, key,
             lead(id, 1) OVER w AS nid1, lead(key, 1) OVER w AS nk1,
             lead(id, 2) OVER w AS nid2, lead(key, 2) OVER w AS nk2
      FROM b WINDOW w AS (PARTITION BY blk ORDER BY key, id)
    ), pairs AS (
      SELECT id, key, nid1 AS nid, nk1 AS nkey FROM n
      WHERE nid1 IS NOT NULL
      UNION ALL
      SELECT id, key, nid2, nk2 FROM n WHERE nid2 IS NOT NULL
    )
    SELECT DISTINCT
      least(id, nid) AS id1, greatest(id, nid) AS id2,
      CASE WHEN id < nid THEN key ELSE nkey END AS key1,
      CASE WHEN id < nid THEN nkey ELSE key END AS key2,
      CAST(levenshtein(key, nkey) AS INTEGER) AS lev_dist
    FROM pairs
    WHERE levenshtein(key, nkey) <= 2
    """,
)
def link_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy customer linkage: multi-pass blocked sorted-neighborhood
    (blocks of 256 on the name's numeric suffix, second pass shifted by
    half a block) + levenshtein <= 2 scoring. Linear pair count, every
    window partitioned by block — no global-sort bottleneck. The
    oracle's union disambiguates pass-2 block ids by NEGATION, disjoint
    from the non-negative pass-1 ids at any scale (its old fixed
    +1000000 offset collided once sfx // 256 reached 1e6, merging
    unrelated windows into degenerate self-pairs)."""
    c = load(spark, sf_dir, "customer")
    sfx = F.substring("c_name", 10, 9).cast("bigint")
    # the operator windows each pass separately, so these ids need not
    # be globally unique — the negation just mirrors the oracle's
    # collision-proof union spelling
    blocks = [
        F.floor(sfx / 256),
        -(F.floor((sfx + 128) / 256) + 1),
    ]
    out = sorted_neighborhood_pairs(
        c, "c_custkey", "c_name", blocks, window=3, max_dist=2
    )
    return out.select(
        "id1", "id2", "key1", "key2",
        F.col("lev_dist").cast("int").alias("lev_dist"),
    )


def _lpa_oracle(iters: int = 3) -> str:
    """Unrolled synchronous label propagation: one CTE pair per round
    (neighbour-label counts -> min-label argmax). Integer-only — zero
    float drift possible."""
    body = _EDGES_SQL + """
    , de AS (
      SELECT a AS src, b AS dst FROM e
      UNION ALL SELECT b, a FROM e
    ), l0 AS (
      SELECT DISTINCT src AS node, src AS label FROM de
    )
    """
    for k in range(iters):
        body += f""", l{k + 1} AS (
      SELECT node, label FROM (
        SELECT de.dst AS node, l.label,
               row_number() OVER (PARTITION BY de.dst
                                  ORDER BY count(*) DESC, l.label) AS rn
        FROM de JOIN l{k} l ON l.node = de.src
        GROUP BY de.dst, l.label
      ) WHERE rn = 1
    )
    """
    return body + f"""
    SELECT node, label AS community FROM l{iters}
    """


@query("graph_lpa_communities", oracle=_lpa_oracle())
def graph_lpa_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection: 3 rounds of synchronous label propagation
    (min-label tie-break) over the support-pruned co-purchase graph —
    density-based communities, the complement of connected components
    (which merge through any bridge edge). One shuffle per round on the
    checkpointed edge list (operators/graph.py::label_propagation);
    integer-only, so the unrolled SQL oracle reproduces it exactly."""
    from n2khab_mhq_data_spark.operators.graph import label_propagation

    edges = _copurchase_edges(spark, sf_dir).select("a", "b")
    return label_propagation(edges, iters=3)


def _pagerank_oracle(iters: int = 3, damping: float = 0.85) -> str:
    """Unrolled power-iteration SQL: r_{k+1}(v) = (1-d)/n +
    d * sum_{u->v} r_k(u)/deg(u). One CTE per iteration."""
    body = _EDGES_SQL + """
    , de AS (
      SELECT a AS src, b AS dst FROM e
      UNION ALL SELECT b, a FROM e
    ), deg AS (
      SELECT src, count(*) AS d FROM de GROUP BY src
    ), nn AS (SELECT count(*) AS n FROM deg),
    r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS r FROM deg)
    """
    for k in range(iters):
        body += f""", r{k + 1} AS (
      SELECT de.dst AS node,
             {1.0 - damping} / (SELECT n FROM nn)
             + {damping} * sum(r{k}.r / deg.d) AS r
      FROM de
      JOIN deg ON deg.src = de.src
      JOIN r{k} ON r{k}.node = de.src
      GROUP BY de.dst
    )
    """
    return body + f"""
    SELECT node, round(r + 1e-12, 6) AS pagerank FROM r{iters}
    """


@query("graph_pagerank", oracle=_pagerank_oracle())
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 fixed power iterations, d=0.85) over the
    support-pruned co-purchase graph — hub scoring for canonical-doc
    selection / item weighting. Spark side iterates ONE shuffle per
    round over a checkpointed edge+degree list (operators/graph.py:
    pagerank); the oracle unrolls the same three iterations as CTEs."""
    from n2khab_mhq_data_spark.operators.graph import pagerank

    edges = _copurchase_edges(spark, sf_dir).select("a", "b")
    return pagerank(edges, iters=3, damping=0.85)


@query(
    "graph_copurchase_lift",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS a FROM lineitem
    ), sup AS (
      SELECT a AS item, count(*) AS s FROM items GROUP BY a
    ), nn AS (SELECT count(DISTINCT g) AS n FROM items),
    pairs AS (
      SELECT i1.a AS a, i2.a AS b, count(*) AS s_ab
      FROM items i1 JOIN items i2 ON i1.g = i2.g AND i1.a < i2.a
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT a, b, CAST(s_ab AS BIGINT) AS support,
           round(s_ab * 1.0 / sa.s + 1e-12, 6) AS confidence,
           round(s_ab * 1.0 * (SELECT n FROM nn) / (sa.s * sb.s) + 1e-12,
                 6) AS lift
    FROM pairs
    JOIN sup sa ON sa.item = a JOIN sup sb ON sb.item = b
    ORDER BY lift DESC, a, b LIMIT 20
    """,
)
def graph_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule strength for the top-20 co-purchase pairs:
    support, confidence P(b|a) and lift P(ab)/(P(a)P(b)). Item supports
    attach via broadcast-able joins on the pruned pair list; the global
    order count is a 1-row broadcast (the text_tfidf_topk global-stat
    pattern); top-20 is a TakeOrderedAndProject with a deterministic
    (lift desc, a, b) tie-break."""
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    items = li.select(
        F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("a")
    ).distinct()
    pairs = _copurchase_edges(spark, sf_dir).withColumnRenamed(
        "support", "s_ab"
    )
    sup = items.groupBy("a").agg(F.count("*").alias("s"))
    nn = items.agg(F.countDistinct("g").alias("n"))
    sa = sup.select(F.col("a"), F.col("s").alias("s_a"))
    sb = sup.select(F.col("a").alias("b"), F.col("s").alias("s_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .crossJoin(F.broadcast(nn))
        .select(
            "a",
            "b",
            F.col("s_ab").cast("bigint").alias("support"),
            F.round(
                F.col("s_ab") / F.col("s_a") + F.lit(1e-12), 6
            ).alias("confidence"),
            F.round(
                F.col("s_ab") * F.col("n") / (F.col("s_a") * F.col("s_b"))
                + F.lit(1e-12),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "a", "b")
        .limit(20)
    )


@query(
    "graph_link_prediction",
    _EDGES_SQL
    + _DEGREE_SQL
    + """
    , de AS (
      SELECT a AS src, b AS dst FROM e
      UNION ALL SELECT b, a FROM e
    ), cn AS (
      SELECT d1.src AS u, d2.src AS v, CAST(count(*) AS BIGINT) AS common
      FROM de d1 JOIN de d2 ON d1.dst = d2.dst AND d1.src < d2.src
      GROUP BY 1, 2
    ), nonadj AS (
      SELECT cn.u, cn.v, cn.common
      FROM cn ANTI JOIN e ON cn.u = e.a AND cn.v = e.b
    )
    SELECT u, v, common,
           round(common * 1.0 / (du.degree + dv.degree - common) + 1e-12,
                 6) AS jaccard_coef
    FROM nonadj
    JOIN d du ON du.node = u JOIN d dv ON dv.node = v
    ORDER BY jaccard_coef DESC, u, v LIMIT 20
    """,
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction on the co-purchase graph: common-neighbour count
    and neighbourhood-Jaccard for NON-adjacent pairs, top-20 — the
    "customers also bought" candidate generator. The wedge join
    (neighbours sharing a hub) is the triangle-count shape: bounded by
    the support-pruned graph's degree; at 100 TB hubs above a degree
    cap would be dropped first (they carry no ranking signal — the
    max_doc_freq idiom). Existing edges leave via an anti join; degrees
    attach as broadcast-able equi-joins; top-20 is a
    TakeOrderedAndProject with a (score desc, u, v) tie-break."""
    # ~7 plan consumers (wedge self-join x4, anti join, two degree
    # attaches) — the memoized checkpoint (one materialization shared
    # across the whole graph family) replaces the per-call checkpoint
    edges = _copurchase_edges(spark, sf_dir).select("a", "b")
    from n2khab_mhq_data_spark.operators.graph import degrees

    de = edges.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionAll(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    cn = (
        de.alias("d1")
        .join(de.alias("d2"), F.col("d1.dst") == F.col("d2.dst"))
        .filter(F.col("d1.src") < F.col("d2.src"))
        .groupBy(
            F.col("d1.src").alias("u"), F.col("d2.src").alias("v")
        )
        .agg(F.count("*").cast("bigint").alias("common"))
    )
    nonadj = cn.join(
        edges,
        (cn["u"] == edges["a"]) & (cn["v"] == edges["b"]),
        "anti",
    )
    deg = degrees(edges)
    du = deg.select(F.col("node").alias("u"), F.col("degree").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("degree").alias("dv"))
    return (
        nonadj.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common",
            F.round(
                F.col("common")
                / (F.col("du") + F.col("dv") - F.col("common"))
                + F.lit(1e-12),
                6,
            ).alias("jaccard_coef"),
        )
        .orderBy(F.col("jaccard_coef").desc(), "u", "v")
        .limit(20)
    )


@query(
    "link_edit_distance_join",
    """
    WITH s AS (
      SELECT * FROM customer
      WHERE CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                 AS BIGINT) % 4 = 0
    )
    SELECT a.c_custkey AS id1, b.c_custkey AS id2,
           a.c_name AS key1, b.c_name AS key2,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS lev_dist
    FROM s a
    JOIN s b
      ON a.c_custkey < b.c_custkey
     AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def link_edit_distance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Levenshtein <= 1 linkage self-join on customer names via the
    deletion-neighborhood (FastSS/SymSpell) — the LOSSLESS scale path
    next to the heuristic ``link_sorted_neighborhood`` (which can miss a
    match that straddles every block window). The oracle is the
    uncapped QUADRATIC all-pairs join, so the completeness of the
    deletion-key candidate generator is hash-checked end-to-end, not
    just argued. Reference analog: the K9 reconciliation cascade's
    exact-key linkage (mhq_terr_inboveg_fieldmap.Rmd) hardened for
    typo'd registry identifiers.

    Since this query's registered purpose is the COMPLETENESS AUDIT of
    the blocked headline (``link_edit_distance_join_blocked``), it runs
    on a deterministic 25% hash-sample slice (portable md5 prefix of
    c_custkey mod 4 — identical rows both engines): TPC-H names differ
    only in digits, so unblocked deletion buckets grow quadratically
    and the full-corpus audit was 8.7 s of a 181 s bench board / 87 s
    of the sf1.0 probe (r6 VERDICT item 5). The slice keeps the
    generator-vs-quadratic-oracle guarantee intact on every code path
    (bucket grouping, pair verify, dedup) while shrinking pair
    cardinality ~16x; the blocked sibling remains the full-corpus
    scale path."""
    from n2khab_mhq_data_spark.operators.linkage import (
        edit_distance_join_deletion,
    )

    cust = load(spark, sf_dir, "customer").filter(
        F.expr(
            "conv(substring(md5(cast(c_custkey as string)), 1, 8), 16, 10)"
            " % 4 = 0"
        )
    )
    return edit_distance_join_deletion(cust, "c_custkey", "c_name")


@query(
    "link_edit_distance_join_blocked",
    """
    SELECT a.c_custkey AS id1, b.c_custkey AS id2,
           a.c_name AS key1, b.c_name AS key2,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS lev_dist
    FROM customer a
    JOIN customer b
      ON a.c_custkey < b.c_custkey
     AND a.c_nationkey = b.c_nationkey
     AND a.c_mktsegment = b.c_mktsegment
     AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def link_edit_distance_join_blocked(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The HEADLINE ER linkage: deletion-neighborhood Levenshtein <= 1
    with composite blocking on (c_nationkey, c_mktsegment) — candidates
    must agree on the hard keys before the soft key is fuzzy-matched,
    which is both standard ER practice (the reference's K9
    reconciliation cascade blocks on exact keys before its fuzzy stage,
    check_observed_habitat_type.Rmd:130-310) and the scale fix for
    adversarially dense deletion buckets: TPC-H customer names differ
    only in digits, so UNBLOCKED buckets are huge (82 s at sf1.0, r5
    bench) while blocking divides per-variant fan-out by the ~125
    nation x segment block count. The unblocked sibling
    ``link_edit_distance_join`` stays registered as the completeness
    audit. Oracle: the quadratic all-pairs join restricted to equal
    blocks, so the blocked candidate generator is hash-checked
    lossless WITHIN blocks end-to-end."""
    from n2khab_mhq_data_spark.operators.linkage import (
        edit_distance_join_deletion,
    )

    return edit_distance_join_deletion(
        load(spark, sf_dir, "customer"),
        "c_custkey",
        "c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
    )


@query(
    "link_golden_record",
    """
    WITH RECURSIVE p AS (
      SELECT a.c_custkey AS id1, b.c_custkey AS id2
      FROM customer a JOIN customer b
        ON a.c_custkey < b.c_custkey
       AND a.c_nationkey = b.c_nationkey
       AND a.c_mktsegment = b.c_mktsegment
       AND levenshtein(a.c_name, b.c_name) <= 1
    ), e AS (
      SELECT id1 AS a, id2 AS b FROM p UNION SELECT id2, id1 FROM p
    ), reach AS (
      SELECT a AS node, a AS r FROM e
      UNION
      SELECT rc.node, e.b FROM reach rc JOIN e ON rc.r = e.a
    ), comp AS (
      SELECT node, min(r) AS comp FROM reach GROUP BY 1
    ), m AS (
      SELECT c.comp, cu.c_custkey, cu.c_name, cu.c_acctbal
      FROM comp c JOIN customer cu ON cu.c_custkey = c.node
    ), best AS (
      SELECT comp, c_name,
             row_number() OVER (PARTITION BY comp
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM m
    )
    SELECT CAST(m.comp AS BIGINT) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_members,
           round(max(m.c_acctbal), 2) AS max_acctbal,
           b.c_name AS rep_name
    FROM m JOIN best b ON b.comp = m.comp AND b.rn = 1
    GROUP BY m.comp, b.c_name
    """,
)
def link_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution: block-constrained exact fuzzy
    linkage (deletion-neighborhood Levenshtein <= 1 within equal
    nation x segment — the hard keys must agree before the soft key is
    fuzzy-matched) -> exact connected components -> SURVIVORSHIP merge
    per duplicate group (canonical id = min member, representative name
    from the max-acctbal member, attributes merged by max). This is the
    golden-record construction the reference's K9 cascade performs with
    exact keys, completed for typo'd registries. Every stage is the
    registered scale path: blocked variant join, one-shuffle-per-round
    CC, windowed arg-max; the oracle replays linkage (quadratic),
    closure (recursive CTE), and survivorship in SQL."""
    from n2khab_mhq_data_spark.llmdata.dedup import connected_components
    from n2khab_mhq_data_spark.operators.linkage import (
        edit_distance_join_deletion,
    )
    from pyspark.sql.window import Window as W

    cust = load(spark, sf_dir, "customer")
    pairs = edit_distance_join_deletion(
        cust, "c_custkey", "c_name",
        block_cols=["c_nationkey", "c_mktsegment"],
    )
    comps = connected_components(pairs, "id1", "id2")
    m = comps.join(
        cust, comps["doc"] == cust["c_custkey"]
    ).select(
        F.col("component_id").alias("comp"),
        "c_custkey",
        "c_name",
        "c_acctbal",
    )
    # survivorship in ONE aggregation: max_by over (acctbal, -custkey)
    # is exactly the old rn=1 window pick (max acctbal, min custkey on
    # ties — custkey is unique, so the argmax is deterministic). The
    # window + second pass over m + comp-join shape paid three
    # comp-keyed exchanges for what one partial-aggregating exchange
    # computes (guide §2.4; the k2 min_by precedent).
    agg = m.groupBy("comp").agg(
        F.count("*").cast("long").alias("n_members"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        F.expr(
            "max_by(c_name, struct(c_acctbal, -c_custkey))"
        ).alias("rep_name"),
    )
    return agg.select(
        F.col("comp").cast("long").alias("canonical_id"),
        "n_members",
        "max_acctbal",
        "rep_name",
    )


def _kcore_oracle(k: int = 3, rounds: int = 12) -> str:
    """Unrolled k-core peeling: s_{i+1} = nodes of s_i with >= k
    neighbours inside s_i. Integer-only — zero drift possible."""
    # every s_i is referenced twice by s_{i+1}; DuckDB inlines CTEs by
    # default, so un-materialized rounds would inline 2^rounds scans
    body = _EDGES_SQL + """
    , de AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM e
      UNION ALL SELECT b, a FROM e
    ), s0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM de)
    """
    for i in range(rounds):
        body += f""", s{i + 1} AS MATERIALIZED (
      SELECT node FROM (
        SELECT de.src AS node, count(*) AS c
        FROM de
        JOIN s{i} x ON x.node = de.src
        JOIN s{i} y ON y.node = de.dst
        GROUP BY de.src
      ) WHERE c >= {k}
    )
    """
    return body + f"""
    , fd AS (
      SELECT de.src AS node, CAST(count(*) AS BIGINT) AS c
      FROM de
      JOIN s{rounds} x ON x.node = de.src
      JOIN s{rounds} y ON y.node = de.dst
      GROUP BY de.src
    )
    SELECT s.node, coalesce(fd.c, 0) AS core_degree,
           coalesce(fd.c, 0) >= {k} AS settled
    FROM s{rounds} s LEFT JOIN fd ON fd.node = s.node
    """


@query("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core of the co-purchase graph via <= 12 peel rounds with an
    exact early exit — the density filter a curation pipeline runs
    before trusting co-occurrence structure (nodes outside the k-core
    are noise-grade). Each round drops nodes with < k surviving
    neighbours; the ``settled`` column proves convergence IN-BAND: a
    row with core_degree < k means the peel had not reached fixpoint,
    so correctness is never silently data-dependent. The survivor set
    shrinks monotonically, so an unchanged (or zero) survivor count at
    the every-2-rounds checkpoint probe proves the fixpoint and skips
    the dead tail of the 12-round budget (r12; measured: the 3-core
    empties at round 2 at sf0.1, round ~10 at sf0.01). Scale: one
    degree-count shuffle per round over the (already support-pruned)
    edge list; the survivor set is localCheckpoint'ed at each probe so
    the plan stays shallow — the same bounded-rounds contract as the
    two-phase connected components (O(log n) rounds, never a
    driver-side edge materialization)."""
    kk, rounds = 3, 12
    last_ckpt = None  # superseded survivor checkpoint, freed on rotate
    edges = _copurchase_edges(spark, sf_dir).select("a", "b")
    de = edges.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(
        edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    ).localCheckpoint()
    s = de.select(F.col("src").alias("node")).distinct()
    # r12 early exit: survivor sets only ever SHRINK (s_{i+1} requires
    # membership in s_i), so an unchanged survivor COUNT between probes
    # proves set equality — the fixpoint — and every remaining round is
    # a no-op; an EMPTY set is trivially settled. Probe every 2 rounds:
    # the lazy checkpoint's materializing count doubles as the probe
    # (one job), and each dead round it skips was 2 full-edge-list
    # semi-join shuffles + a degree aggregation. Measured at sf0.1 the
    # 3-core EMPTIES at round 2 — the fixed 12-round peel paid 10 dead
    # rounds (guide §1.2: don't compute things you throw away). The
    # 12-round bound and the in-band ``settled`` proof are unchanged.
    prev_n: int | None = None
    i = 0
    while i < rounds:
        for _ in range(min(2, rounds - i)):
            # shuffle-hash semi-joins (the pagerank hint): the survivor
            # set only ever shrinks, and hashing it avoids re-sorting
            # the edge list twice per peel round under SortMergeJoin
            alive = de.join(
                s.withColumnRenamed("node", "src").hint("shuffle_hash"),
                "src", "leftsemi",
            ).join(
                s.withColumnRenamed("node", "dst").hint("shuffle_hash"),
                "dst", "leftsemi",
            )
            s = (
                alive.groupBy("src")
                .agg(F.count("*").alias("c"))
                .filter(F.col("c") >= kk)
                .select(F.col("src").alias("node"))
            )
            i += 1
        s = s.localCheckpoint(False)
        n = s.count()  # materializes the checkpoint AND probes the size
        # the previous survivor checkpoint fed only the rounds up to
        # this (just-materialized) one — free its blocks now
        release(last_ckpt)
        last_ckpt = s
        if n == 0 or n == prev_n:
            break
        prev_n = n
    fd = (
        de.join(
            s.withColumnRenamed("node", "src").hint("shuffle_hash"),
            "src", "leftsemi",
        )
        .join(
            s.withColumnRenamed("node", "dst").hint("shuffle_hash"),
            "dst", "leftsemi",
        )
        .groupBy("src")
        .agg(F.count("*").cast("long").alias("c"))
        .withColumnRenamed("src", "node")
    )
    return s.join(fd.hint("shuffle_hash"), "node", "left").select(
        "node",
        F.coalesce(F.col("c"), F.lit(0)).alias("core_degree"),
        (F.coalesce(F.col("c"), F.lit(0)) >= kk).alias("settled"),
    )


@query(
    "graph_item_cf_topk",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS a FROM lineitem
    ), sup AS (
      SELECT a AS item, CAST(count(*) AS BIGINT) AS s FROM items
      GROUP BY a
    ), pairs AS (
      SELECT i1.a AS a, i2.a AS b, CAST(count(*) AS BIGINT) AS s_ab
      FROM items i1 JOIN items i2 ON i1.g = i2.g AND i1.a < i2.a
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), dir AS (
      SELECT a AS item, b AS nb, s_ab FROM pairs
      UNION ALL SELECT b, a, s_ab FROM pairs
    ), sc AS (
      SELECT d.item, d.nb, d.s_ab,
             d.s_ab / sqrt(CAST(sa.s * sb.s AS DOUBLE)) AS cos
      FROM dir d
      JOIN sup sa ON sa.item = d.item
      JOIN sup sb ON sb.item = d.nb
    ), rk AS (
      SELECT item, nb, s_ab, cos,
             row_number() OVER (
               PARTITION BY item ORDER BY cos DESC, nb) AS rn
      FROM sc
    )
    SELECT item, nb AS neighbour, s_ab AS co_orders,
           round(cos + 1e-9, 6) AS cosine,
           CAST(rn AS INTEGER) AS rank
    FROM rk WHERE rn <= 3
    """,
)
def graph_item_cf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: for every part, the top-3
    most-similar parts by co-occurrence cosine co(a,b)/sqrt(n_a*n_b) —
    the classic 'customers also bought' recommender built entirely from
    the memoized support-pruned pair list. The cosine is ONE division of
    integers (IEEE sqrt/div, bit-identical cross-engine) and ranking
    ties break on the neighbour id, so the per-item top-3 is
    deterministic. Scale: candidate pairs are the support-pruned edge
    list (never all-pairs), supports attach via two equi-joins on the
    item key, and the per-item window sorts only each item's own
    candidates — the shape Amazon-style item CF ships at catalog
    scale."""
    items = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("a")
        )
        .distinct()
    )
    sup = items.groupBy("a").agg(F.count("*").cast("long").alias("s"))
    pairs = _copurchase_edges(spark, sf_dir).withColumnRenamed(
        "support", "s_ab"
    )
    dirs = pairs.select(
        F.col("a").alias("item"), F.col("b").alias("nb"), "s_ab"
    ).unionByName(
        pairs.select(
            F.col("b").alias("item"), F.col("a").alias("nb"), "s_ab"
        )
    )
    sc = (
        dirs.join(
            sup.select(F.col("a").alias("item"), F.col("s").alias("sa")),
            "item",
        )
        .join(
            sup.select(F.col("a").alias("nb"), F.col("s").alias("sb")),
            "nb",
        )
        .withColumn(
            "cos",
            F.col("s_ab")
            / F.sqrt((F.col("sa") * F.col("sb")).cast("double")),
        )
    )
    w = W.partitionBy("item").orderBy(F.col("cos").desc(), F.col("nb"))
    return (
        sc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "item",
            F.col("nb").alias("neighbour"),
            F.col("s_ab").cast("long").alias("co_orders"),
            F.round(F.col("cos") + F.lit(1e-9), 6).alias("cosine"),
            F.col("rn").cast("int").alias("rank"),
        )
    )


@query(
    "graph_degree_assortativity",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS g, l_partkey AS a FROM lineitem
    ), e AS (
      SELECT i1.a AS a, i2.a AS b
      FROM items i1 JOIN items i2 ON i1.g = i2.g AND i1.a < i2.a
      GROUP BY 1, 2 HAVING count(*) >= 2
    ), d AS (
      SELECT node, CAST(count(*) AS BIGINT) AS deg
      FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e)
      GROUP BY node
    ), de AS (
      SELECT da.deg AS x, db.deg AS y
      FROM e JOIN d da ON da.node = e.a JOIN d db ON db.node = e.b
      UNION ALL
      SELECT db.deg, da.deg
      FROM e JOIN d da ON da.node = e.a JOIN d db ON db.node = e.b
    ), s AS (
      SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM de
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           round((n * sxy - sx * sy)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * (n * syy - sy * sy)) + 1e-9, 6)
             AS assortativity
    FROM s
    """,
)
def graph_degree_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Degree assortativity of the co-purchase graph (Newman's r):
    Pearson correlation of endpoint degrees over both edge directions —
    negative means hubs attach to leaves (the typical retail
    co-purchase shape). Integer degree sums only (the ts_acf rule);
    degrees attach to the memoized pruned edge list with two
    broadcast-able joins; the moment aggregate is 1-row."""
    from n2khab_mhq_data_spark.operators.graph import degrees

    edges = _copurchase_edges(spark, sf_dir).select("a", "b")
    d = degrees(edges).select(
        F.col("node"), F.col("degree").cast("long").alias("deg")
    )
    withdeg = (
        edges.join(
            F.broadcast(d.select(F.col("node").alias("a"),
                                 F.col("deg").alias("xa"))), "a")
        .join(
            F.broadcast(d.select(F.col("node").alias("b"),
                                 F.col("deg").alias("xb"))), "b")
    )
    de = withdeg.select(
        F.col("xa").alias("x"), F.col("xb").alias("y")
    ).unionByName(
        withdeg.select(F.col("xb").alias("x"), F.col("xa").alias("y"))
    )
    s = de.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        F.expr("CAST(n DIV 2 AS BIGINT)").alias("n_edges"),
        F.round(
            num / F.sqrt(vx.cast("double") * vy) + F.lit(1e-9), 6
        ).alias("assortativity"),
    )


_BFS_MAX_D = 12  # bounded-diameter contract, same as components max_iter


@query(
    "graph_shortest_paths",
    oracle=_EDGES_SQL
    + f"""
    , ee AS (
      SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
    ), srcs AS (
      SELECT node AS src FROM (
        SELECT a AS node FROM e UNION SELECT b FROM e
      ) ORDER BY node LIMIT 3
    ), walk AS (
      WITH RECURSIVE w(src, node, d) AS (
        SELECT src, src, 0 FROM srcs
        UNION
        SELECT w.src, ee.v, w.d + 1
        FROM w JOIN ee ON ee.u = w.node
        WHERE w.d < {_BFS_MAX_D}
      )
      SELECT * FROM w
    ), best AS (
      SELECT src, node, CAST(min(d) AS INTEGER) AS dist
      FROM walk GROUP BY 1, 2
    )
    SELECT src, dist, CAST(count(*) AS BIGINT) AS n_nodes,
           CAST(sum(node) AS BIGINT) AS node_checksum
    FROM best GROUP BY 1, 2
    """,
)
def graph_shortest_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distances over the co-purchase graph — the
    Pregel-style iterative frontier expansion (unweighted shortest
    paths) from the three lowest-id nodes, reported as a per-(source,
    distance) ring census with a node-id checksum so a node counted at
    the wrong depth breaks the hash. Spark: each round joins ONLY the
    current frontier (not the whole dist table) against the
    bidirectional edge list, anti-joins already-visited (node, src)
    pairs, and localCheckpoints the growing dist table (lineage cut —
    the components/pagerank discipline); the loop is driver-bounded by
    the ring-empty test (a per-round count, the documented bounded
    collect) and the {_BFS_MAX_D}-hop diameter contract the oracle's
    recursive CTE shares. Scale: the frontier join shuffles on the
    node key; each round moves O(|ring| x avg-degree) rows, never the
    whole graph; dist rows are capped at 3 x |V|. The oracle is the
    suite's second recursive-CTE differential (after the ADPCM state
    walk): DuckDB's UNION-deduped recursion explores the same bounded
    (src, node, d) state space."""
    edges = _copurchase_edges(spark, sf_dir).select("a", "b")
    ee = edges.select(
        F.col("a").alias("u"), F.col("b").alias("v")
    ).unionAll(edges.select(F.col("b").alias("u"), F.col("a").alias("v")))
    ee = ee.localCheckpoint()  # reused every round; cut the build lineage
    nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select("b"))
        .distinct()
    )
    srcs = nodes.orderBy("node").limit(3).select(
        F.col("node").alias("src")
    )
    ring0 = srcs.select(
        "src", F.col("src").alias("node"), F.lit(0).alias("d")
    ).localCheckpoint()
    # visited/dist is a UNION of the per-depth ring checkpoints, never
    # re-materialized: the old shape localCheckpoint'ed the GROWING dist
    # table every round — an O(rounds x |dist|) copy tax (plus that many
    # stale block sets waiting on GC). The union plan reads each ring's
    # already-materialized blocks; the per-round anti-join shuffles the
    # same visited bytes either way. (r11, guide §2.4.)
    rings = [ring0]
    visited = ring0
    frontier = ring0

    def expand(fr: DataFrame, vis: DataFrame, d: int) -> DataFrame:
        cand = (
            fr.join(ee, fr.node == ee.u)
            .select("src", F.col("v").alias("node"))
            .distinct()
        )
        return cand.join(vis, ["src", "node"], "left_anti").select(
            "src", "node", F.lit(d).alias("d")
        )

    # TWO BFS levels per materialized round (the connected-components
    # discipline): the second expansion chains onto the first inside
    # ONE checkpoint job — same joins/shuffles to reach the diameter,
    # HALF the materialization barriers and driver round-trips. The
    # d-column keeps each node's exact hop distance, and the second
    # level anti-joins visited AND the first level so depths stay
    # exact. An empty second level just parks the next round's
    # frontier empty, which the emptiness probe then catches.
    for depth in range(1, _BFS_MAX_D + 1, 2):
        r1 = expand(frontier, visited, depth)
        if depth + 1 <= _BFS_MAX_D:
            r2 = expand(r1, visited.unionAll(r1), depth + 1)
            both = r1.unionAll(r2).localCheckpoint()
        else:  # odd-diameter contract tail: single level
            both = r1.localCheckpoint()
        if both.isEmpty():  # bounded driver check, one per round
            release(both)  # empty round: blocks are dead, free them
            break
        rings.append(both)
        visited = visited.unionAll(both)
        frontier = both.filter(F.col("d") == depth + 1)
    release(ee)  # edge blocks fed only the loop; rings are self-contained
    dist = rings[0]
    for r in rings[1:]:
        dist = dist.unionAll(r)
    return dist.groupBy(
        "src", F.col("d").cast("int").alias("dist")
    ).agg(
        F.count("*").cast("long").alias("n_nodes"),
        F.sum("node").cast("long").alias("node_checksum"),
    )


@query(
    "graph_modularity",
    oracle=_EDGES_SQL + """
    , nb AS (
      SELECT node, p_brand AS c FROM (
        SELECT a AS node FROM e UNION SELECT b FROM e
      ) JOIN part ON node = p_partkey
    ), m AS (
      SELECT CAST(count(*) AS DOUBLE) AS m FROM e
    ), intra AS (
      SELECT na.c, CAST(count(*) AS BIGINT) AS ec
      FROM e JOIN nb na ON e.a = na.node
             JOIN nb nbb ON e.b = nbb.node
      WHERE na.c = nbb.c GROUP BY 1
    ), degs AS (
      SELECT nb.c, CAST(count(*) AS BIGINT) AS dc,
             CAST(count(DISTINCT x.node) AS BIGINT) AS nn
      FROM (SELECT a AS node FROM e UNION ALL SELECT b FROM e) x
      JOIN nb ON x.node = nb.node
      GROUP BY nb.c
    )
    SELECT d.c AS community, d.nn AS n_nodes,
           CAST(coalesce(i.ec, 0) AS BIGINT) AS intra_edges,
           d.dc AS degree_sum,
           round(coalesce(i.ec, 0) / m.m
                 - pow(d.dc / (2 * m.m), 2) + 1e-9, 6) AS q_term
    FROM degs d LEFT JOIN intra i ON d.c = i.c, m
    """,
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEWMAN MODULARITY of an attribute partition: how much more
    intra-community the co-purchase graph is than a degree-preserving
    random rewiring, with communities = part brand (a deterministic
    attribute cut — the "is this taxonomy real in the behavior?"
    question, and the standard quality score for any community
    assignment). Q = sum_c [e_c/m - (d_c/2m)^2], reported per
    community. Plan: the memoized support-pruned edge list, one
    node->brand attach, ONE groupBy each for intra-edges and degree
    sums (both community-domain bounded — 25 brands at any scale), and
    a 1-row edge-count broadcast cross. Every term is an exact integer
    ratio."""
    edges = _copurchase_edges(spark, sf_dir).select("a", "b")
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    nodes = (
        edges.select(F.col("a").alias("node"))
        .union(edges.select("b"))
        .distinct()
        .join(p, F.col("node") == F.col("p_partkey"))
        .select("node", F.col("p_brand").alias("c"))
    )
    m = edges.agg(F.count("*").cast("double").alias("m"))
    na = nodes.select(
        F.col("node").alias("a"), F.col("c").alias("ca")
    )
    nbb = nodes.select(
        F.col("node").alias("b"), F.col("c").alias("cb")
    )
    intra = (
        edges.join(na, "a")
        .join(nbb, "b")
        .filter(F.col("ca") == F.col("cb"))
        .groupBy(F.col("ca").alias("c"))
        .agg(F.count("*").cast("long").alias("ec"))
    )
    ends = edges.select(F.col("a").alias("node")).union(
        edges.select("b")
    )
    degs = (
        ends.join(nodes, "node")
        .groupBy("c")
        .agg(
            F.count("*").cast("long").alias("dc"),
            F.countDistinct("node").cast("long").alias("nn"),
        )
    )
    out = (
        degs.join(intra, "c", "left")
        .crossJoin(F.broadcast(m))
        .select(
            F.col("c").alias("community"),
            F.col("nn").alias("n_nodes"),
            F.coalesce(F.col("ec"), F.lit(0)).cast("long").alias(
                "intra_edges"
            ),
            F.col("dc").alias("degree_sum"),
            F.round(
                F.coalesce(F.col("ec"), F.lit(0)) / F.col("m")
                - F.pow(F.col("dc") / (2 * F.col("m")), 2)
                + F.lit(1e-9),
                6,
            ).alias("q_term"),
        )
    )
    return out
