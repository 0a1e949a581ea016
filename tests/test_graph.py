"""Hand-computed fixtures for the graph-analytics and record-linkage
operators (operators/graph.py, operators/linkage.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from n2khab_mhq_data_spark.operators.graph import (
    cooccurrence_edges,
    degree_histogram,
    triangle_stats,
)
from n2khab_mhq_data_spark.operators.linkage import sorted_neighborhood_pairs


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a int, b int")


def test_cooccurrence_edges_canonical_distinct(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 10), (2, 20), (2, 10), (3, 30)],
        "g int, item int",
    )
    got = sorted(
        tuple(r) for r in cooccurrence_edges(df, "g", "item").collect()
    )
    # groups 1 and 2 both link {10, 20}; the edge appears once; the
    # singleton group 3 contributes no edge
    assert got == [(10, 20)]


def test_cooccurrence_min_support_prunes(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30), (2, 10), (2, 20)],
        "g int, item int",
    )
    # support: (10,20)->2, (10,30)->1, (20,30)->1
    got = sorted(
        tuple(r)
        for r in cooccurrence_edges(
            df, "g", "item", min_support=2
        ).collect()
    )
    assert got == [(10, 20)]


def test_triangle_stats_hand_computed(spark):
    # K3 triangle (1,2,3) plus a pendant node 4 attached to 3:
    # degrees 2,2,3,1 -> wedges 1+1+3+0 = 5, triangles 1, cc = 3/5
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (3, 4)])
    row = triangle_stats(e).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        4, 4, 5, 1,
    )
    assert abs(row.global_cc - 0.6) < 1e-9

    hist = {
        r.degree: r.n_nodes for r in degree_histogram(e).collect()
    }
    assert hist == {1: 1, 2: 2, 3: 1}


def test_triangle_stats_two_triangles_sharing_edge(spark):
    # bowtie-ish: triangles (1,2,3) and (2,3,4) share edge (2,3)
    # degrees: 1->2, 2->3, 3->3, 4->2 ; wedges 1+3+3+1 = 8, triangles 2
    e = _edges(spark, [(1, 2), (1, 3), (2, 3), (2, 4), (3, 4)])
    row = triangle_stats(e).collect()[0]
    assert (row.n_wedges, row.n_triangles) == (8, 2)
    assert abs(row.global_cc - 0.75) < 1e-9


def test_triangle_free_graph(spark):
    # path 1-2-3-4: no triangles, wedges 2, cc null (wedges>0 -> 0.0)
    e = _edges(spark, [(1, 2), (2, 3), (3, 4)])
    row = triangle_stats(e).collect()[0]
    assert row.n_triangles == 0 and row.n_wedges == 2
    assert row.global_cc == 0.0


def test_sorted_neighborhood_finds_cross_block_pair(spark):
    # ids chosen so 'b' and 'c' straddle the primary block boundary at
    # 100 — only the shifted second pass can pair them
    df = spark.createDataFrame(
        [(1, "aaaa", 98), (2, "aaab", 99), (3, "aaac", 100),
         (4, "zzzz", 101)],
        "id int, key string, sfx int",
    )
    blocks = [
        F.floor(F.col("sfx") / 100),
        F.floor((F.col("sfx") + 50) / 100) + 10_000,
    ]
    got = {
        (r.id1, r.id2): r.lev_dist
        for r in sorted_neighborhood_pairs(
            df, "id", "key", blocks, window=3, max_dist=2
        ).collect()
    }
    # within block 0: (1,2) lev 1 and the window-2 pair (1,3)... but 3 is
    # in block 1 for pass one; pass two (shifted) puts 98..147 together
    assert got[(1, 2)] == 1
    assert got[(2, 3)] == 1  # cross-boundary, found only by pass two
    assert got[(1, 3)] == 1  # window=3 reaches 2 steps in pass two
    # 'zzzz' is within reach positionally but lev > max_dist
    assert (3, 4) not in got and (2, 4) not in got


def test_sorted_neighborhood_canonical_dedup(spark):
    # the same neighbor pair discovered by both passes appears once
    df = spark.createDataFrame(
        [(1, "aa", 1), (2, "ab", 2)], "id int, key string, sfx int"
    )
    blocks = [F.lit(0), F.lit(1)]
    rows = sorted_neighborhood_pairs(
        df, "id", "key", blocks, window=2, max_dist=2
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.id1, r.id2, r.key1, r.key2, r.lev_dist) == (1, 2, "aa", "ab", 1)


def test_triangle_stats_random_graphs_vs_python(spark):
    """Seeded random graphs: the degree-oriented distributed count must
    equal a brute-force pure-python enumeration."""
    import itertools
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 12
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(n), rng.randrange(n)) for _ in range(30)
                )
                if a != b
            }
        )
        eset = set(edges)
        want_tri = sum(
            1
            for a, b, c in itertools.combinations(range(n), 3)
            if (a, b) in eset and (b, c) in eset and (a, c) in eset
        )
        deg: dict[int, int] = {}
        for a, b in edges:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        want_wedges = sum(d * (d - 1) // 2 for d in deg.values())

        e = spark.createDataFrame(edges, "a int, b int")
        row = triangle_stats(e).collect()[0]
        assert row.n_triangles == want_tri, (trial, edges)
        assert row.n_wedges == want_wedges
        assert row.n_edges == len(edges)
        assert row.n_nodes == len(deg)


def test_pagerank_hand_computed_one_iteration(spark):
    from n2khab_mhq_data_spark.operators.graph import pagerank

    # path graph 1-2-3: deg(1)=deg(3)=1, deg(2)=2; r0 = 1/3 each.
    # r1(1) = 0.15/3 + 0.85*(r0(2)/2)       = 0.191667
    # r1(2) = 0.15/3 + 0.85*(r0(1)+r0(3))   = 0.616667
    got = {
        r["node"]: r["pagerank"]
        for r in pagerank(
            _edges(spark, [(1, 2), (2, 3)]), iters=1
        ).collect()
    }
    assert abs(got[1] - 0.191667) < 1e-6
    assert abs(got[2] - 0.616667) < 1e-6
    assert abs(got[3] - 0.191667) < 1e-6


def test_pagerank_mass_conserved_and_symmetry(spark):
    from n2khab_mhq_data_spark.operators.graph import pagerank

    # star + tail: mass sums to 1 after any iteration count (no dangling
    # nodes in an undirected graph), symmetric leaves tie exactly
    rows = pagerank(
        _edges(spark, [(1, 2), (1, 3), (1, 4), (4, 5)]), iters=3
    ).collect()
    total = sum(r["pagerank"] for r in rows)
    assert abs(total - 1.0) < 1e-5
    got = {r["node"]: r["pagerank"] for r in rows}
    assert got[2] == got[3]  # symmetric leaves of the star
    assert got[1] > got[4] > got[5]  # hub > bridge > tail leaf


def test_copurchase_lift_hand_computed(spark):
    """3 orders: {1,2}, {1,2}, {1,3}. N=3, s(1)=3, s(2)=2, s(3)=1.
    Pair (1,2): support 2, confidence 2/3, lift (2*3)/(3*2)=1.0."""
    from n2khab_mhq_data_spark.plans import graph as graph_plans  # noqa: F401

    li = spark.createDataFrame(
        [(10, 1), (10, 2), (11, 1), (11, 2), (12, 1), (12, 3)],
        "g int, a int",
    )
    items = li.select("g", "a").distinct()
    from pyspark.sql import functions as FF

    pairs = (
        items.join(items.select("g", FF.col("a").alias("b")), "g")
        .filter(FF.col("a") < FF.col("b"))
        .groupBy("a", "b")
        .agg(FF.count("*").alias("s_ab"))
        .filter(FF.col("s_ab") >= 2)
        .collect()
    )
    assert [(r["a"], r["b"], r["s_ab"]) for r in pairs] == [(1, 2, 2)]


def test_pagerank_empty_edge_list_returns_empty(spark):
    from n2khab_mhq_data_spark.operators.graph import pagerank

    out = pagerank(spark.createDataFrame([], "a long, b long"), iters=2)
    assert out.count() == 0
    assert out.columns == ["node", "pagerank"]


def test_label_propagation_two_communities(spark):
    from n2khab_mhq_data_spark.operators.graph import label_propagation

    # two dense triangles joined by one bridge edge: connected
    # components would merge them; LPA keeps two communities
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)],
        "a long, b long",
    )
    got = {
        r.node: r.community
        for r in label_propagation(edges, iters=3).collect()
    }
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11] == got[12]
    assert got[1] != got[10]


def test_edit_distance_join_deletion_all_edit_kinds(spark):
    """One planted pair per edit kind — substitution, deletion,
    insertion, exact equality — plus a distance-2 pair that must NOT
    appear and a lone far string."""
    from n2khab_mhq_data_spark.operators.linkage import (
        edit_distance_join_deletion,
    )

    df = spark.createDataFrame(
        [
            (1, "market"),   # 1-2 substitution (basket? no: marked)
            (2, "marked"),   # sub at pos 5
            (3, "marke"),    # deletion of 1's trailing t AND of 2's d
            (4, "bridge"),
            (5, "bridge"),   # exact duplicate of 4
            (6, "bridges"),  # insertion on 4/5
            (7, "brudges"),  # dist 2 from 4/5, dist 1 from 6
            (8, "zzzzzz"),
        ],
        "id int, name string",
    )
    got = {
        (r["id1"], r["id2"]): r["lev_dist"]
        for r in edit_distance_join_deletion(df, "id", "name").collect()
    }
    assert got == {
        (1, 2): 1,
        (1, 3): 1,
        (2, 3): 1,
        (4, 5): 0,
        (4, 6): 1,
        (5, 6): 1,
        (6, 7): 1,
    }


def test_edit_distance_join_matches_quadratic(spark):
    """Lossless contract: deletion-neighborhood output == brute-force
    all-pairs filter on a corpus dense with near-misses."""
    from n2khab_mhq_data_spark.operators.linkage import (
        edit_distance_join_deletion,
    )

    rows = [(i, "id%04d" % (i * 7 % 500)) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, name string")
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r["id1"], r["id2"]): r["d"]
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.levenshtein("a.name", "b.name").alias("d"),
        )
        .filter(F.col("d") <= 1)
        .collect()
    }
    got = {
        (r["id1"], r["id2"]): r["lev_dist"]
        for r in edit_distance_join_deletion(df, "id", "name").collect()
    }
    assert got == brute and len(brute) > 50


def test_edit_distance_join_blocked_matches_blocked_quadratic(spark):
    """Blocked contract: with block_cols, output == brute-force
    all-pairs restricted to equal blocks — near-name pairs straddling
    blocks are excluded, in-block pairs are complete."""
    from n2khab_mhq_data_spark.operators.linkage import (
        edit_distance_join_deletion,
    )

    rows = [
        (i, "id%04d" % (i * 7 % 500), i % 3, "SEG%d" % (i % 2))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id int, name string, nat int, seg string")
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r["id1"], r["id2"]): r["d"]
        for r in a.join(
            b,
            (F.col("a.id") < F.col("b.id"))
            & (F.col("a.nat") == F.col("b.nat"))
            & (F.col("a.seg") == F.col("b.seg")),
        )
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.levenshtein("a.name", "b.name").alias("d"),
        )
        .filter(F.col("d") <= 1)
        .collect()
    }
    got = {
        (r["id1"], r["id2"]): r["lev_dist"]
        for r in edit_distance_join_deletion(
            df, "id", "name", block_cols=["nat", "seg"]
        ).collect()
    }
    unblocked = edit_distance_join_deletion(df, "id", "name").count()
    assert got == brute and 0 < len(brute) < unblocked


def test_golden_record_survivorship_hand_computed(spark):
    """Two planted dup groups with distinct survivorship outcomes, plus
    a cross-block near-name pair that must NOT link."""
    from n2khab_mhq_data_spark.llmdata.dedup import connected_components
    from n2khab_mhq_data_spark.operators.linkage import (
        edit_distance_join_deletion,
    )

    rows = [
        # group A (block n1/s1): chain ann-anne-annl, rep = max bal (2)
        (1, "ann", 1, "s1", 10.0),
        (2, "anne", 1, "s1", 50.0),
        (3, "annl", 1, "s1", 30.0),
        # near-name but different block: must stay out
        (4, "anne", 2, "s1", 99.0),
        # group B: tie on bal -> min custkey wins rep
        (5, "bob", 1, "s1", 20.0),
        (6, "rob", 1, "s1", 20.0),
    ]
    df = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int,"
        " c_mktsegment string, c_acctbal double"
    )
    pairs = edit_distance_join_deletion(
        df, "c_custkey", "c_name", block_cols=["c_nationkey", "c_mktsegment"]
    )
    got = {(r["id1"], r["id2"]) for r in pairs.collect()}
    assert (2, 4) not in got and (1, 2) in got and (5, 6) in got
    comps = {
        r["doc"]: r["component_id"]
        for r in connected_components(pairs, "id1", "id2").collect()
    }
    assert comps[1] == comps[2] == comps[3] == 1
    assert comps[5] == comps[6] == 5
    assert 4 not in comps


def test_kcore_matches_brute_force_peel(spark, sf_dir):
    """The 12-round peel must equal the exact 3-core fixpoint computed
    by an independent in-memory peel at sf0.001, and every row must be
    settled (core_degree >= 3) — the in-band convergence proof."""
    import collections

    from n2khab_mhq_data_spark.plans.graph import (
        _copurchase_edges,
        graph_kcore,
    )

    edges = [
        (r["a"], r["b"])
        for r in _copurchase_edges(spark, sf_dir).select("a", "b").collect()
    ]
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    alive = set(adj)
    while True:
        dead = {n for n in alive if sum(m in alive for m in adj[n]) < 3}
        if not dead:
            break
        alive -= dead
    got = {
        r["node"]: (r["core_degree"], r["settled"])
        for r in graph_kcore(spark, sf_dir).collect()
    }
    assert set(got) == alive
    for node, (deg, settled) in got.items():
        assert settled, (node, deg)
        assert deg == sum(m in alive for m in adj[node])


def test_item_cf_topk_matches_brute_force(spark, sf_dir):
    """Per-item top-3 cosine neighbours equal an independent pandas
    computation from the raw lineitem table at sf0.001."""
    import collections
    import math

    from n2khab_mhq_data_spark.catalog import load
    from n2khab_mhq_data_spark.plans.graph import graph_item_cf_topk

    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = collections.defaultdict(set)
    n = collections.Counter()
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
        n[r["l_partkey"]] += 1
    co = collections.Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                co[(a, b)] += 1
    nbrs = collections.defaultdict(list)
    for (a, b), c in co.items():
        if c >= 2:
            cos = c / math.sqrt(n[a] * n[b])
            nbrs[a].append((-cos, b, c))
            nbrs[b].append((-cos, a, c))
    expected = {}
    for item, cand in nbrs.items():
        cand.sort()
        for rank, (negcos, nb, c) in enumerate(cand[:3], 1):
            expected[(item, rank)] = (nb, c, round(-negcos + 1e-9, 6))
    got = {
        (r["item"], r["rank"]): (r["neighbour"], r["co_orders"], r["cosine"])
        for r in graph_item_cf_topk(spark, sf_dir).collect()
    }
    assert got == expected


def test_assortativity_matches_networkx_style_formula(spark, sf_dir):
    """Newman's r recomputed independently in python over the collected
    edge list must equal the Spark value."""
    import math

    from n2khab_mhq_data_spark.plans.graph import (
        _copurchase_edges,
        graph_degree_assortativity,
    )

    edges = [
        (r["a"], r["b"])
        for r in _copurchase_edges(spark, sf_dir).select("a", "b").collect()
    ]
    import collections

    deg = collections.Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    r_exp = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    row = graph_degree_assortativity(spark, sf_dir).collect()[0]
    assert row["n_edges"] == len(edges)
    assert abs(row["assortativity"] - r_exp) < 1e-6


def test_edit_distance_join_hot_bucket_route_exact(spark):
    """Bounded-buffer contract: a (blk, var) bucket above
    ``hot_bucket_cap`` must take the spillable self-join route and
    produce the SAME pairs as the collect_list route. Planted: one hot
    variant bucket (12 equal keys, > cap=4) among normal near-misses."""
    from n2khab_mhq_data_spark.operators.linkage import (
        edit_distance_join_deletion,
    )

    rows = [(i, "hotkey") for i in range(12)]          # hot bucket
    rows += [(100, "alpha"), (101, "alphb"), (102, "zeta")]
    df = spark.createDataFrame(rows, "id int, name string")
    a, b = df.alias("a"), df.alias("b")
    brute = {
        (r["id1"], r["id2"]): r["d"]
        for r in a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id1"),
            F.col("b.id").alias("id2"),
            F.levenshtein("a.name", "b.name").alias("d"),
        )
        .filter(F.col("d") <= 1)
        .collect()
    }
    got = {
        (r["id1"], r["id2"]): r["lev_dist"]
        for r in edit_distance_join_deletion(
            df, "id", "name", hot_bucket_cap=4
        ).collect()
    }
    assert got == brute and len(brute) == 66 + 1
