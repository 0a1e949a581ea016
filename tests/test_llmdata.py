"""Library-level tests for the training-data pipeline operators
(similarity search, bucketed near-dup, multimodal frame fan-out).
End-to-end differential checks live in tools/check.py; these pin the
operator semantics on tiny hand-checkable inputs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from n2khab_mhq_data_spark.llmdata.multimodal import (
    decode_image,
    sample_frames,
    with_binary_payload,
)
from n2khab_mhq_data_spark.llmdata.similarity import (
    ann_topk_bucketed,
    cosine_pairs_bucketed,
    cosine_topk,
)


def _vectors(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(spark):
    # unit vectors at known angles: cos(v0,v1)=1, cos(v0,v2)=0
    corpus = _vectors(
        spark,
        [(0, [1.0, 0.0]), (1, [2.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
    )
    out = cosine_topk(corpus, corpus.filter(F.col("vec_id") == 0), k=3)
    rows = {r["neighbour_id"]: r for r in out.collect()}
    assert rows[1]["rank"] == 1 and abs(rows[1]["cosine"] - 1.0) < 1e-6
    assert abs(rows[3]["cosine"] - math.sqrt(0.5)) < 1e-6
    assert rows[2]["rank"] == 3  # orthogonal sorts last


# A varying base vector: constant vectors can land exactly on the d=0
# bucket boundary (the deterministic hyperplane signs sum to zero there),
# where FP noise decides the bit — boundary behavior is engine-defined,
# same caveat as GEOS, so tests keep projections solidly nonzero.
_BASE = [float(1 + (i * 7) % 13) for i in range(64)]
_BASE[0] += 7.0  # keeps |projection| >= 3 on planes 0..7 (checked offline)


def test_cosine_pairs_bucketed_finds_parallel_vectors(spark):
    # same-direction vectors share every hyperplane bucket; the opposite
    # vector flips every bit
    corpus = _vectors(
        spark,
        [
            (0, _BASE),
            (1, [2.0 * x for x in _BASE]),
            (2, [-x for x in _BASE]),
        ],
    )
    out = cosine_pairs_bucketed(corpus, threshold=0.9, planes=6).collect()
    assert [(r["d1"], r["d2"]) for r in out] == [(0, 1)]
    assert abs(out[0]["cosine"] - 1.0) < 1e-6


def test_ann_topk_bucketed_reranks_within_bucket(spark):
    corpus = _vectors(
        spark,
        [
            (0, _BASE),
            (1, [2.0 * x for x in _BASE]),
            (2, [0.9 * x for x in _BASE]),
            (3, [-x for x in _BASE]),
        ],
    )
    out = ann_topk_bucketed(
        corpus, corpus.filter(F.col("vec_id") == 0), k=2, planes=4
    ).collect()
    # vec 3 is in the opposite bucket -> never a candidate
    assert {r["neighbour_id"] for r in out} == {1, 2}
    assert all(abs(r["cosine"] - 1.0) < 1e-6 for r in out)


def test_sample_frames_fan_out(spark):
    df = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "xy")], "doc_id long, text string"
    )
    out = sample_frames(with_binary_payload(df), stride=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 8 bytes -> n_frames = 8 % 7 + 1 = 2 -> sampled frame 0 only
    assert [r["frame_idx"] for r in by_doc[1]] == [0]
    assert by_doc[1][0]["frame_byte"] == ord("a")
    # doc 2: 2 bytes -> n_frames = 3 -> frames 0 and 2
    assert [sorted(r["frame_idx"] for r in by_doc[2])] == [[0, 2]]
    # frame 2 of doc 2 addresses byte (2*13) % 2 = 0 -> 'x'
    assert all(r["frame_byte"] == ord("x") for r in by_doc[2])


def test_decode_image_stub_raises_without_fake():
    try:
        decode_image(b"abc", fake=False)
    except NotImplementedError:
        pass
    else:
        raise AssertionError("stub must raise without fake=True")


def test_connected_components_non_clique_shapes(spark):
    """Chain, star-with-bridge, and singleton-pair shapes — where one
    star-contraction round (dedup_canonicalize) is NOT exact — must all
    collapse to their true component minimum."""
    from n2khab_mhq_data_spark.llmdata.dedup import connected_components

    edges = spark.createDataFrame(
        [
            # chain 1-2-3-4-5 (diameter 4: needs >1 round)
            (1, 2), (2, 3), (3, 4), (4, 5),
            # two stars joined by a bridge: 10-{11,12}, 20-{21,22}, 12-21
            (10, 11), (10, 12), (20, 21), (20, 22), (12, 21),
            # isolated pair
            (30, 31),
        ],
        "d1 long, d2 long",
    )
    got = {
        r.doc: r.component_id
        for r in connected_components(edges, "d1", "d2").collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
        10: 10, 11: 10, 12: 10, 20: 10, 21: 10, 22: 10,
        30: 30, 31: 30,
    }


def test_repetition_metrics_edge_cases(spark):
    from pyspark.sql import functions as F

    from n2khab_mhq_data_spark.llmdata.text import repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "a a a a"),          # all dup words; bigrams "a a" x3 dup
            (2, "w x y z"),          # no repetition
            (3, "solo"),             # single word: no bigrams
            (4, "go go stop go go"), # mixed
        ],
        "doc_id int, text string",
    )
    m = repetition_metrics(F.col("text"))
    out = {
        r.doc_id: (r.n_words, round(r.dup_word_frac, 6), round(r.dup_bigram_frac, 6))
        for r in df.select(
            "doc_id",
            m["n_words"].alias("n_words"),
            m["dup_word_frac"].alias("dup_word_frac"),
            m["dup_bigram_frac"].alias("dup_bigram_frac"),
        ).collect()
    }
    assert out[1] == (4, 0.75, round(2 / 3, 6))
    assert out[2] == (4, 0.0, 0.0)
    assert out[3] == (1, 0.0, 0.0)
    # words: go x4, stop -> dups = 5-2=3 -> 0.6
    # bigrams: "go go","go stop","stop go","go go" -> 1 dup of 4 -> 0.25
    assert out[4] == (5, 0.6, 0.25)


def test_samplers_negative_ids_consistent(spark):
    """All four hash-keyed operators must map negative ids into [0, p)
    via pmod — a signed % would silently diverge from split_hash's
    documented convention (VERDICT r2 finding 3)."""
    from n2khab_mhq_data_spark.llmdata.pipeline import (
        HASH_PRIME,
        hash_sample,
        hash_split,
        stratified_hash_sample,
        weighted_hash_sample,
    )

    ids = [-5, -4, -3, -2, -1, 0, 1, 2, 3]
    df = spark.createDataFrame(
        [(i, "s%d" % (abs(i) % 2), float(abs(i) + 1)) for i in ids],
        "doc_id long, lang string, n_chars double",
    )

    hs = hash_sample(df, "doc_id", k=9).collect()
    assert len(hs) == 9 and all(0 <= r.h < HASH_PRIME for r in hs)

    st = stratified_hash_sample(df, "doc_id", "lang", per_stratum=9).collect()
    assert len(st) == 9 and all(0 <= r.h < HASH_PRIME for r in st)

    ws = weighted_hash_sample(df, "doc_id", "n_chars", k=9).collect()
    # u in (0, 1] -> key = u^(1/w) in (0, 1]; a signed % would push u
    # negative and pow() would emit NaN for fractional exponents
    assert len(ws) == 9 and all(0.0 < r.sample_key <= 1.0 + 1e-9 for r in ws)

    sp = hash_split(df, "doc_id").select("split").distinct().collect()
    assert {r.split for r in sp} <= {"train", "val", "test"}


def test_semdedup_keeps_smallest_of_duplicate_group(spark):
    """SemDeDup keep-rule: within a cluster, only vectors with NO
    smaller-id near-duplicate survive — the kept set is deterministic."""
    from n2khab_mhq_data_spark.llmdata.similarity import semdedup

    e1 = [1.0, 0.0, 0.0, 0.0]
    e1b = [2.0, 0.0, 0.0, 0.0]      # same direction as e1 (cos = 1)
    e2 = [0.0, 1.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [(1, e1), (2, e1b), (3, e2)],
        "vec_id long, embedding array<float>",
    )
    cents = [(0, e1), (1, e2)]
    out = {
        r.vec_id: (r.cent_id, r.keep)
        for r in semdedup(df, "embedding", "vec_id", cents, 0.9).collect()
    }
    assert out[1] == (0, True)      # no smaller-id mate
    assert out[2] == (0, False)     # duplicate of 1 -> pruned
    assert out[3] == (1, True)      # alone in its cluster


def test_dsir_weights_prefer_target_like_docs(spark):
    """DSIR: a doc sharing the target domain's vocabulary must score a
    higher log importance weight than an out-of-domain doc."""
    from pyspark.sql import functions as F

    from n2khab_mhq_data_spark.llmdata.pipeline import dsir_logweights

    df = spark.createDataFrame(
        [
            (1, "wiki science physics energy", True),
            (2, "wiki science biology cells", True),
            (3, "science physics experiment", False),   # target-like
            (4, "buy cheap pills now", False),          # off-domain
        ],
        "doc_id long, text string, is_t boolean",
    )
    w = {
        r.doc_id: r.dsir_logweight
        for r in dsir_logweights(
            df, "text", "doc_id", F.col("is_t"), 256
        ).collect()
    }
    assert w[3] > w[4]


def test_duplicated_spans_positions(spark):
    """Two docs sharing an 8-token phrase at different positions are both
    reported at the right 1-based positions; unshared text is silent."""
    from n2khab_mhq_data_spark.llmdata.dedup import duplicated_spans

    phrase = "a b c d e f g h"
    df = spark.createDataFrame(
        [
            (1, phrase + " tail1 tail2"),
            (2, "lead " + phrase),
            (3, "u v w x y z q r s t"),
        ],
        "doc_id long, text string",
    )
    rows = duplicated_spans(df, "text", "doc_id", span=8).collect()
    got = {(r.doc, r.pos): (r.n_docs, r.n_occurrences) for r in rows}
    # only the shared phrase qualifies: doc 1 at pos 1, doc 2 at pos 2
    assert got == {(1, 1): (2, 2), (2, 2): (2, 2)}
    assert len({r.span_hash for r in rows}) == 1


def test_duplicated_spans_matches_python_reference(spark):
    """Seeded random corpora: duplicated_spans equals a pure-python
    reference (every span, position, and count)."""
    import random
    from collections import defaultdict

    from n2khab_mhq_data_spark.llmdata.dedup import duplicated_spans

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 25))))
        for i in range(12)
    ]
    span = 4
    occ = defaultdict(list)
    for did, text in docs:
        ws = text.split()
        for p in range(len(ws) - span + 1):
            occ[" ".join(ws[p : p + span])].append((did, p + 1))
    want = {}
    for gram, hits in occ.items():
        ndocs = len({d for d, _ in hits})
        if ndocs >= 2:
            for d, p in hits:
                want[(d, p)] = (ndocs, len(hits))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc, r.pos): (r.n_docs, r.n_occurrences)
        for r in duplicated_spans(df, "text", "doc_id", span=span).collect()
    }
    assert got == want


def test_semdedup_matches_brute_force(spark):
    """Seeded random vectors, one cluster: keep iff no smaller-id vector
    exceeds the cosine threshold (brute-force reference)."""
    import random

    from n2khab_mhq_data_spark.llmdata.similarity import semdedup

    rng = random.Random(11)
    vecs = []
    for i in range(14):
        if i % 4 == 3:
            base = vecs[i - 1][1]
            v = [x + rng.uniform(-0.01, 0.01) for x in base]  # near-dup
        else:
            v = [rng.uniform(-1, 1) for _ in range(6)]
        vecs.append((i, v))

    def cos(a, b):
        import math

        d = sum(x * y for x, y in zip(a, b))
        return d / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    tau = 0.95
    want = {
        i: all(cos(v, w) < tau for j, w in vecs if j < i)
        for i, v in vecs
    }
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r.keep
        for r in semdedup(
            df, "embedding", "vec_id", [(0, vecs[0][1])], tau
        ).collect()
    }
    assert got == want


def test_duplicated_runs_merge_adjacent_windows(spark):
    """Adjacent duplicated windows merge into one maximal run covering
    the full repeated region; distant duplicates stay separate runs."""
    from n2khab_mhq_data_spark.llmdata.dedup import duplicated_runs

    shared = "a b c d e f g h i j"  # 10 tokens -> 3 dup 8-windows
    df = spark.createDataFrame(
        [
            (1, shared + " solo1 solo2"),
            (2, "x y " + shared),
        ],
        "doc_id long, text string",
    )
    runs = {
        r.doc: (r.start_pos, r.end_pos, r.n_windows, r.run_tokens)
        for r in duplicated_runs(df, "text", "doc_id", span=8).collect()
    }
    # doc 1: windows at 1..3 merge -> run of 3+8-1 = 10 tokens from pos 1
    assert runs[1] == (1, 3, 3, 10)
    # doc 2: same region shifted by 2
    assert runs[2] == (3, 5, 3, 10)


def test_hashed_linear_quality_matches_python_reference(spark):
    from n2khab_mhq_data_spark.llmdata.text import hashed_linear_quality
    import math

    texts = [(1, "alpha beta gamma"), (2, "delta"), (3, "zz zz zz")]
    df = spark.createDataFrame(texts, "doc_id int, text string")

    def bucket(tok):
        acc = 7
        for ch in tok:
            acc = (acc * 31 + ord(ch)) % 1000003
        return acc % 512

    def weight(tok):
        return ((bucket(tok) * 2654435761 + 12345) % 2001 - 1000) / 1000.0

    got = {r.doc_id: (r.quality_prob, r.keep)
           for r in hashed_linear_quality(df).collect()}
    for doc_id, text in texts:
        toks = text.split()
        mw = sum(weight(t) for t in toks) / len(toks)
        prob = 1.0 / (1.0 + math.exp(-mw))
        assert abs(got[doc_id][0] - prob) < 2e-6, (doc_id, got[doc_id], prob)
        assert got[doc_id][1] == (prob >= 0.5)


def test_bpe_train_hand_computed(spark):
    from n2khab_mhq_data_spark.llmdata.text import bpe_train

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab")], "doc_id int, text string"
    )
    # vocab: aaab x2, ab x1
    # round 0: (a,a) = 2 per 'aaab' * 2 = 4; (a,b) = 2 + 1 = 3 -> merge (a,a)
    # round 1: words [aa,a,b]x2 [a,b]x1: (aa,a)=2, (a,b)=3 -> merge (a,b)
    # round 2: words [aa,ab]x2 [ab]x1: (aa,ab)=2 -> merge (aa,ab)
    assert bpe_train(docs, "text", num_merges=5) == [
        (0, "a", "a", 4),
        (1, "a", "b", 3),
        (2, "aa", "ab", 2),
    ]


def test_bpe_train_lexicographic_tie_break(spark):
    from n2khab_mhq_data_spark.llmdata.text import bpe_train

    # 'xy' and 'ab' both count 1 -> ties break lexicographically: (a,b)
    docs = spark.createDataFrame([(1, "xy ab")], "doc_id int, text string")
    merges = bpe_train(docs, "text", num_merges=1)
    assert merges == [(0, "a", "b", 1)]


def test_lsh_recall_audit_full_recall_on_planted_dups(spark):
    from n2khab_mhq_data_spark.llmdata.dedup import lsh_recall_audit

    base = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " extra"),  # near-dup of 1 (high jaccard)
            (3, "completely different words with no overlap at all here"),
        ],
        "doc_id int, text string",
    )
    rows = lsh_recall_audit(docs, "text", "doc_id", min_jaccard=0.6).collect()
    assert len(rows) >= 1
    for r in rows:
        assert r["n_captured"] == r["n_pairs"]  # s-curve guarantee
        assert r["recall"] == 1.0


def test_prefix_filter_pairs_hand_computed(spark):
    from n2khab_mhq_data_spark.llmdata.dedup import prefix_filter_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (1, base),                  # 8 3-gram shingles
            (2, base + " lambda"),      # 9 shingles, 8 shared: J = 8/9
            (3, "one two three four five six seven eight nine ten"),
        ],
        "doc_id int, text string",
    )
    rows = prefix_filter_pairs(docs, "text", "doc_id", k=3, threshold=0.8).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["d1"], r["d2"]) == (1, 2)
    assert abs(r["jaccard"] - 8 / 9) < 1e-5


def test_prefix_filter_matches_uncapped_exact_join(spark):
    """The prefix-filter path is LOSSLESS by construction — its output
    must equal the uncapped quadratic join exactly, including docs that
    share heavy stop-grams the prefix never joins on."""
    from n2khab_mhq_data_spark.llmdata.dedup import (
        ngram_jaccard_pairs,
        prefix_filter_pairs,
    )

    # stop-gram-heavy corpus: every doc shares 'the common filler' grams,
    # planted near-dup groups differ by one trailing token
    words = ["w%d" % i for i in range(12)]
    rows = []
    for i in range(30):
        body = " ".join(words[(i % 5):(i % 5) + 7])
        rows.append((i, "the common filler %s tail%d" % (body, i % 4)))
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    for t in (0.6, 0.8):
        exact = {
            (r["d1"], r["d2"]): r["jaccard"]
            for r in ngram_jaccard_pairs(
                docs, "text", "doc_id", k=3, threshold=t
            ).collect()
        }
        pref = {
            (r["d1"], r["d2"]): r["jaccard"]
            for r in prefix_filter_pairs(
                docs, "text", "doc_id", k=3, threshold=t
            ).collect()
        }
        assert pref == exact and len(exact) > 0


def test_leakage_safe_split_no_straddle(spark):
    from n2khab_mhq_data_spark.llmdata.pipeline import leakage_safe_split

    docs = spark.createDataFrame(
        [(i, "t") for i in range(200)], "doc_id int, text string"
    )
    # chain 7-8-9 is one component; 50-51 another; rest singletons
    near = spark.createDataFrame(
        [(7, 8), (8, 9), (50, 51)], "d1 int, d2 int"
    )
    rows = leakage_safe_split(docs, near, "doc_id").collect()
    assert len(rows) == 200
    by_id = {r["doc_id"]: r for r in rows}
    # all members of a component share group_id AND split
    assert (
        by_id[7]["group_id"] == by_id[8]["group_id"] == by_id[9]["group_id"]
        == 7
    )
    assert by_id[7]["split"] == by_id[8]["split"] == by_id[9]["split"]
    assert by_id[50]["split"] == by_id[51]["split"]
    # singletons keep their own id and match the plain hash_split label
    from n2khab_mhq_data_spark.llmdata.pipeline import hash_split

    plain = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs, "doc_id").collect()
    }
    for i in range(200):
        if i not in (7, 8, 9, 50, 51):
            assert by_id[i]["group_id"] == i
            assert by_id[i]["split"] == plain[i]


def test_bpe_encode_reproduces_trainer_state(spark):
    from n2khab_mhq_data_spark.llmdata.text import bpe_encode, bpe_train

    docs = spark.createDataFrame(
        [(1, "aaab aaab ab")], "doc_id int, text string"
    )
    merges = bpe_train(docs, "text", num_merges=5)
    # merges: (a,a), (a,b), (aa,ab) -> 'aaab' encodes to 1 token, 'ab' to 1
    row = bpe_encode(docs, "text", "doc_id", merges).collect()[0]
    assert row["n_words"] == 3
    assert row["n_symbols_raw"] == 10
    assert row["n_tokens_bpe"] == 3
    # zero merges: every char is a token
    row0 = bpe_encode(docs, "text", "doc_id", []).collect()[0]
    assert row0["n_tokens_bpe"] == 10


def test_bpe_train_surfaces_vocab_truncation(spark):
    import warnings

    import pytest

    from n2khab_mhq_data_spark.llmdata.text import bpe_train

    docs = spark.createDataFrame(
        [(1, "aa bb cc dd ee")], "doc_id int, text string"
    )
    # cap below the 5-word vocabulary: must warn (and raise under strict)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bpe_train(docs, "text", num_merges=1, max_vocab=3)
    assert any("max_vocab" in str(w.message) for w in caught)
    with pytest.raises(ValueError, match="max_vocab"):
        bpe_train(docs, "text", num_merges=1, max_vocab=3, strict_vocab=True)
    # an uncapped corpus stays silent
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        merges = bpe_train(docs, "text", num_merges=1, max_vocab=100)
    assert not any("max_vocab" in str(w.message) for w in caught)
    assert merges


def test_decontaminate_bloom_equals_exact(spark):
    """The Bloom-routed decontamination must return EXACTLY the exact
    path's output (verification removes every false positive), and the
    bitmap prefilter must actually prune non-benchmark grams."""
    from n2khab_mhq_data_spark.llmdata.dedup import (
        decontaminate,
        decontaminate_bloom,
    )

    corpus = spark.createDataFrame(
        [(i, f"alpha beta w{i} x{i} y{i} z{i}") for i in range(1, 60)]
        + [(99, "held out secret evaluation prompt appears here")],
        "doc_id long, text string",
    )
    benchmark = spark.createDataFrame(
        [(1000, "held out secret evaluation prompt appears here tail")],
        "doc_id long, text string",
    )
    exact = {
        tuple(r)
        for r in decontaminate(corpus, benchmark, "text", "doc_id", k=3)
        .collect()
    }
    bloom = {
        tuple(r)
        for r in decontaminate_bloom(
            corpus, benchmark, "text", "doc_id", k=3
        ).collect()
    }
    assert bloom == exact
    assert any(r[2] for r in bloom)          # doc 99 flagged
    assert sum(1 for r in bloom if r[2]) == 1


def test_unicode_normalize_corpus_combining_marks(spark):
    """NFC: combining-mark sequences collapse to precomposed forms so
    near-dup hashing sees them as identical; lowercasing applies after."""
    from n2khab_mhq_data_spark.llmdata.text import unicode_normalize_corpus

    decomposed = "Café"   # Cafe + COMBINING ACUTE
    precomposed = "café"        # café
    docs = spark.createDataFrame(
        [(1, decomposed), (2, precomposed), (3, "plain ascii")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in unicode_normalize_corpus(docs).collect()}
    assert rows[1].text_norm == precomposed
    assert rows[1].changed and rows[1].len_delta == -1
    assert rows[2].text_norm == precomposed and not rows[2].changed
    assert rows[3].text_norm == "plain ascii" and not rows[3].changed


def test_sliding_chunks_windows_and_overlap(spark):
    from n2khab_mhq_data_spark.llmdata.text import sliding_chunks

    docs = spark.createDataFrame(
        [(1, "s1. s2. s3. s4. s5. s6. s7"), (2, "only")],
        "doc_id long, text string",
    )
    rows = sorted(
        tuple(r)
        for r in sliding_chunks(docs, size=3, stride=2).collect()
    )
    assert rows == [
        (1, 0, "s1. s2. s3", 3),
        (1, 1, "s3. s4. s5", 3),
        (1, 2, "s5. s6. s7", 3),
        (1, 3, "s7", 1),
        (2, 0, "only", 1),
    ]


def test_remove_duplicated_runs_hand_computed(spark):
    """Two docs share an 8-token run; the run region disappears from
    BOTH (remove-everywhere policy), unique docs pass through, and the
    before/after counts report the removal rate."""
    from n2khab_mhq_data_spark.llmdata.dedup import remove_duplicated_runs

    shared = " ".join(f"d{i}" for i in range(8))      # 8 shared tokens
    docs = spark.createDataFrame(
        [
            (1, f"a1 a2 {shared} a3"),
            (2, f"b1 {shared} b2 b3 b4"),
            (3, "unique tokens only here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.text_clean, r.n_tokens, r.n_tokens_clean, r.n_runs)
        for r in remove_duplicated_runs(docs, span=8).collect()
    }
    assert got[1] == ("a1 a2 a3", 11, 3, 1)
    assert got[2] == ("b1 b2 b3 b4", 12, 4, 1)
    assert got[3] == ("unique tokens only here", 4, 4, 0)


def test_mmr_rerank_prefers_diverse_over_duplicate(spark):
    from n2khab_mhq_data_spark.llmdata.similarity import mmr_rerank

    # d1 == d2 (exact duplicates, rel = 1); d3 diverse with rel = 0.8.
    # Pure relevance ranks (d1, d2, d3); MMR at lam=0.3/mu=0.7 demotes
    # the duplicate: picks (d1, d3, d2) with hand-computed scores.
    rows = [
        (100, [1.0, 0.0]),  # query
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [0.8, 0.6]),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    )
    from pyspark.sql import functions as F

    got = [
        (r.doc, r.mmr_rank, r.mmr)
        for r in mmr_rerank(
            emb.filter(F.col("vec_id") < 100),
            emb.filter(F.col("vec_id") == 100),
            k=3, n_cand=3, lam=0.3, mu=0.7, dim=2,
        ).orderBy("mmr_rank").collect()
    ]
    # step1: lam*rel ties d1/d2 at 0.3 -> doc-asc tie-break picks d1
    # step2: d2 = 0.3 - 0.7*1 = -0.4 ; d3 = 0.24 - 0.7*0.8 = -0.32 -> d3
    # step3: d2 = -0.4
    assert got == [(1, 1, 0.3), (3, 2, -0.32), (2, 3, -0.4)]


def test_char_entropy_hand_computed(spark):
    import math

    from pyspark.sql import functions as F

    from n2khab_mhq_data_spark.llmdata.text import char_entropy

    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "abab"), (3, "abcd"), (4, "")],
        "doc_id long, text string",
    )
    m = char_entropy(F.col("text"))
    rows = df.select(
        "doc_id",
        m["n_chars"].alias("n"),
        m["n_distinct_chars"].alias("d"),
        m["entropy_bits"].alias("h"),
    ).collect()
    got = {r.doc_id: (r.n, r.d, r.h) for r in rows}
    assert got[1] == (4, 1, 0.0)            # constant string: H = 0
    assert got[2][0:2] == (4, 2)
    assert abs(got[2][2] - 1.0) < 1e-12     # uniform over 2 symbols: 1 bit
    assert abs(got[3][2] - 2.0) < 1e-12     # uniform over 4 symbols: 2 bits
    assert got[4] == (0, 0, 0.0)            # empty text: fold over []


def test_embedding_outlier_audit_flags_planted_corruption(spark):
    from pyspark.sql import functions as F

    from n2khab_mhq_data_spark.llmdata.similarity import norm

    # 50 unit-norm-ish vectors + one exploded and one zeroed vector
    rows = [(i, [1.0, 1.0]) for i in range(50)]
    rows += [(100, [1000.0, 0.0]), (101, [0.0, 0.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v = emb.select(norm("embedding", 2).alias("nrm"))
    med = v.agg(F.expr("percentile(nrm, 0.5)").alias("med"))
    d = v.join(F.broadcast(med)).select(
        "nrm", F.abs(F.col("nrm") - F.col("med")).alias("adev"), "med"
    )
    mad = d.agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    r = (
        d.join(F.broadcast(mad))
        .agg(
            F.sum(
                F.when(0.6745 * F.col("adev") > 3.5 * F.col("mad"), 1)
                .otherwise(0)
            ).alias("n_out")
        )
        .collect()[0]
    )
    # MAD = 0 (majority identical): the division-free form flags exactly
    # the two planted corruptions and cannot divide by zero
    assert r.n_out == 2


def test_hll_sketch_accuracy_and_register_audit(spark, sf_dir):
    """The md5-register HLL must land inside a generous multiple of its
    theoretical standard error (1.04/sqrt(512) ~ 4.6%) on every group,
    and the zero-register count must be consistent with an estimate on
    the linear-counting branch at this cardinality (~130 per group)."""
    import __spark_entry__ as entrymod

    rows = entrymod.queries()["sketch_hll_distinct"](spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        rel = abs(r["hll_estimate"] / r["true_distinct"] - 1)
        assert rel < 0.15, (r["priority"], r["hll_estimate"], rel)
        # n ~ 130 << 2.5 * m: the small-range correction must be active,
        # which requires surviving zero registers
        assert r["registers_zero"] > 0


def test_hll_merge_rollup_equals_direct_quarter_sketch(spark, sf_dir):
    """Merge soundness: max-merging month registers into quarters must
    give the IDENTICAL estimate to sketching directly at quarter grain
    (register max is associative), and stay within the error band."""
    import pyspark.sql.functions as F

    import __spark_entry__ as entrymod
    from n2khab_mhq_data_spark.catalog import load
    from n2khab_mhq_data_spark.plans.llm import (
        _HLL_EST,
        _hll_registers,
        _hll_totals,
    )

    merged = {
        r["quarter"]: r
        for r in entrymod.queries()["sketch_hll_merge_rollup"](
            spark, sf_dir
        ).collect()
    }
    o = load(spark, sf_dir, "orders").select(
        F.expr(
            "concat(substr(date_format(o_orderdate, 'yyyy-MM'), 1, 4), '-Q',"
            " cast((cast(substr(date_format(o_orderdate, 'yyyy-MM'), 6, 2)"
            " as int) + 2) div 3 as string))"
        ).alias("g"),
        "o_custkey",
    )
    direct = {
        r["g"]: r["est"]
        for r in _hll_totals(_hll_registers(o, "o_custkey"))
        .select("g", F.expr(_HLL_EST).alias("est"))
        .collect()
    }
    assert set(direct) == set(merged) and len(merged) > 4
    for q, row in merged.items():
        assert direct[q] == row["hll_estimate"], q
        assert abs(row["hll_estimate"] / row["true_distinct"] - 1) < 0.25, q


def test_jl_distortion_concentrates_near_one(spark, sf_dir):
    """JL guarantee: the distortion ratios must center near 1 (mean
    within 3 sigma/sqrt(n) of 1 for k=16 -> sigma ~ sqrt(2/16)) and the
    sign matrix must be balanced enough to regenerate (md5-derived)."""
    import __spark_entry__ as entrymod
    from n2khab_mhq_data_spark.llmdata.similarity import jl_signs

    signs = jl_signs()
    assert len(signs) == 16 and all(len(r) == 64 for r in signs)
    total = sum(sum(r) for r in signs)
    assert abs(total) < 200  # balanced-ish Rademacher
    rows = entrymod.queries()["ann_jl_distortion"](spark, sf_dir).collect()
    assert len(rows) > 20
    ratios = [r["distortion"] for r in rows]
    mean = sum(ratios) / len(ratios)
    assert abs(mean - 1) < 3 * (2 / 16) ** 0.5 / len(ratios) ** 0.5 + 0.05
    assert all(r["d2_orig"] > 0 for r in rows)


def test_kmv_distinct_undershoot_is_exact_and_estimator_tracks(spark, sf_dir):
    """A group with fewer than k distinct keys degrades to the EXACT
    count; groups above k estimate within the order-statistics error
    envelope (k=64 -> sigma ~ 12.5%, assert a loose 3-sigma band on the
    deterministic test data)."""
    import datetime as dt

    import n2khab_mhq_data_spark.plans.llm as lmod
    from n2khab_mhq_data_spark.plans.llm import sketch_kmv_distinct

    # undershoot: 10 distinct custkeys in one priority
    rows = [
        (i, i % 10, "P", 1.0, dt.datetime(2024, 1, 1), "x")
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
    )
    lload = lmod.load
    lmod.load = lambda s, d, t: df
    try:
        out = sketch_kmv_distinct(spark, "unused").collect()
    finally:
        lmod.load = lload
    assert len(out) == 1
    assert out[0]["true_distinct"] == 10
    assert out[0]["kmv_estimate"] == 10.0

    # real data: every priority exceeds k -> estimator path
    got = {
        r["priority"]: r for r in sketch_kmv_distinct(spark, sf_dir).collect()
    }
    assert len(got) == 5
    for r in got.values():
        rel = abs(r["kmv_estimate"] - r["true_distinct"]) / r["true_distinct"]
        assert rel < 0.5, (r, rel)


def test_kmv_jaccard_bounds_and_truth(spark, sf_dir):
    from n2khab_mhq_data_spark.plans.llm import sketch_kmv_jaccard

    r = sketch_kmv_jaccard(spark, sf_dir).collect()[0]
    assert 0.0 <= r["kmv_jaccard"] <= 1.0
    assert r["kmv_matches"] <= r["k"]
    assert r["true_inter"] <= r["true_union"]
    # estimator should land within +-0.35 of truth at k=64 (3 sigma of
    # the hypergeometric match count on this deterministic data)
    assert abs(r["kmv_jaccard"] - r["true_jaccard"]) < 0.35


def test_overlap_fraction_hand_case(spark):
    """doc 97 is the benchmark (id % 97 == 0 and != 0... id 0 IS bench);
    corpus doc sharing 1 of 4 grams -> 0.25/partial, fully-contained doc
    -> 1.0/heavy."""
    import n2khab_mhq_data_spark.plans.llm as lmod
    from n2khab_mhq_data_spark.plans.llm import dedup_overlap_fraction

    docs = spark.createDataFrame(
        [
            (0, "a b c d", "en", "s", 7),        # benchmark (0 % 97 == 0)
            (1, "a b c x y z", "en", "s", 11),   # 1 of 4 grams hit
            (2, "a b c d", "en", "s", 7),        # 2 of 2 grams hit
            (3, "p q r s t", "en", "s", 9),      # 0 of 3 grams hit
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    lload = lmod.load
    lmod.load = lambda s, d, t: docs
    try:
        out = {
            r["doc_id"]: (
                r["n_grams"], r["n_contaminated"], r["overlap_frac"],
                r["tier"],
            )
            for r in dedup_overlap_fraction(spark, "unused").collect()
        }
    finally:
        lmod.load = lload
    assert out == {
        1: (4, 1, 0.25, "partial"),
        2: (2, 2, 1.0, "heavy"),
        3: (3, 0, 0.0, "clean"),
    }


def test_script_histogram_hand_case(spark):
    import n2khab_mhq_data_spark.plans.llm as lmod
    from n2khab_mhq_data_spark.plans.llm import text_script_histogram

    docs = spark.createDataFrame(
        [(1, "Ab1 é!", "xx", "s", 6)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    lload = lmod.load
    lmod.load = lambda s, d, t: docs
    try:
        r = text_script_histogram(spark, "unused").collect()[0]
    finally:
        lmod.load = lload
    assert (
        r["n_chars"], r["letters"], r["digits"], r["whitespace"],
        r["punct_other"], r["non_ascii"],
    ) == (6, 2, 1, 1, 1, 1)


def test_boilerplate_ratio_hand_case(spark):
    """A sentence repeated across >= 5 docs is boilerplate; unique
    sentences are not; ratio is per-doc."""
    import n2khab_mhq_data_spark.plans.llm as lmod
    from n2khab_mhq_data_spark.plans.llm import text_boilerplate_ratio

    banner = "accept all cookies"
    rows = [
        (i, f"{banner}. unique sentence {i}", "en", "s", 0)
        for i in range(5)
    ] + [(99, "totally original. also original", "en", "s", 0)]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    lload = lmod.load
    lmod.load = lambda s, d, t: docs
    try:
        out = {
            r["doc_id"]: (r["n_sentences"], r["n_boilerplate"])
            for r in text_boilerplate_ratio(spark, "unused").collect()
        }
    finally:
        lmod.load = lload
    for i in range(5):
        assert out[i] == (2, 1)
    assert out[99] == (2, 0)


def test_contrastive_triplets_contract(spark, sf_dir):
    """Every triplet: anchor<positive is a verified near-dup pair, the
    negative exists, differs from both, and shares NO pair with either."""
    from n2khab_mhq_data_spark.catalog import load
    from n2khab_mhq_data_spark.plans.llm import (
        _near_pairs,
        pipeline_contrastive_triplets,
    )

    pairs = {
        (r["d1"], r["d2"])
        for r in _near_pairs(spark, sf_dir).select("d1", "d2").collect()
    }
    ids = {
        r["doc_id"]
        for r in load(spark, sf_dir, "documents").select("doc_id").collect()
    }
    rows = pipeline_contrastive_triplets(spark, sf_dir).collect()
    assert rows, "no triplets emitted at sf0.001"
    for r in rows:
        a, p, n = r["anchor"], r["positive"], r["negative"]
        assert (a, p) in pairs
        assert n in ids and n != a and n != p
        assert (min(a, n), max(a, n)) not in pairs
        assert (min(p, n), max(p, n)) not in pairs


def test_quality_metrics_empty_text_no_ansi_abort(spark):
    """One empty doc must not DIVIDE_BY_ZERO the whole job under ANSI;
    empty docs get NULL punct_ratio. mean_token_len is the true mean of
    token lengths, not the one-space-separator estimate."""
    from pyspark.sql import functions as F

    from n2khab_mhq_data_spark.llmdata.text import quality_metrics

    df = spark.createDataFrame(
        [(1, ""), (2, " a "), (3, "a  b"), (4, "ab cd")],
        "doc_id long, text string",
    )
    m = quality_metrics(F.col("text"))
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            m["punct_ratio"].alias("pr"),
            m["mean_token_len"].alias("mtl"),
        ).collect()
    }
    assert rows[1]["pr"] is None
    assert rows[2]["mtl"] == 1.0
    assert rows[3]["mtl"] == 1.0
    assert rows[4]["mtl"] == 2.0


def test_bigram_lm_includes_unscorable_docs(spark):
    """Docs with < 2 tokens must appear with n_scored=0 and NULL mean —
    a plain explode dropped them, letting them bypass fluency gates."""
    from n2khab_mhq_data_spark.llmdata.text import bigram_lm_logprob

    df = spark.createDataFrame(
        [(1, "one"), (2, "two words here"), (3, "")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_scored"], r["mean_logprob"])
        for r in bigram_lm_logprob(df, "text", "doc_id").collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1] == (0, None)
    assert out[3] == (0, None)
    assert out[2][0] == 2 and out[2][1] is not None


def test_unicode_normalize_null_text_passthrough(spark):
    from n2khab_mhq_data_spark.llmdata.text import unicode_normalize_corpus

    df = spark.createDataFrame(
        [(1, None), (2, "Café")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (r["text_norm"], r["changed"])
        for r in unicode_normalize_corpus(df).collect()
    }
    assert out[1] == (None, None)
    assert out[2][0] is not None and out[2][1]


def test_cosine_topk_zero_vector_ranks_last(spark):
    """A zero embedding must score cosine 0 (safe_norm clamp), never
    NaN — NaN sorts greatest under desc and would make the zero vector
    the rank-1 neighbour of every query."""
    from pyspark.sql import functions as F

    from n2khab_mhq_data_spark.llmdata.similarity import cosine_topk

    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.5, 0.5]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cosine_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=3, dim=2
    ).collect()
    ranked = {r["rank"]: (r["neighbour_id"], r["cosine"]) for r in out}
    assert ranked[1][0] == 1
    assert ranked[3][0] == 2 and abs(ranked[3][1]) < 1e-9


def test_ivf_kmeans_centroids_offset_ids(spark):
    """orderBy+limit seeding: 1-based / offset ids must still train
    n_centroids real centroids (the bare `id < K` filter selected
    fewer, or zero and crashed the BLAS closure)."""
    from n2khab_mhq_data_spark.llmdata.similarity import (
        ivf_kmeans_centroids,
    )

    rows = [(1000 + i, [float(i), float(i % 3)]) for i in range(20)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_kmeans_centroids(emb, n_centroids=4, dim=2, iters=1)
    assert len(cents) == 4


def test_quality_filter_null_text_not_kept(spark):
    from n2khab_mhq_data_spark.llmdata.pipeline import quality_filter

    df = spark.createDataFrame(
        [(1, None), (2, "the a and of is " * 10)],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["keep"], r["reasons"])
        for r in quality_filter(df, "text", "doc_id").collect()
    }
    assert out[1][0] is False and "null_text" in out[1][1]
    assert out[2][0] is True


def test_split_hash_int32_ids_no_overflow(spark):
    """An IntegerType id must hash identically to its 64-bit widening —
    id*131071 overflows int32 at id >= 16384 (ANSI abort or silent
    negative wrap)."""
    from pyspark.sql import functions as F

    from n2khab_mhq_data_spark.llmdata.pipeline import split_hash

    df32 = spark.createDataFrame([(20000,)], "id int")
    df64 = spark.createDataFrame([(20000,)], "id long")
    p32 = df32.select(split_hash(F.col("id")).alias("p")).first()["p"]
    p64 = df64.select(split_hash(F.col("id")).alias("p")).first()["p"]
    assert p32 == p64


def test_exact_dedup_excludes_null_text(spark):
    """N missing-text docs must not collapse into one N-copy duplicate
    cluster under a NULL hash."""
    from n2khab_mhq_data_spark.llmdata.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "same"), (4, "same")],
        "doc_id long, text string",
    )
    rows = exact_dedup(df, "text", "doc_id").collect()
    assert len(rows) == 1
    assert rows[0]["canonical_id"] == 3 and rows[0]["n_copies"] == 2


def test_minhash_lsh_candidates_hot_bucket_route_exact(spark):
    """Hot-bucket routing contract: buckets above ``hot_bucket_cap``
    take the spillable self-join path instead of a collect_list buffer,
    and the candidate SET is identical either way. Planted: 6 docs with
    an identical signature (one hot bucket per band at cap=4) plus 3
    docs sharing only band 0 and a loner."""
    from n2khab_mhq_data_spark.llmdata.dedup import minhash_lsh_candidates

    rows = []
    for d in range(1, 7):          # hot cluster: all 4 hashes equal
        rows.append((d, 11, 22, 33, 44))
    for d in range(10, 13):        # band-0 cluster only (h0,h1 equal)
        rows.append((d, 7, 8, 100 + d, 200 + d))
    rows.append((99, 1, 2, 3, 4))  # loner
    sig = spark.createDataFrame(
        rows, "doc long, h0 long, h1 long, h2 long, h3 long"
    )
    expect = {(a, b) for a in range(1, 7) for b in range(a + 1, 7)}
    expect |= {(10, 11), (10, 12), (11, 12)}

    uncapped = {
        (r.d1, r.d2)
        for r in minhash_lsh_candidates(
            sig, num_hashes=4, bands=2, hot_bucket_cap=4096
        ).collect()
    }
    routed = {
        (r.d1, r.d2)
        for r in minhash_lsh_candidates(
            sig, num_hashes=4, bands=2, hot_bucket_cap=4
        ).collect()
    }
    assert uncapped == expect
    assert routed == expect


def test_simhash_pairs_banding_pigeonhole(spark):
    """16-bit demo banding math, pinned after the registered query moved
    to production 56-bit parameters: with 2 bands of 8 bits, a hamming-1
    pair ALWAYS collides on some band (pigeonhole), a pair differing in
    both bands is missed even under the hamming cap, and same-signature
    docs expand to all their pairs at hamming 0."""
    from n2khab_mhq_data_spark.llmdata.dedup import simhash_pairs

    rows = [
        (1, 0x1234),
        (2, 0x1234),          # same signature as 1 -> hamming 0
        (3, 0x1236),          # hamming 1 vs 1/2 (low band differs)
        (4, 0x9234),          # hamming 1 vs 1/2 (high band differs)
        (5, 0x9236),          # hamming 2 vs 1/2, BOTH bands differ -> missed
        (6, 0x0F0F),          # far from everything
    ]
    sig = spark.createDataFrame(rows, "doc long, simhash long")
    got = {
        (r.d1, r.d2): r.hamming
        for r in simhash_pairs(sig, bits=16, bands=2, max_hamming=3).collect()
    }
    assert got[(1, 2)] == 0
    assert got[(1, 3)] == 1 and got[(2, 3)] == 1
    assert got[(1, 4)] == 1 and got[(2, 4)] == 1
    assert (1, 5) not in got and (2, 5) not in got  # banding miss, by design
    assert got[(3, 5)] == 1 and got[(4, 5)] == 1
    assert not any(6 in p for p in got)
