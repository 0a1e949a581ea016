"""Unit tests for the training-data pipeline ops (deterministic splits,
packing, quality gate) — edge cases the sf-data differential can't pin."""

from __future__ import annotations

from n2khab_mhq_data_spark.llmdata.pipeline import (
    hash_split,
    pack_sequences,
    quality_filter,
)


def test_hash_split_deterministic_and_total(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = hash_split(df, "doc_id").collect()
    assert len(out) == 1000
    by_split = {}
    for r in out:
        by_split.setdefault(r.split, set()).add(r.doc_id)
    # every row assigned exactly one split; rerun is identical
    assert sum(len(v) for v in by_split.values()) == 1000
    again = {(r.doc_id, r.split) for r in hash_split(df, "doc_id").collect()}
    assert again == {(r.doc_id, r.split) for r in out}
    # rough proportions (hash is uniform-ish, not exact)
    assert len(by_split["train"]) > 700
    assert len(by_split["val"]) > 40
    assert len(by_split["test"]) > 40


def test_pack_sequences_bins_are_contiguous(spark):
    # 6 docs of 10 tokens each, budget 25 -> bins hold ceil(25/10)=3,3
    # docs under quantized binning (cum_before 0,10,20 -> bin 0; 30,40,50
    # -> bin 1); shards pack independently
    rows = [(i, "t " * 10, "a") for i in range(3)] + [
        (i, "t " * 10, "b") for i in range(3, 6)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {
        (r.shard, r.bin): (r.n_docs, r.token_sum, r.first_doc, r.last_doc)
        for r in pack_sequences(df, "doc_id", "text", "src", budget=25).collect()
    }
    assert out[("a", 0)] == (3, 30, 0, 2)
    assert out[("b", 0)] == (3, 30, 3, 5)

    # one oversized doc still lands in exactly one bin and shifts the rest
    rows = [(0, "t " * 60, "a"), (1, "t " * 10, "a")]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    out = {
        (r.shard, r.bin): (r.n_docs, r.token_sum)
        for r in pack_sequences(df, "doc_id", "text", "src", budget=25).collect()
    }
    assert out[("a", 0)] == (1, 60)
    assert out[("a", 2)] == (1, 10)  # cum_before 60 -> bin 2


def test_quality_filter_reason_codes(spark):
    rows = [
        (1, "the " * 50),                    # healthy: keep
        (2, "word"),                         # too_short + low_stopword
        (3, "the quick!!! ....;;;, " * 10),  # puncty (stopwords present)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: (r.keep, r.reasons) for r in
           quality_filter(df, "text", "doc_id").collect()}
    assert out[1] == (True, "")
    assert out[2][0] is False
    assert "too_short" in out[2][1] and "low_stopword" in out[2][1]
    assert out[3] == (False, "puncty")


def test_budget_waterfill_hand_computed(spark):
    from pyspark.sql import functions as F

    from n2khab_mhq_data_spark.llmdata.pipeline import budget_waterfill

    per = spark.createDataFrame(
        [("a", 1), ("b", 10), ("c", 10)], "source string, n_tokens long"
    )
    out = {
        r.source: (r.allocation, r.keep_rate)
        for r in budget_waterfill(
            per, F.lit(15.0), "source", "n_tokens"
        ).collect()
    }
    # level = (15 - 1) / 2 = 7: 'a' keeps all, b/c capped at 7
    assert out["a"] == (1.0, 1.0)
    assert out["b"] == (7.0, 0.7)
    assert out["c"] == (7.0, 0.7)


def test_budget_waterfill_budget_exceeds_total(spark):
    from pyspark.sql import functions as F

    from n2khab_mhq_data_spark.llmdata.pipeline import budget_waterfill

    per = spark.createDataFrame(
        [("a", 4), ("b", 6)], "source string, n_tokens long"
    )
    out = {
        r.source: r.allocation
        for r in budget_waterfill(
            per, F.lit(100.0), "source", "n_tokens"
        ).collect()
    }
    # budget above total: every group keeps everything
    assert out == {"a": 4.0, "b": 6.0}


def test_temporal_split_embargo_excluded(spark):
    from n2khab_mhq_data_spark.llmdata.pipeline import temporal_split

    df = spark.createDataFrame(
        [(1, "2024-01-10 00:00:00"), (2, "2024-01-15 00:00:00"),
         (3, "2024-01-18 12:00:00"), (4, "2024-01-22 00:00:00"),
         (5, "2024-01-25 00:00:00")],
        "id long, ts_s string",
    ).selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts")
    got = {
        r.id: r.split
        for r in temporal_split(
            df, "ts", "2024-01-15 00:00:00", embargo="7 days"
        ).collect()
    }
    assert got == {1: "train", 2: None, 3: None, 4: "test", 5: "test"}


def test_bm25_topk_hand_computed(spark):
    import math

    from n2khab_mhq_data_spark.llmdata.pipeline import bm25_topk

    docs = spark.createDataFrame(
        [(1, "cat cat cat dog"), (2, "cat dog"),
         (3, "dog dog dog dog"), (4, "bird")],
        "doc_id long, text string",
    )
    # repeated query term must be deduped (scores once)
    q = spark.createDataFrame(
        [("q", "cat"), ("q", "cat")], "query_id string, term string"
    )
    rows = bm25_topk(docs, q, "text", "doc_id", k=5).collect()
    got = {r.doc: (r.rank, r.n_terms_hit, r.bm25) for r in rows}
    # only docs containing 'cat' retrieved; higher tf wins despite longer doc
    assert set(got) == {1, 2}
    assert got[1][0] == 1 and got[2][0] == 2
    assert got[1][1] == 1 and got[2][1] == 1

    # pin the exact formula: N=4, df(cat)=2, avgdl=(4+2+4+1)/4
    idf = math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5))
    avgdl = 11 / 4

    def score(tf, dl):
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))

    assert abs(got[1][2] - round(score(3, 4) + 1e-9, 6)) < 1e-9
    assert abs(got[2][2] - round(score(1, 2) + 1e-9, 6)) < 1e-9


def test_rrf_fuse_hand_computed(spark):
    from n2khab_mhq_data_spark.llmdata.pipeline import rrf_fuse

    lex = spark.createDataFrame(
        [("q", 10, 1), ("q", 20, 2)], "query_id string, doc long, rank int"
    )
    den = spark.createDataFrame(
        [("q", 20, 1), ("q", 30, 2)], "query_id string, doc long, rank int"
    )
    rows = rrf_fuse({"lex": lex, "dense": den}, k=3, c=60).collect()
    got = {r.doc: (r.rrf_rank, r.n_legs, r.best_rank, r.rrf) for r in rows}
    # doc 20: both legs (1/62 + 1/61) wins; 10 and 30 tie on score
    # (1/61 vs 1/62) -> 10 ranks above 30 by score, not by id
    assert got[20] == (1, 2, 1, round(1 / 62 + 1 / 61 + 1e-9, 6))
    assert got[10] == (2, 1, 1, round(1 / 61 + 1e-9, 6))
    assert got[30] == (3, 1, 2, round(1 / 62 + 1e-9, 6))


def test_retrieval_metrics_hand_computed(spark):
    import math

    from n2khab_mhq_data_spark.llmdata.pipeline import retrieval_metrics

    # run for one query: ranks 1..3 = docs 7, 8, 9
    run = spark.createDataFrame(
        [("q", 7, 1), ("q", 8, 2), ("q", 9, 3)],
        "query_id string, doc long, rank int",
    )
    # judgments: 8 (grade 2), 9 (grade 1), 99 (grade 1, never retrieved)
    qrels = spark.createDataFrame(
        [("q", 8, 2), ("q", 9, 1), ("q", 99, 1)],
        "query_id string, doc long, rel int",
    )
    r = retrieval_metrics(run, qrels, k=10).collect()[0]
    dcg = 3.0 / math.log2(3.0) + 1.0 / math.log2(4.0)
    idcg = 3.0 / math.log2(2.0) + 1.0 / math.log2(3.0) + 1.0 / math.log2(4.0)
    assert (r.query_id, r.n_hits, r.n_rel) == ("q", 2, 3)
    assert r.mrr == round(1.0 / 2.0 + 1e-9, 6)
    assert r.ndcg == round(dcg / idcg + 1e-9, 6)
    assert r.recall == round(2.0 / 3.0 + 1e-9, 6)


def test_retrieval_metrics_zero_hit_query(spark):
    from n2khab_mhq_data_spark.llmdata.pipeline import retrieval_metrics

    run = spark.createDataFrame(
        [("q", 7, 1)], "query_id string, doc long, rank int"
    )
    qrels = spark.createDataFrame(
        [("q2", 8, 1)], "query_id string, doc long, rel int"
    )
    r = retrieval_metrics(run, qrels, k=10).collect()
    # every judged query gets a row, zero metrics when nothing relevant
    assert len(r) == 1
    assert (r[0].query_id, r[0].n_hits, r[0].mrr, r[0].ndcg, r[0].recall) == (
        "q2", 0, 0.0, 0.0, 0.0,
    )


def test_weighted_sample_rejects_nonpositive_weights(spark):
    """Efraimidis-Spirakis requires w > 0: a negative weight makes
    u^(1/w) > 1 and the worst rows would fill the sample; zero NULLs the
    key and drops the row — both must raise."""
    import pytest

    from n2khab_mhq_data_spark.llmdata.pipeline import weighted_hash_sample

    df = spark.createDataFrame(
        [(1, 2.0), (2, -1.0)], "doc_id long, w double"
    )
    with pytest.raises(Exception, match="must be > 0"):
        weighted_hash_sample(df, "doc_id", "w", k=2).collect()


def test_hash_split_rejects_null_id(spark):
    import pytest

    from n2khab_mhq_data_spark.llmdata.pipeline import hash_split

    df = spark.createDataFrame([(1,), (None,)], "doc_id long")
    with pytest.raises(Exception, match="NULL id"):
        hash_split(df, "doc_id").collect()
