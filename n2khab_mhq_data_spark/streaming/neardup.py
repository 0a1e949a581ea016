"""Streaming near-duplicate ingest gate (MinHash signature store).

The batch dedup tiers (llmdata/dedup.py) answer "which docs in THIS
corpus are near-dups"; an ingest pipeline needs the online question:
"is this NEW doc a near-dup of anything we already accepted?" — asked
continuously, without re-signaturing the accepted corpus per batch.

Shape per micro-batch (foreachBatch):

1. signature the batch once (shingles -> 64 min-agg minhash + the gram
   set for verification — the same combined aggregation as
   ``minhash_dedup_pairs``);
2. banded-LSH candidate join of batch signatures against the
   ACCUMULATED signature store (plus within-batch pairs), exact-Jaccard
   verification on candidates only;
3. emit a verdict row per batch doc (``is_dup``, ``dup_of`` = smallest
   matched accepted/earlier doc);
4. extend the store with the batch's CANONICAL docs only (dups are
   gated out), via the atomic-rename swap shared with merge_stream.

Scale: the store is signatures + gram sets, not raw text; the batch
side is small, so the band join broadcasts it; store signatures are
never recomputed. State grows with the accepted corpus — at 100 TB
partition the store by band prefix so the candidate join prunes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from n2khab_mhq_data_spark.llmdata.dedup import (
    minhash_lsh_candidates,
    shingle_table,
)
from n2khab_mhq_data_spark.streaming.incremental import (
    publish_state,
    read_state,
)


def _signatures(
    df: DataFrame, text_col: str, id_col: str, k: int, num_hashes: int
) -> DataFrame:
    sh = shingle_table(df, text_col, id_col, k)
    sig_aggs = [
        F.expr(f"min(xxhash64(gram, {j})) AS h{j}")
        for j in range(num_hashes)
    ]
    return sh.groupBy("doc").agg(
        F.collect_set("gram").alias("grams"), *sig_aggs
    )


def neardup_gate_stream(
    spark: SparkSession,
    source: DataFrame,
    sig_path: str,
    verdict_path: str,
    text_col: str,
    id_col: str,
    checkpoint: str,
    k: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 32,
) -> StreamingQuery:
    """readStream -> foreachBatch near-dup gate against a persistent
    MinHash signature store. Verdicts append to ``verdict_path``;
    canonical (non-dup) signatures extend ``sig_path``.

    Contract: doc ids are monotonically increasing across batches (the
    usual ingest sequence) — "dup of" always points at the SMALLER id,
    so an accepted doc is never retroactively demoted by a later
    arrival."""

    def gate(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        bsig = _signatures(batch, text_col, id_col, k, num_hashes)
        store = read_state(s, sig_path)
        pool = bsig if store is None else store.unionByName(bsig)
        batch_ids = bsig.select(F.col("doc").alias("bid"))
        cand = minhash_lsh_candidates(pool, num_hashes, bands)
        g1 = pool.select(F.col("doc").alias("d1"), F.col("grams").alias("g1"))
        g2 = pool.select(F.col("doc").alias("d2"), F.col("grams").alias("g2"))
        inter = F.size(F.array_intersect("g1", "g2"))
        union = F.size("g1") + F.size("g2") - inter
        verified = (
            cand.join(g1, "d1")
            .join(g2, "d2")
            .filter(inter.cast("double") / union > threshold)
            .select("d1", "d2")
        )
        # a batch doc is a dup of any matched SMALLER doc id (store ids
        # precede batch ids in practice; within-batch ties resolve to the
        # smaller id, which stays canonical) — d1 < d2 by construction
        dup_edges = verified.join(
            batch_ids, verified["d2"] == batch_ids["bid"], "semi"
        )
        dup_of = dup_edges.groupBy(F.col("d2").alias("doc")).agg(
            F.min("d1").alias("dup_of")
        )
        verdicts = (
            bsig.select("doc")
            .join(dup_of, "doc", "left")
            .select(
                F.col("doc").alias(id_col),
                F.col("dup_of").isNotNull().alias("is_dup"),
                "dup_of",
            )
        )
        verdicts.write.mode("append").parquet(verdict_path)
        canon = bsig.join(
            dup_of.select(F.col("doc")), "doc", "anti"
        )
        publish_state(
            s, sig_path, canon if store is None
            else store.unionByName(canon)
        )

    return (
        source.writeStream.foreachBatch(gate)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
