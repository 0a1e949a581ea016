"""Streaming trending top-k: continuously materialized per-window
leaderboard.

Ranking is not a streaming-native operator (no windowed row_number in
update mode), so the standard shape is: watermarked windowed COUNTS in
the engine's state store -> foreachBatch merges each batch's updated
(window, key) counts into a published count state (latest-wins — update-
mode emissions are cumulative per key, so the newest value is the max
and replays converge) -> re-rank ONLY the windows touched by the batch
-> publish the leaderboard via the shared atomic-swap protocol.

Scale: the engine handles the unbounded count state (watermark-bounded
RocksDB); the foreachBatch legs touch only changed windows (semi-join),
and the rank window partitions by window_start — per-batch work is
proportional to the batch's windows, not history."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.window import Window as W

from n2khab_mhq_data_spark.operators.merge import incremental_merge
from n2khab_mhq_data_spark.streaming.incremental import (
    publish_state,
    read_state,
)


def trending_topk(counts: DataFrame, k: int) -> DataFrame:
    """Rank (window_start, event_type, n) counts into a per-window
    top-k leaderboard — shared by the batch oracle and the stream."""
    w = W.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "window_start", F.col("rank").cast("int").alias("rank"),
            "event_type", "n",
        )
    )


def trending_topk_stream(
    spark: SparkSession,
    source: DataFrame,
    counts_path: str,
    topk_path: str,
    checkpoint: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 3,
) -> StreamingQuery:
    agg = (
        source.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "n"
        )
    )

    def rerank(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        prev = read_state(s, counts_path)
        merged = (
            batch if prev is None
            else incremental_merge(
                prev, batch, ["window_start", "event_type"],
                [F.col("n").desc()],
            )
        )
        publish_state(s, counts_path, merged)
        counts = s.read.parquet(counts_path)
        touched = batch.select("window_start").distinct()
        fresh = trending_topk(
            counts.join(F.broadcast(touched), "window_start", "semi"), k
        )
        prev_topk = read_state(s, topk_path)
        if prev_topk is not None:
            fresh = prev_topk.join(
                F.broadcast(touched), "window_start", "anti"
            ).unionByName(fresh)
        publish_state(s, topk_path, fresh)

    return (
        agg.writeStream.foreachBatch(rerank)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
