"""Streaming incremental-append path — the Structured Streaming wrapper
around kernel K10 (SURVEY.md §2.11).

The reference's closest-to-streaming semantic is the seasonal append of new
fieldwork into published tables (query_fieldmap_update_fieldwork2022.Rmd:
943-1076). Here that becomes: file/rate source -> foreachBatch -> the SAME
``incremental_merge`` used by the batch path -> deterministic rewrite. One
code path for merge semantics, two drivers (batch rerun / stream).

Watermarked windowed aggregation over the events table is included as the
standard late-data pattern, though the reference itself never needs it."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from n2khab_mhq_data_spark.operators.merge import incremental_merge


def merge_stream(
    spark: SparkSession,
    source: DataFrame,
    state_path: str,
    keys: list[str],
    order_cols: list[str],
    checkpoint: str,
) -> StreamingQuery:
    """readStream -> foreachBatch(incremental_merge) -> parquet state.

    Each micro-batch merges into the published parquet state with
    latest-wins semantics on ``keys`` ordered by ``order_cols`` desc.
    Exactly-once via the checkpoint + overwrite of the state directory.
    """

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        try:
            published = s.read.parquet(state_path)
        except Exception:
            published = batch.limit(0)
        merged = incremental_merge(
            published,
            batch,
            keys,
            [F.col(c).desc() for c in order_cols],
        )
        # localCheckpoint cuts the lineage; the overwrite below reads the
        # state path it is about to replace
        merged.localCheckpoint().write.mode("overwrite").parquet(state_path)

    return (
        source.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (late data dropped after the
    watermark): the canonical streaming agg shape; works identically on a
    batch DataFrame for testing."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value") + F.lit(1e-9), 2).alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )
