"""Structured Streaming incremental-merge test: file source -> foreachBatch
merge -> parquet state, two deltas applied in sequence."""

from __future__ import annotations

from pyspark.sql import functions as F

from n2khab_mhq_data_spark.streaming.incremental import merge_stream


def test_merge_stream_two_batches(spark, tmp_path):
    src = tmp_path / "in"
    state = tmp_path / "state"
    ckpt = tmp_path / "ckpt"
    src.mkdir()

    schema = "user_id long, event_type string, ts long, value double"

    # batch 1
    spark.createDataFrame(
        [(1, "click", 10, 1.0), (2, "view", 11, 2.0)], schema
    ).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = merge_stream(
        spark, stream, str(state), ["user_id", "event_type"], ["ts"], str(ckpt)
    )
    q.awaitTermination(120)

    s1 = {tuple(r) for r in spark.read.parquet(str(state)).collect()}
    assert s1 == {(1, "click", 10, 1.0), (2, "view", 11, 2.0)}

    # batch 2: update one key (newer ts), add one key, stale row ignored
    spark.createDataFrame(
        [(1, "click", 20, 9.0), (1, "click", 5, 0.5), (3, "click", 7, 3.0)],
        schema,
    ).write.mode("append").parquet(str(src))
    stream2 = spark.readStream.schema(schema).parquet(str(src))
    q2 = merge_stream(
        spark, stream2, str(state), ["user_id", "event_type"], ["ts"], str(ckpt)
    )
    q2.awaitTermination(120)

    s2 = {tuple(r) for r in spark.read.parquet(str(state)).collect()}
    assert s2 == {
        (1, "click", 20, 9.0),
        (2, "view", 11, 2.0),
        (3, "click", 7, 3.0),
    }
