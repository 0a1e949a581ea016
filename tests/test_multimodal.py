"""Multimodal plumbing contract tests: the decode stays a declared stub
(no imaging libs in the container), but the Spark-side contracts — Arrow
batching, generator fan-out, and BYTE-based partition sizing for binary
payloads — are real and pinned here."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from n2khab_mhq_data_spark.llmdata.multimodal import (
    decode_image,
    extract_frame_meta,
)


def test_decode_stub_fails_loud_without_fake():
    with pytest.raises(NotImplementedError, match="imaging library"):
        decode_image(b"\x89PNG....")


def test_payload_bytes_drive_partition_sizing(spark, tmp_path):
    """The scale contract from llmdata/multimodal.py's docstring: binary
    payloads dominate partition size, so spark.sql.files.maxPartitionBytes
    must split the scan by BYTES, not row count — 200 rows of ~64 KiB
    incompressible payload must fan out to many input partitions under a
    1 MiB cap and collapse to few under the default cap, with identical
    extraction output either way."""
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(200, dtype=np.int64),
            "payload": [rng.bytes(64 * 1024) for _ in range(200)],
        }
    )
    path = str(tmp_path / "payloads.parquet")
    spark.createDataFrame(pdf).write.parquet(path)

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
        small_cap = spark.read.parquet(path)
        n_small = small_cap.rdd.getNumPartitions()
        meta_small = sorted(
            (r.doc_id, r.n_bytes, r.n_frames)
            for r in extract_frame_meta(small_cap, fake=True).collect()
        )
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(512 << 20))
        big_cap = spark.read.parquet(path)
        n_big = big_cap.rdd.getNumPartitions()
        meta_big = sorted(
            (r.doc_id, r.n_bytes, r.n_frames)
            for r in extract_frame_meta(big_cap, fake=True).collect()
        )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)

    # ~12.8 MiB of payload: a 1 MiB cap must split it byte-wise
    assert n_small >= 8, (n_small, n_big)
    assert n_small > n_big
    assert meta_small == meta_big
    assert all(nb == 64 * 1024 for _, nb, _ in meta_small)
