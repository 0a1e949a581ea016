"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The decode step is STUBBED (no imaging/audio libraries in this container):
``decode_image`` raises NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder derives metadata from the raw bytes. The
Spark-side plumbing — schema, batch iteration, partition sizing — is real
and tested; swapping in PIL/ffmpeg later only changes the inner function.

Scale notes: binary payloads dominate partition size — size
``spark.sql.files.maxPartitionBytes`` for the payload, not the row count,
and never collect_list binary columns. Feature extraction is one
mapInPandas pass: no shuffle, output is narrow metadata."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_META_SCHEMA = (
    "doc_id long, n_bytes long, format string, n_frames int, first_byte int"
)


def decode_image(raw: bytes, fake: bool = False) -> dict:
    """Decode an image payload. STUB: real decoding needs an imaging
    library not present in this environment."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an imaging library (not in container); "
            "pass fake=True for the deterministic test decoder"
        )
    return {
        "format": "fake/raw",
        "n_frames": len(raw) % 7 + 1,
        "first_byte": raw[0] if raw else -1,
    }


def extract_frame_meta(binary_df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload binary):
    Arrow-batched, one pass, narrow output."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_image(b, fake=fake) for b in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(b) for b in pdf["payload"]],
                    "format": [m["format"] for m in metas],
                    "n_frames": [m["n_frames"] for m in metas],
                    "first_byte": [m["first_byte"] for m in metas],
                }
            )

    return binary_df.mapInPandas(op, FRAME_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = "doc_id long, frame_idx int, frame_byte int"


def sample_frames(
    binary_df: DataFrame, stride: int = 2, fake: bool = True
) -> DataFrame:
    """Frame sampling over opaque video-ish payloads: every ``stride``-th
    frame of each payload becomes one output row (doc_id, frame_idx,
    frame_byte). A generator-shaped mapInPandas pass — input rows fan out to
    0..n_frames rows, still one scan, no shuffle; the frame decode is the
    same stubbed fake decoder as extract_frame_meta."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_byte": []}
            for doc_id, raw in zip(pdf["doc_id"], pdf["payload"]):
                meta = decode_image(raw, fake=fake)
                for idx in range(0, meta["n_frames"], stride):
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(idx)
                    rows["frame_byte"].append(
                        raw[(idx * 13) % len(raw)] if raw else -1
                    )
            yield pd.DataFrame(rows)

    return binary_df.mapInPandas(op, FRAME_SAMPLE_SCHEMA)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adapter for the testbed: treat the document text's UTF-8 bytes as an
    opaque binary payload (the real pipeline reads binary parquet/files)."""
    return df.select(
        "doc_id", F.encode(F.col(text_col), "UTF-8").alias("payload")
    )
