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


# Gear table for content-defined chunking: a deterministic per-byte
# 64-bit mix (splitmix64 finalizer over the byte value), so chunk
# boundaries are reproducible across runs, engines, and languages.
def _gear(b: int) -> int:
    z = (b + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


CDC_SCHEMA = (
    "doc_id long, chunk_idx long, offset long, n_bytes long,"
    " chunk_md5 string"
)


def cdc_chunks(
    binary_df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    mask: int = 0x3F,
    min_len: int = 16,
    max_len: int = 512,
) -> DataFrame:
    """Content-defined chunking (Gear/FastCDC family, public literature):
    boundaries where a rolling per-byte hash masks to zero, clamped to
    [min_len, max_len]. Unlike fixed-size chunking (multimodal_chunk), an
    insertion early in a payload only perturbs chunks up to the next
    content boundary — the property that makes chunk-level dedup of
    binary blobs survive edits, which is why backup/dedup systems use it.

    Spark shape: ``mapInPandas`` over the binary column — per batch the
    rolling hash is 64 vectorized shift-adds (numpy), boundary-candidate
    selection is a masked nonzero, and only the sparse candidate list is
    walked in Python. Zero shuffle; chunk rows stream out of the scan
    partition-locally. Genuinely sequential semantics (the min/max clamp
    consumes boundaries in order), so there is no SQL oracle — the
    python-reference pytest is the check, and the registered query gets
    the driver's rows-only verdict.
    """
    import pandas as pd

    def op(batches):
        for pdf in batches:
            ids, idxs, offs, lens, digs = [], [], [], [], []
            for did, raw in zip(pdf[id_col], pdf[payload_col]):
                chunks = cdc_chunk_one(bytes(raw), mask, min_len, max_len)
                for i, (off, ln, dig) in enumerate(chunks):
                    ids.append(int(did))
                    idxs.append(i)
                    offs.append(off)
                    lens.append(ln)
                    digs.append(dig)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_idx": pd.Series(idxs, dtype="int64"),
                    "offset": pd.Series(offs, dtype="int64"),
                    "n_bytes": pd.Series(lens, dtype="int64"),
                    "chunk_md5": pd.Series(digs, dtype="object"),
                }
            )

    return binary_df.mapInPandas(op, CDC_SCHEMA)


_GEAR_TABLE = None


def cdc_chunk_one(
    raw: bytes, mask: int = 0x3F, min_len: int = 16, max_len: int = 512
) -> list[tuple[int, int, str]]:
    """Single-payload CDC kernel (module-level so the invariants are
    unit/property-testable without Spark): (offset, length, md5) chunk
    tuples per the FastCDC-style walk documented in :func:`cdc_chunks`."""
    import hashlib

    import numpy as np

    global _GEAR_TABLE
    if _GEAR_TABLE is None:
        _GEAR_TABLE = np.array(
            [_gear(b) for b in range(256)], dtype=np.uint64
        )
    G = _GEAR_TABLE
    n = len(raw)
    if n == 0:
        return []
    b = np.frombuffer(raw, dtype=np.uint8)
    g = G[b]
    h = np.zeros(n, dtype=np.uint64)
    for s in range(min(64, n)):
        # h_i += G[b_{i-s}] << s  (terms shifted past 64 bits vanish)
        h[s:] += g[: n - s] << np.uint64(s)
    cand = np.nonzero((h & np.uint64(mask)) == 0)[0]
    # FastCDC-style walk: from each chunk start, cut at the FIRST
    # boundary candidate in [start+min_len, start+max_len]; if none,
    # force a cut at start+max_len. Every cut is therefore >= min_len
    # from its start — no sub-min mid-chunk can ever be emitted (the
    # naive skip-short-then-split walk produced one whenever the next
    # candidate fell in (max_len, max_len+min_len)); only the final
    # chunk may undershoot.
    chunks: list[tuple[int, int]] = []
    start = 0
    ptr = 0
    while start < n:
        while ptr < len(cand) and int(cand[ptr]) + 1 < start + min_len:
            ptr += 1
        if (
            ptr < len(cand)
            and int(cand[ptr]) + 1 <= start + max_len
            and int(cand[ptr]) + 1 < n
        ):
            end = int(cand[ptr]) + 1
            ptr += 1
        elif n - start > max_len:
            end = start + max_len
        else:
            end = n
        chunks.append((start, end - start))
        start = end
    return [
        (off, ln, hashlib.md5(raw[off : off + ln]).hexdigest())
        for off, ln in chunks
    ]


