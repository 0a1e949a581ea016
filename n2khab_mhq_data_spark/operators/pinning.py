"""Input-version pinning — the reference's recorded-hash audit as library
operators (SURVEY.md §5 audit family, alongside ``assert_grain``).

The reference pins its habitat-map input by comparing the file's md5 with a
hash recorded next to the version name
(check_observed_habitat_type.Rmd:106-113: ``tibble(version_name=...,
md5_zenodo=..., md5_file=md5sum(...))`` rendered as a review table). Two
levels here:

- :func:`pin_file_version` — the literal analog: streamed md5 of an input
  FILE vs the recorded hash, returned as a one-row review DataFrame;
  :func:`assert_input_version` promotes it to a fail-fast gate.
- :func:`dataset_fingerprint` — the engine-native analog for parquet
  DATASETS, where a single md5 is meaningless (a dataset is many files and
  row order is not semantic): an order-insensitive 64-bit fold
  (``bit_xor``) of a portable per-row hash (leading 60 bits of
  ``md5(concat_ws(...))``). Fully distributed — partial xors combine
  map-side, one scalar reaches the driver — and reproducible on any
  engine with md5 + hex parsing, so recorded fingerprints outlive the
  engine that wrote them.

Caveat (documented, inherent to xor folds): rows identical across ALL
hashed columns cancel pairwise, so include a unique key column in
``cols`` when the dataset grain allows exact duplicates.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class InputVersionMismatch(AssertionError):
    pass


def file_md5(path: str, chunk_bytes: int = 1 << 23) -> str:
    """Streamed md5 of a local/shared-storage file (tools::md5sum parity).
    Driver-side by design: md5 is sequential, and the reference pins
    dimension-sized artifacts (a .gpkg layer), not big data."""
    h = hashlib.md5()
    with open(path, "rb") as fh:
        while True:
            b = fh.read(chunk_bytes)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def pin_file_version(
    spark: SparkSession, path: str, expected_md5: str, version_name: str
) -> DataFrame:
    """The reference's review-table shape: one row with the recorded and
    actual hashes plus a match flag."""
    actual = file_md5(path)
    return spark.createDataFrame(
        [(version_name, expected_md5, actual, actual == expected_md5)],
        "version_name string, md5_expected string, md5_file string,"
        " match boolean",
    )


def assert_input_version(
    spark: SparkSession, path: str, expected_md5: str, version_name: str
) -> None:
    """Fail-fast gate on a pinned input file (the strict sibling of the
    reference's rendered check)."""
    actual = file_md5(path)
    if actual != expected_md5:
        raise InputVersionMismatch(
            f"{version_name}: {path} has md5 {actual}, pinned {expected_md5}"
        )


def row_hash(*cols: Column | str) -> Column:
    """Portable 60-bit row hash: leading 15 hex digits of
    md5(concat_ws('\\x1f', cols)) parsed base-16, with NULLs encoded as
    the explicit sentinel ``'\\x00NULL'`` per column — concat_ws alone
    silently DROPS null columns, which would both diverge from a
    ``||``-style SQL recomputation (NULL-propagating) and make
    ('a', NULL, 'b') hash like ('a', 'b', NULL). The same expression is
    writable in ANSI-ish SQL on any engine (DuckDB:
    ``CAST(('0x' || substr(md5(coalesce(CAST(x AS VARCHAR),
    chr(0) || 'NULL') || chr(31) || ...), 1, 15)) AS BIGINT)``), which
    is the point — a recorded fingerprint must be re-computable
    anywhere. Caveats (both accepted for cross-engine re-computability):
    a real string equal to the sentinel collides with NULL, and a data
    value CONTAINING the ``\\x1f`` separator makes the flattened text
    ambiguous across column boundaries (('x\\x1fy', 'z') hashes like
    ('x', 'y\\x1fz')) — callers fingerprinting untrusted text columns
    that may carry control characters should hash such columns
    separately and combine."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    joined = F.concat_ws(
        "\x1f",
        *[F.coalesce(c.cast("string"), F.lit("\x00NULL")) for c in cs],
    )
    return F.conv(F.substring(F.md5(joined), 1, 15), 16, 10).cast("long")


def dataset_fingerprint(
    df: DataFrame, cols: list[str] | None = None, group_by: list[str] | None = None
) -> DataFrame:
    """Order-insensitive content fingerprint: bit_xor of the portable row
    hash over ``cols`` (default: all columns), optionally per ``group_by``
    partition (e.g. per source shard). One aggregation — partials combine
    map-side, no sort, no collect."""
    hash_cols = cols or [c for c in df.columns if c not in (group_by or [])]
    h = row_hash(*hash_cols).alias("__h")
    keys = group_by or []
    agg = [
        F.expr("bit_xor(__h)").alias("fingerprint"),
        F.count("*").alias("n_rows"),
    ]
    return df.select(*keys, h).groupBy(*keys).agg(*agg)


def pin_dataset_version(
    df: DataFrame,
    recorded: DataFrame,
    group_by: list[str],
    cols: list[str] | None = None,
) -> DataFrame:
    """Join the computed per-group fingerprints against a recorded
    manifest (columns: ``group_by`` + ``fingerprint_expected``) and flag
    matches — the dataset-scale review table.

    Fails CLOSED on both one-sided cases: a pinned group with NO data
    rows (the manifest entry survives the FULL OUTER join with
    fingerprint null, match false — exactly the vanished-input drift the
    audit exists to catch) and an unpinned group in the data (expected
    null, match false). The manifest is dimension-sized; full-outer
    cannot broadcast, but the join's fingerprint side is already
    aggregated to group grain so the shuffle is tiny."""
    fp = dataset_fingerprint(df, cols=cols, group_by=group_by)
    missing = (
        F.col("fingerprint").isNull()
        | F.col("fingerprint_expected").isNull()
    )
    return fp.join(recorded, group_by, "full_outer").select(
        *group_by,
        "fingerprint",
        "fingerprint_expected",
        F.when(missing, F.lit(False))
        .otherwise(F.col("fingerprint") == F.col("fingerprint_expected"))
        .alias("match"),
        F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
    )
