"""S8/S9 — the deterministic versioned sink (git2rdata ``write_vc`` parity).

The reference publishes every table as a *sorted* TSV plus a YAML sidecar
with per-column classes and content hashes (query_fieldmap.Rmd:1959-1974;
sidecars like processed/fieldmap_mhq/cover_species.yml). Reruns are
byte-identical, so git diffs show only real data changes — the de-facto
golden-file system (SURVEY.md §5).

Scale design (SURVEY.md §7.4.5): a global ``orderBy`` + single file is
inherently serial at the last step. We keep writes parallel by
range-partitioning on the sort keys (``repartitionByRange`` + per-partition
sort), writing N part files that are *globally* ordered by construction,
then concatenating sequentially on the driver — an O(bytes) streamed merge,
no re-sort. The content hash (md5 over the ordered TSV bytes) is identical
regardless of N."""

from __future__ import annotations

import hashlib
import os
from datetime import date

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPARK_TO_YML = {
    T.IntegerType(): "integer",
    T.LongType(): "integer",
    T.DoubleType(): "numeric",
    T.FloatType(): "numeric",
    T.StringType(): "character",
    T.BooleanType(): "logical",
    T.DateType(): "Date",
    T.TimestampType(): "timestamp",
}


def _fmt(col: str, dtype: T.DataType, digits: int) -> F.Column:
    c = F.col(col)
    if isinstance(dtype, T.DateType):
        # git2rdata stores Dates as integer days since 1970-01-01
        c = F.datediff(c, F.lit("1970-01-01").cast("date")).cast("string")
    elif isinstance(dtype, (T.DoubleType, T.FloatType)):
        c = F.round(c + F.signum(c) * 1e-9, digits).cast("string")
    elif isinstance(dtype, T.BooleanType):
        c = F.when(c, "TRUE").when(~c, "FALSE")
    else:
        c = c.cast("string")
    return F.coalesce(c, F.lit("NA")).alias(col)


def write_vc(
    df: DataFrame,
    name: str,
    root: str,
    sorting: list[str],
    digits: int = 6,
    partitions: int | None = None,
) -> dict:
    """Write ``root``/``name``.tsv + ``name``.yml deterministically.

    ``sorting`` must be a total order (write_vc errors on duplicate sort
    keys in the reference too — same contract)."""
    os.makedirs(root, exist_ok=True)
    schema = df.schema
    out_cols = [_fmt(f.name, f.dataType, digits) for f in schema.fields]

    n = partitions or max(df.rdd.getNumPartitions() // 4, 1)
    ordered = (
        df.repartitionByRange(n, *[F.col(c) for c in sorting])
        .sortWithinPartitions(*sorting)
        .select(out_cols)
    )
    tmp = os.path.join(root, f"_tmp_{name}")
    ordered.write.mode("overwrite").option("sep", "\t").option(
        "header", False
    ).csv(tmp)

    # range partitions are globally ordered: part files concatenate in
    # filename order into one globally sorted TSV (streamed, never loaded)
    tsv_path = os.path.join(root, f"{name}.tsv")
    md5 = hashlib.md5()
    header = "\t".join(f.name for f in schema.fields) + "\n"
    with open(tsv_path, "wb") as out:
        out.write(header.encode())
        md5.update(header.encode())
        parts = sorted(
            p for p in os.listdir(tmp) if p.startswith("part-")
        )
        for p in parts:
            with open(os.path.join(tmp, p), "rb") as fh:
                while chunk := fh.read(1 << 20):
                    out.write(chunk)
                    md5.update(chunk)
    for p in os.listdir(tmp):
        os.remove(os.path.join(tmp, p))
    os.rmdir(tmp)

    meta = {
        "name": name,
        "sorting": list(sorting),
        "data_hash": md5.hexdigest(),
        "columns": {
            f.name: _SPARK_TO_YML.get(f.dataType, "character")
            for f in schema.fields
        },
        "digits": digits,
        "written": str(date.today()),
    }
    yml_path = os.path.join(root, f"{name}.yml")
    with open(yml_path, "w") as fh:
        fh.write(f"name: {meta['name']}\n")
        fh.write(f"data_hash: {meta['data_hash']}\n")
        fh.write(f"digits: {digits}\n")
        fh.write(f"sorting: [{', '.join(sorting)}]\n")
        fh.write("columns:\n")
        for cname, cls in meta["columns"].items():
            fh.write(f"  {cname}: {cls}\n")
    return meta


def write_published(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    sort_keys: list[str] | None = None,
) -> None:
    """Partitioned parquet store for published tables — the 100 TB layout.

    The reference's published tables are keyed by lineage dimensions
    (``db``, ``mon_cycle``, survey; SURVEY.md §4 'partition pruning'):
    writing them hive-partitioned means any downstream filter on those
    columns prunes whole directories at plan time (PartitionFilters in the
    scan) instead of reading 100 TB to discard 99%. Within each partition,
    rows are sorted by ``sort_keys`` so parquet min/max row-group stats
    also prune within files."""
    out = df.repartition(*[F.col(c) for c in partition_by])
    if sort_keys:
        out = out.sortWithinPartitions(*partition_by, *sort_keys)
    out.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def write_csv2(df: DataFrame, path: str, sorting: list[str] | None = None):
    """S9 — write_csv2 (';' separator) CSV extract sink
    (HT31xx_LSVI.Rmd:320-332)."""
    out = df.orderBy(*sorting) if sorting else df
    out.coalesce(1).write.mode("overwrite").option("sep", ";").option(
        "header", True
    ).csv(path)
