"""Readers S1-S7.

The reference reads four database families over ODBC plus locale CSVs and
versioned TSVs. Spark-first mapping:

- S1/S2/S3/S4 (Firebird / Access / SQL Server / whole-table): one JDBC
  reader with URL-dispatch. Predicates and column lists push down via
  Catalyst (the reference hand-writes them into SQL strings,
  query_fieldmap.Rmd:107-137 — here `.filter`/`.select` reach the source
  automatically). In the testbed, parquet stands in for the databases.
- S5: semicolon CSV with comma decimals (read_csv2).
- S6: versioned-TSV reader (git2rdata read_vc) — TSV + yml schema sidecar,
  restores types including Date-from-int-epoch and factor levels.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from n2khab_mhq_data_spark.catalog import TableSpec


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str | None = None,
    query: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """S1-S4 JDBC scan with driver dispatch by URL scheme (the reference
    dispatches on DB file extension, query_fieldmap.Rmd:139-154). Always
    lowercases column names (P2, applied after every fetch in the
    reference)."""
    drivers = {
        "jdbc:firebirdsql": "org.firebirdsql.jdbc.FBDriver",
        "jdbc:ucanaccess": "net.ucanaccess.jdbc.UcanaccessDriver",
        "jdbc:sqlserver": "com.microsoft.sqlserver.jdbc.SQLServerDriver",
        "jdbc:postgresql": "org.postgresql.Driver",
        # embedded Derby ships with Spark — the integration-test database
        # (tests/test_sources.py) that exercises this whole dispatch path
        "jdbc:derby": "org.apache.derby.jdbc.EmbeddedDriver",
    }
    reader = spark.read.format("jdbc").option("url", url)
    for scheme, drv in drivers.items():
        if url.startswith(scheme):
            reader = reader.option("driver", drv)
            break
    if table:
        reader = reader.option("dbtable", table)
    if query:
        reader = reader.option("query", query)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    df = reader.load()
    return df.toDF(*[c.lower() for c in df.columns])


def read_csv2(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """S5 — read_csv2 locale: ';' separator, ',' decimal mark
    (query_fieldmap.Rmd:80; query_inboveg.Rmd:78). Numeric columns are
    declared in ``schema``; they are read as strings and locale-parsed,
    everything else is cast directly."""
    # escape='"' parses RFC 4180 / R qmethod="double" DOUBLED quotes
    # (the write_csv2/write_vc convention), not backslash escapes.
    # multiLine: quoted fields may legitimately contain embedded
    # newlines (write.csv2 and this repo's own sink quote them) —
    # without it the scan splits such records mid-field into corrupt
    # rows with no error. Cost: multiLine reads one task per FILE, not
    # per block — acceptable for the dimension/registry tables this
    # locale reader exists for (the 100 TB fact path is parquet).
    raw = spark.read.csv(
        path, sep=";", header=True, inferSchema=False, escape='"',
        multiLine=True,
    )
    if schema is None:
        return raw
    from n2khab_mhq_data_spark.functions.parsing import parse_locale_number

    cols = []
    for f in schema.fields:
        c = F.col(f.name)
        if isinstance(f.dataType, (T.DoubleType, T.FloatType)):
            # full locale parse (digit-group dots, comma decimal) with
            # R as.numeric semantics: non-numeric -> NULL. A bare
            # comma->dot replace + cast crashed the whole scan under
            # Spark 4 ANSI on '1.234,5' or any stray token.
            c = parse_locale_number(c).cast(f.dataType)
        else:
            # try_cast: a malformed cell yields NA (R read_csv2
            # contract) instead of an ANSI CAST_INVALID_INPUT abort
            c = c.try_cast(f.dataType)
        cols.append(c.alias(f.name))
    return raw.select(*cols)


def read_vc(
    spark: SparkSession, path: str, spec: TableSpec | None = None
) -> DataFrame:
    """S6 — versioned-TSV reader (git2rdata read_vc,
    HT31xx_data_preparation.Rmd:33-38): TSV + schema restore, including
    Date-from-int-epoch (git2rdata stores Dates as integer day numbers) and
    factor restore — stored 1-based level indices decode back to labels in
    the sidecar's level order, so factor level order round-trips
    write_vc -> read_vc. With ``spec=None`` the schema (including factor
    labels/ordered) is read from the ``.yml`` sidecar next to the TSV."""
    if spec is None:
        from n2khab_mhq_data_spark.sources.sink import read_vc_meta

        if not path.endswith(".tsv"):
            # blind suffix slicing would truncate 4 chars from any
            # other path and point the sidecar error at a stem the
            # caller never wrote
            raise ValueError(
                f"read_vc expects a .tsv path (got {path!r}); pass the"
                " data file, the .yml sidecar is derived from it"
            )
        spec = read_vc_meta(path[: -len(".tsv")] + ".yml")
    # nullValue='NA' makes a literal character value "NA" read back as
    # NULL — faithful PARITY, not a defect: R's read.table matches
    # na.strings against the UNQUOTED token too, so git2rdata has the
    # same ambiguity (and write_vc on both sides emits the string and
    # the missing marker identically)
    raw = spark.read.csv(
        path, sep="\t", header=True, inferSchema=False, nullValue="NA",
        escape='"',  # doubled-quote escaping, matching write_vc
        multiLine=True,  # quoted embedded newlines (see read_csv2 note)
    )
    cols = []
    for c in spec.columns:
        col = F.col(c.name)
        if c.yml_class == "Date":
            col = F.date_add(
                F.lit("1970-01-01").cast("date"), col.try_cast("int")
            )
        elif c.yml_class == "logical":
            # both spellings: this repo's sink writes verbose
            # TRUE/FALSE, but genuine git2rdata OPTIMIZED storage
            # encodes logicals as 0/1 integers (same convention as its
            # Date-as-int and factor-as-index, both already handled
            # here) — without the numeric legs every logical column in
            # a real git2rdata file read back all-NULL
            low = F.lower(col)
            col = (
                F.when(low.isin("true", "1"), True)
                .when(low.isin("false", "0"), False)
            )
        elif c.yml_class == "factor" and c.levels:
            # try_element_at + 1-based bounds guard: a hand-edited
            # token of '0' or past-the-end would ABORT under ANSI
            # (INVALID_INDEX_OF_ZERO / INVALID_ARRAY_INDEX), and a
            # negative index would silently decode from the END of the
            # level list — all three must restore as NA like any other
            # malformed token
            idx = col.try_cast("int")
            col = F.when(
                idx >= 1,
                F.try_element_at(
                    F.array(*[F.lit(x) for x in c.levels]), idx
                ),
            )
        else:
            # try_cast: hand-edited versioned TSVs live in git; one
            # malformed token must restore as NA (git2rdata read_vc
            # behavior), not abort the job under ANSI mode
            col = col.try_cast(c.spark_type)
        cols.append(col.alias(c.name))
    return raw.select(*cols)
