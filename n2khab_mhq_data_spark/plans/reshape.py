"""Reshaping queries (SURVEY.md §2.9 R1-R3) — the reference's signature
melt/pivot/separate operators, plus scalar-function family demos (§2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2khab_mhq_data_spark.catalog import load
from n2khab_mhq_data_spark.operators.reshape import melt, pivot_wide, split_column
from n2khab_mhq_data_spark.plans import query


@query(
    "r1_melt_wide_to_long",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           k.variable AS variable, round(k.value, 2) AS value
    FROM lineitem,
    LATERAL (VALUES ('quantity', l_quantity),
                    ('extendedprice', l_extendedprice),
                    ('discount', l_discount)) AS k(variable, value)
    """,
)
def r1_melt_wide_to_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 wide->long melt (gather/pivot_longer, ~15 sites,
    query_fieldmap.Rmd:255,417; export_from_vbidwh.Rmd:113). Uses the
    operators.reshape.melt helper (Spark `unpivot`, zero-shuffle generator)."""
    li = load(spark, sf_dir, "lineitem")
    long = melt(
        li,
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        var_name="variable",
        value_name="value",
        strip_prefix="l_",
    )
    return long.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        F.col("variable"),
        F.round("value", 2).alias("value"),
    )


@query(
    "r2_pivot_long_to_wide",
    oracle="""
    SELECT user_id,
           CAST(coalesce(sum(CASE WHEN event_type = 'click' THEN 1 END), 0)
                AS BIGINT) AS click,
           CAST(coalesce(sum(CASE WHEN event_type = 'view' THEN 1 END), 0)
                AS BIGINT) AS view,
           CAST(coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
                AS BIGINT) AS purchase,
           CAST(coalesce(sum(CASE WHEN event_type = 'signup' THEN 1 END), 0)
                AS BIGINT) AS signup,
           CAST(coalesce(sum(CASE WHEN event_type = 'error' THEN 1 END), 0)
                AS BIGINT) AS error
    FROM events GROUP BY user_id
    """,
)
def r2_pivot_long_to_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 long->wide pivot (spread/pivot_wider: LSVI status cross-tab,
    HT31xx_LSVI.Rmd:249-253). Explicit value list => one-pass pivot, no
    extra distinct-values job (matters at scale: the values scan is a full
    pass over the fact table)."""
    e = load(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    wide = pivot_wide(
        e,
        ids=["user_id"],
        key="event_type",
        agg=F.count(F.lit(1)),  # count('*') is illegal inside Pivot
        values=types,
        fill=0,
    )
    return wide.select(
        "user_id", *[F.col(t).cast("long").alias(t) for t in types]
    )


@query(
    "r3_split_column",
    oracle="""
    SELECT o_orderkey AS orderkey,
           string_split(o_orderpriority, '-')[1] AS priority_rank,
           CASE WHEN len(string_split(o_orderpriority, '-')) >= 2
                THEN array_to_string(
                       string_split(o_orderpriority, '-')[2:], '-')
                END AS priority_label
    FROM orders
    """,
)
def r3_split_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 split column (separate(col, into, sep), query_fieldmap.Rmd:410).

    The operator keeps the REMAINDER in the last piece (F.split with
    limit=len(into) — tidyr's extra="merge") and yields NULL for pieces
    past the split count; the oracle spells out the same semantics
    (split_part would silently truncate a multi-separator value to its
    second token and NULL-vs-'' diverge on a separatorless one)."""
    o = load(spark, sf_dir, "orders")
    return split_column(
        o.select(F.col("o_orderkey").alias("orderkey"), "o_orderpriority"),
        "o_orderpriority",
        into=["priority_rank", "priority_label"],
        sep="-",
    ).select("orderkey", "priority_rank", "priority_label")


# ---------------------------------------------------------------------------
# §2.8 scalar-function families
# ---------------------------------------------------------------------------


@query(
    "f1_string_functions",
    oracle="""
    SELECT p_partkey AS partkey,
           substr(p_name, 1, 5) AS name5,
           CAST(length(p_name) AS INTEGER) AS name_len,
           lower(p_type) AS type_lower,
           regexp_replace(p_name, ' .*$', '') AS first_word,
           concat(p_brand, ':', p_type) AS brand_type,
           trim(p_name) AS trimmed,
           CAST(instr(p_name, 'widget') AS INTEGER) AS widget_pos
    FROM part
    """,
)
def f1_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 string family: str_sub/nchar/str_locate/str_replace/str_c/
    str_to_lower/str_trim (query_fieldmap.Rmd:139,211-216,1578)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.substring("p_name", 1, 5).alias("name5"),
        F.length("p_name").cast("int").alias("name_len"),
        F.lower("p_type").alias("type_lower"),
        F.regexp_replace("p_name", " .*$", "").alias("first_word"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias(
            "brand_type"
        ),
        F.trim("p_name").alias("trimmed"),
        F.instr(F.col("p_name"), "widget").cast("int").alias("widget_pos"),
    )


@query(
    "f2_date_functions",
    oracle="""
    SELECT o_orderkey AS orderkey,
           CAST(o_orderdate AS DATE) AS orderdate,
           CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due_date,
           CAST(DATE '1970-01-01' + to_days(CAST(datediff('day', DATE '1970-01-01',
                CAST(o_orderdate AS DATE)) AS INTEGER)) AS DATE) AS from_epoch_days
    FROM orders
    """,
)
def f2_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 date family: as.Date, year(), date arithmetic, Date-from-int-epoch
    round trip (git2rdata stores Dates as int day numbers,
    calc_plot_segment_area.Rmd:31-34)."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    epoch_days = F.datediff(d, F.lit("1970-01-01").cast("date"))
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        d.alias("orderdate"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.date_add(d, 30).cast("timestamp").alias("due_date"),
        F.date_add(F.lit("1970-01-01").cast("date"), epoch_days).alias(
            "from_epoch_days"
        ),
    )


@query(
    "f3_math_functions",
    oracle="""
    SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
           round(sqrt(l_quantity) + 1e-9, 6) AS qty_sqrt,
           round(100 * l_quantity / (pi() * 18 * 18) + 1e-9, 6)
             AS pct_of_circle,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax) + 1e-9, 2)
             AS charged
    FROM lineitem
    """,
)
def f3_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 math family: round/sqrt/pi/area-ratio arithmetic
    (query_fieldmap.Rmd:1418; area % = 100*area/(pi*18^2))."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("orderkey"),
        F.col("l_linenumber").alias("linenumber"),
        # computed irrationals carry the repo-wide +1e-9 epsilon (the
        # eps_round convention) — bare round leaves the Spark-HALF_UP vs
        # DuckDB-half-even knife edge open at the 6th decimal
        F.round(F.sqrt("l_quantity") + F.lit(1e-9), 6).alias("qty_sqrt"),
        F.round(
            100 * F.col("l_quantity") / (F.lit(3.141592653589793) * 18 * 18)
            + F.lit(1e-9),
            6,
        ).alias("pct_of_circle"),
        F.round(
            F.col("l_extendedprice")
            * (1 - F.col("l_discount"))
            * (1 + F.col("l_tax"))
            + F.lit(1e-9),
            2,
        ).alias("charged"),
    )


@query(
    "f4_conditional_coalesce",
    oracle="""
    SELECT e.event_id AS event_id,
           coalesce(e.value, 0.0) AS value_filled,
           CASE WHEN e.value IS NULL THEN 'missing'
                WHEN e.value < 50 THEN 'low'
                WHEN e.value < 150 THEN 'mid'
                ELSE 'high' END AS value_band,
           nullif(e.event_type, 'error') AS type_or_null,
           least(e.value, 100.0) AS capped,
           greatest(e.value, 10.0) AS floored
    FROM events e
    """,
)
def f4_conditional_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 conditional family: if_else/case_when/coalesce/pmin/pmax
    (query_fieldmap.Rmd:90,1327-1336; export_from_vbidwh.Rmd:82-86)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        F.col("event_id"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value_filled"),
        F.when(F.col("value").isNull(), "missing")
        .when(F.col("value") < 50, "low")
        .when(F.col("value") < 150, "mid")
        .otherwise("high")
        .alias("value_band"),
        F.nullif(F.col("event_type"), F.lit("error")).alias("type_or_null"),
        F.least(F.col("value"), F.lit(100.0)).alias("capped"),
        F.greatest(F.col("value"), F.lit(10.0)).alias("floored"),
    )
