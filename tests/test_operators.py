"""Unit tests for the operator library (grain assertions, keyed dedup,
membership flags, reshape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from n2khab_mhq_data_spark.operators.relational import (
    GrainViolation,
    assert_grain,
    dedup_keep_latest,
    duplicates,
    membership_flag,
    patch_rows,
)
from n2khab_mhq_data_spark.operators.reshape import melt, pivot_wide, split_column


@pytest.fixture()
def plots(spark):
    return spark.createDataFrame(
        [
            (1, 1, "done", 10),
            (1, 1, "planned", 5),
            (1, 2, "done", 20),
            (2, 1, "done", 7),
        ],
        "plot_id int, mon_cycle int, status string, date_status int",
    )


def test_duplicates(plots):
    d = duplicates(plots, ["plot_id", "mon_cycle"]).collect()
    assert len(d) == 2
    assert all(r.plot_id == 1 and r.mon_cycle == 1 for r in d)


def test_assert_grain_raises(plots):
    with pytest.raises(GrainViolation):
        assert_grain(plots, ["plot_id", "mon_cycle"])
    assert_grain(plots.filter("status = 'done'"), ["plot_id", "mon_cycle"])


def test_dedup_keep_latest(plots):
    out = dedup_keep_latest(
        plots,
        ["plot_id", "mon_cycle"],
        [F.col("date_status").desc(), F.col("status")],
    )
    rows = {(r.plot_id, r.mon_cycle): r.status for r in out.collect()}
    assert rows[(1, 1)] == "done"  # date 10 beats 5
    assert len(rows) == 3


def test_membership_flag(spark, plots):
    other = spark.createDataFrame([(1,)], "plot_id int")
    out = membership_flag(plots, other, "plot_id", "plot_id", "known")
    vals = {(r.plot_id, r.known) for r in out.collect()}
    assert (1, True) in vals and (2, False) in vals


def test_patch_rows(plots):
    out = patch_rows(
        plots, [(F.col("plot_id") == 1) & (F.col("status") == "planned")]
    )
    assert out.count() == 3


def test_melt_round_trip(spark):
    df = spark.createDataFrame([(1, 2.0, 3.0)], "id int, a double, b double")
    long = melt(df, ids=["id"], values=["a", "b"])
    assert {tuple(r) for r in long.collect()} == {(1, "a", 2.0), (1, "b", 3.0)}
    wide = pivot_wide(
        long, ids=["id"], key="variable", agg=F.first("value"), values=["a", "b"]
    )
    assert wide.collect()[0].asDict() == {"id": 1, "a": 2.0, "b": 3.0}


def test_split_column(spark):
    df = spark.createDataFrame([("1-URGENT",)], "p string")
    out = split_column(df, "p", into=["rank", "label"], sep="-")
    assert out.collect()[0].asDict() == {"rank": "1", "label": "URGENT"}
