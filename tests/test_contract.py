"""Driver-contract smoke tests: entry() returns rows, every registered query
runs at sf0.001, every oracle key matches a query key."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "cover_mean" in df.columns


def test_oracle_keys_subset_of_queries():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 40


def test_every_query_runs(spark, sf_dir):
    qs = entrymod.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        # schema resolves and the plan executes
        assert df.limit(5).count() >= 0, name
