#!/usr/bin/env python
"""Warm median-of-3 timer for individual registered queries.

Usage: python tools/warm_median.py <sf_dir> <query> [<query> ...]

Runs each query once untimed (warm-up), then 3 timed runs; prints the
median. This is the bench-variance protocol (SCALE.md): no perf claim
or regression call without a warm median.
"""

from __future__ import annotations

import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from n2khab_mhq_data_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:]
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark()
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).count()  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            ts.append(time.time() - t0)
        print(
            f"{name}: median={statistics.median(ts):.2f}s "
            f"runs={[round(t, 2) for t in ts]} rows={n}",
            flush=True,
        )


if __name__ == "__main__":
    main()
