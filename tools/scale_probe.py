#!/usr/bin/env python
"""Empirical scaling probe — run headline queries at sf0.001 / sf0.01 /
sf0.1 in ONE warm session and report how wall-clock grows with data size.

The point: SCALE.md argues each family's plan shape is linear (or
n log n) in input; this tool MEASURES it. A query whose 0.01→0.1 ratio
(10x data) is far above ~10x has a super-linear stage hiding somewhere
and gets flagged.

Interpreting local[32] numbers: at these SFs per-query time is a mix of
fixed scheduling overhead (dominates at sf0.001) and real data work, so
ratios are *upper-bounded* by the asymptotic slope — we flag only
ratios well above the data growth factor.

Usage: python tools/scale_probe.py [query ...]   (default: headline set)
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from n2khab_mhq_data_spark.session import get_spark  # noqa: E402

# one representative per family, biased toward the shapes with
# quadratic risk (pair generation, self-joins, iterative graph passes)
HEADLINE = [
    "p3_null_domain_filter",      # map-only scan
    "a2_min_max_sum",             # one-shuffle agg
    "w2_keep_latest",             # window
    "j3_chained_left_join",       # broadcast-dim joins
    "k7_lsvi_globaal",            # layered agg kernel
    "k9_reconciliation_cascade",  # multi-join cascade
    "dedup_exact",                # content-hash groupBy
    "dedup_minhash_lsh",          # banded LSH pair generation
    "dedup_ngram_capped",         # capped gram self-join
    "dedup_components_twophase",  # iterative graph contraction
    "ann_lsh_topk",               # bucketed ANN
    "text_tfidf_topk",            # explode + window
    "pipeline_end_to_end",        # composed corpus-prep flow
    "graph_triangle_stats",       # oriented triangle join
    "link_sorted_neighborhood",   # blocked window linkage
    "graph_pagerank",             # iterative joins (1 shuffle/round)
    "pipeline_leakage_safe_split",  # components + split attach
    "ts_ewma",                    # Arrow grouped map (pinned dispatch)
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]


def main() -> int:
    names = sys.argv[1:] or HEADLINE
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark()
    # warm the JVM + parquet footers so sf0.001 isn't charged the
    # session fixed costs
    qs["p1_select_rename"](spark, SFS[0]).count()

    rows = []
    for name in names:
        if name not in qs:
            print(f"?? unknown query {name}", file=sys.stderr)
            continue
        times = []
        for sf in SFS:
            t0 = time.time()
            qs[name](spark, sf).count()
            times.append(time.time() - t0)
        r_mid = times[1] / times[0] if times[0] > 0 else float("nan")
        r_big = times[2] / times[1] if times[1] > 0 else float("nan")
        # 10x data; flag only clearly super-linear growth (>2x slope)
        flag = "SUPER-LINEAR" if r_big > 20 else ""
        rows.append({
            "query": name,
            "sf0.001_s": round(times[0], 2),
            "sf0.01_s": round(times[1], 2),
            "sf0.1_s": round(times[2], 2),
            "ratio_0.01/0.001": round(r_mid, 1),
            "ratio_0.1/0.01": round(r_big, 1),
            "flag": flag,
        })
        print(
            f"{name:28s} {times[0]:6.2f} {times[1]:6.2f} {times[2]:6.2f}"
            f"   x{r_big:5.1f} {flag}"
        )

    out = Path(__file__).resolve().parent.parent / "SCALE_PROBE.json"
    out.write_text(json.dumps(rows, indent=1))
    n_flag = sum(1 for r in rows if r["flag"])
    print(f"\n{len(rows)} queries probed, {n_flag} flagged; -> {out}")
    return 1 if n_flag else 0


if __name__ == "__main__":
    sys.exit(main())
