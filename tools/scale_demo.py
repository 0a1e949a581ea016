#!/usr/bin/env python
"""One measured point BEYOND the 10x sweep (r8 VERDICT stretch item 10):
run the exact-dedup and MinHash-LSH families at an upsampled tier
(default 100 replicas of the sf1.0 scratch docs = 5M documents, 1000x
the bench tier's sf0.1) and record wall clock + shuffle bytes, so
SCALE.md's shuffle-accounting argument has a second measured point.

Data: structure-preserving upsample of the sf1.0 scratch documents
(tools/make_sf1.py's replica scheme, second-level ``_s<j>`` word suffix
so cross-replica docs share no shingles — pair counts stay linear in
corpus size by construction, matching a real corpus's behavior where
near-dup density is a property of the data, not its size).

Usage: python tools/scale_demo.py [replicas]   # generates tier if absent
Output: one JSON line per family with rows, seconds, shuffle GiB.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from n2khab_mhq_data_spark.session import get_spark  # noqa: E402

SF1 = "/root/repo/.scale/sf1.0/documents.parquet"
REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 100
DST = f"/root/repo/.scale/docs_x{REPLICAS}/documents.parquet"
SHIFT = 10_000_000_000  # above every sf1.0 doc_id (max ~9e8 + 60k)
UI = "http://localhost:4040"  # overwritten from sc.uiWebUrl in main()


def _shuffle_totals() -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over all stages
    so far — diff two snapshots to attribute bytes to a phase. The UI
    URL comes from THIS session's sc.uiWebUrl, not a hardcoded :4040 —
    if another Spark process holds 4040, this session binds 4041+ and
    a hardcoded URL would silently read the other process's stages
    (r10 adversarial review)."""
    apps = json.load(
        urllib.request.urlopen(f"{UI}/api/v1/applications", timeout=10)
    )
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{UI}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=30,
        )
    )
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def make_tier(spark) -> None:
    base = spark.read.parquet(SF1)
    reps = []
    for j in range(REPLICAS):
        r = base.withColumn(
            "doc_id", (F.col("doc_id") + F.lit(j * SHIFT)).cast("long")
        )
        if j > 0:
            r = r.withColumn(
                "text",
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(w, F.lit(f"_s{j}")),
                    ),
                    " ",
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
        reps.append(r)
    df = reps[0]
    for r in reps[1:]:
        df = df.unionByName(r)
    df.repartition(64).write.mode("overwrite").parquet(DST)


def measure(name: str, fn) -> dict:
    r0, w0 = _shuffle_totals()
    t0 = time.time()
    rows = fn()
    sec = time.time() - t0
    r1, w1 = _shuffle_totals()
    out = {
        "family": name,
        "rows_out": rows,
        "seconds": round(sec, 2),
        "shuffle_read_gib": round((r1 - r0) / 2**30, 3),
        "shuffle_write_gib": round((w1 - w0) / 2**30, 3),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    global UI
    spark = get_spark(
        "scale_demo", extra_conf={"spark.ui.enabled": "true"}
    )
    ui = spark.sparkContext.uiWebUrl
    if not ui:
        raise SystemExit("Spark UI did not come up; shuffle accounting"
                         " needs it (spark.ui.enabled)")
    UI = ui
    if not Path(DST).exists():
        t0 = time.time()
        make_tier(spark)
        print(
            json.dumps({"family": f"generate_x{REPLICAS}",
                        "seconds": round(time.time() - t0, 2)}),
            flush=True,
        )
    docs = spark.read.parquet(DST)
    n = docs.count()
    print(json.dumps({"family": "corpus", "rows": n}), flush=True)

    from n2khab_mhq_data_spark.llmdata.dedup import (
        exact_dedup,
        minhash_dedup_pairs,
        prefix_filter_pairs,
    )

    measure(
        "exact_dedup",
        lambda: exact_dedup(docs, "text", "doc_id").count(),
    )
    measure(
        "minhash_lsh_verified_pairs",
        lambda: minhash_dedup_pairs(docs, "text", "doc_id").count(),
    )
    # r9 VERDICT item 7: the prefix-filter's rarest-first fan-out claim
    # measured at the 1000x tier (exact set-similarity, no banding)
    measure(
        "prefix_filter_pairs",
        lambda: prefix_filter_pairs(docs, "text", "doc_id").count(),
    )


if __name__ == "__main__":
    main()
