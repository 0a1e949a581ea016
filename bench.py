#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Per query: ONE untimed warm-up run (plan + codegen + IO cache), then the
MEDIAN of $SPARK_GRAFT_BENCH_RUNS timed runs (default 3) of full plan
execution (``df.count()`` on a cached-nothing plan), with GC + cleaner
settle quarantined outside the timed region. A global warm-up runs first
so JVM startup isn't billed to q1, and shared build-step memos are
prebuilt and timed as their own line items.

Drift observability (r10): ambient host drift on this box moves ALL
back-to-back samples of a query together (observed ±40% on identical
code across a round), so medians alone can't exonerate a riser. The
run therefore re-times a fixed calibration probe every
``_CAL_INTERVAL`` queries and emits the TIMELINE: ``calibration_sec``
(median of all probes), ``calibration_timeline``, and ``drift_ratio``
(max/min probe). Every query's raw samples land in the
``BENCH_SAMPLES*.json`` sidecar keyed with its calibration segment AND
(r11) its per-run ``t_start`` wall-clock offsets — the probes carry
``calibration_t_start`` offsets too — so a cross-round delta can be
normalized — or dismissed as drift — from the artifacts alone, without
a forensic re-run, and any single sample maps onto the drift curve by
one timestamp lookup. (For adjudicating a
specific rewrite, ``tools/ab_same_jvm.py``'s same-JVM alternation is
still the stronger instrument.)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from n2khab_mhq_data_spark.session import get_spark  # noqa: E402

# sf1.0 scratch tier (tools/make_sf1.py output): when present, the top-N
# most expensive sf0.1 queries are re-timed at 10x data so cross-round
# regressions are caught at the scale where they matter
SF1_DIR = "/root/repo/.scale/sf1.0"
SF1_TOP_N = 20
# sf1.0 stand-ins (r7 VERDICT item 6): queries whose sf1.0 cost is
# measured OUTPUT materialization, not plan waste, are re-timed through
# a registered deterministic-slice sibling — same operator, same oracle
# guarantee, ~4x less intrinsic pair cardinality. The full query keeps
# its slot on the sf0.1 board and its driver oracle rows.
SF1_SUBSTITUTE = {
    "j13_interval_overlap_binned": "j13_interval_overlap_sliced",
}
# r12: queries whose round-11/12 rewrites rest on a SCALE argument that
# sf0.1 cannot confirm (fewer fact scans / fewer shuffled bytes trading
# against idle-core parallelism) are ALWAYS included in the sf1.0 tier,
# on top of the top-N slowest — VERDICT r11 item 2: the locally-negative
# trades must be proven (or reverted) at 10x data.
SF1_EXTRA = [
    "audit_psi_drift",
    "pipeline_curation_v2",
    "pipeline_dsir_weights",
    "dedup_ngram_jaccard",
    "dedup_ngram_capped",
    "tpch_q2_min_cost_supplier",
    "ts_mann_kendall",
    "u4_cycle_drift_audit",
    "sketch_kmv_jaccard",
    "link_golden_record",
    "graph_kcore",
    "dedup_components",
    "graph_shortest_paths",
]


def _prebuild_memos(spark, sf_dir: str) -> dict[str, float]:
    """Build each shared memo (deterministic build-step intermediates)
    and return {step: seconds}. Queries then all run memo-warm."""
    from n2khab_mhq_data_spark.plans import graph, llm

    steps = {}
    t0 = time.time()
    llm._near_pairs(spark, sf_dir).count()
    steps["near_pairs"] = round(time.time() - t0, 3)
    t0 = time.time()
    llm._components(spark, sf_dir).count()
    steps["components"] = round(time.time() - t0, 3)
    t0 = time.time()
    llm._bigram_lm(spark, sf_dir).count()
    steps["bigram_lm"] = round(time.time() - t0, 3)
    t0 = time.time()
    from n2khab_mhq_data_spark.plans import pipeline as pl

    tf, dl = pl._bm25_index(spark, sf_dir)
    tf.count()
    steps["bm25_index"] = round(time.time() - t0, 3)
    t0 = time.time()
    llm._bpe_merges(spark, sf_dir)
    steps["bpe_merges"] = round(time.time() - t0, 3)
    t0 = time.time()
    llm._kmeans_cents(spark, sf_dir)
    steps["kmeans_cents"] = round(time.time() - t0, 3)
    t0 = time.time()
    graph._copurchase_edges(spark, sf_dir).count()
    steps["copurchase_edges"] = round(time.time() - t0, 3)
    t0 = time.time()
    from n2khab_mhq_data_spark.plans import kernels as kn

    kn._lsvi_levels(spark, sf_dir)["lsvi_globaal"].count()
    steps["lsvi_levels"] = round(time.time() - t0, 3)
    return steps


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # scale label from the LAST path component only (a parent dir that
    # happens to contain 'sf' must not leak separators into the sidecar
    # filename), sanitized to filename-safe chars
    base = os.path.basename(sf_dir.rstrip("/"))
    sf = base[2:] if base.startswith("sf") else base
    sf = "".join(ch for ch in sf if ch.isalnum() or ch in "._-")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("bench")

    # warm up the JVM, parquet footers, the events (nanos) reader, and the
    # Python worker pool once, outside any query's bill
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    from n2khab_mhq_data_spark.catalog import load as _load

    _load(spark, sf_dir, "events").count()
    spark.createDataFrame([(1,)], "x int").count()  # spin Python workers

    # BASELINE.md protocol: one warm-up run, then median of N timed runs
    # (N=3 by default; SPARK_GRAFT_BENCH_RUNS=1 for a quick pass)
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    # Fixed calibration probe: median of 3 runs of a canonical scan+agg,
    # re-timed every _CAL_INTERVAL queries (see module docstring). A
    # single start-of-run probe cannot key minutes-scale drift — r9's
    # driver bench had a FASTER calibration than the cleanest builder
    # run yet a 44% slower total, because the host degraded after the
    # probe fired.
    cal_df = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .count()
    )
    cal_df.count()

    # every probe and every timed sample records its wall-clock start
    # relative to bench_t0, so a riser maps onto the drift curve by one
    # lookup instead of cross-evidence (VERDICT r10 item 3: the k6 case
    # needed the sf1.0 row because 25-query probe granularity left its
    # segment ambiguous)
    bench_t0 = time.time()
    cal_times: list[float] = []

    def cal_probe() -> float:
        cal_times.append(round(time.time() - bench_t0, 2))
        cs = []
        for _ in range(3):
            t0 = time.time()
            cal_df.count()
            cs.append(time.time() - t0)
        return round(sorted(cs)[1], 4)

    cal_timeline = [cal_probe()]

    # Pre-build the shared build-step memos (near-dup pair table, BPE
    # merge table, IVF centroids) ONCE, timed as declared build steps.
    # This makes every per-query timing order-INdependent — all memo
    # consumers run warm, none of them hides the build cost in its own
    # number, and the build cost is its own line instead of vanishing
    # into whichever consumer's untimed warm-up ran first (ADVICE r4).
    build_steps = _prebuild_memos(spark, sf_dir)

    _CAL_INTERVAL = 25
    timings: dict[str, float] = {}
    samples_out: dict[str, dict] = {}
    total = 0.0
    for qi, (name, fn) in enumerate(qs.items()):
        if qi and qi % _CAL_INTERVAL == 0:
            cal_timeline.append(cal_probe())
        # collect garbage OUTSIDE the timed region: ~100 queries accumulate
        # broadcasts/shuffle state in the driver JVM, and letting a full GC
        # land inside a timed run shows up as a multi-second spike on
        # whichever query is unlucky (observed 0.8s queries spiking to 7-10s
        # late in the sequence)
        # Python-side first: localCheckpoint'ed RDDs (components, pagerank,
        # triangle stats) stay pinned until their Python DataFrame wrappers
        # are collected, so the JVM GC alone can't reclaim them mid-run
        import gc as _gc

        _gc.collect()
        spark._jvm.System.gc()
        # let the async ContextCleaner drain the block-removal storm the
        # GC just triggered (checkpointed CC/pagerank RDDs): without the
        # settle, cleanup overlaps the next timed run — observed as the
        # mid-sequence query paying 3x (7.9s vs 2.4s isolated)
        time.sleep(0.3)
        n = fn(spark, sf_dir).count()  # warm-up (plan + codegen + IO cache)
        samples = []
        starts = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).count()
            samples.append(time.time() - t0)
            starts.append(round(t0 - bench_t0, 2))
        dt = sorted(samples)[len(samples) // 2]
        timings[name] = round(dt, 3)
        samples_out[name] = {
            "runs": [round(t, 3) for t in samples],
            "t_start": starts,
            "cal_segment": len(cal_timeline) - 1,
        }
        total += dt
        print(f"# {name}: {n} rows, median {dt:.2f}s of {samples}", file=sys.stderr)

    # Optional sf1.0 tier: re-time the top-N most expensive queries at
    # 10x data (one warmed run each — regression detection, not a
    # median-of-3 microbenchmark). Skipped when the scratch tier hasn't
    # been generated or is explicitly disabled.
    sf1: dict | None = None
    run_sf1 = os.environ.get("SPARK_GRAFT_BENCH_SF1", "1") != "0"
    if (
        run_sf1
        and os.path.isdir(SF1_DIR)
        # realpath compare: a symlink/relative/trailing-dot spelling of
        # the sf1 dir must not double-run the tier against itself
        and os.path.realpath(sf_dir) != os.path.realpath(SF1_DIR)
    ):
        top = list(
            dict.fromkeys(  # substitution can alias two slots to one
                SF1_SUBSTITUTE.get(n, n)
                for n, _ in sorted(timings.items(), key=lambda kv: -kv[1])
            )
        )[:SF1_TOP_N]
        # scale-argument queries ride along even when not in the top-N
        # (r12; see SF1_EXTRA) — additions only, never displacements
        top += [
            n for n in SF1_EXTRA if n in timings and n not in top
        ]
        sf1_build = _prebuild_memos(spark, SF1_DIR)
        sf1_timings: dict[str, float] = {}
        for name in top:
            import gc as _gc

            _gc.collect()
            spark._jvm.System.gc()
            time.sleep(0.3)
            qs[name](spark, SF1_DIR).count()  # warm-up
            t0 = time.time()
            qs[name](spark, SF1_DIR).count()
            dt = time.time() - t0
            sf1_timings[name] = round(dt, 3)
            print(f"# sf1.0 {name}: {dt:.2f}s", file=sys.stderr)
        sf1 = {
            "dir": SF1_DIR,
            "total": round(sum(sf1_timings.values()), 3),
            "build_seconds": sf1_build,
            "queries": sf1_timings,
        }

    # Full per-query timings go to a sidecar file; the stdout JSON line
    # stays small (the driver's round-1 capture truncated a ~4 KB line to
    # "parsed: null") — it carries the totals plus only the 10 slowest.
    # The unsuffixed BENCH_QUERIES.json is the CANONICAL sf0.1 table the
    # judge diffs round-to-round; a run at any other sf writes a
    # suffixed sidecar instead of clobbering it (an sf0.001 smoke run
    # once overwrote the sf0.1 table mid-round).
    suffix = "" if sf == "0.1" else f"_sf{sf}"
    queries_file = str(
        Path(__file__).resolve().parent / f"BENCH_QUERIES{suffix}.json"
    )
    with open(queries_file, "w") as fh:
        json.dump(timings, fh, indent=1, sort_keys=True)
    # closing probe + full raw-samples sidecar: a cross-round riser is
    # adjudicated by comparing its runs against its segment's probe,
    # no forensic re-run needed
    cal_timeline.append(cal_probe())
    cal_med = sorted(cal_timeline)[len(cal_timeline) // 2]
    drift_ratio = round(max(cal_timeline) / min(cal_timeline), 3)
    samples_file = str(
        Path(__file__).resolve().parent / f"BENCH_SAMPLES{suffix}.json"
    )
    with open(samples_file, "w") as fh:
        json.dump(
            {
                "calibration_timeline": cal_timeline,
                "calibration_t_start": cal_times,
                "cal_interval": _CAL_INTERVAL,
                "samples": samples_out,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    out = {
        "metric": "total_query_wall_seconds",
        "value": round(total, 3),
        "unit": "sec",
        "n_queries": len(timings),
        "calibration_sec": cal_med,
        "calibration_timeline": cal_timeline,
        "drift_ratio": drift_ratio,
        # shared-intermediate build steps, timed separately so no
        # query's number hides (or pays) them — see _prebuild_memos
        "build_seconds": build_steps,
        "queries": slowest,
        "queries_file": queries_file,
        "samples_file": samples_file,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if sf1 is not None:
        out["sf1"] = sf1
    # r12 (VERDICT r11 item 5 — de-noise the driver comparison): with
    # only the 10 slowest on stdout, consecutive rounds overlapped on
    # ~4 query names and the per-query PERF diff was mostly churn.
    # Keep ADDING next-slowest entries to `queries` while the
    # serialized line stays under a conservative byte budget (the
    # round-1 driver capture truncated a ~4 KB line, so stay well
    # clear) — additions only: the 10 slowest are always present, no
    # entry is ever removed or renamed, and every other field is
    # unchanged.
    _LINE_BUDGET = 3400
    for name, sec in sorted(timings.items(), key=lambda kv: -kv[1])[10:]:
        out["queries"][name] = sec
        if len(json.dumps(out)) > _LINE_BUDGET:
            del out["queries"][name]
            break
    print(json.dumps(out))


if __name__ == "__main__":
    main()
