"""Hand-computed small-case tests for the ML-evaluation operator family
(r11 batch: ROC-AUC, KS, Kaplan-Meier, chi-squared, OLS, gains).

The registered queries are oracle-checked differentially against DuckDB
at sf0.01/sf1.0; these tests pin the UNDERLYING MATH on cases small
enough to verify by hand, so a future refactor that keeps both engines
wrong-in-the-same-way still fails loudly here.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _auc_midrank(rows):
    """Reference AUC via the Mann-Whitney midrank identity, sequential."""
    ranked = sorted(rows)  # (score, label)
    # midranks with ties
    out, i = [], 0
    while i < len(ranked):
        j = i
        while j < len(ranked) and ranked[j][0] == ranked[i][0]:
            j += 1
        mid = (i + 1 + j) / 2.0
        out.extend((mid, lab) for _, lab in ranked[i:j])
        i = j
    p = sum(1 for _, lab in out if lab)
    n = len(out) - p
    s = sum(m for m, lab in out if lab)
    return (s - p * (p + 1) / 2.0) / (p * n)


def test_auc_midrank_matches_sequential(spark):
    rows = [
        (3, 1), (3, 0), (5, 1), (1, 0), (4, 1), (2, 0), (5, 0), (4, 1),
    ]
    df = spark.createDataFrame(rows, "score int, pos int")
    grid = df.groupBy("score").agg(
        F.count("*").alias("n"), F.sum("pos").alias("p")
    )
    cum = W.orderBy("score").rowsBetween(W.unboundedPreceding, -1)
    ranked = grid.select(
        "p",
        "n",
        (
            F.coalesce(F.sum("n").over(cum), F.lit(0)).cast("double")
            + (F.col("n") + 1) / 2.0
        ).alias("midrank"),
    )
    p_tot = F.sum("p").cast("double")
    n_neg = (F.sum("n") - F.sum("p")).cast("double")
    got = ranked.agg(
        (
            (F.sum(F.col("p") * F.col("midrank")) - p_tot * (F.sum("p") + 1) / 2.0)
            / (p_tot * n_neg)
        ).alias("auc")
    ).collect()[0]["auc"]
    assert abs(got - _auc_midrank(rows)) < 1e-12


def test_km_product_limit_by_hand(spark):
    # 5 subjects: durations/events chosen so every branch fires —
    # censoring, multiple events at one time, and a survivor tail.
    # t=2: n=5, d=2 -> S=0.6; t=4: n=3, d=1 -> S=0.6*(2/3)=0.4;
    # t=5: n=2, d=0 (censored x2) -> S stays 0.4
    rows = [(2, 1), (2, 1), (4, 1), (5, 0), (5, 0)]
    df = spark.createDataFrame(rows, "dur int, ev int")
    grid = df.groupBy("dur").agg(
        F.count("*").alias("m"), F.sum("ev").alias("d")
    )
    n_tot = df.count()
    prev = W.orderBy("dur").rowsBetween(W.unboundedPreceding, -1)
    upto = W.orderBy("dur").rowsBetween(W.unboundedPreceding, 0)
    km = grid.select(
        "dur",
        "d",
        (
            F.lit(n_tot) - F.coalesce(F.sum("m").over(prev), F.lit(0))
        ).cast("double").alias("at_risk"),
    )
    factor = (F.col("at_risk") - F.col("d")) / F.col("at_risk")
    log_term = F.when(factor > 0, F.log(factor)).otherwise(F.lit(0.0))
    surv = F.when(F.min(factor).over(upto) == 0, F.lit(0.0)).otherwise(
        F.exp(F.sum(log_term).over(upto))
    )
    got = {
        r["dur"]: r["s"]
        for r in km.select("dur", surv.alias("s")).collect()
    }
    assert abs(got[2] - 0.6) < 1e-12
    assert abs(got[4] - 0.4) < 1e-12
    assert abs(got[5] - 0.4) < 1e-12


def test_km_exhausted_risk_set_is_exact_zero(spark):
    # all subjects event at t=3 -> S(3) must be exactly 0, not exp(ln 0)
    df = spark.createDataFrame([(3, 1), (3, 1)], "dur int, ev int")
    grid = df.groupBy("dur").agg(
        F.count("*").alias("m"), F.sum("ev").alias("d")
    )
    upto = W.orderBy("dur").rowsBetween(W.unboundedPreceding, 0)
    km = grid.select(
        "dur", "d", F.lit(2).cast("double").alias("at_risk")
    )
    factor = (F.col("at_risk") - F.col("d")) / F.col("at_risk")
    log_term = F.when(factor > 0, F.log(factor)).otherwise(F.lit(0.0))
    surv = F.when(F.min(factor).over(upto) == 0, F.lit(0.0)).otherwise(
        F.exp(F.sum(log_term).over(upto))
    )
    assert km.select(surv.alias("s")).collect()[0]["s"] == 0.0


def test_chi2_zero_cell_identity():
    # 2x2 with a structural zero: the sum(n^2/e) - N identity must equal
    # the classical sum over ALL cells including the absent one
    cells = {("a", 0): 10, ("a", 1): 10, ("b", 0): 5}  # (b,1) absent
    n_tot = sum(cells.values())
    rt = {v: sum(n for (vv, _), n in cells.items() if vv == v) for v in "ab"}
    ct = {l: sum(n for (_, ll), n in cells.items() if ll == l) for l in (0, 1)}
    classical = 0.0
    for v in "ab":
        for l in (0, 1):
            e = rt[v] * ct[l] / n_tot
            o = cells.get((v, l), 0)
            classical += (o - e) ** 2 / e
    identity = (
        sum(n * n * n_tot / (rt[v] * ct[l]) for (v, l), n in cells.items())
        - n_tot
    )
    assert abs(classical - identity) < 1e-12


def test_ols_normal_equations_recover_planted_coefficients(spark):
    # exact planted model y = 7 + 3*x1 - 2*x2 on an integer grid:
    # residuals are zero, so OLS must recover coefficients exactly
    rows = [
        (x1, x2, 7 + 3 * x1 - 2 * x2)
        for x1 in range(1, 7)
        for x2 in range(0, 5)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    s = df.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x1").cast("double").alias("sx1"),
        F.sum("x2").cast("double").alias("sx2"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).cast("double").alias("sx11"),
        F.sum(F.col("x2") * F.col("x2")).cast("double").alias("sx22"),
        F.sum(F.col("x1") * F.col("x2")).cast("double").alias("sx12"),
        F.sum(F.col("x1") * F.col("y")).cast("double").alias("sx1y"),
        F.sum(F.col("x2") * F.col("y")).cast("double").alias("sx2y"),
    ).collect()[0]
    n, sx1, sx2, sy = s["n"], s["sx1"], s["sx2"], s["sy"]
    s11 = n * s["sx11"] - sx1 * sx1
    s22 = n * s["sx22"] - sx2 * sx2
    s12 = n * s["sx12"] - sx1 * sx2
    s1y = n * s["sx1y"] - sx1 * sy
    s2y = n * s["sx2y"] - sx2 * sy
    det = s11 * s22 - s12 * s12
    b1 = (s1y * s22 - s2y * s12) / det
    b2 = (s2y * s11 - s1y * s12) / det
    b0 = (sy - b1 * sx1 - b2 * sx2) / n
    assert abs(b1 - 3.0) < 1e-9
    assert abs(b2 + 2.0) < 1e-9
    assert abs(b0 - 7.0) < 1e-9


def test_gains_decile_cut_is_exact_and_balanced(spark, sf_dir):
    from n2khab_mhq_data_spark.operators.rank import quantile_bins

    df = spark.range(0, 1003).select(
        (F.col("id") * 37 % 1003).alias("score"), F.col("id")
    )
    binned = quantile_bins(
        df, [F.col("score").desc(), F.col("id")], n_bins=10, bin_col="b"
    )
    sizes = {
        r["b"]: r["c"]
        for r in binned.groupBy("b").agg(F.count("*").alias("c")).collect()
    }
    # 1003 rows over 10 bins -> sizes differ by at most one
    assert set(sizes) == set(range(10))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    # the bin formula is the documented integer arithmetic
    rows = binned.select("score", "id", "b").collect()
    order = sorted(rows, key=lambda r: (-r["score"], r["id"]))
    for rank0, r in enumerate(order):
        assert r["b"] == rank0 * 10 // 1003


def test_ks_equals_max_cdf_gap(spark):
    rows = [(1, 1), (2, 1), (2, 0), (3, 0), (3, 0), (4, 1)]
    df = spark.createDataFrame(rows, "score int, pos int")
    grid = df.groupBy("score").agg(
        F.count("*").alias("n"), F.sum("pos").alias("p")
    )
    w = W.orderBy("score").rowsBetween(W.unboundedPreceding, 0)
    full = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    cums = grid.select(
        "score",
        (F.sum("p").over(w) / F.sum("p").over(full)).alias("fp"),
        (
            F.sum(F.col("n") - F.col("p")).over(w)
            / F.sum(F.col("n") - F.col("p")).over(full)
        ).alias("fn"),
    ).collect()
    got = max(abs(r["fp"] - r["fn"]) for r in cums)
    # by hand: pos CDF at 1,2,3,4 = 1/3, 2/3, 2/3, 1; neg = 0, 1/3, 1, 1
    expect = max(
        abs(1 / 3 - 0), abs(2 / 3 - 1 / 3), abs(2 / 3 - 1), abs(1 - 1)
    )
    assert abs(got - expect) < 1e-12


def test_seasonal_trend_nulls_at_edges(spark):
    # 10 consecutive days: the centered 7-day MA must be NULL for the
    # first and last 3 days and exact elsewhere
    rows = [(f"2024-01-{d:02d}", d * 100) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "day string, s long").select(
        F.to_date("day").alias("day"), "s", F.lit(1).alias("n")
    )
    w7 = W.orderBy("day").rowsBetween(-3, 3)
    ma = df.select(
        "day",
        F.when(
            F.count("*").over(w7) == 7,
            F.sum("s").over(w7) / 100.0 / F.sum("n").over(w7),
        ).alias("trend"),
    ).collect()
    by_day = {r["day"].day: r["trend"] for r in ma}
    for d in (1, 2, 3, 8, 9, 10):
        assert by_day[d] is None
    for d in (4, 5, 6, 7):
        assert abs(by_day[d] - d) < 1e-12  # mean of d-3..d+3 = d
