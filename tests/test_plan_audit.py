"""CI-level physical-plan regression gate: build (don't execute) the
plans of representative queries across families and assert no NEW audit
flags vs the reviewed EXPECTED whitelist in tools/explain_audit.py —
so a change that silently introduces a cartesian join, a row-at-a-time
Python UDF, an unpruned scan, or an unreviewed SortMergeJoin fails the
suite, not just the (manually run) audit tool."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.explain_audit import (  # noqa: E402
    EXPECTED,
    _expected,
    audit,
    plan_text,
)

from tests.conftest import SF_DIR  # single source of the testdata path

REPRESENTATIVE = [
    "p3_null_domain_filter",   # scan + filter (pushdown family)
    "j1_broadcast_decode",     # broadcast dim join
    "w2_keep_latest",          # window
    "k7_lsvi_globaal",         # layered kernel
    "dedup_minhash_lsh",       # banded LSH
    "ann_ivf_topk",            # zero-shuffle closure assignment (r4)
    "text_tfidf_topk",         # whitelisted 1-row broadcast
    "graph_pagerank",          # iterative joins (hinted shuffle-hash)
    "pipeline_leakage_safe_split",  # components + split attach
    "ts_ewma",                 # pinned grouped-map dispatch
    "text_banned_lexicon_gate",  # broadcast lexicon gate
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_plan_has_no_unreviewed_flags(spark, name):
    from n2khab_mhq_data_spark import plans

    plans.ensure_loaded()
    df = plans.QUERIES[name](spark, SF_DIR)
    plan = plan_text(df)
    if "isFinalPlan=false" in plan:
        # AQE finalizes (and annotates codegen) only at runtime — execute
        # THIS DataFrame, then audit the plan that actually ran
        df.collect()
        plan = plan_text(df)
    flags = audit(plan)
    # use the tool's own matcher: CARTESIAN counts are pinned exactly
    # (r7), so a bare base-name comparison would let an ADDITIONAL
    # unintended cross slip past the whitelist
    assert _expected(name, flags), (name, flags, EXPECTED.get(name, set()))
