"""Anti-pattern lint over EVERY driver-contract query's physical plan.

test_plans.py pins flagship plans in detail (pushdown, pruning, partial
agg, fusion); this sweep guards the WHOLE queries() surface against the
three silent scale-killers:

- ``CartesianProduct``: an un-broadcast cross join — O(n·m) at any
  scale. (``BroadcastNestedLoopJoin`` is NOT flagged: it is what the
  sanctioned ``crossJoin(broadcast(<1-row stats>))`` idiom compiles
  to; its non-bounded misuse also degrades to CartesianProduct once
  the side exceeds the broadcast threshold, which this lint catches.)
- ``BatchEvalPython``: a row-at-a-time Python UDF on the hot path —
  the repo's contract is Arrow-batched Pandas UDFs only
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas).
- a GLOBAL window (no PARTITION BY) — a one-task corpus funnel —
  except over tables that are bounded by construction, each
  allowlisted WITH its bound so the next reader can re-check the
  claim.

Plans are built at sf0.001 once (module fixture) and shared by the
three asserts. Building a plan is analysis-only for most queries;
model-state operators (k-means, PQ codebooks, exact-k sizing) run
their bounded driver jobs, which is the same contract the driver's
smoke check exercises.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# name -> why its global window is bounded (re-checkable claims)
GLOBAL_WINDOW_OK = {
    "x9_classifier_eval":
        "ranks DISTINCT 6dp-rounded scores — ≤2·10^6 rows by contract",
    "x5_vocab_ids":
        "row_number over the top-V vocabulary after TakeOrdered (V=1024)",
    "x8_hybrid_rrf":
        "the single-query panel's literal query_id folds out of the "
        "two-stage top-k's second window, leaving it physically "
        "global — but its input is the stage-1 (qid, pid)-partitioned "
        "prune, ≤ k·shuffle_partitions rows (k≤20) per system/fusion",
    "x9_quantile_bin":
        "r15 rank-selection thresholds: the cumulative-count window "
        "runs over the DISTINCT value table, and exact mode is gated "
        "by the ≤ exact_distinct_limit (2M) probe — above it the "
        "operator auto-switches to percentile_approx and the window "
        "disappears with it (relational.py quantile_bin)",
}


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, SF)
        out[name] = df._jdf.queryExecution().executedPlan().toString()
    return out


def test_no_cartesian_product_anywhere(plans):
    bad = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert not bad, f"un-broadcast cross joins in: {bad}"


def test_no_row_at_a_time_python_udf_anywhere(plans):
    bad = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert not bad, f"row-at-a-time Python UDFs in: {bad}"


import re as _re

_SPEC = _re.compile(r"windowspecdefinition\((.*?)specifiedwindowframe")


def _is_global_spec(args: str) -> bool:
    # windowspecdefinition(part1, part2, ord1 ASC ..., frame): order
    # columns carry ASC/DESC markers, partition columns are bare
    # attribute refs — global ⟺ no bare column before the frame.
    toks = [t.strip() for t in args.split(",") if t.strip()]
    return not any(" ASC" not in t and " DESC" not in t for t in toks)


def _global_window_lines(plan: str) -> list[str]:
    return [
        line for line in plan.split("\n")
        if "windowspecdefinition" in line and " Window " in f" {line} "
        and any(_is_global_spec(m) for m in _SPEC.findall(line))
    ]


def test_global_windows_only_over_bounded_tables(plans):
    bad = {}
    for name, plan in plans.items():
        lines = _global_window_lines(plan)
        if lines and name not in GLOBAL_WINDOW_OK:
            bad[name] = lines[0][:160]
    assert not bad, (
        "global (unpartitioned) windows outside the bounded-funnel "
        f"allowlist: {bad}")


def test_global_window_allowlist_is_not_stale(plans):
    """Every allowlist entry must still HAVE a global window — a stale
    entry would silently waive the lint for a future regression (and
    proves the detector isn't vacuous)."""
    stale = [n for n in GLOBAL_WINDOW_OK
             if not _global_window_lines(plans[n])]
    assert not stale, f"allowlisted but no global window found: {stale}"
