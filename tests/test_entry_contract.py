"""Driver-contract smoke: every queries() entry constructs a DataFrame
(plan only — execution is the oracle harness's job), every oracle_sql()
entry is valid DuckDB SQL over the registered views, and names/columns
line up. Catches entry-file regressions inside pytest instead of at
driver time.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def test_every_query_constructs_a_plan(spark):
    queries = entrymod.queries()
    assert len(queries) >= 42
    for name, fn in queries.items():
        df = fn(spark, SF)
        assert df is not None and df.columns, f"{name} built no plan"


def test_every_oracle_is_valid_sql_with_matching_columns(spark, con):
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(queries), "oracle without a query"
    for name, sql in oracles.items():
        rel = con.sql(sql)
        spark_cols = sorted(queries[name](spark, SF).columns)
        assert sorted(rel.columns) == spark_cols, (
            f"{name}: oracle columns {sorted(rel.columns)} != spark {spark_cols}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0


def test_driver_window_holds_only_hash_checkable_queries():
    """The external harness checks the first 50 queries() entries in
    dict order (round-2 lesson: a mid-dict insertion evicted
    range_join_events from the window). Pin the layout: every one of
    the first 50 has an oracle, rows-only entries sit at the tail, and
    every operator family has in-window coverage."""
    qkeys = list(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    window = qkeys[:50]
    missing = [k for k in window if k not in oracles]
    assert not missing, f"rows-only queries inside the checked window: {missing}"
    # every rows-only query is declared after every hash-checkable one
    first_rows_only = min(
        (i for i, k in enumerate(qkeys) if k not in oracles), default=len(qkeys))
    last_hash = max(i for i, k in enumerate(qkeys) if k in oracles)
    assert last_hash < first_rows_only, (
        "hash-checkable query declared after a rows-only one")
    # Rotation policy: queries with NO external CORRECTNESS row yet
    # must be in-window; queries ≥3 rounds driver-green may rotate out
    # to slots 51+ (where the tail test below still oracle-checks them
    # locally) PROVIDED an operator-family sibling stays in-window.
    # Round-6 rotation (the r5 verdict's top item): the 13 queries
    # that had only local verification take the slots of 13 long-green
    # evictees (see the queries() comment for the family mapping).
    must_be_in_window = {
        # round-15 rotation (r14 verdict #2 + standing oldest-first
        # policy): the declared R15 ROTATION BACKLOG — the 48-query
        # r12 cohort (3 rounds stale this round) — plus
        # streaming_hybrid_lag (hash-checkable since r14 but declared
        # at slot 149: NO external CORRECTNESS row yet) and
        # x8_hybrid_exact (oldest-first head of the r13 cohort + the
        # hash gate for the r15 hybrid serve-path optimization) — see
        # the queries() rotation note
        "s8_saved_bloom", "x8_bm25_index", "x8_hybrid_rrf",
        "x7_stratified_sample", "x7_dsir_weights", "x7_dsir_select",
        "x2_dup_span_stats", "range_join_events",
        "x2_bloom_decontaminate", "unpivot_price_measures",
        "sets_except", "python_udf_bucket", "json_extract",
        "scalar_functions", "x8_bm25", "x4_audio_features",
        "x5_span_dedup", "x5_unigram_logprob", "x7_token_budget_mix",
        "x7_sample_exact_k", "x2_winnow_fps", "x5_hash_embedding",
        "x5_bigram_logprob", "x5_url_dedup", "x5_segment_filter",
        "x5_normalize_text", "x5_dedup_segments", "x5_domain_filter",
        "x5_truncate_tokens", "x9_dataset_diff", "x9_outlier_filter",
        "x9_profile", "e1_composition", "s4_transform_by_id",
        "x2_contamination_score", "x2_winnow_pairs", "x2_cross_neardup",
        "x3_matryoshka", "x3_random_projection", "x6_rolling_agg",
        "x6_time_rollup", "x6_sliding_windows", "x7_temperature_mix",
        "x2_edit_pairs", "x9_quantile_bin", "x9_classifier_eval",
        "x2_components", "m5_counter", "streaming_hybrid_lag",
        "x8_hybrid_exact",
    }
    assert len(must_be_in_window) == 50, len(must_be_in_window)
    out = must_be_in_window - set(window)
    assert not out, f"required queries outside the checked window: {out}"
    # Every hash-checkable query NOT in this round's window must sit
    # in the tail WITH its oracle intact (the tail test below checks
    # each against DuckDB locally every run, so eviction never means
    # unchecked). Programmatic since r11 — the hand-maintained
    # evictee list grew unmaintainable as rotations compounded.
    oracles = set(entrymod.oracle_sql())
    tail_hash = [k for k in qkeys[50:] if k in oracles]
    evicted = oracles - must_be_in_window
    misplaced = evicted - set(tail_hash)
    assert not misplaced, (
        f"hash-checkable evictees missing from the tail: {misplaced}")


def test_tail_hash_checkable_queries_match_oracle_locally(spark, con):
    """Hash-checkable queries parked OUTSIDE the driver's 50-slot window
    (slots 51+) lose their external end-to-end check — run the same
    rows/columns/values comparison here so eviction from the window
    never means unchecked. Uses the oracle harness's own compare
    (tools/oracle_check.py) at sf0.001."""
    from tools.oracle_check import compare

    qdict = entrymod.queries()
    oracles = entrymod.oracle_sql()
    tail = [k for k in list(qdict)[50:] if k in oracles]
    assert tail, "no hash-checkable tail queries — window layout changed?"
    for name in tail:
        spark_pdf = qdict[name](spark, SF).toPandas()
        oracle_pdf = con.sql(oracles[name]).df()
        verdict = compare(name, spark_pdf, oracle_pdf)
        assert verdict == "OK", f"{name}: {verdict}"


def test_lens_registry_count_matches_docs():
    """One source of truth for the registered-lens count (r6 verdict
    #8: SURVEY said 47, README 115, registry had 113): both docs must
    state the live registry's size."""
    import re
    import subprocess
    import sys

    # count in a fresh interpreter: tests (and the entry module) add
    # dynamically-registered python lenses to the same registry, so
    # the in-process count depends on test order
    n = int(subprocess.run(
        [sys.executable, "-c",
         "import lens_spark.operators;"
         "from lens_spark.operators.base import _BUILTINS;"
         "print(len(_BUILTINS))"],
        capture_output=True, text=True, check=True).stdout.strip())
    survey = open("SURVEY.md").read()
    m = re.search(r"`lens_spark.operators` \((\d+) total", survey)
    assert m, "SURVEY.md §2.8 lens-count line missing"
    assert int(m.group(1)) == n, (
        f"SURVEY.md says {m.group(1)} lenses, registry has {n}")
    readme = open("README.md").read()
    m = re.search(r"\((\d+) lenses", readme)
    assert m, "README.md lens-count line missing"
    assert int(m.group(1)) == n, (
        f"README.md says {m.group(1)} lenses, registry has {n}")


def test_survey_table_matches_declared_queries():
    """SURVEY.md §2.8's operator table and query-count line must match
    the entry file exactly — the structural guard against the doc
    drift the round-4 verdict flagged (declared '72 queries', shipped
    71). Every backticked query name in the table must exist with the
    claimed check kind (O ⟺ has an oracle), and the '<N> queries
    total: <M> oracle hash-matched' line must equal the real counts."""
    import re

    qdict = entrymod.queries()
    oracles = entrymod.oracle_sql()
    text = open("SURVEY.md").read()
    m = re.search(r"(\d+) queries total: (\d+) oracle hash-matched", text)
    assert m, "SURVEY.md count line missing"
    assert int(m.group(1)) == len(qdict), (
        f"SURVEY says {m.group(1)} queries, entry declares {len(qdict)}")
    assert int(m.group(2)) == len(oracles), (
        f"SURVEY says {m.group(2)} oracles, entry declares {len(oracles)}")
    # every `name` (O)/(R) claim in the §2.8 table is true
    sect = text[text.index("| Lens / operator |"):]
    sect = sect[:sect.index("queries total:")]
    bad = []
    for names, kind in re.findall(r"((?:`\w+`(?:,\s*)?)+)\s*\((O|R)[\s)]",
                                  sect):
        for name in re.findall(r"`(\w+)`", names):
            if name not in qdict:
                bad.append(f"{name}: listed but not declared")
            elif kind == "O" and name not in oracles:
                bad.append(f"{name}: claimed (O) but has no oracle")
            elif kind == "R" and name in oracles:
                bad.append(f"{name}: claimed (R) but has an oracle")
    assert not bad, bad


def test_bench_regressions_section_math():
    """bench.py's round-over-round regression attribution (r7 verdict
    #5): calibrated ratios, >1.15 flagging, min-vs-median noise
    separation, and the compact official payload — pinned on synthetic
    numbers so the section cannot silently break between rounds."""
    import bench

    prev = bench._load_prev_bench(".")
    assert prev is not None and prev[0] >= 7  # committed BENCH_r*.json
    pcal = float(prev[1]["calibration"])
    some = list(prev[1]["queries"].items())[:3]
    assert len(some) == 3
    (n0, t0), (n1, t1), (n2, t2) = some
    cal = pcal * 2.0  # machine "twice as slow" this round
    timings = {
        n0: t0 * 2.0,          # calibrated ratio 1.0 — not flagged
        n1: t1 * 2.0 * 1.30,   # calibrated ratio 1.3 — flagged
        n2: t2 * 2.0 * 0.80,   # improvement — not flagged
        "brand_new_query": 1.0,  # no prev entry — skipped
    }
    stats = {k: {"min": v * 0.9} for k, v in timings.items()}
    side, official = bench._regressions(timings, stats, cal, ".")
    assert side["vs_round"] == prev[0]
    assert set(side["table"]) == {n0, n1, n2}
    assert abs(side["table"][n0]["x"] - 1.0) < 0.01
    assert abs(side["table"][n1]["x"] - 1.3) < 0.01
    assert abs(side["table"][n1]["xmin"] - 1.17) < 0.01
    # raw multipliers (r11): no calibration division — the machine
    # being 2x slower shows up in xr but not x
    assert abs(side["table"][n0]["xr"] - 2.0) < 0.01
    assert abs(side["table"][n1]["xr"] - 2.6) < 0.01
    assert abs(side["table"][n1]["xrmin"] - 2.34) < 0.01
    assert set(official["flagged"]) == {n1}
    assert abs(official["flagged"][n1]["xr"] - 2.6) < 0.01
    # AND rule (r11): calibrated-only exceedance does NOT flag — a
    # machine 2x FASTER (cal halves) with a query only 40% faster
    # gives x = 1.2 but xr = 0.6; that is calibration drift, counted
    # in the sidecar, not flagged
    timings2 = {n0: t0 * 0.6}
    stats2 = {n0: {"min": t0 * 0.55}}
    side2, official2 = bench._regressions(timings2, stats2,
                                          pcal * 0.5, ".")
    assert abs(side2["table"][n0]["x"] - 1.2) < 0.01
    assert abs(side2["table"][n0]["xr"] - 0.6) < 0.01
    assert official2["flagged"] == {}
    assert side2["n_flagged_cal_only"] == 1
    # no BENCH files ⇒ section degrades to absent, bench still runs
    assert bench._regressions(timings, stats, cal, "/tmp") == (None, None)


def test_bench_positional_calibration_gate(monkeypatch):
    """r14: when both rounds carry cal3, the flag gate normalizes each
    query by the machine speed interpolated at ITS session position
    (xp) instead of the session median. Pinned on a synthetic prev:
    (1) an anomalous 2x-slow START this round clears the early query
    the median gate would have flagged (xp ≈ 1), while a genuinely
    slow LATE query stays flagged; (2) matching flat shapes make
    xp == x; (3) without cal3 the rule falls back to the r11 median
    gate."""
    import bench

    # 9 queries at 1s each, flat prev session (cal 0.5 everywhere)
    names = [f"q{i}" for i in range(9)]
    prev = {"queries": {n: 1.0 for n in names},
            "calibration": 0.5, "cal3": [0.5, 0.5, 0.5]}
    monkeypatch.setattr(bench, "_load_prev_bench", lambda here: (13, prev))
    # this round: start ran 2x slow (cal3 [1.0, 0.5, 0.5]); q0 ran
    # 1.9x prev purely because of that; q8 ran 1.5x prev with the
    # machine at parity there
    timings = {n: 1.0 for n in names}
    timings["q0"], timings["q8"] = 1.9, 1.5
    stats = {k: {"min": v * 0.95} for k, v in timings.items()}
    side, official = bench._regressions(
        timings, stats, 0.5, ".", cal3=[1.0, 0.5, 0.5])
    assert side["rule"] == "xp AND xr"
    e = side["table"]["q0"]
    # median gate would flag (x 1.9); positional divides by the ~2x
    # start speed and clears it
    assert e["x"] > 1.15 and e["xp"] < 1.05
    assert "q0" not in official["flagged"]
    lt = side["table"]["q8"]
    assert lt["xp"] > 1.15 and "q8" in official["flagged"]
    # matching flat shapes: xp == x exactly
    side2, _ = bench._regressions(timings, stats, 0.5, ".",
                                  cal3=[0.5, 0.5, 0.5])
    assert side2["table"]["q8"]["xp"] == side2["table"]["q8"]["x"]
    # no cal3 this round ⇒ r11 median rule, no xp column
    side3, _ = bench._regressions(timings, stats, 0.5, ".")
    assert side3["rule"] == "x AND xr"
    assert "xp" not in side3["table"]["q0"]


def test_bench_rerun_flagged_math(monkeypatch):
    """bench.py's fresh-process flag re-run (r12 verdict #6, r13
    verdict #3 + advice): the re-run multipliers are computed against
    the PREVIOUS round (raw and calibrated), a flag whose re-run falls
    under the threshold is marked drift, a still-hot flag is not, a
    failed subprocess leaves the flag STANDING as an explicit
    inconclusive record (never silently absent, never dismissed),
    EVERY flag gets a verdict (no worst-5 coverage cap), runs are
    allocated coverage-first (round-robin passes), and drift is only
    declared on >= 2 conclusive runs."""
    import json as _json
    import subprocess
    import types

    import bench

    # 7 flags — more than the old worst-5 cap — every one gets a row
    prev = {"queries": {f"q{i}": 1.0 for i in range(7)},
            "calibration": 0.5}
    prev["queries"]["qb"] = 2.0
    flagged = {f"q{i}": {"x": 1.5 - i * 0.01} for i in range(7)}
    flagged["qb"] = {"x": 1.3}

    calls = {"n": 0}

    def fake_run(cmd, **kw):
        name = cmd[-1]
        calls["n"] += 1
        if name == "q2":
            raise OSError("boom")  # re-run failure: flag stands
        sec = {"qb": 3.0, "q1": 1.0}.get(name, 1.0)
        if name == "q3":
            sec = 2.0  # stays hot
        return types.SimpleNamespace(
            stdout=_json.dumps({"query": name, "sec": sec,
                                "calibration": 0.5}) + "\n",
            returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = bench._rerun_flagged(flagged, prev, ".", "/unused")
    assert set(out) == set(flagged), "every flag carries a verdict"
    assert out["q0"]["drift"] is True and out["q0"]["xr"] == 1.0
    assert out["qb"]["drift"] is False and out["qb"]["xr"] == 1.5
    assert out["qb"]["x"] == 1.5  # same cal both rounds → x == xr
    assert out["q3"]["drift"] is False and out["q3"]["xr"] == 2.0
    # the failed query is an explicit inconclusive, never a dismissal
    assert out["q2"] == {"runs": 0, "inconclusive": True,
                         "drift": False}
    # coverage-first: the worst 5 get a 3rd pass, the rest got 2 runs
    assert out["q0"]["runs"] == 3 and out["q5"]["runs"] == 2

    # r13 advice: a single-run re-run must NOT dismiss a flag as
    # drift — even at parity it is inconclusive
    def fake_run_once(cmd, **kw):
        if calls["n2"] > 0:
            raise OSError("deadline")  # later passes truncated
        calls["n2"] += 1
        return types.SimpleNamespace(
            stdout=_json.dumps({"query": cmd[-1], "sec": 1.0,
                                "calibration": 0.5}) + "\n",
            returncode=0)

    calls["n2"] = 0
    monkeypatch.setattr(subprocess, "run", fake_run_once)
    out2 = bench._rerun_flagged({"q0": {"x": 1.5}}, prev, ".", "/u")
    assert out2["q0"]["runs"] == 1
    assert out2["q0"]["inconclusive"] is True
    assert out2["q0"]["drift"] is False, \
        "one sample at parity must leave the flag standing"

    # cal <= 0 makes the calibrated multiplier undefined: inconclusive
    def fake_run_badcal(cmd, **kw):
        return types.SimpleNamespace(
            stdout=_json.dumps({"query": cmd[-1], "sec": 1.0,
                                "calibration": 0.0}) + "\n",
            returncode=0)

    monkeypatch.setattr(subprocess, "run", fake_run_badcal)
    out3 = bench._rerun_flagged({"q0": {"x": 1.5}}, prev, ".", "/u")
    assert out3["q0"]["x"] is None
    assert out3["q0"]["inconclusive"] is True
    assert out3["q0"]["drift"] is False


def test_readme_query_counts_match_entry():
    """README's driver-contract line must match the entry file (the
    r12-nit drift class: hand-maintained counts drifted twice in two
    rounds — pin every count the docs still state)."""
    import re

    qdict = entrymod.queries()
    oracles = entrymod.oracle_sql()
    readme = open("README.md").read()
    m = re.search(r"driver contract: (\d+) queries, (\d+) with DuckDB",
                  readme)
    assert m, "README driver-contract count line missing"
    assert int(m.group(1)) == len(qdict), (
        f"README says {m.group(1)} queries, entry declares {len(qdict)}")
    assert int(m.group(2)) == len(oracles), (
        f"README says {m.group(2)} oracles, entry declares {len(oracles)}")
    # SURVEY.md states the same split plus the rows-only count (r13
    # nit: "27 rows-only" went stale because only 177/148 were pinned)
    survey = open("SURVEY.md").read()
    m = re.search(r"(\d+) queries total: (\d+) oracle hash-matched",
                  survey)
    assert m, "SURVEY.md query-count line missing"
    assert (int(m.group(1)), int(m.group(2))) == (len(qdict),
                                                  len(oracles))
    m = re.search(r"(\d+) rows-only", survey)
    assert m, "SURVEY.md rows-only count missing"
    assert int(m.group(1)) == len(qdict) - len(oracles), (
        f"SURVEY.md says {m.group(1)} rows-only, entry declares "
        f"{len(qdict) - len(oracles)}")
    # and the queries() docstring itself states the rows-only count
    m = re.search(r"the (\d+) rows-only", entrymod.queries.__doc__)
    assert m and int(m.group(1)) == len(qdict) - len(oracles)
