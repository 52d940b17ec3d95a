"""Relational built-in lens tests (join/aggregate/window/sort/limit/set ops).

These lenses have no reference counterpart (SURVEY.md §2.6 — the engine
vocabulary is Transform/Inverse only); they are the Spark-first
expression of "arbitrary transform in a pipeline". Tests run the spec
path end-to-end through engine.append.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lens_spark import engine
from lens_spark.errors import LensError
from lens_spark.operators.base import make_lens

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_join_broadcast_plan_and_rows(spark, orders):
    spec = {"lenses": [{"name": "join", "arguments": {
        "right": f"{SF}/customer.parquet", "on": "o_custkey = c_custkey",
        "broadcast": True, "select": ["c_custkey", "c_name"]}}]}
    out = engine.append(orders, spec)
    assert out.count() == orders.count()  # every order has a customer
    # the broadcast flag must actually produce a broadcast join
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()


def test_join_by_view_and_column_list(spark, orders):
    spark.read.parquet(f"{SF}/customer.parquet") \
        .withColumnRenamed("c_custkey", "o_custkey") \
        .createOrReplaceTempView("cust_v")
    spec = {"lenses": [{"name": "join", "arguments": {
        "right_view": "cust_v", "on": ["o_custkey"], "how": "left",
        "select": ["o_custkey", "c_mktsegment"]}}]}
    out = engine.append(orders, spec)
    assert "c_mktsegment" in out.columns
    assert out.count() == orders.count()


def test_join_requires_exactly_one_right(spark, orders):
    with pytest.raises(LensError):
        engine.append(orders, {"lenses": [{"name": "join",
                                           "arguments": {"on": ["x"]}}]})


def test_aggregate_group_and_rollup(spark, orders):
    spec = {"lenses": [{"name": "aggregate", "arguments": {
        "keys": ["o_orderstatus"], "aggs": {"n": "count(*)"}}}]}
    got = {r.o_orderstatus: r.n for r in engine.append(orders, spec).collect()}
    want = {r.o_orderstatus: r["count"] for r in
            orders.groupBy("o_orderstatus").count().collect()}
    assert got == want

    roll = engine.append(orders, {"lenses": [{"name": "aggregate", "arguments": {
        "keys": ["o_orderstatus"], "mode": "rollup",
        "aggs": {"n": "count(*)"}}}]})
    rows = {(r.o_orderstatus, r.n) for r in roll.collect()}
    assert (None, orders.count()) in rows  # grand-total row
    assert len(rows) == len(want) + 1


def test_window_topk_and_global_guard(spark, orders):
    spec = {"lenses": [{"name": "window", "arguments": {
        "partition_by": ["o_orderpriority"],
        "order_by": ["o_totalprice desc"], "k": 2, "out": "rk"}}]}
    out = engine.append(orders, spec)
    counts = out.groupBy("o_orderpriority").count().collect()
    assert all(r["count"] <= 2 for r in counts)
    # inverse drops the assigned column
    assert "rk" not in make_lens("window", spec["lenses"][0]["arguments"]) \
        .inverse(out).columns

    with pytest.raises(LensError):
        make_lens("window", {"order_by": ["o_totalprice"]})


def test_sort_and_limit(spark, orders):
    spec = {"lenses": [
        {"name": "sort", "arguments": {"by": ["o_totalprice desc"]}},
        {"name": "limit", "arguments": {"n": 5}},
    ]}
    rows = engine.append(orders, spec).collect()
    assert len(rows) == 5
    prices = [r.o_totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_set_ops(spark, orders):
    f = orders.filter("o_orderstatus = 'F'").select("o_custkey")
    o = orders.filter("o_orderstatus = 'O'").select("o_custkey")
    f.createOrReplaceTempView("f_orders")
    o.createOrReplaceTempView("o_orders")

    got = engine.append(f, {"lenses": [{"name": "except", "arguments": {
        "right_view": "o_orders"}}]})
    want = f.subtract(o)
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0

    inter = engine.append(f, {"lenses": [{"name": "intersect", "arguments": {
        "right_view": "o_orders"}}]})
    assert inter.count() == f.intersect(o).count()

    uni = engine.append(f, {"lenses": [{"name": "union", "arguments": {
        "right_view": "o_orders", "distinct": True}}]})
    assert uni.count() == f.union(o).distinct().count()


def test_salted_join_equals_plain_join(spark):
    """Salting must not change join semantics — only the key spread."""
    import random
    from lens_spark.operators.relational import salted_join

    random.seed(7)
    # heavy skew: 90% of left rows share one key
    left = spark.createDataFrame(
        [(1 if random.random() < 0.9 else random.randint(2, 50), i)
         for i in range(5000)], "k long, v long")
    right = spark.createDataFrame([(k, f"r{k}") for k in range(1, 51)],
                                  "k long, payload string")
    plain = left.join(right, ["k"])
    salted = salted_join(left, right, ["k"], salt=8)
    assert salted.count() == plain.count()
    assert salted.subtract(plain).count() == 0
    assert plain.subtract(salted).count() == 0
    # outer rows with no match survive with nulls under left join
    lonely = spark.createDataFrame([(999, 1)], "k long, v long")
    lo = salted_join(left.union(lonely), right, ["k"], salt=8, how="left")
    assert lo.count() == plain.count() + 1


def test_salted_join_rejects_right_preserving_how(spark):
    from lens_spark.errors import LensError
    from lens_spark.operators.relational import salted_join

    left = spark.createDataFrame([(1, "a")], "k long, v string")
    right = spark.createDataFrame([(1, "x"), (2, "y")], "k long, w string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(LensError, match="not supported"):
            salted_join(left, right, ["k"], salt=4, how=how)


def test_salted_join_spreads_hot_key(spark):
    from lens_spark.operators.relational import salted_join
    left = spark.createDataFrame([(1, i) for i in range(1000)], "k long, v long")
    right = spark.createDataFrame([(1, "x")], "k long, p string")
    out = salted_join(left, right, ["k"], salt=8)
    # the single hot key must hash to several distinct salt values
    import pyspark.sql.functions as F
    n_salts = left.withColumn(
        "__salt", F.pmod(F.xxhash64("v"), F.lit(8))
    ).select("__salt").distinct().count()
    assert n_salts == 8
    assert out.count() == 1000


def test_window_agg_running_and_lag(spark, orders):
    spec = {"lenses": [
        {"name": "window_agg", "arguments": {
            "partition_by": ["o_custkey"],
            "order_by": ["o_orderdate asc", "o_orderkey asc"],
            "aggs": {"running": "sum(o_totalprice)"},
            "frame": "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"}},
        {"name": "window_agg", "arguments": {
            "partition_by": ["o_custkey"],
            "order_by": ["o_orderdate asc", "o_orderkey asc"],
            "aggs": {"prev": "lag(o_totalprice, 1)"}}},
    ]}
    out = engine.append(orders, spec)
    one = (out.filter(F.col("o_custkey") == out.select("o_custkey").first()[0])
           .orderBy("o_orderdate", "o_orderkey").collect())
    acc = 0.0
    for i, r in enumerate(one):
        acc += r.o_totalprice
        assert abs(r.running - acc) < 1e-6
        if i == 0:
            assert r.prev is None
        else:
            assert r.prev == one[i - 1].o_totalprice
    # Same partitioning + ordering in both stages → Catalyst must plan a
    # single Exchange (one shuffle, two Window nodes or one merged).
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_window_agg_global_guard(spark, orders):
    with pytest.raises(LensError):
        make_lens("window_agg", {"order_by": ["o_orderkey"],
                                 "aggs": {"s": "sum(o_totalprice)"}})


def test_pivot_unpivot_roundtrip(spark, orders):
    pivot_spec = {"lenses": [{"name": "pivot", "arguments": {
        "keys": ["o_orderpriority"], "pivot_col": "o_orderstatus",
        "values": ["F", "O", "P"], "agg": "sum(o_totalprice)"}}]}
    wide = engine.append(orders, pivot_spec)
    assert sorted(wide.columns) == ["F", "O", "P", "o_orderpriority"]
    # pivot cell == the plain filtered aggregate
    cell = wide.filter("o_orderpriority = '1-URGENT'").select("F").first()[0]
    expect = orders.filter(
        "o_orderpriority = '1-URGENT' AND o_orderstatus = 'F'"
    ).agg(F.sum("o_totalprice")).first()[0]
    assert abs(cell - expect) < 1e-6

    # unpivot then its inverse (re-pivot by first) restores the wide shape
    unpivot = make_lens("unpivot", {
        "ids": ["o_orderpriority"], "values": ["F", "O", "P"],
        "var_name": "measure", "value_name": "value"})
    tall = unpivot.forward(wide)
    assert tall.count() == wide.count() * 3
    back = unpivot.inverse(tall)
    assert sorted(back.columns) == sorted(wide.columns)
    assert back.count() == wide.count()


def test_grouping_sets_matches_union_of_groupbys(spark, orders):
    spec = {"lenses": [{"name": "aggregate", "arguments": {
        "keys": ["o_orderstatus", "o_orderpriority"], "mode": "grouping_sets",
        "sets": [["o_orderstatus"], ["o_orderpriority"]],
        "aggs": {"n": "count(*)"}}}]}
    out = engine.append(orders, spec)
    n_status = orders.select("o_orderstatus").distinct().count()
    n_prio = orders.select("o_orderpriority").distinct().count()
    assert out.count() == n_status + n_prio


def test_range_join_matches_nested_loop(spark):
    from lens_spark.sources import read_ns_timestamps

    ev = read_ns_timestamps(spark, f"{SF}/events.parquet")
    inc = ev.filter("event_id % 97 = 0").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts").alias("start_ts"),
        F.expr("ts + INTERVAL 7 MINUTES").alias("end_ts"))
    inc.createOrReplaceTempView("rj_incidents")
    spec = {"lenses": [{"name": "range_join", "arguments": {
        "right_view": "rj_incidents", "ts": "ts", "start": "start_ts",
        "end": "end_ts", "bin_seconds": 180,  # < interval: spans ≥3 bins
        "select": ["incident_id"]}}]}
    got = engine.append(ev, spec).select("incident_id", "event_id")
    expect = ev.join(inc, (ev.ts >= inc.start_ts) & (ev.ts < inc.end_ts)) \
        .select("incident_id", "event_id")
    assert got.count() == expect.count()
    assert got.exceptAll(expect).count() == 0
    # and the binned form must be an equi hash join, not a nested loop
    plan = engine.append(ev, spec)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan


def test_semi_anti_join_lenses(spark, orders):
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    spec = {"lenses": [{"name": "join", "arguments": {
        "right": f"{SF}/orders.parquet", "on": "c_custkey = o_custkey",
        "how": "left_semi"}}]}
    semi = engine.append(cust, spec)
    assert semi.columns == cust.columns  # semi join never widens
    with_orders = cust.join(orders.select("o_custkey").distinct(),
                            cust.c_custkey == F.col("o_custkey")).count()
    assert semi.count() == with_orders


def test_dataset_diff_labels_and_digest_compare(spark):
    """added/removed/changed labeled per key; unchanged excluded by
    default and included on request; compare= restricts which columns
    count as change."""
    from lens_spark.operators.relational import dataset_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id long, txt string, score long")
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)],
        "id long, txt string, score long")
    got = {r.id: r.status for r in
           dataset_diff(old, new, ["id"]).collect()}
    assert got == {2: "changed", 3: "removed", 4: "added"}
    full = {r.id: r.status for r in
            dataset_diff(old, new, ["id"], include_unchanged=True).collect()}
    assert full[1] == "unchanged" and len(full) == 4
    # comparing only `score`: row 2's txt edit no longer counts
    scored = {r.id: r.status for r in
              dataset_diff(old, new, ["id"], compare=["score"]).collect()}
    assert scored == {3: "removed", 4: "added"}


def test_dataset_diff_rejects_unknown_compare_column(spark):
    from lens_spark.errors import LensError
    from lens_spark.operators.relational import dataset_diff

    df = spark.createDataFrame([(1, "x")], "id long, txt string")
    with pytest.raises(LensError, match="compare columns"):
        dataset_diff(df, df, ["id"], compare=["nope"])


def test_outlier_filter_zscore_and_iqr(spark):
    """A planted extreme value is dropped by both envelopes; the bulk
    survives; unknown method raises."""
    from lens_spark.operators.relational import outlier_filter

    rows = [(i, float(v)) for i, v in enumerate([10, 11, 9, 10, 12, 8,
                                                 10, 11, 9, 1000])]
    df = spark.createDataFrame(rows, "id long, v double")
    z = {r.id for r in outlier_filter(df, "v", method="zscore",
                                      k=2.0).collect()}
    i = {r.id for r in outlier_filter(df, "v", method="iqr",
                                      k=1.5).collect()}
    assert 9 not in z and 9 not in i          # the 1000 row
    assert z >= set(range(9)) - {9} and i >= set(range(9))
    with pytest.raises(LensError, match="unknown method"):
        outlier_filter(df, "v", method="mad").collect()


def test_dataset_diff_null_column_swap_is_changed(spark):
    """(NULL, 'x') -> ('x', NULL) must be 'changed' — bare hash exprs
    skip NULLs and would collide the two digests."""
    from lens_spark.operators.relational import dataset_diff

    old = spark.createDataFrame([(1, None, "x")],
                                "id long, a string, b string")
    new = spark.createDataFrame([(1, "x", None)],
                                "id long, a string, b string")
    got = {r.id: r.status for r in dataset_diff(old, new, ["id"]).collect()}
    assert got == {1: "changed"}


def test_frequent_items_no_false_negatives(spark):
    """Every value with true frequency >= support appears (the sketch's
    guarantee); a value far below support with many distinct siblings
    is typically pruned."""
    from lens_spark import engine

    rows = [(i, "hot") for i in range(60)]            # 60% frequency
    rows += [(100 + i, "warm") for i in range(25)]    # 25%
    rows += [(1000 + i, f"cold{i}") for i in range(15)]  # 1% each
    df = spark.createDataFrame(rows, "id long, v string")
    out = engine.append(df, {"lenses": [{"name": "frequent_items",
                                         "arguments": {"column": "v",
                                                       "support": 0.2}}]})
    items = {r.item for r in out.collect()}
    assert {"hot", "warm"} <= items


def test_dataset_profile_nulls_and_distincts(spark):
    from lens_spark.operators.relational import dataset_profile

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "k long, v string")
    got = {r.col_name: (r.null_frac, r.n_distinct) for r in
           dataset_profile(df, exact=True).collect()}
    assert got == {"k": (0.25, 3), "v": (0.25, 2)}
    # approx path: same shape, HLL cardinality within 10% here
    approx = {r.col_name: r.n_distinct for r in
              dataset_profile(df).collect()}
    assert set(approx) == {"k", "v"}
    assert abs(approx["k"] - 3) <= 1 and abs(approx["v"] - 2) <= 1
    # column subset respected
    sub = dataset_profile(df, ["v"], exact=True).collect()
    assert len(sub) == 1 and sub[0].col_name == "v"


def test_time_rollup_grains_consistent(spark, sf_dir):
    """The multi-resolution rollup's grains must agree: day-grain
    totals equal the sum of that day's hour-grain rows, and the
    grand-total row equals the full event count — one Expand pass
    produces an internally consistent hierarchy."""
    import __spark_entry__ as entrymod

    out = entrymod.q_x6_time_rollup(spark, sf_dir).collect()
    ev_n = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    grand = [r for r in out
             if r.hour is None and r.day is None and r.event_type is None]
    assert len(grand) == 1 and grand[0].n_events == ev_n
    day_totals = {r.day: r.n_events for r in out
                  if r.day is not None and r.event_type is None}
    hour_by_day = {}
    for r in out:
        if r.hour is not None and r.event_type is None:
            day = r.hour.replace(hour=0, minute=0, second=0, microsecond=0)
            hour_by_day[day] = hour_by_day.get(day, 0) + r.n_events
    assert day_totals == hour_by_day
    assert sum(day_totals.values()) == ev_n


# --- quantile_bin -------------------------------------------------------

def test_quantile_bin_quartiles(spark):
    from lens_spark.operators.relational import quantile_bin
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)],
                               "v double")
    out = quantile_bin(df, "v")
    counts = {r.bin: r.n for r in
              out.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    # thresholds 25.75/50.5/75.25 → 25/25/25/25 split
    assert counts == {0: 25, 1: 25, 2: 25, 3: 25}


def test_quantile_bin_boundary_goes_low(spark):
    from lens_spark.operators.relational import quantile_bin
    # median of [1,2,3] = 2.0; the value 2.0 must land in the LOWER bin
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "v double")
    got = {r.v: r.bin for r in quantile_bin(df, "v", probs=[0.5]).collect()}
    assert got == {1.0: 0, 2.0: 0, 3.0: 1}


def test_quantile_bin_exact_guard_auto_switches(spark):
    """r6 verdict #4: exact=True must NOT reach Spark's exact
    percentile aggregate (state ∝ distinct values → 100 TB OOM) when
    the cardinality probe exceeds the bound — it degrades to
    percentile_approx instead. Assert on the physical plan: the approx
    aggregate appears, the exact one does not."""
    from lens_spark.operators.relational import quantile_bin
    df = spark.range(5000).selectExpr("cast(id as double) as v")
    out = quantile_bin(df, "v", exact=True, exact_distinct_limit=100)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" in plan
    assert "percentile(" not in plan.replace("percentile_approx(", "")
    # and it still bins correctly (approx == exact on this tiny frame)
    counts = {r.bin: r.n for r in
              out.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 5000 and set(counts) == {0, 1, 2, 3}


def test_quantile_bin_freq_percentile_bit_identical(spark):
    """r14 optimization candidate (measured then rejected — the freq
    form's extra value-shuffle lost to the raw-row aggregate on the
    benched high-cardinality column; see quantile_bin's note): the
    equivalence fact stays pinned for any future low-cardinality
    revisit — percentile over a (value, frequency) pre-aggregate
    builds the same value→count buffer, so its interpolated
    thresholds are BIT-identical to the raw-row aggregate."""
    import struct

    vals = [float(i % 13) / 7.0 for i in range(997)]  # dups + irrationals
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    probs = [0.1, 0.25, 0.5, 0.75, 0.9]
    arr = F.array(*[F.lit(p) for p in probs])
    direct = df.agg(F.percentile(F.col("v"), arr).alias("p")).first()["p"]
    via_freq = (df.groupBy("v").agg(F.count(F.lit(1)).alias("f"))
                .agg(F.percentile(F.col("v"), arr, F.col("f"))
                     .alias("p")).first()["p"])
    assert [struct.pack("d", a) for a in direct] == \
           [struct.pack("d", b) for b in via_freq]


def test_quantile_bin_exact_kept_below_limit(spark):
    """Below the bound the exact aggregate is kept (the oracle-checked
    test-SF behavior is unchanged). r9: the guard is ONE fused probe
    aggregate — COUNT(*) and approx_count_distinct in a single job on
    every input shape (distinct ≤ rows, so clearing either counter
    keeps exact); this frame clears it and must produce the exact
    plan."""
    from lens_spark.operators.relational import quantile_bin
    df = spark.range(100).selectExpr("cast(id as double) as v")
    out = quantile_bin(df, "v", exact=True)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "percentile_approx" not in plan


def test_quantile_bin_distinct_hint_skips_probe_job(spark):
    """r8 verdict #8: a caller-asserted distinct bound decides the
    exact/approx switch with ZERO probe jobs — no aggregate runs
    before the plan is built. Verified via the status tracker: job
    count is unchanged by building the plan; the hint alone picks the
    engine (below limit → exact, above → approx)."""
    from lens_spark.operators.relational import quantile_bin

    df = spark.range(5000).selectExpr("cast(id as double) as v")
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    exact_plan = quantile_bin(df, "v", exact=True, distinct_hint=5000) \
        ._jdf.queryExecution().optimizedPlan().toString()
    approx_plan = quantile_bin(df, "v", exact=True, distinct_hint=5000,
                               exact_distinct_limit=100) \
        ._jdf.queryExecution().optimizedPlan().toString()
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "distinct_hint must not launch probe jobs"
    assert "percentile_approx" not in exact_plan
    assert "percentile_approx" in approx_plan


def test_quantile_bin_bad_probs(spark):
    import pytest as _pytest
    from lens_spark.errors import LensError
    from lens_spark.operators.relational import quantile_bin
    df = spark.createDataFrame([(1.0,)], "v double")
    for bad in ([], [0.7, 0.3], [0.0, 0.5], [0.5, 1.0]):
        with _pytest.raises(LensError, match="probs"):
            quantile_bin(df, "v", probs=bad)


def test_quantile_bin_lens_inverse(spark):
    from lens_spark import engine
    df = spark.createDataFrame([(1.0,), (9.0,)], "v double")
    spec = {"lenses": [{"name": "quantile_bin", "arguments": {
        "column": "v", "probs": [0.5]}}]}
    out = engine.append(df, spec)
    assert {r.v: r.bin for r in out.collect()} == {1.0: 0, 9.0: 1}
    back = engine.append(out, engine.invert(spec))
    assert back.columns == ["v"]


def test_quantile_bin_rank_select_percentile_bit_identical(spark):
    """r15 (verdict #3): exact-mode thresholds now come from a
    (value, count) rank selection — groupBy counts, one cumulative
    window over the distinct values, min(value WHERE cum > rank) with
    Percentile.getPercentile's exact interpolation op sequence —
    instead of the percentile AGGREGATE (whose value→count map merge
    was 3.4 s of the benched 4 s). Pin bit-identity of the
    interpolated thresholds against F.percentile on a duplicate-heavy
    set whose ranks all require interpolation, and pin the operator's
    bin output against literal percentile thresholds."""
    import math
    import struct

    from pyspark.sql import Window as W

    from lens_spark.operators.relational import quantile_bin

    vals = ([float(i % 13) / 7.0 for i in range(997)]
            + [2.5] * 3 + [-1.0 / 3.0] * 2)
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    probs = [0.1, 0.25, 0.5, 0.75, 0.9]
    arr = F.array(*[F.lit(p) for p in probs])
    direct = df.agg(F.percentile(F.col("v"), arr).alias("p")).first()["p"]

    # the operator's selection math, unrounded, on the same frame
    n = len(vals)
    counts = df.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    cum = counts.withColumn(
        "cum", F.sum("c").over(W.orderBy(F.col("v")).rowsBetween(
            W.unboundedPreceding, W.currentRow)))
    aggs = []
    for i, p in enumerate(probs):
        pos = float(n - 1) * p
        lo, hi = math.floor(pos), math.ceil(pos)
        aggs.append(F.min(F.when(F.col("cum") > lo, F.col("v")))
                    .alias(f"lo{i}"))
        aggs.append(F.min(F.when(F.col("cum") > hi, F.col("v")))
                    .alias(f"hi{i}"))
    sel = cum.agg(*aggs).first()
    got = []
    for i, p in enumerate(probs):
        pos = float(n - 1) * p
        lo, hi = math.floor(pos), math.ceil(pos)
        vlo, vhi = sel[f"lo{i}"], sel[f"hi{i}"]
        if hi == lo or vhi == vlo:
            got.append(vlo)
        else:
            got.append((float(hi) - pos) * vlo + (pos - float(lo)) * vhi)
    assert [struct.pack("d", a) for a in direct] == \
           [struct.pack("d", b) for b in got]

    # contract level: the operator's bins == bins from literal
    # percentile thresholds (6dp-rounded, the declared contract)
    out = quantile_bin(df, "v", probs=probs)
    thr = [round(t, 6) for t in direct]
    expect = df.withColumn(
        "bin", F.size(F.filter(F.array(*[F.lit(t) for t in thr]),
                               lambda t: F.col("v") > t)))
    assert sorted((r.v, r.bin) for r in out.collect()) == \
           sorted((r.v, r.bin) for r in expect.collect())
