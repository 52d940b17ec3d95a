"""Temporal operator tests: as-of join, sessionization, session windows."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from lens_spark import engine
from lens_spark.operators.temporal import asof_join, session_agg, sessionize


def ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 12, minute, second)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame(
        [(1, ts(0), 10.0), (1, ts(5), 11.0), (1, ts(10), 12.0),
         (2, ts(3), 99.0)],
        "key long, qts timestamp, price double")


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [(1, ts(4)), (1, ts(5)), (1, ts(20)), (2, ts(0)), (3, ts(1))],
        "key long, tts timestamp")


def test_asof_backward_picks_latest_at_or_before(quotes, trades):
    out = asof_join(trades, quotes, on="key", left_time="tts",
                    right_time="qts", payload=["price"])
    got = {(r.key, r.tts.minute): r.price for r in out.collect()}
    assert got[(1, 4)] == 10.0    # latest quote before 12:04 is 12:00
    assert got[(1, 5)] == 11.0    # exact-time match is inclusive
    assert got[(1, 20)] == 12.0
    assert got[(2, 0)] is None    # quote for key 2 is later than the trade
    assert got[(3, 1)] is None    # unseen key → left join null


def test_asof_forward(quotes, trades):
    out = asof_join(trades, quotes, on="key", left_time="tts",
                    right_time="qts", payload=["price"], direction="forward")
    got = {(r.key, r.tts.minute): r.price for r in out.collect()}
    assert got[(1, 4)] == 11.0    # next quote at/after 12:04 is 12:05
    assert got[(1, 5)] == 11.0    # inclusive
    assert got[(1, 20)] is None
    assert got[(2, 0)] == 99.0


def test_asof_tolerance(quotes, trades):
    out = asof_join(trades, quotes, on="key", left_time="tts",
                    right_time="qts", payload=["price"],
                    tolerance="INTERVAL 2 MINUTES")
    got = {(r.key, r.tts.minute): r.price for r in out.collect()}
    assert got[(1, 4)] is None    # 12:00 quote is 4 min stale → dropped
    assert got[(1, 5)] == 11.0    # exact match within tolerance
    # row count preserved (left-join semantics, stale matches nulled)
    assert out.count() == 5


def test_asof_row_count_never_changes(spark, quotes, trades):
    out = asof_join(trades, quotes, on="key", left_time="tts", right_time="qts")
    assert out.count() == trades.count()


def test_sessionize_gap_semantics(spark):
    ev = spark.createDataFrame(
        [(1, ts(0), 1), (1, ts(10), 2), (1, ts(45), 3), (1, ts(50), 4),
         (2, ts(0), 5)],
        "user long, ts timestamp, eid long")
    out = sessionize(ev, key="user", ts_col="ts", gap="30 minutes",
                     tie_break=["eid"])
    got = {r.eid: r.session_idx for r in out.collect()}
    # 12:00+12:10 → session 1; 35-min gap → 12:45+12:50 session 2
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}


def test_sessionize_lens_spec_and_inverse(spark):
    ev = spark.createDataFrame([(1, ts(0)), (1, ts(40))], "user long, ts timestamp")
    spec = {"lenses": [{"name": "sessionize", "arguments": {
        "key": "user", "ts": "ts", "gap": "30 minutes"}}]}
    out = engine.append(ev, spec)
    assert sorted(r.session_idx for r in out.collect()) == [1, 2]
    back = engine.append(out, engine.invert(spec))
    assert back.columns == ev.columns


def test_session_agg_matches_sessionize(spark):
    ev = spark.createDataFrame(
        [(1, ts(0), 1.0), (1, ts(10), 1.0), (1, ts(45), 1.0)],
        "user long, ts timestamp, value double")
    out = session_agg(ev, key="user", ts_col="ts", gap="30 minutes")
    rows = sorted(out.collect(), key=lambda r: r.session_start)
    assert len(rows) == 2
    assert rows[0].n_events == 2 and rows[1].n_events == 1
    # session extends gap past the last event
    assert rows[0].session_end == ts(40)


def test_session_agg_on_real_stream(spark, tmp_path):
    import shutil
    from lens_spark.streaming import read_file_stream, run_available_now

    src = "/root/testdata/sf0.001/events.parquet"
    d = tmp_path / "sessions_stream"
    d.mkdir()
    shutil.copy(src, d / "part-000.parquet")
    stream = read_file_stream(spark, str(d), schema_from=src, ts_cols=("ts",))
    got = run_available_now(
        session_agg(stream, key="user_id", ts_col="ts", gap="30 minutes",
                    watermark="1 hour"),
        output_mode="append")
    from lens_spark.sources import read_ns_timestamps
    batch = session_agg(read_ns_timestamps(spark, src), key="user_id",
                        ts_col="ts", gap="30 minutes")
    got_rows = {tuple(r) for r in got.collect()}
    batch_rows = {tuple(r) for r in batch.collect()}
    assert got_rows, "no sessions emitted"
    assert got_rows <= batch_rows  # watermark may withhold the tail


# --- time-bucketed asof (bucket=): equivalence + plan shape -------------

def _rand_events(spark, seed=7):
    """Randomized left/right with events straddling many 1-hour buckets,
    empty buckets, exact-boundary times, and right-empty keys."""
    import random

    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    lrows, rrows = [], []
    for k in range(6):
        for _ in range(40):
            lrows.append((k, base + dt.timedelta(
                minutes=rng.randrange(0, 60 * 48))))
        if k != 5:  # key 5 has no right rows at all
            for i in range(rng.randrange(1, 25)):
                rrows.append((k, base + dt.timedelta(
                    minutes=rng.randrange(0, 60 * 48)), float(k * 100 + i)))
    # exact bucket-boundary collisions
    lrows.append((0, base + dt.timedelta(hours=7)))
    rrows.append((0, base + dt.timedelta(hours=7), 777.0))
    left = spark.createDataFrame(lrows, "key long, tts timestamp")
    right = spark.createDataFrame(
        rrows, "key long, qts timestamp, price double").dropDuplicates(
        ["key", "qts"])
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_bucketed_equivalent_to_unbucketed(spark, direction):
    left, right = _rand_events(spark)
    kw = dict(on="key", left_time="tts", right_time="qts",
              payload=["price"], direction=direction)
    plain = asof_join(left, right, **kw)
    bucketed = asof_join(left, right, bucket="1 hour", **kw)
    key = lambda r: (r.key, r.tts, r.price, r.qts_matched)  # noqa: E731
    assert sorted(map(key, plain.collect())) == \
        sorted(map(key, bucketed.collect()))


def test_asof_bucketed_equivalent_with_tolerance(spark):
    left, right = _rand_events(spark, seed=11)
    kw = dict(on="key", left_time="tts", right_time="qts",
              payload=["price"], tolerance="INTERVAL 90 minutes")
    plain = asof_join(left, right, **kw)
    bucketed = asof_join(left, right, bucket="1 hour", **kw)
    key = lambda r: (r.key, r.tts, r.price, r.qts_matched)  # noqa: E731
    assert sorted(map(key, plain.collect())) == \
        sorted(map(key, bucketed.collect()))


def test_asof_bucketed_plan_partitions_by_key_and_bucket(quotes, trades):
    """The point of bucket=: the big window must partition by
    (key, bucket) so no single key's full history lands in one sort."""
    out = asof_join(trades, quotes, on="key", left_time="tts",
                    right_time="qts", payload=["price"], bucket="1 hour")
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    win_specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    big = [s for s in win_specs if "__is_l" in s]
    assert big, f"no event window found in plan:\n{plan[:2000]}"
    assert all("__b" in s and "__k" in s for s in big), (
        f"event window not partitioned by (key, bucket): {big}")


# --- rolling_agg --------------------------------------------------------

@pytest.fixture(scope="module")
def clicks(spark):
    # key 1: 12:00, 12:30, 12:59, 13:30 — the 13:30 row's 1h frame
    # holds only 12:30..13:30 ⇒ {12:30? no: 12:30 < 12:30 exact edge}
    return spark.createDataFrame(
        [(1, ts(0), 1.0), (1, ts(30), 2.0), (1, ts(59), 4.0),
         (2, ts(30), 8.0),
         (1, dt.datetime(2024, 1, 1, 13, 30), 16.0)],
        "key long, cts timestamp, v double")


def test_rolling_agg_trailing_hour(clicks):
    from lens_spark.operators.temporal import rolling_agg
    out = rolling_agg(clicks, key="key", ts_col="cts", window="1 hour",
                      aggs={"n1h": "count(*)", "s1h": "sum(v)"})
    got = {(r.key, r.cts): (r.n1h, r.s1h) for r in out.collect()}
    assert got[(1, ts(0))] == (1, 1.0)
    assert got[(1, ts(30))] == (2, 3.0)
    assert got[(1, ts(59))] == (3, 7.0)
    # 13:30 frame = [12:30, 13:30] inclusive ⇒ rows at 12:30, 12:59, 13:30
    assert got[(1, dt.datetime(2024, 1, 1, 13, 30))] == (3, 22.0)
    assert got[(2, ts(30))] == (1, 8.0)          # keys never mix


def test_rolling_agg_ties_are_peers(spark):
    """Equal (key, second) rows see each other regardless of row order:
    RANGE frames include peers, so output is deterministic."""
    from lens_spark.operators.temporal import rolling_agg
    df = spark.createDataFrame(
        [(1, ts(0), 1.0), (1, ts(0), 2.0)], "key long, cts timestamp, v double")
    out = rolling_agg(df, key="key", ts_col="cts", window="5 minutes",
                      aggs={"s": "sum(v)"})
    assert [r.s for r in out.collect()] == [3.0, 3.0]


def test_rolling_agg_lens_inverse_drops_outputs(clicks):
    spec = {"lenses": [{"name": "rolling_agg", "arguments": {
        "key": "key", "ts": "cts", "window": "30 minutes",
        "aggs": {"n": "count(*)"}}}]}
    out = engine.append(clicks, spec)
    assert "n" in out.columns
    back = engine.append(out, engine.invert(spec))
    assert sorted(back.columns) == sorted(clicks.columns)


def test_rolling_agg_bad_interval_raises(clicks):
    from lens_spark.errors import LensError
    from lens_spark.operators.temporal import rolling_agg
    with pytest.raises(LensError, match="cannot parse interval"):
        rolling_agg(clicks, key="key", ts_col="cts", window="1 fortnight")


def test_resample_fills_gaps_with_policies(spark):
    """Gap buckets are materialized between each key's first and last
    bucket: zero-fill restores 0 counts, ffill carries the last
    non-null value forward (including across present-but-NULL
    buckets), leading gaps stay NULL, and is_gap marks exactly the
    bucket rows with no source events."""
    from datetime import datetime as DT

    from lens_spark.operators.temporal import resample

    rows = [
        ("a", DT(2024, 1, 1, 0, 10), 1.0),
        ("a", DT(2024, 1, 1, 0, 50), 2.0),
        # gap hours 1-2
        ("a", DT(2024, 1, 1, 3, 5), 7.0),
        ("a", DT(2024, 1, 1, 4, 5), None),   # present bucket, NULL agg
        ("b", DT(2024, 1, 1, 2, 0), 5.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = resample(df, ["k"], "ts", "1 hour",
                   aggs={"n": "count(v)", "s": "sum(v)"},
                   fill={"n": "zero", "s": "ffill"})
    got = {(r.k, r.bucket_start.hour): (r.n, r.s, r.is_gap)
           for r in out.collect()}
    assert got == {
        ("a", 0): (2, 3.0, False),
        ("a", 1): (0, 3.0, True),
        ("a", 2): (0, 3.0, True),
        ("a", 3): (1, 7.0, False),
        ("a", 4): (0, 7.0, False),   # present bucket: count(v)=0, LOCF
        ("b", 2): (1, 5.0, False),
    }
    assert len(got) == 6


def test_resample_null_policy_and_validation(spark):
    """Default null policy leaves gap aggregates NULL; bad args raise
    LensError before any job runs."""
    import pytest as _pytest
    from datetime import datetime as DT

    from lens_spark.errors import LensError
    from lens_spark.operators.temporal import resample

    df = spark.createDataFrame(
        [("a", DT(2024, 1, 1, 0), 1.0), ("a", DT(2024, 1, 1, 2), 3.0)],
        "k string, ts timestamp, v double")
    out = {(r.k, r.bucket_start.hour): (r.s, r.is_gap)
           for r in resample(df, ["k"], "ts", "1 hour",
                             aggs={"s": "sum(v)"}).collect()}
    assert out == {("a", 0): (1.0, False), ("a", 1): (None, True),
                   ("a", 2): (3.0, False)}
    with _pytest.raises(LensError, match="fill policy"):
        resample(df, ["k"], "ts", "1 hour", aggs={"s": "sum(v)"},
                 fill="bogus")
    with _pytest.raises(LensError, match="key column"):
        resample(df, [], "ts", "1 hour", aggs={"s": "sum(v)"})
    with _pytest.raises(LensError, match="aggregate"):
        resample(df, ["k"], "ts", "1 hour", aggs={})
    with _pytest.raises(LensError, match="collide"):
        resample(df, ["k"], "ts", "1 hour", aggs={"is_gap": "sum(v)"})
    with _pytest.raises(LensError, match="interval"):
        resample(df, ["k"], "ts", "0 hour", aggs={"s": "sum(v)"})


def test_resample_span_guard_and_reserved_internals(spark):
    """ADVICE r9: one corrupt epoch-0 timestamp must fail the query
    loudly (lazy assert_true on the per-key span — no extra job)
    instead of exploding the grid; names colliding with the __rs_*
    internals raise LensError up front."""
    import pytest as _pytest
    from datetime import datetime as DT

    from lens_spark.errors import LensError
    from lens_spark.operators.temporal import resample

    df = spark.createDataFrame(
        [("a", DT(1970, 1, 1, 0), 1.0),      # corrupt epoch-0 row
         ("a", DT(2024, 1, 1, 0), 2.0)],
        "k string, ts timestamp, v double")
    bad = resample(df, ["k"], "ts", "1 hour", aggs={"s": "sum(v)"},
                   max_buckets=1000)
    with _pytest.raises(Exception, match="max_buckets"):
        bad.collect()
    # same span passes with the bound raised (473k hourly buckets)
    ok = resample(df, ["k"], "ts", "1 hour", aggs={"s": "sum(v)"},
                  max_buckets=500_000)
    assert ok.count() == 473_353

    with _pytest.raises(LensError, match="max_buckets"):
        resample(df, ["k"], "ts", "1 hour", aggs={"s": "sum(v)"},
                 max_buckets=0)
    with _pytest.raises(LensError, match="__rs_"):
        resample(df, ["k"], "ts", "1 hour", aggs={"__rs_hit": "sum(v)"})
    df2 = df.withColumnRenamed("v", "__rs_mn")
    with _pytest.raises(LensError, match="__rs_"):
        resample(df2, ["k"], "ts", "1 hour", aggs={"s": "sum(__rs_mn)"})
