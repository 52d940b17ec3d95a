"""Temporal operators: as-of join, gap sessionization, session windows.

No reference counterpart (the reference has no time semantics at all —
SURVEY.md §2.6); these are the operators a training-data/event pipeline
needs that Spark lacks as single built-ins, composed here from native
ops so Catalyst keeps optimizing them.

Scale design (100 TB):
- ``asof_join`` is the union-sort formulation: tag both inputs, union,
  and take ``last(right, ignorenulls)`` over a per-key time-ordered
  window. One hash shuffle per side on the join key, a per-key sort,
  no range-explosion join and no per-row binary search. Skewed keys
  ride on AQE; when one key's history alone exceeds a task, pass
  ``bucket="1 day"``: windows then partition by (key, time-bucket) —
  bounding any single sort to one bucket of one key — and the
  last-known (backward) / next-known (forward) right value crosses
  bucket boundaries via carry rows computed on the per-(key, bucket)
  summary table (one row per key×bucket, shuffle-cheap).
- ``sessionize`` is two stacked per-key windows (lag → cumulative
  sum) — same single shuffle, order within key only.
- ``session_agg`` uses native ``session_window`` so the identical call
  works on batch and on streams (with a watermark, state is evicted
  when the gap closes a session).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lens_spark.errors import LensError
from lens_spark.operators.base import Lens, check_reserved, register_lens, require_arg

_L, _R = "__asof_l", "__asof_r"


def asof_join(left: DataFrame, right: DataFrame, *, on: str, left_time: str,
              right_time: str, payload: list[str] | None = None,
              direction: str = "backward",
              tolerance: Column | str | None = None,
              bucket: str | None = None) -> DataFrame:
    """For each left row, the latest right row with time ≤ left time
    (``backward``; ``forward`` = earliest with time ≥ left time).

    Right rows must be unique per (key, time) — pre-aggregate if not
    (the match would otherwise be nondeterministic). Payload columns
    come back null when no right row qualifies (left-join semantics).

    ``bucket`` (an interval string, e.g. ``"1 day"``) switches to the
    time-bucketed formulation for keys whose full history exceeds one
    task's sort: window partitions become (key, tumbling-bucket), and
    matches crossing bucket boundaries are served by one synthetic
    carry row per (key, bucket) — the latest earlier-bucket (backward)
    or earliest later-bucket (forward) right event — computed on the
    per-(key, bucket) summary table, which holds one row per key×bucket
    regardless of event counts. Results are identical to the unbucketed
    path (equivalence-tested); the extra cost is one groupBy over the
    right side and one tiny window over the summary.
    """
    check_reserved(left, {
        "__b", "__carry", "__is_l", "__k", "__m_rt", "__rt", "__s", "__t",
    }, "asof_join")
    check_reserved(right, {
        "__b", "__carry", "__is_l", "__k", "__m_rt", "__rt", "__s", "__t",
    }, "asof_join")
    if direction not in ("backward", "forward"):
        raise LensError(f"asof_join: unknown direction '{direction}'")
    payload = payload or [c for c in right.columns if c not in (on, right_time)]
    bwd = direction == "backward"

    l_tagged = left.select(
        F.col(on).alias("__k"), F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__is_l"), F.struct(*left.columns).alias(_L),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}")
          for c in payload],
        F.lit(None).cast("timestamp").alias("__rt"),
    )
    r_tagged = right.select(
        F.col(on).alias("__k"), F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__is_l"), F.lit(None).cast(l_tagged.schema[_L].dataType).alias(_L),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
        F.col(right_time).cast("timestamp").alias("__rt"),
    )

    # Right rows sort before left rows at equal times (__is_l asc tie
    # break), so an exact-time match is inclusive in both directions;
    # carry rows (__is_l = -1) sort before both at the bucket edge.
    order = ([F.col("__t").asc()] if bwd else [F.col("__t").desc()]) \
        + [F.col("__is_l").asc()]

    if bucket is None:
        both = l_tagged.unionByName(r_tagged)
        part = ["__k"]
    else:
        bucket_start = F.window(F.col("__t"), bucket).getItem("start")
        l_b = l_tagged.withColumn("__b", bucket_start)
        r_b = r_tagged.withColumn("__b", bucket_start)
        # Per-(key, bucket) right summary: that bucket's latest
        # (backward) / earliest (forward) event — one row per
        # key×bucket however many events the bucket holds.
        pick_in_bucket = F.max_by if bwd else F.min_by
        summary = r_b.groupBy("__k", "__b").agg(
            pick_in_bucket(
                F.struct(F.col("__rt").alias("__rt"),
                         *[F.col(f"__p_{c}").alias(f"__p_{c}")
                           for c in payload]),
                F.col("__t")).alias("__s"))
        # Carry for bucket B = the summary of the nearest earlier
        # (backward) / later (forward) bucket with right events, over
        # every (key, bucket) either side touches. The window runs on
        # the summary table (|keys|×|buckets| rows), not on events.
        kb = l_b.select("__k", "__b").unionByName(
            r_b.select("__k", "__b")).distinct()
        wb = (Window.partitionBy("__k")
              .orderBy(F.col("__b").asc() if bwd else F.col("__b").desc())
              .rowsBetween(Window.unboundedPreceding, -1))
        carry = (kb.join(summary, ["__k", "__b"], "left")
                 .withColumn("__carry", F.last("__s", ignorenulls=True).over(wb))
                 .filter(F.col("__carry").isNotNull()))
        # The carry row sorts first within its bucket: at the bucket
        # start (backward, asc order) or bucket end (forward, desc
        # order — in-bucket times are strictly below the end boundary).
        carry_t = F.col("__b") if bwd \
            else F.col("__b") + F.expr(f"INTERVAL {bucket}")
        carry_rows = carry.select(
            "__k", carry_t.alias("__t"), F.lit(-1).alias("__is_l"),
            F.lit(None).cast(l_tagged.schema[_L].dataType).alias(_L),
            *[F.col("__carry").getItem(f"__p_{c}").alias(f"__p_{c}")
              for c in payload],
            F.col("__carry").getItem("__rt").alias("__rt"),
            F.col("__b"),
        )
        both = l_b.unionByName(r_b).unionByName(carry_rows)
        part = ["__k", "__b"]

    w = (Window.partitionBy(*part).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731

    matched = both.select(
        "__k", "__t", "__is_l", _L,
        *[pick(f"__p_{c}").alias(f"__m_{c}") for c in payload],
        pick("__rt").alias("__m_rt"),
    ).filter(F.col("__is_l") == 1)

    keep = F.lit(True)
    if tolerance is not None:
        tol = F.expr(tolerance) if isinstance(tolerance, str) else tolerance
        delta = (F.col("__t") - F.col("__m_rt")) if direction == "backward" \
            else (F.col("__m_rt") - F.col("__t"))
        keep = F.col("__m_rt").isNotNull() & (delta <= tol)

    out_cols = [F.col(f"{_L}.{c}").alias(c) for c in left.columns]
    out_cols += [F.when(keep, F.col(f"__m_{c}")).alias(c) for c in payload]
    out_cols.append(F.when(keep, F.col("__m_rt")).alias(f"{right_time}_matched"))
    return matched.select(*out_cols)


def sessionize(df: DataFrame, *, key: str, ts_col: str, gap: str = "30 minutes",
               out: str = "session_idx",
               tie_break: list[str] | None = None) -> DataFrame:
    """Gap-based session index per key (1-based, ordered by time).

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap``. ``tie_break`` columns make ordering total when
    timestamps collide.
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tie_break or [])]
    w_order = Window.partitionBy(key).orderBy(*order)
    gap_expr = F.expr(f"INTERVAL {gap}")
    prev_ts = F.lag(F.col(ts_col)).over(w_order)
    is_new = F.when(
        prev_ts.isNull() | (F.col(ts_col) > prev_ts + gap_expr), F.lit(1)
    ).otherwise(F.lit(0))
    w_cum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(out, F.sum(is_new).over(w_cum).cast("bigint"))


def session_agg(df: DataFrame, *, key: str, ts_col: str, gap: str = "30 minutes",
                watermark: str | None = None,
                aggs: Mapping[str, str] | None = None) -> DataFrame:
    """Native session-window aggregate — identical call for batch and
    streams (streams need ``watermark`` so closed sessions evict state)."""
    if df.isStreaming:
        if watermark is None:
            raise LensError("session_agg on a stream requires a watermark")
        df = df.withWatermark(ts_col, watermark)
    exprs = [F.expr(e).alias(n) for n, e in (aggs or {"n_events": "count(*)"}).items()]
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), F.col(key))
        .agg(*exprs)
        .select(F.col("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"), F.col(key), *[
                    F.col(n) for n in (aggs or {"n_events": None})])
    )


_UNIT_SECONDS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _interval_seconds(interval: str, lens: str) -> int:
    """Parse ``"<n> <unit>"`` (second/minute/hour/day) to whole seconds."""
    parts = str(interval).strip().split()
    if len(parts) == 2 and parts[0].lstrip("-").isdigit() \
            and parts[1].lower() in _UNIT_SECONDS:
        return int(parts[0]) * _UNIT_SECONDS[parts[1].lower()]
    raise LensError(
        f"{lens}: cannot parse interval '{interval}' "
        "(expected '<n> second|minute|hour|day[s]')")


def rolling_agg(df: DataFrame, *, key: str, ts_col: str,
                window: str = "1 hour",
                aggs: Mapping[str, str] | None = None) -> DataFrame:
    """Trailing event-time aggregates per key: for each row, ``aggs``
    evaluated over that key's rows in ``[t − window, t]`` (inclusive
    both ends — the RANGE frame's natural boundary semantics).

    The per-entity rolling feature (trailing 1-hour spend, 24-hour
    event count, …) that Spark exposes only as a raw RANGE frame;
    here it is one lens. Timestamps are truncated to whole seconds
    before framing so the boundary is well-defined regardless of the
    source's sub-second precision (parquet ns vs SQL µs).

    Scale (100 TB): one hash exchange on ``key`` + a per-key time
    sort — identical shape to ``sessionize``; the frame is evaluated
    by Spark's sliding window machinery, never a self-join. Rows with
    equal (key, second) are frame *peers* (RANGE includes ties), so
    every output value is order-independent and deterministic. A key
    whose full history exceeds one task is the same skew case as
    sessionize — salt upstream or bucket the key space.
    """
    check_reserved(df, {"__rsec"}, "rolling_agg")
    secs = _interval_seconds(window, "rolling_agg")
    t = F.date_trunc("second", F.col(ts_col).cast("timestamp"))
    tagged = df.withColumn("__rsec", t.cast("long"))
    w = (Window.partitionBy(key).orderBy(F.col("__rsec").asc())
         .rangeBetween(-secs, 0))
    out = tagged
    # Each agg expr must be a TOP-LEVEL aggregate call (sum(...),
    # count(*), avg(...)): the OVER clause attaches to the aggregate
    # itself — wrap casts/arithmetic around the *output column* in a
    # downstream lens instead of around the aggregate.
    for name, expr in (aggs or {"n_window": "count(*)"}).items():
        try:
            out = out.withColumn(name, F.expr(expr).over(w))
        except Exception as exc:  # AnalysisException at resolution time
            raise LensError(
                f"rolling_agg: agg '{name}' = '{expr}' must be a "
                f"top-level aggregate call (got: {exc})") from None
    return out.drop("__rsec")


# --- lens registrations -------------------------------------------------

@register_lens("rolling_agg")
def rolling_agg_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: key, ts, window (interval string), aggs
    ({out_col: SQL agg expr})."""

    def forward(df: DataFrame) -> DataFrame:
        return rolling_agg(
            df,
            key=str(require_arg(arguments, "key", "rolling_agg")),
            ts_col=str(require_arg(arguments, "ts", "rolling_agg")),
            window=str(arguments.get("window", "1 hour")),
            aggs={str(k): str(v)
                  for k, v in (arguments.get("aggs") or {}).items()} or None,
        )

    aggs = arguments.get("aggs") or {"n_window": None}
    return Lens("rolling_agg", arguments, forward,
                lambda df: df.drop(*[str(k) for k in aggs]))


@register_lens("asof_join")
def asof_join_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: right (path) | right_view, on, left_time, right_time,
    payload (cols), direction, tolerance (SQL interval expr), bucket
    (interval string — time-bucketed windows for oversized keys)."""
    from lens_spark.operators.relational import _read_right

    def forward(df: DataFrame) -> DataFrame:
        right = _read_right(df, arguments, "asof_join")
        return asof_join(
            df, right,
            on=str(require_arg(arguments, "on", "asof_join")),
            left_time=str(require_arg(arguments, "left_time", "asof_join")),
            right_time=str(require_arg(arguments, "right_time", "asof_join")),
            payload=[str(c) for c in arguments["payload"]] if arguments.get("payload") else None,
            direction=str(arguments.get("direction", "backward")),
            tolerance=arguments.get("tolerance"),
            bucket=(str(arguments["bucket"]) if arguments.get("bucket")
                    else None),
        )

    return Lens("asof_join", arguments, forward)


@register_lens("sessionize")
def sessionize_lens(arguments: Mapping[str, Any]) -> Lens:
    def forward(df: DataFrame) -> DataFrame:
        return sessionize(
            df,
            key=str(require_arg(arguments, "key", "sessionize")),
            ts_col=str(require_arg(arguments, "ts", "sessionize")),
            gap=str(arguments.get("gap", "30 minutes")),
            out=str(arguments.get("out", "session_idx")),
            tie_break=[str(c) for c in arguments.get("tie_break", [])],
        )

    out = str(arguments.get("out", "session_idx"))
    return Lens("sessionize", arguments, forward, lambda df: df.drop(out))


def resample(df: DataFrame, key_cols: "list[str]", ts_col: str,
             every: str, *, aggs: Mapping[str, str],
             fill: "Mapping[str, str] | str" = "null",
             bucket_col: str = "bucket_start",
             gap_col: str = "is_gap",
             max_buckets: int = 10_000_000) -> DataFrame:
    """Fixed-interval downsampling with gap materialization — the
    hypertable resample: per key, aggregate events into ``every``-wide
    buckets, then EMIT every bucket between that key's first and last
    event, filling the empty ones (``zero`` / ``ffill`` /
    ``null`` per output column). Feeds anything that assumes a dense
    regular grid: drift monitors, rate alerting, seasonal models.

    No reference counterpart (no time semantics — SURVEY.md §2.6).

    ``aggs`` maps output column name → SQL aggregate expression over
    the bucket's rows; ``fill`` is one policy for all columns or a
    per-column map. ``ffill`` carries the last non-null value forward
    within the key (including across a present-but-NULL bucket — the
    LOCF contract); leading gaps before the first non-null stay NULL.
    ``gap_col`` marks buckets with no source rows.

    Scale shape: the corpus is touched by ONE map-side-combined
    groupBy (key, bucket) — everything after runs on the bucketed
    table, smaller by the compression factor of the interval. The
    grid is sequence()-exploded from per-key (min, max) epoch spans
    (narrow), the fill join is an equi-join on (key, bucket), and the
    ffill window orders buckets WITHIN a key — bounded by
    span/interval per key, never by corpus rows. Pick ``every`` so
    span/interval stays task-sized (a year of 1-second buckets is
    31M rows per key — that is a caller decision, documented, same
    contract as any per-key window).

    ``max_buckets`` bounds the per-key grid: one corrupt timestamp
    (an epoch-0 row in a 2024 corpus) would otherwise silently
    inflate that key's (min, max) span to billions of sequence()
    elements. The guard is evaluated lazily inside the plan
    (``assert_true`` on the per-key span — no extra job, no second
    corpus scan) and fails the query loudly, naming the key span,
    instead of OOMing the executor that drew the bad key."""
    if not key_cols:
        raise LensError("resample needs at least one key column")
    if not aggs:
        raise LensError("resample needs at least one aggregate")
    step = _interval_seconds(every, "resample")
    if step <= 0:
        raise LensError(f"resample: interval must be positive, got {every}")
    policies = ({c: str(fill) for c in aggs} if isinstance(fill, str)
                else {c: str(dict(fill).get(c, "null")) for c in aggs})
    bad = {c: p for c, p in policies.items()
           if p not in ("null", "zero", "ffill")}
    if bad:
        raise LensError(f"resample: unknown fill policy {bad} "
                        "(each must be null|zero|ffill)")
    if max_buckets < 1:
        raise LensError("resample: max_buckets must be >= 1")
    reserved = set(key_cols) | {bucket_col, gap_col}
    if set(aggs) & reserved:
        raise LensError(f"resample: aggregate names collide with "
                        f"key/bucket/gap columns: {sorted(set(aggs) & reserved)}")
    check_reserved(df, {"__rs_e", "__rs_hit", "__rs_mn", "__rs_mx"},
                   "resample", extra=set(aggs) | reserved)

    # session tz is UTC (lens_spark.session) and interval boundaries
    # are whole seconds, so long-epoch bucketing is engine-portable.
    # NTZ first casts to TIMESTAMP (wall-clock-preserving under the
    # UTC session zone) — NTZ→BIGINT is not a legal cast in Spark 4.
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        ts = ts.cast("timestamp")
    e = (F.floor(ts.cast("long") / step) * step).cast("long")
    base = (df.filter(F.col(ts_col).isNotNull())
            .groupBy(*key_cols, e.alias("__rs_e"))
            .agg(*[F.expr(expr).alias(name) for name, expr in aggs.items()])
            .withColumn("__rs_hit", F.lit(1)))
    spans = base.groupBy(*key_cols).agg(
        F.min("__rs_e").alias("__rs_mn"), F.max("__rs_e").alias("__rs_mx"))
    # Lazy span guard (ADVICE r9): one corrupt timestamp must fail
    # loudly, not explode the grid. assert_true evaluates inside the
    # same stage (NULL when ok → the filter is a no-op), so the guard
    # costs zero extra jobs and names the offending key span.
    n_buckets = ((F.col("__rs_mx") - F.col("__rs_mn")) / F.lit(step)) + 1
    spans = spans.where(F.assert_true(
        n_buckets <= F.lit(float(max_buckets)),
        F.concat_ws(
            " ", F.lit("resample: key ("),
            *[F.col(c).cast("string") for c in key_cols],
            F.lit(f") spans more than max_buckets={max_buckets} "
                  f"'{every}' buckets — a corrupt/outlier timestamp, "
                  "or raise max_buckets"))).isNull())
    grid = spans.select(
        *key_cols,
        F.explode(F.sequence(F.col("__rs_mn"), F.col("__rs_mx"),
                             F.lit(step).cast("long"))).alias("__rs_e"))
    joined = grid.join(base, on=[*key_cols, "__rs_e"], how="left")

    w = (Window.partitionBy(*key_cols).orderBy(F.col("__rs_e").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cols = []
    for name in aggs:
        p = policies[name]
        if p == "zero":
            cols.append(F.coalesce(
                F.col(name),
                F.lit(0).cast(dict(joined.dtypes)[name])).alias(name))
        elif p == "ffill":
            cols.append(F.last(F.col(name), ignorenulls=True)
                        .over(w).alias(name))
        else:
            cols.append(F.col(name))
    bucket = F.timestamp_seconds(F.col("__rs_e"))
    if dict(df.dtypes).get(ts_col) == "timestamp_ntz":
        # preserve the input's timestamp flavor (wall clock == UTC
        # epoch under the UTC session zone)
        bucket = bucket.cast("timestamp_ntz")
    return joined.select(
        *key_cols,
        bucket.alias(bucket_col),
        *cols,
        F.col("__rs_hit").isNull().alias(gap_col))


@register_lens("resample")
def resample_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list[str]), ts, every ("1 hour"), aggs
    ({name: sql-agg-expr}), fill ("null"|"zero"|"ffill" or per-column
    map), bucket ("bucket_start"), gap ("is_gap"),
    max_buckets (10_000_000)."""
    keys = [str(c) for c in require_arg(arguments, "keys", "resample")]
    ts = str(require_arg(arguments, "ts", "resample"))
    every = str(require_arg(arguments, "every", "resample"))
    aggs = {str(k): str(v) for k, v in
            dict(require_arg(arguments, "aggs", "resample")).items()}
    fill = arguments.get("fill", "null")
    return Lens(
        "resample", arguments,
        lambda df: resample(
            df, keys, ts, every, aggs=aggs,
            fill=(fill if isinstance(fill, str)
                  else {str(k): str(v) for k, v in dict(fill).items()}),
            bucket_col=str(arguments.get("bucket", "bucket_start")),
            gap_col=str(arguments.get("gap", "is_gap")),
            max_buckets=int(arguments.get("max_buckets", 10_000_000))))
