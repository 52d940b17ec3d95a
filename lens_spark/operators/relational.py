"""Relational built-in lenses: join / aggregate / window / sort / limit /
set operations.

The reference engine has none of these (SURVEY.md §2.6 — a WASM lens
sees a single input stream and the vocabulary is Transform/Inverse
only); its capability is "arbitrary user transform in a pipeline".
Re-expressed Spark-first, that capability includes the relational
algebra, so these are first-class registered lenses that compose in
lens files exactly like the M1-M7 archetypes and stay fully visible
to Catalyst (predicate pushdown, join strategy selection, partial
aggregation).

Scale notes (100 TB):
- ``join`` takes an explicit ``broadcast`` flag for dimension tables;
  unflagged joins shuffle on the key and rely on AQE for skew splits.
- ``aggregate`` uses native hash aggregation — partial (map-side)
  combine before the exchange is automatic.
- ``window`` requires ``partition_by`` by default: a global (empty
  partition) window funnels every row through one task. Callers must
  opt in with allow_global=true (small inputs only); prefer the
  counter lens's distributed two-pass for global numbering.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lens_spark.errors import LensError
from lens_spark.operators.base import Lens, check_reserved, register_lens, require_arg

_WINDOW_FNS = {
    "row_number": F.row_number,
    "rank": F.rank,
    "dense_rank": F.dense_rank,
}


def _read_right(df: DataFrame, arguments: Mapping[str, Any], lens: str) -> DataFrame:
    """Resolve the second input of a binary lens: a file path or a view."""
    path = arguments.get("right")
    view = arguments.get("right_view")
    if (path is None) == (view is None):
        raise LensError(f"lens '{lens}' requires exactly one of 'right' (path) "
                        "or 'right_view' (registered view name)")
    spark = df.sparkSession
    if view is not None:
        return spark.table(str(view))
    fmt = str(arguments.get("right_format", "parquet"))
    return spark.read.format(fmt).load(str(path))


def _order_cols(specs: list[Any]) -> list[Column]:
    cols = []
    for s in specs:
        s = str(s)
        if s.lower().endswith(" desc"):
            cols.append(F.col(s[:-5].strip()).desc())
        elif s.lower().endswith(" asc"):
            cols.append(F.col(s[:-4].strip()).asc())
        else:
            cols.append(F.col(s).asc())
    return cols


@register_lens("join")
def join_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: right (path) | right_view, on (list[str] | SQL expr),
    how ("inner"), broadcast (false), select (optional right-side cols).

    ``broadcast`` is the 100 TB dial: a dimension side ships to every
    executor and the join never shuffles the fact side.
    """
    on = require_arg(arguments, "on", "join")
    how = str(arguments.get("how", "inner"))
    bc = bool(arguments.get("broadcast", False))
    select = arguments.get("select")

    def forward(df: DataFrame) -> DataFrame:
        right = _read_right(df, arguments, "join")
        if select:
            right = right.select(*[str(c) for c in select])
        if bc:
            right = F.broadcast(right)
        cond = [str(c) for c in on] if isinstance(on, list) else F.expr(str(on))
        return df.join(right, cond, how)

    return Lens("join", arguments, forward)


@register_lens("aggregate")
def aggregate_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list[str]), aggs ({out_name: SQL aggregate expr}),
    mode ("group" | "rollup" | "cube" | "grouping_sets"),
    sets (for grouping_sets: list of key subsets, e.g. [["a","b"],["a"],[]]).

    All four modes are one hash aggregation with map-side partial
    combine; rollup/cube/grouping_sets expand rows via Spark's native
    Expand operator before the exchange."""
    keys = [str(k) for k in arguments.get("keys", [])]
    aggs = require_arg(arguments, "aggs", "aggregate")
    mode = str(arguments.get("mode", "group"))
    exprs = [F.expr(str(e)).alias(str(out)) for out, e in dict(aggs).items()]

    def forward(df: DataFrame) -> DataFrame:
        if mode == "rollup":
            grouped = df.rollup(*keys)
        elif mode == "cube":
            grouped = df.cube(*keys)
        elif mode == "grouping_sets":
            sets = require_arg(arguments, "sets", "aggregate")
            grouped = df.groupingSets(
                [[str(c) for c in s] for s in sets], *keys)
        elif mode == "group":
            grouped = df.groupBy(*keys)
        else:
            raise LensError(f"lens 'aggregate': unknown mode '{mode}'")
        return grouped.agg(*exprs)

    return Lens("aggregate", arguments, forward)


@register_lens("window")
def window_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: function ("row_number" | "rank" | "dense_rank"),
    order_by (["col [asc|desc]", ...]), partition_by (list[str]),
    out ("rank"), k (optional: keep only rows with value <= k),
    allow_global (false)."""
    fn_name = str(arguments.get("function", "row_number"))
    fn = _WINDOW_FNS.get(fn_name)
    if fn is None:
        raise LensError(f"lens 'window': unknown function '{fn_name}' "
                        f"(have {sorted(_WINDOW_FNS)})")
    partition_by = [str(c) for c in arguments.get("partition_by", [])]
    order_by = [str(c) for c in require_arg(arguments, "order_by", "window")]
    out = str(arguments.get("out", "rank"))
    k = arguments.get("k")
    if not partition_by and not bool(arguments.get("allow_global", False)):
        raise LensError("lens 'window': empty partition_by funnels all rows "
                        "through one task; set allow_global=true for small "
                        "inputs or use the counter lens")

    def forward(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*partition_by).orderBy(*_order_cols(order_by))
        res = df.withColumn(out, fn().over(w).cast("bigint"))
        if k is not None:
            res = res.filter(F.col(out) <= int(k))
        return res

    def inverse(df: DataFrame) -> DataFrame:
        return df.drop(out)

    return Lens("window", arguments, forward, inverse)


@register_lens("window_agg")
def window_agg_lens(arguments: Mapping[str, Any]) -> Lens:
    """Analytic window expressions: running aggregates, lag/lead, shares.

    arguments: partition_by (list[str], required — see window lens for
    the global-window guard), order_by (["col [asc|desc]", ...]),
    aggs ({out_name: SQL expr, e.g. "sum(o_totalprice)" or
    "lag(o_totalprice, 1)"}), frame (optional SQL frame clause, e.g.
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW" — applied to
    every agg; omit for lag/lead/rank-family).

    Each expression compiles to a native ``<expr> OVER (...)`` column,
    so the whole lens is one Exchange on partition_by + one sort —
    Catalyst collapses multiple aggs over the same window into a
    single Window physical node.
    """
    partition_by = [str(c) for c in arguments.get("partition_by", [])]
    order_by = [str(c) for c in require_arg(arguments, "order_by", "window_agg")]
    aggs = dict(require_arg(arguments, "aggs", "window_agg"))
    frame = str(arguments.get("frame", "")).strip()
    if not partition_by and not bool(arguments.get("allow_global", False)):
        raise LensError("lens 'window_agg': empty partition_by funnels all "
                        "rows through one task; set allow_global=true for "
                        "small inputs only")
    over = ""
    if partition_by:
        over += "PARTITION BY " + ", ".join(partition_by)
    over += (" " if over else "") + "ORDER BY " + ", ".join(order_by)
    if frame:
        over += " " + frame

    def forward(df: DataFrame) -> DataFrame:
        cols = [F.expr(f"{expr} OVER ({over})").alias(str(out))
                for out, expr in aggs.items()]
        return df.select("*", *cols)

    def inverse(df: DataFrame) -> DataFrame:
        return df.drop(*[str(out) for out in aggs])

    return Lens("window_agg", arguments, forward, inverse)


@register_lens("pivot")
def pivot_lens(arguments: Mapping[str, Any]) -> Lens:
    """Rows→columns: one output column per declared pivot value.

    arguments: keys (list[str]), pivot_col (str), values (list — REQUIRED:
    an explicit value list keeps the output schema deterministic and
    skips Spark's extra distinct-collect pass over 100 TB), agg (SQL
    aggregate expr over the measure, e.g. "round(sum(o_totalprice), 2)").
    """
    keys = [str(k) for k in require_arg(arguments, "keys", "pivot")]
    pivot_col = str(require_arg(arguments, "pivot_col", "pivot"))
    values = [str(v) for v in require_arg(arguments, "values", "pivot")]
    agg = str(require_arg(arguments, "agg", "pivot"))

    def forward(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).pivot(pivot_col, values).agg(F.expr(agg))

    return Lens("pivot", arguments, forward)


@register_lens("unpivot")
def unpivot_lens(arguments: Mapping[str, Any]) -> Lens:
    """Columns→rows (melt). arguments: ids (list[str]), values
    (list[str] — measure columns), var_name ("measure"),
    value_name ("value"). Narrow op: no shuffle at any scale.

    Invertible: the inverse re-pivots with ``first(value)`` per measure
    name, restoring one row per id tuple.
    """
    ids = [str(c) for c in require_arg(arguments, "ids", "unpivot")]
    values = [str(c) for c in require_arg(arguments, "values", "unpivot")]
    var_name = str(arguments.get("var_name", "measure"))
    value_name = str(arguments.get("value_name", "value"))

    def forward(df: DataFrame) -> DataFrame:
        return df.unpivot(ids, values, var_name, value_name)

    def inverse(df: DataFrame) -> DataFrame:
        return (df.groupBy(*ids).pivot(var_name, values)
                .agg(F.first(value_name)))

    return Lens("unpivot", arguments, forward, inverse)


@register_lens("range_join")
def range_join_lens(arguments: Mapping[str, Any]) -> Lens:
    """Interval join: match left rows whose ``ts`` falls inside a right
    interval [start, end). Pure range predicates otherwise force a
    nested-loop join (O(n·m) — unusable at 100 TB); this lens turns the
    range into an equi-join by time binning.

    arguments: right (path) | right_view, ts (left timestamp col),
    start / end (right interval cols), bin_seconds (bucket width — pick
    ≳ the typical interval so most intervals explode into ≤2 bins),
    equi (optional extra equi-key pairs ["l = r", ...]), select
    (optional right-side cols to keep, besides start/end).

    Mechanics: left rows get one bin each (epoch div bin); right
    intervals explode into the bin range they cover (sequence —
    distinct by construction, so no post-join dedup is needed); the
    join is then a plain shuffled equi-join on bin (+ equi keys) with
    the exact range predicate as a cheap post-filter. At scale both
    sides hash-partition on the bin — no broadcast, no nested loop.
    """
    ts = str(require_arg(arguments, "ts", "range_join"))
    start = str(require_arg(arguments, "start", "range_join"))
    end = str(require_arg(arguments, "end", "range_join"))
    bin_s = int(require_arg(arguments, "bin_seconds", "range_join"))
    equi = [str(e) for e in arguments.get("equi", [])]
    bin_us = bin_s * 1_000_000

    def forward(df: DataFrame) -> DataFrame:
        right = _read_right(df, arguments, "range_join")
        if arguments.get("select"):
            keep = {start, end, *[str(c) for c in arguments["select"]]}
            right = right.select(*[c for c in right.columns if c in keep])
        # End is exclusive: an interval touching a bin boundary must not
        # leak into the next bin, hence (end_us - 1) div bin. SQL `div`,
        # not `/`: epoch microseconds overflow double's mantissa.
        l = df.withColumn("__bin", F.expr(f"unix_micros({ts}) div {bin_us}"))
        r = right.withColumn(
            "__bin",
            F.explode(F.expr(
                f"sequence(unix_micros({start}) div {bin_us}, "
                f"(unix_micros({end}) - 1) div {bin_us})")),
        )
        conds = [l["__bin"] == r["__bin"],
                 l[ts] >= r[start], l[ts] < r[end]]
        for e in equi:
            lc, rc = [s.strip() for s in e.split("=", 1)]
            conds.append(l[lc] == r[rc])
        cond = conds[0]
        for c in conds[1:]:
            cond = cond & c
        return l.join(r, cond, "inner").drop(l["__bin"]).drop(r["__bin"])

    return Lens("range_join", arguments, forward)


@register_lens("heavy_hitters")
def heavy_hitters_lens(arguments: Mapping[str, Any]) -> Lens:
    """Global top-k groups by an aggregate metric (frequency by default).

    arguments: keys (list[str]), k (int), metric (SQL aggregate expr,
    default "count(*)"), out (metric column name, default "n").

    Scale shape: the groupBy does map-side partial aggregation, the
    per-group result is tiny relative to the input, and the final
    top-k is a TakeOrderedAndProject (per-partition heaps + driver
    merge of k rows — never a global sort of the grouped output).
    Ties at rank k break deterministically on the key columns.
    """
    keys = [str(c) for c in require_arg(arguments, "keys", "heavy_hitters")]
    k = int(require_arg(arguments, "k", "heavy_hitters"))
    metric = str(arguments.get("metric", "count(*)"))
    out = str(arguments.get("out", "n"))

    def forward(df: DataFrame) -> DataFrame:
        agg = df.groupBy(*keys).agg(F.expr(metric).alias(out))
        order = [F.col(out).desc()] + [F.col(c).asc() for c in keys]
        return agg.orderBy(*order).limit(k)

    return Lens("heavy_hitters", arguments, forward)


@register_lens("sort")
def sort_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: by (["col [asc|desc]", ...]). Global range-partitioned
    sort (Spark samples boundaries; no single-task funnel)."""
    by = [str(c) for c in require_arg(arguments, "by", "sort")]
    return Lens("sort", arguments, lambda df: df.orderBy(*_order_cols(by)))


@register_lens("limit")
def limit_lens(arguments: Mapping[str, Any]) -> Lens:
    n = int(require_arg(arguments, "n", "limit"))
    return Lens("limit", arguments, lambda df: df.limit(n))


def salted_join(left: DataFrame, right: DataFrame, on: list[str], *,
                salt: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``salt``
    shuffle partitions.

    The standard skew fix when the right side is too big to broadcast
    and AQE's skew split isn't enough: left rows get a deterministic
    salt derived from their non-key columns, the right side is
    replicated ``salt`` times, and the join key becomes (key, salt) —
    a single hot key fans out over ``salt`` tasks instead of one.
    Cost: right side shuffles ``salt``× its size; pick the smaller
    side as ``right`` and keep ``salt`` near the observed skew factor.

    Only join types where unmatched *right* rows never surface are
    allowed — the right side exists in ``salt`` replicas, so a right/
    full outer join would emit each unmatched right row ``salt`` times.
    """
    check_reserved(left, {"__salt"}, "salted_join")
    check_reserved(right, {"__salt"}, "salted_join")
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti"}
    if how not in allowed:
        raise LensError(
            f"salted_join: how='{how}' not supported — the right side is "
            f"replicated {salt}x, so unmatched right rows would duplicate; "
            f"use one of {sorted(allowed)}")
    non_key = [c for c in left.columns if c not in on] or on
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in non_key]), F.lit(salt)).cast("int"),
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    out = l.join(r, [*on, "__salt"], how)
    return out.drop("__salt")


@register_lens("salted_join")
def salted_join_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: right (path) | right_view, on (list[str]),
    salt (16), how ("inner"), select (optional right-side cols)."""
    on = [str(c) for c in require_arg(arguments, "on", "salted_join")]

    def forward(df: DataFrame) -> DataFrame:
        right = _read_right(df, arguments, "salted_join")
        if arguments.get("select"):
            right = right.select(*[str(c) for c in arguments["select"]])
        return salted_join(df, right, on,
                           salt=int(arguments.get("salt", 16)),
                           how=str(arguments.get("how", "inner")))

    return Lens("salted_join", arguments, forward)


def _set_op_lens(name: str, op: str):
    def factory(arguments: Mapping[str, Any]) -> Lens:
        def forward(df: DataFrame) -> DataFrame:
            right = _read_right(df, arguments, name)
            if arguments.get("select"):
                right = right.select(*[str(c) for c in arguments["select"]])
            if op == "union":
                out = df.unionByName(right)
                return out.distinct() if bool(arguments.get("distinct", False)) else out
            if op == "except":
                return df.exceptAll(right) if bool(arguments.get("all", False)) \
                    else df.subtract(right)
            return df.intersectAll(right) if bool(arguments.get("all", False)) \
                else df.intersect(right)

        return Lens(name, arguments, forward)

    return register_lens(name)(factory)


union_lens = _set_op_lens("union", "union")
except_lens = _set_op_lens("except", "except")
intersect_lens = _set_op_lens("intersect", "intersect")


def dataset_diff(old: DataFrame, new: DataFrame, keys: list[str], *,
                 compare: list[str] | None = None,
                 include_unchanged: bool = False) -> DataFrame:
    """Key-level diff between two dataset versions: (keys…, status) with
    status ∈ added | removed | changed (| unchanged) — the audit
    companion to the registry's versioned-corpus story (what did this
    pipeline revision actually do to the data?).

    ``compare`` names the value columns whose change flips a key to
    "changed" (default: all shared non-key columns). Values are
    compared as one xxhash64 per side, so the full-outer join exchanges
    keys + an 8-byte digest — never the row payloads. One shuffle per
    side; at 100 TB this is the standard keyed reconciliation shape.

    NULL discipline: the digest hashes the JSON rendering of the
    compared struct with null fields KEPT — Spark's bare hash
    expressions skip NULL inputs entirely, which would make
    (NULL, 'x') and ('x', NULL) collide and report a changed row as
    unchanged.
    """
    shared = [c for c in old.columns if c in set(new.columns)]
    cmp_cols = [str(c) for c in
                (compare if compare is not None
                 else [c for c in shared if c not in keys])]
    missing = [c for c in cmp_cols
               if c not in old.columns or c not in new.columns]
    if missing:
        raise LensError(f"dataset_diff: compare columns {missing} absent "
                        "from one side")

    def digest(df: DataFrame, alias: str) -> DataFrame:
        h = (F.xxhash64(F.to_json(
                F.struct(*[F.col(c).cast("string").alias(c)
                           for c in cmp_cols]),
                {"ignoreNullFields": "false"}))
             if cmp_cols else F.lit(0).cast("bigint"))
        return df.select(*[F.col(k) for k in keys], h.alias(alias))

    a = digest(old, "__dd_old")
    b = digest(new, "__dd_new")
    joined = a.join(b, keys, "full_outer")
    status = (
        F.when(F.col("__dd_old").isNull(), F.lit("added"))
        .when(F.col("__dd_new").isNull(), F.lit("removed"))
        .when(F.col("__dd_old") != F.col("__dd_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged")))
    out = joined.withColumn("status", status).drop("__dd_old", "__dd_new")
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


@register_lens("dataset_diff")
def dataset_diff_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: right (parquet path of the NEW version; the input df
    is the old), keys (list[str]), compare (optional columns),
    include_unchanged (false)."""
    right_path = str(require_arg(arguments, "right", "dataset_diff"))
    keys = [str(k) for k in require_arg(arguments, "keys", "dataset_diff")]
    compare = arguments.get("compare")

    def fwd(df: DataFrame) -> DataFrame:
        new = df.sparkSession.read.parquet(right_path)
        # `compare: []` is a meaningful request (presence-only diff) —
        # only a genuinely absent key means "compare all shared columns"
        return dataset_diff(
            df, new, keys,
            compare=([str(c) for c in compare]
                     if compare is not None else None),
            include_unchanged=bool(arguments.get("include_unchanged",
                                                 False)))

    return Lens("dataset_diff", arguments, fwd)


def outlier_filter(df: DataFrame, column: str, *, method: str = "zscore",
                   k: float = 3.0) -> DataFrame:
    """Numeric data-quality guard: keep rows whose ``column`` is inside
    the corpus' own dispersion envelope — ``zscore`` (|x−μ| ≤ k·σ,
    sample σ) or ``iqr`` (Tukey fences: [q1 − k·iqr, q3 + k·iqr],
    exact percentiles). Nulls are dropped (they are outside any
    envelope; filter them beforehand to keep them).

    Scale shape: the envelope is a 1-row aggregate broadcast back over
    the scan (two scalars) — one pass to measure, one narrow pass to
    filter. The exact-percentile IQR agg is a sort-based aggregate; at
    extreme scale swap in approx_percentile and accept the sketch
    tolerance (x6's documented trade). A corpus too small to measure
    dispersion (sample σ undefined below 2 rows) passes through
    unfiltered rather than silently vanishing into a NULL predicate.
    """
    check_reserved(df, {"__mu", "__q1", "__q3", "__sd"}, "outlier_filter")
    c = F.col(column).cast("double")
    if method == "zscore":
        stats = df.agg(F.avg(c).alias("__mu"),
                       F.stddev_samp(c).alias("__sd"))
        joined = df.crossJoin(F.broadcast(stats))
        # NULL values always drop; an unmeasurable envelope (sample σ
        # undefined below 2 non-null rows) passes the NON-null rows
        # through — same degenerate-corpus contract as the iqr branch
        keep = c.isNotNull() & (
            F.col("__sd").isNull()
            | (F.abs(c - F.col("__mu"))
               <= F.lit(float(k)) * F.col("__sd")))
        return joined.filter(keep).drop("__mu", "__sd")
    if method == "iqr":
        stats = df.agg(
            F.expr(f"percentile(`{column}`, 0.25)").alias("__q1"),
            F.expr(f"percentile(`{column}`, 0.75)").alias("__q3"))
        joined = df.crossJoin(F.broadcast(stats))
        iqr = F.col("__q3") - F.col("__q1")
        keep = c.isNotNull() & (
            F.col("__q1").isNull()
            | ((c >= F.col("__q1") - F.lit(float(k)) * iqr)
               & (c <= F.col("__q3") + F.lit(float(k)) * iqr)))
        return joined.filter(keep).drop("__q1", "__q3")
    raise LensError(f"outlier_filter: unknown method {method!r}")


@register_lens("outlier_filter")
def outlier_filter_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column, method ("zscore" | "iqr"), k (3.0)."""
    column = str(require_arg(arguments, "column", "outlier_filter"))
    return Lens("outlier_filter", arguments, lambda df: outlier_filter(
        df, column,
        method=str(arguments.get("method", "zscore")),
        k=float(arguments.get("k", 3.0))))


@register_lens("frequent_items")
def frequent_items_lens(arguments: Mapping[str, Any]) -> Lens:
    """Single-pass approximate frequent items (Karp/Shenker/Papadimitriou
    — Spark's native `df.stat.freqItems`): every value with frequency
    ≥ ``support`` is guaranteed present (no false negatives; false
    positives possible — the sketch trade, like approx_count_distinct).
    The exact counterpart is the ``heavy_hitters`` lens; this one never
    shuffles values — per-partition summaries merge on the driver,
    KB-sized regardless of input.

    EAGER at pipeline-construction time: freqItems is a DataFrame
    action, so the upstream plan executes when the spec is applied
    (the same documented exception class as the counter lens's offset
    collect), and streaming inputs are refused with a clear error —
    the summary cannot run incrementally.

    arguments: column, support (0.01). Output: one row per candidate
    frequent item (column ``item``).
    """
    column = str(require_arg(arguments, "column", "frequent_items"))
    support = float(arguments.get("support", 0.01))

    def fwd(df: DataFrame) -> DataFrame:
        if df.isStreaming:
            raise LensError(
                "lens 'frequent_items' is an eager batch summary and "
                "cannot run on a streaming DataFrame; compute it on a "
                "bounded snapshot (e.g. the landed dataset) instead")
        freq = df.stat.freqItems([column], support)
        return freq.select(
            F.explode(F.col(f"{column}_freqItems")).alias("item"))

    return Lens("frequent_items", arguments, fwd)


def dataset_profile(df: DataFrame, columns: list[str] | None = None, *,
                    exact: bool = False) -> DataFrame:
    """Per-column data-quality profile — (col_name, null_frac,
    n_distinct) — the "know your corpus" audit that fronts every
    training-data decision (which columns are join-safe keys, where the
    nulls concentrate, whether an id column actually identifies).

    ONE aggregate pass. ``exact=False`` (default, the scale path) uses
    HLL ``approx_count_distinct`` so all statistics come from a single
    map-side-combined scan; ``exact=True`` uses COUNT(DISTINCT) —
    Spark expands multiple exact distincts with an Expand operator
    (one pass, rows × columns intermediate), acceptable for
    oracle-grade audits, not for 100 TB routine profiling. Output is
    long-format, one row per profiled column.
    """
    check_reserved(df, {"__n"}, "dataset_profile")
    cols = [str(c) for c in (columns or df.columns)]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"__nu{i}"))
        nd = (F.count_distinct(F.col(c)) if exact
              else F.approx_count_distinct(F.col(c)))
        aggs.append(nd.alias(f"__nd{i}"))
    row = df.agg(*aggs)
    stack = ", ".join(f"'{c}', __nu{i}, __nd{i}" for i, c in enumerate(cols))
    return (
        row.selectExpr(
            "__n AS __n_rows",
            f"stack({len(cols)}, {stack}) AS (col_name, __n_nulls, __nd)")
        .select(
            "col_name",
            F.round(F.col("__n_nulls") / F.greatest(F.col("__n_rows"),
                                                    F.lit(1)), 6)
            .alias("null_frac"),
            F.col("__nd").cast("bigint").alias("n_distinct"))
    )


@register_lens("dataset_profile")
def dataset_profile_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: columns (default all), exact (false)."""
    columns = arguments.get("columns")
    exact = bool(arguments.get("exact", False))
    return Lens("dataset_profile", arguments, lambda df: dataset_profile(
        df, [str(c) for c in columns] if columns else None, exact=exact))


#: Above this many (estimated) distinct values, quantile_bin refuses to
#: run Spark's exact ``percentile`` aggregate: its state is a
#: value→count map that lives in ONE final aggregation buffer, so on a
#: near-unique 100 TB column it is an executor OOM, not a slow query.
QUANTILE_BIN_EXACT_DISTINCT_LIMIT = 2_000_000


def quantile_bin(df: DataFrame, column: str, *,
                 probs: "Sequence[float]" = (0.25, 0.5, 0.75),
                 out: str = "bin", exact: bool = True,
                 exact_distinct_limit: int =
                 QUANTILE_BIN_EXACT_DISTINCT_LIMIT,
                 distinct_hint: int | None = None) -> DataFrame:
    """Global equi-depth binning: rows get bin 0..len(probs) by which
    exact-percentile thresholds their ``column`` value exceeds — the
    corpus-wide complement of ``score_band`` (which bands WITHIN a
    stratum via a partitioned percent_rank window; a *global*
    percent_rank/ntile window would funnel the corpus through one
    task and is refused by the window lens).

    Scale shape (the outlier_filter contract): thresholds are ONE
    1-row percentile aggregate broadcast back over the scan, then the
    binning is a narrow expression — one pass to measure, one to bin.
    Thresholds are rounded to 6dp as part of the contract (identical
    literal thresholds on any engine → identical bins; an unrounded
    last-ulp difference between engines could flip a boundary row).
    Values equal to a threshold fall in the LOWER bin (bin counts
    strictly-exceeded thresholds). ``exact=False`` swaps in
    approx_percentile for extreme-scale inputs where the exact
    sort-based percentile aggregate is too hot — documented
    trade-off, bins then approximate near boundaries.
    """
    check_reserved(df, {"__c", "__cum", "__n", "__nd", "__nv", "__thr"},
                   "quantile_bin")
    ps = [float(p) for p in probs]
    if not ps or any(not 0.0 < p < 1.0 for p in ps) or ps != sorted(ps):
        raise LensError("quantile_bin: probs must be sorted, in (0, 1), "
                        "non-empty")
    # Scale guard (r6 verdict #4): exact percentile state grows with
    # the number of DISTINCT values and funnels into a single
    # task/buffer — a 100 TB near-unique column is an executor OOM.
    # Above the bound: auto-switch to percentile_approx, the same
    # protective posture as the window lens's global-window refusal —
    # degrading instead of failing, since approx thresholds are a
    # documented, semantically-close fallback.
    #
    # ``distinct_hint`` (r8 verdict #8): a caller-asserted upper
    # bound on the column's distinct values skips the probe job
    # entirely — for columns whose domain is bounded by
    # construction (an enum, a 6dp-quantized score, a bin id the
    # caller just made). A wrong hint risks exactly the OOM the
    # guard exists to stop; it is the caller's assertion, not a
    # measurement.
    #
    # Without a hint, ONE fused probe aggregate computes COUNT(*),
    # approx_count_distinct, and COUNT(column) together (r8 verdict
    # #8: the two-tier probe was metadata-cheap only for bare parquet
    # scans; mid-pipeline inputs paid up to TWO full passes — count,
    # then the cardinality scan. Fused: exactly one probe job on
    # every input shape, and distinct ≤ rows still clears the guard
    # on either counter). COUNT(column) is the non-null N the r15
    # rank-selection thresholds below need driver-side.
    n_val = None
    if exact:
        if distinct_hint is not None:
            exact = int(distinct_hint) <= int(exact_distinct_limit)
        else:
            row = df.agg(
                F.count(F.lit(1)).alias("__n"),
                F.approx_count_distinct(column).alias("__nd"),
                F.count(F.col(column)).alias("__nv"),
            ).collect()[0]
            if (int(row["__n"]) > int(exact_distinct_limit)
                    and int(row["__nd"] or 0) > int(exact_distinct_limit)):
                exact = False
            else:
                n_val = int(row["__nv"])
    # r14 optimization note (measured, NOT adopted): feeding the exact
    # percentile a (value, frequency) pre-aggregate gives a
    # bit-identical buffer and looked 1.9× faster under machine
    # contention, but an interleaved same-session A/B on a quiet box
    # showed it ~12% SLOWER on the benched 97%-distinct column — the
    # extra value-shuffle exchange outweighs the near-zero row
    # collapse. Revisit only for low-cardinality columns.
    #
    # r15 (guide §2.3/§5, verdict #3): the exact ``percentile``
    # AGGREGATE is gone from the main path entirely. Its state is an
    # OpenHashMap[value, count] serialized partial-per-task and merged
    # into ONE final buffer — measured 3.4 s of the query's 4 s at
    # sf0.1 (583k distinct doubles; boxed keys + buffer serialization,
    # single-threaded merge). The same order statistics come from
    # relational algebra: a (value, count) groupBy (map-side combined,
    # 8-byte keys), ONE cumulative-count window over the value-sorted
    # DISTINCT table (single task, but bounded by the same ≤ 2M-
    # distinct guard that gates exact mode — and a sort of ≤ 2M rows
    # spills gracefully where the old map merge OOMs), then a
    # min(value WHERE cum > rank) selection per threshold. The
    # interpolation below reproduces Percentile.getPercentile's exact
    # IEEE op sequence — (higher − position)·v_lo + (position −
    # lower)·v_hi with position = (N−1)·p — so thresholds are
    # bit-identical (pinned by test_quantile_bin_rank_select_percentile
    # _bit_identical); A/B measured ~2.2× on the benched column.
    # ``distinct_hint`` callers skip the probe (its contract), so N is
    # unknown driver-side and they keep the old aggregate.
    if exact and n_val is not None and n_val > 0:
        import math

        vals = df.select(F.col(column)).filter(F.col(column).isNotNull())
        counts = vals.groupBy(column).agg(F.count(F.lit(1)).alias("__c"))
        from pyspark.sql import Window as _W

        cum = counts.withColumn(
            "__cum", F.sum("__c").over(
                _W.orderBy(F.col(column))
                .rowsBetween(_W.unboundedPreceding, _W.currentRow)))
        aggs = []
        for i, p in enumerate(ps):
            pos = float(n_val - 1) * p
            lo, hi = math.floor(pos), math.ceil(pos)
            aggs.append(F.min(F.when(F.col("__cum") > lo,
                                     F.col(column))).alias(f"__lo{i}"))
            if hi != lo:
                aggs.append(F.min(F.when(F.col("__cum") > hi,
                                         F.col(column))).alias(f"__hi{i}"))
        sel = cum.agg(*aggs)
        exprs = []
        for i, p in enumerate(ps):
            pos = float(n_val - 1) * p
            lo, hi = math.floor(pos), math.ceil(pos)
            vlo = F.col(f"__lo{i}").cast("double")
            if hi == lo:
                e = vlo
            else:
                vhi = F.col(f"__hi{i}").cast("double")
                # literals pre-folded driver-side: float(hi) − pos and
                # pos − float(lo) are the same IEEE subtractions the
                # Scala implementation performs on (Long, Double)
                e = F.when(vhi == vlo, vlo).otherwise(
                    F.lit(float(hi) - pos) * vlo
                    + F.lit(pos - float(lo)) * vhi)
            exprs.append(F.round(e, 6))
        thr = sel.select(F.array(*exprs).alias("__thr"))
    else:
        pct = F.percentile(F.col(column),
                           F.array(*[F.lit(p) for p in ps])) \
            if exact else F.percentile_approx(
                F.col(column), F.array(*[F.lit(p) for p in ps]), 10_000)
        thr = df.agg(F.transform(pct, lambda t: F.round(t, 6))
                     .alias("__thr"))
    return (df.crossJoin(F.broadcast(thr))
            .withColumn(out, F.size(F.filter(
                F.col("__thr"),
                lambda t: F.col(column).cast("double") > t)))
            .drop("__thr"))


@register_lens("quantile_bin")
def quantile_bin_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column, probs ([0.25, 0.5, 0.75]), out ("bin"),
    exact (true), distinct_hint (optional caller-asserted distinct
    upper bound — skips the guard probe job). Inverse drops the bin
    column."""
    column = str(require_arg(arguments, "column", "quantile_bin"))
    out = str(arguments.get("out", "bin"))
    probs = arguments.get("probs") or (0.25, 0.5, 0.75)
    hint = arguments.get("distinct_hint")
    return Lens(
        "quantile_bin", arguments,
        lambda df: quantile_bin(
            df, column,
            probs=[float(p) for p in probs], out=out,
            exact=bool(arguments.get("exact", True)),
            exact_distinct_limit=int(arguments.get(
                "exact_distinct_limit",
                QUANTILE_BIN_EXACT_DISTINCT_LIMIT)),
            distinct_hint=None if hint is None else int(hint)),
        lambda df: df.drop(out))


def equiwidth_hist(df: DataFrame, column: str, *, bins: int = 10,
                   lo: float | None = None,
                   hi: float | None = None) -> DataFrame:
    """Fixed-width histogram — the equi-WIDTH complement of
    ``quantile_bin``'s equi-depth bins (profiling a score/length
    distribution wants both: equi-depth for thresholds, equi-width for
    shape). Returns ALL ``bins`` rows (empty bins count 0) with exact
    edges: ``(bin, lo_edge, hi_edge, n)``.

    Range comes from ``lo``/``hi`` if given, else ONE 1-row min/max
    aggregate broadcast back (the quantile_bin thresholds contract —
    min/max are order-independent selections, so the bounds are
    bit-identical on any engine/partitioning). Bucket index
    ``floor((v − lo)·bins / (hi − lo))`` is the same literal IEEE op
    sequence on both engines (digest contract: identical single ops on
    identical doubles), clamped to [0, bins−1] so v = hi lands in the
    last bin; out-of-range values clamp to the edge bins (callers
    passing explicit bounds get a visible pile-up, not dropped rows).
    NULLs are excluded.

    Scale shape: optional 1-row agg + ONE map-side-combined groupBy
    with ≤ ``bins`` groups + a broadcast join against the ≤ ``bins``-
    row bin spine — nothing anywhere is proportional to the corpus
    but the scans.
    """
    check_reserved(df, {"__hi", "__lo"}, "equiwidth_hist")
    b = int(bins)
    if b < 1:
        raise LensError("equiwidth_hist: bins must be >= 1")
    v = F.col(column).cast("double")
    spark = df.sparkSession
    if lo is None or hi is None:
        mm = df.agg(F.min(v).alias("__lo"), F.max(v).alias("__hi"))
    else:
        if not float(lo) < float(hi):
            raise LensError("equiwidth_hist: need lo < hi")
        mm = spark.range(1).select(F.lit(float(lo)).alias("__lo"),
                                   F.lit(float(hi)).alias("__hi"))
    lo_c, hi_c = F.col("__lo"), F.col("__hi")
    bin_c = F.when(hi_c <= lo_c, F.lit(0).cast("bigint")).otherwise(
        F.least(F.lit(b - 1).cast("bigint"),
                F.greatest(F.lit(0).cast("bigint"),
                           F.floor((v - lo_c) * F.lit(b) / (hi_c - lo_c))
                           .cast("bigint"))))
    counts = (df.filter(v.isNotNull())
              .crossJoin(F.broadcast(mm))
              .groupBy(bin_c.alias("bin"))
              .agg(F.count(F.lit(1)).alias("n")))
    spine = (spark.range(b).select(F.col("id").cast("bigint").alias("bin"))
             .crossJoin(F.broadcast(mm)))
    width = hi_c - lo_c
    return (spine.join(counts, "bin", "left")
            .select(
                "bin",
                (lo_c + F.col("bin").cast("double") * width / F.lit(b))
                .alias("lo_edge"),
                (lo_c + (F.col("bin") + 1).cast("double") * width
                 / F.lit(b)).alias("hi_edge"),
                F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n")))


@register_lens("equiwidth_hist")
def equiwidth_hist_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column, bins (10), lo/hi (optional explicit range)."""
    column = str(require_arg(arguments, "column", "equiwidth_hist"))
    lo = arguments.get("lo")
    hi = arguments.get("hi")
    return Lens(
        "equiwidth_hist", arguments,
        lambda df: equiwidth_hist(
            df, column, bins=int(arguments.get("bins", 10)),
            lo=float(lo) if lo is not None else None,
            hi=float(hi) if hi is not None else None))
