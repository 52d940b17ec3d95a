"""Classifier / score evaluation: exact distributed AUC + threshold
confusion metrics.

No reference counterpart (the reference has no model surface at all —
SURVEY.md §2.6); this closes the loop on the quality-classifier family
(``classifier_fit`` → ``classifier_score`` → *evaluate*): a curation
pipeline that trains a fastText-shape filter needs ROC-AUC and
precision/recall at the operating threshold before trusting it on
100 TB.

Scale design:
- AUC is the Mann-Whitney rank statistic, computed WITHOUT a global
  sort of rows: scores are rounded to ``score_decimals`` and
  aggregated per *distinct* score (one hash exchange over ≤ 10^d + 1
  keys), then ranked with a window over that distinct-score table —
  a documented, bounded funnel (the table is at most
  ``2·10^score_decimals`` rows for scores in [-10, 10], KB-scale),
  never over the corpus. Ties use average ranks, held as exact
  integers (2·rank) until the single final division, so the result is
  bit-deterministic across partitionings and engines.
- The confusion counts are one map-side-combined aggregate over the
  same scan.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lens_spark.errors import LensError
from lens_spark.operators.base import Lens, check_reserved, register_lens, require_arg


def binary_eval(df: DataFrame, *, score: str, label: str,
                threshold: float = 0.5,
                score_decimals: int = 6) -> DataFrame:
    """One-row evaluation of a scored binary-labeled frame.

    ``score`` is a column name or SQL expression producing a double;
    ``label`` a column name or SQL expression whose non-zero/true
    value marks the positive class. Returns columns
    ``n, n_pos, auc, tp, fp, tn, fn, accuracy, precision, recall, f1``
    (metrics rounded to 6dp; ratios are NULL when their denominator
    is 0, AUC is NULL when either class is absent).

    AUC = (Σ_pos avg_rank − P(P+1)/2) / (P·N) with average ranks for
    ties — exact, not trapezoidal-approximate: scores are rounded to
    ``score_decimals`` first (that rounding IS the operator's
    resolution, documented) and rows with equal rounded score are
    genuine ties. Ranks are carried as the integer 2·rank so no
    floating point enters before the final division.
    """
    check_reserved(df, {"__s", "__y"}, "binary_eval")
    if score_decimals < 0 or score_decimals > 9:
        raise LensError("binary_eval: score_decimals must be in [0, 9]")
    s = F.round(F.expr(score).cast("double"), score_decimals)
    y = F.expr(label).cast("boolean").cast("int")
    base = (df.select(s.alias("__s"), y.alias("__y"))
            .filter(F.col("__s").isNotNull() & F.col("__y").isNotNull()))

    per_score = base.groupBy("__s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("__y").alias("p"))
    # Bounded funnel: the window runs over distinct rounded scores
    # (≤ KBs), never the corpus — see module docstring.
    w = (Window.orderBy(F.col("__s").asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    ranked = per_score.withColumn(
        "cum", F.coalesce(F.sum("n").over(w), F.lit(0)))
    # avg rank of the tie group = cum + (n+1)/2; keep 2·rank integral.
    rank_stats = ranked.agg(
        F.sum(F.col("p") * (2 * F.col("cum") + F.col("n") + 1))
        .cast("bigint").alias("spr2"),
        F.sum("p").cast("bigint").alias("pos"),
        F.sum("n").cast("bigint").alias("tot"))

    t = F.lit(float(threshold))
    pred = F.col("__s") >= t
    cnt = lambda c: F.sum(c.cast("int")).cast("bigint")  # noqa: E731
    conf = base.agg(
        cnt(pred & (F.col("__y") == 1)).alias("tp"),
        cnt(pred & (F.col("__y") == 0)).alias("fp"),
        cnt(~pred & (F.col("__y") == 0)).alias("tn"),
        cnt(~pred & (F.col("__y") == 1)).alias("fn"))

    r6 = lambda c: F.round(c, 6)  # noqa: E731
    div = lambda a, b: F.when(b > 0, a.cast("double") / b.cast("double"))  # noqa: E731
    neg = F.col("tot") - F.col("pos")
    auc = F.when(
        (F.col("pos") > 0) & (neg > 0),
        (F.col("spr2") - F.col("pos") * (F.col("pos") + 1)).cast("double")
        / (2.0 * F.col("pos").cast("double") * neg.cast("double")))
    prec = div(F.col("tp"), F.col("tp") + F.col("fp"))
    rec = div(F.col("tp"), F.col("tp") + F.col("fn"))
    return (rank_stats.crossJoin(conf).select(
        F.col("tot").alias("n"), F.col("pos").alias("n_pos"),
        r6(auc).alias("auc"),
        "tp", "fp", "tn", "fn",
        r6(div(F.col("tp") + F.col("tn"), F.col("tot"))).alias("accuracy"),
        r6(prec).alias("precision"),
        r6(rec).alias("recall"),
        r6(F.when(prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
                  2 * prec * rec / (prec + rec))).alias("f1"),
    ))


@register_lens("binary_eval")
def binary_eval_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: score (col/expr), label (col/expr), threshold,
    score_decimals."""

    def forward(df: DataFrame) -> DataFrame:
        return binary_eval(
            df,
            score=str(require_arg(arguments, "score", "binary_eval")),
            label=str(require_arg(arguments, "label", "binary_eval")),
            threshold=float(arguments.get("threshold", 0.5)),
            score_decimals=int(arguments.get("score_decimals", 6)),
        )

    return Lens("binary_eval", arguments, forward)


def ks_drift(df_a: DataFrame, df_b: DataFrame, value_col: str, *,
             by: str | None = None) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between two
    dataset versions — the distribution-shift audit a pipeline runs
    when a new crawl/snapshot lands ("did doc length / quality-score
    distribution move?").

    D = max_v |F_a(v) − F_b(v)| over the observed support, computed
    EXACTLY in integers: with n_a/n_b the group sizes and c_a/c_b the
    cumulative counts at v, the statistic's numerator is
    max |c_a·n_b − c_b·n_a| and D = d_num / (n_a·n_b). Everything up
    to the final (reported-as-microunits) division is bigint products
    of counts — hash-stable across engines, partitionings, and fold
    orders, per the digest-formula contract (functions/digest.py).

    Scale shape: one map-side-combined groupBy over (group, value)
    collapses both corpora to their distinct-value histograms; the
    cumulative window then runs over DISTINCT VALUES ONLY, partitioned
    by ``by`` — bounded by the value domain (doc lengths, rounded
    scores), not the corpus. No global window: callers drifting a
    near-unique double column should round/bin it first (the same
    contract binary_eval's score_decimals applies).
    """
    check_reserved(df_a, {"__ca", "__cb", "__g", "__v"}, "ks_drift")
    check_reserved(df_b, {"__ca", "__cb", "__g", "__v"}, "ks_drift")
    if by is None:
        # Constant group: still a one-partition window, but over the
        # distinct-value histogram — document the boundedness contract
        # instead of silently sorting the corpus.
        a = df_a.select(F.lit("all").alias("__g"),
                        F.col(value_col).alias("__v"))
        b = df_b.select(F.lit("all").alias("__g"),
                        F.col(value_col).alias("__v"))
        gname = "__g"
    else:
        a = df_a.select(F.col(by).cast("string").alias(by),
                        F.col(value_col).alias("__v"))
        b = df_b.select(F.col(by).cast("string").alias(by),
                        F.col(value_col).alias("__v"))
        gname = by
    # NULLs carry no ECDF mass — and Spark's window ORDER BY sorts
    # them FIRST while DuckDB's sorts them LAST, so leaving them in
    # would diverge the cumulative counts cross-engine (ADVICE r7).
    u = (a.withColumn("__ca", F.lit(1).cast("bigint"))
         .withColumn("__cb", F.lit(0).cast("bigint"))
         .unionByName(
             b.withColumn("__ca", F.lit(0).cast("bigint"))
             .withColumn("__cb", F.lit(1).cast("bigint")))
         .filter(F.col("__v").isNotNull()))
    hist = (u.groupBy(gname, "__v")
            .agg(F.sum("__ca").alias("ca"), F.sum("__cb").alias("cb")))
    w = Window.partitionBy(gname).orderBy("__v")
    wfull = (Window.partitionBy(gname)
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    stepped = (hist
               .withColumn("cum_a", F.sum("ca").over(w))
               .withColumn("cum_b", F.sum("cb").over(w))
               .withColumn("n_a", F.sum("ca").over(wfull))
               .withColumn("n_b", F.sum("cb").over(wfull))
               .withColumn("d_term", F.abs(F.col("cum_a") * F.col("n_b")
                                           - F.col("cum_b") * F.col("n_a"))))
    out = (stepped.groupBy(F.col(gname).alias("group"))
           .agg(F.max("d_term").alias("d_num"),
                F.max("n_a").alias("n_a"),
                F.max("n_b").alias("n_b"))
           .withColumn(
               "d_microunits",
               F.when((F.col("n_a") > 0) & (F.col("n_b") > 0),
                      F.floor(F.col("d_num").cast("decimal(38,0)")
                              * 1000000
                              / (F.col("n_a").cast("decimal(38,0)")
                                 * F.col("n_b").cast("decimal(38,0)")))
                      .cast("bigint"))
               .otherwise(F.lit(None).cast("bigint"))))
    return out.select("group", "n_a", "n_b", "d_num", "d_microunits")


def filter_funnel(df: DataFrame,
                  rules: "list[tuple[str, str]]") -> DataFrame:
    """Stage-attributed drop accounting — the "why was my data
    dropped" report every curation pipeline ships next to its output:
    for an ORDERED rule list, each row is attributed to the FIRST rule
    it fails (funnel semantics: a doc failing rules 2 and 4 counts
    against stage 2 only), and the report gives per-stage
    ``(n_in, n_dropped, n_out, drop_frac_micro)`` plus a terminal
    ``survived`` row. Reordering rules changes attribution, never the
    survivor set — the ``n_out`` of the last stage is invariant.

    NULL predicate results count as FAIL (a doc that can't prove it
    passes, doesn't — the quality_filter posture).

    Scale shape: ONE narrow pass computes the first-failing-stage
    index per row (a when-chain over the predicates), ONE map-side-
    combined groupBy collapses the corpus to ≤ len(rules)+1 counter
    rows, and the funnel arithmetic runs driver-side on those counters
    (model-state contract). Exact integers; micro-fractions by floor
    division (digest contract).
    """
    check_reserved(df, {"__stage"}, "filter_funnel")
    if not rules:
        raise LensError("filter_funnel: need at least one rule")
    names = [str(n) for n, _ in rules]
    if len(set(names)) != len(names):
        raise LensError("filter_funnel: rule names must be unique")
    stage = F.lit(-1)
    for i in range(len(rules) - 1, -1, -1):
        cond = F.coalesce(F.expr(str(rules[i][1])), F.lit(False))
        stage = F.when(~cond, F.lit(i)).otherwise(stage)
    counts = {r["__stage"]: r["n"] for r in
              (df.select(stage.alias("__stage"))
               .groupBy("__stage").agg(F.count(F.lit(1)).alias("n"))
               .collect())}
    total = sum(counts.values())
    rows, n_in = [], total
    for i, name in enumerate(names):
        dropped = int(counts.get(i, 0))
        frac = dropped * 1000000 // n_in if n_in > 0 else None
        rows.append((i, name, n_in, dropped, n_in - dropped, frac))
        n_in -= dropped
    rows.append((len(names), "survived", n_in, 0, n_in,
                 0 if n_in > 0 else None))
    return df.sparkSession.createDataFrame(
        rows, "stage int, rule string, n_in bigint, n_dropped bigint, "
              "n_out bigint, drop_frac_micro bigint")


def _micro_floor(frac: Any) -> int:
    """``floor(frac·10⁶)`` of a user-facing DECIMAL tolerance.

    ``int(float(frac) * 1e6)`` truncates binary-float error (0.000249
    → 248, not 249 — ~1.8% of the first 10k micro values deviate, r8
    verdict), so the conversion goes through ``Decimal(str(frac))``:
    the shortest-repr decimal the user actually wrote, floored
    exactly. Keeps the "verdicts never compare floats" contract true
    on the tolerance boundary too.
    """
    from decimal import ROUND_FLOOR, Decimal

    return int((Decimal(str(frac)) * 1_000_000)
               .to_integral_value(rounding=ROUND_FLOOR))


def expect(df: DataFrame, rules: "list[dict]") -> DataFrame:
    """Data-quality contract report — the validation gate a production
    pipeline runs before publishing a dataset version (the Deequ /
    great-expectations role, engine-native): every rule is checked in
    ONE aggregate pass and the report says exactly what failed and by
    how much. Two rule kinds:

    - ``{"name", "predicate", "max_fail_frac"?}`` — row-level SQL
      predicate; a row violates when the predicate is false OR NULL
      (a row that can't prove it passes, doesn't — the quality_filter
      posture).
    - ``{"name", "unique": [cols], "max_fail_frac"?}`` — key
      uniqueness; violations = n_rows − count(DISTINCT cols): every
      row beyond the first per key, and every row with a NULL key
      (engines agree: NULL keys are excluded from DISTINCT), counts.

    ``max_fail_frac`` (default 0 = hard) tolerates a violation
    fraction; the verdict is the exact integer comparison
    ``n_violations·10⁶ ≤ max_fail_micro·n_rows`` (with
    ``max_fail_micro = floor(max_fail_frac·10⁶)``) — never floats.
    The reported ``fail_frac_micro`` is the floor-divided
    micro-fraction (digest contract).

    Output: one row per rule — ``(rule, kind, n_rows, n_violations,
    fail_frac_micro, max_fail_micro, passed)``. An empty input passes
    every rule with a NULL fraction.

    Scale shape: ONE narrow pass, ONE map-side-combined aggregate to a
    single counter row (predicate sums ride the fast path; each unique
    rule adds one exact count-distinct expansion), verdict arithmetic
    driver-side on the counters (model-state contract). No shuffle
    beyond the 1-row agg.
    """
    check_reserved(df, {"__n"}, "expect")
    if not rules:
        raise LensError("expect: need at least one rule")
    names = [str(r.get("name", "")) for r in rules]
    if len(set(names)) != len(names) or "" in names:
        raise LensError("expect: rule names must be unique and non-empty")
    aggs = [F.count(F.lit(1)).alias("__n")]
    kinds: list[str] = []
    for i, r in enumerate(rules):
        has_pred, has_uni = "predicate" in r, "unique" in r
        if has_pred == has_uni:
            raise LensError(
                f"expect: rule {names[i]!r} needs exactly one of "
                "'predicate' or 'unique'")
        if has_pred:
            kinds.append("predicate")
            ok = F.coalesce(F.expr(str(r["predicate"])), F.lit(False))
            aggs.append(F.sum((~ok).cast("bigint")).alias(f"__v{i}"))
        else:
            kinds.append("unique")
            cols = [F.col(str(c)) for c in r["unique"]]
            if not cols:
                raise LensError(f"expect: rule {names[i]!r}: empty "
                                "'unique' column list")
            aggs.append(F.count_distinct(*cols).alias(f"__v{i}"))
    row = df.agg(*aggs).collect()[0]
    n = int(row["__n"])
    out = []
    for i, r in enumerate(rules):
        raw = int(row[f"__v{i}"] or 0)
        viol = raw if kinds[i] == "predicate" else n - raw
        frac = viol * 1_000_000 // n if n > 0 else None
        cap = _micro_floor(r.get("max_fail_frac", 0.0))
        out.append((names[i], kinds[i], n, viol, frac, cap,
                    n == 0 or viol * 1_000_000 <= cap * n))
    return df.sparkSession.createDataFrame(
        out, "rule string, kind string, n_rows bigint, "
             "n_violations bigint, fail_frac_micro bigint, "
             "max_fail_micro bigint, passed boolean")


@register_lens("expect")
def expect_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: rules — list of {name, predicate|unique,
    max_fail_frac?}; see :func:`expect`."""
    raw = require_arg(arguments, "rules", "expect")
    return Lens("expect", arguments,
                lambda df: expect(df, [dict(r) for r in raw]))


@register_lens("filter_funnel")
def filter_funnel_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: rules — ordered list of {name, predicate} (SQL
    predicate strings, the filter-lens convention)."""
    raw = require_arg(arguments, "rules", "filter_funnel")
    rules = [(str(r["name"]), str(r["predicate"])) for r in raw]
    return Lens("filter_funnel", arguments,
                lambda df: filter_funnel(df, rules))


@register_lens("ks_drift")
def ks_drift_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column (value), by (group col, optional), right_view
    (registered temp view holding the comparison frame). The lens form
    compares the pipeline frame (side a) against the view (side b) —
    mirrors the dataset_diff lens's view convention."""
    col = str(require_arg(arguments, "column", "ks_drift"))
    by = arguments.get("by")
    right_view = str(require_arg(arguments, "right_view", "ks_drift"))

    def forward(df: DataFrame) -> DataFrame:
        right = df.sparkSession.table(right_view)
        return ks_drift(df, right, col,
                        by=str(by) if by is not None else None)

    return Lens("ks_drift", arguments, forward)


def threshold_sweep(df: DataFrame, *, score: str, label: str,
                    thresholds: "list[float]",
                    score_decimals: int = 6) -> DataFrame:
    """Confusion metrics at EVERY candidate threshold in one pass —
    the operating-point calibration a curation pipeline runs after
    ``classifier_fit`` before committing a filter threshold for the
    whole corpus ("at which cut do we keep 90% of good docs?").

    No reference counterpart (no model surface — SURVEY.md §2.6);
    closes the classifier family next to ``binary_eval``.

    Returns one row per threshold, ascending: ``threshold, tp, fp,
    tn, fn, precision, recall, f1`` (ratios 6dp, NULL when their
    denominator is 0). Prediction is ``round(score, score_decimals)
    >= threshold`` — same resolution contract as ``binary_eval``.

    Scale shape: the corpus is touched by ONE map-side-combined
    aggregate to the distinct-rounded-score table. Before that
    aggregate, scores are COLLAPSED to the threshold-relevant range
    (ADVICE r9): every score ≥ max(thresholds) classifies identically
    at every threshold, as does every score < min(thresholds), so
    both tails fold to a single sentinel row each. The distinct table
    is therefore bounded by (max_t − min_t) · 10^score_decimals + 2
    — a property of the SWEEP, not of the score range — so a raw
    wide-range score (n_chars, perplexity) stays KB/MB-scale as long
    as the threshold grid itself is sane. The per-threshold counts
    come from crossing that bounded table with the ≤1001 thresholds
    (broadcast, no corpus-side work) and one tiny groupBy —
    T·distinct rows at most. Counts stay exact integers; division
    happens once per output row.
    """
    check_reserved(df, {"__s", "__y"}, "threshold_sweep")
    if score_decimals < 0 or score_decimals > 9:
        raise LensError("threshold_sweep: score_decimals must be in [0, 9]")
    ts = sorted(float(t) for t in thresholds)
    if not ts or len(ts) > 1001:
        raise LensError(
            "threshold_sweep needs 1..1001 thresholds — the sweep table "
            "is broadcast and per-threshold output rows are materialized")
    if len(set(ts)) != len(ts):
        raise LensError("threshold_sweep: duplicate thresholds")
    s = F.round(F.expr(score).cast("double"), score_decimals)
    # Collapse scores outside [min_t, max_t) — they classify
    # identically at every threshold, so one sentinel row per tail
    # keeps the distinct table bounded for unbounded score ranges
    # (-inf < every finite threshold; max_t >= every threshold).
    s = (F.when(s >= F.lit(ts[-1]), F.lit(ts[-1]))
         .when(s < F.lit(ts[0]), F.lit(float("-inf")))
         .otherwise(s))
    y = F.expr(label).cast("boolean").cast("int")
    base = (df.select(s.alias("__s"), y.alias("__y"))
            .filter(F.col("__s").isNotNull() & F.col("__y").isNotNull()))
    per_score = base.groupBy("__s").agg(
        F.count(F.lit(1)).alias("n"), F.sum("__y").cast("bigint").alias("p"))
    spark = df.sparkSession
    th = spark.createDataFrame([(t,) for t in ts], "threshold double")
    # Bounded × bounded cross: distinct rounded scores × thresholds.
    crossed = per_score.crossJoin(F.broadcast(th))
    pred = F.col("__s") >= F.col("threshold")
    agg = crossed.groupBy("threshold").agg(
        F.sum(F.when(pred, F.col("p")).otherwise(F.lit(0)))
        .cast("bigint").alias("tp"),
        F.sum(F.when(pred, F.col("n") - F.col("p")).otherwise(F.lit(0)))
        .cast("bigint").alias("fp"),
        F.sum(F.when(~pred, F.col("n") - F.col("p")).otherwise(F.lit(0)))
        .cast("bigint").alias("tn"),
        F.sum(F.when(~pred, F.col("p")).otherwise(F.lit(0)))
        .cast("bigint").alias("fn"))
    # Tiny left join back onto the threshold list so an empty/all-NULL
    # input still reports one all-zero row per threshold.
    agg = th.join(agg, "threshold", "left").select(
        "threshold",
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
          for c in ("tp", "fp", "tn", "fn")])
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    div = lambda a, b: F.when(b > 0, a.cast("double") / b.cast("double"))  # noqa: E731
    prec = div(F.col("tp"), F.col("tp") + F.col("fp"))
    rec = div(F.col("tp"), F.col("tp") + F.col("fn"))
    return agg.select(
        "threshold", "tp", "fp", "tn", "fn",
        r6(prec).alias("precision"),
        r6(rec).alias("recall"),
        r6(F.when(prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
                  2 * prec * rec / (prec + rec))).alias("f1"),
    ).orderBy("threshold")


@register_lens("threshold_sweep")
def threshold_sweep_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: score (col/expr), label (col/expr), thresholds
    (list[float]), score_decimals."""

    def forward(df: DataFrame) -> DataFrame:
        return threshold_sweep(
            df,
            score=str(require_arg(arguments, "score", "threshold_sweep")),
            label=str(require_arg(arguments, "label", "threshold_sweep")),
            thresholds=[float(t) for t in require_arg(
                arguments, "thresholds", "threshold_sweep")],
            score_decimals=int(arguments.get("score_decimals", 6)),
        )

    return Lens("threshold_sweep", arguments, forward)
