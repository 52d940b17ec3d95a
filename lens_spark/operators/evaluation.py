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
from lens_spark.operators.base import Lens, register_lens, require_arg


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
