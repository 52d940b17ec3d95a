"""binary_eval: exact rank-statistic AUC + threshold confusion metrics."""

from __future__ import annotations

import pytest

from lens_spark import engine
from lens_spark.errors import LensError
from lens_spark.operators.evaluation import binary_eval


def _eval(spark, rows, **kw):
    df = spark.createDataFrame(rows, "s double, y int")
    return binary_eval(df, score="s", label="y", **kw).collect()[0]


def test_perfect_separation(spark):
    r = _eval(spark, [(0.1, 0), (0.2, 0), (0.8, 1), (0.9, 1)])
    assert r.auc == 1.0
    assert (r.tp, r.fp, r.tn, r.fn) == (2, 0, 2, 0)
    assert r.accuracy == 1.0 and r.precision == 1.0 and r.recall == 1.0
    assert r.f1 == 1.0


def test_inverted_scores_auc_zero(spark):
    r = _eval(spark, [(0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)])
    assert r.auc == 0.0


def test_sklearn_reference_case(spark):
    # sklearn.metrics.roc_auc_score([0,0,1,1],[0.1,0.4,0.35,0.8]) == 0.75
    r = _eval(spark, [(0.1, 0), (0.4, 0), (0.35, 1), (0.8, 1)])
    assert r.auc == 0.75


def test_ties_use_average_ranks(spark):
    # scores (0.2,0), (0.2,1), (0.6,1): tie group avg rank 1.5 →
    # sum_pos_ranks = 1.5 + 3 = 4.5, AUC = (4.5 − 3)/(2·1) = 0.75
    r = _eval(spark, [(0.2, 0), (0.2, 1), (0.6, 1)])
    assert r.auc == 0.75


def test_all_tied_is_half(spark):
    r = _eval(spark, [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)])
    assert r.auc == 0.5


def test_single_class_auc_null_metrics_defined(spark):
    r = _eval(spark, [(0.3, 1), (0.9, 1)])
    assert r.auc is None
    assert r.recall == 0.5 and r.precision == 1.0  # t=0.5: tp=1, fn=1
    assert r.tn == 0 and r.fp == 0


def test_threshold_inclusive(spark):
    r = _eval(spark, [(0.5, 1), (0.49, 0)], threshold=0.5)
    assert (r.tp, r.tn) == (1, 1)


def test_nulls_dropped_and_counts(spark):
    df = spark.createDataFrame(
        [(0.9, 1), (None, 1), (0.1, None), (0.2, 0)],
        "s double, y int")
    r = binary_eval(df, score="s", label="y").collect()[0]
    assert r.n == 2 and r.n_pos == 1


def test_partitioning_invariance(spark):
    import random
    rng = random.Random(7)
    rows = [(round(rng.random(), 3), rng.randint(0, 1)) for _ in range(500)]
    df = spark.createDataFrame(rows, "s double, y int")
    a = binary_eval(df.coalesce(1), score="s", label="y").collect()[0]
    b = binary_eval(df.repartition(17), score="s", label="y").collect()[0]
    assert a == b


def test_expression_score_and_label(spark):
    df = spark.createDataFrame([(100, "en"), (10, "fr")], "n long, lang string")
    r = binary_eval(df, score="ln(n + 1)", label="lang = 'en'",
                    threshold=3.0).collect()[0]
    assert r.auc == 1.0 and r.tp == 1 and r.tn == 1


def test_lens_registration(spark):
    df = spark.createDataFrame([(0.9, 1), (0.1, 0)], "s double, y int")
    out = engine.append(df, {"lenses": [{"name": "binary_eval", "arguments": {
        "score": "s", "label": "y"}}]})
    assert out.collect()[0].auc == 1.0


def test_bad_decimals_raises(spark):
    df = spark.createDataFrame([(0.9, 1)], "s double, y int")
    with pytest.raises(LensError, match="score_decimals"):
        binary_eval(df, score="s", label="y", score_decimals=12)


def test_threshold_sweep_counts_match_manual(spark):
    """Per-threshold confusion counts equal a row-at-a-time recount;
    prediction is round(score, 6) >= t (the resolution contract);
    ratio columns are 6dp with NULL-on-zero-denominator."""
    from lens_spark.operators.evaluation import threshold_sweep

    rows = [(float(s) / 10.0, s % 3 == 0) for s in range(40)]
    df = spark.createDataFrame(rows, "score double, good boolean")
    ts = [0.5, 1.5, 2.5, 3.95]
    out = {r.threshold: r for r in threshold_sweep(
        df, score="score", label="good", thresholds=ts).collect()}
    assert sorted(out) == ts
    for t in ts:
        tp = sum(1 for s, y in rows if round(s, 6) >= t and y)
        fp = sum(1 for s, y in rows if round(s, 6) >= t and not y)
        tn = sum(1 for s, y in rows if round(s, 6) < t and not y)
        fn = sum(1 for s, y in rows if round(s, 6) < t and y)
        r = out[t]
        assert (r.tp, r.fp, r.tn, r.fn) == (tp, fp, tn, fn), t
        assert r.precision == round(tp / (tp + fp), 6) if tp + fp else r.precision is None
        assert r.recall == round(tp / (tp + fn), 6) if tp + fn else r.recall is None


def test_threshold_sweep_empty_input_and_validation(spark):
    """An empty (or all-NULL) input still reports one all-zero row per
    threshold; bad threshold lists raise."""
    import pytest as _pytest

    from lens_spark.operators.evaluation import threshold_sweep

    empty = spark.createDataFrame([], "score double, good boolean")
    rows = threshold_sweep(empty, score="score", label="good",
                           thresholds=[0.25, 0.75]).collect()
    assert [(r.threshold, r.tp, r.fp, r.tn, r.fn) for r in rows] == \
        [(0.25, 0, 0, 0, 0), (0.75, 0, 0, 0, 0)]
    assert all(r.precision is None and r.recall is None and r.f1 is None
               for r in rows)
    with _pytest.raises(LensError, match="1..1001"):
        threshold_sweep(empty, score="score", label="good", thresholds=[])
    with _pytest.raises(LensError, match="duplicate"):
        threshold_sweep(empty, score="score", label="good",
                        thresholds=[0.5, 0.5])
    with _pytest.raises(LensError, match="score_decimals"):
        threshold_sweep(empty, score="score", label="good",
                        thresholds=[0.5], score_decimals=10)


def test_threshold_sweep_wide_range_scores_collapse_exactly(spark):
    """ADVICE r9: scores outside [min_t, max_t) fold to sentinel rows
    before the cross join, so a raw wide-range score (n_chars-style)
    keeps the distinct table bounded by the sweep — and the counts
    stay EXACT, including scores equal to the min/max thresholds."""
    from lens_spark.operators.evaluation import threshold_sweep

    rows = [(float(s), s % 2 == 0) for s in
            [-1e12, -5.0, 9.999999, 10.0, 55.5, 100.0, 100.000001, 3e15]]
    df = spark.createDataFrame(rows, "score double, good boolean")
    ts = [10.0, 50.0, 100.0]
    out = {r.threshold: r for r in threshold_sweep(
        df, score="score", label="good", thresholds=ts).collect()}
    for t in ts:
        tp = sum(1 for s, y in rows if round(s, 6) >= t and y)
        fp = sum(1 for s, y in rows if round(s, 6) >= t and not y)
        tn = sum(1 for s, y in rows if round(s, 6) < t and not y)
        fn = sum(1 for s, y in rows if round(s, 6) < t and y)
        assert (out[t].tp, out[t].fp, out[t].tn, out[t].fn) == \
            (tp, fp, tn, fn), t
