"""TF-IDF / BM25 ranking lens tests (operators.ranking)."""

from __future__ import annotations

import math

import pytest

from lens_spark import engine
from lens_spark.operators.ranking import bm25_score, tfidf_top_terms


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle spark join"),
            (2, "hash join hash join hash"),
            (3, "quantum physics lecture notes"),
            (4, "spark hash"),
        ],
        "id long, text string",
    )


def test_tfidf_scores_match_formula(corpus):
    rows = tfidf_top_terms(corpus, "id", "text", k=10).collect()
    by_key = {(r.id, r.term): r.score for r in rows}
    n = 4
    # doc 1: tf(spark)=2, df(spark)=2 → 2 * (ln(5/3) + 1)
    assert by_key[(1, "spark")] == pytest.approx(
        round(2 * (math.log(5 / 3) + 1), 6))
    # doc 2: tf(hash)=3, df(hash)=2
    assert by_key[(2, "hash")] == pytest.approx(
        round(3 * (math.log((n + 1) / 3) + 1), 6))


def test_tfidf_rank_deterministic_tiebreak(corpus):
    rows = tfidf_top_terms(corpus, "id", "text", k=10).collect()
    doc4 = sorted([r for r in rows if r.id == 4], key=lambda r: r.rank)
    # equal scores (tf=1, df=2 for both) → term asc breaks the tie
    assert [r.term for r in doc4] == ["hash", "spark"]
    assert [r.rank for r in doc4] == [1, 2]


def test_tfidf_top_k_cut(corpus):
    out = tfidf_top_terms(corpus, "id", "text", k=1)
    assert out.filter("rank > 1").count() == 0
    assert out.count() == 4  # one winner per doc


def test_bm25_only_matching_docs(corpus):
    rows = bm25_score(corpus, "id", "text", ["spark", "join"]).collect()
    assert {r.id for r in rows} == {1, 2, 4}  # doc 3 has no query term


def test_bm25_ranks_denser_match_higher(corpus):
    rows = {r.id: r.bm25 for r in
            bm25_score(corpus, "id", "text", ["spark"]).collect()}
    # doc 1 has tf=2 and similar length vs doc 4's tf=1 → higher score
    assert rows[1] > rows[4]


def test_bm25_limit_orders_by_score(corpus):
    rows = bm25_score(corpus, "id", "text", ["hash", "join"],
                      limit=1).collect()
    assert len(rows) == 1 and rows[0].id == 2


def test_lens_registration(corpus):
    spec = {"lenses": [{"name": "bm25_score", "arguments": {
        "id": "id", "column": "text", "query": ["spark"], "limit": 10}}]}
    out = engine.append(corpus, spec)
    assert out.columns == ["id", "bm25"]
    spec = {"lenses": [{"name": "tfidf_top_terms", "arguments": {
        "id": "id", "column": "text", "k": 2}}]}
    out = engine.append(corpus, spec)
    assert out.columns == ["id", "term", "score", "rank"]
