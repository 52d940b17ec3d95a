"""X8 corpus-relative text ranking: TF-IDF top terms and BM25 keyword
scoring.

These are the retrieval-side text operators of a training-data
pipeline: surfacing what a document is "about" (top TF-IDF terms feed
domain mixing / topic balancing decisions) and scoring documents
against a keyword query (BM25 — the standard lexical retrieval
baseline, e.g. for targeted corpus curation).

No reference counterpart (the reference has no aggregation operators
at all, SURVEY.md §2.6) — X-series extensions registered as lenses.

Scale design (100 TB):
- the explode → groupBy(doc, term) term-frequency pass is map-side
  combined, so the shuffle carries one row per distinct (doc, term);
- document frequency is a second, much smaller aggregation over the
  distinct (doc, term) table;
- corpus scalars (N, avgdl) are 1-row aggregates cross-joined in — a
  broadcast, not a shuffle;
- the tf⋈df join keys on term; AQE broadcasts df when the vocabulary
  is small, else it is a plain shuffle join on a well-distributed key
  (term frequency skew is capped by the per-doc distinctness of tf).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lens_spark.functions.text import tokens
from lens_spark.operators.base import Lens, ensure_parallelism, register_lens, require_arg


def _term_freq(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, term, tf) — one row per distinct (doc, lowercased token)."""
    return (
        ensure_parallelism(df, by=[id_col])
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str, *,
                    k: int = 5) -> DataFrame:
    """Top-``k`` TF-IDF terms per document.

    Returns (id, term, score, rank); score = tf · (ln((N+1)/(df+1))+1)
    (smoothed idf, sklearn-style), rounded to 6dp; ties broken by term
    asc so ranks are deterministic.
    """
    tf = _term_freq(df, id_col, text_col)
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(docfreq, "term").crossJoin(F.broadcast(n_docs))
        # round6 integer path (functions.digest): round(x, 6) on a
        # cross-engine-identical double can still flip between the two
        # engines' decimal-rounding algorithms (r6 verdict #2 class)
        .withColumn(
            "score",
            F.round(F.col("tf") * (F.log((F.col("__n") + 1)
                                         / (F.col("df") + 1)) + 1)
                    * F.lit(1e6)).cast("bigint").cast("double")
            / F.lit(1e6))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(),
                                           F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "score", "rank")
    )


def bm25_score(df: DataFrame, id_col: str, text_col: str,
               query_terms: list[str], *, k1: float = 1.2, b: float = 0.75,
               limit: int | None = None) -> DataFrame:
    """BM25 score of every matching document for a bag of query terms.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)); only documents
    containing ≥1 query term appear. Returns (id, bm25) rounded 6dp,
    optionally top-``limit`` by (score desc, id asc).
    """
    terms = sorted({t.lower() for t in query_terms})
    tf = _term_freq(df, id_col, text_col).filter(F.col("term").isin(terms))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # corpus scalars: N and average document length (whitespace tokens)
    stats = df.select(
        F.count(F.lit(1)).alias("__n"),
        F.avg(F.size(tokens(F.col(text_col)))).alias("__avgdl"))
    dl = df.select(F.col(id_col),
                   F.size(tokens(F.col(text_col))).alias("__dl"))
    idf = F.log(F.lit(1.0) + (F.col("__n") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    contrib = idf * (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl")))
    # Order-independent 6dp sum digest (functions.digest recipe): each
    # term contribution is quantized to an 11dp scaled long and summed
    # exactly — round(sum(<irrational doubles>), 6) is the r6-verdict
    # cross-engine flip class (fold order differs between engines).
    from lens_spark.functions.digest import (
        round6_scaled_sum_expr,
        scaled_term,
    )

    scored = (
        tf.join(docfreq, "term").join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("__c", contrib)
        .groupBy(id_col).agg(F.sum(scaled_term(F.col("__c"))).alias("__s"))
        .select(F.col(id_col),
                F.expr(round6_scaled_sum_expr("__s")).alias("bm25"))
    )
    if limit is not None:
        scored = scored.orderBy(F.col("bm25").desc(),
                                F.col(id_col).asc()).limit(limit)
    return scored


@register_lens("tfidf_top_terms")
def tfidf_top_terms_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column, k (5)."""
    id_col = str(require_arg(arguments, "id", "tfidf_top_terms"))
    text_col = str(require_arg(arguments, "column", "tfidf_top_terms"))
    k = int(arguments.get("k", 5))
    return Lens("tfidf_top_terms", arguments,
                lambda df: tfidf_top_terms(df, id_col, text_col, k=k))


@register_lens("bm25_score")
def bm25_score_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column, query (list of terms), k1 (1.2), b (0.75),
    limit (optional)."""
    id_col = str(require_arg(arguments, "id", "bm25_score"))
    text_col = str(require_arg(arguments, "column", "bm25_score"))
    query = [str(t) for t in require_arg(arguments, "query", "bm25_score")]
    lim = arguments.get("limit")
    return Lens("bm25_score", arguments,
                lambda df: bm25_score(df, id_col, text_col, query,
                                      k1=float(arguments.get("k1", 1.2)),
                                      b=float(arguments.get("b", 0.75)),
                                      limit=int(lim) if lim else None))
