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
from lens_spark.operators.base import Lens, check_reserved, ensure_parallelism, register_lens, require_arg


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
    check_reserved(df, {"__n"}, "tfidf_top_terms")
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
    check_reserved(df, {"__avgdl", "__c", "__dl", "__n", "__s"}, "bm25_score")
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


# --------------------------------------------------------------------
# Materialized BM25 postings index — the SPARSE counterpart of the
# dense ivfpq index (similarity.py): one build pass lands the postings
# as plain parquet PARTITIONED BY TERM-HASH BUCKET, and a query panel
# then reads ONLY its own terms' buckets. Same philosophy as the
# incremental-dedup / ivfpq indexes: no search service, just files an
# object store already holds, maintained by the shared lease +
# staged-swap machinery (lens_spark.maintenance sweeps it too).
# --------------------------------------------------------------------

POSTINGS_FORMAT = "lens_spark_postings_index"
POSTINGS_BUCKETS = 64
"""Default term-hash bucket count. A query panel touches ≤ its
distinct-term count of buckets; more buckets = finer pruning but more
files per build/append. 64 suits panels of tens of terms."""


def postings_index_build(corpus: DataFrame, index_path: str, *,
                         id_col: str, text_col: str,
                         buckets: int = POSTINGS_BUCKETS) -> dict:
    """Materialize the inverted index ``bm25_score`` computes on the
    fly: ONE tokenize pass to (term, doc, tf) postings — each row also
    carrying the doc length and the term's document frequency, so
    scoring needs no side tables — landed as parquet PARTITIONED BY
    ``pb = pmod(xxhash64(term), buckets)`` plus the corpus scalars
    (``n_docs``, ``sum_dl``) in ``model.json`` beside it.

    The 100 TB shape: after the one-time build,
    ``postings_index_search`` scans only the partitions its query
    panel's terms hash into (~|panel terms|/buckets of the index), and
    the index itself holds one row per distinct (doc, term) — no
    original text. Build is the same two map-side-combined aggregations
    ``bm25_score`` pays per query, paid once.

    Build REFUSES a path holding a COMMITTED index (``model.json``
    present): an in-place rebuild has an unfixable crash window
    (``parts/`` hashed mod the new bucket count while ``model.json``
    still says the old one → searches silently return empty panels).
    Rebuild into a fresh path and swap at the dataset layer, or grow
    with ``postings_index_append``. ``model.json`` is written LAST as
    the commit marker — a CRASHED build leaves parts/ without a
    model, every reader refuses it, and retrying the build at the
    same path simply overwrites the marker-less leftover. The whole
    build runs under the index writer lease, so two concurrent
    builds to the same fresh path cannot both pass the refusal check
    and interleave their writes (the second gets
    ``ConcurrentIndexWriterError``).

    Returns {"n_docs", "n_terms_approx", "n_postings"}. ``n_docs`` and
    ``n_postings`` (and the frozen scoring stats in ``model.json``) are
    retry-exact; ``n_terms_approx`` is the vocabulary size observed on
    the docfreq leg, which runs in a shuffle-map stage — a retried or
    speculated task can overcount it, so the name carries the caveat
    (r14 advice: the old exact count came from a full re-read of the
    just-written index, an index-sized extra pass per build).

    Source-stability contract: ``n_docs``/``n_dl`` come from a second,
    narrow scan of ``corpus`` after the parts write. The build already
    scans ``corpus`` independently for its tf and dl legs, so a source
    that changes mid-build (a directory receiving concurrent appends, a
    non-deterministic sample) tears the *postings themselves* before it
    can tear the stats — the corpus must be stable for the duration of
    the build, the standard index-build contract.
    """
    import json as _json

    from pyspark.sql import Observation

    from lens_spark.errors import LensError
    from lens_spark.operators.dedup import (
        _index_writer_lock,
        _lease_heartbeat,
        _refresh_writer_lock,
    )
    from lens_spark.sources import read_json_file

    if buckets < 1:
        raise LensError("postings_index_build: buckets must be >= 1")
    spark = corpus.sparkSession
    # heartbeat (r12 verdict #7): the inter-stage refreshes below keep
    # the lease fresh BETWEEN stages, but a single full-corpus stage
    # longer than the stale window would still look abandoned to a
    # concurrent writer — the daemon thread closes that residual for
    # arbitrary stage lengths (and dies with a crashed driver, so the
    # stale-break path still works)
    with _index_writer_lock(spark, index_path), \
            _lease_heartbeat(spark, index_path):
        if read_json_file(spark, f"{index_path}/model.json") is not None:
            raise LensError(
                f"postings_index_build: {index_path!r} already holds a "
                "committed index — in-place rebuild has a torn "
                "parts/model.json crash window; build into a fresh "
                "path and swap, or use postings_index_append.")
        tf = _term_freq(corpus, id_col, text_col)
        # n_terms_approx observed on the docfreq leg as the parts write
        # runs — one row per distinct term flows through it, so its
        # count IS the vocabulary size WHEN no task retries/speculation
        # occur; the leg is a shuffle-map stage, so a retry can
        # overcount, which the returned key's name states (the frozen
        # scoring stats below come from retry-safe placements). The r6
        # exchange-reuse between the two tf legs is untouched (the
        # metrics node sits ABOVE docfreq's aggregate).
        obs_terms = Observation()
        docfreq = (tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
                   .observe(obs_terms, F.count(F.lit(1)).alias("t")))
        dl = (ensure_parallelism(corpus, by=[id_col])
              .select(F.col(id_col).alias("doc"),
                      F.size(tokens(F.col(text_col))).alias("dl")))
        rows = (tf.withColumnRenamed(id_col, "doc")
                .join(docfreq, "term").join(dl, "doc")
                .select("term", "doc", "tf", "dl", "df",
                        F.pmod(F.xxhash64("term"),
                               F.lit(int(buckets))).alias("pb")))
        # n_postings + sum_dl ride the write itself (r14, guide §1/§5:
        # the old build paid a DISK_ONLY pin of the corpus-sized dl
        # table, a second stats job over it, and a FULL RE-READ of the
        # just-written index just to count what had just flowed through
        # the writer). Both metrics sit ABOVE the final exchange — the
        # result stage — so task retries cannot double-count them
        # (accumulator updates in result stages apply exactly once);
        # sum(tf) over the landed postings equals sum(dl) over the
        # landed docs exactly (each doc's tf values partition its
        # token count), so the frozen avgdl numerator is unchanged.
        obs_rows = Observation()
        # one task per bucket directory -> one file per bucket
        (rows.repartition(F.col("pb"))
         .observe(obs_rows, F.count(F.lit(1)).alias("p"),
                  F.sum("tf").alias("s"))
         .write.mode("overwrite").partitionBy("pb")
         .parquet(f"{index_path}/parts"))
        # The parts write is the build's long pole (full-corpus
        # tokenize + two shuffled aggregations); refresh the lease
        # mtime after it so a build longer than the stale window is
        # not mistaken for a crashed holder and broken by a concurrent
        # writer — the streaming sinks' per-batch discipline. (A
        # single stage exceeding the window is covered by the
        # _lease_heartbeat wrapping this whole build, r12 verdict #7.)
        _refresh_writer_lock(spark, index_path)
        # n_docs counts every row (idf's N); avgdl averages over docs
        # with a non-null length (dl is null iff the text is null) —
        # bm25_score's F.count(*)/F.avg split. One narrow column-
        # pruned aggregate, no tokenize pass: the token mass already
        # arrived via the write's observed sum(tf).
        cstats = corpus.agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.col(text_col)).alias("ndl")).first()
        wstats = obs_rows.get
        jvm = spark._jvm
        P = jvm.org.apache.hadoop.fs.Path
        fs = P(index_path).getFileSystem(spark._jsc.hadoopConfiguration())
        out = fs.create(P(f"{index_path}/model.json"), True)
        try:
            out.write(_json.dumps({
                "format": POSTINGS_FORMAT, "version": 1,
                "buckets": int(buckets), "n_docs": int(cstats["n"]),
                "n_dl": int(cstats["ndl"]),
                "sum_dl": int(wstats["s"] or 0)},
                sort_keys=True).encode("utf-8"))
        finally:
            out.close()
        # seed the maintained row-count sidecar (postings_drift_report's
        # O(1) denominator — r12 verdict #5): appends bump it, full
        # compactions recount it, readers fall back to a scan when a
        # torn update loses it
        _write_postings_stats(spark, index_path, int(wstats["p"]))
    return {"n_docs": int(cstats["n"]),
            "n_terms_approx": int(obs_terms.get["t"] or 0),
            "n_postings": int(wstats["p"])}


def _read_postings_model(spark, index_path: str, op: str) -> dict:
    from lens_spark.errors import LensError
    from lens_spark.sources import read_json_file

    meta = read_json_file(spark, f"{index_path}/model.json")
    if meta is None:
        raise LensError(
            f"{op}: no model.json under {index_path!r} — not a "
            "postings index (build one with postings_index_build)")
    if meta.get("format") != POSTINGS_FORMAT:
        raise LensError(
            f"{op}: {index_path!r} model.json has format "
            f"{meta.get('format')!r}")
    return meta


def _write_postings_stats(spark, index_path: str, n_postings: int) -> None:
    """(Re)write the index's maintained row-count stat
    (``stats.json`` — a SIDECAR, deliberately not ``model.json``:
    model.json is the commit marker, and an in-place rewrite of it has
    a torn-file crash window that would brick the index; tearing the
    sidecar merely costs the O(1) fast path until the next full
    compaction rewrites it). Shared staged writer (sources
    .write_json_file); a lost write is the same benign recount
    fallback. Caller holds the writer lease."""
    from lens_spark.sources import write_json_file

    write_json_file(spark, f"{index_path}/stats.json",
                    {"n_postings": int(n_postings)})


def _read_postings_stats(spark, index_path: str) -> "int | None":
    """The maintained stored-postings row count, or None when the
    sidecar is absent/corrupt (pre-r13 index, or a torn update) —
    callers then fall back to recounting the index."""
    from lens_spark.sources import read_json_file

    stats = read_json_file(spark, f"{index_path}/stats.json")
    if stats is None or not isinstance(stats.get("n_postings"), int):
        return None
    return int(stats["n_postings"])


def _bump_postings_stats(spark, index_path: str, delta: int) -> None:
    """Increment the maintained stat under the caller's writer lease.
    A sidecar-less index stays sidecar-less (bumping a partial count
    would be wrong); the next full compaction recounts and seeds it."""
    cur = _read_postings_stats(spark, index_path)
    if cur is not None:
        _write_postings_stats(spark, index_path, cur + int(delta))


def postings_index_append(batch: DataFrame, index_path: str, *,
                          id_col: str, text_col: str,
                          locked: bool = True,
                          dropped_path: "str | None" = None,
                          dropped_tag: "str | None" = None) -> dict:
    """Grow a materialized postings index with NEW documents under the
    index's FROZEN statistics (the ivfpq_index_append contract): each
    new doc's terms take the BUILD-TIME ``df`` (read from the index's
    own pruned partitions — one partition-pruned probe, I/O scales
    with the batch's terms), and ``n_docs``/``sum_dl`` stay the build
    values, so old and new postings score on exactly the same scale.
    The honest trade, stated not hidden: a term the build never saw
    has no frozen ``df``, so its postings are NOT added (reported in
    the return value) and the term stays unretrievable until a
    rebuild — BM25's global statistics make any other choice silently
    re-scale every existing score. Appends one file per touched
    bucket under the shared writer lease; an at-least-once replay
    stores byte-identical duplicate rows — search collapses them
    before aggregation (the dedupe-before-sum idiom), the cost is
    index bytes until ``lens_spark.maintenance`` compacts.

    Returns {"n_postings", "n_dropped_postings"} — the dropped count
    is POSTINGS rows whose term the build never saw (one unknown term
    in ten docs counts ten). ``dropped_path`` additionally lands the
    dropped TERMS themselves as an append-only parquet log
    (``term, n_postings_dropped, tag`` — ``tag`` is the caller's
    batch label, e.g. the streaming batch id): a return-value count
    is lost the moment a streaming sink returns, but which terms went
    unretrievable is exactly what the rebuild decision needs. The log
    is at-least-once like the append itself — a replayed batch
    re-logs its rows; dedupe on ``tag`` when reading.
    """
    import contextlib

    from lens_spark.operators.dedup import (
        _index_writer_lock,
        _parts_pb_migration_recover,
    )

    spark = batch.sparkSession
    meta = _read_postings_model(spark, index_path, "postings_index_append")
    buckets = int(meta["buckets"])
    parts_path = f"{index_path}/parts"

    tf = _term_freq(batch, id_col, text_col)
    dl = (batch.select(F.col(id_col).alias("doc"),
                       F.size(tokens(F.col(text_col))).alias("dl")))
    # pin the batch postings once: counted twice (total + surviving)
    # and joined below — batch-sized, never the index
    new = (tf.withColumnRenamed(id_col, "doc").join(dl, "doc")
           .withColumn("pb", F.pmod(F.xxhash64("term"),
                                    F.lit(buckets)))
           .localCheckpoint(eager=True))
    n_new = new.count()
    lock = (_index_writer_lock(spark, index_path) if locked
            else contextlib.nullcontext())
    with lock:
        # recover a crashed rewrite BEFORE touching parts/ (the quota
        # sink lesson): both the frozen-df probe and the append must
        # see a live dataset, and the lease serializes us against a
        # concurrent compaction staging parts/ aside mid-read
        _parts_pb_migration_recover(spark, parts_path)
        # frozen df lookup: probe ONLY the buckets this batch's terms
        # hash into (the dedup_incremental partition-pruning idiom)
        probe = (new.select("term", "pb").distinct()
                 .filter(F.col("pb") >= 0))
        frozen_df = (spark.read.parquet(parts_path)
                     .join(F.broadcast(probe), ["term", "pb"],
                           "left_semi")
                     .select("term", "df").distinct())
        rows = (new.join(frozen_df, "term")
                .select("term", "doc", "tf", "dl", "df", "pb")
                .localCheckpoint(eager=True))  # pin before the append
        # invalidates the parts scan (the dedup checkpoint discipline)
        n_rows = rows.count()
        if dropped_path is not None:
            # land the dropped-terms log BEFORE the parts append: the
            # anti-join reads frozen_df's pruned parts scan, which the
            # append write would invalidate. Batch-sized work only.
            (new.join(frozen_df, "term", "left_anti")
             .groupBy("term")
             .agg(F.count(F.lit(1)).alias("n_postings_dropped"))
             .withColumn("tag", F.lit(dropped_tag).cast("string"))
             .write.mode("append").parquet(dropped_path))
        (rows.repartition(F.col("pb"))
         .write.mode("append").partitionBy("pb").parquet(parts_path))
        # maintain the drift report's O(1) denominator; an at-least-once
        # REPLAY re-appends byte-identical rows and re-bumps, so the
        # stat counts STORED rows (≥ distinct postings by at most the
        # replay residue) until a drop_replay_duplicates compaction
        # recounts — documented in postings_drift_report
        _bump_postings_stats(spark, index_path, int(n_rows))
        touched = sorted(int(r["pb"]) for r in
                         rows.select("pb").distinct().collect())
    return {"n_postings": int(n_rows),
            "n_dropped_postings": int(n_new - n_rows),
            "touched_pb": touched}


def postings_index_search(spark, queries: DataFrame, index_path: str, *,
                          id_col: str, text_col: str, k: int = 10,
                          k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """Serve BM25 top-k for a panel of text queries from a materialized
    ``postings_index_build`` index: tokenize the panel, scan ONLY the
    partitions the panel's terms hash into (``pb`` is the parquet
    partition column, so the broadcast (term, pb) probe prunes
    directories on disk), sum the matched term contributions per
    (query, doc) with the exact scaled-integer digest ``bm25_score``
    uses, and rank with the shared two-stage top-k — a single query's
    candidates never funnel through one task. Matched postings pass a
    DISTINCT before the sum (each (term, doc) row is byte-identical
    across at-least-once replays, so replay residue cannot
    double-count a term — the sparse analogue of the ann
    score-before-distinct idiom). Returns (query_id, neighbor_id,
    bm25, rank).

    Scoring math and tokenization are ``bm25_score``'s exactly (same
    idf, same quantized sum), with N/avgdl FROZEN at build time from
    ``model.json`` — serving never rescans the corpus.
    """
    from lens_spark.operators.similarity import _rank_topk

    check_reserved(queries, {"__c", "__s"}, "postings_index_search")
    scored = _postings_scored(spark, queries, index_path, id_col=id_col,
                              text_col=text_col, k1=k1, b=b)
    out = _rank_topk(scored, "query_id", int(k))
    return out.select("query_id", "neighbor_id",
                      F.col("score").alias("bm25"), "rank")


def _postings_scored(spark, queries: DataFrame, index_path: str, *,
                     id_col: str, text_col: str, k1: float = 1.2,
                     b: float = 0.75) -> DataFrame:
    """``postings_index_search``'s SCORED frame, pre-rank — the pruned
    postings probe, panel-broadcast scoring join and fused
    dedupe+sum exchange, ending as (query_id, neighbor_id, score).
    Split out in r15 so ``hybrid_search`` fuses the per-system final
    ranks into one window (guide §2.4)."""
    check_reserved(queries, {"__c", "__s"}, "postings_index_search")
    from lens_spark.errors import LensError
    from lens_spark.functions.digest import (
        round6_scaled_sum_expr,
        scaled_term,
    )
    from lens_spark.operators.dedup import _parts_migration_leftovers

    meta = _read_postings_model(spark, index_path,
                                "postings_index_search")
    parts_path = f"{index_path}/parts"
    if _parts_migration_leftovers(spark, parts_path):
        raise LensError(
            f"postings_index_search: index at {index_path!r} has an "
            "interrupted rewrite; run lens_spark.maintenance (or any "
            "append) to recover it before read-only use.")
    buckets = int(meta["buckets"])
    n_docs = int(meta["n_docs"])
    # avgdl averages over docs with a non-null length (bm25_score's
    # F.avg semantics); n_docs is idf's N over every row
    avgdl = float(meta["sum_dl"]) / max(int(meta.get("n_dl", n_docs)), 1)

    qterms = (queries
              .select(F.col(id_col).alias("query_id"),
                      F.explode(tokens(F.col(text_col))).alias("term"))
              .distinct()
              .withColumn("pb", F.pmod(F.xxhash64("term"),
                                       F.lit(buckets))))
    probe = (qterms.select("term", "pb").distinct()
             # always-true selective predicate for the DPP rule — see
             # the neardup_incremental probe comment
             .filter(F.col("pb") >= 0))
    matched = (spark.read.parquet(parts_path)
               .join(F.broadcast(probe), ["term", "pb"])
               .select("term", "doc", "tf", "dl", "df"))
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    contrib = idf * (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl)))
    # r15 (guide §2.4/§3.1): the panel side is bounded by contract —
    # the probe broadcast above already assumes it — so the scoring
    # join BROADCASTS qterms instead of sort-merge-joining it (the
    # planner saw an ExistingRDD with no stats and shuffled BOTH
    # sides by term: two exchanges + two sorts of panel-scale data).
    # The replay-residue dedupe (byte-identical rows from at-least-
    # once appends must not double-count) moves AFTER that join and
    # shares ONE explicit hash(query_id, doc) exchange with the
    # score aggregation: hash(query_id, doc) satisfies both the
    # dedupe's clustering (subset of its keys) and the groupBy's —
    # previously the pre-join distinct and the sum paid separate
    # full-width exchanges. Deduping per query over the SAME
    # (term, doc, tf, dl, df) key keeps the collapsed set identical,
    # and the scaled-long sum is order-independent, so scores are
    # bit-identical (hash-gated via x8_bm25_index / x8_hybrid_exact).
    # No per-query funnel: the exchange key is (query, doc) — the
    # rank exchange below still gets its WindowGroupLimit map-side
    # prune.
    scored = (matched
              .join(F.broadcast(qterms.select("query_id", "term")),
                    "term")
              .repartition(F.col("query_id"), F.col("doc"))
              .dropDuplicates(["query_id", "term", "doc", "tf", "dl",
                               "df"])
              .withColumn("__c", contrib)
              .groupBy("query_id", F.col("doc").alias("neighbor_id"))
              .agg(F.sum(scaled_term(F.col("__c"))).alias("__s"))
              .select("query_id", "neighbor_id",
                      F.expr(round6_scaled_sum_expr("__s"))
                      .alias("score")))
    return scored


@register_lens("postings_search")
def postings_search_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: index (path from postings_index_build), id, column
    (query text), k (10), k1 (1.2), b (0.75). The input dataframe is
    the QUERY PANEL (the ivfpq_search convention)."""
    index_path = str(require_arg(arguments, "index", "postings_search"))
    id_col = str(require_arg(arguments, "id", "postings_search"))
    text_col = str(require_arg(arguments, "column", "postings_search"))
    return Lens(
        "postings_search", arguments,
        lambda df: postings_index_search(
            df.sparkSession, df, index_path, id_col=id_col,
            text_col=text_col, k=int(arguments.get("k", 10)),
            k1=float(arguments.get("k1", 1.2)),
            b=float(arguments.get("b", 0.75))))


def rrf_fuse(rankings: DataFrame, query_col: str, id_col: str,
             rank_col: str = "rank", *, k0: int = 60,
             k: int = 10) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) — THE standard
    hybrid-retrieval combiner: given a tagged UNION of per-system
    rankings (any number of systems: BM25, dense ANN, TF-IDF — each
    contributing (query, candidate, rank) rows), score every candidate
    as Σ 1/(k0 + rank) over the systems that ranked it and return the
    fused top-``k``. Rank-based, so systems with incomparable score
    scales (lexical vs cosine) fuse without calibration; k0=60 is the
    published default.

    Input shape is ONE dataframe (the lens contract): union the
    systems' rankings first — duplicate (query, candidate) rows from
    different systems are exactly what the sum wants, and a candidate
    one system misses simply contributes fewer terms. The per-term
    reciprocals are quantized to scaled longs before the sum
    (functions.digest) so the fused score is order-independent and
    cross-engine exact; ties break by candidate id. Two-stage top-k —
    no per-query funnel. Returns (query, candidate, rrf, rank) named
    by the input columns.
    """
    check_reserved(rankings, {"__s"}, "rrf_fuse")
    from lens_spark.errors import LensError
    from lens_spark.functions.digest import (
        round6_scaled_sum_expr,
        scaled_term,
    )
    from lens_spark.operators.similarity import _final_topk

    if int(k0) < 1:
        raise LensError("rrf_fuse: k0 must be >= 1")
    contrib = F.lit(1.0) / (F.lit(int(k0)) + F.col(rank_col)
                            .cast("double"))
    # r15 (guide §2.4): ONE explicit hash(query) exchange serves the
    # fusion aggregation AND the final rank window — hash(query)
    # satisfies the groupBy's (query, candidate) clustering (subset of
    # its keys) and the window's, where the planner previously paid
    # hash(query, candidate) for the agg and hash(query) again for the
    # rank. Funnel-safe by the input contract: rankings are per-system
    # top-k rows (each carries a rank), so a query's slice is bounded
    # at systems·k rows however it lands. The scaled-long sum is
    # partition-order-independent, so fused scores are bit-identical
    # (hash-gated via x8_hybrid_exact / x8_hybrid_rrf).
    scored = (rankings
              .repartition(F.col(query_col))
              .groupBy(F.col(query_col).alias("query_id"),
                       F.col(id_col).alias("neighbor_id"))
              .agg(F.sum(scaled_term(contrib)).alias("__s"))
              .select("query_id", "neighbor_id",
                      F.expr(round6_scaled_sum_expr("__s"))
                      .alias("score")))
    out = _final_topk(scored, "query_id", int(k))
    return out.select(F.col("query_id").alias(query_col),
                      F.col("neighbor_id").alias(id_col),
                      F.col("score").alias("rrf"), "rank")


@register_lens("rrf_fuse")
def rrf_fuse_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: query (query-id column), id (candidate column), rank
    ("rank"), k0 (60), k (10). Input is the tagged union of the
    systems' rankings."""
    qc = str(require_arg(arguments, "query", "rrf_fuse"))
    idc = str(require_arg(arguments, "id", "rrf_fuse"))
    return Lens(
        "rrf_fuse", arguments,
        lambda df: rrf_fuse(df, qc, idc,
                            str(arguments.get("rank", "rank")),
                            k0=int(arguments.get("k0", 60)),
                            k=int(arguments.get("k", 10))))


def hybrid_search(spark, queries: DataFrame, *, postings_index: str,
                  ivfpq_index: str, id_col: str, text_col: str,
                  vec_col: str, k: int = 10, per_system_k: int = 20,
                  k0: int = 60, nprobe: int = 4,
                  rerank: "int | None" = None,
                  rerank_corpus: "DataFrame | None" = None) -> DataFrame:
    """Dense+sparse hybrid retrieval over one corpus — the flagship
    composition the two materialized indexes exist for: each panel row
    carries BOTH a text query (``text_col``) and a query vector
    (``vec_col``); BM25 serves from the postings index
    (``postings_index_search`` — partition-pruned to the panel's term
    buckets), cosine ANN serves from the IVFADC index
    (``ivfpq_index_search`` — partition-pruned to the probed cells,
    optional exact re-rank), and the two top-``per_system_k`` rankings
    fuse by reciprocal rank (``rrf_fuse``, Σ 1/(k0+rank)) into the
    final top-``k``. Rank fusion needs no score calibration, which is
    the point: BM25's log-idf scale and cosine's [-1, 1] never meet.

    The 100 TB shape is three bounded stages, none corpus-sized: two
    index probes whose I/O scales with the PANEL (each reads only its
    pruned partitions), one fusion aggregation over ≤ 2·per_system_k
    rows per query. Both indexes must be built over the same id space
    (the caller's contract — same corpus, same ids); a candidate only
    one system ranks simply contributes one reciprocal term.
    ``exclude_self`` is off on the dense side: panel query ids and
    corpus doc ids are different spaces here, and a chance collision
    must not silently drop a hit.

    Returns (query_id, neighbor_id, rrf, rank). Rows-only
    verification (the dense leg is approximate); the recall contract
    vs the exact brute-force+BM25 fusion is pinned by
    tests/test_ranking.py.
    """
    from lens_spark.operators.similarity import _ivfpq_scored

    # Pin the panel once: it feeds FOUR independent plan legs (the
    # postings tokenize, the dense panel collect, the exact re-rank's
    # query fetch, and — when the caller derived it from a join — that
    # derivation would otherwise re-execute per leg). Panels are
    # bounded by contract (the dense leg's 4096-row collect guard),
    # so materializing is cheap and the derivation runs once.
    queries = queries.localCheckpoint(eager=True)
    psk = int(per_system_k)
    sparse = (_postings_scored(spark, queries, postings_index,
                               id_col=id_col, text_col=text_col)
              .withColumn("__sys", F.lit(0)))
    dense = (_ivfpq_scored(spark, ivfpq_index, queries, id_col=id_col,
                           vec_col=vec_col, k=psk, nprobe=nprobe,
                           rerank=rerank, rerank_corpus=rerank_corpus,
                           exclude_self=False)
             .withColumn("__sys", F.lit(1)))
    # r15 (guide §2.4, r14 verdict #1): BOTH per-system final ranks
    # ride ONE (query_id, __sys) window — previously each system paid
    # its own Exchange+Window before the union. row_number over
    # (score desc, neighbor asc) within a (query, system) group is the
    # exact per-system order _rank_topk/_final_topk used, so the
    # ranked rows entering the fusion are identical (hash-gated via
    # x8_hybrid_exact). Funnel-safe: the rank<=psk filter compiles to
    # WindowGroupLimit(Partial) below the exchange (plan-pinned), so
    # each map task forwards at most psk rows per (query, system) —
    # the same bound the two separate rank exchanges had. Past the
    # optimizer threshold the rule cannot fire, so a huge-psk caller
    # keeps the per-system _rank_topk form (its manual prune engages
    # there), exactly _rank_topk's posture.
    try:
        wgl_max = int(queries.sparkSession.conf.get(
            "spark.sql.optimizer.windowGroupLimitThreshold", "1000"))
    except Exception:  # noqa: BLE001 — conf missing on exotic builds
        wgl_max = 1000
    if psk <= wgl_max:
        w = Window.partitionBy("query_id", "__sys").orderBy(
            F.col("score").desc(), F.col("neighbor_id").asc())
        union = (sparse.unionByName(dense)
                 .withColumn("rank",
                             F.row_number().over(w).cast("bigint"))
                 .filter(F.col("rank") <= psk)
                 .select("query_id", "neighbor_id", "rank"))
    else:
        from lens_spark.operators.similarity import _rank_topk

        union = (_rank_topk(sparse.drop("__sys"), "query_id", psk)
                 .select("query_id", "neighbor_id", "rank")
                 .unionByName(
                     _rank_topk(dense.drop("__sys"), "query_id", psk)
                     .select("query_id", "neighbor_id", "rank")))
    return rrf_fuse(union, "query_id", "neighbor_id", "rank",
                    k0=int(k0), k=int(k))


@register_lens("hybrid_search")
def hybrid_search_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: postings_index, ivfpq_index, id, column (query
    text), vector (query vector), k (10), per_system_k (20), k0 (60),
    nprobe (4), rerank (optional) + rerank_table (parquet path with
    true vectors). Input is the query panel. AGGREGATING lens (the
    output is the fused ranking, not the input rows): inverse
    refuses."""
    pidx = str(require_arg(arguments, "postings_index", "hybrid_search"))
    vidx = str(require_arg(arguments, "ivfpq_index", "hybrid_search"))
    id_col = str(require_arg(arguments, "id", "hybrid_search"))
    text_col = str(require_arg(arguments, "column", "hybrid_search"))
    vec_col = str(require_arg(arguments, "vector", "hybrid_search"))
    rerank = (int(arguments["rerank"]) if arguments.get("rerank")
              else None)
    rerank_table = arguments.get("rerank_table")

    def forward(df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        corpus = (spark.read.parquet(str(rerank_table))
                  if rerank_table is not None else None)
        return hybrid_search(
            spark, df, postings_index=pidx, ivfpq_index=vidx,
            id_col=id_col, text_col=text_col, vec_col=vec_col,
            k=int(arguments.get("k", 10)),
            per_system_k=int(arguments.get("per_system_k", 20)),
            k0=int(arguments.get("k0", 60)),
            nprobe=int(arguments.get("nprobe", 4)),
            rerank=rerank, rerank_corpus=corpus)

    def refuse(df: DataFrame) -> DataFrame:
        from lens_spark.errors import LensError
        raise LensError("hybrid_search is not invertible: the fused "
                        "ranking discards the query rows")

    return Lens("hybrid_search", arguments, forward, refuse)


def postings_drift_report(spark, index_path: str,
                          dropped_path: str) -> DataFrame:
    """Turn a streaming postings index's dropped-terms log into the
    REBUILD DECISION INPUT: one row per append batch tag with the
    batch's dropped postings/terms plus the running cumulative drop
    share against the index's stored postings. The frozen-stats
    contract makes unknown terms unretrievable until a
    ``rebuild_index``; this report is how an operator sees that debt
    grow. Recipe: rebuild when ``cum_dropped_frac`` crosses the
    retrievability budget (e.g. 0.05 — 5% of would-be postings are
    invisible to search).

    Replay-safe: the log is at-least-once (a replayed batch re-logs
    byte-identical rows under the same tag), so rows pass a DISTINCT
    before aggregation — the same dedupe-before-sum idiom the index's
    own search uses. Bounded work: the log holds one row per
    (dropped term, batch), and the index side reads the MAINTAINED
    row-count stat (``stats.json``, seeded at build, bumped per
    append, recounted at full compaction) — nothing corpus- or
    index-sized. Only a pre-stat index (or one whose sidecar a torn
    update lost) pays a one-off recount, and the stat counts STORED
    rows, which exceeds distinct postings by at most the
    at-least-once replay residue until a ``drop_replay_duplicates``
    compaction reclaims it — a slightly LARGER denominator, i.e. the
    conservative direction for a rebuild trigger is "rebuild a touch
    late", bounded by the replay volume.

    The log measures drift SINCE THE BUILD the index currently
    serves: after a ``rebuild_index`` the previously-dropped terms ARE
    retrievable, so point the stream at a FRESH ``dropped_path`` (or
    delete the old log) when the rebuild commits — stale entries
    would overstate debt against the rebuilt index and trigger the
    next rebuild early.

    Ordering: streaming batch ids are numeric strings, and from batch
    10 on lexicographic order ('10' < '2') would scramble the running
    cumulative sum (r12 advice) — tags that parse as integers order
    numerically, any non-numeric tags follow lexicographically.
    Returns (tag, n_terms_dropped, n_postings_dropped,
    cum_dropped_postings, index_postings, cum_dropped_frac) in that
    order.
    """
    from pyspark.sql import Window

    from lens_spark.sources import dataset_nonempty

    _read_postings_model(spark, index_path, "postings_drift_report")
    index_postings = _read_postings_stats(spark, index_path)
    if index_postings is None:
        index_postings = 0
        if dataset_nonempty(spark, f"{index_path}/parts"):
            index_postings = (spark.read.parquet(f"{index_path}/parts")
                              .select("term", "doc").distinct().count())
    if not dataset_nonempty(spark, dropped_path):
        return spark.createDataFrame(
            [], "tag string, n_terms_dropped bigint, "
                "n_postings_dropped bigint, cum_dropped_postings bigint, "
                "index_postings bigint, cum_dropped_frac double")
    per_tag = (spark.read.parquet(dropped_path)
               .select("tag", "term", "n_postings_dropped")
               .distinct()  # at-least-once replay residue collapses
               .groupBy("tag")
               .agg(F.count(F.lit(1)).alias("n_terms_dropped"),
                    F.sum("n_postings_dropped")
                    .alias("n_postings_dropped")))
    # numeric-first tag order (r12 advice): str(batch_id) tags must
    # accumulate as 2 < 9 < 10, not '10' < '2' < '9' (try_cast: a
    # non-numeric tag is a caller label, not an ANSI cast error)
    tag_num = F.col("tag").try_cast("long")
    order = [F.when(tag_num.isNull(), F.lit(1)).otherwise(F.lit(0)),
             tag_num, F.col("tag")]
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return (per_tag
            .withColumn("cum_dropped_postings",
                        F.sum("n_postings_dropped").over(w))
            .withColumn("index_postings", F.lit(int(index_postings)))
            .withColumn(
                "cum_dropped_frac",
                F.when(F.lit(index_postings) > 0,
                       F.round(F.col("cum_dropped_postings")
                               / (F.col("cum_dropped_postings")
                                  + F.lit(int(index_postings))), 6))
                .otherwise(F.lit(1.0)))
            .orderBy(*order))
