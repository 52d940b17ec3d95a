"""TF-IDF / BM25 ranking lens tests (operators.ranking)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

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


# --------------------------------------------------------------------
# Materialized BM25 postings index (the sparse counterpart of ivfpq)
# --------------------------------------------------------------------


def _panel(spark, *texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "qid long, qtext string")


def test_postings_index_served_equals_inline_bm25(spark, corpus, tmp_path):
    """Serving from the materialized index must reproduce bm25_score
    exactly — same idf, same frozen-at-build N/avgdl (= the live
    corpus stats at build time), same quantized digest sum."""
    from lens_spark.operators.ranking import (
        postings_index_build,
        postings_index_search,
    )

    idx = str(tmp_path / "pidx")
    stats = postings_index_build(corpus, idx, id_col="id",
                                 text_col="text")
    # n_terms_approx: the retry-inexactness is in the NAME (r14 advice —
    # it rides a shuffle-map-stage observation); the exact stats keep
    # their plain names
    assert stats["n_docs"] == 4
    assert stats["n_postings"] >= stats["n_terms_approx"]
    assert "n_terms" not in stats, "exact-looking key for an approx stat"

    panel = _panel(spark, "spark join", "hash")
    got = postings_index_search(spark, panel, idx, id_col="qid",
                                text_col="qtext", k=10)
    served = {(r.query_id, r.neighbor_id): r.bm25 for r in got.collect()}
    for qid, terms in ((0, ["spark", "join"]), (1, ["hash"])):
        inline = {r.id: r.bm25 for r in
                  bm25_score(corpus, "id", "text", terms).collect()}
        assert {d for q, d in served if q == qid} == set(inline)
        for (q, d), s in served.items():
            if q == qid:
                assert s == inline[d], (q, d, s, inline[d])
    # ranks are contiguous from 1 per query, ordered by score desc
    ranks = sorted((r.query_id, r.rank, r.bm25) for r in got.collect())
    for q in (0, 1):
        qr = [(rk, sc) for qq, rk, sc in ranks if qq == q]
        assert [rk for rk, _ in qr] == list(range(1, len(qr) + 1))
        assert all(qr[i][1] >= qr[i + 1][1] for i in range(len(qr) - 1))


def test_postings_append_frozen_stats_and_unknown_terms(spark, corpus,
                                                        tmp_path):
    """Append half the corpus to an index built on the other half:
    known-term postings score on the BUILD scale (df/N/avgdl frozen),
    and a term the build never saw is dropped and reported, not
    silently mis-scored."""
    from lens_spark.operators.ranking import (
        postings_index_append,
        postings_index_build,
        postings_index_search,
    )

    first = corpus.filter("id <= 2")
    idx = str(tmp_path / "pidx_grow")
    postings_index_build(first, idx, id_col="id", text_col="text")
    rep = postings_index_append(corpus.filter("id > 2"), idx,
                                id_col="id", text_col="text")
    # doc 4 contributes spark+hash (known); doc 3's 4 terms are unknown
    assert rep["n_postings"] == 2
    assert rep["n_dropped_postings"] == 4
    got = postings_index_search(
        spark, _panel(spark, "spark"), idx, id_col="qid",
        text_col="qtext", k=10)
    by_doc = {r.neighbor_id: r.bm25 for r in got.collect()}
    assert set(by_doc) == {1, 4}  # appended doc 4 is retrievable
    # frozen scale: doc 1's score is byte-identical to the build-only
    # index (the append changed nothing about existing postings)
    idx2 = str(tmp_path / "pidx_base")
    postings_index_build(first, idx2, id_col="id", text_col="text")
    base = {r.neighbor_id: r.bm25 for r in postings_index_search(
        spark, _panel(spark, "spark"), idx2, id_col="qid",
        text_col="qtext", k=10).collect()}
    assert by_doc[1] == base[1]


def test_postings_replay_duplicates_do_not_double_count(spark, corpus,
                                                        tmp_path):
    """An at-least-once replay of the same append stores byte-identical
    rows; the dedupe-before-sum distinct keeps every score unchanged."""
    from lens_spark.operators.ranking import (
        postings_index_append,
        postings_index_build,
        postings_index_search,
    )

    idx = str(tmp_path / "pidx_replay")
    postings_index_build(corpus.filter("id <= 3"), idx, id_col="id",
                         text_col="text")
    batch = corpus.filter("id = 4")
    postings_index_append(batch, idx, id_col="id", text_col="text")
    before = {(r.query_id, r.neighbor_id): r.bm25
              for r in postings_index_search(
                  spark, _panel(spark, "spark hash"), idx,
                  id_col="qid", text_col="qtext", k=10).collect()}
    postings_index_append(batch, idx, id_col="id", text_col="text")
    after = {(r.query_id, r.neighbor_id): r.bm25
             for r in postings_index_search(
                 spark, _panel(spark, "spark hash"), idx,
                 id_col="qid", text_col="qtext", k=10).collect()}
    assert after == before


def test_postings_partition_pruning_and_lens(spark, corpus, tmp_path):
    """The panel's term probe reaches the parquet scan as a partition
    filter (scan I/O scales with the panel's buckets, not the index),
    and the postings_search lens serves the panel through a lens file."""
    from lens_spark.operators.ranking import postings_index_build

    idx = str(tmp_path / "pidx_prune")
    postings_index_build(corpus, idx, id_col="id", text_col="text")
    panel = _panel(spark, "spark")
    spec = {"lenses": [{"name": "postings_search", "arguments": {
        "index": idx, "id": "qid", "column": "qtext", "k": 5}}]}
    out = engine.append(panel, spec)
    assert out.columns == ["query_id", "neighbor_id", "bm25", "rank"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the panel's (term, pb) probe reaches the postings scan as a
    # dynamic-partition-pruning subquery on the pb directory column
    assert "dynamicpruning" in plan.lower() and "pb" in plan
    assert {r.neighbor_id for r in out.collect()} == {1, 4}


def test_postings_maintenance_detects_and_compacts(spark, corpus,
                                                   tmp_path):
    """The maintenance sweep classifies a postings index from its
    model.json format and compacts it with the shared pb-layout
    compactor; search refuses an interrupted rewrite until recovery."""
    import shutil

    from lens_spark.errors import LensError
    from lens_spark.maintenance import compact_all, detect_index_kind
    from lens_spark.operators.ranking import (
        postings_index_append,
        postings_index_build,
        postings_index_search,
    )

    root = tmp_path / "pmx"
    idx = str(root / "pidx")
    postings_index_build(corpus.filter("id <= 3"), idx, id_col="id",
                         text_col="text")
    postings_index_append(corpus.filter("id = 4"), idx, id_col="id",
                          text_col="text")
    assert detect_index_kind(spark, idx) == "postings"
    report = compact_all(spark, str(root))
    stats = report[idx]
    assert stats["kind"] == "postings"
    assert stats["files_after"] <= stats["files_before"]
    # data preserved
    got = postings_index_search(spark, _panel(spark, "spark"), idx,
                                id_col="qid", text_col="qtext", k=10)
    assert {r.neighbor_id for r in got.collect()} == {1, 4}
    # read-only refusal on the unsafe window
    parts = root / "pidx" / "parts"
    shutil.move(str(parts), str(parts) + ".old")
    with pytest.raises(LensError, match="interrupted rewrite"):
        postings_index_search(spark, _panel(spark, "spark"), idx,
                              id_col="qid", text_col="qtext").collect()


def test_postings_build_refuses_in_place_rebuild(spark, corpus, tmp_path):
    """An in-place rebuild has a torn parts/model.json crash window
    (parts hashed mod the new bucket count, model still claiming the
    old one -> silently empty panels) — build refuses an existing
    index outright."""
    from lens_spark.errors import LensError
    from lens_spark.operators.ranking import postings_index_build

    idx = str(tmp_path / "pidx_rebuild")
    postings_index_build(corpus, idx, id_col="id", text_col="text")
    with pytest.raises(LensError, match="already holds a committed index"):
        postings_index_build(corpus, idx, id_col="id", text_col="text",
                             buckets=128)


def test_rrf_fuse_hand_computed_and_lens(spark):
    """RRF on a hand-computed two-system union: a candidate both
    systems rank beats either single-system candidate; scores are the
    quantized Σ 1/(k0+rank); the lens form matches."""
    rankings = spark.createDataFrame(
        [(0, 10, 1, "bm25"), (0, 20, 2, "bm25"),
         (0, 20, 1, "dense"), (0, 30, 2, "dense")],
        "qid long, doc long, rank long, system string")
    from lens_spark.operators.ranking import rrf_fuse

    out = rrf_fuse(rankings, "qid", "doc", "rank", k0=60, k=10)
    rows = {r.doc: (r.rrf, r.rank) for r in out.collect()}
    exp_d20 = round(round(1 / 61 * 1e11) / 1e11
                    + round(1 / 62 * 1e11) / 1e11, 6)
    assert rows[20][1] == 1 and rows[20][0] == pytest.approx(exp_d20)
    assert rows[10][1] == 2 and rows[10][0] == pytest.approx(
        round(1 / 61, 6))
    assert rows[30][1] == 3 and rows[30][0] == pytest.approx(
        round(1 / 62, 6))
    spec = {"lenses": [{"name": "rrf_fuse", "arguments": {
        "query": "qid", "id": "doc", "k0": 60, "k": 2}}]}
    fused = engine.append(rankings, spec)
    assert fused.columns == ["qid", "doc", "rrf", "rank"]
    assert {r.doc for r in fused.collect()} == {20, 10}  # k=2 cut


def test_postings_build_crashed_leftover_is_retryable(spark, corpus,
                                                      tmp_path):
    """model.json is the commit marker, written LAST: a build that
    crashed after the parts write (no model) must be retryable in
    place, not bricked by the rebuild refusal; and a concurrent
    builder holding the lease is refused loudly."""
    import os
    import shutil

    from lens_spark.errors import ConcurrentIndexWriterError
    from lens_spark.operators.ranking import (
        postings_index_build,
        postings_index_search,
    )

    idx = str(tmp_path / "pidx_crash")
    postings_index_build(corpus, idx, id_col="id", text_col="text")
    # simulate the crash window: parts/ present, commit marker gone
    os.remove(f"{idx}/model.json")
    stats = postings_index_build(corpus, idx, id_col="id",
                                 text_col="text")
    assert stats["n_docs"] == 4
    got = postings_index_search(spark, _panel(spark, "spark"), idx,
                                id_col="qid", text_col="qtext", k=10)
    assert {r.neighbor_id for r in got.collect()} == {1, 4}
    # a live writer lease blocks a concurrent build outright
    busy = str(tmp_path / "pidx_busy")
    os.makedirs(busy)
    open(f"{busy}/_writer.lock", "w").write("")
    with pytest.raises(ConcurrentIndexWriterError):
        postings_index_build(corpus, busy, id_col="id",
                             text_col="text")
    shutil.rmtree(busy)


@pytest.fixture(scope="module")
def hybrid_setup(spark, tmp_path_factory):
    """One corpus with BOTH text and vectors, indexed both ways.
    Panel ids are offset +1000 so dense self-exclusion semantics never
    enter (the hybrid contract: panel and corpus ids are different
    spaces)."""
    import random

    from lens_spark.operators.ranking import postings_index_build
    from lens_spark.operators.similarity import ivfpq_index_build

    rng = random.Random(11)
    vocab = ["spark", "hash", "join", "shuffle", "sort", "scan",
             "codegen", "parquet"]
    rows = []
    for i in range(48):
        text = " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(4, 10)))
        vec = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((i, text, vec))
    corpus = spark.createDataFrame(
        rows, "vec_id long, text string, embedding array<float>")
    base = tmp_path_factory.mktemp("hybrid")
    pidx, vidx = str(base / "pidx"), str(base / "vidx")
    postings_index_build(corpus, pidx, id_col="vec_id", text_col="text")
    ivfpq_index_build(corpus, vidx, id_col="vec_id", vec_col="embedding",
                      dim=8, nlist=4, m=4, nbits=6)
    panel = (corpus.filter("vec_id < 3")
             .select((F.col("vec_id") + 1000).alias("vec_id"),
                     "text", "embedding"))
    return corpus, pidx, vidx, panel


def _exact_hybrid(spark, corpus, pidx, panel, *, per_system_k, k0, k):
    """The exact reference fusion: BM25 from the postings index (the
    sparse leg is exact by construction) + BRUTE-FORCE cosine, fused
    with the same rrf parameters."""
    from lens_spark.operators.ranking import (
        postings_index_search,
        rrf_fuse,
    )
    from lens_spark.operators.similarity import brute_force_topk

    sparse = postings_index_search(spark, panel, pidx, id_col="vec_id",
                                   text_col="text", k=per_system_k)
    dense = brute_force_topk(corpus, panel, id_col="vec_id",
                             vec_col="embedding", k=per_system_k)
    union = (sparse.select("query_id", "neighbor_id", "rank")
             .unionByName(dense.select("query_id", "neighbor_id",
                                       "rank")))
    return rrf_fuse(union, "query_id", "neighbor_id", "rank",
                    k0=k0, k=k)


def test_hybrid_search_full_probe_rerank_equals_exact_fusion(
        spark, hybrid_setup):
    """With every cell probed and an exact re-rank covering the
    corpus, the dense leg IS brute-force cosine — so the fused hybrid
    must equal the exact BM25 + brute-force fusion row for row (rrf
    scores included: both paths use the quantized scaled-long sum)."""
    from lens_spark.operators.ranking import hybrid_search

    corpus, pidx, vidx, panel = hybrid_setup
    got = hybrid_search(spark, panel, postings_index=pidx,
                        ivfpq_index=vidx, id_col="vec_id",
                        text_col="text", vec_col="embedding", k=10,
                        per_system_k=20, nprobe=4, rerank=48,
                        rerank_corpus=corpus)
    want = _exact_hybrid(spark, corpus, pidx, panel, per_system_k=20,
                         k0=60, k=10)
    assert ({tuple(r) for r in got.collect()}
            == {tuple(r) for r in want.collect()})
    assert got.columns == ["query_id", "neighbor_id", "rrf", "rank"]


def test_hybrid_search_recall_vs_exact_fusion(spark, hybrid_setup):
    """The approximate regime (nprobe < nlist, no re-rank): fused
    recall@10 against the exact fusion stays useful — the sparse leg
    is always exact, so even a lossy dense leg keeps most of the
    fused set."""
    from lens_spark.operators.ranking import hybrid_search

    corpus, pidx, vidx, panel = hybrid_setup
    got = hybrid_search(spark, panel, postings_index=pidx,
                        ivfpq_index=vidx, id_col="vec_id",
                        text_col="text", vec_col="embedding", k=10,
                        per_system_k=20, nprobe=3)
    want = _exact_hybrid(spark, corpus, pidx, panel, per_system_k=20,
                         k0=60, k=10)
    want_sets, got_sets = {}, {}
    for r in want.collect():
        want_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in got.collect():
        got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    recalls = [len(got_sets.get(q, set()) & s) / len(s)
               for q, s in want_sets.items()]
    assert len(recalls) == 3
    assert min(recalls) >= 0.5
    assert sum(recalls) / len(recalls) >= 0.7


def test_hybrid_search_lens_plan_and_refusal(spark, hybrid_setup):
    """The lens path: BOTH index scans stay pruned inside the fused
    plan (the postings scan by the panel's term-bucket DPP subquery,
    the IVFADC scan by the probed-cell partition filter), and the
    aggregating lens refuses inversion."""
    from lens_spark.errors import LensError

    corpus, pidx, vidx, panel = hybrid_setup
    spec = {"lenses": [{"name": "hybrid_search", "arguments": {
        "postings_index": pidx, "ivfpq_index": vidx, "id": "vec_id",
        "column": "text", "vector": "embedding", "k": 10,
        "per_system_k": 20, "nprobe": 2}}]}
    out = engine.append(panel, spec)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() and "pb" in plan
    assert "cell" in plan and "PartitionFilters: [cell" in plan.replace(
        "PartitionFilters: [isnotnull(cell", "PartitionFilters: [cell")
    assert out.count() == 30
    with pytest.raises(LensError, match="not invertible"):
        engine.inverse(panel, spec).collect()


def test_hybrid_store_vectors_rerank_needs_no_corpus_scan(
        spark, hybrid_setup, tmp_path):
    """r13 verdict #1 at the hybrid level: with the IVFADC index built
    ``store_vectors=True``, the exact re-rank runs WITHOUT
    ``rerank_corpus`` — true vectors come from the index's own
    probed-cell partitions — and returns row-for-row what the
    corpus-fed fusion returns (same model, same floats). The serve
    plan's every file scan is one of the two indexes; no vector-table
    scan exists to become the per-panel I/O ceiling."""
    from lens_spark.operators.ranking import hybrid_search
    from lens_spark.operators.similarity import ivfpq_index_build

    corpus, pidx, vidx, panel = hybrid_setup
    vidx_sv = str(tmp_path / "vidx_sv")
    # same corpus + params as the fixture's index → same model
    ivfpq_index_build(corpus, vidx_sv, id_col="vec_id",
                      vec_col="embedding", dim=8, nlist=4, m=4,
                      nbits=6, store_vectors=True)
    got = hybrid_search(spark, panel, postings_index=pidx,
                        ivfpq_index=vidx_sv, id_col="vec_id",
                        text_col="text", vec_col="embedding", k=10,
                        per_system_k=20, nprobe=4, rerank=48)
    want = hybrid_search(spark, panel, postings_index=pidx,
                         ivfpq_index=vidx, id_col="vec_id",
                         text_col="text", vec_col="embedding", k=10,
                         per_system_k=20, nprobe=4, rerank=48,
                         rerank_corpus=corpus)
    assert ({tuple(r) for r in got.collect()}
            == {tuple(r) for r in want.collect()})
    plan = got._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scans
    for ln in scans:
        # every scan is partition-pruned index I/O: the IVFADC scans
        # by probed cell, the postings scan by term bucket (pb) — an
        # unpartitioned vector-table scan would carry neither
        assert "PartitionFilters" in ln and ("cell#" in ln
                                             or "pb#" in ln), ln


def test_postings_drift_report_tracks_unretrievable_debt(spark, corpus,
                                                         tmp_path):
    """The dropped-terms log's consumer (r12): per-batch dropped
    terms/postings with the running cumulative drop share — the
    rebuild decision input. Replayed batches (byte-identical log rows
    under the same tag) never double-count."""
    from lens_spark.operators.ranking import (
        postings_drift_report,
        postings_index_append,
        postings_index_build,
    )

    idx = str(tmp_path / "pidx_drift")
    log = str(tmp_path / "dropped")
    postings_index_build(corpus.filter("id <= 2"), idx, id_col="id",
                         text_col="text")
    # batch "b1": doc 3 is all-unknown (4 postings), doc 4 known
    postings_index_append(corpus.filter("id > 2"), idx, id_col="id",
                          text_col="text", dropped_path=log,
                          dropped_tag="b1")
    # batch "b2": one novel term in one doc
    b2 = spark.createDataFrame([(9, "spark warp")], "id long, text string")
    postings_index_append(b2, idx, id_col="id", text_col="text",
                          dropped_path=log, dropped_tag="b2")
    # replay of b2: identical rows under the same tag
    postings_index_append(b2, idx, id_col="id", text_col="text",
                          dropped_path=log, dropped_tag="b2")

    rows = {r.tag: r for r in postings_drift_report(spark, idx,
                                                    log).collect()}
    assert rows["b1"].n_terms_dropped == 4
    assert rows["b1"].n_postings_dropped == 4
    assert rows["b2"].n_terms_dropped == 1
    assert rows["b2"].n_postings_dropped == 1  # replay collapsed
    assert rows["b2"].cum_dropped_postings == 5
    n_index = rows["b2"].index_postings
    assert rows["b2"].cum_dropped_frac == pytest.approx(
        round(5 / (5 + n_index), 6))


def test_drift_report_orders_numeric_tags_numerically(spark, corpus,
                                                      tmp_path):
    """From batch 10 on, lexicographic tag order ('10' < '2' < '9')
    would scramble the running cumulative sum — the r12 advice defect
    (the streaming runner tags with str(batch_id)). Numeric-string
    tags must accumulate as 2 < 9 < 10."""
    from lens_spark.operators.ranking import (
        postings_drift_report,
        postings_index_build,
    )

    idx = str(tmp_path / "pidx_numtags")
    log = str(tmp_path / "dropped_numtags")
    postings_index_build(corpus, idx, id_col="id", text_col="text")
    # synthesize the dropped log directly: 12 batches, one dropped
    # posting each, tags "0".."11" (the shape str(batch_id) produces)
    spark.createDataFrame(
        [(f"t{i}", 1, str(i)) for i in range(12)],
        "term string, n_postings_dropped long, tag string",
    ).write.mode("overwrite").parquet(log)
    rows = postings_drift_report(spark, idx, log).collect()
    assert [r.tag for r in rows] == [str(i) for i in range(12)]
    assert [r.cum_dropped_postings for r in rows] == list(range(1, 13))
    # non-numeric tags order after every numeric one, lexicographically
    spark.createDataFrame(
        [("tx", 1, "b2"), ("ty", 1, "a1")],
        "term string, n_postings_dropped long, tag string",
    ).write.mode("append").parquet(log)
    rows = postings_drift_report(spark, idx, log).collect()
    assert [r.tag for r in rows] == [str(i) for i in range(12)] + ["a1", "b2"]
    assert rows[-1].cum_dropped_postings == 14


def test_postings_stat_maintained_and_report_reads_it(spark, corpus,
                                                      tmp_path):
    """postings_drift_report's denominator is O(1) (r12 verdict #5):
    the stats.json sidecar equals a true recount after build, after an
    append, and after a full compaction (which reseeds it); the
    report's plan never scans the index when the stat is present; and
    a lost sidecar degrades to the recount, not a wrong answer."""
    from lens_spark.operators.dedup import compact_index
    from lens_spark.operators.ranking import (
        _read_postings_stats,
        postings_drift_report,
        postings_index_append,
        postings_index_build,
    )

    idx = str(tmp_path / "pidx_stat")
    log = str(tmp_path / "dropped_stat")

    def recount():
        return spark.read.parquet(f"{idx}/parts").count()

    postings_index_build(corpus.filter("id <= 3"), idx, id_col="id",
                         text_col="text")
    assert _read_postings_stats(spark, idx) == recount()
    batch = spark.createDataFrame([(9, "spark warp")],
                                  "id long, text string")
    postings_index_append(batch, idx, id_col="id", text_col="text",
                          dropped_path=log, dropped_tag="1")
    assert _read_postings_stats(spark, idx) == recount()
    compact_index(spark, idx, drop_replay_duplicates=True)
    assert _read_postings_stats(spark, idx) == recount()

    rep = postings_drift_report(spark, idx, log)
    assert {r.index_postings for r in rep.collect()} == {recount()}
    # the O(1) claim, pinned on the plan: no scan of the index's parts
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert f"{idx}/parts" not in plan
    # sidecar lost (torn update / pre-r13 index): recount fallback
    import os
    os.remove(f"{idx}/stats.json")
    rep2 = postings_drift_report(spark, idx, log)
    assert {r.index_postings for r in rep2.collect()} == {recount()}


def test_hybrid_serve_query_equals_end_to_end_query(spark):
    """x8_hybrid_serve (r12 verdict #4 — the bench split) must return
    row-for-row what x8_hybrid_dense_sparse returns: same panel, same
    parameters, same machinery — the only difference is fresh vs
    per-process memoized indexes, which must not change a byte."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    serve = {tuple(r) for r in entrymod.q_x8_hybrid_serve(
        spark, sf).collect()}
    e2e = {tuple(r) for r in entrymod.q_x8_hybrid_dense_sparse(
        spark, sf).collect()}
    assert serve == e2e and serve
    # the memo actually memoizes: a second call reuses the same paths
    p1 = entrymod._HYBRID_INDEX_MEMO[sf]
    entrymod.q_x8_hybrid_serve(spark, sf).collect()
    assert entrymod._HYBRID_INDEX_MEMO[sf] is p1


def test_postings_search_broadcasts_panel_and_fuses_dedupe_exchange(
        spark, corpus, tmp_path):
    """r15 (guide §2.4/§3.1): the panel-side scoring join must be a
    broadcast (the panel is bounded by the same contract that
    broadcasts the (term, pb) probe — the old plan sort-merge-joined
    panel-scale data through two exchanges and two sorts), and the
    replay-residue dedupe must share ONE explicit (query_id, doc)
    exchange with the score aggregation instead of paying its own
    full-width exchange before the join. The rank still gets its
    map-side WindowGroupLimit prune — the exchange key is
    (query, doc), never query alone, so no per-query funnel."""
    import re

    from lens_spark.operators.ranking import (
        postings_index_build,
        postings_index_search,
    )

    idx = str(tmp_path / "pidx_fused")
    postings_index_build(corpus, idx, id_col="id", text_col="text")
    out = postings_index_search(spark, _panel(spark, "spark hash join"),
                                idx, id_col="qid", text_col="qtext", k=3)
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(out._jdf.queryExecution(),
                                            "formatted")
    assert "SortMergeJoin" not in plan, "panel join degraded to SMJ"
    # exactly one (query_id, doc) exchange: dedupe + sum ride it
    # (formatted explain puts the partitioning on the Arguments line)
    shared = re.findall(
        r"hashpartitioning\(query_id#\d+L?, doc#\d+", plan)
    assert len(shared) == 1, f"expected 1 shared exchange:\n{plan}"
    # the rank exchange is the only query_id-only hash exchange, and
    # the map-side prune still sits below it
    assert "WindowGroupLimit" in plan
    # results unchanged (hash-gated in the bench via x8_bm25_index;
    # cheap sanity here): every ranked doc contains a panel term
    assert {r.neighbor_id for r in out.collect()} <= {1, 2, 4}


def test_hybrid_search_single_per_system_rank_window(spark,
                                                     hybrid_setup):
    """r15 (guide §2.4, r14 verdict #1): the hybrid serve plan fuses
    BOTH per-system final ranks into ONE (query_id, __sys) window and
    the rrf fusion + final rank into ONE hash(query_id) exchange — the
    no-rerank plan carries exactly 2 Window nodes (per-system rank +
    fused rank; previously sparse rank, dense rank, and fusion rank
    each paid their own), with the per-system rank's map-side
    WindowGroupLimit prune below its exchange so no (query, system)
    candidate set ever funnels unpruned. The rerank plan adds only the
    dense shortlist's window (3 total). Past the optimizer's
    windowGroupLimitThreshold the fused window cannot get its map-side
    prune, so the per-system _rank_topk fallback engages."""
    import re

    from lens_spark.operators.ranking import hybrid_search

    corpus, pidx, vidx, panel = hybrid_setup
    got = hybrid_search(spark, panel, postings_index=pidx,
                        ivfpq_index=vidx, id_col="vec_id",
                        text_col="text", vec_col="embedding", k=5,
                        per_system_k=10, nprobe=4)
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(got._jdf.queryExecution(),
                                            "formatted")
    final = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"\bWindow \(", final)) == 2, final
    assert "WindowGroupLimit" in plan and "Partial" in plan
    # per-system window hashes (query_id, __sys); the fusion tail's
    # one exchange hashes query_id alone
    assert re.search(r"hashpartitioning\(query_id#\d+L?, __sys#\d+",
                     plan), plan

    rr = hybrid_search(spark, panel, postings_index=pidx,
                       ivfpq_index=vidx, id_col="vec_id",
                       text_col="text", vec_col="embedding", k=5,
                       per_system_k=10, nprobe=4, rerank=20,
                       rerank_corpus=corpus)
    plan_rr = jvm.PythonSQLUtils.explainString(rr._jdf.queryExecution(),
                                               "formatted")
    final_rr = plan_rr.split("== Initial Plan ==")[0]
    assert len(re.findall(r"\bWindow \(", final_rr)) == 3, final_rr

    # huge-psk regime: the optimizer rule cannot fire, so the fused
    # window must NOT be used — the manual per-system prune engages
    big = hybrid_search(spark, panel, postings_index=pidx,
                        ivfpq_index=vidx, id_col="vec_id",
                        text_col="text", vec_col="embedding", k=5,
                        per_system_k=1500, nprobe=4)
    plan_big = big._jdf.queryExecution().executedPlan().toString()
    assert "__sys" not in plan_big
    assert "__pid" in plan_big
