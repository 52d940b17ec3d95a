"""X2/X3 approximate-operator accuracy tests: ANN recall vs brute
force, IVF recall vs brute force, and exact n-gram Jaccard pairs vs a
direct pairwise computation (small SF only — the operators themselves
never materialize O(n²) at scale)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from lens_spark.operators.dedup import ngram_jaccard_pairs
from lens_spark.operators.similarity import ann_topk, brute_force_topk, ivf_topk

SF = "/root/testdata/sf0.001"
K = 10
N_QUERIES = 5


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _recall(approx, exact) -> float:
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    return len(a & e) / len(e)


def test_ivf_recall_vs_brute(spark, emb):
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = brute_force_topk(emb, queries, id_col="vec_id",
                             vec_col="embedding", k=K)
    approx = ivf_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                      k=K, nlist=16, nprobe=4)
    # probing 4/16 cells must still find most true neighbors
    assert _recall(approx, exact) >= 0.5


def test_topk_with_recall_ann_meets_contract(spark, emb):
    """The driver-visible quality contract: the recall_at_k column the
    x3_ann_topk query emits must average >= 0.9 at the entry-point
    parameters (deterministic — planes derive from a fixed seed)."""
    from lens_spark.operators.similarity import topk_with_recall

    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = topk_with_recall(emb, queries, id_col="vec_id",
                           vec_col="embedding", k=K, method="ann",
                           dim=64, num_bits=4, num_tables=16)
    per_q = out.select("query_id", "recall_at_k").distinct()
    assert per_q.count() == N_QUERIES
    assert per_q.agg(F.avg("recall_at_k")).first()[0] >= 0.9


def test_topk_with_recall_ivf_meets_contract(spark, emb):
    from lens_spark.operators.similarity import topk_with_recall

    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = topk_with_recall(emb, queries, id_col="vec_id",
                           vec_col="embedding", k=K, method="ivf",
                           nlist=16, nprobe=8)
    per_q = out.select("query_id", "recall_at_k").distinct()
    assert per_q.agg(F.avg("recall_at_k")).first()[0] >= 0.9


def test_topk_with_recall_exact_method_scores_one(spark, emb):
    """Degenerate check that the recall computation itself is right:
    IVF probing every cell IS brute force, so every query's measured
    recall must be exactly 1.0."""
    from lens_spark.operators.similarity import topk_with_recall

    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    out = topk_with_recall(emb, queries, id_col="vec_id",
                           vec_col="embedding", k=K, method="ivf",
                           nlist=8, nprobe=8)
    recalls = {r.recall_at_k for r in out.select("recall_at_k").collect()}
    assert recalls == {1.0}


def test_ivf_probe_all_cells_is_exact(spark, emb):
    """nprobe == nlist degrades IVF to brute force — recall must be 1."""
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = brute_force_topk(emb, queries, id_col="vec_id",
                             vec_col="embedding", k=K)
    full = ivf_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                    k=K, nlist=8, nprobe=8)
    assert _recall(full, exact) == 1.0


def test_ngram_jaccard_matches_pairwise(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in ngram_jaccard_pairs(docs, "doc_id", "text",
                                        ngram=3, threshold=0.3).collect()}
    # direct O(n²) cross-join reference on the tiny SF
    from lens_spark.functions.hashing import jaccard_shingles, word_shingles

    sh = docs.select("doc_id", word_shingles(F.col("text"), 3).alias("s")) \
        .filter(F.size("s") > 0)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))
    expect = {(r.id_a, r.id_b): r.j
              for r in a.join(b, F.col("id_a") < F.col("id_b"))
              .withColumn("j", F.round(jaccard_shingles(F.col("sa"), F.col("sb")), 6))
              .filter(F.col("j") >= 0.3).collect()}
    assert got == expect


def test_ngram_jaccard_df_cut_drops_stop_shingles(spark):
    docs = spark.createDataFrame(
        [(1, "the common tail a b c"), (2, "the common tail d e f"),
         (3, "the common tail g h i")],
        "doc_id long, text string")
    # every pair shares only the boilerplate shingles; df-cut at 2 kills
    # shingles present in all 3 docs, so no pair survives
    cut = ngram_jaccard_pairs(docs, "doc_id", "text", ngram=3,
                              threshold=0.01, max_df=2)
    full = ngram_jaccard_pairs(docs, "doc_id", "text", ngram=3,
                               threshold=0.01)
    assert full.count() > 0
    assert cut.count() < full.count()


def test_embedding_neardup_lsh_is_verified_subset(spark, emb):
    from lens_spark.operators.dedup import embedding_neardup_pairs

    exact = {(r.id_a, r.id_b): r.cosine
             for r in embedding_neardup_pairs(
                 emb, "vec_id", "embedding", threshold=0.4).collect()}
    lsh = {(r.id_a, r.id_b): r.cosine
           for r in embedding_neardup_pairs(
               emb, "vec_id", "embedding", threshold=0.4, method="lsh",
               dim=64, num_bits=4, num_tables=8).collect()}
    # every LSH pair is a true positive with the exact score
    for pair, cos in lsh.items():
        assert exact[pair] == cos
    # and recall is meaningful at these parameters
    assert len(lsh) >= 0.5 * len(exact) > 0


def test_embedding_neardup_error_paths_raise_lens_error(spark, emb):
    """Round-2 regression: these raised NameError (LensError referenced
    but never imported in dedup.py) instead of the intended error."""
    import pytest

    from lens_spark.errors import LensError
    from lens_spark.operators.dedup import embedding_neardup_pairs

    with pytest.raises(LensError, match="needs dim"):
        embedding_neardup_pairs(emb, "vec_id", "embedding",
                                threshold=0.4, method="lsh")
    with pytest.raises(LensError, match="unknown method"):
        embedding_neardup_pairs(emb, "vec_id", "embedding",
                                threshold=0.4, method="bogus")


def test_topk_with_recall_surfaces_zero_candidate_queries(spark, monkeypatch):
    """A query whose approximate candidate set is empty must appear in
    the output with recall_at_k = 0.0 — dropping it would overstate mean
    recall exactly when the ANN parameters are worst."""
    import lens_spark.operators.similarity as sim

    corpus = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "id long, vec array<double>")
    queries = spark.createDataFrame(
        [(0, [0.0, 1.0]), (7, [7.0, 1.0])], "id long, vec array<double>")

    real_ann = sim.ann_topk

    def starved_ann(c, q, **kw):
        # simulate LSH starvation: query 7 gets no candidates at all
        return real_ann(c, q, **kw).filter(F.col("query_id") != 7)

    monkeypatch.setattr(sim, "ann_topk", starved_ann)
    out = sim.topk_with_recall(corpus, queries, id_col="id", vec_col="vec",
                               k=3, method="ann", dim=2, num_bits=1,
                               num_tables=4).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert 7 in by_q, "starved query must not vanish from the output"
    assert len(by_q[7]) == 1
    assert by_q[7][0].recall_at_k == 0.0
    assert by_q[7][0].neighbor_id is None
    assert all(r.recall_at_k is not None for rs in by_q.values() for r in rs)


def test_pq_topk_recall_vs_brute(spark, emb):
    """PQ with generous budget (m=8 subspaces, 6-bit codes) recovers
    most of the true top-k; the coarse budget (m=2, 4-bit) still finds
    a substantial fraction — the compression/recall dial moves the
    right way. Deterministic: codebooks train on the id-ordered sample
    with linspace init."""
    from lens_spark.operators.similarity import pq_topk

    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = brute_force_topk(emb, queries, id_col="vec_id",
                             vec_col="embedding", k=K)
    fine = pq_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                   dim=64, k=K, m=8, nbits=6)
    coarse = pq_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                     dim=64, k=K, m=2, nbits=4)
    r_fine, r_coarse = _recall(fine, exact), _recall(coarse, exact)
    assert r_fine >= 0.45
    assert r_fine >= r_coarse
    # exact re-rank of a 4k ADC shortlist recovers most of what raw ADC
    # misorders — the refinement stage is the production configuration
    rr = pq_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                 dim=64, k=K, m=8, nbits=6, rerank=4 * K)
    r_rr = _recall(rr, exact)
    assert r_rr >= r_fine and r_rr >= 0.7


def test_pq_topk_contract_and_errors(spark, emb):
    from lens_spark.errors import LensError
    from lens_spark.operators.similarity import pq_topk, topk_with_recall

    queries = emb.filter(F.col("vec_id") < 2)
    out = pq_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                  dim=64, k=5, m=4, nbits=4)
    rows = out.collect()
    assert out.columns == ["query_id", "neighbor_id", "score", "rank"]
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
        assert r.neighbor_id != r.query_id          # exclude_self
        assert -1.0 <= r.score <= 1.0 + 1e-9
    assert all(len(v) == 5 for v in per_q.values())
    with pytest.raises(LensError):
        pq_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                dim=64, k=5, m=7)                   # 64 % 7 != 0

    wrapped = topk_with_recall(emb, queries, id_col="vec_id",
                               vec_col="embedding", k=5, method="pq",
                               dim=64, m=8, nbits=6)
    assert "recall_at_k" in wrapped.columns
    assert wrapped.select("query_id").distinct().count() == 2


def test_matryoshka_truncate_prefix_and_renorm(spark):
    """First-d slice, unit L2 norm after renorm, zero prefix stays
    zero, renormalize=False returns the raw prefix."""
    import math

    from lens_spark.functions.vectors import l2_norm, matryoshka_truncate

    df = spark.createDataFrame(
        [(1, [3.0, 4.0, 100.0, -5.0]),
         (2, [0.0, 0.0, 7.0, 7.0])],
        "id long, v array<double>")
    out = {r.id: (r.t, r.n) for r in df.select(
        "id", matryoshka_truncate(F.col("v"), 2).alias("t"),
        l2_norm(matryoshka_truncate(F.col("v"), 2)).alias("n")).collect()}
    assert out[1][0] == pytest.approx([0.6, 0.8])      # 3-4-5 triangle
    assert out[1][1] == pytest.approx(1.0)
    assert out[2][0] == [0.0, 0.0]                      # no div-by-zero
    raw = df.filter("id = 1").select(
        matryoshka_truncate(F.col("v"), 2, renormalize=False).alias("t")
    ).collect()[0].t
    assert raw == [3.0, 4.0]
    assert math.isclose(sum(x * x for x in out[1][0]), 1.0, rel_tol=1e-12)


def test_matryoshka_truncate_lens_and_validation(spark):
    from lens_spark import engine
    from lens_spark.errors import LensError
    from lens_spark.operators.base import make_lens

    df = spark.createDataFrame([(1, [1.0, 2.0, 2.0, 0.0])],
                               "id long, emb array<double>")
    spec = {"lenses": [{"name": "matryoshka_truncate", "arguments": {
        "column": "emb", "d": 3}}]}
    row = engine.append(df, spec).collect()[0]
    assert row.emb == pytest.approx([1 / 3, 2 / 3, 2 / 3])
    with pytest.raises(LensError, match="d must be"):
        make_lens("matryoshka_truncate", {"column": "emb", "d": 0})


def test_random_projection_preserves_distances(spark):
    """JL property: projecting 64 → 32 dims keeps pairwise L2
    distances within moderate distortion (relative error bounded, and
    small on average), and the operator is deterministic across
    calls. Disjoint-support vectors (worst case for sparsity) keep
    their separation."""
    import numpy as np

    from lens_spark.operators.similarity import random_projection

    rnd = np.random.RandomState(11)
    vecs = [list(map(float, rnd.randn(64))) for _ in range(30)]
    df = spark.createDataFrame(list(enumerate(vecs)),
                               "id long, v array<double>")
    out = {r.id: np.array(r.p) for r in
           random_projection(df, "v", dim=64, out_dim=32,
                             out="p").collect()}
    out2 = {r.id: np.array(r.p) for r in
            random_projection(df, "v", dim=64, out_dim=32,
                              out="p").collect()}
    assert all(np.array_equal(out[i], out2[i]) for i in out)  # deterministic
    errs = []
    X = [np.array(v) for v in vecs]
    for a in range(0, 30, 3):
        for b in range(a + 1, 30, 3):
            d0 = np.linalg.norm(X[a] - X[b])
            d1 = np.linalg.norm(out[a] - out[b])
            errs.append(abs(d1 - d0) / d0)
    assert max(errs) < 0.6
    assert float(np.median(errs)) < 0.25


def test_random_projection_lens_and_validation(spark):
    from lens_spark import engine
    from lens_spark.errors import LensError
    from lens_spark.operators.similarity import random_projection

    df = spark.createDataFrame([(1, [1.0] * 8)], "id long, v array<double>")
    spec = {"lenses": [{"name": "random_projection", "arguments": {
        "column": "v", "dim": 8, "out_dim": 4}}]}
    row = engine.append(df, spec).collect()[0]
    assert len(row.v) == 4
    with pytest.raises(LensError, match="must be >= 1"):
        random_projection(df, "v", dim=8, out_dim=0)


# --- knn_graph ----------------------------------------------------------

def test_knn_graph_recall_vs_brute(spark, emb):
    """Corpus-wide kNN edges: recall against brute force over the same
    nodes (sampled for the exact side's cost)."""
    from lens_spark.operators.similarity import knn_graph
    edges = knn_graph(emb, "vec_id", "embedding", dim=64, k=5,
                      num_bits=4, num_tables=8)
    sample = edges.filter(F.col("query_id") < 20)
    exact = brute_force_topk(emb, emb.filter(F.col("vec_id") < 20),
                             id_col="vec_id", vec_col="embedding", k=5)
    assert _recall(sample, exact) >= 0.6


def test_knn_graph_mutual_is_symmetric_subset(spark, emb):
    from lens_spark.operators.similarity import knn_graph
    directed = knn_graph(emb, "vec_id", "embedding", dim=64, k=5,
                         num_bits=4, num_tables=4)
    mutual = knn_graph(emb, "vec_id", "embedding", dim=64, k=5,
                       num_bits=4, num_tables=4, mutual=True)
    d = {(r.query_id, r.neighbor_id) for r in directed.collect()}
    m = {(r.query_id, r.neighbor_id) for r in mutual.collect()}
    assert m <= d
    assert all((b, a) in m for a, b in m)      # symmetric by construction
    assert len(m) > 0


def test_knn_graph_max_bucket_reports_drops(spark, emb):
    from lens_spark.operators.similarity import knn_graph
    metrics = {}
    knn_graph(emb, "vec_id", "embedding", dim=64, k=3, num_bits=2,
              num_tables=2, max_bucket=50, drop_metrics=metrics).count()
    assert metrics["dropped_buckets"] > 0      # 2 bits → huge buckets
    assert metrics["dropped_rows"] >= metrics["dropped_buckets"] * 50


def test_knn_graph_k_bound_and_rank_contract(spark, emb):
    from lens_spark.operators.similarity import knn_graph
    edges = knn_graph(emb, "vec_id", "embedding", dim=64, k=3,
                      num_bits=4, num_tables=2)
    per = edges.groupBy("query_id").agg(
        F.count("*").alias("n"), F.max("rank").alias("mr"),
        F.min("rank").alias("mn"))
    bad = per.filter((F.col("n") > 3) | (F.col("mr") > 3)
                     | (F.col("mn") != 1)).count()
    assert bad == 0


def test_ivf_explicit_centroids_match_default_and_kmeans_serves(
        spark, emb, tmp_path):
    """centroids= (r10): passing the same vectors the default quantizer
    picks (lowest-nlist ids) reproduces the default output exactly —
    the dataflow is identical, only the quantizer source changes. A
    kmeans_centroids registry artifact then serves through the
    similarity_topk lens by model_id (fit-once/apply-many), with
    recall still above the probe-fraction floor."""
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    default = ivf_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                       k=K, nlist=8, nprobe=3)
    lowest = [r.embedding for r in
              emb.orderBy("vec_id").limit(8).collect()]
    explicit = ivf_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                        k=K, nprobe=3, centroids=lowest)
    got_d = {(r.query_id, r.neighbor_id, r.rank) for r in default.collect()}
    got_e = {(r.query_id, r.neighbor_id, r.rank) for r in explicit.collect()}
    assert got_d == got_e
    # trained quantizer from the registry, applied by model_id
    from lens_spark import engine
    from lens_spark.models import load_model, save_kmeans
    from lens_spark.registry import Registry

    reg = Registry(tmp_path / "reg")
    mid = save_kmeans(reg, emb, "vec_id", "embedding", k=8, max_iter=3)
    assert load_model(reg, mid, expect_kind="kmeans_centroids")
    spec = {"lenses": [{"name": "similarity_topk", "arguments": {
        "id": "vec_id", "vector": "embedding", "k": K,
        "query_predicate": f"vec_id < {N_QUERIES}", "method": "ivf",
        "nprobe": 3, "model_id": mid, "registry": str(tmp_path / "reg")}}]}
    served = engine.append(emb, spec)
    exact = brute_force_topk(emb, queries, id_col="vec_id",
                             vec_col="embedding", k=K)
    assert _recall(served, exact) >= 0.5
    # bad usage is loud
    with pytest.raises(ValueError, match="non-empty"):
        ivf_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                 k=K, centroids=[])


def test_ivfpq_topk_recall_and_dials(spark, emb):
    """IVFADC composition (r11): probing all cells with a generous PQ
    budget approaches PQ-only quality; fewer probes trade recall for
    the ~nprobe/nlist compute cut; exact re-rank recovers ADC
    misordering. Deterministic end to end (lowest-id centroids,
    md5-sample codebooks)."""
    from lens_spark.operators.similarity import ivfpq_topk

    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    exact = brute_force_topk(emb, queries, id_col="vec_id",
                             vec_col="embedding", k=K)
    full = ivfpq_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                      dim=64, k=K, nlist=8, nprobe=8, m=8, nbits=6)
    pruned = ivfpq_topk(emb, queries, id_col="vec_id",
                        vec_col="embedding", dim=64, k=K, nlist=8,
                        nprobe=2, m=8, nbits=6)
    r_full, r_pruned = _recall(full, exact), _recall(pruned, exact)
    assert r_full >= 0.45
    assert r_full >= r_pruned          # the probe dial moves the right way
    rr = ivfpq_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                    dim=64, k=K, nlist=8, nprobe=8, m=8, nbits=6,
                    rerank=4 * K)
    assert _recall(rr, exact) >= max(r_full, 0.7)


def test_ivfpq_topk_contract_errors_and_recall_wrapper(spark, emb):
    from lens_spark.errors import LensError
    from lens_spark.operators.similarity import ivfpq_topk, topk_with_recall

    queries = emb.filter(F.col("vec_id") < 2)
    out = ivfpq_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                     dim=64, k=5, nlist=8, nprobe=4, m=4, nbits=4)
    rows = out.collect()
    assert out.columns == ["query_id", "neighbor_id", "score", "rank"]
    for r in rows:
        assert r.neighbor_id != r.query_id
        assert -1.0 <= r.score <= 1.0 + 1e-9
    with pytest.raises(LensError, match="not divisible"):
        ivfpq_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                   dim=64, k=5, m=7)
    with pytest.raises(LensError, match="nprobe"):
        ivfpq_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                   dim=64, k=5, nlist=4, nprobe=8)
    wrapped = topk_with_recall(emb, queries, id_col="vec_id",
                               vec_col="embedding", k=5, method="ivfpq",
                               dim=64, nlist=8, nprobe=8, m=8, nbits=6)
    assert "recall_at_k" in wrapped.columns
    assert wrapped.select("query_id").distinct().count() == 2


def test_ivfpq_serves_saved_artifacts_fit_free(spark, emb, tmp_path):
    """Fit-free IVFADC serving (r11): kmeans_centroids + pq_codebooks
    artifacts loaded by id through the similarity_topk lens reproduce
    the inline fit exactly — the serving job does no training scan.
    Geometry mismatches are refused loudly."""
    from lens_spark import engine
    from lens_spark.errors import LensError
    from lens_spark.models import load_model, save_kmeans, save_pq
    from lens_spark.operators.similarity import ivfpq_topk
    from lens_spark.registry import Registry

    reg = Registry(str(tmp_path / "reg"))
    kid = save_kmeans(reg, emb, "vec_id", "embedding", k=8, max_iter=5)
    pid = save_pq(reg, emb, "vec_id", "embedding", dim=64, m=8, nbits=4)
    cents = load_model(reg, kid, expect_kind="kmeans_centroids")
    env = load_model(reg, pid, expect_kind="pq_codebooks")
    spec = {"lenses": [{"name": "similarity_topk", "arguments": {
        "id": "vec_id", "vector": "embedding", "k": 5,
        "query_predicate": "vec_id < 2", "method": "ivfpq", "dim": 64,
        "nprobe": 4, "model_id": kid, "pq_model_id": pid,
        "registry": str(tmp_path / "reg")}}]}
    served = {(r.query_id, r.neighbor_id, r.score)
              for r in engine.append(emb, spec).collect()}
    inline = ivfpq_topk(
        emb, emb.filter(F.col("vec_id") < 2), id_col="vec_id",
        vec_col="embedding", dim=64, k=5, nprobe=4,
        m=int(env["m"]), nbits=int(env["nbits"]),
        centroids=cents, codebooks=env["books"])
    assert served == {(r.query_id, r.neighbor_id, r.score)
                      for r in inline.collect()}
    assert len(served) == 10
    with pytest.raises(LensError, match="dim"):
        engine.append(emb, {"lenses": [{"name": "similarity_topk",
            "arguments": {"id": "vec_id", "vector": "embedding", "k": 5,
                          "query_predicate": "vec_id < 2",
                          "method": "ivfpq", "dim": 32,
                          "pq_model_id": pid,
                          "registry": str(tmp_path / "reg")}}]})
    with pytest.raises(LensError, match="shape"):
        ivfpq_topk(emb, emb.filter(F.col("vec_id") < 2),
                   id_col="vec_id", vec_col="embedding", dim=64, k=5,
                   m=4, nbits=4, codebooks=env["books"])  # m mismatch


def test_ivfpq_index_build_and_search_match_inline(spark, emb, tmp_path):
    """The materialized index (r11): build once, serve panels with
    partition pruning. Same model (shared fit helper) => search
    scores are IDENTICAL to the in-query ivfpq_topk at the same
    params; the probed-cell filter must reach the scan as a
    PartitionFilter (cells are the parquet partition column), and
    re-rank against the true-vector table refines exactly like the
    inline path."""
    from lens_spark.operators.similarity import (
        ivfpq_index_build,
        ivfpq_index_search,
        ivfpq_topk,
    )

    idx = str(tmp_path / "ivfpq")
    stats = ivfpq_index_build(emb, idx, id_col="vec_id",
                              vec_col="embedding", dim=64, nlist=8,
                              m=8, nbits=6)
    assert stats["n_vectors"] == emb.count()
    assert 1 <= stats["cells_used"] <= stats["nlist"] == 8
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    served = ivfpq_index_search(spark, idx, queries, id_col="vec_id",
                                vec_col="embedding", k=K, nprobe=4)
    inline = ivfpq_topk(emb, queries, id_col="vec_id",
                        vec_col="embedding", dim=64, k=K, nlist=8,
                        nprobe=4, m=8, nbits=6)
    got = {(r.query_id, r.neighbor_id, r.score) for r in served.collect()}
    want = {(r.query_id, r.neighbor_id, r.score) for r in inline.collect()}
    assert got == want and len(got) == N_QUERIES * K
    # the probed-cell predicate prunes partitions on disk
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # re-rank path needs the true vectors and matches inline re-rank
    rr = ivfpq_index_search(spark, idx, queries, id_col="vec_id",
                            vec_col="embedding", k=K, nprobe=8,
                            rerank=4 * K, rerank_corpus=emb)
    rr_inline = ivfpq_topk(emb, queries, id_col="vec_id",
                           vec_col="embedding", dim=64, k=K, nlist=8,
                           nprobe=8, m=8, nbits=6, rerank=4 * K)
    assert ({(r.query_id, r.neighbor_id, r.score) for r in rr.collect()}
            == {(r.query_id, r.neighbor_id, r.score)
                for r in rr_inline.collect()})


def test_ivfpq_task_pruned_rank_single_window_and_replay_safe(
        spark, emb, tmp_path):
    """r14 optimization: the ADC kernels emit a TASK-local top-k (one
    pruned frame per task) so the rank needs only the single per-query
    window — the two-stage _rank_topk's first Exchange+Sort+Window is
    gone. Pin (a) the plan shape: exactly one Window in the no-rerank
    serve plan; (b) replay safety: the task-level prune dedupes
    byte-identical replayed rows BEFORE cutting at keep_n, so a
    replay-duplicated index serves exactly what the clean index
    serves (a duplicate pair must never crowd a distinct candidate
    out of the shortlist)."""
    from lens_spark.operators.similarity import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_search,
    )

    head = emb.filter(F.col("vec_id") < 40)
    tail = emb.filter((F.col("vec_id") >= 40) & (F.col("vec_id") < 80))
    clean, dup = str(tmp_path / "clean"), str(tmp_path / "dup")
    for idx in (clean, dup):
        ivfpq_index_build(head, idx, id_col="vec_id",
                          vec_col="embedding", dim=64, nlist=4, m=8,
                          nbits=6)
    ivfpq_index_append(tail, clean, id_col="vec_id", vec_col="embedding")
    ivfpq_index_append(tail, dup, id_col="vec_id", vec_col="embedding")
    ivfpq_index_append(tail, dup, id_col="vec_id", vec_col="embedding")

    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    served = ivfpq_index_search(spark, clean, queries, id_col="vec_id",
                                vec_col="embedding", k=K, nprobe=4)
    replayed = ivfpq_index_search(spark, dup, queries, id_col="vec_id",
                                  vec_col="embedding", k=K, nprobe=4)
    got = {(r.query_id, r.neighbor_id, r.score, r.rank)
           for r in served.collect()}
    want = {(r.query_id, r.neighbor_id, r.score, r.rank)
            for r in replayed.collect()}
    assert got == want and len(got) == N_QUERIES * K
    # single-window rank: the task-pruned input needs no per-(query,
    # partition) pre-prune window. Count Window OPERATORS in the final
    # plan only (AQE repeats the initial plan below it, and Spark's
    # WindowGroupLimit pushdown nodes also contain the substring).
    import re

    plan = served._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"Window \[", final)) == 1


def test_rank_topk_native_map_side_prune(spark, emb):
    """r14: _rank_topk now relies on Spark's native WindowGroupLimit
    pushdown for the 100 TB funnel protection — pin that the plan of a
    NON-kernel-pruned caller (brute_force_topk) carries the Partial
    WindowGroupLimit BEFORE the exchange (each map task forwards ≤ k
    rows per query), and only ONE exchange+window pair where the
    manual two-stage paid two. If a Spark upgrade or conf change ever
    stops the rule firing, this test — not production scale — is
    where it surfaces."""
    import re

    from lens_spark.operators.similarity import brute_force_topk

    queries = emb.filter(F.col("vec_id") < 3)
    out = brute_force_topk(emb, queries, id_col="vec_id",
                           vec_col="embedding", k=K)
    plan = out._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert "WindowGroupLimit" in plan and "Partial" in plan
    assert len(re.findall(r"Window \[", final)) == 1
    # and the manual fallback still engages past the optimizer's
    # pushdown threshold (a huge-k shortlist must never rely on a
    # rule that cannot fire)
    big = brute_force_topk(emb, queries, id_col="vec_id",
                           vec_col="embedding", k=1500)
    bplan = big._jdf.queryExecution().executedPlan().toString()
    assert "__pid" in bplan


def test_ivfpq_index_error_paths(spark, emb, tmp_path):
    from lens_spark.errors import LensError
    from lens_spark.operators.similarity import (
        ivfpq_index_build,
        ivfpq_index_search,
    )

    queries = emb.filter(F.col("vec_id") < 2)
    with pytest.raises(LensError, match="model.json"):
        ivfpq_index_search(spark, str(tmp_path / "nope"), queries,
                           id_col="vec_id", vec_col="embedding")
    with pytest.raises(LensError, match="nbits"):
        ivfpq_index_build(emb, str(tmp_path / "i2"), id_col="vec_id",
                          vec_col="embedding", dim=64, nbits=9)
    idx = str(tmp_path / "i3")
    ivfpq_index_build(emb, idx, id_col="vec_id", vec_col="embedding",
                      dim=64, nlist=4, m=4, nbits=4)
    with pytest.raises(LensError, match="nprobe"):
        ivfpq_index_search(spark, idx, queries, id_col="vec_id",
                           vec_col="embedding", nprobe=8)
    with pytest.raises(LensError, match="rerank_corpus"):
        ivfpq_index_search(spark, idx, queries, id_col="vec_id",
                           vec_col="embedding", nprobe=2, rerank=20)


def test_ivfpq_index_append_grows_index_with_frozen_model(spark, emb,
                                                          tmp_path):
    """Append encodes with the index's frozen model, so build-half +
    append-half serves EXACTLY like a build over the full corpus with
    the same explicit model — codes are mutually comparable across
    ingest batches, the streaming-corpus contract."""
    from lens_spark.models import load_model, save_kmeans, save_pq
    from lens_spark.operators.similarity import (
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_search,
    )
    from lens_spark.registry import Registry

    reg = Registry(str(tmp_path / "reg"))
    cents = load_model(reg, save_kmeans(reg, emb, "vec_id", "embedding",
                                        k=8, max_iter=5),
                       expect_kind="kmeans_centroids")
    env = load_model(reg, save_pq(reg, emb, "vec_id", "embedding",
                                  dim=64, m=8, nbits=6),
                     expect_kind="pq_codebooks")
    first = emb.filter("vec_id % 2 = 0")
    rest = emb.filter("vec_id % 2 = 1")
    grown = str(tmp_path / "grown")
    ivfpq_index_build(first, grown, id_col="vec_id",
                      vec_col="embedding", dim=64, m=8, nbits=6,
                      centroids=cents, codebooks=env["books"])
    n = ivfpq_index_append(rest, grown, id_col="vec_id",
                           vec_col="embedding")
    assert n == rest.count()
    whole = str(tmp_path / "whole")
    ivfpq_index_build(emb, whole, id_col="vec_id", vec_col="embedding",
                      dim=64, m=8, nbits=6, centroids=cents,
                      codebooks=env["books"])
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    got = {(r.query_id, r.neighbor_id, r.score)
           for r in ivfpq_index_search(spark, grown, queries,
                                       id_col="vec_id",
                                       vec_col="embedding", k=K,
                                       nprobe=4).collect()}
    want = {(r.query_id, r.neighbor_id, r.score)
            for r in ivfpq_index_search(spark, whole, queries,
                                        id_col="vec_id",
                                        vec_col="embedding", k=K,
                                        nprobe=4).collect()}
    assert got == want and len(got) == N_QUERIES * K


def test_ivfpq_cell_metric_matches_query_routing(spark, emb, tmp_path):
    """r11 review fix: corpus cells must assign by COSINE — the metric
    that routes queries. Under unequal-norm kmeans centroids, L2
    assignment disagreed with cosine routing for ~20% of vectors, so a
    query IDENTICAL to a corpus vector missed it at nprobe=1. Pinned:
    with exclude_self=False, every corpus-vector query retrieves
    itself (deterministic model, deterministic result)."""
    from lens_spark.operators.clustering import kmeans_fit
    from lens_spark.operators.similarity import (
        ivfpq_index_build,
        ivfpq_index_search,
        ivfpq_topk,
    )

    cents = kmeans_fit(emb, "vec_id", "embedding", k=8, max_iter=5)
    queries = emb.filter(F.col("vec_id") < 40)
    out = ivfpq_topk(emb, queries, id_col="vec_id", vec_col="embedding",
                     dim=64, k=10, nprobe=1, m=8, nbits=6,
                     centroids=cents, exclude_self=False)
    hits = out.filter(F.col("query_id") == F.col("neighbor_id")).count()
    assert hits == 40, hits
    # and the materialized path agrees (same shared kernels)
    idx = str(tmp_path / "idx")
    ivfpq_index_build(emb, idx, id_col="vec_id", vec_col="embedding",
                      dim=64, m=8, nbits=6, centroids=cents)
    got = ivfpq_index_search(spark, idx, queries, id_col="vec_id",
                             vec_col="embedding", k=10, nprobe=1,
                             exclude_self=False)
    hits2 = got.filter(F.col("query_id") == F.col("neighbor_id")).count()
    assert hits2 == 40, hits2


def test_compact_ivfpq_index_bounds_files_and_drops_replay_dupes(
        spark, emb, tmp_path):
    """Index maintenance (r11): many appends -> one file per touched
    cell per batch; compaction rewrites to one file per cell without
    changing search results; drop_replay_duplicates reclaims the rows
    an at-least-once replay duplicated. A crashed compaction
    (parts.old + parts.migrating, parts missing) makes read-only
    search refuse and the next append recover."""
    import shutil

    from lens_spark.operators.similarity import (
        compact_ivfpq_index,
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_search,
    )

    idx = str(tmp_path / "idx")
    half = emb.filter("vec_id % 2 = 0")
    rest = emb.filter("vec_id % 2 = 1")
    ivfpq_index_build(half, idx, id_col="vec_id", vec_col="embedding",
                      dim=64, nlist=8, m=8, nbits=6)
    ivfpq_index_append(rest, idx, id_col="vec_id", vec_col="embedding")
    # simulate an at-least-once replay: the same batch appends twice
    ivfpq_index_append(rest, idx, id_col="vec_id", vec_col="embedding")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    def results():
        return {(r.query_id, r.neighbor_id, r.score)
                for r in ivfpq_index_search(
                    spark, idx, queries, id_col="vec_id",
                    vec_col="embedding", k=K, nprobe=4).collect()}

    before = results()
    assert len(before) == N_QUERIES * K   # replay dupes collapsed
    stats = compact_ivfpq_index(spark, idx, drop_replay_duplicates=True)
    n_total = emb.count() + rest.count()  # replayed batch stored twice
    assert stats["rows_before"] == n_total
    assert stats["rows_after"] == emb.count()
    assert stats["files_after"] < stats["files_before"]
    assert results() == before
    # crash window: parts staged aside -> search refuses, append recovers
    parts = tmp_path / "idx" / "parts"
    shutil.move(str(parts), str(parts) + ".old")
    shutil.copytree(str(parts) + ".old", str(parts) + ".migrating")
    from lens_spark.errors import LensError
    with pytest.raises(LensError, match="interrupted compaction"):
        ivfpq_index_search(spark, idx, queries, id_col="vec_id",
                           vec_col="embedding", k=K, nprobe=4)
    one = emb.filter("vec_id = 0").select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding")
    ivfpq_index_append(one, idx, id_col="vec_id", vec_col="embedding")
    assert parts.exists()
    assert not (tmp_path / "idx" / "parts.old").exists()
    # recovered index serves, and the appended vector — an exact copy
    # of vector 0 — lands in vector 0's cell with vector 0's code, so
    # query 0 now retrieves it (proof the append went through the
    # recovered directory correctly)
    after = results()
    assert (0, 1000000) in {(q, n) for q, n, _ in after}


def test_ivfpq_store_vectors_serves_rerank_from_probed_cells(
        spark, emb, tmp_path):
    """r13 verdict #1 (the serve path's declared 100 TB I/O ceiling):
    an index built with store_vectors=True lands the true vector
    beside each code, so the exact re-rank reads ONLY the probed
    cells' partitions of the index itself — no rerank_corpus table,
    no full vector-table scan per panel. Pinned: (1) stored-vector
    re-rank EQUALS corpus re-rank (same floats, same scores); (2) the
    serve plan's every scan targets the index path, the ADC scan
    reads id+code (never vec), the fetch scan reads id+vec (never
    code), and both carry the cell PartitionFilter; (3) appends
    follow the model flag automatically and a replayed append cannot
    occupy two top-k slots; (4) full and partition-subset compaction
    preserve the vec column."""
    from lens_spark.operators.similarity import (
        compact_ivfpq_index,
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_search,
    )

    half = emb.filter("vec_id % 2 = 0")
    rest = emb.filter("vec_id % 2 = 1")
    plain, sv = str(tmp_path / "plain"), str(tmp_path / "sv")
    for p, kw in ((plain, {}), (sv, {"store_vectors": True})):
        # same corpus + params → same deterministic model both sides
        ivfpq_index_build(half, p, id_col="vec_id",
                          vec_col="embedding", dim=64, nlist=8, m=8,
                          nbits=6, **kw)
        ivfpq_index_append(rest, p, id_col="vec_id",
                           vec_col="embedding")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    def serve(idx, **kw):
        return ivfpq_index_search(spark, idx, queries, id_col="vec_id",
                                  vec_col="embedding", k=K, nprobe=4,
                                  rerank=4 * K, **kw)

    want = {(r.query_id, r.neighbor_id, r.score)
            for r in serve(plain, rerank_corpus=emb).collect()}
    stored = serve(sv)  # no rerank_corpus — the index has the vectors
    got = {(r.query_id, r.neighbor_id, r.score)
           for r in stored.collect()}
    assert got == want and len(got) == N_QUERIES * K

    plan = stored._jdf.queryExecution().executedPlan().toString()
    scans = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scans, plan
    for ln in scans:
        # every scan is either the index's own cell-pruned partitions
        # or the QUERY PANEL's bounded read (pushed vec_id <
        # N_QUERIES) — never an unfiltered corpus vector table (path
        # matching is unreliable: plan strings truncate Location)
        assert ("cell#" in ln and "PartitionFilters" in ln) \
            or f"LessThan(vec_id,{N_QUERIES})" in ln, ln
    schemas = re.findall(r"ReadSchema: (\S+)", plan)
    assert any("code" in s and "vec" not in s for s in schemas), \
        "the ADC scan must not read the stored vectors"
    assert any("vec" in s and "code" not in s for s in schemas), \
        "the re-rank fetch must not read the codes"
    assert plan.count("PartitionFilters") >= 2 and "cell" in plan

    # at-least-once replay: byte-identical duplicate rows collapse in
    # the scored-row distinct — never two top-k slots
    ivfpq_index_append(rest, sv, id_col="vec_id", vec_col="embedding")
    assert {(r.query_id, r.neighbor_id, r.score)
            for r in serve(sv).collect()} == want
    st = compact_ivfpq_index(spark, sv, drop_replay_duplicates=True)
    assert st["rows_after"] == emb.count() < st["rows_before"]
    assert {(r.query_id, r.neighbor_id, r.score)
            for r in serve(sv).collect()} == want
    cells = [int(r.cell) for r in spark.read.parquet(f"{sv}/parts")
             .select("cell").distinct().limit(1).collect()]
    st2 = compact_ivfpq_index(spark, sv, partitions=cells)
    assert st2["partitions"] == [f"cell={cells[0]}"]
    assert {(r.query_id, r.neighbor_id, r.score)
            for r in serve(sv).collect()} == want


def test_ivfpq_drift_report_tracks_distribution_drift(spark, tmp_path):
    """r14 — the dense side's rebuild decision input (the
    postings_drift_report pattern): frozen centroids/codebooks encode
    a drifted distribution with growing reconstruction error and
    skewed routing, silently costing recall. Pinned: (1) a fresh build
    reports a baseline and zero appended; (2) an IN-distribution
    append keeps err_ratio near 1; (3) an OUT-of-distribution append
    (10x-shifted vectors) drives err_ratio and routing_l1 far above
    the control — the rebuild triggers fire; (4) an at-least-once
    replay leaves the error ratio unbiased while appended_n
    over-counts (the documented conservative direction); (5) a
    sidecar-less (pre-r14 / torn) index reads as unknown, not a fake
    healthy row."""
    import os
    import random

    from lens_spark.operators.similarity import (
        ivfpq_drift_report,
        ivfpq_index_append,
        ivfpq_index_build,
    )

    rng = random.Random(5)

    def mk(n, base_id, shift=0.0):
        rows = [(base_id + i,
                 [rng.uniform(-1, 1) + shift for _ in range(8)])
                for i in range(n)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    corpus = mk(128, 0)

    def build(path):
        ivfpq_index_build(corpus, path, id_col="vec_id",
                          vec_col="embedding", dim=8, nlist=4, m=4,
                          nbits=4)

    def report(path):
        return ivfpq_drift_report(spark, path).collect()[0]

    ctl, drf = str(tmp_path / "ctl"), str(tmp_path / "drf")
    build(ctl)
    r0 = report(ctl)
    assert r0.n_build == 128 and r0.n_appended == 0
    assert r0.baseline_rel_err > 0 and r0.err_ratio is None

    # in-distribution control append
    ivfpq_index_append(mk(32, 1000), ctl, id_col="vec_id",
                       vec_col="embedding")
    rc = report(ctl)
    assert rc.n_appended == 32 and 0 < rc.appended_frac < 0.25
    assert rc.err_ratio is not None and rc.err_ratio < 1.5

    # out-of-distribution append: 10x-shifted vectors
    build(drf)
    drifted = mk(32, 2000, shift=10.0)
    ivfpq_index_append(drifted, drf, id_col="vec_id",
                       vec_col="embedding")
    rd = report(drf)
    assert rd.err_ratio > 2.0 > rc.err_ratio
    assert rd.routing_l1 > 0.9 > rc.routing_l1

    # replay: identical rows re-added — ratio unbiased, count inflates
    ivfpq_index_append(drifted, drf, id_col="vec_id",
                       vec_col="embedding")
    rd2 = report(drf)
    assert rd2.n_appended == 64
    assert abs(rd2.err_ratio - rd.err_ratio) < 1e-4
    assert rd2.routing_l1 == rd.routing_l1

    # sidecar-less index reads as unknown (and stays sidecar-less)
    os.remove(f"{ctl}/drift.json")
    ivfpq_index_append(mk(8, 3000), ctl, id_col="vec_id",
                       vec_col="embedding")
    r3 = report(ctl)
    assert r3.n_build is None and r3.err_ratio is None
    assert not os.path.exists(f"{ctl}/drift.json")


def test_ivfpq_build_refuses_in_place_rebuild(spark, emb, tmp_path):
    """Same torn parts/model.json window as the postings index: a
    rebuild crash between the parts overwrite and the model write
    leaves codes encoded under one model and a file describing
    another — build refuses an existing index."""
    from lens_spark.errors import LensError
    from lens_spark.operators.similarity import ivfpq_index_build

    idx = str(tmp_path / "ivf_rebuild")
    ivfpq_index_build(emb, idx, id_col="vec_id", vec_col="embedding",
                      dim=64, nlist=4, m=4, nbits=4)
    with pytest.raises(LensError, match="already holds a committed index"):
        ivfpq_index_build(emb, idx, id_col="vec_id",
                          vec_col="embedding", dim=64, nlist=8, m=4,
                          nbits=4)


def test_index_serve_distinct_and_rank_share_one_exchange(
        spark, emb, tmp_path):
    """r15 (guide §2.4): the serve path's replay dedupe and its rank
    window ride ONE explicit hash(query_id) exchange — the planner
    otherwise paid hash(query_id, neighbor_id, score) for the
    distinct and hash(query_id) again for the window. Funnel-safe:
    the ADC kernel's task-local prune bounds a (query, reducer)
    slice at num_map_tasks · keep_n either way. Pin the no-rerank
    serve plan at exactly ONE shuffle exchange, and the rerank plan
    (its _exact_rerank tail fuses the same way) at exactly two."""
    import re

    from lens_spark.operators.similarity import (
        ivfpq_index_build,
        ivfpq_index_search,
    )

    idx = str(tmp_path / "fused_idx")
    ivfpq_index_build(emb, idx, id_col="vec_id", vec_col="embedding",
                      dim=64, nlist=8, m=8, nbits=6)
    queries = emb.filter(F.col("vec_id") < N_QUERIES)

    served = ivfpq_index_search(spark, idx, queries, id_col="vec_id",
                                vec_col="embedding", k=K, nprobe=8)
    jvm = spark._jvm
    plan = jvm.PythonSQLUtils.explainString(served._jdf.queryExecution(),
                                            "formatted")
    n_shuffles = len(re.findall(r"\+- Exchange \(", plan))
    assert n_shuffles == 1, f"expected 1 shuffle exchange:\n{plan}"
    assert re.search(r"hashpartitioning\(query_id#\d+L?, 'd*\d+\)",
                     plan) or "hashpartitioning(query_id" in plan

    rr = ivfpq_index_search(spark, idx, queries, id_col="vec_id",
                            vec_col="embedding", k=K, nprobe=8,
                            rerank=4 * K, rerank_corpus=emb)
    plan_rr = jvm.PythonSQLUtils.explainString(rr._jdf.queryExecution(),
                                               "formatted")
    assert len(re.findall(r"\+- Exchange \(", plan_rr)) == 2, plan_rr
    # results still k complete rows per query
    assert served.count() == N_QUERIES * K
