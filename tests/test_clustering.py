"""kmeans / semdedup: distributed results vs a local numpy reference,
determinism, and the SemDedup removal contract. Rows-only operators
(floating-point partial-sum ordering makes boundary assignments
non-oracle-able), so the equivalence tests here ARE the correctness
gate.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lens_spark.operators.clustering import (
    kmeans,
    kmeans_assign,
    kmeans_fit,
    semdedup,
)


def _blob_rows(seed=7, per=40, centers=((0.0, 0.0, 10.0), (10.0, 0.0, 0.0),
                                        (0.0, 10.0, 0.0))):
    """Well-separated 3-blob corpus: cluster structure unambiguous, so
    the distributed result must match a local reference exactly."""
    rng = np.random.RandomState(seed)
    rows = []
    for ci, c in enumerate(centers):
        pts = rng.normal(scale=0.3, size=(per, 3)) + np.array(c)
        for j, p in enumerate(pts):
            rows.append((ci * per + j, [float(v) for v in p]))
    return rows


def test_kmeans_matches_local_reference_on_separated_blobs(spark):
    rows = _blob_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans(df, "vec_id", "embedding", k=3, max_iter=10)
    got = {r.vec_id: r.cluster for r in out.collect()}
    # every blob maps to exactly one label; labels partition the blobs
    labels = [set(got[i] for i in range(b * 40, (b + 1) * 40))
              for b in range(3)]
    assert all(len(s) == 1 for s in labels), f"split blob: {labels}"
    assert len(set().union(*labels)) == 3


def test_kmeans_fit_centroids_near_true_means(spark):
    rows = _blob_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = np.array(kmeans_fit(df, "vec_id", "embedding", k=3, max_iter=10))
    true = np.array([[0.0, 0.0, 10.0], [10.0, 0.0, 0.0], [0.0, 10.0, 0.0]])
    # each true mean has a centroid within the blob's noise envelope
    for t in true:
        assert np.min(np.linalg.norm(cent - t, axis=1)) < 0.5


def test_kmeans_fit_is_deterministic(spark):
    rows = _blob_rows()
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    c1 = np.array(kmeans_fit(df, "vec_id", "embedding", k=3, max_iter=5))
    c2 = np.array(kmeans_fit(df, "vec_id", "embedding", k=3, max_iter=5))
    assert np.allclose(c1, c2, atol=1e-9)


def test_kmeans_assign_uses_given_centroids(spark):
    df = spark.createDataFrame(
        [(1, [0.1, 0.0]), (2, [5.0, 5.1]), (3, [0.0, 0.2])],
        "vec_id long, embedding array<double>")
    out = kmeans_assign(df, "embedding", [[0.0, 0.0], [5.0, 5.0]],
                        out="cell")
    got = {r.vec_id: r.cell for r in out.collect()}
    assert got == {1: 0, 2: 1, 3: 0}


def test_kmeans_k_larger_than_corpus_raises(spark):
    from lens_spark.errors import LensError

    df = spark.createDataFrame([(1, [0.0, 1.0])],
                               "vec_id long, embedding array<double>")
    with pytest.raises(LensError, match="rows < k"):
        kmeans_fit(df, "vec_id", "embedding", k=8)


def test_semdedup_removes_within_cluster_near_dups_keeps_min_id(spark):
    """Planted near-identical pairs inside each blob vanish (min id
    survives); everything else is untouched."""
    rows = _blob_rows(per=20)
    # plant: ids 1000/1001 ~ blob0 point 0; 2000/2001 ~ blob1 point 20
    rows.append((1000, [v + 1e-6 for v in rows[0][1]]))
    rows.append((2000, [v + 1e-6 for v in rows[20][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, "vec_id", "embedding", k=3, threshold=0.999999,
                   max_iter=5)
    kept = {r.vec_id for r in out.collect()}
    assert 1000 not in kept and 2000 not in kept  # dup copies dropped
    assert 0 in kept and 20 in kept               # min-id originals kept
    assert len(kept) == 60                        # nothing else removed


def test_semdedup_high_threshold_is_identity(spark):
    rows = _blob_rows(per=10)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, "vec_id", "embedding", k=3, threshold=1.0 - 1e-12)
    assert out.count() == df.count()


def test_semdedup_k1_matches_exact_embedding_neardup(spark):
    """With one cluster, SemDedup sees every pair — its survivor set
    must equal exact all-pairs embedding near-dup's."""
    from lens_spark.operators.dedup import (
        connected_components,
        embedding_neardup_pairs,
    )

    rng = np.random.RandomState(3)
    rows = [(i, [float(v) for v in rng.normal(size=4)]) for i in range(30)]
    rows += [(100 + i, [v * 1.0000001 for v in rows[i][1]])
             for i in range(5)]  # scaled copies: cosine == 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sem = {r.vec_id for r in
           semdedup(df, "vec_id", "embedding", k=1, threshold=0.9999).collect()}
    pairs = embedding_neardup_pairs(df, "vec_id", "embedding",
                                    threshold=0.9999, method="exact")
    comp = connected_components(pairs)
    losers = {r.id for r in
              comp.filter(F.col("id") != F.col("component")).collect()}
    exact = {r.vec_id for r in df.collect()} - losers
    assert sem == exact


def test_kmeans_lens_registration_and_inverse(spark):
    from lens_spark import engine

    rows = _blob_rows(per=10)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    spec = {"lenses": [{"name": "kmeans", "arguments": {
        "id": "vec_id", "vector": "embedding", "k": 3, "max_iter": 3}}]}
    out = engine.append(df, spec)
    assert "cluster" in out.columns and out.count() == 30


def test_semdedup_keep_max_and_invalid(spark):
    """keep='max' retains the largest id per near-dup component; an
    unknown keep raises instead of silently defaulting."""
    from lens_spark.errors import LensError
    from lens_spark.operators.clustering import semdedup

    rows = _blob_rows(per=10)
    rows.append((5000, [v + 1e-7 for v in rows[0][1]]))  # dup of id 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    kept = {r.vec_id for r in
            semdedup(df, "vec_id", "embedding", k=3, threshold=0.999999,
                     keep="max").collect()}
    assert 5000 in kept and 0 not in kept
    with pytest.raises(LensError, match="keep must be"):
        semdedup(df, "vec_id", "embedding", k=3, keep="first")


def test_semdedup_auto_k_formula():
    """auto-k ≈ ceil(sqrt(n)), clamped to [16, 4096] and to n."""
    from lens_spark.operators.clustering import semdedup_auto_k

    assert semdedup_auto_k(10_000) == 100
    assert semdedup_auto_k(10_001) == 101          # true ceiling
    assert semdedup_auto_k(1_000_000) == 1000
    assert semdedup_auto_k(100) == 16              # min clamp
    assert semdedup_auto_k(10) == 10               # never exceeds n
    assert semdedup_auto_k(10 ** 9) == 4096        # driver-model cap
    assert semdedup_auto_k(0) == 1


def test_semdedup_auto_k_runs_and_repartitions_by_cluster(spark):
    """k=None sizes clusters from the corpus (here n=60 → k=16 > the
    r5 fixed default's effective floor for tiny data) and the verify
    stage's exchange hash-partitions on cluster — the parallelism
    grows with k instead of being pinned at 16 as the corpus grows."""
    from lens_spark.operators.clustering import semdedup

    rows = _blob_rows(per=20)
    rows.append((1000, [v + 1e-6 for v in rows[0][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(df, "vec_id", "embedding", threshold=0.999999,
                   max_iter=3)
    kept = {r.vec_id for r in out.collect()}
    assert 1000 not in kept and 0 in kept and len(kept) == 60
    # the verify stage (pair generation) hash-partitions on cluster
    from lens_spark.operators.clustering import semdedup_pairs

    pairs = semdedup_pairs(df, "vec_id", "embedding", threshold=0.999999,
                           max_iter=1)
    plan = spark._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted")
    assert "hashpartitioning(cluster" in plan, plan


# --- group_centroid -----------------------------------------------------

def test_group_centroid_exact_mean(spark):
    from lens_spark.operators.clustering import group_centroid
    df = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("a", [3.0, 6.0]), ("b", [10.0, 0.0])],
        "g string, v array<double>")
    got = {r.g: (r.n, r.centroid)
           for r in group_centroid(df, ["g"], "v").collect()}
    assert got["a"] == (2, [2.0, 4.0])
    assert got["b"] == (1, [10.0, 0.0])


def test_group_centroid_null_vectors_excluded(spark):
    from lens_spark.operators.clustering import group_centroid
    df = spark.createDataFrame(
        [("a", [1.0, 1.0]), ("a", None)], "g string, v array<double>")
    r = group_centroid(df, ["g"], "v").collect()[0]
    assert r.n == 1 and r.centroid == [1.0, 1.0]


def test_group_centroid_partitioning_invariant(spark):
    import random
    from lens_spark.operators.clustering import group_centroid
    rng = random.Random(3)
    rows = [(f"g{i % 4}", [rng.uniform(-1, 1) for _ in range(8)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "g string, v array<double>")
    a = sorted(map(tuple, group_centroid(df.coalesce(1), ["g"], "v").collect()))
    b = sorted(map(tuple, group_centroid(df.repartition(13), ["g"], "v").collect()))
    for (ga, na, ca), (gb, nb, cb) in zip(a, b):
        assert (ga, na) == (gb, nb) and ca == cb   # bit-identical


def test_group_centroid_lens(spark):
    from lens_spark import engine
    df = spark.createDataFrame([("a", [2.0]), ("a", [4.0])],
                               "g string, v array<double>")
    out = engine.append(df, {"lenses": [{"name": "group_centroid",
        "arguments": {"keys": ["g"], "vector": "v", "out": "proto"}}]})
    assert out.collect()[0].proto == [3.0]
