"""X3-adjacent embedding clustering: distributed Lloyd's k-means and
SemDedup-style semantic deduplication.

No reference counterpart (the reference has no vector operators at all
— SURVEY.md §2.6); these are X-series extensions for the LLM-pipeline
surface: k-means supplies trained centroids for ``ivf_topk`` (whose
docstring declares the drop-in slot) and the cluster structure that
SemDedup ("SemDedup: Data-efficient learning at web-scale through
semantic deduplication", Abbas et al. 2023) prunes within.

Scale design (100 TB):
- The model state (k × dim centroids) lives on the driver and is
  broadcast each iteration — the same shape as Spark MLlib's KMeans;
  KBs for realistic k/dim, never a per-row structure.
- Assignment is one narrow pass per iteration: a vectorized numpy
  kernel (Arrow-batched pandas UDF) computes all k distances in one
  matmul per batch. The Catalyst-expression alternative unrolls k × dim
  terms and trips janino's 64 KB method limit (the similarity.py
  lesson), silently dropping to interpreted eval.
- The update step is posexplode → groupBy(cell, dim) with map-side
  partial aggregation: the exchange carries ≤ k·dim partial sums per
  partition, not vectors; the driver collects k·dim numbers.
- SemDedup's within-cluster verification reuses the blocked-matmul
  grouped kernel shape of ``embedding_neardup_pairs(method="lsh")``
  (dedup.py): only true-positive pairs ever become rows. Cluster size
  is the task-memory dial — size k so n/k vectors fit a task (the
  SemDedup recipe already wants k large, ~sqrt(n) or more).
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_spark.errors import LensError
from lens_spark.operators.base import Lens, check_reserved, ensure_parallelism, register_lens, require_arg


def _assign_udf(centroids: np.ndarray):
    """Nearest-centroid assignment: argmin L2 over all k centroids in
    one (batch × dim) @ (dim × k) product per Arrow batch.

    dist²(x, c) = |x|² − 2·x·c + |c|²; |x|² is constant per row so the
    argmin needs only −2·x·c + |c|².
    """
    from pyspark.sql.functions import pandas_udf

    c = centroids.astype(np.float64)            # (k, dim)
    c_sq = (c * c).sum(axis=1)                  # (k,)

    @pandas_udf("int")
    def assign(vecs: pd.Series) -> pd.Series:
        x = np.stack(vecs.to_numpy()).astype(np.float64)
        scores = -2.0 * (x @ c.T) + c_sq        # (n, k), argmin == argmin dist²
        return pd.Series(np.argmin(scores, axis=1).astype(np.int32))

    return assign


def kmeans_fit(df: DataFrame, id_col: str, vec_col: str, *, k: int = 16,
               max_iter: int = 10, tol: float = 1e-4) -> list[list[float]]:
    """Lloyd's k-means over an embedding column; returns the trained
    centroids (k × dim driver-side list — model state, same contract as
    MLlib's KMeansModel.clusterCenters).

    Init is deterministic and spread without a shuffle: the k smallest
    md5(id) rows — a content-hash uniform sample of the corpus (the
    sampling.py determinism machinery applied to seeding). Each
    iteration: one narrow assignment pass + one (cell, dim) partial-sum
    aggregation; converges when the max centroid shift drops below
    ``tol``. Empty cells keep their previous centroid.

    Floating-point note: distributed partial sums add in partition
    order, so centroid doubles can differ across runs in the last ulp —
    k-means output is therefore rows-only territory (boundary points
    may flip cluster), verified by equivalence tests against a local
    reference, not a SQL oracle.
    """
    check_reserved(df, {"__hk", "__id", "__n", "__s", "__v"}, "kmeans_fit")
    # Pin the (id, vec) projection for the max_iter+1 passes as
    # DISK_ONLY, not localCheckpoint (r11, measured in SCALE.md
    # "Round-11 additions"): at 100 TB a corpus-sized projection must
    # not compete with shuffle/execution memory in executor storage —
    # the knn_graph residency argument applied as default posture.
    # Fresh-process attribution showed DISK_ONLY ≥ par at bench scale.
    from pyspark import StorageLevel

    base = (
        ensure_parallelism(df, by=[id_col])
        .select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .persist(StorageLevel.DISK_ONLY)
    )
    try:
        seed_rows = (base.withColumn("__hk", F.md5(F.col("__id").cast("string")))
                     .orderBy("__hk").limit(int(k)).select("__v").collect())
        if len(seed_rows) < k:
            raise LensError(
                f"kmeans_fit: corpus has {len(seed_rows)} rows < k={k}")
        cent = np.array([list(r["__v"]) for r in seed_rows], dtype=np.float64)
        dim = cent.shape[1]
        kk, dd = int(k), int(dim)
        for _ in range(int(max_iter)):
            # Assignment and the update's partial sums FUSED into one
            # mapInPandas pass (r5; previously a pandas-UDF assignment
            # column + posexplode + groupBy): each partition emits at most
            # k·dim (cell, d, s, n) rows, so the update exchange carries
            # k·dim·partitions scalars instead of n·dim exploded rows —
            # the map-side-combine principle applied inside the kernel.
            c = cent.astype(np.float64)
            c_sq = (c * c).sum(axis=1)

            def partials(batches):
                acc_p = np.zeros((kk, dd))
                cnt_p = np.zeros(kk, dtype=np.int64)
                for pdf in batches:
                    x = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
                    cells = np.argmin(-2.0 * (x @ c.T) + c_sq, axis=1)
                    np.add.at(acc_p, cells, x)
                    np.add.at(cnt_p, cells, 1)
                nz = np.nonzero(cnt_p)[0]
                if len(nz) == 0:
                    yield pd.DataFrame({"cell": pd.Series([], dtype="int32"),
                                        "d": pd.Series([], dtype="int32"),
                                        "s": pd.Series([], dtype="float64"),
                                        "n": pd.Series([], dtype="int64")})
                    return
                yield pd.concat([
                    pd.DataFrame({"cell": np.int32(cell),
                                  "d": np.arange(dd, dtype=np.int32),
                                  "s": acc_p[cell], "n": cnt_p[cell]})
                    for cell in nz], ignore_index=True)

            sums = (
                base.mapInPandas(partials, "cell int, d int, s double, n long")
                .groupBy("cell", "d")
                .agg(F.sum("s").alias("__s"), F.sum("n").alias("__n"))
                .collect()
            )
            new_cent = cent.copy()
            counts = np.zeros(k)
            acc = np.zeros((k, dim))
            for r in sums:
                acc[r["cell"], r["d"]] = r["__s"]
                counts[r["cell"]] = r["__n"]
            nonempty = counts > 0
            new_cent[nonempty] = acc[nonempty] / counts[nonempty, None]
            shift = float(np.max(np.linalg.norm(new_cent - cent, axis=1)))
            cent = new_cent
            if shift < tol:
                break
    finally:
        # release the corpus-sized pin even on a failed fit (r11 review)
        base.unpersist()
    return cent.tolist()


def kmeans_assign(df: DataFrame, vec_col: str,
                  centroids: Sequence[Sequence[float]], *,
                  out: str = "cluster") -> DataFrame:
    """Append the nearest-centroid cluster id (narrow; one kernel pass)."""
    cent = np.array([list(c) for c in centroids], dtype=np.float64)
    return df.withColumn(out, _assign_udf(cent)(F.col(vec_col)))


def kmeans(df: DataFrame, id_col: str, vec_col: str, *, k: int = 16,
           max_iter: int = 10, tol: float = 1e-4,
           out: str = "cluster") -> DataFrame:
    """Fit + assign in one call: input rows plus a ``out`` cluster id."""
    cent = kmeans_fit(df, id_col, vec_col, k=k, max_iter=max_iter, tol=tol)
    return kmeans_assign(df, vec_col, cent, out=out)


def semdedup_auto_k(n: int, *, min_k: int = 16, max_k: int = 4096) -> int:
    """Cluster count for an ``n``-row corpus when the caller doesn't
    pick one: ``ceil(sqrt(n))`` — clusters and rows-per-cluster grow
    together (√n each), so neither the per-cluster pandas matmul nor
    the cluster-level parallelism collapses as the corpus grows —
    clamped to [min_k, max_k] and to n itself (kmeans_fit refuses
    k > n). ``max_k`` bounds the driver-held centroid model (k×dim
    doubles) and the seed collect; past ~10⁷ rows, set k explicitly
    to n / target-rows-per-cluster (the task-memory dial the r5
    verdict called out)."""
    nn = max(int(n), 1)
    k = math.isqrt(nn)
    if k * k < nn:
        k += 1
    return max(1, min(nn, max(int(min_k), min(int(max_k), k))))


def semdedup_pairs(df: DataFrame, id_col: str, vec_col: str, *,
                   k: int | None = None, threshold: float = 0.95,
                   max_iter: int = 5) -> DataFrame:
    """The pair-generation stage of :func:`semdedup`: cluster, then
    emit the verified within-cluster cosine-near pairs (id_a < id_b,
    distinct). Split out so the verify stage's plan is inspectable
    (tests assert the cluster repartition) and reusable for audits
    that want the pairs, not the survivor set."""
    check_reserved(df, {"__id", "__v"}, "semdedup_pairs")
    if k is None:
        k = semdedup_auto_k(df.select(id_col).count())
    assigned = (
        kmeans(ensure_parallelism(df, by=[id_col]), id_col, vec_col,
               k=k, max_iter=max_iter)
        .select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
                "cluster")
        .repartition(F.col("cluster"))
    )
    thr = float(threshold)

    def verify_cluster(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame({"id_a": [], "id_b": []})
        ids = pdf["__id"].to_numpy()
        x = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
        out_a, out_b = [], []
        block = 2048
        for lo in range(0, n, block):
            hi = min(lo + block, n)
            sims = x[lo:hi] @ x[lo:].T  # only j >= lo: upper triangle
            for r in range(hi - lo):
                i = lo + r
                js = np.nonzero(sims[r, r + 1:] >= thr)[0] + i + 1
                for j in js:
                    a, b = ids[i], ids[j]
                    if a > b:
                        a, b = b, a
                    out_a.append(a)
                    out_b.append(b)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b})

    id_type = dict(df.dtypes)[id_col]
    return (assigned.groupBy("cluster")
            .applyInPandas(verify_cluster,
                           schema=f"id_a {id_type}, id_b {id_type}")
            .distinct())


def semdedup(df: DataFrame, id_col: str, vec_col: str, *,
             k: int | None = None,
             threshold: float = 0.95, max_iter: int = 5,
             keep: str = "min") -> DataFrame:
    """SemDedup: drop semantic near-duplicates found WITHIN k-means
    clusters (Abbas et al. 2023) — the scale path for embedding dedup
    when hyperplane-LSH recall is not enough: clustering adapts to the
    data distribution where random hyperplanes don't.

    Pipeline: k-means (above) → per-cluster blocked-matmul cosine
    verification (grouped kernel, only pairs ≥ ``threshold`` become
    rows — same shape as embedding_neardup_pairs(method="lsh")) →
    connected components → keep one representative per component:
    ``keep="min"`` (smallest id — oldest/first-seen) or ``keep="max"``
    (largest id — newest). Pairs split across clusters are missed —
    that is SemDedup's documented recall trade; raise k for
    smaller/faster tasks, lower k for higher recall.

    ``k=None`` (default since r6) derives the cluster count from the
    corpus size via ``semdedup_auto_k`` (≈ √n, clamped) — the r5
    default of a fixed k=16 silently bounded both parallelism and
    per-task memory as the corpus grew. One column-pruned count() pays
    for the sizing. The cluster-grouped verify stage is explicitly
    repartitioned by cluster so its exchange is the verify stage's
    own, sized by spark.sql.shuffle.partitions.
    """
    check_reserved(df, {"__rep"}, "semdedup")
    from lens_spark.operators.dedup import connected_components

    if keep not in ("min", "max"):
        raise LensError(f"semdedup: keep must be 'min' or 'max', got {keep!r}")
    pairs = semdedup_pairs(df, id_col, vec_col, k=k, threshold=threshold,
                           max_iter=max_iter)
    comp = connected_components(pairs)
    if keep == "min":
        # component label IS the min member — non-representatives are
        # exactly the rows whose id differs from their label
        losers = comp.filter(F.col("id") != F.col("component")).select("id")
    else:
        reps = (comp.groupBy("component")
                .agg(F.max("id").alias("__rep")))
        losers = (comp.join(reps, "component")
                  .filter(F.col("id") != F.col("__rep")).select("id"))
    return df.join(losers, df[id_col] == losers.id, "left_anti")


@register_lens("kmeans")
def kmeans_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, vector, k (16), max_iter (10), tol (1e-4),
    out ("cluster"). OR apply a registry-persisted model: model_id
    (lens1b-…) + registry (root path) loads the centroid matrix saved
    by lens_spark.models.save_kmeans and ASSIGNS only — the
    fit-once/apply-many serving shape (id not needed). Inverse drops
    the cluster column."""
    vec_col = str(require_arg(arguments, "vector", "kmeans"))
    out = str(arguments.get("out", "cluster"))
    model_id = arguments.get("model_id")
    if model_id is not None:
        from lens_spark.models import load_model

        reg = require_arg(arguments, "registry", "kmeans")
        cent = load_model(reg, str(model_id),
                          expect_kind="kmeans_centroids")
        return Lens(
            "kmeans", arguments,
            lambda df: kmeans_assign(df, vec_col, cent, out=out),
            lambda df: df.drop(out))
    id_col = str(require_arg(arguments, "id", "kmeans"))
    return Lens(
        "kmeans", arguments,
        lambda df: kmeans(df, id_col, vec_col,
                          k=int(arguments.get("k", 16)),
                          max_iter=int(arguments.get("max_iter", 10)),
                          tol=float(arguments.get("tol", 1e-4)), out=out),
        lambda df: df.drop(out))


@register_lens("semdedup")
def semdedup_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, vector, k (default: auto ≈ √n via
    semdedup_auto_k), threshold (0.95), max_iter (5),
    keep ("min" | "max")."""
    id_col = str(require_arg(arguments, "id", "semdedup"))
    vec_col = str(require_arg(arguments, "vector", "semdedup"))
    k_arg = arguments.get("k")
    return Lens("semdedup", arguments, lambda df: semdedup(
        df, id_col, vec_col,
        k=int(k_arg) if k_arg is not None else None,
        threshold=float(arguments.get("threshold", 0.95)),
        max_iter=int(arguments.get("max_iter", 5)),
        keep=str(arguments.get("keep", "min"))))


def group_centroid(df: DataFrame, key_cols: Sequence[str], vec_col: str, *,
                   out: str = "centroid") -> DataFrame:
    """Element-wise mean vector per group: ``(keys…, n, centroid)``.

    The per-source / per-cluster / per-label prototype vector a
    curation pipeline reports (and the one-shot, non-iterative cousin
    of the k-means update step). Pure Catalyst: posexplode →
    groupBy(keys, dim) with map-side partial aggregation — both
    exchanges carry scalars, never vectors — then one per-key
    re-collect sorted by dimension. For a HOT loop (re-computing
    centroids every iteration) use :func:`kmeans`'s fused mapInPandas
    kernel instead; this operator optimizes for plan transparency and
    engine-exact arithmetic.

    Sums are held as decimal(28,12) — order-independent, so results
    are bit-deterministic under any partitioning (a float sum would
    drift with partition order); the published centroid is double.
    Null vectors are excluded from both ``n`` and the mean.
    """
    check_reserved(df, {
        "__cl", "__m", "__n", "__pos", "__s",
    }, "group_centroid")
    keys = [str(k) for k in key_cols]
    if not keys:
        raise LensError("group_centroid: key_cols must be non-empty")
    exploded = (df.filter(F.col(vec_col).isNotNull())
                .select(*keys, F.posexplode(vec_col).alias("__pos", "__v")))
    per_dim = exploded.groupBy(*keys, "__pos").agg(
        F.sum(F.col("__v").cast("decimal(28,12)")).alias("__s"),
        F.count(F.lit(1)).alias("__n"))
    mean = (F.col("__s") / F.col("__n")).cast("double")
    return (per_dim.groupBy(*keys)
            .agg(F.max("__n").alias("n"),
                 F.array_sort(F.collect_list(
                     F.struct(F.col("__pos"), mean.alias("__m"))))
                 .alias("__cl"))
            .withColumn(out, F.transform(F.col("__cl"), lambda s: s["__m"]))
            .withColumn("n", F.col("n").cast("bigint"))
            .drop("__cl"))


@register_lens("group_centroid")
def group_centroid_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list), vector, out ("centroid")."""
    keys = require_arg(arguments, "keys", "group_centroid")
    vec_col = str(require_arg(arguments, "vector", "group_centroid"))
    return Lens("group_centroid", arguments, lambda df: group_centroid(
        df, [str(k) for k in keys], vec_col,
        out=str(arguments.get("out", "centroid"))))
