"""X1/X2 deduplication operators: exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup.

Scale design (100 TB):
- exact dedup shuffles once on the hash of the key columns — Spark's
  dropDuplicates already plans partial (map-side) dedup before the
  exchange, so the shuffle carries only distinct rows per partition.
- near-dup avoids the O(n²) similarity join via LSH banding: each doc
  expands to `num_bands` (band_hash, id) rows, the candidate join
  shuffles on band_hash, and only bucket-mates are compared. Bucket
  skew is bounded by `max_bucket` (oversized buckets are dropped and
  reported — at web scale those are boilerplate clusters that should be
  handled by exact-fingerprint dedup first).
- connected components for cluster collapse is iterative min-label
  propagation with early exit — each iteration is one shuffle on id.
"""

from __future__ import annotations

import contextlib
import logging
from typing import Any, Mapping

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_spark.functions.hashing import (
    char_shingles,
    jaccard_shingles,
    simhash60,
    word_shingles,
)
from lens_spark.errors import ConcurrentIndexWriterError, LensError
from lens_spark.functions.text import tokens
from lens_spark.functions.vectors import cosine_similarity
from lens_spark.operators.base import (
    Lens,
    check_reserved,
    ensure_parallelism,
    reassemble_by_position,
    register_lens,
    require_arg,
)


_LOG = logging.getLogger("lens_spark.dedup")


def _identity_columns(df: DataFrame) -> list[str]:
    """Default identity columns: user columns plus the CLI's hidden
    nil-row flag, excluding other reserved engine metadata.

    Keeping ``__lens_nil`` in the identity preserves the reference's
    item-kind distinction (TypeId=0 nil vs a JSON doc whose fields are
    all null, host-go/engine/module/protocol.go:42-52): a nil item and
    a genuine all-null document must NOT collapse into one dedup
    survivor. Transient engine columns (counter partition ids etc.)
    stay excluded so a spec run through the CLI dedups identically to
    the library API."""
    from lens_spark.operators.udf import META_PREFIX, NIL_COL

    return [c for c in df.columns
            if not c.startswith(META_PREFIX) or c == NIL_COL]


def exact_dedup(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    return df.dropDuplicates(columns or _identity_columns(df))


def dedup_keep_best(df: DataFrame, key_cols: list[str], score_col: str,
                    tie_col: str) -> DataFrame:
    """Keep, per duplicate-key group, the single row maximizing
    ``(score_col, tie_col)`` — quality-aware representative selection
    (plain dedup keeps an arbitrary survivor; a curation pipeline
    wants the longest / highest-quality / most-recent copy of each
    canonical URL or content fingerprint). ``tie_col`` must be unique
    per row (a doc id) so the ordering is total and the survivor
    deterministic.

    Scale shape: ONE hash aggregate — ``max_by(struct(row),
    struct(score, tie))`` with map-side partial combine, so each
    partition forwards at most one candidate row per key. Beats the
    window formulation (row_number over the group) which must sort
    every replica group; max_by is the same single-exchange shape as
    exact_dedup's first-wins agg. Preserves input schema and column
    order; no row survives twice.
    """
    check_reserved(df, {"__kb"}, "dedup_keep_best")
    order = F.struct(F.col(score_col), F.col(tie_col))
    best = (
        df.groupBy(*[F.col(k) for k in key_cols])
        .agg(F.max_by(F.struct(*df.columns), order).alias("__kb"))
        .select("__kb.*")
    )
    return best


@register_lens("dedup_keep_best")
def dedup_keep_best_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: keys (list), score, tie."""
    keys = require_arg(arguments, "keys", "dedup_keep_best")
    score = str(require_arg(arguments, "score", "dedup_keep_best"))
    tie = str(require_arg(arguments, "tie", "dedup_keep_best"))
    return Lens("dedup_keep_best", arguments,
                lambda df: dedup_keep_best(df, [str(k) for k in keys],
                                           score, tie))


def _shingles(text_col: str, ngram: int, shingle: str):
    if shingle == "char":
        return char_shingles(F.col(text_col), ngram)
    return word_shingles(F.col(text_col), ngram)


MINHASH_PRIME = 2038074743
"""Hash-family modulus — the same 31-bit prime Spark MLlib's
MinHashLSH uses (org.apache.spark.ml.feature.MinHashLSH.HASH_PRIME)."""


def _minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the 2-universal family
    ``hash_i(x) = (a_i·x + b_i) mod p`` — derived from md5 so the
    DuckDB oracle embeds the identical constants."""
    import hashlib

    out = []
    for i in range(num_hashes):
        d = hashlib.md5(f"lens-mh-{i}".encode()).hexdigest()
        a = int(d[:8], 16) % (MINHASH_PRIME - 1) + 1  # 1..p-1
        b = int(d[8:16], 16) % MINHASH_PRIME          # 0..p-1
        out.append((a, b))
    return out


def minhash_signature(df: DataFrame, id_col: str, text_col: str, *,
                      num_hashes: int = 16, ngram: int = 3,
                      shingle: str = "word",
                      shingled: DataFrame | None = None) -> DataFrame:
    """(id, __h0..__h{k-1}) minhash signature table (bigint hashes).

    ``shingled`` optionally supplies a precomputed (id, __sh
    array<string>) table so a caller that also needs the shingle sets
    (exact-Jaccard verify) shingles the text once, not twice.

    Scale shape: the only wide op is the groupBy on id, and partial
    (map-side) aggregation collapses each partition to ≤1 row per doc
    before the exchange, so the shuffle carries ``num_hashes`` bigints
    per doc (~128 B) — not the shingle set, and not the 32-char hex
    strings of the one-md5-per-hash formulation (4× wider and ~0.5 s
    slower per pass at sf0.1 from computing 16 digests per shingle).

    Hash family: ONE md5 per shingle folded to a base integer
    ``h = hex48 mod p``, then the textbook 2-universal permutations
    ``hash_i = (a_i·h + b_i) mod p`` with p = MINHASH_PRIME (the
    construction Spark MLlib's MinHashLSH uses). All operands stay
    below 2^62, bigint-safe under ANSI. NOT the Kirsch-Mitzenmacher
    ``h1 + i·h2`` split: that is fine for Bloom-filter membership but
    breaks MIN-wise hashing — linear-in-i combinations preserve the
    argmin across positions (a lower envelope of lines), so one
    unshared shingle can disagree every position (observed: exact
    Jaccard 0.85, estimated 0.0). Distinct random multipliers scramble
    the order per position, restoring E[agreement] = Jaccard.

    The DuckDB oracle reproduces the exact integers via a
    strpos/list_reduce hex parse (__spark_entry__._hex2int_sql). All
    expressions are flat scalars in whole-stage codegen; nested HOF
    formulations blow janino's method limit and drop to interpreted
    eval, ~50× slower. Docs with no shingles (fewer than ``ngram``
    tokens) have no signature and drop out.
    """
    check_reserved(df, {"__d", "__hb", "__s"}, "minhash_signature")
    # Two explode forms on purpose: when no shingle table is shared,
    # explode the shingle expression INLINE — aliasing the array in its
    # own Project first and exploding the column measured 5× slower at
    # sf0.1 (6.3s vs 1.2s; the extra Project boundary materializes the
    # full array per row outside the Generate). A provided ``shingled``
    # is (lazily) checkpointed by the caller, so there the arrays are
    # materialized data anyway and exploding the column is the point.
    if shingled is not None:
        exploded = shingled.select(
            F.col(id_col), F.explode(F.col("__sh")).alias("__s"))
    else:
        exploded = ensure_parallelism(df, by=[id_col]).select(
            F.col(id_col),
            F.explode(_shingles(text_col, ngram, shingle)).alias("__s"))
    base = (F.conv(F.substring(F.col("__d"), 1, 12), 16, 10).cast("bigint")
            % F.lit(MINHASH_PRIME))
    sh = exploded.select(
        F.col(id_col), F.md5(F.col("__s")).alias("__d")
    ).select(
        F.col(id_col), base.alias("__hb")
    )
    coeffs = _minhash_coeffs(num_hashes)
    return sh.groupBy(id_col).agg(*[
        F.min((F.lit(a) * F.col("__hb") + F.lit(b)) % F.lit(MINHASH_PRIME)
              ).alias(f"__h{h}")
        for h, (a, b) in enumerate(coeffs)
    ])


def _sig_agreement(num_hashes: int, a: str = "__sa", b: str = "__sb"):
    """MinHash signature agreement fraction between array columns ``a``
    and ``b`` — the Jaccard estimator (stderr ≈ 1/√num_hashes) shared
    by every signature-verify site (within-batch, vs-index, and
    cross-corpus legs) so the estimator can never drift between them
    or from the DuckDB oracle's formulation."""
    return (F.expr(f"size(filter(zip_with({a}, {b}, (x, y) -> x = y),"
                   " v -> v))") / F.lit(num_hashes))


def _band_exprs(num_hashes: int, band_size: int) -> list:
    num_bands = num_hashes // band_size
    return [
        # explicit string casts: signature values are bigints and the
        # oracle's array_to_string renders plain decimal — keep both
        # sides byte-identical before the digest
        F.md5(F.concat_ws("|", F.lit(str(b)),
                          *[F.col(f"__h{b * band_size + j}").cast("string")
                            for j in range(band_size)]))
        for b in range(num_bands)
    ]


def minhash_bands(df: DataFrame, id_col: str, text_col: str, *,
                  num_hashes: int = 16, ngram: int = 3,
                  band_size: int = 4, shingle: str = "word",
                  sig: DataFrame | None = None) -> DataFrame:
    """(id, band_hash) table: explode shingles → min-hash per salt → bands.

    ``sig`` short-circuits the signature computation with a caller-held
    (typically persisted) signature table — the shingle→md5 pass is the
    dominant cost and callers that need both bands and signatures
    (incremental ingest) should compute it exactly once.
    """
    if sig is None:
        sig = minhash_signature(df, id_col, text_col, num_hashes=num_hashes,
                                ngram=ngram, shingle=shingle)
    return sig.select(F.col(id_col),
                      F.explode(F.array(*_band_exprs(num_hashes, band_size))
                                ).alias("band_hash"))


def minhash_candidates(df: DataFrame, id_col: str, text_col: str, *,
                       num_hashes: int = 16, ngram: int = 3,
                       band_size: int = 4, max_bucket: int | None = None,
                       shingle: str = "word", cache: bool = True,
                       sig: DataFrame | None = None,
                       drop_metrics: dict | None = None) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b) sharing ≥1 LSH band.

    ``cache`` lazily localCheckpoints the (id, band_hash) table before
    the self-join — without it both join sides re-run the whole
    shingle→signature pipeline (2× the dominant cost; at production
    scale you'd checkpoint the signature table to storage instead).
    Unlike a bare ``persist()`` (the round-2 leak class), checkpoint
    blocks are released by the ContextCleaner once the result goes out
    of reference — nothing stays pinned for the session and
    construction stays lazy (eager=False: first action materializes).
    The table is num_bands rows × (id, 32-char hash) per doc — small
    relative to the corpus.
    """
    bands = minhash_bands(df, id_col, text_col, num_hashes=num_hashes,
                          ngram=ngram, band_size=band_size, shingle=shingle,
                          sig=sig)
    if cache:
        bands = bands.localCheckpoint(eager=False)
    if max_bucket is not None:
        # Cap pathological buckets before the self-join (skew guard) —
        # and REPORT the cut (no-silent-caps): at 100 TB the dropped
        # boilerplate clusters are exactly what an operator needs to
        # route through exact-fingerprint dedup first. The stats
        # aggregation is one extra small job over the (id, band_hash)
        # table; it also materializes the lazy checkpoint above, which
        # the self-join reuses, so most of its cost is amortized.
        sizes = bands.groupBy("band_hash").count()
        stats = (sizes.filter(F.col("count") > max_bucket)
                 .agg(F.count("*").alias("buckets"),
                      F.coalesce(F.sum("count"), F.lit(0)).alias("rows"))
                 .first())
        if drop_metrics is not None:
            drop_metrics["dropped_buckets"] = int(stats["buckets"])
            drop_metrics["dropped_rows"] = int(stats["rows"])
        if stats["buckets"]:
            _LOG.warning(
                "minhash_candidates: skew cap max_bucket=%d dropped "
                "%d bucket(s) / %d band rows before the self-join; "
                "route such boilerplate clusters through "
                "exact-fingerprint dedup first",
                max_bucket, stats["buckets"], stats["rows"])
        bands = bands.join(sizes.filter(F.col("count") <= max_bucket), "band_hash").drop("count")
    a = bands.alias("a")
    b = bands.alias("b")
    pairs = (
        a.join(b, (F.col(f"a.band_hash") == F.col(f"b.band_hash"))
               & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def neardup_pairs(df: DataFrame, id_col: str, text_col: str, *,
                  num_hashes: int = 16, ngram: int = 3, band_size: int = 4,
                  threshold: float | None = None,
                  max_bucket: int | None = None,
                  shingle: str = "word",
                  sig: DataFrame | None = None,
                  drop_metrics: dict | None = None) -> DataFrame:
    """LSH candidates, optionally verified with exact shingle Jaccard.

    The verified path shingles the text ONCE: the same lazily
    checkpointed (id, shingle-array) table feeds both the signature
    pipeline and the exact-Jaccard verify legs (previously two full
    tokenize+slice passes over the corpus).
    """
    check_reserved(df, {"__sh", "__sh_a", "__sh_b"}, "neardup_pairs")
    shingled = None
    if threshold is not None and sig is None:
        shingled = ensure_parallelism(df, by=[id_col]).select(
            F.col(id_col), _shingles(text_col, ngram, shingle).alias("__sh")
        ).localCheckpoint(eager=False)
        sig = minhash_signature(df, id_col, text_col, num_hashes=num_hashes,
                                ngram=ngram, shingle=shingle,
                                shingled=shingled)
    pairs = minhash_candidates(df, id_col, text_col, num_hashes=num_hashes,
                               ngram=ngram, band_size=band_size,
                               max_bucket=max_bucket, shingle=shingle, sig=sig,
                               drop_metrics=drop_metrics)
    if threshold is None:
        return pairs
    if shingled is None:
        shingled = ensure_parallelism(df, by=[id_col]).select(
            F.col(id_col), _shingles(text_col, ngram, shingle).alias("__sh")
        )
    sa = shingled.select(F.col(id_col).alias("id_a"), F.col("__sh").alias("__sh_a"))
    sb = shingled.select(F.col(id_col).alias("id_b"), F.col("__sh").alias("__sh_b"))
    return (
        pairs.join(sa, "id_a").join(sb, "id_b")
        .withColumn("jaccard", F.round(jaccard_shingles(F.col("__sh_a"), F.col("__sh_b")), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str, text_col: str, *,
                        ngram: int = 3, threshold: float = 0.5,
                        max_df: int | None = None,
                        shingle: str = "word") -> DataFrame:
    """Exact all-pairs n-gram Jaccard via an inverted-index join.

    Unlike MinHash-LSH (probabilistic candidates, then verify), this
    computes the exact Jaccard for every pair sharing ≥1 shingle:
    explode distinct shingles → self-join on the shingle (pairs only
    materialize for co-occurring shingles, never O(n²)) → count common
    per pair → |A∪B| = |A|+|B|-common.

    Scale dial: ``max_df`` drops shingles appearing in more than that
    many documents before the self-join — stop-shingles are the skew
    hazard here (a shingle in 10k docs yields 10k²/2 pairs); cutting
    them is the standard df-cut and only loses pairs whose overlap is
    entirely stopword boilerplate.
    """
    check_reserved(df, {
        "__common", "__df", "__id", "__n", "__na", "__nb", "__s", "__s0",
    }, "ngram_jaccard_pairs")
    shingled = ensure_parallelism(df, by=[id_col]).select(
        F.col(id_col).alias("__id"),
        F.explode(_shingles(text_col, ngram, shingle)).alias("__s0"),
    ).select(
        # 64-bit shingle fingerprint: the self-join shuffles 8-byte keys
        # instead of raw shingle strings (collision odds ~n²/2⁶⁴ — nil).
        "__id", F.xxhash64("__s0").alias("__s"),
    )
    # Lazy localCheckpoint, not persist(): the table feeds up to four
    # plan legs (sizes, df-cut, both self-join sides) and must compute
    # once — but a bare persist() stays pinned for the session (the
    # counter.py round-2 leak class). Checkpoint blocks are freed by
    # the ContextCleaner when the result goes out of reference, and
    # eager=False keeps construction lazy.
    shingled = shingled.localCheckpoint(eager=False)
    sizes = shingled.groupBy("__id").agg(F.count("*").alias("__n"))
    if max_df is not None:
        dfreq = shingled.groupBy("__s").agg(F.count("*").alias("__df"))
        shingled = (shingled.join(dfreq.filter(F.col("__df") <= max_df), "__s")
                    .drop("__df"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    common = (
        a.join(b, (F.col("a.__s") == F.col("b.__s"))
               & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count("*").alias("__common"))
    )
    na = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        common.join(na, "id_a").join(nb, "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("__common")
                    / (F.col("__na") + F.col("__nb") - F.col("__common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def ngram_novelty(df: DataFrame, id_col: str, text_col: str, *,
                  ngram: int = 3, shingle: str = "word",
                  out: str = "novelty") -> DataFrame:
    """Append each document's n-gram NOVELTY: the fraction of its
    distinct n-grams that appear in no other document (df = 1) — the
    corpus-diversity / memorization audit column. novelty ≈ 1 means
    the doc contributes genuinely new n-grams; ≈ 0 means everything it
    says, the corpus already says elsewhere (boilerplate, templates,
    near-dup survivors worth a second look). The per-document
    complement of the pairwise dedup family: no pairs, one score per
    row.

    Scale shape: one distinct-shingle explode (8-byte xxhash64 keys on
    every exchange, checkpointed — it feeds the df-count agg AND the
    per-doc agg), a document-frequency groupBy (map-side partial), a
    hash join back, a per-doc mean of (df = 1). Shingle-less docs
    score 0.0 and keep their row.
    """
    check_reserved(df, {
        "__df", "__nv", "__nv_id", "__s", "__s0",
    }, "ngram_novelty")
    shingled = (ensure_parallelism(df, by=[id_col]).select(
        F.col(id_col).alias("__nv_id"),
        F.explode(_shingles(text_col, ngram, shingle)).alias("__s0"))
        .select("__nv_id", F.xxhash64("__s0").alias("__s"))
        .localCheckpoint(eager=False))
    dfreq = shingled.groupBy("__s").agg(F.count("*").alias("__df"))
    per_doc = (shingled.join(dfreq, "__s")
               .groupBy("__nv_id")
               .agg(F.round(F.avg((F.col("__df") == 1).cast("double")), 6)
                    .alias("__nv")))
    joined = df.join(per_doc, df[id_col] == per_doc["__nv_id"], "left")
    return joined.withColumn(
        out, F.coalesce(F.col("__nv"), F.lit(0.0))
    ).drop("__nv_id", "__nv")


@register_lens("ngram_novelty")
def ngram_novelty_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), ngram (3), shingle ("word" |
    "char"), out ("novelty"). Inverse drops the appended column."""
    id_col = str(require_arg(arguments, "id", "ngram_novelty"))
    text_col = str(require_arg(arguments, "column", "ngram_novelty"))
    out = str(arguments.get("out", "novelty"))
    return Lens(
        "ngram_novelty", arguments,
        lambda df: ngram_novelty(
            df, id_col, text_col,
            ngram=int(arguments.get("ngram", 3)),
            shingle=str(arguments.get("shingle", "word")), out=out),
        lambda df: df.drop(out))


def containment_pairs(df: DataFrame, id_col: str, text_col: str, *,
                      ngram: int = 3, threshold: float = 0.8,
                      max_df: int | None = None,
                      shingle: str = "word") -> DataFrame:
    """Exact all-pairs n-gram CONTAINMENT via the same inverted-index
    join as :func:`ngram_jaccard_pairs` — the asymmetric-duplication
    signal Jaccard misses: a 50-token benchmark question pasted into a
    5k-token page has Jaccard ≈ 0.01 but containment ≈ 1.0 on the
    small side. For each co-occurring pair (id_a < id_b) emits
    ``containment_a`` = |A∩B| / |A| (how much of A lies inside B) and
    ``containment_b`` = |A∩B| / |B|, kept when the larger of the two
    ≥ ``threshold``.

    Same scale shape and dials as ngram_jaccard_pairs: 8-byte shingle
    fingerprints on the exchange, one checkpointed shingle pass feeding
    sizes + df-cut + both join sides, ``max_df`` as the stop-shingle
    skew cut.
    """
    check_reserved(df, {
        "__common", "__df", "__id", "__n", "__na", "__nb", "__s", "__s0",
    }, "containment_pairs")
    shingled = ensure_parallelism(df, by=[id_col]).select(
        F.col(id_col).alias("__id"),
        F.explode(_shingles(text_col, ngram, shingle)).alias("__s0"),
    ).select("__id", F.xxhash64("__s0").alias("__s"))
    shingled = shingled.localCheckpoint(eager=False)
    sizes = shingled.groupBy("__id").agg(F.count("*").alias("__n"))
    if max_df is not None:
        dfreq = shingled.groupBy("__s").agg(F.count("*").alias("__df"))
        shingled = (shingled.join(dfreq.filter(F.col("__df") <= max_df), "__s")
                    .drop("__df"))
    a = shingled.alias("a")
    b = shingled.alias("b")
    common = (
        a.join(b, (F.col("a.__s") == F.col("b.__s"))
               & (F.col("a.__id") < F.col("b.__id")))
        .groupBy(F.col("a.__id").alias("id_a"), F.col("b.__id").alias("id_b"))
        .agg(F.count("*").alias("__common"))
    )
    na = sizes.select(F.col("__id").alias("id_a"), F.col("__n").alias("__na"))
    nb = sizes.select(F.col("__id").alias("id_b"), F.col("__n").alias("__nb"))
    return (
        common.join(na, "id_a").join(nb, "id_b")
        .withColumn("containment_a",
                    F.round(F.col("__common") / F.col("__na"), 6))
        .withColumn("containment_b",
                    F.round(F.col("__common") / F.col("__nb"), 6))
        .filter(F.greatest("containment_a", "containment_b")
                >= F.lit(float(threshold)))
        .select("id_a", "id_b", "containment_a", "containment_b")
    )


@register_lens("containment_pairs")
def containment_pairs_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), ngram (3), threshold (0.8),
    max_df (optional), shingle ("word" | "char")."""
    id_col = str(require_arg(arguments, "id", "containment_pairs"))
    text_col = str(require_arg(arguments, "column", "containment_pairs"))
    max_df = arguments.get("max_df")
    return Lens("containment_pairs", arguments, lambda df: containment_pairs(
        df, id_col, text_col,
        ngram=int(arguments.get("ngram", 3)),
        threshold=float(arguments.get("threshold", 0.8)),
        max_df=int(max_df) if max_df is not None else None,
        shingle=str(arguments.get("shingle", "word"))))


def edit_distance_pairs(df: DataFrame, id_col: str, text_col: str, *,
                        max_dist: int = 20, prefix: int = 2000,
                        num_hashes: int = 16, ngram: int = 3,
                        band_size: int = 4, max_bucket: int | None = None,
                        shingle: str = "word") -> DataFrame:
    """Character-level near-dup pairs: MinHash-LSH band candidates
    verified by exact Levenshtein distance — the rephrase/typo signal
    token-set measures (Jaccard, containment) are blind to: two docs
    differing by a handful of character edits keep dist ≤ ``max_dist``
    even when the edits fall inside tokens and shift every shingle.

    Returns ``(id_a, id_b, edit_distance)`` with id_a < id_b and
    distance ≤ ``max_dist``, computed on the first ``prefix`` chars
    (the DP is O(prefix²) per pair — ``prefix`` IS the operator's
    resolution, documented, not a silent cap).

    Scale (100 TB): never all-pairs — candidates come from
    :func:`minhash_candidates` (banded equi-join, ``max_bucket`` skew
    cap); a length pre-filter (|len_a − len_b| ≤ max_dist, a lower
    bound on edit distance) discards most candidates before any DP;
    the surviving DP runs threshold-capped (Spark's 3-arg
    ``levenshtein`` stops once the band exceeds ``max_dist``). Text
    joins onto the candidate list by id — the band exchange itself
    never carries text.
    """
    check_reserved(df, {
        "__l", "__la", "__lb", "__t", "__ta", "__tb",
    }, "edit_distance_pairs")
    if max_dist < 0 or prefix < 1:
        raise LensError("edit_distance_pairs: max_dist must be >= 0 "
                        "and prefix >= 1")
    pairs = minhash_candidates(df, id_col, text_col, num_hashes=num_hashes,
                               ngram=ngram, band_size=band_size,
                               max_bucket=max_bucket, shingle=shingle)
    texts = df.select(
        F.col(id_col),
        F.substring(F.col(text_col).cast("string"), 1, int(prefix))
        .alias("__t"))
    texts = texts.withColumn("__l", F.length("__t")) \
        .localCheckpoint(eager=False)
    ta = texts.select(F.col(id_col).alias("id_a"), F.col("__t").alias("__ta"),
                      F.col("__l").alias("__la"))
    tb = texts.select(F.col(id_col).alias("id_b"), F.col("__t").alias("__tb"),
                      F.col("__l").alias("__lb"))
    return (
        pairs.join(ta, "id_a").join(tb, "id_b")
        .filter(F.abs(F.col("__la") - F.col("__lb")) <= max_dist)
        .withColumn("edit_distance",
                    F.levenshtein(F.col("__ta"), F.col("__tb"),
                                  int(max_dist)))
        .filter(F.col("edit_distance") >= 0)
        .select("id_a", "id_b", "edit_distance")
    )


@register_lens("edit_distance_pairs")
def edit_distance_pairs_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), max_dist (20), prefix (2000),
    num_hashes, ngram, band_size, max_bucket, shingle."""
    id_col = str(require_arg(arguments, "id", "edit_distance_pairs"))
    text_col = str(require_arg(arguments, "column", "edit_distance_pairs"))
    max_bucket = arguments.get("max_bucket")
    return Lens("edit_distance_pairs", arguments,
                lambda df: edit_distance_pairs(
                    df, id_col, text_col,
                    max_dist=int(arguments.get("max_dist", 20)),
                    prefix=int(arguments.get("prefix", 2000)),
                    num_hashes=int(arguments.get("num_hashes", 16)),
                    ngram=int(arguments.get("ngram", 3)),
                    band_size=int(arguments.get("band_size", 4)),
                    max_bucket=(int(max_bucket) if max_bucket is not None
                                else None),
                    shingle=str(arguments.get("shingle", "word"))))


def dup_span_stats(df: DataFrame, id_col: str, text_col: str, *,
                   span: int = 8, min_df: int = 2,
                   shingle: str = "word") -> DataFrame:
    """Per-document duplicated-span metrics: how much of each document
    is token spans (w-shingles) that also occur in ≥ ``min_df`` other
    documents. The flag-and-filter analogue of exact-substring dedup
    (suffix-array text rewriting à la "Deduplicating Training Data
    Makes Language Models Better" is an offline batch job; the standard
    Spark-shaped first step is scoring docs by duplicated-span coverage
    and filtering/routing on it).

    Appends ``n_spans`` (distinct spans in the doc), ``n_dup_spans``
    (those whose corpus document-frequency ≥ min_df) and
    ``dup_span_frac``. Docs shorter than ``span`` tokens score 0/0/0.

    Scale shape: explode distinct spans (narrow) → df-count groupBy on
    xxhash64(span) (agg; 8-byte keys) → semi-style join of spans
    against duplicated keys → per-doc count (agg). Exchanges carry
    hashes and ids only, never span text.
    """
    check_reserved(df, {"__df", "__ds_id", "__sh", "__sp"}, "dup_span_stats")
    spans = ensure_parallelism(df, by=[id_col]).select(
        F.col(id_col).alias("__ds_id"),
        F.explode(_shingles(text_col, span, shingle)).alias("__sp"),
    ).select("__ds_id", F.xxhash64("__sp").alias("__sh"))
    dfreq = (spans.groupBy("__sh")
             .agg(F.count_distinct("__ds_id").alias("__df")))
    per_doc = (
        spans.join(dfreq, "__sh")
        .groupBy("__ds_id")
        .agg(F.count(F.lit(1)).alias("n_spans"),
             F.sum(F.when(F.col("__df") >= int(min_df), 1).otherwise(0)
                   ).alias("n_dup_spans"))
    )
    joined = df.join(per_doc, df[id_col] == per_doc["__ds_id"], "left")
    return (
        joined
        .withColumn("n_spans",
                    F.coalesce(F.col("n_spans"), F.lit(0)).cast("bigint"))
        .withColumn("n_dup_spans",
                    F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("bigint"))
        .withColumn(
            "dup_span_frac",
            F.when(F.col("n_spans") > 0,
                   F.round(F.col("n_dup_spans").cast("double")
                           / F.col("n_spans").cast("double"), 6))
            .otherwise(F.lit(0.0)))
        .drop("__ds_id")
    )


@register_lens("dup_span_stats")
def dup_span_stats_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), span (8), min_df (2),
    shingle ("word")."""
    id_col = str(require_arg(arguments, "id", "dup_span_stats"))
    text_col = str(require_arg(arguments, "column", "dup_span_stats"))
    return Lens("dup_span_stats", arguments, lambda df: dup_span_stats(
        df, id_col, text_col,
        span=int(arguments.get("span", 8)),
        min_df=int(arguments.get("min_df", 2)),
        shingle=str(arguments.get("shingle", "word"))))


_CC_DRIVER_THRESHOLD = 1_000_000
"""Edge-count bound under which a pair graph's components resolve
driver-side in one collect (a ≤~16 MB id-pair transfer) instead of
per-iteration label-propagation jobs."""


def _driver_union_find(rows) -> dict:
    """Min-label union-find over collected (id_a, id_b) pair rows →
    {node: component} with every label fully resolved (union by min,
    path halving). Shared by ``connected_components``' fast path and
    the incremental-dedup probes that already hold the pair rows
    (r15: one take() both probes emptiness AND yields the components,
    where isEmpty + connected_components paid two jobs)."""
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for r in rows:
        ra, rb = find(r[0]), find(r[1])
        if ra != rb:
            # union by min so the root IS the component label
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in list(parent)}


def _probe_pair_losers(pairs: DataFrame, *, id_a: str = "id_a",
                       id_b: str = "id_b") -> "list | DataFrame | None":
    """ONE action deciding a batch's within-batch dedup outcome: a
    ``take(threshold+1)`` over the verified-pair table either proves
    the batch CLEAN (returns None — zero pairs ⟹ zero losers), or
    yields the whole (small) edge list whose components resolve
    driver-side — the pair rows are already in hand, so re-running
    ``connected_components``' own take would be a second job over the
    same checkpoint blocks — or, past the driver threshold (a
    bulk-bootstrap batch), falls back to the full distributed
    machinery. Returns the non-representative ("loser") ids as a
    plain LIST when driver-resolved (callers attach it as a filter —
    guide §8: decide with small rows, attach without a join), a
    single-column ``id`` frame on the distributed path, or None for a
    clean batch."""
    rows = pairs.select(F.col(id_a), F.col(id_b)) \
        .take(_CC_DRIVER_THRESHOLD + 1)
    if not rows:
        return None
    if len(rows) <= _CC_DRIVER_THRESHOLD:
        labels = _driver_union_find(rows)
        return [x for x, c in labels.items() if x != c]
    comp = connected_components(pairs, id_a, id_b)
    return comp.filter(F.col("id") != F.col("component")).select("id")


_ISIN_MAX = 100_000
"""Largest driver-resolved id set attached as an ``isin`` filter (an
``InSet`` past the conversion threshold — a per-task hash probe, no
join, no broadcast-build job, and the scan keeps its pruning). Bigger
sets become a local-relation anti-join so the plan never serializes
an unbounded literal list."""


def _drop_ids(df: DataFrame, id_col: str, losers) -> DataFrame:
    """Drop ``losers`` (a driver list or an id frame) from ``df`` with
    anti-join NULL semantics: a NULL id matches no loser and is KEPT
    (``~isin`` alone yields NULL there and would silently drop it)."""
    if isinstance(losers, list) and len(losers) <= _ISIN_MAX:
        return df.filter(~F.coalesce(
            F.col(id_col).isin(losers), F.lit(False)))
    if isinstance(losers, list):
        losers = df.sparkSession.createDataFrame(
            [(x,) for x in losers], f"id {dict(df.dtypes)[id_col]}")
    # distributed/oversized path: let the planner pick the join (a
    # >threshold loser set may be too big to force broadcast)
    return df.join(losers, df[id_col] == losers.id, "left_anti")


def connected_components(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b",
                         *, max_iter: int = 20,
                         driver_threshold: int = _CC_DRIVER_THRESHOLD) -> DataFrame:
    """Min-label components over an undirected pair graph.

    Returns (id, component) where component = min id reachable.

    Adaptive strategy (same spirit as broadcast-vs-shuffle joins): when
    the edge list fits comfortably on the driver (≤ ``driver_threshold``
    pairs — LSH near-dup graphs are a sliver of the corpus), a local
    union-find answers in one collect instead of paying per-iteration
    job overhead. Above the threshold, distributed min-label
    propagation *with pointer jumping*: each iteration propagates the
    neighbor minimum, then looks the received label up in the previous
    label table (component-of-component) — labels skip along discovered
    paths, giving the claimed O(log diameter) rounds instead of
    one-hop-per-round. Emits a RuntimeWarning if ``max_iter`` exhausts
    before convergence (labels would be split across a component).
    """
    check_reserved(pairs, {"__cid", "__cmin"}, "connected_components")
    # The pair pipeline (typically LSH join + verify) feeds several
    # actions below (threshold probe, then collect OR the two edge-union
    # legs) — persist it once instead of re-running it per action. The
    # try/finally spans *every* action that reads it, so the cache is
    # released on all exception paths, not just the happy one.
    pairs = pairs.persist()
    try:
        # ONE action probes the size AND fetches the edges: take() of
        # threshold+1 rows either returns the whole (small) edge list —
        # no second collect job — or proves the graph is over-threshold
        # (the extra ≤1M-row driver transfer on that rare path is
        # bounded at ~16 MB of id pairs).
        rows = pairs.select(F.col(id_a), F.col(id_b)).take(driver_threshold + 1)
        if len(rows) <= driver_threshold:
            data = list(_driver_union_find(rows).items())
            schema_t = dict(pairs.dtypes)[id_a]
            return pairs.sparkSession.createDataFrame(
                data or [], f"id {schema_t}, component {schema_t}")
        edges = (
            pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
            .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
            .distinct()
            .persist()  # reused every iteration — never recompute the pair pipeline
        )
        try:
            # localCheckpoint (not persist) on the label table: labels feed
            # THREE plan legs per iteration (neighbor-min join, propagate
            # join, jump lookup), so without logical-plan truncation the
            # plan tree grows ~3x per round — exponential analysis cost
            # long before any data moves. Checkpoint blocks are reclaimed
            # by the ContextCleaner as old iterations go out of reference.
            labels = (
                edges.select("src")
                .union(edges.select(F.col("dst").alias("src"))).distinct()
                .select(F.col("src").alias("id"), F.col("src").alias("component"))
                .localCheckpoint(eager=True)
            )
        except Exception:
            edges.unpersist()
            raise
    finally:
        # building labels materialized (and cached) edges — the raw pair
        # pipeline is no longer needed on any path
        pairs.unpersist()
    try:
        converged = False
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.dst == labels.id)
                .groupBy("src").agg(F.min("component").alias("nbr_component"))
            )
            propagated = (
                labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_component"), F.col("component")),
                    ).alias("component"),
                )
            )
            # Pointer jumping against the (persisted) previous label
            # table: whatever label a node just received, follow it one
            # more step — doubles the effective hop distance per round.
            lookup = labels.select(F.col("id").alias("__cid"),
                                   F.col("component").alias("__cmin"))
            new_labels = (
                propagated.join(lookup, propagated.component == F.col("__cid"),
                                "left")
                .select(
                    "id",
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("__cmin"), F.col("component")),
                    ).alias("component"),
                )
                # materialize NOW into checkpoint blocks: truncates the
                # logical plan so each iteration costs one pass and a
                # constant-size plan tree
                .localCheckpoint(eager=True)
            )
            changed = (
                new_labels.alias("n").join(labels.alias("o"), "id")
                .filter(F.col("n.component") != F.col("o.component")).limit(1).count()
            )
            labels = new_labels
            if changed == 0:
                converged = True
                break
        if not converged:
            import warnings

            warnings.warn(
                f"connected_components: not converged after max_iter={max_iter} "
                "iterations — component labels may be split (raise max_iter)",
                RuntimeWarning, stacklevel=2)
        return labels
    finally:
        edges.unpersist()


@register_lens("connected_components")
def connected_components_lens(arguments: Mapping[str, Any]) -> Lens:
    """Expose min-label components as a first-class lens: the input
    frame IS the undirected edge list (``id_a``/``id_b`` columns by
    argument) — composable after any pair-producing lens
    (minhash/winnow/containment/image pairs) to turn pair soup into
    cluster ids without leaving a lens spec. arguments: id_a
    ("id_a"), id_b ("id_b"), max_iter (20)."""
    return Lens(
        "connected_components", arguments,
        lambda df: connected_components(
            df, str(arguments.get("id_a", "id_a")),
            str(arguments.get("id_b", "id_b")),
            max_iter=int(arguments.get("max_iter", 20))))


def dedup_neardup(df: DataFrame, id_col: str, text_col: str, **kwargs) -> DataFrame:
    """Keep one representative (min id) per near-dup cluster."""
    pairs = neardup_pairs(df, id_col, text_col, **kwargs)
    comp = connected_components(pairs)
    losers = comp.filter(F.col("id") != F.col("component")).select(F.col("id"))
    return df.join(losers, df[id_col] == losers.id, "left_anti")


def simhash_table(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) via explode → per-bit popcount agg → pack.

    Same scale shape as minhash_bands: explode tokens (narrow), one
    map-side-combined groupBy carrying 60 small sums + a count per
    doc, then a flat packing projection. The expression-level
    ``simhash60`` recomputes the token-hash array once per bit (60×);
    this form hashes each token exactly once. Docs with no tokens get
    simhash 0 (left join keeps them), matching ``simhash60``. Token
    hash = top 60 bits of md5 (functions.hashing.SIMHASH_BITS), so the
    DuckDB oracle reproduces the exact integers.
    """
    check_reserved(df, {"__h", "__n", "__t"}, "simhash_table")
    from lens_spark.functions.hashing import SIMHASH_BITS

    df = ensure_parallelism(df, by=[id_col])
    ids = df.select(F.col(id_col))
    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("__t")
    ).select(
        F.col(id_col),
        F.conv(F.substring(F.md5(F.col("__t")), 1, 15), 16, 10)
        .cast("bigint").alias("__h"))
    bits = tok.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(F.getbit(F.col("__h"), F.lit(i))).alias(f"__b{i}")
          for i in range(SIMHASH_BITS)],
    )
    packed = F.lit(0).cast("bigint")
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"__b{i}") * 2 >= F.col("__n"), F.lit(1)).otherwise(F.lit(0))
        packed = packed + bit.cast("bigint") * F.lit(1 << i).cast("bigint")
    sh = bits.select(F.col(id_col), packed.alias("simhash"))
    return ids.join(sh, id_col, "left").select(
        F.col(id_col), F.coalesce(F.col("simhash"), F.lit(0).cast("bigint")).alias("simhash")
    )


def embedding_neardup_pairs(df: DataFrame, id_col: str, vec_col: str, *,
                            threshold: float = 0.95, method: str = "exact",
                            dim: int | None = None, num_bits: int = 8,
                            num_tables: int = 4, seed: int = 42) -> DataFrame:
    """Embedding-cosine near-dup pairs.

    method="exact": all-pairs self-join — O(n²), oracle-checkable,
    small corpora only. method="lsh": the 100 TB path — vectors hash to
    random-hyperplane sign buckets (same vectorized kernel as
    similarity.ann_topk); only bucket-mates in ≥1 of ``num_tables``
    tables are scored, then verified with the exact cosine, so every
    emitted pair is a true positive and only recall is approximate.
    Near-duplicate vectors agree on most hyperplane signs, which is
    exactly when bucket collision probability is highest — the higher
    the threshold, the better the recall.
    """
    check_reserved(df, {
        "__bucket", "__id", "__v", "__va", "__vb",
    }, "embedding_neardup_pairs")
    if method == "lsh":
        import numpy as np
        import pandas as pd

        from lens_spark.operators.similarity import _bucket_array_udf

        if dim is None:
            raise LensError("embedding_neardup_pairs(method='lsh') needs dim")
        bucket_udf = _bucket_array_udf(dim, num_bits, num_tables, seed)
        # One shuffle total: explode (table, bucket) cells, group by
        # cell, and verify WITHIN each bucket with a blocked numpy
        # matmul (applyInPandas). A candidate-pair equi-join would
        # materialize every bucket-mate pair as a row (at a low
        # threshold that's a large fraction of n²) and score each with
        # per-row expression cosine; the grouped kernel scores the same
        # pairs at BLAS speed and only true positives ever become rows.
        # Bucket size is bounded by num_bits (and the block loop keeps
        # memory flat for a skewed bucket), so no task sees more than
        # one bucket's vectors.
        id_type = dict(df.dtypes)[id_col]
        thr = float(threshold)

        def verify_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            n = len(pdf)
            if n < 2:
                return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
            ids = pdf["__id"].to_numpy()
            x = np.stack(pdf["__v"].to_numpy()).astype(np.float64)
            x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-30)
            out_a, out_b, out_c = [], [], []
            block = 2048
            for lo in range(0, n, block):
                hi = min(lo + block, n)
                sims = x[lo:hi] @ x[lo:].T  # only j >= lo: upper triangle
                for r in range(hi - lo):
                    i = lo + r
                    row = sims[r, r + 1:]
                    js = np.nonzero(row >= thr)[0] + i + 1
                    for j in js:
                        a, b = ids[i], ids[j]
                        if a > b:
                            a, b = b, a
                        out_a.append(a)
                        out_b.append(b)
                        out_c.append(round(float(sims[r, j - lo]), 6))
            return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

        bucketed = ensure_parallelism(df).select(
            F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
            F.explode(bucket_udf(F.col(vec_col))).alias("__bucket"),
        )
        pairs = bucketed.groupBy("__bucket").applyInPandas(
            verify_bucket,
            f"id_a {id_type}, id_b {id_type}, cosine double")
        # a pair can collide in several tables — emit it once
        return pairs.select("id_a", "id_b", "cosine").distinct()
    if method == "exact":
        av = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
        bv = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
        cand = av.join(bv, F.col("id_a") < F.col("id_b"))
    else:
        raise LensError(f"embedding_neardup_pairs: unknown method '{method}'")
    return (
        cand.withColumn("cosine", cosine_similarity(F.col("__va"), F.col("__vb")))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )


INDEX_PROBE_BUCKETS = 16
"""Partition fan-out of the bucketed (kind, pb) incremental-index
layout (r6). The probe key (band_hash / cell) folds into
``pb = pmod(key-hash, INDEX_PROBE_BUCKETS)`` and the index is
partitioned by it, so a small ingest batch's corpus probe prunes the
parquet listing to the pb directories its own keys touch instead of
scanning the whole band/cell index — the index grows with the corpus,
the probe cost grows with the batch. 16 balances pruning granularity
against files-per-append (each append writes ≤ buckets × files-per-
partition new files)."""


def _parts_pb_migration_recover(spark, parts_path: str) -> None:
    """Roll an interrupted bucketed-layout migration forward or back.

    ``_migrate_parts_to_bucketed`` stages: (tmp write) → rename parts →
    parts.old → rename tmp → parts → delete parts.old. The tmp dataset
    is complete before the first rename, so every crash point has a
    deterministic recovery (run under the writer lock):

    - parts + tmp       → crash before rename 1: tmp may be partial —
      delete tmp, the migration will rerun;
    - no parts, old+tmp → crash between renames: tmp is complete —
      finish rename 2, drop old;
    - parts + old       → crash before the final delete: drop old.
    """
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(parts_path).getFileSystem(spark._jsc.hadoopConfiguration())
    parts, tmp, old = P(parts_path), P(parts_path + ".migrating"), \
        P(parts_path + ".old")
    # per-partition (subset-compaction) swaps recover first — they are
    # independent of the whole-parts matrix below, and every pre-write
    # recovery call site must heal them too (one listStatus; no-op
    # when no hidden leftovers exist)
    _partition_swap_recover(spark, parts_path)
    if fs.exists(parts):
        if fs.exists(tmp):
            fs.delete(tmp, True)
        if fs.exists(old):
            fs.delete(old, True)
        return
    if fs.exists(old) and fs.exists(tmp):
        if not fs.rename(tmp, parts):
            raise LensError(
                f"incremental index migration recovery at {parts_path!r}: "
                "could not rename the completed .migrating dataset into "
                "place — inspect the directory manually.")
        fs.delete(old, True)


def _parts_migration_leftovers(spark, parts_path: str) -> bool:
    """True iff a parts rewrite crashed in an unsafe window — read-only
    callers must refuse rather than silently see missing data. Two
    shapes: the whole-dataset staged swap (``parts/`` missing, staging
    dirs present) and a per-partition subset swap (a live partition
    dir missing while its hidden staging/trash sibling exists — a
    reader would treat that partition as EMPTY, wrong results rather
    than an error)."""
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(parts_path).getFileSystem(spark._jsc.hadoopConfiguration())
    if (not fs.exists(P(parts_path))) and (
            fs.exists(P(parts_path + ".old"))
            or fs.exists(P(parts_path + ".migrating"))):
        return True
    return _partition_swap_leftover_unsafe(spark, parts_path)


def _staged_swap(spark, parts_path: str, write_tmp, op: str) -> None:
    """Replace ``parts/`` with a rewritten dataset, crash-safely.

    THE one staged-rename protocol every persistent index (MinHash
    band, exact-fingerprint, quota count, IVFPQ code) shares — the
    r10/r11 advice class was precisely these four maintaining private
    copies of the sequence and drifting. ``write_tmp(tmp_path)`` must
    write the complete replacement dataset to ``tmp_path``
    (``parts.migrating``); the swap then goes rename parts →
    parts.old, rename tmp → parts, delete old. The tmp dataset is
    complete before the first rename, so every crash point is rolled
    forward or back by ``_parts_pb_migration_recover`` on the next
    locked call, and read-only callers refuse the unsafe window via
    ``_parts_migration_leftovers``. CALLER HOLDS the writer lease.
    """
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(parts_path).getFileSystem(spark._jsc.hadoopConfiguration())
    write_tmp(parts_path + ".migrating")
    if not fs.rename(P(parts_path), P(parts_path + ".old")):
        raise LensError(
            f"{op}: could not stage {parts_path!r} aside — inspect "
            "the directory manually.")
    if not fs.rename(P(parts_path + ".migrating"), P(parts_path)):
        raise LensError(
            f"{op}: could not rename the rewritten dataset into place "
            f"at {parts_path!r} — recovery will complete it on the "
            "next locked call.")
    fs.delete(P(parts_path + ".old"), True)


def _partition_swap_names(dir_name: str) -> "tuple[str, str]":
    """Hidden staging/trash sibling names for a PER-PARTITION rewrite
    of ``parts/<dir_name>``. The leading dot keeps them invisible to
    parquet partition discovery, so a reader never sees a half-swapped
    directory as data — only the live name is ever listable."""
    return f".{dir_name}.migrating", f".{dir_name}.old"


def _partition_swap_recover(spark, parts_path: str) -> None:
    """Roll interrupted PER-PARTITION rewrites forward or back — the
    subset-compaction analogue of ``_parts_pb_migration_recover``,
    applied per directory (run under the writer lock). For each hidden
    leftover of a partition dir X the crash matrix is the parts-level
    one: X present → any ``.X.migrating`` is a possibly-partial rerun
    staging (delete) and any ``.X.old`` is post-swap residue (delete);
    X missing with ``.X.old`` + complete ``.X.migrating`` → finish the
    second rename and drop old; X missing with only ``.X.old`` → roll
    back."""
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(parts_path).getFileSystem(spark._jsc.hadoopConfiguration())
    root = P(parts_path)
    if not fs.exists(root):
        return
    leftovers: dict[str, dict] = {}
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not st.isDirectory() or not name.startswith("."):
            continue
        for kind in ("migrating", "old"):
            if name.endswith(f".{kind}"):
                live = name[1:-(len(kind) + 1)]
                leftovers.setdefault(live, {})[kind] = name
    for live, found in leftovers.items():
        live_p = P(f"{parts_path}/{live}")
        tmp = P(f"{parts_path}/{found.get('migrating', '')}") \
            if "migrating" in found else None
        old = P(f"{parts_path}/{found.get('old', '')}") \
            if "old" in found else None
        if fs.exists(live_p):
            if tmp is not None:
                fs.delete(tmp, True)
            if old is not None:
                fs.delete(old, True)
            continue
        if old is not None and tmp is not None:
            # between the renames: tmp is complete — roll forward
            if not fs.rename(tmp, live_p):
                raise LensError(
                    f"partition swap recovery at {parts_path!r}: could "
                    f"not roll {live!r} forward — inspect manually.")
            fs.delete(old, True)
        elif old is not None:
            if not fs.rename(old, live_p):
                raise LensError(
                    f"partition swap recovery at {parts_path!r}: could "
                    f"not roll {live!r} back — inspect manually.")
        elif tmp is not None:
            # crash before rename 1 of a partition that does not exist
            # (unreachable via the compactor, which only stages LIVE
            # dirs) — the staging is residue, delete it
            fs.delete(tmp, True)


def _partition_swap_leftover_unsafe(spark, parts_path: str) -> bool:
    """True iff a PER-PARTITION rewrite crashed in its unsafe window
    (a live partition dir missing while its hidden staging/trash
    sibling exists): a read would silently treat the mid-swap
    partition as EMPTY — wrong results, not an error — so read-only
    callers must refuse until a writing call recovers. One listStatus
    of parts/ (bounded by the partition-dir count) plus an exists()
    per leftover (normally zero)."""
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(parts_path).getFileSystem(spark._jsc.hadoopConfiguration())
    root = P(parts_path)
    if not fs.exists(root):
        return False
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not st.isDirectory() or not name.startswith("."):
            continue
        if name.endswith((".migrating", ".old")):
            live = name[1:].rsplit(".", 1)[0]
            if not fs.exists(P(f"{parts_path}/{live}")):
                return True
    return False


def _compact_partition_subset(spark, parts_path: str, dir_names,
                              *, target_files: int, select_cols,
                              drop_replay_duplicates: bool,
                              op: str, transform=None) -> dict:
    """Rewrite ONLY the named first-level partition directories of a
    parts dataset, each through its own hidden staged swap — the
    in-sink compaction path (r12 verdict #3): a streaming batch that
    pushes ONE bucket over the file threshold must rewrite that
    bucket, not the whole index (a full rewrite inside a micro-batch
    is an ingest stall proportional to the index, recurring every
    ~threshold batches at 100 TB). Work scales with the named dirs:
    read one partition dir, write ``target_files`` files, two renames
    — the rest of the index is never listed, read, or touched.
    ``transform`` (df → df) applies a family-lawful per-partition
    rewrite (the quota index's increment-row SUM merge); row deltas
    from either it or ``drop_replay_duplicates`` are reported in
    ``rows_removed``. CALLER HOLDS the writer lease and has run
    recovery."""
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(parts_path).getFileSystem(spark._jsc.hadoopConfiguration())
    files_before = files_after = 0
    rows_removed = 0
    compacted = []
    for dir_name in dir_names:
        live = P(f"{parts_path}/{dir_name}")
        if not fs.exists(live):
            continue
        tmp_name, old_name = _partition_swap_names(dir_name)
        tmp, old = (P(f"{parts_path}/{tmp_name}"),
                    P(f"{parts_path}/{old_name}"))
        files_before += _visible_file_count(spark, live.toString())
        # the partition column lives in the DIRECTORY NAME, so reading
        # the dir yields the data columns only — exactly what the
        # rewrite must land (the rename restores the partition name)
        part = spark.read.parquet(live.toString()).select(*select_cols)
        if drop_replay_duplicates or transform is not None:
            before = part.count()
            if drop_replay_duplicates:
                part = part.distinct()
            if transform is not None:
                part = transform(part)
            part = part.localCheckpoint(eager=True)
            rows_removed += before - part.count()
        (part.repartition(max(1, int(target_files)))
         .write.mode("overwrite").parquet(tmp.toString()))
        if not fs.rename(live, old):
            raise LensError(
                f"{op}: could not stage {dir_name!r} aside — inspect "
                "the directory manually.")
        if not fs.rename(tmp, live):
            raise LensError(
                f"{op}: could not rename the rewritten {dir_name!r} "
                "into place — recovery will complete it on the next "
                "locked call.")
        fs.delete(old, True)
        files_after += _visible_file_count(spark, live.toString())
        compacted.append(dir_name)
    return {"files_before": files_before, "files_after": files_after,
            "rows_removed": rows_removed, "partitions": compacted}


def _visible_file_count(spark, root: str) -> int:
    """Recursive count of data files under ``root`` (skips Spark's
    ``_SUCCESS``/hidden entries) — the before/after metric every index
    compactor reports."""
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(root).getFileSystem(spark._jsc.hadoopConfiguration())
    it = fs.listFiles(P(root), True)
    n = 0
    while it.hasNext():
        if not it.next().getPath().getName().startswith(("_", ".")):
            n += 1
    return n


def _migrate_parts_to_bucketed(spark, parts_path: str, pb_col) -> None:
    """Rewrite a pre-r6 (kind-only) ``parts/`` index into the bucketed
    (kind, pb) layout, in place, under the caller's writer lock.

    Parquet partition discovery requires a uniform directory depth, so
    old and new layouts cannot coexist in one dataset — the rewrite
    stages through ``_staged_swap`` (see
    ``_parts_pb_migration_recover`` for the crash matrix). One-time
    cost proportional to the index (not the corpus) size.
    """
    def write_tmp(tmp: str) -> None:
        (spark.read.parquet(parts_path).withColumn("pb", pb_col)
         .write.mode("overwrite").partitionBy("kind", "pb")
         .parquet(tmp))

    _staged_swap(spark, parts_path, write_tmp,
                 "incremental index migration")


def compact_index(spark, index_path: str, *,
                  target_files_per_partition: int = 1,
                  drop_replay_duplicates: bool = False,
                  partitions: "list | None" = None) -> dict:
    """Rewrite an incremental index's ``parts/`` dataset with
    ``target_files_per_partition`` files per (kind, pb) partition.

    Every ingest batch APPENDS files; after thousands of batches a
    probe's pruned partition still lists thousands of tiny parquet
    files, and open/footer overhead — not bytes — dominates. This is
    the maintenance pass: run it off the ingest path (it takes the
    writer lease, so ingest and compaction serialize). Reuses the
    bucketed-migration staged-rename machinery, so a crash mid-compact
    is rolled forward/back by the next locked call; data is byte-
    equivalent, only file boundaries change. Returns {"files_before",
    "files_after"}.

    ``drop_replay_duplicates=True`` additionally collapses
    byte-identical rows — the residue an at-least-once streaming
    replay leaves behind. Safe for every family this compactor serves
    (fingerprint, band, postings rows are all SET-semantics facts:
    probes semi-join or distinct them, so duplicates never changed
    results, only bytes); the quota index is NOT served here — its
    rows are increments, deduping them would drop counts, and
    ``compact_quota_index`` SUMS instead.

    Works on the neardup_incremental / embedding_neardup_incremental
    band indexes, the dedup_incremental fingerprint index, and the
    postings index (same parts/ conventions). A pre-r6 kind-only
    index must be migrated first (any writing call does it);
    compacting it here would need the kind-specific pb derivation
    this utility deliberately doesn't duplicate.

    ``partitions`` (a list of pb bucket values) switches to
    PARTITION-SUBSET mode (r12 verdict #3 — the in-sink compaction
    path): ONLY the named bucket directories are rewritten, each
    through its own hidden staged swap, and work scales with the
    subset, never the index — a streaming batch that pushes one hot
    bucket over its file threshold must not pay (or stall ingest
    for) a full-index rewrite. Single-level ``pb=`` layouts only
    (the postings / fingerprint shape); whole-index rewrites remain
    this function's default mode and the nightly sweep's job.
    """
    from lens_spark.sources import dataset_nonempty

    parts_path = f"{index_path}/parts"

    with _index_writer_lock(spark, index_path):
        _parts_pb_migration_recover(spark, parts_path)
        if not dataset_nonempty(spark, parts_path):
            return ({"files_before": 0, "files_after": 0}
                    if partitions is None else
                    {"files_before": 0, "files_after": 0,
                     "rows_removed": 0, "partitions": []})
        if partitions is not None:
            # Schema + layout from ONE named bucket dir (r13 verdict):
            # a full-tree spark.read.parquet(parts_path) runs parquet
            # partition discovery — it lists EVERY file in the index —
            # inside a streaming micro-batch, contradicting the subset
            # contract ("the rest of the index is never listed, read,
            # or touched"). The served families differ in data columns
            # (fingerprint vs band vs postings), so probe one named
            # dir instead of hard-coding like the ivfpq twin.
            jvm = spark._jvm
            P = jvm.org.apache.hadoop.fs.Path
            fs = P(parts_path).getFileSystem(
                spark._jsc.hadoopConfiguration())
            dir_names = [f"pb={int(v)}" for v in partitions]
            # layout check with ONE listStatus of the root (bounded
            # by the bucket-dir count, never the file count): the old
            # full-tree read raised loudly on a non-pb layout, and a
            # silent zero-return here would let a mis-routed index
            # accumulate files forever (r14 review)
            first_level = [st.getPath().getName()
                           for st in fs.listStatus(P(parts_path))
                           if st.isDirectory()
                           and not st.getPath().getName()
                           .startswith((".", "_"))]
            if not any(n.startswith("pb=") for n in first_level):
                raise LensError(
                    "compact_index: partition-subset compaction "
                    "supports the single-level pb= layout only (this "
                    "index's first-level dirs are "
                    f"{sorted(first_level)[:4]}); run a full "
                    "compaction instead.")
            # schema from ONE named bucket dir holding at least one
            # data file (an existing-but-empty dir cannot infer a
            # schema; the sink never names one, direct callers might)
            probe = next(
                (d for d in dir_names
                 if fs.exists(P(f"{parts_path}/{d}"))
                 and _visible_file_count(spark,
                                         f"{parts_path}/{d}") > 0),
                None)
            if probe is None:
                return {"files_before": 0, "files_after": 0,
                        "rows_removed": 0, "partitions": []}
            # the pb value lives in the directory name, so reading
            # the one dir yields exactly the data columns
            data_cols = spark.read.parquet(
                f"{parts_path}/{probe}").columns
            stats = _compact_partition_subset(
                spark, parts_path, dir_names,
                target_files=int(target_files_per_partition),
                select_cols=data_cols,
                drop_replay_duplicates=drop_replay_duplicates,
                op="compact_index")
            if stats["rows_removed"]:
                from lens_spark.sources import read_json_file
                meta = read_json_file(spark, f"{index_path}/model.json")
                if meta is not None and meta.get("format") == \
                        "lens_spark_postings_index":
                    from lens_spark.operators.ranking import (
                        _bump_postings_stats,
                    )
                    _bump_postings_stats(spark, index_path,
                                         -stats["rows_removed"])
            return stats
        parts = spark.read.parquet(parts_path)
        if drop_replay_duplicates:
            parts = parts.distinct()
        if "pb" not in parts.columns:
            raise LensError(
                f"compact_index: index at {index_path!r} predates the "
                "bucketed (kind, pb) layout; run one writing "
                "neardup_incremental / embedding_neardup_incremental "
                "call to migrate it, then compact.")
        before = _visible_file_count(spark, parts_path)
        # Files-per-directory = number of tasks holding that dir's
        # rows: repartitioning BY the partition columns puts each
        # partition combo in exactly one task → exactly one file per
        # directory; target > 1 adds a hash salt so huge partitions
        # split across `target` writer tasks/files. The band/cell
        # indexes partition by (kind, pb); the exact-fp index by pb
        # alone — compact whichever layout is present.
        tgt = max(1, int(target_files_per_partition))
        part_cols = [c for c in ("kind", "pb") if c in parts.columns]
        keys = [F.col(c) for c in part_cols]
        if tgt > 1:
            keys.append(F.pmod(F.xxhash64(F.col(parts.columns[0])
                                          .cast("string")), F.lit(tgt)))

        def write_tmp(tmp: str) -> None:
            (parts.repartition(*keys)
             .write.mode("overwrite").partitionBy(*part_cols)
             .parquet(tmp))

        _staged_swap(spark, parts_path, write_tmp, "compact_index")
        after = _visible_file_count(spark, parts_path)
        # a postings index carries a maintained row-count sidecar
        # (postings_drift_report's O(1) denominator); the full rewrite
        # is the one place a TRUE recount is already paid for — reseed
        # it here (also heals a sidecar lost to a torn append update,
        # and restores stat == distinct postings after a
        # drop_replay_duplicates pass)
        from lens_spark.sources import read_json_file
        meta = read_json_file(spark, f"{index_path}/model.json")
        if meta is not None and meta.get("format") == \
                "lens_spark_postings_index":
            from lens_spark.operators.ranking import _write_postings_stats
            _write_postings_stats(
                spark, index_path,
                spark.read.parquet(parts_path).count())
    return {"files_before": before, "files_after": after}


INDEX_LOCK_STALE_SEC = 3600
"""A writer lock older than this is presumed abandoned (crashed writer
that never reached its finally) and is broken by the next writer. Size
it above your longest expected ingest batch."""


def _refresh_writer_lock(spark, index_path: str) -> None:
    """Bump the held lock file's mtime so a LONG critical section is
    not mistaken for a crashed holder: the stale-break window compares
    against mtime, and a batch whose work exceeds the window would
    otherwise get its live lock broken by a peer. Callers holding the
    lease across multi-stage work (streaming ingest batches) should
    refresh between stages; for a SINGLE stage longer than the window
    wrap the critical section in ``_lease_heartbeat`` (the index
    builders and ``rebuild_index`` do)."""
    import time

    jvm = spark._jvm
    lock = jvm.org.apache.hadoop.fs.Path(f"{index_path}/_writer.lock")
    fs = lock.getFileSystem(spark._jsc.hadoopConfiguration())
    with contextlib.suppress(Exception):  # best-effort: losing the
        # refresh only narrows the stale margin, never correctness
        fs.setTimes(lock, int(time.time() * 1000), -1)


@contextlib.contextmanager
def _lease_heartbeat(spark, index_path: str, *,
                     interval: "float | None" = None):
    """Keep a HELD writer lease visibly alive through arbitrarily long
    Spark stages (r12 verdict #7): ``_refresh_writer_lock`` between
    stages closes the multi-stage gap, but a SINGLE stage longer than
    the stale window still left the lock looking abandoned — a
    concurrent writer would break it mid-build. A daemon thread
    touches the lock mtime every ``interval`` seconds (default
    stale/4) for the duration of the context; it dies with the driver,
    so a CRASHED build's lease correctly ages out and the stale-break
    path still works. Py4J is thread-safe (each thread gets its own
    gateway connection); the touch is the same best-effort setTimes
    the inter-stage refresh uses. CALLER HOLDS the lease."""
    import threading

    stop = threading.Event()
    ival = float(interval if interval is not None
                 else INDEX_LOCK_STALE_SEC / 4.0)

    def beat() -> None:
        while not stop.wait(ival):
            _refresh_writer_lock(spark, index_path)

    t = threading.Thread(target=beat, daemon=True,
                         name=f"lens-lease-heartbeat:{index_path}")
    t.start()
    try:
        yield
    finally:
        stop.set()
        t.join(timeout=5.0)


@contextlib.contextmanager
def _index_writer_lock(spark, index_path: str, *,
                       stale_after_sec: float = INDEX_LOCK_STALE_SEC):
    """Exclusive writer lease over an incremental-dedup index.

    The incremental flow is read-index → dedup → append-index. Two
    concurrent writers each dedup against the pre-append index and both
    accept the same (near-)duplicates — a lost update that staging the
    appends cannot detect, because the damage happens at *read* time.
    So mutual exclusion covers the whole flow: the lock is taken before
    the index is first read and released only after the appends commit.

    Mechanism: atomic create-exclusive of ``<index>/_writer.lock`` via
    the Hadoop FileSystem API (``createNewFile`` — atomic on local FS
    and HDFS; on object stores without atomic create, e.g. bare S3,
    this is best-effort, the same guarantee level as the Hadoop commit
    protocol itself there). The leading underscore keeps the lock file
    invisible to Spark's data-file listing. A lock older than
    ``stale_after_sec`` is broken; a live one raises
    ``ConcurrentIndexWriterError`` rather than corrupting the index.
    """
    import time

    jvm = spark._jvm
    lock = jvm.org.apache.hadoop.fs.Path(f"{index_path}/_writer.lock")
    fs = lock.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.mkdirs(jvm.org.apache.hadoop.fs.Path(index_path))
    acquired = fs.createNewFile(lock)
    if not acquired:
        try:
            age = time.time() \
                - fs.getFileStatus(lock).getModificationTime() / 1000.0
        except Exception:
            # lock vanished between create and stat: a racing writer is
            # mid-flight — treat as contended, not stale
            age = 0.0
        if age > stale_after_sec:
            # Break the stale lock via atomic RENAME, not delete+create:
            # two writers finding the same stale lock would both delete
            # and both create (double-acquire). Of N concurrent breakers
            # exactly one rename succeeds; losers fall through to the
            # contended error. A writer that sneaks createNewFile in
            # between our rename and create simply wins the lock — we
            # then correctly report contended.
            import uuid as _uuid

            stale = jvm.org.apache.hadoop.fs.Path(
                f"{index_path}/_writer.lock.stale-{_uuid.uuid4().hex[:8]}")
            if fs.rename(lock, stale):
                fs.delete(stale, False)
                acquired = fs.createNewFile(lock)
    if not acquired:
        raise ConcurrentIndexWriterError(
            f"incremental dedup index at {index_path!r} is locked by "
            f"another writer ({index_path}/_writer.lock, held for less "
            f"than {stale_after_sec:.0f}s). Ingest jobs sharing an index "
            "must run serially; if the holder crashed, delete the lock "
            "file or wait for the stale window to pass.")
    try:
        yield
    finally:
        fs.delete(lock, False)


def _migrate_flat_fp_index(spark, index_path: str, parts_path: str) -> None:
    """Rewrite a pre-r6 FLAT fingerprint index (fp parquet files
    directly under ``index_path``) into the bucketed ``parts/pb=N``
    layout, in place, under the caller's writer lock.

    Crash-recoverable: the bucketed dataset is staged into
    ``parts.migrating`` first (its ``_SUCCESS`` marker is the
    completeness witness — a partial tmp is deleted and rebuilt from
    the untouched flat files); the flat files are deleted only after
    the tmp commit, and the final rename is idempotent on re-entry.
    """
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    fs = P(index_path).getFileSystem(spark._jsc.hadoopConfiguration())
    tmp = parts_path + ".migrating"
    flat = []
    for st in fs.listStatus(P(index_path)):
        name = st.getPath().getName()
        if st.isFile() and not name.startswith(("_", ".")):
            flat.append(st.getPath().toString())
    if not fs.exists(P(tmp + "/_SUCCESS")):
        if fs.exists(P(tmp)):
            fs.delete(P(tmp), True)  # partial write — rebuild from flat
        if not flat:
            return
        (spark.read.parquet(*flat)
         .withColumn("pb", F.pmod(F.col("fp"), F.lit(INDEX_PROBE_BUCKETS)))
         .repartition(F.col("pb"))
         .write.mode("overwrite").partitionBy("pb").parquet(tmp))
    for f in flat:
        fs.delete(P(f), False)
    if not fs.rename(P(tmp), P(parts_path)):
        raise LensError(
            f"dedup_incremental: could not rename the bucketed "
            f"fingerprint dataset into place at {parts_path!r} — the "
            "next writing call will retry the swap.")


def dedup_incremental(df: DataFrame, index_path: str, *,
                      columns: list[str] | None = None,
                      update_index: bool = True,
                      locked: bool = True,
                      broadcast_probe: bool = True) -> DataFrame:
    """Dedup a new batch against everything previously accepted.

    Ongoing ingestion can't re-scan the accepted corpus per batch; it
    keeps a fingerprint index (xxhash64 of the identity columns — the
    index stores 8 bytes/row no matter how wide the data is) at
    ``index_path/parts``, partitioned by ``pb = pmod(fp,
    INDEX_PROBE_BUCKETS)`` like the near-dup family (r6). The probe is
    a LEFT SEMI join of the index against the (broadcast) batch
    fingerprints on (fp, pb): pb is redundant in the condition, but as
    a partition column it lets dynamic partition pruning skip the
    index directories the batch doesn't touch — probe I/O scales with
    the batch, not the accumulated corpus; the small surviving dup-fp
    set then anti-joins the batch. ``broadcast_probe=False`` for a
    batch too large to broadcast (degrades to a full index scan, which
    a corpus-sized batch approaches anyway). Appends repartition by pb
    so each batch commits one file per touched directory;
    ``compact_index`` is the deep-clean.

    A pre-r6 FLAT index (fp files directly under ``index_path``) is
    rewritten into ``parts/`` once by the first writing call; read-only
    calls still read a flat index correctly (unpruned) but refuse an
    interrupted migration.

    First call bootstraps an empty index at ``index_path``. Writers are
    serialized by ``_index_writer_lock`` (concurrent ingests would both
    dedup against the pre-append index); read-only calls
    (``update_index=False``) take no lock, and ``locked=False`` skips
    acquisition for callers that already hold the lease over a wider
    critical section (streaming.stream_ingest_dedup — the lock file is
    not reentrant).
    """
    check_reserved(df, {"__fp"}, "dedup_incremental")
    from lens_spark.sources import dataset_nonempty

    cols = [str(c) for c in (columns or _identity_columns(df))]
    fp = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    batch = df.withColumn("__fp", fp).dropDuplicates(["__fp"])
    spark = df.sparkSession
    parts_path = f"{index_path}/parts"
    lock = (_index_writer_lock(spark, index_path)
            if (update_index and locked) else contextlib.nullcontext())
    with lock:
        have_parts = dataset_nonempty(spark, parts_path)
        if not have_parts and dataset_nonempty(spark, index_path):
            if update_index:
                _migrate_flat_fp_index(spark, index_path, parts_path)
                have_parts = dataset_nonempty(spark, parts_path)
            else:
                jvm = spark._jvm
                P = jvm.org.apache.hadoop.fs.Path
                fs = P(index_path).getFileSystem(
                    spark._jsc.hadoopConfiguration())
                if fs.exists(P(parts_path + ".migrating")):
                    raise LensError(
                        f"dedup_incremental: index at {index_path!r} has "
                        "an interrupted flat→bucketed migration; run "
                        "once with update_index=True to recover it "
                        "before read-only use.")
        if have_parts:
            seen = spark.read.parquet(parts_path)
            probe = (batch.select(F.col("__fp").alias("fp"))
                     .withColumn("pb", F.pmod(F.col("fp"),
                                              F.lit(INDEX_PROBE_BUCKETS)))
                     # always-true selective predicate for the DPP rule
                     # — see the neardup_incremental probe comment
                     .filter(F.col("pb") >= 0))
            if broadcast_probe:
                probe = F.broadcast(probe)
            dup = seen.join(probe, ["fp", "pb"], "left_semi").select("fp")
            fresh = batch.join(dup, batch["__fp"] == dup["fp"], "left_anti")
        elif dataset_nonempty(spark, index_path):
            # read-only against a legacy flat index: correct, unpruned
            seen = spark.read.parquet(index_path)
            fresh = batch.join(seen, batch["__fp"] == seen["fp"],
                               "left_anti")
        else:
            fresh = batch
        if update_index:
            # Truncate lineage before appending: a persist is not enough —
            # the append invalidates the scan cache for parts_path and a
            # later action would re-evaluate the anti-join against the
            # just-updated index (returning nothing). localCheckpoint pins
            # the survivors as stored partitions with no upstream plan.
            # Fault-tolerance tradeoff: checkpoint blocks are
            # executor-local and unreplicated — losing an executor after
            # this point fails the job instead of recomputing. Acceptable
            # here because the checkpoint is consumed within the same job
            # (the append below) and ingest batches are retryable units.
            fresh = fresh.localCheckpoint(eager=True)
            (fresh.select(F.col("__fp").alias("fp"))
             .withColumn("pb", F.pmod(F.col("fp"),
                                      F.lit(INDEX_PROBE_BUCKETS)))
             .repartition(F.col("pb"))
             .write.mode("append").partitionBy("pb").parquet(parts_path))
    return fresh.drop("__fp")


def neardup_incremental(df: DataFrame, index_path: str, id_col: str,
                        text_col: str, *, num_hashes: int = 16,
                        ngram: int = 3, band_size: int = 4,
                        threshold: float = 0.5, shingle: str = "word",
                        update_index: bool = True,
                        locked: bool = True,
                        broadcast_probe: bool = True) -> DataFrame:
    """Near-dup dedup of a new batch against everything previously
    accepted — the streaming-ingest counterpart of ``dedup_neardup``
    (which is batch-global), and the MinHash extension of
    ``dedup_incremental`` (which is exact-fingerprint only).

    The index at ``index_path`` is ONE parquet dataset ``parts/``
    partitioned by ``(kind, pb)`` (``kind=bands`` rows: (id,
    band_hash); ``kind=sigs`` rows: (id, sig array); ``pb`` folds the
    probe key into ``INDEX_PROBE_BUCKETS`` directories) — a few
    hundred bytes per accepted doc regardless of document size. One
    dataset so the two per-batch appends commit as one write job (one
    job's scheduling + one pass over the survivor semi-joins instead
    of two); partition pruning hands each reader only its own files,
    and the ``pb`` fan-out additionally prunes the corpus band probe
    to the buckets the batch's own bands touch (r6 — previously every
    batch scanned the full band index). A pre-r6 kind-only ``parts/``
    is rewritten into the bucketed layout once, under the writer lock,
    with crash-recoverable staged renames. Flow:

    1. the batch is near-deduped internally (LSH self-join on the
       bands → minhash-estimate verify → components → min-id
       representative); a batch with NO verified within-batch pairs —
       the common case for small clean ingest batches — is detected by
       probing the verified-pair set itself and short-circuits past
       the component machinery and the survivor semi-joins. Survivors
       are never checkpointed (r5): the loser set is already
       materialized by connected_components, so re-running the
       anti-join per consumer costs column-pruned scans, cheaper than
       writing full-width rows to checkpoint blocks;
    2. survivors' bands LSH-join against the stored band index — only
       bucket-mates are compared, never batch × corpus;
    3. candidates (both within-batch and vs-corpus) verify with the
       minhash estimate of Jaccard (fraction of agreeing signature
       positions ≥ ``threshold``; the estimator's stderr is
       ~1/sqrt(num_hashes), so size num_hashes to the selectivity you
       need). Estimate verify is the only option vs the corpus — the
       index stores signatures, not shingles — and using it within the
       batch too keeps the two sides consistent AND avoids a second
       shingle pass over the text (``dedup_neardup`` stays the
       exact-Jaccard batch-global path);
    4. survivors' bands + signatures append to the index. Append
       safety: the only plan leg that reads the index files being
       appended to is the vs-corpus duplicate-id set, which is
       eagerly localCheckpointed (id-only blocks — far cheaper than
       r4's full-width survivor checkpoint) before the append, so no
       later action re-evaluates against the new files.

    A legacy (pre-r4) ``bands/``+``sigs/`` index layout is detected and
    migrated into ``parts/`` under the writer lock; a half-migrated
    index (both layouts present) raises instead of guessing.

    Writers are serialized by ``_index_writer_lock`` held from the
    first index read to the append commit (concurrent ingests would
    each dedup against the pre-append index and both accept the same
    near-dups); read-only calls (``update_index=False``) take no lock,
    and ``locked=False`` skips acquisition for callers already holding
    the lease over a wider critical section (the lock file is not
    reentrant).
    """
    check_reserved(df, {
        "__cid", "__csig", "__est_j", "__pb", "__sa", "__sb",
    }, "neardup_incremental")
    from lens_spark.sources import dataset_nonempty

    spark = df.sparkSession
    parts_path = f"{index_path}/parts"

    def _has_legacy_layout() -> bool:
        # Pre-r4 indexes stored two datasets bands/ + sigs/ instead of the
        # kind-partitioned parts/. Silently treating such an index as empty
        # would re-accept every previously indexed near-duplicate.
        return (dataset_nonempty(spark, f"{index_path}/bands")
                or dataset_nonempty(spark, f"{index_path}/sigs"))

    def _migrate_legacy_index() -> None:
        """Rewrite a legacy bands/ + sigs/ index into parts/ (in-lock).

        Only runs when parts/ is still empty; a half-migrated index
        (both layouts non-empty, e.g. a crash between the parts write
        and the legacy delete) is ambiguous and raises instead of
        guessing. The legacy dirs are deleted only after the parts
        write commits, so a crash mid-migration is always detectable.
        """
        if dataset_nonempty(spark, parts_path):
            raise LensError(
                f"neardup_incremental: index at {index_path!r} has BOTH "
                "a legacy bands/+sigs/ layout and a parts/ dataset — "
                "likely a crashed migration. Inspect and delete one "
                "layout, then retry.")
        # Either leg may be absent (a crash can leave sigs/ without
        # bands/ or vice versa) — migrate whichever exists; the
        # has-legacy probe already guaranteed at least one is nonempty.
        payload = None
        if dataset_nonempty(spark, f"{index_path}/bands"):
            legacy_bands = spark.read.parquet(f"{index_path}/bands")
            payload = (
                legacy_bands.select(
                    F.col(id_col), F.col("band_hash"),
                    F.lit(None).cast("array<bigint>").alias("sig"),
                    F.lit("bands").alias("kind"),
                    F.pmod(F.xxhash64(F.col("band_hash")),
                           F.lit(INDEX_PROBE_BUCKETS)).alias("pb")))
        if dataset_nonempty(spark, f"{index_path}/sigs"):
            legacy_sigs = spark.read.parquet(f"{index_path}/sigs")
            sigs_part = (legacy_sigs.select(
                    F.col(id_col),
                    F.lit(None).cast("string").alias("band_hash"),
                    F.col("sig"), F.lit("sigs").alias("kind"),
                    F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                           F.lit(INDEX_PROBE_BUCKETS)).alias("pb")))
            payload = (sigs_part if payload is None
                       else payload.unionByName(sigs_part))
        payload.write.mode("append").partitionBy("kind", "pb") \
            .parquet(parts_path)
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(parts_path).getFileSystem(
            spark._jsc.hadoopConfiguration())
        for leg in ("bands", "sigs"):
            fs.delete(jvm.org.apache.hadoop.fs.Path(f"{index_path}/{leg}"),
                      True)

    # ONE signature pass for the whole batch: the shingle→md5
    # explode+groupBy is the dominant cost, and everything below —
    # within-batch bands, estimate verify, corpus join, index append —
    # derives from it. Lazy localCheckpoint, not persist(): the caller's
    # own action on the returned (lazy) result ALSO re-reads sig, and a
    # persist would have to be released before return (recomputing the
    # whole signature pipeline per downstream leg) or leak for the
    # session. Checkpoint blocks are freed by the ContextCleaner when
    # the result goes out of reference. (Blocks are executor-local and
    # unreplicated — an executor loss fails the job rather than
    # recomputing; acceptable, the ingest batch is the retryable unit.)
    sig = minhash_signature(df, id_col, text_col, num_hashes=num_hashes,
                            ngram=ngram, shingle=shingle) \
        .localCheckpoint(eager=False)
    sig_arr_all = sig.select(
        F.col(id_col),
        F.array(*[F.col(f"__h{h}") for h in range(num_hashes)]).alias("sig"))
    bands_all = sig.select(
        F.col(id_col),
        F.explode(F.array(*_band_exprs(num_hashes, band_size))
                  ).alias("band_hash"))
    est_expr = _sig_agreement(num_hashes)

    # Within-batch near-dup: band self-join → estimate verify →
    # components → drop non-representatives. The verified pair table is
    # lazily checkpointed too: the emptiness probe below and the
    # component pass both read it, and checkpoint blocks carry the
    # partial work between them.
    ba = bands_all.select(F.col(id_col).alias("id_a"), "band_hash")
    bb = bands_all.select(F.col(id_col).alias("id_b"), "band_hash")
    sa = sig_arr_all.select(F.col(id_col).alias("id_a"),
                            F.col("sig").alias("__sa"))
    sb = sig_arr_all.select(F.col(id_col).alias("id_b"),
                            F.col("sig").alias("__sb"))
    # r15 (guide §2.4/§3.1): under the operator's designed shape —
    # small batch vs large corpus, the same contract that broadcasts
    # probe_bands below by default — the within-batch LSH self-join
    # and both signature fetches broadcast their batch-sized side
    # instead of shuffling both sides by band_hash/id (measured: the
    # verify action dropped 3 shuffle stages; est-Jaccard values
    # identical). A bulk caller passes broadcast_probe=False and
    # keeps the shuffled joins.
    if broadcast_probe:
        bb, sa, sb = F.broadcast(bb), F.broadcast(sa), F.broadcast(sb)
    batch_pairs = (ba.join(bb, "band_hash")
                   .filter(F.col("id_a") < F.col("id_b"))
                   .select("id_a", "id_b").distinct())
    verified = (batch_pairs.join(sa, "id_a").join(sb, "id_b")
                .filter(est_expr >= F.lit(threshold))
                .select("id_a", "id_b")
                .localCheckpoint(eager=False))
    # Probe the VERIFIED PAIRS, not the component losers: zero pairs ⟹
    # zero losers (every pair contributes a non-min member), so a clean
    # batch — the common small-ingest case — is decided by one action
    # that materializes the lazy verify checkpoint and skips the
    # component machinery entirely. r15 (r14 verdict #4): that SAME
    # action now also yields the components — the take() fetches the
    # (threshold-bounded) pair rows, so a dup-carrying batch resolves
    # its losers driver-side without connected_components' second
    # take() job over the same checkpoint blocks; only a
    # bulk-bootstrap batch past the driver threshold pays the
    # distributed machinery.
    losers = _probe_pair_losers(verified)
    clean_batch = losers is None
    if clean_batch:
        batch = df
    else:
        # NO checkpoint on the survivors (changed in r5, measured ~30%
        # off the whole ingest+dedup query): `losers` is already
        # materialized — usually a driver-held id list — so no
        # downstream leg can re-run the verify pipeline. What the
        # legs DO re-run is this loser cut over the input scan, and
        # column pruning makes that cheap: the id-only consumers
        # (survivor cuts below, payload ids) scan just the id column,
        # and the one full-width read is the caller's own action.
        # r4's eager full-width checkpoint paid a dedicated job
        # writing every surviving row to checkpoint blocks to avoid
        # those re-scans — strictly worse on measurement.
        batch = _drop_ids(df, id_col, losers)
    # sig covers the pre-dedup batch; restrict the index side to the
    # within-batch survivors. A clean batch needs no restriction — the
    # survivors ARE the batch. r15: the survivor cut applies the SAME
    # driver-held loser list as a filter (r4–r14 semi-joined against
    # batch_ids — a broadcast-build job per leg whose build side was
    # itself the anti-joined batch scan; attaching the decision as an
    # InSet probe removes both builds and keeps every leg narrow).
    if clean_batch:
        sig_arr, bands = sig_arr_all, bands_all
    else:
        sig_arr = _drop_ids(sig_arr_all, id_col, losers)
        bands = _drop_ids(bands_all, id_col, losers)
    pb_of_band = F.pmod(F.xxhash64(F.col("band_hash")),
                        F.lit(INDEX_PROBE_BUCKETS))
    pb_of_id = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                      F.lit(INDEX_PROBE_BUCKETS))
    dup_local = None  # driver-held vs-corpus dup ids (small-batch path)
    lock = (_index_writer_lock(spark, index_path)
            if (update_index and locked) else contextlib.nullcontext())
    with lock:
        if update_index:
            _parts_pb_migration_recover(spark, parts_path)
        elif _parts_migration_leftovers(spark, parts_path):
            raise LensError(
                f"neardup_incremental: index at {index_path!r} has an "
                "interrupted bucketed-layout migration; run once with "
                "update_index=True to recover it before read-only use.")
        if _has_legacy_layout():
            if not update_index:
                raise LensError(
                    f"neardup_incremental: index at {index_path!r} uses "
                    "the legacy bands/+sigs/ layout; run once with "
                    "update_index=True to migrate it to parts/ before "
                    "read-only use.")
            _migrate_legacy_index()
        if dataset_nonempty(spark, parts_path):
            parts = spark.read.parquet(parts_path)
            if "pb" not in parts.columns:
                # pre-r6 kind-only layout: rewrite into (kind, pb) once
                if not update_index:
                    raise LensError(
                        f"neardup_incremental: index at {index_path!r} "
                        "predates the bucketed (kind, pb) layout; run "
                        "once with update_index=True to migrate it "
                        "before read-only use.")
                _migrate_parts_to_bucketed(
                    spark, parts_path,
                    F.when(F.col("kind") == "bands", pb_of_band)
                    .otherwise(pb_of_id))
                parts = spark.read.parquet(parts_path)
            # Prune the corpus probe to the pb partitions the batch's
            # own bands touch — via DYNAMIC partition pruning: pb is a
            # function of band_hash, so joining on (band_hash, pb) is
            # semantically redundant, but pb being a partition column
            # lets Spark's DPP subquery prune the index scan to the
            # batch's buckets at runtime. No driver action (an earlier
            # draft collected the distinct pbs — an extra job that
            # broke read-only mode's single-action laziness contract).
            # DPP only triggers when the filtering side is broadcast
            # (reuseBroadcastOnly), so the batch side carries an
            # explicit hint by default — the operator's designed shape
            # IS small-batch-vs-large-corpus; pass
            # broadcast_probe=False for a bulk batch too big to
            # broadcast (the probe then degrades to a full index scan,
            # which a corpus-sized batch would approach anyway).
            corpus_bands = (parts.filter(F.col("kind") == "bands")
                            .select(F.col(id_col).alias("__cid"),
                                    "band_hash",
                                    F.col("pb").alias("__pb")))
            # `__pb >= 0` is always true (pmod is non-negative) but
            # satisfies the DPP rule's likely-selective-predicate
            # requirement on the filtering side — without SOME binary
            # comparison there, PartitionPruning declines to insert
            # the subquery even for a broadcast build.
            probe_bands = (bands.withColumn("__pb", pb_of_band)
                           .filter(F.col("__pb") >= 0))
            if broadcast_probe:
                probe_bands = F.broadcast(probe_bands)
            cand = (probe_bands
                    .join(corpus_bands, ["band_hash", "__pb"])
                    .select(id_col, "__cid").distinct())
            # r15: the candidate-signature fetch is pruned to the pb
            # partitions the CANDIDATE ids hash into — the same DPP
            # idiom the band probe above uses (pb of a sigs row is a
            # pure function of its id, so joining on (__cid, __pb) is
            # semantically redundant but lets the scan skip every
            # non-candidate sigs bucket directory on disk; previously
            # this leg read EVERY sigs partition of the index per
            # batch). The candidate side carries the batch signatures
            # too and rides the join broadcast-side (batch-bounded,
            # the broadcast_probe contract), so the whole est leg
            # adds no exchange; the always-true __pb filter is the
            # DPP rule's selective-predicate requirement (see the
            # band probe above).
            corpus_sigs = (parts.filter(F.col("kind") == "sigs")
                           .select(F.col(id_col).alias("__cid"),
                                   F.col("sig").alias("__csig"),
                                   F.col("pb").alias("__pb")))
            cand_sig = (cand.join(F.broadcast(sig_arr) if broadcast_probe
                                  else sig_arr, id_col)
                        .withColumn(
                            "__pb",
                            F.pmod(F.xxhash64(F.col("__cid")
                                              .cast("string")),
                                   F.lit(INDEX_PROBE_BUCKETS)))
                        .filter(F.col("__pb") >= 0))
            if broadcast_probe:
                cand_sig = F.broadcast(cand_sig)
            est = (
                corpus_sigs.join(cand_sig, ["__cid", "__pb"])
                .withColumn("__est_j",
                            _sig_agreement(num_hashes, "sig", "__csig"))
            )
            dup_ids = (est.filter(F.col("__est_j") >= threshold)
                       .select(id_col).distinct())
            if update_index:
                # Pin the TINY dup-id set before the append, not the
                # full-width survivor rows: after this, nothing
                # downstream (the anti-join, the append payload, the
                # caller's action) reads the index parquet we're about
                # to append to. r15 (r14 verdict #4): under the
                # small-batch contract (broadcast_probe — dup_ids is
                # batch-bounded) ONE collect() replaces the eager
                # checkpoint + isEmpty pair of jobs, and the
                # driver-held local relation satisfies the same
                # no-index-read rule even more strongly; a bulk caller
                # keeps the checkpoint (a corpus-scale dup set must
                # never land on the driver).
                if broadcast_probe:
                    dup_local = [r[0] for r in dup_ids.collect()]
                    if not dup_local:
                        # Clean vs-corpus leg (the common ingest
                        # case): the cut would be a no-op — skip it
                        # so `fresh` keeps batch's (possibly
                        # checkpoint-free) plan.
                        fresh = batch
                    else:
                        fresh = _drop_ids(batch, id_col, dup_local)
                else:
                    dup_ids = dup_ids.localCheckpoint(eager=True)
                    if dup_ids.isEmpty():
                        fresh = batch
                    else:
                        fresh = batch.join(dup_ids, id_col,
                                           "left_anti")
            else:
                # Read-only call: no append, so no index-file hazard —
                # the checkpoint job and the emptiness probe buy
                # nothing. Leave the anti-join lazy; the caller's one
                # action computes the whole pipeline in one job (the
                # dup-id side is batch-bounded, so it broadcasts under
                # the same small-batch contract as the probes; AQE
                # handled it at runtime before, but the hint keeps the
                # initial plan sort-free too).
                fresh = batch.join(
                    F.broadcast(dup_ids) if broadcast_probe
                    else dup_ids, id_col, "left_anti")
        else:
            fresh = batch
        if update_index:
            if fresh is batch:
                # No vs-corpus dups: bands/sig_arr already cover exactly
                # the surviving ids — a survivor cut would be an
                # identity pass.
                out_bands, out_sigs = bands, sig_arr
            elif dup_local is not None:
                # r15: the vs-corpus dup ids are driver-held — cut the
                # append payload with the same InSet filter as `fresh`
                # (dup_local ⊆ batch ids, and bands/sig_arr already
                # hold only batch survivors), where the fresh_ids
                # semi-joins paid a broadcast-build job per leg.
                out_bands = _drop_ids(bands, id_col, dup_local)
                out_sigs = _drop_ids(sig_arr, id_col, dup_local)
            else:
                fresh_ids = fresh.select(id_col)
                out_bands = bands.join(fresh_ids, id_col, "left_semi")
                out_sigs = sig_arr.join(fresh_ids, id_col, "left_semi")
            payload = (
                out_bands
                .select(F.col(id_col), F.col("band_hash"),
                        F.lit(None).cast("array<bigint>").alias("sig"),
                        F.lit("bands").alias("kind"),
                        pb_of_band.alias("pb"))
                .unionByName(
                    out_sigs
                    .select(F.col(id_col),
                            F.lit(None).cast("string").alias("band_hash"),
                            F.col("sig"),
                            F.lit("sigs").alias("kind"),
                            pb_of_id.alias("pb")))
            )
            # One exchange of the narrow payload so each append commits
            # exactly ONE file per touched (kind, pb) directory — a
            # partitioned write from T tasks otherwise lands up to
            # T × buckets files per batch (measured 2× on the benched
            # ingest), and file-count, not bytes, is what the pruned
            # probe pays for. compact_index remains the deep-clean.
            payload.repartition(F.col("kind"), F.col("pb")) \
                .write.mode("append").partitionBy("kind", "pb") \
                .parquet(parts_path)
    return fresh


@register_lens("neardup_incremental")
def neardup_incremental_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: index (path), id, column (text), num_hashes, ngram,
    band_size, threshold, shingle, update_index (true)."""
    index_path = str(require_arg(arguments, "index", "neardup_incremental"))
    id_col = str(require_arg(arguments, "id", "neardup_incremental"))
    text_col = str(require_arg(arguments, "column", "neardup_incremental"))
    return Lens("neardup_incremental", arguments, lambda df: neardup_incremental(
        df, index_path, id_col, text_col,
        num_hashes=int(arguments.get("num_hashes", 16)),
        ngram=int(arguments.get("ngram", 3)),
        band_size=int(arguments.get("band_size", 4)),
        threshold=float(arguments.get("threshold", 0.5)),
        shingle=str(arguments.get("shingle", "word")),
        update_index=bool(arguments.get("update_index", True))))


def embedding_neardup_incremental(df: DataFrame, index_path: str,
                                  id_col: str, vec_col: str, *, dim: int,
                                  threshold: float = 0.95,
                                  num_bits: int = 8, num_tables: int = 4,
                                  seed: int = 42,
                                  update_index: bool = True,
                                  locked: bool = True,
                                  broadcast_probe: bool = True) -> DataFrame:
    """Embedding-cosine near-dup of a new batch against everything
    previously accepted — the vector-surface counterpart of
    ``neardup_incremental`` (same index conventions: ONE
    kind-partitioned ``parts/`` parquet dataset, the shared exclusive
    writer lease, clean-batch short-circuits, checkpoint-before-append
    discipline). This is a persistent ANN index on plain parquet: no
    vector-database service, just files an object store already holds.

    Index rows, a few hundred bytes per accepted vector regardless of
    the caller's row width:

    - ``kind=cells``: (id, cell) — ``num_tables`` random-hyperplane
      sign-bucket cells per vector (the ann_topk kernel, seed-derived,
      no stored model); partitioned further by ``pb = pmod(cell,
      INDEX_PROBE_BUCKETS)`` so a batch's corpus probe prunes to the
      cell buckets it touches (r6 — previously every batch scanned
      the full cell index);
    - ``kind=vecs``: (id, qvec) — the int8-quantized vector. Cosine is
      scale-invariant, so the verify join needs no dequantization
      scale: cos(q·s, v) = cos(q, v). Quantization error perturbs the
      estimate by ≤ ~1% — the same estimate-verify tradeoff
      neardup_incremental makes by storing signatures instead of
      shingles (exact verify would mean storing float32 vectors: 4×
      the bytes).

    Flow per batch: (1) within-batch LSH near-dup (bucket-grouped
    blocked-matmul verify — every within-batch pair is a true
    positive); a batch with no pairs short-circuits past the component
    machinery; (2) survivors' cells join the corpus cell index — only
    cell-mates are scored, never batch × corpus; (3) candidates verify
    with exact-JVM cosine against the int8-reconstructed corpus vector;
    (4) the tiny dup-id set is eagerly checkpointed before the append
    (nothing downstream re-reads the files being appended), survivors'
    cells + int8 codes append as one write job.
    """
    check_reserved(df, {
        "__cid", "__cos", "__cq", "__pb",
    }, "embedding_neardup_incremental")
    from lens_spark.operators.similarity import _bucket_array_udf
    from lens_spark.functions.vectors import quantize_int8
    from lens_spark.sources import dataset_nonempty

    spark = df.sparkSession
    parts_path = f"{index_path}/parts"
    bucket_udf = _bucket_array_udf(dim, num_bits, num_tables, seed)

    # Within-batch near-dup (exact-verified pairs) → representatives.
    pairs = embedding_neardup_pairs(
        df.select(F.col(id_col), F.col(vec_col)), id_col, vec_col,
        method="lsh", dim=dim, threshold=threshold, num_bits=num_bits,
        num_tables=num_tables, seed=seed,
    ).select("id_a", "id_b").localCheckpoint(eager=False)
    # r15 (r14 verdict #4): one take() both probes emptiness and
    # resolves the components driver-side — see neardup_incremental.
    losers = _probe_pair_losers(pairs)
    clean_batch = losers is None
    if clean_batch:
        batch = df
    else:
        batch = _drop_ids(df, id_col, losers)

    # One narrow pass derives both index payloads for the survivors.
    base = batch.select(F.col(id_col), F.col(vec_col))
    cells = base.select(
        F.col(id_col), F.explode(bucket_udf(F.col(vec_col))).alias("cell"))

    pb_of_cell = F.pmod(F.col("cell"), F.lit(INDEX_PROBE_BUCKETS))
    pb_of_id = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                      F.lit(INDEX_PROBE_BUCKETS))
    dup_local = None  # driver-held vs-corpus dup ids (small-batch path)
    lock = (_index_writer_lock(spark, index_path)
            if (update_index and locked) else contextlib.nullcontext())
    with lock:
        if update_index:
            _parts_pb_migration_recover(spark, parts_path)
        elif _parts_migration_leftovers(spark, parts_path):
            raise LensError(
                f"embedding_neardup_incremental: index at {index_path!r} "
                "has an interrupted bucketed-layout migration; run once "
                "with update_index=True to recover it before read-only "
                "use.")
        if dataset_nonempty(spark, parts_path):
            parts = spark.read.parquet(parts_path)
            if "pb" not in parts.columns:
                # pre-r6 kind-only layout: rewrite into (kind, pb) once
                if not update_index:
                    raise LensError(
                        f"embedding_neardup_incremental: index at "
                        f"{index_path!r} predates the bucketed (kind, "
                        "pb) layout; run once with update_index=True "
                        "to migrate it before read-only use.")
                _migrate_parts_to_bucketed(
                    spark, parts_path,
                    F.when(F.col("kind") == "cells", pb_of_cell)
                    .otherwise(pb_of_id))
                parts = spark.read.parquet(parts_path)
            # Prune the corpus probe to the pb partitions the batch's
            # own cells touch — via dynamic partition pruning on the
            # redundant pb join key (pb = pmod(cell, buckets); see the
            # neardup_incremental twin comment): no driver action,
            # probe I/O scales with the batch, not the accumulated
            # corpus — the r5 full-index-scan-per-batch finding.
            corpus_cells = (parts.filter(F.col("kind") == "cells")
                            .select(F.col(id_col).alias("__cid"), "cell",
                                    F.col("pb").alias("__pb")))
            # always-true selective predicate for the DPP rule — see
            # the neardup_incremental twin comment
            probe_cells = (cells.withColumn("__pb", pb_of_cell)
                           .filter(F.col("__pb") >= 0))
            if broadcast_probe:
                probe_cells = F.broadcast(probe_cells)
            cand = (probe_cells
                    .join(corpus_cells, ["cell", "__pb"])
                    .select(id_col, "__cid").distinct())
            corpus_vecs = (parts.filter(F.col("kind") == "vecs")
                           .select(F.col(id_col).alias("__cid"),
                                   F.col("qvec").alias("__cq")))
            est = (cand.join(base, id_col).join(corpus_vecs, "__cid")
                   .withColumn("__cos", cosine_similarity(
                       F.col(vec_col),
                       F.transform(F.col("__cq"),
                                   lambda q: q.cast("double")))))
            dup_ids = (est.filter(F.col("__cos") >= float(threshold))
                       .select(id_col).distinct())
            if update_index:
                # r15: one collect replaces checkpoint + isEmpty under
                # the small-batch contract — see neardup_incremental.
                if broadcast_probe:
                    dup_local = [r[0] for r in dup_ids.collect()]
                    fresh = (batch if not dup_local
                             else _drop_ids(batch, id_col, dup_local))
                else:
                    dup_ids = dup_ids.localCheckpoint(eager=True)
                    fresh = (batch if dup_ids.isEmpty()
                             else batch.join(dup_ids, id_col,
                                             "left_anti"))
            else:
                fresh = batch.join(dup_ids, id_col, "left_anti")
        else:
            fresh = batch
        if update_index:
            if fresh is batch:
                out_base, out_cells = base, cells
            elif dup_local:
                # r15: driver-held dup ids cut the payload directly —
                # see the neardup_incremental twin comment
                out_base = _drop_ids(base, id_col, dup_local)
                out_cells = _drop_ids(cells, id_col, dup_local)
            else:
                fresh_ids = fresh.select(id_col)
                out_base = base.join(fresh_ids, id_col, "left_semi")
                out_cells = cells.join(fresh_ids, id_col, "left_semi")
            payload = (
                out_cells.select(
                    F.col(id_col), F.col("cell"),
                    F.lit(None).cast("array<tinyint>").alias("qvec"),
                    F.lit("cells").alias("kind"),
                    pb_of_cell.alias("pb"))
                .unionByName(out_base.select(
                    F.col(id_col),
                    F.lit(None).cast("bigint").alias("cell"),
                    quantize_int8(F.col(vec_col)).alias("qvec"),
                    F.lit("vecs").alias("kind"),
                    pb_of_id.alias("pb")))
            )
            # One file per touched (kind, pb) dir per append — see the
            # neardup_incremental twin comment.
            payload.repartition(F.col("kind"), F.col("pb")) \
                .write.mode("append").partitionBy("kind", "pb") \
                .parquet(parts_path)
    return fresh


@register_lens("embedding_neardup_incremental")
def embedding_neardup_incremental_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: index (path), id, vector, dim, threshold (0.95),
    num_bits (8), num_tables (4), seed (42), update_index (true)."""
    index_path = str(require_arg(arguments, "index",
                                 "embedding_neardup_incremental"))
    id_col = str(require_arg(arguments, "id", "embedding_neardup_incremental"))
    vec_col = str(require_arg(arguments, "vector",
                              "embedding_neardup_incremental"))
    dim = int(require_arg(arguments, "dim", "embedding_neardup_incremental"))
    return Lens(
        "embedding_neardup_incremental", arguments,
        lambda df: embedding_neardup_incremental(
            df, index_path, id_col, vec_col, dim=dim,
            threshold=float(arguments.get("threshold", 0.95)),
            num_bits=int(arguments.get("num_bits", 8)),
            num_tables=int(arguments.get("num_tables", 4)),
            seed=int(arguments.get("seed", 42)),
            update_index=bool(arguments.get("update_index", True))))


@register_lens("dedup_incremental")
def dedup_incremental_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: index (path), columns (optional identity cols),
    update_index (true)."""
    index_path = str(require_arg(arguments, "index", "dedup_incremental"))
    columns = arguments.get("columns")
    cols = [str(c) for c in columns] if columns else None
    update = bool(arguments.get("update_index", True))
    return Lens("dedup_incremental", arguments,
                lambda df: dedup_incremental(df, index_path, columns=cols,
                                             update_index=update))


def line_dedup(df: DataFrame, id_col: str, text_col: str, *,
               min_df: int = 2, delimiter: str = "\n",
               out: str | None = None) -> DataFrame:
    """Corpus-level boilerplate line removal (RefinedWeb/CCNet-style
    repetition cleaning): lines occurring in ≥ ``min_df`` distinct
    documents are dropped from EVERY document — navigation menus,
    cookie banners, footers. Complements document-level dedup: the
    duplicated unit is a line shared across otherwise-unique docs.

    Scale shape: posexplode lines (narrow) → df-count groupBy on the
    line's xxhash64 (agg; the exchange carries 8-byte keys, never line
    text) → left_anti join of lines against the boilerplate keys →
    per-doc reassembly ordered by original line position (one agg).
    Docs whose every line was boilerplate stay in the output with an
    empty string (left join + coalesce), preserving row count.
    """
    check_reserved(df, {"__df", "__ld_id", "__lh", "__pos"}, "line_dedup")
    import re as _re

    out = out or text_col
    split_pat = _re.escape(delimiter)
    lines = df.select(
        F.col(id_col).alias("__ld_id"),
        F.posexplode(F.split(F.col(text_col), split_pat, -1))
        .alias("__pos", "__line"),
    ).withColumn("__lh", F.xxhash64("__line"))
    boiler = (lines.groupBy("__lh")
              .agg(F.count_distinct("__ld_id").alias("__df"))
              .filter(F.col("__df") >= int(min_df))
              .select("__lh"))
    kept = lines.join(boiler, "__lh", "left_anti")
    return reassemble_by_position(df, id_col, kept, key="__ld_id",
                                  pos="__pos", seg="__line",
                                  delimiter=delimiter, out=out)


def sentence_dedup(df: DataFrame, id_col: str, text_col: str, *,
                   min_df: int = 2, out: str | None = None) -> DataFrame:
    """Corpus-level boilerplate SENTENCE removal: sentences occurring
    in ≥ ``min_df`` distinct documents are dropped from every document
    — the sentence-granular sibling of :func:`line_dedup` for corpora
    whose boilerplate ("All rights reserved.", share-this prompts)
    flows inside paragraphs rather than on its own lines. Boundary
    rule = ``sentence_split``'s engine-portable regex; rebuilt text
    joins surviving sentences with a single space.

    Same scale shape as line_dedup: sentence explode (narrow) →
    df-count groupBy on xxhash64(sentence) (8-byte exchange keys,
    never sentence text) → left_anti → one reassembly agg (the shared
    ``reassemble_by_position`` contract). Fully-boilerplate docs keep
    their row as "".
    """
    check_reserved(df, {"__df", "__sd_id", "__sh"}, "sentence_dedup")
    from lens_spark.operators.text import sentence_split

    out = out or text_col
    sents = (sentence_split(df.select(F.col(id_col), F.col(text_col)),
                            id_col, text_col,
                            out_idx="__pos", out="__sent")
             .select(F.col(id_col).alias("__sd_id"), "__pos", "__sent")
             .withColumn("__sh", F.xxhash64("__sent")))
    boiler = (sents.groupBy("__sh")
              .agg(F.count_distinct("__sd_id").alias("__df"))
              .filter(F.col("__df") >= int(min_df))
              .select("__sh"))
    kept = sents.join(boiler, "__sh", "left_anti")
    return reassemble_by_position(df, id_col, kept, key="__sd_id",
                                  pos="__pos", seg="__sent",
                                  delimiter=" ", out=out)


@register_lens("sentence_dedup")
def sentence_dedup_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), min_df (2), out (default:
    overwrite column)."""
    id_col = str(require_arg(arguments, "id", "sentence_dedup"))
    text_col = str(require_arg(arguments, "column", "sentence_dedup"))
    return Lens("sentence_dedup", arguments, lambda df: sentence_dedup(
        df, id_col, text_col,
        min_df=int(arguments.get("min_df", 2)),
        out=(str(arguments["out"]) if arguments.get("out") else None)))


def neardup_against(df: DataFrame, reference: DataFrame, id_col: str,
                    text_col: str, *, ref_id_col: str | None = None,
                    ref_text_col: str | None = None, num_hashes: int = 16,
                    ngram: int = 3, band_size: int = 4,
                    threshold: float = 0.5, shingle: str = "word",
                    mode: str = "pairs") -> DataFrame:
    """Cross-corpus MinHash near-dup: documents of ``df`` that are
    near-duplicates of ANY document in ``reference`` — the fuzzy
    counterpart of ``decontaminate`` (exact n-gram overlap misses
    paraphrased or lightly-edited benchmark contamination; MinHash
    similarity catches it), and the batch analogue of
    ``neardup_incremental``'s vs-corpus leg with an in-memory
    reference instead of an on-disk index.

    ``mode="pairs"``: (id_a from df, id_b from reference, est_jaccard).
    ``mode="drop"``: df rows whose best match clears ``threshold`` are
    removed (fuzzy decontamination).

    Scale shape: one signature pass per side (the df side's estimator
    is the same ``1/sqrt(num_hashes)``-stderr agreement fraction the
    incremental index uses) → band equi-join df-bands × ref-bands
    (never df × reference) → estimate verify → distinct. Exchanges
    carry band hashes and signatures, never text.
    """
    check_reserved(df, {"__sa", "__sb"}, "neardup_against")
    check_reserved(reference, {"__sa", "__sb"}, "neardup_against")
    rid = ref_id_col or id_col
    rtext = ref_text_col or text_col
    sig_a = minhash_signature(df, id_col, text_col, num_hashes=num_hashes,
                              ngram=ngram, shingle=shingle) \
        .localCheckpoint(eager=False)
    sig_b = minhash_signature(reference, rid, rtext, num_hashes=num_hashes,
                              ngram=ngram, shingle=shingle) \
        .localCheckpoint(eager=False)
    band_arr = F.array(*_band_exprs(num_hashes, band_size))
    ba = sig_a.select(F.col(id_col).alias("id_a"),
                      F.explode(band_arr).alias("band_hash"))
    bb = sig_b.select(F.col(rid).alias("id_b"),
                      F.explode(band_arr).alias("band_hash"))
    cand = ba.join(bb, "band_hash").select("id_a", "id_b").distinct()
    sa = sig_a.select(
        F.col(id_col).alias("id_a"),
        F.array(*[F.col(f"__h{h}") for h in range(num_hashes)]).alias("__sa"))
    sb = sig_b.select(
        F.col(rid).alias("id_b"),
        F.array(*[F.col(f"__h{h}") for h in range(num_hashes)]).alias("__sb"))
    est = _sig_agreement(num_hashes)
    pairs = (cand.join(sa, "id_a").join(sb, "id_b")
             .withColumn("est_jaccard", F.round(est, 6))
             .filter(F.col("est_jaccard") >= float(threshold))
             .select("id_a", "id_b", "est_jaccard"))
    if mode == "pairs":
        return pairs
    if mode == "drop":
        hit = pairs.select(F.col("id_a").alias(id_col)).distinct()
        return df.join(hit, id_col, "left_anti")
    raise LensError(f"neardup_against: unknown mode {mode!r}")


@register_lens("neardup_against")
def neardup_against_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: reference (parquet path), id, column, ref_id /
    ref_column (default same), num_hashes (16), ngram (3),
    band_size (4), threshold (0.5), shingle ("word"),
    mode ("drop" | "pairs")."""
    ref_path = str(require_arg(arguments, "reference", "neardup_against"))
    id_col = str(require_arg(arguments, "id", "neardup_against"))
    text_col = str(require_arg(arguments, "column", "neardup_against"))

    def fwd(df: DataFrame) -> DataFrame:
        reference = df.sparkSession.read.parquet(ref_path)
        return neardup_against(
            df, reference, id_col, text_col,
            ref_id_col=arguments.get("ref_id"),
            ref_text_col=arguments.get("ref_column"),
            num_hashes=int(arguments.get("num_hashes", 16)),
            ngram=int(arguments.get("ngram", 3)),
            band_size=int(arguments.get("band_size", 4)),
            threshold=float(arguments.get("threshold", 0.5)),
            shingle=str(arguments.get("shingle", "word")),
            mode=str(arguments.get("mode", "drop")))

    return Lens("neardup_against", arguments, fwd)


def winnow_fingerprints(df: DataFrame, id_col: str, text_col: str, *,
                        k: int = 4, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003,
    the MOSS scheme): hash every k-token gram, slide a window of
    ``window`` consecutive gram hashes, keep the minimum of each
    window, emit the distinct picks as (id, fp) rows. Guarantee: two
    documents sharing any run of ≥ window+k−1 tokens share ≥1
    fingerprint — local-substring dup detection at a fraction of the
    full shingle set's size (expected density 2/(window+1)), the
    standard plagiarism/boilerplate primitive between dup_span_stats
    (exhaustive spans) and minhash (whole-doc similarity).

    Scale shape: fingerprint selection is one NARROW projection (array
    ops per row — gram hashes, per-window minima, distinct); only the
    selected ~2n/(window+1) 8-byte fingerprints ever explode into
    rows. Downstream dup detection is a df-count or self-join on fp —
    the exchanges carry (id, fp) only. Hashes are md5-derived 32-bit
    ints so the DuckDB oracle reproduces them exactly.
    """
    check_reserved(df, {"__wf_h", "__wf_tk"}, "winnow_fingerprints")
    toks = tokens(F.col(text_col))
    m = F.size(F.col("__wf_tk"))
    gram_hashes = F.transform(
        F.sequence(F.lit(1), m - F.lit(k - 1)),
        lambda i: F.conv(
            F.substring(
                F.md5(F.concat_ws(" ", F.slice(F.col("__wf_tk"), i, k))),
                1, 8), 16, 10).cast("bigint"))
    picks = F.array_distinct(F.transform(
        F.sequence(F.lit(1), F.size(F.col("__wf_h")) - F.lit(window - 1)),
        lambda j: F.array_min(F.slice(F.col("__wf_h"), j, window))))
    return (
        ensure_parallelism(df, by=[id_col])
        .select(F.col(id_col), toks.alias("__wf_tk"))
        .filter(F.size(F.col("__wf_tk")) >= k + window - 1)
        .select(F.col(id_col), gram_hashes.alias("__wf_h"))
        .select(F.col(id_col), F.explode(picks).alias("fp"))
    )


@register_lens("winnow_fingerprints")
def winnow_fingerprints_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), k (4), window (4)."""
    id_col = str(require_arg(arguments, "id", "winnow_fingerprints"))
    text_col = str(require_arg(arguments, "column", "winnow_fingerprints"))
    return Lens("winnow_fingerprints", arguments,
                lambda df: winnow_fingerprints(
                    df, id_col, text_col,
                    k=int(arguments.get("k", 4)),
                    window=int(arguments.get("window", 4))))


def winnow_pairs(df: DataFrame, id_col: str, text_col: str, *,
                 k: int = 4, window: int = 4, min_shared: int = 2,
                 max_df: int | None = None) -> DataFrame:
    """Local-substring near-dup candidate pairs: documents sharing ≥
    ``min_shared`` winnowing fingerprints, with the shared count —
    the actionable layer over ``winnow_fingerprints`` (MinHash finds
    whole-doc similarity; this finds docs sharing substantial VERBATIM
    passages even when globally dissimilar — quote farms, templated
    articles, licence blocks).

    Scale shape: inverted-index self-join on the fingerprint (8-byte
    keys, same shape as ngram_jaccard_pairs) → per-pair count (agg).
    ``max_df`` drops fingerprints present in more than that many docs
    before the join — a universal boilerplate passage is the skew
    hazard (df² /2 pairs); cutting it loses only pairs whose overlap
    is entirely that boilerplate.
    """
    check_reserved(df, {"__df"}, "winnow_pairs")
    fps = winnow_fingerprints(df, id_col, text_col, k=k, window=window) \
        .localCheckpoint(eager=False)
    if max_df is not None:
        dfreq = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("__df"))
        fps = fps.join(dfreq.filter(F.col("__df") <= int(max_df)), "fp") \
            .drop("__df")
    a = fps.select(F.col(id_col).alias("id_a"), "fp")
    b = fps.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= int(min_shared))
    )


@register_lens("winnow_pairs")
def winnow_pairs_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), k (4), window (4), min_shared (2),
    max_df (optional df-cut)."""
    id_col = str(require_arg(arguments, "id", "winnow_pairs"))
    text_col = str(require_arg(arguments, "column", "winnow_pairs"))
    md = arguments.get("max_df")
    return Lens("winnow_pairs", arguments, lambda df: winnow_pairs(
        df, id_col, text_col,
        k=int(arguments.get("k", 4)),
        window=int(arguments.get("window", 4)),
        min_shared=int(arguments.get("min_shared", 2)),
        max_df=int(md) if md is not None else None))


def span_dedup(df: DataFrame, id_col: str, text_col: str, *,
               span: int = 8, min_df: int = 2,
               out: str | None = None) -> DataFrame:
    """Remove corpus-duplicated token spans from every document — the
    rewrite counterpart of ``dup_span_stats`` (which only scores), and
    the token-granular Spark shape of exact-substring dedup
    ("Deduplicating Training Data Makes Language Models Better": cut
    the duplicated substring, keep the unique remainder). ``line_dedup``
    is the special case where the duplicated unit is a whole line; this
    handles boilerplate that flows through line breaks (inlined terms
    blocks, templated sentences, licence paragraphs).

    A token position is removed when ANY ``span``-token window covering
    it occurs in ≥ ``min_df`` distinct documents (df counts documents,
    not occurrences — within-doc repetition is repetition_stats'
    concern). Remaining tokens reassemble in original order, joined by
    single spaces — output text is whitespace-normalized (same contract
    as the tokenizer). Docs shorter than ``span`` tokens pass through
    (normalized); fully-duplicated docs become "" but keep their row.

    Span matching is case-insensitive (lowercased span hash); kept
    tokens preserve original case.

    Scale shape: positional span hashes (narrow transform over the
    token array) → df-count groupBy on xxhash64 (agg; 8-byte keys) →
    join of starts against duplicated keys → duplicated STARTS gathered
    per doc (one agg; ids + ints only) → doc-level join back onto the
    tokenized table → covered positions expanded, removed, and the text
    rebuilt entirely with array expressions (flatten/sequence →
    array_except over the position range — hash-set, O(tokens) per doc
    — → element_at gather, all order-preserving). Token text never
    crosses a token-granular exchange: the earlier shape anti-joined
    every (id, pos, token) row against the covered set and re-sorted
    them in a reassembly agg — two full-corpus exchanges carrying
    token text, vs none here (text moves only through the two
    doc-level joins), measured ~35% faster at sf0.1.
    """
    check_reserved(df, {
        "__df", "__ds", "__ra_clean", "__sd_id", "__start", "__tk",
    }, "span_dedup")
    out = out or text_col
    toks_expr = tokens(F.col(text_col), lowercase=False)
    # Lazy checkpoint: the tokenized table feeds BOTH the span-start leg
    # (hashing every w-slice) and the final rebuild leg — without it
    # each leg re-scans the text and re-tokenizes (measured ~20% on the
    # whole query at sf0.1). Blocks are freed by the ContextCleaner.
    base = ensure_parallelism(df, by=[id_col]).select(
        F.col(id_col).alias("__sd_id"), toks_expr.alias("__tk")) \
        .localCheckpoint(eager=False)
    # (doc, 0-based start, span hash); 0-based start s covers 1-based
    # token positions s+1 .. s+span.
    starts = base.select(
        "__sd_id",
        F.posexplode(
            F.when(
                F.size("__tk") >= span,
                F.transform(
                    F.sequence(F.lit(1), F.size("__tk") - F.lit(span - 1)),
                    lambda i: F.xxhash64(
                        F.lower(F.concat_ws(" ", F.slice("__tk", i, span))))))
            .otherwise(F.array().cast("array<bigint>"))
        ).alias("__start", "__sh"))
    dup_keys = (starts.groupBy("__sh")
                .agg(F.count_distinct("__sd_id").alias("__df"))
                .filter(F.col("__df") >= int(min_df))
                .select("__sh"))
    dup_starts = (starts.join(dup_keys, "__sh")
                  .groupBy("__sd_id")
                  .agg(F.collect_set("__start").alias("__ds")))
    covered = F.array_distinct(F.flatten(F.transform(
        "__ds", lambda s: F.sequence(s + 1, s + span))))
    rebuilt = F.concat_ws(" ", F.transform(
        F.array_except(F.sequence(F.lit(1), F.size("__tk")), covered),
        lambda p: F.element_at("__tk", p)))
    clean = (base.join(dup_starts, "__sd_id", "left")
             .select("__sd_id",
                     F.when(F.col("__ds").isNull(),
                            F.concat_ws(" ", "__tk"))
                     .otherwise(rebuilt).alias("__ra_clean")))
    joined = df.join(clean, df[id_col] == clean["__sd_id"], "left")
    return joined.withColumn(
        out, F.coalesce(F.col("__ra_clean"), F.lit(""))
    ).drop("__sd_id", "__ra_clean")


@register_lens("span_dedup")
def span_dedup_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), span (8), min_df (2),
    out (default in-place)."""
    id_col = str(require_arg(arguments, "id", "span_dedup"))
    text_col = str(require_arg(arguments, "column", "span_dedup"))
    out = arguments.get("out")
    return Lens("span_dedup", arguments, lambda df: span_dedup(
        df, id_col, text_col,
        span=int(arguments.get("span", 8)),
        min_df=int(arguments.get("min_df", 2)),
        out=str(out) if out else None))


@register_lens("line_dedup")
def line_dedup_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (text), min_df (2), delimiter (newline),
    out (default in-place)."""
    id_col = str(require_arg(arguments, "id", "line_dedup"))
    text_col = str(require_arg(arguments, "column", "line_dedup"))
    out = arguments.get("out")
    return Lens("line_dedup", arguments, lambda df: line_dedup(
        df, id_col, text_col,
        min_df=int(arguments.get("min_df", 2)),
        delimiter=str(arguments.get("delimiter", "\n")),
        out=str(out) if out else None))


# --- lens registrations -------------------------------------------------

@register_lens("dedup_exact")
def dedup_exact_lens(arguments: Mapping[str, Any]) -> Lens:
    columns = arguments.get("columns")
    cols = [str(c) for c in columns] if columns else None
    return Lens("dedup_exact", arguments, lambda df: exact_dedup(df, cols))


@register_lens("dedup_minhash")
def dedup_minhash_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id (col), column (text col), num_hashes, ngram,
    band_size, threshold, mode ("pairs" | "dedup")."""
    id_col = str(require_arg(arguments, "id", "dedup_minhash"))
    text_col = str(require_arg(arguments, "column", "dedup_minhash"))
    kwargs = dict(
        num_hashes=int(arguments.get("num_hashes", 16)),
        ngram=int(arguments.get("ngram", 3)),
        band_size=int(arguments.get("band_size", 4)),
        threshold=arguments.get("threshold"),
        max_bucket=arguments.get("max_bucket"),
        shingle=str(arguments.get("shingle", "word")),
    )
    mode = str(arguments.get("mode", "dedup"))
    if mode == "pairs":
        return Lens("dedup_minhash", arguments,
                    lambda df: neardup_pairs(df, id_col, text_col, **kwargs))
    return Lens("dedup_minhash", arguments,
                lambda df: dedup_neardup(df, id_col, text_col, **kwargs))


@register_lens("simhash")
def simhash_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column (text col), out (default "simhash")."""
    text_col = str(require_arg(arguments, "column", "simhash"))
    out = str(arguments.get("out", "simhash"))
    return Lens("simhash", arguments,
                lambda df: df.withColumn(out, simhash60(tokens(F.col(text_col)))))


def decontaminate(df: DataFrame, benchmark: DataFrame, id_col: str,
                  text_col: str, *, bench_text_col: str | None = None,
                  ngram: int = 8, min_overlaps: int = 1,
                  shingle: str = "word") -> DataFrame:
    """Benchmark decontamination: drop documents sharing ≥
    ``min_overlaps`` distinct ``ngram``-grams with any benchmark text.

    The standard guard against train/test leakage when assembling LLM
    training corpora (word 8-gram overlap is the common rule; tighten
    ``ngram`` / raise ``min_overlaps`` per benchmark size).

    Scale shape: the benchmark n-gram set is hashed to 8-byte keys and
    deduplicated — typically a few million rows regardless of corpus
    size, so the semi-join broadcasts. The corpus side is a narrow
    explode; the only wide ops are the per-doc overlap count (map-side
    combined) and the final anti-join on id. Never corpus × benchmark.
    """
    check_reserved(df, {"__g", "__gh", "__hits"}, "decontaminate")
    check_reserved(benchmark, {"__g", "__gh", "__hits"}, "decontaminate")
    grams = _shingles(text_col, ngram, shingle)
    bench_grams = _bench_gram_hashes(
        benchmark, bench_text_col or text_col, ngram, shingle)
    doc_grams = ensure_parallelism(df, by=[id_col]).select(
        F.col(id_col), F.explode(grams).alias("__g")
    ).select(F.col(id_col), F.xxhash64(F.col("__g")).alias("__gh"))
    contaminated = (
        doc_grams.join(bench_grams, "__gh", "left_semi")
        .groupBy(id_col).agg(F.count(F.lit(1)).alias("__hits"))
        .filter(F.col("__hits") >= min_overlaps)
        .select(id_col)
    )
    return df.join(contaminated, id_col, "left_anti")


def _bench_gram_hashes(benchmark: DataFrame, text_col: str, ngram: int,
                       shingle: str) -> DataFrame:
    """Distinct xxhash64 n-gram keys of a benchmark table — the shared
    build side of the decontamination family (exact / bloom / stream)."""
    return (benchmark.select(
                F.explode(_shingles(text_col, ngram, shingle)).alias("__g"))
            .select(F.xxhash64(F.col("__g")).alias("__gh")).distinct())


def _collect_bench_gram_hashes(bench_grams: DataFrame,
                               max_driver_grams: int, op_name: str):
    """Driver-side int64 hash array with the bounded-collect guard
    (loud refusal beyond ``max_driver_grams`` instead of a silent
    driver OOM)."""
    arr = (bench_grams.limit(max_driver_grams + 1).toPandas()["__gh"]
           .to_numpy(dtype=np.int64))
    if len(arr) > max_driver_grams:
        raise LensError(
            f"{op_name}: benchmark gram set exceeds "
            f"max_driver_grams={max_driver_grams}; shard the benchmark or "
            f"use decontaminate()")
    return arr


BLOOM_HASH_SCHEME = "km-fmix64"
"""Versions the (base, stride) derivation baked into every persisted
``bloom_bitset`` artifact. ``bloom_decontaminate_saved`` refuses an
artifact whose scheme doesn't match the probe kernel in this build —
probing a bitset with a different derivation silently mis-filters."""


def _bloom_stride(h: "np.ndarray") -> "np.ndarray":
    """Second Kirsch-Mitzenmacher hash for the bloom probe sequence —
    murmur3's fmix64 of the gram hash, forced odd. THE one derivation
    shared by build and probe (a private copy drifting is the
    silent-miss bug class).

    Why fmix64 and not ``h * odd_const | 1``: the probe index is taken
    mod a power-of-two ``m``, and mod-2^64 multiplication is CLOSED on
    the low bits — with the multiplicative stride, base AND stride
    (hence the entire k-probe arithmetic progression) depended only on
    ``h mod m``, so any corpus gram sharing its low log2(m) bits with
    any bench gram was a guaranteed false positive: effective fp
    ≈ n/m per gram, independent of k, ~1%/gram at check scale instead
    of the designed 0.62^k (caught r11 when s8_saved_bloom's exact
    oracle flagged systematic over-drops; ``bloom_decontaminate``'s
    confirm join had been absorbing the same defect as pure probe-side
    waste). fmix64's xor-shift-multiply rounds pull high bits into the
    low word, so (h mod m, stride mod m) behave as an approximately
    pairwise-independent pair and the standard K-M bound applies.
    """
    x = h.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x | np.uint64(1)


def _build_bloom_bitset(hashes: "np.ndarray", bits_per_gram: int
                        ) -> "tuple[np.ndarray, int, int]":
    """Build the Bloom bitset over uint64 gram hashes: power-of-two
    ``m_bits`` sized at ``bits_per_gram`` per distinct gram, optimal
    probe count, Kirsch-Mitzenmacher double hashing (stride via the
    shared ``_bloom_stride`` fmix64 — see its derivation note).
    Returns ``(bitset bytes-array, m_bits, k_probes)`` — the whole
    serializable filter state (persisted as a ``bloom_bitset``
    registry artifact by ``lens_spark.models.save_bloom``, r10)."""
    import math

    n = max(len(hashes), 1)
    m_bits = 1 << max(int(math.ceil(math.log2(n * bits_per_gram))), 6)
    k_probes = max(1, round(0.6931 * m_bits / n))
    bitset = np.zeros(m_bits >> 3, dtype=np.uint8)
    h2 = _bloom_stride(hashes)
    for i in range(k_probes):
        idx = (hashes + np.uint64(i) * h2) & np.uint64(m_bits - 1)
        np.bitwise_or.at(bitset, (idx >> np.uint64(3)).astype(np.int64),
                         np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8))
    return bitset, m_bits, k_probes


def _bloom_might_contain_udf(spark, bitset: "np.ndarray", m_bits: int,
                             k_probes: int):
    """Arrow-batched membership kernel over xxhash64 gram columns —
    the bitset ships once per executor as a spark broadcast, probes
    are vectorized numpy (k dependent bit-probes via double hashing;
    K-M correlation is safe for bloom probes by design, unlike the
    minhash family — dedup.py:106-112)."""
    bc = spark.sparkContext.broadcast(bitset)
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain(s: pd.Series) -> pd.Series:
        bits = bc.value
        h = s.to_numpy(dtype=np.int64, copy=False).view(np.uint64)
        hh2 = _bloom_stride(h)
        hit = np.ones(len(h), dtype=bool)
        for i in range(k_probes):
            idx = (h + np.uint64(i) * hh2) & np.uint64(m_bits - 1)
            byte = bits[(idx >> np.uint64(3)).astype(np.int64)]
            hit &= (byte >> (idx & np.uint64(7)).astype(np.uint8)) & 1 > 0
        return pd.Series(hit)

    return might_contain


def bloom_decontaminate_saved(df: DataFrame, model: "Mapping[str, Any]",
                              id_col: str, text_col: str, *,
                              min_overlaps: int = 1) -> DataFrame:
    """Decontaminate against a SAVED ``bloom_bitset`` registry artifact
    (``lens_spark.models.save_bloom``, r10) — the fit-once/apply-many
    form: the recurring corpus job never scans the benchmark suite at
    all; it broadcasts the prebuilt bitset and filters in one narrow
    pass + one per-doc count.

    Contract difference vs ``bloom_decontaminate`` (documented, not
    hidden): there is NO exact confirm join (the benchmark grams are
    not available), so the drop set is the bloom's: every truly
    contaminated doc is dropped (no false negatives by construction),
    plus ~fp-rate extra gram hits (≈0.4% per gram at the default 12
    bits/gram) that can push clean borderline docs over
    ``min_overlaps``. Decontamination is exactly the place where that
    direction of error is acceptable — keep-contaminated is the
    failure mode that poisons an eval, drop-a-few-extra is noise.
    Gram length, shingle mode, and tokenization all come from the
    MODEL (fitting one way and probing another is the silent-miss
    bug), like ``token_vocab``'s stored lowercase flag.
    """
    check_reserved(df, {"__g", "__gh", "__hits"}, "bloom_decontaminate_saved")
    scheme = model.get("hash_scheme")
    if scheme != BLOOM_HASH_SCHEME:
        raise LensError(
            f"bloom_bitset artifact was built with probe-hash scheme "
            f"{scheme!r} but this build probes with "
            f"{BLOOM_HASH_SCHEME!r} — probing across schemes silently "
            "mis-filters; rebuild the artifact with save_bloom.")
    m_bits = int(model["m_bits"])
    k_probes = int(model["k_probes"])
    ngram = int(model["ngram"])
    shingle = str(model["shingle"])
    import base64

    bitset = np.frombuffer(
        base64.b64decode(str(model["bitset_b64"])), dtype=np.uint8)
    if len(bitset) != m_bits >> 3:
        raise LensError(
            f"bloom_bitset artifact is corrupt: bitset holds "
            f"{len(bitset)} bytes, m_bits={m_bits} needs {m_bits >> 3}")
    might_contain = _bloom_might_contain_udf(df.sparkSession, bitset,
                                             m_bits, k_probes)
    grams = _shingles(text_col, ngram, shingle)
    doc_grams = ensure_parallelism(df, by=[id_col]).select(
        F.col(id_col), F.explode(grams).alias("__g")
    ).select(F.col(id_col), F.xxhash64(F.col("__g")).alias("__gh"))
    contaminated = (
        doc_grams.filter(might_contain(F.col("__gh")))
        .groupBy(id_col).agg(F.count(F.lit(1)).alias("__hits"))
        .filter(F.col("__hits") >= min_overlaps)
        .select(id_col)
    )
    return df.join(contaminated, id_col, "left_anti")


def bloom_decontaminate(df: DataFrame, benchmark: DataFrame, id_col: str,
                        text_col: str, *, bench_text_col: str | None = None,
                        ngram: int = 8, min_overlaps: int = 1,
                        shingle: str = "word", bits_per_gram: int = 12,
                        max_driver_grams: int = 50_000_000) -> DataFrame:
    """``decontaminate`` with a Bloom-filter prefilter: EXACTLY the same
    output (the filter has no false negatives and every bloom hit is
    confirmed by the exact semi-join), but the per-gram membership test
    runs against a broadcast BITSET instead of a join-side hash table.

    Why this is the 100 TB shape: the exact path broadcasts the
    benchmark gram set as 8-byte keys — fine to ~100M grams, but a
    many-benchmark suite (every eval set ever published) reaches 10⁹
    grams, where the hash relation is tens of GB per executor while the
    bloom bitset at 12 bits/gram is ~1.5 GB (fp rate ≈ 0.4% at the
    optimal probe count) — and the corpus-side gram stream shrinks by
    1/fp before the exact confirm join ever shuffles. The confirm join
    then handles only bloom survivors, so its build side stays the full
    benchmark but its probe side is ~fp · corpus_grams + true hits.

    Driver memory is bounded by ``max_driver_grams`` (the bitset is
    built driver-side from one distinct-hash scan); beyond it the
    operator refuses loudly rather than silently OOMing — at that point
    build the bitset offline and shard it, or fall back to
    ``decontaminate``.

    Membership runs as an Arrow-batched numpy kernel (k dependent
    bit-probes via double hashing, Kirsch-Mitzenmacher — safe here
    because bloom probes need k *dependent* hash functions by design,
    unlike the minhash family where K-M correlation broke row
    distinctness, dedup.py:106-112).
    """
    check_reserved(df, {"__g", "__gh", "__hits"}, "bloom_decontaminate")
    check_reserved(benchmark, {"__g", "__gh", "__hits"}, "bloom_decontaminate")
    grams = _shingles(text_col, ngram, shingle)
    # Eagerly checkpoint the distinct gram-hash set: both the driver
    # collect (bitset build) and the confirm semi-join read it, and
    # without pinning, each would recompute the full benchmark
    # explode+distinct from scratch (a second multi-minute job at the
    # 10⁹-gram target). Checkpoint blocks are freed by the
    # ContextCleaner when the returned plan drops out of reference.
    bench_grams = _bench_gram_hashes(
        benchmark, bench_text_col or text_col, ngram, shingle
    ).localCheckpoint(eager=True)
    hashes = _collect_bench_gram_hashes(
        bench_grams, max_driver_grams, "bloom_decontaminate"
    ).view(np.uint64)
    bitset, m_bits, k_probes = _build_bloom_bitset(hashes, bits_per_gram)
    might_contain = _bloom_might_contain_udf(df.sparkSession, bitset,
                                             m_bits, k_probes)

    doc_grams = ensure_parallelism(df, by=[id_col]).select(
        F.col(id_col), F.explode(grams).alias("__g")
    ).select(F.col(id_col), F.xxhash64(F.col("__g")).alias("__gh"))
    suspects = doc_grams.filter(might_contain(F.col("__gh")))
    contaminated = (
        suspects.join(bench_grams, "__gh", "left_semi")  # exact confirm
        .groupBy(id_col).agg(F.count(F.lit(1)).alias("__hits"))
        .filter(F.col("__hits") >= min_overlaps)
        .select(id_col)
    )
    return df.join(contaminated, id_col, "left_anti")


@register_lens("bloom_decontaminate")
def bloom_decontaminate_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: benchmark (path), id, column, bench_column, ngram (8),
    min_overlaps (1), shingle ("word"), bits_per_gram (12). OR apply a
    registry-persisted filter: model_id (lens1b-…) + registry loads a
    ``bloom_bitset`` artifact saved by lens_spark.models.save_bloom —
    ngram/shingle come from the MODEL; no benchmark scan, no exact
    confirm join (documented fp contract on
    ``bloom_decontaminate_saved``)."""
    id_col = str(require_arg(arguments, "id", "bloom_decontaminate"))
    text_col = str(require_arg(arguments, "column", "bloom_decontaminate"))
    model_id = arguments.get("model_id")
    if model_id is not None:
        from lens_spark.models import load_model

        reg = require_arg(arguments, "registry", "bloom_decontaminate")
        model = load_model(reg, str(model_id), expect_kind="bloom_bitset")
        return Lens(
            "bloom_decontaminate", arguments,
            lambda df: bloom_decontaminate_saved(
                df, model, id_col, text_col,
                min_overlaps=int(arguments.get("min_overlaps", 1))))
    bench_path = str(require_arg(arguments, "benchmark", "bloom_decontaminate"))

    def fwd(df: DataFrame) -> DataFrame:
        bench = df.sparkSession.read.parquet(bench_path)
        return bloom_decontaminate(
            df, bench, id_col, text_col,
            bench_text_col=arguments.get("bench_column"),
            ngram=int(arguments.get("ngram", 8)),
            min_overlaps=int(arguments.get("min_overlaps", 1)),
            shingle=str(arguments.get("shingle", "word")),
            bits_per_gram=int(arguments.get("bits_per_gram", 12)))

    return Lens("bloom_decontaminate", arguments, fwd)


def contamination_score(df: DataFrame, benchmark: DataFrame, id_col: str,
                        text_col: str, *, bench_text_col: str | None = None,
                        ngram: int = 8, shingle: str = "word",
                        out: str = "contamination") -> DataFrame:
    """Append each document's benchmark-overlap FRACTION (distinct
    n-grams shared with the benchmark / distinct n-grams in the doc) —
    the audit counterpart of ``decontaminate``: grade a corpus's
    leakage distribution before committing to a drop threshold, or
    route borderline docs for review instead of deleting them. Docs
    with fewer than ``ngram`` tokens score 0.0 and keep their row.

    Same scale shape as decontaminate: hashed distinct benchmark grams
    (a few million 8-byte keys — broadcastable), narrow corpus explode,
    per-doc counts map-side combined, one join back on id. Never
    corpus × benchmark.
    """
    check_reserved(df, {
        "__cs_id", "__g", "__gh", "__hits", "__in_bench", "__n",
    }, "contamination_score")
    check_reserved(benchmark, {
        "__cs_id", "__g", "__gh", "__hits", "__in_bench", "__n",
    }, "contamination_score")
    grams = _shingles(text_col, ngram, shingle)
    bench_grams = (
        benchmark.select(
            F.explode(_shingles(bench_text_col or text_col, ngram, shingle)
                      ).alias("__g"))
        .select(F.xxhash64(F.col("__g")).alias("__gh")).distinct()
        .withColumn("__in_bench", F.lit(1))
    )
    doc_grams = ensure_parallelism(df, by=[id_col]).select(
        F.col(id_col).alias("__cs_id"), F.explode(grams).alias("__g")
    ).select(F.col("__cs_id"), F.xxhash64(F.col("__g")).alias("__gh"))
    per_doc = (
        doc_grams.join(bench_grams, "__gh", "left")
        .groupBy("__cs_id")
        .agg(F.count(F.lit(1)).alias("__n"),
             F.sum(F.coalesce(F.col("__in_bench"), F.lit(0))).alias("__hits"))
    )
    joined = df.join(per_doc, df[id_col] == per_doc["__cs_id"], "left")
    return joined.withColumn(
        out,
        F.when(F.col("__n") > 0,
               F.round(F.col("__hits") / F.col("__n"), 6)).otherwise(F.lit(0.0))
    ).drop("__cs_id", "__n", "__hits")


@register_lens("contamination_score")
def contamination_score_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: benchmark (parquet path), id, column, bench_column
    (defaults to column), ngram (8), shingle ("word"),
    out ("contamination"). Inverse drops the score column."""
    bench_path = str(require_arg(arguments, "benchmark",
                                 "contamination_score"))
    id_col = str(require_arg(arguments, "id", "contamination_score"))
    text_col = str(require_arg(arguments, "column", "contamination_score"))
    out = str(arguments.get("out", "contamination"))

    def fwd(df: DataFrame) -> DataFrame:
        benchmark = df.sparkSession.read.parquet(bench_path)
        return contamination_score(
            df, benchmark, id_col, text_col,
            bench_text_col=arguments.get("bench_column"),
            ngram=int(arguments.get("ngram", 8)),
            shingle=str(arguments.get("shingle", "word")), out=out)

    return Lens("contamination_score", arguments, fwd,
                lambda df: df.drop(out))


def overlap_matrix(df: DataFrame, group_col: str, text_col: str, *,
                   ngram: int = 3, shingle: str = "word") -> DataFrame:
    """Cross-source n-gram containment matrix — the corpus-level
    contamination heat map (``contamination_score`` grades one doc
    against one benchmark; this grades every source against every
    other): row (a, b) reports |distinct grams of a ∩ b| / |distinct
    grams of a| as an exact micro-fraction. Diagonal rows are the
    1.0 sanity anchor; an off-diagonal spike says source a is largely
    contained in source b (a mirror, a re-crawl, a leaked benchmark).

    Scale shape: one explode → DISTINCT (group, xxhash64(gram)) —
    grams move as 8-byte hashes, never strings; ONE self-equi-join on
    the gram hash whose fan-out per gram is bounded by #groups (a
    config-scale domain, the strata contract — never corpus-scale);
    then a partial-aggregated groupBy to #groups² result rows.
    Nothing is all-pairs over rows — only over the bounded group set.
    """
    check_reserved(df, {"__g", "__gh"}, "overlap_matrix")
    if int(ngram) < 1:
        raise LensError("overlap_matrix: ngram must be >= 1")
    # Lazy localCheckpoint (r14, measured: the plan computed this
    # explode→distinct subtree THREE times — the sizes leg, and both
    # sides of the self-join carry different projections, so exchange
    # reuse never fired; guide §1.2 "don't compute things you throw
    # away"). One materialization, three column-pruned consumers —
    # the containment_pairs shingle-table idiom applied here.
    # Storage level EXPLICIT (r15, r14 verdict #8): DISK_ONLY, the
    # repo's posture for pins that scale with the corpus (the
    # clustering.py r11 precedent — "DISK_ONLY ≥ par at bench scale",
    # measured again on this query's A/B this round): the distinct
    # (src, gram-hash) table is group×distinct-gram sized, usually
    # ≪ corpus but unbounded above, and its three consumers read it
    # once each — an executor-memory pin buys nothing a sequential
    # disk read doesn't. localCheckpoint remains non-reliable (an
    # executor loss fails the query and Spark recomputes from source
    # on retry), the documented trade for truncating a 3×-replayed
    # lineage.
    from pyspark.storagelevel import StorageLevel
    grams = (ensure_parallelism(df)
             .select(F.col(group_col).cast("string").alias("src_a"),
                       F.explode(_shingles(text_col, int(ngram),
                                           str(shingle))).alias("__g"))
             .select("src_a", F.xxhash64(F.col("__g")).alias("__gh"))
             .distinct()
             .localCheckpoint(eager=False,
                              storageLevel=StorageLevel.DISK_ONLY))
    sizes = grams.groupBy("src_a").agg(
        F.count(F.lit(1)).alias("ngrams_a"))
    shared = (grams.join(grams.select(F.col("src_a").alias("src_b"),
                                      F.col("__gh")), "__gh")
              .groupBy("src_a", "src_b")
              .agg(F.count(F.lit(1)).alias("shared")))
    return (shared.join(sizes, "src_a")
            .select("src_a", "src_b", "ngrams_a", "shared",
                    F.floor(F.col("shared").cast("decimal(38,0)") * 1000000
                            / F.col("ngrams_a")).cast("bigint")
                    .alias("containment_micro")))


@register_lens("overlap_matrix")
def overlap_matrix_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: group (source column), column (text), ngram (3),
    shingle ("word")."""
    group = str(require_arg(arguments, "group", "overlap_matrix"))
    text_col = str(require_arg(arguments, "column", "overlap_matrix"))
    return Lens(
        "overlap_matrix", arguments,
        lambda df: overlap_matrix(
            df, group, text_col,
            ngram=int(arguments.get("ngram", 3)),
            shingle=str(arguments.get("shingle", "word"))))


@register_lens("decontaminate")
def decontaminate_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: benchmark (path to parquet/json of benchmark texts),
    id, column, bench_column (defaults to column), ngram (8),
    min_overlaps (1), shingle ("word")."""
    bench_path = str(require_arg(arguments, "benchmark", "decontaminate"))
    id_col = str(require_arg(arguments, "id", "decontaminate"))
    text_col = str(require_arg(arguments, "column", "decontaminate"))

    def fwd(df: DataFrame) -> DataFrame:
        benchmark = df.sparkSession.read.parquet(bench_path)
        return decontaminate(
            df, benchmark, id_col, text_col,
            bench_text_col=arguments.get("bench_column"),
            ngram=int(arguments.get("ngram", 8)),
            min_overlaps=int(arguments.get("min_overlaps", 1)),
            shingle=str(arguments.get("shingle", "word")))

    return Lens("decontaminate", arguments, fwd)
