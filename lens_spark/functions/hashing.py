"""Hash-family expressions: char shingles, MinHash, LSH bands, SimHash.

MinHash design for engine-independent determinism: the hash domain is
md5 *hex strings* and the minhash order is lexicographic — both Spark
and DuckDB implement md5 identically over UTF-8 text, so the oracle SQL
reproduces signatures bit-for-bit. Hash function *i* of a shingle *s*
is ``md5(i || ':' || s)`` (salted md5 — the classic k-permutation
approximation).

Scale notes (100 TB): all of this is a narrow projection — no shuffle —
and the LSH candidate join shuffles on the band hash, which is the
standard O(n·bands) alternative to the O(n²) similarity join. Skewed
buckets (a band shared by very many docs) are handled by AQE skew-join
splitting; callers can additionally cap bucket size before the join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def char_shingles(text: Column, n: int = 3, *, lowercase: bool = True,
                  distinct: bool = True) -> Column:
    """Character n-grams of ``text`` as an array<string> (empty if len<n)."""
    t = F.lower(text) if lowercase else text
    idx = F.sequence(F.lit(1), F.length(t) - F.lit(n - 1))
    grams = F.transform(idx, lambda i: t.substr(i, F.lit(n)))
    grams = F.when(F.length(t) >= n, grams).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams) if distinct else grams


def word_shingles(text: Column, w: int = 3, *, lowercase: bool = True) -> Column:
    """Word w-shingles (w consecutive whitespace tokens joined by ' ').

    Preferred over char n-grams for document dedup: char-gram sets
    saturate on small vocabularies (every doc looks like every other),
    while token shingles stay discriminative — the standard choice for
    web-scale near-dup (Broder shingling).
    """
    from lens_spark.functions.text import tokens

    toks = tokens(text, lowercase=lowercase)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), n - F.lit(w - 1))
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, w)))
    grams = F.when(n >= w, grams).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """array<string> of ``num_hashes`` lexicographic-min salted md5s.

    Column-level convenience for small/interactive use. The operator
    path (operators.dedup.minhash_bands) computes the same signature as
    explode → groupBy(min) instead: this nested higher-order-function
    form exceeds janino's method-size limit once composed into a larger
    plan and silently drops to interpreted eval (~50× slower), and the
    optimizer may duplicate the whole subtree across a self-join.
    """
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda h: F.array_min(
            F.transform(
                shingles,
                lambda s: F.md5(F.concat(h.cast("string"), F.lit(":"), s)),
            )
        ),
    )


def band_hashes(signature: Column, num_hashes: int, band_size: int) -> Column:
    """LSH band hashes: md5 over each ``band_size`` slice of the signature.

    Docs sharing ≥1 band hash are near-dup candidates. The band index is
    mixed into the hash so equal slices in different bands don't collide.
    """
    num_bands = num_hashes // band_size
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.md5(
            F.concat(
                b.cast("string"),
                F.lit("|"),
                F.concat_ws("|", F.slice(signature, b * band_size + 1, band_size)),
            )
        ),
    )


def jaccard_shingles(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two distinct-shingle arrays (double)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_distinct(F.concat(a, b)))
    return F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))


SIMHASH_BITS = 60
"""SimHash width: 60 bits = the top 15 hex chars of each token's md5.
60, not 64, so (a) every weight is a positive signed-bigint power of
two — no two's-complement edge case — and (b) DuckDB reproduces the
exact integers (hex parse + bit tests), making SimHash queries
oracle-checkable instead of rows-only. Hamming-similarity behavior is
unchanged; width is a parameter of the scheme."""


def simhash60(tokens_col: Column) -> Column:
    """60-bit SimHash over a token array, entirely JVM-side.

    Per bit position i: the bit is 1 iff ≥half the token hash values
    have bit i set (majority vote). Token hash = top 60 bits of md5,
    cross-engine-reproducible (DuckDB twin in __spark_entry__).
    """
    hashes = F.transform(
        tokens_col,
        lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("bigint"))
    n_tokens = F.size(hashes)

    def bit(i: int):
        ones = F.size(F.filter(hashes, lambda h: F.getbit(h, F.lit(i)) == 1))
        return F.when(ones * 2 >= n_tokens, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )

    packed = F.lit(0).cast("bigint")
    for i in range(SIMHASH_BITS):
        packed = packed + bit(i) * F.lit(1 << i).cast("bigint")
    return F.when(n_tokens > 0, packed).otherwise(F.lit(0).cast("bigint"))
