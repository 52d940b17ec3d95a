"""Cross-engine-deterministic numeric digests (the r6-verdict #2 fix).

Problem class: an oracle value-hash over ``round(<double>, k)`` can flip
between Spark and DuckDB for two distinct reasons:

1. **Fold divergence** — the double itself is an order-dependent
   aggregate (avg/sum of irrational terms); Spark's partial sums are
   partition-ordered while DuckDB folds single-threaded, so the last
   bits differ and a value near a 0.5·10^-k boundary rounds apart.
   (This killed ``x3_embedding_outliers`` in round 6: Spark's
   sequential cosine fold vs DuckDB's vectorized
   ``list_cosine_similarity`` differed by an ulp.)
2. **Rounding-algorithm divergence** — even on a BIT-IDENTICAL double,
   ``round(x, 6)`` disagrees: Spark rounds the double's exact decimal
   expansion (BigDecimal HALF_UP) while DuckDB rounds ``x * 1e6`` with
   ``std::round`` — the product's own rounding can land on the other
   side of the half.

What IS safe cross-engine (the building blocks used here):

- any single IEEE-754 op (+ − × ÷ sqrt, casts) on bit-identical
  inputs — correctly rounded, hence bit-identical out;
- ``round(<double>)`` **to integer** — both engines round half away
  from zero on the same exact value;
- integer arithmetic (bigint / decimal(38,0) / hugeint) — exact.

Recipe, in two strengths:

- ``round6(x)`` — for an ``x`` already bit-identical across engines:
  quantize to micro-units with one multiply + one to-integer round,
  then ONE division back to double. Replaces ``round(x, 6)``.
- ``round6_mean_expr`` / ``round6_sum_expr`` — for order-dependent
  folds: quantize each term to an 11dp scaled long (term-level ulp
  noise is absorbed unless the final 6dp result sits within 10^-11 of
  a boundary — 10^5× safer than rounding the raw fold), sum exactly in
  bigint, then round to 6dp by exact integer half-away division and
  divide once. The 11→6dp margin also absorbs sub-ulp differences in
  transcendental terms (JVM ``Math.log`` vs libm are each <1 ulp but
  not correctly rounded).

Bounds: |term| ≤ ~45 (ln of any corpus-scale ratio) ⇒ scaled terms
≤ 4.5e12, so the bigint sum supports >10^6 terms per group and
``2*s`` in the division stays well under 2^63.

Every Spark helper has a ``*_sql`` DuckDB twin generated from the same
constants so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: term quantization scale (11 decimal places)
TERM_SCALE = 10**11
#: output scale (6 decimal places, "micro-units")
OUT_SCALE = 10**6
#: TERM_SCALE // OUT_SCALE — the integer divisor of the final round
_DIV = TERM_SCALE // OUT_SCALE


def round6(x: Column) -> Column:
    """6dp digest of a cross-engine bit-identical double.

    ``round(x * 1e6)`` to integer (safe: both engines round half away
    from zero on the same value) then one division back — replaces the
    algorithm-divergent ``F.round(x, 6)`` in digest columns.
    """
    return (F.round(x * F.lit(float(OUT_SCALE))).cast("bigint")
            .cast("double") / F.lit(float(OUT_SCALE)))


def round6_sql(x: str) -> str:
    """DuckDB twin of :func:`round6`."""
    return (f"CAST(CAST(round(({x}) * {float(OUT_SCALE)}) AS BIGINT) "
            f"AS DOUBLE) / {float(OUT_SCALE)}")


def scaled_term(term: Column) -> Column:
    """One term of an order-independent fold: round(term·1e11) as long
    (one multiply + one to-integer round — identical on both engines
    for identical term doubles)."""
    return F.round(term * F.lit(float(TERM_SCALE))).cast("bigint")


def scaled_term_sql(term: str) -> str:
    """DuckDB twin of :func:`scaled_term`."""
    return f"CAST(round(({term}) * {float(TERM_SCALE)}) AS BIGINT)"


def round6_mean_expr(s_col: str, n_col: str) -> str:
    """Spark SQL expr: exact 6dp half-away round of ``s/(n·1e5)``
    (the mean of 11dp scaled-long terms), emitted as a double.

    ``s_col``/``n_col`` name bigint columns produced by
    ``sum(scaled_term(t))`` and ``count(*)`` aggregates. All arithmetic
    is integral (``div``) until the single final division.
    """
    d = _DIV
    return (
        f"CAST(CASE WHEN ({s_col}) >= 0 "
        f"THEN (2*({s_col}) + {d}*({n_col})) div (2*{d}*({n_col})) "
        f"ELSE -((2*(-({s_col})) + {d}*({n_col})) div (2*{d}*({n_col}))) END "
        f"AS DOUBLE) / {float(OUT_SCALE)}")


def round6_mean_sql(s: str, n: str) -> str:
    """DuckDB twin of :func:`round6_mean_expr` (``//`` = floor div —
    equivalent to ``div`` here because operands are non-negative)."""
    d = _DIV
    return (
        f"CAST(CASE WHEN {s} >= 0 "
        f"THEN (2*({s}) + {d}*({n})) // (2*{d}*({n})) "
        f"ELSE -((2*(-({s})) + {d}*({n})) // (2*{d}*({n}))) END "
        f"AS DOUBLE) / {float(OUT_SCALE)}")


def micro_term(term: Column) -> Column:
    """Recover the exact micro-unit long from a value that is already
    a 6dp digest (``micro/1e6`` double): one multiply + one to-integer
    round. Used for second-level aggregates (a mean of already-
    digested means) so the outer fold is exact integer arithmetic."""
    return F.round(term * F.lit(float(OUT_SCALE))).cast("bigint")


def micro_term_sql(term: str) -> str:
    """DuckDB twin of :func:`micro_term`."""
    return f"CAST(round(({term}) * {float(OUT_SCALE)}) AS BIGINT)"


def round6_mean_micro_expr(s_col: str, n_col: str) -> str:
    """Spark SQL expr: exact 6dp half-away round of ``s/n`` micro-units
    (the mean of micro-unit terms from :func:`micro_term`), as a
    double."""
    return (
        f"CAST(CASE WHEN ({s_col}) >= 0 "
        f"THEN (2*({s_col}) + ({n_col})) div (2*({n_col})) "
        f"ELSE -((2*(-({s_col})) + ({n_col})) div (2*({n_col}))) END "
        f"AS DOUBLE) / {float(OUT_SCALE)}")


def round6_mean_micro_sql(s: str, n: str) -> str:
    """DuckDB twin of :func:`round6_mean_micro_expr`."""
    return (
        f"CAST(CASE WHEN {s} >= 0 "
        f"THEN (2*({s}) + ({n})) // (2*({n})) "
        f"ELSE -((2*(-({s})) + ({n})) // (2*({n}))) END "
        f"AS DOUBLE) / {float(OUT_SCALE)}")


def round6_scaled_sum_expr(s_col: str) -> str:
    """Spark SQL expr: exact 6dp half-away round of ``s/1e5`` (the SUM
    of 11dp scaled-long terms), emitted as a double."""
    d = _DIV
    return (
        f"CAST(CASE WHEN ({s_col}) >= 0 "
        f"THEN (2*({s_col}) + {d}) div (2*{d}) "
        f"ELSE -((2*(-({s_col})) + {d}) div (2*{d})) END "
        f"AS DOUBLE) / {float(OUT_SCALE)}")


def round6_scaled_sum_sql(s: str) -> str:
    """DuckDB twin of :func:`round6_scaled_sum_expr`."""
    d = _DIV
    return (
        f"CAST(CASE WHEN {s} >= 0 "
        f"THEN (2*({s}) + {d}) // (2*{d}) "
        f"ELSE -((2*(-({s})) + {d}) // (2*{d})) END "
        f"AS DOUBLE) / {float(OUT_SCALE)}")
