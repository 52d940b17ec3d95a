"""Lens abstraction + built-in lens registry.

A lens is a named, parameterized, optionally invertible
DataFrame→DataFrame transform — the Spark-native analogue of the
reference's WASM module with exports ``transform`` / ``inverse`` /
``set_param`` (/root/reference/README.md:23-28). ``make(params)``
plays the role of ``NewInstance(module, params)`` + one-shot
``set_param`` (/root/reference/host-go/engine/engine.go:106-112).

Built-ins are plain Catalyst transforms so the optimizer can push
filters / prune columns straight through a pipeline; the python_udf
escape hatch (operators/udf.py) covers everything else, exactly where
the reference needed WASM.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Mapping

from pyspark.sql import DataFrame

from lens_spark.errors import LensError, LensNotFoundError

Transform = Callable[[DataFrame], DataFrame]


@dataclass
class Lens:
    """An instantiated lens: forward and (optional) inverse transform."""

    name: str
    arguments: Mapping[str, Any] = field(default_factory=dict)
    forward_fn: Transform = lambda df: df
    inverse_fn: Transform | None = None
    # Iterator-level python stages are fusable (engine composes adjacent
    # ones into a single mapInPandas pass — the analogue of the
    # reference's raw-byte pipe handoff, host-go/engine/pipes/fromPipe.go).
    fusable_iter: Callable | None = None
    fusable_iter_inverse: Callable | None = None
    output_schema: Any = None

    def forward(self, df: DataFrame) -> DataFrame:
        return self.forward_fn(df)

    def inverse(self, df: DataFrame) -> DataFrame:
        if self.inverse_fn is None:
            # Mirrors the reference's missing-inverse failure
            # (tests/integration/cli/with_inverse_test.go:14-85).
            raise LensError(f"lens '{self.name}' does not define an inverse")
        return self.inverse_fn(df)


LensFactory = Callable[[Mapping[str, Any]], Lens]

_BUILTINS: dict[str, LensFactory] = {}


def register_lens(name: str) -> Callable[[LensFactory], LensFactory]:
    """Register a built-in lens factory under ``name``."""

    def deco(factory: LensFactory) -> LensFactory:
        _BUILTINS[name] = factory
        return factory

    return deco


def make_lens(name: str, arguments: Mapping[str, Any] | None = None) -> Lens:
    factory = _BUILTINS.get(name)
    if factory is None:
        raise LensNotFoundError(
            f"unknown lens '{name}'; registered: {sorted(_BUILTINS)}"
        )
    return factory(dict(arguments or {}))


def builtin_names() -> list[str]:
    return sorted(_BUILTINS)


def require_arg(arguments: Mapping[str, Any], key: str, lens: str) -> Any:
    if key not in arguments:
        raise LensError(f"lens '{lens}' requires argument '{key}'")
    return arguments[key]


def check_reserved(df: DataFrame, cols, op: str, *, extra=()) -> None:
    """Refuse loudly when an input column collides with one of ``op``'s
    reserved internal column names (the ``__``-prefixed scratch columns
    it will create). ``extra`` adds caller-chosen output names (e.g. a
    user-provided ``rank_col``) to the collision surface.

    One shared helper instead of per-operator hand-rolled checks (r10
    verdict #4): two consecutive advice rounds found operators whose
    reserved set drifted from the internals they actually create. The
    companion lint (`tests/test_reserved_internals_lint.py`) statically
    extracts every ``withColumn("__…")`` / ``.alias("__…")`` literal in
    a function that calls this helper and fails if one is missing from
    the declared set — so the set and the code cannot drift apart
    silently again.
    """
    reserved = {str(c) for c in cols}
    clash = reserved & (set(df.columns) | {str(c) for c in extra})
    if clash:
        raise LensError(
            f"{op}: column names {sorted(clash)} collide with reserved "
            f"internal columns ({'/'.join(sorted(reserved))})")


def ensure_parallelism(df: DataFrame, *, by: list[str] | None = None,
                       min_fraction: float = 0.5) -> DataFrame:
    """Repartition iff the plan has too few partitions for the cluster.

    CPU-heavy operators (shingling, hashing, scoring) call this so a
    pathological input — one unsplittable row group, a single small
    file — still fans out across every core. At production scale the
    scan already yields thousands of splits and this is a no-op, so
    the extra shuffle is only ever paid when it buys parallelism.
    ``by`` hash-partitions on those columns, letting a downstream
    groupBy on the same keys skip its exchange.
    """
    from pyspark.sql import functions as F

    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= max(2, int(target * min_fraction)):
        return df
    if by:
        return df.repartition(target, *[F.col(c) for c in by])
    return df.repartition(target)


def reassemble_by_position(df: DataFrame, id_col: str, kept: DataFrame, *,
                           key: str, pos: str, seg: str, delimiter: str,
                           out: str) -> DataFrame:
    """Order-preserving reassembly shared by the segment-granular
    rewrite operators (line_dedup, span_dedup, segment_filter): group
    the surviving ``(key, pos, seg)`` rows per document, sort by
    original position, join with ``delimiter``, and LEFT-join back onto
    the input so fully-cleaned documents keep their row as "". One
    aggregation — the only exchange in these operators that carries
    text — plus the join back on id. Shared so a fix to the
    reassembly contract can never drift between the three operators.
    """
    from pyspark.sql import functions as F

    clean = (
        kept.groupBy(key)
        .agg(F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct(pos, seg))),
                lambda s: s[seg]),
            delimiter).alias("__ra_clean"))
    )
    joined = df.join(clean, df[id_col] == clean[key], "left")
    return joined.withColumn(
        out, F.coalesce(F.col("__ra_clean"), F.lit(""))
    ).drop(key, "__ra_clean")
