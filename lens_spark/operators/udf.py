"""python_udf lens — the escape hatch, faithful to the reference's ABI.

A reference lens is an iterator→iterator function: per ``transform()``
call it pulls 0..N inputs via the imported ``next()``, emits one framed
item, may hold state across calls, may emit nil items, and raises
in-band errors (/root/reference/sdk-rust/src/lib.rs:290-374,
README.md:23-28). The Spark-native equivalent is a function over a
partition's batch iterator run via ``mapInPandas`` — Arrow-batched,
covering map / filter / explode / N:1 merge / stateful assignment in
one primitive, exactly the envelope the WASM ABI allows (SURVEY.md
§2.2).

Fusion: the engine composes chains of adjacent python_udf lenses into a
single mapInPandas stage, so a K-stage python pipeline crosses the
JVM↔Arrow boundary once, not K times — the analogue of the reference's
raw-byte handoff between chained WASM memories
(/root/reference/host-go/engine/pipes/fromPipe.go:111-140).

Error semantics (§1.2 of SURVEY.md): strict mode lets exceptions fail
the task (≙ host error at Value() time); permissive mode catches
per-batch errors into an ``_error`` string column, mirroring the
reference's in-band ``TypeId=-1`` frames.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator, Mapping

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from lens_spark.errors import LensError, LensNotFoundError
from lens_spark.operators.base import Lens, register_lens

# fn(iterator of pd.DataFrame, params) -> iterator of pd.DataFrame
BatchFn = Callable[[Iterator[pd.DataFrame], Mapping[str, Any]], Iterator[pd.DataFrame]]

_UDF_LENSES: dict[str, dict[str, Any]] = {}


def register_python_lens(name: str, fn: BatchFn, schema: StructType | str,
                         inverse_fn: BatchFn | None = None,
                         inverse_schema: StructType | str | None = None) -> None:
    """Register a python lens so pipeline specs can reference it by name.

    ≙ registering a module path with the engine; ``params`` arrive via
    the spec's ``arguments`` (≙ set_param, runtimes/wasmtime/runtime.go:115-154).
    """
    _UDF_LENSES[name] = {
        "fn": fn,
        "schema": schema,
        "inverse_fn": inverse_fn,
        "inverse_schema": inverse_schema or schema,
    }


def per_item(fn: Callable[[dict[str, Any], Mapping[str, Any]], list[dict[str, Any]]]) -> BatchFn:
    """Adapt a per-item function (row → 0..N rows) to the batch ABI.

    Row-at-a-time Python is the slow path; use for semantics tests and
    small data, not the 100 TB hot path.
    """

    def batch_fn(batches: Iterator[pd.DataFrame], params: Mapping[str, Any]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[dict[str, Any]] = []
            for rec in pdf.to_dict(orient="records"):
                rows.extend(fn(rec, params))
            yield pd.DataFrame(rows)

    return batch_fn


META_PREFIX = "__lens_"
"""Reserved column prefix for engine metadata (e.g. the CLI's nil-row
flag ``__lens_nil``). Metadata columns ride through native lenses but
are hidden from user batch-fns so a module sees exactly the columns the
library API would hand it."""

NIL_COL = f"{META_PREFIX}nil"
"""The CLI's hidden nil-row flag (reference TypeId=0,
host-go/engine/module/protocol.go:42-52). Unlike other meta columns it
participates in dedup identity — nil is a distinct item *kind*, not a
document that happens to have null fields."""


def _strip_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        meta = [c for c in pdf.columns if c.startswith(META_PREFIX)]
        yield pdf.drop(columns=meta) if meta else pdf


def _bind(fn: BatchFn, params: Mapping[str, Any], permissive: bool,
          out_fields: list[str] | None = None):
    def bound(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        batches = _strip_meta(batches)
        if not permissive:
            yield from fn(batches, params)
            return
        fields = [f for f in (out_fields or []) if f != "_error"]
        for pdf in batches:
            try:
                for out in fn(iter([pdf]), params):
                    out = out.copy()
                    out["_error"] = None
                    yield out
            except Exception as exc:  # in-band error (TypeId=-1 analogue)
                err = pd.DataFrame({f: [None] for f in fields})
                err["_error"] = [str(exc)]
                yield err

    return bound


def apply_python_lens(df: DataFrame, name: str, params: Mapping[str, Any],
                      inverse: bool = False, permissive: bool = False) -> DataFrame:
    entry = _UDF_LENSES.get(name)
    if entry is None:
        raise LensNotFoundError(f"unknown python lens '{name}'")
    fn = entry["inverse_fn"] if inverse else entry["fn"]
    if fn is None:
        raise LensError(f"lens '{name}' does not define an inverse")
    schema = entry["inverse_schema"] if inverse else entry["schema"]
    out_fields: list[str] | None = None
    if permissive:
        schema = _with_error_field(df.sparkSession, schema)
        out_fields = schema.fieldNames()
    return df.mapInPandas(_bind(fn, params, permissive, out_fields), schema=schema)


def _with_error_field(spark, schema: StructType | str):
    from pyspark.sql.types import StringType, StructField

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if "_error" in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField("_error", StringType(), True)])


def compose_batch_fns(stages: list[tuple[BatchFn, Mapping[str, Any]]]) -> Callable:
    """Fuse N python lens stages into one iterator function (P2 analogue)."""

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        stream = _strip_meta(batches)
        for fn, params in stages:
            stream = fn(stream, params)
        return stream

    return fused


_GROUPED_LENSES: dict[str, dict[str, Any]] = {}


def register_grouped_lens(name: str, fn, schema: StructType | str) -> None:
    """Register a per-group pandas function: fn(key_tuple, pdf, params)
    -> pdf. The grouped-map N:M primitive (applyInPandas) — per-key
    arbitrary Python where the whole group must be in one batch
    (custom aggregations, per-entity model scoring). State is bounded
    by the largest single group; shuffles once on the keys."""
    _GROUPED_LENSES[name] = {"fn": fn, "schema": schema}


def apply_grouped_lens(df: DataFrame, name: str, keys: list[str],
                       params: Mapping[str, Any]) -> DataFrame:
    entry = _GROUPED_LENSES.get(name)
    if entry is None:
        raise LensNotFoundError(f"unknown grouped python lens '{name}'")
    fn = entry["fn"]

    def run(key, pdf):
        return fn(key, pdf, params)

    return df.groupBy(*keys).applyInPandas(run, schema=entry["schema"])


@register_lens("python_grouped")
def python_grouped_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: function (registered grouped lens), keys (list[str]),
    params (dict, optional)."""
    from lens_spark.operators.base import require_arg

    fn_name = str(require_arg(arguments, "function", "python_grouped"))
    keys = [str(k) for k in require_arg(arguments, "keys", "python_grouped")]
    params = dict(arguments.get("params") or {})
    if fn_name not in _GROUPED_LENSES:
        raise LensNotFoundError(f"unknown grouped python lens '{fn_name}'")
    return Lens("python_grouped", arguments,
                lambda df: apply_grouped_lens(df, fn_name, keys, params))


@register_lens("python_udf")
def python_udf_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: function (registered name), params (dict, optional),
    permissive (bool, optional)."""
    from lens_spark.operators.base import require_arg

    fn_name = str(require_arg(arguments, "function", "python_udf"))
    params = dict(arguments.get("params") or {})
    permissive = bool(arguments.get("permissive", False))
    entry = _UDF_LENSES.get(fn_name)
    if entry is None:
        raise LensNotFoundError(f"unknown python lens '{fn_name}'")

    lens = Lens(
        "python_udf",
        arguments,
        forward_fn=lambda df: apply_python_lens(df, fn_name, params, False, permissive),
        inverse_fn=(
            (lambda df: apply_python_lens(df, fn_name, params, True, permissive))
            if entry["inverse_fn"] is not None else None
        ),
    )
    if not permissive:
        # Expose raw pieces so the engine can fuse adjacent python stages.
        lens.fusable_iter = (entry["fn"], params, entry["schema"])
        if entry["inverse_fn"] is not None:
            lens.fusable_iter_inverse = (entry["inverse_fn"], params, entry["inverse_schema"])
    return lens
