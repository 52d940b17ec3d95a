"""Built-in lens library: the reference's lens-module archetypes M1-M7
re-expressed as native Catalyst transforms.

Archetype sources (all under /root/reference/tests/modules/):
  M1/M4 rename       rust_wasm32_simple/src/lib.rs:16-65,
                     rust_wasm32_rename/src/lib.rs:31-62
  M2/M3 arithmetic   rust_wasm32_simple2/src/lib.rs:9-57 (invertible),
                     as_wasm32_simple/assembly/index.ts:40-67
  M6 filter          rust_wasm32_filter/src/lib.rs:18-32
  M7 explode         rust_wasm32_normalize/src/lib.rs:30-77
  E7 identity        host-go/repository/repository.go:250-254

Every lens here is a pure DataFrame expression — no Python in the data
path — so pipelines of them stay inside WholeStageCodegen and Catalyst
can push predicates through the whole chain.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_spark.errors import LensError
from lens_spark.operators.base import Lens, register_lens, require_arg


@register_lens("identity")
def identity_lens(arguments: Mapping[str, Any]) -> Lens:
    """E7: pass-through; its own inverse."""
    return Lens("identity", arguments, lambda df: df, lambda df: df)


def _check_column(df: DataFrame, col: str, lens: str) -> None:
    if col not in df.columns:
        # Error text mirrors the reference's parameterized rename
        # (tests/modules/rust_wasm32_rename/src/lib.rs:24-27).
        raise LensError(f"lens '{lens}': property with name '{col}' not found")


@register_lens("rename")
def rename_lens(arguments: Mapping[str, Any]) -> Lens:
    """M1/M4: move column ``src`` to ``dst``. Inverse renames back."""
    src = str(require_arg(arguments, "src", "rename"))
    dst = str(require_arg(arguments, "dst", "rename"))

    def forward(df: DataFrame) -> DataFrame:
        _check_column(df, src, "rename")
        return df.withColumnRenamed(src, dst)

    def inverse(df: DataFrame) -> DataFrame:
        _check_column(df, dst, "rename")
        return df.withColumnRenamed(dst, src)

    return Lens("rename", arguments, forward, inverse)


@register_lens("add")
def add_lens(arguments: Mapping[str, Any]) -> Lens:
    """M2/M3: ``column += magnitude``; inverse subtracts (bidirectional)."""
    column = str(require_arg(arguments, "column", "add"))
    magnitude = require_arg(arguments, "magnitude", "add")

    def shift(sign: int):
        def apply(df: DataFrame) -> DataFrame:
            _check_column(df, column, "add")
            return df.withColumn(column, F.col(column) + F.lit(sign * magnitude))

        return apply

    return Lens("add", arguments, shift(+1), shift(-1))


@register_lens("multiply")
def multiply_lens(arguments: Mapping[str, Any]) -> Lens:
    """Arithmetic scale; inverse divides. Same archetype family as M2."""
    column = str(require_arg(arguments, "column", "multiply"))
    factor = require_arg(arguments, "factor", "multiply")
    if factor == 0:
        raise LensError("lens 'multiply': factor must be non-zero to stay invertible")

    def forward(df: DataFrame) -> DataFrame:
        _check_column(df, column, "multiply")
        return df.withColumn(column, F.col(column) * F.lit(factor))

    def inverse(df: DataFrame) -> DataFrame:
        _check_column(df, column, "multiply")
        # Division widens to double; cast back to the column's incoming
        # dtype so an integer column round-trips as an integer (forward
        # guarantees multiples of factor) instead of silently becoming
        # double. Float columns keep their fp tolerance (documented).
        dtype = dict(df.dtypes)[column]
        return df.withColumn(column, (F.col(column) / F.lit(factor)).cast(dtype))

    return Lens("multiply", arguments, forward, inverse)


@register_lens("set")
def set_lens(arguments: Mapping[str, Any]) -> Lens:
    """Set ``column`` to a literal or SQL expression (``expr``)."""
    column = str(require_arg(arguments, "column", "set"))
    if "expr" in arguments:
        value = F.expr(str(arguments["expr"]))
    else:
        value = F.lit(require_arg(arguments, "value", "set"))
    return Lens("set", arguments, lambda df: df.withColumn(column, value))


@register_lens("filter")
def filter_lens(arguments: Mapping[str, Any]) -> Lens:
    """M6: keep rows matching a predicate.

    Accepts ``{"predicate": "<sql>"}`` or the reference module's exact
    shape ``{"column": c, "equals": v}`` (__type == "pass" in
    rust_wasm32_filter/src/lib.rs:24). Not invertible (information loss).
    """
    if "predicate" in arguments:
        cond = F.expr(str(arguments["predicate"]))
    else:
        column = str(require_arg(arguments, "column", "filter"))
        cond = F.col(column) == F.lit(require_arg(arguments, "equals", "filter"))
    return Lens("filter", arguments, lambda df: df.filter(cond))


@register_lens("explode")
def explode_lens(arguments: Mapping[str, Any]) -> Lens:
    """M7 normalize: un-nest an array column, one output row per element.

    arguments:
      column: array column to explode
      out:    name for the element column (default: same as column)
      rename: optional {old: new} applied to the remaining columns
      outer:  if true, keep rows with null/empty arrays (explode_outer)
    """
    column = str(require_arg(arguments, "column", "explode"))
    out = str(arguments.get("out", column))
    renames = dict(arguments.get("rename") or {})
    outer = bool(arguments.get("outer", False))
    fn = F.explode_outer if outer else F.explode

    def forward(df: DataFrame) -> DataFrame:
        _check_column(df, column, "explode")
        others = [c for c in df.columns if c != column]
        cols = [F.col(c).alias(renames.get(c, c)) for c in others]
        return df.select(*cols, fn(F.col(column)).alias(out))

    return Lens("explode", arguments, forward)


@register_lens("collect")
def collect_lens(arguments: Mapping[str, Any]) -> Lens:
    """Inverse-direction explode: group and re-nest an element column.

    arguments: keys (group-by columns), column (element col), out
    (array column name), sort (default true → deterministic order).
    Map-side partial aggregation makes this shuffle-light at scale.
    """
    keys = list(require_arg(arguments, "keys", "collect"))
    column = str(require_arg(arguments, "column", "collect"))
    out = str(arguments.get("out", column))
    sort = bool(arguments.get("sort", True))

    def forward(df: DataFrame) -> DataFrame:
        agg = F.collect_list(F.col(column))
        if sort:
            agg = F.sort_array(agg)
        return df.groupBy(*keys).agg(agg.alias(out))

    return Lens("collect", arguments, forward)


@register_lens("project")
def project_lens(arguments: Mapping[str, Any]) -> Lens:
    """Column selection (schema migration building block)."""
    columns = list(require_arg(arguments, "columns", "project"))
    return Lens("project", arguments, lambda df: df.select(*columns))


@register_lens("drop")
def drop_lens(arguments: Mapping[str, Any]) -> Lens:
    columns = list(require_arg(arguments, "columns", "drop"))
    return Lens("drop", arguments, lambda df: df.drop(*columns))


@register_lens("cast")
def cast_lens(arguments: Mapping[str, Any]) -> Lens:
    column = str(require_arg(arguments, "column", "cast"))
    to = str(require_arg(arguments, "type", "cast"))

    def forward(df: DataFrame) -> DataFrame:
        _check_column(df, column, "cast")
        return df.withColumn(column, F.col(column).cast(to))

    return Lens("cast", arguments, forward)


@register_lens("sql")
def sql_lens(arguments: Mapping[str, Any]) -> Lens:
    """Arbitrary SELECT over the pipeline input (bound as view ``_input``)."""
    query = str(require_arg(arguments, "query", "sql"))

    def forward(df: DataFrame) -> DataFrame:
        # sparkSession-scoped temp view; name collision risk is accepted
        # for the convenience lens (not used by the managed pipelines).
        df.createOrReplaceTempView("_input")
        return df.sparkSession.sql(query)

    return Lens("sql", arguments, forward)


@register_lens("json_extract")
def json_extract_lens(arguments: Mapping[str, Any]) -> Lens:
    """Schemaless-document path: pull typed fields out of a JSON string
    column (≙ the reference's documents are raw JSON maps, SURVEY §1.1;
    here untyped payloads live in a string column until a lens gives
    them a schema).

    arguments: column, fields ({out_name: json_path}), types
    (optional {out_name: spark type, default string}), drop (bool —
    drop the raw JSON column after extraction).

    JVM-side get_json_object — no Python, stays inside codegen; for
    repeated multi-field extraction of large documents prefer one
    from_json with an explicit schema (single parse), which this lens
    uses automatically when every path is a simple top-level key.
    """
    col = str(require_arg(arguments, "column", "json_extract"))
    fields = {str(k): str(v) for k, v in
              dict(require_arg(arguments, "fields", "json_extract")).items()}
    types = {str(k): str(v) for k, v in dict(arguments.get("types") or {}).items()}
    drop = bool(arguments.get("drop", False))

    simple = all(p.startswith("$.") and "." not in p[2:] and "[" not in p
                 for p in fields.values())

    def forward(df: DataFrame) -> DataFrame:
        _check_column(df, col, "json_extract")
        if simple:
            # one parse for all fields
            ddl = ", ".join(f"`{p[2:]}` {types.get(out, 'string')}"
                            for out, p in fields.items())
            parsed = F.from_json(F.col(col), ddl)
            out_df = df
            for out, p in fields.items():
                out_df = out_df.withColumn(out, parsed.getItem(p[2:]))
        else:
            out_df = df
            for out, p in fields.items():
                c = F.get_json_object(F.col(col), p)
                out_df = out_df.withColumn(out, c.cast(types.get(out, "string")))
        return out_df.drop(col) if drop else out_df

    return Lens("json_extract", arguments, forward)
