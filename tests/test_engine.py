"""Engine: append/compose/invert semantics ported from the reference's
engine + CLI integration suites (host-go/engine/tests/,
tests/integration/cli/)."""

from __future__ import annotations

import pandas as pd
import pytest

from lens_spark import engine
from lens_spark.errors import LensError, LensNotFoundError
from lens_spark.model import LensConfig, LensModule
from lens_spark.operators import register_python_lens


def rows(df):
    return [r.asDict() for r in df.collect()]


def test_zero_lenses_is_identity(people):
    # Append with no instances returns the source (engine.go:29-31).
    out = engine.append(people, LensConfig())
    assert rows(out) == rows(people)


def test_single_rename(people):
    # ≙ TestSimple (tests/integration/cli/simple_test.go:23-60).
    out = engine.append(
        people, {"lenses": [{"name": "rename", "arguments": {"src": "Name", "dst": "FullName"}}]}
    )
    assert out.columns == ["FullName", "Age"]
    assert sorted(rows(out), key=lambda r: r["Age"])[0] == {"FullName": "John", "Age": 30}


def test_chained_pipeline_order(people):
    # rename → add; order matters (wasm32_pipeline_test.go multi-stage).
    spec = {
        "lenses": [
            {"name": "rename", "arguments": {"src": "Age", "dst": "Years"}},
            {"name": "add", "arguments": {"column": "Years", "magnitude": 10}},
        ]
    }
    out = engine.append(people, spec)
    assert sorted(r["Years"] for r in rows(out)) == [40, 41, 42]


def test_module_inverse_flag(people):
    # inverse:true runs the module's inverse (with_inverse_test.go).
    spec = {"lenses": [{"name": "add", "inverse": True, "arguments": {"column": "Age", "magnitude": 1}}]}
    out = engine.append(people, spec)
    assert sorted(r["Age"] for r in rows(out)) == [29, 30, 31]


def test_missing_inverse_errors(people):
    spec = {"lenses": [{"name": "filter", "inverse": True, "arguments": {"predicate": "Age > 30"}}]}
    with pytest.raises(LensError, match="does not define an inverse"):
        engine.append(people, spec)


def test_pipeline_inversion_round_trip(people):
    # E8: fwd then inverted == identity (repository.go:172-206).
    spec = LensConfig(
        [
            LensModule("rename", False, {"src": "Name", "dst": "FullName"}),
            LensModule("add", False, {"column": "Age", "magnitude": 5}),
        ]
    )
    fwd = engine.append(people, spec)
    back = engine.append(fwd, engine.invert(spec))
    assert back.columns == people.columns
    assert sorted(rows(back), key=lambda r: r["Age"]) == sorted(
        rows(people), key=lambda r: r["Age"]
    )


def test_unknown_lens_raises(people):
    with pytest.raises(LensNotFoundError):
        engine.append(people, {"lenses": [{"name": "nope"}]})


def test_rename_missing_column_error_text(people):
    # mirrors rust_wasm32_rename missing-src error (src/lib.rs:24-27).
    with pytest.raises(LensError, match="property with name 'Nope' not found"):
        engine.append(
            people, {"lenses": [{"name": "rename", "arguments": {"src": "Nope", "dst": "x"}}]}
        )


def test_python_udf_lens_and_fusion(people):
    calls = []

    def bump(batches, params):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["Age"] = pdf["Age"] + params.get("by", 1)
            yield pdf

    def tag(batches, params):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["Tag"] = params["tag"]
            yield pdf

    register_python_lens("bump_age", bump, "Name string, Age long")
    register_python_lens("tag_rows", tag, "Name string, Age long, Tag string")

    spec = {
        "lenses": [
            {"name": "python_udf", "arguments": {"function": "bump_age", "params": {"by": 2}}},
            {"name": "python_udf", "arguments": {"function": "tag_rows", "params": {"tag": "t"}}},
        ]
    }
    out = engine.append(people, spec)
    # Fusion: the two python stages must collapse into ONE mapInPandas.
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.lower().count("mapinpandas") == 1
    got = sorted(rows(out), key=lambda r: r["Age"])
    assert got[0] == {"Name": "John", "Age": 32, "Tag": "t"}


def test_python_udf_explode_cardinality(people):
    # 1:N emission, the M7 envelope via the escape hatch.
    def dup(batches, params):
        for pdf in batches:
            yield pd.concat([pdf, pdf], ignore_index=True)

    register_python_lens("duplicate", dup, "Name string, Age long")
    out = engine.append(people, {"lenses": [{"name": "python_udf", "arguments": {"function": "duplicate"}}]})
    assert out.count() == 6


def test_python_udf_permissive_error_column(spark):
    # In-band error semantics (TypeId=-1 analogue, SURVEY §1.2).
    def explode_on_negative(batches, params):
        for pdf in batches:
            if (pdf["Age"] < 0).any():
                raise ValueError("negative age")
            yield pdf

    register_python_lens("guard_age", explode_on_negative, "Name string, Age long")
    df = spark.createDataFrame([("A", 1), ("B", -2)], "Name string, Age long").repartition(2)
    out = engine.append(
        df,
        {"lenses": [{"name": "python_udf",
                     "arguments": {"function": "guard_age", "permissive": True}}]},
    )
    got = rows(out)
    errs = [r for r in got if r["_error"] is not None]
    assert any("negative age" in (r["_error"] or "") for r in errs)


def test_compose_concatenates():
    a = {"lenses": [{"name": "identity"}]}
    b = {"lenses": [{"name": "identity"}]}
    assert len(engine.compose(a, b).lenses) == 2


def test_python_grouped_lens(spark):
    """Grouped-map N:M primitive: per-key arbitrary Python over the
    whole group in one batch (applyInPandas)."""
    import pandas as pd
    from lens_spark.operators.udf import register_grouped_lens

    def span(key, pdf, params):
        return pd.DataFrame([{
            "k": key[0],
            "span": float(pdf["v"].max() - pdf["v"].min()) * params.get("scale", 1),
            "n": len(pdf),
        }])

    register_grouped_lens("value_span", span, "k string, span double, n long")
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("b", 2.0)], "k string, v double")
    spec = {"lenses": [{"name": "python_grouped", "arguments": {
        "function": "value_span", "keys": ["k"], "params": {"scale": 2}}}]}
    got = {r.k: (r.span, r.n) for r in engine.append(df, spec).collect()}
    assert got == {"a": (8.0, 2), "b": (0.0, 1)}


def test_reset_semantics_reexecution_is_deterministic(spark):
    """E5 Reset parity: the reference re-instantiates the WASM module so
    state clears on Reset (runtimes/wasmtime/runtime.go:209-224). Here
    DataFrames are immutable — re-running the SAME plan must give the
    same result, including for the stateful counter lens."""
    df = spark.createDataFrame(
        [("c", 3), ("a", 1), ("b", 2)], "Name string, Age long")
    spec = {"lenses": [{"name": "counter",
                        "arguments": {"order_by": ["Age"], "out": "id"}}]}
    out = engine.append(df, spec)
    first = sorted(map(tuple, out.collect()))
    second = sorted(map(tuple, out.collect()))   # "reset" = re-pull
    third = sorted(map(tuple, engine.append(df, spec).collect()))  # rebuild
    assert first == second == third
    assert [r[2] for r in first] == [1, 2, 3]


def test_repeated_stateful_lens_is_refused(spark):
    """Divergence guard (SURVEY §7.4d): the reference shares ONE module
    instance when the same stateful lens is appended twice — its counter
    keeps counting across both stages
    (host-go/engine/tests/wasm32_pipeline_with_state_test.go:15-100).
    This engine derives state per stage, so the pattern is refused
    rather than silently numbering differently."""
    df = spark.createDataFrame([("a", 1)], "Name string, Age long")
    dup = {"lenses": [
        {"name": "counter", "arguments": {"order_by": ["Age"], "out": "id"}},
        {"name": "counter", "arguments": {"order_by": ["Age"], "out": "id"}},
    ]}
    with pytest.raises(LensError, match="documented divergence"):
        engine.append(df, dup)
    # distinct arguments = distinct instances in the reference too — fine
    ok = {"lenses": [
        {"name": "counter", "arguments": {"order_by": ["Age"], "out": "id"}},
        {"name": "counter", "arguments": {"order_by": ["Age"], "out": "id2"}},
    ]}
    row = engine.append(df, ok).collect()[0]
    assert (row.id, row.id2) == (1, 1)


def test_compiled_pipeline_reuse_and_inversion(spark, people):
    """E9/E10: one compiled pipeline applied to multiple inputs."""
    pipeline = engine.compile({"lenses": [
        {"name": "rename", "arguments": {"src": "Name", "dst": "FullName"}},
        {"name": "add", "arguments": {"column": "Age", "magnitude": 5}},
    ]})
    out1 = pipeline(people)
    out2 = pipeline(people.filter("Age > 30"))     # source socket swap (E10)
    assert out1.columns == out2.columns == ["FullName", "Age"]
    assert out1.count() == 3 and out2.count() == 2
    back = pipeline.inverted()(out1)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, people.collect()))
    assert pipeline.content_id().startswith("lens1-")
