"""WASM lens host tests — the reference ABI run end to end on Node.

Mirrors the reference's module integration suite
(/root/reference/tests/integration/, host-go/engine/tests/): a module
exporting ``alloc``/``transform`` (+ ``inverse``/``set_param``) and
importing ``lens.next`` is driven item-by-item with
``[i8 type][u32le len][payload]`` frames — json, nil, in-band error,
EOS. The reference compiles its test modules from Rust at test time
(tests/modules/Makefile); this container has no wasm32 toolchain or
network, so the fixtures are ABI-equivalent modules assembled
byte-by-byte by lens_spark.wasm.testmods (rename_simple reproduces
rust_wasm32_simple's Name→FullName semantics,
tests/modules/rust_wasm32_simple/src/lib.rs).
"""

from __future__ import annotations

import io
import json

import pytest

from lens_spark.errors import LensError
from lens_spark.wasm import (
    apply_wasm_lens, infer_output_ddl, run_wasm_pipe, wasm_available,
)

pytestmark = pytest.mark.skipif(
    not wasm_available(), reason="no node binary on PATH")


@pytest.fixture(scope="session")
def wasm_dir(tmp_path_factory):
    from lens_spark.wasm.testmods import (
        add_age, contains_filter, counter, echo_param, explode_books,
        rename_param, rename_simple,
    )

    d = tmp_path_factory.mktemp("wasmmods")
    (d / "rename.wasm").write_bytes(rename_simple())
    (d / "counter.wasm").write_bytes(counter())
    (d / "echo.wasm").write_bytes(echo_param())
    (d / "filter.wasm").write_bytes(contains_filter())
    (d / "rename_param.wasm").write_bytes(rename_param())
    (d / "add_age.wasm").write_bytes(add_age(1))
    (d / "explode.wasm").write_bytes(explode_books())
    return d


@pytest.fixture
def module_paths_enabled():
    from lens_spark.modules import allow_module_paths

    allow_module_paths(True)
    yield
    allow_module_paths(False)


# ---- pipe level (no Spark) --------------------------------------------------


def test_pipe_transform_nil_and_inverse_roundtrip(wasm_dir):
    # ≙ simple_test.go semantics: Name→FullName, nil passes through
    items = [{"Name": "John", "Age": 30}, None, {"Name": "Ann", "Age": 4}]
    out = list(run_wasm_pipe(str(wasm_dir / "rename.wasm"), items))
    assert out == [{"FullName": "John", "Age": 30}, None,
                   {"FullName": "Ann", "Age": 4}]
    back = list(run_wasm_pipe(str(wasm_dir / "rename.wasm"), out,
                              fn="inverse"))
    assert back == items


def test_pipe_counter_holds_state_across_calls(wasm_dir):
    # ≙ rust_wasm32_counter: instance state lives across transform()s
    out = list(run_wasm_pipe(str(wasm_dir / "counter.wasm"),
                             [{"a": i} for i in range(5)]))
    assert out == [{"count": i} for i in range(1, 6)]


def test_pipe_set_param_reaches_the_module(wasm_dir):
    # ≙ with_modules_params_test.go: params json arrives via set_param
    out = list(run_wasm_pipe(str(wasm_dir / "echo.wasm"),
                             [{"x": 1}, {"y": 2}],
                             params={"src": "Name", "n": 7}))
    assert out == [{"src": "Name", "n": 7}] * 2


def test_pipe_missing_export_and_module_error_are_in_band(wasm_dir):
    with pytest.raises(LensError, match="Export `nope` does not exist"):
        list(run_wasm_pipe(str(wasm_dir / "rename.wasm"), [], fn="nope"))
    with pytest.raises(LensError, match="Export `inverse` does not exist"):
        list(run_wasm_pipe(str(wasm_dir / "counter.wasm"), [],
                           fn="inverse"))
    # module-raised error frame (TypeId=-1), not a host crash
    with pytest.raises(LensError, match="params too large"):
        list(run_wasm_pipe(str(wasm_dir / "echo.wasm"), [{"x": 1}],
                           params={"pad": "x" * 40000}))


def test_pipe_large_stream_constant_memory(wasm_dir):
    # the test modules reset their bump allocator per item, so an
    # arbitrarily long stream must not grow wasm memory per row —
    # 20k rows through one instance is the smoke for that
    n = 20_000
    out = list(run_wasm_pipe(str(wasm_dir / "rename.wasm"),
                             ({"Name": f"n{i}", "Age": i} for i in range(n))))
    assert len(out) == n
    assert out[-1] == {"FullName": f"n{n-1}", "Age": n - 1}


def test_pipe_parameterized_rename_full_m4_semantics(wasm_dir):
    """≙ rust_wasm32_rename (tests/modules/rust_wasm32_rename/src/
    lib.rs:31-62): set_param genuinely changes module behavior (the
    src/dst keys are parsed from the params json at runtime), the
    inverse renames back, and a doc missing the src key fails with
    the reference's exact error text."""
    fp = str(wasm_dir / "rename_param.wasm")
    p = {"src": "Name", "dst": "FullName"}
    out = list(run_wasm_pipe(fp, [{"Name": "John", "Age": 30}, None],
                             params=p))
    assert out == [{"FullName": "John", "Age": 30}, None]
    assert list(run_wasm_pipe(fp, out, fn="inverse", params=p)) == \
        [{"Name": "John", "Age": 30}, None]
    # DIFFERENT params, same module bytes → different behavior
    assert list(run_wasm_pipe(fp, [{"Age": 30}],
                              params={"src": "Age", "dst": "Years"})) == \
        [{"Years": 30}]
    with pytest.raises(LensError,
                       match="property with name 'Name' not found"):
        list(run_wasm_pipe(fp, [{"Nope": 1}], params=p))
    with pytest.raises(LensError, match="set_param.*required"):
        list(run_wasm_pipe(fp, [{"Name": 1}]))
    with pytest.raises(LensError, match="missing string 'src'"):
        list(run_wasm_pipe(fp, [{"Name": 1}], params={"src": "Name"}))


def test_lens_file_parameterized_wasm_rename_golden(spark, wasm_dir,
                                                    tmp_path, monkeypatch,
                                                    module_paths_enabled):
    # ≙ with_modules_params_test.go: the CLI golden with a
    # PARAMETERIZED wasm module — params flow lens-file → set_param
    from lens_spark.cli import main

    lensfile = tmp_path / "lens.json"
    lensfile.write_text(json.dumps({"lenses": [
        {"path": f"file:{wasm_dir}/rename_param.wasm",
         "arguments": {"src": "Name", "dst": "FullName"}}]}))
    monkeypatch.setattr("sys.stdin", io.StringIO(json.dumps(
        [{"Age": 30, "Name": "John"}])))
    out = io.StringIO()
    monkeypatch.setattr("sys.stdout", out)
    assert main([str(lensfile), "--allow-module-paths"],
                _stop_session=False) == 0
    assert json.loads(out.getvalue()) == [{"Age": 30, "FullName": "John"}]


def test_pipe_numeric_add_bidirectional_m2_semantics(wasm_dir):
    """≙ rust_wasm32_simple2 (tests/modules/rust_wasm32_simple2/src/
    lib.rs:9-57): Age = Age + 1 with an exact inverse — the number is
    parsed, incremented, and re-rendered INSIDE wasm, including sign
    crossings; docs without the key and nils pass through."""
    fp = str(wasm_dir / "add_age.wasm")
    items = [{"Name": "J", "Age": 30}, {"Age": -1}, {"Age": 0},
             {"Age": -5}, None, {"NoAge": 1}]
    out = list(run_wasm_pipe(fp, items))
    assert out == [{"Name": "J", "Age": 31}, {"Age": 0}, {"Age": 1},
                   {"Age": -4}, None, {"NoAge": 1}]
    assert list(run_wasm_pipe(fp, out, fn="inverse")) == items


def test_pipe_explode_emits_without_pulling_m7_semantics(wasm_dir):
    """≙ rust_wasm32_normalize (tests/modules/rust_wasm32_normalize/
    src/lib.rs:30-77): the 1:N envelope — the module buffers the
    array across transform() calls and returns elements WITHOUT
    pulling (every other fixture pulls per call); docs without a
    Books array are consumed silently; nil passes through."""
    fp = str(wasm_dir / "explode.wasm")
    items = [{"Books": ["a", "b"]}, {"Books": []}, {"Other": 1},
             {"Books": ["c"]}, None]
    out = list(run_wasm_pipe(fp, items))
    assert out == [{"Book": "a"}, {"Book": "b"}, {"Book": "c"}, None]
    # N elements from ONE doc, deterministic order, arbitrary length
    many = list(run_wasm_pipe(fp, [{"Books": [f"b{i}" for i in range(50)]}]))
    assert [d["Book"] for d in many] == [f"b{i}" for i in range(50)]


def test_pipe_filter_pulls_many_inputs_per_output(wasm_dir):
    # ≙ rust_wasm32_filter / with_len_change_test.go: one transform()
    # call may consume MANY inputs (the N:1 pull envelope) — the host's
    # blocking next() must serve repeated pulls within one call
    items = [{"tag": "keep", "id": 1}, {"tag": "drop", "id": 2},
             {"tag": "drop", "id": 3}, None, {"tag": "keep", "id": 4},
             {"tag": "drop", "id": 5}]
    out = list(run_wasm_pipe(str(wasm_dir / "filter.wasm"), items))
    assert out == [{"tag": "keep", "id": 1}, None, {"tag": "keep", "id": 4}]
    # a long reject run inside a single transform call (constant
    # memory: the module resets its allocator before every pull)
    many = ({"tag": "keep" if i % 9973 == 0 else "x", "id": i}
            for i in range(50_000))
    keeps = list(run_wasm_pipe(str(wasm_dir / "filter.wasm"), many))
    assert [d["id"] for d in keeps] == [0, 9973, 19946, 29919, 39892, 49865]


def test_infer_ddl_merges_and_rejects_conflicts():
    assert infer_output_ddl([{"a": 1, "b": "x"}, {"a": 2.5, "b": None}]) == \
        "`a` double, `b` string"
    assert infer_output_ddl([{"v": [1, 2]}, None]) == "`v` array<bigint>"
    with pytest.raises(LensError, match="output types conflict"):
        infer_output_ddl([{"a": 1}, {"a": "s"}])
    with pytest.raises(LensError, match="no json rows"):
        infer_output_ddl([None])


# ---- Spark level ------------------------------------------------------------


def test_apply_wasm_lens_probe_inferred_schema(spark, wasm_dir):
    df = spark.createDataFrame([("John", 30), ("Ann", 4)],
                               "Name string, Age long")
    out = apply_wasm_lens(df, str(wasm_dir / "rename.wasm"),
                          "transform", None)
    assert out.columns == ["FullName", "Age"]
    got = {(r.FullName, r.Age) for r in out.collect()}
    assert got == {("John", 30), ("Ann", 4)}


def test_apply_wasm_lens_explicit_schema_streams_partitions(spark, wasm_dir):
    df = spark.range(0, 5000).selectExpr("concat('n', id) AS Name",
                                         "id AS Age").repartition(8)
    out = apply_wasm_lens(df, str(wasm_dir / "rename.wasm"), "transform",
                          None, output_schema="FullName string, Age bigint")
    assert out.count() == 5000
    assert out.agg({"Age": "sum"}).collect()[0][0] == 5000 * 4999 // 2


def test_wasm_counter_single_partition_matches_reference_stream(spark,
                                                                wasm_dir):
    # one partition == the reference's single pull stream
    df = spark.range(0, 7).selectExpr("id AS a").coalesce(1)
    out = apply_wasm_lens(df, str(wasm_dir / "counter.wasm"), "transform",
                          None, output_schema="count bigint")
    assert sorted(r[0] for r in out.collect()) == list(range(1, 8))


# ---- lens-file / engine / CLI integration -----------------------------------


def test_lens_file_wasm_module_via_engine(spark, wasm_dir,
                                          module_paths_enabled):
    from lens_spark import engine

    spec = {"lenses": [{"path": f"file:{wasm_dir}/rename.wasm",
                        "arguments": {}}]}
    df = spark.createDataFrame([("John", 30)], "Name string, Age long")
    out = engine.append(df, spec).collect()
    assert (out[0].FullName, out[0].Age) == ("John", 30)
    back = engine.inverse(engine.append(df, spec), spec).collect()
    assert (back[0].Name, back[0].Age) == ("John", 30)


def test_lens_file_wasm_set_param_via_engine(spark, wasm_dir,
                                             module_paths_enabled):
    from lens_spark import engine

    spec = {"lenses": [{"path": f"file:{wasm_dir}/echo.wasm",
                        "arguments": {"greeting": "hi", "n": 3}}]}
    df = spark.createDataFrame([("x",), ("y",)], "v string")
    got = [(r.greeting, r.n) for r in engine.append(df, spec).collect()]
    assert got == [("hi", 3), ("hi", 3)]


def test_lens_file_wasm_filter_changes_length(spark, wasm_dir,
                                              module_paths_enabled):
    # M6-through-wasm: a wasm stage that drops rows composes with
    # native lenses in one spec
    from lens_spark import engine

    spec = {"lenses": [
        {"path": f"file:{wasm_dir}/filter.wasm",
         "arguments": {"output_schema": "tag string, id bigint"}},
        {"name": "add", "arguments": {"column": "id", "magnitude": 100}},
    ]}
    df = spark.createDataFrame(
        [("keep", 1), ("drop", 2), ("keep", 3)], "tag string, id long")
    got = sorted(r.id for r in engine.append(df, spec).collect())
    assert got == [101, 103]


def test_lens_file_wasm_explode_over_array_column(spark, wasm_dir,
                                                  module_paths_enabled):
    # M7-through-Spark: a 1:N wasm stage over a REAL array<string>
    # column (pandas hands the cell over as an ndarray — the r9 _py
    # fix: tolist before item, ndarray.item() raises for size != 1)
    from lens_spark import engine

    spec = {"lenses": [{"path": f"file:{wasm_dir}/explode.wasm",
                        "arguments": {"output_schema": "Book string"}}]}
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, []), (3, ["c"])],
        "id long, Books array<string>")
    got = sorted(r.Book for r in engine.append(df, spec).collect())
    assert got == ["a", "b", "c"]


def test_wasm_module_content_addressed_idempotent(wasm_dir,
                                                  module_paths_enabled):
    from lens_spark.modules import load_module_path

    name1 = load_module_path(f"file:{wasm_dir}/rename.wasm")
    name2 = load_module_path(f"file://{wasm_dir}/rename.wasm")
    assert name1 == name2 and name1.startswith("wasmmod_")


def test_wasm_data_url_loads(wasm_dir, module_paths_enabled):
    import base64

    from lens_spark.modules import load_module_path

    payload = (wasm_dir / "counter.wasm").read_bytes()
    url = ("data:application/wasm;base64,"
           + base64.b64encode(payload).decode())
    assert load_module_path(url).startswith("wasmmod_")


def test_wasm_staging_rejects_substituted_bytes(wasm_dir,
                                                module_paths_enabled):
    """r8 advice (TOCTOU): a pre-created/poisoned file at the staged
    content-addressed path must NOT be silently executed — the stager
    re-hashes and rewrites on mismatch, the loader pins the declared
    digest, and the staging dir itself is private (0700, owner-only)."""
    import base64
    import hashlib
    import os
    import stat

    from lens_spark import wasm as wasm_host
    from lens_spark.modules import _wasm_staging_dir, load_module_path

    payload = (wasm_dir / "rename.wasm").read_bytes()
    digest = hashlib.sha256(payload).hexdigest()
    staging = _wasm_staging_dir()
    st = os.stat(staging)
    assert st.st_uid == os.getuid() and not (st.st_mode & 0o077)
    # poison the content-addressed slot with DIFFERENT valid wasm
    poisoned = staging + f"/lens_wasm_{digest[:16]}.wasm"
    other = (wasm_dir / "counter.wasm").read_bytes()
    assert other != payload
    with open(poisoned, "wb") as f:
        f.write(other)
    url = ("data:application/wasm;base64,"
           + base64.b64encode(payload).decode())
    assert load_module_path(url).startswith("wasmmod_")
    # the stager detected the mismatch and rewrote the declared bytes
    with open(poisoned, "rb") as f:
        assert hashlib.sha256(f.read()).hexdigest() == digest
    # and the loader itself refuses a digest mismatch loudly
    with pytest.raises(LensError, match="declared payload digest"):
        wasm_host.load_wasm_path(str(wasm_dir / "counter.wasm"),
                                 expect_sha256=digest)


def test_wasm_still_gated_without_opt_in(wasm_dir):
    from lens_spark.model import LensConfig
    from lens_spark.modules import allow_module_paths

    allow_module_paths(False)
    with pytest.raises(LensError, match="disabled"):
        LensConfig.from_dict(
            {"lenses": [{"path": f"file:{wasm_dir}/rename.wasm"}]})


def test_cli_golden_wasm_module(spark, wasm_dir, tmp_path, monkeypatch,
                                module_paths_enabled):
    """The reference's simple_test.go golden (rust_wasm32_simple:
    Name → FullName through the CLI), run against our ABI-equivalent
    wasm module — the full stdin-json → wasm → stdout-json path."""
    from lens_spark.cli import main

    lensfile = tmp_path / "lens.json"
    lensfile.write_text(json.dumps(
        {"lenses": [{"path": f"file:{wasm_dir}/rename.wasm"}]}))
    docs = [{"Age": 30, "Name": "John"}, None, {"Age": 31, "Name": "Fred"}]
    monkeypatch.setattr("sys.stdin", io.StringIO(json.dumps(docs)))
    out = io.StringIO()
    monkeypatch.setattr("sys.stdout", out)
    rc = main([str(lensfile), "--allow-module-paths"], _stop_session=False)
    assert rc == 0
    got = json.loads(out.getvalue())
    assert sorted((d or {}).get("Age", -1) for d in got) == [-1, 30, 31]
    assert {(d or {}).get("FullName") for d in got} == {None, "John", "Fred"}
    assert None in got  # nil doc rides through the wasm stage as nil
