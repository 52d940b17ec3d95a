"""CLI end-to-end golden tests — layer 3 of the reference's test pyramid
(tests/integration/cli/: utlis.go TestCase{LensFile, Input,
ExpectedOutput, ExpectedError}), run in-process against the shared
session (a subprocess per case would pay ~10 s of Spark startup each;
the code path exercised is identical).
"""

from __future__ import annotations

import io
import json

import pytest

from lens_spark.cli import main
from lens_spark.errors import LensError


def run_cli(tmp_path, monkeypatch, spec: dict, docs, extra_args: list[str] = ()):
    lensfile = tmp_path / "lens.json"
    lensfile.write_text(json.dumps(spec))
    monkeypatch.setattr("sys.stdin", io.StringIO(json.dumps(docs)))
    out = io.StringIO()
    monkeypatch.setattr("sys.stdout", out)
    rc = main([str(lensfile), *extra_args], _stop_session=False)
    assert rc == 0
    return json.loads(out.getvalue())


PEOPLE = [{"Age": 30, "Name": "John"}, {"Age": 31, "Name": "Fred"}]


def test_empty_pipeline_is_identity(spark, tmp_path, monkeypatch):
    # ≙ simple_test.go:66-110
    got = run_cli(tmp_path, monkeypatch, {"lenses": []}, PEOPLE)
    assert sorted(got, key=lambda d: d["Age"]) == PEOPLE


def test_rename_golden(spark, tmp_path, monkeypatch):
    # ≙ simple_test.go:23-60 (rust_wasm32_simple: Name → FullName)
    spec = {"lenses": [{"name": "rename",
                        "arguments": {"src": "Name", "dst": "FullName"}}]}
    got = run_cli(tmp_path, monkeypatch, spec, PEOPLE)
    assert sorted(got, key=lambda d: d["Age"]) == [
        {"Age": 30, "FullName": "John"}, {"Age": 31, "FullName": "Fred"}]


def test_chained_modules_with_params(spark, tmp_path, monkeypatch):
    # ≙ with_modules_params_test.go: two parameterized renames + add
    spec = {"lenses": [
        {"name": "rename", "arguments": {"src": "Name", "dst": "FirstName"}},
        {"name": "rename", "arguments": {"src": "FirstName", "dst": "FullName"}},
        {"name": "add", "arguments": {"column": "Age", "magnitude": 10}},
    ]}
    got = run_cli(tmp_path, monkeypatch, spec, PEOPLE)
    assert sorted(got, key=lambda d: d["Age"]) == [
        {"Age": 40, "FullName": "John"}, {"Age": 41, "FullName": "Fred"}]


def test_filter_and_explode_change_length(spark, tmp_path, monkeypatch):
    # ≙ with_len_change_test.go:9-104 (filter M6, normalize/explode M7)
    docs = [{"__type": "pass", "Books": ["a", "b"]},
            {"__type": "skip", "Books": ["c"]}]
    spec = {"lenses": [
        {"name": "filter", "arguments": {"column": "__type", "equals": "pass"}},
        {"name": "explode", "arguments": {"column": "Books", "out": "Book"}},
        {"name": "drop", "arguments": {"columns": ["__type"]}},
    ]}
    got = run_cli(tmp_path, monkeypatch, spec, docs)
    assert sorted(got, key=lambda d: d["Book"]) == [{"Book": "a"}, {"Book": "b"}]


def test_inverse_flag_applies_inverted_pipeline(spark, tmp_path, monkeypatch):
    # ≙ with_inverse_test.go:14-52
    spec = {"lenses": [{"name": "add",
                        "arguments": {"column": "Age", "magnitude": 5}}]}
    got = run_cli(tmp_path, monkeypatch, spec, PEOPLE, ["--inverse"])
    assert sorted(d["Age"] for d in got) == [25, 26]


def test_missing_inverse_errors(spark, tmp_path, monkeypatch):
    # ≙ with_inverse_test.go:54-85 (module without inverse)
    spec = {"lenses": [{"name": "filter",
                        "arguments": {"column": "Name", "equals": "John"}}]}
    with pytest.raises(LensError, match="does not define an inverse"):
        run_cli(tmp_path, monkeypatch, spec, PEOPLE, ["--inverse"])


def test_missing_column_error_text(spark, tmp_path, monkeypatch):
    # ≙ rust_wasm32_rename error path (src/lib.rs:24-27)
    spec = {"lenses": [{"name": "rename",
                        "arguments": {"src": "Nope", "dst": "X"}}]}
    with pytest.raises(LensError, match="property with name 'Nope' not found"):
        run_cli(tmp_path, monkeypatch, spec, PEOPLE)


def test_file_input_output_roundtrip(spark, tmp_path, monkeypatch):
    src = spark.createDataFrame(PEOPLE)
    in_path = str(tmp_path / "in.parquet")
    out_path = str(tmp_path / "out.json")
    src.write.parquet(in_path)
    lensfile = tmp_path / "lens.json"
    lensfile.write_text(json.dumps(
        {"lenses": [{"name": "rename",
                     "arguments": {"src": "Name", "dst": "FullName"}}]}))
    rc = main([str(lensfile), "--input", in_path, "--output", out_path],
              _stop_session=False)
    assert rc == 0
    back = spark.read.json(out_path)
    assert set(back.columns) == {"Age", "FullName"}
    assert back.count() == 2


def test_csv_input_output_roundtrip(spark, tmp_path, monkeypatch):
    """CSV in → pipeline → CSV out, with headers and inferred types
    (the CLI contract is typed documents, not all-string rows)."""
    src = spark.createDataFrame(PEOPLE)
    in_path = str(tmp_path / "in.csv")
    out_path = str(tmp_path / "out.csv")
    src.write.option("header", True).csv(in_path)
    lensfile = tmp_path / "lens.json"
    lensfile.write_text(json.dumps(
        {"lenses": [{"name": "add",
                     "arguments": {"column": "Age", "magnitude": 1}}]}))
    rc = main([str(lensfile), "--input", in_path, "--output", out_path],
              _stop_session=False)
    assert rc == 0
    back = spark.read.option("header", True).option("inferSchema", True) \
        .csv(out_path)
    assert set(back.columns) == {"Age", "Name"}
    assert {r.Age for r in back.collect()} == {31, 32}  # typed, incremented


def test_nil_documents_flow_through(spark, tmp_path, monkeypatch):
    # ≙ simple_test.go:168-218: JSON null items survive the pipeline
    spec = {"lenses": [{"name": "rename",
                        "arguments": {"src": "Name", "dst": "FullName"}}]}
    got = run_cli(tmp_path, monkeypatch, spec, [None, {"Age": 30, "Name": "John"}])
    assert None in got
    assert {"Age": 30, "FullName": "John"} in got
    assert len(got) == 2


def test_all_nil_input(spark, tmp_path, monkeypatch):
    got = run_cli(tmp_path, monkeypatch, {"lenses": []}, [None, None])
    assert got == [None, None]


_CLI_MODULE_SRC = """
OUTPUT_SCHEMA = "Name string, Age bigint"

def transform(batches, params):
    for pdf in batches:
        out = pdf.copy()
        out["Age"] = out["Age"] * int(params.get("factor", 1))
        yield out
"""


def test_lens_file_with_module_path_needs_opt_in(spark, tmp_path, monkeypatch):
    # golden rejection, then success with --allow-module-paths: the
    # reference loads module paths unconditionally (engine.go:67-104);
    # here executing external Python is an explicit CLI decision
    mod = tmp_path / "mod.py"
    mod.write_text(_CLI_MODULE_SRC)
    spec = {"lenses": [{"path": f"file:{mod}", "arguments": {"factor": 2}}]}
    with pytest.raises(LensError, match="disabled"):
        run_cli(tmp_path, monkeypatch, spec, PEOPLE)
    got = run_cli(tmp_path, monkeypatch, spec, PEOPLE,
                  extra_args=["--allow-module-paths"])
    assert sorted(d["Age"] for d in got) == [60, 62]
    # reset the process-wide opt-in the flag switched on
    from lens_spark.modules import allow_module_paths

    allow_module_paths(False)


_COLS_SPY_SRC = """
OUTPUT_SCHEMA = "seen string"

def transform(batches, params):
    import pandas as pd
    for pdf in batches:
        yield pd.DataFrame({"seen": [",".join(sorted(pdf.columns))] * len(pdf)})
"""


def test_module_fn_never_sees_reserved_meta_columns(spark, tmp_path, monkeypatch):
    # advisory fix: the CLI's hidden __lens_nil flag must not leak into
    # user batch-fns — a module sees exactly the library-API columns
    mod = tmp_path / "spy.py"
    mod.write_text(_COLS_SPY_SRC)
    spec = {"lenses": [{"path": f"file:{mod}"}]}
    got = run_cli(tmp_path, monkeypatch, spec,
                  [None, {"Age": 30, "Name": "John"}],
                  extra_args=["--allow-module-paths"])
    from lens_spark.modules import allow_module_paths

    allow_module_paths(False)
    seen = {d["seen"] for d in got if d is not None}
    assert seen == {"Age,Name"}, f"module saw meta columns: {seen}"


def test_cli_dedup_matches_library_semantics(spark, tmp_path, monkeypatch):
    # all-columns dedup must ignore the hidden nil flag: identical docs
    # dedup identically whether the spec runs via CLI or library API
    spec = {"lenses": [{"name": "dedup_exact"}]}
    got = run_cli(tmp_path, monkeypatch, spec,
                  [{"Age": 1}, {"Age": 1}, None, {"Age": 2}])
    assert sorted(
        (json.dumps(d, sort_keys=True) for d in got)
    ) == ["null", '{"Age": 1}', '{"Age": 2}']


def test_nil_not_conflated_with_empty_doc(spark, tmp_path, monkeypatch):
    # [{}, null] must round-trip as [{}, null] — nil (TypeId=0) and an
    # empty json doc are distinct kinds in the reference protocol
    got = run_cli(tmp_path, monkeypatch, {"lenses": []}, [{}, None])
    assert got == [{}, None]


def test_nil_not_conflated_with_all_null_row(spark, tmp_path, monkeypatch):
    # A row whose fields all BECOME null is still a json doc, not nil:
    # nil-ness is tracked per input item, not inferred from the output
    spec = {"lenses": [{"name": "set",
                        "arguments": {"column": "Age",
                                      "expr": "CAST(NULL AS BIGINT)"}}]}
    got = run_cli(tmp_path, monkeypatch, spec, [{"Age": 1}, None])
    assert got == [{}, None]  # nulled-out doc serializes as {}, nil stays nil


def test_cli_explain_prints_plan_and_skips_execution(tmp_path, capsys, spark):
    """--explain prints the formatted physical plan and writes nothing."""
    import json as _json

    from lens_spark.cli import main

    lens = tmp_path / "p.json"
    lens.write_text(_json.dumps({"lenses": [
        {"name": "filter", "arguments": {"predicate": "o_orderstatus = 'F'"}}]}))
    out = tmp_path / "never.parquet"
    rc = main([str(lens), "--input",
               "/root/testdata/sf0.001/orders.parquet",
               "--output", str(out), "--explain"], _stop_session=False)
    captured = capsys.readouterr().out
    assert rc == 0
    assert "== Physical Plan ==" in captured
    assert "PushedFilters" in captured        # the filter reached the scan
    assert not out.exists()                   # nothing executed


def test_round6_lenses_run_through_the_cli(spark, tmp_path, monkeypatch):
    """The r6 operators are full citizens of the stdin-JSON CLI
    surface: a classifier-score + score-band + novelty chain runs end
    to end on documents shaped like the reference's, appending the
    three analysis columns."""
    docs = [
        {"doc_id": 1, "src": "a", "text": "alpha beta gamma alpha beta"},
        {"doc_id": 2, "src": "a", "text": "totally different words here"},
        {"doc_id": 3, "src": "b", "text": "alpha beta gamma alpha beta"},
    ]
    spec = {"lenses": [
        {"name": "classifier_score", "arguments": {
            "id": "doc_id", "column": "text",
            "weights": [0.1, -0.2, 0.3, -0.4], "bias": 0.05}},
        {"name": "score_band", "arguments": {
            "column": "clf_score", "id": "doc_id", "strata": "src",
            "bands": 2}},
        {"name": "ngram_novelty", "arguments": {
            "id": "doc_id", "column": "text"}},
    ]}
    got = sorted(run_cli(tmp_path, monkeypatch, spec, docs),
                 key=lambda d: d["doc_id"])
    assert all({"clf_score", "band", "novelty"} <= set(d) for d in got)
    # docs 1 and 3 are verbatim dups → novelty 0; doc 2 is unique → 1
    assert got[0]["novelty"] == 0.0 and got[2]["novelty"] == 0.0
    assert got[1]["novelty"] == 1.0
    assert {d["band"] for d in got} <= {0, 1}


def test_saved_model_applies_via_cli_lens_file(spark, tmp_path, monkeypatch):
    """r9: a lens file naming only model_id + registry scores through
    the CLI — the fit-once/apply-many pipeline is fully declarable at
    the reference's primary surface. Weights chosen so bucket lookups
    are human-checkable: sigmoid(bias)=0.5 for the token-less doc."""
    from lens_spark.models import save_model
    from lens_spark.registry import Registry

    reg = Registry(tmp_path / "reg")
    mid = save_model(reg, "linear_classifier",
                     {"weights": [0.0] * 16, "bias": 0.0})
    spec = {"lenses": [{"name": "classifier_score", "arguments": {
        "id": "id", "column": "text", "model_id": mid,
        "registry": str(reg.root)}}]}
    docs = [{"id": 1, "text": "alpha beta"}, {"id": 2, "text": ""}]
    got = run_cli(tmp_path, monkeypatch, spec, docs)
    # all-zero weights + zero bias → sigmoid(0) = 0.5 for every doc
    assert sorted(got, key=lambda d: d["id"]) == [
        {"id": 1, "text": "alpha beta", "clf_score": 0.5},
        {"id": 2, "text": "", "clf_score": 0.5}]
    # unknown model id fails loudly at spec compile, not mid-query
    bad = dict(spec)
    bad["lenses"] = [{"name": "classifier_score", "arguments": {
        "id": "id", "column": "text",
        "model_id": "lens1b-" + "0" * 64, "registry": str(reg.root)}}]
    lensfile = tmp_path / "bad.json"
    lensfile.write_text(json.dumps(bad))
    monkeypatch.setattr("sys.stdin", io.StringIO(json.dumps(docs)))
    monkeypatch.setattr("sys.stdout", io.StringIO())
    with pytest.raises(LensError, match="not found"):
        main([str(lensfile)], _stop_session=False)


def test_bloom_and_ivf_artifacts_apply_via_cli_lens_file(spark, tmp_path,
                                                         monkeypatch):
    """r10: the two new artifact-serving paths are fully declarable at
    the reference's primary surface — a lens file naming only
    model_id + registry (no benchmark path, no quantizer params)
    decontaminates against a saved bloom_bitset and serves IVF top-k
    against saved kmeans_centroids through the CLI."""
    from lens_spark.models import save_bloom, save_model
    from lens_spark.registry import Registry

    reg = Registry(tmp_path / "reg")
    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], "bid long, text string")
    bloom_id = save_bloom(reg, bench, "text", ngram=5)
    spec = {"lenses": [{"name": "bloom_decontaminate", "arguments": {
        "id": "id", "column": "text", "model_id": bloom_id,
        "registry": str(reg.root)}}]}
    docs = [{"id": 1, "text": "alpha beta gamma delta epsilon"},
            {"id": 2, "text": "clean words entirely elsewhere found"}]
    got = run_cli(tmp_path, monkeypatch, spec, docs)
    assert [d["id"] for d in got] == [2]      # benchmark doc dropped
    # IVF: two orthogonal saved centroids route the query to its cell
    kid = save_model(reg, "kmeans_centroids",
                     [[1.0, 0.0], [0.0, 1.0]])
    spec2 = {"lenses": [{"name": "similarity_topk", "arguments": {
        "id": "id", "vector": "v", "k": 1, "method": "ivf",
        "nprobe": 1, "query_predicate": "id = 1",
        "model_id": kid, "registry": str(reg.root)}}]}
    vecs = [{"id": 1, "v": [1.0, 0.1]}, {"id": 2, "v": [0.9, 0.2]},
            {"id": 3, "v": [0.1, 1.0]}]
    got2 = run_cli(tmp_path, monkeypatch, spec2, vecs)
    # query 1 lives in the x-cell with id 2; id 3 is in the other cell
    assert [(d["query_id"], d["neighbor_id"]) for d in got2] == [(1, 2)]


def test_ivfpq_index_serves_via_cli_lens_file(spark, tmp_path, monkeypatch):
    """r11: the materialized IVFADC index is fully declarable at the
    reference's primary surface — a lens file naming only the index
    path (+ optional rerank_table) serves top-k through the CLI; the
    fit ran once at build time, the CLI job reads codes only."""
    from lens_spark.operators.similarity import ivfpq_index_build

    corpus = spark.createDataFrame(
        [(i, [1.0 if j == i % 4 else 0.05 * ((i + j) % 3)
              for j in range(8)]) for i in range(32)],
        "id long, v array<double>")
    idx = str(tmp_path / "idx")
    ivfpq_index_build(corpus, idx, id_col="id", vec_col="v", dim=8,
                      nlist=4, m=4, nbits=4)
    spec = {"lenses": [{"name": "ivfpq_search", "arguments": {
        "index": idx, "id": "id", "vector": "v", "k": 2,
        "nprobe": 1}}]}
    queries = [{"id": 100, "v": [1.0, 0.0, 0.0, 0.0,
                                 0.0, 0.0, 0.0, 0.0]}]
    got = run_cli(tmp_path, monkeypatch, spec, queries)
    assert len(got) == 2
    assert all(d["query_id"] == 100 for d in got)
    # the 1.0-at-dim-0 pattern is the id%4==0 family
    assert all(d["neighbor_id"] % 4 == 0 for d in got)
    assert got[0]["rank"] == 1 and got[0]["score"] >= got[1]["score"]
