"""Pipeline-spec model: codec, content addressing, inversion."""

from __future__ import annotations

import pytest

from lens_spark.errors import LensError
from lens_spark.model import LensConfig, LensModule, is_valid_content_id


def test_json_round_trip():
    raw = '{"lenses": [{"name": "rename", "inverse": false, "arguments": {"src": "a", "dst": "b"}}]}'
    cfg = LensConfig.from_json(raw)
    assert cfg.lenses == (LensModule("rename", False, {"src": "a", "dst": "b"}),)
    assert LensConfig.from_json(cfg.to_json()) == cfg


def test_path_key_accepted_like_reference_lens_files():
    # The reference lens file uses "path" (config/model/lens.go:19-30).
    cfg = LensConfig.from_dict(
        {"lenses": [{"path": "builtin:rename", "arguments": {"src": "a", "dst": "b"}}]}
    )
    assert cfg.lenses[0].name == "rename"


def test_module_paths_rejected_by_default():
    # golden rejection text: the lens-file portability gap is an
    # explicit, documented error until the user opts in
    with pytest.raises(LensError, match="disabled.*allow_module_paths"):
        LensConfig.from_dict({"lenses": [{"path": "file:///tmp/lens.py"}]})
    with pytest.raises(LensError, match="disabled"):
        LensConfig.from_dict({"lenses": [{"path": "data:,x = 1"}]})
    # http(s) module urls (loadable since r12 behind the DOUBLE
    # opt-in, tests/test_http_modules.py) hit the execution gate
    # first when nothing is allowed; a non-module remote scheme is
    # never loadable under any opt-in
    with pytest.raises(LensError, match="disabled"):
        LensConfig.from_dict({"lenses": [{"path": "https://x.test/lens.wasm"}]})
    with pytest.raises(LensError, match="not other remote"):
        LensConfig.from_dict({"lenses": [{"path": "s3://bucket/lens.wasm"}]})


def test_wasm_module_paths_route_to_wasm_host(tmp_path, module_paths_enabled):
    """A .wasm payload is never exec'd as Python (round-2 gap: it died
    with a generic 'failed to load') — it routes to the wasm host
    (lens_spark.wasm) by extension, data: mime, or binary magic, and
    invalid wasm bytes fail with the host's instantiation error, in
    every detection path."""
    import base64

    # by payload magic, whatever the extension claims: routed to the
    # wasm host (not exec'd), where truncated bytes fail to instantiate
    p = tmp_path / "sneaky.py"
    p.write_bytes(b"\x00asm\x01\x00\x00\x00\xff")
    with pytest.raises(LensError,
                       match="instantiate|node"):
        LensConfig.from_dict({"lenses": [{"path": f"file:{p}"}]})
    # by data: mime
    with pytest.raises(LensError, match="instantiate|node"):
        LensConfig.from_dict(
            {"lenses": [{"path": "data:application/wasm;base64,"
                         + base64.b64encode(
                             b"\x00asm\x01\x00\x00\x00\xff").decode()}]})
    # with the opt-in OFF the gate fires before any wasm handling
    from lens_spark.modules import allow_module_paths

    allow_module_paths(False)
    with pytest.raises(LensError, match="disabled"):
        LensConfig.from_dict({"lenses": [{"path": "file:///tmp/lens.wasm"}]})


_MODULE_SRC = """
import pandas as pd

OUTPUT_SCHEMA = "Name string, Age bigint"

def transform(batches, params):
    shift = int(params.get("shift", 0))
    for pdf in batches:
        out = pdf.copy()
        out["Age"] = out["Age"] + shift
        yield out

INVERSE_SCHEMA = OUTPUT_SCHEMA

def inverse(batches, params):
    shift = int(params.get("shift", 0))
    for pdf in batches:
        out = pdf.copy()
        out["Age"] = out["Age"] - shift
        yield out
"""


@pytest.fixture
def module_paths_enabled():
    from lens_spark.modules import allow_module_paths

    allow_module_paths(True)
    yield
    allow_module_paths(False)


def test_data_url_module_loads_and_runs(spark, module_paths_enabled):
    import base64

    from lens_spark import engine

    url = ("data:text/x-python;base64,"
           + base64.b64encode(_MODULE_SRC.encode()).decode())
    spec = {"lenses": [{"path": url, "arguments": {"shift": 5}}]}
    df = spark.createDataFrame([("John", 30)], "Name string, Age long")
    out = engine.append(df, spec).collect()
    assert (out[0].Name, out[0].Age) == ("John", 35)
    # bidirectional: the module's inverse round-trips
    back = engine.inverse(engine.append(df, spec), spec).collect()
    assert (back[0].Name, back[0].Age) == ("John", 30)


def test_file_module_content_addressed_idempotent(tmp_path, module_paths_enabled):
    from lens_spark.modules import load_module_path

    p = tmp_path / "lens_mod.py"
    p.write_text(_MODULE_SRC)
    name1 = load_module_path(f"file:{p}")
    name2 = load_module_path(f"file://{p}")  # same content → same lens
    assert name1 == name2 and name1.startswith("pymod_")


def test_module_missing_contract_rejected(module_paths_enabled):
    with pytest.raises(LensError, match="must define transform"):
        LensConfig.from_dict({"lenses": [{"path": "data:,x%20%3D%201"}]})


def test_content_id_deterministic_and_argument_order_insensitive():
    # ≙ store dedup: identical configs → identical ids (store.go:31-33).
    a = LensConfig([LensModule("add", False, {"column": "Age", "magnitude": 1})])
    b = LensConfig([LensModule("add", False, {"magnitude": 1, "column": "Age"})])
    assert a.content_id() == b.content_id()
    assert is_valid_content_id(a.content_id())


def test_content_id_sensitive_to_order_and_flags():
    m1 = LensModule("rename", False, {"src": "a", "dst": "b"})
    m2 = LensModule("add", False, {"column": "b", "magnitude": 1})
    assert LensConfig([m1, m2]).content_id() != LensConfig([m2, m1]).content_id()
    assert (
        LensConfig([m1]).content_id()
        != LensConfig([m1.flipped()]).content_id()
    )


def test_inverted_reverses_and_flips():
    # E8 (repository.go:172-206): reverse order AND flip each flag.
    cfg = LensConfig(
        [
            LensModule("rename", False, {"src": "a", "dst": "b"}),
            LensModule("add", True, {"column": "b", "magnitude": 5}),
        ]
    )
    inv = cfg.inverted()
    assert [m.name for m in inv.lenses] == ["add", "rename"]
    assert [m.inverse for m in inv.lenses] == [False, True]
    assert inv.inverted() == cfg
