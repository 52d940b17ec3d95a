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


def test_wasm_paths_rejected():
    with pytest.raises(LensError):
        LensConfig.from_dict({"lenses": [{"path": "file:///tmp/lens.wasm"}]})


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
