"""http(s): lens-module fetch — the reference accepts module URLs over
http (host-go/engine/engine.go:76-88); here the fetch is a DOUBLE
opt-in (execution + network) with trust-on-first-use sha256 pinning,
tested against a loopback HTTP server (no external network needed).
Closes the last SURVEY §2.8 'known divergence': the allow-flag design
is now implemented and golden-tested, not just specified."""

from __future__ import annotations

import http.server
import threading

import pytest

from lens_spark.errors import LensError

_MOD_SRC = b"""
OUTPUT_SCHEMA = "Name string, Age bigint"

def transform(batches, params):
    for pdf in batches:
        out = pdf.copy()
        out["Age"] = out["Age"] + int(params.get("delta", 0))
        yield out
"""


@pytest.fixture
def http_host():
    """Loopback HTTP server serving a mutable {path: bytes} dict."""
    files: dict[str, bytes] = {"/mod.py": _MOD_SRC}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — stdlib naming
            body = files.get(self.path)
            if body is None:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence per-request stderr noise
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", files
    finally:
        srv.shutdown()


@pytest.fixture
def gates():
    """Both opt-ins on, restored after; pin file cleared per test so
    trust-on-first-use starts fresh (ephemeral ports would otherwise
    leak pins across tests)."""
    import os

    from lens_spark.modules import (
        _http_pins_path,
        allow_http_modules,
        allow_module_paths,
    )

    allow_module_paths(True)
    allow_http_modules(True)
    try:
        os.remove(_http_pins_path())
    except OSError:
        pass
    yield
    allow_module_paths(False)
    allow_http_modules(False)


def test_http_module_needs_both_opt_ins(http_host):
    from lens_spark.modules import (
        allow_http_modules,
        allow_module_paths,
        load_module_path,
    )

    base, _ = http_host
    url = f"{base}/mod.py"
    # no opt-ins at all: the execution gate fires first
    allow_module_paths(False)
    allow_http_modules(False)
    with pytest.raises(LensError, match="disabled"):
        load_module_path(url)
    # execution allowed but network not: the http gate fires, naming
    # the specific opt-in
    allow_module_paths(True)
    try:
        with pytest.raises(LensError, match="allow_http_modules"):
            load_module_path(url)
    finally:
        allow_module_paths(False)


def test_http_module_loads_and_is_content_addressed(http_host, gates):
    from lens_spark.modules import load_module_path

    base, _ = http_host
    name = load_module_path(f"{base}/mod.py")
    assert name.startswith("pymod_")
    # same content via data: resolves to the SAME registered lens —
    # the http fetch routes through the shared content-addressed path
    import base64

    b64 = base64.b64encode(_MOD_SRC).decode("ascii")
    assert load_module_path(f"data:text/x-python;base64,{b64}") == name
    # and the fetched module actually runs in a pipeline
    import pandas as pd

    from lens_spark.operators.udf import _UDF_LENSES

    fn = _UDF_LENSES[name]["fn"]
    out = list(fn(iter([pd.DataFrame({"Name": ["a"], "Age": [30]})]),
                  {"delta": 5}))
    assert out[0]["Age"].tolist() == [35]


def test_http_module_pin_refuses_changed_content(http_host, gates):
    from lens_spark.modules import load_module_path

    base, files = http_host
    url = f"{base}/mod.py"
    load_module_path(url)            # pins sha256 on first use
    load_module_path(url)            # same content: re-verified, fine
    files["/mod.py"] = _MOD_SRC + b"\n# changed\n"
    with pytest.raises(LensError, match="content changed"):
        load_module_path(url)        # supply-chain event: refused


def test_http_wasm_routes_to_wasm_host(http_host, gates):
    from lens_spark.wasm import wasm_available

    if not wasm_available():
        pytest.skip("no node binary on PATH")
    from lens_spark.modules import load_module_path
    from lens_spark.wasm.testmods import rename_simple

    base, files = http_host
    files["/rename.wasm"] = rename_simple()
    name = load_module_path(f"{base}/rename.wasm")
    name2 = load_module_path(f"{base}/rename.wasm")
    assert name == name2  # content-addressed, idempotent


def test_http_pin_file_is_durable_not_tmp(monkeypatch, tmp_path):
    """r12 advice: a pin in the ephemeral staging dir dies with a tmp
    cleaner and the next fetch re-pins whatever the server serves.
    The pin file lives under XDG_STATE_HOME (or ~/.local/state), never
    the /tmp staging dir, and the dir is created private."""
    import os
    import stat

    from lens_spark.modules import _http_pins_path, _wasm_staging_dir

    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))
    p = _http_pins_path()
    assert p.startswith(str(tmp_path / "state"))
    assert not p.startswith(_wasm_staging_dir())
    mode = stat.S_IMODE(os.stat(os.path.dirname(p)).st_mode)
    assert mode == 0o700


def test_http_pin_legacy_staging_file_migrates(monkeypatch, tmp_path):
    """r13 advice: moving the pin file to XDG_STATE_HOME must not
    orphan pins recorded at the old staging-dir location — that would
    guarantee one silent re-pin per already-pinned URL, exactly the
    content change TOFU exists to catch. Legacy entries merge into the
    durable file on first use (legacy fills gaps, durable entries
    win), and the legacy file retires so the merge is one-time."""
    import json
    import os

    from lens_spark.modules import _http_pins_path, _wasm_staging_dir

    legacy = os.path.join(_wasm_staging_dir(), "http_module_pins.json")
    with open(legacy, "w") as fh:
        json.dump({"http://a/x.py": "aa", "http://b/y.py": "bb"}, fh)
    try:
        state = tmp_path / "state"
        monkeypatch.setenv("XDG_STATE_HOME", str(state))
        durable = os.path.join(str(state), "lens_spark",
                               "http_module_pins.json")
        os.makedirs(os.path.dirname(durable), exist_ok=True)
        with open(durable, "w") as fh:
            json.dump({"http://b/y.py": "NEW"}, fh)

        p = _http_pins_path()
        assert p == durable
        with open(p) as fh:
            assert json.load(fh) == {"http://a/x.py": "aa",
                                     "http://b/y.py": "NEW"}
        assert not os.path.exists(legacy)
        assert os.path.exists(legacy + ".migrated")
        # one-time: a later deliberate re-pin file is never overwritten
        with open(p, "w") as fh:
            json.dump({}, fh)
        _http_pins_path()
        with open(p) as fh:
            assert json.load(fh) == {}
    finally:
        for f in (legacy, legacy + ".migrated"):
            if os.path.exists(f):
                os.remove(f)


def test_http_fetch_rejects_cross_origin_redirect(http_host, gates,
                                                  monkeypatch, tmp_path):
    """r12 advice: urllib follows redirects blindly — including a
    downgrade to an attacker-chosen host BEFORE the first-use pin is
    recorded. Same-origin redirects still work; any scheme/host change
    refuses loudly and nothing is pinned."""
    import json
    import os

    from lens_spark.modules import _http_pins_path, load_module_path

    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))
    base, files = http_host
    # same-origin redirect: followed, loads, pins the ORIGINAL url
    files["/redir"] = b""

    import http.server

    # patch the fixture's handler? simpler: spin a dedicated server
    class RedirHandler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path == "/same":
                self.send_response(302)
                self.send_header("Location", "/mod.py")
                self.end_headers()
            elif self.path == "/mod.py":
                self.send_response(200)
                self.send_header("Content-Length", str(len(_MOD_SRC)))
                self.end_headers()
                self.wfile.write(_MOD_SRC)
            elif self.path == "/evil":
                self.send_response(302)
                self.send_header("Location",
                                 "http://127.0.0.1:9/mod.py")
                self.end_headers()
            else:
                self.send_error(404)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), RedirHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        rbase = f"http://127.0.0.1:{srv.server_address[1]}"
        name = load_module_path(f"{rbase}/same")
        assert name.startswith("pymod_")
        pins = json.load(open(_http_pins_path()))
        assert f"{rbase}/same" in pins
        # cross-origin (different port = different netloc): refused,
        # and the poisoned URL is never pinned
        with pytest.raises(LensError, match="refusing redirect"):
            load_module_path(f"{rbase}/evil")
        pins = json.load(open(_http_pins_path()))
        assert f"{rbase}/evil" not in pins
    finally:
        srv.shutdown()
        try:
            os.remove(_http_pins_path())
        except OSError:
            pass


def test_http_fetch_caps_response_size(http_host, gates, monkeypatch,
                                       tmp_path):
    """r12 advice: an uncapped first fetch trusts (and pins)
    arbitrarily large content. Over-cap bodies refuse before hashing
    and nothing is pinned."""
    import json
    import os

    from lens_spark import modules

    monkeypatch.setenv("XDG_STATE_HOME", str(tmp_path / "state"))
    monkeypatch.setattr(modules, "HTTP_MODULE_MAX_BYTES", 16)
    base, files = http_host
    files["/big.py"] = b"x = 1\n" * 100
    with pytest.raises(LensError, match="fetch cap"):
        modules.load_module_path(f"{base}/big.py")
    assert not os.path.exists(modules._http_pins_path()) or \
        f"{base}/big.py" not in json.load(open(modules._http_pins_path()))
    try:
        os.remove(modules._http_pins_path())
    except OSError:
        pass
