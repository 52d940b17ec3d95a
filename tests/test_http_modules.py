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
