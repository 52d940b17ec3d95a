"""WASM lens-module host — runs reference lens modules on Spark.

Closes the repo's longest-standing divergence: the reference's
loadable unit is a WASM binary speaking a tiny pull ABI
(/root/reference/host-go/engine/engine.go:67-104, sdk-rust/src/
lib.rs:42-58 — export ``memory``/``alloc``/``transform`` [+
``inverse``/``set_param``], import ``lens.next() -> i32``, items
framed ``[i8 type][u32le len][payload]``; type ids −1 err / 0 nil /
1 json / 127 EOS). This container has no wasmtime/wasmer Python
package and no network to fetch one, but Node.js ships a full
WebAssembly runtime — so the host is a small Node shim
(``host.js``) holding one module instance per stream, and Spark-side
execution is ``mapInPandas``: each PARTITION spawns one host process
and streams its rows through as json frames (the module pulls via
``next()``, may consume 0..N inputs per output, may hold state across
calls, emits in-band errors — the full reference envelope).

Gating: executing foreign code requires the SAME explicit opt-in as
Python modules (``lens_spark.modules.allow_module_paths``), plus a
``node`` binary on PATH (checked loudly). On a multi-node cluster the
``.wasm`` file must be readable at the same path on executors (ship
it with ``spark.files``); node must be on the executors' PATH.

Scale shape: one OS process per partition per stage, Arrow batches
row-serialized to json — this is the compatibility escape hatch, same
cost class as ``python_udf``'s per-item mode, NOT the 100 TB hot
path. The pipe is streamed with a bounded writer thread (no partition
materialization), and the test modules' allocators are constant-memory
per item, so partition size is unbounded.

Schemas: the ABI is dynamically typed json; Spark needs static
schemas. A lens stage may pass ``output_schema`` (DDL) in its
arguments; otherwise the host PROBES — runs the first
``_PROBE_ROWS`` driver-side rows through a fresh instance and infers
the DDL from the json outputs (documented: heterogeneous outputs need
the explicit schema). ``inverse_schema`` covers the inverse direction.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import shutil
import struct
import subprocess
import threading
from typing import Any, Iterable, Iterator, Mapping

import pandas as pd

from pyspark.sql import DataFrame

from lens_spark.errors import LensError

_HOST_JS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "host.js")
_PROBE_ROWS = 32
_CHUNK = 1024

_ERR, _NIL, _JSON, _EOS = -1, 0, 1, 127

_LOADED: dict[str, str] = {}  # wasm sha256 → registered lens name


def node_binary() -> str | None:
    return shutil.which("node")


def wasm_available() -> bool:
    """True when the Node-backed wasm host can run here."""
    return node_binary() is not None and os.path.exists(_HOST_JS)


def _require_node() -> str:
    node = node_binary()
    if node is None:
        raise LensError(
            "WASM lens modules need a `node` binary on PATH (the wasm "
            "host runs modules on Node's built-in WebAssembly runtime); "
            "none found — install Node.js or re-express the lens as a "
            "Python batch-fn module (see README)")
    return node


def _py(v: Any) -> Any:
    """json-encodable scalar from a pandas/numpy cell."""
    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN
        return None
    if isinstance(v, (str, bool, int, float)):
        return v
    if isinstance(v, bytes):
        return base64.b64encode(v).decode("ascii")
    if isinstance(v, dict):
        return {k: _py(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_py(x) for x in v]
    # tolist BEFORE item: both exist on every numpy value, but
    # ndarray.item() raises for size != 1 (an array<string> cell from
    # Spark arrives as an ndarray), while tolist() is right for
    # scalars and arrays alike
    if hasattr(v, "tolist"):
        return _py(v.tolist())
    if hasattr(v, "item"):  # non-numpy scalar wrappers
        return _py(v.item())
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return v


def run_wasm_pipe(wasm_path: str, items: Iterable[dict | None], *,
                  fn: str = "transform",
                  params: Mapping[str, Any] | None = None,
                  ) -> Iterator[dict | None]:
    """Stream items (``None`` = nil frame) through one module
    instance; yields output items. Raises :class:`LensError` on an
    in-band error frame (reference TypeId=-1 semantics)."""
    args = [_require_node(), _HOST_JS, wasm_path, fn]
    if params:
        args.append(base64.b64encode(
            json.dumps(dict(params)).encode("utf-8")).decode("ascii"))
    proc = subprocess.Popen(args, stdin=subprocess.PIPE,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL)

    def _writer() -> None:
        try:
            w = proc.stdin
            for item in items:
                if item is None:
                    w.write(bytes([_NIL]))
                else:
                    payload = json.dumps(item, ensure_ascii=False,
                                         default=_py).encode("utf-8")
                    w.write(struct.pack("<bI", _JSON, len(payload)))
                    w.write(payload)
            w.write(struct.pack("<b", _EOS))
            w.flush()
            w.close()
        except (BrokenPipeError, OSError):
            pass  # host exited early (error frame already on stdout)

    t = threading.Thread(target=_writer, daemon=True)
    t.start()
    try:
        r = proc.stdout
        while True:
            tb = r.read(1)
            if not tb:
                raise LensError(
                    f"wasm host for {os.path.basename(wasm_path)} exited "
                    "without an end-of-stream frame")
            tid = struct.unpack("<b", tb)[0]
            if tid == _EOS:
                break
            if tid == _NIL:
                yield None
                continue
            (ln,) = struct.unpack("<I", r.read(4))
            payload = r.read(ln)
            if tid == _ERR:
                raise LensError(
                    f"wasm lens error: {payload.decode('utf-8', 'replace')}")
            yield json.loads(payload)
    finally:
        proc.kill()
        proc.wait()
        t.join(timeout=5)


# ---- schema inference -------------------------------------------------------


def _merge_type(a: str | None, b: str | None) -> str | None:
    if a is None:
        return b
    if b is None or a == b:
        return a
    if {a, b} == {"bigint", "double"}:
        return "double"
    raise LensError(
        f"wasm lens output types conflict ({a} vs {b}) — pass an explicit "
        "output_schema argument")


def _json_type(v: Any) -> str | None:
    if v is None:
        return None
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    if isinstance(v, str):
        return "string"
    if isinstance(v, list):
        elem: str | None = None
        for x in v:
            elem = _merge_type(elem, _json_type(x))
        return f"array<{elem or 'string'}>"
    if isinstance(v, dict):
        inner = ", ".join(f"{k}: {_json_type(x) or 'string'}"
                          for k, x in v.items())
        return f"struct<{inner}>"
    raise LensError(f"cannot infer a Spark type for wasm output value {v!r}")


def infer_output_ddl(samples: Iterable[dict | None]) -> str:
    """DDL from probe outputs: first-seen column order, types merged
    across rows (int+float → double; other conflicts are an error)."""
    order: list[str] = []
    types: dict[str, str | None] = {}
    n = 0
    for s in samples:
        if s is None:
            continue
        n += 1
        for k, v in s.items():
            if k not in types:
                order.append(k)
                types[k] = None
            types[k] = _merge_type(types[k], _json_type(v))
    if not n:
        raise LensError(
            "wasm lens schema probe produced no json rows — pass an "
            "explicit output_schema argument in the lens stage")
    return ", ".join(f"`{k}` {types[k] or 'string'}" for k in order)


# ---- Spark execution --------------------------------------------------------


def apply_wasm_lens(df: DataFrame, wasm_path: str, fn: str,
                    params: Mapping[str, Any] | None,
                    output_schema: str | None = None) -> DataFrame:
    """Run a DataFrame through a wasm lens stage via ``mapInPandas``
    (one host process per partition). Without ``output_schema`` the
    first ``_PROBE_ROWS`` rows are probed driver-side on a FRESH
    instance (instances are per-stream, so the probe never perturbs
    executor state — reference Reset semantics)."""
    from lens_spark.operators.udf import META_PREFIX, NIL_COL

    has_nil = NIL_COL in df.columns
    in_cols = [c for c in df.columns if not c.startswith(META_PREFIX)]

    def _to_items(pdf: pd.DataFrame) -> Iterator[dict | None]:
        nils = (pdf[NIL_COL].fillna(False).tolist()
                if has_nil and NIL_COL in pdf.columns
                else [False] * len(pdf))
        recs = pdf[[c for c in pdf.columns
                    if not c.startswith(META_PREFIX)]].to_dict("records")
        for rec, nil in zip(recs, nils):
            yield None if nil else {k: _py(v) for k, v in rec.items()}

    if output_schema is None:
        probe = df.limit(_PROBE_ROWS).toPandas()
        outs = list(run_wasm_pipe(wasm_path, _to_items(probe),
                                  fn=fn, params=params))
        output_schema = infer_output_ddl(outs)
    fields = [f.split()[0].strip("`")
              for f in _split_ddl(output_schema)]
    schema = output_schema + (f", {NIL_COL} boolean" if has_nil else "")

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def all_items() -> Iterator[dict | None]:
            for pdf in batches:
                yield from _to_items(pdf)

        buf: list[dict] = []
        for out in run_wasm_pipe(wasm_path, all_items(),
                                 fn=fn, params=params):
            if out is None:
                row = {f: None for f in fields}
                if has_nil:
                    row[NIL_COL] = True
                buf.append(row)
            else:
                row = {f: out.get(f) for f in fields}
                if has_nil:
                    row[NIL_COL] = False
                buf.append(row)
            if len(buf) >= _CHUNK:
                yield pd.DataFrame(buf)
                buf = []
        if buf:
            yield pd.DataFrame(buf)

    return df.mapInPandas(_run, schema=schema)


def _split_ddl(ddl: str) -> list[str]:
    """Split a DDL column list on top-level commas (nested
    struct/array commas don't count)."""
    parts, depth, cur = [], 0, []
    for ch in ddl:
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def load_wasm_path(fs_path: str, *, expect_sha256: str | None = None) -> str:
    """Register a ``.wasm`` lens module as a named lens
    (content-addressed ``wasmmod_<sha12>``, idempotent — ≙ the
    reference engine caching modules by config identity). The caller
    (modules.load_module_path) has already enforced the execution
    opt-in; here we enforce the node requirement. ``expect_sha256``
    (set when the caller staged a declared payload) pins the bytes we
    actually read — a staged file swapped between write and load is a
    loud error, not a silent module substitution (r8 advice)."""
    _require_node()
    with open(fs_path, "rb") as f:
        wasm_bytes = f.read()
    if wasm_bytes[:4] != b"\x00asm":
        raise LensError(f"{fs_path!r} is not a WebAssembly binary")
    digest = hashlib.sha256(wasm_bytes).hexdigest()
    if expect_sha256 is not None and digest != expect_sha256:
        raise LensError(
            f"wasm module at {fs_path!r} does not match its declared "
            f"payload digest (got sha256:{digest[:16]}…, expected "
            f"sha256:{expect_sha256[:16]}…) — refusing to execute "
            "substituted bytes")
    if digest in _LOADED:
        return _LOADED[digest]
    # compile-validate at load time, like the reference's NewModule
    # (runtimes/wasmtime/runtime.go:46-57 errors on bad bytes at
    # module creation, not first use)
    chk = subprocess.run(
        [_require_node(), "-e",
         "new WebAssembly.Module(require('fs').readFileSync("
         "process.argv[1]))", fs_path],
        capture_output=True, text=True)
    if chk.returncode != 0:
        tail = (chk.stderr or "").strip().splitlines()
        raise LensError(
            f"failed to instantiate wasm module {fs_path!r}: "
            f"{tail[-1] if tail else 'invalid module'}")
    name = f"wasmmod_{digest[:12]}"
    _register_wasm_lens(name, os.path.abspath(fs_path))
    _LOADED[digest] = name
    return name


def _register_wasm_lens(name: str, wasm_path: str) -> None:
    from lens_spark.operators.base import Lens, register_lens

    @register_lens(name)
    def factory(arguments: Mapping[str, Any]) -> Lens:
        params = dict(arguments or {})
        out_ddl = params.pop("output_schema", None)
        inv_ddl = params.pop("inverse_schema", None) or out_ddl
        return Lens(
            name, arguments,
            forward_fn=lambda df: apply_wasm_lens(
                df, wasm_path, "transform", params, out_ddl),
            inverse_fn=lambda df: apply_wasm_lens(
                df, wasm_path, "inverse", params, inv_ddl),
        )
