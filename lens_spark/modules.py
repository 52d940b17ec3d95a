"""External lens modules: ``file:`` / ``data:`` Python batch-fn and
WASM loading.

≙ the reference's module resolution — a lens-file stage points at a
module by path and the engine fetches + instantiates it
(/root/reference/host-go/engine/engine.go:67-104 accepts file/http/
data URLs for WASM blobs). Two loadable units:

- a **WASM lens binary** speaking the reference ABI — routed to the
  Node-backed host in :mod:`lens_spark.wasm` (detected by extension,
  ``data:`` mime, or binary magic);
- a *Python batch-fn module*: a ``.py`` source defining

    OUTPUT_SCHEMA = "col type, ..."          # DDL of the output rows
    def transform(batches, params): ...      # Arrow-batch iterator fn
    # optional bidirectionality:
    INVERSE_SCHEMA = "col type, ..."
    def inverse(batches, params): ...

The stage's ``arguments`` arrive as ``params`` (≙ set_param). Modules
are content-addressed: the registered lens name is ``pymod_<sha256
prefix>`` of the source bytes, so identical sources are loaded once and
a lens file referencing a module by path produces the same pipeline
anywhere the same source resolves.

Loading EXECUTES arbitrary code, so it is **disabled by default** and
gated behind an explicit opt-in: call ``allow_module_paths(True)``, set
``LENS_SPARK_ALLOW_MODULE_PATHS=1``, or pass ``--allow-module-paths``
to the CLI. ``http(s):`` module URLs — which the reference fetches
unconditionally (host-go/engine/engine.go:76-88) — additionally
require a SECOND opt-in (``allow_http_modules(True)`` /
``LENS_SPARK_ALLOW_HTTP_MODULES=1`` / ``--allow-http-modules``),
because fetching executable code from a URL at plan time is
config-file RCE. The fetch is TRUST-ON-FIRST-USE digest-pinned: the
first fetch of a URL records its sha256 in a pin file under the
private staging dir; every later fetch of the same URL must hash to
the pinned digest or loading refuses loudly — a URL whose content
changes is exactly the supply-chain event the pin exists to catch.
The fetched bytes then route through the SAME content-addressed
``data:`` path as any other module (wasm by magic/extension, python
otherwise), so staging/verification/registration are identical.

Supported URL forms (RFC 2397 for data):
- ``file:/abs/path/lens.py`` or ``file:///abs/path/lens.py``
- ``data:text/x-python;base64,<b64>`` / ``data:,<urlencoded source>``
- ``http(s)://host/path/lens.{py,wasm}`` (double opt-in, sha256 TOFU)
"""

from __future__ import annotations

import base64
import hashlib
import os
import urllib.parse
from typing import Any, Mapping

from lens_spark.errors import LensError

_ALLOW: bool | None = None  # None → consult the environment variable

_LOADED: dict[str, str] = {}  # source sha → registered lens name


def allow_module_paths(enabled: bool = True) -> None:
    """Process-wide opt-in for executing file:/data: lens modules."""
    global _ALLOW
    _ALLOW = bool(enabled)


_ALLOW_HTTP: bool | None = None  # None → consult the environment variable


def allow_http_modules(enabled: bool = True) -> None:
    """Process-wide opt-in for FETCHING http(s): lens modules (the
    execution opt-in ``allow_module_paths`` is still required on top
    — fetching and executing are separate decisions)."""
    global _ALLOW_HTTP
    _ALLOW_HTTP = bool(enabled)


def http_modules_allowed() -> bool:
    if _ALLOW_HTTP is not None:
        return _ALLOW_HTTP
    return os.environ.get("LENS_SPARK_ALLOW_HTTP_MODULES", "").lower() in (
        "1", "true", "yes")


def module_paths_allowed() -> bool:
    if _ALLOW is not None:
        return _ALLOW
    return os.environ.get("LENS_SPARK_ALLOW_MODULE_PATHS", "").lower() in (
        "1", "true", "yes")


_WASM_MAGIC = b"\x00asm"  # WebAssembly binary magic (public wasm spec §5.5.16)


def _wasm_staging_dir() -> str:
    """Private (mode-0700, owner-verified) per-user staging dir for
    ``data:`` wasm payloads. A world-shared predictable /tmp path is a
    TOCTOU hole (r8 advice: another local user pre-creates the file
    and their wasm runs in place of the declared payload) — so stage
    under a directory only this uid can write, and fall back to a
    fresh ``mkdtemp`` if the preferred name exists but is not ours."""
    import tempfile

    preferred = os.path.join(tempfile.gettempdir(),
                             f"lens_spark_wasm_{os.getuid()}")
    try:
        os.makedirs(preferred, mode=0o700, exist_ok=True)
        st = os.stat(preferred, follow_symlinks=False)
        import stat as stat_mod
        if (st.st_uid == os.getuid() and stat_mod.S_ISDIR(st.st_mode)
                and not (st.st_mode & 0o077)):
            return preferred
    except OSError:
        pass
    global _PRIVATE_STAGING
    if _PRIVATE_STAGING is None:
        _PRIVATE_STAGING = tempfile.mkdtemp(prefix="lens_spark_wasm_")
    return _PRIVATE_STAGING


_PRIVATE_STAGING: str | None = None


def _load_wasm(path: str, payload: bytes | None = None) -> str:
    """Route a ``.wasm`` module to the Node-backed wasm host
    (lens_spark.wasm — reference ABI end to end). ``data:`` payloads
    are staged to a content-addressed file in a PRIVATE per-user dir,
    re-hashed on reuse and rewritten on mismatch, and the host loader
    verifies the bytes it reads against the declared digest (r8
    advice — no silent substitution). Raises loudly when no ``node``
    binary is available — the one environment requirement."""
    from lens_spark import wasm as wasm_host

    if payload is None and path.startswith("data:"):
        payload = _read_source(path)
    if payload is not None:
        digest = hashlib.sha256(payload).hexdigest()
        fs_path = os.path.join(_wasm_staging_dir(),
                               f"lens_wasm_{digest[:16]}.wasm")
        stale = True
        if os.path.exists(fs_path):
            with open(fs_path, "rb") as f:
                stale = hashlib.sha256(f.read()).hexdigest() != digest
        if stale:
            tmp = fs_path + ".tmp"
            with open(tmp, "wb") as f:
                f.write(payload)
            os.replace(tmp, fs_path)
        return wasm_host.load_wasm_path(fs_path, expect_sha256=digest)
    fs_path = urllib.parse.urlparse(path).path or path[len("file:"):]
    return wasm_host.load_wasm_path(fs_path)


def _looks_like_wasm_path(path: str) -> bool:
    if path.startswith("data:"):
        header = path[len("data:"):].partition(",")[0]
        return "wasm" in header.lower()
    return urllib.parse.urlparse(path).path.lower().endswith(".wasm")


def _read_source(path: str) -> bytes:
    if path.startswith("data:"):
        header, sep, payload = path[len("data:"):].partition(",")
        if not sep:
            raise LensError(f"malformed data: URL in module path {path!r}")
        if header.endswith(";base64"):
            return base64.b64decode(payload)
        return urllib.parse.unquote_to_bytes(payload)
    if path.startswith("file:"):
        fs_path = urllib.parse.urlparse(path).path or path[len("file:"):]
        with open(fs_path, "rb") as f:
            return f.read()
    raise LensError(f"unsupported module path scheme: {path!r}")


def _http_pins_path() -> str:
    """Durable per-user location for the TOFU pin file (r12 advice: a
    pin in the ephemeral /tmp staging dir dies with any tmp cleaner or
    reboot, and the next fetch silently RE-PINS whatever the server
    then serves — the exact supply-chain content change the pin exists
    to catch). XDG_STATE_HOME per the basedir spec, else
    ~/.local/state; the ephemeral staging dir only as a last resort
    when the home is unwritable (containers with read-only homes)."""
    base = os.environ.get("XDG_STATE_HOME") or os.path.join(
        os.path.expanduser("~"), ".local", "state")
    d = os.path.join(base, "lens_spark")
    try:
        os.makedirs(d, mode=0o700, exist_ok=True)
    except OSError:
        d = _wasm_staging_dir()
    pins_path = os.path.join(d, "http_module_pins.json")
    _migrate_legacy_pins(pins_path)
    return pins_path


def _locked_pins_update(pins_path: str, mutate) -> dict:
    """Read-modify-write the pin file under an fcntl lock (r14 review:
    two processes racing the unserialized read→replace could silently
    drop the other's freshly recorded pin — the next fetch of that URL
    would then re-pin whatever the server serves, the exact
    supply-chain substitution TOFU exists to catch). ``mutate`` takes
    the current dict and returns the new one (or the same object for
    no change). Returns the post-mutation dict. The lock file sits
    beside the pin file (local FS by construction — XDG state dir or
    the staging dir), so fcntl.flock is reliable; platforms without
    fcntl (never this container) degrade to the unserialized path."""
    import json

    lock_path = pins_path + ".lock"

    def _read() -> dict:
        if os.path.exists(pins_path):
            try:
                with open(pins_path) as fh:
                    loaded = json.load(fh)
                if isinstance(loaded, dict):
                    return loaded
            except (OSError, ValueError):
                pass
        return {}

    try:
        import fcntl
    except ImportError:  # pragma: no cover — non-POSIX fallback
        pins = mutate(_read())
        tmp = pins_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(pins, fh, indent=1, sort_keys=True)
        os.replace(tmp, pins_path)
        return pins
    with open(lock_path, "w") as lf:
        fcntl.flock(lf, fcntl.LOCK_EX)
        try:
            cur = _read()
            pins = mutate(dict(cur))
            if pins != cur:
                tmp = pins_path + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(pins, fh, indent=1, sort_keys=True)
                os.replace(tmp, pins_path)
            return pins
        finally:
            fcntl.flock(lf, fcntl.LOCK_UN)


def _migrate_legacy_pins(pins_path: str) -> None:
    """One-time merge of the pre-durable staging-dir pin file (r13
    advice: moving the pin location silently ORPHANED existing pins —
    the first fetch of every already-pinned URL after the upgrade
    would re-pin whatever the server serves at that moment, exactly
    the supply-chain content change the pin exists to catch). Legacy
    entries fill gaps; an entry already in the durable file wins (a
    deliberate post-upgrade re-pin must not regress). Idempotent: the
    legacy file is renamed aside only after the merged file is in
    place, and a failed rename just repeats the (idempotent) merge."""
    import json

    legacy = os.path.join(_wasm_staging_dir(), "http_module_pins.json")
    if (not os.path.exists(legacy)
            or os.path.realpath(legacy) == os.path.realpath(pins_path)):
        return
    try:
        with open(legacy) as fh:
            old = json.load(fh)
    except (OSError, ValueError):
        return
    if not isinstance(old, dict) or not old:
        return
    _locked_pins_update(pins_path, lambda cur: {**old, **cur})
    try:
        os.replace(legacy, legacy + ".migrated")
    except OSError:
        pass


HTTP_MODULE_MAX_BYTES = 64 * 1024 * 1024
"""Response-size cap for http(s) module fetches (r12 advice: an
uncapped read trusts — and PINS — arbitrarily large first-fetch
content). 64 MiB comfortably holds any real lens module (the largest
reference wasm fixture is KBs); raise it deliberately if ever needed."""


class _SameOriginRedirect:
    """Redirect policy for module fetches (r12 advice): urllib follows
    redirects blindly, including an https→http downgrade to an
    attacker-chosen host BEFORE the first-use pin is recorded — the
    downgraded content would then be trusted and pinned. A redirect
    may only stay on the SAME scheme and host; anything else refuses
    loudly (pin the final URL directly instead)."""

    def __new__(cls):
        import urllib.request

        class Handler(urllib.request.HTTPRedirectHandler):
            def redirect_request(self, req, fp, code, msg, headers,
                                 newurl):
                old = urllib.parse.urlparse(req.full_url)
                new = urllib.parse.urlparse(
                    urllib.parse.urljoin(req.full_url, newurl))
                if (new.scheme, new.netloc) != (old.scheme, old.netloc):
                    raise LensError(
                        f"http module fetch: refusing redirect "
                        f"{req.full_url!r} → {newurl!r} (scheme/host "
                        "change before the content is pinned; point "
                        "the lens config at the final URL instead)")
                return super().redirect_request(req, fp, code, msg,
                                                headers, newurl)

        return Handler()


def _fetch_http_module(url: str) -> bytes:
    """Fetch an http(s) module with TRUST-ON-FIRST-USE digest pinning
    (the SURVEY §2.8 allow-flag design, implemented r12): first fetch
    of a URL records its sha256 in the durable per-user pin file; any
    later fetch of the SAME URL must hash to the pinned digest —
    changed content refuses loudly instead of silently running
    different code (the supply-chain event the pin catches; the
    reference fetches unconditionally, engine.go:76-88). The response
    is size-capped and redirects may not change scheme or host (r12
    advice — both were first-fetch trust holes)."""
    import json
    import urllib.request

    opener = urllib.request.build_opener(_SameOriginRedirect())
    with opener.open(url, timeout=30) as resp:  # noqa: S310
        # scheme vetted by the caller; the double opt-in gates this path
        data = resp.read(HTTP_MODULE_MAX_BYTES + 1)
    if len(data) > HTTP_MODULE_MAX_BYTES:
        raise LensError(
            f"http module {url!r} exceeds the "
            f"{HTTP_MODULE_MAX_BYTES // (1024 * 1024)} MiB fetch cap — "
            "refusing to hash/pin it (lens_spark.modules."
            "HTTP_MODULE_MAX_BYTES)")
    digest = hashlib.sha256(data).hexdigest()
    pins_path = _http_pins_path()
    pins = _locked_pins_update(
        pins_path, lambda cur: {**cur, url: cur.get(url, digest)})
    pinned = pins.get(url)
    if pinned != digest:
        raise LensError(
            f"http module {url!r} content changed: pinned sha256 "
            f"{pinned[:16]}…, fetched {digest[:16]}… — refusing to load "
            f"(trust-on-first-use pin, {pins_path}; delete the entry to "
            "re-pin deliberately)")
    return data


def load_module_path(path: str) -> str:
    """Resolve a ``file:``/``data:``/``http(s):`` module path to a
    registered lens name (content-addressed, idempotent). Raises
    unless the explicit opt-in is active (http additionally needs the
    fetch opt-in, see ``allow_http_modules``). A ``.wasm`` path or
    payload (detected by extension, data: mime, or binary magic —
    never exec'd as Python) routes to the Node-backed wasm host
    (lens_spark.wasm), which runs the reference lens ABI directly
    (host-go/engine/engine.go:67-104); it requires a ``node`` binary
    and the same opt-in."""
    if not module_paths_allowed():
        raise LensError(
            f"unsupported module path {path!r}: executing external lens "
            "modules is disabled. This engine runs registered built-in / "
            "python lenses; to load file:/data: Python batch-fn or WASM "
            "lens modules, opt in via "
            "lens_spark.modules.allow_module_paths(True), "
            "LENS_SPARK_ALLOW_MODULE_PATHS=1, or --allow-module-paths "
            "(http(s) module fetch additionally requires "
            "--allow-http-modules / LENS_SPARK_ALLOW_HTTP_MODULES=1)"
        )
    scheme = urllib.parse.urlparse(path).scheme.lower()
    if scheme in ("http", "https"):
        if not http_modules_allowed():
            raise LensError(
                f"unsupported module path {path!r}: fetching lens modules "
                "over http(s) is disabled (code over the network is "
                "config-file RCE). Opt in via "
                "lens_spark.modules.allow_http_modules(True), "
                "LENS_SPARK_ALLOW_HTTP_MODULES=1, or "
                "--allow-http-modules; the fetch is sha256-pinned on "
                "first use and re-verified on every later fetch.")
        source = _fetch_http_module(path)
        is_wasm = (source[:4] == _WASM_MAGIC
                   or urllib.parse.urlparse(path).path.lower()
                   .endswith(".wasm"))
        mime = "application/wasm" if is_wasm else "text/x-python"
        b64 = base64.b64encode(source).decode("ascii")
        # route through the shared data: path — content-addressed
        # staging, digest verification, and registration are identical
        # to every other module source
        return load_module_path(f"data:{mime};base64,{b64}")
    if _looks_like_wasm_path(path):
        return _load_wasm(path)
    source = _read_source(path)
    if source[:4] == _WASM_MAGIC:
        return _load_wasm(path, payload=source)
    digest = hashlib.sha256(source).hexdigest()
    if digest in _LOADED:
        return _LOADED[digest]
    name = f"pymod_{digest[:12]}"

    namespace: dict[str, Any] = {}
    try:
        exec(compile(source, name, "exec"), namespace)  # noqa: S102 — opt-in
    except LensError:
        raise
    except Exception as exc:
        raise LensError(f"module {path!r} failed to load: {exc}") from exc
    fn = namespace.get("transform")
    schema = namespace.get("OUTPUT_SCHEMA")
    if not callable(fn) or not isinstance(schema, str):
        raise LensError(
            f"module {path!r} must define transform(batches, params) and an "
            "OUTPUT_SCHEMA DDL string")
    inverse_fn = namespace.get("inverse")
    inverse_schema = namespace.get("INVERSE_SCHEMA")

    _register_module_lens(name, fn, schema,
                          inverse_fn if callable(inverse_fn) else None,
                          inverse_schema if isinstance(inverse_schema, str) else None)
    _LOADED[digest] = name
    return name


def load_module_artifact(registry, artifact_id: str) -> str:
    """Load a Python batch-fn module stored as a registry artifact
    (chunked block storage, Registry.add_artifact — the analogue of the
    reference serving a lens's WASM bytes back out of its block store,
    host-go/store/block.go:248-302). Routed through the same ``data:``
    path as any external module, so the execution opt-in gate and the
    WASM rejection apply unchanged."""
    data = registry.get_artifact(artifact_id)
    b64 = base64.b64encode(data).decode("ascii")
    return load_module_path(f"data:text/x-python;base64,{b64}")


def _register_module_lens(name: str, fn, schema: str, inverse_fn,
                          inverse_schema: str | None) -> None:
    from lens_spark.operators.base import Lens, register_lens
    from lens_spark.operators.udf import apply_python_lens, register_python_lens

    register_python_lens(name, fn, schema, inverse_fn,
                         inverse_schema or schema)

    @register_lens(name)
    def factory(arguments: Mapping[str, Any]) -> Lens:
        params = dict(arguments or {})
        lens = Lens(
            name, arguments,
            forward_fn=lambda df: apply_python_lens(df, name, params, False),
            inverse_fn=((lambda df: apply_python_lens(df, name, params, True))
                        if inverse_fn is not None else None),
        )
        # expose the raw batch fn so the engine fuses adjacent python
        # stages into one mapInPandas crossing (see engine.py)
        lens.fusable_iter = (fn, params, schema)
        if inverse_fn is not None:
            lens.fusable_iter_inverse = (inverse_fn, params,
                                         inverse_schema or schema)
        return lens
