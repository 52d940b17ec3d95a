"""Pipeline spec model.

Mirrors the reference's lens-file model (`model.Lens`,
/root/reference/host-go/config/model/lens.go:11-30) and its JSON codec
(/root/reference/host-go/config/internal/json/json.go:14-22):

    {"lenses": [{"path": ..., "inverse": bool, "arguments": {...}}, ...]}

We accept ``name`` (a registered built-in lens) interchangeably with
``path`` (``builtin:<name>`` URLs and bare names resolve to built-ins;
WASM URLs are rejected — this engine is Spark-native, not a WASM host).

Content addressing replicates the reference's deterministic block
semantics (/root/reference/host-go/store/block.go:323-338 — arguments
serialized sorted-by-key so identical configs get identical ids): the
content id is sha256 over the canonical JSON serialization.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from typing import Any, Mapping

from lens_spark.errors import LensError

_BUILTIN_SCHEMES = ("builtin:", "lens:")


def _resolve_name(raw: Mapping[str, Any]) -> str:
    name = raw.get("name")
    if name:
        return str(name)
    path = raw.get("path")
    if not path:
        raise LensError("lens module requires a 'name' or 'path'")
    path = str(path)
    for scheme in _BUILTIN_SCHEMES:
        if path.startswith(scheme):
            return path[len(scheme):]
    if path.startswith(("file:", "data:", "http:", "https:")):
        # Python batch-fn / WASM module loading — opt-in only (http
        # additionally needs the fetch opt-in + carries a sha256 TOFU
        # pin); raises a clear error otherwise (lens_spark/modules.py).
        from lens_spark.modules import load_module_path

        return load_module_path(path)
    if "://" in path:
        raise LensError(
            f"unsupported module path {path!r}: this engine executes "
            "registered built-in / python lenses (plus opted-in "
            "file:/data:/http(s): Python and WASM modules), not other "
            "remote schemes"
        )
    return path


@dataclass(frozen=True)
class LensModule:
    """One pipeline stage: a named lens + inverse flag + arguments.

    ≙ model.LensModule (config/model/lens.go:19-30).
    """

    name: str
    inverse: bool = False
    arguments: Mapping[str, Any] = field(default_factory=dict)

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "inverse": bool(self.inverse),
            "arguments": dict(self.arguments),
        }

    @classmethod
    def from_dict(cls, raw: Mapping[str, Any]) -> "LensModule":
        return cls(
            name=_resolve_name(raw),
            inverse=bool(raw.get("inverse", False)),
            arguments=dict(raw.get("arguments") or {}),
        )

    def flipped(self) -> "LensModule":
        return LensModule(self.name, not self.inverse, dict(self.arguments))


@dataclass(frozen=True)
class LensConfig:
    """An ordered pipeline of lens modules. ≙ model.Lens (lens.go:11-17)."""

    lenses: tuple[LensModule, ...] = ()

    def __init__(self, lenses: Any = ()) -> None:
        object.__setattr__(self, "lenses", tuple(lenses))

    # --- codec (byte-compatible intent with config/internal/json/json.go) ---

    @classmethod
    def from_dict(cls, raw: Mapping[str, Any]) -> "LensConfig":
        return cls(LensModule.from_dict(m) for m in raw.get("lenses", []))

    @classmethod
    def from_json(cls, text: str | bytes) -> "LensConfig":
        return cls.from_dict(json.loads(text))

    @classmethod
    def load(cls, path: str) -> "LensConfig":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_json(f.read())

    def to_dict(self) -> dict[str, Any]:
        return {"lenses": [m.to_dict() for m in self.lenses]}

    def to_json(self, *, canonical: bool = False) -> str:
        if canonical:
            # Deterministic serialization: sorted keys, compact separators
            # (≙ sorted-argument block encoding, store/block.go:323-338).
            return json.dumps(self.to_dict(), sort_keys=True,
                              separators=(",", ":"), ensure_ascii=True)
        return json.dumps(self.to_dict(), indent=2)

    # --- content addressing (≙ CID determinism, store/store.go:31-33) ---

    def content_id(self) -> str:
        digest = hashlib.sha256(self.to_json(canonical=True).encode()).hexdigest()
        return f"lens1-{digest}"

    # --- pipeline inversion (E8, repository/repository.go:172-206) ---

    def inverted(self) -> "LensConfig":
        """Reverse module order AND flip each module's inverse flag."""
        return LensConfig(m.flipped() for m in reversed(self.lenses))


def is_valid_content_id(lens_id: str) -> bool:
    """Well-formed content id check (≙ assertIsCid, store/store.go:284-287)."""
    if not isinstance(lens_id, str) or not lens_id.startswith("lens1-"):
        return False
    digest = lens_id[len("lens1-"):]
    return len(digest) == 64 and all(c in "0123456789abcdef" for c in digest)
