"""Content-addressed pipeline registry with transactions.

≙ the reference's Store (/root/reference/host-go/store/store.go:29-59)
over badger/IPLD, rebuilt on a filesystem/object-store layout that a
whole Spark cluster can share:

    <root>/specs/<content-id>.json      one canonical spec per id

Semantics preserved:
- Add is idempotent — identical configs canonicalize to the same
  content id and are stored once (store.go:31-33, block.go:323-338).
- List/Reload reconstruct every persisted config (store.go:157-237).
- Transform/Inverse validate the id *format* and treat well-formed but
  unknown ids as identity (store.go:194-218, repository.go:250-254).
- Transactions stage writes and publish on commit; discard drops them
  (repository/txn.go:9-41). Atomicity is per-spec (tempfile +
  ``os.replace`` — atomic on POSIX; a conditional PUT on an object
  store). Commit is two-phase (serialize everything, then rename
  everything) so a mid-commit crash can only land between renames, and
  content-addressed idempotency makes re-commit safe.

P2P lens sync (host-go/p2p/p2p.go:19-88) maps to ``sync_from``: copy a
spec by id from another registry root (a remote warehouse path).
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from pathlib import Path
from typing import Any, Iterator, Sequence

from pyspark.sql import DataFrame

from lens_spark.errors import InvalidLensIdError, LensError
from lens_spark.model import LensConfig, is_valid_content_id


class Txn:
    """Staged registry writes; publish on commit, drop on discard."""

    def __init__(self, registry: "Registry", readonly: bool = False) -> None:
        self._registry = registry
        self.readonly = readonly
        self._staged: dict[str, LensConfig] = {}
        self._closed = False

    def add(self, config: LensConfig | dict | str) -> str:
        if self.readonly:
            raise LensError("cannot add through a read-only transaction")
        if self._closed:
            raise LensError("transaction already closed")
        config = self._registry._coerce(config)
        lens_id = config.content_id()
        self._staged[lens_id] = config
        return lens_id

    def get(self, lens_id: str) -> LensConfig | None:
        return self._staged.get(lens_id) or self._registry.get(lens_id)

    def transform(self, df: DataFrame, lens_id: str) -> DataFrame:
        return self._registry._apply(df, lens_id, inverse=False, extra=self._staged)

    def inverse(self, df: DataFrame, lens_id: str) -> DataFrame:
        return self._registry._apply(df, lens_id, inverse=True, extra=self._staged)

    def commit(self) -> None:
        """Two-phase publish: write every staged spec to a tempfile
        first, then a second pass of pure ``os.replace`` renames.

        Atomicity is per-spec (each rename is atomic on POSIX); the
        two-phase split shrinks the partial-publish window to the
        rename loop — a crash during the (slow) serialization phase
        publishes nothing. Content-addressing makes a partial publish
        recoverable anyway: re-committing the same transaction is
        idempotent.
        """
        if self._closed:
            raise LensError("transaction already closed")
        staged_files: list[tuple[str, Path]] = []
        try:
            for lens_id, config in self._staged.items():
                path = self._registry.specs_dir / f"{lens_id}.json"
                if path.exists():  # idempotent dedup (S1)
                    continue
                fd, tmp = tempfile.mkstemp(dir=self._registry.specs_dir,
                                           suffix=".tmp")
                with os.fdopen(fd, "w", encoding="utf-8") as f:
                    f.write(config.to_json(canonical=True))
                staged_files.append((tmp, path))
        except BaseException:
            for tmp, _ in staged_files:
                if os.path.exists(tmp):
                    os.unlink(tmp)
            raise
        for tmp, path in staged_files:
            os.replace(tmp, path)
        self._registry.reload()
        self._closed = True

    def discard(self) -> None:
        self._staged.clear()
        self._closed = True

    def __enter__(self) -> "Txn":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if self._closed:
            return
        if exc_type is None:
            self.commit()
        else:
            self.discard()


class Registry:
    def __init__(self, root: str | Path) -> None:
        self.root = Path(root)
        self.specs_dir = self.root / "specs"
        self.specs_dir.mkdir(parents=True, exist_ok=True)
        self._cache: dict[str, LensConfig] = {}
        self.reload()

    # -- internal ---------------------------------------------------------

    @staticmethod
    def _coerce(config: Any) -> LensConfig:
        if isinstance(config, LensConfig):
            return config
        if isinstance(config, dict):
            return LensConfig.from_dict(config)
        if isinstance(config, str):
            return LensConfig.from_json(config)
        raise TypeError(f"cannot build a LensConfig from {type(config).__name__}")

    def _publish(self, lens_id: str, config: LensConfig) -> None:
        path = self.specs_dir / f"{lens_id}.json"
        if path.exists():  # idempotent dedup (S1)
            return
        fd, tmp = tempfile.mkstemp(dir=self.specs_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "w", encoding="utf-8") as f:
                f.write(config.to_json(canonical=True))
            os.replace(tmp, path)  # atomic publish
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise

    def _apply(self, df: DataFrame, lens_id: str, *, inverse: bool,
               extra: dict[str, LensConfig] | None = None) -> DataFrame:
        from lens_spark.engine import append

        if not is_valid_content_id(lens_id):
            raise InvalidLensIdError(f"'{lens_id}' is not a valid lens content id")
        config = (extra or {}).get(lens_id) or self._cache.get(lens_id)
        if config is None:
            return df  # unknown id → identity (E7)
        return append(df, config.inverted() if inverse else config)

    # -- public surface (S1-S6) --------------------------------------------

    def add(self, config: LensConfig | dict | str) -> str:
        """S1: canonicalize, content-address, persist (idempotent)."""
        config = self._coerce(config)
        lens_id = config.content_id()
        self._publish(lens_id, config)
        self._cache[lens_id] = config
        return lens_id

    def get(self, lens_id: str) -> LensConfig | None:
        return self._cache.get(lens_id)

    def list(self) -> dict[str, LensConfig]:
        """S2: all persisted configs keyed by content id."""
        return dict(self._cache)

    def reload(self) -> None:
        """S3: re-read every persisted spec (node-start warm)."""
        cache: dict[str, LensConfig] = {}
        for path in self.specs_dir.glob("lens1-*.json"):
            lens_id = path.stem
            if not is_valid_content_id(lens_id):
                continue
            with open(path, "r", encoding="utf-8") as f:
                cache[lens_id] = LensConfig.from_dict(json.load(f))
        self._cache = cache

    def transform(self, df: DataFrame, lens_id: str) -> DataFrame:
        """S4: apply the stored pipeline; unknown id → identity."""
        return self._apply(df, lens_id, inverse=False)

    def inverse(self, df: DataFrame, lens_id: str) -> DataFrame:
        """S4: apply the stored pipeline inverted (E8)."""
        return self._apply(df, lens_id, inverse=True)

    def txn(self, readonly: bool = False) -> Txn:
        """S5: staged writes, atomic publish on commit."""
        return Txn(self, readonly)

    def sync_from(self, other: "Registry | str | Path", lens_id: str) -> str:
        """S6 analogue: copy one spec by id from another registry root."""
        if not isinstance(other, Registry):
            other = Registry(other)
        config = other.get(lens_id)
        if config is None:
            raise LensError(f"lens '{lens_id}' not found in source registry")
        got = self.add(config)
        assert got == lens_id, "content id changed during sync"
        return got

    def sync_from_any(self, roots: "Sequence[Registry | str | Path]",
                      lens_id: str, *, timeout: float = 5.0,
                      retry_interval: float = 0.25) -> str:
        """P2P fetch-until-timeout (host-go/p2p/p2p.go:19-88;
        add_sync_list_test.go:18-117): poll every candidate peer root for
        ``lens_id`` until one serves it or the deadline passes — the
        shared-object-store translation of "ask connected peers,
        retrying, until the block arrives or the context times out".
        Peers are re-read each round (a publish may land mid-poll), and
        an unreachable root is skipped, not fatal."""
        import time

        deadline = time.monotonic() + timeout
        while True:
            for root in roots:
                try:
                    peer = root if isinstance(root, Registry) else Registry(root)
                    peer.reload()  # pick up publishes since the last round
                except OSError:
                    continue  # unreachable peer — keep asking the others
                if peer.get(lens_id) is not None:
                    return self.sync_from(peer, lens_id)
            if time.monotonic() >= deadline:
                raise LensError(
                    f"lens '{lens_id}' not found in any of {len(roots)} "
                    f"peer registries within {timeout}s")
            time.sleep(retry_interval)

    def ids(self) -> Iterator[str]:
        return iter(self._cache)

    # -- chunked artifact blocks (≙ block.go:135-172) -----------------------

    ARTIFACT_CHUNK_SIZE = 3 * 1024 * 1024
    """Reference's maxBlockSize (host-go/store/store.go:27): blobs above
    the cap are chunked for transportability (IPFS ~4 MB transport
    limit, host-go/node/option.go:74-84)."""

    @staticmethod
    def artifact_id(data: bytes) -> str:
        return f"lens1b-{hashlib.sha256(data).hexdigest()}"

    @staticmethod
    def is_valid_artifact_id(artifact_id: str) -> bool:
        if not isinstance(artifact_id, str) or not artifact_id.startswith("lens1b-"):
            return False
        digest = artifact_id[len("lens1b-"):]
        return len(digest) == 64 and all(c in "0123456789abcdef" for c in digest)

    @property
    def blocks_dir(self) -> Path:
        return self.root / "blocks"

    def add_artifact(self, data: bytes, *,
                     chunk_size: int | None = None) -> str:
        """Content-addressed, chunked artifact storage — the registry
        analogue of the reference's LensBlock chunking for large WASM
        binaries (host-go/store/block.go:135-172). Artifacts here are
        typically Python lens-module sources (see
        modules.load_module_artifact), but any bytes store.

        Chunks land in a staging dir first and publish via one atomic
        rename, so a reader never sees a half-written artifact; adding
        identical bytes twice is a no-op returning the same id (S1
        idempotence). ``lens1b-`` ids are disjoint from spec ids, so an
        artifact can never shadow a pipeline spec.
        """
        chunk_size = int(chunk_size or self.ARTIFACT_CHUNK_SIZE)
        if chunk_size <= 0:
            raise LensError("add_artifact: chunk_size must be positive")
        art_id = self.artifact_id(data)
        final = self.blocks_dir / art_id
        if final.exists():
            return art_id
        self.blocks_dir.mkdir(parents=True, exist_ok=True)
        staging = Path(tempfile.mkdtemp(dir=self.blocks_dir,
                                        prefix=".staging-"))
        try:
            n_chunks = max(1, (len(data) + chunk_size - 1) // chunk_size)
            for i in range(n_chunks):
                chunk = data[i * chunk_size:(i + 1) * chunk_size]
                with open(staging / f"{i:08d}.chunk", "wb") as f:
                    f.write(chunk)
            try:
                staging.rename(final)  # atomic publish
            except OSError:
                if final.exists():  # raced another writer: same content won
                    return art_id
                raise
        finally:
            if staging.exists():
                import shutil

                shutil.rmtree(staging, ignore_errors=True)
        return art_id

    def get_artifact(self, artifact_id: str) -> bytes:
        """Reassemble an artifact from its chunks, verifying the content
        hash — a corrupted or truncated block store must fail loudly,
        never hand back wrong bytes."""
        if not self.is_valid_artifact_id(artifact_id):
            raise InvalidLensIdError(
                f"'{artifact_id}' is not a valid artifact id")
        final = self.blocks_dir / artifact_id
        if not final.is_dir():
            raise LensError(f"artifact '{artifact_id}' not found")
        chunks = sorted(final.glob("*.chunk"))
        data = b"".join(p.read_bytes() for p in chunks)
        if self.artifact_id(data) != artifact_id:
            raise LensError(
                f"artifact '{artifact_id}' failed content verification "
                f"({len(chunks)} chunks, {len(data)} bytes) — block store "
                "corrupted")
        return data

    def has_artifact(self, artifact_id: str) -> bool:
        # Validate before touching the filesystem: ids like
        # '../specs/<id>' must not probe directories outside blocks_dir.
        if not self.is_valid_artifact_id(artifact_id):
            return False
        return (self.blocks_dir / artifact_id).is_dir()

    def vacuum_artifacts(self, *, keep: Sequence[str] = (),
                         staging_grace_sec: float = 3600.0) -> dict:
        """Sweep artifact blocks no stored spec references.

        Artifacts are content-addressed and nothing ever deletes them:
        a spec that stops naming its module artifact (overwrite then
        txn discard, or plain spec deletion) strands the chunk blocks
        forever. Liveness here = the artifact id appears in some
        persisted spec's canonical JSON (the only place a spec can name
        one) or in the caller's ``keep`` list. Everything else under
        blocks/ goes, plus ``.staging-*`` dirs older than
        ``staging_grace_sec`` (younger ones may belong to an in-flight
        ``add_artifact``). The same grace window also protects FINAL
        block dirs: an artifact becomes final at ``add_artifact``'s
        rename BEFORE the spec referencing it is persisted, so a young
        unreferenced block may be a publish-in-progress, not garbage —
        only blocks older than the window are swept. Returns
        {"removed", "kept", "bytes_freed"}.
        """
        import re
        import shutil
        import time

        self.reload()
        live = {a for a in keep}
        pattern = re.compile(r"lens1b-[0-9a-f]{64}")
        for config in self._cache.values():
            live.update(pattern.findall(config.to_json(canonical=True)))
        removed: list[str] = []
        kept = 0
        freed = 0
        if not self.blocks_dir.is_dir():
            return {"removed": removed, "kept": 0, "bytes_freed": 0}
        now = time.time()
        for entry in self.blocks_dir.iterdir():
            if entry.name.startswith(".staging-"):
                if now - entry.stat().st_mtime > staging_grace_sec:
                    shutil.rmtree(entry, ignore_errors=True)
                continue
            if not self.is_valid_artifact_id(entry.name):
                continue  # never touch names we don't own
            if entry.name in live:
                kept += 1
                continue
            if now - entry.stat().st_mtime <= staging_grace_sec:
                kept += 1  # young + unreferenced: maybe mid-publish
                continue
            freed += sum(p.stat().st_size for p in entry.glob("*.chunk"))
            shutil.rmtree(entry)
            removed.append(entry.name)
        return {"removed": removed, "kept": kept, "bytes_freed": freed}

    def sync_artifact_from(self, other: "Registry | str | Path",
                           artifact_id: str) -> str:
        """S6 for artifacts: copy chunked blocks by id from a peer root
        (verified on read, re-chunked at the local cap)."""
        if not isinstance(other, Registry):
            other = Registry(other)
        got = self.add_artifact(other.get_artifact(artifact_id))
        assert got == artifact_id, "artifact id changed during sync"
        return got
