"""X4 multimodal columns: image/audio/video as opaque binary + metadata.

Design: media payloads ride in a ``binary`` column next to a typed
metadata struct (mime, width/height or sample_rate/duration, byte
size). Heavy payloads (>~1 MB) should be *pointers* (object-store
paths read via ``spark.read.format("binaryFile")``) rather than inline
blobs — keep shuffle rows small.

The decode step is environment-dependent (no image/audio libs in this
container), so codecs are stubbed: ``decode_image`` raises
``NotImplementedError`` unless a deterministic fake decoder is
requested. Everything around the stub — schema, Arrow batch shape,
mapInPandas plumbing, partition sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator, Mapping

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_spark.operators.base import Lens, register_lens, require_arg

IMAGE_FEATURE_SCHEMA = (
    "width int, height int, mode string, feature array<float>"
)


def decode_image(payload: bytes) -> dict[str, Any]:
    """Real decoder hook — wire Pillow/libvips here when available."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use fake=True for the deterministic stub decoder"
    )


def _fake_decode(payload: bytes, feature_dim: int) -> dict[str, Any]:
    """Deterministic fake decode: metadata + feature vector derived from
    a sha256 stream over the payload (stable across runs/machines).

    The stream re-hashes the lowercase *hex* digest (ASCII bytes), not
    the raw digest, so every derived byte is expressible in ANSI SQL
    (``sha256(varchar)`` exists cross-engine; ``sha256(blob)`` does
    not) — this is what lets ``x4_image_features`` carry a full DuckDB
    oracle instead of a rows-only check.
    """
    hexd = hashlib.sha256(payload or b"").hexdigest()
    width = 1 + int(hexd[0:2], 16) % 64
    height = 1 + int(hexd[2:4], 16) % 64
    feature, seed = [], hexd
    while len(feature) < feature_dim:
        seed = hashlib.sha256(seed.encode("ascii")).hexdigest()
        feature.extend(int(seed[i:i + 2], 16) / 255.0 for i in range(0, 64, 2))
    return {
        "width": int(width),
        "height": int(height),
        "mode": "RGB",
        "feature": [float(x) for x in feature[:feature_dim]],
    }


def image_features(df: DataFrame, payload_col: str, *, feature_dim: int = 16,
                   fake: bool = False, keep: list[str] | None = None) -> DataFrame:
    """Decode/extract features over the binary column via mapInPandas.

    Arrow moves the binary payloads to Python in batches; the UDF emits
    the kept id columns + the feature struct fields. Partition sizing:
    payloads dominate row width, so feed this with
    ``spark.sql.files.maxPartitionBytes`` tuned to payload size, not
    row count.
    """
    keep = keep or []
    out_schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in keep] + [IMAGE_FEATURE_SCHEMA]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _fake_decode(p, feature_dim) if fake else decode_image(p)
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(decoded)
            for c in reversed(keep):
                out.insert(0, c, pdf[c].values)
            yield out

    return df.mapInPandas(run, schema=out_schema)


def resize_image(df: DataFrame, payload_col: str, *, width: int, height: int,
                 fake: bool = False, keep: list[str] | None = None) -> DataFrame:
    """Resize stub: 1:1 mapInPandas emitting the resized payload +
    target dims. Real path wires Pillow's ``Image.resize``; the fake
    re-hashes payload+dims so output bytes are deterministic and
    dimension-dependent (resizing twice ≠ once)."""
    keep = keep or []
    out_schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in keep]
        + [f"{payload_col} binary", "width int", "height int"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                payloads = [
                    hashlib.sha256((p or b"") + f"|{width}x{height}".encode()).digest()
                    for p in pdf[payload_col]
                ]
            else:
                raise NotImplementedError(
                    "image codec not available; use fake=True for the stub")
            out = pd.DataFrame({payload_col: payloads})
            out["width"] = width
            out["height"] = height
            for c in reversed(keep):
                out.insert(0, c, pdf[c].values)
            yield out

    return df.mapInPandas(run, schema=out_schema)


def sample_frames(df: DataFrame, payload_col: str, *, every_n: int = 10,
                  max_frames: int = 8, fake: bool = False,
                  keep: list[str] | None = None) -> DataFrame:
    """Video frame sampling stub: 1:N mapInPandas — each video row
    explodes into ``≤ max_frames`` frame rows (frame_idx, frame payload).
    The cardinality change and batch shape are the real contract; the
    fake derives a per-frame byte string from sha256(payload, idx).
    Scale note: frames multiply row count ×max_frames — repartition
    after sampling if the downstream op is CPU-heavy."""
    keep = keep or []
    out_schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in keep]
        + ["frame_idx int", "frame binary"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, rec in pdf.iterrows():
                payload = rec[payload_col] or b""
                if not fake:
                    raise NotImplementedError(
                        "video codec not available; use fake=True for the stub")
                # fake "video length": one frame per every_n bytes
                n = min(max_frames, max(1, len(payload) // every_n))
                for i in range(n):
                    rows.append({
                        **{c: rec[c] for c in keep},
                        "frame_idx": i,
                        "frame": hashlib.sha256(payload + bytes([i])).digest(),
                    })
            yield pd.DataFrame(rows, columns=[*keep, "frame_idx", "frame"])

    return df.mapInPandas(run, schema=out_schema)


def attach_media_metadata(df: DataFrame, payload_col: str,
                          mime: str = "application/octet-stream") -> DataFrame:
    """Cheap JVM-side metadata (no decode): byte size, sha256, mime."""
    p = F.col(payload_col)
    meta = F.struct(
        F.lit(mime).alias("mime"),
        F.length(p).cast("bigint").alias("n_bytes"),
        F.sha2(p, 256).alias("sha256"),
    )
    return df.withColumn(f"{payload_col}_meta", meta)


@register_lens("media_metadata")
def media_metadata_lens(arguments: Mapping[str, Any]) -> Lens:
    payload_col = str(require_arg(arguments, "column", "media_metadata"))
    mime = str(arguments.get("mime", "application/octet-stream"))
    return Lens("media_metadata", arguments,
                lambda df: attach_media_metadata(df, payload_col, mime))


@register_lens("image_features")
def image_features_lens(arguments: Mapping[str, Any]) -> Lens:
    payload_col = str(require_arg(arguments, "column", "image_features"))
    feature_dim = int(arguments.get("feature_dim", 16))
    fake = bool(arguments.get("fake", False))
    keep = [str(c) for c in (arguments.get("keep") or [])]
    return Lens("image_features", arguments,
                lambda df: image_features(df, payload_col, feature_dim=feature_dim,
                                          fake=fake, keep=keep))


@register_lens("resize_image")
def resize_image_lens(arguments: Mapping[str, Any]) -> Lens:
    payload_col = str(require_arg(arguments, "column", "resize_image"))
    return Lens("resize_image", arguments, lambda df: resize_image(
        df, payload_col,
        width=int(require_arg(arguments, "width", "resize_image")),
        height=int(require_arg(arguments, "height", "resize_image")),
        fake=bool(arguments.get("fake", False)),
        keep=[str(c) for c in (arguments.get("keep") or [])]))


@register_lens("sample_frames")
def sample_frames_lens(arguments: Mapping[str, Any]) -> Lens:
    payload_col = str(require_arg(arguments, "column", "sample_frames"))
    return Lens("sample_frames", arguments, lambda df: sample_frames(
        df, payload_col,
        every_n=int(arguments.get("every_n", 10)),
        max_frames=int(arguments.get("max_frames", 8)),
        fake=bool(arguments.get("fake", False)),
        keep=[str(c) for c in (arguments.get("keep") or [])]))
