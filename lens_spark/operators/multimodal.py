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
    a sha256 stream over the payload (stable across runs/machines)."""
    digest = hashlib.sha256(payload or b"").digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    feature, seed = [], digest
    while len(feature) < feature_dim:
        seed = hashlib.sha256(seed).digest()
        feature.extend(b / 255.0 for b in seed)
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
