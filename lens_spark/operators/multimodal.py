"""X4 multimodal columns: image/audio/video as opaque binary + metadata.

Design: media payloads ride in a ``binary`` column next to a typed
metadata struct (mime, width/height or sample_rate/duration, byte
size). Heavy payloads (>~1 MB) should be *pointers* (object-store
paths read via ``spark.read.format("binaryFile")``) rather than inline
blobs — keep shuffle rows small.

Two decode paths per operator:

- **real** (default): PNG/BMP via the pure-stdlib codecs in
  ``lens_spark.functions.imagecodec`` (Pillow preferred when
  importable). Features are a normalized luminance histogram; resize is
  nearest-neighbor with PNG re-encode; frame sampling splits a
  concatenated-PNG stream.
- **fake=True**: deterministic sha256-derived stand-in, kept for
  format-agnostic contract queries and cross-engine oracles.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator, Mapping

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lens_spark.functions.imagecodec import (
    decode_image_auto,
    encode_png,
    resize_nearest,
    split_png_stream,
)
from lens_spark.operators.base import Lens, check_reserved, register_lens, require_arg

IMAGE_FEATURE_SCHEMA = (
    "width int, height int, mode string, feature array<float>"
)


def decode_image(payload: bytes, feature_dim: int = 16) -> dict[str, Any]:
    """Real decode + feature extraction: PNG/BMP (or anything Pillow
    handles, when installed) → luminance histogram with ``feature_dim``
    bins, normalized to sum 1 — deterministic and lib-independent."""
    img = decode_image_auto(payload)
    px = np.frombuffer(img["pixels"], dtype=np.uint8)
    if img["channels"] > 1:
        px = px.reshape(-1, img["channels"])
        # mean over color channels (alpha excluded) = luminance proxy
        color_ch = 3 if img["channels"] >= 3 else 1
        lum = px[:, :color_ch].mean(axis=1)
    else:
        lum = px.astype(np.float64)
    hist, _ = np.histogram(lum, bins=feature_dim, range=(0.0, 256.0))
    feature = (hist / max(len(lum), 1)).astype(float)
    return {
        "width": img["width"],
        "height": img["height"],
        "mode": img["mode"],
        "feature": [float(x) for x in feature],
    }


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
                _fake_decode(p, feature_dim) if fake else decode_image(p, feature_dim)
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(decoded)
            for c in reversed(keep):
                out.insert(0, c, pdf[c].values)
            yield out

    return df.mapInPandas(run, schema=out_schema)


def perceptual_hash(payload: bytes, *, method: str = "dhash",
                    hash_size: int = 8) -> int:
    """64-bit perceptual image hash over the decoded grayscale image —
    the image-surface analogue of simhash: re-encodes, minor crops and
    resizes land within a few Hamming bits of each other.

    ``dhash``: sample the luminance on a (hash_size+1) × hash_size
    grid (nearest-neighbor, matching ``resize_nearest``'s convention);
    each bit is left-pixel < right-neighbor — gradient signs are what
    survives rescaling. ``ahash``: hash_size² grid, bit = pixel >
    grid mean. Pure numpy over the stdlib codecs; deterministic.
    """
    if method not in ("dhash", "ahash"):
        from lens_spark.errors import LensError
        raise LensError(
            f"perceptual_hash: method must be 'dhash' or 'ahash', "
            f"got {method!r}")
    img = decode_image_auto(payload)
    px = np.frombuffer(img["pixels"], dtype=np.uint8)
    ch = img["channels"]
    if ch > 1:
        px = px.reshape(-1, ch)
        color_ch = 3 if ch >= 3 else 1
        lum = px[:, :color_ch].mean(axis=1)
    else:
        lum = px.astype(np.float64)
    lum = lum.reshape(img["height"], img["width"])
    hs = int(hash_size)

    def grid(h, w):
        ys = (np.arange(h) * lum.shape[0] // h)
        xs = (np.arange(w) * lum.shape[1] // w)
        return lum[np.ix_(ys, xs)]

    if method == "dhash":
        g = grid(hs, hs + 1)
        bits = (g[:, :-1] < g[:, 1:]).flatten()
    else:  # ahash — validated above
        g = grid(hs, hs)
        bits = (g > g.mean()).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    # two's-complement into a signed 64-bit (Spark LongType) value
    return v - (1 << 64) if v >= (1 << 63) else v


def _fake_perceptual_hash(payload: bytes) -> int:
    """sha256-derived stand-in hash (the x4 fake-codec convention)."""
    hexd = hashlib.sha256(payload or b"").hexdigest()
    v = int(hexd[:16], 16)
    return v - (1 << 64) if v >= (1 << 63) else v


def image_hash(df: DataFrame, payload_col: str, *, method: str = "dhash",
               hash_size: int = 8, fake: bool = False,
               keep: list[str] | None = None,
               out: str = "image_hash") -> DataFrame:
    """Append the 64-bit perceptual hash of every image payload
    (Arrow-batched mapInPandas over the binary column — same shape as
    ``image_features``). The hash is the cheap persisted artifact:
    downstream exact dedup is a plain groupBy on it, near-dup goes
    through ``image_neardup_pairs``' banded Hamming join."""
    keep = keep or []
    dtypes = dict(df.dtypes)
    out_schema = ", ".join([f"{c} {dtypes[c]}" for c in keep]
                           + [f"{out} long"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [
                _fake_perceptual_hash(p) if fake
                else perceptual_hash(p, method=method, hash_size=hash_size)
                for p in pdf[payload_col]
            ]
            res = pd.DataFrame({out: pd.array(hashes, dtype="int64")})
            for c in reversed(keep):
                res.insert(0, c, pdf[c].values)
            yield res

    return df.mapInPandas(run, schema=out_schema)


def image_neardup_pairs(df: DataFrame, id_col: str, payload_col: str, *,
                        max_hamming: int = 3, method: str = "dhash",
                        fake: bool = False) -> DataFrame:
    """Visually-near-duplicate image pairs: perceptual hash → banded
    Hamming join → exact popcount verify. Emits (id_a, id_b, hamming)
    with id_a < id_b.

    Candidate generation is EXACT for ``max_hamming ≤ 3`` by
    pigeonhole: the 64-bit hash splits into 4 × 16-bit bands, and ≤ 3
    differing bits leave at least one band identical — so the
    band-equality self-join (shuffle keys: two small ints, never
    payloads) finds every qualifying pair; larger ``max_hamming``
    trades recall like any LSH. Verification is JVM-side
    ``bit_count(xor)`` — no Python in the join path; the decode UDF
    runs once per image, not per pair.
    """
    check_reserved(df, {"__ha", "__hb"}, "image_neardup_pairs")
    from lens_spark.errors import LensError

    if not 0 <= int(max_hamming) <= 64:
        raise LensError(
            f"image_neardup_pairs: max_hamming must be in [0, 64], "
            f"got {max_hamming}")
    hashes = image_hash(df, payload_col, method=method, fake=fake,
                        keep=[id_col]).localCheckpoint(eager=False)
    bands = hashes.select(
        F.col(id_col),
        F.col("image_hash"),
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("bi"),
                F.shiftright(F.col("image_hash"), i * 16)
                .bitwiseAND(F.lit(0xFFFF)).alias("bv"))
            for i in range(4)
        ])).alias("b"),
    ).select(id_col, "image_hash", "b.bi", "b.bv")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (a.join(b, (F.col("a.bi") == F.col("b.bi"))
                   & (F.col("a.bv") == F.col("b.bv"))
                   & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(F.col(f"a.{id_col}").alias("id_a"),
                    F.col(f"b.{id_col}").alias("id_b"),
                    F.col("a.image_hash").alias("__ha"),
                    F.col("b.image_hash").alias("__hb"))
            .distinct())
    return (cand
            .withColumn("hamming",
                        F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb"))))
            .filter(F.col("hamming") <= int(max_hamming))
            .select("id_a", "id_b", "hamming"))


@register_lens("image_hash")
def image_hash_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: column (binary), method ("dhash" | "ahash"),
    hash_size (8), fake (false), keep (id columns), out
    ("image_hash")."""
    payload_col = str(require_arg(arguments, "column", "image_hash"))
    keep = [str(c) for c in arguments.get("keep", [])]
    return Lens("image_hash", arguments, lambda df: image_hash(
        df, payload_col,
        method=str(arguments.get("method", "dhash")),
        hash_size=int(arguments.get("hash_size", 8)),
        fake=bool(arguments.get("fake", False)),
        keep=keep, out=str(arguments.get("out", "image_hash"))))


@register_lens("image_neardup_pairs")
def image_neardup_pairs_lens(arguments: Mapping[str, Any]) -> Lens:
    """arguments: id, column (binary), max_hamming (3), method
    ("dhash"), fake (false)."""
    id_col = str(require_arg(arguments, "id", "image_neardup_pairs"))
    payload_col = str(require_arg(arguments, "column",
                                  "image_neardup_pairs"))
    return Lens("image_neardup_pairs", arguments,
                lambda df: image_neardup_pairs(
                    df, id_col, payload_col,
                    max_hamming=int(arguments.get("max_hamming", 3)),
                    method=str(arguments.get("method", "dhash")),
                    fake=bool(arguments.get("fake", False))))


def resize_image(df: DataFrame, payload_col: str, *, width: int, height: int,
                 fake: bool = False, keep: list[str] | None = None) -> DataFrame:
    """Resize via 1:1 mapInPandas emitting the resized payload + target
    dims. Real path: decode (PNG/BMP) → nearest-neighbor resample →
    PNG re-encode. The fake re-hashes payload+dims so output bytes are
    deterministic and dimension-dependent (resizing twice ≠ once)."""
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
                payloads = []
                for p in pdf[payload_col]:
                    small = resize_nearest(decode_image_auto(p), width, height)
                    payloads.append(encode_png(small["width"], small["height"],
                                               small["mode"], small["pixels"]))
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
    """Video frame sampling: 1:N mapInPandas — each video row explodes
    into ``≤ max_frames`` frame rows (frame_idx, frame payload).

    Real path: the payload is a concatenated-PNG stream (the lib-free
    'video container'); every ``every_n``-th frame is kept, up to
    ``max_frames``, with frame_idx = position in the source stream.
    Fake path derives a per-frame byte string from sha256(payload, idx)
    with one frame per ``every_n`` payload bytes. Scale note: frames
    multiply row count ×max_frames — repartition after sampling if the
    downstream op is CPU-heavy."""
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
                if fake:
                    # fake "video length": one frame per every_n bytes
                    n = min(max_frames, max(1, len(payload) // every_n))
                    sampled = [
                        (i, hashlib.sha256(payload + bytes([i])).digest())
                        for i in range(n)
                    ]
                else:
                    frames = split_png_stream(payload)
                    sampled = [(i, frames[i])
                               for i in range(0, len(frames), max(every_n, 1))
                               ][:max_frames]
                for i, frame in sampled:
                    rows.append({
                        **{c: rec[c] for c in keep},
                        "frame_idx": i,
                        "frame": frame,
                    })
            yield pd.DataFrame(rows, columns=[*keep, "frame_idx", "frame"])

    return df.mapInPandas(run, schema=out_schema)


AUDIO_FEATURE_SCHEMA = ("sample_rate int, channels int, n_frames bigint, "
                        "duration_s double, zcr double, feature array<float>")


def decode_audio(payload: bytes, feature_dim: int = 8) -> dict[str, Any]:
    """Real decode + feature extraction: 16-bit PCM WAV (stdlib RIFF
    parser) → normalized per-window RMS energy envelope + zero-crossing
    rate. Deterministic and lib-independent; cites the reference's
    opaque-payload item model (host-go/engine/module/protocol.go:42-52)
    — media bytes are just another typed column."""
    from lens_spark.functions.audiocodec import (
        decode_wav,
        energy_envelope,
        zero_crossing_rate,
    )

    a = decode_wav(payload)
    env = energy_envelope(a["samples"], feature_dim)
    return {
        "sample_rate": a["sample_rate"],
        "channels": a["channels"],
        "n_frames": a["n_frames"],
        "duration_s": round(a["duration_s"], 6),
        "zcr": round(zero_crossing_rate(a["samples"]), 6),
        "feature": [float(round(x, 6)) for x in env],
    }


def _fake_decode_audio(payload: bytes, feature_dim: int) -> dict[str, Any]:
    """Deterministic fake audio decode, same sha256-hex stream trick as
    ``_fake_decode`` (hex-digest re-hashing keeps every derived byte
    reproducible with ANSI ``sha256(varchar)``, so the x4_audio_features
    oracle is full SQL, not rows-only)."""
    hexd = hashlib.sha256(payload or b"").hexdigest()

    def byte(h: str, k: int) -> int:
        return int(h[2 * k:2 * k + 2], 16)

    # rates all divide 10^6, so duration_s is EXACT at 6 decimals —
    # no round-tie divergence between Python (banker's) and SQL round
    sample_rate = (8000, 10000, 20000)[byte(hexd, 0) % 3]
    n_frames = 1 + byte(hexd, 2) * 256 + byte(hexd, 3)
    s1 = hashlib.sha256(hexd.encode("ascii")).hexdigest()
    feature = [byte(s1, i % 32) / 255.0 for i in range(feature_dim)]
    return {
        "sample_rate": int(sample_rate),
        "channels": 1 + byte(hexd, 1) % 2,
        "n_frames": int(n_frames),
        "duration_s": round(n_frames / sample_rate, 6),
        "zcr": round(byte(hexd, 4) / 255.0, 6),
        "feature": [float(x) for x in feature],
    }


def audio_features(df: DataFrame, payload_col: str, *, feature_dim: int = 8,
                   fake: bool = False, keep: list[str] | None = None) -> DataFrame:
    """Audio twin of ``image_features``: mapInPandas over the binary
    column, emitting kept id columns + metadata + the energy-envelope
    feature block. Same partition-sizing note: payloads dominate row
    width, tune ``spark.sql.files.maxPartitionBytes`` to payload size."""
    keep = keep or []
    out_schema = ", ".join(
        [f"{c} {dict(df.dtypes)[c]}" for c in keep] + [AUDIO_FEATURE_SCHEMA]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _fake_decode_audio(p, feature_dim) if fake
                else decode_audio(p, feature_dim)
                for p in pdf[payload_col]
            ]
            out = pd.DataFrame(decoded)
            for c in reversed(keep):
                out.insert(0, c, pdf[c].values)
            yield out

    return df.mapInPandas(run, schema=out_schema)


@register_lens("audio_features")
def audio_features_lens(arguments: Mapping[str, Any]) -> Lens:
    payload_col = str(require_arg(arguments, "column", "audio_features"))
    return Lens("audio_features", arguments, lambda df: audio_features(
        df, payload_col,
        feature_dim=int(arguments.get("feature_dim", 8)),
        fake=bool(arguments.get("fake", False)),
        keep=[str(c) for c in (arguments.get("keep") or [])]))


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
