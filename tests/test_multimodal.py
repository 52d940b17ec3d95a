"""X4 multimodal tests: binary columns, real PNG/BMP codecs, fakes.

Covers schemas, Arrow batch shape, cardinality contracts, determinism,
the real decode path (pure-stdlib PNG/BMP — see
lens_spark/functions/imagecodec.py and tests/test_imagecodec.py), and
the error gate on undecodable payloads.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from lens_spark import engine
from lens_spark.functions.imagecodec import decode_png, encode_png
from lens_spark.operators.multimodal import (
    attach_media_metadata,
    image_features,
    resize_image,
    sample_frames,
)


def _png(width: int, height: int, seed: int) -> bytes:
    px = bytes((seed * 37 + i * 11) % 256 for i in range(width * height * 3))
    return encode_png(width, height, "RGB", px)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, b"a" * 100), (2, b"b" * 35), (3, b"")],
        "media_id long, payload binary")
    return docs


@pytest.fixture(scope="module")
def png_media(spark):
    return spark.createDataFrame(
        [(1, _png(6, 4, 1)), (2, _png(3, 5, 2)), (3, _png(8, 8, 3))],
        "media_id long, payload binary")


def test_metadata_is_jvm_side_and_exact(spark, media):
    out = attach_media_metadata(media, "payload", mime="image/png")
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].payload_meta.n_bytes == 100
    assert rows[3].payload_meta.n_bytes == 0
    assert rows[1].payload_meta.mime == "image/png"
    # no Python stage in the plan — metadata must stay JVM-side
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "Python" not in plan


def test_image_features_schema_and_determinism(spark, media):
    out = image_features(media, "payload", feature_dim=8, fake=True,
                         keep=["media_id"])
    assert out.columns == ["media_id", "width", "height", "mode", "feature"]
    a = {r.media_id: r.feature for r in out.collect()}
    b = {r.media_id: r.feature for r in out.collect()}
    assert a == b  # deterministic across runs
    assert all(len(v) == 8 for v in a.values())
    assert all(0.0 <= x <= 1.0 for v in a.values() for x in v)


def test_real_path_rejects_undecodable_payloads(spark, media):
    with pytest.raises(PythonException, match="ImageFormatError"):
        image_features(media, "payload", fake=False).collect()
    with pytest.raises(PythonException, match="ImageFormatError"):
        resize_image(media, "payload", width=8, height=8, fake=False).collect()


def test_real_image_features_histogram(spark, png_media):
    out = image_features(png_media, "payload", feature_dim=8, fake=False,
                         keep=["media_id"])
    rows = {r.media_id: r for r in out.collect()}
    assert (rows[1].width, rows[1].height, rows[1].mode) == (6, 4, "RGB")
    assert (rows[2].width, rows[2].height) == (3, 5)
    for r in rows.values():
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-6  # normalized histogram
    # determinism across runs
    again = {r.media_id: r.feature for r in out.collect()}
    assert {k: v.feature for k, v in rows.items()} == again


def test_real_resize_reencodes_png(spark, png_media):
    out = resize_image(png_media, "payload", width=4, height=4, fake=False,
                       keep=["media_id"])
    for r in out.collect():
        img = decode_png(bytes(r.payload))
        assert (img["width"], img["height"], img["mode"]) == (4, 4, "RGB")
        assert (r.width, r.height) == (4, 4)


def test_real_sample_frames_from_png_stream(spark):
    frames = [_png(2, 2, s) for s in range(6)]
    stream = b"".join(frames)
    df = spark.createDataFrame([(1, stream)], "media_id long, payload binary")
    out = sample_frames(df, "payload", every_n=2, max_frames=2, fake=False,
                        keep=["media_id"])
    got = {r.frame_idx: bytes(r.frame) for r in out.collect()}
    # every 2nd frame of 6, capped at 2 → source indices 0 and 2
    assert got == {0: frames[0], 2: frames[2]}


def test_resize_changes_payload_deterministically(spark, media):
    r1 = resize_image(media, "payload", width=8, height=8, fake=True,
                      keep=["media_id"])
    r2 = resize_image(media, "payload", width=16, height=16, fake=True,
                      keep=["media_id"])
    p1 = {r.media_id: bytes(r.payload) for r in r1.collect()}
    p2 = {r.media_id: bytes(r.payload) for r in r2.collect()}
    assert set(p1) == {1, 2, 3}
    # output depends on target dims, not only input bytes
    assert all(p1[k] != p2[k] for k in p1)
    assert all(r.width == 8 and r.height == 8 for r in r1.collect())


def test_sample_frames_cardinality_and_keep(spark, media):
    out = sample_frames(media, "payload", every_n=10, max_frames=8,
                        fake=True, keep=["media_id"])
    counts = {r.media_id: r["count"] for r in
              out.groupBy("media_id").count().collect()}
    # 100 bytes → capped at 8; 35 bytes → 3; empty → 1
    assert counts == {1: 8, 2: 3, 3: 1}
    frames = [bytes(r.frame) for r in out.filter("media_id = 1").collect()]
    assert len(set(frames)) == 8  # distinct frames per index


def test_multimodal_lens_pipeline_composes(spark, media):
    spec = {"lenses": [
        {"name": "media_metadata", "arguments": {"column": "payload",
                                                 "mime": "video/mp4"}},
        {"name": "sample_frames", "arguments": {"column": "payload",
                                                "fake": True,
                                                "keep": ["media_id"]}},
        {"name": "resize_image", "arguments": {"column": "frame", "width": 4,
                                               "height": 4, "fake": True,
                                               "keep": ["media_id", "frame_idx"]}},
    ]}
    out = engine.append(media, spec)
    assert out.columns == ["media_id", "frame_idx", "frame", "width", "height"]
    assert out.count() == 12  # 8 + 3 + 1 frames


def test_wav_codec_round_trip():
    """encode_wav → decode_wav recovers rate/channels/frames and the
    samples to 16-bit precision; stereo mixes down to mono."""
    import numpy as np

    from lens_spark.functions.audiocodec import decode_wav, encode_wav

    t = np.arange(1600) / 16000.0
    mono = np.sin(2 * np.pi * 440 * t)
    payload = encode_wav(mono, sample_rate=16000, channels=1)
    a = decode_wav(payload)
    assert (a["sample_rate"], a["channels"], a["n_frames"]) == (16000, 1, 1600)
    assert abs(a["duration_s"] - 0.1) < 1e-9
    assert np.abs(a["samples"] - mono).max() < 1e-3   # 16-bit quantization

    stereo = np.stack([mono, -mono], axis=1).reshape(-1)  # L/R cancel
    a2 = decode_wav(encode_wav(stereo, sample_rate=8000, channels=2))
    assert a2["channels"] == 2 and np.abs(a2["samples"]).max() < 1e-3


def test_audio_features_real_path_envelope_and_zcr(spark):
    """A half-silent / half-tone clip concentrates envelope energy in
    the second half; white-noise-ish alternating samples have zcr ~ 1,
    a pure DC-offset clip has zcr 0."""
    import numpy as np

    from lens_spark.functions.audiocodec import encode_wav
    from lens_spark.operators.multimodal import audio_features

    sr = 8000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 200 * t)
    half = np.concatenate([np.zeros(sr), tone])
    alt = np.tile([0.5, -0.5], sr // 2)
    dc = np.full(sr, 0.25)
    df = spark.createDataFrame(
        [(1, encode_wav(half, sample_rate=sr)),
         (2, encode_wav(alt, sample_rate=sr)),
         (3, encode_wav(dc, sample_rate=sr))],
        "clip_id long, payload binary")
    got = {r.clip_id: r for r in
           audio_features(df, "payload", feature_dim=4,
                          keep=["clip_id"]).collect()}
    assert got[1].sample_rate == sr and got[1].duration_s == 2.0
    env = got[1].feature
    assert sum(env[:2]) < 0.01 and sum(env[2:]) > 0.99
    assert abs(sum(env) - 1.0) < 1e-4
    assert got[2].zcr > 0.9
    assert got[3].zcr == 0.0


def test_audio_features_fake_is_deterministic_and_undecodable_raises(spark, media):
    from lens_spark.operators.multimodal import audio_features

    fake1 = audio_features(media, "payload", fake=True,
                           keep=["media_id"]).collect()
    fake2 = audio_features(media, "payload", fake=True,
                           keep=["media_id"]).collect()
    assert fake1 == fake2
    rates = {r.sample_rate for r in fake1}
    assert rates <= {8000, 10000, 20000}
    with pytest.raises(PythonException):
        audio_features(media, "payload").collect()   # not WAV payloads


def test_perceptual_hash_dedup_properties(spark):
    """dHash: identical pixels → identical hash regardless of PNG byte
    stream; a lightly-perturbed copy lands within a few Hamming bits;
    a structurally different image lands far; a resized copy of a
    smooth gradient stays close (the property pHash-family hashes
    exist for)."""
    import numpy as np

    from lens_spark.functions.imagecodec import encode_png
    from lens_spark.operators.multimodal import perceptual_hash

    w, h = 32, 32
    # smooth horizontal gradient — dhash encodes the gradient signs
    grad = bytes(int(x * 255 / (w - 1)) for _ in range(h)
                 for x in range(w) for _ in range(3))
    img = encode_png(w, h, "RGB", grad)
    h0 = perceptual_hash(img)
    assert h0 == perceptual_hash(encode_png(w, h, "RGB", grad))
    # small perturbation: bump a few pixels slightly
    px = bytearray(grad)
    for i in range(0, 60, 3):
        px[i] = min(255, px[i] + 8)
    h1 = perceptual_hash(encode_png(w, h, "RGB", bytes(px)))
    # reversed gradient: every comparison flips
    rev = bytes(int((w - 1 - x) * 255 / (w - 1)) for _ in range(h)
                for x in range(w) for _ in range(3))
    h2 = perceptual_hash(encode_png(w, h, "RGB", rev))

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h0, h1) <= 6
    assert ham(h0, h2) >= 32
    # downscaled copy of the gradient keeps the same sign structure
    small = bytes(int(x * 255 / (w // 2 - 1)) for _ in range(h // 2)
                  for x in range(w // 2) for _ in range(3))
    h3 = perceptual_hash(encode_png(w // 2, h // 2, "RGB", small))
    assert ham(h0, h3) <= 8


def test_image_neardup_pairs_banded_join(spark):
    """The banded Hamming join finds the planted near-identical pair
    (exact for max_hamming ≤ 3 by pigeonhole), never the distant one;
    hashing runs once per image and the verify is JVM-side."""
    import numpy as np

    from lens_spark.functions.imagecodec import encode_png
    from lens_spark.operators.multimodal import (
        image_hash,
        image_neardup_pairs,
    )

    w, h = 32, 32
    grad = bytes(int(x * 255 / (w - 1)) for _ in range(h)
                 for x in range(w) for _ in range(3))
    px2 = bytearray(grad)
    px2[0] = min(255, px2[0] + 6)           # near-copy
    rev = bytes(int((w - 1 - x) * 255 / (w - 1)) for _ in range(h)
                for x in range(w) for _ in range(3))
    df = spark.createDataFrame(
        [(1, encode_png(w, h, "RGB", grad)),
         (2, encode_png(w, h, "RGB", bytes(px2))),
         (3, encode_png(w, h, "RGB", rev))],
        "media_id long, payload binary")
    pairs = image_neardup_pairs(df, "media_id", "payload",
                                max_hamming=3).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert all(r.hamming <= 3 for r in pairs)
    # hash column shape: one signed 64-bit hash per image
    hashes = image_hash(df, "payload", keep=["media_id"]).collect()
    assert len(hashes) == 3
    assert all(isinstance(r.image_hash, int) for r in hashes)


def test_image_hash_fake_mode_and_validation(spark, media):
    """fake=True hashes any payload deterministically (contract
    queries / oracle scaffolding); bad method and hamming bounds
    refuse loudly."""
    import pytest as _pytest

    from lens_spark.errors import LensError
    from lens_spark.operators.multimodal import (
        image_hash,
        image_neardup_pairs,
        perceptual_hash,
    )

    got = {r.media_id: r.image_hash
           for r in image_hash(media, "payload", fake=True,
                               keep=["media_id"]).collect()}
    again = {r.media_id: r.image_hash
             for r in image_hash(media, "payload", fake=True,
                                 keep=["media_id"]).collect()}
    assert got == again and len(set(got.values())) == 3
    with _pytest.raises(LensError, match="method must be"):
        perceptual_hash(b"BMxx", method="phash")
    with _pytest.raises(LensError, match="max_hamming"):
        image_neardup_pairs(media, "media_id", "payload", max_hamming=99)
