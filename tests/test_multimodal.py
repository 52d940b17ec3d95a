"""X4 multimodal plumbing tests: binary columns + stubbed codecs.

The codecs are stubbed (no image/audio libs in this container); what
these tests pin down is the real part — schemas, Arrow batch shape,
cardinality contracts, determinism, and the NotImplementedError gate
on the non-fake path.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from lens_spark import engine
from lens_spark.operators.multimodal import (
    attach_media_metadata,
    image_features,
    resize_image,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, b"a" * 100), (2, b"b" * 35), (3, b"")],
        "media_id long, payload binary")
    return docs


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


def test_real_codec_path_raises_not_implemented(spark, media):
    with pytest.raises(PythonException, match="NotImplementedError"):
        image_features(media, "payload", fake=False).collect()
    with pytest.raises(PythonException, match="NotImplementedError"):
        resize_image(media, "payload", width=8, height=8, fake=False).collect()


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
