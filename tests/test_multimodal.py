"""Multimodal plumbing: schema, determinism, pruning, stub behavior."""

from __future__ import annotations

import numpy as np
import pytest

from proj_spark import multimodal as mm


@pytest.fixture(scope="module")
def spark():
    from proj_spark.session import get_spark
    s = get_spark("test_multimodal", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def media(spark):
    return mm.build_media_fixture(spark, "/root/testdata/sf0.001").cache()


def test_image_features_schema_and_determinism(spark, media):
    f1 = mm.image_features(media).toPandas().sort_values("media_id")
    f2 = mm.image_features(media).toPandas().sort_values("media_id")
    assert list(f1.columns) == ["media_id", "width", "height", "mean_luma", "embedding"]
    assert len(f1) == media.filter("kind = 'image'").count() > 0
    assert (f1.width >= 64).all() and (f1.width < 256).all()
    for a, b in zip(f1.embedding, f2.embedding):
        assert np.allclose(a, b)
        assert len(a) == 16
        assert abs(float(np.linalg.norm(np.asarray(a, dtype=np.float64))) - 1.0) < 1e-6


def test_frame_sampling(spark, media):
    frames = mm.sample_frames(media, every_n=5).toPandas()
    assert len(frames) > 0
    assert set(frames.columns) == {"media_id", "frame_idx", "frame_sha"}
    assert (frames.frame_idx % 5 == 0).all()
    # deterministic digests
    again = mm.sample_frames(media, every_n=5).toPandas()
    a = frames.sort_values(["media_id", "frame_idx"]).frame_sha.tolist()
    b = again.sort_values(["media_id", "frame_idx"]).frame_sha.tolist()
    assert a == b


def test_real_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        mm._decode_image_real(b"\x89PNG...")


def test_binary_column_pruned_from_features_plan(spark, media):
    plan = mm.image_features(media)._jdf.queryExecution().executedPlan().toString()
    # features output never carries the heavy binary column
    assert "content" not in mm.image_features(media).columns
