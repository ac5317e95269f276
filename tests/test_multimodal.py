"""Multimodal binary-column plumbing: real schema/batch shapes, stubbed
codecs (FAKE format), dependency-free feature extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bigdataminingproject_spark.operators.multimodal import (
    decode_media,
    extract_features,
    make_fake_media,
    resize_images,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, make_fake_media(640, 480, b"a" * 100)),
        (1, make_fake_media(1920, 1080, bytes(range(256)))),
    ]
    return spark.createDataFrame(rows, "media_id long, content binary")


def test_decode_reads_header(spark, media):
    out = {r["media_id"]: r for r in decode_media(media).collect()}
    assert (out[0]["width"], out[0]["height"], out[0]["n_bytes"]) == (640, 480, 100)
    assert (out[1]["width"], out[1]["height"], out[1]["n_bytes"]) == (1920, 1080, 256)


def test_decode_real_codec_is_stubbed(spark):
    df = spark.createDataFrame(
        [(0, b"\x89PNG\r\n\x1a\nrealpngbytes")], "media_id long, content binary"
    )
    with pytest.raises(Exception) as exc:
        decode_media(df).collect()
    assert "NotImplementedError" in str(exc.value) or "not available" in str(
        exc.value
    )


def test_feature_embedding_shape_and_norm(spark, media):
    out = {r["media_id"]: r["embedding"] for r in extract_features(media).collect()}
    for vec in out.values():
        assert len(vec) == 16
        assert abs(sum(vec) - 1.0) < 1e-5  # L1-normalized histogram
    # uniform byte payload concentrates in one bin (100 of 112 bytes —
    # the 12 header bytes land elsewhere)
    assert max(out[0]) > 0.85


def test_resize_rewrites_header(spark, media):
    resized = resize_images(media, 64, 64)
    out = {r["media_id"]: r for r in decode_media(resized).collect()}
    assert out[0]["width"] == 64 and out[0]["height"] == 64
    assert out[0]["n_bytes"] == 100  # payload untouched by the stub


def test_sample_frames_slices_payload(spark, media):
    frames = sample_frames(media, every_n_bytes=64).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_index"])
    assert by_media[0] == [0, 1]  # 100 bytes → 2 frames of ≤64
    assert by_media[1] == [0, 1, 2, 3]  # 256 bytes → 4 frames


def test_media_features_query_end_to_end(spark, sf_dir):
    import __spark_entry__ as m

    out = m.queries()["q_media_features"](spark, sf_dir).collect()
    assert len(out) == 8  # width % 8 buckets
    assert sum(r["n_media"] for r in out) == 500


def test_sample_frames_slicing_and_headers(spark):
    from bigdataminingproject_spark.operators.multimodal import (
        make_fake_media,
        sample_frames,
    )

    payload = bytes(range(130 % 256)) + bytes(130 - (130 % 256))  # 130 B
    media = spark.createDataFrame(
        [(1, make_fake_media(5, 7, payload))], "media_id long, content binary"
    )
    out = sample_frames(media, every_n_bytes=64).collect()
    assert [r["frame_index"] for r in out] == [0, 1, 2]
    sizes = [len(r["frame"]) for r in out]
    assert sizes == [12 + 64, 12 + 64, 12 + 2]
    # every emitted frame re-wraps its slice with the original dims
    assert all(bytes(r["frame"])[:4] == b"FAKE" for r in out)
