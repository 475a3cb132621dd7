"""Multimodal plumbing: stub gating and Arrow batch behavior."""

from __future__ import annotations

import pytest

from bookstore_aws_lakehouse_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    extract_media_features,
)


def test_decode_media_stub_is_gated():
    with pytest.raises(NotImplementedError):
        decode_media(b"payload", "image")


def test_decode_media_fake_is_deterministic():
    assert decode_media(b"abc", "image", fake=True) == decode_media(b"abc", "image", fake=True)
    w, h = decode_media(b"abc", "image", fake=True)
    assert 64 <= w <= 2048 and 64 <= h <= 2048


def test_extract_features_roundtrip(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "world")], ["doc_id", "text"])
    media = attach_payload(df, "doc_id", "text")
    assert media.schema["payload"].dataType.typeName() == "binary"
    out = {r["doc_id"]: r for r in extract_media_features(media).collect()}
    assert out[1]["n_bytes"] == 5
    import hashlib

    assert out[2]["content_md5"] == hashlib.md5(b"world").hexdigest()


def test_resize_stub_plumbing(spark):
    from bookstore_aws_lakehouse_spark.operators.multimodal import resize_media

    df = spark.createDataFrame([(1, "hello"), (2, "world")], ["doc_id", "text"])
    media = attach_payload(df, "doc_id", "text", media_type="image")
    out = resize_media(media, 224, 224).collect()
    assert len(out) == 2
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)
    assert bytes(out[0]["payload"])  # payload survives the stage


def test_sample_frames_fan_out(spark):
    from bookstore_aws_lakehouse_spark.operators.multimodal import sample_frames

    long_text = "x" * 300  # 300 bytes → 4 frames at 64 bytes, capped below 8
    df = spark.createDataFrame([(1, long_text), (2, "tiny")], ["doc_id", "text"])
    media = attach_payload(df, "doc_id", "text", media_type="video")
    out = sample_frames(media, every_n_bytes=64, max_frames=8).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_no"])
    assert sorted(per_doc[1]) == [0, 1, 2, 3]
    assert per_doc[2] == [0]  # short payload still yields one frame
    # deterministic fingerprints
    again = sample_frames(media, every_n_bytes=64, max_frames=8).collect()
    assert {(r["doc_id"], r["frame_no"], r["frame_md5"]) for r in out} == {
        (r["doc_id"], r["frame_no"], r["frame_md5"]) for r in again
    }
