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
