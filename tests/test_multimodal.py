"""Multimodal plumbing: stub gating and Arrow batch behavior."""

from __future__ import annotations

import pytest

from bookstore_aws_lakehouse_spark.operators.multimodal import (
    attach_payload,
    decode_media,
    extract_media_features,
)


def test_decode_media_stub_is_gated():
    # non-BMP/WAV payloads still require the fake path
    with pytest.raises(NotImplementedError):
        decode_media(b"payload", "image")


def test_decode_media_real_bmp_roundtrip():
    from bookstore_aws_lakehouse_spark.operators.multimodal import make_bmp

    for w, h in [(1, 1), (3, 2), (16, 8), (640, 480)]:
        payload = make_bmp(w, h, fill=7)
        assert payload[:2] == b"BM"
        assert decode_media(payload, "image/bmp") == (w, h)
        # spec size: 54-byte headers + 4-byte-padded rows
        assert len(payload) == 54 + h * ((w * 3 + 3) // 4 * 4)


def test_decode_media_real_bmp_topdown_rows():
    # negative DIB height = top-down row order; decoded height is positive
    import struct

    from bookstore_aws_lakehouse_spark.operators.multimodal import make_bmp

    payload = bytearray(make_bmp(4, 3))
    payload[22:26] = struct.pack("<i", -3)
    assert decode_media(bytes(payload), "image/bmp") == (4, 3)


def test_decode_media_real_wav_roundtrip():
    from bookstore_aws_lakehouse_spark.operators.multimodal import make_wav

    for frames, channels in [(1, 1), (50, 1), (100, 2)]:
        payload = make_wav(frames, n_channels=channels)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
        assert decode_media(payload, "audio/wav") == (channels, frames)
        assert len(payload) == 44 + frames * 2 * channels


def test_extract_features_real_decode(spark):
    """End-to-end: synthesized real BMP/WAV payloads through the Arrow
    mapInPandas extractor with fake_decode=False — the non-stub branch."""
    from bookstore_aws_lakehouse_spark.operators.multimodal import synthesize_media

    df = spark.range(0, 8).withColumnRenamed("id", "doc_id")
    feats = {
        r["doc_id"]: r
        for r in extract_media_features(
            synthesize_media(df), fake_decode=False
        ).collect()
    }
    assert len(feats) == 8
    for i in range(8):
        r = feats[i]
        if i % 2 == 0:
            assert r["media_type"] == "image/bmp"
            assert (r["width"], r["height"]) == (1 + i % 16, 1 + i % 8)
        else:
            assert r["media_type"] == "audio/wav"
            assert (r["width"], r["height"]) == (1, 1 + i % 100)


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


def test_resize_bmp_uniform_fill_exact_bytes():
    # nearest-neighbor of a uniform image is uniform: the resized payload
    # must equal make_bmp at the target dims byte-for-byte (pad-free 8x4)
    from bookstore_aws_lakehouse_spark.operators.multimodal import make_bmp, resize_bmp

    for w, h, fill in [(1, 1, 0), (16, 8, 7), (5, 3, 255)]:
        assert resize_bmp(make_bmp(w, h, fill=fill), 8, 4) == make_bmp(8, 4, fill=fill)


def test_resize_bmp_gradient_nearest_pixels():
    # non-uniform source: check the nearest map src = dst*src/dst picks the
    # expected source pixel. Build a 4x2 BMP whose pixel (x,y) has all
    # three channels = 10*y + x, downsample to 2x1 and verify pixels.
    import struct

    from bookstore_aws_lakehouse_spark.operators.multimodal import decode_media, make_bmp, resize_bmp

    src = bytearray(make_bmp(4, 2))
    stride = (4 * 3 + 3) // 4 * 4
    # rows indexed as stored (bottom-up) — resize_bmp preserves row order
    for y in range(2):
        for x in range(4):
            v = 10 * y + x
            off = 54 + y * stride + x * 3
            src[off : off + 3] = bytes([v, v, v])
    out = resize_bmp(bytes(src), 2, 1)
    assert decode_media(out, "image/bmp") == (2, 1)
    # nearest map: dst row 0 ← src row 0*2//1=0; dst x=0 ← src x=0*4//2=0,
    # dst x=1 ← src x=1*4//2=2 → channel values 0 and 2
    px0 = out[54:57]
    px1 = out[57:60]
    assert px0 == bytes([0, 0, 0]) and px1 == bytes([2, 2, 2])


def test_resize_media_real_branch(spark):
    from bookstore_aws_lakehouse_spark.operators.multimodal import (
        resize_media,
        synthesize_media,
    )

    df = spark.range(0, 6).withColumnRenamed("id", "doc_id")
    out = {r["doc_id"]: r for r in resize_media(synthesize_media(df), 8, 4).collect()}
    for i in range(6):
        payload = bytes(out[i]["payload"])
        if i % 2 == 0:  # BMP: genuinely resampled to 8x4 (stride 24, no pad)
            assert payload[:2] == b"BM"
            assert len(payload) == 54 + 4 * 24
            assert (out[i]["width"], out[i]["height"]) == (8, 4)
        else:  # WAV passes through unresized — metadata keeps its REAL
            # decoded dims (channels, frames), not the resize targets
            assert payload[:4] == b"RIFF"
            assert (out[i]["width"], out[i]["height"]) == (1, 1 + i % 100)


def test_resize_bmp_top_down_source_not_flipped():
    # a negative-height (top-down) DIB stores rows in reverse order;
    # resize_bmp must reverse the source row index so the resampled
    # (bottom-up) output depicts the same image as the bottom-up twin
    import struct

    from bookstore_aws_lakehouse_spark.operators.multimodal import make_bmp, resize_bmp

    src = bytearray(make_bmp(4, 2))
    stride = (4 * 3 + 3) // 4 * 4
    for y in range(2):
        for x in range(4):
            v = 10 * y + x
            off = 54 + y * stride + x * 3
            src[off : off + 3] = bytes([v, v, v])
    # top-down twin: negate the DIB height, reverse stored row order
    td = bytearray(src)
    struct.pack_into("<i", td, 22, -2)
    td[54 : 54 + stride], td[54 + stride : 54 + 2 * stride] = (
        src[54 + stride : 54 + 2 * stride],
        src[54 : 54 + stride],
    )
    assert resize_bmp(bytes(td), 2, 1) == resize_bmp(bytes(src), 2, 1)


def test_resize_stub_plumbing(spark):
    from bookstore_aws_lakehouse_spark.operators.multimodal import resize_media

    df = spark.createDataFrame([(1, "hello"), (2, "world")], ["doc_id", "text"])
    media = attach_payload(df, "doc_id", "text", media_type="image")
    out = resize_media(media, 224, 224, fake=True).collect()
    assert len(out) == 2
    assert all(r["width"] == 224 and r["height"] == 224 for r in out)
    assert bytes(out[0]["payload"])  # payload survives the stage
    # REAL branch on an undecodable format: payload passes through and the
    # dims are NULL — never a false claim of 224x224
    real = resize_media(media, 224, 224).collect()
    assert all(r["width"] is None and r["height"] is None for r in real)


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


def test_feature_extract_degrades_on_corrupt_payloads(spark):
    """One corrupt/truncated/unknown row must yield NULL dims, never
    kill the job (the resize stage's contract, now shared)."""
    from bookstore_aws_lakehouse_spark.operators.multimodal import (
        extract_media_features,
        make_bmp,
    )

    rows = [
        (1, "image/bmp", bytearray(make_bmp(2, 2, fill=1))),
        (2, "image/bmp", bytearray(b"BM\x01")),  # truncated header
        (3, None, bytearray(b"????")),  # NULL media type
        (4, "video/mp4", bytearray(b"\x00\x00\x00\x18ftyp")),  # no codec
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    got = {r.doc_id: (r.width, r.height) for r in extract_media_features(df).collect()}
    assert got[1] == (2, 2)
    assert got[2] == (None, None)
    assert got[3] == (None, None)
    assert got[4] == (None, None)


def test_resize_passes_through_truncated_and_exotic_bmps(spark):
    from bookstore_aws_lakehouse_spark.operators.multimodal import (
        make_bmp,
        resize_media,
    )

    rows = [
        (1, "image/bmp", bytearray(make_bmp(4, 2, fill=7))),
        (2, "image/bmp", bytearray(b"BM\x01\x02")),  # truncated
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, media_type string, payload binary"
    )
    got = {r.doc_id: (r.width, r.height, bytes(r.payload)) for r in resize_media(df, 2, 2, fake=False).collect()}
    assert got[1][:2] == (2, 2)
    # truncated 'BM' passes through UNCHANGED with NULL dims - neither a
    # crash nor silently-resampled garbage
    assert got[2] == (None, None, b"BM\x01\x02")


def test_sample_frames_refuses_real_mode_at_driver_time(spark):
    import pytest

    from bookstore_aws_lakehouse_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame([], "doc_id long, media_type string, payload binary")
    with pytest.raises(NotImplementedError):
        sample_frames(df, fake=False)  # even with zero rows
