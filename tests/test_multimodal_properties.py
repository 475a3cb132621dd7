"""Property-based tests (hypothesis) for the pure-Python media codecs —
no SparkSession needed, so these run in milliseconds and explore the
input space far beyond the fixture dims."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from bookstore_aws_lakehouse_spark.operators.multimodal import (
    decode_media,
    make_bmp,
    make_wav,
    resize_bmp,
)

dims = st.integers(min_value=1, max_value=64)
fills = st.integers(min_value=0, max_value=255)


@settings(max_examples=200, deadline=None)
@given(w=dims, h=dims, fill=fills)
def test_bmp_roundtrip_any_dims(w, h, fill):
    payload = make_bmp(w, h, fill=fill)
    assert decode_media(payload, "image/bmp") == (w, h)
    assert len(payload) == 54 + h * ((w * 3 + 3) // 4 * 4)


@settings(max_examples=100, deadline=None)
@given(w=dims, h=dims, fill=fills, tw=dims, th=dims)
def test_resize_bmp_always_decodes_to_target(w, h, fill, tw, th):
    out = resize_bmp(make_bmp(w, h, fill=fill), tw, th)
    assert decode_media(out, "image/bmp") == (tw, th)
    assert len(out) == 54 + th * ((tw * 3 + 3) // 4 * 4)
    # uniform source stays uniform through nearest-neighbor
    assert out[54:] == make_bmp(tw, th, fill=fill)[54:]


@settings(max_examples=100, deadline=None)
@given(
    frames=st.integers(min_value=1, max_value=500),
    channels=st.integers(min_value=1, max_value=2),
)
def test_wav_roundtrip_any_frames(frames, channels):
    payload = make_wav(frames, n_channels=channels)
    assert decode_media(payload, "audio/wav") == (channels, frames)
    assert len(payload) == 44 + frames * 2 * channels


@settings(max_examples=200, deadline=None)
@given(text=st.text(alphabet=st.characters(codec="ascii"), max_size=400))
def test_text_decode_layout_box(text):
    payload = text.encode()
    w, h = decode_media(payload, "text")
    lines = payload.split(b"\n")
    assert h == len(lines)
    assert w == max(len(ln) for ln in lines)
