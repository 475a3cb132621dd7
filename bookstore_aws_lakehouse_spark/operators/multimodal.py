"""Multimodal-column plumbing (extension surface; SURVEY §7.2 phase 4).

Media (image/audio/video) are opaque ``binary`` payloads with a typed
metadata struct riding alongside. The Spark-side machinery is real and
tested — schema, Arrow-batched ``mapInPandas``, partition sizing — and
``decode_media`` genuinely parses every format expressible with the
stdlib (text layout, BMP DIB headers, WAV RIFF headers); only formats
needing absent codec libraries (PIL/ffmpeg: JPEG, MP4, ...) fall back to
``NotImplementedError`` unless ``fake=True``, which substitutes a
deterministic synthetic decoder (byte-derived pseudo-dimensions) so the
pipeline shape for those formats stays exercisable end-to-end.

Scale notes: payloads stay in Arrow buffers end-to-end (no Python-object
rows); ``mapInPandas`` processes whole record batches, so per-row overhead
is amortized; repartition by size before decode so one straggler video
doesn't skew a partition (callers control partitioning — this module never
shuffles).
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: output schema of the feature-extraction stage
MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)

#: schema of a multimodal row: opaque payload + typed metadata
MULTIMODAL_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, content_col: str, media_type: str = "text") -> DataFrame:
    """Build a multimodal table from any content column: payload =
    UTF-8 bytes (stand-in for real media ingested from object storage)."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(content_col), "UTF-8").alias("payload"),
    )


def make_bmp(width: int, height: int, fill: int = 0) -> bytes:
    """A real, spec-conforming 24-bpp BMP (BITMAPINFOHEADER), built with
    stdlib ``struct`` only. Rows are bottom-up and zero-padded to 4 bytes
    per the format; every PIXEL byte is ``fill`` so payloads are
    deterministic (padding is zero — the same convention ``resize_bmp``
    re-encodes with, so uniform-fill round-trips are byte-identical at
    any width, found by the hypothesis property test). Used by
    tests/fixtures so ``decode_media`` has a genuinely-decodable format
    in an environment without codec libraries."""
    row_stride = (width * 3 + 3) // 4 * 4
    image_size = row_stride * height
    file_size = 54 + image_size
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size, 2835, 2835, 0, 0
    )
    row = bytes([fill % 256]) * (width * 3) + b"\x00" * (row_stride - width * 3)
    return header + dib + row * height


def make_wav(n_frames: int, n_channels: int = 1, sample_rate: int = 8000) -> bytes:
    """A real RIFF/WAVE payload via the stdlib ``wave`` module: 16-bit PCM,
    ``n_frames`` frames of silence. 44-byte canonical header + 2 bytes per
    sample, so total size is SQL-predictable: 44 + n_frames·2·n_channels."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(b"\x00\x00" * (n_frames * n_channels))
    return buf.getvalue()


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> tuple[int, int]:
    """Decode a media payload to (width, height).

    Real branches (stdlib-only, run everywhere): BMP — width/height
    struct-read from the DIB header; WAV — (n_channels, n_frames) via the
    ``wave`` module. Formats needing PIL/ffmpeg (JPEG, MP4, ...) are not
    decodable in this environment: the ``fake`` path derives deterministic
    pseudo-dimensions from the payload bytes so that plumbing for those
    formats stays testable with stable outputs.
    """
    if fake:
        h = hashlib.md5(payload).digest()
        width = 64 + (h[0] | (h[1] << 8)) % 1985  # 64..2048
        height = 64 + (h[2] | (h[3] << 8)) % 1985
        return width, height
    if media_type.startswith("text"):
        # text "decodes" to its layout box: width = longest line in
        # bytes, height = line count (split on \n, trailing-newline
        # convention matching SQL string_split)
        lines = payload.split(b"\n")
        return max(len(ln) for ln in lines), len(lines)
    if payload[:2] == b"BM":
        width, height = struct.unpack_from("<ii", payload, 18)
        return width, abs(height)  # negative height = top-down row order
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        with wave.open(io.BytesIO(payload), "rb") as w:
            return w.getnchannels(), w.getnframes()
    raise NotImplementedError(
        f"decoding {media_type!r} requires codec libraries not present in "
        "this environment; only BMP/WAV decode natively — pass fake=True "
        "for the deterministic stub"
    )


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic real-format payloads from an id column (fixture
    generator for the no-codec environment): even ids become 24-bpp BMPs
    with width = 1 + id%16, height = 1 + id%8; odd ids become mono 16-bit
    WAVs with 1 + id%100 frames. Every byte is a pure function of the id,
    so an SQL oracle can predict the decoded dimensions AND payload sizes
    without reconstructing the bytes. Map-side mapInPandas — no shuffle."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # the select below has already normalized the id column's
            # name — indexing by the caller's id_col would KeyError for
            # any non-default id column
            # a NULL id arrives as float NaN after Arrow->pandas; emit a
            # NULL-payload row instead of int(NaN) killing the task
            ids = pdf["doc_id"]
            types, payloads = [], []
            for i in ids:
                if i is None or (isinstance(i, float) and i != i):
                    types.append(None)
                    payloads.append(None)
                    continue
                i = int(i)
                if i % 2 == 0:
                    types.append("image/bmp")
                    payloads.append(make_bmp(1 + i % 16, 1 + i % 8, fill=i))
                else:
                    types.append("audio/wav")
                    payloads.append(make_wav(1 + i % 100))
            yield pd.DataFrame(
                {"doc_id": ids, "media_type": types, "payload": payloads}
            )

    return df.select(F.col(id_col).cast("long").alias("doc_id")).mapInPandas(
        build, schema=MULTIMODAL_SCHEMA
    )


def extract_media_features(df: DataFrame, fake_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over multimodal rows via
    ``mapInPandas``: byte length, content hash, and decoded dimensions.
    Real decode is the DEFAULT — text/BMP/WAV payloads parse natively
    (stdlib only); pass ``fake_decode=True`` only for formats whose codec
    libraries are absent (JPEG, MP4, ...). One pass, no shuffle; output
    conforms to MEDIA_FEATURES_SCHEMA."""

    def features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            # NULL payloads (a NULL source column through attach_payload)
            # must yield NULL features, not a len(None) TypeError that
            # kills the whole task
            # guarded decode: one corrupt/truncated/unknown-codec row
            # degrades to NULL dims instead of killing the whole job
            # (the same contract resize_media's pass-through keeps)
            dims = []
            for p, t in zip(payloads, pdf["media_type"]):
                if p is None:
                    dims.append((None, None))
                    continue
                try:
                    dims.append(decode_media(p, t, fake=fake_decode))
                except Exception:
                    dims.append((None, None))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pd.array(
                        [len(b) if b is not None else None for b in payloads],
                        dtype="Int64",
                    ),
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "width": pd.array([d[0] for d in dims], dtype="Int32"),
                    "height": pd.array([d[1] for d in dims], dtype="Int32"),
                }
            )

    return df.mapInPandas(features, schema=MEDIA_FEATURES_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def resize_bmp(payload: bytes, target_w: int, target_h: int) -> bytes:
    """REAL nearest-neighbor resample of a 24-bpp BMP, stdlib-only:
    struct-decode the DIB header, index source rows (bottom-up, 4-byte
    padded stride) and pixels by the standard nearest map
    ``src = floor(dst * src_dim / dst_dim)``, re-encode via make_bmp's
    header layout. Deterministic: output bytes are a pure function of
    (payload, target dims)."""
    src_w, src_h_raw = struct.unpack_from("<ii", payload, 18)
    # negative DIB height = top-down row order: reverse the source row
    # index so the (bottom-up) output isn't vertically flipped
    top_down = src_h_raw < 0
    src_h = abs(src_h_raw)
    data_off = struct.unpack_from("<I", payload, 10)[0]
    src_stride = (src_w * 3 + 3) // 4 * 4
    dst_stride = (target_w * 3 + 3) // 4 * 4
    rows = bytearray()
    pad = b"\x00" * (dst_stride - target_w * 3)
    for y in range(target_h):
        src_y = y * src_h // target_h
        if top_down:
            src_y = src_h - 1 - src_y
        row_off = data_off + src_y * src_stride
        row = bytearray()
        for x in range(target_w):
            px = row_off + (x * src_w // target_w) * 3
            row += payload[px : px + 3]
        rows += row + pad
    file_size = 54 + len(rows)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, target_w, target_h, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    return header + dib + bytes(rows)


def resize_media(df: DataFrame, target_w: int, target_h: int, fake: bool = False) -> DataFrame:
    """Resize stage inside the same Arrow batch (mapInPandas, map-side
    only). The REAL branch (default) decodes and nearest-neighbor
    resamples 24-bpp BMP payloads with the stdlib (``resize_bmp``) and
    stamps the target dims; non-BMP payloads pass through with their
    original bytes (resampling audio/video needs codec libraries absent
    here) and keep their DECODED dims (NULL when undecodable) — metadata
    always describes the payload it rides with. ``fake=True`` skips
    decoding entirely and stamps targets on every row — the plumbing
    stub for formats whose real path can't run in this environment."""

    def do_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "media_type", "payload"]].copy()
            if fake:
                out["width"] = pd.Series([target_w] * len(pdf), dtype="int32")
                out["height"] = pd.Series([target_h] * len(pdf), dtype="int32")
                yield out
                continue
            payloads, widths, heights = [], [], []
            for p, mt in zip(out["payload"], out["media_type"]):
                if p is not None and p[:2] == b"BM":
                    # a truncated or non-24-bpp 'BM' payload must not
                    # kill the task OR be silently resampled as 24-bpp
                    # garbage: pass the original through with NULL dims
                    try:
                        if len(p) >= 32:
                            import struct as _struct

                            bpp = _struct.unpack_from("<H", p, 28)[0]
                            comp = _struct.unpack_from("<I", p, 30)[0]
                        else:
                            bpp, comp = None, None
                        if bpp == 24 and comp == 0:
                            payloads.append(resize_bmp(p, target_w, target_h))
                            widths.append(target_w)
                            heights.append(target_h)
                            continue
                        payloads.append(p)
                        widths.append(None)
                        heights.append(None)
                        continue
                    except Exception:
                        payloads.append(p)
                        widths.append(None)
                        heights.append(None)
                        continue
                else:
                    # pass-through: metadata must describe the ACTUAL
                    # payload, not the targets — decode its real dims
                    # where the format allows, else leave them NULL
                    payloads.append(p)
                    try:
                        w, h = decode_media(p, mt) if p is not None else (None, None)
                    except Exception:
                        # undecodable payload (unsupported codec, corrupt
                        # RIFF/truncated header → wave.Error/EOFError/
                        # struct.error, NULL media_type → AttributeError):
                        # degrade to NULL dims rather than failing the job
                        w, h = None, None
                    widths.append(w)
                    heights.append(h)
            out["payload"] = payloads
            out["width"] = pd.array(widths, dtype="Int32")
            out["height"] = pd.array(heights, dtype="Int32")
            yield out

    return df.mapInPandas(do_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame_md5", StringType()),
    ]
)


def sample_frames(df: DataFrame, every_n_bytes: int = 64, max_frames: int = 8, fake: bool = True) -> DataFrame:
    """Frame-sampling stage (STUB): real videos decode and emit every Nth
    frame; the fake path treats each ``every_n_bytes`` payload slice as a
    'frame' and fingerprints it — deterministic, and it exercises the
    real distributed concern: one input row fanning out to many output
    rows inside mapInPandas (batch shapes change, schema doesn't)."""

    if not fake:
        # raise at DRIVER time: the executor-side check fired only in
        # tasks that received rows, so the same misuse either failed
        # mid-job or silently succeeded depending on partitioning
        raise NotImplementedError(
            "video decoding requires codec libraries not present here"
        )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_no": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue  # no payload, no frames — never crash the task
                for i in range(min(max_frames, max(1, len(payload) // every_n_bytes))):
                    chunk = payload[i * every_n_bytes : (i + 1) * every_n_bytes]
                    rows["doc_id"].append(doc_id)
                    rows["frame_no"].append(i)
                    rows["frame_md5"].append(hashlib.md5(chunk).hexdigest())
            out = pd.DataFrame(rows)
            out["frame_no"] = out["frame_no"].astype("int32")
            yield out

    return df.mapInPandas(frames, schema=FRAME_SCHEMA)
