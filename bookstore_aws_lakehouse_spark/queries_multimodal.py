"""Oracle-checked multimodal-plumbing query: the Pandas-UDF (mapInPandas)
path computes byte-level features whose values DuckDB can recompute from
the source text — verifying the Arrow round-trip, batch schema, and the
deterministic stub decoder's inputs (n_bytes, md5) exactly. The decoded
width/height are stub-derived (md5 bytes), recomputed in SQL from the same
md5 hex — so even the fake decode is value-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from bookstore_aws_lakehouse_spark.catalog import load_table
from bookstore_aws_lakehouse_spark.operators.multimodal import (
    attach_payload,
    extract_media_features,
)
from bookstore_aws_lakehouse_spark.registry import golden


@golden(
    "multimodal_features",
    """
    SELECT doc_id, 'text' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           CAST(list_max(list_transform(string_split(text, chr(10)),
                                        x -> octet_length(encode(x)))) AS INT) AS width,
           CAST(len(string_split(text, chr(10))) AS INT) AS height
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline with the REAL decoder (the default): attach
    binary payloads (UTF-8 text), then Arrow-batched mapInPandas feature
    extraction. Text payloads decode to their layout box — width = longest
    line in bytes, height = line count — which the oracle recomputes with
    string_split over the source column (ASCII corpus: byte and char
    offsets coincide)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs, "doc_id", "text")
    return extract_media_features(media)


@golden(
    "multimodal_features_stub",
    """
    WITH m AS (
      SELECT doc_id, 'text' AS media_type,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS content_md5
      FROM documents
    )
    SELECT doc_id, media_type, CAST(n_bytes AS BIGINT) AS n_bytes, content_md5,
           CAST(64 + (('0x' || substring(content_md5, 3, 2) || substring(content_md5, 1, 2))::INT % 1985) AS INT) AS width,
           CAST(64 + (('0x' || substring(content_md5, 7, 2) || substring(content_md5, 5, 2))::INT % 1985) AS INT) AS height
    FROM m
    """,
)
def q_multimodal_features_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic STUB decoder (the opt-in path for codec-less
    formats like JPEG/MP4), value-checked: the oracle reconstructs the
    pseudo width/height from md5 little-endian byte pairs — bit-for-bit
    the stub's formula — so even the fake path can't drift silently."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs, "doc_id", "text")
    return extract_media_features(media, fake_decode=True)


@golden(
    "multimodal_decode_real",
    """
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END AS media_type,
             1 + doc_id % 16 AS w,
             1 + doc_id % 8 AS h,
             1 + doc_id % 100 AS frames
      FROM documents
    )
    SELECT doc_id, media_type,
           CAST(CASE WHEN media_type = 'image/bmp'
                     THEN 54 + h * ((w * 3 + 3) // 4 * 4)
                     ELSE 44 + frames * 2 END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN media_type = 'image/bmp' THEN w ELSE 1 END AS INT) AS width,
           CAST(CASE WHEN media_type = 'image/bmp' THEN h ELSE frames END AS INT) AS height
    FROM m
    """,
)
def q_multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL (non-stub) media decode, stdlib-only: synthesize spec-valid
    BMP/WAV payloads from doc_ids (`synthesize_media`), then run the
    Arrow-batched feature extractor with ``fake_decode=False`` so the BMP
    DIB header and WAV RIFF header are genuinely parsed (struct / wave
    module — operators/multimodal.py:decode_media). The oracle predicts
    decoded width/height AND the exact payload byte size from the id
    formulas: BMP = 54-byte headers + 4-byte-padded rows, WAV = 44-byte
    canonical header + 2 bytes/frame. A decoder bug (wrong header offset,
    wrong padding) breaks the hash match. content_md5 is projected out —
    byte-level hashing is covered by `multimodal_features`'s oracle."""
    from bookstore_aws_lakehouse_spark.operators.multimodal import synthesize_media

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    feats = extract_media_features(synthesize_media(docs), fake_decode=False)
    return feats.select("doc_id", "media_type", "n_bytes", "width", "height")


@golden(
    "multimodal_resize_real",
    """
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image/bmp' ELSE 'audio/wav' END AS media_type,
             1 + doc_id % 100 AS frames
      FROM documents
    )
    SELECT doc_id, media_type,
           CAST(CASE WHEN media_type = 'image/bmp'
                     THEN 54 + 4 * 24      -- 8x4 24bpp: stride 24, no pad
                     ELSE 44 + frames * 2  -- WAV passes through unresized
                     END AS BIGINT) AS n_bytes,
           CAST(CASE WHEN media_type = 'image/bmp' THEN 8 ELSE 1 END AS INT) AS width,
           CAST(CASE WHEN media_type = 'image/bmp' THEN 4 ELSE frames END AS INT) AS height
    FROM m
    """,
)
def q_multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize path end-to-end: synthesize spec-valid BMP/WAV
    payloads, nearest-neighbor resample the BMPs to 8×4 with the
    stdlib-only re-encoder (`resize_bmp`), then REAL-decode the resized
    bytes. The oracle predicts the resized BMP's exact byte size (54-byte
    headers + 4 rows × 24-byte stride) and decoded dims from the id
    formulas; a re-encoder bug (wrong stride, wrong header field) breaks
    the decode or the size. Pixel-level fidelity is asserted in
    tests/test_multimodal.py (uniform-fill and gradient resamples)."""
    from bookstore_aws_lakehouse_spark.operators.multimodal import (
        resize_media,
        synthesize_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    resized = resize_media(synthesize_media(docs), 8, 4)
    feats = extract_media_features(
        resized.select("doc_id", "media_type", "payload"), fake_decode=False
    )
    return feats.select("doc_id", "media_type", "n_bytes", "width", "height")


@golden(
    "multimodal_frame_sample",
    """
    WITH d AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n FROM documents
    ),
    f AS (
      SELECT doc_id, text,
             unnest(generate_series(0, least(8, greatest(1, n // 64)) - 1)) AS frame_no
      FROM d
    )
    SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
           md5(substring(text, frame_no * 64 + 1, 64)) AS frame_md5
    FROM f
    """,
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling fan-out through mapInPandas: every 64-byte payload
    slice becomes a fingerprinted 'frame' row (stub for video frame
    extraction — one input row fans out to ≤8 output rows inside the
    Arrow batch). The oracle re-slices the SOURCE text instead: the
    fixture corpus is pure ASCII, so byte offsets and character offsets
    coincide and DuckDB's substring+md5 reproduces every frame hash the
    Python stage emitted — the Arrow byte round-trip is value-checked."""
    from bookstore_aws_lakehouse_spark.operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    media = attach_payload(docs, "doc_id", "text")
    return sample_frames(media, every_n_bytes=64, max_frames=8, fake=True)
