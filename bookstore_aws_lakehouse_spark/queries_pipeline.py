"""End-to-end dataset-curation pipeline as ONE oracle-checked query.

The individual stages (quality gate, exact dedup, hash split, hash
subsample) are each driver-verified on their own; production runs them
COMPOSED, where stage-interaction bugs live (a dedup that sees pre-filter
rows, a split applied after sampling, ...). This module pins the whole
chain — documents → quality filter → canonical dedup survivors →
train/test split → train-side subsample — to a single DuckDB twin that
replays every gate bit-for-bit.

Registered in its own module so the verification-first ordering in
``__spark_entry__.queries()`` places it AFTER all previously-unchecked
queries: it can never displace an outstanding CORRECTNESS row from the
driver's per-round window.

Scale shape: one scan; the only shuffle is the dedup's groupBy(text)
(16-byte-hashable, map-side combinable — at 100 TB group on a content
fingerprint instead of raw text, exactly like operators/dedup.py's
fingerprint path); every other stage is a map-side hash gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.catalog import load_table
from bookstore_aws_lakehouse_spark.operators.sampling import (
    split_bucket,
    train_test_split,
)
from bookstore_aws_lakehouse_spark.operators.text import with_quality_features
from bookstore_aws_lakehouse_spark.queries_text import (
    QUALITY_MIN_DISTINCT_RATIO,
    QUALITY_MIN_TOKENS,
)
from bookstore_aws_lakehouse_spark.registry import golden

_BUCKET = (
    "((('0x' || substring(md5('{salt}:' || CAST(doc_id AS STRING)), 1, 15))::BIGINT"
    " % 1000) + 1000) % 1000"
)

#: keep-rate (per mille) for the train-side subsample stage
CURATE_KEEP = 500


@golden(
    "dataset_curation_pipeline",
    f"""
    WITH q AS (
      SELECT doc_id, lang, source, text,
             len(string_split(text, ' ')) AS n_tokens,
             len(list_distinct(string_split(text, ' ')))
               / CAST(len(string_split(text, ' ')) AS DOUBLE) AS distinct_ratio
      FROM documents
    ),
    f AS (
      SELECT * FROM q
      WHERE n_tokens >= {QUALITY_MIN_TOKENS}
        AND distinct_ratio >= {QUALITY_MIN_DISTINCT_RATIO}
    ),
    d AS (
      SELECT *, min(doc_id) OVER (PARTITION BY text) AS canonical_id FROM f
    ),
    k AS (
      SELECT doc_id, lang, source, n_tokens FROM d WHERE doc_id = canonical_id
    ),
    s AS (
      SELECT *,
             CASE WHEN {_BUCKET.format(salt="split")} < 200
                  THEN 'test' ELSE 'train' END AS split
      FROM k
    )
    SELECT doc_id, lang, source, CAST(n_tokens AS BIGINT) AS n_tokens, split
    FROM s
    WHERE split = 'test' OR {_BUCKET.format(salt="curate")} < {CURATE_KEEP}
    """,
)
def q_dataset_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-corpus manifest: quality-gate the documents
    (`with_quality_features` thresholds shared with `text_quality_filter`),
    keep one canonical copy per exact-duplicate group (min doc_id), tag
    the stable hash split, and subsample the train side to
    CURATE_KEEP/1000 with an independent salt — test rows are never
    sampled (evaluation sets must stay complete). Every gate is an
    id-hash, so membership is bit-reproducible across engines, runs and
    partitionings; the oracle replays the full chain."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    feat = with_quality_features(docs)
    passed = feat.filter(
        (F.col("n_tokens") >= QUALITY_MIN_TOKENS)
        & (F.col("distinct_ratio") >= QUALITY_MIN_DISTINCT_RATIO)
    )
    from pyspark.sql import Window

    canon = passed.withColumn(
        "canonical_id", F.min("doc_id").over(Window.partitionBy("text"))
    ).filter(F.col("doc_id") == F.col("canonical_id"))
    split = train_test_split(
        canon.select("doc_id", "lang", "source", "n_tokens"), "doc_id"
    )
    return split.filter(
        (F.col("split") == "test")
        | (split_bucket("doc_id", "curate") < CURATE_KEEP)
    ).select(
        "doc_id",
        "lang",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        "split",
    )
