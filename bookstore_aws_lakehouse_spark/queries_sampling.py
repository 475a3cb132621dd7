"""Oracle-checked dataset split/mix queries — the hash-gate formula
(md5-derived bucket in [0,1000)) is replayed verbatim in SQL, so the
oracle verifies the exact membership of every row, not just counts."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.catalog import load_table
from bookstore_aws_lakehouse_spark.operators.sampling import train_test_split, weighted_source_mix
from bookstore_aws_lakehouse_spark.registry import golden

_BUCKET = (
    "((('0x' || substring(md5('{salt}:' || CAST(doc_id AS STRING)), 1, 15))::BIGINT % 1000) + 1000) % 1000"
)


@golden(
    "dataset_train_test_split",
    f"""
    SELECT doc_id, lang,
           CASE WHEN {_BUCKET.format(salt="split")} < 200 THEN 'test' ELSE 'train' END AS split
    FROM documents
    """,
)
def q_dataset_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/20 train/test split by stable id-hash bucket: identical across
    engines, runs and partitionings; new rows never move old rows between
    splits (an RNG seed can't promise either)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    return train_test_split(docs, "doc_id", test_fraction=0.2)


MIX_WEIGHTS = {"src0": 1.0, "src1": 0.5, "src2": 0.25}


@golden(
    "dataset_source_mix",
    f"""
    SELECT doc_id, source
    FROM documents
    WHERE {_BUCKET.format(salt="mix")} <
          CASE source WHEN 'src0' THEN 1000 WHEN 'src1' THEN 500
                      WHEN 'src2' THEN 250 ELSE 0 END
    """,
)
def q_dataset_source_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted corpus mixing: keep 100% of src0, 50% of src1, 25% of
    src2, drop the rest — per-row hash gates, no shuffle, bit-reproducible
    membership."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return weighted_source_mix(docs, "doc_id", "source", MIX_WEIGHTS)
