"""Degenerate-input hardening: operators must behave on empty frames (a
real condition at scale — an empty partition, a filter that drops
everything, a day with no events)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.operators.dedup import (
    connected_components,
    jaccard_pairs,
    minhash_band_pairs,
)
from bookstore_aws_lakehouse_spark.operators.sort import top_k
from bookstore_aws_lakehouse_spark.operators.temporal import asof_join
from bookstore_aws_lakehouse_spark.operators.windows import top_n_per_group


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_top_k_empty(spark):
    df = spark.createDataFrame([], "k string, v double")
    assert top_k(df, [("v", True)], 5, tiebreak=["k"]).count() == 0


def test_top_n_per_group_empty(spark):
    df = spark.createDataFrame([], "g string, v double")
    assert top_n_per_group(df, ["g"], [("v", True)], 3).count() == 0


def test_dedup_ops_empty(spark):
    docs = _empty_docs(spark)
    assert jaccard_pairs(docs, "doc_id", "text").count() == 0
    assert minhash_band_pairs(docs, "doc_id", "text").count() == 0


def test_connected_components_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).count() == 0


def test_asof_join_no_right_rows(spark):
    left = spark.createDataFrame([(1, 100), (1, 200)], "user_id long, t long")
    right = spark.createDataFrame([], "user_id long, t long")
    out = asof_join(left, right, time_col="t", by=["user_id"], value_cols=[])
    rows = out.collect()
    assert len(rows) == 2
    assert all(r["t_asof"] is None for r in rows)


def test_single_token_doc_has_no_shingles(spark):
    docs = spark.createDataFrame([(1, "word")], "doc_id long, text string")
    # 3-gram shingles of a 1-token doc: none; no pairs, no crash
    assert jaccard_pairs(docs, "doc_id", "text", shingle_k=3).count() == 0
