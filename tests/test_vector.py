"""Vector math: JVM higher-order-function path vs Arrow pandas_udf path."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.functions.vector import (
    cosine_similarity,
    dot,
    l2_norm,
    make_cosine_similarity_pandas,
)


def test_dot_and_norm(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], ["a", "b"])
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("d"), l2_norm(F.col("a")).alias("n")
    ).collect()[0]
    assert row["d"] == 32.0
    assert math.isclose(row["n"], math.sqrt(14.0))


def test_cosine_zero_norm_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], ["a", "b"])
    assert df.select(cosine_similarity(F.col("a"), F.col("b")).alias("c")).collect()[0]["c"] is None


def test_pandas_udf_matches_jvm_path(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet").limit(50)
    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
    cos_pd = make_cosine_similarity_pandas()
    both = pairs.select(
        "ia",
        "ib",
        cosine_similarity(F.col("va"), F.col("vb")).alias("jvm"),
        cos_pd(F.col("va"), F.col("vb")).alias("py"),
    ).collect()
    assert len(both) == 50 * 49 / 2
    for r in both:
        assert math.isclose(r["jvm"], r["py"], rel_tol=1e-12), (r["ia"], r["ib"])
