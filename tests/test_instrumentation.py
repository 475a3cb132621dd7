"""Candidate-volume counters (instrumentation.py) stay glued to their
golden queries: each counter must measure a SUPERSET of the pairs its
query emits — the pre-threshold index stage. If a query's literals drift
(shingle_k, max_df, planes, nprobe...) without the counter following,
the superset contract breaks here instead of silently mismeasuring the
bench growth section."""

from __future__ import annotations

import pytest

from bookstore_aws_lakehouse_spark.instrumentation import GROWTH_CANDIDATE_COUNTERS
from bookstore_aws_lakehouse_spark.registry import load_all

GOLDEN, _ = load_all()


def test_counters_cover_only_registered_growth_rows():
    # every instrumented name must be a registered query (bench growth
    # rows are a GOLDEN subset); a stale key would silently record nothing
    for name in GROWTH_CANDIDATE_COUNTERS:
        assert name in GOLDEN, name


@pytest.mark.parametrize(
    "name",
    [
        "dedup_minhash_pairs",
        "dedup_ngram_jaccard",
        "dedup_containment_pairs",
        "dedup_simhash_pairs",
        "dedup_winnowed_pairs",
        "embedding_near_dup",
        "ann_ivfpq_residual_multiprobe",
    ],
)
def test_candidates_superset_of_emitted_pairs(spark, sf_smoke, name):
    n_cand = GROWTH_CANDIDATE_COUNTERS[name](spark, sf_smoke)
    n_out = GOLDEN[name](spark, sf_smoke).count()
    assert isinstance(n_cand, int)
    assert n_cand >= n_out, f"{name}: candidates {n_cand} < emitted {n_out}"
    # the index stage must do SOMETHING at fixture scale or the counter
    # is counting the wrong table
    assert n_cand > 0


def test_semantic_dedup_counter_matches_cell_math(spark, sf_smoke):
    # Σ C(|cell|,2) recomputed independently from the operator's own
    # assignment — the counter must agree exactly
    from pyspark.sql import functions as F

    from bookstore_aws_lakehouse_spark.catalog import load_table
    from bookstore_aws_lakehouse_spark.operators.similarity import ivf_assign

    emb = load_table(spark, sf_smoke, "embeddings")
    centroids = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    sizes = [
        r["n"]
        for r in ivf_assign(emb, centroids)
        .groupBy("centroid_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    expect = sum(n * (n - 1) // 2 for n in sizes)
    got = GROWTH_CANDIDATE_COUNTERS["semantic_dedup"](spark, sf_smoke)
    assert got == expect
