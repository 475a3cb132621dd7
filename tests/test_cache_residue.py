"""Cache-residue regression tests (VERDICT r11 #4).

The pin lifecycles (persist → eager materialize → unpersist) are
load-bearing for the growth numbers: pagerank, the shingle family, the
LSH bucket table, bigram-LM. A leaked pin silently degrades every
subsequent query in a long-lived session (executor storage fills with
dead blocks), so each pinned operator is run here and the session's
DataFrame CacheManager asserted empty afterwards — both on the success
path and on a failure injected mid-materialization (the try/finally
contract).

The check targets the CacheManager (DataFrame-level ``persist``), not
``getPersistentRDDs``: an eager ``localCheckpoint`` result is BACKED by
executor-local RDD blocks for as long as the caller references it — that
is the documented design, reclaimed by the ContextCleaner on GC — while
a leaked ``persist`` registers a session-lifetime CacheManager entry
that nothing ever frees.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.catalog import load_table
from bookstore_aws_lakehouse_spark.registry import load_all

GOLDEN, _ = load_all()


def _cache_is_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def _clear_cache(spark) -> None:
    # semantic_dedup's bounded single-entry cache is deliberate residue;
    # clear its registry alongside the CacheManager so this module's
    # assertions start from a known-empty state. Other holders of cleared
    # frames (the ETL staging memo) recompute from lineage — correctness
    # is unaffected.
    from bookstore_aws_lakehouse_spark.operators.similarity import (
        _SEMDEDUP_CACHE,
    )

    spark.catalog.clearCache()
    _SEMDEDUP_CACHE.clear()


def _edges(spark, sf_smoke):
    orders = load_table(spark, sf_smoke, "orders")
    li = load_table(spark, sf_smoke, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )


def _run_jaccard(spark, sf_smoke):
    from bookstore_aws_lakehouse_spark.operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_smoke, "documents")
    jaccard_pairs(docs, "doc_id", "text").count()


def _run_containment(spark, sf_smoke):
    from bookstore_aws_lakehouse_spark.operators.dedup import containment_pairs

    docs = load_table(spark, sf_smoke, "documents")
    containment_pairs(docs, "doc_id", "text").count()


def _run_winnowed(spark, sf_smoke):
    from bookstore_aws_lakehouse_spark.operators.dedup import winnowed_pairs

    docs = load_table(spark, sf_smoke, "documents")
    winnowed_pairs(docs, "doc_id", "text").count()


def _run_cosine_lsh(spark, sf_smoke):
    from bookstore_aws_lakehouse_spark.operators.similarity import cosine_pairs

    emb = load_table(spark, sf_smoke, "embeddings")
    cosine_pairs(emb).count()


def _run_pagerank(spark, sf_smoke):
    from bookstore_aws_lakehouse_spark.operators.graph import pagerank

    pagerank(_edges(spark, sf_smoke), num_iters=2).count()


def _run_bigram_lm(spark, sf_smoke):
    GOLDEN["text_bigram_lm_score"](spark, sf_smoke).count()


def _run_simhash(spark, sf_smoke):
    GOLDEN["dedup_simhash_pairs"](spark, sf_smoke).count()


def _run_minhash(spark, sf_smoke):
    GOLDEN["dedup_minhash_pairs"](spark, sf_smoke).count()


PINNED_OPS = {
    "jaccard_pairs": _run_jaccard,
    "containment_pairs": _run_containment,
    "winnowed_pairs": _run_winnowed,
    "cosine_pairs_lsh": _run_cosine_lsh,
    "pagerank": _run_pagerank,
    "bigram_lm": _run_bigram_lm,
    "simhash_pairs": _run_simhash,
    "minhash_pairs": _run_minhash,
}


@pytest.mark.parametrize("name", sorted(PINNED_OPS))
def test_pinned_operator_leaves_no_cache_residue(spark, sf_smoke, name):
    _clear_cache(spark)
    PINNED_OPS[name](spark, sf_smoke)
    assert _cache_is_empty(spark), name


@pytest.mark.parametrize("name", ["jaccard_pairs", "winnowed_pairs"])
def test_failed_materialization_leaves_no_cache_residue(
    spark, sf_smoke, name
):
    """The try/finally contract (ADVICE r11): an exception thrown inside
    the eager materialization (here a per-row raise_error in the text
    column — at real scale an OOM or task failure) must still unpersist
    every pin on the way out."""
    from bookstore_aws_lakehouse_spark.operators.dedup import (
        jaccard_pairs,
        winnowed_pairs,
    )

    _clear_cache(spark)
    docs = load_table(spark, sf_smoke, "documents").select(
        "doc_id",
        F.raise_error(F.concat(F.lit("boom"), F.col("doc_id").cast("string")))
        .cast("string")
        .alias("text"),
    )
    op = {"jaccard_pairs": jaccard_pairs, "winnowed_pairs": winnowed_pairs}[name]
    with pytest.raises(Exception, match="boom"):
        op(docs, "doc_id", "text")
    assert _cache_is_empty(spark), name


def test_pagerank_respects_caller_cached_edges(spark, sf_smoke):
    """ADVICE r11: Spark's cache is plan-keyed, not ref-counted — if the
    caller pre-cached the edge frame, pagerank's cleanup must not evict
    it on return."""
    from bookstore_aws_lakehouse_spark.operators.graph import pagerank

    _clear_cache(spark)
    edges = _edges(spark, sf_smoke).persist()
    try:
        edges.count()
        pagerank(edges, num_iters=2).count()
        assert edges.storageLevel.useMemory or edges.storageLevel.useDisk
        assert not _cache_is_empty(spark)  # exactly the caller's entry
    finally:
        edges.unpersist()
    assert _cache_is_empty(spark)


def test_pin_false_matches_pinned_results(spark, sf_smoke):
    """The lazy pin=False escape must be a pure execution-strategy
    switch: same rows as the default eager path."""
    from bookstore_aws_lakehouse_spark.operators.dedup import jaccard_pairs

    docs = load_table(spark, sf_smoke, "documents")
    eager = {
        tuple(r) for r in jaccard_pairs(docs, "doc_id", "text").collect()
    }
    lazy = {
        tuple(r)
        for r in jaccard_pairs(docs, "doc_id", "text", pin=False).collect()
    }
    assert eager == lazy and eager
