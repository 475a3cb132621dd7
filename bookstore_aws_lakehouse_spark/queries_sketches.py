"""Approximate/sketch aggregates — the mergeable-summary patterns that
replace exact global aggregation at 100 TB (HLL for distinct counts, KLL/
GK for quantiles): a sketch is built map-side per partition and MERGED,
so the shuffle carries kilobytes per group instead of the key universe.

Verification pattern: a sketch's estimate is engine-specific (DuckDB's
HLL ≠ Spark's), so the oracle can't hash-match the estimate itself.
Instead each query emits the EXACT value (cross-engine comparable) plus a
``within_tol`` boolean — Spark-side it's the sketch's measured relative
error against its own exact answer; oracle-side it's literally TRUE. If
the sketch ever drifts outside its documented tolerance, the row hash
fails and the driver flags it — the accuracy CONTRACT is what's checked,
which is exactly what a user of approximate aggregates relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.catalog import load_table
from bookstore_aws_lakehouse_spark.registry import golden


@golden(
    "approx_distinct_accuracy",
    """
    SELECT l_returnflag,
           CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_distinct,
           CAST(1 AS BOOLEAN) AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_approx_distinct_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct counting (approx_count_distinct, rsd=0.01)
    checked against the exact distinct per group: ``within_tol`` asserts
    the estimate lands within 5× the configured rsd (generous — HLL++'s
    error is probabilistic; 5σ makes the check deterministic in practice
    while still catching a broken sketch). At scale the exact side of
    this query is the expensive one (a full shuffle of the key universe);
    the sketch side shuffles a few KB per group."""
    li = load_table(spark, sf_dir, "lineitem")
    # exact side as an explicit two-stage distinct→count: mixing
    # count_distinct with a non-distinct aggregate in one agg plans an
    # Expand that doubles every shuffled row; split and re-joined on the
    # 3-row group key, the same answer costs one dedup shuffle + one
    # broadcast join (measured 8.5 s → ~2 s at sf0.1)
    exact = (
        li.select("l_returnflag", "l_orderkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("exact_distinct"))
    )
    approx = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("_approx")
    )
    return (
        exact.join(F.broadcast(approx), "l_returnflag")
        .select(
            "l_returnflag",
            F.col("exact_distinct").cast("bigint").alias("exact_distinct"),
            (
                F.abs(F.col("_approx") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                <= F.lit(0.05)
            ).alias("within_tol"),
        )
    )


@golden(
    "approx_median_accuracy",
    """
    SELECT l_returnflag,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice) AS exact_median,
           CAST(1 AS BOOLEAN) AS within_tol
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_approx_median_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based median (approx_percentile, accuracy=10000 — a GK
    summary, mergeable map-side) vs the exact interpolated median:
    ``within_tol`` asserts 1% relative error. Exact percentiles need a
    per-group sort of all values; the sketch bounds memory at
    O(accuracy) per group regardless of row count — the only viable
    quantile shape at 100 TB. The exact median itself IS cross-engine
    comparable (sql_percentiles pinned the interpolation parity) and is
    emitted for the hash check."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
            F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("_approx"),
        )
        .select(
            "l_returnflag",
            "exact_median",
            (
                F.abs(F.col("_approx") - F.col("exact_median"))
                / F.col("exact_median")
                <= F.lit(0.01)
            ).alias("within_tol"),
        )
    )


@golden(
    "hll_merge_across_groups",
    """
    SELECT CAST(count(DISTINCT c_custkey) AS BIGINT) AS exact_global,
           CAST(1 AS BOOLEAN) AS within_tol
    FROM customer
    """,
)
def q_hll_merge_across_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch MERGEABILITY end-to-end (hll_sketch_agg → hll_union_agg →
    hll_sketch_estimate, Apache DataSketches HLL): build one HLL sketch
    per nation, then merge the 25 sketches into a global distinct-customer
    estimate WITHOUT re-touching the rows — the two-level rollup every
    100 TB dashboard uses (per-partition sketches persisted, merged at
    query time; re-aggregation cost is O(sketches), not O(rows)).
    ``within_tol`` asserts the merged estimate is within 5% of the exact
    global distinct."""
    cust = load_table(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sketch")
    )
    merged = per_nation.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_approx")
    )
    exact = cust.agg(F.count_distinct("c_custkey").alias("exact_global"))
    return exact.crossJoin(merged).select(
        F.col("exact_global").cast("bigint").alias("exact_global"),
        (
            F.abs(F.col("_approx") - F.col("exact_global")) / F.col("exact_global")
            <= F.lit(0.05)
        ).alias("within_tol"),
    )
