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


@golden(
    "theta_set_ops",
    """
    WITH a AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'),
         b AS (SELECT DISTINCT o_custkey FROM orders
               WHERE o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31')
    SELECT
      CAST((SELECT count(*) FROM (SELECT o_custkey FROM a UNION SELECT o_custkey FROM b)) AS BIGINT) AS exact_union,
      CAST(1 AS BOOLEAN) AS union_ok,
      CAST((SELECT count(*) FROM (SELECT o_custkey FROM a INTERSECT SELECT o_custkey FROM b)) AS BIGINT) AS exact_intersect,
      CAST(1 AS BOOLEAN) AS intersect_ok,
      CAST((SELECT count(*) FROM (SELECT o_custkey FROM a EXCEPT SELECT o_custkey FROM b)) AS BIGINT) AS exact_diff,
      CAST(1 AS BOOLEAN) AS diff_ok
    """,
)
def q_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches — the sketch family HLL can't replace: set
    EXPRESSIONS over distinct keys (union, intersection, A∖B), here
    "customers active in 1995 vs 1996". Each year builds one
    ``theta_sketch_agg`` map-side (kilobytes shuffled, never the key
    universe); ``theta_union`` / ``theta_intersection`` /
    ``theta_difference`` then answer overlap and churn WITHOUT re-reading
    rows — the audience-overlap / retention shape at 100 TB. Oracle
    pattern per this module's docstring: exact values are cross-engine
    hashable; each estimate is checked Spark-side against Spark's own
    exact answer (union/difference 5%, intersection 10% — set-expression
    error compounds two sketches) and the boolean must be TRUE, matching
    the oracle's literal."""
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(
        F.col("o_orderdate").between("1995-01-01", "1995-12-31")
    ).select("o_custkey")
    y96 = orders.filter(
        F.col("o_orderdate").between("1996-01-01", "1996-12-31")
    ).select("o_custkey")
    sk = (
        y95.agg(F.theta_sketch_agg("o_custkey").alias("sa"))
        .crossJoin(y96.agg(F.theta_sketch_agg("o_custkey").alias("sb")))
        .select(
            F.theta_sketch_estimate(F.theta_union("sa", "sb")).alias("est_union"),
            F.theta_sketch_estimate(F.theta_intersection("sa", "sb")).alias(
                "est_intersect"
            ),
            F.theta_sketch_estimate(F.theta_difference("sa", "sb")).alias(
                "est_diff"
            ),
        )
    )
    ex = (
        y95.withColumn("_in_a", F.lit(1))
        .unionByName(y96.withColumn("_in_a", F.lit(0)))
        .groupBy("o_custkey")
        .agg(F.max("_in_a").alias("a"), F.min("_in_a").alias("not_b"))
        .agg(
            F.count(F.lit(1)).alias("exact_union"),
            F.sum(
                ((F.col("a") == 1) & (F.col("not_b") == 0)).cast("bigint")
            ).alias("exact_intersect"),
            F.sum(
                ((F.col("a") == 1) & (F.col("not_b") == 1)).cast("bigint")
            ).alias("exact_diff"),
        )
    )
    tol = lambda est, exact, t: (  # noqa: E731
        F.abs(F.col(est) - F.col(exact)) <= F.col(exact) * F.lit(t)
    )
    return ex.crossJoin(F.broadcast(sk)).select(
        F.col("exact_union").cast("bigint").alias("exact_union"),
        tol("est_union", "exact_union", 0.05).alias("union_ok"),
        F.col("exact_intersect").cast("bigint").alias("exact_intersect"),
        tol("est_intersect", "exact_intersect", 0.10).alias("intersect_ok"),
        F.col("exact_diff").cast("bigint").alias("exact_diff"),
        tol("est_diff", "exact_diff", 0.10).alias("diff_ok"),
    )


@golden(
    "kll_quantile_merge",
    """
    SELECT
      round(percentile_cont(0.25) WITHIN GROUP (ORDER BY c_acctbal), 6) AS exact_q25,
      round(percentile_cont(0.50) WITHIN GROUP (ORDER BY c_acctbal), 6) AS exact_q50,
      round(percentile_cont(0.75) WITHIN GROUP (ORDER BY c_acctbal), 6) AS exact_q75,
      CAST(1 AS BOOLEAN) AS within_tol
    FROM customer
    """,
)
def q_kll_quantile_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketch MERGEABILITY (kll_sketch_agg_double per nation
    → kll_merge_agg_double → kll_sketch_get_quantile_double): the
    two-level quantile rollup — per-partition sketches persisted once,
    global quantiles recovered at query time from O(sketches) bytes, the
    only viable percentile-dashboard shape at 100 TB (exact quantiles
    need a global sort). KLL's guarantee is on RANK (~1.65% at k=200),
    not value, so ``within_tol`` normalizes by the value RANGE: acctbal
    is near-uniform, making 5% of range ≈ 8σ of rank error — a
    deterministic-in-practice bound that still catches a broken sketch.
    The exact interpolated percentiles are cross-engine hashable
    (sql_percentiles pinned the parity) and carry the row hash."""
    cust = load_table(spark, sf_dir, "customer")
    per_nation = cust.groupBy("c_nationkey").agg(
        F.kll_sketch_agg_double("c_acctbal").alias("sk")
    )
    merged = per_nation.agg(F.kll_merge_agg_double("sk").alias("msk")).select(
        F.kll_sketch_get_quantile_double("msk", F.lit(0.25)).alias("e25"),
        F.kll_sketch_get_quantile_double("msk", F.lit(0.50)).alias("e50"),
        F.kll_sketch_get_quantile_double("msk", F.lit(0.75)).alias("e75"),
    )
    exact = cust.agg(
        F.round(F.expr("percentile(c_acctbal, 0.25)"), 6).alias("exact_q25"),
        F.round(F.expr("percentile(c_acctbal, 0.50)"), 6).alias("exact_q50"),
        F.round(F.expr("percentile(c_acctbal, 0.75)"), 6).alias("exact_q75"),
        (F.max("c_acctbal") - F.min("c_acctbal")).alias("_range"),
    )
    ok = (
        (F.abs(F.col("e25") - F.col("exact_q25")) <= F.col("_range") * 0.05)
        & (F.abs(F.col("e50") - F.col("exact_q50")) <= F.col("_range") * 0.05)
        & (F.abs(F.col("e75") - F.col("exact_q75")) <= F.col("_range") * 0.05)
    )
    return exact.crossJoin(F.broadcast(merged)).select(
        "exact_q25", "exact_q50", "exact_q75", ok.alias("within_tol")
    )


@golden(
    "token_cms_heavy_hitters",
    """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ),
    ranked AS (
      SELECT token, count(*) AS n FROM toks GROUP BY token
      ORDER BY n DESC, token ASC LIMIT 15
    )
    SELECT token, CAST(n AS BIGINT) AS exact_n,
           CAST(1 AS BOOLEAN) AS never_under,
           CAST(1 AS BOOLEAN) AS within_bound
    FROM ranked
    """,
)
def q_token_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency tracking (operators/sketches.py::
    cms_build/cms_estimate) over the corpus token stream — the
    heavy-hitters structure for key universes too large to count exactly.
    The sketch is a ≤ depth·width counter grid built by ONE map-side-
    combinable groupBy (the shuffle never carries the token universe);
    estimation broadcast-joins the grid onto the probes. Checked against
    the exact top-15 tokens via the CMS accuracy contract: ``never_under``
    (one-sided error — the estimate can never undercount) and
    ``within_bound`` (overcount ≤ 8·N/width collision mass; Markov over
    depth=4 independent rows puts the failure odds per probe below 1e-4,
    and xxhash64 is deterministic, so on a fixed corpus the outcome is
    fixed — verified at sf0.001/0.01/0.1). The exact counts carry the
    cross-engine hash; DuckDB replays them relationally."""
    from bookstore_aws_lakehouse_spark.operators.sketches import (
        cms_build,
        cms_estimate,
    )

    DEPTH, WIDTH = 4, 8192
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    # pin the (tiny, ≤ depth·width rows) grid: it is THE materialized
    # artifact, and both the estimator and the N derivation read it —
    # without the pin each textual reuse would re-scan the corpus
    sketch = cms_build(toks, "token", depth=DEPTH, width=WIDTH).localCheckpoint(
        eager=True
    )
    # N comes from the sketch itself: every input row increments exactly
    # one row-0 counter, so sum(cnt | row=0) = token count — no extra scan
    total = sketch.filter(F.col("row") == 0).agg(
        F.sum("cnt").alias("n_total")
    )
    top = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), F.col("token").asc())
        .limit(15)
    )
    est = cms_estimate(sketch, top, "token", depth=DEPTH, width=WIDTH)
    return est.crossJoin(F.broadcast(total)).select(
        "token",
        F.col("exact_n").cast("bigint").alias("exact_n"),
        (F.col("est_n") >= F.col("exact_n")).alias("never_under"),
        (
            F.col("est_n") - F.col("exact_n")
            <= F.lit(8.0) * F.col("n_total") / F.lit(WIDTH)
        ).alias("within_bound"),
    )


@golden(
    "token_heavy_hitters_mg",
    """
    WITH toks AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    )
    SELECT token, CAST(count(*) AS BIGINT) AS exact_n
    FROM toks GROUP BY token
    ORDER BY exact_n DESC, token ASC LIMIT 15
    """,
)
def q_token_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter DISCOVERY at scale (operators/sketches.py::
    heavy_hitters_exact — the complement of token_cms_heavy_hitters,
    which only VERIFIES a known top-k): Misra–Gries summaries bound each
    partition to `capacity` counters (Arrow mapInPandas — the bounded
    imperative dict is exactly where Python belongs), the pigeonhole
    union of candidates provably contains every token with frequency >
    N/capacity, and one broadcast semi-join + groupBy resolves EXACT
    counts over candidates only — the key universe is never shuffled.
    The result is therefore exactly the true top-15 (the 15th token's
    count dwarfs N/2048 on this corpus — asserted in tests), so the
    oracle is the plain relational top-15."""
    from bookstore_aws_lakehouse_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    out = heavy_hitters_exact(toks, "token", k=15, capacity=2048)
    return out.select("token", F.col("exact_n").cast("bigint").alias("exact_n"))
