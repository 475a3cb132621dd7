"""Graph ranking over DataFrames: PageRank as pure relational ops.

Complements the other iterative operators (``operators/dedup.py::
connected_components``, ``operators/similarity.py::kmeans_update``): one
iteration is a join on ``src`` (contributions = rank/out-degree) followed
by a sum keyed on ``dst`` — the textbook distributed PageRank data flow.
Both shuffles are keyed equi-operations; nothing is ever collected to the
driver and the edge set is never self-joined.

Scale shape: per iteration, one shuffle of the edge table keyed on src
(co-partitioned with ranks after the first round under AQE) and one
map-side-combinable aggregation keyed on dst. Iteration count is a small
constant for ranking use-cases; for many iterations, pin lineage with
``localCheckpoint``/``checkpoint`` every few rounds exactly as
``connected_components`` does (`dedup.py:394`).

Determinism device (same as ``kmeans_update``'s 6-dp centroids): ranks
are rounded to ``round_dp`` decimals at every iteration boundary, so the
order-dependent last ulps of the contribution sums never propagate and a
SQL twin replays the iteration bit-identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    num_iters: int = 2,
    damping: float = 0.85,
    round_dp: int = 9,
) -> DataFrame:
    """PageRank over an ``(src, dst)`` edge DataFrame. Returns
    ``(id, rank)`` for every node (sources and sinks). Simplified model:
    dangling mass is NOT redistributed — sinks absorb it — so ranks need
    not sum to 1; an oracle must replay the same formula:
    ``r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u)/outdeg(u)``.
    """
    src, dst = F.col("src"), F.col("dst")
    nodes = (
        edges.select(src.alias("id"))
        .unionByName(edges.select(dst.alias("id")))
        .distinct()
    )
    n = nodes.agg(F.count(F.lit(1)).alias("_n"))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    ranks = nodes.crossJoin(F.broadcast(n)).select(
        "id", F.round(F.lit(1.0) / F.col("_n"), round_dp).alias("rank")
    )
    for _ in range(num_iters):
        contribs = (
            edges.join(ranks.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select(dst.alias("id"), (F.col("rank") / F.col("_d")).alias("_c"))
            .groupBy("id")
            .agg(F.sum("_c").alias("_c"))
        )
        ranks = (
            nodes.join(contribs, "id", "left")
            .crossJoin(F.broadcast(n))
            .select(
                "id",
                F.round(
                    F.lit(1.0 - damping) / F.col("_n")
                    + F.lit(damping) * F.coalesce(F.col("_c"), F.lit(0.0)),
                    round_dp,
                ).alias("rank"),
            )
        )
    return ranks
