"""Oracle-checked graph queries (operators/graph.py).

The customer→supplier purchase graph is derived from orders ⋈ lineitem
(distinct pairs), nodes namespaced numerically (customer id × 2, supplier
id × 2 + 1) so the two key spaces can't collide. The DuckDB twin unrolls
every PageRank iteration as a CTE chain — same formula, same per-
iteration rounding, bit-identical ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.catalog import load_table
from bookstore_aws_lakehouse_spark.operators.graph import pagerank
from bookstore_aws_lakehouse_spark.registry import golden

_EDGES_CTE = """
    edges AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    nn AS (SELECT count(*) AS cnt FROM nodes),
    deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src)
"""


def _iter_cte(prev: str, cur: str) -> str:
    return f"""
    c{cur} AS (
      SELECT e.dst AS id, sum({prev}.r / deg.d) AS c
      FROM edges e
      JOIN {prev} ON {prev}.id = e.src
      JOIN deg ON deg.src = e.src
      GROUP BY e.dst
    ),
    {cur} AS (
      SELECT nodes.id,
             round(0.15 / (SELECT cnt FROM nn)
                   + 0.85 * coalesce(c{cur}.c, 0.0), 9) AS r
      FROM nodes LEFT JOIN c{cur} ON c{cur}.id = nodes.id
    )
"""


@golden(
    "graph_pagerank_purchases",
    f"""
    WITH {_EDGES_CTE},
    r0 AS (SELECT id, round(1.0 / (SELECT cnt FROM nn), 9) AS r FROM nodes),
    {_iter_cte("r0", "r1")},
    {_iter_cte("r1", "r2")}
    SELECT id AS node_id, r AS rank FROM r2
    """,
)
def q_graph_pagerank_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (2 iterations, d=0.85) on the customer→supplier purchase
    graph — the iterative-ranking shape (influence/centrality scoring
    over entity graphs, e.g. source-reputation weighting in a curation
    pipeline). Each iteration is one src-keyed join + one dst-keyed
    map-side-combinable sum; ranks rounded to 9 dp per iteration so the
    SQL twin (every iteration unrolled as CTEs) replays bit-identically.
    Suppliers are pure sinks here (no out-edges): the simplified
    no-dangling-redistribution model — both sides implement the same
    formula."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    return pagerank(edges, num_iters=2).select(
        F.col("id").alias("node_id"), F.col("rank")
    )
