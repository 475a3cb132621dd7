"""operators/graph.py::pagerank — formula check against an independent
driver-side replay on a tiny known graph."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from bookstore_aws_lakehouse_spark.operators.graph import pagerank


def _round_half_up(x: float, dp: int) -> float:
    """Spark's F.round semantics (BigDecimal HALF_UP on the shortest
    decimal repr) — Python's built-in round is banker's and differs by
    one ulp exactly on .5 boundaries."""
    q = Decimal(1).scaleb(-dp)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _reference_pagerank(edges, num_iters=2, d=0.85, dp=9):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    n = len(nodes)
    deg = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    r = {v: _round_half_up(1.0 / n, dp) for v in nodes}
    for _ in range(num_iters):
        contrib = {v: 0.0 for v in nodes}
        for u, v in edges:
            contrib[v] += r[u] / deg[u]
        r = {v: _round_half_up((1 - d) / n + d * contrib[v], dp) for v in nodes}
    return r


def test_pagerank_matches_reference_formula(spark):
    edges = [(1, 2), (1, 3), (2, 3), (4, 1), (4, 3), (3, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, num_iters=3).collect()}
    want = _reference_pagerank(edges, num_iters=3)
    assert got == want


def test_pagerank_sink_only_nodes_get_base_rank(spark):
    # node 9 has no in-edges: rank = (1-d)/N exactly; node 2 is a pure sink
    df = spark.createDataFrame([(9, 2)], "src long, dst long")
    got = {r.id: r.rank for r in pagerank(df, num_iters=1).collect()}
    assert got[9] == _round_half_up(0.15 / 2, 9)
    assert got[2] == _round_half_up(0.15 / 2 + 0.85 * 0.5, 9)
