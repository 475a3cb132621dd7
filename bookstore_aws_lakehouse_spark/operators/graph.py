"""Graph ranking over DataFrames: PageRank as pure relational ops.

Complements the other iterative operators (``operators/dedup.py::
connected_components``, ``operators/similarity.py::kmeans_update``): one
iteration is a join on ``src`` (contributions = rank/out-degree) followed
by a sum keyed on ``dst`` — the textbook distributed PageRank data flow.
Both shuffles are keyed equi-operations; nothing is ever collected to the
driver and the edge set is never self-joined.

Scale shape: per iteration, one shuffle of the edge table keyed on src
(co-partitioned with ranks after the first round under AQE) and one
map-side-combinable aggregation keyed on dst. Lineage is PINNED with
``persist()`` (NOT localCheckpoint): the multi-consumer inputs
(``edges`` — degree + every iteration; ``nodes`` — init plus every
iteration; ``deg``) and each iteration's ``ranks`` are cached, the
final ranks eagerly materialized, then every intermediate unpersisted —
the operator leaves no cache residue. persist over localCheckpoint is
the semantic_dedup lesson (`similarity.py:931`): InMemoryRelation keeps
child stats, so the per-iteration joins stay broadcast at fixture scale
and AQE re-plans from real sizes at cluster scale, where a stats-less
LogicalRDD flips them to sort-merge. Measured on 10× disjoint graph
copies (bench growth harness): unpinned 2.5–3.4×, eager-localCheckpoint
variant WORSE at both scales (each eager job recomputes the upstream
edge join that single-job ReusedExchange had deduped), persist+cleanup
1.49× — the embarrassingly-linear shape this data flow should have.
The final eager materialization (executor-local checkpoint blocks,
node-sized output) makes construction non-lazy — same documented trade
as ``incremental.py:308``; on executor loss the node-sized result is
re-derived from source, the multi-TB edge cache re-fills lazily.

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
    pin: bool = True,
) -> DataFrame:
    """PageRank over an ``(src, dst)`` edge DataFrame. Returns
    ``(id, rank)`` for every node (sources and sinks). Simplified model:
    dangling mass is NOT redistributed — sinks absorb it — so ranks need
    not sum to 1; an oracle must replay the same formula:
    ``r_{t+1}(v) = (1-d)/N + d * Σ_{u→v} r_t(u)/outdeg(u)``.

    ``pin=True`` (default) applies the persist+materialize+cleanup
    lifecycle from the module docstring; ``pin=False`` returns the fully
    lazy unrolled plan — for plan inspection (tests assert the joins are
    keyed, which the pinned form hides behind its checkpointed result)
    and for callers embedding pagerank inside a larger one-shot plan.
    """
    src, dst = F.col("src"), F.col("dst")
    # Pin the multi-consumer tables with persist (stats-preserving; see
    # module docstring) and track them for the post-materialize cleanup.
    pinned: list[DataFrame] = []

    def _pin(df: DataFrame) -> DataFrame:
        if not pin:
            return df
        df = df.persist()
        pinned.append(df)
        return df

    # Spark's cache is plan-keyed, not ref-counted: if the CALLER already
    # cached `edges`, persist() here is a no-op on the same entry and our
    # cleanup unpersist would evict the caller's cache on return. Only
    # pin frames this operator derives when the input arrives pre-cached.
    caller_cached = edges.storageLevel.useMemory or edges.storageLevel.useDisk
    if not caller_cached:
        edges = _pin(edges)
    try:
        nodes = _pin(
            edges.select(src.alias("id"))
            .unionByName(edges.select(dst.alias("id")))
            .distinct()
        )
        n = nodes.agg(F.count(F.lit(1)).alias("_n"))
        deg = _pin(edges.groupBy("src").agg(F.count(F.lit(1)).alias("_d")))
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
            # Iteration-boundary pin: ranks_t is computed once, not
            # replayed inside ranks_{t+1}'s plan.
            ranks = _pin(ranks)
        if not pin:
            return ranks
        # Materialize the (node-sized) result, then drop every cached
        # intermediate: the operator leaves the cache exactly as it
        # found it (the caller's own pins included — see caller_cached).
        ranks = ranks.localCheckpoint(eager=True)
        return ranks
    finally:
        # Unconditional cleanup: a failed materialization (OOM, task
        # failure, interrupt) must not leak pins into the
        # session-lifetime cache.
        for df in pinned:
            df.unpersist()


def triangle_motifs(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Triangle enumeration over an ORIENTED edge list (every edge has
    ``id_a < id_b`` — the pair generators' convention): emit each
    a<b<c triple whose three edges all exist, exactly once, as
    (doc_a, doc_b, doc_c). The standard distributed triangle join —
    (a,b)⋈(b,c) on the middle vertex, then a key-pair join against the
    (a,c) edge; both are hash/sort-merge equi-joins keyed on vertex
    ids, never a cross product. Join volume is bounded by Σ deg²(v)
    over the (already capped/bucketed) pair set; the underlying corpus
    is never touched. Input edges violating the orientation contract
    cannot form a triple (the join keys simply never meet reversed
    edges), so orient first: least/greatest if the input is unordered.
    """
    p = pairs.select(id_a, id_b)
    e1 = p.select(F.col(id_a).alias("doc_a"), F.col(id_b).alias("doc_b"))
    e2 = p.select(F.col(id_a).alias("doc_b"), F.col(id_b).alias("doc_c"))
    e3 = p.select(F.col(id_a).alias("doc_a"), F.col(id_b).alias("doc_c"))
    return (
        e1.join(e2, "doc_b")
        .join(e3, ["doc_a", "doc_c"])
        .select("doc_a", "doc_b", "doc_c")
    )
