"""Distributed linear algebra over embedding columns: covariance, top
principal component (fixed-iteration power method), PCA projection
scores — the whitening/dimensionality-analysis layer of an embedding
curation pipeline (reduce before ANN, detect dominant-direction
artifacts like uncentered corpora, score outliers along the top PC).

Scale shapes (the 100 TB story):
- moments: ONE corpus scan. posexplode fans each vector to ``dim`` rows
  that carry the full vector, and per-dimension sums/avgs partial-
  aggregate map-side — the exchange moves ``dim`` rows of ``dim``
  accumulators (a few KB), never the corpus. cov = E[vv']/n − m·m' is
  assembled on that dim-row table.
- power iteration: the covariance is dim×dim — BOUNDED BY DESIGN (the
  embedding width, not the corpus), so iterating on it driver-adjacent
  is the production pattern (collect the d×d matrix once, eigensolve,
  broadcast back). Here each step is a tiny Spark job on the dim-row
  table with the current vector as a literal; the per-iteration driver
  read is ``dim`` doubles — same bounded-metadata class as
  joins.py's ≤64 hot keys.
- scores: map-side projection of every vector onto the (broadcast-
  literal) component — one scan, no shuffle before the top-k.

Cross-engine exactness: float SUM order differs between engines, so
every emitted covariance entry / iterate / score is rounded (9 dp for
the O(0.01-1) covariance and unit-scale iterates, 6 dp for scores) —
the accumulated order noise (≈1e-13 relative at 10⁵ rows) sits far
below the rounding grain, the same argument as the ADC/pagerank
rounding contracts. Within a dot product both engines fold left-to-
right in double (bit-identical — see queries_similarity.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.functions.vector import dot


def _vec_dim_checked(df: DataFrame, vec_col: str, dim: int) -> None:
    """Fail fast on a dim mismatch: a shorter vector would NULL-pad the
    element products and silently zero whole covariance rows (the
    sign-LSH num_dims lesson, NOTES_r15 §2)."""
    row = df.select(F.size(F.col(vec_col)).alias("_d")).first()
    if row is not None and row["_d"] != dim:
        raise ValueError(
            f"linalg: {vec_col} has {row['_d']} dims, caller said {dim} — "
            f"a mismatch would silently zero covariance entries"
        )


def covariance_rows(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    round_dp: int = 6,
) -> DataFrame:
    """Sample covariance (biased, /n) as ``dim`` rows (i, cov) where
    ``cov`` is row i of the matrix as array<double>, every entry rounded
    to ``round_dp``. One corpus scan: cov = Σvv'/n − m·m' from a single
    grouped aggregation (the explode carries the vector, so s_ij and
    m_i accumulate together, map-side combined)."""
    _vec_dim_checked(df, vec_col, dim)
    v = F.col(vec_col).cast("array<double>")
    rows = df.select(v.alias("_v")).select(
        F.posexplode(F.col("_v")).alias("i", "_xi"), F.col("_v")
    )
    moments = rows.groupBy("i").agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_xi").alias("_m"),
        *[
            F.sum(F.col("_xi") * F.col("_v")[j]).alias(f"_s{j}")
            for j in range(dim)
        ],
    )
    # one-row broadcast of the ordered mean vector (means are needed per
    # COLUMN j while the row holds mean i) — no driver round-trip
    means = moments.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "_m"))),
            lambda t: t["_m"],
        ).alias("_means")
    )
    s_arr = F.array(*[F.col(f"_s{j}") for j in range(dim)])
    return (
        moments.crossJoin(F.broadcast(means))
        .select(
            "i",
            F.zip_with(
                s_arr,
                F.col("_means"),
                lambda s, mj: F.round(
                    s / F.col("_n") - F.col("_m") * mj, round_dp
                ),
            ).alias("cov"),
        )
    )


def power_iteration(
    cov_rows: DataFrame,
    dim: int = 64,
    iters: int = 3,
    round_dp: int = 9,
) -> list[float]:
    """Top eigenvector of the (dim-row) covariance table by ``iters``
    fixed power-method steps from the uniform start 1/√dim. Every
    matrix-vector product and every normalized iterate is rounded to
    ``round_dp``, making the trajectory engine-replayable (the
    per-iteration-rounded pagerank contract). Each step is one tiny
    Spark job over the dim rows; the driver reads ``dim`` doubles per
    step (bounded by the embedding width, not the data).

    Fixed iteration count = deterministic output, not convergence —
    same contract as ``kmeans_converge_2iter``. (On a near-flat spectrum
    — e.g. near-iid random fixtures — 3 steps are far from the true top
    eigenvector; the contract is the deterministic trajectory, and the
    convergence property is tested on planted-structure data, the
    recall-floor pattern.) Returns the loadings as a Python list
    (callers broadcast it as a literal).

    ALL rounding happens JVM-side with ``F.round`` (HALF_UP, the same
    convention the SQL oracles replay) — Python's ``round`` is
    HALF_EVEN and would drift on boundary values."""
    # 1/sqrt(64) = 0.125 exactly; for other dims the start is rounded by
    # the same JVM convention via the first iteration's literal embed
    x = [1.0 / math.sqrt(dim)] * dim
    for _ in range(iters):
        ydf = cov_rows.select(
            "i",
            F.round(
                dot(F.col("cov"), F.array(*[F.lit(c) for c in x])),
                round_dp,
            ).alias("y"),
        )
        nrm = ydf.agg(
            F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("_n")
        )
        rows = (
            ydf.crossJoin(F.broadcast(nrm))
            .select(
                "i",
                F.when(
                    F.col("_n") > 0,
                    F.round(F.col("y") / F.col("_n"), round_dp),
                )
                .otherwise(F.col("y"))
                .alias("x"),
            )
            .orderBy("i")
            .collect()
        )
        x = [r["x"] for r in rows]
    return x


def top_principal_component(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    iters: int = 3,
    cov_dp: int = 6,
    iter_dp: int = 9,
) -> DataFrame:
    """(i, loading): the top PC of the corpus' covariance as a dim-row
    DataFrame — `covariance_rows` + `power_iteration` composed. The
    covariance table is pinned for the iterations (each step consumes it
    once; unpinned, the corpus-scan aggregation re-executes per step)
    and dropped in a finally — the uniform pin lifecycle.

    The two precisions are deliberately split: the covariance rounds
    COARSE (6 dp) so cross-engine SUM-order noise (≈1e-13 absolute) can
    never flip an entry and both engines iterate from the literally
    identical matrix; the iterates round FINE (9 dp) because from equal
    inputs the matrix-vector folds are bit-identical and only the scalar
    norm carries ~1e-16 relative noise."""
    spark = df.sparkSession
    cov = covariance_rows(df, vec_col, dim, cov_dp).persist()
    try:
        x = power_iteration(cov, dim, iters, iter_dp)
    finally:
        cov.unpersist()
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(x)], ["i", "loading"]
    )


def pc_scores(
    df: DataFrame,
    loadings: list[float],
    means: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_dp: int = 6,
) -> DataFrame:
    """Projection of every (mean-centered) vector onto a fixed component:
    (id, score), score = round((v − m)·u, round_dp). Pure map-side — the
    component and mean ride as literals; nothing shuffles."""
    v = F.col(vec_col).cast("array<double>")
    centered = F.zip_with(
        v, F.array(*[F.lit(m) for m in means]), lambda a, b: a - b
    )
    u = F.array(*[F.lit(c) for c in loadings])
    return df.select(
        F.col(id_col),
        F.round(dot(centered, u), round_dp).alias("score"),
    )


def dim_means(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> list[float]:
    """Per-dimension means as a Python list (one aggregation job; the
    driver read is ``dim`` doubles — bounded by the embedding width)."""
    row = df.agg(
        *[
            F.avg(F.col(vec_col).cast("array<double>")[i]).alias(f"m{i}")
            for i in range(dim)
        ]
    ).first()
    return [row[f"m{i}"] for i in range(dim)]
