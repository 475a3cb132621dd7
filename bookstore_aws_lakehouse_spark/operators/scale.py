"""Scale/parallelism utilities.

``ensure_parallelism`` guards against *pathologically under-split inputs*:
a parquet file written as one giant row group yields exactly one scan task
regardless of ``maxPartitionBytes`` — one core does all downstream map work
while the rest idle. That is a real production failure mode (single-file
exports, badly configured writers), not just a fixture artifact.

The guard is adaptive: if the scan already has ≥ half the cluster's task
slots (always true at 100 TB, where inputs have thousands of splits), it is
a no-op and costs nothing; only genuinely under-split inputs pay one
round-robin shuffle to fan work out.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame


def _estimated_scan_splits(df: DataFrame) -> int | None:
    """Estimate the scan's task count from the plan's file listing — no
    ``.rdd`` access (which would de-optimize the DataFrame through the
    legacy Python-RDD conversion just to count partitions).

    Spark sizes scan tasks by bytes: a file yields
    ``ceil(size / maxPartitionBytes)`` splits (row-group alignment can
    only reduce *useful* splits, not the task count). Summing that over
    ``df.inputFiles()`` reproduces the scheduler's arithmetic from
    metadata alone. Returns None when the estimate can't be made (no file
    sources in the plan, non-local URIs we can't stat) — callers treat
    that as "leave the DataFrame untouched"."""
    files = df.inputFiles()
    if not files:
        return None
    # session-resolved bytes value (handles "128m"-style conf strings)
    max_pb = int(
        df.sparkSession._jsparkSession.sessionState().conf().filesMaxPartitionBytes()
    )
    total = 0
    for uri in files:
        path = uri[5:] if uri.startswith("file:") else uri
        if "://" in path:  # remote FS: stat via os would lie
            return None
        try:
            size = os.path.getsize(path)
        except OSError:
            return None
        total += max(1, -(-size // max_pb))  # ceil-div
    return total


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition ``df`` to the cluster's default parallelism iff its
    estimated scan-split count is below ``min_fraction`` of it.

    Intended for SCAN-STAGE DataFrames only: the probe reads the plan's
    file listing (metadata — no jobs, no ``.rdd`` conversion). Plans with
    an Exchange are returned untouched: their shuffles already
    repartition them, and the file-based estimate would not describe the
    post-shuffle layout anyway."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        if "Exchange" in df._jdf.queryExecution().executedPlan().toString():
            return df
        current = _estimated_scan_splits(df)
    except Exception:
        return df
    if current is not None and current < target * min_fraction:
        return df.repartition(target)
    return df
