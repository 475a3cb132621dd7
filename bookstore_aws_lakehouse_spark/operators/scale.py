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

    This APPROXIMATES Spark's ``FilePartition`` packing arithmetic: files
    are padded by ``openCostInBytes``, the split size is
    ``min(maxPartitionBytes, max(openCostInBytes, totalBytes/parallelism))``,
    and splits are greedily binned into partitions of at most that size —
    so many tiny files pack into few partitions, and small totals shrink
    the split size toward one-per-core. The greedy first-fit-in-order
    packing means the real count can differ slightly from
    ``ceil(total/maxSplit)`` (it is an estimate, not the scheduler);
    callers only use it as a coarse under-parallelism signal. Returns
    None when no estimate can be made (no file sources in the plan,
    non-local URIs we can't stat) — callers treat that as "leave the
    DataFrame untouched"."""
    files = df.inputFiles()
    if not files:
        return None
    # session-resolved bytes values (handles "128m"-style conf strings)
    conf = df.sparkSession._jsparkSession.sessionState().conf()
    max_pb = int(conf.filesMaxPartitionBytes())
    open_cost = int(conf.filesOpenCostInBytes())
    parallelism = max(1, df.sparkSession.sparkContext.defaultParallelism)
    total_padded = 0
    for uri in files:
        path = uri[5:] if uri.startswith("file:") else uri
        if "://" in path:  # remote FS: stat via os would lie
            return None
        try:
            size = os.path.getsize(path)
        except OSError:
            return None
        total_padded += size + open_cost
    max_split = min(max_pb, max(open_cost, total_padded // parallelism))
    return max(1, -(-total_padded // max(1, max_split)))  # ceil-div


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
