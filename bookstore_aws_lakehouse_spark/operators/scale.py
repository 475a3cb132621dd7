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

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_fraction: float = 0.5) -> DataFrame:
    """Repartition ``df`` to the cluster's default parallelism iff its
    current partition count is below ``min_fraction`` of it.

    Intended for SCAN-STAGE DataFrames only: reading ``.rdd`` partition
    counts on a plan that contains an exchange would, under AQE,
    materialize every upstream shuffle just to count partitions — so
    plans with an Exchange are detected (plan text, no execution) and
    returned untouched; their shuffles already repartition them."""
    spark = df.sparkSession
    target = spark.sparkContext.defaultParallelism
    try:
        if "Exchange" in df._jdf.queryExecution().executedPlan().toString():
            return df
        current = df.rdd.getNumPartitions()
    except Exception:
        return df
    if current < target * min_fraction:
        return df.repartition(target)
    return df
