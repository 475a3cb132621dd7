"""Sinks (SURVEY §2.1: S3 — the data-mart writer).

Reference: ``df.write.mode(mode).option('header',True).csv(path)``
(`workflow/Loader.py:2-3`) with nightly ``append`` — two scale bugs we fix by
default (SURVEY §7.1.6): the mart should be columnar (parquet), and loads
should be idempotent (``overwrite``), not accumulate duplicates every cron
run. CSV remains available for reference parity / export.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
    compression: str = "snappy",
) -> None:
    """Columnar sink. ``partition_by`` lays out hive-style directories so
    downstream reads get partition pruning (e.g. mart partitioned by the
    drill-down key — the reference's ``country`` filter would then touch one
    directory instead of the whole mart)."""
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
) -> None:
    """S3 parity sink — headered CSV folder-per-table, reference semantics."""
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def compact_parquet(df_path: str, spark, target_partitions: int | None = None) -> int:
    """Small-file compaction (the maintenance job every streaming/upsert
    sink eventually needs — thousands of tiny files destroy scan
    performance via per-file open cost and starved row-group sizes).
    Rewrites the location to ``target_partitions`` files (default: sized
    by data volume at ~96 MB per file) through a staging directory.
    Returns the new file count. With Delta/Iceberg this is OPTIMIZE /
    rewrite_data_files."""
    import math
    import os
    import shutil
    import tempfile

    df = spark.read.parquet(df_path)
    if target_partitions is None:
        size_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(df_path)
            for f in fs
            if f.endswith(".parquet")
        )
        target_partitions = max(1, math.ceil(size_bytes / (96 * 1024 * 1024)))
    staging = tempfile.mkdtemp(prefix="blhs_compact_") + "/data"
    df.repartition(target_partitions).write.mode("overwrite").parquet(staging)
    shutil.rmtree(df_path)
    shutil.move(staging, df_path)
    return target_partitions


def _fs_path_exists(spark, path: str) -> bool:
    """Existence check through the Hadoop FileSystem API, so s3a:// /
    hdfs:// / file:// paths all answer correctly — ``os.path.exists`` is
    silently False for every non-local URI, which would turn an
    incremental merge into a daily full truncate on object storage."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _anti_join_null_safe(existing: DataFrame, delta_keys: DataFrame, keys: Sequence[str]) -> DataFrame:
    """existing ANTI delta_keys on all key columns with NULL-SAFE equality:
    a plain ``on=keys`` anti-join never matches NULL keys, so a NULL-keyed
    row would survive every merge and duplicate on each re-delivery."""
    import functools

    right = delta_keys.select(*[F.col(k).alias(f"_dk_{k}") for k in keys]).distinct()
    cond = functools.reduce(
        lambda a, b: a & b,
        [existing[k].eqNullSafe(right[f"_dk_{k}"]) for k in keys],
    )
    return existing.join(right, on=cond, how="left_anti")


def upsert_parquet(
    df: DataFrame,
    path: str,
    key_cols: Sequence[str],
) -> None:
    """Idempotent key-based upsert into a parquet location — the
    no-extra-dependency stand-in for Delta/Iceberg ``MERGE`` (with those
    formats installed this whole function is one ``MERGE INTO``; the
    call-site contract is identical). New rows replace existing rows with
    the same key (NULL keys included — the anti-join is null-safe);
    unrelated rows are preserved.

    Mechanics: anti-join existing data against the incoming keys, union,
    rewrite. The rewrite goes through a staging directory because the
    union plan reads the same files the overwrite deletes. At scale,
    partition the location and rewrite only affected partitions
    (see ``upsert_parquet_partitioned``).
    """
    import shutil
    import tempfile

    spark = df.sparkSession
    keys = list(key_cols)
    if _fs_path_exists(spark, path):
        existing = spark.read.parquet(path)
        keep = _anti_join_null_safe(existing, df.select(*keys), keys)
        merged = keep.unionByName(df)
        staging = tempfile.mkdtemp(prefix="blhs_upsert_") + "/data"
        merged.write.mode("overwrite").parquet(staging)
        shutil.rmtree(path)
        shutil.move(staging, path)
    else:
        if df.isEmpty():
            return  # a schema-less empty directory would poison later reads
        df.write.mode("overwrite").parquet(path)


def upsert_parquet_partitioned(
    df: DataFrame,
    path: str,
    key_cols: Sequence[str],
    partition_col: str,
) -> None:
    """Partition-pruned MERGE stand-in: rewrite ONLY the partitions the
    delta touches, leaving every other partition's files untouched on
    disk. This is the shape that survives 100 TB — a daily delta hitting
    3 of 3,000 date partitions rewrites 0.1% of the mart, not all of it
    (``upsert_parquet`` above rewrites the whole location).

    Mechanics: collect the delta's distinct partition values (bounded by
    the partition count, not the data), read the existing mart pruned to
    those partitions (PartitionFilters — only affected directories are
    scanned), anti-join on the keys (null-safe), union the delta, and
    write with dynamic partitionOverwriteMode so Spark replaces exactly
    the partitions present in the result. The merged result is pinned
    with localCheckpoint() first because the write deletes the very
    files the plan reads (at cluster scale: a reliable checkpoint dir or
    a staging table).

    CONTRACT: ``partition_col`` must be functionally dependent on the
    keys (e.g. a date derived from the keyed window). If a key can MOVE
    between partitions, its old copy lives in a partition the delta does
    not touch and survives the merge — use the full-rewrite
    ``upsert_parquet`` for that shape.
    """
    spark = df.sparkSession
    keys = list(key_cols)
    # pin the delta once: it is otherwise evaluated three times below
    # (partition collect, key anti-join, union)
    df = df.localCheckpoint()
    if not _fs_path_exists(spark, path):
        if df.isEmpty():
            return  # a schema-less empty directory would poison later reads
        df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        return
    parts = [r[0] for r in df.select(partition_col).distinct().collect()]
    if not parts:
        return  # empty delta: nothing to merge
    # isin() is null-unsafe: a NULL partition value in the delta would
    # select NO existing rows while dynamic overwrite still replaces the
    # null partition — deleting every unrelated key in it. Build the
    # pruning predicate null-safely.
    non_null = [p for p in parts if p is not None]
    cond = F.col(partition_col).isin(non_null) if non_null else F.lit(False)
    if any(p is None for p in parts):
        cond = cond | F.col(partition_col).isNull()
    existing = spark.read.parquet(path).filter(cond)
    keep = _anti_join_null_safe(existing, df.select(*keys), keys)
    merged = keep.unionByName(df.select(keep.columns)).localCheckpoint()
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(path)
    )


def save_as_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 8,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
) -> None:
    """Bucketed catalog table: rows are hash-partitioned into
    ``num_buckets`` files per partition by ``bucket_cols`` at WRITE time.
    Two tables bucketed identically join with ZERO exchange — the shuffle
    is paid once at load, then every join/aggregation on the bucket key is
    co-located. This is the 100 TB answer to repeated fact-fact joins
    (e.g. lineitem ⋈ orders every night): see tests/test_bucketing.py for
    the no-Exchange plan proof."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def save_as_table(
    df: DataFrame,
    name: str,
    mode: str = "overwrite",
    partition_by: Sequence[str] = (),
) -> None:
    """S4 — register output in the session catalog (Glue-catalog analog):
    downstream ``spark.sql`` resolves it by name."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(name)
