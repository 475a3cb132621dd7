"""Operational robustness: dirty CSV policies, small-file compaction, and
real watermark late-data semantics."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.sources.readers import read_csv
from bookstore_aws_lakehouse_spark.sources.writers import compact_parquet


@pytest.fixture()
def dirty_csv(tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text("id,v\n1,10\n2,not_a_number\n3,30\n")
    return str(p)


def test_csv_permissive_null_fills(spark, dirty_csv):
    rows = {r["id"]: r["v"] for r in read_csv(spark, dirty_csv, schema="id int, v int").collect()}
    assert rows == {1: 10, 2: None, 3: 30}


def test_csv_dropmalformed_drops(spark, dirty_csv):
    out = read_csv(spark, dirty_csv, schema="id int, v int", mode="DROPMALFORMED")
    assert {r["id"] for r in out.collect()} == {1, 3}


def test_csv_failfast_raises(spark, dirty_csv):
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        read_csv(spark, dirty_csv, schema="id int, v int", mode="FAILFAST").collect()


def test_compact_parquet(spark, tmp_path):
    path = str(tmp_path / "fragmented")
    # simulate a streaming sink's file spray: 24 tiny files
    spark.range(10_000).repartition(24).write.parquet(path)
    assert len(glob.glob(f"{path}/*.parquet")) == 24
    n = compact_parquet(path, spark, target_partitions=2)
    assert n == 2
    assert len(glob.glob(f"{path}/*.parquet")) == 2
    assert spark.read.parquet(path).count() == 10_000


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed aggregation must DROP events arriving behind
    the watermark. Two files processed as two micro-batches: the first
    advances the watermark past hour 0; the second's hour-0 straggler
    must not resurrect the closed window."""
    import pandas as pd

    src = tmp_path / "stream_src"
    src.mkdir()
    hour = 3_600_000_000_000  # ns

    def write_file(name, rows):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"])
        pdf.astype({"event_id": "int64", "ts": "int64", "user_id": "int64", "value": "float64"}).to_parquet(
            src / name
        )

    # Three micro-batches (ordered by pinned mtimes):
    #   1) hours 0 and 10  → watermark advances to 09:30 after the batch
    #   2) hour 10.5       → hour-0 state is evicted & EMITTED at batch end
    #   3) hour-0 straggler → state is gone; the late filter drops it
    # (a straggler arriving in the same batch as the eviction would still
    # count — Spark's contract is "later than watermark MAY be dropped";
    # the drop is only guaranteed once the state is actually closed)
    import time

    t0 = time.time()
    write_file("a.parquet", [(1, 1 * hour // 2, 1, "x", 1.0, "{}"), (2, 10 * hour, 1, "x", 1.0, "{}")])
    write_file("c.parquet", [(4, 10 * hour + hour // 2, 1, "x", 1.0, "{}")])
    write_file("b.parquet", [(3, 1 * hour // 3, 1, "x", 1.0, "{}")])
    for name, mt in [("a.parquet", t0 - 300), ("c.parquet", t0 - 200), ("b.parquet", t0 - 100)]:
        os.utime(src / name, (mt, mt))

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .format("parquet")
        .load(str(src))
        .withColumn("event_time", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agged = (
        stream.withWatermark("event_time", "30 minutes")
        .groupBy(F.window("event_time", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agged.writeStream.format("memory")
        .queryName("t_late")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    out = {
        r["window"].start.hour: r["n"] for r in spark.table("t_late").collect()
    }
    # hour-0 window closed with ONE event; the late straggler was dropped
    assert out.get(0) == 1, out


def test_observation_metrics_during_pipeline(spark, sf_smoke):
    """The Observation API: data-quality counters collected DURING a real
    job (no second scan) — how a production load records row counts and
    null rates for free."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    obs = Observation("load_metrics")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("l_quantity").isNull(), 1).otherwise(0)).alias("null_qty"),
        F.max("l_quantity").alias("max_qty"),
    )
    # run any action through the observed frame
    total = observed.groupBy("l_returnflag").count().count()
    assert total > 0
    m = obs.get
    assert m["n_rows"] == 6000 and m["null_qty"] == 0 and m["max_qty"] >= 1
