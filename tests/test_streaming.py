"""Streaming-specific behaviors not covered by the oracle parity suite."""

from __future__ import annotations

from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.streaming.jobs import (
    read_events_stream,
    run_available_now,
    sliding_agg,
)


def test_stream_is_streaming(spark, sf_smoke):
    stream = read_events_stream(spark, sf_smoke)
    assert stream.isStreaming
    assert "event_time" in stream.columns


def test_sliding_windows_overlap(spark, sf_smoke):
    stream = read_events_stream(spark, sf_smoke)
    agged = sliding_agg(stream, window="1 hour", slide="30 minutes")
    run_available_now(agged, "t_sliding", output_mode="complete")
    out = spark.table("t_sliding")
    # every event lands in exactly window/slide = 2 panes
    total_events = spark.read.parquet(f"{sf_smoke}/events.parquet").count()
    assert out.agg(F.sum("n_events")).collect()[0][0] == 2 * total_events
