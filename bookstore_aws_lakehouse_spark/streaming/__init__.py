"""Structured Streaming jobs (SURVEY §2.9 — extension surface)."""

from bookstore_aws_lakehouse_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    tumbling_agg,
    sliding_agg,
    session_window_agg,
    dedup_within_watermark,
    run_available_now,
)
