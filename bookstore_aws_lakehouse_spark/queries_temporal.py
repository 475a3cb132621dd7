"""Oracle-checked temporal-join queries over ``events``: the Spark side
composes windows/bucketed joins (operators/temporal.py); the DuckDB side
uses its native ASOF JOIN and inequality join — two completely independent
implementations that must agree row-for-row."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.catalog import load_events
from bookstore_aws_lakehouse_spark.operators.temporal import asof_join, range_join_bucketed
from bookstore_aws_lakehouse_spark.registry import golden


def _events_us(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_events(spark, sf_dir).select(
        "event_id", "user_id", "event_type", F.expr("ts div 1000").alias("t_us")
    )


@golden(
    "asof_last_signup",
    """
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS t_us,
           epoch_us(s.ts) AS t_us_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def q_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every purchase matched to the user's most recent signup
    at-or-before it (NULL when none). Spark: union + last-value window —
    one shuffle on user_id; oracle: DuckDB's native ASOF LEFT JOIN."""
    ev = _events_us(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "t_us"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "t_us")
    out = asof_join(purchases, signups, time_col="t_us", by=["user_id"], value_cols=[])
    return out.select("event_id", "user_id", "t_us", F.col("t_us_asof"))


RANGE_GAP_US = 5 * 60 * 1_000_000  # 5 minutes


@golden(
    "range_join_followups",
    f"""
    SELECT a.event_id AS event_a, b.event_id AS event_b, a.user_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND epoch_us(b.ts) > epoch_us(a.ts)
     AND epoch_us(b.ts) <= epoch_us(a.ts) + {RANGE_GAP_US}
    """,
)
def q_range_join_followups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: same-user event pairs within a 5-minute follow-up
    window. Spark: coarse-bucket equi-join + exact filter (no nested
    loop); oracle: DuckDB's inequality (IE) join."""
    ev = _events_us(spark, sf_dir)
    a = ev.select(F.col("event_id").alias("event_a"), "user_id", F.col("t_us").alias("ta"))
    b = ev.select(F.col("event_id").alias("event_b"), "user_id", F.col("t_us").alias("tb"))
    joined = range_join_bucketed(a, b, key="user_id", time_l="ta", time_r="tb", max_gap=RANGE_GAP_US)
    return joined.select(
        "event_a", "event_b", "user_id", (F.col("tb") - F.col("ta")).alias("gap_us")
    )
