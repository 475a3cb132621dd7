"""Oracle-checked queries over the ``events`` table: time bucketing, JSON
extraction, sessionization, running aggregates (SURVEY §2.7 note — date/json
functions enter with the events extension; §2.8 windows).

Time determinism: ``events.ts`` is parquet TIMESTAMP(NANOS); we read it as
integer epoch-nanoseconds (see catalog.load_events) and bucket with integer
division — exact, timezone-free, and bit-identical to DuckDB's
``epoch_ns``. No engine-local timestamp rendering anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bookstore_aws_lakehouse_spark.catalog import load_events
from bookstore_aws_lakehouse_spark.functions.scalar import exact_sum
from bookstore_aws_lakehouse_spark.registry import golden

NS_PER_DAY = 86_400_000_000_000
NS_PER_HOUR = 3_600_000_000_000


@golden(
    "events_daily_agg",
    f"""
    SELECT CAST(floor(epoch_ns(ts) / {NS_PER_DAY}.0) AS BIGINT) AS day_no,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY day_no, event_type
    """,
)
def q_events_daily_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily tumbling rollup (batch twin of the streaming window agg):
    group by epoch-day × event_type."""
    ev = load_events(spark, sf_dir)
    return (
        ev.withColumn("day_no", F.floor(F.col("ts") / NS_PER_DAY).cast("bigint"))
        .groupBy("day_no", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("total_value"),
        )
    )


@golden(
    "events_hourly_tumbling",
    f"""
    SELECT CAST(floor(epoch_ns(ts) / {NS_PER_HOUR}.0) AS BIGINT) * {NS_PER_HOUR} AS window_start_ns,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY window_start_ns
    """,
)
def q_events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling windows over event time — the batch semantics that
    the Structured Streaming job (streaming/jobs.py) must reproduce."""
    ev = load_events(spark, sf_dir)
    return (
        ev.withColumn(
            "window_start_ns",
            (F.floor(F.col("ts") / NS_PER_HOUR) * NS_PER_HOUR).cast("bigint"),
        )
        .groupBy("window_start_ns")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value").alias("total_value"),
        )
    )


@golden(
    "events_json_extract",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def q_events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the ``props`` string column
    (get_json_object — JVM-side JSON path evaluation)."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        "event_id",
        "event_type",
        F.get_json_object("props", "$.k").cast("bigint").alias("k_value"),
    )


@golden(
    "events_json_agg",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def q_events_json_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a JSON-extracted field (integer sum — exact)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min

# Sessionization works in exact integer MICROseconds: DuckDB's parquet
# reader coerces ns timestamps to us precision, so ``epoch_us(ts)`` is its
# exact clock; Spark truncates its ns long with integer division
# (``ts div 1000`` — `div`, not `/`, to stay in exact long arithmetic).

#: shared sessionization CTEs (marked -> sessions) — ONE source of truth
#: for the gap predicate and ordering keys, used by every session query
_SESSIONS_CTE = f"""
    WITH marked AS (
      SELECT user_id, event_id, epoch_us(ts) AS t_us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                    OR lag(epoch_us(ts)) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    sessions AS (
      SELECT user_id, event_id, t_us,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
      FROM marked
    )"""


def _sessionized(spark, sf_dir):
    """Shared Spark-side sessionization (the _SESSIONS_CTE twin): events
    keyed (user_id, event_id, t_us) with a session_no per row."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.expr("ts div 1000").alias("t_us")
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    marked = ev.withColumn(
        "new_session",
        F.when(
            (F.col("t_us") - F.lag("t_us").over(w) > SESSION_GAP_US)
            | F.lag("t_us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    return marked.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


@golden(
    "events_sessionize",
    _SESSIONS_CTE
    + """
    SELECT user_id, session_no,
           count(*) AS n_events,
           min(t_us) AS session_start_us,
           max(t_us) AS session_end_us
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gap > 30 min starts a new session): lag +
    cumulative-sum windows, then per-session rollup. The window shuffles
    once on user_id — the same keying a streaming session_window uses."""
    return _sessionized(spark, sf_dir).groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("t_us").alias("session_start_us"),
        F.max("t_us").alias("session_end_us"),
    )


@golden(
    "events_running_value",
    """
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
    FROM events
    """,
)
def q_events_running_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user total (cumulative window frame); decimal
    accumulation keeps every prefix sum exact. The window orders by
    MICROsecond time (``ts div 1000``) + event_id, matching the oracle's
    ``epoch_us`` clock exactly — ordering by raw nanoseconds would
    diverge the prefix sums the first time two events of one user share
    a microsecond with ns-order opposite to id-order."""
    ev = load_events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.expr("ts div 1000"), "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_value"),
    )


@golden(
    "events_user_quantiles",
    """
    SELECT user_id,
           count(*) AS n,
           median(k) AS median_k,
           quantile_cont(k, 0.25) AS q25_k,
           quantile_cont(k, 0.75) AS q75_k
    FROM (SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          FROM events)
    WHERE k IS NOT NULL
    GROUP BY user_id
    """,
)
def q_events_user_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map Pandas UDF (applyInPandas): per-user median/quartiles of
    the JSON `k` field via numpy — the Arrow path for per-group logic that
    outgrows SQL aggregates. Determinism: k is integer and numpy's default
    'linear' percentile interpolation is the same closed formula as
    quantile_cont, so doubles match exactly. Rows with missing/non-numeric
    `k` are filtered in BOTH twins: np.percentile propagates NaN while
    quantile_cont skips NULLs, so an unfiltered missing key would poison
    the whole user's quantiles on the Spark side only."""
    import pandas as pd

    ev = load_events(spark, sf_dir).select(
        "user_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    ).filter(F.col("k").isNotNull())

    def quantiles(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        k = pdf["k"].to_numpy(dtype="float64")
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n": [len(k)],
                "median_k": [float(np.percentile(k, 50))],
                "q25_k": [float(np.percentile(k, 25))],
                "q75_k": [float(np.percentile(k, 75))],
            }
        )

    return ev.groupBy("user_id").applyInPandas(
        quantiles,
        schema="user_id long, n long, median_k double, q25_k double, q75_k double",
    )


@golden(
    "map_functions_event_counts",
    """
    SELECT user_id, event_type, CAST(n AS BIGINT) AS n
    FROM (SELECT user_id, event_type, count(*) AS n
          FROM events GROUP BY user_id, event_type)
    """,
)
def q_map_functions_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type surface: per-user counts collected into a
    map<event_type, n> (map_from_entries) and exploded back to rows —
    proving the map construction/flattening round-trip loses nothing.
    The oracle is the plain group-by the round-trip must equal."""
    ev = load_events(spark, sf_dir)
    per_type = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    as_map = per_type.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "n"))).alias("type_counts")
    )
    return as_map.select(
        "user_id", F.explode("type_counts").alias("event_type", "n")
    )




@golden(
    "events_daily_from_hourly",
    f"""
    SELECT CAST(floor(epoch_ns(ts) / {NS_PER_DAY}.0) AS BIGINT) AS day_no,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY day_no
    """,
)
def q_events_daily_from_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollup-from-rollup: the daily aggregate computed FROM the hourly
    aggregate (sum of sums, sum of counts) — while the oracle computes it
    from raw events. Equality proves the multi-granularity rollup chain
    (hour → day → …) is lossless, which is what lets a 100 TB pipeline
    serve coarse dashboards from megabyte marts instead of re-scanning
    raw data. Decimal intermediates keep the re-aggregated sums exact."""
    ev = load_events(spark, sf_dir)
    hourly = (
        ev.withColumn(
            "window_start_ns",
            (F.floor(F.col("ts") / NS_PER_HOUR) * NS_PER_HOUR).cast("bigint"),
        )
        .groupBy("window_start_ns")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("total_value_dec"),
        )
    )
    return (
        hourly.withColumn(
            "day_no", F.floor(F.col("window_start_ns") / NS_PER_DAY).cast("bigint")
        )
        .groupBy("day_no")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("total_value_dec").cast("double").alias("total_value"),
        )
    )


@golden(
    "events_type_transitions",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    """,
)
def q_events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral sequence analysis: the event-type transition matrix
    (Markov counts) per consecutive pair within each user's ordered
    stream — lag window + pair count, one shuffle on user_id then one on
    the (tiny) pair key."""
    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.expr("ts div 1000"), "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@golden(
    "events_retention_cohorts",
    f"""
    WITH days AS (
      SELECT user_id,
             CAST(floor(epoch_ns(ts) / {NS_PER_DAY}.0) AS BIGINT) AS day_no
      FROM events
    ),
    cohorts AS (SELECT user_id, min(day_no) AS cohort_day FROM days GROUP BY user_id)
    SELECT c.cohort_day,
           d.day_no - c.cohort_day AS day_offset,
           count(DISTINCT d.user_id) AS n_active
    FROM days d JOIN cohorts c ON d.user_id = c.user_id
    WHERE d.day_no - c.cohort_day <= 7
    GROUP BY c.cohort_day, day_offset
    """,
)
def q_events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, activity counted
    per day-offset for the first week — the two-level aggregate every
    product-analytics pipeline runs (per-user min, broadcast back, count
    distinct per cell)."""
    ev = load_events(spark, sf_dir)
    days = ev.select(
        "user_id", F.floor(F.col("ts") / NS_PER_DAY).cast("bigint").alias("day_no")
    )
    # no broadcast hint: cohorts is one row PER USER — fact-scaling, not a
    # bounded dim; AQE broadcasts at fixture scale and shuffle-joins at 100 TB
    cohorts = days.groupBy("user_id").agg(F.min("day_no").alias("cohort_day"))
    joined = days.join(cohorts, "user_id").withColumn(
        "day_offset", F.col("day_no") - F.col("cohort_day")
    )
    return (
        joined.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@golden(
    "events_geomean_value",
    """
    SELECT event_type,
           round(exp(avg(ln(value))), 6) AS geomean_value,
           count(*) AS n
    FROM events
    WHERE value > 0
    GROUP BY event_type
    """,
)
def q_events_geomean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF: geometric mean per event type via numpy —
    the custom-aggregate escape hatch (a JVM-only formulation
    exp(avg(ln)) exists for this one, which is exactly what the oracle
    uses; the UDF must agree with it to 6 dp, proving the Arrow grouped-
    aggregation path end-to-end)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def geomean(v):
        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    geomean.__annotations__ = {"v": pd.Series, "return": float}
    geomean_udf = pandas_udf(geomean, "double")

    ev = load_events(spark, sf_dir).filter(F.col("value") > 0)
    # grouped-agg pandas UDFs cannot mix with JVM aggregates in one agg()
    # — compute each and join on the (tiny) group key
    geo = ev.groupBy("event_type").agg(
        F.round(geomean_udf("value"), 6).alias("geomean_value")
    )
    counts = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    return geo.join(counts, "event_type")


@golden(
    "events_from_json_struct",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_extract_string(props, '$.missing') IS NOT NULL AS has_missing
    FROM events
    """,
)
def q_events_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read JSON parsing: ``from_json`` with an explicit struct
    schema (vs get_json_object's per-path extraction) — absent fields
    surface as typed NULLs, not errors. One parse per row regardless of
    how many fields are read."""
    ev = load_events(spark, sf_dir)
    parsed = ev.withColumn(
        "j", F.from_json("props", "k BIGINT, missing STRING")
    )
    return parsed.select(
        "event_id",
        F.col("j.k").alias("k"),
        F.col("j.missing").isNotNull().alias("has_missing"),
    )


@golden(
    "events_daily_gapfill",
    f"""
    WITH days AS (
      SELECT unnest(generate_series(0, 29)) AS day_offset
    ),
    actual AS (
      SELECT CAST(floor(epoch_ns(ts) / {NS_PER_DAY}.0) AS BIGINT) AS day_no,
             count(*) AS n
      FROM events WHERE user_id = 7 GROUP BY day_no
    ),
    base AS (SELECT min(CAST(floor(epoch_ns(ts) / {NS_PER_DAY}.0) AS BIGINT)) AS d0 FROM events)
    SELECT d0 + day_offset AS day_no, coalesce(n, 0) AS n_events
    FROM days CROSS JOIN base
    LEFT JOIN actual ON actual.day_no = d0 + day_offset
    """,
)
def q_events_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling: a generated 30-day spine left-joined to
    one user's daily counts, zeros where the user was silent — the dense
    time series every charting/forecasting consumer needs (generated
    spine, never a scan; the fact side stays filtered+aggregated)."""
    ev = load_events(spark, sf_dir)
    day_no = F.floor(F.col("ts") / NS_PER_DAY).cast("bigint")
    actual = (
        ev.filter(F.col("user_id") == 7)
        .groupBy(day_no.alias("day_no"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = ev.agg(F.min(day_no).alias("d0"))
    spine = spark.range(0, 30).select(F.col("id").alias("day_offset")).crossJoin(
        F.broadcast(base)
    )
    out = spine.join(
        actual, actual.day_no == spine.d0 + spine.day_offset, "left"
    )
    return out.select(
        (F.col("d0") + F.col("day_offset")).alias("day_no"),
        F.coalesce("n", F.lit(0)).alias("n_events"),
    )




@golden(
    "events_hour_of_day_profile",
    f"""
    SELECT CAST((floor(epoch_ns(ts) / {NS_PER_HOUR}.0) % 24) AS BIGINT) AS hour_of_day,
           event_type,
           count(*) AS n
    FROM events
    GROUP BY hour_of_day, event_type
    """,
)
def q_events_hour_of_day_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal activity profile: counts by hour-of-day × type (the epoch
    is midnight-aligned so hour-index mod 24 IS the UTC hour — pure
    integer bucketing, no calendar functions in the hash path)."""
    ev = load_events(spark, sf_dir)
    hod = (F.floor(F.col("ts") / NS_PER_HOUR) % 24).cast("bigint")
    return ev.groupBy(hod.alias("hour_of_day"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@golden(
    "events_conversion_funnel",
    """
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END) AS t_signup,
             min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(count_if(t_signup IS NOT NULL) AS BIGINT) AS stage_signup,
           CAST(count_if(t_signup IS NOT NULL AND t_view > t_signup) AS BIGINT) AS stage_view_after,
           CAST(count_if(t_signup IS NOT NULL AND t_view > t_signup
                    AND t_purchase > t_view) AS BIGINT) AS stage_purchase_after
    FROM per_user
    """,
)
def q_events_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion funnel (signup → view-after → purchase-after): first-
    occurrence times per stage via conditional mins, ordered-stage checks
    as integer comparisons — one aggregate pass + one tiny rollup, the
    product-analytics staple."""
    ev = load_events(spark, sf_dir)
    t_us = F.expr("ts div 1000")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", t_us)).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "view", t_us)).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", t_us)).alias("t_purchase"),
    )
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count_if(F.col("t_signup").isNotNull()).alias("stage_signup"),
        F.count_if(
            F.col("t_signup").isNotNull() & (F.col("t_view") > F.col("t_signup"))
        ).alias("stage_view_after"),
        F.count_if(
            F.col("t_signup").isNotNull()
            & (F.col("t_view") > F.col("t_signup"))
            & (F.col("t_purchase") > F.col("t_view"))
        ).alias("stage_purchase_after"),
    )


@golden(
    "events_session_duration_stats",
    _SESSIONS_CTE
    + """,
    durations AS (
      SELECT user_id, session_no, max(t_us) - min(t_us) AS dur_us
      FROM sessions GROUP BY user_id, session_no
    )
    SELECT count(*) AS n_sessions,
           median(dur_us) AS median_dur_us,
           quantile_cont(dur_us, 0.9) AS p90_dur_us,
           max(dur_us) AS max_dur_us
    FROM durations
    """,
)
def q_events_session_duration_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-duration distribution: the sessionization pipeline rolled
    up to engagement stats (median/p90/max duration) — integer-µs
    durations keep the percentile interpolation exact. Shares the
    _sessionized builder with events_sessionize: the gap predicate and
    ordering keys exist exactly once."""
    durations = _sessionized(spark, sf_dir).groupBy("user_id", "session_no").agg(
        (F.max("t_us") - F.min("t_us")).alias("dur_us")
    )
    return durations.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.expr("percentile(dur_us, 0.5)").alias("median_dur_us"),
        F.expr("percentile(dur_us, 0.9)").alias("p90_dur_us"),
        F.max("dur_us").alias("max_dur_us"),
    )


@golden(
    "events_salted_heavy_key_join",
    """
    WITH p AS (SELECT user_id, count(*) AS user_events FROM events GROUP BY user_id)
    SELECT event_type,
           count(*) AS n,
           CAST(sum(user_events) AS BIGINT) AS sum_user_events
    FROM events JOIN p USING (user_id)
    GROUP BY event_type
    """,
)
def q_events_salted_heavy_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated fact⋈profile join via explicit salting
    (operators/joins.py::salted_join): the skewed side's rows spread over
    8 salt values, the profile side replicates 8×, and the join key
    becomes (user_id, salt) — a hot user that would pin one task fans out
    across 8. Salting must never change RESULTS, only distribution: the
    oracle is the plain unsalted join, so the driver verifies exactly
    that invariant. (AQE skew splitting covers most cases; this is the
    residual-hot-key / non-AQE pattern.)"""
    from bookstore_aws_lakehouse_spark.operators.joins import salted_join

    ev = load_events(spark, sf_dir).select("event_id", "user_id", "event_type")
    profile = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("user_events"))
    joined = salted_join(ev, profile, on="user_id", num_salts=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("user_events").alias("sum_user_events"),
    )


@golden(
    "events_hourly_anomaly",
    f"""
    WITH hourly AS (
      SELECT event_type,
             CAST(floor(epoch_ns(ts) / {NS_PER_HOUR}.0) AS BIGINT) AS hour_no,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    scored AS (
      SELECT event_type, hour_no, n,
             avg(n) OVER w AS mu,
             stddev_samp(n) OVER w AS sigma
      FROM hourly
      WINDOW w AS (PARTITION BY event_type ORDER BY hour_no
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hour_no, n, z FROM (
      SELECT event_type, hour_no, n, round((n - mu) / sigma, 4) AS z
      FROM scored WHERE sigma > 0
    ) WHERE abs(z) > 2
    """,
)
def q_events_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-style anomaly detection in batch: each (type, hour)'s
    count is z-scored against its own TRAILING 24-hour window (frame ends
    at 1 PRECEDING so the current hour never contaminates its baseline);
    |z| > 2 rows are the anomalies. One aggregate + one window shuffle on
    event_type — the monitoring shape for pipeline health dashboards.
    z rounds to 4 dp BEFORE the threshold filter: window stddev
    accumulates in frame order and can differ between engines in the
    last ulps, so filtering on the unrounded value could flip a
    boundary row's membership — the same class the rounded output
    column already guards, applied to the predicate too."""
    ev = load_events(spark, sf_dir)
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.col("ts") / NS_PER_HOUR).cast("bigint").alias("hour_no"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_no")
        .rowsBetween(-24, -1)
    )
    scored = hourly.select(
        "event_type",
        "hour_no",
        "n",
        F.avg("n").over(w).alias("mu"),
        F.stddev_samp("n").over(w).alias("sigma"),
    )
    z_rounded = scored.filter(F.col("sigma") > 0).select(
        "event_type",
        "hour_no",
        "n",
        F.round((F.col("n") - F.col("mu")) / F.col("sigma"), 4).alias("z"),
    )
    return z_rounded.filter(F.abs(F.col("z")) > 2)


@golden(
    "events_variant_extract",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(count(json_extract_string(props, '$.missing')) AS BIGINT) AS n_missing,
           'OBJECT<k: BIGINT>' AS variant_schema
    FROM events GROUP BY event_type
    """,
)
def q_events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured ingestion through the VARIANT type (Spark 4's
    open-ended JSON path — parse once into a typed binary encoding,
    extract many times without re-parsing, schema DISCOVERED not
    declared): ``parse_json`` → ``variant_get`` typed extraction,
    ``try_variant_get`` for an absent path (typed NULL, no error), and
    ``schema_of_variant`` reporting the discovered shape, aggregated per
    event type. Complements events_json_extract (per-path string JSON)
    and events_from_json_struct (declared-schema parsing): VARIANT is
    what a 100 TB lake uses when producers evolve payloads faster than
    schemas can be declared. The oracle extracts the same paths with
    DuckDB's JSON functions and pins the discovered schema literally."""
    ev = load_events(spark, sf_dir)
    v = ev.select("event_type", F.parse_json("props").alias("v"))
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.variant_get("v", "$.k", "bigint")).alias("sum_k"),
        F.count(F.try_variant_get("v", "$.missing", "string")).alias("n_missing"),
        F.max(F.schema_of_variant("v")).alias("variant_schema"),
    )


@golden(
    "events_observed_metrics",
    """
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
           CAST(max(user_id) AS BIGINT) AS max_user_id,
           CAST(min(event_id) AS BIGINT) AS min_event_id,
           CAST(max(event_id) AS BIGINT) AS max_event_id,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events
    """,
)
def q_events_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline observability via ``DataFrame.observe`` (the Observation
    API): data-quality metrics — row/null counts, id bounds, an
    exact decimal value total (DISTINCT aggregates are disallowed in
    observed metrics — use an HLL sketch metric if cardinality is
    needed) — are PIGGYBACKED on a job's existing pass
    instead of a second aggregation scan. At 100 TB that difference is a
    full table read: observe() accumulates per-task and merges on the
    driver for free with whatever action already runs. Here the observed
    job is a trivial noop-write of the frame; the returned single-row
    frame carries the harvested metrics, and the oracle recomputes them
    relationally (the value total rides DECIMAL so the per-task merge
    order cannot move it)."""
    from pyspark.sql import Observation

    events = load_events(spark, sf_dir)
    obs = Observation("dq")
    observed = events.observe(
        obs,
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("value").isNull().cast("bigint")).alias("n_null_value"),
        F.max("user_id").cast("bigint").alias("max_user_id"),
        F.min("event_id").cast("bigint").alias("min_event_id"),
        F.max("event_id").cast("bigint").alias("max_event_id"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
            "total_value"
        ),
    )
    observed.write.format("noop").mode("overwrite").save()  # the real job
    m = obs.get
    return spark.createDataFrame(
        [
            (
                m["n_rows"],
                m["n_null_value"],
                m["max_user_id"],
                m["min_event_id"],
                m["max_event_id"],
                m["total_value"],
            )
        ],
        "n_rows long, n_null_value long, max_user_id long, "
        "min_event_id long, max_event_id long, total_value double",
    )
