"""Event-analytics query shapes over the events table: batch
sessionization, cohort retention, and funnel conversion — the
clickstream-warehouse workloads a Spark engine serves daily (SURVEY §2.6
extensions; the reference has no event data at all, so the closest hook is
its record-stream model, ``/root/reference/dbfy.py:188-191``).

Sessionize and funnel run the IDENTICAL SQL text on Spark and DuckDB
(shared dialect: named WINDOW clause, INTERVAL literals, scalar
subqueries); cohort retention uses the DataFrame API with a datediff
formulation both engines compute exactly (week-truncated midnights, so
day differences are exact multiples of 7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wiki_mysql_spark.queries.registry import query
from wiki_mysql_spark.sources.tables import load_table, register_views

# Identical text runs on both engines: gaps-and-islands sessionization.
# A session starts at a user's first event or after a >30 min silence; the
# session id is the running count of starts. One shuffle (user_id), both
# windows share its sort.
_SESSIONIZE_SQL = """
    WITH g AS (
        SELECT event_id, user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_start
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT event_id, user_id,
           CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_id
    FROM g
"""


@query("sessionize_events", _SESSIONIZE_SQL)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): assign every event its
    session ordinal per user — the event-level complement of the streaming
    session_window aggregate (`stream_session_window`). The interval
    comparison runs at full microsecond precision on both engines (no
    epoch-seconds truncation, which would disagree on boundary gaps)."""
    register_views(spark, sf_dir)
    return spark.sql(_SESSIONIZE_SQL)


# view -> click -> purchase, each step strictly after the previous and
# within 7 days of the first view. Stage counts are scalar subqueries.
_FUNNEL_SQL = """
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(ts) AS t2
        FROM events e JOIN v USING (user_id)
        WHERE event_type = 'click' AND ts > t1
          AND ts < t1 + INTERVAL 7 DAY
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(ts) AS t3
        FROM events e JOIN c USING (user_id)
        WHERE event_type = 'purchase' AND ts > t2
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_view,
           (SELECT count(*) FROM c) AS n_view_click,
           (SELECT count(*) FROM p) AS n_view_click_purchase
"""


@query("funnel_conversion", _FUNNEL_SQL)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click within 7 days -> purchase): each stage
    is a min-timestamp aggregate joined against the previous stage, so the
    per-stage work is one hash aggregate + one equi-join on user_id — no
    window over the full event stream, no per-user Python. Identical SQL
    runs on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_FUNNEL_SQL)


@query(
    "cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
        FROM events
    )
    SELECT cohort_week,
           (datediff('day', cohort_week, active_week) / 7)::BIGINT AS week_offset,
           count(*) AS n_active_users
    FROM activity JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen ISO week, activity
    counted per week offset. Two aggregates + one join on user_id; the
    distinct-activity aggregate combines map-side. Week offsets are exact
    on both engines because week-truncated midnights differ by whole
    multiples of 7 days."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("active_week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )


@query(
    "ts_time_weighted_avg",
    """
    WITH x AS (
        SELECT user_id, value,
               epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dur_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           round(sum(value * dur_us) / sum(dur_us), 6) + 0 AS twa
    FROM x WHERE dur_us IS NOT NULL
    GROUP BY user_id
    """,
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user (LOCF weighting: each reading holds
    until the next one, weighted by its holding duration). Durations are
    exact integer microseconds from a single lead() window — one shuffle on
    user_id — and the weighted sum combines map-side. The last reading per
    user has no duration and drops, matching the oracle's NULL filter."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # unix_micros requires TIMESTAMP; events.ts may load as TIMESTAMP_NTZ
    # (parquet timestamp[us]) — cast is exact with the UTC session tz.
    dur = F.unix_micros(F.lead("ts").over(w).cast("timestamp")) - F.unix_micros(
        F.col("ts").cast("timestamp")
    )
    return (
        ev.withColumn("dur_us", dur)
        .where(F.col("dur_us").isNotNull())
        .groupBy("user_id")
        .agg(
            (
                F.round(
                    F.sum(F.col("value") * F.col("dur_us")) / F.sum("dur_us"), 6
                )
                + F.lit(0.0)
            ).alias("twa")
        )
    )


@query(
    "ts_rollup_hierarchical",
    """
    SELECT date_trunc('hour', ts) AS hour_ts,
           count(*) AS n_events,
           round(sum(value), 6) + 0 AS sum_value
    FROM events GROUP BY 1
    """,
)
def ts_rollup_hierarchical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (continuous-aggregate style): the hourly
    result is RE-AGGREGATED from a minute-level pre-aggregate rather than
    the raw events — the hypertable-rollup pattern where coarse grains are
    maintained from fine grains without rescanning raw data. The oracle
    aggregates raw directly, so the comparison certifies the re-aggregation
    is lossless (counts exactly; float sums to 6 decimals)."""
    ev = load_table(spark, sf_dir, "events")
    minute = ev.groupBy(
        F.date_trunc("minute", "ts").alias("minute_ts")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    return (
        minute.groupBy(F.date_trunc("hour", "minute_ts").alias("hour_ts"))
        .agg(
            F.sum("n_events").alias("n_events"),
            (F.round(F.sum("sum_value"), 6) + F.lit(0.0)).alias("sum_value"),
        )
    )


@query(
    "window_time_range_avg",
    """
    SELECT event_id, user_id, ts,
           round(avg(value) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ), 6) + 0 AS avg_1h
    FROM events
    """,
)
def window_time_range_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour rolling average per user — a time-interval RANGE
    frame keyed on exact integer microseconds (Spark's range frames are
    numeric, so the order key is unix_micros; equal-timestamp peers are
    all in-frame on both engines by RANGE semantics). One shuffle on
    user_id."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    w = (
        Window.partitionBy("user_id")
        # cast: unix_micros requires TIMESTAMP, ts may be TIMESTAMP_NTZ
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        (F.round(F.avg("value").over(w), 6) + F.lit(0.0)).alias("avg_1h"),
    )
