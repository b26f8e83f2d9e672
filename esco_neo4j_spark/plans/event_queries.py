"""Event-stream query corpus (SURVEY.md §2 J extensions, H10 scalars).

The reference has no streaming surface (verified, SURVEY §2.J); these are
the north-star extensions over the events table. Each query here is the
BATCH expression of a streaming computation — streaming/events.py runs the
same logic through Structured Streaming (readStream + watermark), and
tests/test_streaming.py asserts stream==batch on the same input, so the
DuckDB oracle transitively checks the streaming path too.

Timestamps are compared as UTC strings; tumbling windows are epoch-aligned
(Spark F.window aligns to 1970-01-01 UTC, mirrored with epoch arithmetic
in the oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esco_neo4j_spark.plans.registry import query

_FMT_SQL = "strftime(%s, '%%Y-%%m-%%d %%H:%%M:%%S')"
_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"


@query(
    "events_tumbling_window",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events)
    SELECT strftime(to_timestamp(floor(epoch(ts) / 21600) * 21600),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(value), 2) AS DOUBLE) AS total_value
    FROM ev
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    survey_ops="J(ext),D2",
    bench=True,
    tables=("events",),
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 6h window counts per event type — F.window (the streaming
    group key) in batch mode; epoch-aligned, identical to the streaming
    query in streaming/events.py."""
    ev = spark.table("events")
    return (
        ev.groupBy(F.window("ts", "6 hours").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", _FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_sliding_window",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    offsets AS (SELECT unnest([0, 10800]) AS off),
    win AS (
      SELECT strftime(to_timestamp(floor((epoch(ts) - off) / 21600) * 21600 + off),
                      '%Y-%m-%d %H:%M:%S') AS window_start,
             value
      FROM ev, offsets
      WHERE epoch(ts) >= off
    )
    SELECT window_start, CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(avg(value), 4) AS DOUBLE) AS avg_value
    FROM win GROUP BY window_start
    ORDER BY window_start
    """,
    survey_ops="J(ext)",
    tables=("events",),
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (6h window, 3h slide): each event lands in 2 windows.
    The oracle expands the window set with an explicit offset cross join."""
    ev = spark.table("events")
    return (
        ev.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .select(
            F.date_format("w.start", _FMT_SPARK).alias("window_start"),
            "n_events",
            "avg_value",
        )
        .orderBy("window_start")
    )


@query(
    "events_sessionization",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    ordered AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM ev
    ),
    flagged AS (
      SELECT user_id,
             CASE WHEN prev_ts IS NULL
                       OR epoch(ts) - epoch(prev_ts) > 3600 THEN 1 ELSE 0 END
               AS new_session
      FROM ordered
    )
    SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM flagged GROUP BY user_id
    ORDER BY user_id
    """,
    survey_ops="E(ext),J(ext)",
    tables=("events",),
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (1h inactivity): lag window + conditional
    sum — the batch twin of streaming session_window."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn("prev_ts", F.lag("ts").over(w)).withColumn(
        "new_session",
        F.when(
            F.col("prev_ts").isNull()
            | (
                F.col("ts").cast("double") - F.col("prev_ts").cast("double")
                > 3600.0
            ),
            1,
        ).otherwise(0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.sum("new_session").cast("bigint").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@query(
    "events_json_props",
    sql="""
    SELECT CAST(json_extract(props, '$.k') AS INT) % 10 AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(avg(value), 4) AS DOUBLE) AS avg_value
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1 ORDER BY 1
    """,
    survey_ops="H10(ext),B3",
    tables=("events",),
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction + bucket agg (H10 — absent from reference,
    extension; get_json_object is the Spark-native path)."""
    ev = spark.table("events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.filter(k.isNotNull())
        .groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("k_bucket")
    )


@query(
    "events_dedup_latest",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events)
    SELECT user_id, event_type,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
           CAST(count(*) AS BIGINT) AS n
    FROM ev
    GROUP BY user_id, event_type
    ORDER BY user_id, event_type
    """,
    survey_ops="J(ext),B12",
    tables=("events",),
)
def events_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest per (user, type) — the batch twin of streaming
    dropDuplicatesWithinWatermark/state-keyed dedup."""
    ev = spark.table("events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(
            F.date_format(F.max("ts"), _FMT_SPARK).alias("last_seen"),
            F.count("*").alias("n"),
        )
        .orderBy("user_id", "event_type")
    )
