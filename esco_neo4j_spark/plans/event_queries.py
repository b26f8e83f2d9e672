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


@query(
    "ext_asof_join",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    clicks AS (
      SELECT user_id, ts, event_id FROM ev WHERE event_type = 'click'
      QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id) = 1
    ),
    purch AS (
      SELECT event_id AS purchase_id, user_id, ts FROM ev
      WHERE event_type = 'purchase'
    )
    SELECT p.purchase_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
           c.event_id AS click_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
    FROM purch p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    ORDER BY p.purchase_id
    """,
    survey_ops="asof-join(ext),E(ext)",
    tables=("events",),
)
def ext_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF join — an operator Spark lacks natively (north-star custom
    operator): each purchase matched to the user's most recent click at or
    before it. Idiomatic scale-safe composition instead of a per-row range
    scan: tag and UNION the two streams, one shuffle on user_id, then
    ``last(click, ignorenulls)`` over an unbounded-preceding row window —
    O(n log n) within each user partition, no theta join anywhere. The
    oracle is DuckDB's NATIVE ASOF JOIN, an algorithmically independent
    implementation. Same-(user, ts) clicks are deduped to min event_id so
    the match is deterministic on both engines."""
    from pyspark.sql import Window

    ev = spark.table("events")
    w0 = Window.partitionBy("user_id", "ts").orderBy("event_id")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w0))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    purch = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", "ts"
    )
    tagged = clicks.select(
        "user_id", "ts", F.lit(0).alias("tag"),
        F.col("event_id").alias("cid"),
        F.lit(None).cast("bigint").alias("purchase_id"),
    ).unionByName(
        purch.select(
            "user_id", "ts", F.lit(1).alias("tag"),
            F.lit(None).cast("bigint").alias("cid"), "purchase_id",
        )
    )
    # same-ts ordering: click (tag 0) sorts before purchase (tag 1), so a
    # click at exactly the purchase ts is visible to it
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "cid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    last_click = F.last(
        F.when(
            F.col("tag") == 0,
            F.struct(F.col("cid"), F.col("ts").alias("cts")),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        tagged.withColumn("lc", last_click)
        .filter(F.col("tag") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.date_format("ts", _FMT_SPARK).alias("purchase_ts"),
            F.col("lc.cid").alias("click_id"),
            (F.unix_micros("ts") - F.unix_micros("lc.cts")).alias("gap_us"),
        )
        .orderBy("purchase_id")
    )


@query(
    "events_interval_join",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events)
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
    FROM ev p JOIN ev c
      ON p.user_id = c.user_id
     AND p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts BETWEEN p.ts - INTERVAL 600 SECOND AND p.ts
    ORDER BY purchase_id, click_id
    """,
    survey_ops="J(ext),range-join(ext)",
    tables=("events",),
)
def events_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.interval_join (stream-stream attribution
    join): every (purchase, click) pair for the same user with the click
    in the 10 minutes up to the purchase. Scale-safe shape: time is bucketed
    at the bound width (600 s) so the range predicate becomes an EQUI-join
    on (user_id, bucket) — each purchase probes buckets {b-1, b}, which
    cover the whole one-sided window — then the exact predicate refines.
    Each true pair meets in exactly one probe bucket (the click's own), so
    no dedup pass is needed. The streaming version keeps the range as
    watermarked join state; the DuckDB oracle plans it natively."""
    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
        F.floor(F.unix_micros("ts") / 600_000_000).alias("bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.explode(
            F.array(
                F.floor(F.unix_micros("ts") / 600_000_000) - 1,
                F.floor(F.unix_micros("ts") / 600_000_000),
            )
        ).alias("bucket"),
    )
    gap = F.unix_micros("p_ts") - F.unix_micros("c_ts")
    return (
        purchases.join(clicks, ["user_id", "bucket"])
        .filter((gap >= 0) & (gap <= 600_000_000))
        .select("purchase_id", "click_id", "user_id", gap.alias("gap_us"))
        .orderBy("purchase_id", "click_id")
    )


@query(
    "events_enriched_rollup",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events)
    SELECT strftime(to_timestamp(floor(epoch(ev.ts) / 21600) * 21600),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           c.c_mktsegment AS segment,
           ev.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(round(sum(ev.value), 2) AS DOUBLE) AS total_value
    FROM ev JOIN customer c ON ev.user_id = c.c_custkey
    GROUP BY 1, 2, 3
    ORDER BY window_start, segment, event_type
    """,
    survey_ops="J(ext),C1,D2",
    tables=("events", "customer"),
)
def events_enriched_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.enrich_segments (stream-static dimension
    enrichment): events joined to the broadcast customer dimension, then
    tumbling-window revenue per (segment, event_type). The dimension side
    is explicitly broadcast — the fact scan never shuffles for the join;
    only the window aggregation exchanges on its grouping key."""
    ev = spark.table("events")
    dim = F.broadcast(
        spark.table("customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
    )
    return (
        ev.join(dim, "user_id")
        .groupBy(
            F.window("ts", "6 hours").alias("w"),
            "c_mktsegment",
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.col("c_mktsegment").alias("segment"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "segment", "event_type")
    )


@query(
    "ext_range_join",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events)
    SELECT a.event_id AS id_a, b.event_id AS id_b, a.user_id,
           CAST(abs(epoch_us(a.ts) - epoch_us(b.ts)) AS BIGINT) AS gap_us
    FROM ev a JOIN ev b
      ON a.user_id = b.user_id AND a.event_id < b.event_id
     AND b.ts BETWEEN a.ts - INTERVAL 60 SECOND AND a.ts + INTERVAL 60 SECOND
    ORDER BY id_a, id_b
    """,
    survey_ops="range-join(ext),B7",
    tables=("events",),
)
def ext_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded RANGE join — pairs of same-user events within 60 seconds of
    each other. The naive plan is a per-user theta join (quadratic in the
    hot user); the scale-safe shape implemented here buckets time into
    60s bins and probes each event against bins {b-1, b, b+1} via an
    EQUI-join (explode 3 keys on one side), then refines with the exact
    predicate — every true pair meets exactly once, so no dedup pass.
    DuckDB plans the same query with its native range-join optimizer —
    independent implementations, identical pairs."""
    ev = spark.table("events").select(
        "event_id", "user_id", "ts",
        F.floor(F.unix_micros("ts") / 60_000_000).alias("bucket"),
    )
    probe = ev.select(
        F.col("event_id").alias("id_a"),
        F.col("user_id"),
        F.col("ts").alias("ts_a"),
        F.explode(
            F.array(F.col("bucket") - 1, F.col("bucket"), F.col("bucket") + 1)
        ).alias("bucket"),
    )
    build = ev.select(
        F.col("event_id").alias("id_b"),
        F.col("user_id"),
        F.col("ts").alias("ts_b"),
        "bucket",
    )
    gap = F.abs(F.unix_micros("ts_a") - F.unix_micros("ts_b"))
    return (
        probe.join(build, ["user_id", "bucket"])
        .filter((F.col("id_a") < F.col("id_b")) & (gap <= 60_000_000))
        .select("id_a", "id_b", "user_id", gap.alias("gap_us"))
        .orderBy("id_a", "id_b")
    )


@query(
    "events_approx_distinct_rollup",
    sql="""
    WITH h AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             md5(CAST(user_id AS VARCHAR)) AS hx
      FROM events
    ),
    rho AS (
      SELECT event_type, d,
             ('0x' || substr(hx, 1, 1))::BIGINT AS bucket,
             CASE WHEN ('0x' || substr(hx, 2, 12))::BIGINT = 0 THEN 49
                  ELSE CAST(log2(('0x' || substr(hx, 2, 12))::BIGINT
                                 & -(('0x' || substr(hx, 2, 12))::BIGINT))
                            AS INT) + 1
             END AS rho
      FROM h
    ),
    daily AS (
      SELECT event_type, d, bucket, max(rho) AS rho
      FROM rho GROUP BY 1, 2, 3
    ),
    merged AS (
      SELECT event_type, bucket, max(rho) AS rho
      FROM daily GROUP BY 1, 2
    ),
    agg AS (
      -- CAST: DuckDB parses the 2^48 literal as DECIMAL(18) and the
      -- multiplication overflows; force DOUBLE (playbook trap #10)
      SELECT event_type,
             sum(pow(2, 48 - rho)) AS psum, count(*) AS nb
      FROM merged GROUP BY 1
    ),
    est AS (
      SELECT event_type, 16 - nb AS v,
             0.673 * 16 * 16 * CAST(281474976710656 AS DOUBLE)
               / (psum + (16 - nb) * CAST(281474976710656 AS DOUBLE)) AS raw
      FROM agg
    ),
    finals AS (
      SELECT event_type,
             CAST(floor(CASE WHEN raw <= 40 AND v > 0
                             THEN 16 * ln(16.0 / v) ELSE raw END)
                  AS BIGINT) AS approx_users
      FROM est
    ),
    days AS (
      SELECT event_type, count(DISTINCT d) AS n_days FROM h GROUP BY 1
    )
    SELECT f.event_type, f.approx_users,
           CAST(y.n_days AS BIGINT) AS n_days
    FROM finals f JOIN days y USING (event_type)
    ORDER BY event_type
    """,
    survey_ops="sketch(ext),D5",
    tables=("events",),
)
def events_approx_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch rollup — THE count-distinct pattern at 100 TB:
    exact COUNT(DISTINCT) re-shuffles raw keys for every question asked,
    while HLL register tables are built once per (type, day) partition,
    persist at <= m rows each, and answer any day-range distinct-user
    question by MERGING registers (element-wise max) — no second pass
    over raw data. Two-level plan: partial per-day register build
    (map-side combinable groupBy-max), cross-day merge, estimate at the
    end.

    Round 5: swapped Spark's builtin hll_sketch_agg (engine-private
    binary sketch => rows-only check) for the md5-register HLL
    (operators/sketch.py hll_registers_md5) whose registers, merge,
    harmonic sum, and floored estimate replay bit-exactly in DuckDB —
    the ESTIMATE is now value-oracled like events_kmv_distinct_rollup.
    The builtin-sketch variant stays exercised (error-bounded vs exact)
    in tests/test_sketches.py::test_native_hll_sketch_agg_rollup."""
    from esco_neo4j_spark.operators.sketch import (
        hll_estimate_md5, hll_merge, hll_registers_md5,
    )

    ev = spark.table("events").select(
        "event_type", "user_id", F.date_trunc("day", "ts").alias("d")
    )
    daily = hll_registers_md5(ev, "user_id", ["event_type", "d"])
    merged = hll_merge(daily, ["event_type"])
    est = hll_estimate_md5(merged, ["event_type"]).select(
        "event_type", F.col("approx").alias("approx_users")
    )
    days = ev.groupBy("event_type").agg(
        F.count_distinct("d").cast("bigint").alias("n_days")
    )
    return est.join(days, "event_type").orderBy("event_type")


@query(
    "events_hll_distinct_rollup",
    sql="""
    WITH h AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             md5(CAST(user_id AS VARCHAR)) AS hx
      FROM events
    ),
    rho AS (
      SELECT event_type, d,
             ('0x' || substr(hx, 1, 1))::BIGINT AS bucket,
             CASE WHEN ('0x' || substr(hx, 2, 12))::BIGINT = 0 THEN 49
                  ELSE CAST(log2(('0x' || substr(hx, 2, 12))::BIGINT
                                 & -(('0x' || substr(hx, 2, 12))::BIGINT))
                            AS INT) + 1
             END AS rho
      FROM h
    ),
    daily AS (
      SELECT event_type, d, bucket, max(rho) AS rho
      FROM rho GROUP BY 1, 2, 3
    ),
    merged AS (
      SELECT event_type, bucket, max(rho) AS rho
      FROM daily GROUP BY 1, 2
    ),
    agg AS (
      SELECT event_type,
             sum(pow(2, 48 - rho)) AS psum, count(*) AS nb
      FROM merged GROUP BY 1
    ),
    est AS (
      SELECT event_type, 16 - nb AS v,
             0.673 * 16 * 16 * CAST(281474976710656 AS DOUBLE)
               / (psum + (16 - nb) * CAST(281474976710656 AS DOUBLE)) AS raw
      FROM agg
    ),
    finals AS (
      SELECT event_type,
             CAST(floor(CASE WHEN raw <= 40 AND v > 0
                             THEN 16 * ln(16.0 / v) ELSE raw END)
                  AS BIGINT) AS approx_users,
             CAST(16 - nb AS INT) AS empty_registers
      FROM est JOIN agg USING (event_type)
    ),
    exact AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_users,
             count(DISTINCT date_trunc('day', ts)) AS n_days
      FROM events GROUP BY 1
    )
    SELECT f.event_type, f.approx_users, f.empty_registers,
           CAST(x.exact_users AS BIGINT) AS exact_users,
           CAST(x.n_days AS BIGINT) AS n_days
    FROM finals f JOIN exact x USING (event_type)
    ORDER BY event_type
    """,
    survey_ops="sketch(ext),D5",
    tables=("events",),
)
def events_hll_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register rollup with a FULL value oracle and the
    error readout alongside (operators/sketch.py hll_registers_md5 /
    hll_merge / hll_estimate_md5): registers, merge, harmonic sum, and
    the floored estimate all replay bit-exactly in DuckDB.

    r5 fix: this query previously hashed with the affine
    (22853*u+977) % P like the CMS family — but user ids are DENSE
    integers, and an affine map is monotone below the first wraparound,
    so register ranks came from an arithmetic progression instead of
    uniform bits (measured +79% bias at sf0.01: 268 vs 150 exact). The
    md5 rank source is the same one every other register sketch here
    uses; the affine variants remain in operators/sketch.py for the
    merge-property unit tests with the degeneracy documented.

    Two-level mergeable rollup: daily register tables (bounded at m=16
    rows per (type, day), map-side partial max) merged across days by
    groupBy-max, estimated once — the build-once / merge-cheap /
    never-rescan pattern that replaces exact COUNT(DISTINCT) at 100 TB.
    m=16 exercises the raw-estimator branch at the driver's sf0.01; at
    production lgK=12+ the same code path gives ~1.6% error. The exact
    count rides along to expose the sketch error honestly."""
    from esco_neo4j_spark.operators.sketch import (
        hll_estimate_md5, hll_merge, hll_registers_md5,
    )

    ev = spark.table("events").select(
        "event_type", F.date_trunc("day", "ts").alias("d"), "user_id"
    )
    daily = hll_registers_md5(ev, "user_id", ["event_type", "d"])
    merged = hll_merge(daily, ["event_type"])
    est = hll_estimate_md5(merged, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.countDistinct("d").alias("n_days"),
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            F.col("approx").alias("approx_users"),
            "empty_registers",
            F.col("exact_users").cast("bigint"),
            F.col("n_days").cast("bigint"),
        )
        .orderBy("event_type")
    )


@query(
    "events_cms_heavy_hitters",
    sql="""
    WITH hash_rows(j) AS (VALUES (0), (1), (2), (3)),
    build AS (
      SELECT r.j,
             ('0x' || substr(md5(CAST(r.j AS VARCHAR) || '-' ||
                                 CAST(e.user_id AS VARCHAR)), 1, 15))::BIGINT
               % 64 AS bucket,
             count(*) AS cnt
      FROM events e CROSS JOIN hash_rows r
      GROUP BY 1, 2
    ),
    keys AS (SELECT DISTINCT user_id FROM events),
    est AS (
      SELECT k.user_id, min(b.cnt) AS est
      FROM keys k CROSS JOIN hash_rows r
      JOIN build b
        ON b.j = r.j
       AND b.bucket = ('0x' || substr(md5(CAST(r.j AS VARCHAR) || '-' ||
                                          CAST(k.user_id AS VARCHAR)), 1, 15))::BIGINT
                      % 64
      GROUP BY 1
    ),
    exact AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
    SELECT e.user_id, CAST(e.est AS BIGINT) AS est_n,
           CAST(x.n AS BIGINT) AS exact_n
    FROM est e JOIN exact x USING (user_id)
    ORDER BY est_n DESC, user_id LIMIT 20
    """,
    survey_ops="sketch(ext),D2",
    tables=("events",),
)
def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a count-min sketch (operators/sketch.py): build
    the d=4 x w=64 sketch TABLE over events.user_id (bounded at 256 rows
    no matter the input size), estimate every candidate key by joining
    the broadcast sketch, rank by ESTIMATE and keep the top 20. The exact
    count rides along to expose the one-sided error (est >= exact always;
    the deliberately small width forces real collisions). Hash rows are
    md5(j || '-' || key) (r5 — the affine family collided identically
    across rows on dense ids, see operators/sketch.py:_bucket), so the
    DuckDB oracle reproduces every bucket — and therefore every
    estimate — exactly."""
    from esco_neo4j_spark.operators.sketch import cms_build, cms_estimate

    ev = spark.table("events")
    sketch = cms_build(ev, "user_id", width=64)
    keys = ev.select("user_id").distinct()
    est = cms_estimate(sketch, keys, "user_id", width=64)
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_n"))
    return (
        est.join(exact, "user_id")
        .select(
            "user_id",
            F.col("est").cast("bigint").alias("est_n"),
            F.col("exact_n").cast("bigint").alias("exact_n"),
        )
        .orderBy(F.desc("est_n"), "user_id")
        .limit(20)
    )


@query(
    "events_partition_pruned_week",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events)
    SELECT strftime(ts, '%Y-%m-%d') AS event_date,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(sum(value), 2) AS DOUBLE) AS total_value
    FROM ev
    WHERE ts >= TIMESTAMP '2024-01-08' AND ts < TIMESTAMP '2024-01-15'
    GROUP BY 1 ORDER BY 1
    """,
    survey_ops="layout(ext),B6,D2",
    tables=("events",),
)
def events_partition_pruned_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily totals for one week over the DATE-PARTITIONED events layout
    (sources/partitioned.py): the date predicate prunes at the directory
    level, so 7 of 30 partitions are listed and read — at 100 TB this is
    the difference between scanning a month and scanning a week. The
    DuckDB oracle computes the same week from the flat table, proving the
    re-layout lost/duplicated nothing. Plan-tested: PartitionFilters on
    the scan, exactly 7 files read (tests/test_plan_quality.py)."""
    from esco_neo4j_spark.sources.partitioned import events_by_date

    ev = events_by_date(spark, sf_dir)
    return (
        ev.filter(
            (F.col("event_date") >= "2024-01-08")
            & (F.col("event_date") < "2024-01-15")
        )
        .groupBy(F.date_format("event_date", "yyyy-MM-dd").alias("event_date"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("event_date")
    )


@query(
    "events_funnel",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    v AS (SELECT user_id, min(ts) AS t1 FROM ev WHERE event_type = 'view'
          GROUP BY user_id),
    c AS (SELECT e.user_id, min(e.ts) AS t2
          FROM ev e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts >= v.t1 GROUP BY e.user_id),
    p AS (SELECT e.user_id, min(e.ts) AS t3
          FROM ev e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts >= c.t2 GROUP BY e.user_id)
    SELECT 1 AS stage, 'view' AS step, CAST(count(*) AS BIGINT) AS n_users FROM v
    UNION ALL
    SELECT 2, 'view>click', CAST(count(*) AS BIGINT) FROM c
    UNION ALL
    SELECT 3, 'view>click>purchase', CAST(count(*) AS BIGINT) FROM p
    ORDER BY stage
    """,
    survey_ops="funnel(ext),C6,D2",
    tables=("events",),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel: users who viewed, then clicked AFTER the
    first view, then purchased AFTER that click. Each stage is one
    filtered min-aggregate joined to the previous stage's users — the
    min-chaining formulation, which shuffles only (user, ts) pairs per
    stage and never materializes per-user event sequences (the
    collect_list-then-scan alternative breaks on power users at 100 TB;
    this one is bounded by distinct users per stage)."""
    ev = spark.table("events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id").agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id").agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id").agg(F.min("ts").alias("t3"))
    )
    rows = [
        v.agg(F.lit(1).alias("stage"), F.lit("view").alias("step"),
              F.count("*").alias("n_users")),
        c.agg(F.lit(2).alias("stage"), F.lit("view>click").alias("step"),
              F.count("*").alias("n_users")),
        p.agg(F.lit(3).alias("stage"),
              F.lit("view>click>purchase").alias("step"),
              F.count("*").alias("n_users")),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("stage")


@query(
    "events_cohort_retention",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    first_seen AS (
      SELECT user_id,
             date_trunc('week', min(ts)) AS cohort_week
      FROM ev GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(date_diff('week', f.cohort_week,
                            date_trunc('week', e.ts)) AS INT) AS weeks_since
      FROM ev e JOIN first_seen f ON e.user_id = f.user_id
    )
    SELECT strftime(cohort_week, '%Y-%m-%d') AS cohort_week,
           weeks_since,
           CAST(count(*) AS BIGINT) AS n_active
    FROM activity
    GROUP BY 1, 2 ORDER BY 1, 2
    """,
    survey_ops="cohort(ext),E,D5",
    tables=("events",),
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, counted
    in each later week they were active. Two shuffles total (first-seen
    min per user, then the distinct (user, week) dedup) — the matrix
    itself is tiny however large the input. The weekly truncation uses
    ISO Monday weeks in both engines."""
    ev = spark.table("events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = (
        ev.join(first_seen, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.floor(
                    (
                        F.unix_timestamp(F.date_trunc("week", F.col("ts")))
                        - F.unix_timestamp(F.col("cohort_week"))
                    )
                    / (7 * 86400)
                ).cast("int")
            ).alias("weeks_since"),
        )
        .distinct()
    )
    return (
        activity.groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "weeks_since",
        )
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort_week", "weeks_since")
    )


@query(
    "events_value_quantiles_approx",
    sql="""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value)
               AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
    )
    SELECT event_type,
           CAST(round(max(CASE WHEN rn = CAST(ceil(0.50 * n) AS BIGINT)
                               THEN value END), 4) AS DOUBLE) AS p50,
           CAST(round(max(CASE WHEN rn = CAST(ceil(0.90 * n) AS BIGINT)
                               THEN value END), 4) AS DOUBLE) AS p90,
           CAST(round(max(CASE WHEN rn = CAST(ceil(0.99 * n) AS BIGINT)
                               THEN value END), 4) AS DOUBLE) AS p99,
           CAST(max(n) AS BIGINT) AS n
    FROM ranked
    GROUP BY event_type
    ORDER BY event_type
    """,
    survey_ops="sketch(ext),percentile(ext),D8",
    tables=("events",),
)
def events_value_quantiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate p50/p90/p99 of event value per type via
    percentile_approx (Greenwald-Khanna sketch): the MERGEABLE quantile
    path — no per-group sort, bounded sketch state per partition,
    map-side combinable — which is what replaces exact
    percentile_disc/quantile windows once groups stop fitting a partition
    (see ext_group_percentiles' scale note).

    Oracle story (round 5, closing the rows-only tail): below
    ``accuracy`` rows per group the GK summary is LOSSLESS, and Spark's
    query then returns exactly the ceil(q·n)-th order statistic
    (1-based) — verified empirically across types/quantiles including
    ties — so the estimate itself is value-oracled as an explicit
    rank pick. PRECONDITION: accuracy (1e6) > rows-per-group — the
    lossless regime holds through the sf1 audit scale; beyond it (true
    100 TB groups) the same plan degrades gracefully to rank error
    n/1e6, bounded by
    tests/test_sketches.py::test_approx_quantiles_within_rank_error.
    The identity itself (an undocumented Spark internal) is pinned
    directly in test_gk_lossless_regime_exact_rank_identity so a Spark
    upgrade fails loudly rather than silently breaking parity."""
    ev = spark.table("events")
    q = F.percentile_approx(
        "value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)), F.lit(1_000_000)
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(q[0], 4).alias("p50"),
            F.round(q[1], 4).alias("p90"),
            F.round(q[2], 4).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "events_gapfill_daily_locf",
    sql="""
    WITH daily AS (
      SELECT user_id, date_trunc('day', ts) AS day,
             count(*) AS n, round(sum(value), 2) AS v
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1
    ),
    spine AS (
      SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
      FROM span
    )
    SELECT s.user_id,
           strftime(s.day, '%Y-%m-%d') AS day,
           CAST(coalesce(d.n, 0) AS BIGINT) AS n_events,
           CAST(last_value(d.v IGNORE NULLS) OVER (
                  PARTITION BY s.user_id ORDER BY s.day
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS filled_value,
           CAST(d.n IS NULL AS INT) AS is_gap
    FROM spine s LEFT JOIN daily d
      ON s.user_id = d.user_id AND s.day = d.day
    ORDER BY s.user_id, s.day
    """,
    survey_ops="timeseries-gapfill(ext),E,C2",
    tables=("events",),
)
def events_gapfill_daily_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-filled rollup: bucket each user's events by
    day, synthesize the missing days of their observed lifespan from a
    generated time spine, and carry the last observed daily value forward
    (LOCF) across the gaps — time_bucket_gapfill + locf() re-expressed as
    sequence+explode plus a last(ignorenulls) window.

    Scale shape: the spine is generated per series key (user), so spine
    construction is embarrassingly parallel and sized by observed span,
    never the global calendar; the fill window partitions by the same key
    the daily rollup grouped on, so spine join + window share one
    user_id-hashed exchange, and no stage depends on a global sort."""
    ev = spark.table("events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("filled_value"),
            F.col("n").isNull().cast("int").alias("is_gap"),
        )
        .orderBy("user_id", "day")
    )


@query(
    "events_rolling_zscore",
    sql="""
    WITH w AS (
      SELECT event_id, user_id, ts, value,
             avg(value) OVER win AS mu,
             stddev_samp(value) OVER win AS sigma,
             count(*) OVER win AS n_win
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 168 HOUR PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
           CAST(round(value, 2) AS DOUBLE) AS value,
           CAST(round((value - mu) / sigma, 4) AS DOUBLE) AS zscore,
           CAST(n_win AS INT) AS n_win
    FROM w
    WHERE n_win >= 5 AND sigma > 0
      AND abs(round((value - mu) / sigma, 4)) >= 1.8
    ORDER BY user_id, event_id
    """,
    survey_ops="anomaly(ext),E,H10",
    tables=("events",),
)
def events_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection: each event's value scored
    against the trailing 7-day mean/stddev of the SAME user's events (a
    RANGE window keyed on event time, so irregular sampling is handled
    correctly — row-count frames would not be time-aligned). Events at
    least 1.8 sigma from their trailing mean, with at least 5
    observations in the window, are flagged; the membership test runs on
    the 4dp-ROUNDED score on both engines so a last-ulp stddev
    difference cannot flip a row in or out. (1.8, not the textbook 2:
    the synthetic values are ~uniform, which caps |z| near sqrt(3).)

    Scale shape: one hash exchange on user_id; within each series the
    range frame is computed by Spark's sliding frame machinery in a
    single pass — no self-join against the trailing window, which is the
    O(n * window) trap this operator family falls into when written as a
    theta join."""
    ev = spark.table("events")
    win = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-168 * 3600 * 1_000_000, 0)
    )
    mu = F.avg("value").over(win)
    sigma = F.stddev_samp("value").over(win)
    n_win = F.count("*").over(win)
    z = (F.col("value") - mu) / sigma
    return (
        ev.select(
            "event_id", "user_id", "ts", "value",
            mu.alias("mu"), sigma.alias("sigma"), n_win.alias("n_win"),
        )
        .filter(
            (F.col("n_win") >= 5)
            & (F.col("sigma") > 0)
            & (
                F.abs(
                    F.round(
                        (F.col("value") - F.col("mu")) / F.col("sigma"), 4
                    )
                )
                >= 1.8
            )
        )
        .select(
            "event_id", "user_id",
            F.date_format("ts", _FMT_SPARK).alias("ts"),
            F.round("value", 2).alias("value"),
            F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 4)
              .alias("zscore"),
            F.col("n_win").cast("int").alias("n_win"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "events_transition_matrix",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    counts AS (
      SELECT prev_type, event_type AS next_type, count(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, CAST(n AS BIGINT) AS n,
           CAST(round(n::DOUBLE / sum(n) OVER (PARTITION BY prev_type), 6)
                AS DOUBLE) AS p
    FROM counts
    ORDER BY prev_type, next_type
    """,
    survey_ops="sequence(ext),E,D2",
    tables=("events",),
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: lag() pairs consecutive events per user (ordered by ts with
    event_id as the deterministic tiebreak), then (prev, next) counts and
    row-normalized probabilities. The normalizing sum is a window over
    the tiny (type x type) count table, so the only corpus-sized shuffle
    is the per-user hash exchange the lag window needs — the same scale
    shape as sessionization, and the building block for clickstream
    next-step prediction and anomalous-path mining."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    counts = (
        ev.select(
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
    )
    norm = Window.partitionBy("prev_type")
    return (
        counts.select(
            "prev_type",
            "next_type",
            "n",
            F.round(
                F.col("n").cast("double") / F.sum("n").over(norm), 6
            ).alias("p"),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "events_winsorized_stats",
    sql="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    stats AS (
      SELECT event_type,
             quantile_cont(cents, 0.05) AS p05,
             quantile_cont(cents, 0.95) AS p95
      FROM c GROUP BY event_type
    ),
    clamped AS (
      SELECT c.event_type,
             CAST(round(least(greatest(c.cents, s.p05), s.p95) * 20)
                  AS BIGINT) AS micro
      FROM c JOIN stats s ON c.event_type = s.event_type
    )
    SELECT cl.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(s.p05 / 100.0, 4) AS DOUBLE) AS p05,
           CAST(round(s.p95 / 100.0, 4) AS DOUBLE) AS p95,
           CAST(sum(cl.micro) AS BIGINT) AS sum_micro,
           CAST(round(sum(cl.micro) / (count(*) * 2000.0), 4) AS DOUBLE)
             AS winsorized_mean
    FROM clamped cl JOIN stats s ON cl.event_type = s.event_type
    GROUP BY cl.event_type, s.p05, s.p95
    ORDER BY cl.event_type
    """,
    survey_ops="robust-stats(ext),D8,C1",
    tables=("events",),
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (outlier-clamped) robust mean per event type: exact
    p05/p95 percentiles per group, broadcast back onto the rows, values
    clamped into the band, then re-aggregated. Every summed quantity is
    an exact INTEGER: values quantize to cents, and the interpolated
    percentiles land on 1/20-cent rationals (q=0.05 on integer cents),
    so scaling by 20 restores integrality — the winsorized mean is then
    one exact integer division, immune to float summation order. Scale
    shape: group-stats table is type-cardinality-bounded and broadcast;
    the rows shuffle once for the final partial-agg groupBy. At 100 TB
    swap the exact percentile for percentile_approx and keep the rest."""
    ev = spark.table("events")
    c = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    stats = c.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.05)").alias("p05"),
        F.expr("percentile(cents, 0.95)").alias("p95"),
    )
    micro = F.round(
        F.least(F.greatest(F.col("cents").cast("double"), F.col("p05")),
                F.col("p95")) * 20
    ).cast("bigint")
    return (
        c.join(F.broadcast(stats), "event_type")
        .select("event_type", "p05", "p95", micro.alias("micro"))
        .groupBy("event_type", "p05", "p95")
        .agg(
            F.count("*").alias("n"),
            F.sum("micro").cast("bigint").alias("sum_micro"),
        )
        .select(
            "event_type",
            "n",
            F.round(F.col("p05") / 100.0, 4).alias("p05"),
            F.round(F.col("p95") / 100.0, 4).alias("p95"),
            "sum_micro",
            F.round(
                F.col("sum_micro") / (F.col("n") * F.lit(2000.0)), 4
            ).alias("winsorized_mean"),
        )
        .orderBy("event_type")
    )


@query(
    "events_attribution_left",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events)
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
    FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM ev WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 600 SECOND AND p.ts
    ORDER BY purchase_id, click_id NULLS FIRST
    """,
    survey_ops="J(ext),range-join(ext),C8",
    tables=("events",),
)
def events_attribution_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming.interval_join_left: purchases with their
    attributed clicks, plus an explicit null row for UNATTRIBUTED
    purchases. Scale-safe shape: the matched pairs come from the same
    banded (user_id, time-bucket) equi-join as events_interval_join; the
    unmatched purchases come from a LEFT ANTI join against the matched
    purchase-id set (hash join on a key whose cardinality is bounded by
    the purchase count) — at no point does a raw range predicate drive
    the join. The DuckDB oracle plans the naive LEFT JOIN natively."""
    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
        F.floor(F.unix_micros("ts") / 600_000_000).alias("bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    probed = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.unix_micros("p_ts") / 600_000_000) - 1,
                F.floor(F.unix_micros("p_ts") / 600_000_000),
            )
        ),
    )
    gap = F.unix_micros("p_ts") - F.unix_micros("c_ts")
    matched = (
        probed.join(clicks, ["user_id", "bucket"])
        .filter((gap >= 0) & (gap <= 600_000_000))
        .select("purchase_id", "click_id", "user_id", gap.alias("gap_us"))
    )
    unmatched = (
        purchases.join(
            matched.select("purchase_id"), "purchase_id", "left_anti"
        )
        .select(
            "purchase_id",
            F.lit(None).cast("bigint").alias("click_id"),
            "user_id",
            F.lit(None).cast("bigint").alias("gap_us"),
        )
    )
    return matched.unionByName(unmatched).orderBy(
        "purchase_id", F.asc_nulls_first("click_id")
    )


@query(
    "events_activity_streaks",
    sql="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    isl AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (PARTITION BY user_id
                                           ORDER BY day) AS INT) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, CAST(count(*) AS INT) AS streak_days,
             min(day) AS streak_start, max(day) AS streak_end
      FROM isl GROUP BY user_id, grp
    )
    SELECT user_id, streak_days,
           strftime(streak_start, '%Y-%m-%d') AS streak_start,
           strftime(streak_end, '%Y-%m-%d') AS streak_end
    FROM streaks
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY streak_days DESC, streak_start) = 1
    ORDER BY user_id
    """,
    survey_ops="gaps-islands(ext),E,D2",
    tables=("events",),
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands pattern: distinct active days, island key = day
    minus row_number (consecutive days share it), count per island, keep
    each user's longest (earliest start on ties). Both windows partition
    by user_id, so the whole query rides ONE hash exchange; island keys
    are exact date arithmetic — nothing floats. The engagement metric
    behind retention dashboards, and the shape behind uptime/outage
    interval reports."""
    ev = spark.table("events")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    isl = days.withColumn(
        "grp", F.date_sub(F.col("day"), F.row_number().over(w))
    )
    streaks = isl.groupBy("user_id", "grp").agg(
        F.count("*").cast("int").alias("streak_days"),
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
    )
    pick = Window.partitionBy("user_id").orderBy(
        F.desc("streak_days"), F.asc("streak_start")
    )
    return (
        streaks.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "streak_days",
            F.date_format("streak_start", "yyyy-MM-dd").alias("streak_start"),
            F.date_format("streak_end", "yyyy-MM-dd").alias("streak_end"),
        )
        .orderBy("user_id")
    )


@query(
    "events_scd2_intervals",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events)
    SELECT user_id,
           event_type AS state,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
           coalesce(strftime(lead(ts) OVER w, '%Y-%m-%d %H:%M:%S'),
                    '9999-12-31 00:00:00') AS valid_to,
           CAST(lead(ts) OVER w IS NULL AS BOOLEAN) AS is_current
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    QUALIFY user_id < 20
    ORDER BY user_id, valid_from, state
    """,
    survey_ops="scd2(ext),E,H10",
    tables=("events",),
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: each user's change events
    become half-open validity intervals via lead() over (ts, event_id) —
    valid_to is the next change's timestamp, the open interval gets the
    conventional 9999-12-31 sentinel and is flagged current. One hash
    exchange on user_id; this is how an event log becomes a point-in-
    time-joinable dimension table (pair with ext_asof_join to query it).
    Output restricted to 20 users to keep the driver compare bounded."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        ev.filter(F.col("user_id") < 20)
        .select(
            "user_id",
            F.col("event_type").alias("state"),
            F.date_format("ts", _FMT_SPARK).alias("valid_from"),
            F.coalesce(
                F.date_format(nxt, _FMT_SPARK), F.lit("9999-12-31 00:00:00")
            ).alias("valid_to"),
            nxt.isNull().alias("is_current"),
        )
        .orderBy("user_id", "valid_from", "state")
    )


@query(
    "events_mad_dispersion",
    sql="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(cents, 0.5) AS med_cents
      FROM c GROUP BY event_type
    ),
    dev AS (
      SELECT c.event_type,
             CAST(round(abs(c.cents - m.med_cents) * 2) AS BIGINT) AS half_dev
      FROM c JOIN med m ON c.event_type = m.event_type
    )
    SELECT d.event_type,
           CAST(round(m.med_cents / 100.0, 4) AS DOUBLE) AS median_value,
           CAST(round(quantile_cont(d.half_dev, 0.5) / 200.0, 4) AS DOUBLE)
             AS mad_value
    FROM dev d JOIN med m ON d.event_type = m.event_type
    GROUP BY d.event_type, m.med_cents
    ORDER BY d.event_type
    """,
    survey_ops="robust-stats(ext),D8,C1",
    tables=("events",),
)
def events_mad_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per event type — the robust dispersion
    companion to events_winsorized_stats: median of |value - median|.
    Same integrality discipline: values quantize to cents; the group
    median lands on half-cents (quantile of integers), so deviations
    double to exact integers BEFORE the second quantile — both medians
    are then single interpolated values with no order-sensitive float
    sum anywhere. Broadcast-joined group medians; two corpus exchanges
    (the two groupBys). At 100 TB use percentile_approx twice."""
    ev = spark.table("events")
    c = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    med = c.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med_cents")
    )
    dev = (
        c.join(F.broadcast(med), "event_type")
        .select(
            "event_type",
            "med_cents",
            F.round(F.abs(F.col("cents") - F.col("med_cents")) * 2)
            .cast("bigint")
            .alias("half_dev"),
        )
    )
    return (
        dev.groupBy("event_type", "med_cents")
        .agg(F.expr("percentile(half_dev, 0.5)").alias("mad_half"))
        .select(
            "event_type",
            F.round(F.col("med_cents") / 100.0, 4).alias("median_value"),
            F.round(F.col("mad_half") / 200.0, 4).alias("mad_value"),
        )
        .orderBy("event_type")
    )


@query(
    "events_session_window_native",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    ordered AS (
      SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM ev
    ),
    flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN prev_ts IS NULL
                       OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1 ELSE 0 END
               AS new_s
      FROM ordered
    ),
    sess AS (
      SELECT user_id, ts, value,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
             AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
    survey_ops="J(ext),E(ext)",
    tables=("events",),
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session rows via Spark's NATIVE session_window (30-minute
    gap): the JVM-side merging-interval aggregation that runs unchanged
    under Structured Streaming — the scale path next to the
    applyInPandasWithState sessionizer (streaming/events.py), which
    exists for CUSTOM per-session logic. Session end is last event +
    gap, Spark's convention, mirrored in the oracle; values sum as
    integer cents. The oracle derives the same sessions independently
    via the lag >= gap island method."""
    ev = spark.table("events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("sum_cents"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", _FMT_SPARK)
            .alias("session_start"),
            F.date_format("session_window.end", _FMT_SPARK)
            .alias("session_end"),
            "n_events",
            "sum_cents",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "events_ab_test_lift",
    sql="""
    WITH assigned AS (
      SELECT event_type,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 7))::BIGINT % 2
               AS variant,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    agg AS (
      SELECT event_type,
             sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n_a,
             sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n_b,
             sum(CASE WHEN variant = 0 THEN cents ELSE 0 END) AS sum_a,
             sum(CASE WHEN variant = 1 THEN cents ELSE 0 END) AS sum_b,
             sum(CASE WHEN variant = 0 THEN cents * cents ELSE 0 END) AS ssq_a,
             sum(CASE WHEN variant = 1 THEN cents * cents ELSE 0 END) AS ssq_b
      FROM assigned GROUP BY event_type
    )
    SELECT event_type,
           CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           CAST(round(sum_a / (n_a * 100.0), 4) AS DOUBLE) AS mean_a,
           CAST(round(sum_b / (n_b * 100.0), 4) AS DOUBLE) AS mean_b,
           CAST(round((sum_b / CAST(n_b AS DOUBLE))
                      / (sum_a / CAST(n_a AS DOUBLE)) - 1.0, 6) AS DOUBLE)
             AS lift,
           CAST(round(
             (sum_b / CAST(n_b AS DOUBLE) - sum_a / CAST(n_a AS DOUBLE))
             / sqrt(
                 (ssq_a - sum_a * (sum_a / CAST(n_a AS DOUBLE)))
                   / (n_a - 1) / n_a
               + (ssq_b - sum_b * (sum_b / CAST(n_b AS DOUBLE)))
                   / (n_b - 1) / n_b
               ), 4) AS DOUBLE) AS z_stat
    FROM agg
    ORDER BY event_type
    """,
    survey_ops="ab-test(ext),D8",
    tables=("events",),
)
def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout per metric (event type): deterministic
    50/50 assignment from a user-id hash (the same stable-bucket device
    as the stratified sampler — users keep their arm across sessions and
    tables), then per-arm mean, relative lift, and Welch z-statistic.
    Everything aggregated is an exact integer (counts, cent sums, cent
    sums-of-squares), partial-aggregable map-side; the float arithmetic
    runs once per (metric, arm) scalar on both engines in the same
    written order, so 4-6dp rounding is deterministic. One corpus
    exchange on event_type."""
    ev = spark.table("events")
    variant = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 7), 16, 10)
        .cast("bigint") % 2
    )
    cents = F.round(F.col("value") * 100).cast("bigint")
    a = ev.select("event_type", variant.alias("variant"), cents.alias("cents"))
    agg = a.groupBy("event_type").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("variant") == 0, F.col("cents")).otherwise(0)).alias("sum_a"),
        F.sum(F.when(F.col("variant") == 1, F.col("cents")).otherwise(0)).alias("sum_b"),
        # decimal(38,0) sums: exact integers with 1e38 headroom — the
        # int64 square-sum overflow class the sf1 audit caught in
        # ext_pearson_corr (DuckDB sums BIGINT as HUGEINT already)
        F.sum(
            F.when(F.col("variant") == 0, F.col("cents") * F.col("cents"))
            .otherwise(0).cast("decimal(38,0)")
        ).alias("ssq_a"),
        F.sum(
            F.when(F.col("variant") == 1, F.col("cents") * F.col("cents"))
            .otherwise(0).cast("decimal(38,0)")
        ).alias("ssq_b"),
    )
    mean_a_c = F.col("sum_a") / F.col("n_a").cast("double")
    mean_b_c = F.col("sum_b") / F.col("n_b").cast("double")
    var_term = (
        (F.col("ssq_a") - F.col("sum_a") * mean_a_c)
        / (F.col("n_a") - 1) / F.col("n_a")
        + (F.col("ssq_b") - F.col("sum_b") * mean_b_c)
        / (F.col("n_b") - 1) / F.col("n_b")
    )
    return (
        agg.select(
            "event_type",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(F.col("sum_a") / (F.col("n_a") * 100.0), 4).alias("mean_a"),
            F.round(F.col("sum_b") / (F.col("n_b") * 100.0), 4).alias("mean_b"),
            F.round(mean_b_c / mean_a_c - 1.0, 6).alias("lift"),
            F.round((mean_b_c - mean_a_c) / F.sqrt(var_term), 4).alias("z_stat"),
        )
        .orderBy("event_type")
    )


@query(
    "events_first_touch_attribution",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events)
    SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
           CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
    FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM ev WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL 600 SECOND AND p.ts
    QUALIFY row_number() OVER (PARTITION BY p.event_id
                               ORDER BY c.ts, c.event_id) = 1
    ORDER BY purchase_id
    """,
    survey_ops="J(ext),E,range-join(ext)",
    tables=("events",),
)
def events_first_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-touch attribution: each purchase credited to its EARLIEST
    click in the window (event_id tiebreak) — the argmin-per-group cut
    of the all-touch interval join. Candidates come from the same
    banded (user, bucket) equi-join; the argmin is a per-purchase window
    over the already-tiny matched set. Completes the attribution trio:
    all-touch (events_interval_join), unattributed-aware left outer
    (events_attribution_left), first-touch (here); swap the window order
    for last-touch."""
    ev = spark.table("events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("c_ts"),
        F.floor(F.unix_micros("ts") / 600_000_000).alias("bucket"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.explode(
            F.array(
                F.floor(F.unix_micros("ts") / 600_000_000) - 1,
                F.floor(F.unix_micros("ts") / 600_000_000),
            )
        ).alias("bucket"),
    )
    gap = F.unix_micros("p_ts") - F.unix_micros("c_ts")
    matched = (
        purchases.join(clicks, ["user_id", "bucket"])
        .filter((gap >= 0) & (gap <= 600_000_000))
        .select("purchase_id", "click_id", "user_id", "c_ts", gap.alias("gap_us"))
    )
    w = Window.partitionBy("purchase_id").orderBy("c_ts", "click_id")
    return (
        matched.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "click_id", "user_id", "gap_us")
        .orderBy("purchase_id")
    )


@query(
    "events_ols_trend",
    sql="""
    WITH p AS (
      SELECT event_type,
             CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
                  AS BIGINT) AS x,
             CAST(round(value * 100) AS BIGINT) AS y
      FROM events
    ),
    s AS (
      SELECT event_type, count(*) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(x * y) AS sxy
      FROM p GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0, 6)
             AS DOUBLE) AS slope_per_day,
           CAST(round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 4)
             AS DOUBLE) AS mean_value
    FROM s ORDER BY event_type
    """,
    survey_ops="stats-ols(ext),D8,H10",
    tables=("events",),
)
def events_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric OLS trend: value regressed on days-since-epoch-start —
    the drift detector behind every metric dashboard. Same power-sum
    discipline as ext_pearson_corr: integer sums aggregate exactly, the
    slope is one scalar double expression per group. x is an integer
    day index and y integer cents, so nothing floats until the final
    division."""
    ev = spark.table("events")
    p = ev.select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
        F.round(F.col("value") * 100).cast("bigint").alias("y"),
    )
    s = p.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")
    slope = (d("n") * d("sxy") - d("sx") * d("sy")) / (
        d("n") * d("sxx") - d("sx") * d("sx")
    )
    return (
        s.select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.round(slope / 100.0, 6).alias("slope_per_day"),
            F.round(d("sy") / d("n") / 100.0, 4).alias("mean_value"),
        )
        .orderBy("event_type")
    )


@query(
    "events_benford_digits",
    sql="""
    WITH c AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
      WHERE round(value * 100) >= 1
    )
    SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(count(*)::DOUBLE
                / sum(count(*)) OVER (), 6) AS DOUBLE) AS freq
    FROM c GROUP BY 1 ORDER BY 1
    """,
    survey_ops="data-quality(ext),D2,H9",
    tables=("events",),
)
def events_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-digit distribution of transaction values — the Benford's-
    law fraud/data-quality screen (fabricated or truncated numeric
    columns deviate hard from the expected log distribution). The digit
    comes from STRING slicing of the integer cents, not log10 — exact on
    both engines; the frequency normalizer is a window over the 9-row
    digit table. (This synthetic corpus's ~uniform values won't follow
    Benford — the point is the screen itself, which flags exactly
    that.)"""
    ev = spark.table("events")
    c = ev.select(
        F.round(F.col("value") * 100).cast("bigint").alias("cents")
    ).filter(F.col("cents") >= 1)
    digit = F.substring(F.col("cents").cast("string"), 1, 1).cast("int")
    counts = c.groupBy(digit.alias("digit")).agg(F.count("*").alias("n"))
    w = Window.partitionBy()
    return (
        counts.select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.sum("n").over(w), 6).alias(
                "freq"
            ),
        )
        .orderBy("digit")
    )


@query(
    "events_week_over_week",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    weekly AS (
      SELECT event_type,
             date_trunc('week', CAST(ts AS DATE)) AS week,
             count(*) AS n,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM ev GROUP BY 1, 2
    )
    SELECT event_type,
           strftime(week, '%Y-%m-%d') AS week,
           CAST(n AS BIGINT) AS n,
           CAST(lag(n) OVER w AS BIGINT) AS prev_n,
           CAST(n - lag(n) OVER w AS BIGINT) AS delta_n,
           CAST(round((cents - lag(cents) OVER w) / 100.0, 2) AS DOUBLE)
             AS delta_value
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY week)
    ORDER BY event_type, week
    """,
    survey_ops="wow(ext),E,H10",
    tables=("events",),
)
def events_week_over_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week movement per metric: weekly rollup (integer cents)
    then lag deltas — the top-movers table behind every ops review.
    Weekly grain makes the window input type-cardinality x weeks sized,
    so the lag window is effectively free; the only corpus exchange is
    the rollup. Monday-start weeks via date_trunc on both engines."""
    ev = spark.table("events")
    weekly = ev.groupBy(
        "event_type",
        F.date_trunc("week", F.to_date("ts")).alias("week"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("week")
    return (
        weekly.select(
            "event_type",
            F.date_format("week", "yyyy-MM-dd").alias("week"),
            F.col("n").cast("bigint").alias("n"),
            F.lag("n").over(w).cast("bigint").alias("prev_n"),
            (F.col("n") - F.lag("n").over(w)).cast("bigint").alias("delta_n"),
            F.round(
                (F.col("cents") - F.lag("cents").over(w)) / 100.0, 2
            ).alias("delta_value"),
        )
        .orderBy("event_type", "week")
    )


@query(
    "events_transition_dwell",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    seq AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER w AS prev_type,
             lag(ts) OVER w AS prev_ts
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(epoch_us(ts) - epoch_us(prev_ts)) AS BIGINT)
             AS total_dwell_us,
           CAST(round(sum(epoch_us(ts) - epoch_us(prev_ts))
                      / (count(*) * 1000000.0), 4) AS DOUBLE)
             AS avg_dwell_s
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
    survey_ops="sequence(ext),E,D8",
    tables=("events",),
)
def events_transition_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timed transition matrix: how long users dwell before each
    (prev -> next) step — the latency companion to
    events_transition_matrix (think 'median time from click to
    purchase' per path edge). Dwell gaps aggregate as exact integer
    microseconds; the average is one division per (prev, next) cell.
    Same single user_id exchange as every lag-window op."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "dwell_us"
        ),
    ).filter(F.col("prev_type").isNotNull())
    return (
        seq.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("dwell_us").cast("bigint").alias("total_dwell_us"),
        )
        .select(
            "prev_type",
            "next_type",
            "n",
            "total_dwell_us",
            F.round(
                F.col("total_dwell_us") / (F.col("n") * 1_000_000.0), 4
            ).alias("avg_dwell_s"),
        )
        .orderBy("prev_type", "next_type")
    )


@query(
    "events_pareto_concentration",
    sql="""
    WITH per_user AS (
      SELECT user_id,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT user_id, cents,
             sum(cents) OVER (ORDER BY cents DESC, user_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND CURRENT ROW) AS cum_cents,
             sum(cents) OVER () AS total_cents,
             row_number() OVER (ORDER BY cents DESC, user_id) AS rk,
             count(*) OVER () AS n_users
      FROM per_user
    )
    SELECT CAST(min(rk) AS BIGINT) AS users_for_80pct,
           CAST(max(n_users) AS BIGINT) AS n_users,
           CAST(round(min(rk)::DOUBLE / max(n_users), 6) AS DOUBLE)
             AS user_fraction
    FROM ranked
    WHERE cum_cents * 10 >= total_cents * 8
    """,
    survey_ops="pareto(ext),E,D8",
    tables=("events",),
)
def events_pareto_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration: how many top users generate 80% of total
    value — the whale-curve number behind capacity planning and abuse
    review. The windows run over the PER-USER aggregate (dimension-
    sized, not the event corpus: the events exchange is the rollup);
    the 80% membership test is exact integer arithmetic
    (cum*10 >= total*8), so no float boundary can flip the cutoff
    user."""
    ev = spark.table("events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
    )
    w_cum = (
        Window.orderBy(F.desc("cents"), F.asc("user_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy()
    ranked = per_user.select(
        F.sum("cents").over(w_cum).alias("cum_cents"),
        F.sum("cents").over(w_all).alias("total_cents"),
        F.row_number().over(
            Window.orderBy(F.desc("cents"), F.asc("user_id"))
        ).alias("rk"),
        F.count("*").over(w_all).alias("n_users"),
    )
    return (
        ranked.filter(
            F.col("cum_cents") * 10 >= F.col("total_cents") * 8
        )
        .agg(
            F.min("rk").cast("bigint").alias("users_for_80pct"),
            F.max("n_users").cast("bigint").alias("n_users"),
        )
        .select(
            "users_for_80pct",
            "n_users",
            F.round(
                F.col("users_for_80pct").cast("double") / F.col("n_users"), 6
            ).alias("user_fraction"),
        )
    )


@query(
    "events_calendar_heatmap",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events)
    SELECT CAST(dayofweek(ts) + 1 AS INT) AS dow,
           CAST(hour(ts) AS INT) AS hour,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS cents
    FROM ev GROUP BY 1, 2 ORDER BY 1, 2
    """,
    survey_ops="H10,D2,calendar(ext)",
    tables=("events",),
)
def events_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week x hour activity heatmap — the calendar rollup behind
    load planning and anomaly baselines (compare a live hour against its
    (dow, hour) cell). One partial-agg exchange onto a 7x24-bounded
    result. Dialect trap worth pinning: Spark's dayofweek is 1-based
    (Sunday=1) while DuckDB's is 0-based (Sunday=0) — the oracle
    applies +1."""
    ev = spark.table("events")
    return (
        ev.groupBy(
            F.dayofweek("ts").cast("int").alias("dow"),
            F.hour("ts").cast("int").alias("hour"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
        .orderBy("dow", "hour")
    )


@query(
    "events_interarrival_hist",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id))
               AS gap_us
      FROM ev
    ),
    bucketed AS (
      SELECT CAST(length(bin(gap_us)) - 1 AS INT) AS log2_bucket
      FROM gaps WHERE gap_us IS NOT NULL AND gap_us > 0
    )
    SELECT log2_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(round(power(2.0, log2_bucket) / 1000000.0, 3) AS DOUBLE)
             AS bucket_floor_s
    FROM bucketed GROUP BY log2_bucket ORDER BY log2_bucket
    """,
    survey_ops="interarrival(ext),E,D2",
    tables=("events",),
)
def events_interarrival_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution on log2 buckets — the burstiness
    profile behind rate limiting and capacity planning (a bimodal shape
    = sessions within bursts). The bucket index is floor(log2(gap)) but
    computed EXACTLY as length(bin(gap)) - 1 — the binary-string length
    trick — because float log2 at a power-of-two boundary can land on
    either side depending on the libm; both engines agree on string
    length by construction. One lag-window exchange on user_id, output
    bounded by ~40 buckets."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias(
            "gap_us"
        )
    ).filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    bucket = (F.length(F.bin("gap_us")) - 1).cast("int")
    return (
        gaps.groupBy(bucket.alias("log2_bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            "log2_bucket",
            "n",
            F.round(
                F.pow(F.lit(2.0), F.col("log2_bucket")) / 1_000_000.0, 3
            ).alias("bucket_floor_s"),
        )
        .orderBy("log2_bucket")
    )


@query(
    "events_peak_concurrency",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    ordered AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_ts
      FROM ev
    ),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR epoch(ts) - epoch(prev_ts) >= 1800 THEN 1 ELSE 0 END
               AS new_s
      FROM ordered
    ),
    sess AS (
      SELECT user_id, min(ts) AS s_start,
             max(ts) + INTERVAL 30 MINUTE AS s_end
      FROM (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
      ) GROUP BY user_id, sid
    ),
    bounds AS (
      SELECT s_start AS t, 1 AS delta FROM sess
      UNION ALL SELECT s_end, -1 FROM sess
    ),
    swept AS (
      SELECT t, sum(delta) OVER (ORDER BY t, delta DESC
                                 ROWS UNBOUNDED PRECEDING) AS live
      FROM bounds
    )
    SELECT CAST(max(live) AS BIGINT) AS peak_concurrency,
           strftime(min(t) FILTER (WHERE live = (SELECT max(live) FROM swept)),
                    '%Y-%m-%d %H:%M:%S') AS first_peak_at
    FROM swept
    """,
    survey_ops="sweep-line(ext),E,J(ext)",
    tables=("events",),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions — the capacity-planning number: derive
    30-min-gap sessions (same islands as the session_window twin), then
    a classic sweep line: +1 at each start, -1 at each end (+gap), and
    the max of the running sum. Tie rule pinned: starts sort before ends
    at the same instant (delta DESC), so a back-to-back handoff counts
    as overlapping. The sweep's total-order window runs over the
    session-BOUNDARY table (two rows per session — dimension-sized, not
    the event corpus); at 100x bucket the sweep by day and carry
    per-bucket offsets, the same two-level trick as the global
    shuffle."""
    ev = spark.table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_seconds(F.col("ts"))
                - F.unix_seconds(F.lag("ts").over(w))
                >= 1800
            ),
            1,
        ).otherwise(0).alias("new_s"),
    )
    sid_w = (
        Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = (
        flagged.withColumn("sid", F.sum("new_s").over(sid_w))
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("s_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("s_end"),
        )
    )
    bounds = sess.select(F.col("s_start").alias("t"), F.lit(1).alias("delta")).union(
        sess.select(F.col("s_end").alias("t"), F.lit(-1).alias("delta"))
    )
    sweep_w = (
        Window.orderBy("t", F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    swept = bounds.select("t", F.sum("delta").over(sweep_w).alias("live"))
    mx = swept.agg(F.max("live").alias("peak"))
    return (
        swept.crossJoin(F.broadcast(mx))
        .filter(F.col("live") == F.col("peak"))
        .groupBy("peak")
        .agg(F.min("t").alias("first_peak"))
        .select(
            F.col("peak").cast("bigint").alias("peak_concurrency"),
            F.date_format("first_peak", _FMT_SPARK).alias("first_peak_at"),
        )
    )


@query(
    "events_autocorr_daily",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM ev GROUP BY 1, 2
    ),
    lagged AS (
      SELECT event_type, cents AS y,
             lag(cents) OVER (PARTITION BY event_type ORDER BY day) AS x
      FROM daily
    ),
    s AS (
      SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM lagged WHERE x IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n_days,
           CAST(round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS DOUBLE) AS autocorr_lag1
    FROM s ORDER BY event_type
    """,
    survey_ops="stats-autocorr(ext),E,D8",
    tables=("events",),
)
def events_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each metric's daily total — the
    persistence/seasonality diagnostic (white noise ~ 0, trending or
    weekly-cyclic series deviate) that decides whether yesterday
    predicts today before anyone fits a forecaster. Daily rollup in
    integer cents, lag pairs per type, then the exact power-sum Pearson
    tail — three dimension-sized stages after the one corpus rollup."""
    ev = spark.table("events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily.select(
        "event_type",
        F.col("cents").alias("y"),
        F.lag("cents").over(w).alias("x"),
    ).filter(F.col("x").isNotNull())
    s = lagged.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    return s.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.round(num / den, 6).alias("autocorr_lag1"),
    ).orderBy("event_type")


@query(
    "events_cusum_changepoint",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM ev GROUP BY 1, 2
    ),
    scaled AS (
      SELECT event_type, day,
             count(*) OVER (PARTITION BY event_type) AS n,
             cents * count(*) OVER (PARTITION BY event_type)
               - sum(cents) OVER (PARTITION BY event_type) AS d
      FROM daily
    ),
    pref AS (
      SELECT event_type, day, n,
             sum(d) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS p
      FROM scaled
    ),
    cus AS (
      SELECT event_type, day, n,
             p - least(0, min(p) OVER (PARTITION BY event_type ORDER BY day
                                       ROWS UNBOUNDED PRECEDING)) AS s_up,
             greatest(0, max(p) OVER (PARTITION BY event_type ORDER BY day
                                      ROWS UNBOUNDED PRECEDING)) - p AS s_dn
      FROM pref
    ),
    ranked AS (
      SELECT event_type, day, n, s_up, s_dn,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY s_up DESC, day) AS r_up,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY s_dn DESC, day) AS r_dn
      FROM cus
    )
    SELECT u.event_type,
           strftime(u.day, '%Y-%m-%d') AS up_alarm_day,
           CAST(round(u.s_up / (100.0 * u.n), 4) AS DOUBLE) AS up_drift,
           strftime(d.day, '%Y-%m-%d') AS down_alarm_day,
           CAST(round(d.s_dn / (100.0 * d.n), 4) AS DOUBLE) AS down_drift
    FROM ranked u JOIN ranked d
      ON u.event_type = d.event_type AND u.r_up = 1 AND d.r_dn = 1
    ORDER BY u.event_type
    """,
    survey_ops="changepoint(ext),E,D8",
    tables=("events",),
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection over each metric's daily series — the
    standard drift alarm (Page 1954) for data-quality monitoring: "did
    this feed's level shift, and on which day?". The textbook recurrence
    S_t = max(0, S_{t-1} + (x_t - target)) is a non-associative scan, so
    instead we use the exact identity S_t = P_t - min(0, min_{j<=t} P_j)
    with P the prefix sum of deviations — two window passes over the SAME
    (event_type ORDER BY day) sort, i.e. one exchange + one sort total.
    Deviations are scaled by n (d_t = n*cents_t - total) so everything
    stays in exact integer cents*n units; the mean never appears as a
    float. Mirror statistic high-water-mark - P_t alarms downward shifts.
    Daily rollup first means window state is days-per-series, not raw
    events — scale-safe at 100 TB."""
    ev = spark.table("events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    wp = Window.partitionBy("event_type")
    wo = wp.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    scaled = daily.select(
        "event_type",
        "day",
        F.count("*").over(wp).alias("n"),
        (F.col("cents") * F.count("*").over(wp) - F.sum("cents").over(wp)).alias("d"),
    )
    pref = scaled.withColumn("p", F.sum("d").over(wo))
    cus = pref.select(
        "event_type",
        "day",
        "n",
        (F.col("p") - F.least(F.lit(0), F.min("p").over(wo))).alias("s_up"),
        (F.greatest(F.lit(0), F.max("p").over(wo)) - F.col("p")).alias("s_dn"),
    )
    ranked = cus.select(
        "event_type",
        "day",
        "n",
        "s_up",
        "s_dn",
        F.row_number().over(wp.orderBy(F.desc("s_up"), F.asc("day"))).alias("r_up"),
        F.row_number().over(wp.orderBy(F.desc("s_dn"), F.asc("day"))).alias("r_dn"),
    )
    up = ranked.filter(F.col("r_up") == 1).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("up_alarm_day"),
        F.round(F.col("s_up") / (100.0 * F.col("n")), 4).alias("up_drift"),
    )
    dn = ranked.filter(F.col("r_dn") == 1).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("down_alarm_day"),
        F.round(F.col("s_dn") / (100.0 * F.col("n")), 4).alias("down_drift"),
    )
    return up.join(dn, "event_type").orderBy("event_type")


@query(
    "events_kmv_distinct_rollup",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events),
    h AS (
      SELECT DISTINCT event_type, CAST(ts AS DATE) AS d,
             ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM ev
    ),
    daily AS (
      SELECT event_type, d, h,
             row_number() OVER (PARTITION BY event_type, d ORDER BY h) AS r
      FROM h
    ),
    pooled AS (
      SELECT DISTINCT event_type, h FROM daily WHERE r <= 64
    ),
    merged AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
      FROM pooled
    ),
    agg AS (
      SELECT event_type, count(*) AS cnt, max(h) AS hk
      FROM merged WHERE r <= 64 GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, count(DISTINCT user_id) AS exact_users
      FROM ev GROUP BY event_type
    )
    SELECT a.event_type,
           CAST(CASE WHEN a.cnt < 64 THEN a.cnt
                     ELSE floor(63.0 * CAST(1152921504606846976 AS DOUBLE)
                                / a.hk) END AS BIGINT)
             AS approx_users,
           CAST(x.exact_users AS BIGINT) AS exact_users
    FROM agg a JOIN exact x USING (event_type)
    ORDER BY a.event_type
    """,
    survey_ops="sketch(ext),D5,E",
    tables=("events",),
)
def events_kmv_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al.) — the fourth
    member of the mergeable-sketch family (CMS / Bloom / HLL / KMV) and
    the one whose state is pure ORDER STATISTICS: keep the k=64 smallest
    distinct arithmetic hash values, estimate distinct = (k-1)*M/h_(k).
    Mergeability is set union + re-take-k-smallest, shown by the same
    two-level rollup as the HLL query: bounded 64-row daily registers,
    pooled across days, estimated once. Fewer than k values means the
    sketch IS the exact distinct set — the estimate degrades to exact,
    handled by the CASE. Everything is integer hashing plus one double
    division, so the whole estimate — not just its error bound — value-
    matches the oracle. Exact COUNT(DISTINCT) joined alongside for the
    error readout.

    r5 fix: the hash must be md5, NOT the affine (22853*u+977) % P.
    User ids are dense consecutive integers and an affine map is
    MONOTONE below its first wraparound, so the "k minimum values" were
    just the k smallest user ids and h_(k) measured id density, not
    cardinality — 93,905 vs 150 exact at sf0.01, a 600x error that the
    value oracle could never catch (both engines replayed the same
    degenerate arithmetic identically). Order statistics need uniform
    ranks; tests/test_sketches.py now bounds the estimate at the scale
    where the estimator regime (not the cnt<k exact regime) engages."""
    ev = spark.table("events")
    h = (
        ev.select(
            "event_type",
            F.to_date("ts").alias("d"),
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                16, 10,
            ).cast("bigint").alias("h"),
        )
        .distinct()
    )
    daily = h.withColumn(
        "r",
        F.row_number().over(
            Window.partitionBy("event_type", "d").orderBy("h")
        ),
    ).filter(F.col("r") <= 64)
    pooled = daily.select("event_type", "h").distinct()
    merged = pooled.withColumn(
        "r",
        F.row_number().over(Window.partitionBy("event_type").orderBy("h")),
    ).filter(F.col("r") <= 64)
    agg = merged.groupBy("event_type").agg(
        F.count("*").alias("cnt"), F.max("h").alias("hk")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    approx = F.when(F.col("cnt") < 64, F.col("cnt")).otherwise(
        F.floor(
            F.lit(63.0) * F.lit(1152921504606846976).cast("double")
            / F.col("hk")
        )
    )
    return (
        agg.join(exact, "event_type")
        .select(
            "event_type",
            approx.cast("bigint").alias("approx_users"),
            F.col("exact_users").cast("bigint").alias("exact_users"),
        )
        .orderBy("event_type")
    )


@query(
    "events_psi_drift",
    sql="""
    WITH ev AS (
      SELECT event_type,
             CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END AS period,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts) FROM events)
    ),
    ref AS (
      SELECT event_type, min(vc) AS mn, max(vc) AS mx
      FROM ev WHERE period = 0 GROUP BY event_type
    ),
    binned AS (
      SELECT e.event_type, e.period,
             greatest(0, least(9, (e.vc - r.mn) * 10 // greatest(r.mx - r.mn, 1)))
               AS bin
      FROM ev e JOIN ref r USING (event_type)
    ),
    spine AS (
      SELECT event_type, b.bin
      FROM ref CROSS JOIN (SELECT unnest(range(10)) AS bin) b
    ),
    cnt AS (
      SELECT s.event_type, s.bin,
             coalesce(sum(CASE WHEN b.period = 0 THEN 1 END), 0) AS cref,
             coalesce(sum(CASE WHEN b.period = 1 THEN 1 END), 0) AS ccur
      FROM spine s
      LEFT JOIN binned b ON b.event_type = s.event_type AND b.bin = s.bin
      GROUP BY s.event_type, s.bin
    ),
    tot AS (
      SELECT event_type, sum(cref) AS nref, sum(ccur) AS ncur
      FROM cnt GROUP BY event_type
    ),
    terms AS (
      SELECT c.event_type,
             CAST(round(
               (((c.cref + 1)::DOUBLE / (t.nref + 10)) -
                ((c.ccur + 1)::DOUBLE / (t.ncur + 10))) *
               ln(((c.cref + 1)::DOUBLE / (t.nref + 10)) /
                  ((c.ccur + 1)::DOUBLE / (t.ncur + 10))) * 1000000000)
                  AS BIGINT) AS nano
      FROM cnt c JOIN tot t USING (event_type)
    )
    SELECT event_type,
           CAST(round(sum(nano) / 1000000000.0, 6) AS DOUBLE) AS psi
    FROM terms GROUP BY event_type ORDER BY event_type
    """,
    survey_ops="drift-psi(ext),D8,G1",
    tables=("events",),
)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per metric — the model-monitoring
    standard for "has this feature's distribution shifted since the
    reference window?" (PSI < 0.1 stable, > 0.25 action). Ten equi-width
    bins are FIXED from the reference fortnight's min/max in integer
    cents — pure integer bin assignment, so binning is bit-identical
    cross-engine — and the current fortnight is clamped into them, the
    detail that keeps a monitoring PSI comparable run over run. Laplace-
    smoothed (p-q)*ln(p/q) terms are quantized to nano-nats before the
    per-type sum (order-exact aggregate, same trick as the LM scores).
    The bin-bounds table is dimension-sized and broadcast; one corpus
    pass builds the counts. Complements events_cusum_changepoint (level
    shift in time) and text_source_divergence (corpus JS divergence)."""
    ev = spark.table("events").select(
        "event_type",
        F.when(
            F.col("ts") < F.to_timestamp(F.lit("2024-01-16")), 0
        ).otherwise(1).alias("period"),
        F.round(F.col("value") * 100).cast("bigint").alias("vc"),
    )
    ref = (
        ev.filter(F.col("period") == 0)
        .groupBy("event_type")
        .agg(F.min("vc").alias("mn"), F.max("vc").alias("mx"))
    )
    binned = ev.join(F.broadcast(ref), "event_type").select(
        "event_type",
        "period",
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(9),
                ((F.col("vc") - F.col("mn")) * 10).cast("bigint")
                / F.greatest(F.col("mx") - F.col("mn"), F.lit(1)),
            ).cast("bigint"),
        ).alias("bin"),
    )
    spine = ref.select(
        "event_type", F.explode(F.array(*[F.lit(i) for i in range(10)])).alias("bin")
    )
    cnt = (
        spine.join(
            binned.groupBy("event_type", "bin", "period").count(),
            ["event_type", "bin"],
            "left",
        )
        .groupBy("event_type", "bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("period") == 0, F.col("count"))), F.lit(0)
            ).alias("cref"),
            F.coalesce(
                F.sum(F.when(F.col("period") == 1, F.col("count"))), F.lit(0)
            ).alias("ccur"),
        )
    )
    tot = cnt.groupBy("event_type").agg(
        F.sum("cref").alias("nref"), F.sum("ccur").alias("ncur")
    )
    p = (F.col("cref") + 1).cast("double") / (F.col("nref") + 10)
    q = (F.col("ccur") + 1).cast("double") / (F.col("ncur") + 10)
    nano = F.round((p - q) * F.log(p / q) * 1_000_000_000).cast("bigint")
    return (
        cnt.join(F.broadcast(tot), "event_type")
        .select("event_type", nano.alias("nano"))
        .groupBy("event_type")
        .agg(F.round(F.sum("nano") / 1_000_000_000.0, 6).alias("psi"))
        .orderBy("event_type")
    )


@query(
    "events_survival_km",
    sql="""
    WITH s AS (
      SELECT user_id, ts AS sts FROM events WHERE event_type = 'signup'),
    p AS (
      SELECT user_id, ts AS pts FROM events WHERE event_type = 'purchase'),
    fp AS (
      SELECT s.user_id, s.sts, min(p.pts) AS fp
      FROM s LEFT JOIN p ON p.user_id = s.user_id AND p.pts > s.sts
      GROUP BY s.user_id, s.sts),
    g AS (SELECT max(ts) AS gm FROM events),
    lt AS (
      SELECT CASE WHEN fp IS NOT NULL
                  THEN (epoch_us(fp) - epoch_us(sts)) // 3600000000
                  ELSE (epoch_us((SELECT gm FROM g)) - epoch_us(sts))
                       // 3600000000 END AS t,
             CASE WHEN fp IS NOT NULL THEN 1 ELSE 0 END AS ev
      FROM fp),
    dt AS (SELECT t, sum(ev) AS d, count(*) AS tot FROM lt GROUP BY t),
    w AS (
      SELECT t, d,
             sum(tot) OVER (ORDER BY t
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n
      FROM dt),
    tn AS (
      SELECT t, d, n,
             CASE WHEN d > 0 AND n > d
                  THEN CAST(round(ln((n - d) * 1.0 / n) * 1000000000)
                            AS BIGINT)
                  ELSE 0 END AS nano
      FROM w),
    c AS (
      SELECT t, d, n,
             sum(nano) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM tn)
    SELECT CAST(t AS INT) AS t_hours,
           CAST(n AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS d_conv,
           CAST(cum AS BIGINT) AS cum_log_nano,
           CAST(round(exp(cum / 1000000000.0), 6) AS DOUBLE) AS survival
    FROM c WHERE d > 0 AND n > d
    ORDER BY t_hours
    """,
    survey_ops="survival(ext),E,C2,D8",
    tables=("events",),
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase after each
    signup (KM 1958; THE standard retention/conversion-lag readout).
    Subjects = signup events; the "death" is that user's next purchase;
    signups with no later purchase are right-censored at the window end
    — they leave the risk set at their censoring hour without
    contributing a conversion, which is exactly what naive "average time
    to convert" gets wrong. S(t) = prod_{u<=t} (1 - d_u/n_u) over
    integer-hour durations.

    Determinism discipline: durations are exact integer microsecond
    diffs floor-divided to hours; risk sets are reverse-running integer
    sums; each log-factor ln((n-d)/n) is quantized to nano-nats (PSI /
    JS-divergence precedent) so the cumulative product is an
    order-exact integer sum, exposed as cum_log_nano alongside the
    rounded survival. All windows run over the aggregated per-hour life
    table (dimension-sized at any event volume — the same argument as
    the Benford screen), never over raw events; the only event-scale
    work is one user-keyed join and one groupBy."""
    ev = spark.table("events")
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("ts").alias("sts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    fp = (
        s.join(
            p,
            (F.col("user_id") == F.col("pu")) & (F.col("pts") > F.col("sts")),
            "left",
        )
        .groupBy("user_id", "sts")
        .agg(F.min("pts").alias("fp"))
    )
    g = ev.agg(F.max("ts").alias("gm"))
    lt = fp.crossJoin(F.broadcast(g)).select(
        F.when(
            F.col("fp").isNotNull(),
            F.expr("(unix_micros(fp) - unix_micros(sts)) div 3600000000"),
        )
        .otherwise(
            F.expr("(unix_micros(gm) - unix_micros(sts)) div 3600000000")
        )
        .alias("t"),
        F.when(F.col("fp").isNotNull(), 1).otherwise(0).alias("ev"),
    )
    dt = lt.groupBy("t").agg(
        F.sum("ev").alias("d"), F.count("*").alias("tot")
    )
    w_risk = Window.orderBy("t").rowsBetween(0, Window.unboundedFollowing)
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wdf = dt.select("t", "d", F.sum("tot").over(w_risk).alias("n"))
    nano = F.when(
        (F.col("d") > 0) & (F.col("n") > F.col("d")),
        F.round(
            F.log((F.col("n") - F.col("d")).cast("double") * 1.0 / F.col("n"))
            * 1_000_000_000
        ).cast("bigint"),
    ).otherwise(F.lit(0).cast("bigint"))
    c = wdf.select(
        "t", "d", "n", F.sum(nano).over(w_cum).alias("cum")
    )
    return (
        c.filter((F.col("d") > 0) & (F.col("n") > F.col("d")))
        .select(
            F.col("t").cast("int").alias("t_hours"),
            F.col("n").cast("bigint").alias("n_risk"),
            F.col("d").cast("bigint").alias("d_conv"),
            F.col("cum").cast("bigint").alias("cum_log_nano"),
            F.round(F.exp(F.col("cum") / 1_000_000_000.0), 6).alias(
                "survival"
            ),
        )
        .orderBy("t_hours")
    )


# --- incremental aggregate maintenance: merge partials, don't recompute ----
@query(
    "events_incremental_agg_merge",
    # the oracle aggregates the WHOLE table directly — the query computes
    # the same result by merging two partial-aggregate states, so the
    # hash match IS the proof that the merge is lossless
    sql="""
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents,
           CAST(round(sum(cents) / (100.0 * count(*)), 6) AS DOUBLE)
             AS avg_value
    FROM c GROUP BY event_type ORDER BY event_type
    """,
    survey_ops="D8,incremental-agg(ext)",
    tables=("events",),
)
def events_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the stored rollup of the base
    window (ts < Jan 25) is MERGED with the delta batch's partial state
    (ts >= Jan 25) instead of re-aggregating history — count/sum/min/max
    merge associatively (full-outer join on the group key, null-safe
    combine), avg derives from the merged sums. At 100 TB this is the
    difference between touching one day and touching the archive; the
    oracle computes the direct whole-table aggregate, so the driver's
    hash match proves merged == direct. Integer cents keep every merge
    step exact."""
    ev = spark.table("events").select(
        "event_type",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    cutoff = F.lit("2024-01-25").cast("timestamp")

    def partial(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias(f"n_{tag}"),
            F.sum("cents").alias(f"s_{tag}"),
            F.min("cents").alias(f"mn_{tag}"),
            F.max("cents").alias(f"mx_{tag}"),
        )

    base = partial(ev.filter(F.col("ts") < cutoff), "b")
    delta = partial(ev.filter(F.col("ts") >= cutoff), "d")
    z = F.lit(0).cast("bigint")
    n = F.coalesce("n_b", z) + F.coalesce("n_d", z)
    s = F.coalesce("s_b", z) + F.coalesce("s_d", z)
    return (
        base.join(delta, "event_type", "full_outer")
        .select(
            "event_type",
            n.cast("bigint").alias("n"),
            s.cast("bigint").alias("sum_cents"),
            F.least(
                F.coalesce("mn_b", F.col("mn_d")),
                F.coalesce("mn_d", F.col("mn_b")),
            ).cast("bigint").alias("min_cents"),
            F.greatest(
                F.coalesce("mx_b", F.col("mx_d")),
                F.coalesce("mx_d", F.col("mx_b")),
            ).cast("bigint").alias("max_cents"),
            F.round(s / (100.0 * n), 6).alias("avg_value"),
        )
        .orderBy("event_type")
    )


@query(
    "events_dau_wau_stickiness",
    sql="""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    active AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    dau AS (
      SELECT day, count(*) AS dau FROM active GROUP BY day),
    wau AS (
      SELECT d.day, count(DISTINCT a.user_id) AS wau
      FROM days d JOIN active a
        ON a.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day)
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau,
           CAST(round(dau.dau * 1.0 / wau.wau, 6) AS DOUBLE) AS stickiness
    FROM days d JOIN dau ON dau.day = d.day JOIN wau ON wau.day = d.day
    ORDER BY day
    """,
    survey_ops="D5,E,engagement(ext)",
    tables=("events",),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement ratio next to the
    cohort-retention matrix. Exact trailing-7-day distinct users via a
    bounded day x window band join over the (day, user) DISTINCT table
    (30 days x 7-day band — the deduped activity table is the small
    derived input, never raw events), not a sliding window over raw
    rows: count(DISTINCT) inside a RANGE frame isn't supported anyway,
    and the band join partial-aggregates. One division, rounded 6dp."""
    ev = spark.table("events")
    active = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    days = active.select("day").distinct()
    dau = active.groupBy("day").agg(F.count("*").alias("dau"))
    a = active.select(F.col("day").alias("aday"), "user_id")
    wau = (
        days.join(
            a,
            (F.col("aday") <= F.col("day"))
            & (F.col("aday") >= F.date_sub(F.col("day"), 6)),
        )
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("wau"))
    )
    return (
        days.join(dau, "day")
        .join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("dau").cast("bigint").alias("dau"),
            F.col("wau").cast("bigint").alias("wau"),
            F.round(F.col("dau") * 1.0 / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


@query(
    "events_ohlc_hourly",
    sql="""
    WITH c AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, ts, event_id,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events),
    ranked AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, hour
                                ORDER BY ts, event_id) AS rk_open,
             row_number() OVER (PARTITION BY event_type, hour
                                ORDER BY ts DESC, event_id DESC) AS rk_close
      FROM c)
    SELECT event_type, strftime(hour, '%Y-%m-%d %H:00:00') AS hour,
           CAST(max(CASE WHEN rk_open = 1 THEN cents END) AS BIGINT) AS open,
           CAST(max(cents) AS BIGINT) AS high,
           CAST(min(cents) AS BIGINT) AS low,
           CAST(max(CASE WHEN rk_close = 1 THEN cents END) AS BIGINT) AS close,
           CAST(count(*) AS BIGINT) AS n
    FROM ranked GROUP BY event_type, hour
    ORDER BY event_type, hour
    """,
    survey_ops="E,D2,timeseries(ext)",
    tables=("events",),
)
def events_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars per (event_type, hour) — the downsampling shape every
    telemetry/market pipeline runs. Open/close via min/max over a
    (ts, event_id, cents) struct — total order from the id tiebreak, ONE
    aggregation pass, no window (the oracle uses rank windows as the
    independent formulation). Integer cents throughout."""
    ev = spark.table("events").select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    o_struct = F.struct("ts", "event_id", "cents")
    return (
        ev.groupBy("event_type", "hour")
        .agg(
            F.min(o_struct).getField("cents").cast("bigint").alias("open"),
            F.max("cents").cast("bigint").alias("high"),
            F.min("cents").cast("bigint").alias("low"),
            F.max(o_struct).getField("cents").cast("bigint").alias("close"),
            F.count("*").cast("bigint").alias("n"),
        )
        .select(
            "event_type",
            F.date_format("hour", "yyyy-MM-dd HH:00:00").alias("hour"),
            "open", "high", "low", "close", "n",
        )
        .orderBy("event_type", "hour")
    )


@query(
    "events_time_weighted_avg",
    sql="""
    WITH seq AS (
      SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_ts
      FROM events),
    seg AS (
      SELECT user_id, cents,
             CAST(epoch_us(next_ts) - epoch_us(ts) AS BIGINT) AS dur_us
      FROM seq WHERE next_ts IS NOT NULL)
    SELECT user_id,
           CAST(sum(dur_us) AS BIGINT) AS total_us,
           CAST(sum(cents * dur_us) AS BIGINT) AS weighted_sum,
           CAST(round(sum(cents * dur_us) / (100.0 * sum(dur_us)), 6)
             AS DOUBLE) AS twap
    FROM seg GROUP BY user_id HAVING sum(dur_us) > 0
    ORDER BY user_id
    """,
    survey_ops="E,timeseries(ext)",
    tables=("events",),
)
def events_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP): each reading is
    weighted by how long it was current (until the next event), the
    correct average for irregular telemetry where arithmetic mean
    over-weights bursts. One lead window per user partition; exact
    integer microseconds x cents make the weighted sum associative, one
    final division rounded 6dp."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = spark.table("events").select(
        "user_id",
        "ts",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    ).withColumn("next_ts", F.lead("ts").over(w))
    dur = (
        F.unix_micros(F.col("next_ts")) - F.unix_micros(F.col("ts"))
    ).cast("bigint")
    seg = seq.filter(F.col("next_ts").isNotNull()).select(
        "user_id", "cents", dur.alias("dur_us")
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.sum("dur_us").cast("bigint").alias("total_us"),
            F.sum(F.col("cents") * F.col("dur_us"))
            .cast("bigint")
            .alias("weighted_sum"),
        )
        .filter(F.col("total_us") > 0)
        .select(
            "user_id",
            "total_us",
            "weighted_sum",
            F.round(
                F.col("weighted_sum") / (100.0 * F.col("total_us")), 6
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


@query(
    "events_top_trigrams",
    sql="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events)
    SELECT event_type || '>' || e2 || '>' || e3 AS trigram,
           CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY trigram ORDER BY n DESC, trigram LIMIT 20
    """,
    survey_ops="E,D2,path-mining(ext)",
    tables=("events",),
)
def events_top_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral paths: the 20 most frequent event-type TRIGRAMS
    across user sequences — path mining one step past the first-order
    transition matrix (events_transition_matrix is the bigram form).
    Two lead windows over the same (user, ts) sort — ONE exchange
    serves both — then a partial-aggregable count and top-k."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = spark.table("events").select(
        "user_id",
        "event_type",
        F.lead("event_type").over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("trigram")
        )
        .groupBy("trigram")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "trigram")
        .limit(20)
    )


@query(
    "events_seasonal_naive_error",
    sql="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY event_type, CAST(ts AS DATE)),
    j AS (
      SELECT a.event_type, a.day, a.cents AS actual, f.cents AS forecast
      FROM daily a JOIN daily f
        ON f.event_type = a.event_type AND f.day = a.day - 7)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_days,
           CAST(sum(abs(actual - forecast)) AS BIGINT) AS sum_abs_err_cents,
           CAST(round(sum(abs(actual - forecast)) * 1.0 / sum(actual), 6)
             AS DOUBLE) AS wape
    FROM j GROUP BY event_type ORDER BY event_type
    """,
    survey_ops="D2,forecast-eval(ext)",
    tables=("events",),
)
def events_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast baseline (ŷ_d = y_{d-7}) with its WAPE per
    event type — the sanity floor every real forecasting pipeline is
    judged against before any model ships. The lag-7 join is on the
    DAILY rollup (dimension-sized), absolute errors sum in exact integer
    cents, WAPE is one division."""
    ev = spark.table("events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
    )
    f = daily.select(
        F.col("event_type").alias("ft"),
        F.date_add("day", 7).alias("fday"),
        F.col("cents").alias("forecast"),
    )
    j = daily.join(
        f,
        (daily["event_type"] == f["ft"]) & (daily["day"] == f["fday"]),
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_days"),
            F.sum(F.abs(F.col("cents") - F.col("forecast")))
            .cast("bigint")
            .alias("sum_abs_err_cents"),
            F.round(
                F.sum(F.abs(F.col("cents") - F.col("forecast"))) * 1.0
                / F.sum("cents"),
                6,
            ).alias("wape"),
        )
        .orderBy("event_type")
    )


@query(
    "events_weighted_median",
    sql="""
    WITH c AS (
      SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS cents,
             (CAST(user_id AS BIGINT) % 5) + 1 AS w
      FROM events),
    cum AS (
      SELECT event_type, cents, w,
             sum(w) OVER (PARTITION BY event_type
                          ORDER BY cents, w
                          ROWS UNBOUNDED PRECEDING) AS cw,
             sum(w) OVER (PARTITION BY event_type) AS tw
      FROM c)
    SELECT event_type,
           CAST(min(cents) AS BIGINT) AS weighted_median_cents,
           CAST(min(tw) AS BIGINT) AS total_w
    FROM cum WHERE cw * 2 >= tw
    GROUP BY event_type ORDER BY event_type
    """,
    survey_ops="E,D8,robust-stats(ext)",
    tables=("events",),
)
def events_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact WEIGHTED median per group (the unweighted exact path is
    ext_group_percentiles): smallest value whose cumulative weight
    reaches half the group's total. One per-group sort window with an
    integer cumulative sum — ties in (cents, w) are broken inside the
    frame but the >= half test only depends on the cumulative total at
    equal cents, so the argmin is deterministic. Weights are the same
    deterministic user bucket as the UDAF query."""
    from pyspark.sql import Window

    c = spark.table("events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        ((F.col("user_id").cast("bigint") % 5) + 1).alias("w"),
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("cents", "w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("event_type")
    cum = c.select(
        "event_type",
        "cents",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wtot).alias("tw"),
    )
    return (
        cum.filter(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("event_type")
        .agg(
            F.min("cents").cast("bigint").alias("weighted_median_cents"),
            F.min("tw").cast("bigint").alias("total_w"),
        )
        .orderBy("event_type")
    )


@query(
    "events_scd2_point_in_time_join",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts)
                FROM events),
    chg AS (
      SELECT user_id, event_type AS state, ts, event_id FROM ev
      WHERE event_type IN ('signup', 'purchase', 'error') AND user_id < 20),
    dim AS (
      SELECT user_id, state, ts AS valid_from,
             coalesce(lead(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id),
                      TIMESTAMP '9999-12-31 00:00:00') AS valid_to
      FROM chg),
    fact AS (
      SELECT user_id, ts FROM ev
      WHERE event_type IN ('click', 'view') AND user_id < 20)
    SELECT d.user_id, d.state, CAST(count(*) AS BIGINT) AS n_events
    FROM fact f JOIN dim d ON d.user_id = f.user_id
      AND f.ts >= d.valid_from AND f.ts < d.valid_to
    GROUP BY d.user_id, d.state ORDER BY d.user_id, state
    """,
    survey_ops="scd2(ext),C6,range-join(ext)",
    tables=("events",),
)
def events_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join — the composition the SCD2 build exists for:
    lifecycle events (signup/purchase/error) become validity intervals
    (events_scd2_intervals' lead construction), and every click/view
    fact joins to the state VALID AT ITS TIMESTAMP via the half-open
    interval predicate, rolled up per (user, state). The equi-join on
    user_id carries the shuffle; the interval test is per-user-local
    (each user's dimension slice is small), which is why this stays a
    plain range predicate here — the all-pairs-banded path
    (ext_range_join) is the shape when the dimension side is itself
    huge."""
    ev = spark.table("events")
    chg = ev.filter(
        F.col("event_type").isin("signup", "purchase", "error")
        & (F.col("user_id") < 20)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dim = chg.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.coalesce(
            F.lead("ts").over(w),
            F.lit("9999-12-31 00:00:00").cast("timestamp"),
        ).alias("valid_to"),
    )
    fact = ev.filter(
        F.col("event_type").isin("click", "view") & (F.col("user_id") < 20)
    ).select("user_id", "ts")
    return (
        fact.join(dim, "user_id")
        .filter(
            (F.col("ts") >= F.col("valid_from"))
            & (F.col("ts") < F.col("valid_to"))
        )
        .groupBy("user_id", "state")
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .orderBy("user_id", "state")
    )


@query(
    "events_funnel_timebound",
    sql="""
    WITH ev AS (SELECT * REPLACE (make_timestamp(epoch_ns(ts)//1000) AS ts)
                FROM events),
    s1 AS (
      SELECT user_id, min(ts) AS t1 FROM ev
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2
      FROM ev e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 24 HOUR
      GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3
      FROM ev e JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s2.t2 + INTERVAL 24 HOUR
      GROUP BY e.user_id)
    SELECT
      CAST((SELECT count(*) FROM s1) AS BIGINT) AS step1_view,
      CAST((SELECT count(*) FROM s2) AS BIGINT) AS step2_click_24h,
      CAST((SELECT count(*) FROM s3) AS BIGINT) AS step3_purchase_24h,
      CAST(round((SELECT count(*) FROM s3) * 1.0
                 / greatest((SELECT count(*) FROM s1), 1), 6) AS DOUBLE)
        AS conversion
    """,
    survey_ops="E,D5,funnel(ext)",
    tables=("events",),
)
def events_funnel_timebound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-BOUND funnel: view -> click within 24h -> purchase within 24h
    of the click (events_funnel is the unconstrained ordering form; real
    conversion windows expire). Same min-timestamp chaining — each step
    is one groupBy over the events filtered by the previous step's
    anchor, joined on user — no per-user event lists, no window
    functions; the time bound rides the join predicate."""
    ev = spark.table("events")
    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.col("t1") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.col("t2") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    c1 = s1.agg(F.count("*").cast("bigint").alias("step1_view"))
    c2 = s2.agg(F.count("*").cast("bigint").alias("step2_click_24h"))
    c3 = s3.agg(F.count("*").cast("bigint").alias("step3_purchase_24h"))
    return (
        c1.crossJoin(c2)
        .crossJoin(c3)
        .withColumn(
            "conversion",
            F.round(
                F.col("step3_purchase_24h") * 1.0
                / F.greatest(F.col("step1_view"), F.lit(1)),
                6,
            ),
        )
    )


@query(
    "events_user_value_gini",
    sql="""
    WITH u AS (
      SELECT user_id, sum(CAST(round(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY user_id),
    r AS (
      SELECT cents,
             row_number() OVER (ORDER BY cents, user_id) AS rk
      FROM u),
    s AS (
      SELECT count(*) AS n, sum(cents) AS tot,
             sum(rk * cents) AS rank_weighted
      FROM r)
    SELECT CAST(n AS BIGINT) AS n_users,
           CAST(tot AS BIGINT) AS total_cents,
           CAST(round(2.0 * rank_weighted / (n * tot)
                      - (n + 1.0) / n, 6) AS DOUBLE) AS gini
    FROM s
    """,
    survey_ops="E,D8,inequality(ext)",
    tables=("events",),
)
def events_user_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user value — the single-number inequality
    metric beside the Pareto whale curve: G = 2*sum(i*x_(i))/(n*sum x)
    - (n+1)/n over rank-ordered totals. Integer cents keep the
    rank-weighted sum exact; the rank window runs over the USER rollup
    (dimension-sized, one partition is a documented report-only
    concession — the raw events never see a global window)."""
    from pyspark.sql import Window

    u = spark.table("events").groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
    )
    r = u.select(
        "cents",
        F.row_number()
        .over(Window.orderBy("cents", "user_id"))
        .alias("rk"),
    )
    s = r.agg(
        F.count("*").alias("n"),
        F.sum("cents").alias("tot"),
        F.sum(F.col("rk") * F.col("cents")).alias("rw"),
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("tot").cast("bigint").alias("total_cents"),
        F.round(
            2.0 * F.col("rw") / (F.col("n") * F.col("tot"))
            - (F.col("n") + 1.0) / F.col("n"),
            6,
        ).alias("gini"),
    )


# --- temporal (time-respecting) reachability --------------------------------
TEMPORAL_UNROLL_ROUNDS = 12


def _temporal_reach_sql(n_rounds: int = TEMPORAL_UNROLL_ROUNDS) -> str:
    """DuckDB twin of events_temporal_reachability: earliest-arrival
    relaxation unrolled. Contacts are BIDIRECTIONAL timestamped edges
    (each event connects the user with its tree parent and predecessor at
    that instant); arrival times are integer epoch-micros, so every round
    is exact min-arithmetic. Idempotent past the fixpoint — the shared
    round cap gives equality by construction (msf_boruvka argument)."""
    parts = ["""
    WITH contacts AS MATERIALIZED (
      SELECT src, dst, ts_us FROM (
        SELECT user_id AS src, user_id // 2 AS dst, epoch_us(ts) AS ts_us
        FROM events WHERE user_id >= 1
        UNION ALL
        SELECT user_id // 2 AS src, user_id AS dst, epoch_us(ts) AS ts_us
        FROM events WHERE user_id >= 1
        UNION ALL
        SELECT user_id AS src, user_id - 1 AS dst, epoch_us(ts) AS ts_us
        FROM events WHERE user_id >= 2
        UNION ALL
        SELECT user_id - 1 AS src, user_id AS dst, epoch_us(ts) AS ts_us
        FROM events WHERE user_id >= 2
      ) WHERE src <> dst
    ),
    arr0 AS MATERIALIZED (SELECT CAST(1 AS BIGINT) AS id, CAST(0 AS BIGINT) AS a)"""]
    for t in range(n_rounds):
        parts.append(f""",
    arr{t + 1} AS MATERIALIZED (
      SELECT id, min(a) AS a FROM (
        SELECT id, a FROM arr{t}
        UNION ALL
        SELECT e.dst AS id, e.ts_us AS a
        FROM contacts e JOIN arr{t} u ON e.src = u.id AND e.ts_us >= u.a
      ) GROUP BY id
    )""")
    parts.append(f"""
    SELECT CAST(a // 86400000000 AS BIGINT) AS day_idx,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(id) AS BIGINT) AS sum_id
    FROM arr{n_rounds}
    GROUP BY day_idx ORDER BY day_idx""")
    return "".join(parts)


@query(
    "events_temporal_reachability",
    sql=_temporal_reach_sql(),
    survey_ops="K(ext),H10,C1,D2",
    tables=("events",),
)
def events_temporal_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-RESPECTING reachability (temporal graph analytics — static
    shortest paths overstate spread because a path is only traversable if
    edge times are non-decreasing): every event is a bidirectional
    timestamped contact between the user and its tree parent /
    predecessor; from seed user 1 at epoch, earliest-arrival relaxation
    computes when each user can first have been reached through a
    time-ordered contact chain — the information-diffusion / contagion
    primitive. Per round one (contacts x arrivals) equi-join with the
    time gate as join residual plus a groupBy-min; arrival state is |V|
    rows; all arithmetic is integer epoch-micros. Fixed shared round cap
    (TEMPORAL_UNROLL_ROUNDS) -> unrolled-oracle equality by construction;
    a plain-Python Dijkstra-style golden pins true convergence at test
    scale. Output is the arrival-day histogram with a sum_id witness
    (scale-constant gate rows)."""
    from esco_neo4j_spark.operators.graph import _checkpoint

    ev = spark.table("events")
    tree = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
        F.unix_micros("ts").alias("ts_us"),
    )
    sib = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).alias("dst"),
        F.unix_micros("ts").alias("ts_us"),
    )
    fwd = tree.union(sib)
    contacts = (
        fwd.union(
            fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"),
                       "ts_us")
        )
        .filter(F.col("src") != F.col("dst"))
    )
    contacts = _checkpoint(contacts)
    arr = contacts.sparkSession.createDataFrame(
        [(1, 0)], "id bigint, a bigint"
    )
    for _ in range(TEMPORAL_UNROLL_ROUNDS):
        relax = (
            contacts.join(
                arr.select(F.col("id").alias("src"), F.col("a").alias("ua")),
                "src",
            )
            .filter(F.col("ts_us") >= F.col("ua"))
            .select(F.col("dst").alias("id"), F.col("ts_us").alias("a"))
        )
        arr = _checkpoint(
            arr.union(relax).groupBy("id").agg(F.min("a").alias("a"))
        )
    return (
        # integer `div`, not `/`+cast: double division can round across a
        # day boundary; DuckDB's // is exact integer floor
        arr.select(F.expr("a div 86400000000").alias("day_idx"), "id")
        .groupBy("day_idx")
        .agg(F.count("*").cast("long").alias("n_users"),
             F.sum("id").cast("long").alias("sum_id"))
        .orderBy("day_idx")
    )


def _ams_f2_sql() -> str:
    from esco_neo4j_spark.operators.sketch import AMS_DEPTH

    branches = "\n      UNION ALL\n      ".join(
        f"""SELECT {j} AS sketch_row,
             CAST(sum(1 - 2 * (('0x' || substr(md5('{100 + j}-' ||
                       CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2))
                  AS BIGINT) AS s
      FROM events"""
        for j in range(AMS_DEPTH)
    )
    return f"""
    WITH pulls AS (
      {branches}
    ),
    est AS (
      SELECT sum(s * s) // 9 AS f2 FROM pulls
    ),
    exact AS (
      SELECT CAST(sum(c * c) AS BIGINT) AS f2_exact FROM (
        SELECT count(*) AS c FROM events GROUP BY user_id
      )
    )
    SELECT CAST(e.f2 AS BIGINT) AS f2_estimate, x.f2_exact,
           CAST(round((e.f2 - x.f2_exact) * 1.0 / x.f2_exact, 6) AS DOUBLE)
             AS rel_err
    FROM est e CROSS JOIN exact x
    """


@query(
    "events_ams_f2_selfjoin",
    sql=_ams_f2_sql(),
    survey_ops="sketch(ext),D2",
    tables=("events",),
)
def events_ams_f2_selfjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS tug-of-war F2 sketch — the 5th mergeable-sketch family (after
    CMS / bloom / HLL / KMV): estimates the SELF-JOIN SIZE sum(count^2)
    of user_id from 9 integers of state, the quantity join planners and
    skew triage need (ext_join_cardinality_probe computes it exactly with
    a per-key rollup; this answers from sketch state mergeable across
    partitions and days). MEAN of the 9 squared rope sums, floored
    integer division — unbiased (each S_j^2 has expectation F2), kept
    integer-exact so the estimate itself is value-oracled; the exact F2
    rides along to expose the sketch error honestly. (r5: was the
    median of single squares, which centers on the chi-square(1) median
    0.455*F2 — a guaranteed ~2x under-read; the classic median-of-MEANS
    needs more counters than 9 to beat the plain mean.) One narrow 9x
    explode + 9-group partial sum; no shuffle wider than 9 rows."""
    from esco_neo4j_spark.operators.sketch import ams_f2_terms

    ev = spark.table("events")
    terms = ams_f2_terms(ev, "user_id")
    est = terms.agg(
        F.expr("sum(s * s) div 9").alias("f2")
    )
    exact = (
        ev.groupBy("user_id").agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).cast("bigint").alias("f2_exact"))
    )
    return est.crossJoin(F.broadcast(exact)).select(
        F.col("f2").cast("bigint").alias("f2_estimate"),
        "f2_exact",
        F.round(
            (F.col("f2") - F.col("f2_exact")) * 1.0 / F.col("f2_exact"), 6
        ).alias("rel_err"),
    )


# --- Poissonized bootstrap CI ------------------------------------------------
import math as _math

_BOOT_B = 64
# Poisson(1) inverse-CDF thresholds on a 28-bit integer uniform: replicate
# multiplicity m = #thresholds below u, capped at 5 (P(>5) ~ 0.06%). The
# thresholds are INTEGER literals, so the draw is exact integer comparison
# in Python, Spark, and DuckDB alike.
_BOOT_THRESH = [
    int(_math.floor(sum(_math.exp(-1) / _math.factorial(k) for k in range(j + 1))
                    * (1 << 28)))
    for j in range(5)
]


def _bootstrap_sql() -> str:
    cases = " + ".join(
        f"(CASE WHEN u >= {t} THEN 1 ELSE 0 END)" for t in _BOOT_THRESH
    )
    return f"""
    WITH draws AS (
      SELECT b.b,
             {cases} AS m,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM (
        SELECT event_id, value,
               b,
               ('0x' || substr(md5(event_id::VARCHAR || '|' || b::VARCHAR),
                               1, 7))::BIGINT AS u
        FROM events, (SELECT unnest(generate_series(0, {_BOOT_B - 1})) AS b)
      ) b
    ),
    reps AS (
      SELECT b, sum(m * cents) * 1.0 / sum(m) AS mean_b
      FROM draws GROUP BY b HAVING sum(m) > 0
    ),
    -- 2nd-smallest / 2nd-largest of HOWEVER MANY replicates survive the
    -- HAVING (the DESC pick avoids hard-coding OFFSET 62, which would
    -- assume all 64 survive and break on a degenerate tiny table).
    lo AS (SELECT mean_b FROM reps ORDER BY mean_b ASC,  b ASC  LIMIT 1 OFFSET 1),
    hi AS (SELECT mean_b FROM reps ORDER BY mean_b DESC, b DESC LIMIT 1 OFFSET 1),
    pt AS (
      SELECT sum(CAST(round(value * 100) AS BIGINT)) * 1.0 / count(*) AS c
      FROM events
    )
    SELECT CAST(round(pt.c / 100.0, 6) AS DOUBLE) AS mean_value,
           CAST(round(lo.mean_b / 100.0, 6) AS DOUBLE) AS ci_lo,
           CAST(round(hi.mean_b / 100.0, 6) AS DOUBLE) AS ci_hi,
           CAST({_BOOT_B} AS INT) AS n_replicates
    FROM pt CROSS JOIN lo CROSS JOIN hi
    """


@query(
    "events_bootstrap_ci",
    sql=_bootstrap_sql(),
    survey_ops="sketch(ext),D1,H(ext)",
    tables=("events",),
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalable BOOTSTRAP 95% CI for the mean event value — Poissonized
    resampling (the bag-of-little-bootstraps trick): each of 64
    replicates assigns every row a Poisson(1) multiplicity drawn by
    integer inverse-CDF thresholds on a 28-bit md5 uniform, so resamples
    are never materialized — one 64x narrow explode and a 64-group
    partial-aggregable sum replace 64 shuffles of the data. Replicate
    means are single divisions of exact integer sums; the CI bounds are
    exact order-statistic picks (2nd-smallest / 2nd-largest of the
    surviving replicates), so the whole
    uncertainty calculation is value-oracled. At 100 TB: the only state
    is 64 (sum, count) pairs."""
    ev = spark.table("events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("event_id").cast("string"), F.lit("|"),
                           F.col("b").cast("string"))), 1, 7),
        16, 10,
    ).cast("bigint")
    m = sum(
        (F.when(u >= t, 1).otherwise(0) for t in _BOOT_THRESH),
        F.lit(0),
    )
    draws = (
        ev.select("event_id", cents.alias("cents"),
                  F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1)))
                  .alias("b"))
        .select("b", "cents", m.alias("m"))
    )
    reps = (
        draws.groupBy("b")
        .agg(F.sum(F.col("m") * F.col("cents")).alias("ws"),
             F.sum("m").alias("wn"))
        .filter(F.col("wn") > 0)
        .select("b", (F.col("ws") * 1.0 / F.col("wn")).alias("mean_b"))
    )
    lo = reps.orderBy("mean_b", "b").limit(2).orderBy(F.desc("mean_b")).limit(1)
    hi = reps.orderBy(F.desc("mean_b"), F.desc("b")).limit(2).orderBy(
        "mean_b").limit(1)
    pt = ev.agg(
        (F.sum(cents) * 1.0 / F.count("*")).alias("c")
    )
    return (
        pt.crossJoin(F.broadcast(lo.select(F.col("mean_b").alias("l"))))
        .crossJoin(F.broadcast(hi.select(F.col("mean_b").alias("h"))))
        .select(
            F.round(F.col("c") / 100.0, 6).alias("mean_value"),
            F.round(F.col("l") / 100.0, 6).alias("ci_lo"),
            F.round(F.col("h") / 100.0, 6).alias("ci_hi"),
            F.lit(_BOOT_B).cast("int").alias("n_replicates"),
        )
    )


# --- deletion propagation (right-to-forget) ---------------------------------
@query(
    "pipeline_right_to_forget",
    sql="""
    WITH forget AS (
      SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 13
    ),
    kept AS (
      SELECT e.* FROM events e
      WHERE NOT EXISTS (SELECT 1 FROM forget f WHERE f.user_id = e.user_id)
    ),
    before AS (
      SELECT event_type, count(*) AS rows_before,
             count(DISTINCT user_id) AS users_before
      FROM events GROUP BY 1
    ),
    after AS (
      SELECT event_type, count(*) AS rows_after,
             count(DISTINCT user_id) AS users_after,
             sum(CASE WHEN user_id % 97 = 13 THEN 1 ELSE 0 END) AS leaks
      FROM kept GROUP BY 1
    )
    SELECT b.event_type,
           CAST(b.rows_before AS BIGINT) AS rows_before,
           CAST(coalesce(a.rows_after, 0) AS BIGINT) AS rows_after,
           CAST(b.users_before - coalesce(a.users_after, 0) AS BIGINT)
             AS users_removed,
           CAST(coalesce(a.leaks, 0) AS BIGINT) AS leaks
    FROM before b LEFT JOIN after a USING (event_type)
    ORDER BY event_type
    """,
    survey_ops="pipeline-forget(ext),C8,D2",
    tables=("events",),
)
def pipeline_right_to_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion propagation (GDPR right-to-forget) as a verified report:
    drop every event belonging to a deletion-request user set (here the
    deterministic pseudo-request list user_id % 97 = 13), and emit the
    per-event-type accounting a compliance job must produce — rows
    before/after, users removed, and an IN-QUERY leak witness (count of
    surviving rows from forgotten users, provably 0 — the
    pipeline_leakage_safe_split pattern).

    Scale shape at 100 TB: the request list is DISTINCT user ids
    (bounded by requests, not events) and broadcasts into an anti-join,
    so the fact table never shuffles; the physical delete under a table
    format touches only files whose min/max user_id stats overlap the
    list, and the accounting here is two partial aggregations."""
    ev = spark.table("events")
    forget = ev.filter(F.col("user_id") % 97 == 13).select("user_id").distinct()
    kept = ev.join(F.broadcast(forget), "user_id", "left_anti")
    before = ev.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("rows_before"),
        F.count_distinct("user_id").alias("users_before"),
    )
    after = kept.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("rows_after"),
        F.count_distinct("user_id").alias("users_after"),
        F.sum((F.col("user_id") % 97 == 13).cast("int"))
        .cast("bigint")
        .alias("leaks"),
    )
    return (
        before.join(after, "event_type", "left")
        .select(
            "event_type",
            "rows_before",
            F.coalesce("rows_after", F.lit(0)).cast("bigint").alias("rows_after"),
            (F.col("users_before") - F.coalesce("users_after", F.lit(0)))
            .cast("bigint")
            .alias("users_removed"),
            F.coalesce("leaks", F.lit(0)).cast("bigint").alias("leaks"),
        )
        .orderBy("event_type")
    )


# --- KMV audience overlap (sketch set-intersection) -------------------------
@query(
    "events_kmv_audience_overlap",
    sql="""
    WITH ev AS (SELECT DISTINCT event_type,
                       ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
                FROM events),
    s AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
      FROM ev
    ),
    sk AS (SELECT event_type, h FROM s WHERE r <= 64),
    types AS (SELECT DISTINCT event_type FROM events),
    prs AS (
      SELECT a.event_type AS ta, b.event_type AS tb
      FROM types a JOIN types b ON a.event_type < b.event_type
    ),
    tagged AS (
      SELECT p.ta, p.tb, k.h, 1 AS in_a, 0 AS in_b
      FROM prs p JOIN sk k ON k.event_type = p.ta
      UNION ALL
      SELECT p.ta, p.tb, k.h, 0, 1
      FROM prs p JOIN sk k ON k.event_type = p.tb
    ),
    uni AS (
      SELECT ta, tb, h, max(in_a) AS in_a, max(in_b) AS in_b
      FROM tagged GROUP BY 1, 2, 3
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY ta, tb ORDER BY h) AS r
      FROM uni
    ),
    agg AS (
      SELECT ta, tb, count(*) AS cnt, max(h) AS hk,
             sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS c
      FROM ranked WHERE r <= 64 GROUP BY 1, 2
    ),
    du AS (SELECT DISTINCT event_type, user_id FROM events),
    exact AS (
      SELECT a.event_type AS ta, b.event_type AS tb, count(*) AS exact_overlap
      FROM du a JOIN du b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT g.ta AS type_a, g.tb AS type_b,
           CAST(floor((g.c / CAST(g.cnt AS DOUBLE)) *
                (CASE WHEN g.cnt < 64 THEN CAST(g.cnt AS DOUBLE)
                      ELSE 63.0 * CAST(1152921504606846976 AS DOUBLE) / g.hk
                 END)) AS BIGINT)
             AS approx_overlap,
           CAST(round(g.c / CAST(g.cnt AS DOUBLE), 6) AS DOUBLE)
             AS jaccard_est,
           CAST(coalesce(x.exact_overlap, 0) AS BIGINT) AS exact_overlap
    FROM agg g LEFT JOIN exact x ON g.ta = x.ta AND g.tb = x.tb
    ORDER BY type_a, type_b
    """,
    survey_ops="sketch(ext),D5,C9",
    tables=("events",),
)
def events_kmv_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap estimation from KMV sketch SET OPERATIONS — the
    capability that makes KMV the right distinct sketch when questions
    involve intersections: HLL only unions, but KMV's k-smallest state
    supports |A ∩ B| ≈ ρ·|A ∪ B| where ρ is the fraction of the UNION
    sketch's k smallest present in both sides (Bar-Yossef et al.;
    Beyer et al.'s unbiased KMV estimator for the union size). 'How many
    users both clicked and purchased' at 100 TB never re-shuffles raw
    user ids: per-type 64-row sketches are built once (the
    events_kmv_distinct_rollup state), every pairwise overlap is
    arithmetic over 128 rows.

    Everything is integer hashing, order statistics, and one double
    division — identical on both engines, so the ESTIMATES are
    value-oracled, with exact overlaps joined alongside as the error
    readout (the exact side is the user-keyed join the sketch exists to
    avoid; it stays only as this query's quality witness)."""
    ev = spark.table("events")
    hashed = ev.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
            16, 10,
        ).cast("bigint").alias("h"),
    ).distinct()
    sk = (
        hashed.withColumn(
            "r",
            F.row_number().over(Window.partitionBy("event_type").orderBy("h")),
        )
        .filter(F.col("r") <= 64)
        .select("event_type", "h")
    )
    types = ev.select("event_type").distinct()
    prs = (
        types.select(F.col("event_type").alias("ta"))
        .join(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    tagged = (
        prs.join(sk, sk["event_type"] == prs["ta"])
        .select("ta", "tb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            prs.join(sk, sk["event_type"] == prs["tb"]).select(
                "ta", "tb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
            )
        )
    )
    uni = tagged.groupBy("ta", "tb", "h").agg(
        F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")
    )
    ranked = uni.withColumn(
        "r", F.row_number().over(Window.partitionBy("ta", "tb").orderBy("h"))
    ).filter(F.col("r") <= 64)
    agg = ranked.groupBy("ta", "tb").agg(
        F.count("*").alias("cnt"),
        F.max("h").alias("hk"),
        F.sum(((F.col("in_a") == 1) & (F.col("in_b") == 1)).cast("int")).alias("c"),
    )
    du = ev.select("event_type", "user_id").distinct()
    exact = (
        du.alias("a")
        .join(
            du.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("ta"), F.col("b.event_type").alias("tb")
        )
        .agg(F.count("*").alias("exact_overlap"))
    )
    union_est = F.when(
        F.col("cnt") < 64, F.col("cnt").cast("double")
    ).otherwise(
        F.lit(63.0) * F.lit(1152921504606846976).cast("double") / F.col("hk")
    )
    return (
        agg.join(exact, ["ta", "tb"], "left")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            F.floor((F.col("c") / F.col("cnt").cast("double")) * union_est)
            .cast("bigint")
            .alias("approx_overlap"),
            F.round(F.col("c") / F.col("cnt").cast("double"), 6).alias(
                "jaccard_est"
            ),
            F.coalesce("exact_overlap", F.lit(0))
            .cast("bigint")
            .alias("exact_overlap"),
        )
        .orderBy("type_a", "type_b")
    )


# --- k-anonymity audit (privacy gate) ----------------------------------------
@query(
    "events_k_anonymity",
    sql="""
    WITH q AS (
      SELECT event_type, date_trunc('day', ts) AS d,
             CAST(floor(value / 100.0) AS BIGINT) AS value_bucket,
             user_id
      FROM events
    ),
    eq AS (
      SELECT event_type, d, value_bucket,
             count(*) AS n_rows, count(DISTINCT user_id) AS n_users
      FROM q GROUP BY 1, 2, 3
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_classes,
           CAST(sum(CASE WHEN n_users < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS classes_below_k,
           CAST(sum(CASE WHEN n_users < 5 THEN n_rows ELSE 0 END) AS BIGINT)
             AS rows_to_suppress,
           CAST(min(n_users) AS BIGINT) AS min_class_users
    FROM eq GROUP BY event_type
    ORDER BY event_type
    """,
    survey_ops="pipeline-privacy(ext),D2,D8",
    tables=("events",),
)
def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier tuple — the privacy gate
    a dataset must pass before release, and right-to-forget's sibling in
    the governance family: every equivalence class of
    (event_type, day, coarse value bucket) must contain >= k = 5
    distinct users, else its rows need suppression or coarsening. The
    report gives, per type, the class count, the classes below k, the
    row mass a suppression pass would drop, and the worst class — the
    numbers a release decision is actually made on.

    Scale shape: one partial-aggregable groupBy on the quasi-identifier
    (class count is bounded by the QI domain, far below row count), then
    a per-type rollup of the bounded class table; nothing user-keyed
    ever shuffles except inside COUNT(DISTINCT)'s Expand, which stays
    one scan."""
    ev = spark.table("events")
    q = ev.select(
        "event_type",
        F.date_trunc("day", "ts").alias("d"),
        F.floor(F.col("value") / 100.0).cast("bigint").alias("value_bucket"),
        "user_id",
    )
    eq = q.groupBy("event_type", "d", "value_bucket").agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("user_id").alias("n_users"),
    )
    return (
        eq.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_classes"),
            F.sum((F.col("n_users") < 5).cast("int"))
            .cast("bigint")
            .alias("classes_below_k"),
            F.sum(F.when(F.col("n_users") < 5, F.col("n_rows")).otherwise(0))
            .cast("bigint")
            .alias("rows_to_suppress"),
            F.min("n_users").cast("bigint").alias("min_class_users"),
        )
        .orderBy("event_type")
    )
