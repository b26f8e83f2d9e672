"""Custom Python DataSource: determinism, partition independence, and
schema contract of the synthetic-events generator."""

from __future__ import annotations

from pyspark.sql import functions as F

from esco_neo4j_spark.sources.pydatasource import register


def _load(spark, **opts):
    register(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_synthetic_events_schema_and_count(spark):
    df = _load(spark, n_rows=500, n_users=50, n_partitions=4)
    assert df.columns == [
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]
    assert df.count() == 500
    stats = df.agg(
        F.count_distinct("event_id").alias("ids"),
        F.max("user_id").alias("maxu"),
        F.min("value").alias("minv"),
    ).collect()[0]
    assert stats["ids"] == 500
    assert stats["maxu"] < 50
    assert stats["minv"] >= 0.0


def test_synthetic_events_partition_invariance(spark):
    """Row i is identical no matter how the range is partitioned — the
    generator is pure id arithmetic, not RNG state."""
    a = sorted(tuple(r) for r in _load(spark, n_rows=300, n_partitions=2).collect())
    b = sorted(tuple(r) for r in _load(spark, n_rows=300, n_partitions=7).collect())
    assert a == b


def test_synthetic_events_parallel_read(spark):
    df = _load(spark, n_rows=1000, n_partitions=8)
    assert df.rdd.getNumPartitions() == 8


def test_stream_reader_is_prefix_identity_of_batch(spark, tmp_path):
    """Streaming 3 micro-batches must produce EXACTLY rows [0, 300) of
    the batch scan — the stream/batch identity the shared _event_row
    sequence guarantees."""
    from esco_neo4j_spark.sources.pydatasource import register

    register(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 100).option("n_users", 100).load()
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds").start()
    )
    def _count(path):
        try:
            return spark.read.parquet(path).count()
        except Exception:
            return 0

    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline and _count(out) < 300:
            time.sleep(0.5)
    finally:
        q.stop()
    streamed = spark.read.parquet(out)
    n = streamed.count()
    if n < 300:
        import pytest

        pytest.fail(
            f"TIMEOUT (not a prefix-identity violation): the stream "
            f"committed only {n} rows within the 60s deadline (needed "
            f"300 = 3 micro-batches) — machine too slow/loaded; the "
            f"identity and exactly-once assertions below never ran"
        )
    batch = (
        spark.read.format("synthetic_events")
        .option("n_rows", n).option("n_users", 100).load()
    )
    assert streamed.orderBy("event_id").collect() == (
        batch.orderBy("event_id").collect()
    )
    # exactly-once across restart: resume from the checkpoint, take more
    # batches, and verify no event_id is duplicated or skipped
    q2 = (
        spark.readStream.format("synthetic_events")
        .option("rows_per_batch", 100).option("n_users", 100).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds").start()
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline and _count(out) < n + 200:
            time.sleep(0.5)
    finally:
        q2.stop()
    final = spark.read.parquet(out)
    total = final.count()
    ids = final.select("event_id").distinct().count()
    assert total == ids, "restart must not duplicate any offset window"
    assert final.agg({"event_id": "max"}).collect()[0][0] == total - 1
