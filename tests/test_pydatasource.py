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
