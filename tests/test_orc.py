"""ORC source/sink: round-trip fidelity vs the parquet twin + pushdown
pinning (the scan must prune columns and push filters into the ORC
reader exactly like the parquet path)."""

from __future__ import annotations

import contextlib
import io
import os

from pyspark.sql import functions as F

from esco_neo4j_spark.sources.orc import parquet_to_orc, read_orc, write_orc

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_orc_roundtrip_matches_parquet(spark, tmp_path):
    src = os.path.join(SF_DIR, "orders.parquet")
    dst = str(tmp_path / "orders_orc")
    n = parquet_to_orc(spark, src, dst)
    pq = spark.read.parquet(src)
    orc = read_orc(spark, dst)
    assert n == pq.count()
    assert orc.schema == pq.schema
    key = [c for c in pq.columns]
    a = [tuple(r) for r in pq.orderBy("o_orderkey").collect()]
    b = [tuple(r) for r in orc.orderBy("o_orderkey").collect()]
    assert a == b


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    dst = str(tmp_path / "li_orc")
    write_orc(
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")), dst
    )
    q = read_orc(spark, dst, columns=["l_orderkey", "l_quantity"]).filter(
        F.col("l_quantity") > 30
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters" in plan and "l_quantity" in plan.split(
        "PushedFilters"
    )[1].splitlines()[0], "filter must reach the ORC stripe reader"
    sched = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "l_orderkey" in sched and "l_quantity" in sched
    assert "l_comment" not in sched, "scan must prune unused columns"


def test_orc_partitioned_write_prunes_partitions(spark, tmp_path):
    dst = str(tmp_path / "events_orc")
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    write_orc(
        ev.withColumn("d", F.to_date("ts")), dst, partition_by=["d"]
    )
    one_day = spark.read.orc(dst).filter(
        F.col("d") == spark.read.orc(dst).agg(F.min("d")).first()[0]
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one_day.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
    assert one_day.count() > 0
