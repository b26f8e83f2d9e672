"""Date-partitioned layout + small-file compaction — the scan-pruning and
file-hygiene half of the storage story (bucketing in sources/bucketed.py
is the join half).

At 100 TB an events table is append-only and time-filtered in almost
every query; laying it out as ``event_date=YYYY-MM-DD/`` directories
turns those filters into PARTITION PRUNING — directories that can't match
are never listed, let alone read. tests/test_plan_quality.py pins the
plan property (PartitionFilters on the scan, partition count == matched
days).

Compaction is the other side of the same coin: streaming/incremental
writers produce many small files per partition, and at scale the
scheduler + scan overhead of tiny files dominates I/O. ``compact_parquet``
rewrites a table directory to ~target-size files with the same crash-safe
rename swap as sources/merge.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from esco_neo4j_spark.catalog import load_table
from esco_neo4j_spark.sources.bucketed import BUCKETED_ROOT, _digest


def ensure_partitioned_events(spark: SparkSession, sf_dir: str) -> str:
    """Write the events table re-laid-out as event_date partitions (once
    per sf_dir per machine; the _SUCCESS marker makes reuse safe across
    sessions — partition metadata lives in the directory names, unlike
    bucket metadata, so a fresh session can trust the files)."""
    out = os.path.join(BUCKETED_ROOT, _digest(sf_dir, 0), "events_by_date")
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "events")
            .withColumn("event_date", F.to_date("ts"))
            .repartition("event_date")  # one writer per partition -> one file
            .write.mode("overwrite")
            .partitionBy("event_date")
            .parquet(out)
        )
    return out


def compact_parquet(
    spark: SparkSession, path: str, target_bytes: int = 128 * 1024 * 1024
) -> int:
    """Rewrite a parquet directory into ceil(size/target) evenly-sized
    files (crash-safe swap). Returns the resulting file count.

    Local stand-in for the maintenance job every 100 TB deployment runs;
    on a partitioned table, run per partition so only dirty partitions
    rewrite."""
    size = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-size // target_bytes))
    df = spark.read.parquet(path)
    tmp, old = path + "__compacting", path + "__old"
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return sum(
        1
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


def events_by_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(ensure_partitioned_events(spark, sf_dir))
