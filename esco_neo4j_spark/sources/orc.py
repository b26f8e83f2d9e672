"""ORC source + sink — the columnar interchange twin of the parquet path
(Spark ships the ORC reader/writer natively; Hive-ecosystem corpora
frequently arrive as ORC).

Why this exists in an LLM-pipeline engine: 100 TB corpora are rarely one
format — the ingest edge must read whatever the upstream warehouse wrote
(ORC from Hive/Trino ETL, parquet from Spark ETL, JSONL from crawlers)
into ONE internal layout. This module carries the ORC leg with the same
design rules as the parquet path:

- **Predicate/column pushdown parity.** Spark's ORC vectorized reader
  supports the same PushedFilters + ReadSchema pruning as parquet
  (pinned in tests/test_orc.py by explain inspection) — a filtered scan
  must not read all stripes or all columns.
- **Schema fidelity, not inference.** ORC files carry their types; the
  round-trip test pins value-level equality against the parquet twin of
  the same table (timestamps normalized UTC by the session conf).
- **Sink mirrors the JSONL sink's rules**: never coalesce to one file;
  compaction is a separate job (sources/partitioned.py), not the
  writer's.

The reference ingests CSV only (src/esco_ingest.py:80-91); ORC is an
extension of its A1 scan surface, same as sources/jsonl.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(
    spark: SparkSession, path: str, columns: list[str] | None = None
) -> DataFrame:
    """Scan an ORC table; optional column projection (pruned at the
    stripe reader, not post-scan)."""
    df = spark.read.orc(path)
    return df.select(*columns) if columns else df


def write_orc(
    df: DataFrame, path: str, mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write as ORC; optional hive-style partitioning (same partition
    pruning contract as the parquet sink)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def parquet_to_orc(spark: SparkSession, src: str, dst: str) -> int:
    """Format-migration helper: one distributed pass, no collect.
    Returns the row count written (from the re-read, so the count
    verifies the landed files, not the plan)."""
    write_orc(spark.read.parquet(src), dst)
    return spark.read.orc(dst).count()
