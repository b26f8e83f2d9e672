"""Table catalog for the driver's synthetic star schema and derived views.

The reference's catalog is implicit (Neo4j labels; reference:
src/esco_ingest.py:70-74). Here, a catalog maps table name -> Parquet path
and registers temp views so queries can be written in either DataFrame API
or SQL. Reads are plain ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning on every scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def _fix_nanos(df: DataFrame) -> DataFrame:
    """Normalize the event-time column to a session-timezone TIMESTAMP
    regardless of how the parquet writer encoded it:

    - nanosecond int64 (read as long via
      spark.sql.legacy.parquet.nanosAsLong): ns floor-div 1000 -> µs
      timestamp. Integer 'div' keeps full precision (ns epoch values
      exceed 2^53, so a double division would corrupt them).
    - TIMESTAMP_NTZ (µs parquet with isAdjustedToUTC=false): cast to
      TIMESTAMP. The session timezone is pinned to UTC (session.tune), so
      the wall-clock value is reinterpreted as UTC — exactly what the
      DuckDB oracle's naive-timestamp arithmetic sees — and downstream
      uses of unix_micros / window() / date_format stay valid.
    """
    from pyspark.sql import functions as F

    dt = dict(df.dtypes).get("ts")
    if dt == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dt == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return _fix_nanos(spark.read.parquet(table_path(sf_dir, name)))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TPCH_TABLES
) -> dict[str, DataFrame]:
    """Load tables as DataFrames and register them as temp views."""
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
