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
    """Load tables as DataFrames and register them as temp views.

    Stamp-validated per-session DataFrame cache (r6): every registered
    query's wrapper calls this, and re-deriving the full TPC-H set costs
    ~1.1s of driver-side parquet-footer reads + relation analysis PER
    CALL — a hidden fixed tax on every query invocation. The DataFrame
    is reused only when the file stamp (path, mtime, size — the
    rowcount cache's identity) is unchanged, so switching sf dirs or
    rewriting a table in place (tools/gen_scale_data.py) re-derives
    correctly. The temp VIEW is re-registered every call regardless —
    registration is a cheap catalog-map update, and tests legitimately
    shadow/drop these names around fixtures."""
    cache = getattr(spark, "_sf_view_cache", None)
    if cache is None:
        cache = spark._sf_view_cache = {}
    out: dict[str, DataFrame] = {}
    for name in names:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        stamp = _path_stamp(path)
        hit = cache.get(name)
        if hit is not None and hit[0] == stamp:
            df = hit[1]
        else:
            df = load_table(spark, sf_dir, name)
            cache[name] = (stamp, df)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


# keyed on (path, mtime_ns, size) — not path alone — so a table
# regenerated in place within one process (tooling rewriting a scale dir
# between building a Spark plan and resolving its oracle) invalidates
# naturally instead of silently desynchronizing the derived LSH/SemDeDup
# parameters between engines (r5 ADVICE).
_ROWCOUNT_CACHE: dict[tuple[str, int, int], int] = {}


def _path_stamp(path: str) -> tuple[str, int, int]:
    if os.path.isdir(path):
        parts = [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
        mtime = max((os.stat(p).st_mtime_ns for p in parts), default=0)
        size = sum(os.stat(p).st_size for p in parts)
    else:
        st = os.stat(path)
        mtime, size = st.st_mtime_ns, st.st_size
    return (path, mtime, size)


def table_rowcount(sf_dir: str, name: str) -> int:
    """Row count of a table from PARQUET FOOTER METADATA only — no scan,
    no Spark job, no DuckDB query. This is the corpus-size estimate the
    scale-adaptive operators (LSH banding, SemDeDup cluster count) derive
    their parameters from: because it is pure file metadata, the Spark
    plan builder and the DuckDB oracle-SQL builder read the IDENTICAL
    number, so derived parameters stay in lockstep by construction.

    Handles both a single ``table.parquet`` file and a Spark-written
    directory of part files (sums the parts). At warehouse scale the same
    number comes from the table format's manifest (Delta/Iceberg
    snapshot row counts) — still metadata, still no scan."""
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    stamp = _path_stamp(path)
    if stamp in _ROWCOUNT_CACHE:
        return _ROWCOUNT_CACHE[stamp]
    if os.path.isdir(path):
        n = sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        )
    else:
        n = pq.ParquetFile(path).metadata.num_rows
    _ROWCOUNT_CACHE[stamp] = n
    return n


_COLMAX_CACHE: dict[tuple[str, int, int, str], "int | None"] = {}


def table_column_max(sf_dir: str, name: str, column: str):
    """Maximum value of an integer column from PARQUET FOOTER COLUMN
    STATISTICS only — no scan, same lockstep property as
    ``table_rowcount`` (the Spark plan builder and the DuckDB oracle
    builder read the identical number from the identical footers).
    Returns ``None`` when any row group lacks statistics for the column
    (callers must treat that as "unbounded" and guard conservatively).

    Used by overflow guards on id-derived integer hashes (e.g. the
    layered graph search's multiplicative level coin, which is exact
    int64 only while ``max(vec_id) * 2654435761 < 2**63``)."""
    import pyarrow.parquet as pq

    path = table_path(sf_dir, name)
    stamp = _path_stamp(path)
    key = (*stamp, column)
    if key in _COLMAX_CACHE:
        return _COLMAX_CACHE[key]
    if os.path.isdir(path):
        files = [
            os.path.join(path, f)
            for f in sorted(os.listdir(path))
            if f.endswith(".parquet")
        ]
    else:
        files = [path]
    mx = None
    for fp in files:
        md = pq.ParquetFile(fp).metadata
        try:
            ci = md.schema.names.index(column)
        except ValueError:
            _COLMAX_CACHE[key] = None
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                _COLMAX_CACHE[key] = None
                return None
            mx = st.max if mx is None else max(mx, st.max)
    _COLMAX_CACHE[key] = mx
    return mx
