"""Bucketed table layout: the shuffle-elimination half of the storage story.

The reference has no physical layout control at all (Neo4j owns storage);
at 100 TB the single most expensive repeated cost in a warehouse is
re-shuffling the same fact tables on the same join key for every query.
Bucketing pre-hashes rows into a fixed number of files per table at WRITE
time (Spark's ``bucketBy``, Murmur3 on the key), so any join or
aggregation on the bucket key reads co-located partitions and skips the
exchange entirely — pay one shuffle at ingest, amortize it over every
downstream query.

Local detail that matters at scale too: rows are ``repartition(n, key)``-ed
before the write so partition i holds exactly bucket i (same Murmur3 pmod
both sides), giving ONE file per bucket — which is what lets Spark trust
the per-file sort order and skip the SortMergeJoin's sort as well.

tests/test_plan_quality.py pins the plan property this module exists for:
a join of two bucketed tables on the bucket key has ZERO Exchange nodes.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F  # noqa: F401  (re-exported for callers)

from esco_neo4j_spark.catalog import load_table

BUCKETED_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".bucketed",
)

# fact table -> join/bucket key (the key every heavy query joins on)
BUCKET_KEYS = {"orders": "o_orderkey", "lineitem": "l_orderkey"}


def _digest(sf_dir: str, n_buckets: int) -> str:
    return hashlib.md5(f"{sf_dir}|{n_buckets}".encode()).hexdigest()[:8]


def bucketed_name(table: str, sf_dir: str, n_buckets: int) -> str:
    return f"bkt_{table}_{_digest(sf_dir, n_buckets)}"


def ensure_bucketed(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[str, ...] = ("orders", "lineitem"),
    n_buckets: int = 8,
) -> dict[str, str]:
    """Write ``tables`` as bucketed+sorted tables (once per (sf_dir,
    n_buckets) per session) and return {table: catalog_name}.

    The catalog entry is per-session (in-memory catalog); the files are
    external under BUCKETED_ROOT, so a fresh session re-registers by
    rewriting — bucket metadata lives in the catalog, not the files, and
    a table whose metadata is lost cannot be trusted as bucketed.
    """
    out: dict[str, str] = {}
    for table in tables:
        key = BUCKET_KEYS[table]
        name = bucketed_name(table, sf_dir, n_buckets)
        if not spark.catalog.tableExists(name):
            loc = os.path.join(BUCKETED_ROOT, _digest(sf_dir, n_buckets), table)
            (
                load_table(spark, sf_dir, table)
                .repartition(n_buckets, key)
                .write.mode("overwrite")
                .format("parquet")
                .bucketBy(n_buckets, key)
                .sortBy(key)
                .option("path", loc)
                .saveAsTable(name)
            )
        out[table] = name
    return out
