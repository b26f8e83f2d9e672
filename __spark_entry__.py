"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship query smoke on sf0.001
queries()    — every implemented operator from SURVEY.md §2 (name -> fn)
oracle_sql() — matching DuckDB ANSI SQL per query (value-hash oracle)

All real logic lives in the esco_neo4j_spark package; this file only
adapts the registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from esco_neo4j_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: top parts by lineitem
    count — the AQ:38-41 'skills with most ESSENTIAL_FOR relationships'
    shape (scan -> join -> groupBy count -> top-k)."""
    return REGISTRY["aq_top_parts_by_lines"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator query (SURVEY.md §2)."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query — including the
    iterative and approximate operators (pagerank, LPA, betweenness,
    LSH/IVF, k-means, HITS, Luby MIS, Louvain, Boruvka MSF), which carry
    unrolled/closed-form oracles, and — since round 5 — the HLL rollup
    (md5-register replay) and GK quantile rollup (lossless-regime exact
    rank pick). Only 1 remains rows-only: the zlib compression ratio
    (udf_compression_ratio), inherently implementation-specific and
    golden-tested against plain-Python zlib in tests/ instead.

    Scale-adaptive queries (LSH banding, SemDeDup k) register a per-sf
    SQL BUILDER instead of a static string; it is resolved here against
    the driver's correctness scale (sf0.01 — override with
    SPARK_GRAFT_ORACLE_SF_DIR) so the oracle's derived constants match
    the Spark plan the driver runs at the same scale. The local mirror
    test resolves the same builders at its own sf dir."""
    from esco_neo4j_spark.plans.registry import resolve_sql

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    return {
        name: resolve_sql(q, sf_dir)
        for name, q in REGISTRY.items()
        if q.sql is not None
    }
