"""Query registry: name -> (PySpark callable, DuckDB oracle SQL).

Contract (driver's __spark_entry__.py): every callable takes
(spark, sf_dir) and returns a DataFrame; the oracle SQL runs on the same
parquet tables registered as DuckDB views. Column names are aliased
identically on both sides (the driver sorts columns by name before
hashing values).

Determinism conventions used by every query here:
- float outputs rounded (money 2dp, ratios/scores 6dp) — Spark and DuckDB
  agree to ~1 ulp in double, so rounding makes hashes stable;
- every LIMIT is preceded by a total order (explicit tiebreak columns);
- timestamps are emitted as formatted UTC strings;
- collected sets are sorted and joined to a single string.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from esco_neo4j_spark.catalog import load_tables
from esco_neo4j_spark.session import tune


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    # DuckDB oracle; None => rows-only check (non-SQL op). A CALLABLE
    # (sf_dir -> str) marks a scale-adaptive query whose oracle SQL is
    # built per data directory — the builder derives its constants (LSH
    # n_planes/n_tables, SemDeDup k) from the same parquet-metadata row
    # count the Spark plan uses, so both engines replay identical
    # literals at every scale. Resolve with resolve_sql().
    sql: str | Callable[[str], str] | None
    survey_ops: str = ""  # SURVEY.md §2 operator ids covered
    bench: bool = False  # include in bench.py headline set
    tables: tuple[str, ...] = field(default_factory=tuple)
    esco: bool = False  # query runs on the ESCO warehouse, not sf_dir tables


REGISTRY: dict[str, Query] = {}


def resolve_sql(q: Query, sf_dir: str) -> str | None:
    """Oracle SQL for ``q`` against the tables in ``sf_dir`` — static
    strings pass through; scale-adaptive builders are invoked with the
    directory so their derived constants match the Spark plan's."""
    return q.sql(sf_dir) if callable(q.sql) else q.sql


def query(
    name: str,
    sql: str | None,
    survey_ops: str = "",
    bench: bool = False,
    tables: tuple[str, ...] = (),
    esco: bool = False,
):
    """Decorator: register a (spark, sf_dir) callable under ``name``.

    The wrapper loads + registers the needed tables as temp views and
    re-applies runtime engine conf (UTC, AQE) to the caller's session.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def target(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)
            if esco:
                # ESCO-warehouse queries ignore sf_dir: they run on the
                # ingested reference graph (sources/esco.py); the oracle
                # SQL reads the same warehouse parquet by absolute path.
                from esco_neo4j_spark.sources import ensure_warehouse, load_graph

                load_graph(spark, ensure_warehouse(spark))
            elif tables:
                load_tables(spark, sf_dir, tables)
            else:
                load_tables(spark, sf_dir)
            return fn(spark, sf_dir)

        target.__name__ = name
        target.__doc__ = fn.__doc__  # keep the operator doc introspectable
        REGISTRY[name] = Query(
            name=name, fn=target, sql=sql, survey_ops=survey_ops,
            bench=bench, tables=tables, esco=esco,
        )
        return target

    return deco
