"""Mirror of the driver's correctness gate: run every registered query on
Spark AND its DuckDB oracle SQL over the same parquet tables; compare row
count, column names, and (order-insensitively) every value EXACTLY — the
driver hashes values, so approximate equality is not good enough.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from esco_neo4j_spark.plans import REGISTRY
from esco_neo4j_spark.plans.registry import resolve_sql

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.sql is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in REGISTRY.items() if q.sql is None)


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _norm_value(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, name):
    q = REGISTRY[name]
    sdf = q.fn(spark, SF_DIR)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck_con(SF_DIR)
    try:
        res = con.execute(resolve_sql(q, SF_DIR))
        d_cols = [d[0] for d in res.description]
        d_rows = res.fetchall()
    finally:
        con.close()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: column mismatch spark={s_cols} duck={d_cols}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}"
    )
    sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    mismatches = [
        (a, b) for a, b in zip(sn, dn) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )


def test_no_rows_only_queries_remain():
    """Since r6 every registered query carries a value oracle (the zlib
    compression ratio was the last rows-only survivor — its builder now
    embeds plain-Python byte counts as a VALUES literal). This pin keeps
    the invariant: a new rows-only registration must be a deliberate,
    documented decision, not an accident."""
    assert ROWS_ONLY_QUERIES == []
