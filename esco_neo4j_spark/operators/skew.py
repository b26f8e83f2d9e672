"""Skew guards for self-join fan-out (the 100 TB safety belt).

A self-join on key K emits ~n_k^2 pairs per key value; one hot key (a
mega-order, a boilerplate document, an occupation linked to every skill)
can dominate the whole job. ``cap_key_fanout`` drops key groups above a
fan-out cap deterministically — the same hot-bucket guard as
``lsh_candidate_pairs``'s ``max_bucket`` (operators/dedup.py), applied to
the exact co-occurrence queries. The windowed count runs over the same
shuffle key the subsequent self-join uses, so AQE reuses the exchange.

Because the guard is deterministic (a pure function of group size), the
DuckDB oracle mirrors it with ``QUALIFY count(*) OVER (PARTITION BY key)
<= cap`` and results stay value-hash-exact at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# High enough that legitimate analytic keys (TPC-H orders: <= 7 lines;
# ESCO occupations: tens of skills) are never touched; low enough that a
# degenerate key cannot emit more than ~cap^2/2 pairs.
DEFAULT_MAX_FANOUT = 256


def cap_key_fanout(
    df: DataFrame, keys: list[str], max_fanout: int = DEFAULT_MAX_FANOUT
) -> DataFrame:
    """Drop rows whose key group exceeds ``max_fanout`` rows."""
    w = Window.partitionBy(*keys)
    return (
        df.withColumn("_fanout", F.count("*").over(w))
        .filter(F.col("_fanout") <= max_fanout)
        .drop("_fanout")
    )
