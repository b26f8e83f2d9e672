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


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salts: int = 32,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with manual key salting — the fix for the case AQE's
    skew-split cannot handle: ONE join key so hot that a single shuffle
    partition exceeds an executor, while the other side is too large to
    broadcast. The big side gets a per-row salt in [0, n_salts); the
    small side is replicated once per salt value; joining on
    (keys + salt) spreads the hot key over n_salts partitions. Output
    rows are identical to the unsalted join (salts match by
    construction), so this is a pure physical rewrite — n_salts× small-
    side duplication buys n_salts× hot-key parallelism.

    The salt is a deterministic hash of the big side's full row, so the
    plan stays reproducible run to run (F.rand would not be); rows of a
    hot key spread as long as ANY non-key column varies, which is what
    makes a key hot in practice. (A key whose rows are bit-identical
    duplicates should be pre-aggregated, not salted.)
    """
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return big_s.join(small_s, [*keys, "_salt"], how).drop("_salt")
