"""Z-order (Morton-curve) clustering layout — multi-dimensional data
skipping for the storage story.

Partition directories prune on ONE dimension (sources/partitioned.py) and
a sort clusters on ONE leading column; queries that filter on TWO
dimensions (user AND value band, tenant AND time, lat AND lon) get
locality on neither from either. Interleaving the bits of both columns
into one Morton key and range-partitioning + sorting on it clusters rows
so that any 2-D predicate box touches a small fraction of files, and
parquet min/max row-group statistics (which Spark's scan consults for
pushdown) become tight on BOTH columns at once — the technique behind
Delta/Iceberg `OPTIMIZE ZORDER BY` (public docs), expressed here as plain
column arithmetic + repartitionByRange.

The z key is layout metadata only: it never changes results, so the
verification is a locality test (tests/test_zorder.py pins that a 2-D box
query touches strictly fewer files under z-order than under a 1-D sort)
— plan/layout property, same stance as the bucketing and partition-
pruning tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def z_value(cx: Column, cy: Column, bits: int = 8) -> Column:
    """Morton interleave of the low ``bits`` of two non-negative integer
    columns (values are first clamped into [0, 2^bits) by masking — at
    scale the inputs are pre-bucketed ranks or quantile codes, which
    also handles skew: equi-depth codes spread hot values across cells).

    Pure integer shift/mask expressions — whole-stage codegen, no UDF.
    """
    mask = (1 << bits) - 1
    x = cx.cast("bigint").bitwiseAND(F.lit(mask))
    y = cy.cast("bigint").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cx: str,
    cy: str,
    n_files: int = 16,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Rewrite a table clustered on the Morton key of (cx, cy):
    repartitionByRange on z (range partitioner = contiguous curve
    segments per file) + sortWithinPartitions so row groups inside each
    file are tight too. The z column itself is dropped before writing —
    it is derivable layout metadata, not data."""
    z = z_value(F.col(cx), F.col(cy), bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
