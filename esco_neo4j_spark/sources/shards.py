"""Training-shard sink: land a sharded corpus as one partition directory
per shard plus a verified manifest.

The shard ASSIGNMENT is query logic (plans/corpus_queries.py:
text_global_shuffle derives a deterministic md5-salted global order and
a shard id); this module is the physical leg a trainer consumes: hive-
partitioned parquet (`shard_id=K/`) so a data loader reads exactly its
shard via partition pruning, and a `_SHARDS_MANIFEST.json` whose per-
shard document/token counts are recomputed FROM THE LANDED FILES — the
manifest certifies what is on disk, not what the plan intended (a
failed task retry or a lost partition shows up as a count mismatch
here, not in a training run three days later).

At 100 TB: the write is one shuffle on shard_id (each shard lands as
its own directory, parallel within shards via the natural partition
count); the manifest pass is footer metadata + a bounded aggregate.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_NAME = "_SHARDS_MANIFEST.json"  # leading _: Spark file listings skip it


def write_token_shards(
    df: DataFrame,
    out_dir: str,
    shard_col: str = "shard_id",
    tokens_col: str = "n_tokens",
) -> dict:
    """Write ``df`` hive-partitioned by ``shard_col`` and return (and
    persist) the landed manifest {shard: {docs, tokens}, totals}."""
    df.write.mode("overwrite").partitionBy(shard_col).parquet(out_dir)
    landed = df.sparkSession.read.parquet(out_dir)
    rows = (
        landed.groupBy(shard_col)
        .agg(
            F.count("*").cast("bigint").alias("docs"),
            F.sum(tokens_col).cast("bigint").alias("tokens"),
        )
        .collect()
    )
    shards = {
        int(r[shard_col]): {"docs": r["docs"], "tokens": r["tokens"]}
        for r in rows
    }
    manifest = {
        "shards": {str(k): v for k, v in sorted(shards.items())},
        "n_shards": len(shards),
        "total_docs": sum(v["docs"] for v in shards.values()),
        "total_tokens": sum(v["tokens"] for v in shards.values()),
        # column names ride in the manifest so verify_shards checks the
        # corpus as written, whatever names the writer used
        "shard_col": shard_col,
        "tokens_col": tokens_col,
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    return manifest


def read_shard(
    spark: SparkSession,
    out_dir: str,
    shard_id: int,
    shard_col: str = "shard_id",
) -> DataFrame:
    """One shard, via partition pruning — the data-loader read path."""
    return spark.read.parquet(out_dir).filter(
        F.col(shard_col) == shard_id
    )


def verify_shards(spark: SparkSession, out_dir: str) -> dict:
    """Re-derive the landed counts and diff them against the manifest —
    the integrity check a training job runs before consuming a corpus.
    Column names come FROM the manifest (write_token_shards records
    them), so a corpus written with non-default shard/token columns
    verifies against the same columns it was sharded on. Returns
    {'ok': bool, 'mismatches': [...]}."""
    with open(os.path.join(out_dir, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    shard_col = manifest.get("shard_col", "shard_id")
    tokens_col = manifest.get("tokens_col", "n_tokens")
    landed = spark.read.parquet(out_dir)
    rows = (
        landed.groupBy(shard_col)
        .agg(
            F.count("*").cast("bigint").alias("docs"),
            F.sum(tokens_col).cast("bigint").alias("tokens"),
        )
        .collect()
    )
    got = {
        str(int(r[shard_col])): {"docs": r["docs"], "tokens": r["tokens"]}
        for r in rows
    }
    mismatches = [
        k
        for k in set(got) | set(manifest["shards"])
        if got.get(k) != manifest["shards"].get(k)
    ]
    return {"ok": not mismatches, "mismatches": sorted(mismatches)}
