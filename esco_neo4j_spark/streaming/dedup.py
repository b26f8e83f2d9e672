"""Streaming near-duplicate gate: incremental MinHash dedup on ingest.

The batch dedup family answers "which documents in this corpus are
near-dups"; a production ingestion pipeline asks the INCREMENTAL form on
every arriving micro-batch: "is this new document a near-dup of anything
already accepted?" — and must never re-deduplicate the world
(operators/dedup.minhash_incremental_pairs is the batch face of the same
idea). This module is the Structured Streaming face:

- a persistent BAND INDEX (parquet) holds, for every accepted document,
  its banded MinHash keys and its shingle set;
- each micro-batch computes signatures for its documents, probes the
  index with the banded equi-join (plus a within-batch self-join that
  collapses each batch near-dup cluster to its min id), verifies
  candidates with exact shingle Jaccard, and appends only SURVIVORS to
  the output and to the index;
- every write is a keyed upsert (sources/merge.py), and self-pairs are
  excluded from the probe, so a replayed micro-batch reaches the same
  decisions against a partially-updated index — effectively-once on
  foreachBatch's at-least-once delivery, the same recipe as
  upsert_sink/cms_sketch_sink.

Scale shape: per batch, work = |batch| x bucket width (banded equi-join
against the index; the index side is read pruned to the probe's band
keys by the join), never |corpus|^2. The index grows linearly with the
ACCEPTED corpus; at 100 TB it would be bucketed/partitioned by band_key
so each micro-batch's probe prunes to matching files.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from esco_neo4j_spark.operators.dedup import (
    _banded_keys,
    _minhash_sig_from_hashed,
    md5_int28,
    shingled,
)
from esco_neo4j_spark.sources.merge import upsert_parquet


def _paths(index_dir: str) -> tuple[str, str]:
    return os.path.join(index_dir, "bands"), os.path.join(index_dir, "docs")


def process_neardup_batch(
    batch_df: DataFrame,
    index_dir: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket: int | None = 64,
) -> int:
    """Process ONE micro-batch through the near-dup gate; returns the
    survivor count. Public so tests (and backfills) can drive batches
    without a streaming query. Semantics: a batch document is dropped
    iff it has a verified partner (exact shingle Jaccard >= threshold
    among banded candidates) that is either (a) any already-accepted
    index document, or (b) a SMALLER-id document of the same batch —
    i.e. each within-batch near-dup cluster keeps its min id, exactly
    the pair semantics of minhash_incremental_pairs' output."""
    bands_path, docs_path = _paths(index_dir)
    spark = batch_df.sparkSession
    rows_per_band = num_hashes // bands

    batch = batch_df.dropDuplicates([id_col])
    sh = shingled(batch, text_col, id_col, shingle_n)
    hashed = sh.select("id", F.transform("sh", md5_int28).alias("hs"))
    sigs = _minhash_sig_from_hashed(hashed, num_hashes)
    banded = _banded_keys(sigs, bands, rows_per_band, max_bucket)
    # several probes below: materialize once (small: |batch| x bands)
    banded = banded.localCheckpoint(eager=True)
    sh = sh.localCheckpoint(eager=True)

    def verified(cands: DataFrame, other_sh: DataFrame) -> DataFrame:
        """(id_new, id_other) candidates -> distinct dup id_new after the
        exact-Jaccard verify."""
        inter = F.size(F.array_intersect("sa", "sb")).cast("double")
        union = F.size(F.array_union("sa", "sb")).cast("double")
        return (
            cands.join(
                sh.select(F.col("id").alias("id_new"), F.col("sh").alias("sa")),
                "id_new",
            )
            .join(
                other_sh.select(
                    F.col("id").alias("id_other"), F.col("sh").alias("sb")
                ),
                "id_other",
            )
            .filter(F.round(inter / union, 6) >= threshold)
            .select("id_new")
            .distinct()
        )

    dup_ids = None
    if os.path.exists(bands_path):
        base_bands = spark.read.parquet(bands_path)
        base_docs = spark.read.parquet(docs_path)
        cand_base = (
            banded.alias("a")
            .join(
                base_bands.alias("b"),
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_key") == F.col("b.band_key"))
                # self-exclusion makes a REPLAYED batch (whose survivors
                # already sit in the index) reach the same decisions
                & (F.col("a.id") != F.col("b.id")),
            )
            .select(
                F.col("a.id").alias("id_new"), F.col("b.id").alias("id_other")
            )
            .distinct()
        )
        dup_ids = verified(cand_base, base_docs)
    # within-batch: the LARGER id of a verified pair drops
    cand_in = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") > F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_new"), F.col("b.id").alias("id_other"))
        .distinct()
    )
    dup_in = verified(cand_in, sh)
    dup_ids = dup_in if dup_ids is None else dup_ids.union(dup_in).distinct()

    survivor_ids = (
        sh.select("id").join(dup_ids, sh["id"] == dup_ids["id_new"], "left_anti")
    )
    # materialize BEFORE the writes: the upserts below REPLACE the index
    # directories (rename swap), and a lazy survivor_ids would re-read
    # them mid-replacement (observed FAILED_READ_FILE on the third write)
    survivor_ids = survivor_ids.localCheckpoint(eager=True)
    survivors = batch.join(
        survivor_ids.withColumnRenamed("id", id_col), id_col, "left_semi"
    )
    s_sh = sh.join(survivor_ids.select("id"), "id", "left_semi")
    s_bands = banded.join(survivor_ids.select("id"), "id", "left_semi")

    def write(path: str, df: DataFrame, keys: list[str]) -> None:
        if os.path.exists(path):
            upsert_parquet(spark, path, df, keys)
        else:
            df.write.mode("overwrite").parquet(path)

    n = survivors.count()
    write(out_path, survivors, [id_col])
    write(docs_path, s_sh, ["id"])
    write(bands_path, s_bands, ["id", "band_id"])
    return n


def neardup_gate_sink(
    stream_docs: DataFrame,
    index_dir: str,
    out_path: str,
    checkpoint: str,
    **kwargs,
):
    """foreachBatch wrapper over process_neardup_batch: accepted (non-
    near-dup) documents land in ``out_path``, and the band index under
    ``index_dir`` advances, one keyed-upsert transaction set per
    micro-batch. Returns the started StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        process_neardup_batch(batch_df, index_dir, out_path, **kwargs)

    return (
        stream_docs.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
