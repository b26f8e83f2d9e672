"""Training-shard sink: landed-manifest fidelity, partition-pruned shard
reads, and the pre-training integrity check."""

from __future__ import annotations

import contextlib
import io
import json
import os

from pyspark.sql import functions as F

from esco_neo4j_spark.sources.shards import (
    MANIFEST_NAME,
    read_shard,
    verify_shards,
    write_token_shards,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _sharded_docs(spark):
    d = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        (F.col("doc_id") % 7).cast("int").alias("shard_id"),
    )


def test_manifest_matches_input_totals(spark, tmp_path):
    docs = _sharded_docs(spark)
    out = str(tmp_path / "shards")
    m = write_token_shards(docs, out)
    want_docs = docs.count()
    want_tokens = docs.agg(F.sum("n_tokens")).first()[0]
    assert m["total_docs"] == want_docs
    assert m["total_tokens"] == want_tokens
    assert m["n_shards"] == 7
    # manifest certifies the LANDED files: on-disk json equals return
    assert json.load(open(os.path.join(out, MANIFEST_NAME))) == json.loads(
        json.dumps(m)
    )
    assert verify_shards(spark, out)["ok"]


def test_shard_read_prunes_partitions(spark, tmp_path):
    docs = _sharded_docs(spark)
    out = str(tmp_path / "shards")
    write_token_shards(docs, out)
    one = read_shard(spark, out, 3)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        one.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()
    assert one.count() == docs.filter("shard_id = 3").count()


def test_verify_detects_tampering(spark, tmp_path):
    docs = _sharded_docs(spark)
    out = str(tmp_path / "shards")
    m = write_token_shards(docs, out)
    # tamper with the manifest: claim one more doc in shard 0
    m["shards"]["0"]["docs"] += 1
    with open(os.path.join(out, MANIFEST_NAME), "w") as fh:
        json.dump(m, fh)
    res = verify_shards(spark, out)
    assert not res["ok"] and res["mismatches"] == ["0"]


def test_verify_uses_manifest_column_names(spark, tmp_path):
    """r7 ADVICE: a corpus sharded on non-default column names must pass
    its own integrity check — verify_shards reads shard_col/tokens_col
    back from the manifest instead of hardcoding them."""
    docs = (
        _sharded_docs(spark)
        .withColumnRenamed("shard_id", "bucket")
        .withColumnRenamed("n_tokens", "tok_count")
    )
    out = str(tmp_path / "shards_custom")
    m = write_token_shards(docs, out, shard_col="bucket", tokens_col="tok_count")
    assert m["shard_col"] == "bucket" and m["tokens_col"] == "tok_count"
    res = verify_shards(spark, out)
    assert res["ok"] and res["mismatches"] == []
