"""JSONL source/sink: schema-pinned round-trip, corrupt-line quarantine,
and DuckDB as the independent reader of what we write."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from esco_neo4j_spark.sources.jsonl import (
    infer_jsonl_schema,
    quarantine_corrupt,
    read_jsonl,
    write_jsonl,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)


def test_jsonl_round_trip(spark, tmp_path):
    """write_jsonl -> read_jsonl reproduces the documents table exactly,
    including an explicit null."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs = docs.withColumn(
        "lang", F.when(F.col("doc_id") == 0, F.lit(None)).otherwise("lang")
    )
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, out)
    back, corrupt = quarantine_corrupt(
        read_jsonl(spark, out, DOC_SCHEMA)
    )
    assert corrupt.count() == 0
    a = sorted(tuple(r) for r in docs.select(*DOC_SCHEMA.fieldNames()).collect())
    b = sorted(tuple(r) for r in back.select(*DOC_SCHEMA.fieldNames()).collect())
    assert a == b
    # null survived the round-trip (ignoreNullFields=false)
    assert back.filter(F.col("doc_id") == 0).first()["lang"] is None


def test_jsonl_duckdb_cross_read(spark, tmp_path):
    """DuckDB independently parses the files Spark writes — format parity,
    not just self-consistency."""
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.select("doc_id", "text", "source"), out)
    files = sorted(glob.glob(os.path.join(out, "part-*")))
    assert files
    con = duckdb.connect()
    n, s = con.execute(
        f"SELECT count(*), sum(doc_id) FROM read_json_auto({files!r})"
    ).fetchone()
    assert n == docs.count()
    assert s == docs.agg(F.sum("doc_id")).first()[0]


def test_jsonl_corrupt_quarantine(spark, tmp_path):
    """Truncated / non-JSON lines land in the quarantine frame; clean rows
    parse with the pinned schema."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
        '{"doc_id": 3, "text": "trunca\n'
    )
    df = read_jsonl(spark, str(p), DOC_SCHEMA)
    clean, corrupt = quarantine_corrupt(df)
    assert sorted(r["doc_id"] for r in clean.collect()) == [1, 2]
    assert corrupt.count() == 2


def test_jsonl_nested_types(spark, tmp_path):
    """Array columns (embeddings-shaped) survive the round-trip."""
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    out = str(tmp_path / "emb_jsonl")
    write_jsonl(emb.select("vec_id", "embedding").limit(50), out)
    back, _ = quarantine_corrupt(read_jsonl(spark, out, schema))
    assert back.count() == 50
    row = back.orderBy("vec_id").first()
    orig = emb.orderBy("vec_id").first()
    assert row["vec_id"] == orig["vec_id"]
    assert row["embedding"] == pytest.approx(list(orig["embedding"]))


def test_jsonl_infer_matches_pinned(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = str(tmp_path / "docs_jsonl")
    write_jsonl(docs.select(*DOC_SCHEMA.fieldNames()), out)
    inferred = infer_jsonl_schema(spark, out, sample_ratio=1.0)
    assert set(inferred.fieldNames()) == set(DOC_SCHEMA.fieldNames())
