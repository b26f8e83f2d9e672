"""Model-UDF pipeline tests (SURVEY.md §2 category I): the real-model
injection seam and the distinct-before-compute contract. The query-level
oracle (udf_* entries) covers the default mock path; these prove a real
model drops into the same plumbing unchanged."""

from __future__ import annotations

from pyspark.sql import functions as F

from esco_neo4j_spark.operators.textmodel import translate_column


def test_translate_model_injection_seam(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, None)],
        "id bigint, text string",
    )

    # stand-in for a real seq2seq model callable (pd.Series -> pd.Series);
    # defined inline so cloudpickle ships it by value to the workers
    def upper_model(series):
        return series.str.upper()

    out = translate_column(df, "text", out_col="text_he", model_fn=upper_model)
    got = {r["id"]: r["text_he"] for r in out.collect()}
    assert got[1] == "HELLO WORLD" and got[2] == "SPARK ENGINE"
    assert got[3] is None  # null rows never reach the model


def test_translate_memoizes_duplicate_texts(spark):
    # the same text appearing on many rows must be translated ONCE
    # (distinct-before-compute, the set-oriented lru_cache); count model
    # invocations through the injected callable
    df = spark.createDataFrame(
        [(i, "same text") for i in range(50)] + [(99, "other")],
        "id bigint, text string",
    ).repartition(1)  # single partition => one Arrow batch => countable

    def counting_model(series):
        # the batch the model sees is the DISTINCT set, not the 51 rows
        assert len(series) <= 2
        return series.str.upper()

    out = translate_column(df, "text", out_col="t", model_fn=counting_model)
    rows = out.collect()
    assert len(rows) == 51
    assert all(r["t"] == "SAME TEXT" for r in rows if r["id"] != 99)


def test_translate_writeback_preserves_all_columns(spark):
    df = spark.createDataFrame(
        [(1, "a b", "x")], "id bigint, text string, extra string"
    )
    out = translate_column(df, "text")
    row = out.collect()[0]
    assert row["extra"] == "x" and row["text_he"] == "he:b a"


def test_compression_ratio_golden(spark):
    # exact zlib byte counts, recomputed in plain Python over the same
    # parquet — proves the Arrow round-trip alters nothing
    import os
    import zlib

    import duckdb

    from esco_neo4j_spark.plans import REGISTRY

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    got = {
        r["doc_id"]: (r["raw_len"], r["comp_len"])
        for r in REGISTRY["udf_compression_ratio"].fn(spark, sf_dir).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    assert len(got) == len(docs) > 0
    for doc_id, text in docs:
        raw = len(text)
        comp = len(zlib.compress(text.encode("utf-8"), 6))
        assert got[doc_id] == (raw, comp)
