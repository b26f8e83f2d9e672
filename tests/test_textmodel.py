"""Model-UDF pipeline tests (SURVEY.md §2 category I): the real-model
injection seam and the distinct-before-compute contract. The query-level
oracle (udf_* entries) covers the default mock path; these prove a real
model drops into the same plumbing unchanged."""

from __future__ import annotations

import importlib.util
import os

import pytest
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


def test_embed_real_branch_via_fake_module(spark):
    """The REAL sentence-transformers branch of make_embed_udf (lazy
    per-executor model init + batch encode, ref src/embedding_utils.py:
    7-33) executes on the Arrow path, driven by the torch-free fake
    package in tests/fakes shipped to executors via addPyFile."""
    import os
    import sys

    fakes = os.path.join(os.path.dirname(__file__), "fakes")
    sys.path.insert(0, fakes)
    sys.modules.pop("sentence_transformers", None)
    try:
        from sentence_transformers import FAKE_DIM, fake_vector

        from esco_neo4j_spark.operators import textmodel

        assert textmodel._have_sentence_transformers()
        spark.sparkContext.addPyFile(
            os.path.join(fakes, "sentence_transformers.py")
        )
        udf = textmodel.make_embed_udf(model_name="fake-minilm")
        df = spark.createDataFrame(
            [(1, "machine learning"), (2, ""), (3, None)], "id int, text string"
        )
        rows = {
            r["id"]: r["emb"]
            for r in df.select("id", udf("text").alias("emb")).collect()
        }
        # batch shape: every row embeds (None -> "" first, like the ref's
        # fillna-before-encode), dim pinned, dtype float32
        assert all(len(v) == FAKE_DIM for v in rows.values())
        import numpy as np

        for rid, text in [(1, "machine learning"), (2, ""), (3, "")]:
            expect = [float(np.float32(x)) for x in fake_vector(text)]
            assert rows[rid] == expect, rid
    finally:
        sys.path.remove(fakes)
        sys.modules.pop("sentence_transformers", None)


def test_embed_real_branch_lazy_singleton_and_arrow_batches(spark):
    """Contract test for the real branch: the model must be constructed
    lazily (never on the driver at UDF-definition time) and encode must
    see list[str] batches."""
    import os
    import sys

    fakes = os.path.join(os.path.dirname(__file__), "fakes")
    sys.path.insert(0, fakes)
    sys.modules.pop("sentence_transformers", None)
    try:
        import sentence_transformers as fake_st

        from esco_neo4j_spark.operators import textmodel

        before = fake_st.SentenceTransformer.instances_created
        udf = textmodel.make_embed_udf()  # definition must NOT build a model
        assert fake_st.SentenceTransformer.instances_created == before
        n = (
            spark.range(10)
            .selectExpr("CAST(id AS STRING) AS text")
            .select(udf("text").alias("emb"))
            .count()
        )
        assert n == 10
        # driver-side count unchanged — init happened in executor workers
        assert fake_st.SentenceTransformer.instances_created == before
    finally:
        sys.path.remove(fakes)
        sys.modules.pop("sentence_transformers", None)


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_REAL_MODELS") != "1"
    or importlib.util.find_spec("torch") is None
    or importlib.util.find_spec("sentence_transformers") is None,
    reason="opt-in real-weight integration (set SPARK_GRAFT_REAL_MODELS=1 "
    "with torch + sentence-transformers installed); this container ships "
    "neither, so the real branch is otherwise covered by the fake-module "
    "contract tests above",
)
def test_embed_real_weights_end_to_end(spark):
    """OPT-IN integration: run make_embed_udf's real branch with actual
    all-MiniLM-L6-v2 weights (ref src/embedding_utils.py:7-33) and assert
    the contract the hash-embedding fallback and the fake-module tests
    pin — 384-dim float vectors, None embeds like "", deterministic
    across calls, unit-normalized like the reference's encode output."""
    from esco_neo4j_spark.operators import textmodel

    udf = textmodel.make_embed_udf(model_name="all-MiniLM-L6-v2")
    df = spark.createDataFrame(
        [(1, "software developer"), (2, "software developer"),
         (3, ""), (4, None)],
        "id int, text string",
    )
    rows = {
        r["id"]: r["emb"]
        for r in df.select("id", udf("text").alias("emb")).collect()
    }
    assert all(len(v) == 384 for v in rows.values())
    assert rows[1] == rows[2]  # deterministic encode
    assert rows[3] == rows[4]  # None -> "" before encode (ref fillna)
    norm = sum(x * x for x in rows[1]) ** 0.5
    assert abs(norm - 1.0) < 1e-3  # ST normalizes MiniLM output


def test_resilient_translate_retries_then_succeeds():
    """resilient_translate_fn mirrors ref src/esco_translate.py:301-318:
    bounded retries with a wait between attempts; the successful attempt's
    output wins."""
    import pandas as pd

    from esco_neo4j_spark.operators.textmodel import resilient_translate_fn

    calls = {"n": 0}
    waits = []

    def flaky(batch):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient model error")
        return ["T:" + t for t in batch]

    fn = resilient_translate_fn(flaky, max_retries=3, sleep=waits.append)
    out = fn(pd.Series(["hello world", "spark"]))
    assert out.tolist() == ["T:hello world", "T:spark"]
    assert calls["n"] == 3 and len(waits) == 2


def test_resilient_translate_total_failure_returns_original():
    import pandas as pd

    from esco_neo4j_spark.operators.textmodel import resilient_translate_fn

    def broken(batch):
        raise RuntimeError("model dead")

    fn = resilient_translate_fn(broken, max_retries=2, sleep=lambda _s: None)
    out = fn(pd.Series(["  keep me  ", None, ""]))
    # stripped originals come back; None/empty stay empty
    assert out.tolist() == ["keep me", "", ""]


def test_resilient_translate_row_level_fallback_and_cleaning():
    """Per-row semantics from ref :250-338: empty translation falls back
    to the original text; non-ASCII is stripped and whitespace normalized
    BEFORE the model sees the text; empty input never reaches the model."""
    import pandas as pd

    from esco_neo4j_spark.operators.textmodel import resilient_translate_fn

    seen = []

    def partial(batch):
        seen.extend(batch.tolist())
        return ["" if t.startswith("fail") else "ok:" + t for t in batch]

    fn = resilient_translate_fn(partial, max_retries=1)
    out = fn(pd.Series(["fail this", "café  au   lait", ""]))
    assert out.tolist() == ["fail this", "ok:caf au lait", ""]
    # the model saw CLEANED text (ascii-stripped, ws-normalized)
    assert "caf au lait" in seen


def test_resilient_translate_drives_spark_pipeline(spark):
    """udf_real_model_contract: a real-shaped resilient model_fn through
    translate_column's distinct-before-compute + join-back on the Arrow
    path — the full production wiring minus torch."""
    from esco_neo4j_spark.operators.textmodel import (
        resilient_translate_fn,
        translate_column,
    )

    def upper_model(batch):
        return [t.upper() if t else "" for t in batch]

    fn = resilient_translate_fn(upper_model, max_retries=2)
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, None)], "id int, name string"
    )
    rows = {
        r["id"]: r["name_he"]
        for r in translate_column(df, "name", lang="he", model_fn=fn).collect()
    }
    assert rows[1] == rows[2] == "ALPHA BETA"
    assert rows[3] is None


def test_verify_model_cache(tmp_path):
    """Asset gate mirrors ref src/download_model.py:15-62: all six
    categories present -> ok; a missing category is named; layout errors
    are reported, not raised."""
    from esco_neo4j_spark.model_cache import verify_model_cache

    missing_dir = verify_model_cache(str(tmp_path / "nope"))
    assert not missing_dir.ok and "not found" in missing_dir.error

    cache = tmp_path / "model_cache"
    snap = (
        cache / "hub" / "models--Helsinki-NLP--opus-mt-en-he"
        / "snapshots" / "abc123"
    )
    snap.mkdir(parents=True)
    for name in (
        "model.safetensors", "config.json", "tokenizer_config.json",
        "vocab.json", "source.spm",
    ):
        (snap / name).write_text("x")
    partial = verify_model_cache(str(cache))
    assert not partial.ok and partial.missing == ["target_spm"]

    (snap / "target.spm").write_text("x")
    full = verify_model_cache(str(cache))
    assert full.ok and full.missing == []
    assert full.found["model"] == "model.safetensors"
    assert full.snapshot_dir.endswith("abc123")


def test_verify_model_cache_snapshot_resolution(tmp_path):
    """With a stale partial snapshot sorting BEFORE the complete one, the
    gate must verify the snapshot transformers would actually resolve:
    refs/main when present, else the newest-mtime snapshot — never the
    lexicographically first."""
    import os
    import time

    from esco_neo4j_spark.model_cache import verify_model_cache

    cache = tmp_path / "model_cache"
    model_dir = cache / "hub" / "models--Helsinki-NLP--opus-mt-en-he"
    stale = model_dir / "snapshots" / "0000aaaa"  # sorts first, incomplete
    good = model_dir / "snapshots" / "ffffbbbb"
    stale.mkdir(parents=True)
    good.mkdir(parents=True)
    (stale / "config.json").write_text("x")  # partial download leftover
    for name in (
        "model.safetensors", "config.json", "tokenizer_config.json",
        "vocab.json", "source.spm", "target.spm",
    ):
        (good / name).write_text("x")

    # No refs/main: newest mtime wins (the complete snapshot).
    past = time.time() - 3600
    os.utime(stale, (past, past))
    by_mtime = verify_model_cache(str(cache))
    assert by_mtime.ok and by_mtime.snapshot_dir.endswith("ffffbbbb")

    # refs/main present: it wins even when the OTHER snapshot is newer.
    refs = model_dir / "refs"
    refs.mkdir()
    (refs / "main").write_text("ffffbbbb\n")
    now = time.time()
    os.utime(stale, (now + 60, now + 60))
    by_ref = verify_model_cache(str(cache))
    assert by_ref.ok and by_ref.snapshot_dir.endswith("ffffbbbb")

    # refs/main pointing at a missing snapshot falls back to mtime.
    (refs / "main").write_text("deadbeef\n")
    fallback = verify_model_cache(str(cache))
    assert fallback.snapshot_dir.endswith("0000aaaa")  # now newest, partial
    assert not fallback.ok and "model" in fallback.missing


def test_cli_translate_model_dir_gate(tmp_path, capsys):
    """cmd_translate --model-dir refuses to run against an incomplete
    cache (exit 2 with a structured error), before any Spark work."""
    import json

    from esco_neo4j_spark.cli import main

    rc = main(
        [
            "translate", "--dry-run", "--model-dir", str(tmp_path / "absent"),
        ]
    )
    assert rc == 2
    err = capsys.readouterr().err
    assert json.loads(err.strip().splitlines()[-1])["error"].startswith(
        "model cache verification failed"
    )
