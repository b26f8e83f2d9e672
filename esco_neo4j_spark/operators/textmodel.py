"""Model-backed text pipelines (SURVEY.md §2 category I) as pandas UDFs.

Reference behavior replicated:
- I1-I3 embedding generation: SentenceTransformer('all-MiniLM-L6-v2')
  encode over node text (reference: src/embedding_utils.py:7-33, batch loop
  src/esco_ingest.py:332-389). Here: a lazily-initialized per-executor
  model inside a pandas_udf; when sentence-transformers/torch is absent
  (this container), a DETERMINISTIC feature-hash embedding stands in —
  signed token-bucket counts, reproducible by the DuckDB oracle.
- I4 translation: MarianMT en->he seq2seq (reference:
  src/esco_translate.py:249-338). Fallback: a deterministic mock
  "translation" (word-reversal with a language prefix) so the pipeline
  shape (batching, retry, write-back) is fully testable without torch.
- I5 memoization via lru_cache (reference: src/esco_translate.py:249)
  becomes the set-oriented equivalent: distinct -> UDF -> join back
  (translate_column / embed_column below).
- I6 thread-parallel map (reference: src/esco_translate.py:366-383)
  becomes native partition parallelism.
- I7 per-node write-back becomes a key join (no point updates).

Arrow batching: pandas_udf receives column batches (~10k rows); the model
encodes each batch in one call — the same batching the reference does
manually (batch_size=100/ThreadPoolExecutor) but vectorized and
per-executor at scale.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HASH_EMBED_DIM = 32


def _have_sentence_transformers() -> bool:
    # No pragma: tests exercise BOTH outcomes — the miss in the normal
    # suite (no torch in this container) and the hit via the torch-free
    # fake package in tests/fakes shipped to executors with addPyFile.
    try:
        import sentence_transformers  # noqa: F401

        return True
    except Exception:
        return False


def _hash_embed_rows(texts: pd.Series, dim: int) -> pd.Series:
    """Deterministic feature-hash embedding: for each lowercase word token,
    bucket = first 7 md5 hex digits mod dim, sign = md5 bit 28; the
    embedding is the signed count per bucket (integer — exactly
    reproducible in SQL)."""
    import re

    tok_re = re.compile(r"[^a-z0-9']+")
    out = []
    for t in texts.fillna(""):
        vec = [0] * dim
        for tok in tok_re.split(t.lower()):
            if not tok:
                continue
            h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:7], 16)
            vec[h % dim] += 1 if (h >> 27) & 1 else -1
        out.append(vec)
    return pd.Series(out)


def make_embed_udf(dim: int = HASH_EMBED_DIM, model_name: str = "all-MiniLM-L6-v2"):
    """Embedding pandas_udf with per-executor lazy model init (I1).

    Uses the real sentence-transformer when available; else the
    deterministic hash embedding (documented fallback, SURVEY §7 #5).
    """
    use_model = _have_sentence_transformers()

    if use_model:
        # Real branch (reference: src/embedding_utils.py:7-33). Covered
        # under pytest by a torch-free fake sentence_transformers module
        # (tests/fakes) so the path a production user runs first cannot
        # bit-rot silently.

        @F.pandas_udf(T.ArrayType(T.FloatType()))
        def embed(texts: pd.Series) -> pd.Series:
            global _ST_MODEL  # lazy singleton per executor process
            try:
                model = _ST_MODEL
            except NameError:
                from sentence_transformers import SentenceTransformer

                model = _ST_MODEL = SentenceTransformer(model_name)
            vecs = model.encode(texts.fillna("").tolist())
            return pd.Series([list(map(float, v)) for v in vecs])

        return embed

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def embed(texts: pd.Series) -> pd.Series:
        return _hash_embed_rows(texts, dim)

    return embed


def make_compression_udf(level: int = 6):
    """Compression-ratio quality signal: deflate bytes per input byte.

    A low-compressibility document is high-entropy (random noise, binary
    junk); an extremely compressible one is boilerplate/repetition — both
    tails get filtered in large-corpus curation, complementing the
    token-level heuristics (text_repetition_scores, text_quality_scores).
    zlib at a FIXED level is deterministic for a given input, so the
    pytest golden recomputes the exact byte counts in plain Python; there
    is no SQL equivalent, hence the query registers without an oracle
    (driver rows-only). Arrow-batched pandas_udf — the per-row Python
    work is a single C call into zlib."""

    @F.pandas_udf(T.IntegerType())
    def comp_len(texts: pd.Series) -> pd.Series:
        import zlib

        return (
            texts.fillna("")
            .map(lambda t: len(zlib.compress(t.encode("utf-8"), level)))
            .astype("int32")
        )

    return comp_len


def mock_translate_series(texts: pd.Series, lang: str = "he") -> pd.Series:
    """Deterministic stand-in for MarianMT generate (reference:
    src/esco_translate.py:291-300): reverse word order, tag with target
    lang. Returns input unchanged on 'failure' (empty), matching the
    reference's return-original-on-failure (:327-337)."""
    def tr(t):
        if t is None or t == "":
            return t
        return f"{lang}:" + " ".join(reversed(t.split(" ")))

    return texts.map(tr)


def resilient_translate_fn(
    translate_batch,
    max_retries: int = 3,
    retry_wait: float = 1.0,
    sleep=None,
):
    """Wrap a raw batch-translate callable with the reference's
    resilience contract (src/esco_translate.py:250-338) so a REAL model
    can be plugged into ``make_translate_udf(model_fn=...)`` with the
    same failure semantics the reference implements per call:

    - preprocess: strip, drop non-ASCII chars, normalize whitespace
      (the reference's "aggressive text cleaning") before the model sees
      the text; empty-after-strip rows stay empty and skip the model;
    - bounded retries with a wait between attempts (:301-318, per BATCH
      here — the batch is the unit of model work under Arrow);
    - return-original-on-failure (:327-337): if the model still raises
      after ``max_retries``, or returns an empty/None translation for a
      row, that row falls back to its (stripped) original text.

    ``translate_batch`` maps a pandas Series of cleaned texts to a
    Series/list of translations. ``sleep`` is injectable for tests.
    """
    import time

    do_sleep = sleep if sleep is not None else time.sleep

    def fn(texts: pd.Series) -> pd.Series:
        originals = texts.fillna("").map(lambda t: str(t).strip())
        cleaned = originals.map(
            lambda t: " ".join("".join(c for c in t if ord(c) < 128).split())
        )
        result = None
        for attempt in range(max_retries):
            try:
                result = list(translate_batch(cleaned))
                break
            except Exception:
                if attempt == max_retries - 1:
                    break
                do_sleep(retry_wait)
        orig = originals.tolist()
        if result is None or len(result) != len(orig):
            # total failure (or a shape-breaking model): original text back
            return pd.Series(orig, index=texts.index)
        out = []
        for o, r in zip(orig, result):
            if o == "":
                out.append("")  # empty input stays empty (ref :255-256)
            elif r is None or str(r).strip() == "":
                out.append(o)  # empty translation -> original (ref :327-331)
            else:
                out.append(str(r))
        return pd.Series(out, index=texts.index)

    return fn


def make_translate_udf(lang: str = "he", model_fn=None):
    """Translation pandas_udf (I4).

    ``model_fn`` is the real-model injection point: a picklable callable
    ``pd.Series -> pd.Series`` owning the model concerns the reference
    implements client-side — per-executor lazy init + device pick
    (src/esco_translate.py:50-56), bounded retries (:301-318), and
    return-original-on-failure (:327-337). This container has no torch,
    so rather than shipping an untestable MarianMT branch the DEFAULT is
    the deterministic mock; everything around the seam (Arrow batching,
    distinct-before-compute, key-join write-back) is identical for a real
    model and fully tested.
    """

    @F.pandas_udf(T.StringType())
    def translate(texts: pd.Series) -> pd.Series:
        fn = model_fn or (lambda s: mock_translate_series(s, lang))
        return fn(texts)

    return translate


def embed_column(
    df: DataFrame, text_col: Column | str, out_col: str = "embedding",
    dim: int = HASH_EMBED_DIM,
) -> DataFrame:
    """I2: one withColumn over the node table replaces the reference's
    stream-encode-writeback loop (src/esco_ingest.py:332-389)."""
    return df.withColumn(out_col, make_embed_udf(dim)(F.col(text_col) if isinstance(text_col, str) else text_col))


def translate_column(
    df: DataFrame,
    text_col: str,
    out_col: str | None = None,
    lang: str = "he",
    model_fn=None,
) -> DataFrame:
    """I5+I7: dedup-before-compute translation with key-join write-back.

    The reference memoizes repeated inputs with lru_cache
    (src/esco_translate.py:249) and writes back per node (:353-364); the
    set-oriented equivalent is distinct() -> UDF -> join back — each
    distinct text is translated exactly once cluster-wide. ``model_fn``
    plugs in a real model (see make_translate_udf).
    """
    out_col = out_col or f"{text_col}_{lang}"
    udf = make_translate_udf(lang, model_fn=model_fn)
    distinct_texts = (
        df.select(F.col(text_col).alias("_src_text"))
        .filter(F.col("_src_text").isNotNull())
        .distinct()
        .withColumn(out_col, udf(F.col("_src_text")))
    )
    return df.join(
        distinct_texts, df[text_col] == distinct_texts["_src_text"], "left"
    ).drop("_src_text")
