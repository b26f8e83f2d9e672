"""Corpus-construction query corpus: the document-level operators a
training-data pipeline runs AFTER cleaning/dedup and BEFORE tokenized
shards land on disk — context-window chunking, repetition-based quality
scoring (Gopher-style), test-set contamination checks, deterministic
global shuffling, and sequence packing.

No reference counterpart (the reference stops at graph ingest + search);
these extend the north-star LLM-pipeline family alongside
plans/text_queries.py and plans/dedup_queries.py.

Scale notes (100 TB):
- chunking / repetition / contamination shingling are pure per-row column
  expressions (sequence+transform), so they run inside whole-stage
  codegen with zero shuffle; per-row cost is bounded by document length.
- contamination joins the exploded train shingles against a BROADCAST
  distinct eval-shingle set (eval/benchmark suites are small by
  definition), so the only wide exchange is the per-doc re-aggregation,
  keyed on doc_id.
- global shuffle + packing need a TOTAL order; a bare
  ``row_number() OVER (ORDER BY ...)`` collapses to one partition, which
  is the classic scale-killer. Instead both use a two-level rank: hash
  docs into 256 lexicographic buckets (first md5 byte), rank WITHIN each
  bucket (distributed window), and add per-bucket offsets computed from
  a 256-row bucket-count table (the only single-partition window runs on
  those 256 rows). Equivalent to the global row_number the oracle runs,
  but every wide stage is partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esco_neo4j_spark.functions.text import word_tokens
from esco_neo4j_spark.plans.registry import query
from esco_neo4j_spark.plans.text_queries import _TOKENS

# chunking geometry: 32-token windows advancing by 24 (8-token overlap)
_CHUNK_W, _CHUNK_S = 32, 24
# packing context length (tokens per training sequence)
_CTX = 512
_SHUFFLE_SALT = ":shuffle42"


def _empty_str_array():
    return F.array().cast("array<string>")


def _word_ngrams(toks, n: int):
    """Space-joined word n-grams as a column expression; [] below n tokens."""
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(_empty_str_array())


@query(
    "text_chunk_windows",
    sql=f"""
    WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
    idx AS (
      SELECT doc_id, toks,
             unnest(range(CAST(ceil(greatest(len(toks) - {_CHUNK_W}, 0)
                                    / {_CHUNK_S}.0) AS BIGINT) + 1)) AS ci
      FROM t)
    SELECT doc_id,
           CAST(ci AS INT) AS chunk_idx,
           CAST(ci * {_CHUNK_S} + 1 AS INT) AS start_tok,
           CAST(len(list_slice(toks, ci * {_CHUNK_S} + 1,
                               ci * {_CHUNK_S} + {_CHUNK_W})) AS INT)
             AS n_chunk_tokens,
           md5(array_to_string(list_slice(toks, ci * {_CHUNK_S} + 1,
                                          ci * {_CHUNK_S} + {_CHUNK_W}), ' '))
             AS chunk_hash
    FROM idx
    ORDER BY doc_id, chunk_idx
    """,
    survey_ops="text-chunking,E",
    bench=True,
    tables=("documents",),
)
def text_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking: split each document into
    32-token windows with stride 24 (every token is covered; 8-token
    overlap preserves cross-boundary context). The start-offset list is
    generated per row (sequence+transform) and exploded — no shuffle at
    all until the final presentation sort, and a downstream writer would
    drop that sort and partition by hash(doc_id)."""
    d = spark.table("documents")
    # tokenize ONCE before the explode: inlining word_tokens into the
    # Generate argument re-evaluates the regex+filter lambda per emitted
    # chunk row and bloats the codegen unit (~10x slower per fresh plan)
    t = d.select("doc_id", word_tokens(F.col("text")).alias("toks"))
    n_chunks = (
        F.ceil(
            F.greatest(F.size("toks") - _CHUNK_W, F.lit(0))
            / F.lit(float(_CHUNK_S))
        ).cast("bigint")
        + 1
    )
    base = t.select(
        "doc_id",
        "toks",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx", "ci"),
    )
    chunk = F.slice(F.col("toks"), F.col("ci") * _CHUNK_S + 1, F.lit(_CHUNK_W))
    return (
        base.select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("ci") * _CHUNK_S + 1).cast("int").alias("start_tok"),
            F.size(chunk).cast("int").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@query(
    "text_repetition_scores",
    sql=f"""
    WITH t AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
    b AS (
      SELECT doc_id, toks,
             list_transform(range(1, greatest(len(toks), 1)),
                            i -> toks[i] || ' ' || toks[i + 1]) AS big
      FROM t)
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(round(len(list_distinct(toks))::DOUBLE
                      / greatest(len(toks), 1), 6) AS DOUBLE) AS distinct_ratio,
           CAST(round(CASE WHEN len(big) = 0 THEN 0.0
                ELSE list_max(list_transform(list_distinct(big),
                       x -> len(list_filter(big, y -> y = x))))::DOUBLE
                     / len(big) END, 6) AS DOUBLE) AS top_bigram_frac
    FROM b
    ORDER BY doc_id
    """,
    survey_ops="text-repetition,text-quality",
    tables=("documents",),
)
def text_repetition_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals per document: fraction of
    distinct tokens, and the share of all bigrams taken by the single
    most frequent bigram (boilerplate / looped-generation detector).

    The bigram histogram is computed WITHIN the row (distinct x filter
    count over the bigram array) — O(d^2) in document length but zero
    shuffle and fully codegen'd; for long documents the explode +
    two-level groupBy(doc_id, bigram) form trades that CPU for a
    doc_id-keyed exchange."""
    d = spark.table("documents")
    toks = word_tokens(F.col("text"))
    base = d.select("doc_id", toks.alias("toks")).withColumn(
        "big", _word_ngrams(F.col("toks"), 2)
    )
    big = F.col("big")
    top_count = F.array_max(
        F.transform(
            F.array_distinct(big),
            lambda x: F.size(F.filter(big, lambda y: y == x)),
        )
    )
    return (
        base.select(
            "doc_id",
            F.size("toks").cast("int").alias("n_tokens"),
            F.round(
                F.size(F.array_distinct(F.col("toks"))).cast("double")
                / F.greatest(F.size("toks"), F.lit(1)),
                6,
            ).alias("distinct_ratio"),
            F.round(
                F.when(F.size(big) == 0, F.lit(0.0)).otherwise(
                    top_count.cast("double") / F.size(big)
                ),
                6,
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


# contamination shingle width: 3 keeps the check meaningful on the tiny
# synthetic vocabulary; production pipelines use 8-13-gram collisions.
_CONTAM_N = 3
_EVAL_SOURCE = "src0"

_CONTAM_SH = (
    f"list_distinct(list_transform(range(1, greatest(len(toks) - {_CONTAM_N - 2}, 1)), "
    + " i -> "
    + " || ' ' || ".join(f"toks[i + {j}]" for j in range(_CONTAM_N))
    + "))"
)


@query(
    "text_contamination_overlap",
    sql=f"""
    WITH t AS (SELECT doc_id, source, {_TOKENS} AS toks FROM documents),
    sh AS (SELECT doc_id, source, {_CONTAM_SH} AS sh FROM t),
    eval_sh AS (SELECT DISTINCT unnest(sh) AS g FROM sh
                WHERE source = '{_EVAL_SOURCE}'),
    train AS (SELECT doc_id, len(sh) AS n_shingles, unnest(sh) AS g FROM sh
              WHERE source <> '{_EVAL_SOURCE}')
    SELECT train.doc_id,
           CAST(n_shingles AS INT) AS n_shingles,
           CAST(count(*) AS INT) AS n_contaminated,
           CAST(round(count(*)::DOUBLE / greatest(n_shingles, 1), 6) AS DOUBLE)
             AS contamination_frac
    FROM train JOIN eval_sh USING (g)
    GROUP BY train.doc_id, n_shingles
    ORDER BY contamination_frac DESC, doc_id
    LIMIT 100
    """,
    survey_ops="text-contamination,C9",
    tables=("documents",),
)
def text_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check: treat one source as the held-out
    benchmark, count how many of each training document's distinct
    word 3-grams collide with ANY benchmark 3-gram. The benchmark
    shingle set is tiny by construction, so it is broadcast — the
    inverted-index join never shuffles the 100 TB side on shingle; the
    only wide exchange is the per-doc count, keyed on doc_id. Documents
    with zero collisions are clean and intentionally absent."""
    d = spark.table("documents")
    # Two pitfalls shaped this plan (measured at sf0.1, 101s -> 4s):
    # 1. STAGE the token array before the n-gram transform — passing the
    #    raw word_tokens(text) expression re-runs the regexp split per
    #    array element inside the lambda (no CSE in higher-order
    #    functions; the trap operators/dedup.shingled documents).
    # 2. Per-doc set semantics via explode + DISTINCT, not
    #    array_distinct: under a Generate the ~1000-element string-array
    #    distinct runs interpreted O(n^2) per document (58s alone); the
    #    post-explode distinct is one distributed keyed exchange.
    t = d.select("doc_id", "source", word_tokens(F.col("text")).alias("toks"))
    grams = t.select(
        "doc_id",
        "source",
        F.explode(_word_ngrams(F.col("toks"), _CONTAM_N)).alias("g"),
    ).distinct()
    eval_sh = (
        grams.filter(F.col("source") == _EVAL_SOURCE).select("g").distinct()
    )
    train = grams.filter(F.col("source") != _EVAL_SOURCE)
    ns = train.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_shingles")
    )
    hits = (
        train.join(F.broadcast(eval_sh), "g")
        .groupBy("doc_id")
        .agg(F.count("*").cast("int").alias("n_contaminated"))
    )
    return (
        hits.join(ns, "doc_id")
        .select(
            "doc_id",
            "n_shingles",
            "n_contaminated",
            F.round(
                F.col("n_contaminated").cast("double")
                / F.greatest(F.col("n_shingles"), F.lit(1)),
                6,
            ).alias("contamination_frac"),
        )
        .orderBy(F.desc("contamination_frac"), F.asc("doc_id"))
        .limit(100)
    )


def _shuffle_cols(d: DataFrame) -> DataFrame:
    """doc_id + deterministic shuffle hash + 256-way lexicographic bucket."""
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_SHUFFLE_SALT)))
    return d.select(
        "doc_id",
        h.alias("h"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("bkt"),
    )


def _bucket_offsets(per_bucket: DataFrame, value_col: str) -> DataFrame:
    """Exclusive prefix sum of ``value_col`` over buckets in bucket order.

    Runs a single-partition window — on a table of AT MOST 256 rows, so
    it is a driver-sized fixup, not a scale hazard."""
    w = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    return per_bucket.select(
        "bkt",
        F.coalesce(F.sum(value_col).over(w), F.lit(0)).alias("off"),
    )


def shuffle_rank(d: DataFrame) -> DataFrame:
    """(doc_id, shuffle_pos): the two-level distributed global rank used
    by text_global_shuffle — exposed for reuse and for scale tests."""
    cols = _shuffle_cols(d)
    counts = cols.groupBy("bkt").agg(F.count("*").alias("c"))
    offs = _bucket_offsets(counts, "c")
    win = Window.partitionBy("bkt").orderBy("h", "doc_id")
    pos = (F.col("off") + F.row_number().over(win)).cast("bigint")
    return cols.join(F.broadcast(offs), "bkt").select(
        "doc_id", pos.alias("shuffle_pos")
    )


@query(
    "text_global_shuffle",
    sql=f"""
    SELECT doc_id,
           CAST(row_number() OVER (
                  ORDER BY md5(doc_id::VARCHAR || '{_SHUFFLE_SALT}'), doc_id)
                AS BIGINT) AS shuffle_pos,
           CAST((row_number() OVER (
                  ORDER BY md5(doc_id::VARCHAR || '{_SHUFFLE_SALT}'), doc_id)
                 - 1) // 64 AS INT) AS shard_id
    FROM documents
    ORDER BY shuffle_pos
    """,
    survey_ops="text-shuffle,E,F1",
    tables=("documents",),
)
def text_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-shard construction:
    every document gets a stable position in a pseudo-random total order
    (md5 of its id + salt) and a 64-doc output shard. The oracle's plain
    ``row_number() OVER (ORDER BY md5...)`` would run in ONE partition on
    Spark; here the rank is assembled distributed — row_number within
    each of 256 hash-prefix buckets, plus broadcast per-bucket offsets
    (see module docstring)."""
    pos = F.col("shuffle_pos")
    return (
        shuffle_rank(spark.table("documents"))
        .select(
            "doc_id",
            "shuffle_pos",
            F.floor((pos - 1) / 64).cast("int").alias("shard_id"),
        )
        .orderBy("shuffle_pos")
    )


@query(
    "pipeline_pack_sequences",
    sql=f"""
    WITH t AS (
      SELECT doc_id, len({_TOKENS}) AS n_tok,
             md5(doc_id::VARCHAR || '{_SHUFFLE_SALT}') AS h
      FROM documents),
    o AS (
      SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY h, doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tok AS tok_start
      FROM t)
    SELECT CAST(tok_start // {_CTX} AS INT) AS pack_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS pack_tokens
    FROM o
    GROUP BY pack_id
    ORDER BY pack_id
    """,
    survey_ops="text-packing,E,D2",
    tables=("documents",),
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chop sequence packing: lay the shuffled documents out
    as one token stream and cut it every 512 tokens; each document is
    assigned the pack its first token falls in (the straddling tail is
    the chop). Reports docs + tokens per pack. The running token offset
    is the same two-level distributed prefix sum as text_global_shuffle:
    within-bucket cumulative sum + broadcast 256-row bucket token
    offsets — no single-partition window over the data."""
    d = spark.table("documents")
    base = _shuffle_cols(d).join(
        d.select("doc_id", F.size(word_tokens(F.col("text"))).alias("n_tok")),
        "doc_id",
    )
    totals = base.groupBy("bkt").agg(F.sum("n_tok").alias("tc"))
    offs = _bucket_offsets(totals, "tc")
    win = (
        Window.partitionBy("bkt")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tok_start = F.col("off") + F.sum("n_tok").over(win) - F.col("n_tok")
    return (
        base.join(F.broadcast(offs), "bkt")
        .select("doc_id", "n_tok", tok_start.alias("tok_start"))
        .groupBy(F.floor(F.col("tok_start") / _CTX).cast("int").alias("pack_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("pack_tokens"),
        )
        .orderBy("pack_id")
    )


_RESERVOIR_K = 5


@query(
    "text_reservoir_per_source",
    sql=f"""
    WITH ranked AS (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(doc_id::VARCHAR || ':reservoir7'), doc_id) AS rk
      FROM documents)
    SELECT doc_id, source, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= {_RESERVOIR_K}
    ORDER BY source, rk
    """,
    survey_ops="text-sampling,E,F2",
    tables=("documents",),
)
def text_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size sample: EXACTLY k docs per source (the
    distributed stand-in for per-group reservoir sampling) — keep the k
    smallest md5(doc_id+salt) values within each source. Complements
    text_stratified_sample, which keeps a RATE per group; this keeps a
    COUNT, the shape eval-set and few-shot-prompt construction needs.
    One partitioned window (hash exchange on source), no global sort; a
    rank()-free alternative at extreme group skew is groupBy(source) +
    min_by(doc_id, hash, k)."""
    d = spark.table("documents")
    h = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":reservoir7")))
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _RESERVOIR_K)
        .select("doc_id", "source", F.col("rk").cast("int").alias("rk"))
        .orderBy("source", "rk")
    )


# per-source token budget for pipeline_token_budget (greedy fill below)
_TOKEN_BUDGET = 2_500


@query(
    "pipeline_token_budget",
    sql=f"""
    WITH t AS (
      SELECT doc_id, source, len({_TOKENS}) AS n_tokens FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source
                                 ORDER BY n_tokens DESC, doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND CURRENT ROW) AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, CAST(n_tokens AS INT) AS n_tokens,
           CAST(cum_tokens AS BIGINT) AS cum_tokens
    FROM ranked WHERE cum_tokens <= {_TOKEN_BUDGET}
    ORDER BY source, doc_id
    """,
    survey_ops="corpus-budget(ext),E,F2",
    tables=("documents",),
)
def pipeline_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget fill per source: rank each source's documents
    by a priority key (longest-first here; any INTEGER priority plugs in
    — integer keys keep the cross-engine order exact, where a float
    score's last-ulp tie could flip the cutoff row) and keep documents
    while the running token total stays within the per-source budget.
    This is how a mixture spec ("N tokens from web, M from code") turns
    into a concrete document set. One hash exchange on source; the
    running sum is Spark's single-pass cumulative frame, and the budget
    gate prunes before anything downstream is computed."""
    d = spark.table("documents")
    t = d.select(
        "doc_id", "source", F.size(word_tokens(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _TOKEN_BUDGET)
        .select(
            "doc_id",
            "source",
            F.col("n_tokens").cast("int").alias("n_tokens"),
            F.col("cum_tokens").cast("bigint").alias("cum_tokens"),
        )
        .orderBy("source", "doc_id")
    )


@query(
    "text_weighted_sample",
    sql="""
    WITH keyed AS (
      SELECT doc_id, source, n_chars,
             ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
                 + 1) / 4503599627370496.0) / greatest(n_chars, 1) AS k
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY k DESC, doc_id) AS rk
      FROM keyed
    )
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 5
    ORDER BY source, rk
    """,
    survey_ops="text-sampling,E,F2",
    tables=("documents",),
)
def text_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=5 per source, weight =
    n_chars — the Efraimidis-Spirakis exponential-keys scheme that
    length-weighted training-mix construction needs (pick documents with
    probability proportional to size, never twice). Each doc gets key
    ln(u)/w for a deterministic arithmetic-hash u in (0,1]; the k largest
    keys per group are exactly an ES weighted draw, so the whole sample
    is one partitioned window — same single-exchange shape as the
    unweighted reservoir query. ln is evaluated on identical doubles in
    both engines; ordering (not the key value) is all that's compared, so
    a 1-ulp libm difference cannot flip a rank unless two keys collide to
    within it, which distinct hashes preclude.

    r5: u comes from 52 md5 bits, NOT the affine (22853*id+977) % P the
    r1-r4 version used — dense doc_ids never wrap P, so that u was
    MONOTONE in doc_id and confined to (0, 0.05], turning the 'draw'
    into a high-id preference (the ln(u) numerator spanned a 7x range
    by id) instead of a weight-proportional sample. Same degeneracy
    class as the KMV/CMS/AMS fixes; md5 restores ES's uniform-u
    premise."""
    d = spark.table("documents")
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("bigint") + 1
    ) / F.lit(4503599627370496.0)
    key = F.log(u) / F.greatest(F.col("n_chars"), F.lit(1))
    w = Window.partitionBy("source").orderBy(F.desc(key), F.asc("doc_id"))
    return (
        d.select(
            "doc_id",
            "source",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 5)
        .select("doc_id", "source", "n_chars", F.col("rk").cast("int").alias("rk"))
        .orderBy("source", "rk")
    )


# --- capstone #4: RAG retrieval --------------------------------------------
@query(
    "pipeline_rag_retrieval",
    sql=None,  # composed below from the hybrid-RRF CTE (plans/__init__)
    survey_ops="K7,H1,text-bm25(ext),D6",
    tables=("documents", "embeddings"),
)
def pipeline_rag_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG retrieval capstone: hybrid BM25+vector RRF ranking (top-20)
    enriched into servable passages in one plan — the fused candidates
    join back to the documents table for provenance (source, lang,
    length) and dictionary tags. This is the reference's two-phase
    search+profile (K7, src/semantic_search.py:185-216) rebuilt for a
    retrieval-augmented pipeline: rank lists are k-sized before any
    enrichment join, so the corpus is touched exactly twice (one lexical
    pass, one vector pass) regardless of k. Reuses the REGISTERED hybrid
    query's plan and oracle CTE, so capstone and component stay in
    lockstep by construction."""
    from esco_neo4j_spark.plans.registry import REGISTRY
    from esco_neo4j_spark.plans.text_queries import _TAG_DICT
    from esco_neo4j_spark.functions.text import word_tokens

    hybrid = REGISTRY["vec_hybrid_rrf"].fn(spark, sf_dir)
    d = spark.table("documents")
    dict_df = F.broadcast(spark.createDataFrame(_TAG_DICT, ["term", "tag"]))
    toks = d.select(
        "doc_id",
        F.explode(F.array_distinct(word_tokens(F.col("text")))).alias("term"),
    )
    tags = (
        toks.join(dict_df, "term")
        .groupBy("doc_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("tag"))).alias("tags")
        )
    )
    return (
        hybrid.withColumnRenamed("id", "doc_id")
        .join(d.select("doc_id", "source", "lang", "n_chars"), "doc_id")
        .join(tags, "doc_id", "left")
        .select(
            "doc_id",
            "rrf_nano",
            "lex_rank",
            "vec_rank",
            "source",
            "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            F.coalesce("tags", F.lit("")).alias("tags"),
        )
        .orderBy(F.desc("rrf_nano"), F.asc("doc_id"))
    )


@query(
    "pipeline_dsir_select",
    sql=f"""
    WITH t AS (
      SELECT doc_id, source, {_TOKENS} AS toks FROM documents
    ),
    feats AS (
      SELECT doc_id, source, unnest(
        toks || [toks[i] || ' ' || toks[i + 1]
                 for i in range(1, len(toks))]
      ) AS feat
      FROM t
    ),
    hashed AS (
      SELECT doc_id, source,
             ('0x' || substr(md5(feat), 1, 12))::BIGINT % 1024 AS b
      FROM feats
    ),
    tgt AS (
      SELECT b, count(*) AS c FROM hashed WHERE source = 'src0' GROUP BY b
    ),
    raw AS (SELECT b, count(*) AS c FROM hashed GROUP BY b),
    totals AS (
      SELECT (SELECT count(*) FROM hashed WHERE source = 'src0') AS nt,
             (SELECT count(*) FROM hashed) AS nr
    ),
    score AS (
      SELECT raw.b,
             CAST(round(ln(
               ((coalesce(tgt.c, 0) + 1)::DOUBLE / (totals.nt + 1024))
               / ((raw.c + 1)::DOUBLE / (totals.nr + 1024))
             ) * 1000000) AS BIGINT) AS micro_nats
      FROM raw LEFT JOIN tgt USING (b) CROSS JOIN totals
    )
    SELECT h.doc_id, max(h.source) AS source,
           CAST(count(*) AS INT) AS n_feats,
           CAST(sum(s.micro_nats) AS BIGINT) AS dsir_micro_nats
    FROM hashed h JOIN score s ON h.b = s.b
    GROUP BY h.doc_id
    ORDER BY dsir_micro_nats DESC, h.doc_id LIMIT 100
    """,
    survey_ops="corpus-importance-resampling(ext),D3,C1",
    tables=("documents",),
)
def pipeline_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023 —
    the raw-corpus curation step production LLM pipelines run before
    training): score every document by the log importance ratio of a
    TARGET domain's hashed-n-gram distribution over the RAW corpus
    distribution, then keep the top slice. Target here = the 'src0'
    source (a stand-in for 'looks like Wikipedia'); features are
    unigrams + adjacent bigrams hashed into 1024 buckets
    (engine-neutral md5, same recipe as the sketch family), both
    distributions add-1 smoothed.

    Determinism: per-bucket log-ratios are quantized to INTEGER
    micro-nats BEFORE the per-doc sum (text_unigram_logprob's trick), so
    the doc score is an exact integer in any summation order and the
    top-100 cut has a total order (score desc, doc_id).

    Scale shape at 100 TB: the bucket-score table is 1024 rows built
    from one partial-aggregable count pass; scoring is a broadcast join
    onto the token stream; the only corpus-sized shuffle is the per-doc
    regroup. No vocabulary blow-up (hashing bounds the feature space),
    no driver-side state beyond the broadcast table."""
    d = spark.table("documents")
    # tokenize ONCE into a named column — inlining the tokenizer into
    # each HOF lambda re-evaluates it per reference (perf trap)
    tk = d.select(
        "doc_id", "source", word_tokens(F.col("text")).alias("t")
    )
    bigrams = F.when(
        F.size("t") >= 2,
        F.zip_with(
            F.slice(F.col("t"), F.lit(1), F.size("t") - 1),
            F.slice(F.col("t"), F.lit(2), F.size("t") - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = tk.select(
        "doc_id",
        "source",
        F.explode(F.concat(F.col("t"), bigrams)).alias("feat"),
    )
    hashed = feats.select(
        "doc_id",
        "source",
        (F.conv(F.substring(F.md5("feat"), 1, 12), 16, 10).cast("bigint") % 1024).alias("b"),
    )
    tgt = (
        hashed.filter(F.col("source") == "src0")
        .groupBy("b")
        .agg(F.count("*").alias("ct"))
    )
    raw = hashed.groupBy("b").agg(F.count("*").alias("cr"))
    nt = hashed.filter(F.col("source") == "src0").count()
    nr = hashed.count()
    score = (
        raw.join(tgt, "b", "left")
        .select(
            "b",
            F.round(
                F.log(
                    ((F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double") / F.lit(float(nt + 1024)))
                    / ((F.col("cr") + 1).cast("double") / F.lit(float(nr + 1024)))
                )
                * 1_000_000
            )
            .cast("bigint")
            .alias("micro_nats"),
        )
    )
    return (
        hashed.join(F.broadcast(score), "b")
        .groupBy("doc_id")
        .agg(
            F.max("source").alias("source"),
            F.count("*").cast("int").alias("n_feats"),
            F.sum("micro_nats").cast("bigint").alias("dsir_micro_nats"),
        )
        .orderBy(F.desc("dsir_micro_nats"), "doc_id")
        .limit(100)
    )
