"""Scale smoke tests: run the scale-critical machinery on MILLIONS of
generated rows (100-1000x the sf0.001 fixtures) and assert exact
invariants. These catch the failure modes the small fixtures cannot — a
single-partition window, an accidental O(n^2) expansion, a driver-side
materialization — because any of those either breaks the invariant or
blows the test far past its budget at this size.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N = 2_000_000


@pytest.fixture(scope="module")
def big(spark):
    # deterministic synthetic ids; 64 partitions so every stage is
    # genuinely parallel (a 1-partition accident would be invisible)
    return spark.range(0, N, 1, 64).withColumnRenamed("id", "doc_id")


def test_distributed_shuffle_rank_is_a_permutation_at_2m(spark, big):
    from esco_neo4j_spark.plans.corpus_queries import shuffle_rank

    r = shuffle_rank(big)
    stats = r.agg(
        F.count("*").alias("n"),
        F.countDistinct("shuffle_pos").alias("d"),
        F.min("shuffle_pos").alias("lo"),
        F.max("shuffle_pos").alias("hi"),
    ).collect()[0]
    assert (stats["n"], stats["d"]) == (N, N)
    assert (stats["lo"], stats["hi"]) == (1, N)


def test_exact_dedup_at_4m_rows_2m_groups(spark):
    # 4m rows, every content value duplicated exactly twice across
    # different "docs" — the one-shuffle hash dedup must keep 2m firsts
    rows = spark.range(0, 2 * N, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.md5((F.col("id") % N).cast("string")).alias("content_hash"),
    )
    firsts = rows.groupBy("content_hash").agg(
        F.min("doc_id").alias("keep"), F.count("*").alias("n")
    )
    got = firsts.agg(
        F.count("*").alias("groups"),
        F.sum("n").alias("total"),
        F.max("n").alias("biggest"),
    ).collect()[0]
    assert (got["groups"], got["total"], got["biggest"]) == (N, 2 * N, 2)


def test_chunking_expression_handles_a_million_token_document(spark):
    # per-row boundedness: one pathological document with 1m tokens must
    # chunk without skew machinery — work is O(doc length), not O(corpus)
    from esco_neo4j_spark.plans.corpus_queries import _CHUNK_S, _CHUNK_W

    one = spark.range(1).select(
        F.lit(1).alias("doc_id"),
        F.array_repeat(F.lit("tok"), 1_000_000).alias("toks"),
    )
    n_chunks = (
        F.ceil(
            F.greatest(F.size("toks") - _CHUNK_W, F.lit(0))
            / F.lit(float(_CHUNK_S))
        ).cast("bigint")
        + 1
    )
    exploded = one.select(
        "doc_id",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias("ci", "c"),
    )
    expected = -(-(1_000_000 - _CHUNK_W) // _CHUNK_S) + 1
    assert exploded.count() == expected


def test_token_budget_fill_at_2m_rows_100_sources(spark):
    # the cumulative window must run per-source in parallel and cut
    # exactly at the budget: 100 sources x 20k docs of 10 tokens each,
    # budget 2500 -> exactly 250 kept per source, max cum <= budget
    from esco_neo4j_spark.plans.corpus_queries import _TOKEN_BUDGET
    from pyspark.sql import Window

    rows = spark.range(0, N, 1, 64).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 100).cast("string").alias("source"),
        F.lit(10).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_tokens"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = (
        rows.withColumn("cum", F.sum("n_tokens").over(w))
        .filter(F.col("cum") <= _TOKEN_BUDGET)
    )
    got = kept.groupBy("source").agg(
        F.count("*").alias("n"), F.max("cum").alias("hi")
    )
    stats = got.agg(
        F.count("*").alias("sources"),
        F.min("n").alias("lo_n"),
        F.max("n").alias("hi_n"),
        F.max("hi").alias("max_cum"),
    ).collect()[0]
    per_source = _TOKEN_BUDGET // 10
    assert (
        stats["sources"], stats["lo_n"], stats["hi_n"]
    ) == (100, per_source, per_source)
    assert stats["max_cum"] <= _TOKEN_BUDGET


def test_lag_transition_pairs_at_2m_events(spark):
    # the lag window pairs exactly n-1 consecutive rows per key: 2m
    # events over 1000 users -> sum of (n_k - 1) = N - 1000 transitions
    from pyspark.sql import Window

    ev = spark.range(0, N, 1, 64).select(
        (F.col("id") % 1000).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.col("id") % 7).cast("string").alias("event_type"),
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    pairs = (
        ev.select("event_type", F.lag("event_type").over(w).alias("prev"))
        .filter(F.col("prev").isNotNull())
    )
    assert pairs.count() == N - 1000


def test_lsh_banding_finds_every_planted_duplicate_at_200k_docs(spark):
    # 100k distinct synthetic texts, each planted TWICE under different
    # ids: identical text -> identical signature -> same bucket in every
    # band, so banded candidate generation must recover ALL 100k planted
    # pairs (exact-duplicate recall is 1.0 by construction, no tuning).
    # Runtime bounds the shape: signature+banding is a narrow map and the
    # bucket join never goes quadratic.
    from esco_neo4j_spark.operators.dedup import (
        _minhash_sig_from_hashed,
        lsh_candidate_pairs,
        md5_int28,
        shingled,
    )

    n_texts = 100_000
    docs = spark.range(0, 2 * n_texts, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            *[
                F.md5(((F.col("id") % n_texts) * 7 + j).cast("string"))
                for j in range(6)
            ],
        ).alias("text"),
    )
    sh = shingled(docs, "text", "doc_id")
    hashed = sh.select("id", F.transform("sh", md5_int28).alias("hs"))
    sigs = _minhash_sig_from_hashed(hashed, 16)
    # max_bucket=None: planted buckets legitimately hold the pair itself
    cands = lsh_candidate_pairs(sigs, 4, 4, max_bucket=None)
    planted = cands.filter(
        F.col("id_b") - F.col("id_a") == n_texts
    ).count()
    assert planted == n_texts


def test_substring_span_merge_at_1m_docs(spark):
    """Duplicated-window span machinery at 1m docs: plant a shared
    5-token window in every 100th doc (10k docs share it), unique filler
    elsewhere. The inverted index must flag EXACTLY the planted docs and
    the island merge must produce one span per flagged doc — any
    accidental all-pairs expansion on the 10k-doc bucket would blow the
    budget (10k^2/2 = 50m pairs)."""
    n = 1_000_000
    docs = spark.range(0, n, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 100 == 0,
            F.concat(
                F.lit("shared dup window token five "),
                F.format_string("u%d a%d b%d c%d d%d", "id", "id", "id", "id", "id"),
            ),
        )
        .otherwise(
            F.format_string(
                "u%d v%d w%d x%d y%d z%d q%d r%d s%d t%d",
                *(["id"] * 10),
            )
        )
        .alias("text"),
    )
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id",
        F.expr("filter(split(lower(text), '[^a-z0-9\\']+'), x -> x != '')").alias("toks"),
    ).filter(F.size("toks") >= 5)
    wins = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(toks) - 5), "
                "i -> md5(array_join(slice(toks, i + 1, 5), ' ')))"
            )
        ).alias("pos", "wid"),
    )
    dup = (
        wins.groupBy("wid")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("wid")
    )
    dpos = wins.join(dup, "wid").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    gap = F.when(F.col("pos") - F.lag("pos").over(w) > 5, 1).otherwise(0)
    spans = (
        dpos.withColumn(
            "island", F.sum(gap).over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("doc_id", "island")
        .agg(F.min("pos").alias("s"), F.max("pos").alias("e"))
    )
    got = spans.agg(
        F.count("*").alias("n_spans"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("s").alias("max_start"),
    ).collect()[0]
    assert got["n_spans"] == n // 100      # one span per planted doc
    assert got["n_docs"] == n // 100
    assert got["max_start"] == 0           # the shared window opens each doc


def test_blocked_gemm_exact_join_at_50k_vectors(spark):
    """Exact all-pairs cosine at 50k x 16d (1.25 BILLION pairs scored)
    through the blocked GEMM path in bounded per-task memory. Planted:
    vector i and i+25000 are identical for i < 100, everything else is
    hash-noise — the join at a high threshold must recover exactly the
    planted pairs (any quadratic-materialization accident would OOM or
    blow the budget long before)."""
    from esco_neo4j_spark.operators.similarity import blocked_cosine_pairs

    n, half, planted = 50_000, 25_000, 100
    base = spark.range(0, n, 1, 32).selectExpr(
        "id as vec_id",
        # 16-dim deterministic noise; planted twins share (id % 25000)
        # only for id%25000 < 100, else the full id decides the vector
        f"""transform(sequence(0, 15), j ->
             cast(hash(if(id % {half} < {planted}, id % {half}, id), j)
                  % 1000 as float) / 1000.0) as embedding""",
    )
    pairs = blocked_cosine_pairs(
        base, threshold=0.999999, block=4096, id_col="vec_id"
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    want = {(i, i + half) for i in range(planted)}
    assert want <= got
    # near-exact extras can only come from hash-noise collisions; bound them
    assert len(got) <= len(want) + 5


def test_arrow_bucket_and_cosine_udfs_at_1m_vectors(spark):
    """r5 Arrow hot paths at 1M rows: _all_buckets_pudf must produce
    n_tables in-range bucket ids per row with a roughly-balanced global
    histogram (the whole point of derived banding), and the pair-cosine
    UDF must agree with an exact expression on a sampled slice — the
    smoke that the Arrow batch shape survives multi-million-row input,
    not just the 20k audit corpus."""
    from pyspark.sql import functions as F

    from esco_neo4j_spark.operators.similarity import (
        _all_buckets_pudf,
        _pair_cosine_pudf,
    )

    N, DIM, PLANES, TABLES = 1_000_000, 8, 6, 4
    vecs = spark.range(0, N, 1, 64).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 7),"
            " j -> cast(sin(id * 0.37 + j * 1.13) as double))"
        ).alias("embedding"),
    )
    buckets = _all_buckets_pudf(DIM, PLANES, TABLES, seed=42)
    keyed = vecs.select(
        "vec_id", F.posexplode(buckets(F.col("embedding"))).alias("t", "b")
    )
    hist = keyed.groupBy("t", "b").count()
    rows = hist.collect()
    assert len(rows) <= TABLES * (1 << PLANES)
    per_table = {}
    for r in rows:
        assert 0 <= r["b"] < (1 << PLANES) and 0 <= r["t"] < TABLES
        per_table.setdefault(r["t"], []).append(r["count"])
    assert set(per_table) == set(range(TABLES))
    for t, counts in per_table.items():
        assert sum(counts) == N
        # no bucket may swallow the corpus: the sinusoid family spreads
        # across sign patterns, so the hottest bucket stays a minority
        assert max(counts) < 0.5 * N, (t, max(counts))

    # pair cosine: Arrow result == exact expression on a 1k slice
    from esco_neo4j_spark.functions.vector import cosine_similarity

    pair_cos = _pair_cosine_pudf()
    pairs = (
        vecs.filter(F.col("vec_id") < 1000)
        .select(
            "vec_id",
            F.col("embedding").alias("va"),
            F.reverse("embedding").alias("vb"),
        )
    )
    diff = pairs.select(
        (F.abs(pair_cos("va", "vb") - cosine_similarity(F.col("va"), F.col("vb")))).alias("d")
    ).agg(F.max("d")).first()[0]
    assert diff == 0.0  # bit-exact, not approximately equal


def test_arrow_simhash_matches_expression_chain_at_200k_docs(spark):
    """The r6 Arrow SimHash (one narrow pass) must be BIT-IDENTICAL to
    the explode -> 60-conditional-sums -> reassemble expression chain it
    replaced, at a scale where every partition genuinely works. Synthetic
    texts cycle a 997-word vocabulary so token sets repeat and collide
    realistically; also pins the empty-document dropped-row contract."""
    from esco_neo4j_spark.functions.text import word_tokens
    from esco_neo4j_spark.operators.dedup import (
        SIMHASH_BITS,
        md5_long,
        simhash,
    )

    n = 200_000
    docs = spark.range(0, n, 1, 64).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 997 == 0, F.lit("")).otherwise(
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit(f"w{k}_"), ((F.col("id") + k) % 997))
                    for k in range(12)
                ],
            )
        ).alias("text"),
    )
    got = simhash(docs, "text", "doc_id")

    # reference: the old expression-chain formulation, inline
    toks = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(word_tokens(F.col("text")))).alias("tok"),
    ).withColumn("h", md5_long(F.col("tok")))
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1
                ).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(SIMHASH_BITS)
        ]
    )
    fp = None
    for b in range(SIMHASH_BITS):
        term = F.when(
            F.col(f"b{b}") > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
        ).otherwise(F.lit(0).cast("bigint"))
        fp = term if fp is None else fp + term
    want = bit_sums.select("id", fp.alias("simhash"))

    diff = (
        got.withColumnRenamed("simhash", "a")
        .join(want.withColumnRenamed("simhash", "b"), "id", "full")
        .filter(
            F.col("a").isNull()
            | F.col("b").isNull()
            | (F.col("a") != F.col("b"))
        )
        .count()
    )
    assert diff == 0
    # 997 empty docs dropped on BOTH sides
    assert got.count() == n - (n + 996) // 997
