"""Invariant tests for the corpus-construction operators
(plans/corpus_queries.py) beyond the value-exact oracle parity that
tests/test_oracle_parity.py already runs for each of them.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from esco_neo4j_spark.plans import REGISTRY
from esco_neo4j_spark.plans.corpus_queries import _CHUNK_S, _CHUNK_W, _CTX

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_chunks_cover_every_token(spark, docs):
    """Stride < window ⇒ chunk [start, start+len) intervals tile each
    document with no gap; the last chunk reaches the final token."""
    from esco_neo4j_spark.functions.text import word_tokens

    chunks = REGISTRY["text_chunk_windows"].fn(spark, SF_DIR)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max(F.col("start_tok") + F.col("n_chunk_tokens") - 1).alias("last"),
            F.min("start_tok").alias("first"),
        )
    )
    ntok = docs.select(
        "doc_id", F.size(word_tokens(F.col("text"))).alias("n_tok")
    )
    joined = per_doc.join(ntok, "doc_id").collect()
    assert joined
    for r in joined:
        assert r["first"] == 1
        assert r["last"] == r["n_tok"]
        # consecutive starts differ by exactly the stride ⇒ no gaps
        # (start_tok is ci*stride+1), and chunk count matches geometry
        expected = max(0, -(-(r["n_tok"] - _CHUNK_W) // _CHUNK_S)) + 1
        assert r["n_chunks"] == expected
        assert _CHUNK_S < _CHUNK_W  # overlap invariant the tiling relies on


def test_repetition_scores_bounded(spark):
    rows = REGISTRY["text_repetition_scores"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["distinct_ratio"] <= 1.0
        assert 0.0 <= r["top_bigram_frac"] <= 1.0
        # a doc with all-distinct tokens cannot have a repeated bigram
        if r["distinct_ratio"] == 1.0 and r["n_tokens"] >= 3:
            # 1e-6 headroom: the column is rounded to 6dp, which can
            # round the exact bound upward by as much as 5e-7
            assert r["top_bigram_frac"] <= 1.0 / (r["n_tokens"] - 1) + 1e-6


def test_contamination_frac_consistent(spark):
    rows = REGISTRY["text_contamination_overlap"].fn(spark, SF_DIR).collect()
    assert rows  # tiny synthetic vocab ⇒ collisions must exist
    for r in rows:
        assert 1 <= r["n_contaminated"] <= r["n_shingles"]
        assert abs(
            r["contamination_frac"] - round(r["n_contaminated"] / r["n_shingles"], 6)
        ) < 1e-9


def test_global_shuffle_is_a_permutation(spark, docs):
    out = REGISTRY["text_global_shuffle"].fn(spark, SF_DIR)
    rows = out.collect()
    n = docs.count()
    assert len(rows) == n
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(1, n + 1))
    assert len({r["doc_id"] for r in rows}) == n
    for r in rows:
        assert r["shard_id"] == (r["shuffle_pos"] - 1) // 64
    # deterministic across runs
    again = REGISTRY["text_global_shuffle"].fn(spark, SF_DIR).collect()
    assert [(r["doc_id"], r["shuffle_pos"]) for r in again] == [
        (r["doc_id"], r["shuffle_pos"]) for r in rows
    ]


def test_packing_conserves_tokens_and_fills_packs(spark, docs):
    from esco_neo4j_spark.functions.text import word_tokens

    packs = REGISTRY["pipeline_pack_sequences"].fn(spark, SF_DIR).collect()
    total = docs.select(
        F.sum(F.size(word_tokens(F.col("text")))).alias("t")
    ).collect()[0]["t"]
    assert sum(p["pack_tokens"] for p in packs) == total
    ids = [p["pack_id"] for p in packs]
    assert ids == sorted(ids) and ids[0] == 0
    # concat-and-chop: every pack boundary is crossed by a straddling doc
    # or met exactly, so no pack can start beyond the stream's end
    assert ids[-1] == (total - 1) // _CTX or ids[-1] == (total - 1) // _CTX - 1


def _straddling_corpus(spark):
    """Clone families at varying mutation strength, straddling the 0.7
    Jaccard threshold — shared by the prefix-filter losslessness test
    and the witness-verify parity test."""
    base = ("the quick brown fox jumps over the lazy dog while seventeen "
            "sleepy otters carry tiny baskets of ripe blackberries down "
            "the winding river path toward the old stone mill")
    words = base.split()
    rows = []
    did = 0
    # family f mutates f words per copy: f=0,1 stay near-dups (J >= 0.7),
    # higher f sinks below the threshold — pairs straddle the boundary
    for fam in range(6):
        for copy in range(5):
            muts = {(copy * 5 + k * 7) % len(words) for k in range(fam)}
            ws = [
                (f"mut{fam}_{copy}_{i}" if i in muts else w)
                for i, w in enumerate(words)
            ]
            rows.append((did, " ".join(ws) + f" fam{fam}"))
            did += 1
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_ngram_jaccard_prefix_filter_lossless(spark):
    """r3: PPJoin prefix filtering must return EXACTLY the brute-force
    pair set on a corpus engineered with heavy near-duplication (clone
    families at varying mutation strength, straddling the threshold)."""
    from esco_neo4j_spark.operators.dedup import ngram_jaccard_pairs, shingled

    df = _straddling_corpus(spark)

    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.7).collect()
    )

    # brute force over the same shingle sets
    sets = {
        r["id"]: set(r["sh"])
        for r in shingled(df, "text", "doc_id", 3).collect()
    }
    import math

    want = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            j = math.floor(j * 1e6 + 0.5) / 1e6
            if j >= 0.7:
                want.append((a, b, j))
    assert got == sorted(want) and len(want) > 0


def test_ngram_witness_verify_matches_broadcast_path(spark):
    """r10 (sf30 triage): beyond the broadcast budget the verify is
    witness-grouped (cogroup at each pair's rarest common prefix
    shingle) instead of an array-carrying sort-merge join. Forcing a
    zero budget must yield BIT-IDENTICAL output to the broadcast path
    on the straddling corpus — jaccard/rounding/threshold run in shared
    JVM expressions, so any divergence is a witness-grouping bug
    (a pair landing in no group, or a doc array missing from its
    group)."""
    from esco_neo4j_spark.operators.dedup import ngram_jaccard_pairs

    df = _straddling_corpus(spark)
    rows = lambda out: sorted(  # noqa: E731
        (r["id_a"], r["id_b"], r["jaccard"]) for r in out.collect()
    )
    bcast = rows(ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.7))
    witness = rows(
        ngram_jaccard_pairs(
            df, "text", "doc_id", threshold=0.7, verify_broadcast_bytes=0
        )
    )
    assert witness == bcast and len(bcast) > 0


def test_symdel_editdist_lossless(spark):
    """r5: the SymSpell deletion-neighborhood join must return EXACTLY
    the brute-force levenshtein <= 1 pair set on a fixture covering every
    edit kind (equal keys, substitution, single insert/delete at head /
    middle / tail) plus ED = 2 keys that a naive shared-variant check
    might accidentally admit (the verify must reject them) and keys with
    nothing nearby."""
    from esco_neo4j_spark.operators.dedup import symdel_pairs

    keys = [
        "alpha", "alpha",       # duplicated key -> ONE distinct key, n=2
        "alphb",                # substitution (tail)
        "alpa",                 # deletion (middle)
        "xalpha",               # insertion (head)
        "alph",                 # deletion (tail)
        "blpha",                # substitution (head)
        "alpxx",                # ED 2 from alpha
        "zzz", "z",             # far away / very short
        "",                     # empty string edge
    ]
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "id bigint, key string"
    )
    got = sorted(
        (r["key_a"], r["key_b"], r["ed"], r["n_a"], r["n_b"])
        for r in symdel_pairs(df, "key").collect()
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    from collections import Counter

    counts = Counter(keys)
    dk = sorted(counts)
    want = sorted(
        (a, b, lev(a, b), counts[a], counts[b])
        for i, a in enumerate(dk)
        for b in dk[i + 1:]
        if lev(a, b) <= 1
    )
    assert got == want and len(want) >= 7
    assert all(ed <= 1 for _, _, ed, _, _ in got)
    # duplicated "alpha" surfaces as n=2 on every pair it joins, never
    # as extra rows (key-level output: cost tracks distinct keys)
    alpha_rows = [r for r in got if "alpha" in (r[0], r[1])]
    assert alpha_rows and all(
        (r[3] if r[0] == "alpha" else r[4]) == 2 for r in alpha_rows
    )
    # the ED=2 key must not pair with alpha-family keys it is 2 edits from
    assert all(
        not (("alpxx" in (a, b)) and ("alpha" in (a, b)))
        for a, b, _, _, _ in got
    )


def test_bpe_merge_semantics(spark):
    """BPE trainer invariants on a tiny literal corpus: (1) overlapping
    pair runs merge greedily left-to-right ('aaaa' -> [aa, aa, $], never
    [a, aaa...]); (2) the argmax tie-break is the pair string, so 'a b'
    beats 'c d' at equal count; (3) a merge rule (a, b) never fires
    inside longer tokens ('abx' stays untouched by it)."""
    from esco_neo4j_spark.plans.text_queries import _bpe_merge_loop

    spark.createDataFrame(
        [(1, "aaaa aaaa ab cd abx", "src0")], ["doc_id", "text", "source"]
    ).createOrReplaceTempView("documents")
    try:
        rows, state = _bpe_merge_loop(spark)
        # round 1: 'a a' appears 3x in each 'aaaa' (weight 2 words... freq
        # counted per word-occurrence: 'aaaa' freq=2, pairs 3 each -> 6).
        r1 = rows[0]
        assert (r1[1], r1[2]) == ("a", "a") and r1[3] == 6
        # greedy overlap: after merging (a,a), each 'aaaa' is
        # (aa)(aa)($) = 3 tokens (x2 words) and ab/cd/abx are untouched
        # (3+3+4): corpus = 16. A boundary-consumption bug (first match
        # eating the next one's delimiter) would leave (aa)(a)(a)($) = 18.
        assert r1[4] == 16
        # after all rounds every rep must still be a partition of the
        # word's characters + EOW — merges never corrupt token content
        reps = {r["w"]: r["rep"] for r in state.collect()}
        for w, rep in reps.items():
            assert rep.replace("(", "").replace(")", "") == w + "$"
    finally:
        spark.catalog.dropTempView("documents")


def test_bpe_tiebreak_prefers_smaller_pair_string(spark):
    from esco_neo4j_spark.plans.text_queries import _bpe_merge_loop

    spark.createDataFrame(
        [(1, "ab cd", "src0")], ["doc_id", "text", "source"]
    ).createOrReplaceTempView("documents")
    try:
        rows, _ = _bpe_merge_loop(spark)
        assert (rows[0][1], rows[0][2]) == ("a", "b")
    finally:
        spark.catalog.dropTempView("documents")


def test_weighted_sample_is_size_biased(spark):
    """r5 regression guard (degenerate-affine-hash class): the
    Efraimidis-Spirakis draw must actually be WEIGHT-proportional — the
    selected docs' mean length must exceed the corpus mean (the old
    monotone-in-id u produced a high-id preference instead; with a
    length-weighted draw of 5x5 docs the size bias is near-certain and,
    being deterministic, pinned once green)."""
    from pyspark.sql import functions as F

    from esco_neo4j_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.01"
    sel = REGISTRY["text_weighted_sample"].fn(spark, sf)
    m_sel = sel.agg(F.avg("n_chars")).first()[0]
    m_all = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .agg(F.avg("n_chars"))
        .first()[0]
    )
    assert m_sel > m_all, (m_sel, m_all)


def test_symdel_editdist2_lossless(spark):
    """ED <= 2 deletion neighborhoods must return EXACTLY the brute-force
    levenshtein <= 2 pair set — including two-substitution,
    insert+substitute, delete+delete, and transposition-looking (= two
    substitutions under plain Levenshtein) pairs — while ED = 3 keys stay
    excluded."""
    from esco_neo4j_spark.operators.dedup import symdel_pairs

    keys = [
        "gamma", "gamma",   # dup key
        "gxmma",            # 1 sub
        "gxmmx",            # 2 subs
        "amma",             # 1 del
        "mma",              # 2 dels
        "xgammax",          # 2 ins
        "gamam",            # swap tail = 2 subs under Levenshtein
        "gxmxx",            # 3 edits from gamma -> excluded
        "qqqqq", "",        # far away / empty
        "ab", "ba",         # short swap (ed 2)
    ]
    df = spark.createDataFrame(
        [(i, k) for i, k in enumerate(keys)], "id bigint, key string"
    )
    got = sorted(
        (r["key_a"], r["key_b"], r["ed"])
        for r in symdel_pairs(df, "key", max_edit=2).collect()
    )

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    dk = sorted(set(keys))
    want = sorted(
        (a, b, lev(a, b))
        for i, a in enumerate(dk)
        for b in dk[i + 1:]
        if lev(a, b) <= 2
    )
    assert got == want and len(want) >= 10
    assert any(ed == 2 for _, _, ed in got)
    assert all(
        not (("gxmxx" in (a, b)) and ("gamma" in (a, b)))
        for a, b, _ in got
    )


def test_cdc_chunks_invariants(spark):
    """Content-defined chunking: chunks partition each doc exactly (no
    char lost or duplicated), boundaries are content-determined (an
    insertion near the END of a doc leaves the early chunks' hashes
    unchanged — the property fixed-size blocks lack), and short docs
    (< window) come through as a single chunk."""
    from esco_neo4j_spark.operators.dedup import cdc_chunk_stats

    base = "the quick brown fox jumps over the lazy dog " * 8
    edited = base + "EXTRA TAIL TEXT"  # tail edit
    rows = [
        (1, base, "g"),
        (2, edited, "g"),
        (3, "short", "g"),  # < window: single chunk, no cuts possible
        (4, "", "g"),  # empty: filtered at the gate
        (5, None, "g"),  # null: filtered at the gate
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = cdc_chunk_stats(df, group_col="source").collect()
    assert len(out) == 1
    r = out[0]
    # exact partition: total chars == sum of the surviving docs' lengths
    assert r["total_chars"] == len(base) + len(edited) + len("short")
    # docs 1 and 2 share every pre-edit chunk, so dedup must bite:
    # distinct chars strictly below total, and by at least len(base)'s
    # shared prefix minus one boundary-spanning chunk
    assert r["distinct_chars"] < r["total_chars"]
    assert 0.0 < r["dedup_ratio"] < 1.0

    # chunk-level check via the UDF-free reference implementation
    # (r7: Karp-Rabin base-53 window hash — same polynomial as the Arrow
    # chunker and the DuckDB oracle; O(1)-rollable in a stream consumer)
    def ref_chunks(t, window=8, divisor=32):
        n = len(t)
        cuts = [
            i
            for i in range(window, n + 1)
            if sum(ord(t[i - 1 - j]) * 53**j for j in range(window))
            % divisor
            == 0
        ]
        b = sorted(set([0] + cuts + [n]))
        return [t[x:y] for x, y in zip(b, b[1:])]

    cb, ce = ref_chunks(base), ref_chunks(edited)
    assert "".join(cb) == base and "".join(ce) == edited
    # content-defined: every chunk of base except possibly the LAST is
    # also a chunk of the edited doc (the tail edit only perturbs the
    # final chunk's boundary)
    assert set(cb[:-1]) <= set(ce)
    assert ref_chunks("short") == ["short"]

    # rolling-update equivalence: the textbook O(1) Karp-Rabin update
    # reproduces every window hash the batch polynomial computes
    w, h = 8, 0
    rolled = []
    for i, ch in enumerate(base):
        h = h * 53 + ord(ch)
        if i >= w:
            h -= ord(base[i - w]) * 53**w
        if i >= w - 1:
            rolled.append(h)
    batch = [
        sum(ord(base[i - 1 - j]) * 53**j for j in range(w))
        for i in range(w, len(base) + 1)
    ]
    assert rolled == batch


def test_cdc_golden_boundaries(spark):
    """Golden pin of the exact KR cut positions on a fixed string —
    any change to the boundary polynomial (base, window, divisor,
    ordering) shows up here before it silently shifts every chunk in
    the corpus and with it the dedup ratios."""
    from esco_neo4j_spark.operators.dedup import cdc_chunk_stats

    text = "the quick brown fox jumps over the lazy dog " * 4
    w, div = 8, 32
    cuts = [
        i
        for i in range(w, len(text) + 1)
        if sum(ord(text[i - 1 - j]) * 53**j for j in range(w)) % div == 0
    ]
    # golden: recompute independently once, then pin
    assert len(cuts) >= 2, "fixture must produce a multi-chunk doc"
    df = spark.createDataFrame(
        [(1, text, "g")], "doc_id bigint, text string, source string"
    )
    r = cdc_chunk_stats(df, group_col="source").collect()[0]
    assert r["n_chunks"] == len(sorted(set([0] + cuts + [len(text)]))) - 1
    assert r["total_chars"] == len(text)


def test_minhash_null_text_never_pairs(spark):
    """r7 ADVICE (medium): NULL-text docs must drop before banding — the
    expression chain this Arrow pass replaced (shingled(NULL) -> NULL
    array -> explode drops the row) and the DuckDB oracle never pair
    them. Empty-STRING docs keep their real [""] shingle and still pair
    with each other at jaccard 1.0."""
    from esco_neo4j_spark.operators.dedup import minhash_dedup_pairs

    rows = [
        (0, None),
        (1, None),
        (2, ""),
        (3, ""),
        (4, "the quick brown fox jumps over the lazy dog tonight"),
        (5, "the quick brown fox jumps over the lazy dog tonight"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(
            df, "text", "doc_id", threshold=0.5
        ).collect()
    }
    assert not any(0 in p or 1 in p for p in got), "NULL text paired"
    assert (2, 3) in got and (4, 5) in got


def test_cdc_window_overflow_guard(spark):
    """r8 (r7 ADVICE): the Karp-Rabin window hash is exact int64 only via
    the geometric-sum bound 0x10FFFF*(53^w - 1)/52 < 2^63, which holds
    for w <= 8. window >= 9 must raise loudly (numpy would silently wrap
    while DuckDB raises on BIGINT overflow — engine divergence)."""
    import pytest as _pytest

    from esco_neo4j_spark.operators.dedup import cdc_chunk_stats

    df = spark.createDataFrame(
        [(1, "a", "hello world")], "doc_id bigint, source string, text string"
    )
    assert 0x10FFFF * (53**8 - 1) // 52 < 2**63
    assert 0x10FFFF * (53**9 - 1) // 52 >= 2**63
    with _pytest.raises(ValueError, match="window <= 8"):
        cdc_chunk_stats(df, group_col="source", window=9)
    # window=8 (the default) still runs
    assert len(cdc_chunk_stats(df, group_col="source", window=8).collect()) == 1


def test_simhash_gate_matches_tokenizer_on_case_folding(spark):
    """r8 (r7 ADVICE): the JVM-side input gate must test lower(text) —
    lower() maps some chars INTO the token class (U+212A KELVIN SIGN ->
    'k', U+0130 -> 'i' + combining dot), so a raw-text gate would drop
    docs whose token set is non-empty. The gate must emit a simhash row
    exactly when the tokenizer yields tokens."""
    from esco_neo4j_spark.operators.dedup import simhash

    rows = [
        (1, "\u212a\u212a"),  # KELVIN SIGN x2 -> token {'kk'}
        (2, "\u0130stanbul"),  # U+0130 -> 'i'+combining dot -> tokens
        (3, "\u043f\u043e\u0433\u043e\u0434\u0430 \u2022"),  # cyrillic only -> no token
        (4, "hello"),           # ordinary
        (5, None),              # NULL text -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.id for r in simhash(df, "text", "doc_id").collect()}
    assert got == {1, 2, 4}


def test_semdedup_two_level_assignment_matches_oracle(spark, tmp_path):
    """r8 (r7 verdict item 3): once k > 32 the SemDeDup assignment goes
    two-level (vector -> coarse cell -> fine argmax within the cell).
    The shipped testdata never triggers that branch (N <= 2048 -> k=8),
    so this synthesizes a corpus big enough (N=8448 -> k=33, m=6) and
    pins Spark == DuckDB exactly on the TWO-LEVEL plan, plus the m
    derivation itself."""
    import os
    import random

    import duckdb

    from esco_neo4j_spark.plans.dedup_queries import (
        _semdedup_k,
        derive_semdedup_coarse,
    )
    from esco_neo4j_spark.plans.registry import REGISTRY, resolve_sql

    assert derive_semdedup_coarse(8) == 0
    assert derive_semdedup_coarse(32) == 0
    assert derive_semdedup_coarse(33) == 6
    assert derive_semdedup_coarse(235) == 16

    rng = random.Random(11)
    n, dim = 8448, 64
    rows = [
        (i, [round(rng.gauss(0.0, 1.0), 4) for _ in range(dim)])
        for i in range(n)
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).coalesce(4).write.parquet(os.path.join(sf_dir, "embeddings.parquet"))

    k = _semdedup_k(sf_dir)
    m = derive_semdedup_coarse(k)
    assert (k, m) == (33, 6), "corpus must exercise the two-level branch"

    q = REGISTRY["dedup_semantic_bucketed"]
    got = sorted(
        (r.vec_id, r.cluster, r.canonical_id)
        for r in q.fn(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{sf_dir}/embeddings.parquet/*.parquet')"
    )
    want = sorted(
        (r["vec_id"], r["cluster"], r["canonical_id"])
        for r in con.execute(resolve_sql(q, sf_dir)).fetchdf().to_dict(
            "records"
        )
    )
    assert got == want and len(got) > 0


def test_simhash_leader_clusters_star_guarantee(spark):
    """r9 (r8 verdict item 2): the O(N)-output SimHash dedup must hold
    its contract on a real corpus — (a) exactly one row per doc with a
    fingerprint, (b) every duplicate's canonical is a KEPT (self-
    canonical) doc, (c) the star guarantee: hamming(doc, canonical)
    <= 3 for every duplicate, (d) canonicals are cluster minima (no
    duplicate with an id below its canonical), (e) total output is N
    rows when composed with the registered query's self-canonical
    passthrough for token-less docs."""
    from esco_neo4j_spark.operators.dedup import (
        simhash,
        simhash_leader_clusters,
    )
    from esco_neo4j_spark.plans.registry import REGISTRY

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    asg = simhash_leader_clusters(docs, "text", "doc_id", rounds=4)
    fps = {r["id"]: r["simhash"] for r in simhash(docs, "text", "doc_id").collect()}
    rows = asg.collect()
    assert len(rows) == len(fps)
    assert {r["id"] for r in rows} == set(fps)
    canon = {r["id"]: r["canonical_id"] for r in rows}
    dups = [r for r in rows if r["is_duplicate"]]
    assert len(dups) > 0, "corpus should contain near-dups"
    for r in dups:
        c = r["canonical_id"]
        assert canon[c] == c, "canonical must be a kept doc"
        assert c < r["id"], "canonical must be the cluster min side"
        hd = bin(fps[r["id"]] ^ fps[c]).count("1")
        assert hd <= 3, (r["id"], c, hd)

    total = REGISTRY["dedup_simhash_canonical"].fn(spark, sf)
    n_docs = docs.count()
    assert total.count() == n_docs


def test_simhash_leader_clusters_partition_invariance(spark):
    """Same distributed-determinism pin for the leader clustering: the
    bucket min-election, the per-doc best-leader argmin, and the
    self-leader acceptance are all pure functions of the fingerprint
    multiset, so the (doc -> canonical) assignment must not depend on
    how the input happens to be partitioned."""
    from esco_neo4j_spark.operators.dedup import simhash_leader_clusters

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))

    def run(frame):
        return sorted(
            (r.id, r.canonical_id, r.is_duplicate)
            for r in simhash_leader_clusters(
                frame, "text", "doc_id", rounds=4
            ).collect()
        )

    base = run(docs.coalesce(1))
    assert base == run(docs.repartition(32))
    assert base == run(docs.repartition(5, "doc_id"))
