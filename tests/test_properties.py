"""Hypothesis property tests for the invariants the engine's scale story
rests on — randomized inputs, few examples (a Spark round-trip per example
is expensive), deadline disabled for JVM warm-up jitter.

Each property here is the contract a composed pipeline RELIES on rather
than a specific query result: sketches never undercount, blooms never drop
true members, salting never changes join results, topological layers
respect every edge.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys_lists = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=1, max_size=120
)


@SLOW
@given(keys=keys_lists)
def test_cms_never_undercounts(spark, keys):
    from collections import Counter

    from pyspark.sql import functions as F

    from esco_neo4j_spark.operators.sketch import cms_build, cms_estimate

    df = spark.createDataFrame([(k,) for k in keys], "k bigint")
    sketch = cms_build(df, "k", width=32)  # tiny width -> heavy collisions
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(
            sketch, df.select("k").distinct(), "k", width=32
        ).collect()
    }
    exact = Counter(keys)
    assert set(est) == set(exact)
    for k, e in est.items():
        assert e >= exact[k]


@SLOW
@given(
    members=st.sets(st.integers(min_value=0, max_value=5_000), min_size=1,
                    max_size=60),
    probes=st.sets(st.integers(min_value=0, max_value=5_000), min_size=1,
                   max_size=60),
)
def test_bloom_never_drops_members(spark, members, probes):
    from esco_neo4j_spark.operators.sketch import bloom_build, bloom_prune

    mdf = spark.createDataFrame([(k,) for k in members], "k bigint")
    pdf = spark.createDataFrame([(k,) for k in probes | members], "k bigint")
    bloom = bloom_build(mdf, "k", width=64)
    kept = {r["k"] for r in bloom_prune(pdf, "k", bloom, width=64).collect()}
    assert members <= kept


@SLOW
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=49),
            st.integers(min_value=0, max_value=49),
        ),
        min_size=1,
        max_size=80,
    )
)
def test_topo_layers_respect_edges(spark, pairs):
    """On a forced DAG (src < dst), every edge goes to a strictly higher
    layer, and every vertex is assigned exactly one layer."""
    from esco_neo4j_spark.operators.graph import topo_layers, vertices_of

    dag = [(a, b) if a < b else (b, a) for (a, b) in pairs if a != b]
    if not dag:
        return
    e = spark.createDataFrame(dag, "src bigint, dst bigint")
    layers = {r["id"]: r["layer"] for r in topo_layers(e).collect()}
    verts = {r["id"] for r in vertices_of(e).collect()}
    assert set(layers) == verts
    for a, b in dag:
        assert layers[b] > layers[a]


@SLOW
@given(
    big=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1, max_size=100,
    ),
    small=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 100)),
        min_size=1, max_size=20,
    ),
)
def test_salted_join_equals_plain_join(spark, big, small):
    from esco_neo4j_spark.operators.skew import salted_join

    bdf = spark.createDataFrame(big, "k bigint, v bigint")
    sdf = spark.createDataFrame(small, "k bigint, w bigint")
    plain = sorted(
        tuple(r) for r in bdf.join(sdf, "k").select("k", "v", "w").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(bdf, sdf, ["k"], n_salts=4)
        .select("k", "v", "w")
        .collect()
    )
    assert salted == plain


# word pool small enough that random docs share shingles often — the
# regime where prefix filtering has to prove losslessness
_words = st.sampled_from(
    "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
)
_docs = st.lists(
    st.lists(_words, min_size=3, max_size=12).map(" ".join),
    min_size=2,
    max_size=10,
)


@SLOW
@given(texts=_docs)
def test_prefix_filtered_jaccard_equals_brute_force(spark, texts):
    """PPJoin prefix filtering is LOSSLESS: on arbitrary corpora the
    filtered pair set equals the brute-force shingle-set Jaccard pairs
    at the threshold (r3 scale fix for the quadratic posting-list
    join)."""
    import math

    from esco_neo4j_spark.operators.dedup import ngram_jaccard_pairs, shingled

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in ngram_jaccard_pairs(df, "text", "doc_id", threshold=0.6).collect()
    )
    sets = {
        r["id"]: set(r["sh"]) for r in shingled(df, "text", "doc_id", 3).collect()
    }
    want = []
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b]) - inter)
            j = math.floor(j * 1e6 + 0.5) / 1e6
            if j >= 0.6:
                want.append((a, b, j))
    assert got == sorted(want)


@SLOW
@given(
    words=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=6),
        min_size=1,
        max_size=25,
    )
)
def test_symdel_ed2_is_lossless_vs_brute_force(spark, words):
    """SymSpell's depth-2 deletion-neighborhood candidate rule must find
    EVERY key pair within levenshtein distance 2 — the losslessness
    argument (an optimal edit script touches <= 2 positions per side)
    checked against brute-force distance over adversarial short strings
    from a tiny alphabet (maximal collision pressure)."""
    from pyspark.sql import functions as F

    from esco_neo4j_spark.operators.dedup import symdel_pairs

    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "id bigint, key string"
    )
    got = {
        (r["key_a"], r["key_b"])
        for r in symdel_pairs(df, "key", max_len=32, max_edit=2).collect()
    }
    # brute force over distinct keys
    def ed(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(
                        prev[j] + 1,
                        cur[j - 1] + 1,
                        prev[j - 1] + (ca != cb),
                    )
                )
            prev = cur
        return prev[-1]

    uniq = sorted(set(words))
    want = {
        (a, b)
        for i, a in enumerate(uniq)
        for b in uniq[i + 1 :]
        if a < b and ed(a, b) <= 2
    }
    assert got == want


@SLOW
@given(
    texts=st.lists(
        st.text(
            alphabet="abc xyz",  # spaces make multi-chunk docs likely
            min_size=0,
            max_size=120,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_cdc_chunks_partition_exactly(spark, texts):
    """Content-defined chunking must PARTITION every surviving document:
    per-group total_chars equals the sum of nonempty doc lengths, chunk
    counts are >= doc count, and the dedup ratio stays in (0, 1]."""
    from esco_neo4j_spark.operators.dedup import cdc_chunk_stats

    df = spark.createDataFrame(
        [(i, t, "g") for i, t in enumerate(texts)],
        "doc_id bigint, text string, source string",
    )
    rows = cdc_chunk_stats(df, group_col="source").collect()
    alive = [t for t in texts if t]
    if not alive:
        assert rows == []
        return
    assert len(rows) == 1
    r = rows[0]
    assert r["total_chars"] == sum(len(t) for t in alive)
    assert r["n_chunks"] >= len(alive)
    assert r["distinct_chunks"] <= r["n_chunks"]
    assert 0.0 < r["dedup_ratio"] <= 1.0


@SLOW
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-50, max_value=50,
                allow_nan=False, allow_infinity=False,
            ),
            min_size=4, max_size=4,
        ),
        min_size=4, max_size=24,
    ),
    thr=st.sampled_from([0.9, 0.5, 0.0, -0.4]),
)
def test_interval_screen_never_drops_qualifying_pairs(spark, vecs, thr):
    """r7 screen soundness as a PROPERTY: for random corpora (any
    scale, any sign, duplicate rows, near-zero rows) and thresholds on
    both sides of zero, the screened LSH self-join equals the
    unscreened (threshold=-1) join filtered post-hoc — the interval
    bound may never drop a qualifying pair."""
    from esco_neo4j_spark.operators.similarity import lsh_self_join

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<double>",
    )
    want = {
        (r.id_a, r.id_b, r.score)
        for r in lsh_self_join(
            df, threshold=-1.0, n_planes=2, n_tables=3, max_bucket=None
        ).collect()
        if r.score is not None and r.score >= thr
    }
    got = {
        (r.id_a, r.id_b, r.score)
        for r in lsh_self_join(
            df, threshold=thr, n_planes=2, n_tables=3, max_bucket=None
        ).collect()
    }
    assert got == want
