"""Sketch-operator accuracy bounds.

Since round 5 the registry's HLL rollup (events_approx_distinct_rollup)
and GK quantile rollup (events_value_quantiles_approx) are VALUE-oracled
(md5-register replay / lossless-regime rank pick); these tests keep the
complementary signal the oracle can't give — error bounds against exact
answers, determinism, and coverage of Spark's builtin binary-sketch
hll_sketch_agg (which stays engine-private and therefore can never be
cross-engine value-checked)."""

from __future__ import annotations

import os

from esco_neo4j_spark.plans import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_hll_rollup_within_error_bound(spark):
    """m=16 md5-register HLL: linear-counting stdev at these tiny
    cardinalities is ~sqrt(m*(e^(n/m)-1-n/m)) ≈ 3 users, so the 3-sigma
    bound is ~60% relative / 9 absolute — far looser than the native
    lgK=12 sketch's 5% (see test_native_hll_sketch_agg_rollup), which is
    the honest price of a 16-row register table. The ESTIMATE itself is
    value-oracled in the registry; this bounds its usefulness."""
    got = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["events_approx_distinct_rollup"].fn(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in spark.sql(
            "SELECT event_type, count(DISTINCT user_id) AS exact "
            "FROM events GROUP BY 1"
        ).collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for t, est in got.items():
        assert abs(est - exact[t]) <= max(9, 0.6 * exact[t]), (
            f"{t}: estimate {est} outside 3-sigma of exact {exact[t]}"
        )


def test_hll_rollup_deterministic(spark):
    q = REGISTRY["events_approx_distinct_rollup"]
    a = sorted(map(tuple, q.fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q.fn(spark, SF_DIR).collect()))
    assert a == b


def test_native_hll_sketch_agg_rollup(spark):
    """Spark's BUILTIN binary HLL sketch (hll_sketch_agg lgK=12 per day,
    hll_union_agg across days) — the engine-private variant the oracled
    md5-register query replaced in the registry. Kept exercised here:
    two-level mergeable rollup, estimate within 5% (>3 sigma at lgK=12;
    exact at these cardinalities) of the exact distinct count."""
    from esco_neo4j_spark.catalog import load_tables

    load_tables(spark, SF_DIR, ("events",))
    got = {
        r["event_type"]: r["approx_users"]
        for r in spark.sql(
            """
            WITH daily AS (
              SELECT event_type, date_trunc('day', ts) AS d,
                     hll_sketch_agg(user_id, 12) AS sk
              FROM events GROUP BY 1, 2
            )
            SELECT event_type,
                   CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)
                     AS approx_users
            FROM daily GROUP BY 1 ORDER BY 1
            """
        ).collect()
    }
    exact = {
        r["event_type"]: r["exact"]
        for r in spark.sql(
            "SELECT event_type, count(DISTINCT user_id) AS exact "
            "FROM events GROUP BY 1"
        ).collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for t, est in got.items():
        assert abs(est - exact[t]) <= max(1, 0.05 * exact[t])


def test_cms_one_sided_error_and_bound(spark):
    """CMS guarantee on real data: est >= true for EVERY key, and
    est <= true + eps*N with eps = e/width (the textbook bound holds
    deterministically here because depth=4 min cuts the collision tail)."""
    import math

    from pyspark.sql import functions as F

    from esco_neo4j_spark.catalog import load_table
    from esco_neo4j_spark.operators.sketch import cms_build, cms_estimate

    ev = load_table(spark, SF_DIR, "events")
    n = ev.count()
    width = 64
    sketch = cms_build(ev, "user_id", width=width)
    est = {
        r["user_id"]: r["est"]
        for r in cms_estimate(
            sketch, ev.select("user_id").distinct(), "user_id", width=width
        ).collect()
    }
    exact = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(exact) and len(est) > 0
    eps_n = (math.e / width) * n
    for k, e in est.items():
        assert e >= exact[k], f"undercount at {k}"
        assert e <= exact[k] + eps_n, f"overcount beyond eps*N at {k}"


def test_cms_merge_equals_whole(spark):
    """Mergeability: CMS(first half) + CMS(second half) == CMS(all) —
    counter-exact, the property that makes per-partition sketch build +
    rollup merge valid at scale."""
    from pyspark.sql import functions as F

    from esco_neo4j_spark.catalog import load_table
    from esco_neo4j_spark.operators.sketch import cms_build, cms_merge

    ev = load_table(spark, SF_DIR, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = sorted(
        tuple(r) for r in cms_merge(
            cms_build(a, "user_id", width=64), cms_build(b, "user_id", width=64)
        ).collect()
    )
    whole = sorted(tuple(r) for r in cms_build(ev, "user_id", width=64).collect())
    assert merged == whole and len(whole) > 0


def test_bloom_prune_no_false_negatives(spark):
    """Every row whose key IS in the build set survives bloom_prune (the
    guarantee the exact-join composition relies on), and pruning is a
    subset of the input."""
    from pyspark.sql import functions as F

    from esco_neo4j_spark.operators.sketch import bloom_build, bloom_prune

    big = spark.range(0, 5000).select(F.col("id").alias("k"))
    keys = spark.range(0, 5000, 97).select(F.col("id").alias("k"))  # sparse
    bloom = bloom_build(keys, "k", width=256)  # narrow -> real false positives
    kept = {r["k"] for r in bloom_prune(big, "k", bloom, width=256).collect()}
    truth = {r["k"] for r in keys.collect()}
    assert truth <= kept, "bloom dropped a true member"
    assert kept <= {r["k"] for r in big.collect()}


def test_approx_quantiles_within_rank_error(spark):
    """percentile_approx at accuracy=1e6 must land within rank-error
    eps = n/1e6 of the exact quantile: compare each estimate against
    the exact values at ranks floor(q*n) +/- ceil(eps) (plus one slot of
    slack for interpolation conventions). Below accuracy rows the sketch
    is lossless and the registry oracle already pins the exact rank;
    this bound is the guarantee that must keep holding ABOVE it."""
    import math

    from pyspark.sql import functions as F

    from esco_neo4j_spark.plans import REGISTRY

    got = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"], r["n"])
        for r in REGISTRY["events_value_quantiles_approx"]
        .fn(spark, SF_DIR)
        .collect()
    }
    assert len(got) > 0
    for etype, (p50, p90, p99, n) in got.items():
        vals = sorted(
            r["value"]
            for r in spark.table("events")
            .filter(F.col("event_type") == etype)
            .select("value")
            .collect()
        )
        eps = max(2, math.ceil(n / 1_000_000) + 1)
        for q, est in ((0.5, p50), (0.9, p90), (0.99, p99)):
            r0 = int(q * (n - 1))
            lo = vals[max(0, r0 - eps)]
            hi = vals[min(n - 1, r0 + eps)]
            assert lo - 1e-9 <= est <= hi + 1e-9, (etype, q, est, lo, hi)


def test_ams_f2_mean_pick_and_accuracy(spark):
    """The AMS rope sums must match a plain-Python replay of the md5
    sign hashes, and the mean-of-9 estimate (each S_j^2 unbiased with
    variance <= 2*F2^2 => relative std ~0.47 for the mean) must land
    within 4x of the true self-join size on a skewed key set."""
    import hashlib

    from esco_neo4j_spark.operators.sketch import AMS_DEPTH, ams_f2_terms

    keys = [1] * 50 + [2] * 20 + list(range(3, 40))  # skewed multiset
    df = spark.createDataFrame([(k,) for k in keys], ["user_id"])
    got = {r["sketch_row"]: r["s"] for r in ams_f2_terms(df, "user_id").collect()}

    def sign(j, k):
        hx = hashlib.md5(f"{100 + j}-{k}".encode()).hexdigest()
        return 1 - 2 * (int(hx[:15], 16) % 2)

    want = {
        j: sum(sign(j, k) for k in keys) for j in range(AMS_DEPTH)
    }
    assert got == want
    est = sum(s * s for s in want.values()) // 9
    from collections import Counter

    exact = sum(c * c for c in Counter(keys).values())
    assert exact / 4 <= est <= exact * 4


def test_ams_f2_estimator_regime_accuracy(spark):
    """r5 regression guard (same degenerate-affine-hash class as KMV):
    on the REAL events table — near-uniform counts over dense ids, the
    case the parity-sign bug collapsed to -98% error — the median-of-9
    estimate must land within 4x of exact F2."""
    r = REGISTRY["events_ams_f2_selfjoin"].fn(
        spark, "/root/testdata/sf0.01"
    ).collect()[0]
    assert r["f2_exact"] / 4 <= r["f2_estimate"] <= r["f2_exact"] * 4, tuple(r)


def test_bootstrap_ci_brackets_mean_and_narrows(spark):
    """The Poissonized bootstrap CI must bracket the point mean and
    narrow with more data (~1/sqrt(n))."""
    from esco_neo4j_spark.plans import REGISTRY

    q = REGISTRY["events_bootstrap_ci"].fn
    small = q(spark, "/root/testdata/sf0.001").collect()[0]
    big = q(spark, "/root/testdata/sf0.01").collect()[0]
    for r in (small, big):
        assert r["ci_lo"] <= r["mean_value"] <= r["ci_hi"]
    assert (big["ci_hi"] - big["ci_lo"]) < (small["ci_hi"] - small["ci_lo"])


def test_kmv_overlap_within_error_bound(spark):
    """KMV intersection estimator: |est - exact| bounded by the union
    size times ~3/sqrt(k) (the Jaccard ratio's sampling error at k=64 is
    ~1/8 per sigma; 3 sigma with slack). Also pins: jaccard_est in
    [0, 1], estimates deterministic across runs."""
    q = REGISTRY["events_kmv_audience_overlap"]
    rows = q.fn(spark, SF_DIR).collect()
    assert len(rows) > 0
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
        )
        unions = {
            (r[0], r[1]): r[2]
            for r in con.execute("""
                WITH du AS (SELECT DISTINCT event_type, user_id FROM events)
                SELECT a.ta, a.tb, count(DISTINCT u.user_id) FROM
                  (SELECT DISTINCT x.event_type AS ta, y.event_type AS tb
                   FROM du x JOIN du y ON x.event_type < y.event_type) a
                JOIN du u ON u.event_type IN (a.ta, a.tb)
                GROUP BY 1, 2
            """).fetchall()
        }
    finally:
        con.close()
    for r in rows:
        assert 0.0 <= r["jaccard_est"] <= 1.0
        u = unions[(r["type_a"], r["type_b"])]
        tol = max(3, 0.4 * u)  # 3-sigma-ish at k=64 with slack
        assert abs(r["approx_overlap"] - r["exact_overlap"]) <= tol, (
            r["type_a"], r["type_b"], r["approx_overlap"],
            r["exact_overlap"], u,
        )
    again = q.fn(spark, SF_DIR).collect()
    assert rows == again


def test_kmv_and_hll_rollups_estimator_regime_accuracy(spark):
    """r5 regression guard for the degenerate-hash bug: the KMV/HLL
    rollup ESTIMATOR branches (not the cnt<k exact regime) must land
    within sketch-theory error at sf0.01 (150 users/type > k=64, so the
    order-statistic estimator actually engages — the affine-hash bug
    measured 93,905 vs 150 here and no test ran at this scale)."""
    sf = "/root/testdata/sf0.01"
    for name, rse_sigma3 in (
        # KMV k=64: RSE ~ 1/sqrt(k-2) ~ 12.7%; HLL m=16: ~26%
        ("events_kmv_distinct_rollup", 0.40),
        ("events_hll_distinct_rollup", 0.80),
    ):
        rows = REGISTRY[name].fn(spark, sf).collect()
        assert rows, name
        for r in rows:
            est, exact = r["approx_users"], r["exact_users"]
            assert exact > 64, "scale must engage the estimator regime"
            assert abs(est - exact) <= rse_sigma3 * exact, (
                name, r["event_type"], est, exact,
            )


def test_kmv_overlap_estimator_regime_accuracy(spark):
    """Overlap estimates in the ESTIMATOR regime (sf0.01): within
    jaccard sampling error + union estimator error of exact."""
    sf = "/root/testdata/sf0.01"
    rows = REGISTRY["events_kmv_audience_overlap"].fn(spark, sf).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["jaccard_est"] <= 1.0
        # union here is bounded by total users (<= ~10x exact overlap);
        # allow 3-sigma of jaccard (3/8 at k=64) times a generous union
        tol = max(5, 0.5 * max(r["exact_overlap"], 64))
        assert abs(r["approx_overlap"] - r["exact_overlap"]) <= tol, tuple(r)


def test_gk_lossless_regime_exact_rank_identity(spark):
    """The events_value_quantiles_approx ORACLE depends on a Spark
    internal (r5 ADVICE): when a group has n < accuracy rows, the GK
    summary in percentile_approx is lossless and the answer is exactly
    the 1-based ceil(q*n)-th order statistic. That identity is not in
    Spark's documented contract, so pin it DIRECTLY here — against a
    synthetic column with ties, negatives and odd/even group sizes —
    so a Spark upgrade that changes QuantileSummaries query/merge
    internals fails this test loudly instead of silently breaking
    oracle parity. Precondition being pinned: accuracy (1e6) > n."""
    import math

    from pyspark.sql import functions as F

    # group sizes straddling odd/even/tiny; values with heavy ties and
    # sign changes; deterministic (no RNG — multiplicative hash mod)
    sizes = [1, 2, 3, 7, 10, 101, 1000, 4096]
    rows = []
    for g, size in enumerate(sizes):
        for i in range(size):
            v = ((i * 2654435761) % 97) - 48  # ints in [-48, 48], tied
            rows.append((g, float(v) / 7.0))
    df = spark.createDataFrame(rows, "g INT, value DOUBLE")
    qs = [0.5, 0.9, 0.99, 0.01, 1.0]
    agg = (
        df.groupBy("g")
        .agg(
            F.percentile_approx(
                "value",
                F.array(*[F.lit(q) for q in qs]),
                F.lit(1_000_000),
            ).alias("est"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    by_g = {}
    for g, size in enumerate(sizes):
        by_g[g] = sorted(
            ((i * 2654435761) % 97 - 48) / 7.0 for i in range(size)
        )
    assert len(agg) == len(sizes)
    for r in agg:
        vals = by_g[r["g"]]
        n = r["n"]
        assert n == len(vals) and n < 1_000_000  # the lossless regime
        for q, est in zip(qs, r["est"]):
            rank = max(1, math.ceil(q * n))  # 1-based ceil(q*n)
            assert est == vals[rank - 1], (
                f"g={r['g']} q={q}: percentile_approx={est} != exact "
                f"ceil(q*n)-th order stat {vals[rank - 1]} — Spark's GK "
                "lossless-regime identity changed; the "
                "events_value_quantiles_approx oracle must be rewritten"
            )
