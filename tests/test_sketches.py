"""Sketch-operator accuracy bounds (events_approx_distinct_rollup).

HLL estimates have no cross-engine value oracle (sketch layouts are
implementation-specific), so the registry entry is rows-only for the
driver; this test supplies the missing signal by bounding the merged
daily-sketch estimate against the exact distinct count: lgK=12 gives a
relative standard error of ~1.6%, so 5% is a >3-sigma bound, and at the
tiny test cardinalities HLL is exact anyway. Also pins determinism —
two runs must produce identical estimates (hash-based sketch, no RNG)."""

from __future__ import annotations

import os

from esco_neo4j_spark.plans import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_hll_rollup_within_error_bound(spark):
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
        assert abs(est - exact[t]) <= max(1, 0.05 * exact[t]), (
            f"{t}: estimate {est} outside 5% of exact {exact[t]}"
        )


def test_hll_rollup_deterministic(spark):
    q = REGISTRY["events_approx_distinct_rollup"]
    a = sorted(map(tuple, q.fn(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q.fn(spark, SF_DIR).collect()))
    assert a == b
