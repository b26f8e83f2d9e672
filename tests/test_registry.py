"""Registry invariants: the driver checks the FIRST 50 entries in
iteration order, so the curated window must stay exact — a renamed or
deleted query would silently drop a family out of the hard correctness
signal."""

from __future__ import annotations

from esco_neo4j_spark.plans import REGISTRY, _DRIVER_WINDOW


def test_window_is_exactly_the_first_50():
    assert len(_DRIVER_WINDOW) == 50
    missing = [n for n in _DRIVER_WINDOW if n not in REGISTRY]
    assert not missing, f"window names not registered: {missing}"
    assert list(REGISTRY)[:50] == _DRIVER_WINDOW


def test_window_covers_every_family():
    prefixes = {"esco_", "udf_", "mm_", "events_", "dedup_", "text_",
                "vec_", "graph_", "ext_"}
    in_window = set(_DRIVER_WINDOW)
    for p in prefixes:
        assert any(n.startswith(p) for n in in_window), f"no {p} query in window"


def test_every_query_has_oracle_or_documented_rows_only():
    # rows-only entries must be the known iterative/approximate set; a new
    # query accidentally registered without an oracle should fail here
    rows_only = {n for n, q in REGISTRY.items() if q.sql is None}
    assert rows_only == {
        # (graph_louvain left this set in r3; events_approx_distinct_rollup
        # left in r5 — the md5-register HLL replays bit-exact in DuckDB;
        # events_value_quantiles_approx left in r5 — below accuracy rows
        # the GK summary is lossless and the result is an exact rank pick)
        # no SQL zlib exists; exact plain-Python byte-count golden in
        # tests/test_textmodel.py — inherently impl-specific, the ONE
        # honest rows-only survivor
        "udf_compression_ratio",
    }
