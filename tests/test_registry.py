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


# Frozen at the r9 rotation: the union of SURVEY.md §2 / north-star op
# tags carried by the 50 driver-window rows. A future rotation may ADD
# coverage freely (update the set alongside the window), but silently
# DROPPING an operator family from the hard gate fails here — the
# invariant every verdict-prescribed rotation has had to hold by hand
# (r9 verdict item 4 asked for exactly this test).
_REQUIRED_WINDOW_OPS = {
    "A3", "A7", "A7(scale)", "B1", "B10", "B12", "B3", "B4", "B5", "B6",
    "B7", "B8", "B9", "C1", "C2", "C3", "C4", "C5", "C6", "C7", "C8",
    "C9", "D1", "D2", "D3", "D5", "D6", "D7", "D8", "D9(ext)", "E(ext)",
    "F1", "F2", "F4", "G1", "G2", "G3(ext)", "H1", "H10", "H2", "H3",
    "H4", "H7", "H8", "I1", "I2", "I3", "I4", "I5", "I7", "I8",
    "I9(ext)", "J(ext)", "K(ext)", "K1", "K2", "K3", "K4", "K4-adjacent",
    "K6", "K7", "ann-eval(ext)", "catalog-front-door(ext)",
    "corpus-contamination(ext)", "dedup-canonical", "dedup-cdc(ext)",
    "dedup-editdist(ext)", "dedup-exact", "dedup-jaccard",
    "dedup-minhash", "dedup-semantic(ext)", "dedup-simhash",
    "knn-graph(ext)", "multimodal-catalog", "multimodal-decode",
    "multimodal-embed(ext)", "multimodal-phash(ext)",
    "pipeline-batching(ext)", "pipeline-datasheet(ext)",
    "pipeline-forget(ext)", "pipeline-mixing(ext)",
    "pipeline-privacy(ext)", "sketch(ext)", "text-bpe(ext)",
    "text-langid", "text-quality", "text-tokens",
    # added at the r10 rotation (never hard-gated before r10):
    "E", "survival(ext)", "K4-adjacent-katz(ext)",
    "dedup-adjacent-corpus-health(ext)",
}


def test_window_covers_required_ops():
    got = set()
    for n in _DRIVER_WINDOW:
        got |= {
            x.strip() for x in REGISTRY[n].survey_ops.split(",") if x.strip()
        }
    missing = _REQUIRED_WINDOW_OPS - got
    assert not missing, f"window rotation dropped op coverage: {sorted(missing)}"


def test_every_query_has_oracle_or_documented_rows_only():
    # rows-only entries must be the known iterative/approximate set; a new
    # query accidentally registered without an oracle should fail here.
    # (graph_louvain left this set in r3; events_approx_distinct_rollup and
    # events_value_quantiles_approx left in r5; udf_compression_ratio left
    # in r6 — its oracle builder computes the zlib byte counts in plain
    # Python and embeds them as a VALUES literal, so EVERY registered
    # query is now value-oracled.)
    rows_only = {n for n, q in REGISTRY.items() if q.sql is None}
    assert rows_only == set()


def test_compression_oracle_regenerates_per_sf_dir():
    """The zlib VALUES literal must track whichever corpus the Spark plan
    reads: different sf dirs have different doc texts, so the embedded
    byte counts differ — and each literal must equal the plain-Python
    zlib recompute on that directory's parquet."""
    import re
    import zlib

    import duckdb

    from esco_neo4j_spark.plans.registry import resolve_sql

    q = REGISTRY["udf_compression_ratio"]
    assert callable(q.sql), "oracle must be a per-sf_dir builder"
    sqls = {}
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        sql = resolve_sql(q, sf_dir)
        sqls[sf_dir] = sql
        pairs = dict(
            (int(a), int(b))
            for a, b in re.findall(r"\((\d+),(\d+)\)", sql)
        )
        rows = duckdb.sql(
            "SELECT doc_id, text FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        ).fetchall()
        assert len(pairs) == len(rows)
        for doc_id, text in rows:
            expect = len(zlib.compress((text or "").encode("utf-8"), 6))
            assert pairs[doc_id] == expect, f"doc {doc_id} in {sf_dir}"
    assert sqls["/root/testdata/sf0.001"] != sqls["/root/testdata/sf0.01"]


def test_rowcount_cache_invalidates_on_rewrite(tmp_path):
    """table_rowcount is the number every scale-adaptive oracle builder
    derives its constants from; the cache must key on file identity
    (mtime/size), not path, so a table regenerated in place within one
    process doesn't silently desynchronize Spark and DuckDB parameters
    (r5 ADVICE)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from esco_neo4j_spark.catalog import table_rowcount

    path = tmp_path / "documents.parquet"
    pq.write_table(pa.table({"doc_id": list(range(10))}), path)
    assert table_rowcount(str(tmp_path), "documents") == 10
    pq.write_table(pa.table({"doc_id": list(range(25))}), path)
    # force a distinct mtime even on coarse-grained filesystems
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert table_rowcount(str(tmp_path), "documents") == 25


def test_queries_md_total_matches_registry():
    """r8 (r7 verdict item 9): QUERIES.md is regenerated in the same
    commit that changes the registry — its recorded total must equal
    len(REGISTRY), or the index (and every doc citing it) is stale."""
    import re

    from esco_neo4j_spark.plans import REGISTRY

    text = open("/root/repo/QUERIES.md", encoding="utf-8").read()
    m = re.search(r"Total: \*\*(\d+)\*\* queries", text)
    assert m, "QUERIES.md missing the total line"
    assert int(m.group(1)) == len(REGISTRY), (
        f"QUERIES.md says {m.group(1)} but the registry holds "
        f"{len(REGISTRY)} — rerun tools/gen_query_index.py"
    )


def test_scale_md_sweep_matches_registry():
    """r8 (r7 verdict item 2): the full-registry sf0.01 assurance sweep
    must be the LAST pre-snapshot gate — SCALE.md's most recent
    'assurance sweep' record has to cover the registry at its CURRENT
    size. New queries landed after the recorded sweep fail this test
    until the sweep is rerun and re-recorded."""
    import re

    from esco_neo4j_spark.plans import REGISTRY

    text = open("/root/repo/SCALE.md", encoding="utf-8").read()
    sweeps = re.findall(
        r"assurance sweep[\s\S]{0,400}?(\d+)/(\d+)\*?\*? hash-exact", text
    )
    assert sweeps, "SCALE.md missing an assurance-sweep record"
    got, total = map(int, sweeps[-1])
    assert got == total == len(REGISTRY), (
        f"latest recorded sweep {got}/{total} does not cover the "
        f"{len(REGISTRY)}-query registry — rerun the sf0.01 sweep and "
        "record it in SCALE.md before snapshot"
    )
