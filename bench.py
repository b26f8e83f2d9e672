"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = total wall seconds across the headline set (lower is better).
Each query is fully materialized via a count-ish action (collect on the
already-aggregated result), never cached, so the number reflects scan ->
shuffle -> agg end-to-end. Per query the reported time is the MIN of three
consecutive runs PLUS one second-pass run a full set-length later: run 1
pays JVM JIT + codegen compilation for that plan shape (one-time costs a
long-lived cluster amortizes away), later runs are the steady-state
number a deployment actually sees; the min suppresses co-tenant noise on
the benchmark host (measured: whole-run load spikes inflate a 2-run min
by up to 25%), and the temporally-separated second pass (r9) means a
spike must span the entire invocation — not just one query's three
back-to-back runs — to survive into the reported number.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from esco_neo4j_spark.plans import REGISTRY  # noqa: E402
from esco_neo4j_spark.session import default_parallelism, get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("esco_neo4j_spark_bench")

    bench_queries = [q for q in REGISTRY.values() if q.bench]
    timings: dict[str, float] = {}
    # Warmup actions so JVM/codegen startup isn't billed to the first
    # queries. The second one exercises the broadcast-hash-join + shuffle
    # agg + TakeOrderedAndProject codegen paths the early bench entries
    # hit: without it, the C2 JIT is still compiling those templates
    # during the first ~5 timed queries (measured on
    # esco_top_essential_skills, 3rd in bench order: 6 consecutive runs
    # decay 3.36 -> 0.58s — the r2 'regression' on that row was bench-
    # order warmth, not plan structure).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    big = spark.range(2_000_000).selectExpr("id", "id % 1000 AS k")
    small = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
    from pyspark.sql import functions as _F

    (
        big.join(_F.broadcast(small), "k")
        .groupBy("k")
        .agg(_F.count("*").alias("n"), _F.sum("v").alias("s"))
        .orderBy(_F.desc("n"), "k")
        .limit(20)
        .collect()
    )
    if any(q.esco for q in bench_queries):
        # warehouse build is the ETL step (ingest), not query time
        from esco_neo4j_spark.sources import ensure_warehouse

        ensure_warehouse(spark)

    for q in bench_queries:
        best = None
        # Rebuild the DataFrame for EVERY timed run: collecting the same
        # DataFrame object twice lets Spark reuse run 1's shuffle map
        # outputs (stages show as "skipped"), so run 2 measures only the
        # final stage — measured 4.0s -> 0.03s on the depth histogram,
        # i.e. not a benchmark at all. A fresh lineage per run forces the
        # full scan -> shuffle -> agg recompute. The timer wraps BUILD +
        # COLLECT: iterative operators (closure doubling, BFS, Luby)
        # materialize localCheckpoint rounds eagerly at build time, so
        # timing collect() alone would hide their real work entirely.
        # The price is that driver-side plan analysis (~1.3s on the
        # lambda-heavy chunking plan, a one-time cost a deployment
        # amortizes) is billed too — accepted for honesty.
        # Whole-stage-codegen is cached by generated source in the JVM,
        # so run 1 pays compilation once and min-of-2 still reports the
        # steady-state execution a long-lived cluster sees.
        # Label the timed runs (guide §1.5) so a UI/event-log reading of
        # a bench invocation maps jobs back to queries; thread-local, no
        # effect on the timings themselves.
        # try/finally (r10 ADVICE): an exception in a query must not
        # leave a stale description attached to later jobs in the session
        spark.sparkContext.setJobDescription(f"bench headline: {q.name}")
        try:
            for _ in range(3):
                t0 = time.perf_counter()
                df = q.fn(spark, sf_dir)
                rows = df.collect()
                dt = time.perf_counter() - t0
                assert rows is not None
                best = dt if best is None else min(best, dt)
        finally:
            spark.sparkContext.setJobDescription(None)
        timings[q.name] = best
        # Release the previous query's leaked executor state (iterative
        # graph queries leave localCheckpoint blocks alive until their
        # Python RDD refs are collected, and recursive-CTE runs cache
        # per-iteration blocks); without this, whichever query runs AFTER
        # a closure query is billed for the leftover memory pressure —
        # measured 3.3s -> 22s on the minhash join, and the CTE cache
        # alone took its min-of-2 from 3.8s to 7.5s.
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    # Second headline pass (r9, VERDICT item 3): the per-query min-of-3
    # runs back-to-back, so a co-tenant load spike lasting a few minutes
    # inflates all three runs of the queries under it — which is exactly
    # the unfalsifiable "+20%, probably host noise" shape the r8 bench
    # produced. One more timed run per query, a full set-length later,
    # decorrelates the samples in time; the reported number is the min
    # across both passes, so a spike must span the entire invocation to
    # survive into the JSON.
    for q in bench_queries:
        spark.sparkContext.setJobDescription(f"bench second pass: {q.name}")
        try:
            t0 = time.perf_counter()
            rows = q.fn(spark, sf_dir).collect()
            dt = time.perf_counter() - t0
            assert rows is not None
        finally:
            spark.sparkContext.setJobDescription(None)
        timings[q.name] = round(min(timings[q.name], dt), 3)
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    # Scale-tail canary (r5, VERDICT item 8): the frozen headline set is
    # dominated by sub-1s members, so a 10x-scale regression in the
    # heavy operators would only surface in SCALE.md prose. Time the 5
    # heaviest sf1 queries (per the r5 audit) SINGLE-SHOT at the audit
    # corpus ($SPARK_GRAFT_SCALE_DIR, default /tmp/sf1 — regenerate with
    # tools/gen_scale_data.py) and report them under separate keys; the
    # comparable headline total is untouched. Skipped silently when the
    # audit corpus is absent (fresh container).
    scale_tail = {}
    scale_manifest = None
    scale_dir = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sf1")
    if os.path.isdir(scale_dir):
        # Provenance gate (r5 ADVICE): a corpus generated by an older
        # noise model (quadratic true-pair density) at the same path
        # would yield non-comparable tail numbers indistinguishable in
        # the JSON. Require the generator manifest and a matching
        # version; otherwise skip the tail and say why.
        from tools.gen_scale_data import GENERATOR_VERSION

        manifest_path = os.path.join(scale_dir, "MANIFEST.json")
        try:
            with open(manifest_path) as fh:
                scale_manifest = json.load(fh)
        except OSError:
            scale_manifest = None
        version_ok = (
            scale_manifest is not None
            and scale_manifest.get("generator_version") == GENERATOR_VERSION
        )
        if not version_ok:
            scale_tail = {}
            scale_manifest = {
                "skipped": (
                    f"{manifest_path} missing or generator_version != "
                    f"{GENERATOR_VERSION}; regenerate with "
                    "tools/gen_scale_data.py"
                )
            }
        else:
            for name in (
                "vec_lsh_similarity_join",
                "vec_knn_graph_lsh",
                "pipeline_training_mix",
                "dedup_ngram_jaccard",
                "dedup_semantic_bucketed",
            ):
                # min-of-2 (r5 VERDICT item 2): single-shot tail numbers
                # carried ~1.4x host noise (driver 225s vs builder 158s
                # on the same corpus); a cold+warm pair makes an r6+
                # regression detectable above that noise while keeping
                # the tail affordable (~2x one run, vs 3x for headline).
                best = None
                spark.sparkContext.setJobDescription(f"bench scale tail: {name}")
                try:
                    for _ in range(2):
                        t0 = time.perf_counter()
                        REGISTRY[name].fn(spark, scale_dir).collect()
                        dt = time.perf_counter() - t0
                        best = dt if best is None else min(best, dt)
                        spark.catalog.clearCache()
                        gc.collect()
                        spark.sparkContext._jvm.System.gc()
                finally:
                    spark.sparkContext.setJobDescription(None)
                scale_tail[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "headline_method": "min over 3 back-to-back runs + 1 second-pass run",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # Additive field (r11, VERDICT item 6): record the core count the
        # invocation actually ran at, so a pair of bench JSONs taken at
        # different $SPARK_GRAFT_CPUS is self-describing and core-count
        # scaling can be read off the sf1 scale tail (where per-query
        # work is seconds-scale) instead of the sf0.1 headline (where
        # job fixed cost dominates and ratios sit at ~1 regardless).
        # Nothing existing is renamed or re-measured.
        "cpus": default_parallelism(),
    }
    if scale_tail:
        out["scale_tail_total"] = round(sum(scale_tail.values()), 3)
        out["scale_tail"] = scale_tail
        out["scale_tail_dir"] = scale_dir
        out["scale_tail_method"] = "min-of-2"
    if scale_manifest is not None:
        out["scale_tail_manifest"] = scale_manifest
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
