"""Scale audit runner: time a set of registered queries at a given SF dir.

Used for the SCALE.md 10x audits (pair with tools/gen_scale_data.py).
Prints one JSON line {query: seconds}. Times are single-shot (the audit
hunts order-of-magnitude scaling defects, not steady-state benchmarks —
min-of-3 belongs to bench.py).

Usage:
  python tools/scale_audit.py --sf-dir /tmp/sf1 graph_msf_boruvka ...
  python tools/scale_audit.py --sf-dir /tmp/sf1 --all-nonbench
"""
from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esco_neo4j_spark.plans import REGISTRY  # noqa: E402
from esco_neo4j_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sf1")
    ap.add_argument("--all-nonbench", action="store_true")
    ap.add_argument(
        "--sink",
        choices=("collect", "noop"),
        default="collect",
        help=(
            "timed action: 'collect' (bench-comparable; fine for the "
            "small aggregated outputs the registry emits) or 'noop' "
            "(guide §1.4 — materializes every column of every row and "
            "discards it; use for pair-dump probes whose output would "
            "otherwise bill driver transfer to the query)"
        ),
    )
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    names = args.queries or []
    if args.all_nonbench:
        names = [n for n, q in REGISTRY.items() if not q.bench and not q.esco]
    spark = get_spark("scale_audit")
    if any(REGISTRY[n].esco for n in names):
        from esco_neo4j_spark.sources import ensure_warehouse

        ensure_warehouse(spark)
    timings: dict[str, float] = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"scale audit: {n}")
        t0 = time.perf_counter()
        try:
            df = REGISTRY[n].fn(spark, args.sf_dir)
            if args.sink == "noop":
                df.write.format("noop").mode("overwrite").save()
                nrows = "noop"
            else:
                nrows = len(df.collect())
            timings[n] = round(time.perf_counter() - t0, 3)
            print(f"{n}: {timings[n]}s ({nrows} rows)", file=sys.stderr)
        except Exception as e:  # keep auditing past one failure
            timings[n] = -1.0
            print(f"{n}: FAILED {e}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
    print(json.dumps(timings))


if __name__ == "__main__":
    main()
