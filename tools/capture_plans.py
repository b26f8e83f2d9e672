"""Capture .explain("formatted") for registered queries to files.

Used for the plans/r10/ before/after evidence (optimization guide §1:
record the plan shape — Exchange count, join strategy, PushedFilters /
ReadSchema, WholeStageCodegen spans, Python-eval nodes — before and
after each change). Building the DataFrame may execute driver-bounded
work for iterative operators (closure doubling, BFS rounds); the
explain itself is analysis-only.

Usage:
  python tools/capture_plans.py --sf-dir /root/testdata/sf0.1 \
      --out plans/r10 --suffix _after esco_top_essential_skills ...
  python tools/capture_plans.py --bench --sf-dir ... --out ... --suffix ...
"""
from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esco_neo4j_spark.plans import REGISTRY  # noqa: E402
from esco_neo4j_spark.session import get_spark  # noqa: E402


def explain_str(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="_after")
    ap.add_argument("--bench", action="store_true",
                    help="capture every bench-flagged query")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    names = list(args.queries)
    if args.bench:
        names += [n for n, q in REGISTRY.items() if q.bench and n not in names]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        sys.exit(f"unknown query name(s): {', '.join(unknown)}")
    os.makedirs(args.out, exist_ok=True)

    spark = get_spark("capture_plans")
    if any(REGISTRY[n].esco for n in names):
        from esco_neo4j_spark.sources import ensure_warehouse

        ensure_warehouse(spark)
    for n in names:
        path = os.path.join(args.out, f"{n}{args.suffix}.txt")
        try:
            df = REGISTRY[n].fn(spark, args.sf_dir)
            text = explain_str(df)
        except Exception:
            text = "CAPTURE FAILED:\n" + traceback.format_exc()
        with open(path, "w") as fh:
            fh.write(f"== {n} @ {args.sf_dir} ==\n{text}\n")
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
