"""Ring-knee probe: time the kNN graph's exact vs ring candidate paths.

derive_knn_ring engages the ring at 100k footer rows on the argument
that the exact all-pairs-per-bucket path's cost is clique-size-
dependent (Ω(B²) per bucket), not N-dependent — but the knee had never
been probed between 100k and 600k rows (r9 verdict What's-wrong #1).
This tool measures one (corpus, mode) cell per invocation — fresh JVM,
single-shot, count sink — so crossovers are read off measured rows
instead of assumed.

Modes:
  exact       all-pairs-per-bucket candidates (ring_window=None), no descent
  ring        ring candidates at the derived W, no descent
  registered  what vec_knn_graph_lsh actually runs at this scale
              (ring + one NN-descent round above the knee)

Usage: python tools/knee_probe.py --sf-dir /tmp/sf10 --mode exact
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from esco_neo4j_spark.catalog import load_tables, table_rowcount  # noqa: E402
from esco_neo4j_spark.session import get_spark, tune  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--mode", choices=["exact", "ring", "registered"],
                    required=True)
    args = ap.parse_args()

    from esco_neo4j_spark.operators.similarity import (
        derive_knn_ring,
        lsh_knn_graph,
        nn_descent_refine,
    )
    from esco_neo4j_spark.plans.vector_queries import (
        _KNN_CAND_CAP,
        _knn_params,
    )

    spark = get_spark("knee_probe")
    tune(spark)
    load_tables(spark, args.sf_dir, ("embeddings",))
    n_rows = table_rowcount(args.sf_dir, "embeddings")
    n_planes, n_tables = _knn_params(args.sf_dir)
    ring = derive_knn_ring(n_rows, _KNN_CAND_CAP, n_tables)

    t0 = time.perf_counter()
    if args.mode == "exact":
        g = lsh_knn_graph(
            spark.table("embeddings"), k=3, cand_cap=_KNN_CAND_CAP,
            n_planes=n_planes, n_tables=n_tables, ring_window=None,
        )
    else:
        g = lsh_knn_graph(
            spark.table("embeddings"), k=3, cand_cap=_KNN_CAND_CAP,
            n_planes=n_planes, n_tables=n_tables, ring_window=ring,
        )
        if args.mode == "registered" and ring is not None:
            g = nn_descent_refine(
                g.select("src", "nbr").localCheckpoint(eager=True),
                spark.table("embeddings"), k=3,
            )
    rows = g.count()
    wall = round(time.perf_counter() - t0, 1)
    print(json.dumps({
        "sf_dir": args.sf_dir, "mode": args.mode, "n_rows": n_rows,
        "n_planes": n_planes, "n_tables": n_tables, "ring_w": ring,
        "wall_s": wall, "out_rows": rows,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
