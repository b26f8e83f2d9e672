"""Synthesize a CLONE-HEAVY embeddings corpus for the ring-knee probe.

gen_scale_data's copies diverge with the copy index (copy 9 is ~0.87
cosine from its original) — a realistic near-dup density, the "uniform"
probe corpus. The ring candidate stage, though, was built for the other
regime: clone families whose members are near-ties (the measured sf30
failure had every LSH bucket holding one ~300-member clique, SCALE.md
r9). This tool manufactures that regime directly: each source vector is
replicated ``--copies`` times with tiny constant-amplitude Murmur3 noise
(keyed per (vec_id, dim, copy), so clones decorrelate across dims but
stay ~0.999 cosine to their original regardless of the copy index),
giving N/2000-member near-tie cliques at every scale.

Embeddings only — the knee decision (operators/similarity.py
derive_knn_ring) concerns the kNN-graph family, which reads nothing
else.

Usage: python tools/gen_clone_corpus.py --out /tmp/clone_sf10 --copies 100
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from esco_neo4j_spark.session import get_spark  # noqa: E402

_VEC_STRIDE = 1_000_000  # same id layout as gen_scale_data
_NOISE = 0.002  # constant amplitude: clones stay near-ties at every copy


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--copies", type=int, default=100)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("gen_clone_corpus")
    src = spark.read.parquet(os.path.join(args.src, "embeddings.parquet"))
    def noised(i: int):
        # factory: F.transform inspects the lambda's arity, so the copy
        # index must come in via closure, not a bound default arg
        def fn(x, j):
            return (
                x
                + F.lit(_NOISE)
                * (
                    F.hash(F.col("vec_id"), j, F.lit(i)).cast("double")
                    / F.lit(float(1 << 31))
                )
            ).cast("float")

        return fn

    parts = []
    for i in range(args.copies):
        p = src.withColumn("vec_id", F.col("vec_id") + F.lit(i * _VEC_STRIDE))
        if i > 0:
            p = p.withColumn("embedding", F.transform("embedding", noised(i)))
        parts.append(p)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    df.write.mode("overwrite").parquet(
        os.path.join(args.out, "embeddings.parquet")
    )
    with open(os.path.join(args.out, "MANIFEST.json"), "w") as fh:
        json.dump(
            {
                "generator": "gen_clone_corpus",
                "src": args.src,
                "copies": args.copies,
                "noise": _NOISE,
            },
            fh,
        )
    print(f"embeddings: x{args.copies} clone families")
    spark.stop()


if __name__ == "__main__":
    main()
