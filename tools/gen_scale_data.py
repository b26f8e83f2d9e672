"""Synthesize a larger scale factor from an existing testdata directory.

The driver ships sf{0.001,0.01,0.1}; the scale audit (SCALE.md) needs a
10x corpus to check that every headline plan scales linearly. This tool
replicates each table ``--copies`` times with disjoint key ranges so all
referential joins stay valid per copy:

- documents: doc_id offset per copy; for copy i > 0 the text is MUTATED
  (drop every (i+2)-th word, append a copy token) so the corpus is not
  10 exact copies — low i gives strongly-divergent variants, high i
  gives near-duplicates, yielding a realistic near-dup density for the
  dedup family instead of a degenerate all-dups corpus.
- embeddings: vec_id offset; each vector perturbed by a small
  deterministic per-copy, per-dimension offset (keeps realistic cosine
  structure; copies are near neighbors of their original, not clones).
- events: event_id/user_id offset (user offset kept EVEN so the
  user//2 parent-pointer graph replicates as disjoint components).
- TPC-H facts (lineitem/orders/customer/part/supplier): every key offset
  by copy * (its table's key range); nation/region dims stay single.

Usage: python tools/gen_scale_data.py --src /root/testdata/sf0.1 \
           --out /tmp/sf1 --copies 10
"""
from __future__ import annotations

import argparse
import json
import os
import sys

# Bump when the noise/mutation model changes in a way that alters true-pair
# density (r5: the shared per-copy embedding offset created a quadratic
# mutual-similarity blob; Murmur3-keyed per-(vec_id,dim,copy) noise fixed
# it). bench.py refuses to report scale_tail for a corpus whose manifest
# generator version doesn't match, so numbers across rounds stay comparable.
GENERATOR_VERSION = 2

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from esco_neo4j_spark.session import get_spark  # noqa: E402

# key-offset spec: table -> {column: stride} (stride multiplied by copy)
_DOC_STRIDE = 1_000_000
_VEC_STRIDE = 1_000_000
_EVENT_STRIDE = 10_000_000
_USER_STRIDE = 1_000_000  # even: preserves the user//2 parent graph shape
_TPCH_STRIDES = {
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 100_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000},
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
}


def _mutated_doc(df, i: int):
    out = df.withColumn("doc_id", F.col("doc_id") + F.lit(i * _DOC_STRIDE))
    if i == 0:
        return out
    period = i + 2  # copy 1 drops 1/3 of words; copy 9 drops 1/11
    text = F.concat(
        F.array_join(
            F.filter(
                F.split(F.col("text"), " "),
                lambda w, j: j % period != 0,
            ),
            " ",
        ),
        F.lit(f" zc{i}"),
    )
    return out.withColumn("text", text).withColumn(
        "n_chars", F.length("text").cast("bigint")
    )


def _mutated_emb(df, i: int):
    out = df.withColumn("vec_id", F.col("vec_id") + F.lit(i * _VEC_STRIDE))
    if i == 0:
        return out
    # Deterministic small PER-VECTOR, PER-DIM noise (r5 fix). The r1-r4
    # version added the same per-copy offset vector to every row
    # (x + 0.02*i*((j%5)-2)) — a shared direction across all 2000 rows of
    # a copy, which made the whole corpus mutually similar (measured:
    # |mean| grew 0.023 -> 1.01 and pairs at cosine >= 0.45 went from
    # 144 at sf0.1 to 85M of 200M at sf1, i.e. the audit corpus
    # manufactured a quadratic TRUE output no banding can be linear
    # against, directly contradicting this file's own "copies are near
    # neighbors of their original, not clones" contract). Murmur3-hash
    # noise keyed on (vec_id, dim, copy) is decorrelated across rows AND
    # dims (a sinusoid in dim would confine all noise to a 2-D subspace
    # and re-cluster the corpus): each copy stays a near neighbor of its
    # ORIGINAL — noise norm grows with i from ~6% (i=1, cosine ~0.998)
    # to ~55% (i=9, cosine ~0.87) of the signal norm — while cross-
    # original similarity keeps the sf0.1 distribution. Result: near-dup
    # pairs grow LINEARLY with corpus size (~10 true neighbors per
    # vector), the density regime dedup/ANN tooling actually faces.
    return out.withColumn(
        "embedding",
        F.transform(
            "embedding",
            lambda x, j: (
                x
                + 0.04
                * i
                * (
                    (
                        F.hash(F.col("vec_id"), j, F.lit(i))
                        .cast("double")
                        / F.lit(float(1 << 31))
                    )
                    / 2.0
                )
            ).cast("float"),
        ),
    )


def _mutated_events(df, i: int):
    return df.withColumn(
        "event_id", F.col("event_id") + F.lit(i * _EVENT_STRIDE)
    ).withColumn("user_id", F.col("user_id") + F.lit(i * _USER_STRIDE))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", required=True)
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset to generate (default: all) — e.g. "
        "'embeddings' for a deep-scale ANN-only probe where the full "
        "corpus would not fit",
    )
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None
    os.makedirs(args.out, exist_ok=True)
    spark = get_spark("gen_scale_data")

    def replicate(table: str, mutate) -> None:
        if only is not None and table not in only:
            return
        src = spark.read.parquet(os.path.join(args.src, f"{table}.parquet"))
        parts = [mutate(src, i) for i in range(args.copies)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        df.write.mode("overwrite").parquet(
            os.path.join(args.out, f"{table}.parquet")
        )
        print(f"{table}: x{args.copies}")

    replicate("documents", _mutated_doc)
    replicate("embeddings", _mutated_emb)
    replicate("events", _mutated_events)
    for table, strides in _TPCH_STRIDES.items():
        def tpch_mutate(df, i, strides=strides):
            for col, stride in strides.items():
                df = df.withColumn(col, F.col(col) + F.lit(i * stride))
            return df
        replicate(table, tpch_mutate)
    for table in ("nation", "region"):
        if only is not None and table not in only:
            continue
        spark.read.parquet(
            os.path.join(args.src, f"{table}.parquet")
        ).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{table}.parquet")
        )
        print(f"{table}: x1 (dim)")
    with open(os.path.join(args.out, "MANIFEST.json"), "w") as fh:
        json.dump(
            {
                "generator": "gen_scale_data",
                "generator_version": GENERATOR_VERSION,
                "src": args.src,
                "copies": args.copies,
            },
            fh,
        )
    print(f"MANIFEST.json: generator_version={GENERATOR_VERSION}")
    spark.stop()


if __name__ == "__main__":
    main()
