"""Vector column expressions: dot product, norms, cosine similarity.

The reference delegates cosine to Neo4j's ``vector.similarity.cosine``
(reference: src/semantic_search.py:65,76,90; analysis_queries.md:504,515).
Spark has no built-in cosine, so we build it from ``zip_with`` +
``aggregate`` — a pure column expression that runs inside whole-stage
codegen, vectorizes over the Parquet scan, and needs no Python round-trip.

All arithmetic is forced to double precision (the inputs are
``array<float>``) so results are reproducible across engines to ~1 ulp.

Scale note (100 TB): brute-force cosine over N vectors is a single scan —
embarrassingly parallel, no shuffle. The top-k is ``TakeOrderedAndProject``
(per-partition heap + driver merge), so the full similarity column is never
materialized. For sub-linear search use operators.similarity.lsh_topk.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double_array(v: Column | Sequence[float]) -> Column:
    if isinstance(v, Column):
        return F.transform(v, lambda x: x.cast("double"))
    return F.array(*[F.lit(float(x)).cast("double") for x in v])


def dot_product(a: Column | Sequence[float], b: Column | Sequence[float]) -> Column:
    """Sequential-fold dot product in double precision."""
    ad, bd = _as_double_array(a), _as_double_array(b)
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column | Sequence[float]) -> Column:
    ad = _as_double_array(a)
    return F.sqrt(
        F.aggregate(
            F.transform(ad, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_similarity(a: Column | Sequence[float], b: Column | Sequence[float]) -> Column:
    """cosine(a, b) = dot(a,b) / (|a| * |b|), in double precision.

    Matches Neo4j ``vector.similarity.cosine`` semantics for non-zero
    vectors (reference: src/esco_ingest.py:287 configures cosine indexes).
    """
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


def l2_normalize(a: Column | Sequence[float]) -> Column:
    """Unit-normalize a vector column (pre-normalize once, then cosine
    reduces to a dot product — the 100 TB-scale trick for repeated search)."""
    ad = _as_double_array(a)
    n = l2_norm(ad)
    return F.transform(ad, lambda x: x / n)
