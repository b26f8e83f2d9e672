"""Motif (pattern) matching: the Cypher `MATCH (a)-[:T]->(b)` surface as
a reusable API instead of hand-built joins.

Every ESCO parity query in plans/esco_queries.py compiles a Cypher
pattern to DataFrame joins by hand (SURVEY §2.C — pattern expansion IS a
join of node tables through an edge table). ``match_motif`` is that
compilation as an operator, GraphFrames-`find`-style:

    match_motif(edges, "a->b; b->c; !a->c")

returns one row per binding of the named vertex variables, with one
column per variable. Terms:

- ``a->b``      positive edge — inner join against the edge table
- ``a-[t]->b``  positive edge with a rel_type equality filter
- ``!a->c``     negative edge — left_anti join (Cypher WHERE NOT (…)),
                must reference only variables already bound by positive
                terms (standard GraphFrames restriction)

Plan shape: each positive term is ONE equi-join on the shared variable
(Catalyst reorders/broadcasts as usual); each negative term is one
anti-join at the end. Like Cypher/GraphFrames, distinct variables may
bind the same vertex unless the caller filters (`a != c`).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_TERM = re.compile(
    r"^\s*(!?)\s*(\w+)\s*(?:-\[(\w*)\]->|->)\s*(\w+)\s*$"
)


def _parse(pattern: str):
    terms = []
    for raw in pattern.split(";"):
        if not raw.strip():
            continue
        m = _TERM.match(raw)
        if not m:
            raise ValueError(f"bad motif term: {raw!r} (want 'a->b', "
                             "'a-[type]->b' or '!a->b')")
        neg, a, rel, b = m.groups()
        terms.append((bool(neg), a, rel or None, b))
    if not terms:
        raise ValueError("empty motif pattern")
    return terms


def match_motif(edges: DataFrame, pattern: str) -> DataFrame:
    """Bind the motif ``pattern`` against ``edges(src, dst[, rel_type])``;
    returns one column per vertex variable."""
    terms = _parse(pattern)
    positives = [t for t in terms if not t[0]]
    negatives = [t for t in terms if t[0]]
    if not positives:
        raise ValueError("motif needs at least one positive term")

    def term_edges(rel: str | None, a: str, b: str) -> DataFrame:
        e = edges
        if rel is not None:
            e = e.filter(F.col("rel_type") == rel)
        return e.select(F.col("src").alias(a), F.col("dst").alias(b))

    _, a0, rel0, b0 = positives[0]
    out = term_edges(rel0, a0, b0)
    bound = {a0, b0}
    rest = list(positives[1:])
    while rest:
        # pick the next term sharing a bound variable (connected pattern)
        idx = next(
            (i for i, (_, a, _, b) in enumerate(rest)
             if a in bound or b in bound),
            None,
        )
        if idx is None:
            raise ValueError("motif pattern is disconnected")
        _, a, rel, b = rest.pop(idx)
        t = term_edges(rel, a, b)
        on = [v for v in (a, b) if v in bound]
        out = out.join(t, on=on, how="inner")
        bound |= {a, b}
    for _, a, rel, b in negatives:
        if a not in bound or b not in bound:
            raise ValueError(
                f"negative term !{a}->{b} uses an unbound variable"
            )
        t = term_edges(rel, a, b)
        out = out.join(t, on=[a, b], how="left_anti")
    return out.select(*sorted(bound))
