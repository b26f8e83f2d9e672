"""Generate QUERIES.md — the navigable index of the registered query
corpus, straight from the registry (single source of truth).

Regenerate after adding queries:  python tools/gen_query_index.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def first_line(doc: str | None) -> str:
    if not doc:
        return ""
    for raw in doc.strip().splitlines():
        line = raw.strip()
        if line:
            line = line.rstrip(".")
            return line[:97] + "..." if len(line) > 100 else line
    return ""


def main() -> None:
    from esco_neo4j_spark.plans import REGISTRY, _DRIVER_WINDOW

    window = set(_DRIVER_WINDOW)
    fams: dict[str, list] = {}
    for name, q in REGISTRY.items():
        fams.setdefault(name.split("_")[0], []).append((name, q))

    order = [
        ("esco", "ESCO reference parity (analysis_queries.md corpus)"),
        ("aq", "AQ shapes on the synthetic star schema"),
        ("tpch", "TPC-H adapted shapes"),
        ("ext", "Relational extensions"),
        ("events", "Events / time-series / streaming batch-twins"),
        ("graph", "Graph analytics"),
        ("vec", "Vector search / ANN"),
        ("dedup", "Deduplication"),
        ("text", "Text analysis / corpus construction"),
        ("mm", "Multimodal binary columns"),
        ("udf", "Model / Python UDF surface"),
        ("pipeline", "Composed pipeline capstones"),
    ]

    out = [
        "# QUERIES.md — registered query corpus index",
        "",
        "Auto-generated from the registry (`python tools/gen_query_index.py`).",
        "Columns: **W** = inside the driver's 50-query CORRECTNESS window;",
        "**oracle** = value-exact DuckDB SQL twin (`rows` = rows-only, golden/",
        "bound-tested in pytest instead); **B** = in the bench.py headline set.",
        "",
        f"Total: **{len(REGISTRY)}** queries, "
        f"**{sum(1 for q in REGISTRY.values() if q.sql is not None)}** value-oracled, "
        f"{len(window)} in the driver window, "
        f"{sum(1 for q in REGISTRY.values() if q.bench)} benched.",
        "",
    ]
    for prefix, title in order:
        rows = fams.pop(prefix, [])
        if not rows:
            continue
        out += [f"## {title} ({len(rows)})", "",
                "| query | W | oracle | B | SURVEY ops | what |",
                "|---|---|---|---|---|---|"]
        for name, q in sorted(rows):
            out.append(
                "| `{}` | {} | {} | {} | {} | {} |".format(
                    name,
                    "x" if name in window else "",
                    "sql" if q.sql is not None else "rows",
                    "x" if q.bench else "",
                    q.survey_ops,
                    first_line(q.fn.__doc__).replace("|", "/"),
                )
            )
        out.append("")
    assert not fams, f"unindexed families: {list(fams)}"
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "QUERIES.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {path}: {len(REGISTRY)} queries")


if __name__ == "__main__":
    main()
