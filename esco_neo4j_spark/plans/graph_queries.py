"""Graph query corpus (SURVEY.md §2 category K) on a derived edge table.

Per FIXTURES.md §C, the synthetic stand-in for the ESCO BROADER_THAN
hierarchy is a referral forest derived from events.user_id: every user
u >= 1 has a parent edge (u) -> (u // 2). That gives a binary-tree DAG —
the exact shape of the skill hierarchy queries (AQ:84-111) — with a DuckDB
``WITH RECURSIVE`` oracle for the iterative-join operators.

The Spark implementations use the GENERIC operators from operators/graph.py
(frontier BFS, multi-origin closure) — nothing is specialized to trees —
while the oracle exploits the tree shape for an independent answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from esco_neo4j_spark.operators.graph import (
    bfs_depths,
    connected_components,
    degrees,
    label_propagation,
    pagerank,
    shortest_path,
    shortest_path_length,
    transitive_closure,
    undirected,
)
from esco_neo4j_spark.plans.registry import query

# Parent-pointer edges u -> u//2 for u >= 1 (tree rooted at 0).
_EDGES_SQL = """
    SELECT DISTINCT user_id AS src, user_id // 2 AS dst
    FROM events WHERE user_id >= 1
"""


def _edges(spark: SparkSession) -> DataFrame:
    ev = spark.table("events")
    return (
        ev.filter(F.col("user_id") >= 1)
        .select(
            F.col("user_id").alias("src"),
            (F.col("user_id") / 2).cast("bigint").alias("dst"),
        )
        .distinct()
    )


@query(
    "graph_degrees",
    sql=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (
      SELECT src, dst FROM edges
      UNION ALL
      SELECT dst AS src, src AS dst FROM edges
    )
    SELECT src AS id, CAST(count(*) AS BIGINT) AS degree
    FROM und GROUP BY src ORDER BY id
    """,
    survey_ops="K3,G2,D2",
    tables=("events",),
)
def graph_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected degree per vertex — the graph-projection sanity stats
    (AQ:10-20 label/type counts applied to the projected graph, K3)."""
    return degrees(_edges(spark)).orderBy("id")


@query(
    "graph_transitive_closure",
    sql=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    anc AS (
      SELECT src, dst AS anc, 1 AS depth FROM edges
      UNION ALL
      SELECT a.src, e.dst AS anc, a.depth + 1
      FROM anc a JOIN edges e ON a.anc = e.src
      WHERE a.depth < 10
    )
    SELECT src, anc AS dst, CAST(min(depth) AS INT) AS depth
    FROM anc GROUP BY src, anc
    ORDER BY src, dst
    """,
    survey_ops="K1,H4",
    bench=True,
    tables=("events",),
)
def graph_transitive_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variable-length traversal with depth — ``MATCH p=(i)-[:BROADER_THAN*]
    ->(j) RETURN length(p)`` (AQ:84-91). Iterative frontier joins with
    localCheckpoint per round; DuckDB WITH RECURSIVE is the oracle."""
    tc = transitive_closure(_edges(spark), max_depth=10)
    return tc.select(
        "src", "dst", F.col("depth").cast("int").alias("depth")
    ).orderBy("src", "dst")


@query(
    "graph_depth_histogram",
    sql=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    anc AS (
      SELECT src, dst AS anc, 1 AS depth FROM edges
      UNION ALL
      SELECT a.src, e.dst AS anc, a.depth + 1
      FROM anc a JOIN edges e ON a.anc = e.src
      WHERE a.depth < 10
    ),
    min_depths AS (
      SELECT src, anc, min(depth) AS depth FROM anc GROUP BY src, anc
    )
    SELECT CAST(depth AS INT) AS depth, CAST(count(*) AS BIGINT) AS n_pairs
    FROM min_depths GROUP BY depth ORDER BY depth
    """,
    survey_ops="K1,D2,H4",
    tables=("events",),
)
def graph_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchy-depth distribution (AQ:104-111 'levels below each root'
    aggregated): closure -> groupBy depth count."""
    tc = transitive_closure(_edges(spark), max_depth=10)
    return (
        tc.groupBy(F.col("depth").cast("int").alias("depth"))
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("depth")
    )


@query(
    "graph_shortest_path",
    sql=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    -- tree oracle: dist(u,v) = depth(u) + depth(v) - 2*depth(lca), computed
    -- from the two root-ward ancestor chains (self at depth 0).
    chain_a AS (
      SELECT 14::BIGINT AS node, 0 AS depth
      UNION ALL
      SELECT e.dst, c.depth + 1 FROM chain_a c JOIN edges e ON c.node = e.src
    ),
    chain_b AS (
      SELECT 9::BIGINT AS node, 0 AS depth
      UNION ALL
      SELECT e.dst, c.depth + 1 FROM chain_b c JOIN edges e ON c.node = e.src
    )
    SELECT CAST(14 AS BIGINT) AS src, CAST(9 AS BIGINT) AS dst,
           CAST(min(a.depth + b.depth) AS INT) AS distance
    FROM chain_a a JOIN chain_b b ON a.node = b.node
    GROUP BY 1, 2
    """,
    survey_ops="K2,C3",
    tables=("events",),
)
def graph_shortest_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unweighted undirected shortest path (AQ:136-141 shortestPath).
    Spark runs the GENERIC frontier BFS over the undirected edge view; the
    oracle computes the tree answer independently via LCA — algorithmic
    diversity, same number. Endpoints 14 and 9 exist at every sf."""
    sp = shortest_path_length(_edges(spark), 14, 9, max_depth=20)
    return sp.select(
        "src", "dst", F.col("distance").cast("int").alias("distance")
    )


@query(
    "graph_shortest_path_nodes",
    sql=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    -- tree oracle: the unique shortest path goes up from 14 to the LCA,
    -- then down to 9 — assembled from the two root-ward ancestor chains.
    chain_a AS (
      SELECT 14::BIGINT AS node, 0 AS depth
      UNION ALL
      SELECT e.dst, c.depth + 1 FROM chain_a c JOIN edges e ON c.node = e.src
    ),
    chain_b AS (
      SELECT 9::BIGINT AS node, 0 AS depth
      UNION ALL
      SELECT e.dst, c.depth + 1 FROM chain_b c JOIN edges e ON c.node = e.src
    ),
    lca AS (
      SELECT a.node, a.depth AS ad, b.depth AS bd
      FROM chain_a a JOIN chain_b b ON a.node = b.node
      ORDER BY a.depth + b.depth, a.node LIMIT 1
    ),
    path_nodes AS (
      SELECT c.node, c.depth AS ord FROM chain_a c, lca WHERE c.depth <= lca.ad
      UNION ALL
      SELECT c.node, lca.ad + (lca.bd - c.depth) AS ord
      FROM chain_b c, lca WHERE c.depth < lca.bd
    )
    SELECT CAST(14 AS BIGINT) AS src, CAST(9 AS BIGINT) AS dst,
           CAST((SELECT ad + bd FROM lca) AS INT) AS distance,
           (SELECT string_agg(node::VARCHAR, '->' ORDER BY ord)
            FROM path_nodes) AS path
    """,
    survey_ops="K2,C3,H4",
    tables=("events",),
)
def graph_shortest_path_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shortest path WITH node-sequence reconstruction (AQ:136-141 returns
    the path's nodes, not just its length — K2 full parity). Spark runs
    predecessor-tracking BFS over the undirected edge view; the oracle
    assembles the unique tree path via the LCA of the two ancestor chains
    — independent computations, same node sequence."""
    sp = shortest_path(_edges(spark), 14, 9, max_depth=20)
    return sp.select(
        "src",
        "dst",
        F.col("distance").cast("int").alias("distance"),
        F.array_join(
            F.transform("path", lambda x: x.cast("string")), "->"
        ).alias("path"),
    )


@query(
    "graph_connected_components",
    sql=f"""
    WITH RECURSIVE edges AS (
      SELECT src, dst FROM ({_EDGES_SQL}) WHERE src >= 4
    ),
    verts AS (
      SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges
    ),
    climb AS (
      SELECT id, id AS cur FROM verts
      UNION ALL
      SELECT c.id, c.cur // 2 FROM climb c WHERE c.cur >= 4
    )
    SELECT id, CAST(min(cur) AS BIGINT) AS component
    FROM climb GROUP BY id ORDER BY id
    """,
    survey_ops="K5-adjacent,G2",
    tables=("events",),
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-min connected components on the forest obtained by dropping
    edges into the roots (src < 4) — two components rooted at 2 and 3.
    Spark runs generic hash-min propagation; the oracle climbs
    parent-pointers (min ancestor >= 2) — independent computations."""
    e = _edges(spark).filter(F.col("src") >= 4)
    return connected_components(e).orderBy("id")



def _lpa_unrolled_sql(n_iter: int = 10, tail: str | None = None) -> str:
    """DuckDB twin of operators/graph.label_propagation by UNROLLING the
    synchronous iterations as chained CTE stages (the update is idempotent
    at the fixpoint, so running all n_iter stages is equivalent to Spark's
    early exit). All-integer arithmetic — label votes and min-tiebreaks —
    so cross-engine equality is exact. ``tail`` replaces the final SELECT
    (it can chain further CTEs by starting with a comma, and reference
    s{n_iter}) — the Louvain oracle builds on this."""
    sql = [f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
    verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    s0 AS (SELECT id, id AS community FROM verts)"""]
    for i in range(1, n_iter + 1):
        sql.append(f""",
    w{i} AS (
      SELECT e.dst AS id, s.community,
             row_number() OVER (PARTITION BY e.dst
                                ORDER BY count(*) DESC, s.community ASC) AS rn
      FROM und e JOIN s{i - 1} s ON e.src = s.id
      GROUP BY e.dst, s.community
      QUALIFY rn = 1
    ),
    s{i} AS (
      SELECT v.id, coalesce(w.community, v.id) AS community
      FROM s{i - 1} v LEFT JOIN w{i} w ON v.id = w.id
    )""")
    sql.append(tail if tail is not None else f"""
    SELECT id, community FROM s{n_iter} ORDER BY id""")
    return "".join(sql)


def _louvain_unrolled_sql(n_lpa: int = 10, n_refine: int = 4) -> str:
    """DuckDB twin of operators/graph.louvain_communities: the LPA rounds
    (above) chained into ``n_refine`` UNROLLED Louvain local-move rounds.
    Exact cross-engine parity holds because the operator compares
    candidates on the INTEGER gain 2*m*k_vc - deg*(tot - [c==cur]*deg)
    (the float dQ scaled by the positive constant 2*m^2) with an integer
    (gain DESC, community ASC) tiebreak, and the checkerboard parity is
    md5-based — every quantity in the round is a bigint both engines
    compute identically. Fixed rounds, no early exit, matching the
    operator (see modularity_refine's docstring for why early exit is
    unsound under the alternating parity)."""
    # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs at every
    # reference, and each refine round references t{r} four times — an
    # un-materialized chain re-expands the whole LPA prefix 4^r times
    # (observed: fd exhaustion from thousands of inlined parquet scans).
    parts = [f""",
    undd AS MATERIALIZED (SELECT DISTINCT src, dst FROM und),
    deg AS MATERIALIZED (SELECT src AS id, count(*) AS deg FROM undd GROUP BY src),
    mm AS MATERIALIZED (SELECT count(*) // 2 AS m FROM undd),
    t0 AS MATERIALIZED (SELECT id, community FROM s{n_lpa})"""]
    for r in range(n_refine):
        parts.append(f""",
    tot{r} AS MATERIALIZED (
      SELECT s.community AS c, sum(d.deg) AS tot
      FROM t{r} s JOIN deg d ON s.id = d.id GROUP BY s.community
    ),
    nbr{r} AS MATERIALIZED (
      SELECT u.src AS id, s.community AS c, count(*) AS k_vc
      FROM undd u JOIN t{r} s ON u.dst = s.id GROUP BY u.src, s.community
    ),
    cand{r} AS MATERIALIZED (
      SELECT id, c, cur_c, max(k_vc) AS k_vc FROM (
        SELECT n.id, n.c, cur.community AS cur_c, n.k_vc
        FROM nbr{r} n JOIN t{r} cur ON n.id = cur.id
        UNION ALL
        SELECT id, community AS c, community AS cur_c, 0 AS k_vc FROM t{r}
      ) GROUP BY id, c, cur_c
    ),
    best{r} AS (
      SELECT g.id, g.c AS best_c, g.cur_c,
             row_number() OVER (
               PARTITION BY g.id
               ORDER BY (2 * m.m * g.k_vc
                         - d.deg * (t.tot - CASE WHEN g.c = g.cur_c
                                                 THEN d.deg ELSE 0 END)) DESC,
                        g.c ASC
             ) AS rn
      FROM cand{r} g
      JOIN deg d ON g.id = d.id
      JOIN tot{r} t ON g.c = t.c
      CROSS JOIN mm m
      QUALIFY rn = 1
    ),
    t{r + 1} AS MATERIALIZED (
      SELECT id,
             CASE WHEN (('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 7))::BIGINT
                        + {r}) % 2 = 0
                  THEN best_c ELSE cur_c END AS community
      FROM best{r}
    )""")
    parts.append(f"""
    SELECT id, community FROM t{n_refine} ORDER BY id""")
    return _lpa_unrolled_sql(n_iter=n_lpa, tail="".join(parts))


def _pagerank_unrolled_sql(
    edges_sql: str = _EDGES_SQL,
    n_iter: int = 10,
    damping: float = 0.85,
    tail: str | None = None,
) -> str:
    """DuckDB twin of operators/graph.pagerank, unrolled. On the parent
    graph every vertex has out-degree 1 and in-degree <= 2, so each
    per-vertex message sum adds at most two doubles — IEEE addition is
    commutative, so aggregation ORDER cannot change the result and the
    whole 10-iteration float chain is bit-identical across engines. (On
    graphs with larger in-degrees — esco_pagerank — summation order can
    differ in the last ulp; both engines are deterministic on a fixed
    dataset, so green parity there is established empirically and stays.)
    The damping constants are embedded via repr so the SQL uses the exact
    doubles Spark computes (1.0 - 0.85 != literal 0.15). ``tail`` replaces
    the default final SELECT (it can reference r{n_iter})."""
    base = f"""
    WITH edges AS ({edges_sql}),
    verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    odeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
    ed AS (SELECT e.src, e.dst, o.od FROM edges e JOIN odeg o ON e.src = o.src),
    r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM verts)"""
    sql = [base]
    for i in range(1, n_iter + 1):
        sql.append(f""",
    m{i} AS (
      SELECT ed.dst AS id, sum(r.rank / ed.od) AS msg
      FROM ed JOIN r{i - 1} r ON ed.src = r.id GROUP BY ed.dst
    ),
    r{i} AS (
      SELECT v.id, {1.0 - damping!r} + {damping!r} * coalesce(m.msg, 0.0)
               AS rank
      FROM verts v LEFT JOIN m{i} m ON v.id = m.id
    )""")
    sql.append(tail if tail is not None else f"""
    SELECT id, CAST(round(rank, 6) AS DOUBLE) AS rank
    FROM r{n_iter} ORDER BY id""")
    return "".join(sql)


@query(
    "graph_pagerank",
    # iterations UNROLLED as chained CTEs — full value oracle (the parent
    # graph's in-degree <= 2 keeps float sums order-exact); additionally
    # golden-checked against pure Python in tests/test_graph.py
    sql=_pagerank_unrolled_sql(n_iter=10),
    survey_ops="K4-adjacent(pagerank)",
    tables=("events",),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Static PageRank (10 iters, d=0.85) on the parent-pointer graph.
    Driver records a rows-only check; exactness vs a pure-Python
    implementation is pytest-asserted."""
    pr = pagerank(_edges(spark), num_iter=10)
    return pr.select("id", F.round("rank", 6).alias("rank")).orderBy("id")


_PPR_SEEDS = [7, 12]  # present at every sf (user ids are dense from 0)
_PPR_DAMPING = 0.85
_PPR_TELE = (1.0 - _PPR_DAMPING) / len(_PPR_SEEDS)


def _ppr_unrolled_sql(n_iter: int = 10) -> str:
    """DuckDB twin of operators/graph.personalized_pagerank, unrolled like
    _pagerank_unrolled_sql (same in-degree <= 2 order-exactness argument).
    The teleport constant is the SAME Python double embedded via repr on
    both sides."""
    seeds = ", ".join(str(s) for s in _PPR_SEEDS)
    tele = f"CASE WHEN v.id IN ({seeds}) THEN {_PPR_TELE!r} ELSE 0.0 END"
    base = f"""
    WITH edges AS ({_EDGES_SQL}),
    verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    odeg AS (SELECT src, count(*) AS od FROM edges GROUP BY src),
    ed AS (SELECT e.src, e.dst, o.od FROM edges e JOIN odeg o ON e.src = o.src),
    r0 AS (SELECT v.id, CAST({tele} AS DOUBLE) AS rank FROM verts v)"""
    sql = [base]
    for i in range(1, n_iter + 1):
        sql.append(f""",
    m{i} AS (
      SELECT ed.dst AS id, sum(r.rank / ed.od) AS msg
      FROM ed JOIN r{i - 1} r ON ed.src = r.id GROUP BY ed.dst
    ),
    r{i} AS (
      SELECT v.id, {tele} + {_PPR_DAMPING!r} * coalesce(m.msg, 0.0) AS rank
      FROM verts v LEFT JOIN m{i} m ON v.id = m.id
    )""")
    sql.append(f"""
    SELECT id, CAST(round(rank, 6) AS DOUBLE) AS rank
    FROM r{n_iter}
    WHERE round(rank, 6) > 0
    ORDER BY rank DESC, id LIMIT 50""")
    return "".join(sql)


@query(
    "graph_personalized_pagerank",
    sql=_ppr_unrolled_sql(n_iter=10),
    survey_ops="K4-adjacent(ppr,ext)",
    tables=("events",),
)
def graph_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank seeded at users {7, 12} on the
    parent-pointer graph: 'how relevant is each node to THESE nodes' —
    the seeded-relevance extension of graph_pagerank (teleport mass
    restricted to the seed set). Top-50 nonzero ranks; the zero cut runs
    on the 6dp-ROUNDED rank on both engines."""
    from esco_neo4j_spark.operators.graph import personalized_pagerank

    pr = personalized_pagerank(
        _edges(spark), seeds=_PPR_SEEDS, num_iter=10, damping=_PPR_DAMPING
    )
    r6 = F.round("rank", 6)
    return (
        pr.select("id", r6.alias("rank"))
        .filter(r6 > 0)
        .orderBy(F.desc("rank"), F.asc("id"))
        .limit(50)
    )


@query(
    "graph_label_propagation",
    # iterations UNROLLED as chained CTEs — full value oracle (all-integer
    # votes/tiebreaks); additionally golden-checked in tests/test_graph.py
    sql=_lpa_unrolled_sql(n_iter=10),
    survey_ops="K5",
    tables=("events",),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synchronous LPA communities (the scalable stand-in for
    the reference's Louvain, AQ:233-246)."""
    lp = label_propagation(_edges(spark), max_iter=10)
    return lp.orderBy("id")


@query(
    "graph_louvain",
    # FULL value oracle (r3, formerly rows-only): LPA rounds + Louvain
    # local-move rounds unrolled as chained CTEs — exact because the
    # operator's move gain is compared as an INTEGER (dQ * 2m^2) and the
    # checkerboard parity is md5-portable. Additionally golden-checked in
    # tests/test_graph.py (refinement recovers the optimal partition and
    # never lands below the LPA baseline).
    sql=_louvain_unrolled_sql(n_lpa=10, n_refine=4),
    survey_ops="K5",
    tables=("events",),
)
def graph_louvain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Louvain-style communities (AQ:233-246): LPA initialization + the
    synchronous Louvain local-move phase — the documented K5 deviation
    shrunk from 'LPA stand-in' to 'LPA + modularity refinement'."""
    from esco_neo4j_spark.operators.graph import louvain_communities

    lv = louvain_communities(_edges(spark), max_iter=10, refine_iter=4)
    return lv.orderBy("id")


_BC_EXACT_MAX_VERTICES = 256
_BC_SAMPLE_K = 64


@query(
    "graph_betweenness",
    # Tree closed-form oracle covering BOTH regimes (r5 — formerly the
    # sampled regime was golden-only). On a tree every pair has ONE path
    # (sigma = 1 everywhere), so Brandes' per-source dependency is a pure
    # count: delta_s(v) = #targets t with v interior on path(s, t)
    #                   = (N - 1) - |comp_v(s)|
    # where comp_v(s) is the component of T \ {v} containing s — the
    # child-c subtree (nd(c) + 1 vertices) when s descends from v via c,
    # else the "up" side (N - 1 - nd(v) vertices). Summed over pivots S:
    #   bc(v) = scale/2 * [ k_v*(N-1) - SUM_{s in S desc of v}(nd(c_s)+1)
    #                       - (k_v - #desc pivots)*(N-1-nd(v)) ]
    # with k_v = |S \ {v}|. Exact regime (N <= 256): S = all vertices,
    # scale = 1, and the sum telescopes to the r2 closed form
    # (N-1)^2 - SUM_children (1+nd(c))^2 - (N-1-nd(v))^2. Sampled regime
    # (N > 256): S = the 64 lowest vertex ids (the operator's
    # deterministic Brandes-Pich pivots), scale = N/64 — every quantity
    # is an integer times N/128 (exact in binary floating point), so
    # parity stays hash-exact, pinned at sf0.1 (N = 1500, sampled) by
    # tests/test_graph.py::test_betweenness_sampled_oracle_parity.
    sql=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    -- explicit DISTINCT wrapper: inside WITH RECURSIVE, DuckDB parses a
    -- bare "a UNION b" CTE as a recursive definition and skips the
    -- cross-branch dedup, so the idiomatic verts shape keeps duplicates
    verts AS (SELECT DISTINCT id FROM (
      SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges)),
    anc AS (
      SELECT src AS d, dst AS a FROM edges
      UNION ALL
      SELECT w.d, e.dst AS a FROM anc w JOIN edges e ON w.a = e.src
    ),
    nd AS (SELECT a AS id, count(DISTINCT d) AS nd FROM anc GROUP BY a),
    ndv AS (
      SELECT v.id, coalesce(nd.nd, 0) AS nd
      FROM verts v LEFT JOIN nd ON v.id = nd.id
    ),
    n_tot AS (SELECT count(*) AS n FROM verts),
    pivots AS (
      SELECT r.id FROM (
        SELECT id, row_number() OVER (ORDER BY id) AS rk FROM verts
      ) r CROSS JOIN n_tot n
      WHERE n.n <= {_BC_EXACT_MAX_VERTICES} OR r.rk <= {_BC_SAMPLE_K}
    ),
    k_tot AS (SELECT count(*) AS k FROM pivots),
    -- ancestor-or-self closure: c ranges over the chain from s up
    aos AS (
      SELECT d, a FROM anc UNION SELECT id AS d, id AS a FROM verts
    ),
    -- per proper ancestor v of pivot s: s's component of T \\ {{v}} is
    -- subtree(c) where c = the (unique) child of v on s's chain
    desc_comp AS (
      SELECT e.dst AS v,
             sum(cn.nd + 1) AS s_comp, count(*) AS n_desc
      FROM pivots p
      JOIN aos ON aos.d = p.id
      JOIN edges e ON e.src = aos.a
      JOIN ndv cn ON cn.id = aos.a
      GROUP BY e.dst
    ),
    bc AS (
      SELECT v.id,
             (CASE WHEN n.n > {_BC_EXACT_MAX_VERTICES}
                   THEN n.n / {_BC_SAMPLE_K}.0 ELSE 1.0 END) / 2.0 *
             ((k.k - CASE WHEN pv.id IS NOT NULL THEN 1 ELSE 0 END)
                * (n.n - 1)
              - coalesce(dc.s_comp, 0)
              - ((k.k - CASE WHEN pv.id IS NOT NULL THEN 1 ELSE 0 END)
                 - coalesce(dc.n_desc, 0)) * (n.n - 1 - v.nd)) AS b
      FROM ndv v
      CROSS JOIN n_tot n CROSS JOIN k_tot k
      LEFT JOIN desc_comp dc ON v.id = dc.v
      LEFT JOIN pivots pv ON v.id = pv.id
    )
    SELECT id, CAST(round(b, 4) AS DOUBLE) AS betweenness
    FROM bc ORDER BY betweenness DESC, id LIMIT 20
    """,
    survey_ops="K4",
    tables=("events",),
)
def graph_betweenness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brandes betweenness via batched multi-source BFS
    (gds.betweenness.stream, AQ:217-231). Top-20 like the reference query.
    Exact on small graphs; above _BC_EXACT_MAX_VERTICES the forward state
    (origin, id) is O(V^2) — a 100x scale-killer — so sources switch to a
    deterministic Brandes-Pich sample (scores scaled by V/k; ranking
    preserved, golden-tested in tests/test_graph.py)."""
    bc = betweenness_topk(spark)
    return bc


def betweenness_topk(spark: SparkSession) -> DataFrame:
    from esco_neo4j_spark.operators.graph import (
        betweenness_centrality,
        vertices_of,
    )

    e = _edges(spark)
    n_vertices = vertices_of(e).count()
    sample_k = _BC_SAMPLE_K if n_vertices > _BC_EXACT_MAX_VERTICES else None
    bc = betweenness_centrality(e, directed=False, sample_k=sample_k)
    return (
        bc.select("id", F.round("betweenness", 4).alias("betweenness"))
        .orderBy(F.desc("betweenness"), F.asc("id"))
        .limit(20)
    )


@query(
    "graph_reachable_roots",
    sql=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    anc AS (
      SELECT src, dst AS anc, 1 AS depth FROM edges
      UNION ALL
      SELECT a.src, e.dst AS anc, a.depth + 1
      FROM anc a JOIN edges e ON a.anc = e.src
      WHERE a.depth < 16
    )
    SELECT CAST(count(DISTINCT src) AS BIGINT) AS n_descendants
    FROM anc WHERE anc = 0
    """,
    survey_ops="K1,D5",
    tables=("events",),
)
def graph_reachable_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive descendants of the root (AQ:84-91 'all skills under X'):
    BFS from the root over REVERSED edges, count reached."""
    e = _edges(spark)
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    src = spark.createDataFrame([(0,)], "id bigint")
    reached = bfs_depths(rev, src, max_depth=16, directed=True)
    return reached.filter(F.col("depth") > 0).agg(
        F.countDistinct("id").alias("n_descendants")
    )


# Denser derived graph for triangle structure: parent edges u -> u//2 plus
# predecessor edges u -> u-1. Odd u closes the triangle {u, u-1, u//2}
# (u-1's parent is also u//2), so the graph has real triangle structure
# while staying deterministic.
_TRI_EDGES_SQL = """
    SELECT DISTINCT user_id AS src, user_id // 2 AS dst
    FROM events WHERE user_id >= 1
    UNION
    SELECT DISTINCT user_id AS src, user_id - 1 AS dst
    FROM events WHERE user_id >= 2
"""


@query(
    "graph_triangle_count",
    sql=f"""
    WITH edges AS ({_TRI_EDGES_SQL}),
    canon AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst
    )
    SELECT CAST(count(*) AS BIGINT) AS n_triangles
    FROM canon e1
    JOIN canon e2 ON e2.a = e1.a AND e2.b > e1.b
    JOIN canon e3 ON e3.a = e1.b AND e3.b = e2.b
    """,
    survey_ops="K(ext),C4",
    tables=("events",),
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle count over the parent+predecessor graph using the
    degree-ordered orientation operator (operators/graph.py
    triangle_count — O(m^1.5) wedge bound regardless of skew). The DuckDB
    oracle enumerates id-ordered triangles with plain joins, an
    algorithmically independent method."""
    from esco_neo4j_spark.operators.graph import triangle_count

    ev = spark.table("events")
    parents = (
        ev.filter(F.col("user_id") >= 1)
        .select(
            F.col("user_id").alias("src"),
            (F.col("user_id") / 2).cast("bigint").alias("dst"),
        )
    )
    preds = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).cast("bigint").alias("dst"),
    )
    return triangle_count(parents.union(preds).distinct())


@query(
    "graph_clustering_coeff",
    sql=f"""
    WITH edges AS ({_TRI_EDGES_SQL}),
    canon AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM edges WHERE src <> dst
    ),
    und AS (SELECT a, b FROM canon UNION ALL SELECT b, a FROM canon),
    deg AS (SELECT a AS id, count(*) AS d FROM und GROUP BY a),
    tri AS (
      SELECT count(*) AS n FROM canon e1
      JOIN canon e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN canon e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    wedge AS (SELECT sum(d * (d - 1) / 2) AS n FROM deg)
    SELECT CAST(round(3.0 * tri.n / wedge.n, 6) AS DOUBLE)
             AS clustering_coeff,
           CAST(tri.n AS BIGINT) AS n_triangles,
           CAST(wedge.n AS BIGINT) AS n_wedges
    FROM tri, wedge
    """,
    survey_ops="K(ext),D1",
    tables=("events",),
)
def graph_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global clustering coefficient = 3 * triangles / wedges (wedges =
    sum over vertices of deg*(deg-1)/2). Reuses the degree-oriented
    triangle operator; the wedge count is one degree aggregation — no
    extra join. Both inputs to the ratio are exact, so the oracle is
    value-exact too."""
    from esco_neo4j_spark.operators.graph import triangle_count, undirected

    ev = spark.table("events")
    parents = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    preds = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).cast("bigint").alias("dst"),
    )
    edges = parents.union(preds).distinct()
    canon = (
        undirected(edges)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = canon.union(canon.select(F.col("b"), F.col("a")))
    wedges = (
        und.groupBy("a")
        .agg(F.count("*").alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("bigint").alias("nw"))
    )
    tri = triangle_count(edges).withColumnRenamed("n_triangles", "nt")
    return tri.crossJoin(wedges).select(
        F.round(3.0 * F.col("nt") / F.col("nw"), 6).alias("clustering_coeff"),
        F.col("nt").alias("n_triangles"),
        F.col("nw").alias("n_wedges"),
    )


@query(
    "graph_sssp_weighted",
    sql="""
    WITH RECURSIVE edges AS (
      SELECT DISTINCT user_id AS src, user_id // 2 AS dst,
             1 + user_id % 7 AS w
      FROM events WHERE user_id >= 1
      UNION
      SELECT DISTINCT user_id AS src, user_id // 4 AS dst,
             1 + user_id % 11 AS w
      FROM events WHERE user_id >= 4
    ),
    walk AS (
      SELECT src AS id, dst AS cur, w AS cost FROM edges
      UNION ALL
      SELECT wk.id, e.dst, wk.cost + e.w
      FROM walk wk JOIN edges e ON wk.cur = e.src
    )
    SELECT id, CAST(min(cost) AS BIGINT) AS dist
    FROM walk WHERE cur = 0 GROUP BY id
    UNION ALL
    SELECT CAST(0 AS BIGINT) AS id, CAST(0 AS BIGINT) AS dist
    ORDER BY id
    """,
    survey_ops="K2(ext,weighted),C6",
    tables=("events",),
)
def graph_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted shortest-path distances from the root to every vertex of a
    layered DAG: the parent edges (u -> u//2) plus shortcut edges
    (u -> u//4), weights derived deterministically from the child id.
    Shortcuts sometimes beat the two-hop parent route and sometimes not,
    so the min-cost choice is non-trivial at every level.

    Spark runs the GENERIC frontier Bellman-Ford (operators/graph.py
    sssp_weighted) from vertex 0 over the REVERSED edges (root outward);
    the oracle enumerates root-ward walks in a DuckDB recursive CTE and
    takes min(cost) — the DAG's strictly-decreasing vertex ids bound the
    recursion, so walk enumeration terminates without a depth guard.
    Weighted K2 extension (the reference's shortestPath is hop-count only,
    analysis_queries.md:136-141)."""
    from esco_neo4j_spark.operators.graph import sssp_weighted

    ev = spark.table("events")
    parents = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
        (1 + F.col("user_id") % 7).cast("double").alias("weight"),
    )
    shortcuts = ev.filter(F.col("user_id") >= 4).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 4).cast("bigint").alias("dst"),
        (1 + F.col("user_id") % 11).cast("double").alias("weight"),
    )
    edges = parents.union(shortcuts).distinct()
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    return (
        sssp_weighted(rev, 0, max_iter=20)
        .select("id", F.col("dist").cast("bigint").alias("dist"))
        .orderBy("id")
    )


@query(
    "graph_topo_layers",
    sql=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    verts AS (SELECT DISTINCT id FROM (
      SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges)),
    leaves AS (
      SELECT id FROM verts WHERE id NOT IN (SELECT dst FROM edges)
    ),
    walk AS (
      SELECT id, 0 AS depth FROM leaves
      UNION ALL
      SELECT e.dst AS id, w.depth + 1 FROM walk w JOIN edges e ON e.src = w.id
    )
    SELECT id, CAST(max(depth) AS INT) AS layer
    FROM walk GROUP BY id ORDER BY id
    """,
    survey_ops="K(ext),topo",
    tables=("events",),
)
def graph_topo_layers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topological layering of the parent DAG (Kahn's algorithm by
    iterative zero-in-degree peeling, operators/graph.py topo_layers):
    layer(v) = length of the longest chain ending at v. The oracle
    computes the same number by enumerating leaf-upward walks in a
    recursive CTE and taking max(depth) — walk enumeration is safe here
    because ids strictly decrease along edges. Peeling also doubles as
    distributed cycle DETECTION: a non-empty remainder with no sources
    raises, which is how a 100 TB dependency graph tells you it isn't a
    DAG."""
    from esco_neo4j_spark.operators.graph import topo_layers

    return (
        topo_layers(_edges(spark))
        .select("id", F.col("layer").cast("int").alias("layer"))
        .orderBy("id")
    )


@query(
    "graph_scc",
    sql=f"""
    WITH edges AS ({_EDGES_SQL}),
    verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    childs AS (SELECT DISTINCT src AS id FROM edges WHERE src % 4 = 2)
    SELECT v.id,
           CAST(CASE WHEN v.id % 4 = 2 AND v.id IN (SELECT id FROM childs)
                     THEN v.id // 2 ELSE v.id END AS BIGINT) AS scc
    FROM verts v ORDER BY v.id
    """,
    survey_ops="K(ext),scc",
    tables=("events",),
)
def graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components (operators/graph.py
    strongly_connected_components — color propagation + multi-pivot
    backward BFS) over the parent DAG augmented with back edges
    u//2 -> u wherever the child u = 2 (mod 4): up-edges strictly
    decrease the id and down-edges strictly increase it, so every cycle
    is exactly one {child, parent} pair and the pairs are disjoint
    (children = 2 mod 4, parents odd). The Spark side runs the GENERIC
    iterative algorithm; the oracle derives the component structure from
    that invariant in closed form — fully independent computations."""
    from esco_neo4j_spark.operators.graph import (
        strongly_connected_components,
    )

    parents = _edges(spark)
    back = parents.filter(F.col("src") % 4 == 2).select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    return (
        strongly_connected_components(parents.union(back))
        .orderBy("id")
    )



def _kcore_unrolled_sql(k: int = 2, n_stages: int = 6) -> str:
    """DuckDB twin of operators/graph.k_core by unrolling the peeling
    rounds (degree filter + induced-subgraph restriction per stage; the
    peel is idempotent at the fixpoint, so extra stages are no-ops).
    The 2-core of the parents+predecessors graph settles in 2 rounds at
    every test scale — measured, with 3x margin here. All-integer, so
    parity is exact. (The 3-core of this graph is empty and a k=3 query
    would be a trivially-empty check; k=2 keeps 99% of vertices.)"""
    base = f"""
    WITH parents AS (
      SELECT DISTINCT user_id AS src, user_id // 2 AS dst
      FROM events WHERE user_id >= 1
    ),
    preds AS (
      SELECT DISTINCT user_id AS src, user_id - 1 AS dst
      FROM events WHERE user_id >= 2
    ),
    canon AS (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM (SELECT * FROM parents UNION ALL SELECT * FROM preds)
      WHERE src <> dst
    ),
    cur0 AS (
      SELECT a AS src, b AS dst FROM canon
      UNION ALL
      SELECT b AS src, a AS dst FROM canon
    )"""
    sql = [base]
    for i in range(1, n_stages + 1):
        sql.append(f""",
    keep{i} AS (
      SELECT src AS id FROM cur{i - 1} GROUP BY src HAVING count(*) >= {k}
    ),
    cur{i} AS (
      SELECT c.src, c.dst FROM cur{i - 1} c
      JOIN keep{i} ks ON c.src = ks.id
      JOIN keep{i} kd ON c.dst = kd.id
    )""")
    sql.append(f"""
    SELECT src AS id, CAST(count(*) AS BIGINT) AS core_degree
    FROM cur{n_stages} GROUP BY src ORDER BY id""")
    return "".join(sql)


@query(
    "graph_kcore",
    # peeling rounds UNROLLED as chained CTEs — full value oracle (the
    # fixpoint lands in 2 rounds at every test scale, measured); also
    # golden-tested on hand-computed cores in tests/test_graph.py
    sql=_kcore_unrolled_sql(k=2, n_stages=6),
    survey_ops="K(ext)",
    tables=("events",),
)
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the parent+predecessor graph (operators/graph.py k_core):
    the cyclic backbone that survives after iteratively peeling degree-1
    vertices. (The 3-core of this graph is empty — k=2 keeps the check
    non-trivial.)"""
    from esco_neo4j_spark.operators.graph import k_core

    ev = spark.table("events")
    parents = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    preds = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).cast("bigint").alias("dst"),
    )
    return (
        k_core(parents.union(preds).distinct(), k=2)
        .orderBy("id")
    )


@query(
    "graph_harmonic_closeness",
    # oracle exploits the TREE shape: undirected tree distance d(u,v) =
    # min over common ancestors a of d(u,a)+d(a,v) (minimized at the
    # LCA), from each node's parent-chain — fully independent of the
    # Spark side's generic frontier BFS.
    sql=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    verts AS (
      SELECT src AS id FROM edges UNION SELECT dst FROM edges
    ),
    up AS (
      SELECT id, id AS anc, 0 AS d FROM verts
      UNION ALL
      SELECT u.id, e.dst, u.d + 1 FROM up u JOIN edges e ON u.anc = e.src
    ),
    pairdist AS (
      SELECT a.id AS u, min(a.d + b.d) AS dist
      FROM up a JOIN up b ON a.anc = b.anc AND a.id <> b.id
      GROUP BY a.id, b.id
    )
    SELECT u AS id, CAST(count(*) AS BIGINT) AS n_reachable,
           CAST(sum(CAST(round(1000000.0 / dist) AS BIGINT)) AS BIGINT)
             AS harmonic_micro
    FROM pairdist GROUP BY u ORDER BY id
    """,
    survey_ops="K4(ext),K1",
    tables=("events",),
)
def graph_harmonic_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic closeness centrality C(u) = sum over v != u of 1/d(u,v)
    — the closeness variant that is well-defined on disconnected graphs
    (unreachable pairs contribute 0 instead of poisoning an average).
    Runs the GENERIC undirected multi-source BFS closure (frontier
    anti-join path — undirected inputs must never take the walk-
    enumerating CTE); per-pair contributions are quantized to integer
    micro-units before summing, so the centrality is exact in any
    partition order. Completes the centrality family next to PageRank
    (influence flow) and betweenness (brokerage): closeness measures
    broadcast reach. Scale: state is the reachable pair set keyed
    (origin, id) — O(V * diameter) rounds; at 100x prefer sampled
    pivots (the Brandes-Pich move betweenness already makes)."""
    tc = transitive_closure(_edges(spark), max_depth=20, directed=False)
    # the undirected closure legitimately reaches u from u via
    # parent-and-back (depth 2); closeness is over OTHER vertices only
    tc = tc.filter(F.col("src") != F.col("dst"))
    return (
        tc.groupBy(F.col("src").alias("id"))
        .agg(
            F.count("*").alias("n_reachable"),
            F.sum(
                F.round(F.lit(1_000_000.0) / F.col("depth")).cast("bigint")
            ).cast("bigint").alias("harmonic_micro"),
        )
        .orderBy("id")
    )


@query(
    "graph_eccentricity",
    # same LCA tree-distance oracle as graph_harmonic_closeness, reduced
    # by max instead of a harmonic sum
    sql=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    verts AS (
      SELECT src AS id FROM edges UNION SELECT dst FROM edges
    ),
    up AS (
      SELECT id, id AS anc, 0 AS d FROM verts
      UNION ALL
      SELECT u.id, e.dst, u.d + 1 FROM up u JOIN edges e ON u.anc = e.src
    ),
    pairdist AS (
      SELECT a.id AS u, min(a.d + b.d) AS dist
      FROM up a JOIN up b ON a.anc = b.anc AND a.id <> b.id
      GROUP BY a.id, b.id
    )
    SELECT u AS id, CAST(max(dist) AS INT) AS eccentricity
    FROM pairdist GROUP BY u ORDER BY id
    """,
    survey_ops="K4(ext),K1",
    tables=("events",),
)
def graph_eccentricity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex eccentricity (max undirected distance to any reachable
    vertex) — max over the same generic BFS closure harmonic closeness
    sums over; the graph's diameter and radius read off as max/min of
    this column. Integer distances, so the reduction is exact by
    construction."""
    tc = transitive_closure(_edges(spark), max_depth=20, directed=False)
    return (
        tc.filter(F.col("src") != F.col("dst"))
        .groupBy(F.col("src").alias("id"))
        .agg(F.max("depth").cast("int").alias("eccentricity"))
        .orderBy("id")
    )


_WEDGES_SQL = """
    SELECT src, dst, 1 + ((src + dst) % 3) AS w FROM (
      SELECT DISTINCT user_id AS src, user_id // 2 AS dst
      FROM events WHERE user_id >= 1
      UNION
      SELECT DISTINCT user_id, user_id - 1
      FROM events WHERE user_id >= 2
    )
"""


def _pagerank_weighted_unrolled_sql(
    n_iter: int = 10, damping: float = 0.85, scale: int = 10**9,
    edges_sql: str | None = None, final_sql: str | None = None,
    with_prefix: str = "",
) -> str:
    """Unrolled DuckDB twin of operators/graph.pagerank_weighted_fixedpoint.
    All state is BIGINT units; the only float op per vertex per iteration
    is the single damping multiply+round — deterministic on both engines —
    so the whole 10-iteration chain is value-exact BY CONSTRUCTION, not
    empirically (contrast _pagerank_unrolled_sql's in-degree<=2 argument).
    Parameterizable: ``edges_sql`` swaps the (src, dst, w) edge derivation
    (default: the weighted events graph), ``with_prefix`` injects CTEs the
    edge derivation needs, ``final_sql`` swaps the closing SELECT —
    text_queries' TextRank runs the SAME unrolled chain over a word
    co-occurrence graph."""
    base = int(round((1.0 - damping) * scale))
    sql = [f"""
    WITH {with_prefix}edges AS ({edges_sql or _WEDGES_SQL}),
    verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    wsum AS (SELECT src, sum(w) AS wtot FROM edges GROUP BY src),
    ed AS (SELECT e.src, e.dst, e.w, s.wtot FROM edges e JOIN wsum s ON e.src = s.src),
    r0 AS (SELECT id, CAST({scale} AS BIGINT) AS r FROM verts)"""]
    for i in range(1, n_iter + 1):
        sql.append(f""",
    m{i} AS (
      SELECT ed.dst AS id, sum((r.r * ed.w) // ed.wtot) AS msg
      FROM ed JOIN r{i - 1} r ON ed.src = r.id GROUP BY ed.dst
    ),
    r{i} AS (
      SELECT v.id,
             CAST({base} + round({damping!r} * coalesce(m.msg, 0)) AS BIGINT)
               AS r
      FROM verts v LEFT JOIN m{i} m ON v.id = m.id
    )""")
    sql.append(final_sql or f"""
    SELECT id, r AS rank_units,
           CAST(round(r / {float(scale)!r}, 6) AS DOUBLE) AS rank
    FROM r{n_iter} ORDER BY id""")
    return "".join(sql)


@query(
    "graph_pagerank_weighted",
    sql=_pagerank_weighted_unrolled_sql(),
    survey_ops="K4-adjacent(pagerank-weighted,ext)",
    tables=("events",),
)
def graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED PageRank on the parent+predecessor graph (out-degree <= 2,
    edge weight 1 + (src+dst) % 3), computed in fixed-point integer units
    so per-vertex message sums are associative — bit-identical at any
    parallelism, hence a FULL value oracle where float PageRank on a
    >2-in-degree graph could only ever be empirically stable (see
    operators/graph.pagerank_weighted_fixedpoint)."""
    from esco_neo4j_spark.operators.graph import pagerank_weighted_fixedpoint

    ev = spark.table("events")
    parents = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    preds = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).cast("bigint").alias("dst"),
    )
    e = (
        parents.union(preds)
        .distinct()
        .withColumn("weight", 1 + (F.col("src") + F.col("dst")) % 3)
    )
    pr = pagerank_weighted_fixedpoint(e, num_iter=10)
    return pr.select(
        "id",
        "rank_units",
        F.round(F.col("rank_units") / 1_000_000_000.0, 6).alias("rank"),
    ).orderBy("id")


def _katz_unrolled_sql(
    n_iter: int = 10, alpha: float = 0.2, scale: int = 10**9
) -> str:
    """Unrolled DuckDB twin of operators/graph.katz_fixedpoint on the
    wedge graph: bigint state, one float multiply+round per vertex per
    iteration — value-exact by construction (same argument as
    _pagerank_weighted_unrolled_sql)."""
    sql = [f"""
    WITH edges AS (SELECT src, dst FROM ({_WEDGES_SQL})),
    verts AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges),
    x0 AS (SELECT id, CAST({scale} AS BIGINT) AS x FROM verts)"""]
    for i in range(1, n_iter + 1):
        sql.append(f""",
    m{i} AS (
      SELECT e.dst AS id, sum(x.x) AS msg
      FROM edges e JOIN x{i - 1} x ON e.src = x.id GROUP BY e.dst
    ),
    x{i} AS (
      SELECT v.id,
             CAST({scale} + round({alpha!r} * coalesce(m.msg, 0)) AS BIGINT)
               AS x
      FROM verts v LEFT JOIN m{i} m ON v.id = m.id
    )""")
    sql.append(f"""
    SELECT id, x AS katz_units,
           CAST(round(x / {float(scale)!r}, 6) AS DOUBLE) AS katz
    FROM x{n_iter} ORDER BY katz_units DESC, id
    LIMIT 50""")
    return "".join(sql)


@query(
    "graph_katz",
    sql=_katz_unrolled_sql(),
    survey_ops="K4-adjacent-katz(ext)",
    tables=("events",),
)
def graph_katz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Katz centrality (attenuated walk count, alpha=0.2) on the
    parent+predecessor graph, in fixed-point integer units — the
    non-normalized counterpart to PageRank in the centrality family
    (degree / closeness / harmonic / betweenness / eccentricity /
    PageRank / HITS / Katz). In-degree here is <= 3, so alpha*d < 1 and
    units stay bounded; the unrolled oracle replays all 10 iterations
    value-exact. Top-50 by centrality with id tiebreak."""
    from esco_neo4j_spark.operators.graph import katz_fixedpoint

    ev = spark.table("events")
    parents = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    preds = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).cast("bigint").alias("dst"),
    )
    e = parents.union(preds).distinct()
    kz = katz_fixedpoint(e, alpha=0.2, num_iter=10)
    return (
        kz.select(
            "id",
            "katz_units",
            F.round(F.col("katz_units") / 1_000_000_000.0, 6).alias("katz"),
        )
        .orderBy(F.desc("katz_units"), F.asc("id"))
        .limit(50)
    )


@query(
    "graph_link_prediction_jaccard",
    sql=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (
      SELECT src, dst FROM edges
      UNION SELECT dst, src FROM edges
    ),
    wedge AS (
      SELECT DISTINCT a.src AS u, b.src AS v
      FROM und a JOIN und b ON a.dst = b.dst AND a.src < b.src
    ),
    existing AS (
      SELECT src AS u, dst AS v FROM und
    ),
    cand AS (
      SELECT w.u, w.v FROM wedge w
      LEFT JOIN existing e ON w.u = e.u AND w.v = e.v
      WHERE e.u IS NULL
    ),
    nbrs AS (
      SELECT src AS id, list_sort(list(DISTINCT dst)) AS ns
      FROM und GROUP BY src
    )
    SELECT c.u, c.v,
           CAST(len(list_intersect(a.ns, b.ns)) AS INT) AS common,
           CAST(round(len(list_intersect(a.ns, b.ns))::DOUBLE /
                (len(a.ns) + len(b.ns) - len(list_intersect(a.ns, b.ns))), 6)
             AS DOUBLE) AS jaccard
    FROM cand c JOIN nbrs a ON c.u = a.id JOIN nbrs b ON c.v = b.id
    ORDER BY jaccard DESC, u, v
    LIMIT 50
    """,
    survey_ops="K-linkpred(ext),C4,D6",
    tables=("events",),
)
def graph_link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighbor-set Jaccard — the classic graph-ML
    feature: candidate pairs are WEDGES (two vertices sharing a
    neighbor, minus existing edges), so candidate generation is an
    equi-join on the common neighbor, never all-pairs; scores compare
    sorted distinct-neighbor sets. The same guard philosophy as LSH
    dedup: a super-hub's wedge fan-out is the skew risk at 100x — cap or
    sample hub neighborhoods (degree-ordered orientation, as
    triangle_count does) before the wedge join."""
    e = _edges(spark)
    und = e.select("src", "dst").union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    a, b = und.alias("a"), und.alias("b")
    wedge = (
        a.join(
            b,
            (F.col("a.dst") == F.col("b.dst"))
            & (F.col("a.src") < F.col("b.src")),
        )
        .select(F.col("a.src").alias("u"), F.col("b.src").alias("v"))
        .distinct()
    )
    existing = und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    cand = wedge.join(existing, ["u", "v"], "left_anti")
    nbrs = und.groupBy(F.col("src").alias("id")).agg(
        F.array_sort(F.collect_set("dst")).alias("ns")
    )
    inter = F.size(F.array_intersect(F.col("na"), F.col("nb"))).cast("double")
    union_sz = (
        F.size("na") + F.size("nb")
        - F.size(F.array_intersect(F.col("na"), F.col("nb")))
    ).cast("double")
    return (
        cand.join(nbrs.select(F.col("id").alias("u"), F.col("ns").alias("na")), "u")
        .join(nbrs.select(F.col("id").alias("v"), F.col("ns").alias("nb")), "v")
        .select(
            "u",
            "v",
            F.size(F.array_intersect(F.col("na"), F.col("nb")))
            .cast("int")
            .alias("common"),
            F.round(inter / union_sz, 6).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), "u", "v")
        .limit(50)
    )


_N_PIVOTS = 8


@query(
    "graph_closeness_sampled",
    # same LCA pairdist as the exact closeness oracle, restricted to the
    # deterministic pivot set (the _N_PIVOTS smallest vertex ids)
    sql=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    -- explicit DISTINCT: under the RECURSIVE marker DuckDB leaves a bare
    -- UNION's duplicates in place (same quirk the betweenness oracle hit),
    -- which would corrupt BOTH the pivot set and the n_verts scale factor
    verts AS (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
      )
    ),
    pivots AS (SELECT id FROM verts ORDER BY id LIMIT {_N_PIVOTS}),
    n AS (SELECT count(*) AS n_verts FROM verts),
    up AS (
      SELECT id, id AS anc, 0 AS d FROM verts
      UNION ALL
      SELECT u.id, e.dst, u.d + 1 FROM up u JOIN edges e ON u.anc = e.src
    ),
    pairdist AS (
      SELECT a.id AS u, b.id AS p, min(a.d + b.d) AS dist
      FROM up a
      JOIN up b ON a.anc = b.anc AND a.id <> b.id
      WHERE b.id IN (SELECT id FROM pivots)
      GROUP BY a.id, b.id
    )
    SELECT u AS id,
           CAST(count(*) AS INT) AS n_pivots_reached,
           CAST(sum(CAST(round(1000000.0 / dist) AS BIGINT)) AS BIGINT)
             AS sum_micro,
           CAST(round(sum(CAST(round(1000000.0 / dist) AS BIGINT))
                      * (n.n_verts - 1)
                      / ({_N_PIVOTS} * 1000000.0), 6) AS DOUBLE)
             AS closeness_est
    FROM pairdist CROSS JOIN n
    GROUP BY u, n.n_verts ORDER BY id
    """,
    survey_ops="K4(ext),K1,sampled-centrality(ext)",
    tables=("events",),
)
def graph_closeness_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT-SAMPLED harmonic closeness — the 100x path the exact
    operator's docstring promises: BFS from k=8 deterministic pivots
    (smallest vertex ids; production uses a hashed sample) keyed
    (origin, id), so state is k x V instead of V^2, and the estimator
    scales the pivot sum by (n-1)/k — Brandes-Pich applied to
    closeness. Per-pair contributions quantized to integer micro-units
    (exact sums), the scale factor one scalar multiply. With
    deterministic pivots the whole estimate is value-oracled — the
    approximation ALGORITHM is in the hard gate, not just its
    quality."""
    from esco_neo4j_spark.operators.graph import multi_origin_depths

    e = _edges(spark)
    verts = e.select(F.col("src").alias("id")).union(
        e.select(F.col("dst").alias("id"))
    ).distinct()
    n_verts = verts.count()
    pivots = verts.orderBy("id").limit(_N_PIVOTS)
    depths = multi_origin_depths(e, pivots, max_depth=20, directed=False)
    micro = F.round(F.lit(1_000_000.0) / F.col("depth")).cast("bigint")
    return (
        depths.groupBy(F.col("id"))
        .agg(
            F.count("*").cast("int").alias("n_pivots_reached"),
            F.sum(micro).cast("bigint").alias("sum_micro"),
        )
        .select(
            "id",
            "n_pivots_reached",
            "sum_micro",
            F.round(
                F.col("sum_micro")
                * F.lit(float(n_verts - 1))
                / F.lit(_N_PIVOTS * 1_000_000.0),
                6,
            ).alias("closeness_est"),
        )
        .orderBy("id")
    )


_WALK_STEPS = 5


def _random_walks_sql(n_steps: int = _WALK_STEPS) -> str:
    und = """
      SELECT src, dst FROM edges
      UNION SELECT dst, src FROM edges
    """
    sql = [f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS ({und}),
    w0 AS (
      SELECT DISTINCT src AS origin, src AS cur,
             CAST(src AS VARCHAR) AS path
      FROM und
    )"""]
    for i in range(1, n_steps + 1):
        sql.append(f""",
    w{i} AS (
      SELECT w.origin, u.dst AS cur, w.path || '->' || CAST(u.dst AS VARCHAR)
               AS path
      FROM w{i - 1} w JOIN und u ON w.cur = u.src
      QUALIFY row_number() OVER (
        PARTITION BY w.origin
        ORDER BY md5(CAST(w.origin AS VARCHAR) || '-' || {i} || '-'
                     || CAST(u.dst AS VARCHAR)), u.dst) = 1
    )""")
    sql.append(f"""
    SELECT origin, path, cur AS final_vertex
    FROM w{n_steps} ORDER BY origin""")
    return "".join(sql)


@query(
    "graph_random_walks",
    sql=_random_walks_sql(),
    survey_ops="K-walks(ext),graph-ml(ext)",
    tables=("events",),
)
def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-corpus generation (the data-prep step of DeepWalk/node2vec:
    walks become 'sentences' for embedding training): one 5-step walk
    per origin vertex over the undirected view, where each step picks
    the neighbor minimizing md5(origin, step, candidate) — a
    deterministic hash in place of an RNG, which (a) makes walks
    reproducible run-to-run and resume-safe, exactly like the hash-based
    samplers, and (b) lets the oracle replay every step, so even the
    'random' walks sit in the hard gate. Each step is one equi-join on
    the frontier plus a per-origin argmin window — state is one row per
    walk, never the whole path history."""
    e = _edges(spark)
    und = (
        e.select("src", "dst")
        .union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    state = und.select(F.col("src").alias("origin")).distinct().select(
        "origin",
        F.col("origin").alias("cur"),
        F.col("origin").cast("string").alias("path"),
    )
    for i in range(1, _WALK_STEPS + 1):
        score = F.md5(
            F.concat_ws(
                "-",
                F.col("origin").cast("string"),
                F.lit(str(i)),
                F.col("dst").cast("string"),
            )
        )
        w = Window.partitionBy("origin").orderBy(score, F.col("dst"))
        state = (
            state.join(und, state["cur"] == und["src"])
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "origin",
                F.col("dst").alias("cur"),
                F.concat(
                    F.col("path"), F.lit("->"), F.col("dst").cast("string")
                ).alias("path"),
            )
        )
    return state.select(
        "origin", "path", F.col("cur").alias("final_vertex")
    ).orderBy("origin")


@query(
    "graph_assortativity",
    sql=f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS (
      SELECT src, dst FROM edges
      UNION ALL SELECT dst, src FROM edges
    ),
    deg AS (SELECT src AS id, count(*) AS d FROM und GROUP BY src),
    pairs AS (
      SELECT a.d AS x, b.d AS y
      FROM und u JOIN deg a ON u.src = a.id JOIN deg b ON u.dst = b.id
    ),
    s AS (
      SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM pairs
    )
    SELECT CAST(n AS BIGINT) AS n_edge_ends,
           CAST(round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
             AS DOUBLE) AS assortativity
    FROM s
    """,
    survey_ops="K-assortativity(ext),stats-corr(ext)",
    tables=("events",),
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity — Newman's r: Pearson correlation of the
    degrees at the two ends of every (directed-view) edge, the one-
    number summary of whether hubs attach to hubs (social graphs, r>0)
    or to leaves (hierarchies/hub-spoke, r<0). Same exact-integer
    power-sum discipline as ext_pearson_corr: degree join + five int64
    sums, one scalar double tail. Two broadcast-ready joins of the edge
    list against the degree table; at 100x the degree table is
    vertex-sized and the sums stay partial-aggregable."""
    e = _edges(spark)
    und = e.select("src", "dst").union(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("d"))
    pairs = (
        und.join(deg.select(F.col("id").alias("src"), F.col("d").alias("x")), "src")
        .join(deg.select(F.col("id").alias("dst"), F.col("d").alias("y")), "dst")
        .select("x", "y")
    )
    s = pairs.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")
    num = d("n") * d("sxy") - d("sx") * d("sy")
    den = F.sqrt(
        (d("n") * d("sxx") - d("sx") * d("sx"))
        * (d("n") * d("syy") - d("sy") * d("sy"))
    )
    return s.select(
        F.col("n").cast("bigint").alias("n_edge_ends"),
        F.round(num / den, 6).alias("assortativity"),
    )


def _hits_unrolled_sql(n_iter: int = 5, scale: int = 10**9) -> str:
    """Unrolled DuckDB twin of operators/graph.hits_fixedpoint."""
    sql = [f"""
    WITH edges AS MATERIALIZED ({_WEDGES_SQL.replace(", 1 + ((src + dst) % 3) AS w", "")}),
    verts AS (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
      )
    ),
    h0 AS (SELECT id, CAST({scale} AS BIGINT) AS v FROM verts)"""]
    for i in range(1, n_iter + 1):
        # every per-iteration CTE is MATERIALIZED: each level references
        # the previous one twice (value + sum), so inlining doubles the
        # plan per iteration — 2^10 recomputation by iteration 5
        # (measured 485s vs <1s on a 15-vertex graph)
        sql.append(f""",
    ar{i} AS MATERIALIZED (
      SELECT v.id, coalesce(sum(h.v), 0) AS v
      FROM verts v LEFT JOIN edges e ON v.id = e.dst
                   LEFT JOIN h{i - 1} h ON e.src = h.id
      GROUP BY v.id
    ),
    asum{i} AS MATERIALIZED (SELECT sum(v) AS s FROM ar{i}),
    a{i} AS MATERIALIZED (
      SELECT id, (v * {scale}) // s AS v FROM ar{i} CROSS JOIN asum{i}
    ),
    hr{i} AS MATERIALIZED (
      SELECT v.id, coalesce(sum(a.v), 0) AS v
      FROM verts v LEFT JOIN edges e ON v.id = e.src
                   LEFT JOIN a{i} a ON e.dst = a.id
      GROUP BY v.id
    ),
    hsum{i} AS MATERIALIZED (SELECT sum(v) AS s FROM hr{i}),
    h{i} AS MATERIALIZED (
      SELECT id, (v * {scale}) // s AS v FROM hr{i} CROSS JOIN hsum{i}
    )""")
    sql.append(f"""
    SELECT h.id, CAST(h.v AS BIGINT) AS hub_units,
           CAST(a.v AS BIGINT) AS auth_units
    FROM h{n_iter} h JOIN a{n_iter} a ON h.id = a.id
    ORDER BY h.id""")
    return "".join(sql)


@query(
    "graph_hits",
    sql=_hits_unrolled_sql(),
    survey_ops="K-hits(ext)",
    tables=("events",),
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities on the parent+predecessor graph, computed
    in fixed-point integer units with L1 rescaling by exact integer
    division each round (operators/graph.hits_fixedpoint) — associative
    sums make the 5-iteration chain bit-identical at any parallelism,
    so the mutual-reinforcement algorithm gets a FULL unrolled value
    oracle (float HITS's L2 normalization is order-sensitive twice
    over)."""
    from esco_neo4j_spark.operators.graph import hits_fixedpoint

    ev = spark.table("events")
    parents = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    preds = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).cast("bigint").alias("dst"),
    )
    e = parents.union(preds).distinct()
    return hits_fixedpoint(e, num_iter=5).orderBy("id")


def _mis_unrolled_sql(rounds: int = 8) -> str:
    """DuckDB twin of operators/graph.luby_mis: the fixed-round schedule
    and per-(id, round) arithmetic-hash priorities replay exactly, so the
    unrolled CTE chain is equal by construction — including rounds after
    the set is maximal, which are empty on both sides."""

    def h(col: str, r: int) -> str:
        return f"((22853 * ({col} + {r * 1_000_003}) + 977) % 2147483647)"

    sql = [f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst, src FROM edges WHERE src <> dst
    ),
    a0 AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)"""]
    for r in range(1, rounds + 1):
        ha, hn = h("a.id", r), h("n.id", r)
        sql.append(f""",
    m{r} AS MATERIALIZED (
      SELECT a.id FROM a{r - 1} a
      WHERE NOT EXISTS (
        SELECT 1 FROM und e JOIN a{r - 1} n ON n.id = e.dst
        WHERE e.src = a.id
          AND ({hn} < {ha} OR ({hn} = {ha} AND n.id < a.id))
      )
    ),
    a{r} AS MATERIALIZED (
      SELECT id FROM a{r - 1}
      WHERE id NOT IN (SELECT id FROM m{r})
        AND id NOT IN (SELECT e.dst FROM und e
                       WHERE e.src IN (SELECT id FROM m{r}))
    )""")
    union = "\n      UNION ALL\n      ".join(
        f"SELECT id, {r} AS mis_round FROM m{r}" for r in range(1, rounds + 1)
    )
    sql.append(f"""
    SELECT id, CAST(mis_round AS INT) AS mis_round
    FROM ({union}) ORDER BY id""")
    return "".join(sql)


@query(
    "graph_mis_luby",
    sql=_mis_unrolled_sql(),
    survey_ops="K(ext),C8,G2",
    tables=("events",),
)
def graph_mis_luby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal independent set via Luby's randomized-symmetry-breaking
    algorithm with deterministic per-round hash priorities — the building
    block for distributed coloring/scheduling (and the classic proof that
    'inherently sequential' greedy graph algorithms parallelize). The
    fixed 8-round schedule replays bit-exactly in the unrolled oracle;
    independence + maximality are separately property-tested."""
    from esco_neo4j_spark.operators.graph import luby_mis

    return luby_mis(_edges(spark), rounds=8).orderBy("id")


def _densest_unrolled_sql(rounds: int = 12) -> str:
    """DuckDB twin of operators/graph.densest_subgraph on the wedge
    graph: the fixed peeling schedule with exact integer removal test
    (deg*N <= 3*E) and cross-multiplied density argmax replays
    round-for-round; rounds after the graph empties have n = 0 and drop
    out of the argmax on both sides."""
    sql = [f"""
    WITH edges AS (SELECT src, dst FROM ({_WEDGES_SQL})),
    canon AS MATERIALIZED (
      SELECT least(src, dst) AS src, greatest(src, dst) AS dst
      FROM edges WHERE src <> dst GROUP BY 1, 2
    ),
    v0 AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)"""]
    for r in range(1, rounds + 1):
        sql.append(f""",
    e{r} AS MATERIALIZED (
      SELECT c.src, c.dst FROM canon c
      WHERE c.src IN (SELECT id FROM v{r - 1})
        AND c.dst IN (SELECT id FROM v{r - 1})
    ),
    s{r} AS MATERIALIZED (
      SELECT (SELECT count(*) FROM v{r - 1}) AS n,
             (SELECT count(*) FROM e{r}) AS e
    ),
    d{r} AS MATERIALIZED (
      SELECT id, count(*) AS deg FROM (
        SELECT src AS id FROM e{r} UNION ALL SELECT dst FROM e{r}
      ) GROUP BY id
    ),
    v{r} AS MATERIALIZED (
      SELECT v.id FROM v{r - 1} v
      LEFT JOIN d{r} d ON v.id = d.id, s{r} s
      WHERE coalesce(d.deg, 0) * s.n > 3 * s.e
    )""")
    stats_union = "\n      UNION ALL ".join(
        f"SELECT {r} AS round, n, e FROM s{r}" for r in range(1, rounds + 1)
    )
    mem_union = "\n      UNION ALL ".join(
        f"SELECT {r} AS round, id FROM v{r - 1}" for r in range(1, rounds + 1)
    )
    sql.append(f""",
    stats AS ({stats_union}),
    ok AS (SELECT * FROM stats WHERE n > 0),
    best AS (
      SELECT * FROM ok a WHERE NOT EXISTS (
        SELECT 1 FROM ok b
        WHERE b.e * a.n > a.e * b.n
           OR (b.e * a.n = a.e * b.n AND b.round < a.round))
    ),
    mem AS ({mem_union})
    SELECT m.id, CAST(b.round AS INT) AS best_round,
           CAST(b.n AS BIGINT) AS n_vertices,
           CAST(b.e AS BIGINT) AS n_edges,
           CAST(round(b.e * 1.0 / b.n, 6) AS DOUBLE) AS density
    FROM mem m JOIN best b ON m.round = b.round
    ORDER BY id""")
    return "".join(sql)


@query(
    "graph_densest_subgraph",
    sql=_densest_unrolled_sql(),
    survey_ops="K(ext),C8,D8",
    tables=("events",),
)
def graph_densest_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate densest subgraph by Bahmani-style peeling (eps=1/2,
    3-approximation) on the parent+predecessor graph — the community-core
    extraction primitive. Every comparison in the algorithm is integer
    (removal test by cross-multiplied degree vs density, argmax by
    cross-multiplied densities), so the full 12-round schedule replays in
    the unrolled oracle; the only float is the final reported density."""
    from esco_neo4j_spark.operators.graph import densest_subgraph

    ev = spark.table("events")
    parents = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    preds = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).cast("bigint").alias("dst"),
    )
    e = parents.union(preds).distinct()
    return densest_subgraph(e, max_rounds=12).orderBy("id")


def _coloring_unrolled_sql(rounds: int = 16) -> str:
    """DuckDB twin of operators/graph.priority_coloring: the MIS
    unrolling with winners-only removal (neighbors stay active)."""

    def h(col: str, r: int) -> str:
        return f"((22853 * ({col} + {r * 1_000_003}) + 977) % 2147483647)"

    sql = [f"""
    WITH edges AS ({_EDGES_SQL}),
    und AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
      UNION
      SELECT dst, src FROM edges WHERE src <> dst
    ),
    a0 AS MATERIALIZED (SELECT src AS id FROM edges UNION SELECT dst FROM edges)"""]
    for r in range(1, rounds + 1):
        ha, hn = h("a.id", r), h("n.id", r)
        sql.append(f""",
    m{r} AS MATERIALIZED (
      SELECT a.id FROM a{r - 1} a
      WHERE NOT EXISTS (
        SELECT 1 FROM und e JOIN a{r - 1} n ON n.id = e.dst
        WHERE e.src = a.id
          AND ({hn} < {ha} OR ({hn} = {ha} AND n.id < a.id))
      )
    ),
    a{r} AS MATERIALIZED (
      SELECT id FROM a{r - 1} WHERE id NOT IN (SELECT id FROM m{r})
    )""")
    union = "\n      UNION ALL\n      ".join(
        f"SELECT id, {r} AS color FROM m{r}" for r in range(1, rounds + 1)
    )
    sql.append(f"""
    SELECT id, CAST(color AS INT) AS color
    FROM ({union}) ORDER BY id""")
    return "".join(sql)


@query(
    "graph_coloring",
    sql=_coloring_unrolled_sql(),
    survey_ops="K(ext),C8,G2",
    tables=("events",),
)
def graph_coloring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed graph coloring by iterated priority maxima (the Luby
    MIS loop with winners-only removal, round number = color) — the
    scheduling/conflict-partition primitive: same-color vertices can be
    processed concurrently with no neighbor conflicts. Properness is
    guaranteed by construction (adjacent vertices cannot both be round-r
    local maxima) and property-tested; the fixed 16-round schedule
    replays bit-exactly in the unrolled oracle."""
    from esco_neo4j_spark.operators.graph import priority_coloring

    return priority_coloring(_edges(spark), rounds=16).orderBy("id")


# One constant drives BOTH sides of the graph_msf_boruvka gate: the Spark
# operator's max_iter AND the oracle's Boruvka unroll count. Because the
# operator emits exactly its first max_iter rounds of picks (early-exiting
# once no live inter-component edge remains) and the unrolled SQL emits the
# identical deterministic round-prefix (idempotent past the fixpoint), the
# two sides agree BY CONSTRUCTION at any scale — even on a graph too deep
# to converge in this many rounds. Full convergence (complete forest) is a
# separate property, asserted vs a plain-Python Kruskal in
# tests/test_graph.py at test scale; 8 rounds converge comfortably on the
# events graph (components at least halve per round; the hash weights make
# chains collapse far faster — sf0.1 converges in <5 rounds).
MSF_UNROLL_ROUNDS = 8


def _msf_unrolled_sql(n_rounds: int = MSF_UNROLL_ROUNDS, cc_rounds: int = 14) -> str:
    """DuckDB twin of operators/graph.msf_boruvka with the NESTED
    iteration fully unrolled: ``n_rounds`` Boruvka rounds, each embedding
    ``cc_rounds`` hash-min + pointer-jump connected-components rounds
    over that round's contraction graph.

    Valid as a value oracle because BOTH loops are idempotent past their
    fixpoints (an empty live set makes every later Boruvka round the
    identity; min-adoption + pointer jumping re-derives the same state
    once converged), so fixed unroll counts >= the rounds Spark actually
    ran reproduce its early-exit semantics exactly — the same argument
    as the LPA/Louvain oracles, applied one level deeper. Every quantity
    is integer (ids, integer-hash weights stored as exact doubles,
    row_number tie-breaks on (w, a, b)), so cross-engine equality is
    exact. MATERIALIZED throughout: each round references its state
    multiple times and DuckDB inlines plain CTEs per reference.
    """
    parts = [f"""
    WITH base AS MATERIALIZED (
      SELECT src, dst,
             CAST((22853 * (src * 1000003 + dst) + 977) % 2147483647
               AS DOUBLE) AS w
      FROM (
        SELECT DISTINCT src, dst FROM (
          SELECT user_id AS src, user_id // 2 AS dst
          FROM events WHERE user_id >= 1
          UNION ALL
          SELECT user_id AS src, user_id - 1 AS dst
          FROM events WHERE user_id >= 2
        )
      )
    ),
    canon AS MATERIALIZED (
      SELECT least(src, dst) AS a, greatest(src, dst) AS b, min(w) AS w
      FROM base WHERE src <> dst GROUP BY 1, 2
    ),
    comp0 AS MATERIALIZED (
      SELECT id, id AS component FROM (
        SELECT DISTINCT a AS id FROM canon
        UNION SELECT DISTINCT b FROM canon
      )
    )"""]
    for r in range(n_rounds):
        parts.append(f""",
    live{r} AS MATERIALIZED (
      SELECT c.a, c.b, c.w, ca.component AS cca, cb.component AS ccb
      FROM canon c
      JOIN comp{r} ca ON c.a = ca.id
      JOIN comp{r} cb ON c.b = cb.id
      WHERE ca.component <> cb.component
    ),
    picked{r} AS MATERIALIZED (
      SELECT DISTINCT a, b, w FROM (
        SELECT c, w, a, b, row_number() OVER (
          PARTITION BY c ORDER BY w, a, b) AS rn
        FROM (
          SELECT cca AS c, w, a, b FROM live{r}
          UNION ALL
          SELECT ccb AS c, w, a, b FROM live{r}
        )
      ) WHERE rn = 1
    ),
    cgraph{r} AS MATERIALIZED (
      SELECT l.cca AS src, l.ccb AS dst
      FROM picked{r} p
      JOIN (SELECT DISTINCT a, b, cca, ccb FROM live{r}) l
        ON p.a = l.a AND p.b = l.b
    ),
    und{r} AS MATERIALIZED (
      SELECT src, dst FROM cgraph{r}
      UNION ALL SELECT dst, src FROM cgraph{r}
    ),
    st{r}_0 AS MATERIALIZED (
      SELECT id, id AS component FROM (
        SELECT DISTINCT src AS id FROM cgraph{r}
        UNION SELECT DISTINCT dst FROM cgraph{r}
      )
    )""")
        for j in range(cc_rounds):
            parts.append(f""",
    ad{r}_{j} AS MATERIALIZED (
      SELECT id, min(component) AS component FROM (
        SELECT id, component FROM st{r}_{j}
        UNION ALL
        SELECT e.dst AS id, s.component
        FROM und{r} e JOIN st{r}_{j} s ON e.src = s.id
      ) GROUP BY id
    ),
    st{r}_{j + 1} AS MATERIALIZED (
      SELECT a.id, p.component
      FROM ad{r}_{j} a JOIN ad{r}_{j} p ON a.component = p.id
    )""")
        parts.append(f""",
    comp{r + 1} AS MATERIALIZED (
      SELECT c.id, coalesce(s.component, c.component) AS component
      FROM comp{r} c LEFT JOIN st{r}_{cc_rounds} s ON c.component = s.id
    )""")
    forest = "\n      UNION ALL\n      ".join(
        f"SELECT a, b, w FROM picked{r}" for r in range(n_rounds)
    )
    parts.append(f"""
    SELECT a, b, w AS weight FROM (
      {forest}
    )
    ORDER BY a, b""")
    return "".join(parts)


@query(
    "graph_msf_boruvka",
    # FULL value oracle (r3, formerly rows-only): both the Boruvka loop
    # AND the per-round hash-min/pointer-jump CC are unrolled as
    # MATERIALIZED CTE rounds — see _msf_unrolled_sql for the
    # idempotent-past-fixpoint argument, and MSF_UNROLL_ROUNDS for why
    # sharing the round cap with the operator makes the match exact by
    # construction. The exact edge set is ALSO pinned against an
    # independent plain-Python Kruskal in tests/test_graph.py.
    sql=_msf_unrolled_sql(n_rounds=MSF_UNROLL_ROUNDS, cc_rounds=14),
    survey_ops="K(ext),C1,E",
    tables=("events",),
)
def graph_msf_boruvka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum spanning forest of the cyclic (tree + sibling) graph via
    Boruvka rounds — deterministic hash weights make the MSF unique, so
    the rows-only driver check is stable run to run. See
    operators/graph.py:msf_boruvka for the per-round shuffle budget."""
    from esco_neo4j_spark.operators.graph import msf_boruvka

    ev = spark.table("events")
    tree = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    sib = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).alias("dst"),
    )
    edges = tree.union(sib).distinct()
    w = (
        (F.lit(22853) * (F.col("src") * 1_000_003 + F.col("dst")) + 977)
        % 2_147_483_647
    ).cast("double")
    return (
        msf_boruvka(edges.withColumn("weight", w), max_iter=MSF_UNROLL_ROUNDS)
        .orderBy("a", "b")
    )


# --- landmark distance oracle ----------------------------------------------
@query(
    "graph_landmark_distance",
    # tree oracle: every pivot/exact distance is min(a.d + b.d) over the
    # common-ancestor chains (same machinery as graph_closeness_sampled);
    # the estimate replays min over pivots of d(u,p) + d(p,v) exactly
    sql=f"""
    WITH RECURSIVE edges AS ({_EDGES_SQL}),
    verts AS (
      SELECT DISTINCT id FROM (
        SELECT src AS id FROM edges UNION ALL SELECT dst FROM edges
      )
    ),
    f20 AS (SELECT id FROM verts ORDER BY id LIMIT 20),
    pivots AS (SELECT id FROM verts ORDER BY id LIMIT {_N_PIVOTS}),
    up AS (
      SELECT id, id AS anc, 0 AS d FROM verts
      UNION ALL
      SELECT u.id, e.dst, u.d + 1 FROM up u JOIN edges e ON u.anc = e.src
    ),
    ex AS (
      SELECT a.id AS u, b.id AS v, min(a.d + b.d) AS exact_dist
      FROM up a JOIN up b ON a.anc = b.anc
      WHERE a.id IN (SELECT id FROM f20) AND b.id IN (SELECT id FROM f20)
        AND a.id < b.id
      GROUP BY a.id, b.id
    ),
    dp AS (
      SELECT b.id AS p, a.id AS x, min(a.d + b.d) AS dist
      FROM up a JOIN up b ON a.anc = b.anc
      WHERE b.id IN (SELECT id FROM pivots)
        AND a.id IN (SELECT id FROM f20)
      GROUP BY a.id, b.id
    ),
    est AS (
      SELECT x1.x AS u, x2.x AS v, min(x1.dist + x2.dist) AS est_dist
      FROM dp x1 JOIN dp x2 ON x1.p = x2.p AND x1.x < x2.x
      GROUP BY x1.x, x2.x
    )
    SELECT ex.u, ex.v, CAST(exact_dist AS INT) AS exact_dist,
           CAST(est_dist AS INT) AS est_dist,
           CAST(round(est_dist::DOUBLE / exact_dist, 6) AS DOUBLE) AS stretch
    FROM ex LEFT JOIN est ON ex.u = est.u AND ex.v = est.v
    ORDER BY ex.u, ex.v
    """,
    survey_ops="K2(scale),sampled-centrality(ext)",
    tables=("events",),
)
def graph_landmark_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark (pivot) distance oracle — the standard way to answer
    point-to-point distance queries on graphs too big for pairwise BFS:
    precompute d(pivot, *) for k landmarks (k x V state, the
    multi_origin_depths engine), then estimate
    dist(u,v) <= min_p d(u,p) + d(p,v). The query materializes the
    estimate AND the exact distance for every pair in a deterministic
    probe set (the 20 smallest vertex ids), with the stretch factor —
    the approximation's quality report is itself value-oracled, like
    vec_lsh_recall_eval does for ANN. est >= exact by the triangle
    inequality (pytest-pinned); stretch 1.0 rows are pairs some
    landmark chain covers optimally."""
    from esco_neo4j_spark.operators.graph import multi_origin_depths

    e = _edges(spark)
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    f20 = verts.orderBy("id").limit(20)
    pivots = verts.orderBy("id").limit(_N_PIVOTS)
    # one k=20-origin BFS serves both sides: exact pair distances (both
    # endpoints in the probe set) and the pivot table (pivots are a
    # prefix of the probe set)
    d20 = multi_origin_depths(e, f20, max_depth=20, directed=False)
    probe = F.broadcast(f20.withColumnRenamed("id", "pid"))
    exact = (
        d20.join(probe, d20["id"] == F.col("pid"))
        .filter(F.col("origin") < F.col("id"))
        .select(
            F.col("origin").alias("u"),
            F.col("id").alias("v"),
            F.col("depth").alias("exact_dist"),
        )
    )
    pset = F.broadcast(pivots.withColumnRenamed("id", "p"))
    dp = (
        d20.join(pset, d20["origin"] == F.col("p"))
        .select("origin", "id", "depth")
        .union(
            pivots.select(
                F.col("id").alias("origin"),
                F.col("id"),
                F.lit(0).cast("int").alias("depth"),
            )
        )
        .join(probe, F.col("id") == F.col("pid"))
        .select("origin", "id", "depth")
    )
    a = dp.select(
        F.col("origin"), F.col("id").alias("u"), F.col("depth").alias("d1")
    )
    b = dp.select(
        F.col("origin"), F.col("id").alias("v"), F.col("depth").alias("d2")
    )
    est = (
        a.join(b, "origin")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.min(F.col("d1") + F.col("d2")).alias("est_dist"))
    )
    return (
        exact.join(est, ["u", "v"], "left")
        .select(
            "u",
            "v",
            F.col("exact_dist").cast("int").alias("exact_dist"),
            F.col("est_dist").cast("int").alias("est_dist"),
            F.round(
                F.col("est_dist").cast("double") / F.col("exact_dist"), 6
            ).alias("stretch"),
        )
        .orderBy("u", "v")
    )


# --- k-truss decomposition --------------------------------------------------
def _ktruss_sql(k: int, rounds: int) -> str:
    """Unrolled MATERIALIZED-CTE replay of the fixed-round peeling (same
    pattern as the Luby-MIS / coloring oracles): each round recomputes
    per-edge triangle support on the surviving set and filters. A no-op
    round leaves the set unchanged, so unrolling >= the fixpoint round
    count is exact."""
    parts = [
        f"""e0 AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      FROM ({_TRI_EDGES_SQL}) WHERE src <> dst
    )"""
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f"""t{i} AS MATERIALIZED (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM e{p} e1 JOIN e{p} e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN e{p} e3 ON e3.a = e1.b AND e3.b = e2.b
    )""")
        parts.append(f"""s{i} AS MATERIALIZED (
      SELECT a, b, count(*) AS s FROM (
        SELECT x AS a, y AS b FROM t{i}
        UNION ALL SELECT x AS a, z AS b FROM t{i}
        UNION ALL SELECT y AS a, z AS b FROM t{i}
      ) GROUP BY a, b
    )""")
        parts.append(f"""e{i} AS MATERIALIZED (
      SELECT e.a, e.b FROM e{p} e JOIN s{i} ON s{i}.a = e.a AND s{i}.b = e.b
      WHERE s{i}.s >= {k - 2}
    )""")
    last = f"e{rounds}"
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined},
    tf AS (
      SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM {last} e1 JOIN {last} e2 ON e2.a = e1.a AND e2.b > e1.b
      JOIN {last} e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    sf AS (
      SELECT a, b, count(*) AS s FROM (
        SELECT x AS a, y AS b FROM tf
        UNION ALL SELECT x AS a, z AS b FROM tf
        UNION ALL SELECT y AS a, z AS b FROM tf
      ) GROUP BY a, b
    )
    SELECT e.a, e.b, CAST(coalesce(sf.s, 0) AS INT) AS support
    FROM {last} e LEFT JOIN sf ON sf.a = e.a AND sf.b = e.b
    ORDER BY e.a, e.b
    """


@query(
    "graph_ktruss",
    sql=_ktruss_sql(k=3, rounds=4),
    survey_ops="K(ext),K5-family",
    tables=("events",),
)
def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-truss of the parent+predecessor graph: every surviving edge
    closes >= 1 triangle within the surviving set (peeled to fixpoint, 4
    bounded rounds). The cohesive-community step between k-core
    (vertex peeling) and clique mining; the oracle unrolls the identical
    peeling rounds as materialized CTEs."""
    from esco_neo4j_spark.operators.graph import k_truss

    ev = spark.table("events")
    parent = (
        ev.filter(F.col("user_id") >= 1)
        .select(
            F.col("user_id").alias("src"),
            (F.col("user_id") / 2).cast("bigint").alias("dst"),
        )
    )
    pred = (
        ev.filter(F.col("user_id") >= 2)
        .select(
            F.col("user_id").alias("src"),
            (F.col("user_id") - 1).cast("bigint").alias("dst"),
        )
    )
    edges = parent.union(pred).distinct()
    return k_truss(edges, k=3, max_rounds=4).orderBy("a", "b")


# --- motif matching (the Cypher-pattern surface as an API) ------------------
@query(
    "graph_motif_feedforward",
    sql=f"""
    WITH edges AS ({_TRI_EDGES_SQL})
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ORDER BY a, b, c
    """,
    survey_ops="C6,C4,motif(ext)",
    tables=("events",),
)
def graph_motif_feedforward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feed-forward-loop motif (a->b, b->c, a->c — the most studied
    directed triad) via the motif API: the Cypher pattern surface the
    esco_* queries hand-compile, as ONE reusable operator
    (operators/motif.py match_motif). Each pattern term is one equi-join
    Catalyst is free to reorder/broadcast; the oracle is the direct
    3-way join."""
    from esco_neo4j_spark.operators.motif import match_motif

    ev = spark.table("events")
    parent = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    pred = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).cast("bigint").alias("dst"),
    )
    edges = parent.union(pred).distinct()
    return match_motif(edges, "a->b; b->c; a->c").orderBy("a", "b", "c")


@query(
    "graph_motif_open_triad",
    sql=f"""
    WITH edges AS ({_TRI_EDGES_SQL})
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst
    LEFT JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
    WHERE e3.src IS NULL AND e1.src <> e2.dst
    ORDER BY a, b, c LIMIT 100
    """,
    survey_ops="C8,motif(ext)",
    tables=("events",),
)
def graph_motif_open_triad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open directed triads (a->b->c with NO closing a->c, a != c) via
    the motif API's negation term — Cypher's WHERE NOT (a)-->(c)
    compiled to a left_anti join. The candidate set link-prediction
    ranks; first 100 in binding order."""
    from esco_neo4j_spark.operators.motif import match_motif

    ev = spark.table("events")
    parent = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    pred = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).cast("bigint").alias("dst"),
    )
    edges = parent.union(pred).distinct()
    return (
        match_motif(edges, "a->b; b->c; !a->c")
        .filter(F.col("a") != F.col("c"))
        .orderBy("a", "b", "c")
        .limit(100)
    )


@query(
    "graph_reciprocity",
    sql=f"""
    WITH edges AS ({_TRI_EDGES_SQL}),
    d AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
    mutual AS (
      SELECT count(*) AS m FROM d a JOIN d b
        ON a.src = b.dst AND a.dst = b.src)
    SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_directed,
           CAST((SELECT m FROM mutual) AS BIGINT) AS n_reciprocal,
           CAST(round((SELECT m FROM mutual) * 1.0
                      / (SELECT count(*) FROM d), 6) AS DOUBLE)
             AS reciprocity
    """,
    survey_ops="C4,D1,network-metrics(ext)",
    tables=("events",),
)
def graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge reciprocity (fraction of directed edges whose reverse also
    exists) — the standard directed-network cohesion metric beside
    assortativity and clustering. One self-equi-join on the reversed key
    pair; both counts partial-aggregable."""
    ev = spark.table("events")
    parent = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    pred = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).cast("bigint").alias("dst"),
    )
    d = (
        parent.union(pred)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rev = d.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n = d.agg(F.count("*").cast("bigint").alias("n_directed"))
    m = (
        d.join(rev, ["src", "dst"])
        .agg(F.count("*").cast("bigint").alias("n_reciprocal"))
    )
    return n.crossJoin(m).withColumn(
        "reciprocity",
        F.round(F.col("n_reciprocal") * 1.0 / F.col("n_directed"), 6),
    )


# --- core-number decomposition (full coreness, not just fixed-k) ------------
# Shared round cap: the operator runs exactly this many H-index rounds and
# the oracle unrolls the same count — equality by construction even before
# convergence (msf_boruvka argument); tests/test_graph.py pins convergence
# to the true peeling core numbers at test scale. 20 rounds cover the
# events graph comfortably (peeling depth tracks tree depth ~ log2 V).
CORE_UNROLL_ROUNDS = 20


def _core_numbers_unrolled_sql(n_rounds: int = CORE_UNROLL_ROUNDS) -> str:
    """DuckDB twin of operators/graph.core_numbers on the events user
    graph, H-index rounds unrolled: per round one estimates join and one
    per-vertex max(least(rank, neighbor_value)) window — all integers, so
    cross-engine equality is exact."""
    parts = ["""
    WITH base AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM (
        SELECT user_id AS src, user_id // 2 AS dst
        FROM events WHERE user_id >= 1
        UNION ALL
        SELECT user_id AS src, user_id - 1 AS dst
        FROM events WHERE user_id >= 2
      ) WHERE src <> dst
    ),
    adj AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM base
      UNION ALL
      SELECT b AS src, a AS dst FROM base
    ),
    est0 AS MATERIALIZED (
      SELECT src AS id, count(*) AS core FROM adj GROUP BY src
    )"""]
    for r in range(n_rounds):
        parts.append(f""",
    est{r + 1} AS MATERIALIZED (
      SELECT src AS id, max(least(rn, nv)) AS core FROM (
        SELECT a.src, e.core AS nv,
               row_number() OVER (
                 PARTITION BY a.src ORDER BY e.core DESC, a.dst) AS rn
        FROM adj a JOIN est{r} e ON a.dst = e.id
      ) GROUP BY src
    )""")
    parts.append(f"""
    SELECT CAST(core AS BIGINT) AS core,
           CAST(count(*) AS BIGINT) AS n_vertices,
           CAST(sum(id) AS BIGINT) AS sum_id
    FROM est{n_rounds}
    GROUP BY core ORDER BY core""")
    return "".join(parts)


@query(
    "graph_core_numbers",
    sql=_core_numbers_unrolled_sql(),
    survey_ops="K(ext),C1,E,D2",
    tables=("events",),
)
def graph_core_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full core-number (coreness) decomposition of the events user graph
    by H-index iteration — generalizes graph_kcore's fixed-k membership to
    the whole k-core hierarchy in one pass, the standard graph-summary
    statistic for density stratification. Result is the coreness
    histogram with a per-core id checksum (sum_id pins the exact vertex
    assignment at any scale without shipping |V| rows through the gate).
    See operators/graph.core_numbers for the per-round shuffle budget and
    CORE_UNROLL_ROUNDS for the shared-cap oracle argument."""
    from esco_neo4j_spark.operators.graph import core_numbers

    ev = spark.table("events")
    tree = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    sib = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).alias("dst"),
    )
    edges = tree.union(sib).distinct()
    cores = core_numbers(edges, n_rounds=CORE_UNROLL_ROUNDS)
    return (
        cores.groupBy("core")
        .agg(
            F.count("*").cast("long").alias("n_vertices"),
            F.sum("id").cast("long").alias("sum_id"),
        )
        .select(F.col("core").cast("long").alias("core"),
                "n_vertices", "sum_id")
        .orderBy("core")
    )


# --- HyperBall neighborhood function ----------------------------------------
HB_UNROLL_ROUNDS = 8


def _hyperball_unrolled_sql(n_rounds: int = HB_UNROLL_ROUNDS) -> str:
    """DuckDB twin of operators/graph.hyperball_nf on the events user
    graph: per unrolled round a register-table max-merge (the HLL merge
    property relationally) and the per-vertex floored harmonic estimate.
    Registers use the md5 hash family (sketch.hll_registers_md5): bucket
    = first md5 nibble, rho = 1 + trailing zeros of the next 48 bits —
    psum terms 2^(48-rho) are dyadic so the <= 16-term double sum is
    exact and order-free; linear-counting constants sit far from floor
    boundaries (the events_hll_distinct_rollup precedent)."""
    parts = ["""
    WITH base AS MATERIALIZED (
      SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM (
        SELECT user_id AS src, user_id // 2 AS dst
        FROM events WHERE user_id >= 1
        UNION ALL
        SELECT user_id AS src, user_id - 1 AS dst
        FROM events WHERE user_id >= 2
      ) WHERE src <> dst
    ),
    adj AS MATERIALIZED (
      SELECT a AS src, b AS dst FROM base
      UNION ALL
      SELECT b AS src, a AS dst FROM base
    ),
    verts AS (SELECT DISTINCT src AS id FROM adj),
    h0 AS (
      SELECT id,
             ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 1))::BIGINT
               AS bucket,
             ('0x' || substr(md5(CAST(id AS VARCHAR)), 2, 12))::BIGINT AS w
      FROM verts
    ),
    sk0 AS MATERIALIZED (
      SELECT id, CAST(bucket AS INT) AS bucket,
             CASE WHEN w = 0 THEN 49
                  ELSE CAST(log2(w & -w) AS INT) + 1
             END AS rho
      FROM h0
    )"""]
    for t in range(1, n_rounds + 1):
        parts.append(f""",
    sk{t} AS MATERIALIZED (
      SELECT id, bucket, max(rho) AS rho FROM (
        SELECT id, bucket, rho FROM sk{t - 1}
        UNION ALL
        SELECT a.dst AS id, s.bucket, s.rho
        FROM adj a JOIN sk{t - 1} s ON a.src = s.id
      ) GROUP BY id, bucket
    ),
    est{t} AS (
      SELECT id,
             CAST(floor(CASE WHEN raw <= 40 AND v > 0
                             THEN 16 * ln(16.0 / v) ELSE raw END)
                  AS BIGINT) AS approx
      FROM (
        SELECT id, 16 - count(*) AS v,
               0.673 * 16 * 16 * CAST(281474976710656 AS DOUBLE)
                 / (sum(pow(2, 48 - rho))
                    + (16 - count(*)) * CAST(281474976710656 AS DOUBLE))
                 AS raw
        FROM sk{t} GROUP BY id
      )
    )""")
    rows = "\n      UNION ALL\n      ".join(
        f"""SELECT CAST({t} AS INTEGER) AS t,
             CAST(sum(approx) AS BIGINT) AS nf_sum,
             CAST(round(sum(approx) / CAST(count(*) AS DOUBLE), 6)
                  AS DOUBLE) AS avg_ball
      FROM est{t}"""
        for t in range(1, n_rounds + 1)
    )
    parts.append(f"""
    SELECT * FROM (
      {rows}
    ) ORDER BY t""")
    return "".join(parts)


@query(
    "graph_hyperball_nf",
    sql=_hyperball_unrolled_sql(),
    survey_ops="K(ext),sketch(ext),C1,D2",
    tables=("events",),
)
def graph_hyperball_nf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall neighborhood function of the events user graph: N(t) =
    estimated reachable pairs within t hops, t = 1..8, plus the average
    ball size — the distance-distribution / effective-diameter summary at
    sketch cost (16 registers per vertex, merge = groupBy-max) instead of
    all-pairs BFS. Composes the two scale primitives this engine already
    proves independently: mergeable HLL sketches (events_hll_distinct_
    rollup) and fixed-round graph iteration (CORE/MSF shared-cap oracle
    argument). Fully value-oracled — registers, merges, and floored
    estimates replay bit-exactly in the unrolled SQL."""
    from esco_neo4j_spark.operators.graph import hyperball_nf

    ev = spark.table("events")
    tree = ev.filter(F.col("user_id") >= 1).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") / 2).cast("bigint").alias("dst"),
    )
    sib = ev.filter(F.col("user_id") >= 2).select(
        F.col("user_id").alias("src"),
        (F.col("user_id") - 1).alias("dst"),
    )
    edges = tree.union(sib).distinct()
    return hyperball_nf(edges, n_rounds=HB_UNROLL_ROUNDS)
