"""Golden checks for the iterative graph operators the DuckDB oracle
can't express (pagerank, LPA, betweenness — the driver records rows-only
checks for their registry entries).

pagerank is verified against an independent pure-Python implementation of
the same fixed-iteration semantics; LPA and betweenness against hand-
computed goldens on small graphs with known answers.
"""

from __future__ import annotations

import pytest

from esco_neo4j_spark.operators.graph import (
    betweenness_centrality,
    connected_components,
    label_propagation,
    louvain_communities,
    modularity,
    modularity_refine,
    pagerank,
    shortest_path,
    transitive_closure,
)

# two triangles 1-2-3 and 4-5-6 joined by the bridge 3-4
BRIDGE_GRAPH = [
    ("1", "2"), ("2", "3"), ("3", "1"),
    ("4", "5"), ("5", "6"), ("6", "4"),
    ("3", "4"),
]


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def _py_pagerank(pairs, num_iter=10, damping=0.85):
    """Independent reimplementation: rank = (1-d) + d * sum(rank/outdeg)."""
    verts = sorted({v for e in pairs for v in e})
    out = {}
    for s, _ in pairs:
        out[s] = out.get(s, 0) + 1
    rank = {v: 1.0 for v in verts}
    for _ in range(num_iter):
        msg = {v: 0.0 for v in verts}
        for s, d in pairs:
            msg[d] += rank[s] / out[s]
        rank = {v: (1 - damping) + damping * msg[v] for v in verts}
    return rank


def test_pagerank_matches_pure_python(spark):
    pairs = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("c", "d"),
    ]
    got = {
        r["id"]: round(r["rank"], 9)
        for r in pagerank(_edges(spark, pairs), num_iter=10).collect()
    }
    want = {k: round(v, 9) for k, v in _py_pagerank(pairs).items()}
    assert got == want


def test_lpa_two_triangles(spark):
    # two disjoint triangles converge to the min id of each triangle
    pairs = [("1", "2"), ("2", "3"), ("3", "1"), ("4", "5"), ("5", "6"), ("6", "4")]
    got = {
        r["id"]: r["community"]
        for r in label_propagation(_edges(spark, pairs), max_iter=10).collect()
    }
    assert got == {"1": "1", "2": "1", "3": "1", "4": "4", "5": "4", "6": "4"}


def test_betweenness_path_graph(spark):
    # path 1-2-3-4 (undirected): inner vertices lie on 2 shortest paths
    pairs = [("1", "2"), ("2", "3"), ("3", "4")]
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(
            _edges(spark, pairs), directed=False
        ).collect()
    }
    assert got == {"1": 0.0, "2": 2.0, "3": 2.0, "4": 0.0}


def test_betweenness_star_graph(spark):
    # star with center c and 3 leaves: all C(3,2)=3 leaf pairs cross c
    pairs = [("c", "l1"), ("c", "l2"), ("c", "l3")]
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(
            _edges(spark, pairs), directed=False
        ).collect()
    }
    assert got["c"] == 3.0
    assert all(got[f"l{i}"] == 0.0 for i in (1, 2, 3))


def test_modularity_refine_recovers_optimal_partition(spark):
    # start from a deliberately wrong split of the bridge graph (one
    # vertex of each triangle swapped): refinement must climb to the
    # optimal two-triangle partition, Q = 0.357...
    e = _edges(spark, BRIDGE_GRAPH)
    bad = spark.createDataFrame(
        [("1", "a"), ("2", "a"), ("4", "a"), ("3", "b"), ("5", "b"), ("6", "b")],
        "id string, community string",
    )
    q_bad = modularity(e, bad)
    refined = modularity_refine(e, bad, refine_iter=6)
    q_ref = modularity(e, refined)
    assert q_ref > q_bad
    got = {r["id"]: r["community"] for r in refined.collect()}
    assert got["1"] == got["2"] == got["3"]
    assert got["4"] == got["5"] == got["6"]
    assert got["1"] != got["4"]
    assert abs(q_ref - 5.0 / 14.0) < 1e-9  # optimal Q on this graph


def test_louvain_never_below_lpa_modularity(spark):
    e = _edges(spark, BRIDGE_GRAPH)
    q_lpa = modularity(e, label_propagation(e, max_iter=10))
    q_louvain = modularity(e, louvain_communities(e, max_iter=10))
    assert q_louvain >= q_lpa
    assert abs(q_louvain - 5.0 / 14.0) < 1e-9


def test_betweenness_sampled_preserves_golden_ranking(spark):
    # Brandes-Pich sampling (the registered query's scale path) must rank
    # the goldens like the exact algorithm: star center strictly dominates
    # with zero-score leaves, and the path graph's middle vertex is argmax.
    star = [("c", f"l{i}") for i in range(1, 6)]
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(
            _edges(spark, star), directed=False, sample_k=2
        ).collect()
    }
    assert got["c"] > 0.0
    assert all(got[f"l{i}"] == 0.0 for i in range(1, 6))
    assert got["c"] == max(got.values())

    path = [(str(i), str(i + 1)) for i in range(1, 7)]  # path 1-2-...-7
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_centrality(
            _edges(spark, path), directed=False, sample_k=3
        ).collect()
    }
    assert max(got, key=got.get) == "4"  # middle vertex still argmax
    assert got["1"] == 0.0 and got["7"] == 0.0  # endpoints never inner


def test_betweenness_sampled_oracle_parity(spark):
    """The registered query's SAMPLED regime (r5: value-oracled, formerly
    golden-only) must match the tree closed-form oracle hash-exact at
    sf0.1, where the events graph has 1500 vertices > the 256-vertex
    exact cutoff — the one regime the driver window (sf0.01, 150
    vertices, exact) never exercises. Every score is an integer multiple
    of N/128 (exact in binary floating point), so equality is exact, not
    approximate."""
    import duckdb

    from esco_neo4j_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.1"
    q = REGISTRY["graph_betweenness"]
    srows = [(r["id"], r["betweenness"]) for r in q.fn(spark, sf).collect()]
    con = duckdb.connect()
    try:
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
        drows = [tuple(r) for r in con.execute(q.sql).fetchall()]
    finally:
        con.close()
    assert len(srows) == 20
    assert srows == drows
    # sampled scaling really engaged: exact-regime scores on 1500 vertices
    # would be bounded by pairs ~ N^2/2; pivot scaling keeps the SAME
    # magnitude, but a score must be a multiple of N/128 > 10, which the
    # exact regime (multiples of 0.5) would almost surely violate
    assert all(b % (1500 / 128.0) == 0.0 for _, b in srows)


def test_shortest_path_returns_node_sequence(spark):
    # diamond a-b-d / a-c-d plus tail d-e: two shortest a->e paths exist;
    # the min-predecessor tiebreak must pick the lexicographically smaller
    # branch (through b), deterministically.
    pairs = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    row = shortest_path(_edges(spark, pairs), "a", "e", directed=False).first()
    assert row["distance"] == 3
    assert row["path"] == ["a", "b", "d", "e"]


def test_shortest_path_source_equals_target(spark):
    pairs = [("a", "b")]
    row = shortest_path(_edges(spark, pairs), "a", "a").first()
    assert row["distance"] == 0 and row["path"] == ["a"]


def test_shortest_path_unreachable_is_empty(spark):
    # directed edge b->a only: a cannot reach b when directed
    pairs = [("b", "a")]
    out = shortest_path(_edges(spark, pairs), "a", "b", directed=True)
    assert out.count() == 0


def test_transitive_closure_undirected_dense_graph_terminates(spark):
    # Complete graph K8, undirected, max_depth=20: the recursive-CTE walk
    # enumeration would generate ~7^20 intermediate rows (every walk
    # oscillates), so this input MUST take the frontier-BFS path, which
    # dedups per round and finishes instantly. All 8*7 ordered pairs are
    # at distance 1.
    nodes = [str(i) for i in range(8)]
    pairs = [(a, b) for a in nodes for b in nodes if a < b]
    got = {
        (r["src"], r["dst"]): r["depth"]
        for r in transitive_closure(
            _edges(spark, pairs), max_depth=20, directed=False
        ).collect()
    }
    # 56 ordered distinct pairs at depth 1 + 8 self-pairs (a-b-a) at depth 2
    assert len(got) == 8 * 8
    for (s, d), depth in got.items():
        assert depth == (2 if s == d else 1)


def test_transitive_closure_directed_cycle(spark):
    # directed 3-cycle: closure must terminate and report min depths
    pairs = [("a", "b"), ("b", "c"), ("c", "a")]
    got = {
        (r["src"], r["dst"]): r["depth"]
        for r in transitive_closure(_edges(spark, pairs), max_depth=10).collect()
    }
    assert got[("a", "b")] == 1 and got[("a", "c")] == 2 and got[("a", "a")] == 3


def test_connected_components_two_islands(spark):
    pairs = [("1", "2"), ("2", "3"), ("7", "8")]
    got = {
        r["id"]: r["component"]
        for r in connected_components(_edges(spark, pairs)).collect()
    }
    assert got == {"1": "1", "2": "1", "3": "1", "7": "7", "8": "7"}


def test_triangle_count_goldens(spark):
    """Degree-oriented triangle count on graphs with known answers: two
    triangles sharing an edge, a triangle-free square, K4 (4 triangles),
    and invariance to duplicate/reversed/self-loop input edges."""
    from esco_neo4j_spark.operators.graph import triangle_count

    def n(edges):
        df = spark.createDataFrame(edges, "src long, dst long")
        return triangle_count(df).collect()[0]["n_triangles"]

    assert n([(1, 2), (2, 3), (1, 3), (2, 4), (3, 4)]) == 2
    assert n([(1, 2), (2, 3), (3, 4), (4, 1)]) == 0
    assert n([(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]) == 4
    # duplicates, reversals, self-loops must not change the count
    assert n([(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (1, 1), (1, 2)]) == 1


def test_k_core_goldens(spark):
    """Iterative peeling against hand-computed cores: pendant vertices
    peel out of the 2-core, cascades propagate (peeling one vertex can
    drop another below k), K4 is its own 3-core, and a path has no
    2-core."""
    from esco_neo4j_spark.operators.graph import k_core

    def run(edges, k):
        df = spark.createDataFrame(edges, "src long, dst long")
        return sorted((r["id"], r["core_degree"]) for r in k_core(df, k).collect())

    shared = [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4), (1, 5)]
    assert run(shared, 2) == [(1, 2), (2, 3), (3, 3), (4, 2)]
    assert run(shared, 3) == []
    # cascade: 5-4-... chain hanging off a triangle peels one by one
    cascade = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert run(cascade, 2) == [(1, 2), (2, 2), (3, 2)]
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    assert run(k4, 3) == [(1, 3), (2, 3), (3, 3), (4, 3)]
    assert run([(1, 2), (2, 3), (3, 4)], 2) == []


def test_sssp_weighted_prefers_cheap_detour(spark):
    """Classic Dijkstra shape: the direct edge (cost 10) loses to the
    2-hop detour (3 + 4); unreachable vertices are absent."""
    from esco_neo4j_spark.operators.graph import sssp_weighted

    e = spark.createDataFrame(
        [("a", "b", 10.0), ("a", "c", 3.0), ("c", "b", 4.0),
         ("b", "d", 2.0), ("x", "y", 1.0)],
        "src string, dst string, weight double",
    )
    got = {r["id"]: r["dist"] for r in sssp_weighted(e, "a").collect()}
    assert got == {"a": 0.0, "b": 7.0, "c": 3.0, "d": 9.0}


def test_sssp_weighted_undirected_and_zero_weights(spark):
    from esco_neo4j_spark.operators.graph import sssp_weighted

    e = spark.createDataFrame(
        [("a", "b", 10.0), ("a", "c", 3.0), ("c", "b", 4.0),
         ("b", "d", 2.0)],
        "src string, dst string, weight double",
    )
    # undirected: reach the source's ancestors too
    got = {r["id"]: r["dist"]
           for r in sssp_weighted(e, "d", directed=False).collect()}
    assert got == {"d": 0.0, "b": 2.0, "c": 6.0, "a": 9.0}

    z = spark.createDataFrame(
        [("a", "b", 0.0), ("b", "c", 0.0)],
        "src string, dst string, weight double",
    )
    gotz = {r["id"]: r["dist"] for r in sssp_weighted(z, "a").collect()}
    assert gotz == {"a": 0.0, "b": 0.0, "c": 0.0}


def test_topo_layers_diamond_and_cycle(spark):
    from esco_neo4j_spark.operators.graph import topo_layers

    e = _edges(spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
                       ("d", "e")])
    got = {r["id"]: r["layer"] for r in topo_layers(e).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}

    cyc = _edges(spark, [("x", "y"), ("y", "x"), ("z", "x")])
    with pytest.raises(ValueError, match="cycle"):
        topo_layers(cyc)


def test_scc_cycles_bridge_and_dag(spark):
    from esco_neo4j_spark.operators.graph import (
        strongly_connected_components as scc,
    )

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4), (3, 4), (6, 7)],
        "src bigint, dst bigint",
    )
    got = {r["id"]: r["scc"] for r in scc(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4, 7: 7}

    dag = spark.createDataFrame([(1, 2), (2, 3), (1, 3)], "src bigint, dst bigint")
    gd = {r["id"]: r["scc"] for r in scc(dag).collect()}
    assert gd == {1: 1, 2: 2, 3: 3}

    ring = spark.createDataFrame(
        [(10, 11), (11, 12), (12, 13), (13, 10), (11, 10)],
        "src bigint, dst bigint",
    )
    gr = {r["id"]: r["scc"] for r in scc(ring).collect()}
    assert gr == {10: 10, 11: 10, 12: 10, 13: 10}


def test_scc_refuses_unconverged_propagation(spark):
    """A path deeper than max_iter must raise rather than settle vertices
    on stale colors (which would be silently wrong components)."""
    from esco_neo4j_spark.operators.graph import (
        strongly_connected_components as scc,
    )

    deep = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "src bigint, dst bigint"
    )
    with pytest.raises(ValueError, match="did not converge"):
        scc(deep, max_iter=3)


def test_sssp_refuses_unconverged_relaxation(spark):
    from esco_neo4j_spark.operators.graph import sssp_weighted

    chain = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(8)],
        "src bigint, dst bigint, weight double",
    )
    with pytest.raises(ValueError, match="did not converge"):
        sssp_weighted(chain, 0, max_iter=3)


def test_kcore_refuses_truncated_peeling(spark):
    """A chain peels one endpoint pair per round; with max_iter below the
    peeling depth the operator must raise rather than return a
    partially-peeled 'core'."""
    from esco_neo4j_spark.operators.graph import k_core

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "src bigint, dst bigint"
    )
    with pytest.raises(ValueError, match="fixpoint"):
        k_core(chain, k=2, max_iter=3)


def test_luby_mis_independent_and_maximal(spark):
    """MIS property check on the bridge graph + an isolated star: no two
    MIS members are adjacent (independence) and every non-member has a
    MIS neighbor (maximality)."""
    from esco_neo4j_spark.operators.graph import luby_mis, undirected

    edges = spark.createDataFrame(
        [(int(a), int(b)) for a, b in BRIDGE_GRAPH]
        + [(10, i) for i in range(11, 15)],
        "src bigint, dst bigint",
    )
    mis = {r.id for r in luby_mis(edges, rounds=8).collect()}
    adj = {
        (r.src, r.dst)
        for r in undirected(edges).filter("src <> dst").distinct().collect()
    }
    verts = {v for e in adj for v in e}
    assert all((a, b) not in adj for a in mis for b in mis if a != b)
    assert all(
        v in mis or any((v, m) in adj for m in mis) for v in verts
    )


def _kruskal(edges):
    """Independent plain-Python Kruskal for the MSF golden (union-find)."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, a, b in sorted((w, a, b) for a, b, w in edges):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.append((min(a, b), max(a, b), w))
    return sorted(out)


def test_msf_boruvka_matches_kruskal(spark):
    """Exact MSF edge set vs plain-Python Kruskal on a weighted graph
    with cycles, parallel-ish weights, and two disconnected components."""
    from esco_neo4j_spark.operators.graph import msf_boruvka

    raw = [
        (1, 2, 4.0), (2, 3, 1.0), (3, 1, 3.0),   # triangle
        (3, 4, 7.0), (4, 5, 2.0), (5, 6, 5.0),   # path + ...
        (6, 4, 6.0),                             # ... cycle
        (10, 11, 9.0), (11, 12, 8.0), (12, 10, 10.0),  # separate triangle
    ]
    edges = spark.createDataFrame(raw, "src bigint, dst bigint, weight double")
    got = sorted(
        (r.a, r.b, r.weight) for r in msf_boruvka(edges).collect()
    )
    assert got == _kruskal(raw)
    # forest invariant: |edges| = |V| - #components  (8 vertices... 9 verts, 2 comps)
    assert len(got) == 9 - 2


def test_msf_boruvka_tree_input_returns_all_edges(spark):
    """A tree is already its own MSF."""
    from esco_neo4j_spark.operators.graph import msf_boruvka

    raw = [(i, i + 1, float(10 - i)) for i in range(6)]
    edges = spark.createDataFrame(raw, "src bigint, dst bigint, weight double")
    got = sorted((r.a, r.b, r.weight) for r in msf_boruvka(edges).collect())
    assert got == sorted(raw)


def test_priority_coloring_is_proper_and_complete(spark):
    """Every edge bi-chromatic; on a small dense-ish graph 16 rounds
    color every vertex; each color class is an independent set."""
    from esco_neo4j_spark.operators.graph import priority_coloring

    raw = [
        (1, 2), (2, 3), (3, 4), (4, 1),      # 4-cycle
        (1, 3),                              # chord -> triangle
        (4, 5), (5, 6), (6, 7), (7, 5),      # tail + triangle
        (8, 9),                              # separate edge
    ]
    edges = spark.createDataFrame(raw, "src bigint, dst bigint")
    colors = {r.id: r.color for r in priority_coloring(edges).collect()}
    verts = {v for e in raw for v in e}
    assert set(colors) == verts, "all vertices colored within the schedule"
    for s, d in raw:
        assert colors[s] != colors[d], f"edge ({s},{d}) monochromatic"


def test_densest_subgraph_finds_planted_clique(spark):
    """A K5 planted in a sparse path: the densest iterate must be the
    clique (density 2.0) and never the whole graph (density ~1.1)."""
    from esco_neo4j_spark.operators.graph import densest_subgraph

    clique = [
        (str(a), str(b)) for a in range(5) for b in range(5) if a < b
    ]
    path = [(str(i), str(i + 1)) for i in range(10, 30)]
    bridge = [("4", "10")]
    edges = spark.createDataFrame(
        clique + path + bridge, "src string, dst string"
    )
    out = densest_subgraph(edges).collect()
    members = sorted(r.id for r in out)
    assert members == ["0", "1", "2", "3", "4"]
    assert out[0].density == 2.0 and out[0].n_edges == 10


def test_landmark_estimate_upper_bounds_exact(spark):
    """Triangle inequality: the landmark estimate can never undershoot the
    true distance, and stretch >= 1 wherever an estimate exists."""
    from esco_neo4j_spark.plans import REGISTRY

    rows = REGISTRY["graph_landmark_distance"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        if r["est_dist"] is not None:
            assert r["est_dist"] >= r["exact_dist"]
            assert r["stretch"] >= 1.0


def test_ktruss_planted_clique(spark):
    """K4 + pendant edges: 4-truss recovers exactly the K4 (each edge in 2
    triangles); 3-truss additionally keeps a planted triangle."""
    from esco_neo4j_spark.operators.graph import k_truss

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tri = [(10, 11), (11, 12), (10, 12)]
    pendants = [(4, 9), (9, 20), (12, 21)]
    edges = spark.createDataFrame(k4 + tri + pendants, ["src", "dst"])
    t4 = {(r["a"], r["b"]): r["support"] for r in k_truss(edges, k=4).collect()}
    assert set(t4) == set(k4)
    assert all(s == 2 for s in t4.values())
    t3 = {(r["a"], r["b"]) for r in k_truss(edges, k=3).collect()}
    assert t3 == set(k4) | set(tri)


def test_motif_api_parsing_and_binding(spark):
    """match_motif on a literal graph: positive terms, rel-type filters,
    negation, and the error paths."""
    import pytest as _pytest

    from esco_neo4j_spark.operators.motif import match_motif

    edges = spark.createDataFrame(
        [(1, 2, "knows"), (2, 3, "knows"), (1, 3, "knows"), (3, 4, "likes")],
        ["src", "dst", "rel_type"],
    )
    ffl = match_motif(edges, "a->b; b->c; a->c").collect()
    assert [tuple(r) for r in ffl] == [(1, 2, 3)]
    open_triads = {
        tuple(r) for r in match_motif(edges, "a->b; b->c; !a->c").collect()
    }
    assert (2, 3, 4) in open_triads and (1, 2, 3) not in open_triads
    typed = match_motif(edges, "a-[likes]->b").collect()
    assert [tuple(r) for r in typed] == [(3, 4)]
    with _pytest.raises(ValueError, match="bad motif term"):
        match_motif(edges, "a=>b")
    with _pytest.raises(ValueError, match="disconnected"):
        match_motif(edges, "a->b; c->d")
    with _pytest.raises(ValueError, match="unbound"):
        match_motif(edges, "a->b; !a->z")


def test_ktruss_k2_keeps_triangle_free_edges(spark):
    """ADVICE r2 regression: for k <= 2 every edge satisfies
    support >= k-2 = 0, so a triangle-free path graph must survive intact
    (the old INNER peeling join dropped edges with no support row)."""
    from esco_neo4j_spark.operators.graph import k_truss

    path_edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    edges = spark.createDataFrame(path_edges, ["src", "dst"])
    t2 = {(r["a"], r["b"]): r["support"] for r in k_truss(edges, k=2).collect()}
    assert set(t2) == set(path_edges)
    assert all(s == 0 for s in t2.values())


def test_iterative_ops_restore_shuffle_partitions(spark):
    """ADVICE r2 regression: transitive_closure and msf_boruvka size
    spark.sql.shuffle.partitions to the input but must RESTORE the
    session value afterwards — and two closures on one session must both
    be correct under the scoping."""
    from esco_neo4j_spark.operators.graph import msf_boruvka, transitive_closure

    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "17")
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(6)], ["src", "dst"]
        )
        c1 = transitive_closure(chain, max_depth=8, strategy="doubling")
        assert spark.conf.get(key) == "17"
        c2 = transitive_closure(chain, max_depth=8, strategy="cte")
        assert spark.conf.get(key) == "17"
        r1 = sorted((r["src"], r["dst"], r["depth"]) for r in c1.collect())
        r2 = sorted((r["src"], r["dst"], r["depth"]) for r in c2.collect())
        assert r1 == r2 and len(r1) == 6 * 7 // 2
        wedges = spark.createDataFrame(
            [(1, 2, 1.0), (2, 3, 2.0), (1, 3, 5.0)], ["src", "dst", "weight"]
        )
        msf = msf_boruvka(wedges).collect()
        assert spark.conf.get(key) == "17"
        assert sorted((r["a"], r["b"]) for r in msf) == [(1, 2), (2, 3)]
    finally:
        spark.conf.set(key, prev)


def test_round6_half_away_from_zero():
    """Driver-side round6 matches SQL round(): half AWAY from zero on
    both signs, where Python's builtin round is half-even."""
    from esco_neo4j_spark.functions.numeric import round6

    assert round6(0.0000005) == 0.000001
    assert round6(-0.0000005) == -0.000001
    assert round6(1.2345675) == 1.234568
    assert round6(2.5e-7) == 0.0


def _peel_core_numbers(edge_list):
    """Independent plain-Python core decomposition by textbook peeling
    (Batagelj-Zaversnik shape): repeatedly remove the minimum-degree
    vertex, its core number = max(k seen so far, its degree at removal)."""
    from collections import defaultdict

    adj = defaultdict(set)
    for a, b in edge_list:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core = {}
    k = 0
    remaining = set(adj)
    while remaining:
        v = min(remaining, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        remaining.remove(v)
        for u in adj[v]:
            if u in remaining:
                deg[u] -= 1
    return core


def test_core_numbers_match_peeling_golden(spark):
    """H-index iteration converges to the true peeling core numbers —
    pinned on a planted K4 + tail chain (K4 vertices coreness 3, chain
    coreness 1) and on the sf0.001 events user graph."""
    from esco_neo4j_spark.operators.graph import core_numbers

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    tail = [(4, 5), (5, 6), (6, 7)]
    df = spark.createDataFrame(k4 + tail, ["src", "dst"])
    got = {r["id"]: r["core"] for r in core_numbers(df, n_rounds=10).collect()}
    assert got == _peel_core_numbers(k4 + tail)
    assert got[1] == 3 and got[7] == 1

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    users = [r[0] for r in ev.select("user_id").distinct().collect()]
    edges = [(u, u // 2) for u in users if u >= 1] + [
        (u, u - 1) for u in users if u >= 2
    ]
    edf = spark.createDataFrame(sorted(set(edges)), ["src", "dst"])
    got = {
        r["id"]: r["core"]
        for r in core_numbers(edf, n_rounds=20).collect()
    }
    assert got == _peel_core_numbers(edges)


def test_hyperball_tracks_exact_neighborhood_function(spark):
    """On the sf0.001 events graph, HyperBall's N(t) must (1) be monotone
    non-decreasing in t, and (2) track the EXACT neighborhood function
    (plain-Python BFS) within the m=16 HLL error regime (~26% RSE per
    vertex; the sum concentrates much tighter)."""
    from collections import deque

    from esco_neo4j_spark.operators.graph import hyperball_nf

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    users = sorted({r[0] for r in ev.select("user_id").distinct().collect()})
    edges = {(u, u // 2) for u in users if u >= 1} | {
        (u, u - 1) for u in users if u >= 2
    }
    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)

    def exact_nf(t_max):
        nf = dict.fromkeys(range(1, t_max + 1), 0)
        for s in adj:
            seen = {s}
            frontier = deque([s])
            for t in range(1, t_max + 1):
                nxt = deque()
                for v in frontier:
                    for u in adj[v]:
                        if u not in seen:
                            seen.add(u)
                            nxt.append(u)
                nf[t] += len(seen)
                frontier = nxt
        return nf

    df = spark.createDataFrame(sorted(edges), ["src", "dst"])
    got = {r["t"]: r["nf_sum"] for r in hyperball_nf(df, n_rounds=4).collect()}
    exact = exact_nf(4)
    prev = 0
    for t in range(1, 5):
        assert got[t] >= prev
        prev = got[t]
        assert abs(got[t] - exact[t]) / exact[t] < 0.35


def test_temporal_reachability_matches_exact_earliest_arrival(spark):
    """The fixed-round relaxation must equal an independent plain-Python
    earliest-arrival computation (Dijkstra over time-respecting contacts)
    on the sf0.001 events graph — proving TEMPORAL_UNROLL_ROUNDS covers
    the true temporal diameter at test scale, not just oracle symmetry."""
    import heapq

    from esco_neo4j_spark.plans import REGISTRY
    from esco_neo4j_spark.plans.event_queries import TEMPORAL_UNROLL_ROUNDS

    assert TEMPORAL_UNROLL_ROUNDS >= 8
    rows = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "ts").collect()
    )
    contacts = []
    for r in rows:
        us = int(r["ts"].timestamp() * 1_000_000)
        u = r["user_id"]
        if u >= 1 and u != u // 2:
            contacts.append((u, u // 2, us))
            contacts.append((u // 2, u, us))
        if u >= 2:
            contacts.append((u, u - 1, us))
            contacts.append((u - 1, u, us))
    out = {1: 0}
    heap = [(0, 1)]
    by_src = {}
    for s, d, t in contacts:
        by_src.setdefault(s, []).append((d, t))
    while heap:
        a, v = heapq.heappop(heap)
        if a > out.get(v, 1 << 62):
            continue
        for d, t in by_src.get(v, ()):
            if t >= a and t < out.get(d, 1 << 62):
                out[d] = t
                heapq.heappush(heap, (t, d))
    exact = {}
    for v, a in out.items():
        exact.setdefault(a // 86400000000, [0, 0])
        exact[a // 86400000000][0] += 1
        exact[a // 86400000000][1] += v
    got = {
        r["day_idx"]: [r["n_users"], r["sum_id"]]
        for r in REGISTRY["events_temporal_reachability"]
        .fn(spark, "/root/testdata/sf0.001").collect()
    }
    assert got == exact
