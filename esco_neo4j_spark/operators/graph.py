"""DataFrame-native graph operators (SURVEY.md §2 category K).

The reference runs these inside Neo4j/GDS:
- K1 variable-length traversal  MATCH (i)-[:BROADER_THAN*]->(j)
  (reference: analysis_queries.md:84-91,104-111)
- K2 unweighted shortestPath    (reference: analysis_queries.md:136-141)
- K4 betweenness centrality     gds.betweenness.stream (analysis_queries.md:217-231)
- K5 Louvain community          gds.louvain.stream (analysis_queries.md:233-246)
  -> shipped here as label propagation (LPA), the scalable equivalent; the
  deviation is documented in SURVEY.md §7.

Design: GraphX is not reachable from PySpark, so every algorithm is built on
one primitive — ``aggregate_messages`` (edge-join + groupBy, i.e. the Pregel
superstep) — plus an iteration loop that ``localCheckpoint``s each round to
cut lineage growth (SURVEY.md §7 "What's hard" #3).

Scale notes (100 TB):
- Edges are hash-partitioned on the join key per superstep; AQE handles skew.
- Frontier-based BFS keeps per-round state proportional to the frontier, not
  the graph.
- Betweenness is exact batched-Brandes for small/medium vertex counts and
  supports source sampling (``sample_k``) for large graphs — the standard
  approximation (Brandes & Pich 2007).

Edge DataFrame convention: columns ``src``, ``dst`` (+ optional props).
Vertex DataFrame convention: column ``id``.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def undirected(edges: DataFrame) -> DataFrame:
    """Edge view matching Cypher's undirected ``-[r]-`` (reference:
    src/semantic_search.py:119): union of edges with their reversals."""
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def vertices_of(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def degrees(edges: DataFrame, directed: bool = False) -> DataFrame:
    """Per-vertex degree (out+in if undirected view requested)."""
    e = edges.select("src", "dst") if directed else undirected(edges)
    return e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("degree"))


def aggregate_messages(
    edges: DataFrame,
    vertex_state: DataFrame,
    to_dst: bool = True,
    msg_cols: list[str] | None = None,
) -> DataFrame:
    """One Pregel superstep's message send: join vertex state onto edges and
    route state columns to the opposite endpoint.

    Returns a DataFrame with ``id`` (the receiving vertex) plus the sending
    vertex's state columns. Caller applies the groupBy/agg (merge) step.
    """
    state_cols = msg_cols or [c for c in vertex_state.columns if c != "id"]
    join_on = "src" if to_dst else "dst"
    recv = "dst" if to_dst else "src"
    return (
        edges.join(vertex_state, edges[join_on] == vertex_state["id"], "inner")
        .select(F.col(recv).alias("id"), *state_cols)
    )


def _checkpoint(df: DataFrame) -> DataFrame:
    """Cut lineage between supersteps; eager so each round materializes once.

    Also cuts STATS lineage: Spark 4's localCheckpoint propagates the
    origin plan's statistics into the resulting LogicalRDD. Join size
    estimates MULTIPLY child sizes, so in an iterative join loop the
    sizeInBytes BigInt compounds ~3x digits per round (three-way join:
    round r carries ~19*3^r digits); by round ~12 Catalyst burns minutes
    of driver CPU in BigInteger Toom-Cook multiplications just planning
    the next round (caught by the sf1 scale audit: msf_boruvka hung
    >10 min on 15k edges, single driver core pegged inside
    SizeInBytesOnlyStatsPlanVisitor). When the propagated estimate no
    longer fits a sane byte count, rebuild the frame over the SAME
    checkpointed JVM rows via internalCreateDataFrame, which restores
    the default (finite) size estimate. AQE still makes the real
    broadcast/skew decisions from runtime shuffle sizes, so dropping the
    inflated estimate loses nothing.
    """
    ck = df.localCheckpoint(eager=True)
    try:
        # Unconditional rebuild. (A conditional "only when stats exploded"
        # check is a trap: reading sizeInBytes from Python returns the
        # BigInt through py4j, which stringifies it — itself O(n^2) on a
        # million-digit value, observed pegging the driver.)
        fresh = ck.sparkSession._jsparkSession.internalCreateDataFrame(
            ck._jdf.queryExecution().toRdd(), ck._jdf.schema(), False
        )
        return type(ck)(fresh, ck.sparkSession)
    except Exception:  # internal API moved — inflated stats, still correct
        return ck


@contextmanager
def _scoped_shuffle_partitions(spark, target: int):
    """Set spark.sql.shuffle.partitions for the duration of an iterative
    loop, then RESTORE the caller's value. The iterative operators size
    shuffles to the data (a 1.5k-edge graph wants 4 partitions, not the
    session's 32), but the session is shared: without the restore, one
    small-graph call permanently downsizes shuffle parallelism for every
    later unrelated query on the same SparkSession (observed hazard:
    bench.py runs the headline set back-to-back in one session).

    Only sound when the loop MATERIALIZES its work inside the scope
    (eager localCheckpoint per round, as all callers here do) — the conf
    is read at execution time, so lazily-returned shuffles would run
    under the restored value.
    """
    key = "spark.sql.shuffle.partitions"
    try:
        prev = spark.conf.get(key)
    except Exception:  # pragma: no cover - static conf env
        prev = None
    try:
        spark.conf.set(key, str(target))
    except Exception:  # pragma: no cover - static conf env
        yield
        return
    try:
        yield
    finally:
        try:
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)
        except Exception:  # pragma: no cover - static conf env
            pass


def bfs_depths(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 20,
    directed: bool = True,
) -> DataFrame:
    """Min hop-distance from any source vertex. Frontier-expansion BFS:
    each round expands the frontier one hop and anti-joins the visited set
    (the cycle guard from SURVEY.md §7).

    sources: DataFrame with column ``id``. Returns (id, depth).
    """
    e = edges.select("src", "dst") if directed else undirected(edges)
    # the static side joins EVERY round — materialize once or each round
    # re-runs the caller's whole edge derivation (scan+distinct) from
    # parquet (measured 546s -> 9s on the weighted-SSSP sibling at sf0.1)
    e = _checkpoint(e)
    visited = sources.select("id").distinct().withColumn("depth", F.lit(0))
    visited = _checkpoint(visited)
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            e.join(frontier.withColumnRenamed("id", "src").select("src"), "src")
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(visited.select("id"), "id", "left_anti")
            .withColumn("depth", F.lit(d))
        )
        nxt = _checkpoint(nxt)
        if nxt.isEmpty():
            break
        visited = _checkpoint(visited.union(nxt))
        frontier = nxt
    return visited


def transitive_closure(
    edges: DataFrame,
    max_depth: int = 20,
    directed: bool = True,
    broadcast_edges: bool | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """All (src, dst, depth) pairs reachable in <= max_depth hops, depth =
    MIN hop count — the relational form of ``MATCH p=(i)-[*]->(j) RETURN
    length(p)`` (reference: analysis_queries.md:84-111).

    DuckDB ``WITH RECURSIVE`` is the oracle for this operator.

    Physical strategies (``strategy``):

    - ``doubling`` (default for directed): min-plus path doubling —
      square the min-depth pair relation ceil(log2(max_depth)) times
      (D' = min(D, D joined with D on the midpoint)). State after every
      round is the DEDUPED shortest-depth pair set, so walks are never
      enumerated and cyclic inputs cost nothing extra; round count is
      logarithmic in depth instead of linear. Measured 3.5s -> 1.9s vs
      the recursive CTE on the 21k-edge ESCO hierarchy (4 rounds vs 12),
      and the gap widens with diameter — the 100 TB-shape choice.
    - ``cte``: one native recursive CTE (Spark >= 4.0 UnionLoopExec),
      Catalyst-owned iteration. It enumerates WALKS (UNION ALL;
      UNION-dedup inside recursion is unsupported), taking min(depth)
      only at the end — near-free on trees/DAGs with modest depth caps,
      exponential on cyclic/undirected inputs. Kept for the single-job
      plan shape and as the cross-check implementation.
    - ``bfs`` (default for undirected): frontier expansion with a
      per-round anti-join against the visited set — per-round joins
      touch only the frontier, the right shape when the closure is huge
      but the diameter small.
    """
    e = edges.select("src", "dst") if directed else undirected(edges)
    if strategy == "auto":
        strategy = "doubling" if directed else "bfs"
    if strategy in ("doubling", "cte"):
        # Size the static shuffle-partition count to the data: iterative
        # plans re-use it every round (AQE cannot re-plan inside a
        # UnionLoop, and the doubling rounds collect through
        # localCheckpoint before AQE sees the whole chain). A 21k-edge
        # taxonomy gets 8 partitions (measured 3.1s -> 2.2s on the depth
        # histogram), a billion-edge graph gets thousands. Scoped: the
        # work MATERIALIZES inside the `with` (doubling checkpoints per
        # round; the CTE result is checkpointed before returning), so
        # the caller's session conf is restored before this returns.
        n_edges = e.count()
        target = max(8, min(n_edges // 50_000 + 1, 4096))
        with _scoped_shuffle_partitions(e.sparkSession, target):
            if strategy == "doubling":
                return _closure_via_doubling(e, max_depth)
            if directed and max_depth <= 12:
                if broadcast_edges is None:
                    # When the static edge side is small enough to
                    # broadcast, every CTE iteration becomes a narrow map
                    # over the recursion side (no per-round shuffle) —
                    # measured ~1.4x.
                    broadcast_edges = n_edges <= 1_000_000
                cte = _closure_via_recursive_cte(e, max_depth, broadcast_edges)
                if cte is not None:
                    # materialize while the tuned conf is live; the
                    # recursion would otherwise execute lazily after the
                    # restore
                    return _checkpoint(cte)
    # Fallback (Spark < 4.0): frontier-expansion BFS, one materializing
    # job per round — the anti-join against the visited set is the cycle
    # guard, and `reached` stays a union of already-checkpointed
    # frontiers so its lineage never deepens.
    reached = (
        e.select(F.col("src").alias("origin"), F.col("dst").alias("id"))
        .distinct()
        .withColumn("depth", F.lit(1).cast("int"))
    )
    reached = _checkpoint(reached)
    frontier = reached
    for d in range(2, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["id"] == e["src"], "inner")
            .select("origin", F.col("dst").alias("id"))
            .distinct()
            .join(reached.select("origin", "id"), ["origin", "id"], "left_anti")
            .withColumn("depth", F.lit(d).cast("int"))
        )
        nxt = _checkpoint(nxt)
        if nxt.isEmpty():
            break
        reached = reached.union(nxt)
        frontier = nxt
    return reached.select(
        F.col("origin").alias("src"), F.col("id").alias("dst"), "depth"
    )


def _closure_via_doubling(e: DataFrame, max_depth: int) -> DataFrame:
    """Min-plus path doubling: after round k the state holds the exact
    min-depth for every pair whose shortest path is <= 2^k (capped at
    max_depth), so ceil(log2(max_depth)) rounds finish the closure.

    Each round is one midpoint self-join plus one (src, dst) min-agg —
    both keyed shuffles; the depth filter keeps state from ever
    exceeding the pair set the caller asked for. localCheckpoint per
    round truncates lineage exactly like the BFS path. Cyclic inputs
    are safe by construction (self-pairs appear with their cycle
    length, same as the walk semantics of the CTE/BFS paths)."""
    D = (
        e.distinct()
        .withColumn("depth", F.lit(1).cast("int"))
    )
    D = _checkpoint(D)
    span = 1
    while span < max_depth:
        a = D.select(
            "src", F.col("dst").alias("mid"), F.col("depth").alias("d1")
        )
        b = D.select(
            F.col("src").alias("mid"), "dst", F.col("depth").alias("d2")
        )
        composed = a.join(b, "mid").select(
            "src", "dst", (F.col("d1") + F.col("d2")).cast("int").alias("depth")
        )
        D = (
            D.unionByName(composed)
            .groupBy("src", "dst")
            .agg(F.min("depth").alias("depth"))
            .filter(F.col("depth") <= max_depth)
        )
        D = _checkpoint(D)
        span *= 2
    return D.select("src", "dst", "depth")


def _closure_via_recursive_cte(
    e: DataFrame, max_depth: int, broadcast_edges: bool = False
) -> DataFrame | None:
    """Min-depth transitive closure as ONE native recursive CTE (Spark
    >= 4.0 ``WITH RECURSIVE`` / UnionLoopExec).

    Catalyst owns the whole loop, so there are no per-round Python->JVM
    round-trips, no localCheckpoint jobs, and the plan is a single
    pipeline — ~2x faster locally than the hand-rolled frontier loop and
    the idiomatic cluster plan. Semantics mirror the DuckDB oracle
    exactly: enumerate walks up to max_depth (the depth cap is the cycle
    bound), then min(depth) per pair. Caller (transitive_closure) gates
    this to directed inputs with modest max_depth — see its docstring.
    """
    import uuid

    spark = e.sparkSession
    # Unique per call: a fixed name is shared session-wide, so two
    # concurrent closures could rebind each other's edge set between view
    # creation and analysis.
    view = f"__tc_edges_{uuid.uuid4().hex}__"
    hint = "/*+ BROADCAST(e) */ " if broadcast_edges else ""
    try:
        e.createOrReplaceTempView(view)
        out = spark.sql(
            f"""
            WITH RECURSIVE d(src, dst, depth) AS (
              SELECT src, dst, 1 FROM {view}
              UNION ALL
              SELECT {hint}d.src, e.dst, d.depth + 1
              FROM d JOIN {view} e ON d.dst = e.src
              WHERE d.depth < {int(max_depth)}
            )
            SELECT src, dst, CAST(min(depth) AS INT) AS depth
            FROM d GROUP BY src, dst
            """
        )
        # force analysis so parse errors on old Spark fall through; the
        # analyzed plan holds the resolved child, so the view can go
        out.schema
        spark.catalog.dropTempView(view)
        return out
    except Exception:  # pragma: no cover - Spark < 4.0 only
        try:
            spark.catalog.dropTempView(view)
        except Exception:
            pass
        return None


def shortest_path_length(
    edges: DataFrame, source, target, max_depth: int = 20, directed: bool = False
) -> DataFrame:
    """Unweighted shortest path length between two vertices — Cypher
    ``shortestPath((a)-[*]-(b))`` (reference: analysis_queries.md:136-141).

    BFS from the source over the (default undirected) edge view; returns a
    1-row DataFrame (src, dst, distance) or 0 rows if unreachable.
    """
    spark = edges.sparkSession
    src_df = spark.createDataFrame([(source,)], ["id"])
    depths = bfs_depths(edges, src_df, max_depth=max_depth, directed=directed)
    return depths.filter(F.col("id") == F.lit(target)).select(
        F.lit(source).alias("src"),
        F.col("id").alias("dst"),
        F.col("depth").alias("distance"),
    )


def shortest_path(
    edges: DataFrame, source, target, max_depth: int = 20, directed: bool = False
) -> DataFrame:
    """K2 full parity: ``shortestPath((a)-[*]-(b))`` returning the path's
    node sequence, not just its length (the reference query returns
    ``[node IN nodes(path) | node.preferredLabel]`` —
    analysis_queries.md:136-141).

    BFS from the source with predecessor tracking: each newly-reached
    vertex records the MINIMUM-id predecessor on the previous level
    (deterministic lexicographic tiebreak, so the reconstructed path is
    unique and oracle-reproducible). The BFS stops at the level where the
    target first appears — min state, early exit. Path reconstruction then
    walks the predecessor chain driver-side: <= distance 1-row lookups
    against the checkpointed visited set, mirroring the reference's
    client-side path materialization (bounded by max_depth, never O(V)).

    Returns a 1-row DataFrame (src, dst, distance, path array) or 0 rows
    if the target is unreachable within max_depth.
    """
    from pyspark.sql.types import ArrayType, IntegerType, StructField, StructType

    spark = edges.sparkSession
    e = edges.select("src", "dst") if directed else undirected(edges)
    id_type = e.schema["src"].dataType
    out_schema = StructType(
        [
            StructField("src", id_type),
            StructField("dst", id_type),
            StructField("distance", IntegerType()),
            StructField("path", ArrayType(id_type)),
        ]
    )
    src_df = spark.createDataFrame([(source,)], StructType([StructField("id", id_type)]))
    visited = (
        src_df.withColumn("depth", F.lit(0))
        .withColumn("pred", F.lit(None).cast(id_type))
    )
    visited = _checkpoint(visited)
    frontier = visited.select("id")
    dist = 0
    found = source == target
    if not found:
        for d in range(1, max_depth + 1):
            nxt = (
                e.join(frontier.withColumnRenamed("id", "src"), "src")
                .select(F.col("dst").alias("id"), F.col("src").alias("pred"))
                .join(visited.select("id"), "id", "left_anti")
                .groupBy("id")
                .agg(F.min("pred").alias("pred"))
                .select("id", F.lit(d).alias("depth"), "pred")
            )
            nxt = _checkpoint(nxt)
            if nxt.isEmpty():
                break
            visited = _checkpoint(visited.union(nxt))
            frontier = nxt.select("id")
            if not nxt.filter(F.col("id") == F.lit(target)).isEmpty():
                found, dist = True, d
                break
    if not found:
        return spark.createDataFrame([], out_schema)
    path = [target]
    cur = target
    for _ in range(dist):
        row = (
            visited.filter(F.col("id") == F.lit(cur)).select("pred").first()
        )
        cur = row["pred"]
        path.append(cur)
    path.reverse()
    return spark.createDataFrame([(source, target, dist, path)], out_schema)


def connected_components(
    edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Hash-min connected components: every vertex adopts the min component
    id among itself and its neighbors until fixpoint. Returns (id, component).

    Converges in O(diameter) supersteps; each superstep is one
    aggregate_messages + groupBy min. (GraphX's ConnectedComponents is the
    same algorithm expressed on RDDs.)
    """
    e = undirected(edges)
    e = _checkpoint(e)  # static per-round join side — see bfs_depths
    # vertex set from the CHECKPOINTED undirected view (it contains both
    # directions, so distinct src covers every endpoint) — deriving it
    # from raw `edges` would evaluate the caller's edge pipeline a second
    # time, which for the dedup capstones means re-running the whole
    # MinHash banding+verify plan (half of pipeline_training_mix's
    # r4-measured sf1 superlinearity).
    state = (
        e.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    state = _checkpoint(state)
    for _ in range(max_iter):
        msgs = (
            e.join(state, e["src"] == state["id"], "inner")
            .select(F.col("dst").alias("id"), "component")
        )
        adopted = (
            state.select("id", "component").union(msgs)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
        )
        # pointer-jump (path compression): component <- component's
        # component. Component ids are vertex ids and only ever decrease,
        # so the parent row always exists and the jump preserves the
        # min-of-CC fixpoint. Hash-min alone needs O(chain length)
        # rounds on chain-shaped graphs (Boruvka contraction graphs are
        # exactly that — this loop was hitting the 30-round cap);
        # min-adoption + jumping converges in O(log V).
        parent = adopted.select(
            F.col("id").alias("component"), F.col("component").alias("c2")
        )
        new_state = adopted.join(parent, "component").select(
            "id", F.col("c2").alias("component")
        )
        new_state = _checkpoint(new_state)
        changed = (
            new_state.alias("n")
            .join(state.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .isEmpty()
        )
        state = new_state
        if changed:
            break
    return state


def pagerank(
    edges: DataFrame,
    num_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank with a fixed iteration count (GraphX ``staticPageRank``
    semantics: rank = (1-d) + d * sum(rank_src / outDeg_src); dangling
    vertices contribute nothing). Returns (id, rank).
    """
    verts = vertices_of(edges)
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    # Pre-join degree once; rank state re-joined per superstep.
    e_deg = _checkpoint(
        edges.select("src", "dst").join(
            out_deg.withColumnRenamed("id", "src"), "src"
        )
    )
    state = verts.withColumn("rank", F.lit(1.0))
    state = _checkpoint(state)
    for _ in range(num_iter):
        contribs = (
            e_deg.join(state.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_degree")).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("msg"))
        )
        state = (
            verts.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce(F.col("msg"), F.lit(0.0))
                ).alias("rank"),
            )
        )
        state = _checkpoint(state)
    return state


def multi_origin_depths(
    edges: DataFrame,
    origins: DataFrame,
    max_depth: int = 20,
    directed: bool = False,
) -> DataFrame:
    """Min hop-distance from EACH origin separately — (origin, id, depth)
    keyed BFS restricted to a pivot set. This is the engine behind
    sampled centrality (Brandes-Pich for betweenness, pivot-sampled
    closeness): state is |origins| x reachable, not |V|^2, which is the
    whole point at 100x. ``origins``: DataFrame with column ``id``.
    Self-pairs are excluded (a cycle can reach an origin from itself).
    """
    e = edges.select("src", "dst") if directed else undirected(edges)
    e = _checkpoint(e)  # static per-round join side — see bfs_depths
    seed = (
        e.join(origins.withColumnRenamed("id", "src").select("src"), "src")
        .select(F.col("src").alias("origin"), F.col("dst").alias("id"))
        .distinct()
        .withColumn("depth", F.lit(1).cast("int"))
    )
    reached = _checkpoint(seed)
    frontier = reached
    for d in range(2, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["id"] == e["src"], "inner")
            .select("origin", F.col("dst").alias("id"))
            .distinct()
            .join(reached.select("origin", "id"), ["origin", "id"], "left_anti")
            .withColumn("depth", F.lit(d).cast("int"))
        )
        nxt = _checkpoint(nxt)
        if nxt.isEmpty():
            break
        reached = reached.union(nxt)
        frontier = nxt
    return reached.filter(F.col("origin") != F.col("id"))


def pagerank_weighted_fixedpoint(
    edges: DataFrame,
    weight_col: str = "weight",
    num_iter: int = 10,
    damping: float = 0.85,
    scale: int = 10**9,
) -> DataFrame:
    """Weighted PageRank in FIXED-POINT arithmetic: rank state lives in
    integer units of 1/scale, per-edge contributions use exact integer
    division (rank * w div W_src), and only the damping step touches a
    double (one multiply + one round per vertex per iteration — a single
    deterministic operation, not an order-sensitive sum).

    Why fixed-point: float PageRank's per-vertex message sum depends on
    aggregation ORDER once in-degree exceeds 2 ((a+b)+c != a+(b+c)), so
    results can drift in the last ulp between partitionings, engines, and
    reruns. Integer sums are associative — this variant is bit-identical
    everywhere at any parallelism, which is what a regression-gated 100 TB
    pipeline actually wants from an iterative metric, and what lets the
    DuckDB oracle check it value-exact. Quantization error is <= 1e-9 per
    edge per iteration — noise relative to PageRank's own iteration
    tolerance. Returns (id, rank_units) with rank = rank_units / scale.
    """
    e = edges.select("src", "dst", F.col(weight_col).alias("w"))
    verts = vertices_of(e)
    wsum = e.groupBy("src").agg(F.sum("w").alias("wtot"))
    ed = _checkpoint(e.join(wsum, "src"))
    base = int(round((1.0 - damping) * scale))
    state = _checkpoint(verts.withColumn("r", F.lit(int(scale))))
    for _ in range(num_iter):
        contribs = (
            ed.join(state.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                F.expr("(r * w) div wtot").alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("msg"))
        )
        state = verts.join(contribs, "id", "left").select(
            "id",
            (
                F.lit(base)
                + F.round(
                    F.lit(damping) * F.coalesce(F.col("msg"), F.lit(0))
                ).cast("bigint")
            ).alias("r"),
        )
        state = _checkpoint(state)
    return state.select("id", F.col("r").alias("rank_units"))


def hits_fixedpoint(
    edges: DataFrame, num_iter: int = 5, scale: int = 10**9
) -> DataFrame:
    """HITS (hubs & authorities) in fixed-point integer units: the
    mutual-reinforcement iteration a = sum_in(h); h = sum_out(a), each
    L1-rescaled to ``scale`` by exact integer division per round.
    Integer message sums are associative, so like
    pagerank_weighted_fixedpoint this is bit-identical at any
    parallelism and fully value-oracle-able (the float HITS normalizes
    by an L2 norm — order-sensitive twice over). Products stay in
    int64: raw <= in_degree * scale, raw * scale <= ~1e19 only past
    in-degree 9 — callers with hub-heavy graphs should drop scale to
    1e8. Returns (id, hub_units, auth_units)."""
    e = edges.select("src", "dst")
    verts = vertices_of(e)
    e = _checkpoint(e)

    def _rescale(df: DataFrame, col: str) -> DataFrame:
        total = df.agg(F.sum(col).alias("s"))
        return (
            df.crossJoin(F.broadcast(total))
            .select("id", F.expr(f"({col} * {int(scale)}) div s").alias(col))
        )

    h = _checkpoint(verts.withColumn("h", F.lit(int(scale))))
    a = None
    for _ in range(num_iter):
        araw = (
            e.join(h.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("h").alias("a"))
        )
        a = _rescale(
            verts.join(araw, "id", "left").select(
                "id", F.coalesce(F.col("a"), F.lit(0)).alias("a")
            ),
            "a",
        )
        a = _checkpoint(a)
        hraw = (
            e.join(a.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.sum("a").alias("h"))
        )
        h = _rescale(
            verts.join(hraw, "id", "left").select(
                "id", F.coalesce(F.col("h"), F.lit(0)).alias("h")
            ),
            "h",
        )
        h = _checkpoint(h)
    return h.join(a, "id").select(
        "id", F.col("h").alias("hub_units"), F.col("a").alias("auth_units")
    )


def katz_fixedpoint(
    edges: DataFrame,
    alpha: float = 0.2,
    num_iter: int = 10,
    scale: int = 10**9,
) -> DataFrame:
    """Katz centrality in fixed-point integer units: x = beta + alpha*A^T x
    iterated ``num_iter`` times from x0 = beta, counting attenuated walks
    of every length into each vertex (Katz 1953). beta is ``scale`` units
    (=1.0); the per-vertex update is one float multiply + round — the
    same single deterministic float op per round as
    :func:`pagerank_weighted_fixedpoint` — so message sums stay
    associative bigints and the whole chain is bit-identical at any
    parallelism, giving a FULL unrolled SQL oracle by construction.

    Unlike PageRank there is no out-degree normalization: a vertex's
    influence is not diluted across its out-edges, which is exactly the
    semantic difference Katz exists for. Convergence needs
    alpha < 1/lambda_max; with a fixed iteration count any alpha is
    well-defined, but callers should keep alpha * max_in_degree < 1 so
    units stay within int64 headroom (state <= scale / (1 - alpha*d)).
    Returns (id, katz_units) with katz = katz_units / scale.
    """
    e = edges.select("src", "dst")
    verts = vertices_of(e)
    e = _checkpoint(e)
    state = _checkpoint(verts.withColumn("x", F.lit(int(scale))))
    for _ in range(num_iter):
        msgs = (
            e.join(state.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum("x").alias("msg"))
        )
        state = verts.join(msgs, "id", "left").select(
            "id",
            (
                F.lit(int(scale))
                + F.round(
                    F.lit(alpha) * F.coalesce(F.col("msg"), F.lit(0))
                ).cast("bigint")
            ).alias("x"),
        )
        state = _checkpoint(state)
    return state.select("id", F.col("x").alias("katz_units"))


def personalized_pagerank(
    edges: DataFrame,
    seeds: list,
    num_iter: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Personalized PageRank (random walk with restart): all teleport
    mass returns to the ``seeds`` set instead of spreading uniformly —
    rank_i = tele(i) + d * sum(rank_src / outDeg_src), with
    tele(i) = (1-d)/|seeds| for seeds and 0 elsewhere, initialized at the
    teleport vector. Fixed iteration count like :func:`pagerank` (GraphX
    staticPageRank semantics). The teleport constant is computed ONCE
    driver-side and embedded as a literal so an SQL oracle can reuse the
    identical double.

    The reference exposes only global PageRank (gds.pageRank.stream,
    analysis_queries.md:206-215); personalization is the standard
    seeded-relevance extension (same superstep structure, different
    teleport vector), used for 'related to THIS node' ranking.
    """
    tele = (1.0 - damping) / len(seeds)
    verts = vertices_of(edges)
    out_deg = edges.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_degree")
    )
    e_deg = _checkpoint(
        edges.select("src", "dst").join(
            out_deg.withColumnRenamed("id", "src"), "src"
        )
    )
    tele_col = F.when(F.col("id").isin(seeds), F.lit(tele)).otherwise(
        F.lit(0.0)
    )
    state = verts.withColumn("rank", tele_col)
    state = _checkpoint(state)
    for _ in range(num_iter):
        contribs = (
            e_deg.join(state.withColumnRenamed("id", "src"), "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_degree")).alias("contrib"),
            )
            .groupBy("id")
            .agg(F.sum("contrib").alias("msg"))
        )
        state = verts.join(contribs, "id", "left").select(
            "id",
            (
                tele_col + F.lit(damping) * F.coalesce(F.col("msg"), F.lit(0.0))
            ).alias("rank"),
        )
        state = _checkpoint(state)
    return state


def label_propagation(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """Community detection via synchronous label propagation — the scalable
    stand-in for the reference's Louvain call (analysis_queries.md:233-246;
    SURVEY.md §7 documents the substitution). Returns (id, community).

    Tie-break: the smallest label among the most frequent neighbor labels
    (deterministic, unlike classic random LPA).
    """
    e = undirected(edges)
    state = vertices_of(edges).withColumn("community", F.col("id"))
    state = _checkpoint(state)
    for _ in range(max_iter):
        neigh = (
            e.join(state.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"), "community")
            .agg(F.count("*").alias("votes"))
        )
        w = Window.partitionBy("id").orderBy(
            F.desc("votes"), F.asc("community")
        )
        new_state = (
            neigh.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", "community")
        )
        # isolated vertices keep their label
        new_state = state.select("id").join(new_state, "id", "left").select(
            "id",
            F.coalesce(F.col("community"), F.col("id")).alias("community"),
        )
        new_state = _checkpoint(new_state)
        changed = (
            new_state.alias("n")
            .join(state.alias("o"), "id")
            .filter(F.col("n.community") != F.col("o.community"))
            .isEmpty()
        )
        state = new_state
        if changed:
            break
    return state


def modularity(edges: DataFrame, communities: DataFrame) -> float:
    """Newman modularity Q = sum_c [ E_c/m - (tot_c/(2m))^2 ] of an
    undirected partition: E_c intra-community edges, tot_c sum of member
    degrees, m total edges. Driver-side scalar (one small agg collect) —
    used by the Louvain refinement tests and as a quality metric.

    ``communities``: (id, community).
    """
    und = undirected(edges).distinct()
    m = und.count() / 2.0
    if m == 0:
        return 0.0
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    intra = (
        und.join(communities.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("community", "c_src")
        .join(
            communities.select(
                F.col("id").alias("dst"), F.col("community").alias("c_dst")
            ),
            "dst",
        )
        .filter(F.col("c_src") == F.col("c_dst"))
        .count()
        / 2.0
    )
    tot = (
        communities.join(deg, "id")
        .groupBy("community")
        .agg(F.sum("deg").alias("tot"))
        .agg(F.sum(F.col("tot") * F.col("tot")).alias("sq"))
        .first()["sq"]
    )
    return intra / m - float(tot) / (4.0 * m * m)


def louvain_communities(
    edges: DataFrame, max_iter: int = 10, refine_iter: int = 4
) -> DataFrame:
    """Community detection: LPA initialization + synchronous modularity
    refinement — the distributed stand-in for the reference's sequential
    Louvain (gds.louvain.stream, analysis_queries.md:233-246) whose
    documented deviation this shrinks (SURVEY.md §7 K5).

    Each refinement round evaluates, per vertex v and candidate community
    c (current + neighbor communities), the standard Louvain move gain

        dQ(v->c) = k_{v,c}/m - deg_v * (tot_c - [c==cur]*deg_v) / (2 m^2)

    and applies the strictly-best positive moves SYNCHRONOUSLY for half
    the vertices per round (hash-parity checkerboard — the standard guard
    against two adjacent vertices swapping communities forever). All state
    transitions are keyed joins/groupBys; nothing is driver-side, so the
    pass scales like LPA itself. Returns (id, community).
    """
    state = label_propagation(edges, max_iter=max_iter)
    return modularity_refine(edges, state, refine_iter=refine_iter)


def modularity_refine(
    edges: DataFrame, communities: DataFrame, refine_iter: int = 4
) -> DataFrame:
    """The Louvain local-move phase on an existing partition — see
    louvain_communities for the gain formula and synchronization scheme.
    Public so any initial partition (LPA, a previous run, a hash bucket)
    can be refined; golden tests start it from a deliberately bad split.

    Fully deterministic INTEGER arithmetic: candidates are compared on
    the gain scaled by the positive constant 2*m^2,

        gain2(v->c) = 2*m*k_{v,c} - deg_v * (tot_c - [c==cur]*deg_v),

    which is an exact bigint — same argmax as the float dQ, but immune
    to summation-order ulp noise, so a DuckDB oracle replays the rounds
    exactly (plans/graph_queries._louvain_unrolled_sql). The
    checkerboard parity is md5-based (portable to SQL, unlike Spark's
    murmur hash). FIXED refine_iter rounds, no early exit: with the
    alternating parity, "no change in round r" is NOT a fixpoint
    certificate — round r+1 frees the other vertex class.
    """
    state = communities.select("id", "community")
    und = _checkpoint(undirected(edges).distinct())
    m = int(und.count() // 2)
    if m == 0:
        return state
    deg = und.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    deg = _checkpoint(deg)

    for rnd in range(refine_iter):
        tot = (
            state.join(deg, "id")
            .groupBy("community")
            .agg(F.sum("deg").alias("tot"))
        )
        # k_{v,c}: edges from v into community c
        nbr = (
            und.join(
                state.select(
                    F.col("id").alias("dst"), F.col("community").alias("c")
                ),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), "c")
            .agg(F.count("*").alias("k_vc"))
        )
        cur = state.select("id", F.col("community").alias("cur_c"))
        # candidate set = neighbor communities U current community (k=0 row
        # so a vertex with no intra-community neighbor can still stay put)
        cand = (
            nbr.join(cur, "id", "inner")
            .unionByName(
                cur.select(
                    "id", F.col("cur_c").alias("c"),
                    F.lit(0).cast("bigint").alias("k_vc"), "cur_c",
                )
            )
            .groupBy("id", "c", "cur_c")
            .agg(F.max("k_vc").alias("k_vc"))
        )
        gains = (
            cand.join(deg, "id")
            .join(tot.withColumnRenamed("community", "c"), "c")
            .withColumn(
                "gain2",
                F.lit(2 * m).cast("bigint") * F.col("k_vc")
                - F.col("deg")
                * (
                    F.col("tot")
                    - F.when(F.col("c") == F.col("cur_c"), F.col("deg"))
                    .otherwise(F.lit(0))
                ),
            )
        )
        w = Window.partitionBy("id").orderBy(
            F.desc("gain2"), F.asc("c")
        )
        best = (
            gains.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("id", F.col("c").alias("best_c"), "cur_c")
        )
        # checkerboard: only one md5-parity class moves per round
        parity = F.conv(
            F.substring(F.md5(F.col("id").cast("string")), 1, 7), 16, 10
        ).cast("bigint")
        move_ok = F.pmod(parity + F.lit(rnd), F.lit(2)) == 0
        new_state = best.select(
            "id",
            F.when(move_ok, F.col("best_c"))
            .otherwise(F.col("cur_c"))
            .alias("community"),
        )
        state = _checkpoint(new_state)
    return state


def betweenness_centrality(
    edges: DataFrame,
    directed: bool = False,
    sample_k: int | None = None,
    max_depth: int = 30,
) -> DataFrame:
    """Brandes betweenness centrality as batched multi-source BFS in
    DataFrames (reference op: gds.betweenness.stream,
    analysis_queries.md:217-231; SURVEY.md §7 ranks this hardest).

    Phase 1 (forward): BFS from ALL sources at once, state keyed by
    (origin, id), accumulating shortest-path counts sigma per level.
    Phase 2 (backward): walk levels deepest-first accumulating dependencies
    delta(v) = sum over successors w of sigma(v)/sigma(w) * (1 + delta(w)).

    Exact when sample_k is None; with sample_k, sources are a deterministic
    sample and scores are scaled by n_vertices/sample_k (Brandes-Pich
    approximation — the 100 TB path). Undirected scores are halved per
    convention. Returns (id, betweenness).
    """
    e = edges.select("src", "dst") if directed else undirected(edges)
    e = _checkpoint(e.distinct())
    verts = _checkpoint(vertices_of(edges))
    n_vertices = verts.count()

    sources = verts
    scale = 1.0
    if sample_k is not None and sample_k < n_vertices:
        sources = verts.orderBy("id").limit(sample_k)
        scale = n_vertices / sample_k

    # --- forward phase: multi-source BFS with sigma (path counts) ---
    # state per level: (origin, id, sigma)
    level_frames: list[DataFrame] = []
    frontier = sources.select(
        F.col("id").alias("origin"), F.col("id"), F.lit(1.0).alias("sigma")
    )
    frontier = _checkpoint(frontier)
    visited = frontier.select("origin", "id")
    level_frames.append(frontier.withColumn("depth", F.lit(0)))
    for d in range(1, max_depth + 1):
        expanded = (
            frontier.join(e, frontier["id"] == e["src"], "inner")
            .select("origin", F.col("dst").alias("id"), "sigma")
            .join(visited, ["origin", "id"], "left_anti")
            .groupBy("origin", "id")
            .agg(F.sum("sigma").alias("sigma"))
        )
        expanded = _checkpoint(expanded)
        if expanded.isEmpty():
            break
        level_frames.append(expanded.withColumn("depth", F.lit(d)))
        visited = _checkpoint(
            visited.union(expanded.select("origin", "id"))
        )
        frontier = expanded

    # all (origin, id, sigma, depth)
    bfs = level_frames[0]
    for lf in level_frames[1:]:
        bfs = bfs.union(lf)
    bfs = _checkpoint(bfs)
    max_d = len(level_frames) - 1

    # --- backward phase: dependency accumulation, deepest level first ---
    # delta defaults to 0 at the deepest level.
    acc = None  # accumulated betweenness contributions per (id)
    delta_next = None  # (origin, id, delta) at level d+1
    for d in range(max_d, 0, -1):
        level = bfs.filter(F.col("depth") == d).select("origin", "id", "sigma")
        if delta_next is not None:
            level_delta = (
                level.join(delta_next, ["origin", "id"], "left")
                .select(
                    "origin",
                    "id",
                    "sigma",
                    F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta"),
                )
            )
        else:
            level_delta = level.withColumn("delta", F.lit(0.0))
        level_delta = _checkpoint(level_delta)
        # contribution flows to predecessors: v --edge--> w where
        # depth(v) == d-1 and depth(w) == d (shortest-path DAG edges).
        # Columns renamed to unique names before joining: preds and
        # level_delta share lineage (both derive from bfs), so qualified
        # access would be ambiguous.
        preds = bfs.filter(F.col("depth") == d - 1).select(
            F.col("origin").alias("p_origin"),
            F.col("id").alias("pid"),
            F.col("sigma").alias("psigma"),
        )
        dag = (
            e.join(level_delta, e["dst"] == level_delta["id"], "inner")
            .join(
                preds,
                (F.col("src") == F.col("pid"))
                & (F.col("origin") == F.col("p_origin")),
                "inner",
            )
            .select(
                F.col("p_origin").alias("origin"),
                F.col("pid").alias("id"),
                (
                    (F.col("psigma") / F.col("sigma"))
                    * (F.lit(1.0) + F.col("delta"))
                ).alias("contrib"),
            )
        )
        delta_prev = dag.groupBy("origin", "id").agg(
            F.sum("contrib").alias("delta")
        )
        delta_prev = _checkpoint(delta_prev)
        # non-source vertices accumulate their delta into betweenness
        part = (
            delta_prev.filter(F.col("origin") != F.col("id"))
            .groupBy("id")
            .agg(F.sum("delta").alias("b"))
        )
        acc = part if acc is None else acc.union(part)
        delta_next = delta_prev

    if acc is None:
        return verts.withColumn("betweenness", F.lit(0.0))
    totals = acc.groupBy("id").agg(F.sum("b").alias("betweenness"))
    factor = scale * (0.5 if not directed else 1.0)
    return (
        verts.join(totals, "id", "left")
        .select(
            "id",
            (F.coalesce(F.col("betweenness"), F.lit(0.0)) * F.lit(factor)).alias(
                "betweenness"
            ),
        )
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count via DEGREE-ORDERED edge orientation — the
    shape that survives power-law graphs at scale.

    The naive wedge join explodes on hubs: a degree-d vertex contributes
    d^2 wedge rows. Orienting every edge from its lower-(degree, id)
    endpoint to the higher one caps every vertex's OUT-degree at O(sqrt(m))
    [Suri & Vassilvitskii, "Counting Triangles and the Curse of the Last
    Reducer", WWW'11], so the wedge join emits O(m^1.5) rows total no
    matter how skewed the degree distribution is. Each triangle is counted
    exactly once (its unique rank-ordering), so no dedup pass.

    Three shuffles total: degree agg, wedge self-join on the apex, closing
    equi-join on the (v, w) pair. The DuckDB oracle enumerates id-ordered
    triangles directly — algorithmically independent of the orientation.
    Cypher analog: MATCH (a)--(b)--(c)--(a) (no triangle query in the
    reference corpus; extension per SURVEY §2.K).
    """
    canon = (
        undirected(edges)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    und = canon.union(canon.select(F.col("b"), F.col("a")))
    deg = und.groupBy("a").agg(F.count("*").alias("deg")).withColumnRenamed("a", "id")
    e = (
        canon.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("db")), "b")
    )
    # orient low-rank -> high-rank, rank = (degree, id)
    src_low = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    fwd = e.select(
        F.when(src_low, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(src_low, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(src_low, F.col("db")).otherwise(F.col("da")).alias("dv"),
    )
    x, y = fwd.alias("x"), fwd.alias("y")
    rank_lt = (F.col("x.dv") < F.col("y.dv")) | (
        (F.col("x.dv") == F.col("y.dv")) & (F.col("x.v") < F.col("y.v"))
    )
    wedges = x.join(y, (F.col("x.u") == F.col("y.u")) & rank_lt).select(
        F.col("x.v").alias("u"), F.col("y.v").alias("v")
    )
    return wedges.join(fwd.select("u", "v"), ["u", "v"]).agg(
        F.count("*").cast("bigint").alias("n_triangles")
    )


def sssp_weighted(
    edges: DataFrame,
    source,
    weight_col: str = "weight",
    max_iter: int = 50,
    directed: bool = True,
) -> DataFrame:
    """Single-source shortest paths with non-negative edge weights —
    the weighted generalization of ``shortestPath`` (reference K2,
    analysis_queries.md:136-141 is the unweighted case).

    Distributed Bellman-Ford with frontier-restricted relaxation: only
    vertices whose tentative distance improved last round emit relaxations
    this round (delta-stepping's key pruning, without the bucket queue —
    a priority queue is inherently sequential, so Dijkstra proper doesn't
    distribute; frontier Bellman-Ford is the standard cluster formulation).
    Each round is one equi-join frontier⋈edges + a min-aggregate + a
    min-merge into the distance table — all shuffles on the vertex id, no
    driver-side state beyond the loop counter. Converges in at most
    (longest shortest-path hop count) rounds on non-negative weights;
    checkpointed per round to cut lineage.

    edges: (src, dst, <weight_col>). Returns (id, dist) for every vertex
    reachable from ``source`` (the source itself at dist 0).
    """
    if directed:
        e = edges.select("src", "dst", F.col(weight_col).alias("w"))
    else:
        fwd = edges.select("src", "dst", F.col(weight_col).alias("w"))
        e = fwd.union(fwd.select(F.col("dst"), F.col("src"), F.col("w")))
    # static relaxation side — checkpoint or every Bellman-Ford round
    # re-runs the caller's edge derivation from storage (measured 546s ->
    # 9s at sf0.1 on the union+distinct-derived event graph)
    e = _checkpoint(e)
    id_type = e.schema["src"].dataType
    spark = edges.sparkSession
    dist = spark.range(1).select(
        F.lit(source).cast(id_type).alias("id"),
        F.lit(0).cast("double").alias("dist"),
    )
    dist = _checkpoint(dist)
    frontier = dist
    for _ in range(max_iter):
        cand = (
            e.join(
                frontier.select(
                    F.col("id").alias("src"), F.col("dist").alias("d0")
                ),
                "src",
            )
            .select(
                F.col("dst").alias("id"), (F.col("d0") + F.col("w")).alias("nd")
            )
            .groupBy("id")
            .agg(F.min("nd").alias("nd"))
        )
        improved = (
            cand.join(dist, "id", "left")
            .filter(F.col("dist").isNull() | (F.col("nd") < F.col("dist")))
            .select("id", F.col("nd").alias("dist"))
        )
        improved = _checkpoint(improved)
        if improved.isEmpty():
            return dist
        dist = _checkpoint(
            dist.join(improved.select("id"), "id", "left_anti").union(improved)
        )
        frontier = improved
    # improvements remained after max_iter rounds: distances are not final
    # (silently too large) — refuse rather than return stale values
    raise ValueError(
        "sssp_weighted: relaxation did not converge within "
        f"max_iter={max_iter} rounds (longest shortest-path hop count "
        "exceeds the bound); raise max_iter"
    )


def k_core(edges: DataFrame, k: int = 2, max_iter: int = 50) -> DataFrame:
    """Vertices of the k-core (maximal subgraph where every vertex has
    degree >= k), by iterative peeling: drop sub-k vertices, recompute
    degrees on the induced subgraph, repeat to fixpoint. Returns
    (id, core_degree) — the vertex's degree WITHIN the final core.

    Iterative-with-recomputed-aggregates, so not expressible as a SQL
    recursion (the recursive term would need a GROUP BY over the shrinking
    edge set); golden-tested against hand-computed cores instead
    (tests/test_graph.py). Each round is one degree aggregation plus two
    semi-joins on the shrinking edge set, checkpointed to cut lineage —
    the same per-round shape as connected_components. Rounds needed =
    peeling depth, typically O(10) on real graphs; vertices outside the
    core leave the computation entirely, so per-round cost shrinks.
    Cypher analog: none in the reference (extension per SURVEY §2.K).
    """
    und_c = (
        undirected(edges)
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    cur = und_c.union(und_c.select(F.col("b"), F.col("a"))).toDF("src", "dst")
    prev_n = -1
    settled = False
    for _ in range(max_iter):
        deg = cur.groupBy("src").agg(F.count("*").alias("deg"))
        keep = deg.filter(F.col("deg") >= k).select(F.col("src").alias("id"))
        keep = _checkpoint(keep)
        n = keep.count()
        if n == 0:
            return keep.withColumn("core_degree", F.lit(0).cast("bigint")).limit(0)
        if n == prev_n:
            settled = True
            break
        prev_n = n
        cur = _checkpoint(
            cur.join(keep.withColumnRenamed("id", "src"), "src", "leftsemi").join(
                keep.withColumnRenamed("id", "dst"), "dst", "leftsemi"
            )
        )
    if not settled:
        # more sub-k vertices remained after max_iter rounds: returning the
        # partially-peeled subgraph would be a silently-wrong core — refuse
        # (chain-shaped graphs can cascade one vertex per round, so the
        # peeling depth is O(V) in the worst case; raise max_iter)
        raise ValueError(
            f"k_core: peeling did not reach a fixpoint within "
            f"max_iter={max_iter} rounds; raise max_iter"
        )
    return (
        cur.groupBy("src")
        .agg(F.count("*").cast("bigint").alias("core_degree"))
        .select(F.col("src").alias("id"), "core_degree")
    )


def topo_layers(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """Topological layering of a DAG by iterative zero-in-degree peeling:
    layer 0 = vertices with no incoming edge, layer i = vertices whose
    predecessors all sit in layers < i. Equivalently each vertex's layer
    is the length of the LONGEST path ending at it — which is what the
    DuckDB oracle computes recursively. Raises after ``max_iter`` rounds
    with vertices remaining (a cycle: no topological order exists).

    Kahn's algorithm distributed: each round is one anti-join (find
    sources among remaining vertices) + one semi-join (shrink the edge
    set), both shuffles on the vertex id, checkpointed; rounds = DAG
    depth. Returns (id, layer).
    """
    spark = edges.sparkSession
    e = _checkpoint(edges.select("src", "dst").distinct())
    remaining = _checkpoint(vertices_of(e))
    out = None
    for layer in range(max_iter):
        if remaining.isEmpty():
            return out
        # sources: remaining vertices with no incoming edge from a
        # remaining vertex (edges were pruned to remaining endpoints)
        srcs = remaining.join(
            e.select(F.col("dst").alias("id")).distinct(), "id", "left_anti"
        ).select("id", F.lit(layer).alias("layer"))
        srcs = _checkpoint(srcs)
        if srcs.isEmpty():
            break  # every remaining vertex has a predecessor -> cycle
        out = srcs if out is None else _checkpoint(out.union(srcs))
        remaining = _checkpoint(
            remaining.join(srcs.select("id"), "id", "left_anti")
        )
        e = _checkpoint(
            e.join(
                srcs.select(F.col("id").alias("src")), "src", "left_anti"
            )
        )
    if not remaining.isEmpty():
        raise ValueError(
            "topo_layers: graph contains a cycle (or exceeds max_iter); "
            "no topological order exists"
        )
    return out


def strongly_connected_components(
    edges: DataFrame, max_iter: int = 30
) -> DataFrame:
    """Strongly connected components by COLOR PROPAGATION (Orzan's
    coloring / multi-pivot FW-BW — standard in the distributed-graph
    literature): per round, (1) every vertex learns the minimum vertex id
    that can REACH it (forward min-label fixpoint — each step one
    edge-join + min-merge, checkpointed); that min id partitions the
    remaining graph into color classes, each containing its own pivot
    (the vertex whose id IS the color); (2) one backward multi-origin BFS
    from ALL pivots simultaneously, restricted to same-color edges, finds
    every vertex that also reaches its pivot — exactly the pivot's SCC
    (reaches + reached-by = mutual); (3) settled SCCs leave the graph.

    Most graphs settle in 1-2 rounds (every color class settles its
    pivot's SCC per round). The forward fixpoint is bounded by graph
    diameter, the backward BFS by SCC diameter; every step shuffles on
    the vertex id only. Returns (id, scc), scc = min vertex id of the
    component.
    """
    remaining_e = _checkpoint(edges.select("src", "dst").distinct())
    remaining_v = _checkpoint(vertices_of(remaining_e))
    out = None
    for _ in range(max_iter):
        if remaining_v.isEmpty():
            break
        # (1) forward min-label fixpoint: color(v) = min id reaching v
        color = _checkpoint(remaining_v.select("id", F.col("id").alias("color")))
        converged = False
        for _i in range(max_iter):
            msgs = (
                remaining_e.join(
                    color.select(F.col("id").alias("src"), "color"), "src"
                )
                .select(F.col("dst").alias("id"), "color")
                .groupBy("id")
                .agg(F.min("color").alias("mcolor"))
            )
            upd = color.join(msgs, "id", "left").select(
                "id",
                F.least("color", F.coalesce("mcolor", F.col("color"))).alias(
                    "ncolor"
                ),
            )
            new_color = _checkpoint(
                upd.select("id", F.col("ncolor").alias("color"))
            )
            diff = (
                new_color.alias("n")
                .join(color.alias("o"), "id")
                .filter(F.col("n.color") != F.col("o.color"))
            )
            color = new_color
            if diff.isEmpty():
                converged = True
                break
        if not converged:
            # settling on stale colors would produce WRONG components
            # (not just incomplete ones) — refuse instead
            raise ValueError(
                "strongly_connected_components: min-label propagation did "
                f"not converge within max_iter={max_iter} rounds (graph "
                "depth exceeds the bound); raise max_iter"
            )
        # (2) backward multi-origin BFS from every pivot, within its class
        csrc = color.select(F.col("id").alias("src"), F.col("color").alias("c1"))
        cdst = color.select(F.col("id").alias("dst"), F.col("color").alias("c2"))
        class_e = (
            remaining_e.join(csrc, "src").join(cdst, "dst")
            .filter(F.col("c1") == F.col("c2"))
            .select("src", "dst", F.col("c1").alias("color"))
        )
        class_e = _checkpoint(class_e)
        reached = _checkpoint(
            color.filter(F.col("id") == F.col("color")).select("id", "color")
        )
        frontier = reached
        for _i in range(max_iter):
            nxt = (
                class_e.join(
                    frontier.select(F.col("id").alias("dst"), "color"),
                    ["dst", "color"],
                )
                .select(F.col("src").alias("id"), "color")
                .distinct()
                .join(reached, ["id", "color"], "left_anti")
            )
            nxt = _checkpoint(nxt)
            if nxt.isEmpty():
                break
            reached = _checkpoint(reached.union(nxt))
            frontier = nxt
        settled = reached.select("id", F.col("color").alias("scc"))
        settled = _checkpoint(settled)
        out = settled if out is None else _checkpoint(out.union(settled))
        remaining_v = _checkpoint(
            remaining_v.join(settled.select("id"), "id", "left_anti")
        )
        remaining_e = _checkpoint(
            remaining_e.join(
                settled.select(F.col("id").alias("src")), "src", "left_anti"
            ).join(
                settled.select(F.col("id").alias("dst")), "dst", "left_anti"
            )
        )
    return out


def luby_mis(edges: DataFrame, rounds: int = 8) -> DataFrame:
    """Maximal independent set by Luby's algorithm (Luby 1986), the
    canonical O(log n)-round symmetry-breaking primitive: each round every
    still-active vertex joins the MIS iff its per-round priority beats
    every active neighbor's, then winners and their neighbors retire.
    Priorities are a deterministic arithmetic hash of (id, round) — no
    RNG, so the run is replayable and a SQL oracle can unroll the exact
    same rounds. Returns (id, mis_round).

    Per round: one semi-join to restrict edges to active endpoints, one
    neighbor-comparison anti-join, one removal anti-join — all keyed
    shuffles on vertex id, frontier-sized state, checkpointed per round.
    Runs a FIXED number of rounds (early exit only when no vertex is
    active, which later rounds would no-op anyway) so a fixed-depth
    unrolled oracle is equivalent by construction. Independence and
    maximality are property-tested in tests/test_graph.py.
    Cypher analog: none in the reference (extension per SURVEY §2.K).
    """
    P = 2_147_483_647
    und = (
        undirected(edges)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    active = vertices_of(edges)
    parts: list[DataFrame] = []
    for r in range(1, rounds + 1):

        def h(c):
            return (F.lit(22853) * (c + F.lit(r * 1_000_003)) + 977) % P

        act_e = und.join(
            active.withColumnRenamed("id", "src"), "src", "leftsemi"
        ).join(active.withColumnRenamed("id", "dst"), "dst", "leftsemi")
        a_id, n_id = F.col("src"), F.col("dst")
        blocked = (
            act_e.filter(
                (h(n_id) < h(a_id)) | ((h(n_id) == h(a_id)) & (n_id < a_id))
            )
            .select(a_id.alias("id"))
            .distinct()
        )
        winners = _checkpoint(active.join(blocked, "id", "left_anti"))
        parts.append(winners.withColumn("mis_round", F.lit(r).cast("int")))
        nbrs = (
            und.join(winners.withColumnRenamed("id", "src"), "src", "leftsemi")
            .select(F.col("dst").alias("id"))
            .distinct()
        )
        removed = winners.select("id").union(nbrs)
        active = _checkpoint(active.join(removed, "id", "left_anti"))
        if active.count() == 0:
            break
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def densest_subgraph(
    edges: DataFrame, max_rounds: int = 12
) -> DataFrame:
    """Approximate densest subgraph by iterated peeling — the
    Bahmani/Kumar/Vassilvitskii MapReduce algorithm (VLDB 2012): each
    round drop every vertex whose degree is at most 2(1+eps) times the
    current density E/N, record the iterate, and return the densest
    iterate seen. With eps = 1/2 the removal test is the EXACT integer
    comparison deg*N <= 3*E (deg <= 2(1+eps)*E/N — never a float
    ratio), each round removes
    >= 1/3 of the remaining vertices, so O(log N) rounds suffice and the
    result is a 2(1+eps) = 3-approximation of the maximum-density
    subgraph.

    Everything is integer-exact: per-round stats are (N, E) counts, the
    cross-round argmax compares densities by cross-multiplication
    (e_a * n_b vs e_b * n_a, earliest-round tiebreak), and the fixed
    round schedule unrolls into a SQL oracle. Per round: two semi-joins
    to induce the subgraph's edge set, one degree aggregation, one
    filter — all keyed shuffles, state only ever shrinks. Returns the
    member vertices of the best iterate:
    (id, best_round, n_vertices, n_edges, density)."""
    canon = (
        undirected(edges)
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )
    canon = _checkpoint(canon)
    cur_v = _checkpoint(vertices_of(edges))
    stats_parts: list[DataFrame] = []
    member_parts: list[DataFrame] = []
    for r in range(1, max_rounds + 1):
        cur_e = canon.join(
            cur_v.withColumnRenamed("id", "src"), "src", "leftsemi"
        ).join(cur_v.withColumnRenamed("id", "dst"), "dst", "leftsemi")
        cur_e = _checkpoint(cur_e)
        stats = (
            cur_v.agg(F.count("*").alias("n"))
            .crossJoin(cur_e.agg(F.count("*").alias("e")))
            .withColumn("round", F.lit(r).cast("int"))
        )
        stats_parts.append(stats)
        member_parts.append(
            cur_v.withColumn("round", F.lit(r).cast("int"))
        )
        deg = (
            cur_e.select(F.col("src").alias("id"))
            .unionAll(cur_e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count("*").alias("deg"))
        )
        cur_v = (
            cur_v.join(deg, "id", "left")
            .crossJoin(F.broadcast(stats.select("n", "e")))
            .filter(
                F.coalesce(F.col("deg"), F.lit(0)) * F.col("n")
                > 3 * F.col("e")
            )
            .select("id")
        )
        cur_v = _checkpoint(cur_v)
        if cur_v.isEmpty():
            break
    stats_all = stats_parts[0]
    for s in stats_parts[1:]:
        stats_all = stats_all.unionByName(s)
    members_all = member_parts[0]
    for m in member_parts[1:]:
        members_all = members_all.unionByName(m)
    ok = stats_all.filter(F.col("n") > 0)
    challengers = ok.select(
        F.col("round").alias("b_round"),
        F.col("n").alias("b_n"),
        F.col("e").alias("b_e"),
    )
    best = ok.join(
        challengers,
        (F.col("b_e") * F.col("n") > F.col("e") * F.col("b_n"))
        | (
            (F.col("b_e") * F.col("n") == F.col("e") * F.col("b_n"))
            & (F.col("b_round") < F.col("round"))
        ),
        "left_anti",
    )
    return (
        members_all.join(F.broadcast(best), "round")
        .select(
            "id",
            F.col("round").alias("best_round"),
            F.col("n").cast("bigint").alias("n_vertices"),
            F.col("e").cast("bigint").alias("n_edges"),
            F.round(F.col("e").cast("double") / F.col("n"), 6).alias(
                "density"
            ),
        )
    )


def priority_coloring(edges: DataFrame, rounds: int = 16) -> DataFrame:
    """Distributed greedy graph coloring by iterated priority maxima —
    Luby's symmetry-breaking loop (:func:`luby_mis`) with ONE change:
    each round's winners retire alone (their neighbors stay active), so
    round r's winner set is an independent set that becomes color r.
    Adjacent vertices can never win the same round (one hash beats the
    other), hence the coloring is proper by construction; properness is
    property-tested, and the fixed round schedule + arithmetic-hash
    priorities replay exactly in an unrolled SQL oracle.

    Round-number-as-color trades color count for one-pass simplicity
    (a tree may use O(log n) colors instead of 2); the refinement —
    winners take the minimum color absent among already-colored
    neighbors — drops the count toward Delta+1 at the cost of a
    neighbor-color set-difference per round. Vertices still active
    after ``rounds`` are left uncolored (absent from the output) —
    expected fraction decays geometrically per round. Returns
    (id, color)."""
    P = 2_147_483_647
    und = (
        undirected(edges)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    active = vertices_of(edges)
    parts: list[DataFrame] = []
    for r in range(1, rounds + 1):

        def h(c):
            return (F.lit(22853) * (c + F.lit(r * 1_000_003)) + 977) % P

        act_e = und.join(
            active.withColumnRenamed("id", "src"), "src", "leftsemi"
        ).join(active.withColumnRenamed("id", "dst"), "dst", "leftsemi")
        a_id, n_id = F.col("src"), F.col("dst")
        blocked = (
            act_e.filter(
                (h(n_id) < h(a_id)) | ((h(n_id) == h(a_id)) & (n_id < a_id))
            )
            .select(a_id.alias("id"))
            .distinct()
        )
        winners = _checkpoint(active.join(blocked, "id", "left_anti"))
        parts.append(winners.withColumn("color", F.lit(r).cast("int")))
        active = _checkpoint(
            active.join(winners.select("id"), "id", "left_anti")
        )
        if active.count() == 0:
            break
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def msf_boruvka(
    edges: DataFrame, weight_col: str = "weight", max_iter: int = 20
) -> DataFrame:
    """Minimum spanning forest by Boruvka's algorithm — the textbook
    distributed MST (the standard Pregel/GraphX example): every component
    picks its minimum-weight outgoing edge, all picks join the forest at
    once, components contract, repeat. With distinct weights (ties broken
    by (weight, a, b), making the MSF unique regardless) the picked edges
    never close a cycle, so components at least halve per round —
    O(log V) rounds. Returns the forest edge list (a, b, weight).

    Per round: one broadcast-sized join of edges to the component map,
    one per-component min via row_number, then contraction by hash-min
    connected components over the PICKED edges only (component-count
    sized, shrinking geometrically). No SQL oracle exists (nested
    iteration: CC inside Boruvka rounds) — the registry entry is a
    rows-only check; tests/test_graph.py pins the exact edge set against
    an independent plain-Python Kruskal on the same input.
    Cypher analog: none in the reference (extension per SURVEY §2.K).
    """
    # least/greatest canonicalization already folds both directions, so no
    # undirected view is needed (it would also drop the weight column)
    canon = (
        edges.select("src", "dst", weight_col)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
    )
    canon = _checkpoint(canon)
    # Size shuffles to the edge count for the whole nested loop (Boruvka
    # rounds x inner-CC rounds are MANY small keyed shuffles; 32 empty
    # tasks per shuffle on a 1.5k-edge graph was pure scheduler overhead
    # — same sizing rule as transitive_closure). Measured 287s -> far
    # less at sf0.1; a billion-edge input still gets thousands. Scoped
    # (save/restore): every round checkpoints eagerly, so all the tuned
    # shuffles run inside the `with` and later unrelated queries on the
    # shared session see the caller's original parallelism.
    n_edges = canon.count()
    target = max(4, min(n_edges // 50_000 + 1, 4096))
    comp = vertices_of(canon.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    comp = comp.withColumn("component", F.col("id"))
    forest = None
    with _scoped_shuffle_partitions(edges.sparkSession, target):
        for _ in range(max_iter):
            ca = comp.select(F.col("id").alias("a"), F.col("component").alias("cca"))
            cb = comp.select(F.col("id").alias("b"), F.col("component").alias("ccb"))
            live = (
                canon.join(ca, "a").join(cb, "b").filter(F.col("cca") != F.col("ccb"))
            )
            live = _checkpoint(live.select("a", "b", "w", "cca", "ccb"))
            if live.isEmpty():
                break
            cands = live.select(
                F.col("cca").alias("c"), "w", "a", "b"
            ).union(live.select(F.col("ccb").alias("c"), "w", "a", "b"))
            picked = (
                cands.withColumn(
                    "rn",
                    F.row_number().over(
                        Window.partitionBy("c").orderBy("w", "a", "b")
                    ),
                )
                .filter(F.col("rn") == 1)
                .select("a", "b", "w")
                .distinct()
            )
            picked = _checkpoint(picked)
            forest = picked if forest is None else forest.union(picked)
            # contract: CC over the picked component-graph, then remap
            cgraph = (
                picked.join(live.select("a", "b", "cca", "ccb").distinct(), ["a", "b"])
                .select(F.col("cca").alias("src"), F.col("ccb").alias("dst"))
            )
            remap = connected_components(cgraph).select(
                F.col("id").alias("component"), F.col("component").alias("newc")
            )
            comp = _checkpoint(
                comp.join(remap, "component", "left").select(
                    "id",
                    F.coalesce(F.col("newc"), F.col("component")).alias("component"),
                )
            )
    if forest is None:
        return canon.select("a", "b", F.col("w").alias("weight")).limit(0)
    return forest.select("a", "b", F.col("w").alias("weight"))


def k_truss(edges: DataFrame, k: int, max_rounds: int = 8) -> DataFrame:
    """k-truss subgraph: the maximal edge set where every edge closes at
    least k-2 triangles WITHIN the set — the cohesive-community family
    one notch stronger than k-core (every k-truss edge is in a
    (k-1)-core). No triangle/community query in the reference corpus;
    extension per SURVEY §2.K alongside triangle_count/k_core.

    Iterative edge peeling: per round, count each edge's triangle support
    via the id-ordered triangle join (same enumeration the triangle-count
    oracle uses), drop edges under k-2, repeat to fixpoint (early-exit on
    no change; bounded by max_rounds so the unrolled SQL oracle replays
    the identical computation). NB the id-ordered wedge join is chosen
    for oracle parity; on power-law graphs a hot low-id vertex makes it
    emit deg^2 wedges, so the 100x deployment swaps the enumeration for
    the degree-ordered orientation triangle_count uses (O(m^1.5) bound)
    — peeling logic unchanged. State is the surviving edge list only —
    peeling discards rows monotonically, and each round is two bounded
    shuffles (triangle join + support agg). Returns (a, b, support) with
    support counted in the FINAL subgraph.
    """
    canon = (
        undirected(edges)
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    canon = _checkpoint(canon)

    def support(es: DataFrame) -> DataFrame:
        e1, e2, e3 = es.alias("e1"), es.alias("e2"), es.alias("e3")
        tri = (
            e1.join(
                e2,
                (F.col("e2.a") == F.col("e1.a"))
                & (F.col("e2.b") > F.col("e1.b")),
            )
            .join(
                e3,
                (F.col("e3.a") == F.col("e1.b"))
                & (F.col("e3.b") == F.col("e2.b")),
            )
            .select(
                F.col("e1.a").alias("x"),
                F.col("e1.b").alias("y"),
                F.col("e2.b").alias("z"),
            )
        )
        sides = (
            tri.select(F.col("x").alias("a"), F.col("y").alias("b"))
            .union(tri.select(F.col("x").alias("a"), F.col("z").alias("b")))
            .union(tri.select(F.col("y").alias("a"), F.col("z").alias("b")))
        )
        return sides.groupBy("a", "b").agg(F.count("*").alias("s"))

    n = canon.count()
    for _ in range(max_rounds):
        # LEFT join + coalesce: an edge closing zero triangles has no
        # support row; under an inner join it would vanish even when
        # k <= 2 (where every edge trivially satisfies s >= k-2).
        keep = (
            canon.join(support(canon), ["a", "b"], "left")
            .filter(F.coalesce(F.col("s"), F.lit(0)) >= k - 2)
            .select("a", "b")
        )
        keep = _checkpoint(keep)
        m = keep.count()
        if m == n:
            break
        canon, n = keep, m
    return (
        canon.join(support(canon), ["a", "b"], "left")
        .select(
            "a",
            "b",
            F.coalesce(F.col("s"), F.lit(0)).cast("int").alias("support"),
        )
    )


def core_numbers(edges: DataFrame, n_rounds: int = 20) -> DataFrame:
    """Per-vertex core number (coreness: the largest k such that the
    vertex survives in the k-core) by H-index iteration (Lu, Zhou et al.
    2016, "The H-index of a network node and its relation to degree and
    coreness"): initialize every vertex at its degree, then repeatedly set
    c(v) to the H-index of its neighbors' current values — the largest h
    such that >= h neighbors have value >= h. The sequence is monotone
    non-increasing and converges exactly to the core number; once
    converged, further rounds are the IDENTITY, so a fixed round count
    shared with the unrolled SQL oracle makes cross-engine equality hold
    by construction (the msf_boruvka argument) while a golden test pins
    true convergence at test scale.

    Per round: one (edges x estimates) equi-join and one per-vertex
    window max(least(rank, value)) — both shuffle on vertex id, state is
    exactly |V| rows, and rounds needed are the peeling depth (graph
    diameter worst case, O(log V) on the tree-plus-chain event graphs).
    Generalizes k_core (fixed k membership) to the full decomposition.
    Returns (id, core). Cypher analog: none in the reference (extension
    per SURVEY §2.K).
    """
    und_c = (
        undirected(edges)
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = und_c.union(und_c.select(F.col("b"), F.col("a"))).toDF("src", "dst")
    adj = _checkpoint(adj)
    est = (
        adj.groupBy("src").agg(F.count("*").alias("core"))
        .withColumnRenamed("src", "id")
    )
    est = _checkpoint(est)
    for _ in range(n_rounds):
        nb = adj.join(
            est.select(F.col("id").alias("dst"), F.col("core").alias("nv")),
            "dst",
        )
        w = Window.partitionBy("src").orderBy(F.desc("nv"), F.asc("dst"))
        est = _checkpoint(
            nb.withColumn("rn", F.row_number().over(w))
            .groupBy("src")
            .agg(F.max(F.least(F.col("rn").cast("long"), F.col("nv")))
                 .alias("core"))
            .withColumnRenamed("src", "id")
        )
    return est


def hyperball_nf(edges: DataFrame, n_rounds: int = 8) -> DataFrame:
    """HyperBall (Boldi & Vigna 2013): the neighborhood function N(t) —
    how many (source, target) pairs lie within distance t — estimated by
    giving every vertex a mergeable HLL register TABLE of its ball and,
    per round, max-merging each vertex's sketch with its neighbors'.
    THE at-scale distance-distribution / effective-diameter algorithm:
    exact all-pairs BFS is O(V*E), this is n_rounds scans of a
    (vertex, bucket) register table whose size is <= 16|V| rows no matter
    the graph, and every step is an equi-join + groupBy-max — the same
    mergeable-sketch property the rollup queries use, lifted onto graph
    iteration.

    Uses the md5-hashed HLL from operators/sketch.py (pseudorandom AND
    portable — the affine family's bucket cycle over-spreads consecutive
    ids and biases small-ball linear counting), so every register, merge,
    and floored estimate replays exactly in SQL: the per-round output
    (t, nf_sum, avg_ball) is value-oracle-able. Fixed round count, merge
    is idempotent past the ball fixpoint — the shared cap makes oracle
    equality hold by construction (msf_boruvka argument); rounds >=
    diameter give the full distance distribution.
    Cypher analog: none in the reference (extension per SURVEY §2.K).
    """
    from esco_neo4j_spark.operators.sketch import hll_estimate_md5

    und_c = (
        undirected(edges)
        .select(F.least("src", "dst").alias("a"),
                F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    adj = und_c.union(und_c.select(F.col("b"), F.col("a"))).toDF("src", "dst")
    adj = _checkpoint(adj)
    verts = vertices_of(adj)
    # init: each vertex's sketch holds exactly itself
    from esco_neo4j_spark.operators.sketch import hll_registers_md5

    sk = _checkpoint(hll_registers_md5(verts.select("id"), "id", ["id"]))
    rounds = []
    for t in range(1, n_rounds + 1):
        msgs = adj.join(
            sk.select(F.col("id").alias("src"), "bucket", "rho"), "src"
        ).select(F.col("dst").alias("id"), "bucket", "rho")
        sk = _checkpoint(
            sk.select("id", "bucket", "rho").union(msgs)
            .groupBy("id", "bucket").agg(F.max("rho").alias("rho"))
        )
        est = hll_estimate_md5(sk, ["id"])
        rounds.append(
            est.agg(
                F.lit(t).cast("int").alias("t"),
                F.sum("approx").cast("long").alias("nf_sum"),
                F.round(
                    F.sum("approx") / F.count("*"), 6
                ).alias("avg_ball"),
            )
        )
    out = rounds[0]
    for r in rounds[1:]:
        out = out.union(r)
    return out.orderBy("t")
