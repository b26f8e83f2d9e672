"""Persisted layered ANN index: build once, serve many, maintain
incrementally (r10, r9 verdict item 1).

The reference ships its vector-index capability as a server-side index
created once at ingest and queried many times
(reference: src/esco_ingest.py:270-330 — ``CREATE VECTOR INDEX`` +
``db.index.vector.queryNodes``). The registered
``vec_graph_search_layered`` query carries the layered (HNSW-shape)
search's CORRECTNESS contract, but it derives every per-layer kNN graph
in-plan — at sf10 that is ~88s of which the actual walk is O(beam ·
rounds) seconds. A 100 TB deployment must not pay the build per query;
this module splits the index into the three faces a production vector
store has:

- **build** (`build_layered_index`): derive the per-layer kNN graphs
  exactly as the inline plan does — same footer-derived
  degree/beam/cand_cap (derive_gs_params), per-layer banding
  (derive_lsh_params on the LAYER's row count), level coin
  (_GS_LVL_SQL's Knuth hash) and ring knee (derive_knn_ring) — and
  persist ONE swap root holding three tables: ``graph`` (all layer
  edges, partitioned by ``(stride, pbucket)`` — stride 1 = the base
  graph, pbucket = Knuth-hash bucket of ``src``), ``vectors`` (the
  non-null embeddings, partitioned by ``vbucket`` and sorted by
  ``vec_id`` so id-list predicates prune at the row-group level too),
  and ``members`` (each coarse layer's node ids, partitioned by
  ``stride``). Everything swaps atomically
  under the crash-safe rename contract (sources/merge.py — the same
  swap cli.py's translate and the IVF index use; `recover_swap` runs at
  every entry) with ``_MANIFEST.json`` pinning the full derivation.
- **serve** (`serve_layered`): the registered
  ``vec_graph_search_layered_indexed`` face — descend the STORED coarse
  layers, then walk the stored base graph, touching ONLY the partitions
  the frontier hashes into. The walk state (visited ids + scores) is
  bounded by construction INDEPENDENT of corpus size — top layer holds
  [_GS_LAYER_MIN, M·_GS_LAYER_MIN) nodes by the _gs_strides stop rule,
  every later frontier is ≤ max(entries, beam) ids and every expansion
  ≤ frontier·degree — so it lives driver-side (the bounded-algorithm-
  state pattern of the k-means centroids and MMR pool), while every
  read stays a distributed pruned scan: frontier ids become literal
  ``pbucket/vbucket IN (…)`` partition filters, so the parquet listing
  prunes to O(frontier) of the ``nb`` hash buckets instead of scanning
  N rows per round. Scoring runs in Spark on the pruned rows via the
  pure-JVM ``cosine_similarity`` HOF chain — the expression twin the
  Arrow scorer is bit-pinned against — with the scorer's exact NULL
  semantics (non-finite element → NULL) and JVM-side 6dp rounding, so
  results match the inline query and the shared DuckDB oracle exactly
  (a stale or corrupt artifact fails the value check instead of
  silently serving garbage). No Python worker ever starts: the HOF
  chain is interpreted, which loses to Arrow on full-corpus passes
  (the r5 measurement) but wins on serve's bounded candidate sets
  (≤ beam·degree rows/job), where Python-worker spin-up and per-job
  Arrow transfer dominated a measured ~6s of a 16s serve. At 100 TB
  the same shape holds: serve reads O(frontier · N/nb) bytes per round
  with nb derived from the footer count, vs the inline plan's O(N) per
  round.
- **maintain** (streaming/layered.py): per-layer incremental inserts
  with the hashed level coin, reusing streaming/knn.py's insert-only,
  effectively-once contract per layer.

Staleness is manifest-pinned, never guessed: `ensure_layered_index`
compares the stored manifest against `expected_manifest(sf_dir)` —
corpus row count from the parquet footer, ALGO_VERSION (bumped whenever
graph construction semantics change, e.g. the r10 ring-salt
decorrelation), the bucket count ``nb`` and every derived parameter —
and rebuilds on any mismatch. At 100 TB the same contract holds: the
index is a warehouse artifact keyed by (corpus snapshot, algo version),
rebuilt by a batch job and swapped in atomically, while serving reads
whichever complete copy is live.
"""

from __future__ import annotations

import json
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALGO_VERSION = 2  # r10: XOR-decorrelated per-table ring orders

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DEFAULT_INDEX_ROOT = os.path.join(_REPO_ROOT, ".ann_index")

# Knuth multiplicative hash — the repo-wide level coin
# (plans/vector_queries._GS_LVL_SQL, streaming/layered.py). Bucket ids
# reuse it so build (Spark SQL) and serve (driver Python) agree by
# construction; _gs_lvl_guard bounds ids so id*K < 2^63 on both sides.
_KNUTH = 2654435761
_M32 = 4294967296


def derive_nb(n: int) -> int:
    """Hash-bucket count for the artifact's graph/vectors tables — pure
    footer arithmetic like every other scale-adaptive constant. Serve
    reads O(frontier) buckets of ~2k src ids each, but it must first
    LIST the partition directories, and that listing is paid on every
    cold open — measured at sf10 (n=200k): n//512 = 390 buckets ×
    (layers+1) dirs cost 4.7s of parallel-discovery jobs vs ~1s at
    n//2048 = 97, while the pruned-read side stays trivially small
    either way (a 2k-id bucket of degree-16 edges is ~0.6 MB). The cap
    keeps the dir count object-store-friendly at 100 TB (4096 buckets ×
    a handful of strides ≈ 20k dirs, one LIST page per thousand)."""
    return max(8, min(4096, n // 2048))


def _bucket_sql(col, nb: int):
    return ((col * F.lit(_KNUTH)) % F.lit(_M32)) % F.lit(nb)


def _bucket_py(i: int, nb: int) -> int:
    return ((i * _KNUTH) % _M32) % nb


def index_dir_for(sf_dir: str, root: str = DEFAULT_INDEX_ROOT) -> str:
    """One artifact directory per corpus directory (slug of the abs
    path; the manifest, not the slug, is the integrity check)."""
    slug = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    return os.path.join(root, slug)


def _layers_path(index_dir: str) -> str:
    return os.path.join(index_dir, "layers")


def expected_manifest(sf_dir: str) -> dict:
    """The full derivation the build would use for ``sf_dir`` RIGHT NOW
    — corpus footer row count, algo version, bucket count, and every
    per-layer parameter. Pure arithmetic over the footer count (the
    shared Spark/DuckDB derivation discipline), so build, serve,
    maintenance and the oracle all agree by construction."""
    from esco_neo4j_spark.catalog import table_rowcount
    from esco_neo4j_spark.operators.similarity import (
        derive_knn_ring,
        derive_lsh_params,
    )
    from esco_neo4j_spark.plans.vector_queries import (
        _gs_strides,
        derive_gs_params,
    )

    n = table_rowcount(sf_dir, "embeddings")
    degree, beam, cand_cap = derive_gs_params(n)
    layers = []
    for s in list(_gs_strides(n)) + [1]:
        layer_n = -(-n // s)
        n_planes, n_tables = derive_lsh_params(layer_n, base_tables=8)
        layers.append(
            {
                "stride": s,
                "n_planes": n_planes,
                "n_tables": n_tables,
                "ring": derive_knn_ring(layer_n, cand_cap, n_tables),
            }
        )
    return {
        "algo_version": ALGO_VERSION,
        "n": n,
        "dim": 64,
        "seed": 42,
        "degree": degree,
        "beam": beam,
        "cand_cap": cand_cap,
        "nb": derive_nb(n),
        "layout": 4,  # bump on any table-layout change so stale
        # artifacts rebuild instead of misreading (4 = r11 file-listing
        # manifest: artifacts without _FILES.json must rebuild)
        "layers": layers,
    }


def _strip_fs_sidecars(root: str) -> None:
    """Remove write-time filesystem sidecars (`.*.crc`, `_SUCCESS`) from
    a finished artifact tree. See the call site in build_layered_index
    for the measured rationale; idempotent and safe on a tree no writer
    touches again (the swap makes the artifact immutable)."""
    for dirpath, _dirnames, filenames in os.walk(root):
        for fn in filenames:
            if fn == "_SUCCESS" or (fn.startswith(".") and fn.endswith(".crc")):
                try:
                    os.remove(os.path.join(dirpath, fn))
                except FileNotFoundError:  # concurrent sweep; harmless
                    pass


# ---------------------------------------------------------------------------
# File-listing manifest (r11, guide §6 "table formats with manifest
# metadata avoid directory listing altogether"). The r10 artifact made
# every pruned READ flat-in-N, but the cold OPEN still directory-listed
# all three partition trees — measured 8.5s of `_open_index` listing at
# sf30 with a cold dentry cache (1.0s warm sf10). A bucket→files
# manifest written at build makes the open O(1): serve resolves every
# pruned read to explicit file paths (basePath keeps the partition
# columns, so the PartitionFilters pins stay meaningful) and nothing
# ever LISTs a directory on the serve path. seed ids (the lowest stored
# vec_ids, a pure function of the corpus the oracle re-derives) ride
# along so the base-seed/batch-anchor steps stop paying the one
# remaining full-table scan's listing as well.

_TABLES = ("graph", "vectors", "members")
_FILES_NAME = "_FILES.json"
_SEED_IDS_STORED = 64  # >= max(_GS_ENTRIES, _GS_BATCH) with headroom


def _write_files_manifest(spark: SparkSession, tmp: str) -> None:
    """Walk the finished (sidecar-stripped, pre-swap) artifact tree once
    and persist: per table, partition-dir -> parquet file names; each
    table's full read schema (data + partition columns, captured from
    one read-back so serve never infers); and the lowest stored vec_ids
    for seeds/anchors. Build-time cost: one warm-cache walk + 3 schema
    inferences + one vec_id-only scan."""
    out: dict = {"version": 1, "tables": {}, "schemas": {}}
    for t in _TABLES:
        troot = os.path.join(tmp, t)
        bydir: dict[str, list[str]] = {}
        for dirpath, _dirnames, filenames in os.walk(troot):
            pq = sorted(f for f in filenames if f.endswith(".parquet"))
            if pq:
                bydir[os.path.relpath(dirpath, troot)] = pq
        out["tables"][t] = bydir
        out["schemas"][t] = spark.read.parquet(troot).schema.json()
    out["seed_ids"] = [
        r["vec_id"]
        for r in spark.read.parquet(os.path.join(tmp, "vectors"))
        .select("vec_id")
        .orderBy("vec_id")
        .limit(_SEED_IDS_STORED)
        .collect()
    ]
    with open(os.path.join(tmp, _FILES_NAME), "w") as f:
        json.dump(out, f, sort_keys=True)


class _IndexHandle:
    """Everything a serve needs to read the artifact without listing:
    the derivation manifest, the file manifest, and the root path."""

    __slots__ = ("root", "manifest", "files", "schemas", "seed_ids")

    def __init__(self, root: str, manifest: dict, fm: dict):
        self.root = root
        self.manifest = manifest
        self.files = fm["tables"]
        self.schemas = fm["schemas"]
        self.seed_ids = list(fm["seed_ids"])


def _read_parts(
    spark: SparkSession,
    ix: "_IndexHandle",
    table: str,
    parts: list[str] | None = None,
) -> DataFrame:
    """A DataFrame over ONLY the named partition dirs of one artifact
    table (None = the whole table), built from the file manifest's
    explicit paths — no directory is ever listed. basePath keeps
    stride/pbucket/vbucket as real partition columns so the callers'
    partition-column filters still appear as PartitionFilters, and the
    pinned schema skips footer inference."""
    import pyspark.sql.types as T

    bydir = ix.files[table]
    keys = (
        sorted(bydir)
        if parts is None
        else [p for p in parts if p in bydir]
    )
    base = os.path.join(ix.root, table)
    paths = [
        os.path.join(base, d, fn) for d in keys for fn in bydir[d]
    ]
    schema = T.StructType.fromJson(json.loads(ix.schemas[table]))
    if not paths:
        return spark.createDataFrame([], schema)
    # explicit file paths still go through partition discovery (to bind
    # the partition-column values); above 32 paths Spark would launch a
    # discovery JOB with one task per path — pure scheduling overhead
    # for a driver-local stat of a few hundred files (the r10 4.7s
    # trap). Force driver-side discovery for the artifact reads only.
    disc_key = "spark.sql.sources.parallelPartitionDiscovery.threshold"
    prev_disc = spark.conf.get(disc_key, None)
    spark.conf.set(disc_key, "1000000")
    try:
        return (
            spark.read.schema(schema)
            .option("basePath", base)
            .parquet(*paths)
        )
    finally:
        if prev_disc is None:
            spark.conf.unset(disc_key)
        else:
            spark.conf.set(disc_key, prev_disc)


def build_layered_index(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> dict:
    """Build all layer graphs (top coarse layers + the stride-1 base),
    the packed-vector table and the coarse-layer membership table, and
    swap them in atomically. Returns the written manifest.

    The per-layer graph is bit-identical to what the inline
    ``vec_graph_search_layered`` plan derives: same level-coin layer
    membership, same footer-derived banding and ring, same
    ``lsh_knn_graph`` construction — which is what lets the DuckDB
    oracle replay the STORED graphs from the manifest params alone."""
    from esco_neo4j_spark.operators.similarity import lsh_knn_graph
    from esco_neo4j_spark.plans.vector_queries import _gs_lvl, _gs_lvl_guard

    _gs_lvl_guard(sf_dir)
    manifest = expected_manifest(sf_dir)
    nb = manifest["nb"]
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    parts = []
    member_parts = []
    for layer in manifest["layers"]:
        s = layer["stride"]
        src = (
            emb
            if s == 1
            else emb.filter(_gs_lvl(F.col("vec_id")) < _M32 // s)
        )
        if s > 1:
            # membership mirrors the inline plan's entry set: non-null
            # embeddings only (the inline entries derive from
            # e = emb.filter(embedding IS NOT NULL))
            member_parts.append(
                src.filter(F.col("embedding").isNotNull()).select(
                    F.lit(s).cast("int").alias("stride"), "vec_id"
                )
            )
        g = lsh_knn_graph(
            src,
            k=manifest["degree"],
            cand_cap=manifest["cand_cap"],
            n_planes=layer["n_planes"],
            n_tables=layer["n_tables"],
            seed=manifest["seed"],
            ring_window=layer["ring"],
        ).select(
            F.lit(s).cast("int").alias("stride"),
            "src",
            "nbr",
            "score",
            "rk",
        )
        parts.append(g)
    all_layers = parts[0]
    for p in parts[1:]:
        all_layers = all_layers.unionByName(p)
    all_layers = all_layers.withColumn(
        "pbucket", _bucket_sql(F.col("src"), nb).cast("int")
    )
    members = member_parts[0]
    for p in member_parts[1:]:
        members = members.unionByName(p)
    # label rides along as a stored METADATA column — the payload a
    # production vector store keeps beside the vectors so filtered
    # search never has to join back to the corpus (serve_layered's
    # label_filter face); row-group stats on it prune within buckets.
    vectors = (
        emb.filter(F.col("embedding").isNotNull())
        .select(
            "vec_id",
            _bucket_sql(F.col("vec_id"), nb).cast("int").alias("vbucket"),
            "label",
            "embedding",
        )
    )

    path = _layers_path(index_dir)
    tmp, old = path + "__merging", path + "__old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    (
        all_layers.repartition("stride", "pbucket")
        .sortWithinPartitions("stride", "pbucket", "src")
        .write.mode("overwrite")
        .partitionBy("stride", "pbucket")
        .parquet(os.path.join(tmp, "graph"))
    )
    (
        vectors.repartition("vbucket")
        .sortWithinPartitions("vbucket", "vec_id")
        .write.mode("overwrite")
        .partitionBy("vbucket")
        .parquet(os.path.join(tmp, "vectors"))
    )
    (
        members.repartition("stride")
        .sortWithinPartitions("stride", "vec_id")
        .write.mode("overwrite")
        .partitionBy("stride")
        .parquet(os.path.join(tmp, "members"))
    )
    # The artifact is read-mostly: Hadoop's LocalFileSystem leaves a
    # `.<file>.crc` sidecar beside every parquet file (plus `_SUCCESS`
    # markers), which DOUBLES the filesystem objects the cold serve-open
    # lists AND makes every pruned per-round read verify a whole-file
    # checksum. Note the residual protection honestly (r10 ADVICE):
    # parquet page-checksum VERIFICATION is off by default
    # (parquet.page.verify-checksum.enabled=false), so after the strip
    # the integrity net is the manifest match + the oracle value checks,
    # not a read-time checksum; flip that parquet conf on serve reads if
    # artifact corruption is ever suspected.
    # Stripping them after the write, before the swap, measured the
    # sf30 cold-cache serve 36.2->28.0s / 50.7->32.9s / 22.0->19.0s on
    # three drop_caches A/B pairs with bit-identical output (r10).
    # ChecksumFileSystem skips verification when no sidecar exists, so
    # reads stay correct; artifacts built before this strip keep their
    # sidecars (and the old read behavior) until their next rebuild.
    _strip_fs_sidecars(tmp)
    # file-listing manifest AFTER the strip (it records the final file
    # set), BEFORE the derivation manifest (a tree with _MANIFEST.json
    # is treated as complete by the swap recovery)
    _write_files_manifest(spark, tmp)
    with open(os.path.join(tmp, "_MANIFEST.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)
    return manifest


def read_manifest(index_dir: str) -> dict | None:
    mp = os.path.join(_layers_path(index_dir), "_MANIFEST.json")
    if not os.path.exists(mp):
        return None
    try:
        with open(mp) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _read_files_manifest(index_dir: str) -> dict | None:
    fp = os.path.join(_layers_path(index_dir), _FILES_NAME)
    try:
        with open(fp) as f:
            fm = json.load(f)
    except (OSError, ValueError):
        return None
    if not all(
        k in fm for k in ("tables", "schemas", "seed_ids")
    ) or set(_TABLES) - set(fm["tables"]):
        return None
    return fm


def ensure_layered_index(
    spark: SparkSession, sf_dir: str, index_dir: str | None = None
) -> str:
    """Serve-side entry: recover any interrupted swap, then rebuild iff
    the stored manifest does not EXACTLY match today's derivation for
    ``sf_dir`` (missing/corrupt manifest, different corpus row count,
    different algo version, bucket count or any derived parameter).
    Returns the index directory."""
    from esco_neo4j_spark.sources.merge import recover_swap

    if index_dir is None:
        index_dir = index_dir_for(sf_dir)
    os.makedirs(index_dir, exist_ok=True)
    recover_swap(_layers_path(index_dir))
    if (
        read_manifest(index_dir) != expected_manifest(sf_dir)
        or _read_files_manifest(index_dir) is None
    ):
        build_layered_index(spark, sf_dir, index_dir)
    return index_dir


def load_layer(
    spark: SparkSession, index_dir: str, stride: int
) -> DataFrame:
    """(src, nbr) edges of one stored layer — partition-pruned scan."""
    return (
        spark.read.parquet(os.path.join(_layers_path(index_dir), "graph"))
        .filter(F.col("stride") == stride)
        .select("src", "nbr")
    )


def _pruned_edges(
    spark: SparkSession, ix: _IndexHandle, stride: int, ids: list[int]
):
    """One layer's out-edges of ``ids``, reading only the hash buckets
    the ids land in: the file manifest resolves ``stride``/``pbucket``
    to explicit file paths (no directory LIST at all — r11), and the
    same literal IN lists stay on the scan as PartitionFilters (pinned
    in tests/test_ann_index.py), so the read is O(|ids| · N/nb) instead
    of O(N·degree)."""
    nb = ix.manifest["nb"]
    buckets = sorted({_bucket_py(i, nb) for i in ids})
    parts = [
        os.path.join(f"stride={stride}", f"pbucket={b}") for b in buckets
    ]
    return (
        _read_parts(spark, ix, "graph", parts)
        .filter(
            (F.col("stride") == stride)
            & F.col("pbucket").isin(buckets)
            & F.col("src").isin(ids)
        )
        .select("nbr")
    )


def _anchor_score_col(anchor: list[float]):
    """The serve-side scoring expression: the pure-JVM
    ``cosine_similarity`` HOF chain (bit-pinned against the Arrow
    scorer, tests/test_similarity.py) wrapped with the Arrow scorer's
    exact NULL contract — any non-finite stored element scores NULL
    (the pudf masks those rows), and so does a finite zero-norm vector
    — the pudf computes 0/0 = NaN but Arrow's object-dtype conversion
    maps NaN to null on the way back (pandas missing-value semantics;
    verified empirically against the pudf in tests/test_ann_index.py),
    and spelling it as a CASE arm also keeps ANSI mode from erroring
    the chain's division. A null element needs no CASE arm: it poisons
    the fold to NULL on the chain exactly as the pudf returns None for
    it (a null element also nulls both predicates, falling through to
    the chain)."""
    from esco_neo4j_spark.functions.vector import cosine_similarity, l2_norm

    emb = F.col("embedding")
    null_score = F.exists(
        emb, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    ) | (l2_norm(emb) == F.lit(0.0))
    return F.round(
        F.when(null_score, F.lit(None).cast("double")).otherwise(
            cosine_similarity(emb, anchor)
        ),
        6,
    )


def _pruned_vectors(
    spark: SparkSession, ix: _IndexHandle, ids: list[int]
) -> DataFrame:
    """The stored vector rows of ``ids`` — file-manifest-resolved to the
    ids' vbuckets (no LIST) with the id list pushed into the parquet
    scan (row-group pruning on the sorted vec_id)."""
    nb = ix.manifest["nb"]
    buckets = sorted({_bucket_py(i, nb) for i in ids})
    parts = [f"vbucket={b}" for b in buckets]
    return _read_parts(spark, ix, "vectors", parts).filter(
        F.col("vbucket").isin(buckets) & F.col("vec_id").isin(ids)
    )


def _score_ids(
    spark: SparkSession,
    ix: _IndexHandle,
    anchor: list[float],
    ids: list[int],
) -> dict[int, float | None]:
    """Exact anchor-cosine scores for ``ids`` from the stored vector
    table — pruned via `_pruned_vectors`, scored by the JVM HOF chain
    and 6dp-rounded JVM-side like every other scoring site. Ids without
    a stored vector (null embedding in the corpus) are simply absent,
    matching the inner join the inline plan does."""
    if not ids:
        return {}
    rows = (
        _pruned_vectors(spark, ix, ids)
        .select("vec_id", _anchor_score_col(anchor).alias("score"))
        .collect()
    )
    return {r["vec_id"]: r["score"] for r in rows}


def _rank_key(item):
    """Driver-side mirror of Spark's ORDER BY score DESC, vec_id ASC
    over nullable doubles: NaN sorts ABOVE every double (Spark treats
    NaN as the largest double), NULL sorts LAST (desc_nulls_last is the
    desc default), ties break by vec_id ascending."""
    vid, s = item
    if s is None:
        return (2, 0.0, vid)
    if math.isnan(s):
        return (0, 0.0, vid)
    return (1, -s, vid)


def _open_index(spark: SparkSession, index_dir: str) -> _IndexHandle:
    """Open the artifact once per serve: two JSON reads (derivation
    manifest + file manifest) and NOTHING else — no directory is listed
    and no Spark job runs. r10 opened by listing all three partition
    trees up front, which a cold dentry cache billed 8.5s at sf30; the
    file manifest (guide §6, the Iceberg-style argument) makes the open
    O(1) and every later read resolves its partitions to explicit file
    paths."""
    manifest = read_manifest(index_dir)
    if manifest is None:
        raise ValueError(f"no layered index manifest under {index_dir}")
    fm = _read_files_manifest(index_dir)
    if fm is None:
        raise ValueError(
            f"no file-listing manifest under {index_dir} — artifact "
            "predates layout 4; ensure_layered_index rebuilds it"
        )
    return _IndexHandle(_layers_path(index_dir), manifest, fm)


def serve_layered(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    label_filter: int | None = None,
) -> DataFrame:
    """The SERVE face: layered descent + base beam walk over the STORED
    graphs — no graph construction and no full-corpus pass anywhere.

    ``label_filter`` is the FILTERED-search face (the metadata-filtered
    ANN every production vector store offers): navigation is
    UNCHANGED — the walk explores the unfiltered graph, because
    filtering the graph itself would disconnect it under selective
    predicates — and the predicate applies at the FINAL ranking, over
    the visited set's stored ``label`` metadata (one extra pruned read
    of the visited ids; the index carries label precisely so this
    never joins back to the corpus). Post-filter-over-navigation can
    underfill k when fewer than k eligible ids were visited — that is
    the documented trade of filtered graph-ANN (vs the exact pre-filter
    scan ``vec_filtered_topk`` carries), and the oracle replays the
    same semantics so underfill is value-checked, not hidden.
    Mirrors plans/vector_queries.vec_graph_search_layered step for step
    (same exhaustive top-layer entry, per-layer expand-and-rerank
    descent, descent-∪-diversity base seeds, same tie-breaking), so its
    output is bit-identical to the inline query's and the shared DuckDB
    oracle replays it (pinned in tests/test_ann_index.py).

    The walk state is bounded INDEPENDENT of corpus size — top layer
    < M·_GS_LAYER_MIN nodes by the _gs_strides stop rule, later
    frontiers ≤ max(_GS_ENTRIES, beam), expansions ≤ frontier·degree —
    so ids and scores live driver-side (the repo's bounded-algorithm-
    state pattern) while every read is a pruned distributed scan of the
    frontier's hash buckets. The heavy column (the stored vector) never
    leaves the executors unscored: scoring happens in Spark on the
    pruned rows and only (id, 6dp score) rows return."""
    from esco_neo4j_spark.plans.vector_queries import (
        _GS_ENTRIES,
        _GS_K,
        _GS_ROUNDS,
    )

    ix = _open_index(spark, index_dir)
    manifest = ix.manifest
    # The anchor (vec_id=0's embedding, plans/vector_queries._anchor_vec)
    # comes from the index's OWN vectors table — a one-bucket pruned
    # point lookup instead of a full corpus-table scan. Exactness: the
    # stored column IS the corpus's array<float> column, so the
    # collected anchor equals the inline query's to the last bit.
    row = (
        _pruned_vectors(spark, ix, [0]).select("embedding").first()
    )
    if row is None or row["embedding"] is None:
        raise ValueError("anchor vec_id=0 has no stored embedding")
    anchor = list(row["embedding"])

    entries: list[int] | None = None
    for layer in manifest["layers"]:
        s = layer["stride"]
        if s == 1:
            continue
        if entries is None:
            # exhaustive top-layer entry: the stored membership of the
            # coarsest layer ([32, 256) ids by the stride stop rule)
            entries = [
                r["vec_id"]
                for r in _read_parts(
                    spark, ix, "members", [f"stride={s}"]
                )
                .filter(F.col("stride") == s)
                .select("vec_id")
                .collect()
            ]
        nbrs = {
            r["nbr"]
            for r in _pruned_edges(spark, ix, s, entries).collect()
        }
        cand = sorted(set(entries) | nbrs)
        scored = _score_ids(spark, ix, anchor, cand)
        entries = [
            vid
            for vid, _ in sorted(scored.items(), key=_rank_key)[
                :_GS_ENTRIES
            ]
        ]

    # base seeds: the _GS_ENTRIES lowest non-null-embedding ids — the
    # same diversity seeds the inline plan takes. The file manifest
    # stores the lowest _SEED_IDS_STORED stored ids (a pure function of
    # the corpus), so this is a list slice instead of a full-table
    # vec_id scan whose listing grew with nb.
    seeds = ix.seed_ids[:_GS_ENTRIES]
    entry_ids = sorted(set(seeds) | set(entries or []))

    visited: dict[int, float | None] = _score_ids(
        spark, ix, anchor, entry_ids
    )
    # Per-walk edge memo (r11, guide §2.3 — read each src's adjacency
    # once): consecutive beams overlap heavily (the best ids stay in the
    # top beam), so later rounds re-read mostly-known buckets. Remember
    # each expanded src's neighbor set driver-side (bounded:
    # ≤ visited·degree ids) and fetch only never-expanded frontier ids.
    # The graph is static within a serve, so the union of neighbors is
    # identical to re-reading — values unchanged.
    edge_nbrs: dict[int, set[int]] = {}
    for _ in range(_GS_ROUNDS):
        frontier = [
            vid
            for vid, _ in sorted(visited.items(), key=_rank_key)[
                : manifest["beam"]
            ]
        ]
        miss = [i for i in frontier if i not in edge_nbrs]
        if miss:
            fetched: dict[int, set[int]] = {i: set() for i in miss}
            for r in _pruned_src_edges(spark, ix, 1, miss).collect():
                fetched[r["src"]].add(r["nbr"])
            edge_nbrs.update(fetched)
        nbrs: set[int] = set().union(
            *(edge_nbrs[i] for i in frontier)
        )
        new = sorted(nbrs - visited.keys())
        visited.update(_score_ids(spark, ix, anchor, new))

    # final ranking driver-side over the bounded visited set, via
    # `_rank_key` — the EXACT mirror of the window ordering the inline
    # walk ends with (row_number over desc score / asc vec_id,
    # operators/similarity.graph_beam_search; NaN above all doubles,
    # NULL last). A Spark window over ≤ beam·degree·rounds rows costs a
    # full extra job (~2.3s measured) for work a sort of a list does;
    # the parity and oracle tests pin that both rankings agree.
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    pool = visited
    if label_filter is not None:
        vids = sorted(visited.keys())
        eligible = {
            r["vec_id"]
            for r in _pruned_vectors(spark, ix, vids)
            .filter(F.col("label") == label_filter)
            .select("vec_id")
            .collect()
        }
        pool = {
            vid: s for vid, s in visited.items() if vid in eligible
        }

    ranked = sorted(pool.items(), key=_rank_key)[:_GS_K]
    out_schema = StructType(
        [
            StructField("vec_id", LongType(), True),
            StructField("score", DoubleType(), True),
            StructField("rk", IntegerType(), True),
        ]
    )
    return spark.createDataFrame(
        [(vid, s, i + 1) for i, (vid, s) in enumerate(ranked)],
        schema=out_schema,
    ).orderBy("rk")


def _pruned_src_edges(
    spark: SparkSession, ix: _IndexHandle, stride: int, ids: list[int]
):
    """``_pruned_edges`` with the src column kept — the batched serve
    reads ONE union-of-frontiers edge set per round and routes each
    edge back to the anchors whose frontier contains its src."""
    nb = ix.manifest["nb"]
    buckets = sorted({_bucket_py(i, nb) for i in ids})
    parts = [
        os.path.join(f"stride={stride}", f"pbucket={b}") for b in buckets
    ]
    return (
        _read_parts(spark, ix, "graph", parts)
        .filter(
            (F.col("stride") == stride)
            & F.col("pbucket").isin(buckets)
            & F.col("src").isin(ids)
        )
        .select("src", "nbr")
    )


def _anchor_score_multi_col(anchors: list[tuple[int, list[float]]]):
    """`_anchor_score_col` against B anchors as ONE array<double>
    column: transform over an array-of-anchors literal, the SAME
    chain + NULL wrapper applied per element. One copy of the chain in
    the expression tree instead of B — B separate `_anchor_score_col`
    columns measured ~1.5s of per-job analysis overhead at B=4 (vs
    ~0.6s for one chain), and the per-element lambda keeps the tree
    size O(B·dim literals + 1 chain), so batch width scales without
    growing the plan. Arithmetic per element is the identical fold
    over identical doubles, so scores are bit-identical to the
    single-anchor column (pinned via the batch==single serve test)."""
    from esco_neo4j_spark.functions.vector import cosine_similarity, l2_norm

    emb = F.col("embedding")
    null_score = F.exists(
        emb, lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
    ) | (l2_norm(emb) == F.lit(0.0))
    avecs = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in vec]).cast(
                "array<double>"
            )
            for _, vec in anchors
        ]
    )
    return F.transform(
        avecs,
        lambda a: F.round(
            F.when(null_score, F.lit(None).cast("double")).otherwise(
                cosine_similarity(emb, a)
            ),
            6,
        ),
    )


def _score_ids_multi(
    spark: SparkSession,
    ix: _IndexHandle,
    anchors: list[tuple[int, list[float]]],
    ids: list[int],
) -> dict[int, list[float | None]]:
    """``_score_ids`` against B anchors in ONE pruned job: the scan is
    shared and `_anchor_score_multi_col` scores every anchor in one
    array column (identical arithmetic to the single-anchor serve, so
    per-anchor values are bit-identical to B independent serves).
    Returns id -> [score per anchor, in ``anchors`` order]."""
    if not ids:
        return {}
    rows = (
        _pruned_vectors(spark, ix, ids)
        .select(
            "vec_id", _anchor_score_multi_col(anchors).alias("s")
        )
        .collect()
    )
    return {r["vec_id"]: list(r["s"]) for r in rows}


def serve_layered_batch(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str,
    n_anchors: int,
) -> DataFrame:
    """BATCHED serve — ``n_anchors`` queries answered in ONE walk over
    the stored index, with the same NUMBER of Spark jobs as a single
    query. "Build once, serve many" made literal: a training-data
    pipeline evaluates ANN queries in batches, and the per-round fixed
    costs of the single serve (job scheduling, plan analysis, pruned-
    scan setup) are shared across the whole batch; only the data
    volume (union of frontiers/candidates) grows with B, sublinearly
    when anchors' walks overlap. Measured at sf10 (fresh JVM): B=4 in
    1.4× the single-serve wall (2.9× throughput), B=16 in 2.2×
    (7.3× throughput).

    Anchors are the ``n_anchors`` lowest-id stored vectors (anchor 0 is
    vec_id 0 — the single serve's anchor, so the batch strictly extends
    it; pinned in tests/test_ann_index.py). Each anchor runs the EXACT
    single-serve walk — shared exhaustive top-layer entry, per-layer
    expand-and-rerank, descent-∪-diversity seeds, `_rank_key` ordering
    — but the rounds advance in lockstep: one `_pruned_src_edges` read
    per round over the UNION of the B frontiers (edges routed back per
    anchor by src), one `_score_ids_multi` job per round scoring the
    union candidate set against all B anchors at once. Driver state is
    B × the single serve's bounded walk state. Output adds an ``aid``
    (anchor vec_id) column; per-aid rows are bit-identical to B single
    serves by construction, which is what lets the DuckDB oracle replay
    the batch as B independent descents over the same stored graphs."""
    from esco_neo4j_spark.plans.vector_queries import (
        _GS_ENTRIES,
        _GS_K,
        _GS_ROUNDS,
    )

    ix = _open_index(spark, index_dir)
    manifest = ix.manifest
    # anchors = the n_anchors lowest stored ids — a slice of the file
    # manifest's seed_ids plus a pruned embedding fetch, not a
    # full-table orderBy scan (fallback to the scan only if the request
    # exceeds the stored id list, which the registered faces never do)
    if n_anchors <= len(ix.seed_ids):
        aids = ix.seed_ids[:n_anchors]
        arows = (
            _pruned_vectors(spark, ix, aids)
            .select("vec_id", "embedding")
            .collect()
        )
        amap = {r["vec_id"]: list(r["embedding"]) for r in arows}
        anchors = [(i, amap[i]) for i in aids]
    else:
        anchors = [
            (r["vec_id"], list(r["embedding"]))
            for r in _read_parts(spark, ix, "vectors")
            .select("vec_id", "embedding")
            .orderBy("vec_id")
            .limit(n_anchors)
            .collect()
        ]
    if not anchors:
        raise ValueError("no stored vectors to anchor the batch on")
    B = len(anchors)

    # Per-walk memos (r11, guide §2.3): B anchors' walks converge on the
    # same hub region, so the union frontier/candidate sets of later
    # rounds are mostly ids some anchor already visited. An id's edge
    # set and its B-anchor score vector are deterministic within a
    # serve, so remember both driver-side (bounded: ≤ visited·degree
    # ids × B scores) and fetch only genuinely-new ids each round —
    # this is what pushes large-B batch wall toward flat instead of
    # re-reading/re-scoring the shared hubs every round.
    _absent = object()
    score_memo: dict[int, object] = {}

    def _scores_for(ids: list[int]) -> dict[int, list]:
        miss = [i for i in ids if i not in score_memo]
        if miss:
            got = _score_ids_multi(spark, ix, anchors, miss)
            for i in miss:
                score_memo[i] = got.get(i, _absent)
        return {
            i: score_memo[i]
            for i in ids
            if score_memo[i] is not _absent
        }

    edge_memo: dict[int, set[int]] = {}

    def _base_nbrs(ids: list[int]) -> dict[int, set[int]]:
        miss = [i for i in ids if i not in edge_memo]
        if miss:
            fetched: dict[int, set[int]] = {i: set() for i in miss}
            for r in _pruned_src_edges(spark, ix, 1, miss).collect():
                fetched[r["src"]].add(r["nbr"])
            edge_memo.update(fetched)
        return edge_memo

    entries: list[list[int]] | None = None
    for layer in manifest["layers"]:
        s = layer["stride"]
        if s == 1:
            continue
        if entries is None:
            top = [
                r["vec_id"]
                for r in _read_parts(
                    spark, ix, "members", [f"stride={s}"]
                )
                .filter(F.col("stride") == s)
                .select("vec_id")
                .collect()
            ]
            entries = [list(top) for _ in range(B)]
        union_entries = sorted(set().union(*map(set, entries)))
        src_nbrs: dict[int, set[int]] = {}
        for r in _pruned_src_edges(
            spark, ix, s, union_entries
        ).collect():
            src_nbrs.setdefault(r["src"], set()).add(r["nbr"])
        cands = [
            sorted(
                set(e)
                | set().union(
                    *(src_nbrs.get(i, set()) for i in e)
                )
            )
            for e in entries
        ]
        union_cand = sorted(set().union(*map(set, cands)))
        scored = _scores_for(union_cand)
        entries = [
            [
                vid
                for vid, _ in sorted(
                    (
                        (vid, scored[vid][j])
                        for vid in cands[j]
                        if vid in scored
                    ),
                    key=_rank_key,
                )[:_GS_ENTRIES]
            ]
            for j in range(B)
        ]

    seeds = ix.seed_ids[:_GS_ENTRIES]
    entry_ids = [
        sorted(set(seeds) | set(e)) for e in (entries or [[]] * B)
    ]
    union_entry = sorted(set().union(*map(set, entry_ids)))
    entry_scores = _scores_for(union_entry)
    visited: list[dict[int, float | None]] = [
        {
            vid: entry_scores[vid][j]
            for vid in entry_ids[j]
            if vid in entry_scores
        }
        for j in range(B)
    ]
    for _ in range(_GS_ROUNDS):
        frontiers = [
            [
                vid
                for vid, _ in sorted(v.items(), key=_rank_key)[
                    : manifest["beam"]
                ]
            ]
            for v in visited
        ]
        union_frontier = sorted(set().union(*map(set, frontiers)))
        src_nbrs = _base_nbrs(union_frontier)
        news = [
            sorted(
                set().union(
                    *(src_nbrs.get(i, set()) for i in frontiers[j])
                )
                - visited[j].keys()
            )
            for j in range(B)
        ]
        union_new = sorted(set().union(*map(set, news)))
        new_scores = _scores_for(union_new)
        for j in range(B):
            visited[j].update(
                {
                    vid: new_scores[vid][j]
                    for vid in news[j]
                    if vid in new_scores
                }
            )

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("aid", LongType(), True),
            StructField("vec_id", LongType(), True),
            StructField("score", DoubleType(), True),
            StructField("rk", IntegerType(), True),
        ]
    )
    out_rows = []
    for j, (aid, _) in enumerate(anchors):
        ranked = sorted(visited[j].items(), key=_rank_key)[:_GS_K]
        out_rows.extend(
            (aid, vid, s, i + 1) for i, (vid, s) in enumerate(ranked)
        )
    return spark.createDataFrame(out_rows, schema=out_schema).orderBy(
        "aid", "rk"
    )
