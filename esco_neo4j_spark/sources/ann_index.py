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
  persist them as ONE parquet table partitioned by ``stride`` (stride 1
  = the base graph), under the crash-safe rename-swap contract
  (sources/merge.py: the same swap cli.py's translate and the IVF index
  use; `recover_swap` runs at every entry). ``_MANIFEST.json`` inside
  the table directory pins the full derivation (corpus row count, algo
  version, per-layer banding/ring) — Spark ignores ``_``-prefixed files,
  so manifest and data swap atomically together.
- **serve** (`serve_layered`): the registered
  ``vec_graph_search_layered_indexed`` face — descend the STORED coarse
  layers (entries ∪ layer-graph neighbors, exact re-rank, top-entries
  per layer), then the stored base graph's beam walk. Cost is
  O(entries·degree·layers + beam·rounds·degree) — independent of N and
  of the build. Because the build is deterministic from the manifest
  params, the DuckDB oracle REPLAYS the same stored graphs from the
  same derivation (_graph_search_layered_sql), so the indexed serve is
  value-oracled end to end: a stale or corrupt artifact fails the
  oracle instead of silently serving garbage.
- **maintain** (streaming/layered.py): per-layer incremental inserts
  with the hashed level coin, reusing streaming/knn.py's insert-only,
  effectively-once contract per layer.

Staleness is manifest-pinned, never guessed: `ensure_layered_index`
compares the stored manifest against `expected_manifest(sf_dir)` —
corpus row count from the parquet footer, ALGO_VERSION (bumped whenever
graph construction semantics change, e.g. the r10 ring-salt
decorrelation), and every derived parameter — and rebuilds on any
mismatch. At 100 TB the same contract holds: the index is a warehouse
artifact keyed by (corpus snapshot, algo version), rebuilt by a batch
job and swapped in atomically, while serving reads whichever complete
copy is live.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ALGO_VERSION = 2  # r10: XOR-decorrelated per-table ring orders

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
DEFAULT_INDEX_ROOT = os.path.join(_REPO_ROOT, ".ann_index")


def index_dir_for(sf_dir: str, root: str = DEFAULT_INDEX_ROOT) -> str:
    """One artifact directory per corpus directory (slug of the abs
    path; the manifest, not the slug, is the integrity check)."""
    slug = os.path.abspath(sf_dir).strip("/").replace("/", "_")
    return os.path.join(root, slug)


def _layers_path(index_dir: str) -> str:
    return os.path.join(index_dir, "layers")


def expected_manifest(sf_dir: str) -> dict:
    """The full derivation the build would use for ``sf_dir`` RIGHT NOW
    — corpus footer row count, algo version, and every per-layer
    parameter. Pure arithmetic over the footer count (the shared
    Spark/DuckDB derivation discipline), so build, serve, maintenance
    and the oracle all agree by construction."""
    from esco_neo4j_spark.catalog import table_rowcount
    from esco_neo4j_spark.operators.similarity import (
        derive_knn_ring,
        derive_lsh_params,
    )
    from esco_neo4j_spark.plans.vector_queries import (
        _KNN_CAND_CAP,
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
        "layers": layers,
    }


def build_layered_index(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> dict:
    """Build all layer graphs (top coarse layers + the stride-1 base)
    and swap them in atomically. Returns the written manifest.

    The per-layer graph is bit-identical to what the inline
    ``vec_graph_search_layered`` plan derives: same level-coin layer
    membership, same footer-derived banding and ring, same
    ``lsh_knn_graph`` construction — which is what lets the DuckDB
    oracle replay the STORED graphs from the manifest params alone."""
    from esco_neo4j_spark.operators.similarity import lsh_knn_graph
    from esco_neo4j_spark.plans.vector_queries import _gs_lvl, _gs_lvl_guard

    _gs_lvl_guard(sf_dir)
    manifest = expected_manifest(sf_dir)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    parts = []
    for layer in manifest["layers"]:
        s = layer["stride"]
        src = (
            emb
            if s == 1
            else emb.filter(_gs_lvl(F.col("vec_id")) < 4294967296 // s)
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
    path = _layers_path(index_dir)
    tmp, old = path + "__merging", path + "__old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    (
        all_layers.write.mode("overwrite")
        .partitionBy("stride")
        .parquet(tmp)
    )
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


def ensure_layered_index(
    spark: SparkSession, sf_dir: str, index_dir: str | None = None
) -> str:
    """Serve-side entry: recover any interrupted swap, then rebuild iff
    the stored manifest does not EXACTLY match today's derivation for
    ``sf_dir`` (missing/corrupt manifest, different corpus row count,
    different algo version or any derived parameter). Returns the
    index directory."""
    from esco_neo4j_spark.sources.merge import recover_swap

    if index_dir is None:
        index_dir = index_dir_for(sf_dir)
    os.makedirs(index_dir, exist_ok=True)
    recover_swap(_layers_path(index_dir))
    if read_manifest(index_dir) != expected_manifest(sf_dir):
        build_layered_index(spark, sf_dir, index_dir)
    return index_dir


def load_layer(
    spark: SparkSession, index_dir: str, stride: int
) -> DataFrame:
    """(src, nbr) edges of one stored layer — partition-pruned scan."""
    return (
        spark.read.parquet(_layers_path(index_dir))
        .filter(F.col("stride") == stride)
        .select("src", "nbr")
    )


def serve_layered(
    spark: SparkSession, sf_dir: str, index_dir: str
) -> DataFrame:
    """The SERVE face: layered descent + base beam walk over the STORED
    graphs — no graph construction anywhere in the plan. Mirrors
    plans/vector_queries.vec_graph_search_layered step for step (same
    exhaustive top-layer entry, per-layer expand-and-rerank descent,
    descent-∪-diversity base seeds), so its output is bit-identical to
    the inline query's and the shared DuckDB oracle replays it."""
    from esco_neo4j_spark.operators.similarity import (
        _anchor_cosine_pudf,
        graph_beam_search,
    )
    from esco_neo4j_spark.plans.vector_queries import (
        _GS_ENTRIES,
        _GS_K,
        _GS_ROUNDS,
        _anchor_vec,
        _gs_lvl,
    )

    manifest = read_manifest(index_dir)
    if manifest is None:
        raise ValueError(f"no layered index manifest under {index_dir}")
    emb = spark.table("embeddings")
    e = emb.filter(F.col("embedding").isNotNull())
    anchor = _anchor_vec(spark)
    score_of = _anchor_cosine_pudf(anchor)
    entries = None
    for layer in manifest["layers"]:
        s = layer["stride"]
        if s == 1:
            continue
        g = load_layer(spark, index_dir, s)
        if entries is None:
            entries = e.filter(
                _gs_lvl(F.col("vec_id")) < 4294967296 // s
            ).select("vec_id")
        nbrs = (
            entries.select(F.col("vec_id").alias("src"))
            .join(g, "src")
            .select(F.col("nbr").alias("vec_id"))
        )
        cand = entries.unionByName(nbrs).distinct()
        scored = cand.join(
            e.select("vec_id", "embedding"), "vec_id"
        ).select(
            "vec_id",
            F.round(score_of(F.col("embedding")), 6).alias("score"),
        )
        entries = (
            scored.orderBy(F.desc("score"), F.asc("vec_id"))
            .limit(_GS_ENTRIES)
            .select("vec_id")
            .localCheckpoint(eager=True)
        )
    g0 = load_layer(spark, index_dir, 1)
    seeds = e.select("vec_id").orderBy("vec_id").limit(_GS_ENTRIES)
    entries = (
        seeds if entries is None else entries.unionByName(seeds).distinct()
    )
    return graph_beam_search(
        g0,
        emb,
        anchor,
        k=_GS_K,
        n_entries=_GS_ENTRIES,
        beam=manifest["beam"],
        rounds=_GS_ROUNDS,
        entry_ids=entries,
    )
