"""Persisted layered ANN index (r10): build/serve/maintain split.

The correctness anchor is vec_graph_search_layered (value-oracled); the
indexed face must serve BIT-IDENTICAL results from the stored artifact,
reuse the artifact across calls, rebuild exactly when the manifest stops
matching, survive an interrupted swap, and maintain per-layer graphs
incrementally under the streaming/knn.py contract.
"""

from __future__ import annotations

import json
import os

import pytest

SF_DIR = "/root/testdata/sf0.001"


def _manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "layers", "_MANIFEST.json")


@pytest.fixture()
def built(spark, tmp_path):
    """A freshly built index for the sf0.001 corpus in a tmp dir."""
    from esco_neo4j_spark.sources.ann_index import ensure_layered_index

    idx = ensure_layered_index(spark, SF_DIR, str(tmp_path / "idx"))
    return idx


def test_indexed_serve_matches_inline_and_reuses_artifact(spark, built):
    """serve_layered over the stored graphs == the inline (oracled)
    layered search, and a second ensure+serve does NOT rebuild — the
    whole point of the split (at sf10 the inline build is ~88s while
    the serve face is seconds)."""
    from esco_neo4j_spark.plans import REGISTRY
    from esco_neo4j_spark.sources.ann_index import (
        ensure_layered_index,
        serve_layered,
    )

    inline = sorted(
        map(tuple, REGISTRY["vec_graph_search_layered"].fn(spark, SF_DIR).collect())
    )
    got = sorted(map(tuple, serve_layered(spark, SF_DIR, built).collect()))
    assert got == inline and len(got) > 0

    mtime = os.path.getmtime(_manifest_path(built))
    again = ensure_layered_index(spark, SF_DIR, built)
    assert again == built
    assert os.path.getmtime(_manifest_path(built)) == mtime, (
        "matching manifest must not trigger a rebuild"
    )
    got2 = sorted(map(tuple, serve_layered(spark, SF_DIR, built).collect()))
    assert got2 == inline


def test_registered_indexed_query_matches_inline(spark, tmp_path):
    """The registered query (default index root) equals the inline
    query — this is what makes the shared oracle valid for the indexed
    face."""
    from esco_neo4j_spark.plans import REGISTRY

    inline = sorted(
        map(tuple, REGISTRY["vec_graph_search_layered"].fn(spark, SF_DIR).collect())
    )
    idx = sorted(
        map(
            tuple,
            REGISTRY["vec_graph_search_layered_indexed"].fn(spark, SF_DIR).collect(),
        )
    )
    assert idx == inline and len(idx) > 0


def test_stale_manifest_triggers_rebuild(spark, built):
    """Any manifest drift — corpus row count, algo version, a derived
    parameter — must force a rebuild (manifest-pinned staleness, never
    guessed)."""
    from esco_neo4j_spark.sources.ann_index import (
        ensure_layered_index,
        expected_manifest,
        read_manifest,
    )

    mp = _manifest_path(built)
    tampered = read_manifest(built)
    tampered["algo_version"] = -1
    with open(mp, "w") as f:
        json.dump(tampered, f)
    ensure_layered_index(spark, SF_DIR, built)
    assert read_manifest(built) == expected_manifest(SF_DIR), (
        "stale manifest must be rebuilt to today's derivation"
    )


def test_interrupted_swap_is_recovered(spark, built):
    """Crash in the swap's unsafe window (live dir renamed away, fully
    written tmp present): ensure must roll FORWARD to the complete tmp
    copy without a rebuild — the recover_swap contract the IVF index
    and shard sink already pin."""
    from esco_neo4j_spark.sources.ann_index import (
        ensure_layered_index,
        expected_manifest,
        read_manifest,
        serve_layered,
    )

    layers = os.path.join(built, "layers")
    os.rename(layers, layers + "__merging")
    assert not os.path.exists(layers)
    ensure_layered_index(spark, SF_DIR, built)
    assert os.path.exists(layers)
    assert not os.path.exists(layers + "__merging")
    assert read_manifest(built) == expected_manifest(SF_DIR)
    assert serve_layered(spark, SF_DIR, built).count() > 0


def test_layered_maintenance_stream_equals_batch(spark, tmp_path):
    """Per-layer incremental inserts with the hashed level coin: after
    three micro-batches each layer's maintained edges equal the
    UNCAPPED batch graph over the batch union restricted to that layer
    (the streaming/knn.py contract, applied per layer), and a replayed
    batch is a no-op."""
    from pyspark.sql import functions as F

    from esco_neo4j_spark.operators.similarity import lsh_knn_graph
    from esco_neo4j_spark.streaming.layered import (
        live_layer_edges,
        process_layered_knn_batch,
    )

    emb = (
        spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        .select("vec_id", "embedding")
        .filter(F.col("vec_id") < 240)
    )
    layers = [
        {"stride": 8, "n_planes": 4, "n_tables": 8},
        {"stride": 1, "n_planes": 5, "n_tables": 10},
    ]
    index_dir = str(tmp_path / "live_idx")
    batches = [emb.filter(f"vec_id % 3 = {i}") for i in range(3)]
    for b in batches:
        process_layered_knn_batch(b, index_dir, dim=64, layers=layers, k=3)

    coin = (F.col("vec_id") * F.lit(2654435761)) % F.lit(4294967296)
    for layer in layers:
        s = layer["stride"]
        sub = emb if s == 1 else emb.filter(coin < F.lit(4294967296 // s))
        want = {
            (r["src"], r["nbr"], r["score"], r["rk"])
            for r in lsh_knn_graph(
                sub, k=3, cand_cap=10**6,
                n_planes=layer["n_planes"], n_tables=layer["n_tables"],
                max_bucket=None,
            ).collect()
        }
        got = {
            (r["src"], r["nbr"], r["score"], r["rk"])
            for r in live_layer_edges(spark, index_dir, s).collect()
        }
        assert got == want and len(got) > 0, f"stride {s}"

    # replay the last batch: every layer's edges unchanged
    before = {
        l["stride"]: {
            tuple(r) for r in live_layer_edges(
                spark, index_dir, l["stride"]
            ).collect()
        }
        for l in layers
    }
    assert process_layered_knn_batch(
        batches[2], index_dir, dim=64, layers=layers, k=3
    ) == 0
    after = {
        l["stride"]: {
            tuple(r) for r in live_layer_edges(
                spark, index_dir, l["stride"]
            ).collect()
        }
        for l in layers
    }
    assert after == before
