"""Named-query registry: the analysis_queries.md corpus mapped onto the
driver's synthetic star schema (FIXTURES.md §C shape mapping), plus the
north-star extension operators. Importing this package populates REGISTRY.

The driver's correctness harness checks the FIRST 50 registry entries in
iteration order, so after all modules register we reorder REGISTRY into an
explicit priority window (_DRIVER_WINDOW): the ESCO reference-parity corpus
(analysis_queries.md:9-522) first, then the UDF / multimodal / streaming
pipelines, then one carrier per remaining SURVEY.md §2 operator family.
Queries outside the window stay registered (full coverage surface, pytest
oracle mirror in tests/test_oracle_parity.py) — they are mostly sf-table
analogs of esco_* shapes already checked inside the window.
"""

from esco_neo4j_spark.plans.registry import REGISTRY, Query  # noqa: F401
from esco_neo4j_spark.plans import relational_queries  # noqa: F401
from esco_neo4j_spark.plans import vector_queries  # noqa: F401
from esco_neo4j_spark.plans import dedup_queries  # noqa: F401
from esco_neo4j_spark.plans import text_queries  # noqa: F401
from esco_neo4j_spark.plans import corpus_queries  # noqa: F401
from esco_neo4j_spark.plans import graph_queries  # noqa: F401
from esco_neo4j_spark.plans import event_queries  # noqa: F401
from esco_neo4j_spark.plans import udf_queries  # noqa: F401
from esco_neo4j_spark.plans import multimodal_queries  # noqa: F401
from esco_neo4j_spark.plans import esco_queries  # noqa: F401
from esco_neo4j_spark.plans import tpch_queries  # noqa: F401

# Exactly 50 names; every SURVEY.md §2 category has a value-oracle carrier:
# A/B/C/D/F/G/H/K via esco_* (warehouse parity corpus), I via udf_*, J via
# events_*, E via events_sessionization + events_survival_km, D9 via
# ext_cube_status_priority, G3 via ext_nations_with_both /
# ext_customers_no_urgent_orders, B10 via ext_map_projection, plus the
# north-star dedup / text / vector / multimodal / graph families.
# tests/test_registry.py::test_window_covers_required_ops freezes the
# window's SURVEY-op union, so a rotation that silently drops an
# operator family from the hard gate fails in CI.
_DRIVER_WINDOW = [
    # ESCO reference-parity corpus (analysis_queries.md) — 13
    # (r8 rotation, per the r7 verdict item 6: the r7/r8 operators enter
    # the hard gate. The label/rel count rows are replaced by their
    # CATALOG twins — same oracles, so A3/A4/D1/G1 stay hard-gated AND
    # the metastore front door (r7) is now driver-checked.
    # r9 rotation (verdict item 4): IN — dedup_simhash_canonical (new,
    # the O(N) production dedup output), dedup_cdc_chunks,
    # text_bpe_subword_stats, pipeline_image_text_align,
    # events_temporal_reachability. OUT to the mirror, every op kept
    # in-window: dedup_simhash_banded (dedup-simhash + A7(scale) via
    # dedup_simhash_canonical), text_bpe_train (text-bpe via
    # text_bpe_subword_stats), udf_compression_ratio (I9 via the udf_
    # family rows), graph_hyperball_nf (sketch(ext) via
    # events_ams_f2_selfjoin), vec_ivf_topk (A7(scale) via the graph-
    # search family). All stay registered and exact-value-checked in
    # the tests/test_oracle_parity.py mirror and the sf0.01 assurance
    # sweep.
    # r10 rotation (verdict item 5): IN — vec_graph_search_layered_
    # indexed (new: the persisted-index serve face, r10 headline),
    # vec_sq_topk, graph_katz, events_survival_km,
    # tpch_q21_waiting_suppliers, text_crossdoc_ngram_share (all
    # never hard-gated before). OUT to the mirror, every op kept
    # in-window: vec_graph_search + vec_graph_search_layered
    # (A7(scale)/knn-graph(ext)/H1/F2 via the indexed twin — which
    # runs the SAME search over the SAME graphs, served from the
    # artifact — plus vec_knn_descent_round), vec_cosine_topk
    # (H1/B3/B6/F2/K7 via esco_search_cosine), ext_topk_per_group
    # (E(ext) via events_sessionization), events_dedup_latest
    # (J(ext) via events_sessionization, B12 via dedup_exact),
    # graph_shortest_path_nodes (K2/C3 via esco_shortest_path, H4 via
    # esco_hierarchy_depth_histogram).
    "esco_label_counts_catalog",
    "esco_rel_counts_catalog",
    "esco_top_essential_skills",
    "esco_occupations_per_isco",
    "esco_multihop_skill_isco",
    "esco_skill_cooccurrence",
    "esco_point_lookup",
    "esco_hierarchy_depth_histogram",
    "esco_shortest_path",
    "esco_occupation_profile",
    "esco_search_cosine",
    "esco_translate_occupations",
    "esco_pagerank",
    # model-UDF pipelines (I1-I8) — 1 (zlib scorer in the mirror)
    "udf_hash_embedding",
    # multimodal binary columns — 3
    "mm_decode_metadata",
    "mm_phash_dct",
    "mm_modality_stats",
    # streaming batch-twins (J) + sketches + governance + temporal
    # reachability (K(ext)/H10 on events) — 6
    "events_sessionization",
    "events_survival_km",
    "events_ams_f2_selfjoin",
    "events_k_anonymity",
    "events_temporal_reachability",
    "pipeline_right_to_forget",
    # dedup family (north star) — 7 (r9: the O(N) cluster-contraction
    # output and the CDC chunker enter the hard gate; the pair-emitting
    # simhash calibration twin rotates to the mirror)
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_canonical",
    "dedup_cdc_chunks",
    "dedup_symdel_editdist2",
    "dedup_semantic_bucketed",
    # text analysis — 4 (r9: BPE carrier rotates train -> apply side)
    "text_token_stats",
    "text_quality_scores",
    "text_langid",
    "text_bpe_subword_stats",
    # corpus-construction / mixing + multimodal-embed capstone — 4
    "pipeline_temperature_mix",
    "pipeline_dataset_card",
    "pipeline_length_buckets",
    "pipeline_image_text_align",
    # vector similarity family — 7 (r7 kNN-descent + graph search, r8
    # layered search; the C9 carrier is the banded LSH join — the plan
    # that survives 100x; the exact all-pairs twin vec_similarity_join
    # stays registered outside the window as the calibration baseline)
    "vec_sq_topk",
    "vec_lsh_similarity_join",
    "vec_lsh_contamination",
    "vec_knn_descent_round",
    "vec_graph_search_layered_indexed",
    # graph (K2 path reconstruction, sampled betweenness) — 2
    # (HyperBall to the mirror; sketch(ext) via events_ams_f2_selfjoin)
    "graph_katz",
    "graph_betweenness",
    # extension operators only expressible on the sf tables — 4
    "text_crossdoc_ngram_share",
    "tpch_q21_waiting_suppliers",
    "ext_cube_status_priority",
    "ext_nations_with_both",
    "ext_map_projection",
]


def _reorder_registry() -> None:
    """Mutate REGISTRY in place (other modules hold references to the same
    dict) so iteration yields _DRIVER_WINDOW first, then the remainder in
    registration order."""
    ordered = {n: REGISTRY[n] for n in _DRIVER_WINDOW if n in REGISTRY}
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    REGISTRY.clear()
    REGISTRY.update(ordered)


# Oracle SQL that composes CTEs across query modules is attached here,
# after all modules are fully imported (module-level cross-imports would
# be circular):
from esco_neo4j_spark.plans.vector_queries import _hybrid_rrf_sql  # noqa: E402

REGISTRY["vec_hybrid_rrf"].sql = _hybrid_rrf_sql()

from esco_neo4j_spark.plans.text_queries import _TAG_DICT  # noqa: E402

_TAG_VALUES = ", ".join(f"('{t}', '{g}')" for t, g in _TAG_DICT)
REGISTRY["pipeline_rag_retrieval"].sql = f"""
    WITH hybrid AS ({_hybrid_rrf_sql()}),
    dict(term, tag) AS (VALUES {_TAG_VALUES}),
    toks AS (
      SELECT DISTINCT doc_id,
             unnest(list_filter(
               regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
               x -> x <> '')) AS term
      FROM documents
    ),
    tags AS (
      SELECT doc_id, string_agg(DISTINCT tag, ',' ORDER BY tag) AS tags
      FROM toks JOIN dict USING (term) GROUP BY doc_id
    )
    SELECT h.id AS doc_id, h.rrf_nano, h.lex_rank, h.vec_rank,
           d.source, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
           coalesce(t.tags, '') AS tags
    FROM hybrid h
    JOIN documents d ON d.doc_id = h.id
    LEFT JOIN tags t ON t.doc_id = h.id
    ORDER BY h.rrf_nano DESC, doc_id
"""

_reorder_registry()
