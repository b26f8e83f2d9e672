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
# events_*, E via ext_topk_per_group + events_sessionization, D9 via
# ext_cube_status_priority, G3 via ext_nations_with_both /
# ext_customers_no_urgent_orders, B10 via ext_map_projection, plus the
# north-star dedup / text / vector / multimodal / graph families.
_DRIVER_WINDOW = [
    # ESCO reference-parity corpus (analysis_queries.md) — 18
    "esco_label_counts",
    "esco_rel_counts",
    "esco_top_essential_skills",
    "esco_top_occupations_by_skills",
    "esco_skill_usage",
    "esco_occupations_per_isco",
    "esco_multihop_skill_isco",
    "esco_skill_cooccurrence",
    "esco_related_skill_types",
    "esco_point_lookup",
    "esco_hierarchy_depth_histogram",
    "esco_deepest_skills",
    "esco_shortest_path",
    "esco_occupation_profile",
    "esco_skill_profile",
    "esco_search_cosine",
    "esco_translate_occupations",
    "esco_pagerank",
    # model-UDF pipelines (I1-I8) — 2
    "udf_hash_embedding",
    "udf_translate_memoized",
    # multimodal binary columns — 5
    # (r3: mm_pixel_stats carries REAL pixel decode — PPM bytes built
    # JVM-side, decoded pure-Python in executors — replacing the
    # planning-only mm_resize_dims, which stays mirror-checked)
    "mm_decode_metadata",
    "mm_feature_extract",
    "mm_frame_sample",
    "mm_pixel_stats",
    "mm_modality_stats",
    # streaming batch-twins (J) + H10 json + time-series gap fill — 5
    "events_sliding_window",
    "events_sessionization",
    "events_json_props",
    "events_dedup_latest",
    "events_gapfill_daily_locf",
    # dedup family (north star) — 5
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash_banded",
    "dedup_embedding_cosine",
    # text analysis + corpus-construction families — 5
    "text_token_stats",
    "text_quality_scores",
    "text_langid",
    "text_fingerprint",
    "text_chunk_windows",
    # vector similarity family — 3
    # (r3: the C9 carrier is the banded LSH join — the plan that survives
    # 100x; the exact all-pairs twin vec_similarity_join stays registered
    # outside the window as the bounded calibration baseline)
    "vec_cosine_topk",
    "vec_lsh_similarity_join",
    "vec_ivf_topk",
    # graph (K2 path reconstruction, iterative CC, sampled betweenness) — 3
    "graph_shortest_path_nodes",
    "graph_connected_components",
    "graph_betweenness",
    # extension operators only expressible on the sf tables — 4
    # (ext_customers_no_urgent_orders rotated out: G3 already carried by
    # ext_nations_with_both; the freed slots carry the corpus-construction
    # and time-series families, which are pytest-green but deserved rows
    # in the driver's hard signal)
    "ext_topk_per_group",
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
