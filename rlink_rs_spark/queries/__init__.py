"""Query registry: every operator claimed in SURVEY.md §2 has an entry here,
pairing a Spark DataFrame implementation with its DuckDB oracle SQL twin
(the driver's correctness gate). Submodules register into REGISTRY on import.
"""

from __future__ import annotations

from rlink_rs_spark.queries.base import REGISTRY, Query

# Import order is registration order within a module; the explicit priority
# list below controls the global order the driver sees.
from rlink_rs_spark.queries import windowed  # noqa: E402,F401
from rlink_rs_spark.queries import relational  # noqa: E402,F401
from rlink_rs_spark.queries import streams  # noqa: E402,F401
from rlink_rs_spark.queries import dedup  # noqa: E402,F401
from rlink_rs_spark.queries import similarity  # noqa: E402,F401
from rlink_rs_spark.queries import text  # noqa: E402,F401
from rlink_rs_spark.queries import stats  # noqa: E402,F401
from rlink_rs_spark.queries import tpch  # noqa: E402,F401
from rlink_rs_spark.queries import pipeline_ops  # noqa: E402,F401
from rlink_rs_spark.queries import graph  # noqa: E402,F401
from rlink_rs_spark.queries import lm  # noqa: E402,F401
from rlink_rs_spark.queries import analytics  # noqa: E402,F401
from rlink_rs_spark.queries import search  # noqa: E402,F401

# The driver's correctness gate hashes the FIRST 50 registry entries only
# (each CORRECTNESS_r0N is exactly 50 rows, in registration order). The
# window ROTATES each round so coverage cycles instead of shrinking
# (ADVICE r5): flagship (entry() smoke) always first, then queries that
# have never had a driver row, then queries whose code changed this round,
# then the stalest previously-green queries (fresh rows re-prove them on
# current fixtures). Every displaced query must sit in a pytest parity
# list (or be streaming-suite-replayed) -- enforced by
# tests/test_coverage_gaps.py::test_every_oracled_query_has_a_local_witness.
# Exactly 50 entries; test_registry enforces the count and resolution.
_DRIVER_WINDOW_PRIORITY = [
    "flagship_sliding_window_agg",
    # -- new in r14 (never driver-rowed): the example-connect app composed
    # end-to-end as ONE streaming query (VERDICT r13 #5) and the
    # WatermarksWithIdleness keep-alive mitigation (VERDICT r13 #4), both
    # with engine-behavior assertions that RAISE on divergence.
    "example_connect_app_parity",
    "streaming_idle_source_heartbeat",
    "multimodal_ppm_roundtrip",
    "multimodal_wav_features",
    # -- changed in r14, fresh rows prove the new code: the late-data
    # report now reads the engine metric through run_to_memory's
    # listener-bus drain barrier (ADVICE r13); the CDC merge sink's GC
    # prunes emptied epoch-dir husks (O(epochs) directory growth found by
    # the 100-epoch soak witness).
    "streaming_late_data_report",
    "streaming_cdc_merge",
    # -- r14 rotation (VERDICT r13 #2): the full r9-stale cohort (6) and
    # the 37 alphabetically-first of the 45 r10-stale queries re-proven on
    # current fixtures (md5-pinned unchanged since r8). The 8 r10
    # leftovers (rollup_agg, set_ops_users, streaming_constraint_monitor,
    # streaming_decontamination, streaming_flagship_agg,
    # streaming_hybrid_search, streaming_intake_dlq,
    # streaming_pack_sequences) rotate in next
    # round; every displaced query sits in a pytest parity list or the
    # streaming suite (test_every_oracled_query_has_a_local_witness
    # enforces it structurally). cosine_topk_gemm stays out: rows-only by
    # design, nothing for the driver to hash.
    "temporal_dimension_join",
    "tfidf_lang_terms",
    "time_to_next_purchase",
    "top_k_per_group",
    "udtf_word_positions",
    "window_distinct_users",
    "asof_join_latest_click",
    "avg_agg",
    "broadcast_enrichment_join",
    "cdc_schema_evolution",
    "constraint_check_report",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "cube_agg",
    "distinct_agg",
    "doc_fingerprint",
    "embedding_cosine_near_dup",
    "exact_median",
    "flat_map_filter_transform",
    "hash_sample_docs",
    "hybrid_search_rrf",
    "intake_dlq_routing",
    "lang_id_heuristic",
    "multi_key_window_agg",
    "multimodal_binary_features",
    "multimodal_extract_features",
    "multimodal_frame_sample",
    "multimodal_resize_pipeline",
    "pct_output_decode",
    "pct_window_agg",
    "pivot_agg",
    "profile_columns",
    "python_datasource_scan",
    "q12_priority_class",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "quality_score_docs",
    "range_window_filter",
]



def _apply_priority() -> None:
    ordered = {name: REGISTRY[name] for name in _DRIVER_WINDOW_PRIORITY}
    for name, q in REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    REGISTRY.clear()
    REGISTRY.update(ordered)


_apply_priority()

__all__ = ["REGISTRY", "Query"]
