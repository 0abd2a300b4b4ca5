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
    # -- r10 rotation (VERDICT r9 item 1): the 10 queries that have NEVER
    # had a driver row (all green under the judge's r9 gate-replica run;
    # a driver row is the only missing proof). cosine_topk_gemm stays
    # out: rows-only by design, nothing for the driver to hash.
    "constraint_check_report",
    "hybrid_search_rrf",
    "streaming_hybrid_search",
    "cdc_version_diff",
    "multimodal_extract_features",
    "multimodal_frame_sample",
    "multimodal_resize_pipeline",
    "streaming_constraint_monitor",
    "streaming_decontamination",
    "streaming_pack_sequences",
    # -- new in r10: OPTIMIZE small-file compaction over the CDC snapshot
    "cdc_optimize_compaction",
    # -- changed in r10, so a fresh driver row re-proves the new code:
    # the CDC family (atomic _COMMITTED epoch sentinel + shared snapshot
    # artifact), the DLQ twins (atomic two-sink epoch marker +
    # lang_missing reason branch)
    "streaming_cdc_merge",
    "cdc_time_travel",
    "cdc_schema_evolution",
    "intake_dlq_routing",
    "streaming_intake_dlq",
    # -- the 32 stalest queries: last driver row r4/r5 (fixtures
    # regenerate each round; fresh rows re-prove them on current data).
    # streaming_enrichment_join remains the one r4 entry left out
    # (streaming-exempt, replayed by tests/test_streaming.py). The r9
    # window's displaced members all sit in pytest parity lists.
    "avg_agg",
    "cube_agg",
    "distinct_agg",
    "pivot_agg",
    "profile_columns",
    "rollup_agg",
    "set_ops_users",
    "asof_join_latest_click",
    "broadcast_enrichment_join",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "doc_fingerprint",
    "embedding_cosine_near_dup",
    "exact_median",
    "flat_map_filter_transform",
    "hash_sample_docs",
    "lang_id_heuristic",
    "multi_key_window_agg",
    "multimodal_binary_features",
    "pct_output_decode",
    "pct_window_agg",
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
    # -- streaming sentinel (most sensitive to fixture/timestamp drift)
    "streaming_flagship_agg",
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
