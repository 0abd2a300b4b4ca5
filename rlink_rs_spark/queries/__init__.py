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

# The driver's correctness gate hashes the FIRST 50 registry entries only
# (CORRECTNESS_r02..r04 are each exactly 50 rows, in registration order).
# Rotate so that window holds: the flagship (entry() smoke) first, then every
# query that has never had a driver row (similarity/text/sampling/stats/TPC-H
# blocks, registered late historically), then the windowed/streaming block
# that round 4's TIMESTAMP_NTZ environment change broke (green again after
# the tables.py inferTimestampNTZ fix -- a fresh driver row proves it), then
# filler. Queries pushed past 50 are all driver-green in r3 or earlier.
_DRIVER_WINDOW_PRIORITY = [
    "flagship_sliding_window_agg",
    # -- never driver-checked (r2-local / local-only green; VERDICT r3 item 1)
    "embedding_cosine_near_dup",
    "cosine_topk_ivf",
    "cosine_topk_lsh",
    "text_stats_tokens",
    "lang_id_heuristic",
    "quality_score_docs",
    "token_count_bpe",
    "rolling_hash_fingerprint",
    "doc_fingerprint",
    "hash_sample_docs",
    "train_test_split",
    "vocab_top_terms",
    "redact_numbers_props",
    "stratified_sample_docs",
    "multimodal_binary_features",
    "stats_agg",
    "weekday_agg",
    "exact_median",
    "approx_distinct_users",
    "value_histogram",
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_class",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    # -- broken by round 4's TIMESTAMP_NTZ testdata change, now fixed
    "tumbling_window_agg",
    "window_offset_agg",
    "multi_key_window_agg",
    "pct_window_agg",
    "pct_output_decode",
    "range_window_filter",
    "asof_join_latest_click",
    "sessionization",
    "session_window_agg",
    "streaming_flagship_agg",
    "streaming_pct_agg",
    "stream_stream_interval_join",
    "stream_stream_outer_join",
    "stream_join_then_window_agg",
    "streaming_three_stream_connect",
    "streaming_dedup_events",
    "streaming_session_window_agg",
    # -- filler to 50 (r4-green, cheap)
    "flat_map_filter_transform",
    "python_datasource_scan",
    "union_connect",
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
