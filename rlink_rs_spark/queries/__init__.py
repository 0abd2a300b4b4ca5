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
    # -- new in r15 (never driver-rowed): the example-kafka app composed
    # end-to-end as ONE pipeline -- loopback produce, Direct offset-range
    # seek (the reference's exact begin offsets), from_json InputMapper,
    # sliding window sum, OutputMapper to_json, foreachBatch producer
    # (VERDICT r14 #3).
    "example_kafka_app_parity",
    # -- new in r15 wave 2: the Kafka runtime contract on the
    # partition-aware Python streaming DataSource (one InputSplit per
    # topic-partition, seek, Arrow-batched executor reads).
    "kafka_python_stream_source",
    "kafka_python_stream_sink",
    # -- changed in r15, fresh rows prove the new code: decode_ppm's
    # header scans are now bounded (ADVICE r14) and strip_heartbeats is
    # null-safe (ADVICE r14).
    "multimodal_png_roundtrip",
    "multimodal_ppm_roundtrip",
    "streaming_idle_source_heartbeat",
    # -- r15 rotation (VERDICT r14 #2): the full r10-stale leftover cohort
    # (8) and the 36 alphabetically-first of the 45 r11-stale queries
    # re-proven on current fixtures (md5-pinned unchanged since r8). The 9
    # r11 leftovers (tumbling_window_agg and train_test_split -- displaced
    # by the two new kafka_python queries -- union_connect, value_band_join,
    # value_histogram, vocab_top_terms, weekday_agg, window_offset_agg,
    # zorder_layout_stats) rotate in next round; every displaced query
    # sits in a pytest parity list or the streaming suite
    # (test_every_oracled_query_has_a_local_witness enforces it
    # structurally). cosine_topk_gemm stays out: rows-only by design,
    # nothing for the driver to hash.
    "rollup_agg",
    "set_ops_users",
    "streaming_constraint_monitor",
    "streaming_decontamination",
    "streaming_flagship_agg",
    "streaming_hybrid_search",
    "streaming_intake_dlq",
    "streaming_pack_sequences",
    "benchmark_decontamination",
    "bpe_train_merges",
    "cdc_optimize_compaction",
    "cdc_time_travel",
    "cdc_version_diff",
    "corpus_prep_pipeline",
    "cosine_topk_pq",
    "cosine_topk_sq",
    "grouping_sets_agg",
    "moving_average_7d",
    "q11_important_stock",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_bracket_revenue",
    "q20_promo_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "redact_numbers_props",
    "repetition_quality_signals",
    "rolling_hash_fingerprint",
    "session_window_agg",
    "sessionization",
    "source_mix_report",
    "stats_agg",
    "stratified_sample_docs",
    "stream_join_then_window_agg",
    "streaming_dedup_events",
    "streaming_pct_agg",
    "streaming_session_window_agg",
    "streaming_three_stream_connect",
    "temperature_resample_weights",
    "text_stats_tokens",
    "timeseries_gap_fill",
    "token_count_bpe",
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
