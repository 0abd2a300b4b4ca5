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
    # -- new in r13 (never driver-rowed): late-data drop accounting with the
    # engine's numRowsDroppedByWatermark load-bearing (query raises on
    # rule/metric mismatch).
    "streaming_late_data_report",
    # -- changed in r13, fresh rows prove the new code: the intake/dedup
    # sink hoists the corpus shingle-set + history-hash statics and fuses
    # the gate scan (VERDICT r12 #2), with 2-chunk fixture staging
    # (chunk-count-invariant verdicts, shared oracles untouched); the
    # outlier pair shares one centroid definition (ADVICE r12); the median
    # UDAF uses real annotations from functions/udafs.py; the text-format
    # staging cache key/atomic-rename changed under csv/json roundtrip.
    "streaming_intake_pipeline",
    "streaming_incremental_dedup",
    "streaming_quality_gate",
    "embedding_outlier_filter",
    "streaming_outlier_monitor",
    "udaf_median_daily",
    "csv_source_roundtrip",
    "json_source_roundtrip",
    # -- r13 rotation (VERDICT r12 #1): the entire r8-stale cohort (6) and
    # the 34 alphabetically-first of the 40 r9-stale queries re-proven on
    # current fixtures (md5-pinned unchanged since r8). The 6 r9 leftovers
    # (temporal_dimension_join, tfidf_lang_terms, time_to_next_purchase,
    # top_k_per_group, udtf_word_positions, window_distinct_users) rotate
    # in next round; every displaced query sits in a pytest parity list or
    # the streaming suite (test_every_oracled_query_has_a_local_witness
    # enforces it structurally). cosine_topk_gemm stays out: rows-only by
    # design, nothing for the driver to hash.
    "daily_trend_ols",
    "hourly_autocorr_lag1",
    "percentile_bands",
    "resample_corpus_epoch",
    "training_shuffle_shards",
    "weighted_sample_docs",
    "ann_recall_report",
    "cms_heavy_hitters",
    "cosine_topk_bruteforce",
    "dedup_keep_list",
    "event_transition_matrix",
    "exact_dedup_docs",
    "fuzzy_name_linkage",
    "incremental_daily_rollup",
    "kafka_envelope_roundtrip",
    "kafka_loopback_seek",
    "lang_id_confusion",
    "lm_perplexity_filter",
    "minhash_lsh_near_dup",
    "near_dup_clusters",
    "pipeline_enriched_agg",
    "pmi_collocations",
    "q10_returned_items",
    "q14_promo_share",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_star_join_volume",
    "q6_forecast_revenue",
    "quality_ensemble_gate",
    "salted_hot_key_agg",
    "semi_anti_join_cohorts",
    "simhash_near_dup",
    "streaming_ann_probe",
    "streaming_bm25_index_add",
    "streaming_cms_counters",
    "streaming_daily_rollup",
    "streaming_ivf_index_add",
    "streaming_kmv_distinct",
    "streaming_window_distinct",
    "table_checksum_diff",
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
