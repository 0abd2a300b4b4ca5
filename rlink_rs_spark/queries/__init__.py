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
    # -- r9 rotation (VERDICT r8 item 1): the 14 queries that have NEVER
    # had a driver row (all passed the judge's r8 gate-replica run; a
    # driver row is the only missing proof). cosine_topk_gemm stays out:
    # rows-only by design, nothing for the driver to hash.
    "ann_recall_report",
    "cms_heavy_hitters",
    "fuzzy_name_linkage",
    "incremental_daily_rollup",
    "lang_id_confusion",
    "lsh_recall_report",
    "quality_ensemble_gate",
    "streaming_ann_probe",
    "streaming_cms_counters",
    "streaming_daily_rollup",
    "streaming_window_distinct",
    "temporal_dimension_join",
    "time_to_next_purchase",
    "window_distinct_users",
    # -- changed in r9, so a fresh driver row re-proves the new code:
    # tfidf (vocab broadcast -> window-over-term rewrite), pmi (unhinted
    # unigram joins), table_checksum_diff (live isNull branch), udtf
    # (NULL-text semantics), streaming_kmv_distinct (counts-first atomic
    # epoch commit), lm_perplexity_filter (persisted LUT artifact),
    # streaming_incremental_dedup (epoch-state compaction fold)
    "tfidf_lang_terms",
    "pmi_collocations",
    "table_checksum_diff",
    "udtf_word_positions",
    "streaming_kmv_distinct",
    "lm_perplexity_filter",
    "streaming_incremental_dedup",
    # -- new in r9: CDC MERGE family (bucketed copy-on-write snapshot),
    # DLQ intake twins, and the two streaming index-maintenance paths
    "streaming_cdc_merge",
    "cdc_time_travel",
    "cdc_schema_evolution",
    "intake_dlq_routing",
    "streaming_intake_dlq",
    "streaming_ivf_index_add",
    "streaming_bm25_index_add",
    # -- the 20 stalest queries: last driver row r4 (judge re-proved 20 of
    # the stale set local in r8; this refreshes them on current fixtures).
    # streaming_enrichment_join is the one r4 entry left out (streaming-
    # exempt, replayed by tests/test_streaming.py); cube_agg, pivot_agg,
    # avg/distinct/rollup_agg, set_ops_users, and profile_columns were
    # displaced by the r9 additions into the RELATIONAL parity list.
    "cosine_topk_bruteforce",
    "dedup_keep_list",
    "event_transition_matrix",
    "exact_dedup_docs",
    "kafka_envelope_roundtrip",
    "kafka_loopback_seek",
    "minhash_lsh_near_dup",
    "near_dup_clusters",
    "ngram_jaccard_dedup",
    "pipeline_enriched_agg",
    "q10_returned_items",
    "q14_promo_share",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_star_join_volume",
    "q6_forecast_revenue",
    "salted_hot_key_agg",
    "semi_anti_join_cohorts",
    "simhash_near_dup",
    "top_k_per_group",
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
