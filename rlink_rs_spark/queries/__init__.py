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
# (CORRECTNESS_r02..r05 are each exactly 50 rows, in registration order).
# The window ROTATES each round so coverage cycles instead of shrinking
# (ADVICE r5): flagship (entry() smoke) always first, then every query that
# has never had a driver row (round-5 additions), then the 28 queries whose
# last driver row is r3 (displaced by round 5's rotation -- a fresh row
# re-proves them on the current fixtures), then queries changed this round
# (approx_distinct_users' new exact-HLL oracle, embedding_cosine_near_dup
# under perf work) and the streaming/windowed block most sensitive to
# fixture drift. Exactly 50 entries; test_registry enforces the count and
# that every name resolves.
_DRIVER_WINDOW_PRIORITY = [
    "flagship_sliding_window_agg",
    # -- r7 rotation (VERDICT r6 item 1): the 9 late-r6 additions that have
    # never had a driver row take the slots of r6-driver-green entries.
    # Displaced into pytest parity lists: cosine_topk_gemm (pytest rank-parity
    # vs brute force -- it is rows-only by design, no oracle to lose),
    # cosine_topk_sq + corpus_prep_pipeline (ORACLED list), and TPC-H
    # q11/q15/q16/q17/q19/q22 (already in the TPCH parity list).
    "key_skew_report",
    "streaming_cusum_drift",
    "ngram_containment_pairs",
    "label_embedding_centroids",
    "tfidf_lang_terms",
    "percentile_bands",
    "funnel_conversion",
    "cohort_retention",
    "hourly_autocorr_lag1",
    # -- new in r7, never driver-checked: streaming intake dedup against the
    #    persisted LSH band index (takes q20's slot; q20 is r6-driver-green
    #    and in the TPCH parity list)
    "streaming_incremental_dedup",
    # -- new in r7: curriculum staging over the distributed exact NTILE
    #    (takes q21's slot; q21 is r6-driver-green and TPCH-parity-listed)
    "curriculum_stages",
    # -- new in r7: RAG/context-window chunking (takes decontamination's
    #    slot; that query is r6-driver-green and in the ORACLED parity list)
    "chunk_documents",
    # -- new in r8, never driver-checked: streaming KMV distinct sketch
    #    (takes bpe_train_merges' slot; r6-driver-green, added to ORACLED)
    "streaming_kmv_distinct",
    # -- new in r7: streaming CCNet gate (takes repetition_quality_signals'
    #    slot; that query is r6-driver-green and in the ORACLED parity list)
    "streaming_quality_gate",
    # -- new in r7: streaming A-ES reservoir (takes pack_sequences' slot;
    #    r6-driver-green, ORACLED-listed)
    "streaming_weighted_reservoir",
    # -- new in r7: interval-containment range join (takes
    #    temperature_resample_weights' slot; r6-green, ORACLED-listed)
    "open_orders_range_join",
    # -- changed in r7 (distributed prefix-sum rewire): fresh driver row;
    #    takes zorder_layout_stats' slot (r6-green, RELATIONAL-listed)
    "pack_sequences",
    "value_band_join",
    "pagerank_trade_graph",
    # -- late r6 additions, never driver-checked: PQ ANN, RANGE-frame moving
    #    average, dynamic-gap sessions (batch + streaming), and the second
    #    r6 wave (training shuffle, exact-substring dedup, SemDeDup, BPE
    #    tokenize-apply, streaming top-k, z-order layout, source mix,
    #    leakage-free split)
    # -- new in r8: Python-UDTF flat-map + positional phrase search (take
    #    cosine_topk_pq's and moving_average_7d's slots; both r6-driver-
    #    green and ORACLED/WINDOWED-parity-listed)
    "udtf_word_positions",
    "phrase_search_positional",
    "dynamic_gap_sessions",
    "streaming_dynamic_gap_sessions",
    "training_shuffle_shards",
    "exact_substring_dedup",
    "semantic_dedup",
    "bpe_tokenize_corpus",
    "streaming_windowed_topk",
    # -- new in r7: the composed intake pipeline (takes source_mix_report's
    #    slot; r6-green, ORACLED-listed)
    "streaming_intake_pipeline",
    "leakage_free_split",
    # -- wave-3 additions (this session), never driver-checked; they take
    # the slots the r3-era re-proves held (q10/q14/q6/event_transition/
    # semi_anti/pipeline_enriched/kafka x2/rollup/near_dup_clusters/
    # dedup_keep_list/streaming_enrichment_join -- each r3-driver-green,
    # now added to a pytest oracle-parity list so the meta-coverage guard
    # keeps an active local witness; the whole registry also passed the
    # sf0.01 gate-replica sweep this session). resample_corpus_epoch takes
    # the 12th slot: its Bernoulli arithmetic changed this round (overflow
    # fix), so a fresh driver row re-proves the new formula.
    "bm25_keyword_search",
    "dsir_importance_weights",
    # -- new in r8: per-group closed-form OLS trend (takes
    #    timeseries_gap_fill's slot; r6-driver-green, RELATIONAL-listed)
    "daily_trend_ols",
    "scd2_priority_dimension",
    # -- new in r8: anti-entropy checksum diff + streaming transition
    #    matrix (take grouping_sets_agg's and trade_graph_triangles'
    #    slots; both r6-driver-green, RELATIONAL/TPCH-parity-listed)
    "table_checksum_diff",
    "streaming_transition_matrix",
    "weighted_sample_docs",
    "attribution_last_touch",
    "equi_depth_histogram",
    "merge_upsert_snapshot",
    "pmi_collocations",
    "resample_corpus_epoch",
    # -- changed in r6: needs a fresh driver row
    "approx_distinct_users",
    # (embedding_cosine_near_dup rotated out: r5-driver-green, unchanged,
    #  in the ORACLED pytest parity list; slot goes to the float-hash
    #  showcase below)
    "anomaly_zscore_events",
    # -- new in the r6 continuation session, never driver-checked: LM quality
    #    filter, IVF-PQ residual ANN, incremental dedup, text normalization.
    #    Displaced (all r5-driver-green on current fixtures, now pytest-
    #    witnessed): pct_output_decode + session_window_agg (added to the
    #    WINDOWED parity list), stream_stream_interval_join +
    #    streaming_three_stream_connect (streaming suite replays them)
    "lm_perplexity_filter",
    "cosine_topk_ivfpq",
    "incremental_batch_dedup",
    "clean_normalize_docs",
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
