"""Dump physical-plan hygiene for every batch registry query to PLANS.md:
exchange count, join operators, scan pushdown evidence, and red flags
(CartesianProduct / BroadcastNestedLoopJoin outside the by-design set).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlink_rs_spark.queries import REGISTRY  # noqa: E402
from rlink_rs_spark.session import get_spark  # noqa: E402

# Queries that execute streaming jobs inside fn() -- skipped (their plan is
# the micro-batch engine's, audited via tests instead).
STREAMING = {
    name
    for name in REGISTRY
    if name.startswith(("streaming_", "stream_stream_")) or name == "kafka_loopback_seek"
}

# By-design nested-loop/cross shapes (documented in each query's docstring):
#   cosine_topk_bruteforce -- the exact-NN baseline is a broadcast NLJ
#   cosine_topk_ivf        -- 16-row centroid codebook cross join (broadcast)
#   range_window_filter    -- single-row bounds frame joined without keys
#   q22_dormant_customers  -- 1-row scalar-aggregate (avg balance) broadcast
#                             cross, the canonical scalar-subquery plan
#   q11_important_stock    -- same shape: 1-row (total, count) broadcast cross
#                             (q15's analogue converts to a hash join because
#                             its filter is an equality; q11's is >)
#   temperature_resample_weights -- same shape: 1-row normalizer broadcast
#   pagerank_trade_graph   -- same shape: 1-row node-count broadcast cross,
#                             once per unrolled iteration
#   semantic_dedup         -- 16-row centroid codebook broadcast cross (the
#                             cosine_topk_ivf assignment shape)
#   source_mix_report      -- 1-row corpus-total broadcast cross (corpus share)
#   resample_corpus_epoch  -- 1-row (tot, total_docs) normalizer broadcast
#                             cross, the temperature_resample_weights shape
#   cosine_topk_ivfpq      -- 16-row IVF codebook broadcast cross (the
#                             cosine_topk_ivf assignment shape, twice:
#                             corpus assignment + query probing)
#   bm25_keyword_search    -- 1-row corpus-totals broadcast cross onto the
#                             (small) matched-candidate side
#   dsir_importance_weights -- 1-row totals broadcast cross onto the
#                             <=128-row feature LUT, never the corpus
#   pmi_collocations       -- 1-row (tt, bt) totals broadcast cross onto
#                             the count-filtered bigram table
#   tfidf_lang_terms       -- 1-row doc-count broadcast cross onto the
#                             (lang, term) vocab table
#   key_skew_report        -- 1-row totals broadcast cross onto the top-k
#                             key rows
#   lm_perplexity_filter   -- 1-row total-count broadcast cross from the
#   equi_depth_histogram      distributed exact NTILE (operators/ranking.py);
#                             dsir_importance_weights shares it and was
#                             already listed for its totals LUT cross
NLJ_ALLOWED = {
    "lm_perplexity_filter",
    "equi_depth_histogram",
    "curriculum_stages",  # same 1-row ranking-total broadcast cross
    "ann_recall_report",  # composition of cosine_topk_{bruteforce,ivf}, both listed
    "quality_ensemble_gate",  # composition of lm_perplexity_filter + dsir +
    #                           repetition; inherits their listed 1-row crosses
    "cms_heavy_hitters",  # 4-row sketch-row-index broadcast cross (each event
    #                       increments d=4 counters), the range(d) replication
    "cosine_topk_ivfpq",
    "resample_corpus_epoch",
    "bm25_keyword_search",
    "dsir_importance_weights",
    "pmi_collocations",
    "tfidf_lang_terms",
    "key_skew_report",
    "pagerank_trade_graph",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "range_window_filter",
    "q22_dormant_customers",
    "q11_important_stock",
    "temperature_resample_weights",
    "semantic_dedup",
    "source_mix_report",
    "hybrid_search_rrf",  # 3-row exemplar query set broadcast NLJ (the
    #                       cosine_topk_bruteforce vector leg) + the listed
    #                       1-row bm25 corpus-totals cross on the lexical leg
}

JOIN_RE = re.compile(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)")

# By-design UNPARTITIONED windows (single-partition WindowExec) -- allowed
# only when the window's input is provably tiny (bounded by a constant or by
# config, never by corpus size). The ranking-module size table (ordered by
# `_pid`, <= spark.sql.shuffle.partitions rows) is auto-exempted by pattern.
#   funnel_conversion      -- LAG over the 3-row stage summary
#   pmi_collocations       -- top-30 rank over the count-filtered bigram
#                             vocab table (nab >= 5 filter bounds it)
#   tfidf_lang_terms       -- per-lang top-k rank over the (lang, term)
#                             vocab table (bounded by vocab, not corpus)
#   bpe_train_merges       -- rank over the <=784-entry candidate-pair table
#   bm25_keyword_search    -- top-k rank over the matched-candidate set
#   key_skew_report        -- top-k rank over per-key counts (keys << rows)
#   source_mix_report      -- rank over the per-(source,lang) share table
#   percentile_bands       -- [if flagged] rank partitioned by event_type;
#                             only here defensively
GLOBAL_SORT_ALLOWED = {
    "funnel_conversion",
    "pmi_collocations",
    "tfidf_lang_terms",
    "bpe_train_merges",
    "bm25_keyword_search",
    "key_skew_report",
    "source_mix_report",
}

_WINDOW_LINE = re.compile(r"\bWindow(Group)?(Limit)?\b.*\[")


def unpartitioned_windows(plan: str) -> int:
    """Count Window nodes fed by an Exchange SinglePartition (the physical
    signature of 'No Partition Defined'), excluding the ranking module's
    <=P-row partition-size cumsum (ordered by `_pid`)."""
    lines = plan.splitlines()
    hits = 0
    for i, line in enumerate(lines):
        if "Window [" not in line:
            continue
        if "_pid#" in line:  # operators/ranking.py size-table cumsum
            continue
        # walk down the subtree to the first Exchange feeding this window
        for nxt in lines[i + 1 : i + 6]:
            if "Exchange SinglePartition" in nxt:
                hits += 1
                break
            if "Exchange " in nxt or "Scan" in nxt:
                break
    return hits


def audit(sf_dir: str) -> tuple[list[dict], list[str]]:
    spark = get_spark("plan_audit")
    rows, violations = [], []
    for name, q in sorted(REGISTRY.items()):
        if name in STREAMING:
            continue
        plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        joins = JOIN_RE.findall(plan)
        info = {
            "name": name,
            "exchanges": plan.count("Exchange "),
            "joins": ",".join(sorted(set(joins))) or "-",
            "pushed": "yes" if "PushedFilters: [" in plan and not re.search(r"PushedFilters: \[\]", plan) else "-",
            "cartesian": "CartesianProduct" in plan,
            "nlj": "BroadcastNestedLoopJoin" in plan,
            "global_sort": unpartitioned_windows(plan),
        }
        if (info["cartesian"] or info["nlj"]) and name not in NLJ_ALLOWED:
            violations.append(name)
        if info["global_sort"] and name not in GLOBAL_SORT_ALLOWED:
            violations.append(f"{name}:global-sort")
        rows.append(info)
    return rows, violations


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    rows, violations = audit(sf_dir)
    lines = [
        "# PLANS — physical-plan hygiene for batch registry queries",
        "",
        f"Audited at `{sf_dir}`. Exchanges = shuffle/broadcast exchange count;",
        "NLJ/cartesian allowed only for the documented by-design baselines "
        f"({', '.join(sorted(NLJ_ALLOWED))}).",
        "Global-sort = unpartitioned WindowExec count (single-partition sort),",
        "excluding the ranking module's <=P-row size-table cumsum; allowed "
        f"only for provably tiny inputs ({', '.join(sorted(GLOBAL_SORT_ALLOWED))}).",
        "",
        "| query | exchanges | joins | pushdown | NLJ/cartesian | global-sort |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        flag = "BY-DESIGN" if (r["cartesian"] or r["nlj"]) and r["name"] in NLJ_ALLOWED else (
            "VIOLATION" if (r["cartesian"] or r["nlj"]) else "-"
        )
        gflag = (
            "-" if not r["global_sort"]
            else ("BY-DESIGN" if r["name"] in GLOBAL_SORT_ALLOWED else "VIOLATION")
        )
        lines.append(
            f"| {r['name']} | {r['exchanges']} | {r['joins']} | {r['pushed']} | {flag} | {gflag} |"
        )
    lines.append("")
    lines.append(f"Violations: {violations or 'none'}")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; violations: {violations or 'none'}")
    if violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
