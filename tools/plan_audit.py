"""Dump physical-plan hygiene for every registry query to PLANS.md:
exchange count, join operators, scan pushdown evidence, and red flags
(CartesianProduct / BroadcastNestedLoopJoin outside the by-design set,
single-partition WindowExec outside the provably-tiny set).

Batch queries are planned lazily (executedPlan, nothing runs). Streaming
queries (VERDICT r10 #5) are RUN at the audit sf_dir with tool-side hooks:
every StreamingQuery started inside fn() is recorded and its last-batch
physical plan read back via explainInternal after the drain, and every
batch-side action a foreachBatch body performs (writer.save/parquet,
collect/count/toPandas) snapshots its DataFrame's executedPlan -- so the
audit covers both the micro-batch plan the engine runs per trigger and
the inner plans a foreachBatch sink builds on each epoch.

Usage: python tools/plan_audit.py [sf_dir] [--batch-only|--streaming-only]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlink_rs_spark.queries import REGISTRY  # noqa: E402
from rlink_rs_spark.session import get_spark  # noqa: E402

# Queries that execute streaming jobs inside fn() -- audited by the
# streaming pass (run + hook), not the lazy batch pass.
STREAMING = {
    name
    for name in REGISTRY
    if name.startswith(("streaming_", "stream_stream_")) or name == "kafka_loopback_seek"
}

# By-design nested-loop/cross shapes: name -> one-line justification
# (VERDICT r10 #8: the reason lives ON the row, not in a header paragraph).
# Every entry is a broadcast of a CONSTANT-BOUNDED side (1-row scalar
# aggregate, <=16-row codebook, <=784-row LUT) -- never corpus-sized.
NLJ_ALLOWED = {
    "cosine_topk_bruteforce": "exact-NN baseline IS a broadcast NLJ (query side <=10 rows)",
    "hard_negative_mining": "same <=10-row broadcast-query NLJ with label-mismatch fused into the join",
    "cosine_topk_ivf": "16-row centroid codebook broadcast cross (assignment)",
    "cosine_topk_ivf_filtered": "16-row centroid codebook broadcast cross (assignment)",
    "filtered_ann_recall_report": "composition of the filtered-IVF plan + a <=10-row broadcast-query exact baseline NLJ",
    "cosine_topk_ivfpq": "16-row IVF codebook broadcast cross, assignment + probing",
    "semantic_dedup": "16-row (occupancy-scaled) centroid codebook broadcast cross",
    "range_window_filter": "single-row window-bounds frame joined without keys",
    "q22_dormant_customers": "1-row avg-balance scalar-subquery broadcast cross",
    "q11_important_stock": "1-row (total,count) threshold broadcast cross (> filter)",
    "temperature_resample_weights": "1-row normalizer broadcast cross",
    "resample_corpus_epoch": "1-row (tot,total_docs) normalizer broadcast cross",
    "pagerank_trade_graph": "1-row node-count broadcast cross per unrolled iteration",
    "source_mix_report": "1-row corpus-total broadcast cross (share computation)",
    "bm25_keyword_search": "1-row corpus-totals cross onto the small candidate side",
    "dsir_importance_weights": "1-row totals cross onto the <=128-row feature LUT",
    "pmi_collocations": "1-row (tt,bt) totals cross onto count-filtered bigrams",
    "tfidf_lang_terms": "1-row doc-count broadcast cross onto (lang,term) vocab",
    "key_skew_report": "1-row totals broadcast cross onto top-k key rows",
    "incremental_daily_rollup": "1-row max-day broadcast cross replaces the per-run eager scalar scan",
    "lm_perplexity_filter": "1-row ranking-total broadcast cross (exact NTILE)",
    "equi_depth_histogram": "1-row ranking-total broadcast cross (exact NTILE)",
    "curriculum_stages": "1-row ranking-total broadcast cross (exact NTILE)",
    "cms_heavy_hitters": "4-row sketch-row-index replication cross (d=4 counters)",
    "ann_recall_report": "composition of cosine_topk_{bruteforce,ivf}, both listed",
    "quality_ensemble_gate": "composition: inherits lm/dsir/repetition 1-row crosses",
    "hybrid_search_rrf": "3-row exemplar query broadcast NLJ + 1-row bm25 totals cross",
}

# By-design UNPARTITIONED windows (single-partition WindowExec): name ->
# why the window input is provably tiny (constant/config-bounded, never
# corpus-sized). The ranking-module <=P-row `_pid` cumsum is auto-exempt.
GLOBAL_SORT_ALLOWED = {
    "funnel_conversion": "LAG over the 3-row stage summary",
    "pmi_collocations": "top-30 rank over nab>=5-filtered bigram vocab",
    "tfidf_lang_terms": "per-lang top-k rank over (lang,term) vocab, not corpus",
    "bpe_train_merges": "rank over the <=784-entry candidate-pair table",
    "bm25_keyword_search": "top-k rank over the matched-candidate set",
    "key_skew_report": "top-k rank over per-key counts (keys << rows)",
    "source_mix_report": "rank over the per-(source,lang) share table",
}

# Streaming by-design entries (same contract; plans come from the hook
# captures, which include setup/read-back batch work fn() performs).
STREAMING_NLJ_ALLOWED = {
    "streaming_hybrid_search": "3-row exemplar query broadcast NLJ (hybrid_search_rrf read-back shape)",
    "streaming_ann_probe": "<=10-row query-batch broadcast NLJ onto probed cells + 16-row codebook cross (cosine_topk_ivf shape)",
    "streaming_cms_counters": "d=4 sketch-row-index replication cross (cms_heavy_hitters shape)",
    "streaming_ivf_index_add": "16-row IVF codebook broadcast cross per epoch (cosine_topk_ivf assignment shape)",
}
STREAMING_GLOBAL_SORT_ALLOWED: dict[str, str] = {}

JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
)


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


def plan_info(name: str, plans: list[str]) -> dict:
    """Aggregate hygiene stats over one or more physical-plan strings."""
    joins: set[str] = set()
    exchanges = 0
    pushed = False
    cartesian = nlj = False
    gsort = 0
    for plan in plans:
        joins.update(JOIN_RE.findall(plan))
        exchanges += plan.count("Exchange ")
        if "PushedFilters: [" in plan and not re.search(r"PushedFilters: \[\]", plan):
            pushed = True
        cartesian = cartesian or "CartesianProduct" in plan
        nlj = nlj or "BroadcastNestedLoopJoin" in plan
        gsort += unpartitioned_windows(plan)
    return {
        "name": name,
        "n_plans": len(plans),
        "exchanges": exchanges,
        "joins": ",".join(sorted(joins)) or "-",
        "pushed": "yes" if pushed else "-",
        "cartesian": cartesian,
        "nlj": nlj,
        "global_sort": gsort,
    }


def audit_batch(spark, sf_dir: str) -> tuple[list[dict], list[str]]:
    rows, violations = [], []
    for name, q in sorted(REGISTRY.items()):
        if name in STREAMING:
            continue
        plan = q.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        info = plan_info(name, [plan])
        if (info["cartesian"] or info["nlj"]) and name not in NLJ_ALLOWED:
            violations.append(name)
        if info["global_sort"] and name not in GLOBAL_SORT_ALLOWED:
            violations.append(f"{name}:global-sort")
        rows.append(info)
    return rows, violations


class _StreamingHooks:
    """Tool-side capture of every plan a streaming query touches: the
    engine's last-batch plan (explainInternal on each StreamingQuery
    started while active) plus the executedPlan of every batch DataFrame a
    foreachBatch body (or setup/read-back code) acts on. Product code is
    untouched -- hooks patch the PySpark surface for the audit run only."""

    def __init__(self) -> None:
        self.queries: list = []
        self.batch_plans: list[str] = []

    def __enter__(self):
        from pyspark.sql import DataFrame
        from pyspark.sql.readwriter import DataFrameWriter
        from pyspark.sql.streaming.readwriter import DataStreamWriter

        hooks = self

        self._orig_start = DataStreamWriter.start
        def start(wself, *a, **kw):
            q = hooks._orig_start(wself, *a, **kw)
            hooks.queries.append(q)
            return q
        DataStreamWriter.start = start

        def snap(df) -> None:
            try:
                hooks.batch_plans.append(
                    df._jdf.queryExecution().executedPlan().toString()
                )
            except Exception:
                pass  # audit is best-effort; never break the query run

        self._w_origs = {}
        for meth in ("save", "parquet", "json", "csv"):
            orig = getattr(DataFrameWriter, meth)
            self._w_origs[meth] = orig
            def wrapped(wself, *a, _orig=orig, **kw):
                snap(wself._df)
                return _orig(wself, *a, **kw)
            setattr(DataFrameWriter, meth, wrapped)

        self._df_origs = {}
        for meth in ("collect", "count", "toPandas"):
            orig = getattr(DataFrame, meth)
            self._df_origs[meth] = orig
            def wrapped_df(dself, *a, _orig=orig, **kw):
                snap(dself)
                return _orig(dself, *a, **kw)
            setattr(DataFrame, meth, wrapped_df)
        return self

    def __exit__(self, *exc):
        from pyspark.sql import DataFrame
        from pyspark.sql.readwriter import DataFrameWriter
        from pyspark.sql.streaming.readwriter import DataStreamWriter

        DataStreamWriter.start = self._orig_start
        for meth, orig in self._w_origs.items():
            setattr(DataFrameWriter, meth, orig)
        for meth, orig in self._df_origs.items():
            setattr(DataFrame, meth, orig)
        return False

    def stream_plans(self) -> list[str]:
        plans = []
        for q in self.queries:
            try:
                plans.append(q._jsq.explainInternal(False))
            except Exception:
                pass  # query with no completed batch has no lastExecution
        return plans


def audit_streaming(spark, sf_dir: str) -> tuple[list[dict], list[str]]:
    rows, violations = [], []
    for name in sorted(STREAMING):
        q = REGISTRY[name]
        with _StreamingHooks() as hooks:
            result = q.fn(spark, sf_dir)
            result._jdf.queryExecution().executedPlan()  # plan the read-back too
            plans = hooks.stream_plans() + hooks.batch_plans
        info = plan_info(name, plans)
        if (info["cartesian"] or info["nlj"]) and name not in STREAMING_NLJ_ALLOWED:
            violations.append(name)
        if info["global_sort"] and name not in STREAMING_GLOBAL_SORT_ALLOWED:
            violations.append(f"{name}:global-sort")
        rows.append(info)
    return rows, violations


def _table(rows: list[dict], nlj_allowed: dict, gsort_allowed: dict,
           with_nplans: bool = False) -> list[str]:
    head = "| query | " + ("plans | " if with_nplans else "") + \
        "exchanges | joins | pushdown | NLJ/cartesian | global-sort | by-design reason |"
    sep = "|---|" + ("---|" if with_nplans else "") + "---|---|---|---|---|---|"
    lines = [head, sep]
    for r in rows:
        reasons = []
        if r["cartesian"] or r["nlj"]:
            flag = "BY-DESIGN" if r["name"] in nlj_allowed else "VIOLATION"
            if r["name"] in nlj_allowed:
                reasons.append(nlj_allowed[r["name"]])
        else:
            flag = "-"
        if not r["global_sort"]:
            gflag = "-"
        elif r["name"] in gsort_allowed:
            gflag = "BY-DESIGN"
            reasons.append(gsort_allowed[r["name"]])
        else:
            gflag = "VIOLATION"
        np = f" {r['n_plans']} |" if with_nplans else ""
        lines.append(
            f"| {r['name']} |{np} {r['exchanges']} | {r['joins']} | {r['pushed']} "
            f"| {flag} | {gflag} | {'; '.join(reasons) or '-'} |"
        )
    return lines


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    do_batch = "--streaming-only" not in sys.argv
    do_streaming = "--batch-only" not in sys.argv
    spark = get_spark("plan_audit")

    lines = [
        "# PLANS — physical-plan hygiene for registry queries",
        "",
        f"Audited at `{sf_dir}`. Exchanges = shuffle/broadcast exchange count;",
        "NLJ/cartesian and single-partition WindowExec are VIOLATIONS unless the",
        "row carries a by-design reason (constant-bounded input, never corpus-sized).",
        "",
    ]
    all_violations: list[str] = []

    if do_batch:
        rows, violations = audit_batch(spark, sf_dir)
        all_violations += violations
        lines += ["## Batch queries (lazy executedPlan)", ""]
        lines += _table(rows, NLJ_ALLOWED, GLOBAL_SORT_ALLOWED)
        lines.append("")

    if do_streaming:
        srows, sviolations = audit_streaming(spark, sf_dir)
        all_violations += sviolations
        lines += [
            "## Streaming queries (executed micro-batch plans, VERDICT r10 #5)",
            "",
            "Each query RUNS at the audit sf_dir; `plans` = captured plan count",
            "(explainInternal last-batch plan per started StreamingQuery + the",
            "executedPlan of every batch action inside foreachBatch/setup/read-back).",
            "",
        ]
        lines += _table(srows, STREAMING_NLJ_ALLOWED, STREAMING_GLOBAL_SORT_ALLOWED,
                        with_nplans=True)
        lines.append("")

    lines.append(f"Violations: {all_violations or 'none'}")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}; violations: {all_violations or 'none'}")
    if all_violations:
        sys.exit(1)


if __name__ == "__main__":
    main()
