"""Distributed exact NTILE (operators/ranking.py): closed-form tile parity
vs Spark's own NTILE window, exact-rank permutation invariants, and the
structural guarantee that the three r6 global-sort findings
(lm_perplexity_filter, dsir_importance_weights, equi_depth_histogram) no
longer contain a corpus-sized single-partition WindowExec."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rlink_rs_spark.operators.ranking import ntile_expr, with_global_rank

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.mark.parametrize("n,k", [(1, 3), (2, 3), (3, 3), (10, 3), (12, 4), (13, 4), (500, 7), (5, 10)])
def test_ntile_closed_form_matches_spark_ntile(spark, n, k):
    """The BIGINT closed form must agree with F.ntile for every rank at
    n < k, n % k == 0, and n % k > 0."""
    df = spark.range(1, n + 1).select(
        F.col("id").alias("r"), F.lit(n).cast("bigint").alias("n")
    )
    out = df.select(
        "r",
        F.expr(ntile_expr("r", "n", k)).alias("closed"),
        F.ntile(k).over(Window.orderBy("r")).cast("bigint").alias("builtin"),
    ).collect()
    for row in out:
        assert row.closed == row.builtin, (n, k, row.r)


def test_with_global_rank_is_exact_permutation(spark):
    """Ranks must be exactly 1..n under the total order, agreeing with a
    single-partition row_number baseline -- including duplicate score values
    resolved by the unique tie-break column."""
    df = spark.range(0, 997).select(
        F.col("id").alias("uid"), (F.col("id") % 13).cast("bigint").alias("score")
    )
    ranked = with_global_rank(df, [F.col("score"), F.col("uid")], num_partitions=7)
    rows = {r.uid: (r._grank, r._gtotal) for r in ranked.collect()}
    baseline = {
        r.uid: r.base
        for r in df.select(
            "uid", F.row_number().over(Window.orderBy("score", "uid")).alias("base")
        ).collect()
    }
    assert len(rows) == 997
    assert all(tot == 997 for _, tot in rows.values())
    assert {g for g, _ in rows.values()} == set(range(1, 998))
    assert {u: g for u, (g, _) in rows.items()} == baseline


def test_with_global_rank_descending_order(spark):
    df = spark.range(0, 100).select(F.col("id").alias("uid"))
    ranked = with_global_rank(df, [F.col("uid").desc()], num_partitions=5)
    top = {r.uid: r._grank for r in ranked.collect()}
    assert top[99] == 1 and top[0] == 100


GLOBAL_SORT_FIXED = [
    "lm_perplexity_filter",
    "dsir_importance_weights",
    "equi_depth_histogram",
]


@pytest.mark.parametrize("name", GLOBAL_SORT_FIXED)
def test_no_corpus_sized_unpartitioned_window(spark, sf_dir, name):
    """The r6 VERDICT's three global-sort findings: the executed plan must
    contain no unpartitioned WindowExec other than the ranking module's
    <=P-row size-table cumsum (tools/plan_audit.py's global-sort rule)."""
    from plan_audit import unpartitioned_windows

    from rlink_rs_spark.queries import REGISTRY

    plan = (
        REGISTRY[name].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    )
    assert unpartitioned_windows(plan) == 0, plan


def test_plan_audit_detector_flags_global_ntile(spark):
    """Self-test of the global-sort detector: a raw NTILE-over-everything
    plan (the shape the three fixed queries used to have) must be flagged."""
    from plan_audit import unpartitioned_windows

    df = spark.range(0, 1000).select(
        F.ntile(3).over(Window.orderBy("id")).alias("t"), F.col("id")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert unpartitioned_windows(plan) >= 1, plan


def test_with_group_rank_matches_keyed_window(spark, sf_dir):
    """Per-group distributed rank must equal row_number() OVER (PARTITION BY
    group ORDER BY ...) exactly -- including duplicate order values resolved
    by the tie-break -- while never funneling a group through one task."""
    from rlink_rs_spark.operators.ranking import with_group_rank
    from rlink_rs_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "value", "event_id")
    got = {
        (r.event_type, r.event_id): r._grank
        for r in with_group_rank(
            ev, ["event_type"], [F.col("value"), F.col("event_id")], num_partitions=7
        ).collect()
    }
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    want = {
        (r.event_type, r.event_id): r.rn
        for r in ev.select(
            "event_type", "event_id", F.row_number().over(w).cast("bigint").alias("rn")
        ).collect()
    }
    assert got == want and got


def test_percentile_bands_has_no_keyed_window(spark, sf_dir):
    """The r7 rewire: percentile_bands must contain NO WindowExec over the
    events table at all (neither unpartitioned nor low-cardinality-keyed);
    the only window is the ranking module's <=P-row size cumsum."""
    from rlink_rs_spark.queries import REGISTRY

    plan = (
        REGISTRY["percentile_bands"].fn(spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert windows and all("_pid#" in ln for ln in windows), plan


def test_with_group_prefix_sum_matches_keyed_window(spark, sf_dir):
    """Distributed per-group running sum must equal SUM() OVER (PARTITION BY
    group ORDER BY ... ROWS UNBOUNDED PRECEDING) bit-for-bit on integer
    values (the pack_sequences shape)."""
    from rlink_rs_spark.operators.ranking import with_group_prefix_sum
    from rlink_rs_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n")
    )
    got = {
        (r.lang, r.doc_id): r._gcum
        for r in with_group_prefix_sum(
            docs, ["lang"], [F.col("doc_id")], "n", num_partitions=7
        ).collect()
    }
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = {
        (r.lang, r.doc_id): r.c
        for r in docs.select(
            "lang", "doc_id", F.sum("n").over(w).cast("bigint").alias("c")
        ).collect()
    }
    assert got == want and got
