"""Row transforms, connect analogues, and relational extras vs the oracle
(FIXTURES.md scenario 7 + SURVEY §2.2/§2.4/§2.9 coverage)."""

from __future__ import annotations

import pytest

from tests.helpers import run_query_vs_oracle

RELATIONAL = [
    "flat_map_filter_transform",
    "union_connect",
    "broadcast_enrichment_join",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "top_k_per_group",
    "set_ops_users",
    "distinct_agg",
    "sessionization",
]


@pytest.mark.parametrize("name", RELATIONAL)
def test_relational_matches_oracle(spark, duck, sf_dir, name):
    run_query_vs_oracle(spark, duck, sf_dir, name)


def test_broadcast_join_plan_is_broadcast(spark, sf_dir):
    # the enrichment join must not shuffle the fact side
    from rlink_rs_spark.queries import REGISTRY

    plan = REGISTRY["broadcast_enrichment_join"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_q1_filter_pushdown(spark, sf_dir):
    from rlink_rs_spark.queries import REGISTRY

    plan = REGISTRY["q1_pricing_summary"].fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
