"""TPC-H shape queries vs the DuckDB oracle (SURVEY §2.9 relational
coverage). q1/q3/q5 live in test_relational.py; this file covers the
subquery-heavy shapes added in rounds 5-6 so every TPC-H entry keeps a
local witness even when rotated out of the driver's 50-row window."""

from __future__ import annotations

import pytest

from tests.helpers import run_query_vs_oracle

TPCH = [
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q12_priority_class",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "q11_important_stock",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q19_bracket_revenue",
    "q20_promo_suppliers",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    "avg_agg",
    "value_band_join",
    "pagerank_trade_graph",
]


@pytest.mark.parametrize("name", TPCH)
def test_tpch_matches_oracle(spark, duck, sf_dir, name):
    run_query_vs_oracle(spark, duck, sf_dir, name)
