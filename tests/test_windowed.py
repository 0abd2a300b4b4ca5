"""Windowed aggregation queries vs the DuckDB oracle (FIXTURES.md scenarios
1-4, 6): flagship sliding, tumbling, window offset, multi-key, percentile."""

from __future__ import annotations

import pytest

from tests.helpers import run_query_vs_oracle

WINDOWED = [
    "flagship_sliding_window_agg",
    "tumbling_window_agg",
    "window_offset_agg",
    "multi_key_window_agg",
    "pct_window_agg",
    "range_window_filter",
    "moving_average_7d",
    "dynamic_gap_sessions",
    "pct_output_decode",
    "session_window_agg",
    # new in r8, not in the window
    "window_distinct_users",
    # r14: the example-connect app composed end-to-end as one streaming
    # query (VERDICT r13 #5) -- pct accumulate + decode in-plan
    "example_connect_app_parity",
]


@pytest.mark.parametrize("name", WINDOWED)
def test_windowed_matches_oracle(spark, duck, sf_dir, name):
    run_query_vs_oracle(spark, duck, sf_dir, name)


def test_flagship_covers_each_event_thrice(spark, duck, sf_dir):
    # sliding 60s/20s: every event lands in exactly size/slide = 3 windows
    from rlink_rs_spark.queries import REGISTRY
    from rlink_rs_spark.tables import load_table

    total_events = load_table(spark, sf_dir, "events").count()
    agg = REGISTRY["flagship_sliding_window_agg"].fn(spark, sf_dir)
    from pyspark.sql import functions as F

    counted = agg.agg(F.sum("cnt")).collect()[0][0]
    assert counted == 3 * total_events


def test_window_offset_normalization():
    from rlink_rs_spark.operators.windows import normalize_offset

    assert normalize_offset(-8 * 3600, 24 * 3600) == 16 * 3600
    assert normalize_offset(8 * 3600, 24 * 3600) == 8 * 3600
    assert normalize_offset(0, 60) == 0
