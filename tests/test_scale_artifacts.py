"""Scale-artifact contract (VERDICT r13 #1): the committed SCALE100.json
must keep BOTH the sf10 100x grid and the sf100 cap-probe record.

The r13 sf10 re-probe silently clobbered the `sf100_cap_probe` block (the
VERDICT r12 #5 deliverable, written by tools/run_cap_probe.py) because
tools/make_scale100_probe.py rebuilt the artifact from a fixed key set.
The composer now does a read-modify-write that preserves keys it does not
own; these tests pin the contract on the artifact itself so no future
probe wave can drop evidence silently (same pattern as
tests/test_bench_board.py for bench-leg evidence).
"""

from __future__ import annotations

import json
import os

import pytest

_SCALE100 = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALE100.json"
)


@pytest.fixture(scope="module")
def scale100():
    if not os.path.exists(_SCALE100):
        pytest.skip("no committed SCALE100.json")
    with open(_SCALE100) as f:
        return json.load(f)


def test_scale100_required_top_level_keys(scale100):
    for key in (
        "notes",
        "scale_factor",
        "queries",
        "queries_over_2x_linear",
        "sf100_cap_probe",
        "sf1000_stream_probe",
    ):
        assert key in scale100, (
            f"SCALE100.json lost required key {key!r}; a probe composer "
            "clobbered evidence it does not own (VERDICT r13 #1)"
        )


def test_scale100_grid_rows_all_linear_or_better(scale100):
    queries = scale100["queries"]
    assert len(queries) >= 40, "the 100x grid shrank below its r13 coverage"
    over2 = [n for n, r in queries.items() if r["vs_linear"] > 2.0]
    assert over2 == [], f"super-linear rows at 100x: {over2}"
    assert scale100["queries_over_2x_linear"] == sorted(over2)


def test_cap_probe_record_shape(scale100):
    """The 1000x cap probe must carry its load-bearing fields: the
    witnessed posting-cap bind (keys dropped + pairs prevented at the Zipf
    head) and the per-leg vs_linear ratios SCALING.md cites."""
    probe = scale100["sf100_cap_probe"]
    assert probe["scale_ratio"] >= 1000.0
    sf100_hot = probe["legs"]["sf100"]["hot_postings_report"]
    assert sf100_hot["keys_dropped"] > 0, "cap probe no longer shows the cap binding"
    assert sf100_hot["pairs_prevented"] > 1e9
    for name, vs in probe["vs_linear_run2"].items():
        assert vs <= 2.0, f"cap-probe leg {name} super-linear: {vs}"


def test_stream_probe_record_shape(scale100):
    """The 1000x streaming probe (VERDICT r13 #6) must carry its
    load-bearing witnesses: flat join state across the replay (watermark
    eviction engaged -- without it the last-quarter max approaches total
    input), scale-invariant state per epoch row, and exact 1000x join
    output (per-tile key disjointness held)."""
    probe = scale100["sf1000_stream_probe"]
    assert probe["join_output_ratio"] >= 999.0
    assert probe["join_state_q4_over_q1"] <= 1.5
    per_row = probe["join_state_per_epoch_row"]
    assert 0.5 <= per_row["sf1000"] / per_row["base"] <= 2.0
    assert probe["join_state_share_of_input_sf1000"] < 0.05


def test_stream_probe_chained_app_record_shape(scale100):
    """The chained-stateful tier (VERDICT r14 #5): the example-connect app
    plan runs TWO state stores in one query; each store's occupancy must
    be flat across the 1000x replay. The upstream bucket agg is witnessed
    on end-of-batch state rows; the downstream merge agg finalizes within
    the batch its inputs arrive (numRowsTotal 0 at batch end), so its
    flatness is witnessed on per-epoch numRowsUpdated churn -- the ratio
    map covers BOTH, and both must be ~1."""
    probe = scale100["sf1000_stream_probe"]
    ratios = probe["chained_state_q4_over_q1_per_store"]
    assert len(ratios) == 2, ratios
    for op, r in ratios.items():
        assert 0.5 <= r <= 1.5, f"{op} chained-app state not flat: {r}"
    leg = probe["legs"]["sf1000"]["chained_app"]
    base = probe["legs"]["base"]["chained_app"]
    assert leg["n_state_operators"] == 2
    # exact 1000x output (per-tile key disjointness held through BOTH aggs)
    assert leg["rows"] / base["rows"] >= 999.0
