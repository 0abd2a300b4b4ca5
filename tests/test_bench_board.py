"""Board-artifact contract (VERDICT r12 #7): the committed bench board must
carry its own leg evidence so a genuine regression cannot hide inside the
known bimodal stateful-streaming noise.

The min-of-N combiner (tools/min_combine_bench.py) records per-query
`leg_values` (where a query ran in >2 legs) and `leg_spread` (where
max/min > 1.25). These tests pin that contract on the artifact itself:
every future board either keeps the evidence or fails the suite.
"""

from __future__ import annotations

import json
import os

import pytest

_BOARD = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench_results.json")

# Documented spread bound for the stateful-streaming replay family: the
# measured bimodality (state-store init + artifact-cache cold/warm) has
# stayed under ~2x between same-board legs; 3.0 leaves stall headroom while
# still failing on a real regression that min-of-N would otherwise bury.
_STREAM_SPREAD_BOUND = 3.0

_STREAM_PREFIXES = ("stream_", "streaming_")


@pytest.fixture(scope="module")
def board():
    if not os.path.exists(_BOARD):
        pytest.skip("no committed bench_results.json")
    with open(_BOARD) as f:
        b = json.load(f)
    if "min_of" not in b:
        pytest.skip("board is a single raw leg (driver-side run), not a min-of-N board")
    return b


def test_board_is_min_of_n_with_leg_totals(board):
    assert isinstance(board["min_of"], list) and len(board["min_of"]) >= 2
    assert len(board["leg_totals"]) == len(board["min_of"])
    # headline == sum of per-query minima (the artifact can't contradict itself)
    assert abs(sum(board["queries"].values()) - board["value"]) < 0.01


def test_stateful_streaming_family_carries_leg_evidence(board):
    """EVERY stateful-streaming query on the board — plus the composed
    example-app replays, which share the same replay constants and bimodal
    state-store-init spread (VERDICT r14 #7: streaming_daily_rollup's legs
    [2.04, 4.00, 2.24] showed the bimodality reaching a then-non-cohort
    row) — must carry >2-leg per-query values: the family is the
    documented bimodal cohort, and the third (SPARK_GRAFT_BENCH_ONLY)
    leg is exactly the evidence min-of-N otherwise erases. Pinning the
    whole prefix family (not a hand-list) means a new streaming query
    cannot ship on a board without its third leg."""
    lv = board.get("leg_values", {})
    cohort = [
        q
        for q in board["queries"]
        if q.startswith(_STREAM_PREFIXES)
        or (q.startswith("example_") and q.endswith("_parity"))
    ]
    assert cohort, "board has no stateful-streaming queries at all?"
    missing = [q for q in cohort if len(lv.get(q, [])) <= 2]
    assert not missing, (
        "stateful-streaming-family queries without >2-leg evidence "
        f"(run the third family leg over them): {missing}"
    )
    for q in cohort:
        assert min(lv[q]) > 0


def test_streaming_spread_within_documented_bound(board):
    """A recorded spread above the bound is a regression signal, not noise:
    investigate the slow leg instead of letting min() hide it."""
    sp = board.get("leg_spread", {})
    bad = {
        q: s
        for q, s in sp.items()
        if q.startswith(_STREAM_PREFIXES) and s > _STREAM_SPREAD_BOUND
    }
    assert not bad, f"stateful-streaming legs exceed {_STREAM_SPREAD_BOUND}x spread: {bad}"
