"""Compose SCALE100.json -- the 100x scale probe (VERDICT r9 #6).

Usage:
  python tools/make_scaled_data.py /root/testdata/sf0.1 /tmp/sf10 100
  SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_BENCH_ONLY=<top10,...> python bench.py
  python tools/make_scale100_probe.py <sf0.1_min.json> <sf10_results.json> "<note>"

vs_linear for a query = (sf10_sec / sf0.1_sec) / 100. The 10x witness
(BENCH_sf1.json) is where per-round regression gating lives; this probe
answers the coarser design question -- do the most expensive plans'
cost curves stay linear-or-better across TWO orders of magnitude, where
any surviving super-linear term (candidate-volume growth, state
accumulation, skew collapse) must dominate. Rows >= 2x linear are
failures to file, not gate-trippable noise: at 100x, constant overheads
are amortized away entirely, so the sf10 leg IS the plan.
"""

from __future__ import annotations

import json
import os
import sys


_MAX_NOTES = 12  # bounded per-wave history (ADVICE r11: '||'-append grew unboundedly)


def _registry_names() -> set[str] | None:
    """Current registry, so merged rows for renamed/removed queries are
    dropped before recomputing the over-2x list (ADVICE r11: stale pre-fix
    rows persisted forever). None if the package can't import here."""
    try:
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        from rlink_rs_spark.queries import REGISTRY

        return set(REGISTRY)
    except Exception:
        return None


def main() -> None:
    small_path, big_path = sys.argv[1], sys.argv[2]
    note = sys.argv[3] if len(sys.argv) > 3 else ""
    with open(small_path) as f:
        small = json.load(f)
    with open(big_path) as f:
        big = json.load(f)
    # merge into the standing probe file: later probe waves (r11 adds the
    # streaming/CDC family) extend coverage without dropping earlier rows;
    # a re-probed query's row is replaced (post-fix numbers supersede)
    queries = {}
    notes: list[str] = []
    prior: dict = {}
    if os.path.exists("SCALE100.json"):
        with open("SCALE100.json") as f:
            prior = json.load(f)
        queries = prior.get("queries", {})
        notes = prior.get("notes") or (
            [n for n in prior.get("note", "").split(" || ") if n]
        )
    for name, t_big in big["queries"].items():
        t_small = small["queries"].get(name)
        if not t_small:
            continue
        vs = round((t_big / t_small) / 100.0, 3)
        queries[name] = {"sf0.1_sec": t_small, "sf10_sec": t_big, "vs_linear": vs}
    live = _registry_names()
    if live is not None:
        dropped = sorted(set(queries) - live)
        queries = {n: r for n, r in queries.items() if n in live}
        if dropped:
            note = (note + f" [dropped stale rows: {dropped}]").strip()
    if note:
        notes = (notes + [note])[-_MAX_NOTES:]
    over2 = [n for n, r in queries.items() if r["vs_linear"] > 2.0]
    # read-modify-write: start from the prior artifact so top-level keys
    # this composer does NOT own (e.g. sf100_cap_probe, written by
    # tools/run_cap_probe.py) survive re-probes. VERDICT r13 #1 / ADVICE
    # r13: the r13 sf10 re-probe silently dropped the r12 #5 cap-probe
    # record because this dict was rebuilt from a fixed key set.
    out = dict(prior)
    out.update({
        "notes": notes,
        "scale_factor": 100,
        "queries": queries,
        "queries_over_2x_linear": sorted(over2),
        "loadavg_sf10": big.get("loadavg"),
        "fixture_md5_sf10": big.get("fixture_md5"),
    })
    with open("SCALE100.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))
    if over2:
        sys.exit(f"SUPER-LINEAR AT 100x: {sorted(over2)}")


if __name__ == "__main__":
    main()
