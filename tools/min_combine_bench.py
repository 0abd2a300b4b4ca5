"""Combine N >= 2 same-scale bench_results JSONs into a min-per-query file.

Usage: python tools/min_combine_bench.py a.json b.json [c.json ...] out.json

Rationale (r10): with chunk composition pinned and artifacts prewarmed,
residual per-query spread between two back-to-back runs is dominated by
EPISODIC host stalls (identical chunks showed 1.0-1.2x typical spread
with a heavy tail up to 7x on single queries, different queries each
run). min(legs) is the standard de-noising estimator for one-sided
noise: a stall can only inflate a timing, never deflate it. Witness
ratios (tools/make_sf1_witness.py) should compare min-files built from
the SAME number of legs at both scales so the estimator bias cancels.

r12 (VERDICT r11 #6): later legs may cover a SUBSET of queries (a third
leg over just the bimodal stateful-streaming family via
SPARK_GRAFT_BENCH_ONLY); a query's min is taken over the legs that ran
it. Per-query leg values and spread are recorded in the artifact
("leg_values"/"leg_spread") so the bimodal rows carry their own evidence
instead of recurring as single-leg regression noise each round.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    in_paths, out_path = sys.argv[1:-1], sys.argv[-1]
    if len(in_paths) < 2:
        sys.exit("need at least two leg files plus the output path")
    legs = []
    for p in in_paths:
        with open(p) as f:
            legs.append(json.load(f))
    a = legs[0]
    for p, leg in zip(in_paths[1:], legs[1:]):
        if leg.get("fixture_md5") != a.get("fixture_md5"):
            sys.exit(f"refusing to combine: fixture_md5 of {p} differs from {in_paths[0]}")
    # the first two legs define the query universe (full runs); later legs
    # may be subset re-runs and only refine queries they contain
    common = set(legs[0]["queries"]) & set(legs[1]["queries"])
    only = set(legs[0]["queries"]) ^ set(legs[1]["queries"])
    if only:
        print(f"warning: {len(only)} queries present in one full leg only: {sorted(only)[:5]}...",
              file=sys.stderr)
    leg_values = {
        q: [leg["queries"][q] for leg in legs if q in leg["queries"]]
        for q in sorted(common)
    }
    queries = {q: min(vs) for q, vs in leg_values.items()}
    spread = {
        q: round(max(vs) / min(vs), 3)
        for q, vs in leg_values.items() if min(vs) > 0
    }
    out = dict(a)
    out["queries"] = queries
    out["value"] = round(sum(queries.values()), 3)
    out["min_of"] = in_paths
    out["leg_totals"] = [leg["value"] for leg in legs]
    out["leg_loadavg"] = [leg.get("loadavg") for leg in legs]
    out["leg_host_control_sec"] = [leg.get("host_control_sec") for leg in legs]
    out["max_spread"] = max(spread.values()) if spread else None
    # per-query evidence, kept only where it says something (>1 legs and
    # non-trivial spread) so the artifact doesn't double in size
    out["leg_values"] = {q: vs for q, vs in leg_values.items() if len(vs) > 2}
    out["leg_spread"] = {q: s for q, s in spread.items() if s > 1.25}
    fams: dict[str, float] = {}
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import query_family

    for name, t in queries.items():
        fam = query_family(name)
        fams[fam] = round(fams.get(fam, 0.0) + t, 3)
    out["families"] = fams
    with open(out_path, "w") as f:
        json.dump(out, f)
    print(f"wrote {out_path}: {len(queries)} queries, total {out['value']}s "
          f"(legs {out['leg_totals']})")


if __name__ == "__main__":
    main()
