"""Combine two same-scale bench_results JSONs into a min-per-query file.

Usage: python tools/min_combine_bench.py a.json b.json out.json

Rationale (r10): with chunk composition pinned and artifacts prewarmed,
residual per-query spread between two back-to-back runs is dominated by
EPISODIC host stalls (identical chunks showed 1.0-1.2x typical spread
with a heavy tail up to 7x on single queries, different queries each
run). min(A, B) is the standard de-noising estimator for one-sided
noise: a stall can only inflate a timing, never deflate it. Witness
ratios (tools/make_sf1_witness.py) should compare min-files built from
the SAME number of legs at both scales so the estimator bias cancels.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    a_path, b_path, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
    with open(a_path) as f:
        a = json.load(f)
    with open(b_path) as f:
        b = json.load(f)
    if a.get("fixture_md5") != b.get("fixture_md5"):
        sys.exit("refusing to combine: fixture_md5 differs between legs")
    common = set(a["queries"]) & set(b["queries"])
    only = set(a["queries"]) ^ set(b["queries"])
    if only:
        print(f"warning: {len(only)} queries present in one leg only: {sorted(only)[:5]}...",
              file=sys.stderr)
    queries = {q: min(a["queries"][q], b["queries"][q]) for q in sorted(common)}
    spread = {
        q: round(max(a["queries"][q], b["queries"][q]) / queries[q], 3)
        for q in queries if queries[q] > 0
    }
    out = dict(a)
    out["queries"] = queries
    out["value"] = round(sum(queries.values()), 3)
    out["min_of"] = [a_path, b_path]
    out["leg_totals"] = [a["value"], b["value"]]
    out["max_spread"] = max(spread.values()) if spread else None
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
          f"(legs {a['value']} / {b['value']})")


if __name__ == "__main__":
    main()
