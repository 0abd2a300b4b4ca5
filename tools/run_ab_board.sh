#!/bin/bash
# Same-host A/B full-board comparison: interleave legs of HEAD (optimized)
# and a reference checkout (pre-optimization) so host clock/ambient cancels
# out of the comparison. Produces min-of-3 candidate boards for BOTH codes
# (2 full legs + 1 SPARK_GRAFT_BENCH_ONLY family leg each, combined by
# tools/min_combine_bench.py), written under $outdir — it never touches the
# committed bench_results.json.
#
# Usage: tools/run_ab_board.sh <ref_checkout_dir> [outdir=/tmp/ab_board]
set -e
cd "$(dirname "$0")/.."
head_dir=$(pwd)
ref_dir=${1:?usage: run_ab_board.sh <ref_checkout_dir> [outdir]}
out=${2:-/tmp/ab_board}
mkdir -p "$out"
# Cohort computed per-checkout (ADVICE r15): a query added/renamed since
# the ref commit would otherwise abort only at leg ref_C, after ~5 legs.
cohort_of() { (cd "$1" && python - <<'PY'
from rlink_rs_spark.queries import REGISTRY
names=[n for n,q in REGISTRY.items() if q.bench and (
    n.startswith(("stream_","streaming_","kafka_python_"))
    or (n.startswith("example_") and n.endswith("_parity")))]
print(",".join(sorted(names)))
PY
); }
fam_head=$(cohort_of "$head_dir")
fam_ref=$(cohort_of "$ref_dir")
echo "family cohort (head): $fam_head"
[ "$fam_head" = "$fam_ref" ] || echo "family cohort (ref) differs: $fam_ref"
wait_idle() {
  while [ "$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)" -ge 2 ]; do sleep 30; done
}
run_leg() { # $1=dir $2=tag $3=family(0/1)
  wait_idle
  echo "=== leg $2 start loadavg=$(cut -d' ' -f1 /proc/loadavg) $(date +%T)"
  # Stale-leg guard (ADVICE r15): bench.py only writes
  # bench_results_last_leg.json when the checkout's committed board has
  # 'min_of'; without this rm a ref checkout that falls through to
  # bench_results.json would silently feed an EARLIER run's gitignored
  # last_leg file into the combine.
  rm -f "$1/bench_results_last_leg.json"
  fam=$([ "$1" = "$head_dir" ] && echo "$fam_head" || echo "$fam_ref")
  if [ "$3" = 1 ]; then
    (cd "$1" && SPARK_GRAFT_BENCH_ONLY="$fam" python bench.py 2>"$out/$2.err")
  else
    (cd "$1" && python bench.py 2>"$out/$2.err")
  fi
  if [ ! -f "$1/bench_results_last_leg.json" ]; then
    echo "FATAL: leg $2 produced no bench_results_last_leg.json" >&2
    exit 1
  fi
  cp "$1/bench_results_last_leg.json" "$out/$2.json"
}
# Interleave so slow drift hits both codes symmetrically.
run_leg "$head_dir" head_A 0
run_leg "$ref_dir"  ref_A  0
run_leg "$head_dir" head_B 0
run_leg "$ref_dir"  ref_B  0
run_leg "$head_dir" head_C 1
run_leg "$ref_dir"  ref_C  1
python tools/min_combine_bench.py "$out/head_A.json" "$out/head_B.json" \
  "$out/head_C.json" "$out/head_board.json"
python tools/min_combine_bench.py "$out/ref_A.json" "$out/ref_B.json" \
  "$out/ref_C.json" "$out/ref_board.json"
python - "$out" <<'PY'
import json, sys, os
out = sys.argv[1]
h = json.load(open(os.path.join(out, "head_board.json")))
r = json.load(open(os.path.join(out, "ref_board.json")))
print(f"HEAD total {h['value']}  host_control legs {h.get('leg_host_control_sec')}")
print(f"REF  total {r['value']}  host_control legs {r.get('leg_host_control_sec')}")
common = set(h["queries"]) & set(r["queries"])
# Headline over the COMMON set (ADVICE r15): the raw totals above are each
# summed over their own board's query set and mislead when the sets differ.
hc, rc = sum(h["queries"][q] for q in common), sum(r["queries"][q] for q in common)
print(f"common-set ({len(common)} queries) totals: HEAD {hc:.3f}  REF {rc:.3f}  ratio {hc/rc:.3f}")
only_h = sorted(set(h["queries"]) - common); only_r = sorted(set(r["queries"]) - common)
if only_h: print("only in HEAD:", ", ".join(only_h))
if only_r: print("only in REF:", ", ".join(only_r))
diffs = sorted(((h["queries"][q] - r["queries"][q], q) for q in common))
print("biggest wins (head-ref, sec):")
for d, q in diffs[:12]:
    print(f"  {d:+7.2f}  {q}  ({r['queries'][q]} -> {h['queries'][q]})")
print("biggest losses:")
for d, q in diffs[-6:]:
    print(f"  {d:+7.2f}  {q}  ({r['queries'][q]} -> {h['queries'][q]})")
PY
echo "DONE"
