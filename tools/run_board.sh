#!/bin/bash
# Min-of-3 bench board protocol (SCALING.md r12+; memory: two full legs +
# one SPARK_GRAFT_BENCH_ONLY family leg over the bimodal
# stateful-streaming cohort, combined by tools/min_combine_bench.py --
# the ONLY writer of the committed board).
#
# Usage: tools/run_board.sh [outdir=/tmp]
# Waits for loadavg < 2 before each leg (idle-box rule, VERDICT r14 #1);
# leg-start loadavg is echoed -- record it in the board's
# leg_start_loadavg. Each leg's own local[32] load (3-8 during a run) is
# expected and lands in the in-artifact loadavg field; the host_control_sec
# field is the cross-board ambient discriminator.
set -e
cd "$(dirname "$0")/.."
out=${1:-/tmp}
fam=$(python - <<'PY'
from rlink_rs_spark.queries import REGISTRY
names=[n for n,q in REGISTRY.items() if q.bench and (
    n.startswith(("stream_","streaming_","kafka_python_"))
    or (n.startswith("example_") and n.endswith("_parity")))]
print(",".join(sorted(names)))
PY
)
echo "family cohort: $fam"
wait_idle() {
  while [ "$(cut -d' ' -f1 /proc/loadavg | cut -d. -f1)" -ge 2 ]; do sleep 30; done
}
for leg in A B; do
  wait_idle
  echo "=== leg $leg start loadavg=$(cut -d' ' -f1 /proc/loadavg) $(date +%T)"
  python bench.py 2>"$out/board_leg$leg.err"
  cp bench_results_last_leg.json "$out/board_leg$leg.json"
done
wait_idle
echo "=== leg C start loadavg=$(cut -d' ' -f1 /proc/loadavg) $(date +%T)"
SPARK_GRAFT_BENCH_ONLY="$fam" python bench.py 2>"$out/board_legC.err"
cp bench_results_last_leg.json "$out/board_legC.json"
python tools/min_combine_bench.py "$out/board_legA.json" "$out/board_legB.json" \
  "$out/board_legC.json" bench_results.json
echo "DONE -- annotate leg_start_loadavg from the === lines above, run" \
     "tests/test_bench_board.py, then commit bench_results.json"
