"""Per-query phase profiler: separates Python plan construction, Catalyst
optimization (executedPlan materialization), and execution (noop sink) so
an optimization round can tell WHERE a query's seconds go (guide §1:
measure first). Also dumps .explain("formatted") per query.

Usage: python tools/profile_query.py [sf_dir] [outdir] query [query ...]
Each query runs in THIS process (warm JVM if you pass several; pass one
for a cold-ish number). Prints one line per query:
  name  t_build  t_plan  t_exec  t_total
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlink_rs_spark.queries import REGISTRY
from rlink_rs_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/plans_r15"
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("profile")
    print(f"{'query':40s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    for name in names:
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        df = REGISTRY[name].fn(spark, sf_dir)
        t1 = time.time()
        # force analysis+optimization+physical planning without execution
        plan_txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan_txt)
        print(
            f"{name:40s} {t1 - t0:7.2f} {t2 - t1:7.2f} {t3 - t2:7.2f} {t3 - t0:7.2f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
