"""Dump .explain("formatted") for the named queries WITHOUT executing them
(streaming queries that execute eagerly inside fn() are skipped unless
--exec is given). Usage:
  python tools/capture_plans.py <outdir> <query> [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlink_rs_spark.queries import REGISTRY
from rlink_rs_spark.session import get_spark


def main() -> int:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(txt)
        print("wrote", name, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
