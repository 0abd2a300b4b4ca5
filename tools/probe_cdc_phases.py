"""Phase-split probe for cdc_schema_evolution (r16, guide §1): times the
base snapshot write, then replays the 4 epochs by hand through
apply_merge_epoch, splitting each epoch into touched-collect and
merged-write. Also counts Spark jobs per phase via the status tracker.

Usage: python tools/probe_cdc_phases.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.compute as pc
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from rlink_rs_spark.session import get_spark
from rlink_rs_spark.tables import load_table


def main() -> int:
    import tempfile

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe_cdc")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    from rlink_rs_spark.streaming.cdc import (
        _SNAP_SCHEMA_V2,
        apply_merge_epoch,
        read_snapshot,
        write_base_snapshot,
    )

    def jobs() -> int:
        return len(tracker.getJobIdsForGroup(None) or [])

    def t(label, fn):
        j0, t0 = jobs(), time.time()
        r = fn()
        dt, dj = time.time() - t0, jobs() - j0
        print(f"  {label:26s} {dt:7.3f}s  jobs+{dj}", flush=True)
        return r

    docs = load_table(spark, sf_dir, "documents")
    work_dir = tempfile.mkdtemp(prefix="rlink_probe_cdc_")
    t("base_snapshot", lambda: write_base_snapshot(docs, work_dir))

    # replay the 4 doc_id-ordered chunks as epochs, like the staged stream
    table = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    table = table.take(pc.sort_indices(table, sort_keys=[("doc_id", "ascending")]))
    n = table.num_rows
    per = (n + 3) // 4
    for e in range(4):
        chunk = table.slice(e * per, per)
        tmp = tempfile.mkdtemp(prefix=f"rlink_probe_cdc_e{e}_")
        pq.write_table(chunk, os.path.join(tmp, "c.parquet"))
        batch_df = spark.read.parquet(tmp).select(
            "doc_id", "text", "lang", "source", "n_chars"
        )
        t(
            f"epoch{e}_apply",
            lambda b=batch_df, ee=e: apply_merge_epoch(
                spark, work_dir, b, ee, evolve_rev_from=2
            ),
        )
    t(
        "read_snapshot_noop",
        lambda: read_snapshot(spark, work_dir, 1 << 62, schema=_SNAP_SCHEMA_V2)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
