"""Sink library: foreachBatch bulk sink (ES/ClickHouse shape), parquet
file sink, kafka option construction, repartition utilities."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from rlink_rs_spark.sources.sinks import foreach_batch_sink, kafka_sink_options
from rlink_rs_spark.streaming.sources import file_stream


def test_foreach_batch_bulk_sink(spark, sf_dir, tmp_path):
    """Bulk writes receive every row exactly once, chunked, with epoch ids."""
    out = str(tmp_path / "bulk")
    import json
    import os

    os.makedirs(out)

    def bulk_write(rows, epoch_id):
        # stands in for an ES bulk-index / ClickHouse batch INSERT call
        fname = f"{out}/chunk_{epoch_id}_{abs(hash(str(rows)))%10**9}.json"
        with open(fname, "w") as f:
            json.dump(rows, f)

    src = file_stream(spark, sf_dir, "events").select("event_id", "event_type")
    q = foreach_batch_sink(src, bulk_write, checkpoint=tempfile.mkdtemp(), max_batch_rows=100)
    q.awaitTermination(120)
    if q.isActive:
        q.stop()

    import glob

    written = []
    for p in glob.glob(f"{out}/*.json"):
        written.extend(json.load(open(p)))
    from rlink_rs_spark.tables import load_table

    expected = load_table(spark, sf_dir, "events").count()
    assert len(written) == expected
    assert {r["event_id"] for r in written} == set(range(expected))


def test_kafka_sink_options():
    assert kafka_sink_options("out", "b:9092") == {
        "kafka.bootstrap.servers": "b:9092",
        "topic": "out",
    }


def test_repartition_utilities(spark, sf_dir):
    from rlink_rs_spark.operators.repartition import key_partition, round_robin, salted
    from rlink_rs_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    assert round_robin(events, 8).rdd.getNumPartitions() == 8
    assert key_partition(events, 4, "event_type").rdd.getNumPartitions() == 4
    s = salted(events, "event_type", 16)
    buckets = s.select("__salt").distinct().collect()
    assert all(0 <= r["__salt"] < 16 for r in buckets)
    # repartition must not change row counts
    assert round_robin(events, 8).count() == events.count()
