"""Bounded execution of streaming pipelines.

The reference ends a stream with StreamStatus{end:true} cascading through
the DAG (element.rs:361-370, source_runnable.rs:217-245); Spark's
Trigger.AvailableNow is the same concept: process everything available,
finalize state, stop. run_to_memory drives a streaming DataFrame to
completion synchronously and returns the materialized result -- the bridge
that lets streaming pipelines flow through the batch correctness gate.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


def _await_listener_drain(listener, query_id: str, timeout: float = 30.0) -> None:
    """Block until the listener has seen the terminated event for query_id.

    Listener-bus delivery is asynchronous but per-query ordered, so the
    terminated event arriving implies every progress event for the query
    has been delivered. Without this wait, removeListener in the finally
    block races the bus: a caller polling collector.progress AFTER
    run_to_memory returns waits on events that will never arrive (ADVICE
    r13). Only listeners that expose terminated_ids (ProgressCollector)
    participate; others are removed immediately as before."""
    seen = getattr(listener, "terminated_ids", None)
    if seen is None:
        return
    deadline = time.time() + timeout
    while time.time() < deadline:
        if query_id in seen:
            return
        time.sleep(0.05)
    raise TimeoutError(
        f"listener bus did not deliver the terminated event for query "
        f"{query_id} within {timeout}s; progress metrics would be incomplete"
    )


def drain_timeout(base: float = 600.0) -> float:
    """Bound for draining a finite staged replay (awaitTermination). The
    fixture-scale default is generous at sf<=0.1, but a 100x scale probe
    legitimately needs 100x the wall clock -- SPARK_GRAFT_STREAM_TIMEOUT
    overrides the bound without touching query code (VERDICT r10 #2: the
    streaming/CDC family joins the sf10 probe)."""
    return float(os.environ.get("SPARK_GRAFT_STREAM_TIMEOUT", base))


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
    timeout_seconds: float | None = None,
    shuffle_partitions: int | None = None,
    listener=None,
) -> DataFrame:
    """Execute a streaming DataFrame with availableNow into a memory sink;
    block until completion; return the result as a (batch) DataFrame.

    listener: an optional StreamingQueryListener (e.g. metrics.
    ProgressCollector) registered for exactly the lifetime of this run --
    the coordinator-side metrics tap (numRowsDroppedByWatermark, state
    rows) for queries that report on engine behavior, not just data.

    Append-mode windowed aggregations emit only windows closed by the final
    watermark (window_end <= max_event_ts - delay); still-open windows stay
    in the state store -- that withholding is part of the semantics under
    test, not an artifact.

    shuffle_partitions: stateful streaming ops create one state store per
    shuffle partition, and that per-store overhead (commit, snapshot,
    eviction scan) dominates small/medium state -- measured 10.8s -> 3.1s on
    the interval join at sf0.1 going 32 -> 8. The value is pinned into the
    checkpoint at first run; size it to expected state volume (at 100 TB:
    hundreds, here: single digits), not to CPU count.
    """
    spark: SparkSession = stream_df.sparkSession
    if timeout_seconds is None:
        timeout_seconds = drain_timeout(300.0)
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ck = checkpoint_dir or tempfile.mkdtemp(prefix="rlink_ck_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if listener is not None:
        spark.streams.addListener(listener)
    try:
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(timeout_seconds)
        finally:
            if q.isActive:
                q.stop()
        if listener is not None and finished:
            _await_listener_drain(listener, str(q.id))
    finally:
        if listener is not None:
            spark.streams.removeListener(listener)
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if not finished:
        raise TimeoutError(
            f"streaming query {name!r} did not finish within {timeout_seconds}s; "
            "refusing to return a truncated memory table"
        )
    return spark.table(name)


def run_to_parquet(
    stream_df: DataFrame,
    output_dir: str | None = None,
    checkpoint_dir: str | None = None,
    timeout_seconds: float | None = None,
    shuffle_partitions: int | None = None,
    listener=None,
) -> DataFrame:
    """Execute an append-mode streaming DataFrame with availableNow into a
    parquet sink; block until completion; return a (batch) reader over the
    written files.

    The memory-sink bridge (run_to_memory) collects every emitted row onto
    the driver -- fine for bounded aggregates, a scale-killer for O(matches)
    outputs like raw stream-stream joins (VERDICT r11 #2: the sf10 probe had
    to exclude them). This bridge keeps the result distributed end to end:
    executors write parquet, the driver only learns the paths, and the
    returned DataFrame is a normal scan the caller can count/digest/compare
    without ever materializing the rows in one process. Parquet sinks are
    append-only, which is exactly the emission mode of watermarked
    stream-stream joins.
    """
    spark: SparkSession = stream_df.sparkSession
    if timeout_seconds is None:
        timeout_seconds = drain_timeout(300.0)
    out_dir = output_dir or tempfile.mkdtemp(prefix="rlink_pq_out_")
    ck = checkpoint_dir or tempfile.mkdtemp(prefix="rlink_pq_ck_")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    if listener is not None:
        spark.streams.addListener(listener)
    try:
        q = (
            stream_df.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        try:
            finished = q.awaitTermination(timeout_seconds)
        finally:
            if q.isActive:
                q.stop()
        if listener is not None and finished:
            _await_listener_drain(listener, str(q.id))
    finally:
        if listener is not None:
            spark.streams.removeListener(listener)
        if shuffle_partitions is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    if not finished:
        raise TimeoutError(
            f"streaming parquet sink did not finish within {timeout_seconds}s; "
            "refusing to return a truncated directory"
        )
    # explicit schema: a zero-row drain writes only _spark_metadata and an
    # inferring read would fail; the stream's own schema is the contract
    return spark.read.schema(stream_df.schema).parquet(out_dir)
