"""Bounded execution of streaming pipelines.

The reference ends a stream with StreamStatus{end:true} cascading through
the DAG (element.rs:361-370, source_runnable.rs:217-245); Spark's
Trigger.AvailableNow is the same concept: process everything available,
finalize state, stop. run_to_memory drives a streaming DataFrame to
completion synchronously and returns the materialized result -- the bridge
that lets streaming pipelines flow through the batch correctness gate.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def run_to_memory(
    stream_df: DataFrame,
    output_mode: str = "append",
    checkpoint_dir: str | None = None,
    timeout_seconds: float = 300.0,
) -> DataFrame:
    """Execute a streaming DataFrame with availableNow into a memory sink;
    block until completion; return the result as a (batch) DataFrame.

    Append-mode windowed aggregations emit only windows closed by the final
    watermark (window_end <= max_event_ts - delay); still-open windows stay
    in the state store -- that withholding is part of the semantics under
    test, not an artifact.
    """
    spark: SparkSession = stream_df.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ck = checkpoint_dir or tempfile.mkdtemp(prefix="rlink_ck_")
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
    if not finished:
        raise TimeoutError(
            f"streaming query {name!r} did not finish within {timeout_seconds}s; "
            "refusing to return a truncated memory table"
        )
    return spark.table(name)
