"""Generic per-epoch delta sink -- the shared shape of every append-only
streaming index/screen in this repo (inverted-file adds in streaming/
ann.py, posting-table adds in streaming/search_index.py, and the
decontamination screen registered in queries/pipeline_ops.py): each
micro-batch's rows are transformed ON THEIR OWN (no read of prior
state, O(batch) per epoch) and the result commits as
`<state>/batch_id=N` with overwrite semantics; when batches are
key-disjoint the union of committed deltas IS the final state, and a
crash-replayed epoch rewrites byte-identical rows -- exactly-once.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def delta_sink(
    stream: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    state_dir: str,
    checkpoint: str,
):
    """foreachBatch sink writing transform(batch) as the epoch's delta.
    `transform` must be deterministic and batch-local (it sees only the
    epoch's rows). Returns the started StreamingQuery."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        transform(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={epoch_id}")
        )

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_deltas(spark: SparkSession, state_dir: str, schema: str) -> DataFrame:
    """Union of all committed (_SUCCESS) epoch deltas, schema pinned."""
    paths = []
    if os.path.isdir(state_dir):
        for d in sorted(os.listdir(state_dir)):
            if d.startswith("batch_id=") and os.path.exists(
                os.path.join(state_dir, d, "_SUCCESS")
            ):
                paths.append(os.path.join(state_dir, d))
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)
