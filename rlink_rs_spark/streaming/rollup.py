"""Streaming materialized-view maintenance -- the streaming twin of
queries/analytics.incremental_daily_rollup.

The daily rollup is kept in MERGEABLE-CARRIER form (count, sum-cents,
max, min), so maintaining it under a stream is the same algebra as the
batch incremental merge: per micro-batch, aggregate the BATCH ONLY and
re-aggregate against the carried view on the <= days x types summary
table. State is the view itself -- bounded by the key space, constant in
stream length -- and the drained view equals the batch rollup over the
same rows, so it shares that DuckDB oracle.

Epoch protocol (same as streaming/dedup.py / sampling.py / sketches.py):
the view AFTER epoch N commits to `<state>/batch_id=N` with overwrite
semantics; epoch N reads the newest committed view with id < N, so a
crash-replayed epoch rewrites byte-identical state -- exactly-once.

Reference parity: this is the reference's incremental window reduce
(window_base_reduce.rs:84-101) generalized to a persistent, queryable
view instead of per-window transient state.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rlink_rs_spark.streaming.sampling import _latest_epoch_dir

_VIEW_SCHEMA = "day bigint, event_type string, n bigint, sc bigint, mx double, mn double"
_DAY_MS = 86_400_000


def _batch_rollup(df: DataFrame) -> DataFrame:
    return df.groupBy(
        F.expr(f"CAST(unix_millis(ts) div {_DAY_MS} AS BIGINT)").alias("day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CAST(ROUND(value*100) AS BIGINT)")).cast("bigint").alias("sc"),
        F.max("value").alias("mx"),
        F.min("value").alias("mn"),
    )


def streaming_rollup_sink(stream: DataFrame, work_dir: str, checkpoint: str):
    """foreachBatch sink folding each micro-batch's daily rollup into the
    carried view. Returns the started StreamingQuery."""
    spark = stream.sparkSession
    view_dir = os.path.join(work_dir, "view")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        delta = _batch_rollup(batch_df)
        prev = _latest_epoch_dir(view_dir, epoch_id)
        if prev is not None:
            delta = delta.unionByName(spark.read.schema(_VIEW_SCHEMA).parquet(prev))
        merged = delta.groupBy("day", "event_type").agg(
            F.sum("n").cast("bigint").alias("n"),
            F.sum("sc").cast("bigint").alias("sc"),
            F.max("mx").alias("mx"),
            F.min("mn").alias("mn"),
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(view_dir, f"batch_id={epoch_id}")
        )

    return (
        stream.writeStream.outputMode("update")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup_view(spark: SparkSession, work_dir: str) -> DataFrame:
    """Drain the newest committed view into the batch twin's output shape."""
    last = _latest_epoch_dir(os.path.join(work_dir, "view"), 1 << 62)
    if last is None:
        return spark.createDataFrame(
            [],
            "day_start_ms bigint, event_type string, cnt bigint, "
            "sum_value double, max_value double, min_value double",
        )
    view = spark.read.schema(_VIEW_SCHEMA).parquet(last)
    return view.select(
        (F.col("day") * _DAY_MS).alias("day_start_ms"),
        "event_type",
        F.col("n").alias("cnt"),
        (F.col("sc") / 100.0).alias("sum_value"),
        F.col("mx").alias("max_value"),
        F.col("mn").alias("min_value"),
    )
