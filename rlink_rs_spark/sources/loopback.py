"""Broker-less Kafka loopback: a directory of parquet files standing in for
a topic, carrying the EXACT Kafka source schema (key/value binary, topic,
partition, offset, timestamp, timestampType) so the envelope codec and all
three offset seek modes (connector-kafka/src/source/input_format.rs:76-163)
are exercisable end-to-end without a broker or the kafka jar.

Producer side mirrors KafkaOutputFormat's contract (pre-shaped key/value
columns, sink/output_format.rs): `publish` assigns partition =
hash(key) % n (engine-neutral md5 hash) and offset = per-partition arrival
rank -- deterministic, so a DuckDB oracle can reproduce the envelope
bit-for-bit. `publish_stream` is the foreachBatch producer (at-least-once,
like a real non-idempotent producer; offsets restart from the committed
high-water mark per batch).

Consumer side: `subscribe` returns a streaming DataFrame in the Kafka
schema; seek modes map exactly as the real source does --
  * default / "earliest": everything
  * {partition: offset} dict: start AT that offset per partition
  * timestamp_ms: rows with timestamp >= the seek point
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

KAFKA_SCHEMA = (
    "key binary, value binary, topic string, partition int, offset long, "
    "timestamp timestamp, timestampType int"
)


def partition_for_key(key_col, n_partitions: int):
    """Engine-neutral partitioner: md5-derived 32-bit hash mod n.
    DuckDB twin: ('0x' || substr(md5(k), 9, 8))::BIGINT % n."""
    return (
        F.conv(F.substring(F.md5(key_col.cast("binary")), 9, 8), 16, 10).cast("long")
        % n_partitions
    ).cast("int")


def to_envelope(
    df: DataFrame,
    key_col: str,
    value_col,
    topic: str,
    n_partitions: int = 4,
    ts_col: str | None = None,
    order_col: str | None = None,
    assign_offset: bool = True,
) -> DataFrame:
    """Shape rows into the Kafka envelope with deterministic partition +
    offset assignment (offset = rank within partition by order_col).

    assign_offset=False (required for streaming inputs, where window
    functions are illegal): the envelope carries `__ord` instead and
    publish_stream assigns offsets per micro-batch inside foreachBatch."""
    key = F.col(key_col).cast("string")
    part = partition_for_key(key, n_partitions)
    shaped = df.select(
        key.cast("binary").alias("key"),
        value_col.cast("binary").alias("value"),
        F.lit(topic).alias("topic"),
        part.alias("partition"),
        (F.col(ts_col) if ts_col else F.current_timestamp()).alias("timestamp"),
        F.lit(0).alias("timestampType"),
        *([F.col(order_col).alias("__ord")] if order_col else []),
    )
    if not assign_offset:
        return shaped
    if order_col:
        w = Window.partitionBy("partition").orderBy("__ord")
        shaped = shaped.withColumn("offset", F.row_number().over(w).cast("long") - 1).drop("__ord")
    else:
        shaped = shaped.withColumn(
            "offset", F.monotonically_increasing_id()
        )  # non-deterministic fallback; fine for fire-and-forget tests
    return shaped.select(
        "key", "value", "topic", "partition", "offset", "timestamp", "timestampType"
    )


def publish(envelope: DataFrame, topic_dir: str) -> None:
    """Batch producer: append envelope rows to the topic directory."""
    envelope.write.mode("append").parquet(topic_dir)


def publish_stream(
    envelope_stream: DataFrame,
    topic_dir: str,
    checkpoint: str,
    available_now: bool = True,
):
    """foreachBatch producer (the KafkaOutputFormat seam): offsets are
    assigned per micro-batch (rank by `__ord` within partition -- window
    functions are legal in the batch context of foreachBatch) and re-based
    on the topic's committed high-water mark per partition. At-least-once
    on retry, like a real producer without idempotence.

    Input: a to_envelope(..., assign_offset=False) stream carrying __ord."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        try:
            marks = (
                spark.read.parquet(topic_dir)
                .groupBy("partition")
                .agg(F.max("offset").alias("hwm"))
            )
        except Exception:
            marks = None
        order = "__ord" if "__ord" in batch_df.columns else "timestamp"
        w = Window.partitionBy("partition").orderBy(order)
        rebased = batch_df.withColumn("__rank", F.row_number().over(w).cast("long") - 1)
        if marks is not None:
            rebased = rebased.join(F.broadcast(marks), "partition", "left").withColumn(
                "offset", F.coalesce(F.col("hwm") + 1, F.lit(0)) + F.col("__rank")
            ).drop("hwm")
        else:
            rebased = rebased.withColumn("offset", F.col("__rank"))
        rebased.select(
            "key", "value", "topic", "partition", "offset", "timestamp", "timestampType"
        ).write.mode("append").parquet(topic_dir)

    writer = (
        envelope_stream.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:  # long-running producer (kill/resume witnesses)
        writer = writer.trigger(processingTime="1 second")
    return writer.start()


def subscribe(
    spark: SparkSession,
    topic_dir: str,
    starting_offsets: str | dict | None = None,
    starting_timestamp_ms: int | None = None,
    max_files_per_trigger: int | None = None,
    ending_offsets: dict | None = None,
) -> DataFrame:
    """Streaming consumer over the loopback topic, Kafka schema + the three
    seek modes of the reference's KafkaInputFormat.

    ending_offsets completes OffsetRange::Direct (offset_range.rs): a
    per-partition INCLUSIVE end -- the reference's consumer drops a record
    only when `end_offset < offset` (consumer.rs:84), so offsets
    begin..=end flow through. Partitions absent from the dict are
    unbounded."""
    reader = spark.readStream.schema(KAFKA_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.parquet(topic_dir)
    if ending_offsets:
        cond = None
        for p, o in ending_offsets.items():
            c = (F.col("partition") != int(p)) | (F.col("offset") <= int(o))
            cond = c if cond is None else (cond & c)
        df = df.where(cond)
    if starting_timestamp_ms is not None:
        return df.where(F.unix_millis("timestamp") >= starting_timestamp_ms)
    if isinstance(starting_offsets, dict):
        cond = None
        for p, o in starting_offsets.items():
            c = (F.col("partition") == int(p)) & (F.col("offset") >= int(o))
            cond = c if cond is None else (cond | c)
        return df.where(cond)
    return df  # None / "earliest": everything (bounded replay has no "latest")
