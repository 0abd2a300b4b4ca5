"""Streaming intake with dead-letter routing -- the two-sink split every
production ingest runs: each micro-batch's rows are classified once and
routed to EITHER the clean sink or the quarantine (DLQ) sink with a
reason code, never both, never neither.

Both sinks commit per epoch (`<sink>/batch_id=N`, overwrite semantics)
inside ONE foreachBatch handler, so a crash between the two writes is
healed by replay: the re-run epoch overwrites both dirs byte-identically
(classification is deterministic), restoring the disjoint-and-complete
invariant -- exactly-once across a MULTI-sink epoch, one step past the
single-sink epoch protocol the other streaming modules use.

At 100 TB: classification is row-local expressions plus one broadcast
of the (tiny, config-sized) source blocklist -- the corpus never
shuffles; each sink write is partition-local. The DLQ stays queryable
by reason for pipeline triage.

Reference parity: the reference routes rejected rows to logs
(input_mapper.rs drops unparseable Kafka payloads); a queryable
reason-coded quarantine is the production generalization.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MIN_CHARS = 100
ALLOWED_LANGS = ("en", "de", "fr", "es")
BLOCKED_SOURCES = ("src7", "src13")

_ROUTED_SCHEMA = (
    "doc_id bigint, lang string, source string, n_chars bigint, "
    "reason string, quarantined boolean"
)


def classify_intake(docs: DataFrame) -> DataFrame:
    """First-match-wins reason codes (too_short > lang_unsupported >
    source_blocked; NULL = clean). The blocklist joins as a broadcast
    dim -- the plan shape a config-driven blocklist has in production --
    while the other rules are row-local expressions."""
    spark = docs.sparkSession
    block = spark.createDataFrame(
        [(s,) for s in BLOCKED_SOURCES], "source string"
    ).withColumn("blocked", F.lit(True))
    return (
        docs.join(F.broadcast(block), "source", "left")
        .select(
            "doc_id", "lang", "source", "n_chars",
            F.when(F.col("n_chars") < MIN_CHARS, F.lit("too_short"))
            .when(~F.col("lang").isin(*ALLOWED_LANGS), F.lit("lang_unsupported"))
            .when(F.col("blocked"), F.lit("source_blocked"))
            .alias("reason"),
        )
        .withColumn("quarantined", F.col("reason").isNotNull())
    )


def streaming_dlq_sink(doc_stream: DataFrame, work_dir: str, checkpoint: str):
    """foreachBatch handler writing the epoch's clean rows and DLQ rows to
    their own per-epoch dirs. Returns the started StreamingQuery."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        routed = classify_intake(batch_df)
        # DLQ first, clean second: a crash between the writes leaves the
        # torn clean dir _SUCCESS-less and replay overwrites both.
        routed.where(F.col("quarantined")).write.mode("overwrite").parquet(
            os.path.join(work_dir, "dlq", f"batch_id={epoch_id}")
        )
        routed.where(~F.col("quarantined")).write.mode("overwrite").parquet(
            os.path.join(work_dir, "clean", f"batch_id={epoch_id}")
        )

    return (
        doc_stream.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _read_epochs(spark: SparkSession, root: str) -> DataFrame:
    paths = []
    if os.path.isdir(root):
        for d in sorted(os.listdir(root)):
            if d.startswith("batch_id=") and os.path.exists(
                os.path.join(root, d, "_SUCCESS")
            ):
                paths.append(os.path.join(root, d))
    if not paths:
        return spark.createDataFrame([], _ROUTED_SCHEMA)
    return spark.read.schema(_ROUTED_SCHEMA).parquet(*paths)


def read_clean(spark: SparkSession, work_dir: str) -> DataFrame:
    return _read_epochs(spark, os.path.join(work_dir, "clean"))


def read_dlq(spark: SparkSession, work_dir: str) -> DataFrame:
    return _read_epochs(spark, os.path.join(work_dir, "dlq"))
