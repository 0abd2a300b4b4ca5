"""Streaming intake with dead-letter routing -- the two-sink split every
production ingest runs: each micro-batch's rows are classified once and
routed to EITHER the clean sink or the quarantine (DLQ) sink with a
reason code, never both, never neither.

Both sinks commit per epoch (`<sink>/batch_id=N`, overwrite semantics)
inside ONE foreachBatch handler, and the epoch becomes VISIBLE only via
a single shared commit marker (`commits/epoch=N`) touched after the
SECOND write -- so a drain reader can never observe a mid-epoch state
where the DLQ rows landed but the clean rows didn't (ADVICE r9: the
per-sink _SUCCESS markers commit independently, violating the
disjoint-and-complete invariant in the window between the writes or
after an unresumed crash). A crash anywhere before the marker leaves
the whole epoch invisible; replay overwrites both dirs byte-identically
(classification is deterministic) and re-marks -- exactly-once across a
MULTI-sink epoch, one step past the single-sink epoch protocol the
other streaming modules use.

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
    """First-match-wins reason codes (too_short > lang_missing >
    lang_unsupported > source_blocked; NULL = clean). The blocklist joins
    as a broadcast dim -- the plan shape a config-driven blocklist has in
    production -- while the other rules are row-local expressions.

    lang IS NULL is an EXPLICIT quarantine reason: without the branch it
    would fall through the isin() check (NULL comparison -> no match) and
    land in the clean sink, a surprising policy for a quarantine gate
    (ADVICE r9). The oracle carries the same branch."""
    spark = docs.sparkSession
    block = spark.createDataFrame(
        [(s,) for s in BLOCKED_SOURCES], "source string"
    ).withColumn("blocked", F.lit(True))
    return (
        docs.join(F.broadcast(block), "source", "left")
        .select(
            "doc_id", "lang", "source", "n_chars",
            F.when(F.col("n_chars") < MIN_CHARS, F.lit("too_short"))
            .when(F.col("lang").isNull(), F.lit("lang_missing"))
            .when(~F.col("lang").isin(*ALLOWED_LANGS), F.lit("lang_unsupported"))
            .when(F.col("blocked"), F.lit("source_blocked"))
            .alias("reason"),
        )
        .withColumn("quarantined", F.col("reason").isNotNull())
    )


def streaming_dlq_sink(doc_stream: DataFrame, work_dir: str, checkpoint: str):
    """foreachBatch handler writing the epoch's clean rows and DLQ rows to
    their own per-epoch dirs, made visible ATOMICALLY by one shared
    commit marker after the second write. Returns the StreamingQuery."""

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        routed = classify_intake(batch_df)
        routed.where(F.col("quarantined")).write.mode("overwrite").parquet(
            os.path.join(work_dir, "dlq", f"batch_id={epoch_id}")
        )
        routed.where(~F.col("quarantined")).write.mode("overwrite").parquet(
            os.path.join(work_dir, "clean", f"batch_id={epoch_id}")
        )
        # The epoch's single commit point: only now may a reader see
        # EITHER sink's batch_id=N. Crash before this -> both invisible.
        os.makedirs(os.path.join(work_dir, "commits"), exist_ok=True)
        with open(os.path.join(work_dir, "commits", f"epoch={epoch_id}"), "w"):
            pass

    return (
        doc_stream.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _read_epochs(spark: SparkSession, work_dir: str, sink: str) -> DataFrame:
    """Read one sink's committed epochs. Committed = the SHARED per-epoch
    marker exists (both sinks' writes finished), not the sink's own
    _SUCCESS -- a torn epoch is invisible from both sinks at once."""
    root = os.path.join(work_dir, sink)
    commits = os.path.join(work_dir, "commits")
    paths = []
    if os.path.isdir(root):
        for d in sorted(os.listdir(root)):
            if d.startswith("batch_id=") and os.path.exists(
                os.path.join(commits, f"epoch={d.split('=', 1)[1]}")
            ):
                paths.append(os.path.join(root, d))
    if not paths:
        return spark.createDataFrame([], _ROUTED_SCHEMA)
    return spark.read.schema(_ROUTED_SCHEMA).parquet(*paths)


def read_clean(spark: SparkSession, work_dir: str) -> DataFrame:
    return _read_epochs(spark, work_dir, "clean")


def read_dlq(spark: SparkSession, work_dir: str) -> DataFrame:
    return _read_epochs(spark, work_dir, "dlq")
