"""Streaming full-text index maintenance -- the BM25 twin of the IVF
index-add path (streaming/ann.py): documents arrive as a stream and are
ADDED to a standing (doc_id, term, tf) posting table.

Per micro-batch the handler tokenizes and tf-aggregates ITS OWN rows
only (one map-side-combined shuffle over the batch, never the corpus)
and appends the delta as `<state>/batch_id=N` -- docs are disjoint
across epochs, so per-(doc, term) rows are immutable and the union of
committed deltas IS the index. Per-epoch overwrite commits make crash
replays byte-identical: exactly-once.

Corpus-level statistics (df, doc-length totals) are derived from the
drained index at query time here; at 100 TB production folds the delta
dirs into a term-partitioned base periodically (the exercised LSM
compaction in streaming/dedup.py) and maintains df/totals as mergeable
carriers (the streaming/rollup.py fold) so scoring never rescans the
posting table.

Reference parity: the reference has no search surface; this extends the
repo's BM25 operator (queries/search.py, SURVEY §2 extras) with the
continuous-ingest shape a production search index runs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_TF_SCHEMA = "doc_id bigint, term string, tf bigint"


def streaming_bm25_index_sink(doc_stream: DataFrame, state_dir: str, checkpoint: str):
    """foreachBatch sink appending per-epoch (doc_id, term, tf) deltas.
    Returns the started StreamingQuery."""
    from rlink_rs_spark.queries.search import corpus_tf

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        corpus_tf(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={epoch_id}")
        )

    return (
        doc_stream.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_posting_table(spark: SparkSession, state_dir: str) -> DataFrame:
    """Union of all committed (_SUCCESS) epoch deltas -- the full index."""
    paths = []
    if os.path.isdir(state_dir):
        for d in sorted(os.listdir(state_dir)):
            if d.startswith("batch_id=") and os.path.exists(
                os.path.join(state_dir, d, "_SUCCESS")
            ):
                paths.append(os.path.join(state_dir, d))
    if not paths:
        return spark.createDataFrame([], _TF_SCHEMA)
    return spark.read.schema(_TF_SCHEMA).parquet(*paths)
