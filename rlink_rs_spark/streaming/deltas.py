"""Generic per-epoch delta sink -- the shared shape of every append-only
streaming index/screen in this repo (inverted-file adds in streaming/
ann.py, posting-table adds in streaming/search_index.py, and the
decontamination screen registered in queries/pipeline_ops.py): each
micro-batch's rows are transformed ON THEIR OWN (no read of prior
state, O(batch) per epoch) and the result commits as
`<state>/batch_id=N` with overwrite semantics; when batches are
key-disjoint the union of committed deltas IS the final state, and a
crash-replayed epoch rewrites byte-identical rows -- exactly-once.

LSM level-0 compaction (shared with streaming/dedup.py, which pioneered
the protocol; exercised by tests/test_streaming.py::
test_streaming_dedup_compaction_crash_resume and
test_delta_sink_compaction_crash_resume): a long-lived stream
accumulates O(epochs) delta dirs, so once the committed delta count
since the last base reaches `compact_every` the epoch folds base +
deltas into a new `base_upto=<max folded epoch>` dir -- a DETERMINISTIC
union keyed by the max folded epoch, so a crash mid-fold replays it
idempotently (overwrite of the same dir name; torn dirs carry no
_SUCCESS and are invisible). Folded delta dirs and superseded bases are
dropped by a GC pass at the START of the NEXT epoch, never inside the
epoch that wrote the base, so a crash anywhere leaves at least one
complete representation on disk. Readers take the newest committed base
plus the deltas above its watermark; state content is identical before
and after a fold.

At 100 TB the fold is what keeps a standing index usable: the base is
one large co-partitioned artifact (term- or cell-partitioned in
production), deltas stay O(compact_every) small dirs, and fold cost
amortizes to O(state / compact_every) per epoch.
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def epoch_dirs(root: str, before_epoch: int, after_epoch: int = -1) -> list[str]:
    """COMMITTED (_SUCCESS present) delta dirs for epochs in
    (after_epoch, before_epoch) -- a retried epoch must not see its own
    partial writes, and readers must skip dirs a crash left torn."""
    if not os.path.isdir(root):
        return []
    out = []
    for d in sorted(os.listdir(root)):
        if not d.startswith("batch_id="):
            continue
        i = int(d.split("=", 1)[1])
        if after_epoch < i < before_epoch and os.path.exists(
            os.path.join(root, d, "_SUCCESS")
        ):
            out.append(os.path.join(root, d))
    return out


def newest_base(root: str) -> tuple[str | None, int]:
    """Newest committed compaction base under `root` as (path, upto);
    (None, -1) when no fold has happened yet."""
    if not os.path.isdir(root):
        return None, -1
    best, best_upto = None, -1
    for d in os.listdir(root):
        if d.startswith("base_upto=") and os.path.exists(
            os.path.join(root, d, "_SUCCESS")
        ):
            upto = int(d.split("=", 1)[1])
            if upto > best_upto:
                best, best_upto = os.path.join(root, d), upto
    return best, best_upto


def state_inputs(root: str, before_epoch: int) -> list[str]:
    """Newest committed base (if any) + committed deltas above its
    watermark and below `before_epoch` -- together exactly the state of
    all committed epochs < before_epoch, fold or no fold."""
    base, upto = newest_base(root)
    dirs = epoch_dirs(root, before_epoch, after_epoch=upto)
    return ([base] if base is not None else []) + dirs


def read_state(
    spark: SparkSession, root: str, schema: str, before_epoch: int
) -> DataFrame:
    dirs = state_inputs(root, before_epoch)
    if not dirs:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*dirs)


def gc_folded(root: str) -> None:
    """Drop delta dirs covered by the newest committed base, plus
    superseded bases -- the deferred half of a fold, run at the START of
    a later epoch so the folding epoch's crash window never deletes the
    only copy of any state."""
    import shutil

    base, upto = newest_base(root)
    if base is None:
        return
    for d in os.listdir(root):
        p = os.path.join(root, d)
        if d.startswith("batch_id=") and int(d.split("=", 1)[1]) <= upto:
            shutil.rmtree(p, ignore_errors=True)
        elif d.startswith("base_upto=") and p != base:
            shutil.rmtree(p, ignore_errors=True)


def compact(
    spark: SparkSession, root: str, schema: str, before_epoch: int, compact_every: int
) -> None:
    """Fold base + committed deltas below `before_epoch` into a new
    `base_upto=<max delta>` dir once the delta count reaches
    `compact_every`. Deterministic: the output is keyed by the max folded
    epoch and its content is the union of all state <= that epoch, so a
    replayed fold overwrites byte-identical data. Old dirs are NOT removed
    here (see gc_folded)."""
    deltas = epoch_dirs(root, before_epoch, after_epoch=newest_base(root)[1])
    if len(deltas) < compact_every:
        return
    upto = max(int(os.path.basename(d).split("=", 1)[1]) for d in deltas)
    base, _ = newest_base(root)
    inputs = ([base] if base is not None else []) + deltas
    spark.read.schema(schema).parquet(*inputs).write.mode("overwrite").parquet(
        os.path.join(root, f"base_upto={upto}")
    )


def delta_sink(
    stream: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    state_dir: str,
    checkpoint: str,
    schema: str | None = None,
    compact_every: int | None = None,
    crash_after_fold_at: int | None = None,
):
    """foreachBatch sink writing transform(batch) as the epoch's delta.
    `transform` must be deterministic and batch-local (it sees only the
    epoch's rows). Returns the started StreamingQuery.

    With `compact_every` set (requires `schema`), each epoch first GCs
    dirs folded by an earlier epoch's base, writes its delta, then folds
    once the committed delta count reaches the trigger.
    `crash_after_fold_at` raises AFTER that epoch's fold committed its
    base but BEFORE the epoch returns (first attempt only) -- the
    mid-compaction kill/resume test hook: the resumed run must read
    base + uncovered deltas without double-counting the folded dirs
    still on disk."""
    if compact_every is not None and schema is None:
        raise ValueError("compact_every requires schema")
    spark = stream.sparkSession
    crash_marker = os.path.join(state_dir, "_crashed_once")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        if compact_every is not None:
            gc_folded(state_dir)
        if batch_df.isEmpty():
            return
        transform(batch_df).write.mode("overwrite").parquet(
            os.path.join(state_dir, f"batch_id={epoch_id}")
        )
        if compact_every is not None:
            compact(spark, state_dir, schema, epoch_id + 1, compact_every)
            if crash_after_fold_at == epoch_id and not os.path.exists(crash_marker):
                open(crash_marker, "w").close()
                raise RuntimeError(f"injected crash after fold at epoch {epoch_id}")

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_deltas(spark: SparkSession, state_dir: str, schema: str) -> DataFrame:
    """The standing state: newest committed base (if a fold has run) plus
    all committed (_SUCCESS) epoch deltas above its watermark, schema
    pinned. Identical to the plain all-deltas union when no fold has
    happened."""
    return read_state(spark, state_dir, schema, 1 << 62)
