"""Streaming deduplication -- the streaming face of exact dedup
(operators/dedup.exact_dedup_groups) for at-least-once ingest.

The reference offers only at-least-once delivery (SURVEY §2.8: its
checkpoint scheme acks "completed checkpoint id" and replays from there,
rlink/src/runtime/worker/checkpoint.rs), so any consumer downstream of a
restart sees duplicates. Spark's keyed dedup state makes the stream
exactly-once-per-key: `dropDuplicatesWithinWatermark` keeps one state row
per key for at least the watermark delay, then evicts -- bounded state at
100 TB, versus `dropDuplicates` whose state grows forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_stream(
    df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    delay: str = "1 hour",
) -> DataFrame:
    """Drop duplicate rows per `keys` within the watermark horizon.

    With ts_col set, the stream is watermarked and dedup state for a key is
    dropped once the watermark passes delay beyond its event time (bounded
    state -- the production shape). Without ts_col, falls back to unbounded
    dropDuplicates (exact, state grows with distinct keys)."""
    if ts_col is None:
        return df.dropDuplicates(keys)
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
