"""Watermark strategies.

Reference semantics mapped (SURVEY.md §2.7):
  * SchemaTimestampAssigner (functions/watermark/schema_timestamp_assigner.rs:8-38)
    -> the event-time column passed to withWatermark.
  * BoundedOutOfOrdernessWatermarks: wm = max_event_ts - delay - 1
    (bounded_out_of_orderness_watermarks.rs:23-39) -> withWatermark(col, delay)
    (Spark: wm = max - delay; the -1ms is emission bookkeeping, not
    semantics -- both drop rows with ts <= wm at aggregation).
  * TimePeriodicWatermarks (rate-limited emission, time_periodic_watermarks.rs:39-73):
    behavioral no-op under micro-batching -- the engine advances the
    watermark once per batch, which IS periodic emission.
  * WatermarksWithIdleness (watermarks_with_idleness.rs:27-81): no per-source
    PySpark knob; under the default multipleWatermarkPolicy=min an idle
    source holds back the global watermark, and setting the policy to 'max'
    is the engine-level idleness escape hatch (executable witness:
    tests/test_streaming.py::test_idle_source_watermark_policy).
    `idle_timeout` is accepted and recorded so pipelines declare intent.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class WatermarkStrategy:
    """DefaultWatermarkStrategy analogue (default_watermark_strategy.rs:13-88):
    event-time column + bounded out-of-orderness delay."""

    ts_col: str
    delay_seconds: float = 0.0
    idle_timeout_seconds: float | None = None  # declared intent; see module doc

    def delay_str(self) -> str:
        ms = int(round(self.delay_seconds * 1000))
        return f"{ms} milliseconds" if ms % 1000 else f"{ms // 1000} seconds"

    def apply(self, df: DataFrame) -> DataFrame:
        if not df.isStreaming:
            return df  # batch runs see all data; watermark is a no-op
        return df.withWatermark(self.ts_col, self.delay_str())


def bounded_out_of_orderness(ts_col: str, delay_seconds: float) -> WatermarkStrategy:
    return WatermarkStrategy(ts_col, delay_seconds)
