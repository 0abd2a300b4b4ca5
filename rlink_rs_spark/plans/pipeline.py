"""Fluent pipeline builder mirroring the reference DataStream API.

Reference chain (core/data_stream.rs:102-247):
    register_source -> flat_map -> filter -> assign_timestamps_and_watermarks
    -> key_by -> window -> reduce -> add_sink
(example/example-simple/src/app.rs:34-66 is the canonical instance.)

Here each fluent call appends a declarative step; `build(spark, source_df)`
replays the steps onto any DataFrame -- batch or streaming -- and returns
the transformed DataFrame. Schema propagation, operator chaining, exchange
insertion, and parallelism (the reference's 4-layer DAG, dag/stream_graph.rs)
are all delegated to Catalyst. One logical pipeline, two physical
materializations:

  * batch: window assignment via long-arithmetic explode (fast path)
  * streaming: F.window + withWatermark (state-store path)

so the same Pipeline object powers both the correctness gate and the
streaming runtime.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rlink_rs_spark.operators.aggregations import Agg
from rlink_rs_spark.operators.windows import (
    sliding_window,
    with_sliding_window_bounds,
)
from rlink_rs_spark.streaming.watermarks import WatermarkStrategy


@dataclass(frozen=True)
class SlidingEventTimeWindows:
    """Window spec named after the reference assigner
    (functions/window/mod.rs:27-78); tumbling = slide == size."""

    size_seconds: float
    slide_seconds: float | None = None
    offset_seconds: float = 0.0

    @staticmethod
    def of(size_seconds: float, slide_seconds: float | None = None, offset_seconds: float = 0.0):
        return SlidingEventTimeWindows(size_seconds, slide_seconds, offset_seconds)


class Pipeline:
    """Declarative pipeline: a list of steps replayed onto a DataFrame."""

    def __init__(self) -> None:
        self._steps: list[Callable[[DataFrame], DataFrame]] = []
        self._watermark: WatermarkStrategy | None = None
        self._keys: list[str] = []
        self._window: SlidingEventTimeWindows | None = None
        self._aggs: list[Agg] | None = None

    # --- row transforms (StreamFlatMap / StreamFilter) ---

    def flat_map(self, *cols: Column | str) -> "Pipeline":
        """Projection / 1->N transform (FlatMapFunction, core/function.rs:186-195).
        Accepts Column expressions (incl. explode) or column names."""
        self._steps.append(lambda df: df.select(*cols))
        return self

    def map_expr(self, **named_exprs: str) -> "Pipeline":
        """withColumn-style 1->1 transforms from SQL expression strings."""

        def step(df: DataFrame) -> DataFrame:
            for name, expr in named_exprs.items():
                df = df.withColumn(name, F.expr(expr))
            return df

        self._steps.append(step)
        return self

    def filter(self, condition: Column | str) -> "Pipeline":
        """FilterFunction (core/function.rs:198-207)."""
        self._steps.append(lambda df: df.filter(condition))
        return self

    # --- event time / keying / windowing / reduce ---

    def assign_timestamps_and_watermarks(self, ts_col: str, delay_seconds: float) -> "Pipeline":
        """DefaultWatermarkStrategy: schema timestamp assigner + bounded
        out-of-orderness (SURVEY §2.7). No-op in batch; withWatermark in
        streaming."""
        self._watermark = WatermarkStrategy(ts_col, delay_seconds)
        return self

    def key_by(self, *cols: str) -> "Pipeline":
        """SchemaKeySelector (multi-column supported,
        functions/key_selector/schema_key_selector.rs:8-86)."""
        self._keys = list(cols)
        return self

    def window(self, spec: SlidingEventTimeWindows) -> "Pipeline":
        self._window = spec
        return self

    def reduce(self, *aggs: Agg) -> "Pipeline":
        """SchemaReduceFunction composition (schema_reduce.rs:490-598)."""
        self._aggs = list(aggs)
        return self

    # --- connect analogues ---

    def union(self, other_df: DataFrame) -> "Pipeline":
        self._steps.append(lambda df: df.unionByName(other_df))
        return self

    def enrich(self, dim: DataFrame, on, how: str = "left") -> "Pipeline":
        self._steps.append(lambda df: df.join(F.broadcast(dim), on=on, how=how))
        return self

    # --- materialization ---

    def build(self, df: DataFrame) -> DataFrame:
        for step in self._steps:
            df = step(df)
        if self._watermark is not None:
            df = self._watermark.apply(df)
        if self._aggs is None:
            return df
        agg_cols = [a.to_column() for a in self._aggs]
        if self._window is None:
            return df.groupBy(*self._keys).agg(*agg_cols)
        w = self._window
        ts = self._watermark.ts_col if self._watermark else "ts"
        if df.isStreaming:
            win = sliding_window(ts, w.size_seconds, w.slide_seconds, w.offset_seconds)
            out = df.groupBy(win, *self._keys).agg(*agg_cols)
            return out.select(
                F.unix_millis("window.start").alias("window_start"),
                F.unix_millis("window.end").alias("window_end"),
                *self._keys,
                *[a.name() for a in self._aggs],
            )
        assigned = with_sliding_window_bounds(
            df, ts, w.size_seconds, w.slide_seconds, w.offset_seconds
        )
        return assigned.groupBy("window_start", "window_end", *self._keys).agg(*agg_cols)

    def run_batch(self, spark: SparkSession, source: DataFrame) -> DataFrame:
        return self.build(source)

    def run_stream_to_memory(self, source: DataFrame, **kwargs) -> DataFrame:
        from rlink_rs_spark.streaming.runner import run_to_memory

        return run_to_memory(self.build(source), **kwargs)
