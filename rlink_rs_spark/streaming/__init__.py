"""Structured Streaming surface: watermark strategies, streaming sources,
stateful operators, and query metrics -- the reference's data plane
(watermarks, windows, keyed state, checkpoints) on Spark's micro-batch
engine, which subsumes its Element control-flow (Watermark/StreamStatus/
Barrier, core/element.rs:490-496) entirely."""
