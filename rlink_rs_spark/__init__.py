"""rlink_rs_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rlink-rs/rlink-rs (reference: rlink v0.6.16).

The reference is a Flink-workalike streaming dataflow framework in Rust
(DataStream builder -> 4-layer DAG -> push-based operator chains). This
package re-expresses its complete capability surface -- and the large-scale
training-data-pipeline extras -- on top of Spark DataFrame / SQL / Structured
Streaming, letting Catalyst/Tungsten own planning, shuffle, state, and
checkpointing.

Layout:
    session       SparkSession factory tuned for local[N] and cluster scale
    tables        parquet fixture loaders (TESTDATA.md tables)
    plans         fluent pipeline builder mirroring the reference DataStream API
    operators     windows, aggregations, joins, dedup, similarity, text, multimodal
    functions     scalar/aggregate helpers (histogram percentile, hashing)
    sources       batch + streaming source builders (files, rate, memory, kafka)
    streaming     watermark strategies, stateful ops, query metrics
"""

__version__ = "0.1.0"
