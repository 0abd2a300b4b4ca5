"""Fixed-boundary histogram percentile (the reference's ``pct`` aggregate).

Reference semantics (rlink/src/functions/percentile/mod.rs:59-210, scale at
example/example-connect/src/percentile.rs:1-16, leveldb-histogram style):

  * accumulate: each value lands in the bucket with the smallest scale
    boundary >= value; values above the top boundary clamp to the top
    bucket, values below the first clamp to bucket 0
    (position_in_value_array, mod.rs:80-122).
  * read at percentile p ("water line"): target = clamp(floor(n*(100-p)/100),
    1, n); walk buckets from the TOP accumulating counts; the first bucket
    where the running count reaches target yields its *boundary* as the
    answer (get_result, mod.rs:171-210). The result is always a scale
    boundary, not an interpolated quantile.

Spark-first design: instead of a byte-array accumulator per key (the
reference's PercentileWriter), we express the same math relationally --
bucket assignment is one generated CASE expression (JVM-side, codegen'd,
no Python), then a two-level aggregation computes per-bucket counts and a
top-down running sum. Identical SQL runs on DuckDB for the oracle. This
shape scales: bucket assignment is map-side, the shuffle key is
(group, bucket) with at most |scale|=90 buckets per group, and the final
window scan is over <=90 rows per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# leveldb/util/histogram.cc bucket boundaries, as used by the reference
# (example/example-connect/src/percentile.rs:2-12).
PERCENTILE_SCALE: tuple[float, ...] = (
    1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 16, 18, 20,
    25, 30, 35, 40, 45, 50, 60, 70, 80, 90, 100, 120, 140,
    160, 180, 200, 250, 300, 350, 400, 450, 500, 600, 700, 800,
    900, 1000, 1200, 1400, 1600, 1800, 2000, 2500, 3000, 3500,
    4000, 4500, 5000, 6000, 7000, 8000, 9000, 10000, 12000, 14000,
    16000, 18000, 20000, 25000, 30000, 35000, 40000, 45000, 50000,
    60000, 70000, 80000, 90000, 100000, 120000, 140000, 160000, 180000,
    200000, 250000, 300000, 350000, 400000, 450000, 500000, 600000,
    700000, 800000, 900000, 1000000,
)


def bucket_case_sql(value_expr: str, scale: tuple[float, ...] = PERCENTILE_SCALE) -> str:
    """CASE expression assigning ``value_expr`` to its histogram boundary.

    Valid in both Spark SQL and DuckDB (ANSI CASE), so the exact same text
    serves the engine and the oracle.
    """
    branches = "".join(
        f" WHEN {value_expr} <= {b!r} THEN CAST({b!r} AS DOUBLE)" for b in scale[:-1]
    )
    return f"CASE{branches} ELSE CAST({scale[-1]!r} AS DOUBLE) END"


def bucket_column(value_col: str, scale: tuple[float, ...] = PERCENTILE_SCALE) -> Column:
    return F.expr(bucket_case_sql(value_col, scale))


def histogram_percentile(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    percentiles: list[int],
    scale: tuple[float, ...] = PERCENTILE_SCALE,
) -> DataFrame:
    """Per-group histogram percentiles with reference read-side semantics.

    Returns ``group_cols + [pct_<p> ...]``. Two-phase plan: map-side bucket
    CASE -> groupBy(group, bucket).count() (partial agg combines before the
    shuffle) -> per-group descending running sum over <=90 bucket rows ->
    pick max boundary whose running count reaches the target rank.
    """
    bucketed = df.select(*group_cols, bucket_column(value_col, scale).alias("__bucket"))
    counts = bucketed.groupBy(*group_cols, "__bucket").agg(F.count("*").alias("__c"))
    return histogram_percentile_from_counts(counts, group_cols, percentiles)


def histogram_percentile_from_counts(
    counts: DataFrame,
    group_cols: list[str],
    percentiles: list[int],
    bucket_col: str = "__bucket",
    count_col: str = "__c",
) -> DataFrame:
    """Read-side decode from pre-aggregated (group, bucket, count) rows --
    the top-down boundary walk of the reference's get_result
    (mod.rs:171-210). Split out so the accumulate phase can run elsewhere
    (e.g., incrementally in a streaming window: bucket counts are plain
    sums, so the state store holds <=90 rows per (window, key) and this
    decode runs on the emitted counts)."""
    w_grp = Window.partitionBy(*group_cols)
    w_desc = w_grp.orderBy(F.col(bucket_col).desc()).rowsBetween(Window.unboundedPreceding, 0)
    ranked = counts.withColumn("__scanned", F.sum(count_col).over(w_desc)).withColumn(
        "__n", F.sum(count_col).over(w_grp)
    )

    aggs = []
    for p in percentiles:
        # target = clamp(floor(n * (100-p)/100), 1, n)  (get_result + adjust)
        target = F.greatest(
            F.lit(1).cast("long"),
            F.least(F.col("__n"), F.floor(F.col("__n") * F.lit((100 - p) / 100.0)).cast("long")),
        )
        aggs.append(
            F.max(F.when(F.col("__scanned") >= target, F.col(bucket_col))).alias(f"pct_{p}")
        )
    return ranked.groupBy(*group_cols).agg(*aggs)


def histogram_percentile_oracle_sql(
    source_sql: str,
    group_cols: list[str],
    value_expr: str,
    percentiles: list[int],
    scale: tuple[float, ...] = PERCENTILE_SCALE,
) -> str:
    """DuckDB (ANSI) SQL computing the identical result for the oracle."""
    grp = ", ".join(group_cols)
    case = bucket_case_sql(value_expr, scale)
    pct_sel = ", ".join(
        "MAX(CASE WHEN scanned >= GREATEST(CAST(1 AS BIGINT), LEAST(n, "
        f"CAST(FLOOR(n * {(100 - p) / 100.0!r}) AS BIGINT))) THEN bucket END) AS pct_{p}"
        for p in percentiles
    )
    return f"""
WITH bucketed AS (
  SELECT {grp}, {case} AS bucket FROM ({source_sql}) src
), counts AS (
  SELECT {grp}, bucket, COUNT(*) AS c FROM bucketed GROUP BY {grp}, bucket
), ranked AS (
  SELECT {grp}, bucket,
         SUM(c) OVER (PARTITION BY {grp} ORDER BY bucket DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scanned,
         SUM(c) OVER (PARTITION BY {grp}) AS n
  FROM counts
)
SELECT {grp}, {pct_sel} FROM ranked GROUP BY {grp}
"""
