"""Event-time windowed aggregations over the `events` table -- the
reference's flagship capability (example/example-simple/src/app.rs:34-66:
source -> flat_map -> filter -> watermark -> key_by(name) -> sliding
window 60s/20s -> reduce(sum/max/min/count) -> sink).

Batch forms here (the correctness gate); the identical plans run as
Structured Streaming in rlink_rs_spark.streaming with withWatermark.
Output shape: window bounds flattened to epoch millis -- engine-neutral,
so Spark and the DuckDB oracle hash identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rlink_rs_spark.functions.percentile import (
    histogram_percentile,
    histogram_percentile_oracle_sql,
)
from rlink_rs_spark.operators.aggregations import sum_exact
from rlink_rs_spark.operators.windows import with_sliding_window_bounds
from rlink_rs_spark.queries.base import SUM_EXACT_SQL, register, sliding_assign_sql
from rlink_rs_spark.tables import load_table


def _std_aggs_spark() -> list:
    # built lazily: Column construction needs an active SparkContext
    return [
        sum_exact("value", "sum_value"),
        F.max("value").alias("max_value"),
        F.min("value").alias("min_value"),
        F.count("*").alias("cnt"),
    ]


_STD_AGGS_SQL = (
    f"{SUM_EXACT_SQL.format(col='value')} AS sum_value, "
    "MAX(value) AS max_value, MIN(value) AS min_value, COUNT(*) AS cnt"
)


def _windowed_events_agg(
    spark: SparkSession, sf_dir: str, size_s: float, slide_s: float, offset_s: float, keys: list[str]
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    assigned = with_sliding_window_bounds(events, "ts", size_s, slide_s, offset_s)
    return (
        assigned.groupBy("window_start", "window_end", *keys)
        .agg(*_std_aggs_spark())
        .select("window_start", "window_end", *keys, "sum_value", "max_value", "min_value", "cnt")
    )


def _windowed_oracle(size_ms: int, slide_ms: int, offset_ms: int, keys: list[str]) -> str:
    key_sel = ", ".join(keys)
    assign = sliding_assign_sql("events", "ts", size_ms, slide_ms, offset_ms)
    return (
        f"SELECT ws AS window_start, ws + {size_ms} AS window_end, {key_sel}, {_STD_AGGS_SQL} "
        f"FROM ({assign}) a GROUP BY ws, {key_sel}"
    )


@register(
    "flagship_sliding_window_agg",
    _windowed_oracle(60_000, 20_000, 0, ["event_type"]),
    "Reference flagship: sliding 60s/20s event-time windows keyed by event_type, "
    "agg sum/max/min/count (example-simple/src/app.rs:44-65).",
)
def flagship_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _windowed_events_agg(spark, sf_dir, 60, 20, 0, ["event_type"])


@register(
    "tumbling_window_agg",
    _windowed_oracle(60_000, 60_000, 0, ["event_type"]),
    "Tumbling 60s windows (slide == size, example-connect/src/app.rs:60-64).",
)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _windowed_events_agg(spark, sf_dir, 60, 60, 0, ["event_type"])


@register(
    "window_offset_agg",
    _windowed_oracle(86_400_000, 86_400_000, -8 * 3600 * 1000, ["event_type"]),
    "24h tumbling windows with Offset::back(8h) -- timezone-aligned day windows "
    "(reference test functions/window/mod.rs:111-124); negative offset normalized "
    "mod slide into F.window startTime.",
)
def window_offset_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _windowed_events_agg(spark, sf_dir, 86_400, 86_400, -8 * 3600, ["event_type"])


@register(
    "multi_key_window_agg",
    _windowed_oracle(300_000, 300_000, 0, ["event_type", "user_id"]),
    "Multi-column key_by (SchemaKeySelector::new(vec![...]), "
    "functions/key_selector/schema_key_selector.rs:8-86) over 5m tumbling windows.",
)
def multi_key_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _windowed_events_agg(spark, sf_dir, 300, 300, 0, ["event_type", "user_id"])


_PCT_SIZE_MS = 3_600_000  # 1h tumbling: enough rows per bucket to exercise the scale


@register(
    "pct_window_agg",
    histogram_percentile_oracle_sql(
        f"SELECT ws AS window_start, ws + {_PCT_SIZE_MS} AS window_end, event_type, value "
        f"FROM ({sliding_assign_sql('events', 'ts', _PCT_SIZE_MS, _PCT_SIZE_MS)}) a",
        ["window_start", "window_end", "event_type"],
        "value",
        [99, 90],
    ),
    "Histogram percentile agg `pct` with the reference's leveldb scale "
    "(functions/percentile/mod.rs:59-210), p99+p90 per 1h window per event_type.",
)
def pct_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    flat = with_sliding_window_bounds(events, "ts", _PCT_SIZE_MS / 1000).select(
        "window_start", "window_end", "event_type", "value"
    )
    return histogram_percentile(flat, ["window_start", "window_end", "event_type"], "value", [99, 90])


from rlink_rs_spark.functions.percentile import bucket_case_sql, bucket_column  # noqa: E402

_PCT_DECODE_ORACLE = f"""
WITH assigned AS (
  SELECT ws AS window_start, event_type, value
  FROM ({sliding_assign_sql('events', 'ts', _PCT_SIZE_MS, _PCT_SIZE_MS)}) a
), bucketed AS (
  SELECT window_start, event_type, {bucket_case_sql('value')} AS bucket,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM assigned
), counts AS (
  SELECT window_start, event_type, bucket, COUNT(*) AS c, SUM(cents) AS sc
  FROM bucketed GROUP BY window_start, event_type, bucket
), ranked AS (
  SELECT *, SUM(c) OVER (PARTITION BY window_start, event_type ORDER BY bucket DESC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scanned,
            SUM(c) OVER (PARTITION BY window_start, event_type) AS n
  FROM counts
)
SELECT event_type || ':' || CAST(window_start AS VARCHAR) AS field,
       CAST(SUM(sc) AS BIGINT) AS value,
       CAST(MAX(CASE WHEN scanned >= GREATEST(CAST(1 AS BIGINT), LEAST(n,
              CAST(FLOOR(n * 0.01) AS BIGINT))) THEN bucket END) AS BIGINT) AS pct_99,
       CAST(MAX(CASE WHEN scanned >= GREATEST(CAST(1 AS BIGINT), LEAST(n,
              CAST(FLOOR(n * 0.1) AS BIGINT))) THEN bucket END) AS BIGINT) AS pct_90
FROM ranked GROUP BY window_start, event_type
"""


@register(
    "pct_output_decode",
    _PCT_DECODE_ORACLE,
    "The reference's percentile decode stage (OutputMapFunction, "
    "example-connect/src/map_output.rs:31-51): downstream flat_map turns the "
    "pct state into Output(field, value, pct_99, pct_90) rows -- field = "
    "'{key}:{window_start}', value = the reduce's exact i64 sum (cents "
    "here: the fixture value is a 2-decimal double), pct_* = i64 scale "
    "boundaries. One pass: the bucket counts aggregation also carries the "
    "sum, so decode adds no extra shuffle over pct itself.",
)
def pct_output_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    flat = with_sliding_window_bounds(events, "ts", _PCT_SIZE_MS / 1000).select(
        "window_start", "event_type", "value"
    )
    bucketed = flat.select(
        "window_start",
        "event_type",
        bucket_column("value").alias("__bucket"),
        F.round(F.col("value") * 100).cast("long").alias("__cents"),
    )
    counts = bucketed.groupBy("window_start", "event_type", "__bucket").agg(
        F.count("*").alias("__c"), F.sum("__cents").alias("__sc")
    )
    w_grp = Window.partitionBy("window_start", "event_type")
    w_desc = w_grp.orderBy(F.col("__bucket").desc()).rowsBetween(Window.unboundedPreceding, 0)
    ranked = counts.withColumn("__scanned", F.sum("__c").over(w_desc)).withColumn(
        "__n", F.sum("__c").over(w_grp)
    )

    def boundary(p: int):
        target = F.greatest(
            F.lit(1).cast("long"),
            F.least(F.col("__n"), F.floor(F.col("__n") * F.lit((100 - p) / 100.0)).cast("long")),
        )
        return F.max(F.when(F.col("__scanned") >= target, F.col("__bucket"))).cast("long")

    return (
        ranked.groupBy("window_start", "event_type")
        .agg(
            F.sum("__sc").cast("long").alias("value"),
            boundary(99).alias("pct_99"),
            boundary(90).alias("pct_90"),
        )
        .select(
            F.concat_ws(":", "event_type", F.col("window_start").cast("string")).alias("field"),
            "value",
            "pct_99",
            "pct_90",
        )
    )


@register(
    "range_window_filter",
    (
        f"SELECT * FROM ({_windowed_oracle(60_000, 20_000, 0, ['event_type'])}) q "
        "WHERE window_start >= (SELECT (epoch_ms(MIN(ts)) // 60000) * 60000 FROM events) "
        "AND window_end <= (SELECT (epoch_ms(MIN(ts)) // 60000) * 60000 + 86400000 FROM events)"
    ),
    "RangeWindowFilter: keep rows whose trigger_window lies within [begin, end] "
    "(functions/filter/range_window_filter.rs:9-44) -- window-bound predicate "
    "on the flagship output, bounds derived from the data's first day.",
)
def range_window_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = flagship_sliding_window_agg(spark, sf_dir)
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.expr("(unix_millis(min(ts)) div 60000) * 60000").alias("begin_ms")
    ).withColumn("end_ms", F.col("begin_ms") + 86_400_000)
    return (
        agg.join(F.broadcast(bounds))
        .where((F.col("window_start") >= F.col("begin_ms")) & (F.col("window_end") <= F.col("end_ms")))
        .drop("begin_ms", "end_ms")
    )


_MAVG_SPAN_S = 7 * 86400  # 7-day trailing range frame


@register(
    "moving_average_7d",
    f"""
    SELECT user_id, epoch_ms(ts) AS ts_ms,
           SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w / 100.0 AS sum_7d,
           CAST(COUNT(*) OVER w AS BIGINT) AS cnt_7d
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch(ts)
                 RANGE BETWEEN {_MAVG_SPAN_S} PRECEDING AND CURRENT ROW)
    """,
    "Trailing 7-day per-user running aggregate via a RANGE window frame "
    "over epoch seconds -- the BATCH analogue of the reference's "
    "event-time range windows (SURVEY §2.6): every row sees exactly the "
    "rows within the trailing interval, no bucketing approximation. "
    "Integer-cents running sum keeps ties and totals bit-identical across "
    "engines (RANGE frames include ALL peers at equal timestamps, so a "
    "double running sum would still be order-safe -- but cents cost "
    "nothing and remove the doubt). Scale: one shuffle on user_id, "
    "per-key ordered scan with a sliding frame -- state is the frame "
    "span, not the partition; hot users bound the frame by time span.",
)
def moving_average_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    events = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-_MAVG_SPAN_S, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return events.select(
        "user_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        (F.sum(cents).over(w) / 100.0).alias("sum_7d"),
        F.count("*").over(w).alias("cnt_7d"),
    )


_WD_SIZE_MS = 6 * 3_600_000  # 6h tumbling: enough users per window to matter


@register(
    "window_distinct_users",
    f"""
    WITH assigned AS (
      SELECT (epoch_ms(ts) // {_WD_SIZE_MS}) * {_WD_SIZE_MS} AS ws, event_type, user_id
      FROM events
    ),
    level1 AS (
      SELECT ws, event_type, user_id, CAST(COUNT(*) AS BIGINT) AS n_events
      FROM assigned GROUP BY ws, event_type, user_id
    )
    SELECT ws AS window_start, ws + {_WD_SIZE_MS} AS window_end, event_type,
           CAST(COUNT(*) AS BIGINT) AS distinct_users,
           CAST(SUM(n_events) AS BIGINT) AS cnt
    FROM level1 GROUP BY ws, event_type
    """,
    "EXACT windowed COUNT DISTINCT (6h tumbling windows x event_type) via "
    "explicit two-level aggregation: level 1 reduces to one row per "
    "(window, key, user) -- map-side combinable, unlike a naive "
    "count(distinct) whose dedup state rides the shuffle -- and level 2 "
    "counts the survivors, reusing level 1's partitioning. The "
    "distinct-in-window aggregate the reference's sum/max/min/count "
    "repertoire lacks (schema_reduce.rs:11-25); swap level 2's COUNT "
    "for the KMV sketch (approx_distinct_users) when 100 TB cardinality "
    "makes exact per-window dedup the bottleneck.",
)
def window_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two cascaded groupBys; Catalyst plans the second WITHOUT a new
    exchange when keyed on a prefix of the first's keys."""
    events = load_table(spark, sf_dir, "events")
    size_s = _WD_SIZE_MS // 1000
    assigned = events.select(
        F.window("ts", f"{size_s} seconds").alias("w"), "event_type", "user_id"
    ).select(
        F.unix_millis("w.start").alias("window_start"),
        F.unix_millis("w.end").alias("window_end"),
        "event_type",
        "user_id",
    )
    level1 = assigned.groupBy(
        "window_start", "window_end", "event_type", "user_id"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    return level1.groupBy("window_start", "window_end", "event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("distinct_users"),
        F.sum("n_events").cast("bigint").alias("cnt"),
    )
