"""Multi-stream operators: the reference's `connect` surface, generalized.

The reference has no relational join (SURVEY.md §2.4); its only multi-input
operator is CoProcessFunction (core/function.rs:256-272, API `connect` at
core/data_stream.rs:349-371), whose two observed uses are (a) merging
co-partitioned streams into one schema and (b) broadcast dimension
enrichment (example/example-connect/src/app.rs:51-72 connects a Broadcast
config stream with a RoundRobin data stream). We surface the Spark-native
generalizations: schema-aligned union, stream-static broadcast enrichment
join, and the windowed stream-stream interval join below.

At 100 TB: union is metadata-only (no shuffle); the enrichment join
broadcasts the dimension to every executor, removing the shuffle of the
fact side entirely -- the dominant join strategy for star schemas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def union_aligned(*dfs: DataFrame) -> DataFrame:
    """CoProcess-style N-ary merge: outputs must share one schema, as the
    reference enforces (core/data_stream.rs:46-49). unionByName keeps the
    plan narrow -- no shuffle, partitions are concatenated."""
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df)
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "INTERVAL 0 SECONDS",
    upper: str = "INTERVAL 1 HOURS",
    how: str = "inner",
) -> DataFrame:
    """Windowed stream-stream equi-join: key equality plus an event-time
    range (right_ts in [left_ts + lower, left_ts + upper]). Works on batch
    and streaming DataFrames alike; for streams, call withWatermark on BOTH
    inputs first -- Spark derives state retention from the range bound, so
    each side's join state is evicted as the watermark passes (the
    generalization of the reference's CoProcessFunction connect surface,
    core/data_stream.rs:349-371 / co_process_runnable.rs:84-108).

    Column names must already be disjoint (alias before joining); the time
    condition shuffles both sides on their key only -- the range predicate
    is evaluated post-shuffle, so this is one hash exchange per side at any
    scale, never a cartesian."""
    cond = (
        (F.col(left_key) == F.col(right_key))
        & (F.col(right_ts) >= F.col(left_ts) + F.expr(lower))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(upper))
    )
    return left.join(right, on=cond, how=how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join (backward): for each left row, the latest right row with
    right_ts <= left_ts per key, null-extended when none exists.

    Implementation is the scalable union-and-fill shape -- tag both sides,
    union, one shuffle on the key, forward-fill the right row with
    last_value(ignorenulls) over (ts, side) -- NOT a range join + argmax,
    which explodes on dense right sides. At 100 TB this is a single hash
    exchange plus a per-key sort, the same cost as any keyed window.
    Right rows order before left rows at equal ts, so the match is
    inclusive (right_ts == left_ts matches), like DuckDB/pandas ASOF.

    The right columns travel as ONE struct so the fill is atomic: every
    right_col comes from the same matched right row, and a NULL inside
    that row survives (filling each column independently would stitch
    values from different rows and resurrect older non-null values)."""
    from pyspark.sql import types as T

    l_cols = [c for c in left.columns]
    rstruct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_cols]
    )
    l = left.select(
        *l_cols,
        F.col(left_ts).alias("__ats"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rstruct_type).alias("__rrow"),
    )
    r = right.select(
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols if c != on],
        F.col(right_ts).alias("__ats"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__rrow"),
    )
    merged = l.unionByName(r)
    order = [F.col("__ats"), F.col("__side")] + (
        [F.col(tiebreak)] if tiebreak else []
    )
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = merged.withColumn("__rrow", F.last("__rrow", ignorenulls=True).over(w))
    unpacked = filled.select(
        *l_cols,
        F.col("__side"),
        *[F.col(f"__rrow.{c}").alias(c) for c in right_cols],
    )
    return unpacked.where(F.col("__side") == 1).drop("__side")


def broadcast_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Dimension enrichment: broadcast the small side so the fact table never
    shuffles (the reference replicates config records to every task via
    BroadcastFlagMapFunction, functions/flat_map/broadcast_flat_map.rs:6-49;
    Spark ships one copy per executor instead of per record)."""
    return fact.join(F.broadcast(dim), on=on, how=how)
