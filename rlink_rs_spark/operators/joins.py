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
