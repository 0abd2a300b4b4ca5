"""Multi-stream operators: the reference's `connect` surface, generalized.

The reference has no relational join (SURVEY.md §2.4); its only multi-input
operator is CoProcessFunction (core/function.rs:256-272, API `connect` at
core/data_stream.rs:349-371), whose two observed uses are (a) merging
co-partitioned streams into one schema and (b) broadcast dimension
enrichment (example/example-connect/src/app.rs:51-72 connects a Broadcast
config stream with a RoundRobin data stream). We surface the Spark-native
generalizations: schema-aligned union, stream-static broadcast enrichment
join, and windowed stream-stream equi-joins (streaming module).

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
