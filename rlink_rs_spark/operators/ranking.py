"""Distributed exact global ranking / NTILE -- no single-partition sort.

`NTILE(k) OVER (ORDER BY ...)` (and any global-rank derivative: top-quartile
selection, equi-depth bucketing, tercile splits) is the one window shape
Spark executes on a SINGLE partition ("WindowExec: No Partition Defined"),
which is a non-starter at 100 TB. But when the ORDER BY is a total order
(every query here tie-breaks on a unique id), the exact global rank is
computable with fully parallel operators:

  1. `repartitionByRange(P, keys)` -- a parallel range exchange; partition i
     holds keys strictly below partition i+1 (RangePartitioner boundaries);
  2. `sortWithinPartitions(keys)` -- parallel per-partition sort; because the
     key is a total order, row order inside each partition is deterministic;
  3. `monotonically_increasing_id()` -- encodes (partition_id << 33 | local
     row index) with zero coordination;
  4. partition sizes (a <=P-row aggregate) -> exclusive prefix sums = rank
     offsets; the only remaining unpartitioned window runs over this
     <=P-row table -- O(spark.sql.shuffle.partitions), INDEPENDENT of the
     corpus size (the BY-DESIGN tiny-input case in tools/plan_audit.py);
  5. global rank = offset[pid] + local_index + 1, broadcast-joined back;
     NTILE follows in closed form (`ntile_expr`).

So the corpus pays ONE parallel range shuffle -- the same data movement a
distributed sort needs anyway -- instead of collapsing onto one task. The
result is EXACT (bit-identical to NTILE over the same total order), so the
DuckDB oracles keep hash-matching at every scale; there is no approximate
"scale path" to diverge.

The ranked frame is persisted (MEMORY_AND_DISK) so the size-count branch and
the output branch provably read one materialization: without the pin, two
plan instantiations of the range exchange could sample different partition
boundaries and disagree on offsets. Eviction-recompute is safe -- the
RangePartitioner's boundaries live in the plan, and the within-partition sort
makes row order deterministic. A multi-tenant 100 TB deployment would swap
the persist for a checkpoint to cheap storage; same plan shape.

Reference parity: the reference's percentile/bucketing operators
(rlink/src/functions/percentile/mod.rs) aggregate scale-bucketed histograms
and never globally sort either; this module is the Spark-side equivalent
discipline for rank-defined buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID_SHIFT = 33  # monotonically_increasing_id: partition id << 33 | row idx
_LOCAL_MASK = (1 << _PID_SHIFT) - 1


def with_global_rank(
    df: DataFrame,
    order: list[Column],
    rank_col: str = "_grank",
    total_col: str | None = "_gtotal",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append the exact 1-based global rank under `order` (which MUST be a
    total order -- include a unique tie-break column) plus, when
    `total_col` is set, the total row count (a 1-row broadcast cross --
    pass None to skip it when the caller only needs ranks). No
    single-partition WindowExec either way. See module docstring for the
    plan shape and determinism argument."""
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranked = (
        df.repartitionByRange(p, *order)
        .sortWithinPartitions(*order)
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()
    )
    part = ranked.withColumn("_pid", F.shiftright("_mid", _PID_SHIFT))
    sizes = part.groupBy("_pid").agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    # exclusive prefix sum over the <=P-row size table (tiny by construction)
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = sizes.select(
        "_pid", F.coalesce(F.sum("_c").over(w), F.lit(0)).cast("bigint").alias("_off")
    )
    local_idx = F.col("_mid").bitwiseAND(F.lit(_LOCAL_MASK))
    out = part.join(F.broadcast(offs), "_pid")
    if total_col is not None:
        tot = sizes.agg(F.sum("_c").cast("bigint").alias(total_col))
        out = out.crossJoin(F.broadcast(tot))
    return (
        out.withColumn(rank_col, (F.col("_off") + local_idx + 1).cast("bigint"))
        .drop("_mid", "_pid", "_off")
    )


def ntile_expr(rank_col: str, total_col: str, k: int) -> str:
    """SQL expression computing `NTILE(k)` from an exact 1-based global rank
    and total count, in pure BIGINT arithmetic (no float rounding at any n).

    NTILE semantics: with n rows, the first n % k tiles hold n div k + 1
    rows, the rest n div k. Rank r therefore maps to
      r <= rem*(q+1)  ->  ceil(r / (q+1))
      otherwise       ->  rem + ceil((r - rem*(q+1)) / q)
    with q = n div k, rem = n % k, and ceil(a/b) = (a + b - 1) div b.
    When n < k, q = 0: every rank lands in the first branch (tile = r)."""
    q = f"({total_col} div {k})"
    rem = f"({total_col} % {k})"
    big = f"({rem} * ({q} + 1))"
    return (
        f"CAST(CASE WHEN {rank_col} <= {big} "
        f"THEN ({rank_col} + {q}) div ({q} + 1) "
        f"ELSE {rem} + (({rank_col} - {big} + {q} - 1) div {q}) END AS BIGINT)"
    )


def with_group_rank(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    rank_col: str = "_grank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact per-group 1-based rank WITHOUT one-task-per-group: the scale
    fix for `row_number() OVER (PARTITION BY k ORDER BY ...)` when k has
    few values (event_type, lang) -- a keyed window funnels each group
    through a single task, so five groups at 100 TB means five tasks.

    Composition over `with_global_rank`: range-repartition on
    (group_cols, order) -- groups are CONTIGUOUS in that total order, and
    a giant group simply spans several range partitions -- then per-group
    rank = global rank minus a broadcast per-group offset (min global rank
    in group - 1; a |groups|-row aggregate). `order` must total-order rows
    WITHIN each group (include a unique tie-break)."""
    full_order = [F.col(g) for g in group_cols] + list(order)
    ranked = with_global_rank(
        df, full_order, rank_col="_gabs", total_col=None, num_partitions=num_partitions
    )
    offs = ranked.groupBy(*group_cols).agg((F.min("_gabs") - 1).alias("_goff"))
    return (
        ranked.join(F.broadcast(offs), group_cols)
        .withColumn(rank_col, (F.col("_gabs") - F.col("_goff")).cast("bigint"))
        .drop("_gabs", "_goff")
    )


def with_group_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    order: list[Column],
    value_col: str,
    sum_col: str = "_gcum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive per-group running SUM of an INTEGER column without
    one-task-per-group -- the prefix-sum sibling of `with_group_rank`, for
    `SUM(v) OVER (PARTITION BY k ORDER BY ... ROWS UNBOUNDED PRECEDING)`
    where k has few values (pack_sequences' per-language token cumsum).

    Plan: range-repartition on (group_cols, order) (giant groups span
    partitions), local running sums within each (range-partition, group)
    cell -- a keyed window whose partitions are at most one range
    partition's rows, so every task stays bounded -- then per-cell totals
    (a <=P x |groups|-row table) prefix-summed per group and broadcast
    back as offsets. Integer addition is exactly associative, so the
    result is bit-identical to the single-task keyed window at any
    partitioning; `order` must total-order rows within each group."""
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    full_order = [F.col(g) for g in group_cols] + list(order)
    ranged = (
        df.repartitionByRange(p, *full_order)
        .sortWithinPartitions(*full_order)
        .withColumn("_mid", F.monotonically_increasing_id())
        .persist()
    )
    part = ranged.withColumn("_pid", F.shiftright("_mid", _PID_SHIFT))
    wloc = (
        Window.partitionBy("_pid", *group_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    loc = part.withColumn("_lcum", F.sum(value_col).over(wloc).cast("bigint"))
    cells = part.groupBy("_pid", *group_cols).agg(
        F.sum(value_col).cast("bigint").alias("_s")
    )
    woff = (
        Window.partitionBy(*group_cols)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = cells.select(
        "_pid",
        *group_cols,
        F.coalesce(F.sum("_s").over(woff), F.lit(0)).cast("bigint").alias("_goff"),
    )
    return (
        loc.join(F.broadcast(offs), ["_pid", *group_cols])
        .withColumn(sum_col, (F.col("_lcum") + F.col("_goff")).cast("bigint"))
        .drop("_mid", "_pid", "_lcum", "_goff")
    )
