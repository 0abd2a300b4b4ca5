"""Streaming query metrics.

Reference: per-operator Prometheus counters/gauges (rlink/src/metrics/mod.rs;
late-data drop counters Watermark_Expire_* at
watermark_assigner_runnable.rs:92-110). Spark surface: df.observe() named
metrics per micro-batch + StreamingQueryListener progress events, which
carry state-store rows, watermark, and numRowsDroppedByWatermark natively.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


def with_observed_counts(df: DataFrame, name: str = "pipeline_metrics") -> DataFrame:
    """Attach row/late-data observability to a pipeline stage (the
    Watermark_Expire counter analogue lives in the engine's progress
    events; here we observe throughput + value bounds)."""
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
    )


@dataclass
class ProgressCollector(StreamingQueryListener):
    """Collects per-batch progress: watermark, state rows, rows dropped by
    watermark -- the reference's coordinator-side metrics view."""

    progress: list[dict] = field(default_factory=list)
    terminated_ids: list[str] = field(default_factory=list)

    def onQueryStarted(self, event):  # noqa: N802 (Spark API names)
        pass

    def onQueryProgress(self, event):  # noqa: N802
        p = event.progress
        row = {
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "eventTime": dict(p.eventTime) if p.eventTime else {},
        }
        try:
            # per-epoch wall clock (the soak witness's flatness signal)
            row["triggerMs"] = dict(p.durationMs).get("triggerExecution")
        except Exception:
            pass
        try:
            ops = p.stateOperators
            row["droppedByWatermark"] = sum(
                getattr(o, "numRowsDroppedByWatermark", 0) or 0 for o in ops
            )
            row["stateRows"] = sum(getattr(o, "numRowsTotal", 0) or 0 for o in ops)
            # per-operator breakdown: chained-stateful plans (two stores in
            # one query) witness each store's bound separately. Both series
            # matter: a downstream agg whose windows finalize in the same
            # batch its inputs arrive shows numRowsTotal == 0 at batch end
            # (state evicted within the batch) while numRowsUpdated carries
            # its real per-epoch churn.
            row["stateRowsPerOp"] = [
                getattr(o, "numRowsTotal", 0) or 0 for o in ops
            ]
            row["stateUpdatedPerOp"] = [
                getattr(o, "numRowsUpdated", 0) or 0 for o in ops
            ]
        except Exception:
            pass
        self.progress.append(row)

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        # The listener bus delivers events per-query in order, so once the
        # terminated event for a query id has landed here, every progress
        # event for that query has been delivered too. run_to_memory waits
        # on this before removeListener -- otherwise callers polling
        # self.progress after the run race a bus that will never deliver.
        self.terminated_ids.append(str(event.id))
