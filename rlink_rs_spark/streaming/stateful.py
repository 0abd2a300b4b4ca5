"""Custom stateful streaming operators via applyInPandasWithState -- the
escape hatch standing in for the reference's user-defined stateful traits
(CoProcessFunction, core/function.rs:256-272; keyed window state,
storage/keyed_state/mem_window_state.rs:12-104). State lives in Spark's
state store (checkpointed, recoverable) rather than the reference's
memory-only backend -- strictly stronger fault tolerance (SURVEY §2.8).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

ALERT_SCHEMA = "user_id bigint, alert_seq bigint, running_total double, ts_ms bigint"
ALERT_STATE_SCHEMA = "running_total double, alerts bigint"


def threshold_alerts(events: DataFrame, threshold: float = 1000.0) -> DataFrame:
    """Per-key running-total threshold crossings: emit one alert row each
    time a user's cumulative value crosses another multiple of `threshold`.

    Keyed state = (running_total, alerts_emitted); rows within each batch
    are folded in event-time order so the result is deterministic under
    ordered replay. This is the shape of the reference's ReduceFunction
    fold (reduce(Option<acc>, record) -> acc, core/function.rs:224-237)
    with user-visible emissions."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        total, alerts = state.get if state.exists else (0.0, 0)
        out_rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values("ts")
            for _, row in pdf.iterrows():
                # integer-cents accumulation: deterministic, drift-free
                total = round(total * 100 + round(float(row["value"]) * 100)) / 100.0
                while total >= (alerts + 1) * threshold:
                    alerts += 1
                    out_rows.append(
                        (user_id, alerts, total, int(row["ts"].timestamp() * 1000))
                    )
        state.update((total, alerts))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=["user_id", "alert_seq", "running_total", "ts_ms"])

    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, ALERT_SCHEMA, ALERT_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


def threshold_alerts_batch_oracle(events: DataFrame, threshold: float = 1000.0) -> DataFrame:
    """Batch twin of threshold_alerts for parity tests: cumulative sum in
    event-time order, alert when floor(cum/threshold) increases."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    cum = (F.sum(cents).over(w) / 100.0).alias("running_total")
    df = events.select("user_id", "ts", "event_id", cum)
    level = F.floor(F.col("running_total") / threshold).cast("long")
    prev_level = F.lag(level, 1, 0).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id")
    )
    crossed = df.withColumn("level", level).withColumn("prev_level", prev_level).where(
        F.col("level") > F.col("prev_level")
    )
    # one row per crossed multiple (a single event may cross several)
    return crossed.select(
        "user_id",
        F.explode(F.sequence(F.col("prev_level") + 1, F.col("level"))).alias("alert_seq"),
        "running_total",
        F.unix_millis("ts").alias("ts_ms"),
    )
