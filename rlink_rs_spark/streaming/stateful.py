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


def fold_alert_cents(
    cents, total_cents: int, alerts: int, thr_cents: int
) -> tuple[list[tuple[int, int, int]], int, int]:
    """Vectorized threshold-crossing fold over one batch (integer cents --
    deterministic, drift-free). Returns (emissions, new_total_cents,
    new_alerts) where each emission is (row_index, alert_seq, cum_cents).

    Semantics (property-tested against a per-row reference fold): alert_seq
    advances once per threshold multiple newly reached by the running
    total's historical maximum -- a dip below a crossed multiple never
    re-alerts, and one row can emit several sequences."""
    import numpy as np

    cum = total_cents + np.cumsum(np.asarray(cents, dtype="int64"))
    # level[i] = multiples reached after row i; the effective prior level is
    # the running max of (alerts, level) since alerts only ever advances
    level = cum // thr_cents
    runmax = np.maximum.accumulate(np.maximum(level, alerts))
    eff_prev = np.concatenate(([alerts], runmax[:-1]))
    n_new = np.maximum(level - eff_prev, 0)
    emits: list[tuple[int, int, int]] = []
    for i in np.nonzero(n_new)[0]:
        for s in range(int(eff_prev[i]) + 1, int(level[i]) + 1):
            emits.append((int(i), s, int(cum[i])))
    return emits, int(cum[-1]), int(runmax[-1])


def threshold_alerts(events: DataFrame, threshold: float = 1000.0) -> DataFrame:
    """Per-key running-total threshold crossings: emit one alert row each
    time a user's cumulative value crosses another multiple of `threshold`.

    Keyed state = (running_total, alerts_emitted); all Arrow chunks for the
    key are concatenated and sorted once by (ts, event_id) -- a key whose
    batch spans multiple chunks (> arrow.maxRecordsPerBatch) must still fold
    in global event-time order with a stable tie-break, matching the batch
    oracle. The fold itself is vectorized: integer-cents cumsum +
    searchsorted against threshold multiples (no per-row Python). This is
    the shape of the reference's ReduceFunction fold
    (reduce(Option<acc>, record) -> acc, core/function.rs:224-237)
    with user-visible emissions."""
    thr_cents = int(round(threshold * 100))

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        total, alerts = state.get if state.exists else (0.0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            state.update((total, alerts))
            return
        sort_cols = ["ts", "event_id"] if "event_id" in pdf.columns else ["ts"]
        pdf = pdf.sort_values(sort_cols, kind="mergesort", ignore_index=True)
        import numpy as np

        cents = np.rint(pdf["value"].to_numpy(dtype="float64") * 100).astype("int64")
        ts_ms = pdf["ts"].astype("int64").to_numpy() // 1_000_000
        emits, total, alerts = fold_alert_cents(
            cents, int(round(total * 100)), alerts, thr_cents
        )
        state.update((total / 100.0, alerts))
        if emits:
            yield pd.DataFrame(
                [(user_id, s, c / 100.0, int(ts_ms[i])) for i, s, c in emits],
                columns=["user_id", "alert_seq", "running_total", "ts_ms"],
            )

    cols = ["user_id", "ts", "value"] + (
        ["event_id"] if "event_id" in events.columns else []
    )
    return (
        events.select(*cols)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, ALERT_SCHEMA, ALERT_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


def threshold_alerts_tws(events: DataFrame, threshold: float = 1000.0) -> DataFrame:
    """threshold_alerts on Spark 4's transformWithStateInPandas -- the
    successor API to applyInPandasWithState (typed state handles, timers,
    multiple state variables; requires the RocksDB state-store provider).
    Same fold, same output schema, so the batch oracle and the
    applyInPandasWithState twin pin its semantics. Kept alongside the
    older API: the reference's stateful traits map to either, and a user
    migrating Spark versions needs both shapes to exist.

    Environment note: executing this operator needs the `protobuf` package
    (the TWS state-server protocol); in containers without it the query
    fails at stream start with STREAMING_PYTHON_RUNNER_INITIALIZATION
    (plan construction still works -- tested either way; the execution
    parity test runs wherever protobuf is installed)."""
    import numpy as np
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    thr_cents = int(round(threshold * 100))

    class AlertProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._acc = handle.getValueState("acc", ALERT_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            prior = self._acc.get() if self._acc.exists() else (0.0, 0)
            total, alerts = prior
            pdf = pd.concat(list(rows), ignore_index=True)
            if len(pdf) == 0:
                return
            sort_cols = ["ts", "event_id"] if "event_id" in pdf.columns else ["ts"]
            pdf = pdf.sort_values(sort_cols, kind="mergesort", ignore_index=True)
            cents = np.rint(pdf["value"].to_numpy(dtype="float64") * 100).astype("int64")
            ts_ms = pdf["ts"].astype("int64").to_numpy() // 1_000_000
            emits, total_c, alerts = fold_alert_cents(
                cents, int(round(total * 100)), alerts, thr_cents
            )
            self._acc.update((total_c / 100.0, alerts))
            if emits:
                yield pd.DataFrame(
                    [(user_id, s, c / 100.0, int(ts_ms[i])) for i, s, c in emits],
                    columns=["user_id", "alert_seq", "running_total", "ts_ms"],
                )

        def close(self) -> None:
            pass

    cols = ["user_id", "ts", "value"] + (
        ["event_id"] if "event_id" in events.columns else []
    )
    return (
        events.select(*cols)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=AlertProcessor(),
            outputStructType=ALERT_SCHEMA,
            outputMode="Append",
            timeMode="None",
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
