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


# --- CUSUM drift detection ---------------------------------------------------

CUSUM_SCHEMA = (
    "user_id bigint, event_id bigint, ts_ms bigint, "
    "cusum_up double, cusum_down double, direction string"
)
CUSUM_STATE_SCHEMA = "c bigint, minc bigint, maxc bigint"


def cusum_drift(
    events: DataFrame, mu0: float = 60.0, h: float = 500.0
) -> DataFrame:
    """Per-key CUSUM change-point detection (Page 1954): one-sided upper
    and lower cumulative sums of (value - mu0), emitting a drift row
    whenever either side exceeds h. Uses the closed form
    ``S+ = C - min(0, running_min(C))`` / ``S- = max(0, running_max(C)) - C``
    over the deviation cumsum C, so the keyed state is THREE integers
    (c, min c, max c in cents) -- bounded state per key regardless of
    stream length, and the fold composes exactly across micro-batches
    (running min/max of a prefix is associative with the carried
    extremes). All arithmetic is integer cents; no float drift between
    the streaming fold and the SQL oracle."""
    import numpy as np

    mu_c = int(round(mu0 * 100))
    h_c = int(round(h * 100))

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        c, minc, maxc = state.get if state.exists else (0, 0, 0)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            state.update((c, minc, maxc))
            return
        sort_cols = ["ts", "event_id"] if "event_id" in pdf.columns else ["ts"]
        pdf = pdf.sort_values(sort_cols, kind="mergesort", ignore_index=True)
        d = np.rint(pdf["value"].to_numpy(dtype="float64") * 100).astype("int64") - mu_c
        cum = c + np.cumsum(d)
        runmin = np.minimum(np.minimum.accumulate(cum), minc)
        runmax = np.maximum(np.maximum.accumulate(cum), maxc)
        s_up = cum - np.minimum(0, runmin)
        s_dn = np.maximum(0, runmax) - cum
        fire = (s_up > h_c) | (s_dn > h_c)
        state.update((int(cum[-1]), int(runmin[-1]), int(runmax[-1])))
        if fire.any():
            ts_ms = pdf["ts"].astype("int64").to_numpy() // 1_000_000
            ev = pdf["event_id"].to_numpy() if "event_id" in pdf.columns else np.zeros(len(pdf), dtype="int64")
            idx = np.nonzero(fire)[0]
            rows = []
            for i in idx:
                up, dn = s_up[i] > h_c, s_dn[i] > h_c
                direction = "both" if (up and dn) else ("up" if up else "down")
                rows.append(
                    (int(ev[i]), int(user_id), int(ts_ms[i]),
                     s_up[i] / 100.0, s_dn[i] / 100.0, direction)
                )
            yield pd.DataFrame(
                rows, columns=["event_id", "user_id", "ts_ms", "cusum_up", "cusum_down", "direction"]
            )[["user_id", "event_id", "ts_ms", "cusum_up", "cusum_down", "direction"]]

    cols = ["user_id", "ts", "value"] + (
        ["event_id"] if "event_id" in events.columns else []
    )
    return (
        events.select(*cols)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, CUSUM_SCHEMA, CUSUM_STATE_SCHEMA, "append", GroupStateTimeout.NoTimeout
        )
    )


def cusum_drift_batch_oracle(
    events: DataFrame, mu0: float = 60.0, h: float = 500.0
) -> DataFrame:
    """Batch twin of cusum_drift via the same closed form as three stacked
    windows (deviation cumsum, then running min/max of it) -- the parity
    pin for the streaming fold."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    mu_c = int(round(mu0 * 100))
    h_c = int(round(h * 100))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = events.select(
        "user_id",
        "ts",
        "event_id",
        (F.expr("CAST(ROUND(value*100) AS BIGINT)") - F.lit(mu_c)).alias("d"),
    )
    c = d.withColumn("c", F.sum("d").over(w).cast("bigint"))
    s = c.select(
        "user_id",
        "ts",
        "event_id",
        "c",
        F.min("c").over(w).cast("bigint").alias("minc"),
        F.max("c").over(w).cast("bigint").alias("maxc"),
    )
    up = F.col("c") - F.least(F.lit(0).cast("bigint"), F.col("minc"))
    dn = F.greatest(F.lit(0).cast("bigint"), F.col("maxc")) - F.col("c")
    return (
        s.withColumn("s_up", up)
        .withColumn("s_dn", dn)
        .where((F.col("s_up") > h_c) | (F.col("s_dn") > h_c))
        .select(
            "user_id",
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            (F.col("s_up") / 100.0).alias("cusum_up"),
            (F.col("s_dn") / 100.0).alias("cusum_down"),
            F.when((F.col("s_up") > h_c) & (F.col("s_dn") > h_c), "both")
            .when(F.col("s_up") > h_c, "up")
            .otherwise("down")
            .alias("direction"),
        )
    )


TRANSITION_SCHEMA = "event_type string, next_type string"
TRANSITION_STATE_SCHEMA = "last_type string"


def transition_pairs(events: DataFrame) -> DataFrame:
    """Per-user event-sequence transition pairs as a custom stateful
    streaming operator: keyed state is ONE string -- the user's most
    recent event_type -- and each micro-batch emits the (from, to) pair
    for every consecutive event, including the boundary pair that joins
    the carried state to the batch's first event. With a ts-ordered
    replay this is exactly the batch LEAD-window sequence, so the
    downstream count matrix shares event_transition_matrix's oracle.

    The reference shape: a CoProcess keeping one record of keyed state
    (core/function.rs:256-272) -- the minimal sequential operator, vs
    CUSUM's numeric fold. State is O(1) per key regardless of stream
    length."""

    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (last,) = state.get if state.exists else (None,)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf) == 0:
            state.update((last,))
            return
        sort_cols = ["ts", "event_id"] if "event_id" in pdf.columns else ["ts"]
        pdf = pdf.sort_values(sort_cols, kind="mergesort", ignore_index=True)
        types = pdf["event_type"].tolist()
        seq = ([last] if last is not None else []) + types
        state.update((types[-1],))
        if len(seq) >= 2:
            yield pd.DataFrame(
                {"event_type": seq[:-1], "next_type": seq[1:]}
            )

    cols = ["user_id", "ts", "event_type"] + (
        ["event_id"] if "event_id" in events.columns else []
    )
    return (
        events.select(*cols)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            TRANSITION_SCHEMA,
            TRANSITION_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
