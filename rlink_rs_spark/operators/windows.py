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

from pyspark.sql import Column
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


def window_bounds_millis(window_col: str = "window") -> list[Column]:
    """Flatten the window struct to epoch-millis bounds -- the stable,
    engine-neutral output shape used for oracle comparison."""
    return [
        F.unix_millis(F.col(f"{window_col}.start")).alias("window_start"),
        F.unix_millis(F.col(f"{window_col}.end")).alias("window_end"),
    ]
