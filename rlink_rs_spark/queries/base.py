"""Registry plumbing + engine-neutral SQL helpers shared by query modules."""

from __future__ import annotations

import math
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => driver runs rows-only check
    description: str = ""
    bench: bool = True  # include in bench.py's headline set


REGISTRY: dict[str, Query] = {}


def register(
    name: str, oracle: str | None, description: str = "", bench: bool = True
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name, fn, oracle, description, bench)
        return fn

    return deco


def sliding_assign_sql(table: str, ts_col: str, size_ms: int, slide_ms: int, offset_ms: int = 0) -> str:
    """DuckDB fragment assigning each row of ``table`` to every sliding
    window covering it (``ws`` = window start in epoch millis, plus all
    source columns). Mirrors the reference's assign_windows loop
    (functions/window/mod.rs:53-77) and Spark's TimeWindowing expansion,
    so engine and oracle agree exactly."""
    nk = math.ceil(size_ms / slide_ms)
    off = offset_ms % slide_ms
    ws = f"((epoch_ms(t.{ts_col}) - {off}) // {slide_ms}) * {slide_ms} + {off} - k.k * {slide_ms}"
    return (
        f"SELECT {ws} AS ws, t.* FROM {table} t CROSS JOIN range({nk}) k(k) "
        f"WHERE epoch_ms(t.{ts_col}) >= {ws} AND epoch_ms(t.{ts_col}) < {ws} + {size_ms}"
    )


SUM_EXACT_SQL = "SUM(CAST(ROUND({col}*100) AS BIGINT))/100.0"
