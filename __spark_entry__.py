"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001; ``queries()``
exposes one callable per implemented operator from SURVEY.md §2 (plus the
100 TB-scale extras); ``oracle_sql()`` returns each query's DuckDB twin.
Implementations live in rlink_rs_spark/queries/ -- each registered Query
pairs the Spark DataFrame plan with its oracle SQL at the definition site.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rlink_rs_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["flagship_sliding_window_agg"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys without SQL-expressible semantics
    are omitted (driver then records a rows-only check)."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
