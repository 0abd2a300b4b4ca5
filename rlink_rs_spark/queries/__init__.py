"""Query registry: every operator claimed in SURVEY.md §2 has an entry here,
pairing a Spark DataFrame implementation with its DuckDB oracle SQL twin
(the driver's correctness gate). Submodules register into REGISTRY on import.
"""

from __future__ import annotations

from rlink_rs_spark.queries.base import REGISTRY, Query

# Import order is registration order; keep flagship first.
from rlink_rs_spark.queries import windowed  # noqa: E402,F401
from rlink_rs_spark.queries import relational  # noqa: E402,F401
from rlink_rs_spark.queries import streams  # noqa: E402,F401
from rlink_rs_spark.queries import dedup  # noqa: E402,F401
from rlink_rs_spark.queries import similarity  # noqa: E402,F401
from rlink_rs_spark.queries import text  # noqa: E402,F401
from rlink_rs_spark.queries import stats  # noqa: E402,F401
from rlink_rs_spark.queries import tpch  # noqa: E402,F401

__all__ = ["REGISTRY", "Query"]
