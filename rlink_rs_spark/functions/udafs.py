"""Arrow grouped-aggregate (GROUPED_AGG pandas_udf) factories.

This module deliberately does NOT use ``from __future__ import
annotations``: pandas_udf reads the REAL ``pd.Series`` type objects off the
function signature at decoration time, and the future import would turn
them into unresolvable strings (the r12 workaround injected
``__annotations__`` by hand, which ADVICE r12 flagged as brittle -- real
annotations in a future-import-free module are the supported path).

Reference: the UDAF surface mirrors SchemaReduceFunction's user-defined
reduce (rlink/src/core/function.rs:214-254) with Arrow-batched transfer.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


def make_median_udaf():
    """(median_cents, pane_count) GROUPED_AGG pandas UDFs over an integer
    cents column: exact lower median + pane size, one Arrow batch per
    (event_type, day) pane. Pane-in-memory contract: a pane must fit in one
    Arrow batch; rank-based exact_median is the unbounded-group path."""

    def median_cents(cents: pd.Series) -> int:
        # Arrow hands the batch as a read-only buffer; copy before sorting
        vals = cents.to_numpy(copy=True)
        vals.sort(kind="stable")
        return int(vals[(len(vals) - 1) // 2])

    def pane_count(cents: pd.Series) -> int:
        return int(len(cents))

    # Spark disallows mixing a GROUPED_AGG pandas UDF with built-in
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the pane
    # count is a second pandas aggregate over the same Arrow batch.
    return pandas_udf("long")(median_cents), pandas_udf("long")(pane_count)
