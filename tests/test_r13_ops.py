"""Round-13 operators: late-data drop accounting as a first-class report.

Reference: the engine counts watermark-expired records per operator
(watermark_assigner_runnable.rs:92-110, reduce_runnable.rs:88-106); here the
report is oracled end to end and the engine's own numRowsDroppedByWatermark
is load-bearing (the query raises on rule/metric mismatch).
"""

from __future__ import annotations

from tests.helpers import run_query_vs_oracle


def test_late_data_report_matches_oracle(spark, duck, sf_dir):
    pdf = run_query_vs_oracle(spark, duck, sf_dir, "streaming_late_data_report")
    # The planted cohort must actually exercise the drop path: the fixture
    # spans a month, so almost every late row's window closed long before
    # the late chunk arrives.
    assert pdf["dropped_rows"].sum() > 0
    assert (pdf["late_kept_rows"] <= pdf["kept_rows"]).all()


def test_late_stager_splits_and_returns_first_chunk_watermark(sf_dir):
    import glob
    import os

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from rlink_rs_spark.streaming.sources import stage_stream_dir_with_late

    staged, wm_src_ms = stage_stream_dir_with_late(sf_dir, "events", 23, 0)
    files = sorted(glob.glob(os.path.join(staged, "chunk_*.parquet")))
    assert len(files) == 3
    first, second, late = (pq.read_table(f) for f in files)
    # Late chunk is exactly the modulus cohort; on-time chunks are clean.
    for tbl, expect_late in ((first, False), (second, False), (late, True)):
        ids = tbl.column("event_id").to_pylist()
        assert all((i % 23 == 0) == expect_late for i in ids)
    # Returned watermark source == max ts of the FIRST chunk, in millis.
    import pyarrow as pa

    max_ms = pc.cast(pc.max(first.column("ts")), pa.timestamp("ms"), safe=False).value
    assert wm_src_ms == max_ms
    # Every on-time row in the first chunk precedes every row of the second
    # (time-ordered split), so the filter watermark is well-defined.
    assert max_ms <= pc.cast(
        pc.min(second.column("ts")), pa.timestamp("ms"), safe=False
    ).value
    # Chunk replay order: strictly increasing mtimes.
    mtimes = [os.path.getmtime(f) for f in files]
    assert mtimes == sorted(mtimes) and len(set(mtimes)) == 3


def test_late_stager_cohort_and_watermark_properties(sf_dir):
    """Property sweep over (late_mod, late_rem): the on-time chunks are a
    clean time-ordered bipartition of the complement, the late chunk is
    exactly the modulus cohort, and the returned filter watermark equals
    the first chunk's max event time for every parameterization."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from rlink_rs_spark.streaming.sources import stage_stream_dir_with_late

    src = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    n_total = src.num_rows
    for mod, rem in ((7, 3), (11, 0), (97, 13)):
        staged, wm = stage_stream_dir_with_late(sf_dir, "events", mod, rem)
        files = sorted(glob.glob(os.path.join(staged, "chunk_*.parquet")))
        tables = [pq.read_table(f) for f in files]
        assert sum(t.num_rows for t in tables) == n_total  # lossless split
        late_ids = set(tables[2].column("event_id").to_pylist())
        assert late_ids == {
            i for i in src.column("event_id").to_pylist() if i % mod == rem
        }
        on_n = tables[0].num_rows + tables[1].num_rows
        assert tables[0].num_rows == (on_n + 1) // 2  # the oracle's rank rule
        got = pc.cast(pc.max(tables[0].column("ts")), pa.timestamp("ms"), safe=False)
        assert wm == got.value
