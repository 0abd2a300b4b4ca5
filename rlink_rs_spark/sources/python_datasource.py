"""The reference's source contract on Spark 4's Python DataSource API.

The reference defines sources as InputFormat implementations the runtime
splits and schedules: create_input_splits(min_splits) partitions the
work, then each task drives open(split) / reached_end() / read_record()
(rlink/src/core/function.rs InputFormat + InputSplit (lines 56-155); vec_source and
RandInputFormat are the bundled examples). Spark 4's Python DataSource
extension point is the same contract natively: DataSourceReader.
partitions() -> the splits, read(partition) -> the per-task record
iterator, and SimpleDataSourceStreamReader adds the offset-tracked
unbounded variant (initialOffset / read(start) -> (rows, next_offset))
that KafkaInputFormat's seek surface corresponds to.

The bundled generator source here is DETERMINISTIC (pure arithmetic per
global row index), so a DuckDB range() oracle reproduces it exactly and
the correctness gate covers a full custom-source scan: registration,
split planning, per-partition reads, and downstream aggregation.

At 100 TB: partitions() is the parallelism contract -- one Arrow-batched
Python worker per split, no driver materialization; a real source lists
files/offset ranges in partitions() and streams batches in read().
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SYNTH_SCHEMA = "event_id bigint, part int, value double"


def synth_row(event_id: int, part: int) -> tuple[int, int, float]:
    """One deterministic record: value derives from the global row index
    by integer arithmetic, then one double division -- bit-identical to
    the oracle's CAST((i*37)%1000 AS DOUBLE) / CAST(10 AS DOUBLE)."""
    return (event_id, part, ((event_id * 37) % 1000) / 10.0)


class SyntheticReader(DataSourceReader):
    """Batch face: rows_per_partition rows per split, num_partitions
    splits (create_input_splits parity)."""

    def __init__(self, options):
        self.rows = int(options.get("rowsperpartition", 100))
        self.parts = int(options.get("numpartitions", 4))

    def partitions(self):
        return [InputPartition(p) for p in range(self.parts)]

    def read(self, partition: InputPartition):
        p = partition.value
        for i in range(self.rows):
            yield synth_row(p * self.rows + i, p)


class SyntheticStreamReader(SimpleDataSourceStreamReader):
    """Unbounded face (RandInputFormat parity): the offset is the global
    row index; each micro-batch emits `batchrows` rows and advances it --
    the replayable-seek contract (same shape Kafka offsets follow)."""

    def __init__(self, options):
        self.batch = int(options.get("batchrows", 50))

    def initialOffset(self):
        return {"index": 0}

    def read(self, start: dict):
        begin = start["index"]
        end = begin + self.batch
        rows = [synth_row(i, 0) for i in range(begin, end)]
        return (iter(rows), {"index": end})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_row(i, 0) for i in range(start["index"], end["index"])])


class JsonChunkCommit(WriterCommitMessage):
    """One per successful task: the temp file it produced + row count."""

    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class JsonChunkWriter(DataSourceWriter):
    """OutputFormat parity on the writer face of the extension point
    (ElasticsearchOutputFormat / ClickhouseSink shape, SURVEY §2.1): each
    task streams its partition to a UNIQUELY-NAMED temp file and returns
    a commit message; commit() publishes exactly the acknowledged files
    (task retries leave orphaned temps that never get published -- the
    two-phase visibility rule real file/bulk sinks follow); abort() is
    the cleanup hook."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("json_chunks sink requires option('path', ...)")

    def write(self, iterator) -> JsonChunkCommit:
        import json
        import os
        import uuid

        from pyspark import TaskContext

        part = TaskContext.get().partitionId()
        tmp = os.path.join(self.path, f"_tmp_part{part}_{uuid.uuid4().hex[:12]}.json")
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return JsonChunkCommit(tmp, n)

    def commit(self, messages) -> None:
        import os

        for m in messages:
            final = m.path.replace("_tmp_", "part_", 1)
            os.rename(m.path, final)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SYNTH_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return SyntheticReader(self.options)

    def simpleStreamReader(self, schema) -> DataSourceStreamReader:
        return SyntheticStreamReader(self.options)

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return JsonChunkWriter(self.options)


def register_synthetic_source(spark) -> None:
    spark.dataSource.register(SyntheticEventsDataSource)


def synth_oracle_sql(rows_per_partition: int, num_partitions: int) -> str:
    """DuckDB twin of the full synthetic scan."""
    total = rows_per_partition * num_partitions
    return (
        f"SELECT i AS event_id, CAST(i // {rows_per_partition} AS INT) AS part, "
        f"CAST((i * 37) % 1000 AS DOUBLE) / CAST(10 AS DOUBLE) AS value "
        f"FROM range({total}) t(i)"
    )
