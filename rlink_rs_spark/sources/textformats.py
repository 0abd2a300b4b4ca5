"""CSV / NDJSON source-format scans over the events table.

Reference parity: the reference's connectors deserialize raw byte payloads
into typed rows at the source boundary (the kafka_message schema at
rlink-connectors/connector-kafka/src/lib.rs:44-70 carries BINARY payloads a
user FlatMap then parses); Spark's text-format readers are the same contract
with the parse inside the engine -- schema-pinned, predicate-prunable,
executed by the JVM CSV/JSON parsers (UnivocityParser / Jackson), never a
Python UDF.

Staging: each format is written ONCE per (fixture fingerprint, format) by
Spark itself -- the write path is part of the witness (a corrupted writer
breaks the read-back hashes). The timestamp column is serialized as epoch
MICROS (BIGINT): the lossless text encoding of a timestamp -- default text
timestamp formats truncate to millis, which is exactly the silent-corruption
class the parity queries exist to catch. Doubles round-trip via Java's
shortest-roundtrip Double.toString. The `_SUCCESS`-gated local-FS cache probe
follows the same contract as the load_or_* artifact helpers
(operators/similarity.py load_or_train_ivf_codebook docstring).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rlink_rs_spark.tables import content_fingerprint, load_table

# ts serialized as epoch micros; re-cast on read. Column order is the
# events table order so the read-back select is positionally stable too.
_EVENTS_TEXT_SCHEMA = (
    "event_id BIGINT, ts_us BIGINT, user_id BIGINT, "
    "event_type STRING, value DOUBLE, props STRING"
)

_CSV_OPTS = {"header": "true", "quote": '"', "escape": '"'}

# Folded into the cache path so a staged copy is keyed by WHAT was written,
# not just by the source fixture: changing the serialization schema or the
# CSV quoting contract must miss the cache (ADVICE r12). Derived (stable
# md5, not the seed-randomized builtin hash), not hand-bumped.
import hashlib as _hashlib

_STAGE_TOKEN = _hashlib.md5(
    repr((_EVENTS_TEXT_SCHEMA, sorted(_CSV_OPTS.items()))).encode()
).hexdigest()[:8]


def staged_events(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    """Return the events table read back through a staged CSV or NDJSON
    copy (schema-pinned, ts restored to TimestampType). fmt: 'csv'|'json'.

    Staging is ATOMIC: Spark writes to a unique temp dir, which is then
    rename(2)'d to the cache path -- concurrent stagers race on the rename
    and the loser discards its copy, so a reader can never observe a
    half-written (or overwrite-deleted) directory."""
    if fmt not in ("csv", "json"):
        raise ValueError(f"unsupported text format: {fmt!r}")
    fp = content_fingerprint(os.path.join(sf_dir, "events.parquet"))
    path = os.path.join(
        tempfile.gettempdir(), f"rlink_srcfmt_{fmt}_{_STAGE_TOKEN}_{fp}"
    )
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        import shutil
        import uuid

        ev = load_table(spark, sf_dir, "events").select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        try:
            writer = ev.write.mode("overwrite")
            if fmt == "csv":
                writer.options(**_CSV_OPTS).csv(tmp)
            else:
                writer.json(tmp)
            try:
                os.rename(tmp, path)
            except OSError:
                # a concurrent stager published first; its copy is complete
                pass
        finally:
            # failed write OR lost rename race: never leak the staging dir
            # in gettempdir() (ADVICE r13)
            if os.path.exists(tmp):
                shutil.rmtree(tmp, ignore_errors=True)
    reader = spark.read.schema(_EVENTS_TEXT_SCHEMA)
    scan = (
        reader.options(**_CSV_OPTS).csv(path)
        if fmt == "csv"
        else reader.json(path)
    )
    return scan.select(
        "event_id",
        F.timestamp_micros("ts_us").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
