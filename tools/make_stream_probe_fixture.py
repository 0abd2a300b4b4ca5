"""Build the 1000x STREAMING probe fixture (VERDICT r13 #6).

Usage: python tools/make_stream_probe_fixture.py <src_sf_dir> <out_root> [replicas=1000]

Two tables, two scaling rules -- each chosen so the quantity under test is
the one that grows:

  * events -- TIME-TILED: replica k shifts ts by k * (span + 1h) and gets
    disjoint event_id/user_id spaces. The stream becomes 1000x LONGER at
    the SAME event rate -- the unbounded-daemon-source regime
    (source_runnable.rs) where the scale question for a stream-stream
    interval join is whether state stays WATERMARK-BOUNDED (constant,
    set by rate x horizon) instead of growing with stream length.
    Disjoint user spaces per tile make the join output exactly
    replicas x base. (make_scaled_data.py instead replicates at the same
    ts span -- a 1000x RATE probe; both regimes matter, this one isolates
    state eviction.)
  * documents -- doc_id-shifted, text word-prefixed per replica (the
    make_scaled_data.py rule): the CDC changefeed derives per-chunk
    changes from content, so each replica contributes its own change set
    and the merged snapshot is replicas x base rows.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/streamprobe"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 1000

    base_dir = os.path.join(out_root, "base")
    big_dir = os.path.join(out_root, "sf1000")
    os.makedirs(base_dir, exist_ok=True)
    os.makedirs(big_dir, exist_ok=True)

    for t in ("events", "documents"):
        shutil.copyfile(
            os.path.join(src, f"{t}.parquet"), os.path.join(base_dir, f"{t}.parquet")
        )

    con = duckdb.connect()
    ev = f"'{src}/events.parquet'"
    lo, hi, ev_base, user_base = con.sql(
        f"SELECT epoch_ms(MIN(ts)), epoch_ms(MAX(ts)), MAX(event_id) + 1, "
        f"MAX(user_id) + 1 FROM {ev}"
    ).fetchone()
    # tile stride in whole hours (interval multiplication overflows int32
    # at millisecond granularity x 1000 replicas); >=1h gap so tiles never
    # join across seams
    tile_h = (hi - lo) // 3_600_000 + 2
    tile_ms = tile_h * 3_600_000
    # one scan, vectorized tiling: cross join against the replica index
    con.sql(
        f"""
        COPY (
          SELECT e.event_id + k.k * {ev_base} AS event_id,
                 e.ts + (k.k * {tile_h}) * INTERVAL 1 HOUR AS ts,
                 e.user_id + k.k * {user_base} AS user_id,
                 e.event_type, e.value, e.props
          FROM {ev} e CROSS JOIN range({replicas}) k(k)
        ) TO '{big_dir}/events.parquet' (FORMAT PARQUET)
        """
    )
    n = con.sql(f"SELECT COUNT(*) FROM '{big_dir}/events.parquet'").fetchone()[0]
    print(f"sf1000 events: {n} rows, tile span {tile_ms} ms")

    docs = f"'{src}/documents.parquet'"
    doc_base = con.sql(f"SELECT MAX(doc_id) + 1 FROM {docs}").fetchone()[0]
    doc_cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM {docs}").fetchall()]
    rest = ", ".join(c for c in doc_cols if c not in ("doc_id", "text"))
    con.sql(
        f"""
        COPY (
          SELECT d.doc_id + k.k * {doc_base} AS doc_id,
                 CASE WHEN k.k = 0 THEN d.text
                      ELSE array_to_string(list_transform(string_split(d.text, ' '),
                                           w -> 'r' || k.k || w), ' ') END AS text,
                 {rest}
          FROM {docs} d CROSS JOIN range({replicas}) k(k)
        ) TO '{big_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n = con.sql(f"SELECT COUNT(*) FROM '{big_dir}/documents.parquet'").fetchone()[0]
    print(f"sf1000 documents: {n} rows")


if __name__ == "__main__":
    main()
