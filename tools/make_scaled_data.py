"""Synthesize an sf1-equivalent dataset by replicating sf0.1 tenfold.

Usage: python tools/make_scaled_data.py [src_dir] [out_dir] [replicas]

Scaling rules keep join structure and workload character intact:
  * events      -- event_id shifted per replica (stays unique for dedup /
                   tie-breaks); user_id and ts unchanged, so per-user and
                   per-window densities grow 10x like a higher event rate.
  * documents   -- doc_id shifted; replica k > 0 prefixes every word with
                   'r{k}', giving each replica its own shingle space: the
                   near-dup structure of the original corpus repeats 10x
                   instead of every doc gaining 9 exact copies (which would
                   quadratically distort the candidate-pair workload).
  * embeddings  -- vec_id shifted, vectors unchanged (ANN cost depends on
                   row count, not values; the vec_id < 10 query set stays
                   replica-0).
  * orders + lineitem -- orderkeys shifted with the SAME base so the
                   orders-lineitem join still matches within replicas.
  * dimensions (region nation customer supplier part) -- copied 1x, the
    TPC-H shape (facts scale, dims don't; events.user_id still hits
    customer.c_custkey).

DuckDB writes single parquet files so the repo's footer-probing loader
works unchanged.
"""

from __future__ import annotations

import os
import sys

import duckdb


def make_scaled(src: str, out: str, replicas: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def t(name: str) -> str:
        return f"'{src}/{name}.parquet'"

    def write(name: str, sql: str) -> None:
        dest = f"{out}/{name}.parquet"
        con.sql(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT COUNT(*) FROM '{dest}'").fetchone()[0]
        print(f"{name}: {n} rows")

    for dim in ("region", "nation", "customer", "supplier", "part"):
        write(dim, f"SELECT * FROM {t(dim)}")

    ev_base = con.sql(f"SELECT MAX(event_id) + 1 FROM {t('events')}").fetchone()[0]
    write(
        "events",
        " UNION ALL ".join(
            f"SELECT event_id + {k * ev_base} AS event_id, ts, user_id, event_type, "
            f"value, props FROM {t('events')}"
            for k in range(replicas)
        ),
    )
    # DuckDB reads the source's TIMESTAMP(NANOS) as micros; restore nanos so
    # the repo loader takes the same nanosAsLong path as on real testdata
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev_path = f"{out}/events.parquet"
    tbl = pq.read_table(ev_path)
    idx = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(idx, "ts", tbl.column("ts").cast(pa.timestamp("ns")))
    pq.write_table(tbl, ev_path)

    doc_base = con.sql(f"SELECT MAX(doc_id) + 1 FROM {t('documents')}").fetchone()[0]
    doc_cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM {t('documents')}").fetchall()]
    rest = ", ".join(c for c in doc_cols if c not in ("doc_id", "text"))
    parts = []
    for k in range(replicas):
        text = (
            "text"
            if k == 0
            else f"array_to_string(list_transform(string_split(text, ' '), w -> 'r{k}' || w), ' ')"
        )
        parts.append(
            f"SELECT doc_id + {k * doc_base} AS doc_id, {text} AS text, {rest} "
            f"FROM {t('documents')}"
        )
    write("documents", " UNION ALL ".join(parts))

    vec_base = con.sql(f"SELECT MAX(vec_id) + 1 FROM {t('embeddings')}").fetchone()[0]
    write(
        "embeddings",
        " UNION ALL ".join(
            f"SELECT vec_id + {k * vec_base} AS vec_id, embedding, label FROM {t('embeddings')}"
            for k in range(replicas)
        ),
    )

    ok_base = con.sql(f"SELECT MAX(o_orderkey) + 1 FROM {t('orders')}").fetchone()[0]
    o_cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM {t('orders')}").fetchall()]
    o_rest = ", ".join(c for c in o_cols if c != "o_orderkey")
    write(
        "orders",
        " UNION ALL ".join(
            f"SELECT o_orderkey + {k * ok_base} AS o_orderkey, {o_rest} FROM {t('orders')}"
            for k in range(replicas)
        ),
    )
    l_cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM {t('lineitem')}").fetchall()]
    l_rest = ", ".join(c for c in l_cols if c != "l_orderkey")
    write(
        "lineitem",
        " UNION ALL ".join(
            f"SELECT l_orderkey + {k * ok_base} AS l_orderkey, {l_rest} FROM {t('lineitem')}"
            for k in range(replicas)
        ),
    )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/rlink_scaled_sf1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_scaled(src, out, replicas)
