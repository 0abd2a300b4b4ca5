"""Generate the sf100 CAP PROBE fixture (VERDICT r12 #5).

Usage: python tools/make_cap_probe_fixture.py [out_root] [n_docs_big]

The driver's replica scaling (make_scaled_data.py) deliberately gives each
replica its own shingle space, so document frequencies never grow with
scale and the `max_df` posting cap can NEVER bind on it. Real corpora are
the opposite: Zipf-headed, with stopword-like shingles whose df grows
linearly with corpus size. This generator produces that shape,
deterministically (DuckDB hash(), no RNG state), at two scales from the
SAME recipe so a vs-linear ratio is meaningful:

  * body: 50 words per doc drawn from a vocabulary sized 10x the doc count
    -- a body 3-gram is unique w.h.p., so candidate-pair volume stays
    linear (the healthy tail of the Zipf curve);
  * near-dup structure: every doc_id % 10 == 7 copies the previous doc's
    first 45 words (real containment/Jaccard pairs at every scale);
  * Zipf head: every doc_id % 3 == 0 is prefixed with a 4-word run from a
    30-word stopword vocabulary (27 distinct runs -> 54 distinct head
    3-grams). Head-shingle df ~= n_docs/81: ~62 at the 5k base (under the
    10k cap, like today's fixtures) and ~62,000 at the 5M big leg -- the
    first fixture where the cap actually BINDS. Uncapped, those 54 keys
    alone would stream ~1e11 candidate pairs; the probe records what the
    cap dropped via hot_postings_report.

embeddings scale by plain replication (vec_id shifted, vectors unchanged
-- IVF cost depends on row count; the vec_id < 10 query set stays
replica-0), matching make_scaled_data.py.
"""

from __future__ import annotations

import os
import sys

import duckdb

N_BASE = 5_000
STOP_RUNS = 27  # head-run index space -> 54 head shingles
BODY_WORDS = 50
COPY_PREFIX = 45  # words the near-dup copies share


def _docs_sql(n: int) -> str:
    v = 10 * n  # body vocabulary size
    return f"""
    WITH d AS (
      SELECT i AS doc_id FROM range({n}) t(i)
    ), w AS (
      SELECT doc_id,
        [ 'w' || ((hash(doc_id * {BODY_WORDS} + j) % {v})::VARCHAR)
          for j in range({BODY_WORDS}) ] AS own,
        [ 'w' || ((hash((doc_id - 1) * {BODY_WORDS} + j) % {v})::VARCHAR)
          for j in range({BODY_WORDS}) ] AS prev
      FROM d
    ), words AS (
      SELECT doc_id,
        CASE WHEN doc_id % 10 = 7
             THEN prev[1:{COPY_PREFIX}] || own[{COPY_PREFIX + 1}:{BODY_WORDS}]
             ELSE own END AS body,
        CASE WHEN doc_id % 3 = 0
             THEN [ 'sw' || (((hash(doc_id * 7 + 1) % {STOP_RUNS}) + k)::VARCHAR)
                    for k in range(4) ]
             ELSE CAST([] AS VARCHAR[]) END AS head
      FROM w
    )
    SELECT doc_id,
           array_to_string(head || body, ' ') AS text,
           'en' AS lang,
           'zipf_probe' AS source,
           LENGTH(array_to_string(head || body, ' '))::BIGINT AS n_chars
    FROM words
    """


def main() -> None:
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/capprobe"
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000 * N_BASE
    src_emb = "/root/testdata/sf0.1/embeddings.parquet"
    con = duckdb.connect()
    for scale, n in (("base", N_BASE), ("sf100", n_big)):
        d = os.path.join(out_root, scale)
        os.makedirs(d, exist_ok=True)
        dest = os.path.join(d, "documents.parquet")
        con.sql(f"COPY ({_docs_sql(n)}) TO '{dest}' (FORMAT PARQUET)")
        print(scale, "documents:", con.sql(f"SELECT COUNT(*) FROM '{dest}'").fetchone()[0])
    # embeddings: base = the real sf0.1 table; big = x(n_big/N_BASE) replicas
    replicas = n_big // N_BASE
    base_emb = os.path.join(out_root, "base", "embeddings.parquet")
    con.sql(f"COPY (SELECT * FROM '{src_emb}') TO '{base_emb}' (FORMAT PARQUET)")
    vbase = con.sql(f"SELECT MAX(vec_id) + 1 FROM '{src_emb}'").fetchone()[0]
    big_emb = os.path.join(out_root, "sf100", "embeddings.parquet")
    con.sql(
        f"""
        COPY (
          SELECT vec_id + r.k * {vbase} AS vec_id, embedding, label
          FROM '{src_emb}' CROSS JOIN range({replicas}) r(k)
        ) TO '{big_emb}' (FORMAT PARQUET)
        """
    )
    print("sf100 embeddings:", con.sql(f"SELECT COUNT(*) FROM '{big_emb}'").fetchone()[0])


if __name__ == "__main__":
    main()
