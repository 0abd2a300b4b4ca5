"""Local replica of the driver's correctness gate: run each registered query
on Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row counts + order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rlink_rs_spark.queries import REGISTRY
from rlink_rs_spark.session import get_spark
from rlink_rs_spark.tables import TABLE_NAMES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    if problems:
        return problems
    s, d = normalize(spark_pdf), normalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            import numpy as np

            sa, da = sv.astype(float).to_numpy(), dv.astype(float).to_numpy()
            both_nan = pd.isna(sa) & pd.isna(da)
            neq = ~both_nan & ~np.isclose(sa, da, rtol=0, atol=0, equal_nan=True)
            if neq.any():
                i = int(neq.argmax())
                problems.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: {sa[i]!r} vs {da[i]!r}")
        else:
            if not sv.astype(str).equals(dv.astype(str)):
                neq = sv.astype(str) != dv.astype(str)
                i = int(neq.to_numpy().argmax())
                problems.append(f"col {c}: {int(neq.sum())} diffs, first@{i}: {sv.iloc[i]!r} vs {dv.iloc[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(REGISTRY)
    spark = get_spark("check_oracle")
    con = duck_connection(sf_dir)
    failed = 0
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        spark_pdf = q.fn(spark, sf_dir).toPandas()
        t1 = time.time()
        if q.oracle is None:
            print(f"SKIP-ORACLE {name}: rows={len(spark_pdf)} spark={t1 - t0:.1f}s")
            continue
        duck_pdf = con.sql(q.oracle).df()
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failed += 1
            print(f"FAIL {name}: {'; '.join(problems)}")
        else:
            print(f"OK   {name}: rows={len(spark_pdf)} spark={t1 - t0:.1f}s duck={time.time() - t1:.1f}s")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
