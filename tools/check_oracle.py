"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB over the same parquet, compare
row count, schema width, and order-insensitive values.

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.round(9)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from __spark_entry__ import queries, oracle_sql
    from proj_spark.session import get_spark
    from proj_spark.querylib import TABLES

    spark = get_spark(cpus=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    oracles = oracle_sql()
    n_pass = n_fail = 0
    for name, fn in queries().items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"{name:24s} rows-only: {len(sdf)} rows")
            continue
        odf = con.sql(oracles[name]).df()
        a, b = normalize(sdf), normalize(odf)
        ok_rows = len(a) == len(b)
        ok_cols = list(a.columns) == list(b.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                              check_exact=False, rtol=0, atol=1e-9)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).split("\n")[:6]
        status = "PASS" if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "PASS":
            n_pass += 1
        else:
            n_fail += 1
        print(f"{name:24s} {status} rows {len(a)}/{len(b)} cols {list(a.columns)}")
        if status == "FAIL" and ok_rows and ok_cols:
            print("   ", "\n    ".join(msg))
            # show first differing rows
            neq = (a != b).any(axis=1)
            if neq.any():
                i = neq.idxmax()
                print("    spark:", a.iloc[i].to_dict())
                print("    duck :", b.iloc[i].to_dict())
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
