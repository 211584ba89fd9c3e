#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(`sbt "runMain graft.Verify <sfDir> <outDir>"`), then this script compares
each <outDir>/<name>/ parquet against the DuckDB result of
<outDir>/oracle_sql.json's SQL over the same sf tables.

Usage: python3 scripts/compare_oracle.py <sfDir> <outDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["lineitem", "orders", "customer", "supplier", "part", "nation",
          "region", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: datetimes -> isoformat strings, floats rounded
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
            want = canon(con.sql(sql).df())
            if list(got.columns) != list(want.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
                n_fail += 1
                continue
            if len(got) != len(want):
                print(f"FAIL {name}: rows {len(got)} vs {len(want)}")
                n_fail += 1
                continue
            if not got.equals(want):
                neq = (got != want).any(axis=1)
                print(f"FAIL {name}: {int(neq.sum())} differing rows, first:")
                print(pd.concat([got[neq].head(3), want[neq].head(3)], keys=["spark", "duckdb"]))
                n_fail += 1
                continue
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
