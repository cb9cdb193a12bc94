#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only).

Runs each oracle SQL from oracle_sql.json in DuckDB against the sf tables,
loads the corresponding Spark parquet dump, sorts columns by name and rows
by all columns, and compares values exactly. Usage:

    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:  # arrays/objects aren't sortable -> stringify
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v.tolist()) if hasattr(v, "tolist") else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark output missing/unreadable: {e}")
            failures += 1
            continue
        exp, got = canon(exp), canon(got)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
            failures += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
            failures += 1
            continue
        mismatch = None
        for c in exp.columns:
            a, b = exp[c], got[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, i, a.iloc[i], b.iloc[i], int((~eq).sum()))
                break
        if mismatch:
            c, i, av, bv, n = mismatch
            print(f"FAIL {name}: col {c} differs in {n} rows; first at row {i}: oracle={av!r} spark={bv!r}")
            failures += 1
        else:
            print(f"PASS {name}: {len(exp)} rows x {len(exp.columns)} cols")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
