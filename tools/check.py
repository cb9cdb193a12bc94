#!/usr/bin/env python3
"""Strict local replica of the driver's correctness gate (dev tool only).

The driver sorts columns by name, stringifies values, and hashes them — so
this replica compares STRINGIFIED values exactly. Type-level drift that is
numerically equal but prints differently (parquet DECIMAL '0.40' vs float64
'0.4', DuckDB HUGEINT 3.0 vs bigint 3) FAILS here, as it does at the driver.
The Spark side is read with pandas/pyarrow (like the driver), not DuckDB.

    python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import glob
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def strfy(v):
    if v is None:
        return "NULL"
    if hasattr(v, "tolist"):  # numpy scalar or array
        v = v.tolist()
    if isinstance(v, float):
        return "NULL" if v != v else repr(v)
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return str(v)
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(strfy(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame):
    cols = sorted(df.columns)
    rows = sorted(
        tuple(strfy(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    try:  # written by graft.Verify: queries whose SPARK side threw
        spark_errors = json.load(open(f"{out_dir}/spark_errors.json"))
    except FileNotFoundError:
        spark_errors = {}
    failures = 0
    for name, sql in sorted(oracle.items()):
        # err_side attribution (r4: an oracle-HARNESS crash on an array
        # column silently un-gated a query for a whole round): a failure
        # must say which side broke — spark, oracle SQL, or this harness.
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: [err_side=oracle] oracle SQL error: {e}")
            failures += 1
            continue
        parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not parts:
            why = spark_errors.get(name, "output dir missing with no recorded error")
            print(f"FAIL {name}: [err_side=spark] no parquet output: {why}")
            failures += 1
            continue
        got = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
        try:
            ecols, erows = canon(exp)
            gcols, grows = canon(got)
        except Exception as e:
            print(f"FAIL {name}: [err_side=harness] canonicalization crashed: {e!r} "
                  f"(reshape the query output; this is NOT a wrong answer)")
            failures += 1
            continue
        if ecols != gcols:
            print(f"FAIL {name}: columns exp={ecols} got={gcols}")
            failures += 1
            continue
        if len(erows) != len(grows):
            print(f"FAIL {name}: rows exp={len(erows)} got={len(grows)}")
            failures += 1
            continue
        bad = next((i for i, (a, b) in enumerate(zip(erows, grows)) if a != b), None)
        if bad is not None:
            a, b = erows[bad], grows[bad]
            cols = [c for c, x, y in zip(ecols, a, b) if x != y]
            n = sum(1 for x, y in zip(erows, grows) if x != y)
            print(f"FAIL {name}: {n} rows differ; first at sorted-row {bad} cols {cols}:")
            print(f"  oracle={a}")
            print(f"  spark ={b}")
            failures += 1
        else:
            print(f"PASS {name}: {len(erows)} rows x {len(ecols)} cols")
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)
