#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Dev tool only (not part of the shipped library). Usage:
  sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
  python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("float"):
            df[c] = df[c].astype("float64").round(6)
        elif "datetime" in dt:
            df[c] = df[c].astype("datetime64[us]")
        elif dt == "object":
            df[c] = df[c].astype(str)
        elif dt.startswith("int") or dt.startswith("uint"):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out"
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        try:
            got = canon(pd.read_parquet(f"{outdir}/{name}"))
            exp = canon(con.sql(oracle[name]).df())
            if list(got.columns) != list(exp.columns):
                print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
                n_fail += 1
                continue
            if got.shape != exp.shape:
                print(f"FAIL {name}: shape {got.shape} vs {exp.shape}")
                n_fail += 1
                continue
            if got.equals(exp):
                print(f"OK   {name} rows={len(got)}")
                n_ok += 1
            else:
                neq = (got != exp) & ~(got.isna() & exp.isna())
                bad_cols = [c for c in got.columns if neq[c].any()]
                print(f"FAIL {name}: {int(neq.any(axis=1).sum())} differing rows, cols={bad_cols}")
                for c in bad_cols[:3]:
                    i = neq[c].idxmax()
                    print(f"     {c}[{i}]: got={got[c][i]!r} exp={exp[c][i]!r}")
                n_fail += 1
        except Exception as ex:
            print(f"ERROR {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    print(f"== {n_ok} ok, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
