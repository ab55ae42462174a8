#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: compare graft.Verify parquet
dumps against DuckDB runs of SparkEntry.oracleSql on the same tables.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import glob
import json
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    spark_dirs = sorted(
        d for d in os.listdir(out_dir)
        if os.path.isdir(os.path.join(out_dir, d)))
    for name in spark_dirs:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"NO-OUTPUT  {name}")
            n_fail += 1
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                        ignore_index=True)
        if name not in oracle:
            print(f"ROWS-ONLY  {name}: rows={len(sdf)} cols={sorted(sdf.columns)}")
            n_pass += 1 if len(sdf) > 0 else 0
            n_fail += 0 if len(sdf) > 0 else 1
            continue
        try:
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        s, o = canon(sdf), canon(odf)
        if list(s.columns) != list(o.columns):
            print(f"SCHEMA     {name}: spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
            continue
        if len(s) != len(o):
            print(f"ROWCOUNT   {name}: spark={len(s)} oracle={len(o)}")
            n_fail += 1
            continue
        # value compare, tolerant on dtype (int64 vs Int64 etc.)
        mismatch = None
        for c in s.columns:
            a, b = s[c], o[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    import numpy as np
                    if not np.allclose(a.astype(float), b.astype(float),
                                       rtol=0, atol=1e-9, equal_nan=True):
                        mismatch = c
                        break
                else:
                    if not (a.astype(str).values == b.astype(str).values).all():
                        mismatch = c
                        break
            except Exception as e:
                mismatch = f"{c} ({e})"
                break
        if mismatch:
            print(f"VALUES     {name}: column {mismatch}")
            sel = s[mismatch.split(' ')[0]] if isinstance(mismatch, str) else None
            try:
                col = mismatch.split(' ')[0]
                diff = s[col].astype(str).values != o[col].astype(str).values
                idx = diff.argmax()
                print(f"           first diff row {idx}: spark={s[col].iloc[idx]!r} oracle={o[col].iloc[idx]!r}")
            except Exception:
                pass
            n_fail += 1
        else:
            print(f"PASS       {name}: rows={len(s)}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
