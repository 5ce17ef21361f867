#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: for each query result parquet
dumped by graft.Verify, run the oracle SQL in DuckDB over the same sf
tables and compare (columns sorted by name, rows sorted, values equal).

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        # decimal/object numerics → float for stable compare
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def eq(a: pd.DataFrame, b: pd.DataFrame) -> str:
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            ok = ((av.isna() & bv.isna()) | (av == bv)).all()
        else:
            try:
                ok = (av.fillna("§NULL§") == bv.fillna("§NULL§")).all()
            except Exception:
                ok = av.equals(bv)
        if not ok:
            bad = (av.fillna(0) != bv.fillna(0)) if av.dtype != object else (av != bv)
            idx = list(bad[bad].index[:3]) if hasattr(bad, "index") else []
            detail = "; ".join(f"row{j}: {av.iloc[j]!r} vs {bv.iloc[j]!r}" for j in idx)
            return f"VALUES col {c}: {detail}"
    return "OK"


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark result missing ({e})")
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            continue
        r = eq(normalize(got), normalize(exp))
        if r == "OK":
            n_ok += 1
            print(f"OK   {name} ({len(got)} rows)")
        else:
            print(f"FAIL {name}: {r}")
    print(f"== {n_ok}/{len(oracles)} matched ==")


if __name__ == "__main__":
    main()
