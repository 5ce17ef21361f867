#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: for each query result parquet
dumped by graft.Verify, run the oracle SQL in DuckDB over the same sf
tables and compare (columns sorted by name, rows sorted, values equal).

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
"""
import glob
import json
import math
import sys

import duckdb
import pandas as pd
import pyarrow.parquet as pq

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


# Canonical type names for the STRICT type gate. The driver's hash
# serializes values per declared type, so "numerically equal" is not
# enough: a DuckDB HUGEINT column hash-mismatches a Spark BIGINT even when
# every value is identical (round-4 q100). Coercing to float64 before
# compare (the old behavior) masked exactly that class of bug.
_DUCK_CANON = {
    "TINYINT": "int8", "SMALLINT": "int16", "INTEGER": "int32",
    "BIGINT": "int64", "HUGEINT": "hugeint",
    "UTINYINT": "uint8", "USMALLINT": "uint16", "UINTEGER": "uint32",
    "UBIGINT": "uint64",
    "FLOAT": "float32", "DOUBLE": "float64",
    "VARCHAR": "string", "BOOLEAN": "bool",
    "DATE": "date", "TIMESTAMP": "timestamp", "TIMESTAMP_NS": "timestamp",
    "BLOB": "binary",
}


def _canon_duck(t: str) -> str:
    t = str(t).upper()
    if t.startswith("DECIMAL"):
        return "decimal"
    if t.endswith("[]") or t.startswith("STRUCT") or t.startswith("MAP"):
        return "nested"
    return _DUCK_CANON.get(t, t.lower())


def _canon_arrow(t) -> str:
    s = str(t)
    if s.startswith("decimal"):
        return "decimal"
    if s.startswith(("list", "large_list", "struct", "map")):
        return "nested"
    return {
        "int8": "int8", "int16": "int16", "int32": "int32", "int64": "int64",
        "float": "float32", "halffloat": "float16", "double": "float64",
        "string": "string", "large_string": "string", "bool": "bool",
        "date32[day]": "date", "binary": "binary", "large_binary": "binary",
    }.get(s, "timestamp" if s.startswith("timestamp") else s)


def _family(canon: str) -> str:
    if canon.startswith(("int", "uint")):
        return "int"
    if canon.startswith("float"):
        return "float"
    if canon in ("date", "timestamp"):
        return "datetime"
    return canon


def type_gate(name: str, spark_schema, duck_cols, duck_types):
    """Per-column declared-type compare (driver-hash fidelity).

    Returns (fails, warns). Calibrated against the driver's round-4 hash
    behavior: same-family width differences (int32 vs BIGINT, timestamp vs
    DATE) hash-matched on the driver, so they only WARN; cross-family
    differences — HUGEINT (the round-4 q100 bug: DuckDB's sum(BIGINT)
    default — always CAST), DECIMAL against a non-decimal Spark column,
    int vs float, string vs numeric — FAIL.
    """
    spark_types = {f.name: _canon_arrow(f.type) for f in spark_schema}
    fails, warns = [], []
    for c, t in zip(duck_cols, duck_types):
        ct = _canon_duck(t)
        if ct == "hugeint":
            fails.append(f"oracle col {c} is HUGEINT (CAST it: sum() of "
                         f"BIGINT returns HUGEINT in DuckDB)")
            continue
        st = spark_types.get(c)
        if st is None:
            continue  # eq() reports column-set mismatches with detail
        if ct == st or "nested" in (ct, st):
            pass
        elif ct == "decimal" or st == "decimal":
            fails.append(f"TYPE col {c}: spark {st} != oracle {ct}")
        elif _family(ct) == _family(st):
            warns.append(f"type width col {c}: spark {st}, oracle {ct}")
        else:
            fails.append(f"TYPE col {c}: spark {st} != oracle {ct}")
    return fails, warns


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
            rel = con.sql(sql)
            duck_cols, duck_types = list(rel.columns), list(rel.types)
            exp = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            continue
        part = next(iter(sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))),
                    f"{out_dir}/{name}")
        try:
            spark_schema = pq.read_schema(part)
        except Exception as e:
            # a dir with no part file (empty/failed write) must fail this
            # one query, not abort the whole gate run
            print(f"FAIL {name}: schema read error ({e})")
            continue
        tfails, twarns = type_gate(name, spark_schema,
                                   duck_cols, duck_types)
        for w in twarns:
            print(f"WARN {name}: {w}")
        if tfails:
            print(f"FAIL {name}: {'; '.join(tfails)}")
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
