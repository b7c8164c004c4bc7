#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: for each query dir in
outDir, run the oracle SQL in DuckDB over the same sf parquet tables and
compare row count, sorted column names, and a value hash.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, os, json, glob, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    # Sort rows by all columns, exactly like the driver's comparator —
    # this also reproduces the driver's TypeError on unsortable cells
    # (e.g. ndarray from an array<double> column), which the unsorted
    # mirror could not catch in r09 (q121/q123/q145).
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    rows = []
    for tup in df.itertuples(index=False):
        cells = []
        for v in tup:
            if v is None or (isinstance(v, float) and pd.isna(v)):
                cells.append("NULL")
            elif isinstance(v, float):
                cells.append(f"{v:.6g}")
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_pass = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracles:
            print(f"{name}: NO-ORACLE rows={len(got)}")
            continue
        try:
            want = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE-ERR {e}")
            continue
        problems = []
        if len(got) != len(want):
            problems.append(f"rows {len(got)} vs {len(want)}")
        if sorted(got.columns) != sorted(want.columns):
            problems.append(f"cols {sorted(got.columns)} vs {sorted(want.columns)}")
        else:
            # The driver's comparator is stricter than %.6g about numeric
            # kind: a DuckDB HUGEINT (→ float64 in pandas) against a Spark
            # int64 hash-mismatches there even when values agree. Flag any
            # int-vs-float kind skew so it can't pass locally and fail in
            # the round gate (bit us in r06 on q57).
            def kind(dt):
                s = str(dt)
                if s.startswith(("int", "uint")):
                    return "int"
                if s.startswith("float"):
                    return "float"
                return "other"
            skew = [c for c in got.columns
                    if kind(got[c].dtype) != kind(want[c].dtype)]
            if skew:
                problems.append(f"dtype skew {skew}")
            elif canon(got) != canon(want):
                problems.append("hash mismatch")
        if problems:
            print(f"{name}: FAIL ({'; '.join(problems)})")
        else:
            n_pass += 1
            print(f"{name}: OK rows={len(got)}")
    print(f"\n{n_pass}/{len(names)} pass")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
