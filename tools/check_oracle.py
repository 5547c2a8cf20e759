#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet result written by graft.Verify, runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir
tables, sorts columns by name and rows by all columns, and compares
values cell-by-cell (floats to 1e-9 rel tol).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def load(con, sf_dir):
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def compare(name, got, exp):
    if sorted(got.columns) != sorted(exp.columns):
        return f"SCHEMA got={sorted(got.columns)} exp={sorted(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS got={len(got)} exp={len(exp)}"
    got, exp = canon(got), canon(exp)
    for c in got.columns:
        g, e = got[c], exp[c]
        if g.dtype.kind == 'f' or e.dtype.kind == 'f':
            ok = np.allclose(g.fillna(-1e300).astype(float), e.fillna(-1e300).astype(float), rtol=1e-9, atol=1e-9)
        else:
            ok = g.astype(str).fillna("∅").equals(e.astype(str).fillna("∅"))
        if not ok:
            bad = (g.astype(str) != e.astype(str))
            i = bad.idxmax() if bad.any() else 0
            return f"VALUES col={c} row{i}: got={g.iloc[i]!r} exp={e.iloc[i]!r}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    load(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [os.path.basename(p) for p in sorted(glob.glob(f"{out_dir}/*")) if os.path.isdir(p)]
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  {name}: rows-only ({len(got)} rows) {'OK' if len(got)>0 else 'EMPTY!'}")
            n_pass += len(got) > 0; n_fail += len(got) == 0
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as ex:
            print(f"✗ {name}: ORACLE SQL ERROR {ex}"); n_fail += 1; continue
        err = compare(name, got, exp)
        if err: print(f"✗ {name}: {err}"); n_fail += 1
        else: print(f"✓ {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

main()
