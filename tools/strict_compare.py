#!/usr/bin/env python3
"""Strict (driver-faithful) compare: no float tolerance, dtype-visible.

Usage: python3 tools/strict_compare.py <sfDir> <verifyOutDir> [names...]

Mimics a hash-style compare: sorts columns by name, rows by all
columns, then compares the CELL VALUES EXACTLY (stringified after a
uniform normalization pass) and prints the dtypes each side produced,
so type/ulp-level divergence my tolerant check_oracle.py hides is
visible.
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

def canon(df):
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def cell(v):
    # exact stringification; floats via repr (full precision)
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "∅"
    if isinstance(v, float):
        return repr(v)
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    load(con, sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if not names:
        names = [os.path.basename(p) for p in sorted(glob.glob(f"{out_dir}/*")) if os.path.isdir(p)]
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
        if name not in oracle:
            print(f"  {name}: rows-only"); continue
        exp = con.execute(oracle[name]).df()
        print(f"--- {name}: spark dtypes {dict(got.dtypes.astype(str))}")
        print(f"    oracle dtypes {dict(exp.dtypes.astype(str))}")
        if sorted(got.columns) != sorted(exp.columns) or len(got) != len(exp):
            print(f"✗ {name}: SCHEMA/ROWS mismatch"); continue
        g, e = canon(got), canon(exp)
        bad = 0
        for c in g.columns:
            gs = g[c].map(cell); es = e[c].map(cell)
            neq = gs != es
            if neq.any():
                bad += 1
                idx = list(neq[neq].index[:5])
                for i in idx:
                    print(f"✗ {name} col={c} row{i}: spark={gs.iloc[i]!r} oracle={es.iloc[i]!r}")
                print(f"   ({int(neq.sum())} differing cells in {c})")
        if not bad:
            print(f"✓ {name} strictly identical ({len(g)} rows)")

main()
