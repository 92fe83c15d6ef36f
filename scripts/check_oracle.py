#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: read each query's parquet
dump (written by graft.Verify), run the corresponding oracle SQL in DuckDB
over the same testdata tables, canonicalize (sort columns by name, sort
rows), and compare values. Usage:
    python3 scripts/check_oracle.py <outDir> <sfDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main(out_dir: str, sf_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        try:
            got = pd.read_parquet(d)
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            print(f"ROWS  {name}: rows={len(got)} (no oracle)")
            n_noracle += 1
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {name}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"FAIL  {name}: rows {len(g)} vs {len(e)}")
            n_fail += 1
            continue
        # Driver-strict dtype gate: the driver hashes materialized values, so
        # an int64 Spark column vs a float64 oracle column (e.g. a DuckDB
        # HUGEINT window sum widened by pandas) hash-mismatches even when
        # every value is equal. Mirror that by refusing kind mismatches
        # (int vs float vs object); width-only differences (int32/int64)
        # render identically and are allowed.
        kind_bad = [(c, g[c].dtype, e[c].dtype) for c in g.columns
                    if g[c].dtype.kind != e[c].dtype.kind]
        if kind_bad:
            det = ", ".join(f"{c}: spark={gk} oracle={ek}" for c, gk, ek in kind_bad)
            print(f"FAIL  {name}: dtype kind mismatch ({det}) — driver hash would FAIL")
            n_fail += 1
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
            print(f"PASS  {name}: rows={len(g)}")
            n_pass += 1
        except AssertionError:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, rtol=1e-9, atol=1e-9)
                print(f"WARN  {name}: equal only within 1e-9 tolerance (hash would FAIL)")
            except AssertionError as e2:
                print(f"FAIL  {name}: value mismatch:\n{str(e2)[:500]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
