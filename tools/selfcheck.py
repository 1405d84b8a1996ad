#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers each parquet table in
<sfDir> as a DuckDB view, runs every oracle SQL, and compares against the
Spark result parquet in <verifyOutDir>/<name>/. Columns are sorted by name,
rows sorted by all columns (mirroring the driver's described compare), and
values compared exactly, with a float tolerance fallback reported separately
so near-misses are visible before the real gate runs.

This is a development tool only — not part of the Scala library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    # big synthetic corpora: bound DuckDB so one quadratic oracle cannot
    # take the host down (the r15 80 GB closure-CTE lesson)
    # spill OUTSIDE the repo working copy (default is ./.tmp in cwd)
    con.execute("SET temp_directory='/tmp/duckspill'")
    mem = os.environ.get("GRAFT_DUCKDB_MEM")
    if mem:
        con.execute(f"SET memory_limit='{mem}'")
    thr = os.environ.get("GRAFT_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads={int(thr)}")
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # spark-written tables (e.g. the ScaleCurve x10 synthesis) are
        # DIRECTORIES named <table>.parquet holding part files
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    declared = [d for d in sorted(os.listdir(out_dir))
                if os.path.isdir(os.path.join(out_dir, d))]
    if only:
        declared = [d for d in declared if d in only]
    for name in declared:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"[FAIL] {name}: no spark output parquet"); n_fail += 1; continue
        got = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            if len(got) == 0:
                print(f"  WARNING: zero rows")
            continue
        try:
            exp = canon(con.execute(oracles[name]).df())
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}"); n_fail += 1; continue
        if list(got.columns) != list(exp.columns):
            print(f"[FAIL] {name}: columns differ spark={list(got.columns)} duck={list(exp.columns)}")
            n_fail += 1; continue
        if len(got) != len(exp):
            print(f"[FAIL] {name}: row count spark={len(got)} duck={len(exp)}")
            n_fail += 1; continue
        exact = True; close = True
        for c in got.columns:
            g, e = got[c].values, exp[c].values
            if np.issubdtype(got[c].dtype, np.floating) or np.issubdtype(exp[c].dtype, np.floating):
                gf = g.astype(np.float64); ef = e.astype(np.float64)
                both_nan = np.isnan(gf) & np.isnan(ef)
                eq = (gf == ef) | both_nan
                if not eq.all():
                    exact = False
                    if not (np.isclose(gf, ef, rtol=1e-9, atol=1e-12) | both_nan).all():
                        close = False
                        i = int(np.argmax(~(np.isclose(gf, ef, rtol=1e-9, atol=1e-12) | both_nan)))
                        print(f"    col {c} row {i}: spark={gf[i]!r} duck={ef[i]!r}")
            else:
                if not (pd.Series(g).astype(str).values == pd.Series(e).astype(str).values).all():
                    exact = False; close = False
                    m = pd.Series(g).astype(str).values != pd.Series(e).astype(str).values
                    i = int(np.argmax(m))
                    print(f"    col {c} row {i}: spark={g[i]!r} duck={e[i]!r}")
        if exact:
            print(f"[PASS] {name}: {len(got)} rows exact"); n_pass += 1
        elif close:
            print(f"[NEAR] {name}: {len(got)} rows float-close but not bit-exact"); n_pass += 1
        else:
            print(f"[FAIL] {name}"); n_fail += 1
    missing = [k for k in oracles if k not in declared
               and (not only or k in only)]
    for k in missing:
        print(f"[FAIL] oracle {k} has no spark output dir"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {len(declared)} declared, {len(oracles)} oracles")
    return 1 if n_fail else 0

if __name__ == "__main__":
    # optional trailing args restrict the compare to named queries
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3:]) if len(sys.argv) > 3 else None))
