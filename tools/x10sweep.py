#!/usr/bin/env python3
"""Full-surface x10 oracle sweep driver.

Runs tools/selfcheck.py ONE QUERY PER SUBPROCESS against a big synthetic
corpus, each under a wall-clock timeout and a DuckDB memory cap, so a
single quadratic oracle can neither hang the sweep nor take the host
down (the r15 80 GB closure-CTE lesson). Results are appended to a log
and summarized at the end.

Usage: python3 tools/x10sweep.py <sfDir> <verifyOutDir> [timeoutSec] [skip,names]
This is a development tool only — not part of the Scala library.
"""
import os, subprocess, sys, time

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 1800
    skip = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else set()
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    env = dict(os.environ,
               GRAFT_DUCKDB_MEM=os.environ.get("GRAFT_DUCKDB_MEM", "48GB"),
               GRAFT_DUCKDB_THREADS=os.environ.get("GRAFT_DUCKDB_THREADS", "16"))
    results = {}
    for name in names:
        if name in skip:
            results[name] = "SKIP (adjudicated via GateCheck)"
            print(f"[skip] {name}", flush=True)
            continue
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(__file__),
                                              "selfcheck.py"),
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout, env=env)
            line = next((l for l in p.stdout.splitlines()
                         if l.startswith(("[PASS]", "[FAIL]", "[NEAR]",
                                          "[rows-only]"))), "")
            results[name] = f"{line}  ({time.time()-t0:.0f}s)"
            print(f"{line}  ({time.time()-t0:.0f}s)", flush=True)
            if p.returncode != 0 and not line.startswith("[FAIL]"):
                print(p.stdout[-2000:], p.stderr[-2000:], flush=True)
        except subprocess.TimeoutExpired:
            results[name] = f"TIMEOUT >{timeout}s"
            print(f"[TIMEOUT] {name} >{timeout}s", flush=True)
    n_pass = sum(1 for v in results.values() if v.startswith("[PASS]"))
    n_rows = sum(1 for v in results.values() if v.startswith("[rows-only]"))
    n_skip = sum(1 for v in results.values() if v.startswith("SKIP"))
    bad = {k: v for k, v in results.items()
           if not v.startswith(("[PASS]", "[rows-only]", "SKIP"))}
    print(f"== sweep: {n_pass} exact, {n_rows} rows-only, {n_skip} skipped, "
          f"{len(bad)} problems / {len(names)} queries")
    for k, v in sorted(bad.items()):
        print(f"   PROBLEM {k}: {v}")
    return 1 if bad else 0

if __name__ == "__main__":
    sys.exit(main())
