#!/usr/bin/env python3
"""Dev-only mirror of the driver's correctness gate: run Verify via
sbt, then compare each query's parquet against its DuckDB oracle on
the same testdata (columns sorted by name, rows sorted, exact values).
Usage: python3 scripts/check_oracle.py [sfdir] [outdir] [--no-run]
"""
import json, math, subprocess, sys, glob, os

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/tmp/verify_out"

if "--no-run" not in sys.argv:
    r = subprocess.run(["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
                       capture_output=True, text=True, timeout=1800)
    if "[error]" in r.stdout.replace("[error] 2", ""):  # spark logs go to stderr-as-error; check exit
        pass
    if r.returncode != 0:
        print(r.stdout[-4000:]); sys.exit(1)

import duckdb
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v!r}"
    if isinstance(v, list): return str([norm(x) for x in v])
    return str(v)

fails, passes, skips = [], [], []
for name in sorted(oracle):
    pq_dir = f"{OUT}/{name}"
    files = glob.glob(f"{pq_dir}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    got = con.execute(f"SELECT * FROM read_parquet('{pq_dir}/*.parquet')").fetchdf()
    try:
        want = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}")); continue
    gc, wc = sorted(got.columns), sorted(want.columns)
    if gc != wc:
        fails.append((name, f"schema mismatch: spark={gc} oracle={wc}")); continue
    g = [tuple(norm(v) for v in row) for row in got[gc].itertuples(index=False)]
    w = [tuple(norm(v) for v in row) for row in want[wc].itertuples(index=False)]
    g.sort(); w.sort()
    if len(g) != len(w):
        fails.append((name, f"row count: spark={len(g)} oracle={len(w)}")); continue
    if g != w:
        diff = next((i, a, b) for i, (a, b) in enumerate(zip(g, w)) if a != b)
        fails.append((name, f"value mismatch at sorted row {diff[0]}:\n  spark : {diff[1]}\n  oracle: {diff[2]}\n  cols  : {gc}"))
        continue
    passes.append((name, len(g)))

for n, c in passes: print(f"PASS {n} ({c} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
