#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at
sf0.01, then run each oracle SQL in DuckDB over the same tables and
compare (rows sorted, columns sorted by name), reporting per-query match.

Usage: python3 tools/local_verify.py [--skip-verify] [query ...]
"""
import json, math, os, subprocess, sys, glob

SF = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
OUT = "/tmp/graft_verify"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def run_verify():
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    tail = (r.stdout + r.stderr)[-3000:]
    if r.returncode != 0:
        print(tail); sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line: print(line)

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return v
    return v

def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    if "--skip-verify" not in sys.argv: run_verify()
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    names = args or sorted(oracles)
    fails = 0
    for name in names:
        pq = glob.glob(f"{OUT}/{name}/*.parquet")
        if not pq:
            print(f"FAIL {name}: no spark output"); fails += 1; continue
        try:
            spark_rows = con.execute(
                f"SELECT * FROM read_parquet('{OUT}/{name}/*.parquet')").fetchdf()
            oracle_rows = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); fails += 1; continue
        sc = sorted(spark_rows.columns); oc = sorted(oracle_rows.columns)
        if sc != oc:
            print(f"FAIL {name}: columns spark={sc} oracle={oc}"); fails += 1; continue
        s = [tuple(norm(v) for v in r) for r in spark_rows[sc].itertuples(index=False)]
        o = [tuple(norm(v) for v in r) for r in oracle_rows[oc].itertuples(index=False)]
        s.sort(key=repr); o.sort(key=repr)
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}"); fails += 1; continue
        if s != o:
            diff = [(a, b) for a, b in zip(s, o) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}"); fails += 1; continue
        print(f"OK   {name}: {len(s)} rows")
    print(f"\n{len(names) - fails}/{len(names)} green")
    sys.exit(1 if fails else 0)

main()
