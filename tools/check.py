#!/usr/bin/env python3
"""Local simulation of the driver's t2 correctness gate.

Runs `graft.Verify` (unless --no-run) at the given sf dir, then for each
query compares the Spark parquet output against the DuckDB oracle SQL:
columns sorted by name, rows sorted by all columns, exact value compare.

Usage: python3 tools/check.py [--no-run] [--sf /root/testdata/sf0.01] [query ...]
"""
import argparse, json, math, os, subprocess, sys
import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-run", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/graft_verify")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    if not args.no_run:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {args.sf} {args.out}'],
            cwd=REPO, capture_output=True, text=True, timeout=1200)
        if r.returncode != 0:
            print(r.stdout[-4000:], r.stderr[-4000:])
            sys.exit(1)
        for line in r.stderr.splitlines():
            if "[verify]" in line:
                print(line)

    with open(f"{args.out}/oracle_sql.json") as f:
        oracles = json.load(f)

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')")

    names = args.queries or sorted(oracles.keys())
    n_pass = n_fail = 0
    for name in names:
        spark_dir = f"{args.out}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            sp = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            du = con.sql(oracles[name])
            sp_cols = sorted(sp.columns)
            du_cols = sorted(du.columns)
            if [c.lower() for c in sp_cols] != [c.lower() for c in du_cols]:
                print(f"FAIL {name}: columns spark={sp_cols} duckdb={du_cols}")
                n_fail += 1; continue
            q = lambda c: '"' + c + '"'
            sel = ", ".join(q(c) for c in sp_cols)
            order = ", ".join(f"{q(c)} NULLS FIRST" for c in sp_cols)
            sp_rows = con.sql(f"SELECT {sel} FROM sp ORDER BY {order}").fetchall()
            du_rows = con.sql(f"SELECT {sel} FROM du ORDER BY {order}").fetchall()
            sp_types = con.sql(f"DESCRIBE SELECT {sel} FROM sp").fetchall()
            du_types = con.sql(f"DESCRIBE SELECT {sel} FROM du").fetchall()
            type_mismatch = [(a[0], a[1], b[1]) for a, b in zip(sp_types, du_types) if a[1] != b[1]]
            if len(sp_rows) != len(du_rows):
                print(f"FAIL {name}: rows spark={len(sp_rows)} duckdb={len(du_rows)}")
                n_fail += 1; continue
            bad = None
            for i, (a, b) in enumerate(zip(sp_rows, du_rows)):
                if tuple(map(norm, a)) != tuple(map(norm, b)):
                    bad = (i, a, b); break
            if bad:
                print(f"FAIL {name}: row {bad[0]}\n  spark : {bad[1]}\n  duckdb: {bad[2]}")
                n_fail += 1; continue
            note = f" [TYPE DIFF {type_mismatch}]" if type_mismatch else ""
            print(f"PASS {name}: {len(sp_rows)} rows{note}")
            n_pass += 1
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
