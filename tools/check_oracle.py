#!/usr/bin/env python3
"""Local approximation of the driver's t2 correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>

Loads each table of <sfDir> as a DuckDB view, runs every oracle SQL from
<verifyOutDir>/oracle_sql.json, reads our engine's parquet result from
<verifyOutDir>/<name>/, sorts columns by name, and compares schema +
row count + values exactly. Reports per-query PASS/FAIL with first diffs.
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        res_dir = os.path.join(out_dir, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"[MISS] {name}: no engine output at {res_dir}")
            n_fail += 1
            continue
        try:
            ours = con.execute(
                f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: cannot read engine output: {e}")
            n_fail += 1
            continue
        try:
            oracle = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        ours = ours[sorted(ours.columns)]
        oracle = oracle[sorted(oracle.columns)]
        if list(ours.columns) != list(oracle.columns):
            print(f"[FAIL] {name}: columns {list(ours.columns)} vs oracle {list(oracle.columns)}")
            n_fail += 1
            continue
        if len(ours) != len(oracle):
            print(f"[FAIL] {name}: rows {len(ours)} vs oracle {len(oracle)}")
            n_fail += 1
            continue
        # compare values (exact; both frames are already totally ordered,
        # but re-sort to be safe like the driver does)
        o1 = ours.sort_values(by=list(ours.columns)).reset_index(drop=True)
        o2 = oracle.sort_values(by=list(oracle.columns)).reset_index(drop=True)
        bad = None
        for c in o1.columns:
            a, b = o1[c], o2[c]
            try:
                neq = ~((a == b) | (a.isna() & b.isna()))
            except Exception:
                neq = a.astype(str) != b.astype(str)
            if neq.any():
                i = neq.idxmax()
                bad = (c, i, a[i], b[i])
                break
        if bad:
            c, i, va, vb = bad
            print(f"[FAIL] {name}: col {c} row {i}: ours={va!r} oracle={vb!r}")
            n_fail += 1
        else:
            print(f"[PASS] {name} ({len(ours)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
