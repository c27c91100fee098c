#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle_sql.json
entry in DuckDB against the sf tables, compare with the Verify parquet
dumps (columns sorted by name, rows sorted, exact value compare).

Usage: python3 scripts/parity.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, math
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).fetchall()
        exp_cols = [d[0] for d in con.sql(sql).description]
    except Exception as e:
        print(f"[FAIL] {name}: oracle error: {e}")
        fails += 1
        continue
    try:
        got_rel = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'")
        got = got_rel.fetchall()
        got_cols = [d[0] for d in got_rel.description]
    except Exception as e:
        print(f"[FAIL] {name}: spark output missing: {e}")
        fails += 1
        continue

    def norm(rows, cols):
        idx = sorted(range(len(cols)), key=lambda i: cols[i])
        def key(v):
            if isinstance(v, float):
                return repr(v)
            if isinstance(v, list):
                return str(v)
            return str(v)
        return sorted(tuple(key(r[i]) for i in idx) for r in rows), sorted(cols)

    e_rows, e_cols = norm(exp, exp_cols)
    g_rows, g_cols = norm(got, got_cols)
    if e_cols != g_cols:
        print(f"[FAIL] {name}: columns differ oracle={e_cols} spark={g_cols}")
        fails += 1
    elif e_rows != g_rows:
        diffs = [(a, b) for a, b in zip(e_rows, g_rows) if a != b][:3]
        print(f"[FAIL] {name}: {len(e_rows)} vs {len(g_rows)} rows; first diffs: {diffs}")
        fails += 1
    else:
        print(f"[ok]   {name}: {len(g_rows)} rows")
print("PARITY:", "FAIL" if fails else "PASS", f"({len(oracle) - fails}/{len(oracle)})")
sys.exit(1 if fails else 0)
