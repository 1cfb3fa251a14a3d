#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run Verify's parquet dumps
against the DuckDB oracle SQL and compare row counts, column names, and a
value hash (rows sorted, columns sorted by name, doubles kept as-is).

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>
"""
import sys, json, glob, os
import duckdb

out_dir, sf_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = os.path.join(out_dir, name)
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f"FAIL {name}: columns {gc} != {ec}"); fails += 1; continue
    if len(got) != len(exp):
        print(f"FAIL {name}: rows {len(got)} != {len(exp)}"); fails += 1; continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    e = exp[ec].sort_values(ec).reset_index(drop=True)
    same = True
    for c in gc:
        gv, ev = g[c].tolist(), e[c].tolist()
        if gv != ev:
            diffs = [(i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b and not (a != a and b != b)]
            if diffs:
                print(f"FAIL {name}: col {c} first diffs {diffs[:3]}")
                same = False
                break
    if same:
        print(f"PASS {name}: {len(got)} rows")
    else:
        fails += 1
print(f"\n{len(oracle) - fails}/{len(oracle)} PASS")
sys.exit(1 if fails else 0)
