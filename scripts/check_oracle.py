#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 scripts/check_oracle.py [sf_dir] [out_dir]
Run `sbt "runMain graft.Verify <sf_dir> <out_dir>"` first.
Compares each query's parquet output against its oracle SQL (sorted columns,
sorted rows) and prints OK/MISMATCH per query. Rows-only queries (no oracle)
are listed with their row counts.
"""
import sys, json, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
produced = {os.path.basename(p) for p in glob.glob(f"{out}/*") if os.path.isdir(p)}
fails = 0

for name in sorted(produced | set(oracle)):
    if name not in produced:
        print(f"MISSING-OUTPUT {name}"); fails += 1; continue
    mine = con.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
    if name not in oracle:
        print(f"rows-only      {name:35s} rows={len(mine)}")
        if len(mine) == 0: fails += 1; print(f"  ^ EMPTY (driver smoke would fail)")
        continue
    try:
        theirs = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"ORACLE-ERROR   {name}: {e}"); fails += 1; continue
    m, t = mine[sorted(mine.columns)], theirs[sorted(theirs.columns)]
    if list(m.columns) != list(t.columns):
        print(f"SCHEMA-NAMES   {name}: {list(m.columns)} vs {list(t.columns)}"); fails += 1; continue
    m = m.sort_values(list(m.columns)).reset_index(drop=True)
    t = t.sort_values(list(t.columns)).reset_index(drop=True)
    if m.equals(t):
        print(f"OK             {name:35s} rows={len(m)}")
    else:
        fails += 1
        print(f"MISMATCH       {name}: rows {len(m)} vs {len(t)}, dtypes {dict(m.dtypes)} vs {dict(t.dtypes)}")
        if len(m) == len(t):
            diff = (m != t) & ~(m.isna() & t.isna())
            bad = diff.any(axis=0)
            for c in m.columns[bad]:
                i = diff[c].idxmax()
                print(f"  col {c}: first diff row {i}: {m[c][i]!r} vs {t[c][i]!r}")

print(f"\n{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)
