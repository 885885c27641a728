#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> spark parquet result + <outDir>/oracle_sql.json,
runs the oracle in DuckDB over <sfDir>/*.parquet views, sorts columns by
name, and compares cell-by-cell (exact; floats must already be rounded by
the queries themselves).
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(outdir)
               if os.path.isdir(os.path.join(outdir, d)))
fails = 0
for name in names:
    spark_df = con.execute(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
    if name not in oracle:
        print(f"{name:28s} NO-ORACLE rows={len(spark_df)}")
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE-SQL-ERROR {e}")
        fails += 1
        continue
    a = spark_df[sorted(spark_df.columns)]
    b = duck_df[sorted(duck_df.columns)]
    if list(a.columns) != list(b.columns):
        print(f"{name:28s} SCHEMA-MISMATCH spark={list(a.columns)} duck={list(b.columns)}")
        fails += 1
        continue
    if len(a) != len(b):
        print(f"{name:28s} ROWCOUNT-MISMATCH spark={len(a)} duck={len(b)}")
        fails += 1
        continue
    sa = a.astype(str).values.tolist()
    sb = b.astype(str).values.tolist()
    if sa != sb:
        bad = [(i, ra, rb) for i, (ra, rb) in enumerate(zip(sa, sb)) if ra != rb]
        print(f"{name:28s} VALUE-MISMATCH {len(bad)}/{len(sa)} rows, first: {bad[:3]}")
        fails += 1
        continue
    print(f"{name:28s} OK rows={len(a)}")
print(f"\n{'FAIL' if fails else 'PASS'}: {len(names)-fails}/{len(names)} queries match")
sys.exit(1 if fails else 0)
