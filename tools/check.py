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
import pyarrow as pa


def columns_as_strings(tbl):
    """Arrow table -> {name: [str, ...]} with decimals kept faithful.

    Pandas flattens decimal128 to float64, which hid the round-12 q81
    red (DECIMAL(38,2) hashed differently in the driver while this
    mirror saw equal float64s). Decimal columns are therefore rendered
    via str(decimal.Decimal) — scale-preserving, so a mis-scaled or
    mis-rounded decimal WILL mismatch here. Everything else keeps the
    historical pandas astype(str) rendering so the 100+ green keys'
    canonical strings are unchanged.
    """
    out = {}
    for name in tbl.column_names:
        col = tbl.column(name)
        if pa.types.is_decimal(col.type):
            out[name] = ["None" if v is None else str(v)
                         for v in col.to_pylist()]
        else:
            out[name] = col.to_pandas().astype(str).tolist()
    return out

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
    spark_tbl = con.execute(
        f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").arrow()
    if name not in oracle:
        print(f"{name:28s} NO-ORACLE rows={spark_tbl.num_rows}")
        continue
    try:
        duck_tbl = con.execute(oracle[name]).arrow()
    except Exception as e:
        print(f"{name:28s} ORACLE-SQL-ERROR {e}")
        fails += 1
        continue
    acols = sorted(spark_tbl.column_names)
    bcols = sorted(duck_tbl.column_names)
    if acols != bcols:
        print(f"{name:28s} SCHEMA-MISMATCH spark={acols} duck={bcols}")
        fails += 1
        continue
    if spark_tbl.num_rows != duck_tbl.num_rows:
        print(f"{name:28s} ROWCOUNT-MISMATCH spark={spark_tbl.num_rows} duck={duck_tbl.num_rows}")
        fails += 1
        continue
    astr = columns_as_strings(spark_tbl)
    bstr = columns_as_strings(duck_tbl)
    sa = [[astr[c][i] for c in acols] for i in range(spark_tbl.num_rows)]
    sb = [[bstr[c][i] for c in bcols] for i in range(duck_tbl.num_rows)]
    if sa != sb:
        bad = [(i, ra, rb) for i, (ra, rb) in enumerate(zip(sa, sb)) if ra != rb]
        print(f"{name:28s} VALUE-MISMATCH {len(bad)}/{len(sa)} rows, first: {bad[:3]}")
        fails += 1
        continue
    print(f"{name:28s} OK rows={spark_tbl.num_rows}")
print(f"\n{'FAIL' if fails else 'PASS'}: {len(names)-fails}/{len(names)} queries match")
sys.exit(1 if fails else 0)
