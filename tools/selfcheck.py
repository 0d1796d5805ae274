#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(writes <outDir>/<query>/ parquet + oracle_sql.json), then this script
re-runs every oracle SQL in DuckDB over the same sf tables and compares
rows strictly (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(t)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for q in sorted(os.listdir(outdir)):
    qdir = os.path.join(outdir, q)
    if not os.path.isdir(qdir):
        continue
    if only and q not in only:
        continue
    spark_rel = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
    if q not in oracle:
        print(f"{q:28s} NO_ORACLE rows={spark_rel.shape[0]}")
        continue
    ora_rel = con.sql(oracle[q])
    scols = sorted(spark_rel.columns)
    ocols = sorted(ora_rel.columns)
    schema_ok = scols == ocols
    def qcol(c):
        return '"' + c + '"'
    scol_sql = ", ".join(qcol(c) for c in scols)
    ocol_sql = ", ".join(qcol(c) for c in ocols)
    srows = con.sql(
        f"SELECT {scol_sql} FROM spark_rel ORDER BY ALL").fetchall() if schema_ok else None
    orows = con.sql(
        f"SELECT {ocol_sql} FROM ora_rel ORDER BY ALL").fetchall() if schema_ok else None
    rows_ok = schema_ok and len(srows) == len(orows)
    vals_ok = schema_ok and srows == orows
    status = "OK" if (schema_ok and rows_ok and vals_ok) else "FAIL"
    if status == "FAIL":
        fails += 1
    print(f"{q:28s} {status} schema={schema_ok} rows={rows_ok} values={vals_ok} "
          f"n={spark_rel.shape[0]}")
    if status == "FAIL" and schema_ok:
        for i, (a, b) in enumerate(zip(srows, orows)):
            if a != b:
                print(f"   first diff row {i}:\n   spark : {a}\n   oracle: {b}")
                break
        if len(srows) != len(orows):
            print(f"   row count spark={len(srows)} oracle={len(orows)}")
    elif status == "FAIL":
        print(f"   columns spark={scols}\n   columns oracle={ocols}")
# a query with an oracle but NO parquet dir means graft.Verify caught an
# exception for it — surface that loudly instead of silently skipping
for q in sorted(oracle):
    if (not only or q in only) and not os.path.isdir(os.path.join(outdir, q)):
        print(f"{q:28s} MISSING (Verify produced no output dir)")
        fails += 1
sys.exit(1 if fails else 0)
