#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run graft.Verify first
(writes <outDir>/<query>/ parquet + oracle_sql.json), then this script
re-runs every oracle SQL in DuckDB over the same sf tables and compares
rows strictly (columns sorted by name, rows sorted, exact values).

Usage: python3 tools/selfcheck.py [--driver] <sfDir> <verifyOutDir> [query ...]

--driver additionally mirrors the DRIVER's pandas-based, type-sensitive gate
(the strict DuckDB compare above can be green while the driver reds):
both results are loaded as pandas frames (oracle via duckdb .df(), so a
HUGEINT column widens to float64/object exactly as it does driver-side),
columns sorted by name, rows sorted with DataFrame.sort_values (which
raises TypeError on array/struct cells — the driver's q124 failure mode),
then hashed over dtype names + repr of every cell. hash_match=False with
equal values reproduces the r04 q158/q200 failure mode locally.
"""
import json, sys, glob, os, hashlib
import duckdb

args = [a for a in sys.argv[1:] if a != "--driver"]
driver_mode = "--driver" in sys.argv[1:]
sfdir, outdir = args[0], args[1]
only = set(args[2:])


def driver_gate(spark_rel, ora_rel, cols):
    """Mirror of the driver's pandas hash gate. Returns (hash_ok, err)."""
    import pandas as pd  # noqa: F401  (driver dependency, driver-side only)
    try:
        sdf = spark_rel.df()[cols]
        odf = ora_rel.df()[cols]
        # the driver sorts rows with sort_values over all columns; object
        # columns go through Categorical/factorize, which raises
        # TypeError("unhashable type") on ndarray/dict cells
        sdf = sdf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
        odf = odf.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    except TypeError as e:
        return None, f"TypeError: {e}"

    def h(df):
        # hash the VALUES (python repr after .tolist()), not the dtypes:
        # the driver's gate treats int32 and int64 the same (both repr as
        # "150" — r04 greens prove it) but flags int-vs-float widening
        # ("150" vs "150.0" — the q158/q200 HUGEINT failure mode)
        m = hashlib.md5()
        for c in cols:
            for v in df[c].tolist():
                m.update(repr(v).encode())
            m.update(b"\x00")
        return m.hexdigest()

    return h(sdf) == h(odf), None

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
    hash_ok, herr = (None, None)
    if driver_mode and schema_ok:
        hash_ok, herr = driver_gate(spark_rel, ora_rel, scols)
    status = "OK" if (schema_ok and rows_ok and vals_ok) else "FAIL"
    if driver_mode and status == "OK" and hash_ok is not True:
        status = "DRIVER_FAIL"
    if status != "OK":
        fails += 1
    hmsg = f" driver_hash={hash_ok}" if driver_mode else ""
    print(f"{q:28s} {status} schema={schema_ok} rows={rows_ok} values={vals_ok}"
          f"{hmsg} n={spark_rel.shape[0]}")
    if herr:
        print(f"   driver gate error: {herr}")
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
