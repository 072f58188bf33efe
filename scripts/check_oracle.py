#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: check_oracle.py SFDIR OUTDIR [query ...]
Reads OUTDIR/<q>/ parquet (written by graft.Verify) and OUTDIR/oracle_sql.json,
runs each oracle in DuckDB over SFDIR's tables, and compares values after
sorting columns by name and rows by all columns — the driver's hash contract.
"""
import json, sys, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracles = json.load(open(f"{outdir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"{name}: NO SPARK OUTPUT")
        fail += 1
        continue
    spark = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetchdf()
    oracle = con.execute(sql).fetchdf()
    spark = spark.reindex(sorted(spark.columns), axis=1)
    oracle = oracle.reindex(sorted(oracle.columns), axis=1)
    if list(spark.columns) != list(oracle.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(spark.columns)} "
              f"oracle={list(oracle.columns)}")
        fail += 1
        continue
    if len(spark) != len(oracle):
        print(f"{name}: ROWS {len(spark)} vs {len(oracle)}")
        fail += 1
        continue
    sv = spark.sort_values(by=list(spark.columns)).reset_index(drop=True)
    ov = oracle.sort_values(by=list(oracle.columns)).reset_index(drop=True)
    same = True
    for c in sv.columns:
        a, b = sv[c], ov[c]
        try:
            eq = (a.astype(str) == b.astype(str)).all()
        except Exception:
            eq = False
        if not eq:
            same = False
            diff = (a.astype(str) != b.astype(str))
            i = diff.idxmax()
            print(f"{name}: VALUE MISMATCH col={c} row={i} "
                  f"spark={a[i]!r} oracle={b[i]!r}")
            break
    if same:
        print(f"{name}: OK ({len(spark)} rows)")
    else:
        fail += 1
sys.exit(1 if fail else 0)
