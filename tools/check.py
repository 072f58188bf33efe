#!/usr/bin/env python3
"""Local emulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Registers each testdata parquet as a DuckDB view, runs every SQL in
<verifyOutDir>/oracle_sql.json, and compares with the Spark parquet the
engine wrote. Mirrors the documented comparator: sort columns by name,
sort rows, hash values. Exact comparison (no float tolerance) so we see
the worst case.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"[MISS] {name}: no spark output"); fail += 1; continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}"); fail += 1; continue
        got = canon(con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df())
        if list(exp.columns) != list(got.columns):
            print(f"[COLS] {name}: oracle={list(exp.columns)} spark={list(got.columns)}")
            fail += 1; continue
        if len(exp) != len(got):
            print(f"[ROWS] {name}: oracle={len(exp)} spark={len(got)}"); fail += 1; continue
        # dtype-kind parity first: the driver hashes typed values, so a
        # DuckDB HUGEINT (-> float64/object in pandas) vs Spark int64
        # hash-diverges even when every value is numerically identical.
        # Python's == hides that (10195100 == 10195100.0), so catch the
        # representation mismatch explicitly.
        kindbad = [c for c in exp.columns
                   if got[c].dtype.kind in "iu" and exp[c].dtype.kind not in "iu"]
        if kindbad:
            print(f"[DTYPE] {name}: spark integral but oracle "
                  f"{[(c, str(exp[c].dtype)) for c in kindbad]} — wrap the "
                  f"oracle aggregate in CAST(... AS BIGINT)")
            fail += 1; continue
        # exact value compare, column by column
        bad = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            try:
                same = (e.astype(object).where(pd.notnull(e), None).tolist() ==
                        g.astype(object).where(pd.notnull(g), None).tolist())
            except Exception:
                same = False
            if not same:
                bad.append(c)
        if bad:
            print(f"[VAL] {name}: mismatched cols {bad}")
            for c in bad[:3]:
                merged = pd.DataFrame({"oracle": exp[c], "spark": got[c]})
                diff = merged[merged.oracle != merged.spark]
                print(diff.head(5).to_string())
            fail += 1
        else:
            print(f"[OK] {name} ({len(exp)} rows)"); ok += 1
    # rows-only entries (queries without oracle)
    for d in sorted(glob.glob(f"{outdir}/*/")):
        nm = d.rstrip("/").split("/")[-1]
        if nm not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{d}*.parquet'").fetchone()[0]
            print(f"[ROWS-ONLY] {nm}: {n} rows")
    print(f"\n{ok} ok, {fail} failed")
    return 1 if fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
