#!/usr/bin/env python3
"""Dev-side oracle pre-check (NOT part of the library; mirrors the
driver's DuckDB comparison so oracle mismatches are caught before a
round ends).

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json, registers the sf tables as DuckDB
views, runs each oracle SQL, and compares against the Spark parquet in
<verifyOutDir>/<name>/ — column-name-sorted, row-order-insensitive,
exact values.
"""
import sys, json, glob, os
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(con, rel_sql, label):
    df = con.execute(rel_sql).fetchdf()
    df = df.reindex(sorted(df.columns), axis=1)
    rows = sorted(df.itertuples(index=False, name=None), key=lambda r: tuple(str(x) for x in r))
    return list(df.columns), rows

def _row_eq(a, b):
    # driver hashes str(value) — mirror exactly (NaN==NaN included).
    # No `x == y` short-circuit: value-equal-but-str-different pairs
    # (numpy 1 vs 1.0, Decimal('1.50') vs 1.5) would false-OK here yet
    # fail the driver's hash compare, and `bool(x == y)` raises on
    # numpy-array-valued cells.
    return all(str(x) == str(y) for x, y in zip(a, b))

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"MISSING spark output: {name}")
            n_bad += 1
            continue
        try:
            scols, srows = canon(con, f"SELECT * FROM read_parquet('{spark_glob}')", name)
            ocols, orows = canon(con, sql, name)
        except Exception as e:
            print(f"ERROR  {name}: {e}")
            n_bad += 1
            continue
        if [c.lower() for c in scols] != [c.lower() for c in ocols]:
            print(f"SCHEMA {name}: spark={scols} oracle={ocols}")
            n_bad += 1
        elif len(srows) != len(orows):
            print(f"ROWS   {name}: spark={len(srows)} oracle={len(orows)}")
            n_bad += 1
        elif not all(_row_eq(a, b) for a, b in zip(srows, orows)):
            diffs = [(a, b) for a, b in zip(srows, orows) if not _row_eq(a, b)][:3]
            print(f"VALUES {name}: first diffs {diffs}")
            n_bad += 1
        else:
            print(f"OK     {name} ({len(srows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
