#!/usr/bin/env python3
"""Driver-faithful correctness pre-check.

oracle_check.py reads the Spark parquet back THROUGH DuckDB, which
normalizes both sides through one type system and hides exactly the
mismatches the driver's comparator sees (round-1 lesson: DECIMAL(38,x)
parquet -> pandas Decimal objects vs DuckDB fetchdf float64; HUGEINT ->
float64; ndarray cells crash sort_values). This script mirrors the
driver: Spark side via pandas.read_parquet (pyarrow dtypes), oracle
side via duckdb fetchdf, columns sorted by name, rows sorted by all
columns, then dtype-aware exact comparison.

Usage: python3 tools/driver_check.py <sfDir> <verifyOutDir> [name ...]
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df):
    # lowercase before sorting so case-differing names cannot reorder
    # the row-sort keys differently on the two sides
    df = df.rename(columns={c: c.lower() for c in df.columns})
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        # same call shape as the driver's traceback (sort_values over all
        # columns) so ndarray cells crash here too, not only in the round
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def col_equal(s, o):
    sk, ok = s.dtype.kind, o.dtype.kind
    if sk in "mM" and ok in "mM":
        a = s.to_numpy("datetime64[ns]")
        b = o.to_numpy("datetime64[ns]")
        # NaT != NaT under ==, so mask symmetrically (mirrors the NaN
        # handling on float columns): legit null timestamps on both
        # sides (e.g. an outer-join miss) must compare equal
        nat = np.isnat(a) & np.isnat(b)
        return bool((nat | (~np.isnat(a) & ~np.isnat(b) & (a == b))).all())
    if sk != ok:
        return False
    if sk == "f":
        a, b = s.to_numpy(), o.to_numpy()
        return bool(((a == b) | (np.isnan(a) & np.isnan(b))).all())
    if sk in "iub":
        return np.array_equal(s.to_numpy(), o.to_numpy())
    for a, b in zip(s, o):
        a_null = a is None or (isinstance(a, float) and np.isnan(a))
        b_null = b is None or (isinstance(b, float) and np.isnan(b))
        if a_null and b_null:
            continue
        if a_null != b_null or type(a).__name__ != type(b).__name__ or a != b:
            return False
    return True


def main(sf_dir, out_dir, only):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # union of dumped dirs AND oracle keys: a query whose dump dir is
    # missing entirely (Verify crashed/skipped it) must count as bad,
    # not be silently skipped
    names = sorted(set(n for n in os.listdir(out_dir)
                       if os.path.isdir(f"{out_dir}/{n}")) | set(oracle))
    for name in names:
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING {name}: no spark parquet dump")
            n_bad += 1
            continue
        try:
            sdf = canon(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            print(f"ERR    {name}: spark side: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if name not in oracle:
            print(f"rows   {name}: {len(sdf)} rows, no oracle (rows-only)")
            continue
        try:
            odf = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"ERR    {name}: oracle side: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if sorted(c.lower() for c in sdf.columns) != sorted(c.lower() for c in odf.columns):
            print(f"SCHEMA {name}: spark={list(sdf.columns)} oracle={list(odf.columns)}")
            n_bad += 1
            continue
        if len(sdf) != len(odf):
            print(f"ROWS   {name}: spark={len(sdf)} oracle={len(odf)}")
            n_bad += 1
            continue
        bad_cols = []
        for c in sdf.columns:
            oc = c
            if not col_equal(sdf[c], odf[oc]):
                i = next((j for j in range(len(sdf))
                          if not col_equal(sdf[c].iloc[j:j + 1].reset_index(drop=True),
                                           odf[oc].iloc[j:j + 1].reset_index(drop=True))), 0)
                bad_cols.append(
                    f"{c} ({sdf[c].dtype} vs {odf[oc].dtype}; "
                    f"row{i}: {sdf[c].iloc[i]!r} vs {odf[oc].iloc[i]!r})")
        if bad_cols:
            print(f"VALUES {name}: {'; '.join(bad_cols)}")
            n_bad += 1
        else:
            print(f"OK     {name} ({len(sdf)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], set(sys.argv[3:]))
