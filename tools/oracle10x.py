#!/usr/bin/env python3
"""Scale-oracle runner: driver_check semantics over a 10x (or any) layout,
emitting a CORRECTNESS-shaped JSON artifact.

The standing sf0.01 oracle cannot see scale-dependent wrongness
(overflow, non-ANSI div/null divergence, precision loss) — the only
post-green correctness bugs ever found (abc share BIGINT overflow,
acf_hourly moments) were exactly this class, caught by sweeps by luck.
This script makes the 10x check a standing gate: same canon/col_equal
as tools/driver_check.py (pandas read_parquet vs duckdb fetchdf, columns
sorted by name, rows sorted by all columns, dtype-aware exact compare),
but with directory-of-parts parquet layouts (the TenX mirror writes
part files) and JSON output.

Usage: python3 tools/oracle10x.py <sfDir> <verifyOutDir> <out.json> [name ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from driver_check import canon, col_equal, TABLES


def table_glob(sf_dir, t):
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        return f"{p}/*.parquet"
    return p


def main(sf_dir, out_dir, out_json, only):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_glob(sf_dir, t)}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = sorted(set(n for n in os.listdir(out_dir)
                       if os.path.isdir(f"{out_dir}/{n}")) | set(oracle))
    # an unknown `only` name is an operator error (a typo would
    # silently skip the key the caller meant to gate on), not a no-op
    if only:
        unknown = sorted(only - set(names))
        if unknown:
            sys.exit(f"unknown key(s) in only-list: {', '.join(unknown)}")
    results = {}
    n_ok = n_bad = n_rows_only = 0
    for name in names:
        if only and name not in only:
            continue
        r = {"rows_match": False, "schema_match": False, "hash_match": False,
             "spark_rows": None, "oracle_rows": None, "err": None}
        results[name] = r
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            r["err"] = "no spark parquet dump"
            n_bad += 1
            print(f"MISSING {name}", flush=True)
            continue
        try:
            sdf = canon(pd.concat([pd.read_parquet(f) for f in files]))
        except Exception as e:
            r["err"] = f"spark side: {type(e).__name__}: {e}"
            n_bad += 1
            print(f"ERR    {name}: {r['err']}", flush=True)
            continue
        r["spark_rows"] = len(sdf)
        if name not in oracle:
            # rows-only key (non-SQL-expressible) — a ZERO-row dump is
            # a failure (an empty result passes no check at all), not
            # a weaker pass (r15 ADVICE item 5)
            r["rows_match"] = len(sdf) > 0
            if r["rows_match"]:
                r["err"] = "rows-only (no oracle sql)"
                n_rows_only += 1
                print(f"rows   {name}: {len(sdf)} rows (rows-only)", flush=True)
            else:
                r["err"] = "rows-only key with EMPTY dump"
                n_bad += 1
                print(f"EMPTY  {name}: rows-only key dumped 0 rows", flush=True)
            continue
        try:
            odf = canon(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            r["err"] = f"oracle side: {type(e).__name__}: {e}"
            n_bad += 1
            print(f"ERR    {name}: {r['err']}", flush=True)
            continue
        r["oracle_rows"] = len(odf)
        r["schema_match"] = (sorted(c.lower() for c in sdf.columns)
                             == sorted(c.lower() for c in odf.columns))
        r["rows_match"] = len(sdf) == len(odf)
        if not r["schema_match"]:
            r["err"] = f"schema: spark={list(sdf.columns)} oracle={list(odf.columns)}"
            n_bad += 1
            print(f"SCHEMA {name}: {r['err']}", flush=True)
            continue
        if not r["rows_match"]:
            r["err"] = f"rows: spark={len(sdf)} oracle={len(odf)}"
            n_bad += 1
            print(f"ROWS   {name}: spark={len(sdf)} oracle={len(odf)}", flush=True)
            continue
        bad_cols = []
        for c in sdf.columns:
            if not col_equal(sdf[c], odf[c]):
                i = next((j for j in range(len(sdf))
                          if not col_equal(sdf[c].iloc[j:j + 1].reset_index(drop=True),
                                           odf[c].iloc[j:j + 1].reset_index(drop=True))), 0)
                bad_cols.append(
                    f"{c} ({sdf[c].dtype} vs {odf[c].dtype}; "
                    f"row{i}: {sdf[c].iloc[i]!r} vs {odf[c].iloc[i]!r})")
        if bad_cols:
            r["err"] = "values: " + "; ".join(bad_cols)
            n_bad += 1
            print(f"VALUES {name}: {r['err'][:300]}", flush=True)
        else:
            r["hash_match"] = True
            n_ok += 1
            print(f"OK     {name} ({len(sdf)} rows)", flush=True)
    summary = {"sf_dir": sf_dir, "keys": len(results), "ok": n_ok,
               "rows_only": n_rows_only, "bad": n_bad}
    with open(out_json, "w") as f:
        json.dump({"summary": summary, "results": results}, f, indent=1, sort_keys=True)
    print(f"== {n_ok} ok, {n_rows_only} rows-only, {n_bad} bad -> {out_json}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], set(sys.argv[4:]))
