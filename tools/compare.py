#!/usr/bin/env python3
"""Local oracle-parity harness: mimic the driver's DuckDB compare.

Usage: python3 tools/compare.py <sfdir> <verify_out_dir>

For each query in <verify_out_dir>/oracle_sql.json: run the SQL in DuckDB
(with views over the sf parquet tables), load the Spark parquet result,
sort columns by name, sort rows, and compare values exactly.
"""
import json, sys, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(('int', 'uint')):
            df[c] = df[c].astype('int64')
        elif str(df[c].dtype).startswith('float'):
            df[c] = df[c].astype('float64')
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sfdir: str, outdir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sfdir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    all_queries = sorted(
        os.path.basename(d) for d in glob.glob(os.path.join(outdir, "*")) if os.path.isdir(d))
    for name in all_queries:
        spark_files = glob.glob(os.path.join(outdir, name, "*.parquet"))
        if not spark_files:
            print(f"NOROWS?  {name}: no spark parquet output")
            n_fail += 1
            continue
        sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
        if name not in oracle:
            print(f"ROWSONLY {name}: {len(sdf)} rows (no oracle)")
            continue
        try:
            odf = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ORAFAIL  {name}: {str(e)[:200]}")
            n_fail += 1
            continue
        s, o = canon(sdf), canon(odf)
        if list(s.columns) != list(o.columns):
            print(f"SCHEMA   {name}: spark={list(s.columns)} oracle={list(o.columns)}")
            n_fail += 1
        elif len(s) != len(o):
            print(f"ROWCOUNT {name}: spark={len(s)} oracle={len(o)}")
            n_fail += 1
        elif not s.equals(o):
            neq = (s != o) & ~(s.isna() & o.isna())
            bad_cols = [c for c in s.columns if neq[c].any()]
            idx = neq.any(axis=1)
            print(f"VALUES   {name}: {int(idx.sum())}/{len(s)} rows differ, cols={bad_cols}")
            ex = s[idx].head(3)
            eo = o[idx].head(3)
            print("  spark:", ex.to_dict("records"))
            print("  oracle:", eo.to_dict("records"))
            n_fail += 1
        else:
            print(f"PASS     {name}: {len(s)} rows")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, "
          f"{len(all_queries) - n_pass - n_fail} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
