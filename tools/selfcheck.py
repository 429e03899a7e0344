#!/usr/bin/env python3
"""Dev-only oracle parity check, mimicking the driver's t2 gate:
run graft.Verify first (sbt 'runMain graft.Verify <sfDir> <outDir>'),
then: python3 tools/selfcheck.py <sfDir> <outDir>

Compares each <outDir>/<name> parquet result against DuckDB running
oracle_sql.json over the sfDir parquet tables: columns sorted by name,
rows sorted, values hashed. NOT part of the shipped library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize numeric-ish types for stable compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(lambda v: str(v) if v is not None else None)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        res_path = f"{out_dir}/{name}"
        if not os.path.isdir(res_path):
            print(f"MISSING  {name} (no spark result)"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{res_path}/*.parquet"))], ignore_index=True)
            duck_df = con.execute(sql).fetch_df()
            a, b = canon(spark_df), canon(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL     {name}: columns {list(a.columns)} vs {list(b.columns)}"); n_fail += 1; continue
            if len(a) != len(b):
                print(f"FAIL     {name}: rows {len(a)} vs {len(b)}"); n_fail += 1; continue
            eq = a.astype(str).equals(b.astype(str))
            if eq:
                print(f"PASS     {name} ({len(a)} rows)"); n_pass += 1
            else:
                diff = (a.astype(str) != b.astype(str)).any(axis=1)
                print(f"FAIL     {name}: value mismatch in {int(diff.sum())}/{len(a)} rows")
                print(a[diff].head(3).to_string())
                print(b[diff].head(3).to_string())
                n_fail += 1
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    # optional 3rd arg: comma-separated query-name subset
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
