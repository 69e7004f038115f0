#!/usr/bin/env python3
"""Dev-only local mimic of the driver's correctness gate.

Runs each oracle_sql.json query in DuckDB over the sf parquet tables and
compares (schema-insensitively: columns sorted by name, rows sorted by all
columns) against the Spark parquet dumps produced by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize value representation
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            if getattr(df[c].dtype, "tz", None) is not None:
                df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) or
                str(type(v)).find("ndarray") >= 0 else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.map(str))
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"MISSING  {name}: no spark output"); n_bad += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in spark_files]))
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"ERROR    {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} duck={list(want.columns)}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"ROWCOUNT {name}: spark={len(got)} duck={len(want)}")
            n_bad += 1; continue
        eq = got.equals(want)
        if not eq:
            # tolerate dtype-only differences by comparing stringified values
            eq = got.astype(str).equals(want.astype(str))
            tag = "OK*str" if eq else "VALUES"
            if not eq:
                diff = (got.astype(str) != want.astype(str))
                bad_cols = [c for c in got.columns if diff[c].any()]
                idx = diff.any(axis=1)
                print(f"VALUES   {name}: cols={bad_cols}")
                print("  spark:", got[idx].head(3).to_dict("records"))
                print("  duck :", want[idx].head(3).to_dict("records"))
                n_bad += 1; continue
        print(f"OK       {name} ({len(got)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
