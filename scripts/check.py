#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result written by graft.Verify,
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
sf tables, sorts columns by name and rows by all columns, and compares.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # unify timestamp resolutions (spark µs vs duckdb ns)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        a, b = norm(spark_df), norm(duck_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(a.columns)} duck={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(a)} duck={len(b)}"
            continue
        bad = None
        for c in a.columns:
            av, bv = a[c].values, b[c].values
            # driver parity: the driver hashes TYPED values, so an int
            # column vs a float column (e.g. DuckDB HUGEINT -> float64)
            # fails its gate even when every value matches numerically.
            # Flag the dtype divergence instead of silently coercing.
            if av.dtype.kind != bv.dtype.kind and \
               {av.dtype.kind, bv.dtype.kind} & {"f"} and \
               {av.dtype.kind, bv.dtype.kind} & {"i", "u"}:
                bad = f"col {c}: DTYPE spark={av.dtype} duck={bv.dtype} (driver hashes typed values)"
                break
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                av = av.astype(float); bv = bv.astype(float)
                both_nan = np.isnan(av) & np.isnan(bv)
                neq = ~both_nan & (av != bv)
                if neq.any():
                    i = int(np.argmax(neq))
                    bad = f"col {c}: row {i} spark={av[i]!r} duck={bv[i]!r} (maxdiff={np.nanmax(np.abs(av-bv))})"
                    break
            else:
                eq = (pd.Series(av).astype(object).where(pd.notna(av), None)
                      == pd.Series(bv).astype(object).where(pd.notna(bv), None))
                nulls = pd.isna(pd.Series(av)) & pd.isna(pd.Series(bv))
                neq = ~(eq | nulls)
                if neq.any():
                    i = int(neq.idxmax())
                    bad = f"col {c}: row {i} spark={av[i]!r} duck={bv[i]!r}"
                    break
        results[name] = "OK rows=%d" % len(a) if bad is None else f"VALUE_MISMATCH {bad}"
    width = max(len(n) for n in results) if results else 10
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for name in sorted(results):
        print(f"{name:<{width}}  {results[name]}")
    print(f"\n{n_ok}/{len(results)} pass")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
