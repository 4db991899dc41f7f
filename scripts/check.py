#!/usr/bin/env python3
"""Local dev-loop oracle check (mimics the driver's DuckDB compare).

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
    python3 scripts/check.py <sfDir> <outDir>

For each query: load our parquet output and the DuckDB result of the
oracle SQL, sort columns by name, sort rows, compare values.
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir: str, out_dir: str) -> None:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = norm(pd.concat([pd.read_parquet(f) for f in files]))
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_fail += 1; continue
        # exact value compare after normalizing dtypes via astype(str)-free equality
        try:
            eq = got.reset_index(drop=True).equals(want.reset_index(drop=True))
            if not eq:
                # retry with tolerant compare for dtype mismatches (e.g. int32 vs int64)
                eq = (got.astype(str).reset_index(drop=True)
                      .equals(want.astype(str).reset_index(drop=True)))
        except Exception as e:
            print(f"FAIL {name}: compare error {e}"); n_fail += 1; continue
        if eq:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
        else:
            diff = (got != want) & ~(got.isna() & want.isna())
            bad = diff.any(axis=1)
            print(f"FAIL {name}: value mismatch; first diffs:")
            print(pd.concat([got[bad].head(3).add_suffix("_got"),
                             want[bad].head(3).add_suffix("_want")], axis=1))
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
