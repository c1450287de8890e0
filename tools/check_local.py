#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads the Verify.scala output dir (per-query parquet + oracle_sql.json),
runs each oracle in DuckDB against the same sf tables, and compares:
column names (sorted), row counts, and values (rows sorted by all columns).

Usage: python3 tools/check_local.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # stringify for stable total ordering incl. NULLs / lists
    s = df.astype(str)
    order = s.sort_values(by=list(s.columns)).index
    return df.loc[order].reset_index(drop=True)


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = duckdb.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            failures += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        g_s, w_s = g.astype(str), w.astype(str)
        if not g_s.equals(w_s):
            diff = (g_s != w_s).any(axis=1)
            idx = diff[diff].index[:3]
            print(f"FAIL {name}: {int(diff.sum())}/{len(g)} rows differ; first diffs:")
            for i in idx:
                print(f"  spark: {g.loc[i].to_dict()}")
                print(f"  duck : {w.loc[i].to_dict()}")
            failures += 1
            continue
        print(f"OK   {name}: {len(g)} rows")
    extra = [k for k in oracles if k not in oracles]  # placeholder symmetry
    print(f"\n{len(oracles) - failures}/{len(oracles)} oracle-checked queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
