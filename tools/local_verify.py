#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run `graft.Verify`
first (dumps <out>/<query>/ parquet + <out>/oracle_sql.json), then this
script replays each oracle in DuckDB over the same sf dir and compares
dtype-strictly (pandas assert_frame_equal, check_exact=True).

Usage: python3 tools/local_verify.py <sfDir> <verifyOutDir> [nameRegex]
"""
import glob
import json
import re
import sys

import duckdb
import pandas as pd
from pandas.testing import assert_frame_equal

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    pat = re.compile(sys.argv[3]) if len(sys.argv) > 3 else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name in sorted(oracles):
        if pat and not pat.search(name):
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: MISSING spark dump")
            failures += 1
            continue
        got = norm(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = norm(con.sql(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {e}")
            failures += 1
            continue
        try:
            assert_frame_equal(got, exp, check_exact=True, check_dtype=True)
            print(f"{name}: OK rows={len(got)}")
        except AssertionError as e:
            print(f"{name}: MISMATCH\n{str(e)[:2000]}")
            print("  spark:", got.head(5).to_dict("records"))
            print("  duck :", exp.head(5).to_dict("records"))
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
