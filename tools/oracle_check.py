#!/usr/bin/env python3
"""Mimic the driver's correctness gate: for each query dumped by
graft.Verify, run the DuckDB oracle SQL on the same parquet tables and
compare row count, column names/types, and all values.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_df = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            failures += 1
            continue
        try:
            oracle_df = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failures += 1
            continue
        spark_df = spark_df[sorted(spark_df.columns)]
        oracle_df = oracle_df[sorted(oracle_df.columns)]
        if list(spark_df.columns) != list(oracle_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} != "
                  f"{list(oracle_df.columns)}")
            failures += 1
            continue
        if len(spark_df) != len(oracle_df):
            print(f"FAIL {name}: rows {len(spark_df)} != {len(oracle_df)}")
            failures += 1
            continue
        mismatched = []
        for c in spark_df.columns:
            a, b = spark_df[c], oracle_df[c]
            eq = a.reset_index(drop=True).eq(b.reset_index(drop=True)) | (
                a.isna().reset_index(drop=True) & b.isna().reset_index(drop=True))
            if not bool(eq.all()):
                bad = (~eq).idxmax()
                mismatched.append(
                    f"{c}[row {bad}]: spark={a.iloc[bad]!r} oracle={b.iloc[bad]!r}")
        if mismatched:
            print(f"FAIL {name}: " + "; ".join(mismatched[:3]))
            failures += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows, "
                  f"{len(spark_df.columns)} cols)")
    queries_without_oracle = set()  # informational only
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracles)} oracles)")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
