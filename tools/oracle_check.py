#!/usr/bin/env python3
"""Mimic the driver's correctness gate STRICTLY: for each query dumped by
graft.Verify, run the DuckDB oracle SQL on the same parquet tables and
compare row count, column names, and canonical string renderings of every
value. The Spark side is read via pyarrow (like the driver), NOT via
DuckDB — so type-representation drift (e.g. parquet DECIMAL -> python
Decimal('3.50') vs DuckDB fetch -> float 3.5) is caught here instead of
in the driver's hash compare.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir>
"""
import glob
import json
import math
import sys
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v) -> str:
    """Canonical string for a cell value, NaN/None-safe."""
    if v is None:
        return "<null>"
    if isinstance(v, float):
        return "<null>" if math.isnan(v) else repr(v)
    if isinstance(v, np.floating):
        f = float(v)
        return "<null>" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (bytes, bytearray)):
        return "0x" + bytes(v).hex()
    if isinstance(v, Decimal):
        return str(v)  # keeps scale: Decimal('3.50') -> '3.50'
    if isinstance(v, np.ndarray):
        return "[" + ",".join(canon(x) for x in v.tolist()) + "]"
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if v is pd.NaT:
        return "<null>"
    return str(v)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # a SPARK_GRAFT_VERIFY_ONLY run writes oracle_sql.partial.json so a
    # full-gate comparison can never silently consume a filtered manifest.
    # When BOTH manifests exist (a subset rerun into a previously-used
    # out_dir), the NEWER one reflects the latest Verify run — silently
    # preferring a stale full manifest would re-greenlight stale parquet
    # and check edited oracles against old SQL.
    import os
    full = f"{out_dir}/oracle_sql.json"
    partial = f"{out_dir}/oracle_sql.partial.json"
    candidates = [p for p in (full, partial) if os.path.exists(p)]
    if not candidates:
        print(f"FAIL: no oracle manifest in {out_dir}")
        return 1
    manifest = max(candidates, key=os.path.getmtime)
    is_partial = manifest == partial
    if is_partial:
        print(f"NOTE: using PARTIAL manifest {manifest} — subset run only"
              + (" (newer than the stale full manifest)" if len(candidates) == 2 else ""))
    with open(manifest) as f:
        oracles = json.load(f)
    failures = 0
    for name, sql in sorted(oracles.items()):
        try:
            files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            spark_df = pd.concat(
                [pd.read_parquet(p) for p in files], ignore_index=True)
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
            a = [canon(v) for v in spark_df[c]]
            b = [canon(v) for v in oracle_df[c]]
            if a != b:
                bad = next(i for i in range(len(a)) if a[i] != b[i])
                mismatched.append(
                    f"{c}[row {bad}]: spark={a[bad]!r} oracle={b[bad]!r}")
        if mismatched:
            print(f"FAIL {name}: " + "; ".join(mismatched[:3]))
            failures += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows, "
                  f"{len(spark_df.columns)} cols)")
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(oracles)} oracles)"
          + (" [PARTIAL — subset gate only]" if is_partial else ""))
    if failures:
        return 1
    # a green SUBSET is not a green GATE: exit 2 unless the caller
    # explicitly opted into a partial manifest, so automation keyed on
    # the exit code can never read a filtered run as full coverage
    import os
    if is_partial and os.environ.get("ORACLE_CHECK_ALLOW_PARTIAL", "") != "1":
        print("EXIT 2: partial manifest without ORACLE_CHECK_ALLOW_PARTIAL=1 "
              "(subset passed, but this is not the full gate)")
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
