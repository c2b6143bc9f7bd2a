#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracles (dev tool, mirrors the driver):
runs DuckDB on each oracle_sql.json entry against the same parquet tables and
compares with the Spark parquet dumps written by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json
import math
import sys

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    return str(a) == str(b)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    # big-SF probes: bound DuckDB's spill so a quadratic oracle recompute
    # can't fill the disk out from under the concurrently-running engine
    import os
    if os.environ.get("DUCKDB_MEM_LIMIT"):
        con.sql(f"SET memory_limit = '{os.environ['DUCKDB_MEM_LIMIT']}'")
    if os.environ.get("DUCKDB_TMP_DIR"):
        con.sql(f"SET temp_directory = '{os.environ['DUCKDB_TMP_DIR']}'")
        con.sql("SET max_temp_directory_size = '20GiB'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            expect = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_bad += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out_dir}/{name}"))
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_bad += 1
            continue
        if list(got.columns) != list(expect.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(expect.columns)}")
            n_bad += 1
            continue
        dt_mismatch = [
            (c, str(got[c].dtype), str(expect[c].dtype))
            for c in got.columns if str(got[c].dtype) != str(expect[c].dtype)]
        if dt_mismatch:
            print(f"WARN {name}: dtypes differ: {dt_mismatch}")
        if len(got) != len(expect):
            print(f"FAIL {name}: rows {len(got)} != {len(expect)}")
            n_bad += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not cells_equal(got[c].iloc[i], expect[c].iloc[i]):
                    bad = (i, c, got[c].iloc[i], expect[c].iloc[i])
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
