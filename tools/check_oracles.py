"""Local stand-in for the driver's correctness gate: run every
queries() entry and its oracle_sql() side by side, compare row count,
column names, and order-insensitive values (floats rounded).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res):
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    import logging

    import ray
    import ray.data as rd
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 8)),
             include_dashboard=False, logging_level="ERROR")
    rd.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.CRITICAL)

    import __ray_entry__ as e
    qs, sqls = e.queries(), e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    import time
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        t1 = time.perf_counter()
        if name not in sqls:
            print(f"[rows-only] {name}: {len(mine)} rows  ray={t1-t0:.1f}s")
            continue
        try:
            oracle = canon(con.sql(sqls[name]).df())
        except Exception as ex:
            print(f"[FAIL] {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        t2 = time.perf_counter()
        ok_rows = len(mine) == len(oracle)
        ok_cols = list(mine.columns) == list(oracle.columns)
        ok_vals = ok_rows and ok_cols and mine.equals(oracle)
        if not ok_vals and ok_rows and ok_cols:
            # allow float jitter at the rounding boundary
            close = True
            for c in mine.columns:
                a, b = mine[c], oracle[c]
                if np.issubdtype(a.dtype, np.floating):
                    if not np.allclose(a, b, atol=2e-6, equal_nan=True):
                        close = False
                elif not a.equals(b):
                    close = False
            ok_vals = close
        status = "OK  " if (ok_rows and ok_cols and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"[{status}] {name}: rows {len(mine)}/{len(oracle)} cols={ok_cols} "
              f"vals={ok_vals}  ray={t1-t0:.1f}s sql={t2-t1:.1f}s")
        if status == "FAIL" and ok_cols and ok_rows:
            diff = (mine != oracle).any(axis=1)
            print("  first diffs:\n", mine[diff].head(3), "\n  vs\n", oracle[diff].head(3))
        elif status == "FAIL":
            print("  mine cols:", list(mine.columns), "oracle cols:", list(oracle.columns))
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
