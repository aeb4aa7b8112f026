"""Local mimic of the driver's correctness gate: run every queries() entry
at sf0.01, run its oracle_sql() in DuckDB over the registered views, and
compare row count, column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    unknown = only - set(qs)
    if unknown:
        # a typoed filter must not run zero queries and report all-green
        print(f"unknown query names: {sorted(unknown)}", file=sys.stderr)
        return 2
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append((name, f"RAY ERROR: {type(e).__name__}: {e}"))
            print(f"[FAIL-run ] {name}: {e}")
            continue
        if name not in oracles:
            print(f"[rows-only] {name}: {len(got)} rows, cols={list(got.columns)}")
            continue
        try:
            want = canon(con.execute(oracles[name]).df())
        except Exception as e:
            failures.append((name, f"SQL ERROR: {e}"))
            print(f"[FAIL-sql ] {name}: {e}")
            continue
        if list(got.columns) != list(want.columns):
            failures.append((name, f"columns {list(got.columns)} != {list(want.columns)}"))
            print(f"[FAIL-cols] {name}: {list(got.columns)} vs {list(want.columns)}")
            continue
        if len(got) != len(want):
            failures.append((name, f"rows {len(got)} != {len(want)}"))
            print(f"[FAIL-rows] {name}: {len(got)} vs {len(want)}")
            continue
        if not got.equals(want):
            detail = got.compare(want).head(3) if got.shape == want.shape else "shape"
            failures.append((name, f"values differ:\n{detail}"))
            print(f"[FAIL-vals] {name}:\n{detail}")
            continue
        print(f"[OK       ] {name}: {len(got)} rows")

    ray.shutdown()
    if failures:
        print(f"\n{len(failures)} FAILURES: {[n for n, _ in failures]}")
        sys.exit(1)
    print("\nall checks passed")


if __name__ == "__main__":
    sys.exit(main())
