"""Local simulation of the driver's correctness gate: run every
``queries()`` entry at a given sf and compare row-count + schema +
order-insensitive value hash against ``oracle_sql()`` via DuckDB.

Usage: python tools/check_oracle.py [sf_dir] [only_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def to_pandas(res) -> pd.DataFrame:
    if hasattr(res, "to_pandas"):
        try:
            return res.to_pandas()
        except TypeError:
            pass
    if isinstance(res, pd.DataFrame):
        return res
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype) == "object":
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update("|".join(f"{c}" for c in df.columns).encode())
    h.update(pd.util.hash_pandas_object(df, index=False).values.tobytes())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"ok   {name:24s} rows={len(got):7d} (rows-only) {dt:5.1f}s")
            continue
        want = canon(con.sql(sqls[name]).df())
        status = []
        if list(got.columns) != list(want.columns):
            status.append(f"schema got={list(got.columns)} want={list(want.columns)}")
        elif len(got) != len(want):
            status.append(f"rows got={len(got)} want={len(want)}")
        elif value_hash(got) != value_hash(want):
            diff = (got != want).any(axis=1)
            status.append(f"values differ in {int(diff.sum())} rows; first:\n"
                          f"GOT\n{got[diff].head(3)}\nWANT\n{want[diff].head(3)}")
        if status:
            print(f"FAIL {name}: {'; '.join(status)}")
            failures.append(name)
        else:
            print(f"ok   {name:24s} rows={len(got):7d} hash match {dt:5.1f}s")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
