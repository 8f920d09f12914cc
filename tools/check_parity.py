"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` side by side on one sf dir
and compare row count, column names, and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(result) -> pd.DataFrame:
    try:
        import ray.data as rd
        if isinstance(result, rd.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    import pyarrow as pa
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        import os
        ray.init(address="local",
                 num_cpus=int(os.environ.get("PARITY_CPUS", "16")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows] {name}: {len(got)} rows, cols={list(got.columns)} ({dt:.1f}s)")
            continue
        want = canon(con.sql(sql).df())
        status = "OK"
        detail = ""
        if list(got.columns) != list(want.columns):
            status, detail = "FAIL", f"cols {list(got.columns)} vs {list(want.columns)}"
        elif len(got) != len(want):
            status, detail = "FAIL", f"rows {len(got)} vs {len(want)}"
        else:
            try:
                pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                              check_exact=True)
            except AssertionError as ex:
                status, detail = "FAIL", str(ex).split("\n")[0:3].__repr__()
        if status == "FAIL":
            failures += 1
            print(f"[FAIL] {name}: {detail} ({dt:.1f}s)")
        else:
            print(f"[ OK ] {name}: {len(got)} rows ({dt:.1f}s)")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
