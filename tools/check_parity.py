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
    if "--two-level" in sys.argv:
        return two_level(
            [a for a in sys.argv[1:] if a != "--two-level"])
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



def two_level(rest: "list[str]") -> int:
    """``--two-level [sf_dir] [out_path]``: run the FULL query set at
    num_cpus=8 and 32 in fresh subprocesses and write a combined
    PARITY artifact (the per-round deliverable — parallelism-dependent
    nondeterminism in any groupby/shuffle shows up as an 8-vs-32
    mismatch). Exit 0 only if every query passes at both levels."""
    import os
    import re
    import subprocess

    sf_dir = rest[0] if rest else "/root/testdata/sf0.01"
    out_path = os.environ.get("PARITY_OUT", "PARITY_two_level.txt")
    only = rest[1:]
    status: dict[str, dict[str, str]] = {}
    for ncpu in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, sf_dir, *only],
            env=dict(os.environ, PARITY_CPUS=str(ncpu)),
            capture_output=True, text=True)
        for line in proc.stdout.splitlines():
            m = re.match(r"\[( OK |rows|FAIL)\] ([a-z0-9_]+):", line)
            if m:
                status.setdefault(m.group(2), {})[str(ncpu)] = \
                    m.group(1).strip()
    import __ray_entry__ as e

    names = [n for n in e.queries() if not only or n in only]
    oracles = e.oracle_sql()
    bad = 0
    lines = [
        "# Every queries() entry vs its DuckDB oracle at %s," % sf_dir,
        "# at num_cpus=8 and 32 (fresh Ray session each).",
        "# OK = row count + columns + order-insensitive exact values.",
        "# rows = no SQL oracle by design (brute-force pytest instead).",
        "",
        f"{'query':42s} {'8cpu':6s} {'32cpu':6s} oracle",
    ]
    for n in names:
        s8 = status.get(n, {}).get("8", "MISS")
        s32 = status.get(n, {}).get("32", "MISS")
        if "FAIL" in (s8, s32) or "MISS" in (s8, s32):
            bad += 1
        lines.append(f"{n:42s} {s8:6s} {s32:6s} "
                     f"{'sql' if n in oracles else 'rows-only'}")
    ok8 = sum(1 for n in names
              if status.get(n, {}).get('8') == 'OK')
    r8 = sum(1 for n in names
             if status.get(n, {}).get('8') == 'rows')
    lines += ["", f"# totals: {len(names)} queries; {ok8} SQL-exact + "
                  f"{r8} rows-only per level; failures/missing: {bad}"]
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(lines[-1])
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
