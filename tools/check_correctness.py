"""Local mirror of the driver's correctness gate: run each queries() entry
and its oracle_sql() side by side on a testdata dir, compare row count,
column names/types and exact values (rows+columns sorted).

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"columns differ: ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return problems
    if len(ray_df) != len(sql_df):
        problems.append(f"row count differs: ray={len(ray_df)} sql={len(sql_df)}")
    a, b = canon(ray_df), canon(sql_df)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                bad = ~(
                    (pd.isna(av) & pd.isna(bv))
                    | (av.astype(np.float64) == bv.astype(np.float64))
                )
            else:
                bad = av != bv
            nbad = int(np.asarray(bad).sum())
            if nbad:
                i = int(np.flatnonzero(bad)[0])
                problems.append(
                    f"col {c}: {nbad} mismatches, first at row {i}: ray={av[i]!r} sql={bv[i]!r}"
                )
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 16)),
            include_dashboard=False, logging_level="ERROR",
        )
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    # bound the oracle side: DuckDB retains freed buffer blocks up to
    # memory_limit, and tens of thousands of retained blocks can exhaust
    # the process's vm.max_map_count (mmap ceiling) — after which RAY-side
    # calls fail with "can't start new thread" (thread stacks are mmaps)
    con.execute("SET memory_limit='16GB'")
    con.execute("SET threads TO 8")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"✗ {name}: RAY ERROR {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        t_ray = time.time() - t0
        if name not in oracles:
            print(f"~ {name}: rows-only ({len(ray_df)} rows, {t_ray:.1f}s)")
            continue
        t0 = time.time()
        try:
            sql_df = con.execute(oracles[name]).fetchdf()
        except Exception as ex:  # noqa: BLE001
            print(f"✗ {name}: SQL ERROR {type(ex).__name__}: {ex}")
            failed.append(name)
            continue
        t_sql = time.time() - t0
        problems = compare(name, ray_df, sql_df)
        if problems:
            print(f"✗ {name}: ({len(ray_df)} vs {len(sql_df)} rows)")
            for p in problems[:5]:
                print(f"    {p}")
            failed.append(name)
        else:
            print(f"✓ {name}: {len(ray_df)} rows match (ray {t_ray:.1f}s, sql {t_sql:.1f}s)")
    print()
    if failed:
        print(f"FAILED: {failed}")
        return 1
    print("all compared queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
