"""Driver-comparison emulator: runs each queries() entry and its oracle_sql()
side-by-side, compares row count, column names, and order-insensitive values.
Used by tests and by hand during development (python tests/driver_emu.py [sf_dir])."""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    problems = []
    if len(ray_df) != len(sql_df):
        problems.append(f"rows {len(ray_df)} vs {len(sql_df)}")
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        problems.append(f"cols {sorted(ray_df.columns)} vs {sorted(sql_df.columns)}")
        return problems
    a, b = normalize(ray_df), normalize(sql_df)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in a.columns if neq[c].any()]
        for c in bad_cols[:3]:
            i = int(neq[c].idxmax())
            problems.append(f"col {c} differs at row {i}: {a[c][i]!r} vs {b[c][i]!r}")
    return problems


def run(sf_dir: str, only: list[str] | None = None) -> dict[str, list[str]]:
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = e.queries()
    oracles = e.oracle_sql()
    results = {}
    for name, sql in oracles.items():
        if only and name not in only:
            continue
        ray_df = to_pandas(qs[name](sf_dir))
        sql_df = con.sql(sql).df()
        results[name] = compare(name, ray_df, sql_df)
    return results


if __name__ == "__main__":
    import ray

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    for name, problems in run(sf, only).items():
        print(f"{name:20s} {'OK' if not problems else 'MISMATCH: ' + '; '.join(problems)}")
    ray.shutdown()
