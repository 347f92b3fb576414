"""Local simulation of the driver correctness gate: run every queries()
entry and its oracle_sql() side-by-side with DuckDB, compare row count,
column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only]
  only: comma-separated query names or substring patterns — run just those
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    try:
        import ray.data
        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main(sf_dir: str = "/root/testdata/sf0.01", only: str | None = None):
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import logging

    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import __ray_entry__ as E
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = E.queries(), E.oracle_sql()
    if only:
        pats = only.split(",")
        qs = {n: f for n, f in qs.items() if any(p in n for p in pats)}
    n_ok = n_fail = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            got = norm(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: engine raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} ({dt:.2f}s) [no oracle — rows-only]")
            n_ok += 1
            continue
        try:
            exp = norm(con.execute(oracles[name]).fetchdf())
        except Exception as ex:
            print(f"FAIL {name}: oracle SQL raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
            n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_fail += 1
        elif not got.equals(exp):
            diff = (got != exp)
            bad_cols = [c for c in got.columns if diff[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols}")
            for c in bad_cols[:2]:
                i = int(diff[c].idxmax())
                print(f"   row {i}: got {got[c][i]!r} exp {exp[c][i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(got)} ({dt:.2f}s)")
            n_ok += 1
    print(f"\n{n_ok} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
