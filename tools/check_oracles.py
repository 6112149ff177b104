"""Local mimic of the driver's correctness gate: run every queries() entry
at a given sf and compare against oracle_sql() via DuckDB (row count +
column names + order-insensitive value hash, columns sorted by name).

Usage: python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd


def to_pandas(obj):
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if col.dtype == object:
            df[c] = col.map(lambda v: str(sorted(v)) if isinstance(v, (list, tuple)) else str(v))
        elif str(col.dtype).startswith("datetime"):
            df[c] = col.astype("int64")
        elif col.dtype == float:
            # Dtype-strict: do NOT coerce integral floats to int64 — the
            # driver's hasher doesn't, so a float-vs-int64 column dtype
            # asymmetry between engine and oracle must fail HERE too
            # (round-4 lesson: rect_nearest_join passed locally, failed on
            # the driver, because this coercion masked an oracle POWER()
            # DOUBLE vs engine int64 mismatch).
            df[c] = col.round(9)
    rows = sorted(tuple(map(str, r)) for r in df.itertuples(index=False))
    h = hashlib.md5()
    for r in rows:
        h.update("|".join(r).encode())
    return h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time

        t0 = time.time()
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"okro {name}: rows={len(mine)} ({dt:.1f}s) [rows-only]")
            continue
        try:
            theirs = con.execute(oracles[name]).fetch_df()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            failures += 1
            continue
        ok_rows = len(mine) == len(theirs)
        ok_cols = sorted(mine.columns) == sorted(theirs.columns)
        ok_hash = ok_cols and value_hash(mine) == value_hash(theirs)
        if ok_rows and ok_cols and ok_hash:
            print(f"PASS {name}: rows={len(mine)} ({dt:.1f}s)")
        else:
            failures += 1
            print(
                f"FAIL {name}: rows {len(mine)}/{len(theirs)} cols_ok={ok_cols} hash_ok={ok_hash}"
            )
            if not ok_cols:
                print(f"   mine: {sorted(mine.columns)}\n   orcl: {sorted(theirs.columns)}")
    print("failures:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
