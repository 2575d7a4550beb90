"""Local stand-in for the driver's SQL-oracle gate.

Runs selected ``__ray_entry__.queries()`` callables against their
``oracle_sql()`` DuckDB equivalents over one sf dir and reports
rows / schema / value equality after the driver's canonicalization
(columns sorted by name, then rows sorted by all columns).

Usage:  python tools/sqlcheck.py [sf_dir] [query ...]
        (no query names = every SQL-checked query)
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd
    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def main() -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True)
    from ray.data import DataContext
    DataContext.get_current().enable_tensor_extension_casting = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:]
    qs, sqls = E.queries(), E.oracle_sql()
    if not names:
        names = [n for n in qs if n in sqls]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name in names:
        if name not in sqls:
            print(f"{name:28s} SKIP (no oracle)")
            continue
        try:
            mine = _canon(_to_pandas(qs[name](sf_dir)))
            theirs = _canon(con.execute(sqls[name]).fetch_df())
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        rows_ok = len(mine) == len(theirs)
        schema_ok = list(mine.columns) == list(theirs.columns)
        vals_ok = False
        dtype_ok = False
        if rows_ok and schema_ok:
            dtype_ok = all(str(mine[c].dtype) == str(theirs[c].dtype)
                           for c in mine.columns)
            try:
                pd.testing.assert_frame_equal(mine, theirs, check_dtype=True)
                vals_ok = True
            except AssertionError:
                vals_ok = False
        ok = rows_ok and schema_ok and vals_ok
        failures += 0 if ok else 1
        print(f"{name:28s} rows={rows_ok} schema={schema_ok} "
              f"dtype={dtype_ok} values={vals_ok} "
              f"({len(mine)} vs {len(theirs)})")
        if not ok and rows_ok and schema_ok:
            for c in mine.columns:
                if str(mine[c].dtype) != str(theirs[c].dtype):
                    print(f"    dtype {c}: {mine[c].dtype} vs {theirs[c].dtype}")
                elif not mine[c].equals(theirs[c]):
                    diff = (mine[c] != theirs[c])
                    print(f"    values {c}: {int(diff.sum())} differing rows; "
                          f"first: {mine[c][diff].head(2).tolist()} vs "
                          f"{theirs[c][diff].head(2).tolist()}")
    print(f"\n{len(names) - failures}/{len(names)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
