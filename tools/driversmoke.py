"""Exact local mimic of the driver's correctness gate.

The round-2 driver wrote an EMPTY ``CORRECTNESS_r02.json`` (no row for any
query) ~3 minutes into the gate, while the same suite was 38/38 green under
``tools/sqlcheck.py`` and 78/78 under pytest.  That means the harness died
at setup/enumeration or hard-crashed on an early query.  This tool
reproduces the driver's protocol end-to-end so any such failure is
observable locally, and — unlike a naive runner — writes its result file
INCREMENTALLY after every query, so even a process kill leaves evidence of
exactly how far it got.

Protocol mimicked (per the task contract and the CORRECTNESS_r01.json
format):
  1. fresh process, ``ray.init(address="local", num_cpus=N)`` BEFORE import
  2. import ``__ray_entry__`` by file path (the way a driver would)
  3. smoke ``entry()``: runs, >=0 rows, stable schema
  4. enumerate ``queries()`` / ``oracle_sql()``
  5. for each query: run the Ray callable at sf0.01, run the oracle SQL in
     DuckDB over the same parquet views, canonicalize (columns sorted by
     name, rows sorted by all columns), record rows/schema/hash matches
  6. write one JSON row per query

Usage:  python tools/driversmoke.py [sf_dir] [--out FILE] [--cpus N]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time
import traceback

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df):
    import pandas as pd  # noqa: F401
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _to_pandas(obj):
    import pyarrow as pa
    import ray.data as rd
    if isinstance(obj, rd.Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def _value_hash(df) -> str:
    """Order/index-insensitive content hash of a canonicalized frame."""
    import pandas as pd
    h = hashlib.sha256()
    h.update(",".join(map(str, df.columns)).encode())
    h.update(",".join(str(df[c].dtype) for c in df.columns).encode())
    with pd.option_context("display.float_format", lambda v: f"{v:.10g}"):
        h.update(df.to_csv(index=False).encode())
    return h.hexdigest()[:16]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="/tmp/CORRECTNESS_local.json")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--entry-sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    t0 = time.time()
    import ray
    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    print(f"[{time.time()-t0:6.1f}s] ray up", flush=True)

    # import by file path, the way a driver harness would
    import importlib.util
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    spec = importlib.util.spec_from_file_location(
        "__ray_entry__", os.path.join(repo, "__ray_entry__.py"))
    E = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(E)
    print(f"[{time.time()-t0:6.1f}s] module imported", flush=True)

    results: dict[str, dict] = {}

    def flush():
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(results, f, indent=2)
        os.replace(tmp, args.out)

    # --- entry() smoke -------------------------------------------------
    try:
        ent = _to_pandas(E.entry())
        assert len(ent) >= 0 and len(ent.columns) > 0
        print(f"[{time.time()-t0:6.1f}s] entry() OK: {len(ent)} rows x "
              f"{len(ent.columns)} cols", flush=True)
    except Exception:
        print(f"[{time.time()-t0:6.1f}s] entry() FAILED:", flush=True)
        traceback.print_exc()
        results["__entry__"] = {"err": traceback.format_exc(limit=3)}
        flush()
        return 1

    # --- enumerate -----------------------------------------------------
    try:
        qs = E.queries()
        sqls = E.oracle_sql()
        print(f"[{time.time()-t0:6.1f}s] enumerated {len(qs)} queries, "
              f"{len(sqls)} oracles", flush=True)
    except Exception:
        print(f"[{time.time()-t0:6.1f}s] enumeration FAILED:", flush=True)
        traceback.print_exc()
        results["__enumerate__"] = {"err": traceback.format_exc(limit=3)}
        flush()
        return 1

    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None,
               "ray_s": None, "oracle_s": None}
        try:
            tq = time.time()
            mine = _canon(_to_pandas(fn(args.sf_dir)))
            row["ray_s"] = round(time.time() - tq, 2)
            row["spark_rows"] = int(len(mine))
        except Exception as e:  # noqa: BLE001
            row["err"] = f"ray:{type(e).__name__}: {e}"[:300]
            failures += 1
            results[name] = row
            flush()
            print(f"  {name:30s} RAY-ERROR {row['err'][:120]}", flush=True)
            continue
        sql = sqls.get(name)
        if sql is None:
            row["err"] = "no_oracle"
            results[name] = row
            flush()
            print(f"  {name:30s} rows-only ({row['spark_rows']} rows, "
                  f"{row['ray_s']}s)", flush=True)
            continue
        try:
            tq = time.time()
            theirs = _canon(con.execute(sql).fetch_df())
            row["oracle_s"] = round(time.time() - tq, 2)
            row["oracle_rows"] = int(len(theirs))
        except Exception as e:  # noqa: BLE001
            row["err"] = f"oracle:{type(e).__name__}: {e}"[:300]
            failures += 1
            results[name] = row
            flush()
            print(f"  {name:30s} SQL-ERROR {row['err'][:120]}", flush=True)
            continue
        row["rows_match"] = len(mine) == len(theirs)
        row["schema_match"] = (list(mine.columns) == list(theirs.columns)
                               and all(str(mine[c].dtype) == str(theirs[c].dtype)
                                       for c in mine.columns))
        row["hash_match"] = (row["rows_match"] and row["schema_match"]
                             and _value_hash(mine) == _value_hash(theirs))
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        failures += 0 if ok else 1
        results[name] = row
        flush()
        print(f"  {name:30s} rows={row['rows_match']} schema={row['schema_match']} "
              f"hash={row['hash_match']} (ray {row['ray_s']}s, "
              f"sql {row['oracle_s']}s)", flush=True)

    n_sql = sum(1 for r in results.values() if r.get("err") != "no_oracle")
    print(f"\n[{time.time()-t0:6.1f}s] {n_sql - failures}/{n_sql} SQL-checked "
          f"green, {len(results) - n_sql} rows-only, wrote {args.out}",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
