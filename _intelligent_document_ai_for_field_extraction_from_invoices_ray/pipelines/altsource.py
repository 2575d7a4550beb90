"""Alternative source/sink formats — CSV and JSONL round-trips through
Ray Data's own writers and readers (`write_csv`/`read_csv`,
`write_json`/`read_json`).  Real corpora arrive in whatever format the
upstream system emits; an engine that only reads Parquet isn't a front
door.  Each query materializes the documents table's scalar columns to
a deterministic /tmp dataset in the target format via the Ray SINK,
reads it back via the Ray SOURCE, and aggregates — so the driver's
value-hash gate transitively pins BOTH directions of the codec against
the Parquet originals.

Scale notes: the write is a streaming per-block sink (one shard per
block — the resumable-output layout); the read streams shards; the
aggregation is the bounded-key partial pattern (per-batch combiner →
one tiny groupby).  The /tmp round-trip dataset is re-created only
when absent (cheap, deterministic content either way).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_COLS = ["doc_id", "lang", "source", "n_chars"]


def _docs(sf_dir: str) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=_COLS, rows_per_block=1000)


def _roundtrip_dir(sf_dir: str, fmt: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir))
    mtime = int(os.path.getmtime(f"{sf_dir}/documents.parquet"))
    return f"/tmp/dai_altsource/{tag}-{mtime}/{fmt}"


def _ensure_written(sf_dir: str, fmt: str) -> str:
    out = _roundtrip_dir(sf_dir, fmt)
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        ds = _docs(sf_dir)
        if fmt == "csv":
            ds.write_csv(out)
        else:
            ds.write_json(out)
        with open(done, "w", encoding="utf-8") as f:
            f.write("ok\n")
    return out


def _agg(ds: rd.Dataset, keys: list[str]) -> rd.Dataset:
    from .grouping import bucketed_group_apply

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"))
        return g.astype({"n_docs": np.int64, "total_chars": np.int64})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
        return g.astype({"n_docs": np.int64, "total_chars": np.int64})

    return (bucketed_group_apply(
        ds.map_batches(part, batch_format="pandas"),
        keys, merge, num_buckets=8).sort(keys))


def q_csv_source_stats(sf_dir: str) -> rd.Dataset:
    """documents → Ray `write_csv` shards → Ray `read_csv` → per
    (source, lang) stats.  Value-equality vs the Parquet-side oracle
    pins the CSV codec round-trip (quoting, dtype re-inference)."""
    out = _ensure_written(sf_dir, "csv")
    ds = rd.read_csv(out, file_extensions=["csv"])
    return _agg(ds, ["source", "lang"])


def q_jsonl_source_stats(sf_dir: str) -> rd.Dataset:
    """documents → Ray `write_json` (JSONL shards) → Ray `read_json` →
    per-lang stats; pins the JSON codec round-trip."""
    out = _ensure_written(sf_dir, "jsonl")
    ds = rd.read_json(out, file_extensions=["json"])
    return _agg(ds, ["lang"])


SQL_CSV_SOURCE_STATS = """
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1, 2 ORDER BY 1, 2
"""

SQL_JSONL_SOURCE_STATS = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1 ORDER BY 1
"""


ALT_QUERIES = {
    "csv_source_stats": (q_csv_source_stats, SQL_CSV_SOURCE_STATS),
    "jsonl_source_stats": (q_jsonl_source_stats, SQL_JSONL_SOURCE_STATS),
}
