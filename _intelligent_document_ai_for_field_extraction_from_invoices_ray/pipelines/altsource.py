"""Alternative source/sink formats — CSV and JSONL round-trips through
Ray Data's own writers and readers (`write_csv`/`read_csv`,
`write_json`/`read_json`), plus CUSTOM per-block sinks/sources for two
formats Ray Data has no native codec for: ORC (`pyarrow.orc`) and Arrow
IPC / Feather V2 (`pyarrow.ipc`) — the extension recipe for any alien
format (write one shard per block from map_batches; read via
`read_binary_files` + a zero-copy pyarrow decode stage).  Real corpora
arrive in whatever format the upstream system emits; an engine that
only reads Parquet isn't a front door.  Each query materializes the
documents table's scalar columns to
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


def _write_shards(sf_dir: str, fmt: str) -> str:
    """Custom per-block sink for formats Ray Data has no writer for
    (ORC via ``pyarrow.orc``, Arrow IPC/Feather via ``pyarrow.ipc``).
    One shard per block, named by the block's min doc_id — deterministic,
    collision-free (doc_ids are unique and blocks disjoint), and the
    resumable-output layout (a re-run skips the finished directory via
    the _DONE marker).  The map_batches sink streams: no block is ever
    held beyond its own write."""
    out = _roundtrip_dir(sf_dir, fmt)
    done = os.path.join(out, "_DONE")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        lo = pa.compute.min(batch.column("doc_id")).as_py()
        path = os.path.join(out, f"part-{lo:012d}.{fmt}")
        if fmt == "orc":
            import pyarrow.orc as orc
            orc.write_table(batch, path)
        else:
            import pyarrow.ipc as ipc
            with ipc.new_file(path, batch.schema) as w:
                w.write_table(batch)
        return pa.table({"path": [path],
                         "rows": pa.array([batch.num_rows], pa.int64())})

    manifest = _docs(sf_dir).map_batches(
        write_block, batch_format="pyarrow").materialize()
    assert manifest.sum("rows") > 0
    with open(done, "w", encoding="utf-8") as f:
        f.write("ok\n")
    return out


def _read_shards(out: str, fmt: str) -> rd.Dataset:
    """Custom source: stream the alien-format shards through Ray's
    binary reader and decode each file zero-copy with pyarrow — the
    pattern for any format Ray Data lacks a native reader for.  Blocks
    stay shard-sized; nothing is concatenated driver-side."""
    raw = rd.read_binary_files(out, file_extensions=[fmt])

    def decode(batch: pa.Table) -> pa.Table:
        tables = []
        for buf in batch.column("bytes").to_pylist():
            if fmt == "orc":
                import pyarrow.orc as orc
                tables.append(orc.ORCFile(pa.BufferReader(buf)).read())
            else:
                import pyarrow.ipc as ipc
                tables.append(ipc.open_file(pa.BufferReader(buf)).read_all())
        return pa.concat_tables(tables)

    return raw.map_batches(decode, batch_format="pyarrow")


def q_orc_source_stats(sf_dir: str) -> rd.Dataset:
    """documents → per-block ORC shards (custom pyarrow.orc sink) →
    streamed binary read + ORC decode → per-source stats.  Value
    equality vs the Parquet-side oracle pins both directions of a codec
    Ray Data has no native reader/writer for."""
    out = _write_shards(sf_dir, "orc")
    ds = _read_shards(out, "orc")
    return _agg2(ds, ["source"])


def q_ipc_source_stats(sf_dir: str) -> rd.Dataset:
    """documents → per-block Arrow IPC (Feather V2) shards → streamed
    binary read + IPC decode → per-lang stats; pins the IPC round-trip."""
    out = _write_shards(sf_dir, "ipc")
    ds = _read_shards(out, "ipc")
    return _agg2(ds, ["lang"])


def _agg2(ds: rd.Dataset, keys: list[str]) -> rd.Dataset:
    """Like _agg but with a max_chars column (distinct output shape from
    the CSV/JSONL stats so each codec pin is independently hashed)."""
    from .grouping import bucketed_group_apply

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            n_docs=("n_chars", "size"), total_chars=("n_chars", "sum"),
            max_chars=("n_chars", "max"))
        return g.astype({"n_docs": np.int64, "total_chars": np.int64,
                         "max_chars": np.int64})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(keys, as_index=False).agg(
            n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"),
            max_chars=("max_chars", "max"))
        return g.astype({"n_docs": np.int64, "total_chars": np.int64,
                         "max_chars": np.int64})

    return (bucketed_group_apply(
        ds.map_batches(part, batch_format="pandas"),
        keys, merge, num_buckets=8).sort(keys))


SQL_CSV_SOURCE_STATS = """
SELECT source, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1, 2 ORDER BY 1, 2
"""

SQL_ORC_SOURCE_STATS = """
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY 1 ORDER BY 1
"""

SQL_IPC_SOURCE_STATS = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MAX(n_chars) AS BIGINT) AS max_chars
FROM documents GROUP BY 1 ORDER BY 1
"""

SQL_JSONL_SOURCE_STATS = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1 ORDER BY 1
"""


ALT_QUERIES = {
    "csv_source_stats": (q_csv_source_stats, SQL_CSV_SOURCE_STATS),
    "jsonl_source_stats": (q_jsonl_source_stats, SQL_JSONL_SOURCE_STATS),
    "orc_source_stats": (q_orc_source_stats, SQL_ORC_SOURCE_STATS),
    "ipc_source_stats": (q_ipc_source_stats, SQL_IPC_SOURCE_STATS),
}
