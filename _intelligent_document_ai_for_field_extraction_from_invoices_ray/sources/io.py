"""Lance-first IO with a transparent Parquet fallback.

The north-rule input is "Lance tables of interleaved text+media documents";
no ``lance`` wheel is installable in this sealed sandbox, so the module
probes for it once and otherwise reads/writes Parquet with the identical
schema (SURVEY.md §7.4 "Lance availability").  All call sites go through
``read_docs``/``write_docs`` so swapping the format is a no-op for the
engine.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - lance absent in this environment
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def dataset_uri(base: str) -> str:
    return f"{base}.lance" if HAVE_LANCE else f"{base}.parquet"


def write_docs(table: pa.Table, base: str) -> str:
    uri = dataset_uri(base)
    os.makedirs(os.path.dirname(uri) or ".", exist_ok=True)
    if HAVE_LANCE:
        lance.write_dataset(table, uri, mode="overwrite")
    else:
        tmp = uri + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, uri)
    return uri


def read_docs_ray(uri: str, **kwargs):
    """ray.data reader for a docs table (Lance when available)."""
    import ray.data as rd

    if HAVE_LANCE and uri.endswith(".lance"):
        return rd.read_lance(uri, **kwargs)
    return rd.read_parquet(uri, **kwargs)


def read_docs_table(uri: str) -> pa.Table:
    if HAVE_LANCE and uri.endswith(".lance"):
        return lance.dataset(uri).to_table()
    return pq.read_table(uri)
