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


# ------------------------------------------------------- sized reads
# Ray's default read planner splits ANY input into ~2x-session-CPUs
# blocks, so a 200 KiB table becomes 64 near-empty blocks and every
# downstream all-to-all pays a blocks x partitions task matrix of pure
# scheduling overhead (measured at sf0.01/32cpu: the asof/range-join
# queries dropped 3.9 s -> 0.6 s once the read produced 1 block instead
# of 64).  For SMALL single-file inputs we override the block count to
# ceil(rows / rows_per_block); large (or multi-file) inputs keep Ray's
# default policy, which targets DataContext.target_max_block_size and
# is the right call at 100-TB scale.
SMALL_FILE_BYTES = 1 << 30


def read_parquet_sized(path: str, columns: list[str] | None = None,
                       rows_per_block: int = 20_000):
    """``read_parquet`` with a small-input block-count override.

    ``rows_per_block`` is a per-table-kind knob: ~20k for cheap
    vectorized relational columns, ~1-2k for text/embedding tables whose
    per-row map work (tokenizing, matmul) needs task parallelism sooner.
    """
    import ray.data as rd

    try:
        if os.path.isfile(path) and os.path.getsize(path) <= SMALL_FILE_BYTES:
            rows = pq.read_metadata(path).num_rows
            nb = max(1, min(64, -(-rows // max(1, rows_per_block))))
            return rd.read_parquet(path, columns=columns,
                                   override_num_blocks=nb)
    except Exception:  # pragma: no cover - fall back to the default plan
        pass
    return rd.read_parquet(path, columns=columns)
