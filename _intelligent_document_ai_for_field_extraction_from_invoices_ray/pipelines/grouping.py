"""High-cardinality grouped aggregation: the coarse-bucket pattern.

``Dataset.groupby(keys).aggregate(...)`` / ``map_groups`` pay a Python
call per GROUP — fine for dozens of groups, catastrophic for 10^5+
(measured: 14 s for a 100k-row / 95k-group aggregate that pandas does in
20 ms).  The scalable shape is to shuffle once into a bounded number of
key-hash BUCKETS (every row of a key lands in the same bucket) and run a
vectorized pandas/Arrow aggregation inside each bucket.  Bucket count is
the parallelism knob; skewed keys can't straddle buckets, so hot-key
salting happens by raising ``num_buckets``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _bucket_ids(batch: pa.Table, keys: list[str], num_buckets: int) -> np.ndarray:
    acc = np.zeros(batch.num_rows, dtype=np.uint64)
    for k in keys:
        col = batch.column(k)
        vals = col.to_pandas()
        # deterministic across processes (pandas siphash with fixed key)
        h = pd.util.hash_pandas_object(vals, index=False).to_numpy()
        acc = acc * np.uint64(1000003) + h
    return (acc % np.uint64(num_buckets)).astype(np.int32)


def bucketed_group_apply(ds: rd.Dataset, keys: list[str],
                         fn: Callable[[pd.DataFrame], pd.DataFrame],
                         num_buckets: int = 64) -> rd.Dataset:
    """Apply ``fn`` (a vectorized pandas transform that must itself respect
    the ``keys`` grouping, e.g. ``df.groupby(keys).agg(...)``) once per
    key-hash bucket.  One shuffle, ``num_buckets`` Python calls total."""

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column("_kb", pa.array(_bucket_ids(batch, keys, num_buckets)))

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        return fn(group.drop(columns=["_kb"]))

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_kb").map_groups(apply, batch_format="pandas"))
