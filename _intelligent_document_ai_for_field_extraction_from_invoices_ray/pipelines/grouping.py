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


def _to_arrow(out) -> pa.Table:
    """Normalize a group-fn output to a METADATA-FREE Arrow table.

    Block-schema hygiene is load-bearing: pandas-built blocks carry a
    pandas-metadata dict in their Arrow schema, and Ray's shuffle fails to
    hash such schemas ("Failed to hash the schemas (for deduplication)"),
    after which the sort/union schema tracking degrades ("new schema: .")
    and grouped rows are silently lost (observed: a co-group join
    nondeterministically dropping 94% of its rows).  Every exchange helper
    here therefore emits uniform Arrow blocks with schema metadata
    stripped."""
    if isinstance(out, pd.DataFrame):
        out = pa.Table.from_pandas(out, preserve_index=False)
    return out.replace_schema_metadata(None)


def bucketed_group_apply(ds: rd.Dataset, keys: list[str],
                         fn: Callable[[pd.DataFrame], pd.DataFrame],
                         num_buckets: int = 64) -> rd.Dataset:
    """Apply ``fn`` (a vectorized pandas transform that must itself respect
    the ``keys`` grouping, e.g. ``df.groupby(keys).agg(...)``) once per
    key-hash bucket.  One shuffle, ``num_buckets`` Python calls total."""

    def tag(batch: pa.Table) -> pa.Table:
        out = batch.append_column(
            "_kb", pa.array(_bucket_ids(batch, keys, num_buckets)))
        return out.replace_schema_metadata(None)

    def apply(group: pa.Table) -> pa.Table:
        return _to_arrow(fn(group.drop_columns(["_kb"]).to_pandas()))

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("_kb").map_groups(apply, batch_format="pyarrow"))


def bucketed_cogroup(left: rd.Dataset, right: rd.Dataset,
                     left_keys: list[str], right_keys: list[str],
                     fn: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
                     num_buckets: int = 32) -> rd.Dataset:
    """Co-partition TWO large datasets by key hash and apply
    ``fn(left_df, right_df)`` once per bucket — the scale shape for
    large-large joins (hash/asof/semi/anti) where neither side fits on the
    driver.  Both sides ship through ONE union shuffle; nothing is
    materialized driver-side or broadcast whole.

    ``fn`` receives each bucket's rows with the original column names and
    ORIGINAL dtypes: the union pads each side with the other's columns as
    nulls, but the per-side split happens in Arrow (zero-copy filter)
    before the pandas conversion, so the null padding never float64-izes
    integer columns.
    """
    # normalize to Arrow blocks so the schemas are pa.Schema (a side built
    # by a pandas map_groups stage reports a PandasBlockSchema otherwise)
    left = left.map_batches(lambda b: b, batch_format="pyarrow")
    right = right.map_batches(lambda b: b, batch_format="pyarrow")
    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema
    order = left_cols + [c for c in right_cols if c not in left_cols]

    def tag(side: int, keys: list[str], pad_schema: pa.Schema):
        def f(batch: pa.Table) -> pa.Table:
            bucket = _bucket_ids(batch, keys, num_buckets)
            batch = (batch.append_column("_kb", pa.array(bucket))
                          .append_column("_side", pa.array(
                              np.full(batch.num_rows, side, dtype=np.int8))))
            for field in pad_schema:
                if field.name not in batch.column_names:
                    batch = batch.append_column(
                        field.name, pa.nulls(batch.num_rows, type=field.type))
            return batch.select(order + ["_kb", "_side"]).replace_schema_metadata(None)
        return f

    left_t = left.map_batches(tag(0, left_keys, r_schema),
                              batch_format="pyarrow")
    right_t = right.map_batches(tag(1, right_keys, l_schema),
                                batch_format="pyarrow")

    def apply(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lf = group.filter(pa.array(side == 0)).select(left_cols).to_pandas()
        rf = group.filter(pa.array(side == 1)).select(right_cols).to_pandas()
        return _to_arrow(fn(lf, rf))

    return (left_t.union(right_t)
            .groupby("_kb").map_groups(apply, batch_format="pyarrow"))


def pair_grid_apply(ds: rd.Dataset, block_col_src: str,
                    kernel: Callable[[pd.DataFrame, pd.DataFrame | None], pd.DataFrame],
                    num_blocks: int = 8) -> rd.Dataset:
    """Exact all-pairs over a dataset WITHOUT broadcasting it: the
    block-pair (theta-join) grid.  Each row is assigned a block
    p = hash(id) % B and replicated to every block pair {min(p,q),
    max(p,q)}; a groupby on the pair key then hands ``kernel`` either one
    diagonal block (compute within-block pairs, second arg None) or two
    off-diagonal blocks (compute cross pairs only).  Every unordered row
    pair is seen by exactly one task.

    Exchange = n·B rows; per-task work = O((n/B)^2); total flops stay
    O(n^2) but are spread over B(B+1)/2 independent tasks with bounded
    memory — the distributed shape for *exact* all-pairs semantics.  Pick
    B ≈ sqrt(desired tasks); sub-quadratic needs (LSH/IVF/prefix-filter)
    live in dedup.py / similarity.py.
    """
    B = num_blocks

    def replicate(batch: pa.Table) -> pa.Table:
        blk = _bucket_ids(batch, [block_col_src], B).astype(np.int64)
        n = batch.num_rows
        idx, keys, own = [], [], []
        # row with block p lands on pair {p,q} for every q: the diagonal
        # (p,p) once and each off-diagonal once — B distinct keys per row
        for q in range(B):
            lo = np.minimum(blk, q)
            hi = np.maximum(blk, q)
            idx.append(np.arange(n))
            keys.append(lo * B + hi)
            own.append(blk)
        out = batch.take(pa.array(np.concatenate(idx)))
        out = out.append_column("_pair", pa.array(np.concatenate(keys)))
        out = out.append_column("_blk", pa.array(np.concatenate(own)))
        return out.replace_schema_metadata(None)

    def apply(tbl: pa.Table) -> pa.Table:
        group = tbl.to_pandas()
        key = int(group["_pair"].iloc[0])
        lo, hi = key // B, key % B
        g = group.drop(columns=["_pair"])
        if lo == hi:
            return _to_arrow(kernel(g.drop(columns=["_blk"]), None))
        a = g.loc[g._blk == lo].drop(columns=["_blk"])
        b = g.loc[g._blk == hi].drop(columns=["_blk"])
        if a.empty or b.empty:
            return _to_arrow(kernel(a.iloc[0:0], b.iloc[0:0]))
        return _to_arrow(kernel(a, b))

    return (ds.map_batches(replicate, batch_format="pyarrow")
            .groupby("_pair").map_groups(apply, batch_format="pyarrow"))


def hot_keys(ds: rd.Dataset, key_col: str, threshold: int,
             num_buckets: int = 32, min_batch_count: int = 1) -> np.ndarray:
    """Distributed hot-key histogram — the shared first half of every
    hot-key grid split (LSH buckets, IVF lists, SemDeDup clusters,
    pair-generation groups): per-batch (key, count) partials → ONE
    bucketed sum → filter(count > threshold).  Only HOT key ids —
    provably < rows/threshold of them — ever reach the driver; the full
    distinct-key histogram (vocabulary-sized at corpus scale) stays
    distributed.  Returns the hot ids as a SORTED int64 array (the
    shape ``np.isin`` in :func:`split_hot` wants).

    ``min_batch_count=2`` drops per-batch singleton keys from the
    partials: a key with global count > threshold over NB batches keeps
    per-batch count ≥ 2 in all but < NB of its occurrences, so the
    undercount is < NB — callers opting in must tolerate a marginally
    hot key running inline with group size ~threshold + num_blocks.
    For mostly-unique keys this shrinks the histogram exchange 10-50×.
    """

    def kcount(batch: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(
            batch.column(key_col).to_numpy(zero_copy_only=False),
            return_counts=True)
        if min_batch_count > 1:
            rep = cnt >= min_batch_count
            uniq, cnt = uniq[rep], cnt[rep]
        return pa.table({"k": pa.array(uniq.astype(np.int64)),
                         "c": pa.array(cnt.astype(np.int64))})

    def hot_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("k", as_index=False)["c"].sum()
        return s.loc[s["c"] > threshold, ["k"]]

    hot_df = bucketed_group_apply(
        ds.map_batches(kcount, batch_format="pyarrow"),
        ["k"], hot_in_bucket, num_buckets=num_buckets).to_pandas()
    return (np.sort(hot_df["k"].to_numpy().astype(np.int64))
            if len(hot_df) else np.empty(0, np.int64))


def split_hot(key_col: str, hot: np.ndarray, want_hot: bool) -> Callable:
    """Batch filter on membership of ``key_col`` in the (sorted) hot-key
    array — the cold/hot routing half of the hot-key grid split."""

    def f(batch: pa.Table) -> pa.Table:
        mask = np.isin(batch.column(key_col)
                       .to_numpy(zero_copy_only=False), hot)
        out = batch.filter(pa.array(mask if want_hot else ~mask))
        return out.replace_schema_metadata(None)

    return f


def two_level_combine(ds: rd.Dataset, combine: Callable,
                      num_blocks: int = 64,
                      batch_format: str = "pandas") -> rd.Dataset:
    """Intermediate combine level between per-block partials and a
    driver-side merge: coalesce the partial blocks to ``num_blocks``
    and re-apply the (semilattice) ``combine`` per coalesced block, so
    the rows the driver pulls are bounded by O(num_blocks ×
    per-partial-bound) regardless of input block count.  A 100-TB read
    is ~800k blocks; without this level a 10-rows-per-block partial
    top-k ships ~8M rows to the driver — with it, ≤640."""
    return ds.repartition(num_blocks).map_batches(
        combine, batch_format=batch_format)


def maybe_checkpoint(ds: rd.Dataset) -> rd.Dataset:
    """``materialize()`` a multi-consumer intermediate — unless
    ``GRAFT_SETS_RESCAN=1``, which trades the object-store residency for
    re-executing the (deterministic) upstream lineage once per consumer.
    Use ONLY where the consumers are order-insensitive (histogram +
    split paths); checkpoints that pin plan DETERMINISM (verify_pairs'
    candidate list, the CC round boundaries) must stay unconditional."""
    import os

    if os.environ.get("GRAFT_SETS_RESCAN", "") == "1":
        return ds
    return ds.materialize()
