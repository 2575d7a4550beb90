"""Token-stream sequence packing — the "concatenate documents in order
and chop into fixed-length training sequences" step every LLM data
pipeline runs last (GPT-2/3-style packing).  Each doc is mapped to the
half-open token interval ``[offset, offset + n_tokens)`` of the
corpus-wide stream (docs concatenated in doc_id order) and to the range
of SEQ_LEN-token training sequences it lands in.

The hard part at 10^12 docs is the global EXCLUSIVE PREFIX SUM of token
counts in doc_id order — inherently sequential if done naively.  The
scale shape here is a three-level range-partitioned scan:

1. tokenize pass emits ``(doc_id, n_tokens, r1 = doc_id // R1)``;
   per-batch partials fold into per-range sums through one bucketed
   groupby whose exchange is ``(r1, sum)`` pairs only — never the docs;
2. the per-range sum table (n/R1 rows) coarsens again by
   ``r2 = r1 // R2`` to a driver-resident table of n/(R1·R2) rows
   (10^12 docs at the default 65536² ≈ 233 rows) whose exclusive
   prefix seeds per-super-range offsets, broadcast back by closure;
   within each r2 a ``map_groups`` cumsum turns range sums into exact
   per-range offsets — a DATASET, never driver-resident;
3. one ``bucketed_cogroup`` co-partitions docs with their range offset
   on r1 (the single full-data shuffle) and a per-range local cumsum
   (≤ R1 rows per group — ranges of UNIQUE doc_ids cannot be skewed)
   finishes the exact global offsets.

Tokenization reuses ``textstats._BPE_PAT`` (the GPT-2-style
pre-tokenizer alternation with RE2-safe ASCII whitespace) so the count
agrees byte-for-byte with the ``bpe_tokens`` oracle.

No reference counterpart (the invoice repo has no training-data
packing); this is engine-added LLM-pipeline surface like the dedup/ANN
families.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

SEQ_LEN = 2048


def _r1() -> int:
    return int(os.environ.get("GRAFT_PACK_RANGE", "65536"))


def _r2() -> int:
    return int(os.environ.get("GRAFT_PACK_RANGE2", "65536"))


def _docs(sf_dir: str) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"],
                              rows_per_block=1000)


def _token_counts(sf_dir: str) -> rd.Dataset:
    """(doc_id, n, r1) — one compiled-regex pass, no shuffle."""
    import re

    from .textstats import _BPE_PAT
    rx = re.compile(_BPE_PAT)
    r1w = _r1()

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = batch.column("text").to_pylist()
        n = np.fromiter((len(rx.findall(t)) for t in texts),
                        dtype=np.int64, count=len(texts))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n": pa.array(n, type=pa.int64()),
            "r1": pa.array(ids // r1w, type=pa.int64()),
        })

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow")


def _range_offsets(tok: rd.Dataset) -> rd.Dataset:
    """Exact exclusive prefix sum PER RANGE as a Dataset ``(r1, off)``.

    Level 1: per-batch (r1, partial-sum) combine -> bucketed groupby.
    Level 2: coarsen to r2, tiny driver prefix, per-r2 cumsum back out.
    """
    from .grouping import bucketed_group_apply

    r2w = _r2()

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"r1": batch.column("r1").to_numpy(),
                           "s": batch.column("n").to_numpy()})
        return df.groupby("r1", as_index=False).agg(s=("s", "sum"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("r1", as_index=False).agg(s=("s", "sum"))

    sums1 = bucketed_group_apply(
        tok.map_batches(partial, batch_format="pyarrow"),
        ["r1"], merge, num_buckets=16)

    # level 2: n/(R1*R2) rows on the driver — 233 rows at 10^12 docs
    def partial2(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"r2": batch.column("r1").to_numpy() // r2w,
                           "s": batch.column("s").to_numpy()})
        return df.groupby("r2", as_index=False).agg(s=("s", "sum"))

    sums2 = (sums1.map_batches(partial2, batch_format="pyarrow")
             .to_pandas().groupby("r2", as_index=False).agg(s=("s", "sum"))
             .sort_values("r2"))
    off2 = dict(zip(sums2["r2"].astype(np.int64),
                    np.concatenate([[0], sums2["s"].cumsum().to_numpy()[:-1]])
                    .astype(np.int64)))

    def within_r2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("r1")
        base = off2[int(df["r1"].iloc[0]) // r2w]
        s = df["s"].to_numpy()
        off = base + np.concatenate([[0], s.cumsum()[:-1]]).astype(np.int64)
        return pd.DataFrame({"r1": df["r1"].to_numpy(), "off": off})

    return bucketed_group_apply(
        sums1.map_batches(
            lambda b: b.append_column(
                "r2", pa.array(b.column("r1").to_numpy() // r2w))
            .replace_schema_metadata(None),
            batch_format="pyarrow"),
        ["r2"],
        lambda df: pd.concat([within_r2(g) for _, g in df.groupby("r2")],
                             ignore_index=True)
        if len(df) else pd.DataFrame({"r1": pd.Series([], dtype=np.int64),
                                      "off": pd.Series([], dtype=np.int64)}),
        num_buckets=16).map_batches(
            lambda b: b.select(["r1", "off"]).replace_schema_metadata(None),
            batch_format="pyarrow")


def q_seq_pack(sf_dir: str) -> rd.Dataset:
    """(doc_id, n_bpe_tokens, offset_tokens, seq_first, seq_last):
    each doc's token interval in the concatenated corpus stream and the
    SEQ_LEN-sequence range it spans (empty docs span their insertion
    point: seq_first == seq_last == offset // SEQ_LEN)."""
    from .grouping import bucketed_cogroup

    tok = _token_counts(sf_dir)
    offs = _range_offsets(tok)

    def finish(docs: pd.DataFrame, off: pd.DataFrame) -> pd.DataFrame:
        if docs.empty:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype=np.int64),
                "n_bpe_tokens": pd.Series([], dtype=np.int64),
                "offset_tokens": pd.Series([], dtype=np.int64),
                "seq_first": pd.Series([], dtype=np.int64),
                "seq_last": pd.Series([], dtype=np.int64)})
        base = dict(zip(off["r1"].astype(np.int64),
                        off["off"].astype(np.int64)))
        frames = []
        for r1, g in docs.groupby("r1"):
            g = g.sort_values("doc_id")
            n = g["n"].to_numpy()
            o = (int(base[int(r1)])
                 + np.concatenate([[0], n.cumsum()[:-1]]).astype(np.int64))
            last = np.where(n > 0, (o + n - 1) // SEQ_LEN, o // SEQ_LEN)
            frames.append(pd.DataFrame({
                "doc_id": g["doc_id"].to_numpy(),
                "n_bpe_tokens": n,
                "offset_tokens": o,
                "seq_first": o // SEQ_LEN,
                "seq_last": last}))
        return pd.concat(frames, ignore_index=True)

    return bucketed_cogroup(tok, offs, ["r1"], ["r1"], finish,
                            num_buckets=16).sort("doc_id")


SQL_SEQ_PACK = r"""
WITH t AS (
  SELECT doc_id,
         CAST(array_length(regexp_extract_all(text,
           $$'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\t\n\f\r A-Za-z0-9]+|[\t\n\f\r ]+$$))
           AS BIGINT) AS n
  FROM documents
), p AS (
  SELECT doc_id, n,
         CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS off
  FROM t
)
SELECT doc_id,
       n AS n_bpe_tokens,
       off AS offset_tokens,
       off // 2048 AS seq_first,
       CASE WHEN n > 0 THEN (off + n - 1) // 2048
            ELSE off // 2048 END AS seq_last
FROM p ORDER BY doc_id
"""


PACK_QUERIES = {
    "seq_pack": (q_seq_pack, SQL_SEQ_PACK),
}
