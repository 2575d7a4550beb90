"""Span recovery: explode nested docs into span rows, zero-copy Arrow.

The Ray analog of OCR word emission (utils/ocr.py:275-300): each input row
``(doc_id, spans)`` fans out to one row per span.  Implemented with
``pyarrow.compute`` list kernels — ``list_parent_indices`` + ``take`` plus
struct-field flattening — so no Python row loop touches the hot path.

Also stamps the two shuffle keys used downstream:
- ``_part``: ``crc32(doc_id) % num_partitions`` — the reassembly/output
  partition (deterministic, resume-stable);
- ``_salt``: ``(crc32(doc_id) ^ (offset // salt_span)) % salt_buckets`` —
  used by the optional pre-classify ``repartition(shuffle=True)`` so one
  media-heavy document's spans spread across many blocks instead of
  hot-spotting a single classify actor (north-rule skew handling).
"""

from __future__ import annotations

from zlib import crc32

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SALT_SPAN = 64          # spans per salt bucket within one document


def _crc32_array(strings: pa.Array) -> np.ndarray:
    # vectorized-enough: one C-level crc32 per distinct doc_id in the batch
    py = strings.to_pylist()
    memo: dict[str, int] = {}
    out = np.empty(len(py), dtype=np.int64)
    for i, s in enumerate(py):
        v = memo.get(s)
        if v is None:
            v = crc32(s.encode("utf-8"))
            memo[s] = v
        out[i] = v
    return out


def make_explode(num_partitions: int, salt_buckets: int):
    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        parent = pc.list_parent_indices(spans)
        doc_id = pc.take(batch.column("doc_id"), parent)
        flat = pc.list_flatten(spans)
        offset = flat.field("offset")
        doc_hash = _crc32_array(doc_id.combine_chunks() if isinstance(doc_id, pa.ChunkedArray) else doc_id)
        off_np = offset.to_numpy(zero_copy_only=False).astype(np.int64)
        part = (doc_hash % num_partitions).astype(np.int32)
        salt = ((doc_hash ^ (off_np // SALT_SPAN)) % salt_buckets).astype(np.int32)
        return pa.table({
            "doc_id": doc_id,
            "kind": flat.field("kind"),
            "text": flat.field("text"),
            "media_ref": flat.field("media_ref"),
            "offset": offset,
            "_part": pa.array(part),
            "_salt": pa.array(salt),
        })

    return explode


def partition_of(doc_id: str, num_partitions: int) -> int:
    return crc32(doc_id.encode("utf-8")) % num_partitions
