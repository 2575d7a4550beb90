"""Stateless span-normalization stage (Arrow in / Arrow out).

Adds ``norm_text`` (full normalizer chain, normalizer.py:153-208) — the
regex work happens HERE, in the embarrassingly-parallel pre-shuffle
stage, with a per-batch memo over distinct strings — the idiomatic
replacement for the reference's process-wide lru_caches.  Media spans get
identity values ('') at zero cost.

Exchange discipline: this stage deliberately does NOT ship per-span
``language`` or ``confidence`` through the reassembly shuffle.  The
block-level language is metadata the reference extractor never reads
(ocr.py:295 computes it, the extractor ignores it — the M8 operator lives
in textnorm / the lang_id query), and the OCR-style confidence is a pure
function of (doc_id, offset) that ``process_document`` recomputes
post-shuffle for free — 8 B/span that never need to move.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions import textnorm as T


def normalize_spans(batch: pa.Table) -> pa.Table:
    kind = batch.column("kind").to_pylist()
    text = batch.column("text").to_pylist()

    n = len(kind)
    norm = [""] * n
    norm_memo: dict[str, str] = {}
    for i in range(n):
        if kind[i] == "media":
            continue
        t = text[i]
        r = norm_memo.get(t)
        if r is None:
            r = T.normalize_text(t)
            norm_memo[t] = r
        norm[i] = r

    return batch.append_column("norm_text", pa.array(norm, type=pa.string()))
