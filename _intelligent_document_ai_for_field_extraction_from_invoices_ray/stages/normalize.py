"""Stateless span-normalization stage (Arrow in / Arrow out).

Adds the per-span derived columns the reassembly stage consumes:
``norm_text`` (full normalizer chain, normalizer.py:153-208), ``language``
(OCR >30% variant, ocr.py:314-348) and the deterministic OCR-style
``confidence``.  Regex work happens HERE, in the embarrassingly-parallel
pre-shuffle stage, with a per-batch memo over distinct strings — the
idiomatic replacement for the reference's process-wide lru_caches.  Media
spans get identity values ('' / 'unknown') at zero cost via a mask.
"""

from __future__ import annotations

from zlib import crc32

import numpy as np
import pyarrow as pa

from ..functions import textnorm as T


def normalize_spans(batch: pa.Table) -> pa.Table:
    kind = batch.column("kind").to_pylist()
    text = batch.column("text").to_pylist()
    doc_id = batch.column("doc_id").to_pylist()
    offset = batch.column("offset").to_numpy(zero_copy_only=False)

    n = len(kind)
    norm = [""] * n
    lang = ["unknown"] * n
    conf = np.zeros(n, dtype=np.float64)
    norm_memo: dict[str, str] = {}
    lang_memo: dict[str, str] = {}
    for i in range(n):
        if kind[i] == "media":
            continue
        t = text[i]
        r = norm_memo.get(t)
        if r is None:
            r = T.normalize_text(t)
            norm_memo[t] = r
        norm[i] = r
        lg = lang_memo.get(t)
        if lg is None:
            lg = T.detect_language_ocr(t.strip())
            lang_memo[t] = lg
        lang[i] = lg
        conf[i] = 0.70 + (crc32(f"{doc_id[i]}|{offset[i]}".encode()) % 29) / 100.0

    return (batch
            .append_column("norm_text", pa.array(norm, type=pa.string()))
            .append_column("language", pa.array(lang, type=pa.string()))
            .append_column("confidence", pa.array(conf)))
