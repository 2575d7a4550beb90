"""Main-content extraction over synthesised HTML pages — the web-crawl
front door of the engine (north-star scope: HTML boilerplate strip / DOM
heuristics over interleaved documents; no counterpart in the reference
repo, which consumes scanned invoices).

Shape: read ``documents`` (2 columns) -> stateless ``map_batches`` page
synthesis -> stateless ``map_batches`` DOM-parse + density classify ->
distributed sort.  No shuffle before the presentation sort, no state, no
driver materialization — at 100 TB this is embarrassingly parallel and
the per-doc ``html.parser`` pass is the same inherently-per-string kernel
class as the regex extractors (the batch is the vectorization unit).

Oracle: synthesis wraps KNOWN text in KNOWN boilerplate, so recovery must
be byte-exact — ``main_text`` equals the original ``text`` column, and
the block counts are closed-form in (length, doc_id % 4).  The SQL side
recomputes all three from the base table; a single flipped char, lost
chunk, or misclassified block fails the value-hash gate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import webparse as W

# boilerplate blocks per layout variant (doc_id % 4) — structural
# constants of the synth templates, pinned by tests/test_webextract.py
_BOILER_PER_VARIANT = (8, 18, 9, 12)


def _docs(sf_dir: str) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    # per-doc DOM parse is the heaviest per-row text kernel in the repo —
    # small blocks so the actorless task pool parallelizes early
    return read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"],
                              rows_per_block=1000)


def synth_pages(ds: rd.Dataset) -> rd.Dataset:
    """documents(doc_id, text) -> (doc_id, page) — the deterministic HTML
    corpus.  Split out so other consumers (tests, future readers) can
    reuse the synthetic web corpus without the extractor."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pages = [W.synth_page(d, t)
                 for d, t in zip(ids, batch.column("text").to_pylist())]
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "page": pa.array(pages, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def strip_pages(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, page) -> (doc_id, main_text, n_content_blocks,
    n_boiler_blocks) via the DOM-prune + link-density + length
    heuristic."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts, n_content, n_boiler = [], [], []
        for page in batch.column("page").to_pylist():
            main, nc, nb = W.extract_main_text(page)
            texts.append(main)
            n_content.append(nc)
            n_boiler.append(nb)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "main_text": pa.array(texts, type=pa.string()),
            "n_content_blocks": pa.array(n_content, type=pa.int64()),
            "n_boiler_blocks": pa.array(n_boiler, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def q_html_main_text(sf_dir: str) -> rd.Dataset:
    # lazy: the driver/harness materializes; sort is distributed
    return strip_pages(synth_pages(_docs(sf_dir))).sort("doc_id")


SQL_HTML_MAIN_TEXT = f"""
SELECT doc_id,
       text AS main_text,
       CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
            ELSE greatest(CAST(1 AS BIGINT),
                          CAST((length(text) + {W.CHUNK_CHARS // 2}) AS BIGINT)
                          // {W.CHUNK_CHARS})
       END AS n_content_blocks,
       CAST(CASE doc_id % 4
            WHEN 0 THEN {_BOILER_PER_VARIANT[0]}
            WHEN 1 THEN {_BOILER_PER_VARIANT[1]}
            WHEN 2 THEN {_BOILER_PER_VARIANT[2]}
            ELSE {_BOILER_PER_VARIANT[3]} END AS BIGINT) AS n_boiler_blocks
FROM documents ORDER BY doc_id
"""


def q_html_spans(sf_dir: str) -> rd.Dataset:
    """Interleaved span recovery through the DOM path: every page yields
    its ordered (kind, text, media_ref) content-span sequence — text
    blocks by the density heuristic, figure images kept, logo (pruned
    header) and ad-banner (inside-link) images dropped.  The flagship's
    span-sequence invariant, recovered from markup instead of OCR.

    Oracle: the synth places img i after content chunk i, so the whole
    sequence is closed-form in (text, doc_id) — any dropped figure,
    kept ad, or mis-ordered span fails the value hash."""

    def fn(batch: pa.Table) -> pa.Table:
        ids, ords, kinds, texts, refs = [], [], [], [], []
        for d, page in zip(batch.column("doc_id").to_pylist(),
                           batch.column("page").to_pylist()):
            for o, (kind, text, ref) in enumerate(W.extract_spans(page)):
                ids.append(d)
                ords.append(o)
                kinds.append(kind)
                texts.append(text)
                refs.append(ref)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "ord": pa.array(ords, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "media_ref": pa.array(refs, type=pa.string()),
        })

    return (synth_pages(_docs(sf_dir))
            .map_batches(fn, batch_format="pyarrow")
            .sort(["doc_id", "ord"]))


SQL_HTML_SPANS = r"""
WITH base AS (
  SELECT doc_id, text, length(text) AS n,
         CASE WHEN length(text) = 0 THEN 0
              ELSE greatest(1, (length(text) + 150) // 300) END AS k
  FROM documents
), spans AS (
  SELECT doc_id, text, n, k,
         unnest(generate_series(1, CASE WHEN k = 0 THEN 0
                                        ELSE 2*k - 1 END)) AS j
  FROM base
)
SELECT doc_id,
       CAST(j - 1 AS BIGINT) AS ord,
       CASE WHEN j % 2 = 1 THEN 'text' ELSE 'media' END AS kind,
       CASE WHEN j % 2 = 1 THEN
         substring(text,
                   CAST(((j+1)//2 - 1) * (n // k)
                        + least((j+1)//2 - 1, n % k) + 1 AS BIGINT),
                   CAST(n // k + CASE WHEN (j+1)//2 <= n % k
                                 THEN 1 ELSE 0 END AS BIGINT))
       ELSE '' END AS text,
       CASE WHEN j % 2 = 0
            THEN 'img://' || doc_id || '/' || CAST(j//2 AS VARCHAR)
            ELSE '' END AS media_ref
FROM spans ORDER BY doc_id, ord
"""


WEB_QUERIES = {
    "html_main_text": (q_html_main_text, SQL_HTML_MAIN_TEXT),
    "html_spans": (q_html_spans, SQL_HTML_SPANS),
}
