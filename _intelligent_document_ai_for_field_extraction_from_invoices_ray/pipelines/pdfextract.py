"""PDF layout parse over synthesised content streams — the crawl
corpus's second document format (north-star scope: "PDF/layout parse";
no counterpart in the reference repo, which OCRs raster scans).

Shape: read ``documents`` (2 columns) -> stateless ``map_batches`` PDF
synthesis -> stateless ``map_batches`` content-stream parse + geometric
reading-order sort (per doc, in-task) -> distributed presentation sort.
No shuffle before the presentation sort, no state, no driver
materialization — embarrassingly parallel at 100 TB, same per-string
kernel class as the HTML/DOM and regex extractors.

Oracle: the synth scrambles op order inside every page (doc-keyed
permutation), so only a parser that re-derives reading order from the
geometry recovers the text; ``pdf_text`` must byte-equal the original
``text`` column and the op/page counts are closed-form in its length.
A parser that trusted stream order would fail the value hash on every
multi-op document.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..functions import pdfparse as P


def _docs(sf_dir: str) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"],
                              rows_per_block=1000)


def synth_pdfs(ds: rd.Dataset) -> rd.Dataset:
    """documents(doc_id, text) -> (doc_id, pdf) — the deterministic PDF
    corpus (reusable by tests / future readers)."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        pdfs = [P.synth_pdf(d, t)
                for d, t in zip(ids, batch.column("text").to_pylist())]
        return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                         "pdf": pa.array(pdfs, type=pa.string())})

    return ds.map_batches(fn, batch_format="pyarrow")


def parse_pdfs(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, pdf) -> (doc_id, pdf_text, n_text_ops, n_pages) via the
    geometric column-cluster + top-down reading-order recovery."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts, n_ops, n_pages = [], [], []
        for pdf in batch.column("pdf").to_pylist():
            t, ops, pages = P.parse_pdf(pdf)
            texts.append(t)
            n_ops.append(ops)
            n_pages.append(pages)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "pdf_text": pa.array(texts, type=pa.string()),
            "n_text_ops": pa.array(n_ops, type=pa.int64()),
            "n_pages": pa.array(n_pages, type=pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow")


def q_pdf_layout_text(sf_dir: str) -> rd.Dataset:
    # lazy: the driver/harness materializes; sort is distributed
    return parse_pdfs(synth_pdfs(_docs(sf_dir))).sort("doc_id")


SQL_PDF_LAYOUT_TEXT = f"""
SELECT doc_id,
       text AS pdf_text,
       CAST(greatest(1, (length(text) + {P.LINE_CHARS - 1})
                        // {P.LINE_CHARS}) AS BIGINT) AS n_text_ops,
       CAST((greatest(1, (length(text) + {P.LINE_CHARS - 1})
                         // {P.LINE_CHARS})
             + {P.OPS_PER_PAGE - 1}) // {P.OPS_PER_PAGE} AS BIGINT)
           AS n_pages
FROM documents ORDER BY doc_id
"""


PDF_QUERIES = {
    "pdf_layout_text": (q_pdf_layout_text, SQL_PDF_LAYOUT_TEXT),
}
