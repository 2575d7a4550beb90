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


def q_pdf_spans(sf_dir: str) -> rd.Dataset:
    """Interleaved span recovery through the PDF path: synthesised PDFs
    carry image XObjects between balanced text runs (the SAME chunk
    model as the HTML synth — webparse.content_chunks), ops scrambled
    per page; geometric recovery yields the flagship's ordered
    (kind, text, media_ref) span sequence from the second crawl format.

    Oracle: identical closed form to html_spans (generate_series +
    balanced-chunk substring math) with the xobj:// ref scheme — any
    dropped image, mis-ordered run, or chunk-boundary drift fails the
    value hash."""
    from ..functions import webparse as W

    def fn(batch: pa.Table) -> pa.Table:
        ids, ords, kinds, texts, refs = [], [], [], [], []
        for d, text in zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist()):
            pdf = P.synth_pdf_spans(d, text, W.content_chunks(text))
            for o, (kind, s, name) in enumerate(P.parse_pdf_spans(pdf)):
                ids.append(d)
                ords.append(o)
                kinds.append(kind)
                texts.append(s)
                refs.append(f"xobj://{d}/{name[3:]}" if name else "")
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "ord": pa.array(ords, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "media_ref": pa.array(refs, type=pa.string()),
        })

    return (_docs(sf_dir)
            .map_batches(fn, batch_format="pyarrow")
            .sort(["doc_id", "ord"]))


SQL_PDF_SPANS = r"""
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
            THEN 'xobj://' || doc_id || '/' || CAST(j//2 AS VARCHAR)
            ELSE '' END AS media_ref
FROM spans ORDER BY doc_id, ord
"""


def compare_span_group(group):
    """One doc's spans from both paths -> (1, n_spans, mismatch flag)."""
    import pandas as pd

    h = (group[group["path"] == "html"]
         .sort_values("ord")[["ord", "kind", "text"]]
         .reset_index(drop=True))
    p = (group[group["path"] == "pdf"]
         .sort_values("ord")[["ord", "kind", "text"]]
         .reset_index(drop=True))
    match = len(h) == len(p) and h.equals(p)
    return pd.DataFrame({
        "n_docs": [1],
        "n_spans": [len(h)],
        "n_mismatched_docs": [0 if match else 1],
    })


def q_span_consistency(sf_dir: str) -> rd.Dataset:
    """The north-rule span-equality invariant as a driver-gated query:
    the (kind, text, order) span sequence recovered from the HTML/DOM
    path and from the PDF/geometry path must agree on EVERY document.
    Implemented as a bucketed cogroup on doc_id (never a driver-side
    collect): each group compares its two sequences and emits per-doc
    match counts; one tiny global fold returns a single row.

    Oracle: closed-form — n_docs documents, sum(2k-1) spans, zero
    mismatches."""
    import pandas as pd

    from ..functions import webparse as W

    def html_fn(batch: pa.Table) -> pa.Table:
        from ..functions import webparse as WW
        ids, ords, kinds, texts = [], [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            page = WW.synth_page(d, t)
            for o, (kind, text, _ref) in enumerate(WW.extract_spans(page)):
                ids.append(d); ords.append(o)
                kinds.append(kind); texts.append(text)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "ord": pa.array(ords, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "path": pa.array(["html"] * len(ids), type=pa.string()),
        })

    def pdf_fn(batch: pa.Table) -> pa.Table:
        ids, ords, kinds, texts = [], [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            pdf = P.synth_pdf_spans(d, t, W.content_chunks(t))
            for o, (kind, s, _name) in enumerate(P.parse_pdf_spans(pdf)):
                ids.append(d); ords.append(o)
                kinds.append(kind); texts.append(s)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "ord": pa.array(ords, type=pa.int64()),
            "kind": pa.array(kinds, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
            "path": pa.array(["pdf"] * len(ids), type=pa.string()),
        })

    docs = _docs(sf_dir)
    both = (docs.map_batches(html_fn, batch_format="pyarrow")
                .union(docs.map_batches(pdf_fn, batch_format="pyarrow")))

    per = both.groupby("doc_id").map_groups(compare_span_group,
                                            batch_format="pandas")

    def fold(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "n_docs": pa.array([pc.sum(batch.column("n_docs")).as_py() or 0],
                               type=pa.int64()),
            "n_spans": pa.array([pc.sum(batch.column("n_spans")).as_py() or 0],
                                type=pa.int64()),
            "n_mismatched_docs": pa.array(
                [pc.sum(batch.column("n_mismatched_docs")).as_py() or 0],
                type=pa.int64()),
        })

    # two-level: per-block partial fold, then one final 1-row fold
    return (per.map_batches(fold, batch_format="pyarrow")
               .repartition(1)
               .map_batches(fold, batch_format="pyarrow"))


SQL_SPAN_CONSISTENCY = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN length(text) = 0 THEN 0
                ELSE 2 * greatest(1, (length(text) + 150) // 300) - 1
                END) AS BIGINT) AS n_spans,
       CAST(0 AS BIGINT) AS n_mismatched_docs
FROM documents
"""


PDF_QUERIES = {
    "pdf_layout_text": (q_pdf_layout_text, SQL_PDF_LAYOUT_TEXT),
    "pdf_spans": (q_pdf_spans, SQL_PDF_SPANS),
    "span_consistency": (q_span_consistency, SQL_SPAN_CONSISTENCY),
}
