"""PDF content-stream layout parse (north_rule "PDF/layout parse").

Pins: byte-exact reading-order recovery through the scrambled two-column
synth, PDF string-escape round-trip, closed-form op/page counts, the
scramble guarantee (no multi-op page is emitted in reading order), and
the Ray pipeline end-to-end against the documents table.
"""

from __future__ import annotations

import re
import string

import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    pdfparse as P,
)

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("text", [
    "",
    "a",
    "x" * P.LINE_CHARS,
    "hello (world) \\ back\\slash (nested (parens)) )(",
    "y" * (P.LINE_CHARS * P.OPS_PER_PAGE * 2 + 37),  # 3 pages
])
@pytest.mark.parametrize("doc_id", [0, 4, 7, 11, 9999])
def test_roundtrip(doc_id: int, text: str) -> None:
    t, ops, pages = P.parse_pdf(P.synth_pdf(doc_id, text))
    assert t == text
    assert ops == P.n_ops_for(len(text))
    assert pages == P.n_pages_for(len(text))


def test_scramble_never_reading_order() -> None:
    """Every multi-op page must be emitted scrambled — a parser that
    trusts stream order must fail (this is what makes the geometric sort
    load-bearing rather than decorative)."""
    text = "".join(c * P.LINE_CHARS for c in string.ascii_lowercase[:10])
    op_re = re.compile(r"Tm \(((?:[^()\\]|\\.)*)\) Tj")
    for doc_id in range(200):
        raw = op_re.findall(P.synth_pdf(doc_id, text))
        assert "".join(raw) != text, f"doc {doc_id} emitted in reading order"


def test_parser_is_generic_not_synth_coupled() -> None:
    """The parser sorts by clustered-x column then descending y; it must
    handle layouts the synth never produces (three columns, negative y,
    unsorted pages of differing widths)."""
    pdf = (
        "stream\n"
        "1 0 0 1 400 700 Tm (C1) Tj\n"
        "1 0 0 1 50 650 Tm (A2) Tj\n"
        "1 0 0 1 200 700 Tm (B1) Tj\n"
        "1 0 0 1 50 700 Tm (A1) Tj\n"
        "1 0 0 1 400 -10 Tm (C2) Tj\n"
        "endstream\n"
        "stream\n1 0 0 1 72 720 Tm (P2) Tj\nendstream\n"
    )
    t, ops, pages = P.parse_pdf(pdf)
    assert t == "A1A2B1C1C2P2"
    assert ops == 6
    assert pages == 2


@pytest.mark.parametrize("doc_id,text", [
    (0, ""),
    (1, "a" * 47),
    (3, "z" * 558),
    (7, "(p)\\" * 120),
    (11, "m" * 50_000),       # multi-page interleave
])
def test_spans_roundtrip(doc_id: int, text: str) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
        webparse as W,
    )

    chunks = W.content_chunks(text)
    spans = P.parse_pdf_spans(P.synth_pdf_spans(doc_id, text, chunks))
    expect = []
    for i, c in enumerate(chunks):
        expect.append(("text", c, ""))
        if i < len(chunks) - 1:
            expect.append(("media", "", f"Img{i + 1}"))
    assert spans == expect


def test_spans_match_html_spans_invariant(ray_session) -> None:
    """The SAME (kind, text, order) span sequence must come out of both
    crawl formats — DOM recovery and geometric PDF recovery agree on
    every document (media_ref differs only in the ref scheme)."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.pdfextract import (
        q_pdf_spans,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.webextract import (
        q_html_spans,
    )

    pdf = q_pdf_spans(SF).to_pandas()
    html = q_html_spans(SF).to_pandas()
    assert len(pdf) == len(html) > 0
    for col in ("doc_id", "ord", "kind", "text"):
        assert list(pdf[col]) == list(html[col]), col
    assert list(pdf["media_ref"].str.replace("xobj://", "img://")) == \
        list(html["media_ref"])


def test_span_consistency_detects_disagreement(ray_session) -> None:
    """The consistency fold must actually catch a divergent document —
    feed the per-doc comparator a group where the two paths disagree."""
    import pandas as pd

    # reach the per-doc comparator through a synthetic cogroup frame
    group = pd.DataFrame({
        "doc_id": [1] * 4,
        "ord": [0, 1, 0, 1],
        "kind": ["text", "media", "text", "media"],
        "text": ["abc", "", "abX", ""],
        "path": ["html", "html", "pdf", "pdf"],
    })
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.pdfextract import (
        compare_span_group,
        q_span_consistency,
    )

    assert int(compare_span_group(group)["n_mismatched_docs"].iloc[0]) == 1
    agree = group.copy()
    agree.loc[agree["path"] == "pdf", "text"] = ["abc", ""]
    assert int(compare_span_group(agree)["n_mismatched_docs"].iloc[0]) == 0
    # a missing span is also a mismatch
    short = group[:-1]
    assert int(compare_span_group(short)["n_mismatched_docs"].iloc[0]) == 1

    out = q_span_consistency(SF).to_pandas()
    assert len(out) == 1
    assert int(out["n_mismatched_docs"].iloc[0]) == 0
    assert int(out["n_docs"].iloc[0]) > 0
    assert int(out["n_spans"].iloc[0]) > int(out["n_docs"].iloc[0])


def test_pipeline_end_to_end(ray_session) -> None:
    import duckdb
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.pdfextract import (
        SQL_PDF_LAYOUT_TEXT,
        q_pdf_layout_text,
    )

    got = q_pdf_layout_text(SF).to_pandas()
    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{SF}/documents.parquet"))
    want = con.execute(SQL_PDF_LAYOUT_TEXT).df()
    assert len(got) == len(want) > 0
    for col in ("doc_id", "pdf_text", "n_text_ops", "n_pages"):
        assert list(got[col]) == list(want[col]), col
