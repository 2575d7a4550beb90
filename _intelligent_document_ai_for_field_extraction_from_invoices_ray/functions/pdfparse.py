"""PDF content-stream layout parse: reading-order text recovery.

The north-star pipeline's scope names "PDF/layout parse" alongside HTML
boilerplate stripping: a crawl corpus carries PDFs whose text must be
recovered in READING order even though the PDF imaging model gives no
ordering guarantee — a content stream may emit its text-show operators in
any sequence (generators commonly emit by font run or compression
locality), and multi-column layouts interleave columns arbitrarily.  The
published recovery approach (pdfminer/pdftotext's layout analysis,
Tamir's XY-cut family) is geometric: place each text op at its device
coordinates, cluster x into columns, then read columns left-to-right and
each column top-to-bottom.

This module implements that from scratch as pure functions over a
minimal-but-real subset of PDF syntax (ISO 32000 §9.4 text-showing
operators with literal strings, §7.3.4.2 string escapes):

* ``synth_pdf`` — deterministic PDF document around a ``documents`` row:
  the text is cut into fixed-width ``LINE_CHARS`` lines, laid out in a
  two-column grid over as many pages as needed, and the text ops inside
  every page are emitted in a SCRAMBLED deterministic permutation (keyed
  by doc_id), so a parser that trusts stream order produces garbage.
  PDF string escapes (``\\(`` ``\\)`` ``\\\\``) are applied, so texts
  containing parentheses/backslashes round-trip.
* ``parse_pdf`` — per page: regex-scan ``... Tm (...) Tj`` ops, unescape,
  cluster the x coordinates into columns (sorted unique x), sort ops by
  (page, column, -y), concatenate.  Byte-exact oracle: the recovered
  text equals the original column for every document.

No counterpart in the reference repo (it consumes raster scans through
OCR, never digital PDFs); cited scope: north_rule "PDF/layout parse".
"""

from __future__ import annotations

import math
import re

LINE_CHARS = 80          # chars per text-show op (one laid-out line)
COL_XS = (72, 320)       # left edge of each column (device points)
Y_TOP = 720              # first baseline
Y_STEP = 14              # leading
LINES_PER_COL = 46       # 720 down to 90 inclusive
OPS_PER_PAGE = 2 * LINES_PER_COL  # 92


def n_ops_for(n_chars: int) -> int:
    """Closed-form op count (empty text still emits one empty op so the
    document keeps a presence in the output)."""
    return max(1, (n_chars + LINE_CHARS - 1) // LINE_CHARS)


def n_pages_for(n_chars: int) -> int:
    return (n_ops_for(n_chars) + OPS_PER_PAGE - 1) // OPS_PER_PAGE


def _escape(s: str) -> str:
    return (s.replace("\\", "\\\\")
             .replace("(", "\\(")
             .replace(")", "\\)"))


_UNESCAPE_RE = re.compile(r"\\([\\()])")


def _unescape(s: str) -> str:
    return _UNESCAPE_RE.sub(r"\1", s)


def _perm_stride(doc_id: int, m: int) -> int:
    """Smallest odd stride >= the doc-keyed seed that is coprime to m —
    i -> (i * stride) % m is then a permutation of range(m)."""
    stride = (doc_id % 7) * 2 + 3
    while math.gcd(stride, m) != 1:
        stride += 2
    return stride


def synth_pdf(doc_id: int, text: str) -> str:
    """Deterministic two-column PDF for one document.  Ops inside each
    page are emitted in a scrambled (doc-keyed) permutation of their
    reading order; coordinates alone define that order."""
    chunks = [text[i:i + LINE_CHARS]
              for i in range(0, len(text), LINE_CHARS)] or [""]
    pages: list[list[str]] = []
    for i, chunk in enumerate(chunks):
        page, slot = divmod(i, OPS_PER_PAGE)
        col, line = divmod(slot, LINES_PER_COL)
        x = COL_XS[col]
        y = Y_TOP - Y_STEP * line
        if page == len(pages):
            pages.append([])
        pages[page].append(f"1 0 0 1 {x} {y} Tm ({_escape(chunk)}) Tj")
    out = [f"%PDF-1.4\n% synthetic doc {doc_id}"]
    for p, ops in enumerate(pages):
        m = len(ops)
        stride = _perm_stride(doc_id + p, m)
        # nonzero rotation: even a stride = 1 (mod m) draw stays scrambled,
        # so NO multi-op page is ever emitted in reading order
        offset = 1 + (doc_id + p) % (m - 1) if m > 1 else 0
        scrambled = [ops[(j * stride + offset) % m] for j in range(m)]
        body = "\n".join(["BT", "/F1 10 Tf", *scrambled, "ET"])
        out.append(f"stream\n{body}\nendstream")
    out.append("%%EOF")
    return "\n".join(out)


_OP_RE = re.compile(
    r"1 0 0 1 (-?\d+) (-?\d+) Tm \(((?:[^()\\]|\\.)*)\) Tj")

# image XObject invocation (ISO 32000 §8.8/§8.10: q <cm> /Name Do Q)
_IMG_RE = re.compile(r"q 1 0 0 1 (-?\d+) (-?\d+) cm /(\w+) Do Q")


def parse_pdf(pdf: str) -> tuple[str, int, int]:
    """Recover reading-order text from a PDF's page content streams.

    Returns ``(text, n_text_ops, n_pages)``.  Per page: collect
    (x, y, string) from the text-show ops, cluster x values into columns
    (sorted unique x — the generic multi-column case), then sort by
    (column, -y, x) and concatenate.  Pages concatenate in document
    order.  Nothing here assumes the synth's scramble, line width, or
    column count."""
    parts: list[str] = []
    n_ops = 0
    n_pages = 0
    pos = 0
    while True:
        start = pdf.find("stream\n", pos)
        if start < 0:
            break
        end = pdf.find("endstream", start)
        if end < 0:
            end = len(pdf)
        page = pdf[start:end]
        pos = end + 9
        n_pages += 1
        ops = [(int(x), int(y), _unescape(s))
               for x, y, s in _OP_RE.findall(page)]
        n_ops += len(ops)
        col_of = {x: i for i, x in enumerate(sorted({x for x, _, _ in ops}))}
        ops.sort(key=lambda t: (col_of[t[0]], -t[1], t[0]))
        parts.extend(s for _, _, s in ops)
    return "".join(parts), n_ops, n_pages


def synth_pdf_spans(doc_id: int, text: str, chunks: list[str]) -> str:
    """Interleaved text+media PDF for one document: the span sequence
    (chunk 0, img 0, chunk 1, img 1, ..., chunk k-1) laid out one
    element per grid slot, image XObjects between the text runs, ops
    scrambled per page exactly like ``synth_pdf``.  ``chunks`` is the
    balanced content-chunk split shared with the HTML synth
    (webparse.content_chunks) so both crawl formats carry the SAME span
    model."""
    elems: list[tuple[str, str]] = []
    for i, chunk in enumerate(chunks):
        elems.append(("text", chunk))
        if i < len(chunks) - 1:
            # 1-based like the HTML synth's img index (webparse), so both
            # formats' oracles share the j//2 closed form
            elems.append(("media", f"Img{i + 1}"))
    pages: list[list[str]] = []
    for i, (kind, payload) in enumerate(elems):
        page, slot = divmod(i, OPS_PER_PAGE)
        col, line = divmod(slot, LINES_PER_COL)
        x = COL_XS[col]
        y = Y_TOP - Y_STEP * line
        if page == len(pages):
            pages.append([])
        if kind == "text":
            pages[page].append(f"1 0 0 1 {x} {y} Tm ({_escape(payload)}) Tj")
        else:
            pages[page].append(f"q 1 0 0 1 {x} {y} cm /{payload} Do Q")
    out = [f"%PDF-1.4\n% synthetic interleaved doc {doc_id}"]
    if not pages:
        pages = [[]]  # media-less empty doc still gets an (empty) page
    for p, ops in enumerate(pages):
        m = len(ops)
        if m > 1:
            stride = _perm_stride(doc_id + p, m)
            offset = 1 + (doc_id + p) % (m - 1)
            ops = [ops[(j * stride + offset) % m] for j in range(m)]
        body = "\n".join(["BT", "/F1 10 Tf", *ops, "ET"])
        out.append(f"stream\n{body}\nendstream")
    out.append("%%EOF")
    return "\n".join(out)


def parse_pdf_spans(pdf: str) -> list[tuple[str, str, str]]:
    """Recover the ordered (kind, text, xobject_name) span sequence from
    a PDF's pages: collect text-show AND image-XObject ops with their
    device coordinates, then read each page column-by-column, top-down —
    the same geometric recovery as ``parse_pdf``, now over a
    heterogeneous op stream."""
    spans: list[tuple[str, str, str]] = []
    pos = 0
    while True:
        start = pdf.find("stream\n", pos)
        if start < 0:
            break
        end = pdf.find("endstream", start)
        if end < 0:
            end = len(pdf)
        page = pdf[start:end]
        pos = end + 9
        ops: list[tuple[int, int, str, str, str]] = []
        for x, y, s in _OP_RE.findall(page):
            ops.append((int(x), int(y), "text", _unescape(s), ""))
        for x, y, name in _IMG_RE.findall(page):
            ops.append((int(x), int(y), "media", "", name))
        col_of = {x: i for i, x in enumerate(sorted({o[0] for o in ops}))}
        ops.sort(key=lambda t: (col_of[t[0]], -t[1], t[0]))
        spans.extend((k, s, ref) for _, _, k, s, ref in ops)
    return spans
