"""HTML main-content extraction: boilerplate stripping via DOM heuristics.

The north-star pipeline's first stage on web-crawl corpora is main-content
extraction — strip navigation / header / footer / sidebar / ad boilerplate
from an HTML page and keep the article text.  This module implements the
published heuristic family (jusText, Pomikálek 2011; trafilatura's DOM
pruning) from scratch as pure functions:

* ``synth_page`` — deterministic HTML page around a document's text
  (4 layout variants keyed by doc_id: nav menus, cookie banners, ad and
  related-article link boxes, sidebars, footers).  The testdata has no
  HTML column, so pages are synthesised from the ``documents`` table at
  any scale with zero external data; the known wrapped text gives the
  extractor a byte-exact oracle (recovered main text == original text).
* ``parse_blocks`` — segment a page into text blocks at block-level tag
  boundaries with per-block link-character counts and pruned-container
  flags (one ``html.parser`` pass, entities decoded).
* ``classify_blocks`` / ``extract_main_text`` — the heuristic: drop
  blocks inside nav/header/footer/aside containers (DOM prune), drop
  link-dense blocks (link_density >= 0.30 — menus, tag clouds, ad and
  related boxes), drop short fragments (< 25 visible chars — captions,
  timestamps); concatenate the surviving block texts in document order.

Whitespace discipline (same as textstats): classification drops blocks
whose text is entirely whitespace, so a (hypothetical) document chunk of
pure whitespace would be lost; the testdata corpus (and typical
extracted text) is single-spaced ASCII with no such runs.

No counterpart in the reference repo (it consumes scanned invoices, not
web pages); this operator exists because the engine's north-star scope
includes HTML boilerplate strip / DOM heuristics over interleaved
documents.
"""

from __future__ import annotations

import html as _html
from html.parser import HTMLParser

# blocks are segmented at these tag boundaries (open OR close)
BLOCK_TAGS = frozenset({
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "td", "tr", "table", "article", "section", "aside", "nav", "footer",
    "header", "main", "body", "html", "blockquote", "br",
})
# entire containers pruned as boilerplate (trafilatura's discard list)
PRUNE_TAGS = frozenset({"nav", "footer", "aside", "header", "script",
                        "style", "form", "noscript"})

MIN_CONTENT_CHARS = 25     # jusText length-low for a "good" block
MAX_LINK_DENSITY = 0.30    # jusText link-density bound

# content paragraphs: ~300-char chunks, balanced so no chunk is ever
# shorter than ~150 (a tail fragment below MIN_CONTENT_CHARS would be
# misclassified as boilerplate and break exact recovery)
CHUNK_CHARS = 300


def content_chunks(text: str) -> list[str]:
    """Split ``text`` into balanced ~CHUNK_CHARS character chunks whose
    concatenation is exactly ``text`` (boundaries carry no separator, so
    recovery is byte-exact).  Empty text -> no chunks."""
    n = len(text)
    if n == 0:
        return []
    k = max(1, (n + CHUNK_CHARS // 2) // CHUNK_CHARS)
    base, rem = divmod(n, k)
    out, pos = [], 0
    for i in range(k):
        size = base + (1 if i < rem else 0)
        out.append(text[pos:pos + size])
        pos += size
    return out


class _BlockParser(HTMLParser):
    """One-pass segmentation into an ordered event stream:
    ``("text", text, link_chars, pruned)`` blocks at block-tag
    boundaries, ``("media", src, in_link, pruned)`` markers at ``img``
    tags — the interleaved span sequence the flagship data model keys
    on."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.events: list[tuple] = []
        self._parts: list[str] = []
        self._link_chars = 0
        self._pruned = False
        self._link_depth = 0
        self._prune_depth = 0

    def _flush(self) -> None:
        if self._parts:
            self.events.append(("text", "".join(self._parts),
                                self._link_chars, self._pruned))
        self._parts = []
        self._link_chars = 0
        self._pruned = self._prune_depth > 0

    def handle_starttag(self, tag, attrs):
        if tag in BLOCK_TAGS:
            self._flush()
        if tag in PRUNE_TAGS:
            self._prune_depth += 1
            self._pruned = True
        elif tag == "a":
            self._link_depth += 1
        elif tag == "img":
            src = next((v for k, v in attrs if k == "src"), "")
            self.events.append(("media", src, self._link_depth > 0,
                                self._prune_depth > 0))

    def handle_endtag(self, tag):
        if tag in BLOCK_TAGS:
            self._flush()
        if tag in PRUNE_TAGS:
            self._prune_depth = max(0, self._prune_depth - 1)
            self._pruned = self._pruned or self._prune_depth > 0
        elif tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_data(self, data):
        if not data:
            return
        self._parts.append(data)
        if self._link_depth > 0:
            self._link_chars += len(data)
        if self._prune_depth > 0:
            self._pruned = True

    def close(self):
        super().close()
        self._flush()


def parse_events(page: str) -> list[tuple]:
    """One parser pass over a page: the ordered text-block / media-marker
    event stream (see ``_BlockParser``)."""
    p = _BlockParser()
    p.feed(page)
    p.close()
    return p.events


def parse_blocks(page: str) -> list[tuple[str, int, bool]]:
    """Segment an HTML page into (text, link_chars, in_pruned_container)
    blocks in document order.  Entities are decoded; whitespace inside
    text is preserved verbatim (no browser-style collapsing — the
    extractor's output must be byte-exact, not render-equivalent)."""
    return [(t, lc, pr) for kind, t, lc, pr in parse_events(page)
            if kind == "text"]


def is_content(text: str, link_chars: int, pruned: bool) -> bool:
    """The block-level heuristic: DOM prune, then link density, then
    length — the jusText 'good block' conditions."""
    if pruned:
        return False
    visible = text.strip()
    if not visible:
        return False
    if link_chars / len(text) >= MAX_LINK_DENSITY:
        return False
    return len(visible) >= MIN_CONTENT_CHARS


def extract_main_text(page: str) -> tuple[str, int, int]:
    """Strip boilerplate; returns (main_text, n_content_blocks,
    n_boiler_blocks).  main_text is the concatenation of content-block
    texts in document order; boiler count excludes whitespace-only
    template blocks (they are neither content nor meaningful
    boilerplate, just markup indentation)."""
    kept: list[str] = []
    n_boiler = 0
    for text, link_chars, pruned in parse_blocks(page):
        if is_content(text, link_chars, pruned):
            kept.append(text)
        elif text.strip():
            n_boiler += 1
    return "".join(kept), len(kept), n_boiler


def extract_spans(page: str) -> list[tuple[str, str, str]]:
    """The interleaved-span view of a page: ordered (kind, text,
    media_ref) tuples for the CONTENT spans only — text blocks by the
    ``is_content`` heuristic; images by the media heuristics (an image
    inside a pruned container is chrome, an image inside a link is an ad
    or logo banner — both dropped; a bare image in the content flow is
    kept).  This is the flagship span model's (kind, text, media_ref,
    order) invariant recovered from markup instead of OCR."""
    out: list[tuple[str, str, str]] = []
    for ev in parse_events(page):
        if ev[0] == "text":
            _, text, link_chars, pruned = ev
            if is_content(text, link_chars, pruned):
                out.append(("text", text, ""))
        else:
            _, src, in_link, pruned = ev
            if not pruned and not in_link:
                out.append(("media", "", src))
    return out


# --------------------------------------------------------------- synthesis
_NAV_ITEMS = ["Home", "Products", "Pricing", "Docs", "Blog", "About",
              "Careers", "Support", "Contact", "Login"]
_TAGS = ["analytics", "cloud", "data", "engine", "fast", "query",
         "scale", "stream"]


def _nav(doc_id: int) -> str:
    items = [_NAV_ITEMS[(doc_id + i) % len(_NAV_ITEMS)] for i in range(5)]
    lis = "".join(f'<li><a href="/{w.lower()}">{w}</a></li>' for w in items)
    return f'<nav><ul>{lis}</ul></nav>'


def _header(doc_id: int) -> str:
    # the logo image sits in a pruned container — chrome, not content
    return (f'<header><img src="img://site{doc_id % 7}/logo" alt="">'
            f'<h1><a href="/">Example Site {doc_id % 7}</a></h1>'
            f'{_nav(doc_id)}</header>')


def _footer(doc_id: int) -> str:
    links = "".join(f'<a href="/{w}">{w}</a> | '
                    for w in ("privacy", "terms", "sitemap"))
    return (f'<footer><p>{links}&copy; 2026 Example Site {doc_id % 7}. '
            f'All rights reserved.</p></footer>')


def _sidebar(doc_id: int) -> str:
    lis = "".join(
        f'<li><a href="/t/{t}">{t}</a></li>'
        for t in (_TAGS[(doc_id + i) % len(_TAGS)] for i in range(4)))
    return (f'<aside><h3>Popular tags</h3><ul>{lis}</ul>'
            f'<p>Subscribe to our newsletter for weekly updates '
            f'and exclusive offers.</p></aside>')


def _cookie(doc_id: int) -> str:
    # cookie banners carry long low-link-density text -> must live in a
    # pruned container (aside), exactly where real consent widgets sit
    return ('<aside class="cookie"><p>We use cookies to improve your '
            'experience and analyze traffic on example site '
            f'{doc_id % 7}. <a href="/accept">Accept</a> '
            '<a href="/decline">Decline</a></p></aside>')


def _related(doc_id: int) -> str:
    ps = "".join(
        f'<p><a href="/post/{doc_id + i}">Related article {doc_id + i}</a>'
        f' &middot; 5 min</p>' for i in range(1, 4))
    return f'<div class="related"><h4>Read next</h4>{ps}</div>'


def _ad(doc_id: int) -> str:
    # the banner image is wrapped in the link — the ad heuristic's target
    return (f'<div class="ad"><p><a href="/buy/{doc_id % 11}">'
            f'<img src="img://ads/banner{doc_id % 11}" alt="">Great '
            f'deals on plan {doc_id % 11} — Buy now!</a></p></div>')


def _article(doc_id: int, text: str) -> str:
    """Content chunks as paragraphs with a bare figure image between
    every pair — the interleaved text+media document: chunk 1, img 1,
    chunk 2, img 2, ..., chunk k (media_ref img://{doc_id}/{i})."""
    parts: list[str] = []
    chunks = content_chunks(text)
    for i, chunk in enumerate(chunks, start=1):
        parts.append(f"<p>{_html.escape(chunk)}</p>")
        if i < len(chunks):
            parts.append(f'<img src="img://{doc_id}/{i}" alt="">')
    return f"<article>{''.join(parts)}</article>"


def synth_page(doc_id: int, text: str) -> str:
    """Deterministic HTML page wrapping ``text`` as the main content.
    Four layout variants (doc_id % 4); every boilerplate block is either
    inside a pruned container, link-dense, or short — the regimes the
    published heuristics target (and the reason they work on real
    pages)."""
    v = doc_id % 4
    art = _article(doc_id, text)
    if v == 0:
        body = f"{_header(doc_id)}<main>{art}</main>{_footer(doc_id)}"
    elif v == 1:
        body = (f"{_header(doc_id)}<main>{art}{_related(doc_id)}</main>"
                f"{_sidebar(doc_id)}{_footer(doc_id)}")
    elif v == 2:
        body = (f"{_cookie(doc_id)}{_nav(doc_id)}<main>{_ad(doc_id)}{art}"
                f"</main>{_footer(doc_id)}")
    else:
        body = (f"{_nav(doc_id)}<main>{art}{_ad(doc_id)}{_related(doc_id)}"
                f"</main>{_footer(doc_id)}")
    return (f"<!DOCTYPE html><html><head><title>Doc {doc_id}</title>"
            f"</head><body>{body}</body></html>")
