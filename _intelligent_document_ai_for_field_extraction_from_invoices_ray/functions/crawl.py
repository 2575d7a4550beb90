"""Crawl-ingestion kernels: WARC record framing and URL normalization.

A web-scale extraction engine's front door is crawl data: WARC files
(ISO 28500 — concatenated length-framed records) and messy URLs that
must be canonicalized before any per-domain grouping or dedup.  Pure
functions, synthesised deterministically from the ``documents`` table
(the testdata carries no crawl columns), giving every operator a
closed-form byte-exact oracle:

* ``synth_warc_record`` / ``parse_warc`` — one WARC/1.0 response record
  per document wrapping an HTTP response around the text; records
  concatenate into segment blobs and the parser walks them strictly by
  ``Content-Length`` framing (a payload containing ``WARC/1.0`` must NOT
  split a record — pinned by test).
* ``synth_messy_url`` / ``normalize_url`` — six deterministic messy
  spellings of each document's canonical URL (case games, default
  ports, fragments, dot-segments, percent-encoded unreserved chars,
  shuffled query params); RFC 3986 §6 normalization must map every
  variant back to the canonical form.

No counterpart in the reference repo (scanned invoices, not crawls);
scope: the north-star's web-crawl corpus framing.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

HTTP_HEAD = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"
HTTP_HEAD_LEN = len(HTTP_HEAD)  # 47
SEGMENT_DOCS = 16  # documents per WARC segment blob


def canonical_url(doc_id: int, source: str, lang: str) -> str:
    host = f"{source}.site{doc_id % 13}.org"
    return f"https://{host}/{lang}/doc/{doc_id}?a=1&b=2"


def robots_rules() -> list[tuple[int, str, bool]]:
    """Deterministic per-host-number robots.txt rule set, ``(k, path,
    allow)`` with ``k = doc_id % 13`` (the host-number in the synthetic
    URL scheme).  Every host gets an explicit root rule so every URL has
    at least one match; within any one URL's matching set the rule
    LENGTHS are distinct by construction (a URL path starts with exactly
    one language segment), so RFC 9309 longest-match needs no
    allow-wins tie-break here.  The same list renders both the engine's
    broadcast table and the SQL oracle's VALUES clause."""
    rules: list[tuple[int, str, bool]] = []
    for k in range(13):
        rules.append((k, "/", k % 5 != 0))            # blanket policy
        rules.append((k, "/en/", k % 2 == 0))         # language carve-out
        if k % 3 == 0:
            rules.append((k, "/de/doc/", False))      # section block
        if k % 4 == 1:
            rules.append((k, "/zh/", False))
        if k % 4 == 2:
            rules.append((k, "/en/doc/1", False))     # id-prefix block
    return rules


def registered_domain(host: str) -> str:
    """Effective registrable domain — last two labels (the public-suffix
    list is a data file, not an algorithm; two-label suffices for the
    synthetic TLD set and is the standard fallback)."""
    return ".".join(host.rsplit(".", 2)[-2:])


def synth_warc_record(doc_id: int, source: str, lang: str,
                      text: str) -> str:
    payload = HTTP_HEAD + text
    return (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:doc-{doc_id}>\r\n"
        f"WARC-Target-URI: {canonical_url(doc_id, source, lang)}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
        f"{payload}\r\n\r\n"
    )


_CL_RE = re.compile(r"^Content-Length: (\d+)$")


def parse_warc(blob: str) -> list[dict]:
    """Split a concatenated-record WARC blob by Content-Length framing
    (never by searching for the magic — payloads may contain it) and
    parse each record's headers + HTTP payload.

    Returns dicts with record_id, target_uri, content_length, text."""
    out: list[dict] = []
    pos = 0
    n = len(blob)
    while pos < n:
        if not blob.startswith("WARC/1.0\r\n", pos):
            raise ValueError(f"bad record magic at offset {pos}")
        head_end = blob.index("\r\n\r\n", pos)
        headers: dict[str, str] = {}
        for line in blob[pos + 10:head_end].split("\r\n"):
            k, _, v = line.partition(": ")
            headers[k] = v
        clen = int(headers["Content-Length"])
        body_start = head_end + 4
        payload = blob[body_start:body_start + clen]
        if blob[body_start + clen:body_start + clen + 4] != "\r\n\r\n":
            raise ValueError("record not terminated by CRLF CRLF")
        pos = body_start + clen + 4
        if not payload.startswith(HTTP_HEAD):
            raise ValueError("payload missing HTTP response head")
        out.append({
            "record_id": headers["WARC-Record-ID"],
            "target_uri": headers["WARC-Target-URI"],
            "content_length": clen,
            "text": payload[HTTP_HEAD_LEN:],
        })
    return out


def _pct_encode_letter(s: str) -> str:
    """Percent-encode every ascii letter in ``s`` (unreserved chars —
    RFC 3986 §2.3 says encoders SHOULD NOT, so normalizers MUST decode
    them)."""
    return "".join(f"%{ord(c):02X}" if c.isalpha() else c for c in s)


def synth_messy_url(doc_id: int, source: str, lang: str) -> str:
    """A deterministic messy spelling (variant = doc_id % 6) of the
    document's canonical URL."""
    host = f"{source}.site{doc_id % 13}.org"
    path = f"/{lang}/doc/{doc_id}"
    v = doc_id % 6
    if v == 0:
        return f"https://{host}{path}?a=1&b=2"
    if v == 1:  # scheme/host case + default port + shuffled query
        return f"HTTPS://{host.upper()}:443{path}?b=2&a=1"
    if v == 2:  # dot-segments + fragment
        return (f"https://{host}/x/../{lang}/./doc/{doc_id}"
                f"?a=1&b=2#frag")
    if v == 3:  # percent-encoded unreserved path chars
        return (f"https://{host}/{_pct_encode_letter(lang)}/"
                f"{_pct_encode_letter('doc')}/{doc_id}?a=1&b=2")
    if v == 4:  # port + fragment + mixed host case
        mixed = "".join(c.upper() if i % 2 else c
                        for i, c in enumerate(host))
        return f"https://{mixed}:443{path}?b=2&a=1#x?y"
    # v == 5: shuffled query + trailing dot-segment noise
    return f"https://{host}/{lang}/doc/./{doc_id}?b=2&a=1"


_PCT_RE = re.compile(r"%([0-9A-Fa-f]{2})")
_UNRESERVED = frozenset(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~")


def _decode_unreserved(s: str) -> str:
    def sub(m: re.Match) -> str:
        c = chr(int(m.group(1), 16))
        return c if c in _UNRESERVED else "%" + m.group(1).upper()
    return _PCT_RE.sub(sub, s)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out and out[-1]:
                out.pop()
            continue
        out.append(seg)
    # preserve leading slash; a trailing "." or ".." leaves a trailing /
    norm = "/".join(out)
    if path.endswith(("/.", "/..")) and not norm.endswith("/"):
        norm += "/"
    if not norm.startswith("/"):
        norm = "/" + norm
    return norm


_DEFAULT_PORTS = {"http": "80", "https": "443"}


def normalize_url(url: str) -> str:
    """RFC 3986 §6 syntax-based normalization: lowercase scheme+host,
    strip default port, decode percent-encoded unreserved chars,
    uppercase remaining escapes, remove dot-segments, drop the fragment,
    sort query parameters."""
    parts = urlsplit(url)
    scheme = parts.scheme.lower()
    host = parts.hostname.lower() if parts.hostname else ""
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = _remove_dot_segments(_decode_unreserved(parts.path or "/"))
    query = _decode_unreserved(parts.query)
    if query:
        query = "&".join(sorted(query.split("&")))
    return f"{scheme}://{netloc}{path}" + (f"?{query}" if query else "")
