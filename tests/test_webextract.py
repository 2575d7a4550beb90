"""HTML main-content extraction (webparse + webextract).

Pins (a) the block parser / density classifier on handcrafted adversarial
pages the synthesiser never emits, (b) byte-exact recovery through the
full Ray pipeline against the DuckDB oracle on degenerate text shapes the
sf corpora lack (entities, short docs, long docs, empty), and (c) the
structural boilerplate-count constants the SQL oracle hardcodes."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    webparse as W,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
    webextract as WX,
)


# ------------------------------------------------------------ pure parser
def test_adversarial_page_no_markers():
    """Content has no id/class marker; boilerplate has no marker either —
    only density + structure separate them."""
    body = (
        '<div><ul>'
        '<li><a href="/a">Alpha</a></li><li><a href="/b">Beta</a></li>'
        '<li><a href="/c">Gamma</a></li></ul></div>'
        '<div><p>This is the genuine article body with plenty of real '
        'sentences and no links at all, long enough to pass.</p>'
        '<p>A second paragraph of honest prose that any main-content '
        'extractor should keep intact.</p></div>'
        '<div><p><a href="/x">Promoted: click here for deals</a></p></div>'
        '<footer><p>Long legal footer text that would pass the length and '
        'link-density tests easily but sits in a pruned container, which '
        'is exactly why structural pruning exists.</p></footer>'
    )
    main, n_content, n_boiler = W.extract_main_text(
        f"<html><body>{body}</body></html>")
    assert "genuine article body" in main
    assert "second paragraph" in main
    assert "Alpha" not in main and "Promoted" not in main
    assert "legal footer" not in main
    assert n_content == 2
    assert n_boiler >= 4


def test_entities_and_exact_concat():
    text = "Tom & Jerry <3 say 5 > 4 && \"quotes\" work"
    page = W.synth_page(12, text)
    assert "&amp;" in page  # actually escaped in the markup
    main, _, _ = W.extract_main_text(page)
    assert main == text


def test_link_density_boundary():
    # 30% link chars is boilerplate (>=), 29% is content
    base = "x" * 70
    linked = "y" * 30
    blocks = W.parse_blocks(
        f"<body><p>{base}<a href='/'>{linked}</a></p></body>")
    [(txt, link, pruned)] = [b for b in blocks if b[0].strip()]
    assert not W.is_content(txt, link, pruned)
    assert W.is_content(txt + "x", link, pruned)


def test_chunks_exact_and_balanced():
    for n in (0, 1, 44, 299, 300, 301, 449, 450, 577, 5000):
        t = "a" * n
        chunks = W.content_chunks(t)
        assert "".join(chunks) == t
        if n:
            assert all(len(c) >= min(n, W.CHUNK_CHARS // 2) for c in chunks)
        else:
            assert chunks == []


def test_boiler_constants_all_variants():
    """The SQL oracle hardcodes per-variant boilerplate block counts;
    they must hold for every doc_id residue combination the templates
    key on (mod 4 layout, mod 7 site, mod 10 nav, mod 11 ad, mod 8 tags)."""
    for doc_id in range(0, 4 * 7 * 11, 13):
        page = W.synth_page(doc_id, "Long enough body text to count as " +
                            "honest main content for the extractor here.")
        _, _, n_boiler = W.extract_main_text(page)
        assert n_boiler == WX._BOILER_PER_VARIANT[doc_id % 4], doc_id


# ------------------------------------------------------- full Ray pipeline
@pytest.fixture(scope="module")
def web_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("web_sf")
    rng = np.random.RandomState(7)
    docs = [
        (0, ""),                                        # no content blocks
        (1, "Tom & Jerry <3 say 5 > 4 in the article"), # entities
        (2, "short doc body of twenty-six chars plus"), # one chunk
        (3, "w " * 400),                                # multi-chunk long
        (7, "exactly one honest paragraph of content"),
    ]
    docs += [(i, " ".join(rng.choice(["alpha", "beta", "gamma", "delta"],
                                     rng.randint(9, 200))))
             for i in range(8, 200)]
    pd.DataFrame({"doc_id": np.array([x[0] for x in docs], dtype=np.int64),
                  "text": [x[1] for x in docs]}).to_parquet(
        d / "documents.parquet", row_group_size=32)
    return str(d)


def test_span_extraction_media_heuristics():
    """Figure images kept; logo (pruned header) and linked ad images
    dropped — by heuristic, not by any marker on the img itself."""
    page = (
        '<html><body>'
        '<header><img src="img://logo" alt=""><h1>Site</h1></header>'
        '<article><p>First honest paragraph, long enough to be kept '
        'by the density classifier for sure.</p>'
        '<img src="img://fig/1" alt="">'
        '<p>Second honest paragraph, also long enough to be kept by '
        'the classifier without question.</p></article>'
        '<div><p><a href="/buy"><img src="img://ad" alt="">Buy '
        'now!</a></p></div>'
        '</body></html>')
    spans = W.extract_spans(page)
    assert [s[0] for s in spans] == ["text", "media", "text"]
    assert spans[1][2] == "img://fig/1"
    refs = [s[2] for s in spans]
    assert "img://logo" not in refs and "img://ad" not in refs


def test_synth_span_sequence_alternates():
    text = "z" * 700  # 2 chunks -> text, media, text
    spans = W.extract_spans(W.synth_page(5, text))
    assert [s[0] for s in spans] == ["text", "media", "text"]
    assert spans[1][2] == "img://5/1"
    assert spans[0][1] + spans[2][1] == text


def test_html_spans_matches_oracle(ray_session, web_sf):
    got = WX.q_html_spans(web_sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{web_sf}/documents.parquet')")
    exp = con.execute(WX.SQL_HTML_SPANS).df()
    got = got.reset_index(drop=True)[exp.columns.tolist()]
    for c in ("ord",):
        exp[c] = exp[c].astype(np.int64)
        got[c] = got[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)


def test_html_main_text_matches_oracle(ray_session, web_sf):
    got = WX.q_html_main_text(web_sf).to_pandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{web_sf}/documents.parquet')")
    exp = con.execute(WX.SQL_HTML_MAIN_TEXT).df()
    got = got.reset_index(drop=True)[exp.columns.tolist()]
    for c in ("n_content_blocks", "n_boiler_blocks"):
        exp[c] = exp[c].astype(np.int64)
        got[c] = got[c].astype(np.int64)
    pd.testing.assert_frame_equal(got, exp)
