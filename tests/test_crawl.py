"""Crawl-ingestion kernels + pipelines: WARC framing, URL normalization,
domain aggregation."""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    crawl as C,
)

SF = "/root/testdata/sf0.001"


def test_warc_framing_is_length_driven() -> None:
    """A payload containing the record magic must NOT split a record —
    framing is by Content-Length, never by searching for WARC/1.0."""
    adversarial = "evil\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nfake"
    blob = (C.synth_warc_record(0, "src0", "en", "hello") +
            C.synth_warc_record(1, "src1", "de", adversarial) +
            C.synth_warc_record(2, "src2", "fr", ""))
    recs = C.parse_warc(blob)
    assert [r["text"] for r in recs] == ["hello", adversarial, ""]
    assert recs[1]["content_length"] == C.HTTP_HEAD_LEN + len(adversarial)
    assert recs[0]["target_uri"] == C.canonical_url(0, "src0", "en")


def test_warc_truncated_blob_raises() -> None:
    blob = C.synth_warc_record(0, "src0", "en", "hello")
    with pytest.raises(ValueError):
        C.parse_warc(blob[:-3])
    with pytest.raises(ValueError):
        C.parse_warc("garbage" + blob)


def test_every_messy_variant_normalizes_to_canonical() -> None:
    langs = ["en", "de", "fr", "es", "zh"]
    for d in range(120):
        src, lang = f"src{d % 20}", langs[d % 5]
        assert (C.normalize_url(C.synth_messy_url(d, src, lang))
                == C.canonical_url(d, src, lang)), d


@pytest.mark.parametrize("raw,want", [
    ("HTTP://Example.COM:80/a/b/../c#f", "http://example.com/a/c"),
    ("https://h.org//x/./y", "https://h.org//x/y"),
    ("https://h.org/%7Euser/%41?z=1&a=2", "https://h.org/~user/A?a=2&z=1"),
    ("https://h.org:8080/p", "https://h.org:8080/p"),   # non-default kept
    ("https://h.org/a/..", "https://h.org/"),
    ("https://h.org", "https://h.org/"),
    ("https://h.org/%2Fkeep", "https://h.org/%2Fkeep"),  # reserved stays
    ("https://h.org/%2fkeep", "https://h.org/%2Fkeep"),  # hex uppercased
])
def test_rfc3986_normalization_cases(raw: str, want: str) -> None:
    assert C.normalize_url(raw) == want


def test_registered_domain() -> None:
    assert C.registered_domain("a.b.site3.org") == "site3.org"
    assert C.registered_domain("site3.org") == "site3.org"


def _oracle(sql: str):
    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{SF}/documents.parquet"))
    return con.execute(sql).df()


def test_robots_longest_match_beats_shorter() -> None:
    """The id-prefix block '/en/doc/1' (k=2 hosts) must out-rank the
    shorter '/en/' allow for doc_ids 1, 1x, 1xx… on those hosts —
    RFC 9309 is longest-match, not first-match or allow-wins."""
    rules = {k: sorted([(p, a) for kk, p, a in C.robots_rules()
                        if kk == k], key=lambda r: -len(r[0]))
             for k in range(13)}
    # k=2: rules are /en/doc/1 (deny), /en/ (allow), / (deny→k%5!=0 True)
    by_path = dict(rules[2])
    assert by_path["/en/doc/1"] is False and by_path["/en/"] is True
    # longest-first ordering makes the deny win for /en/doc/15
    for path, allow in rules[2]:
        if "/en/doc/15".startswith(path):
            assert path == "/en/doc/1" and allow is False
            break


def test_robots_match_lengths_distinct_per_url() -> None:
    """Within any single URL's matching rule set the rule lengths are
    distinct (the docstring's no-tie-break claim), for every (k, lang,
    doc_id suffix) regime the synthetic scheme can produce."""
    for k in range(13):
        krules = [(p, a) for kk, p, a in C.robots_rules() if kk == k]
        for lang in ["en", "de", "fr", "es", "zh"]:
            for d in [0, 1, 7, 10, 15, 19, 100, 123]:
                path = f"/{lang}/doc/{d}"
                lens = [len(p) for p, _ in krules if path.startswith(p)]
                assert len(lens) == len(set(lens)), (k, path)
                assert lens, (k, path)     # root rule always matches


def test_crawl_schedule_politeness_gap(ray_session) -> None:
    """Within any host the fetch times are strictly spaced by exactly
    that host's delay — the politeness invariant the scheduler exists
    to enforce (slot order must follow doc_id order)."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.crawl import (
        q_crawl_schedule,
    )
    df = q_crawl_schedule("/root/testdata/sf0.001").to_pandas()
    for host, g in df.groupby("host"):
        g = g.sort_values("slot")
        assert (g["doc_id"].diff().dropna() > 0).all(), host
        gaps = g["fetch_at_ms"].diff().dropna()
        assert (gaps == g["delay_ms"].iloc[0]).all(), host


@pytest.mark.parametrize("name", ["warc_records", "url_normalize",
                                  "domain_stats", "robots_filter",
                                  "crawl_schedule"])
def test_pipeline_matches_oracle(ray_session, name: str) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.crawl import (
        CRAWL_QUERIES,
    )

    fn, sql = CRAWL_QUERIES[name]
    got = fn(SF).to_pandas()
    want = _oracle(sql)
    assert len(got) == len(want) > 0
    assert list(got.columns) == list(want.columns)
    for col in got.columns:
        assert list(got[col]) == list(want[col]), col
