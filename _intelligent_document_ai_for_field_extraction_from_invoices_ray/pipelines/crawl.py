"""Crawl-ingestion pipelines: WARC segment framing, URL normalization,
per-domain aggregation (north-star scope: web-crawl corpus front door;
no counterpart in the invoice reference).

Scale notes:
- ``warc_records``: segment assembly needs doc co-location — ONE
  bucketed groupby on ``segment`` (the only shuffle); the parse itself
  is stateless and streams.  At 100 TB segments arrive pre-framed from
  storage and the groupby disappears; it exists here because the synth
  must first BUILD the blobs the parser is tested on.
- ``url_normalize``: stateless map_batches, embarrassingly parallel.
- ``domain_stats``: per-batch partial aggregation on the full key
  (domain, host, lang) — bounded cardinality — then one tiny groupby
  over partials; the documents table itself is never shuffled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import crawl as C


def _docs(sf_dir: str, cols: list[str]) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=cols, rows_per_block=1000)


def q_warc_records(sf_dir: str) -> rd.Dataset:
    """documents -> WARC segment blobs (16 records each, Content-Length
    framed) -> length-driven record split -> per-doc rows.  Byte-exact:
    text, target URI and framing length all re-derived by the oracle."""

    def add_segment(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        seg = pc.floor(pc.divide(pc.cast(batch.column("doc_id"),
                                         pa.float64()),
                                 float(C.SEGMENT_DOCS)))
        return batch.append_column("segment",
                                   pc.cast(seg, pa.int64()))

    def build_blob(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("doc_id")
        blob = "".join(C.synth_warc_record(d, s, lg, t)
                       for d, s, lg, t in zip(g["doc_id"], g["source"],
                                              g["lang"], g["text"]))
        return pd.DataFrame({"segment": [int(g["segment"].iloc[0])],
                             "blob": [blob]})

    def parse_blob(batch: pa.Table) -> pa.Table:
        ids, segs, uris, lens, texts = [], [], [], [], []
        for seg, blob in zip(batch.column("segment").to_pylist(),
                             batch.column("blob").to_pylist()):
            for rec in C.parse_warc(blob):
                ids.append(int(rec["record_id"].rsplit("-", 1)[1][:-1]))
                segs.append(seg)
                uris.append(rec["target_uri"])
                lens.append(rec["content_length"])
                texts.append(rec["text"])
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "segment": pa.array(segs, type=pa.int64()),
            "target_uri": pa.array(uris, type=pa.string()),
            "content_length": pa.array(lens, type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        })

    return (_docs(sf_dir, ["doc_id", "text", "lang", "source"])
            .map_batches(add_segment, batch_format="pyarrow")
            .groupby("segment")
            .map_groups(build_blob, batch_format="pandas")
            .map_batches(parse_blob, batch_format="pyarrow")
            .sort("doc_id"))


SQL_WARC_RECORDS = f"""
SELECT doc_id,
       doc_id // {C.SEGMENT_DOCS} AS segment,
       'https://' || source || '.site' || CAST(doc_id % 13 AS VARCHAR)
           || '.org/' || lang || '/doc/' || CAST(doc_id AS VARCHAR)
           || '?a=1&b=2' AS target_uri,
       CAST({C.HTTP_HEAD_LEN} + length(text) AS BIGINT) AS content_length,
       text
FROM documents ORDER BY doc_id
"""


def q_url_normalize(sf_dir: str) -> rd.Dataset:
    """Six deterministic messy spellings (case, default port, fragment,
    dot-segments, percent-encoded unreserved, shuffled query) -> RFC
    3986 normalization; every variant must land on the canonical URL."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        norms, hosts, domains = [], [], []
        for d, s, lg in zip(ids, batch.column("source").to_pylist(),
                            batch.column("lang").to_pylist()):
            norm = C.normalize_url(C.synth_messy_url(d, s, lg))
            host = norm.split("/")[2]
            norms.append(norm)
            hosts.append(host)
            domains.append(C.registered_domain(host))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "url_norm": pa.array(norms, type=pa.string()),
            "host": pa.array(hosts, type=pa.string()),
            "domain": pa.array(domains, type=pa.string()),
        })

    return (_docs(sf_dir, ["doc_id", "lang", "source"])
            .map_batches(fn, batch_format="pyarrow")
            .sort("doc_id"))


SQL_URL_NORMALIZE = """
SELECT doc_id,
       'https://' || source || '.site' || CAST(doc_id % 13 AS VARCHAR)
           || '.org/' || lang || '/doc/' || CAST(doc_id AS VARCHAR)
           || '?a=1&b=2' AS url_norm,
       source || '.site' || CAST(doc_id % 13 AS VARCHAR) || '.org' AS host,
       'site' || CAST(doc_id % 13 AS VARCHAR) || '.org' AS domain
FROM documents ORDER BY doc_id
"""


def q_domain_stats(sf_dir: str) -> rd.Dataset:
    """Per-registered-domain corpus stats off the normalized URLs.
    Exact distinct counts via full-key partials: each batch emits one
    row per (domain, host, lang) — bounded by the URL key space, not the
    corpus — and one tiny groupby finishes."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "doc_id": batch.column("doc_id").to_pylist(),
            "source": batch.column("source").to_pylist(),
            "lang": batch.column("lang").to_pylist(),
            "n_chars": [len(t) for t in batch.column("text").to_pylist()],
        })
        df["host"] = [f"{s}.site{d % 13}.org"
                      for d, s in zip(df["doc_id"], df["source"])]
        df["domain"] = [f"site{d % 13}.org" for d in df["doc_id"]]
        g = (df.groupby(["domain", "host", "lang"], as_index=False)
               .agg(n_docs=("doc_id", "size"),
                    total_chars=("n_chars", "sum")))
        return g

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "domain": [group["domain"].iloc[0]],
            "n_docs": [int(group["n_docs"].sum())],
            "n_hosts": [int(group["host"].nunique())],
            "n_langs": [int(group["lang"].nunique())],
            "total_chars": [int(group["total_chars"].sum())],
        })

    return (_docs(sf_dir, ["doc_id", "text", "lang", "source"])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("domain")
            .map_groups(finish, batch_format="pandas")
            .sort("domain"))


SQL_DOMAIN_STATS = """
SELECT 'site' || CAST(doc_id % 13 AS VARCHAR) || '.org' AS domain,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT source || '.site' || CAST(doc_id % 13 AS VARCHAR)
             || '.org') AS n_hosts,
       COUNT(DISTINCT lang) AS n_langs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY 1 ORDER BY domain
"""


def q_robots_filter(sf_dir: str) -> rd.Dataset:
    """RFC 9309 robots.txt evaluation: per-URL crawl-allow decision by
    LONGEST-matching path prefix over the host's rule set (the decision
    every fetcher makes before touching a page).

    Scale shape: the rule table is host-number-keyed and tiny (≤ 52
    rows from :func:`functions.crawl.robots_rules` — real robots corpora
    are host-bounded, not corpus-bounded), so it broadcasts by closure
    into ONE stateless ``map_batches`` — no join, no shuffle.  Matching
    is vectorized per rule: for each of the ≤4 rules of a host bucket,
    one numpy ``startswith`` over the bucket's paths, keeping the
    longest hit (lengths are distinct within any URL's matching set, so
    no tie-break is exercised)."""
    import numpy as np

    rules_by_k: dict[int, list[tuple[str, bool]]] = {}
    for k, path, allow in C.robots_rules():
        rules_by_k.setdefault(k, []).append((path, allow))
    for v in rules_by_k.values():           # longest first: first hit wins
        v.sort(key=lambda r: -len(r[0]))

    def fn(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_numpy(
            zero_copy_only=False), dtype=np.int64)
        langs = batch.column("lang").to_pylist()
        paths = np.array([f"/{lg}/doc/{d}" for lg, d in zip(langs, ids)])
        ks = ids % 13
        allowed = np.zeros(len(ids), dtype=bool)
        matched = np.empty(len(ids), dtype=object)
        for k in np.unique(ks):
            in_k = ks == k
            undecided = in_k.copy()
            for path, allow in rules_by_k[int(k)]:
                hit = undecided & np.char.startswith(
                    paths.astype(str), path)
                allowed[hit] = allow
                matched[hit] = path
                undecided &= ~hit
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "path": pa.array(paths.tolist(), type=pa.string()),
            "allowed": pa.array(allowed.tolist(), type=pa.bool_()),
            "matched_rule": pa.array(matched.tolist(), type=pa.string()),
        })

    return (_docs(sf_dir, ["doc_id", "lang"])
            .map_batches(fn, batch_format="pyarrow")
            .sort("doc_id"))


def _robots_sql() -> str:
    vals = ", ".join(f"({k}, '{p}', {str(a).upper()})"
                     for k, p, a in C.robots_rules())
    return f"""
WITH rules(k, rpath, allow) AS (VALUES {vals}),
u AS (
  SELECT doc_id, doc_id % 13 AS k,
         '/' || lang || '/doc/' || CAST(doc_id AS VARCHAR) AS path
  FROM documents
), m AS (
  SELECT u.doc_id, u.path, r.allow, r.rpath,
         ROW_NUMBER() OVER (PARTITION BY u.doc_id
                            ORDER BY length(r.rpath) DESC) AS rn
  FROM u JOIN rules r
    ON u.k = r.k AND u.path LIKE r.rpath || '%'
)
SELECT doc_id, path, allow AS allowed, rpath AS matched_rule
FROM m WHERE rn = 1 ORDER BY doc_id
"""


SQL_ROBOTS_FILTER = _robots_sql()


def q_crawl_schedule(sf_dir: str) -> rd.Dataset:
    """Per-host politeness scheduling — the crawl frontier's ordering
    decision: each host serves its URLs strictly sequentially in doc_id
    order with a per-host crawl-delay (RFC 9309 `Crawl-delay` analog,
    here `500 + 250·(k % 4)` ms for host-number `k = doc_id % 13`), so
    URL `i` of a host fetches at `slot·delay_ms`.

    Scale shape: scheduling is per-host state, so the ONLY exchange is
    one bucketed shuffle on ``host`` (hosts are the natural crawl
    partitioning key — politeness makes per-host work inherently
    serial, so a host never needs to span tasks); slot assignment
    inside a bucket is a vectorized ``cumcount``.  At 100 TB the host
    key space is millions of buckets and the same single shuffle
    holds; no stage sees more than its bucket's URLs."""
    from .grouping import bucketed_group_apply

    def urls(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_pylist()
        srcs = batch.column("source").to_pylist()
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype=np.int64),
            "host": [f"{s}.site{d % 13}.org" for d, s in zip(ids, srcs)],
            "delay_ms": pd.Series([500 + 250 * ((d % 13) % 4)
                                   for d in ids], dtype=np.int64),
        })

    def schedule(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["host", "doc_id"]).reset_index(drop=True)
        slot = df.groupby("host").cumcount()
        return df.assign(slot=slot.astype(np.int64),
                         fetch_at_ms=(slot * df["delay_ms"])
                         .astype(np.int64))

    return (bucketed_group_apply(
        _docs(sf_dir, ["doc_id", "source"])
        .map_batches(urls, batch_format="pyarrow"),
        ["host"], schedule, num_buckets=64).sort("doc_id"))


SQL_CRAWL_SCHEDULE = """
WITH u AS (
  SELECT doc_id,
         source || '.site' || CAST(doc_id % 13 AS VARCHAR) || '.org'
             AS host,
         CAST(500 + 250 * ((doc_id % 13) % 4) AS BIGINT) AS delay_ms
  FROM documents
)
SELECT doc_id, host, delay_ms,
       CAST(ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) - 1
            AS BIGINT) AS slot,
       CAST((ROW_NUMBER() OVER (PARTITION BY host ORDER BY doc_id) - 1)
            * delay_ms AS BIGINT) AS fetch_at_ms
FROM u ORDER BY doc_id
"""


CRAWL_QUERIES = {
    "warc_records": (q_warc_records, SQL_WARC_RECORDS),
    "url_normalize": (q_url_normalize, SQL_URL_NORMALIZE),
    "domain_stats": (q_domain_stats, SQL_DOMAIN_STATS),
    "robots_filter": (q_robots_filter, SQL_ROBOTS_FILTER),
    "crawl_schedule": (q_crawl_schedule, SQL_CRAWL_SCHEDULE),
}
