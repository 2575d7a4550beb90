"""Inverted-index assembly: oracle match + cross-block merge."""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_matches_oracle(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.indexing import (
        SQL_INVERTED_INDEX,
        q_inverted_index,
    )

    got = q_inverted_index(SF).to_pandas()
    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{SF}/documents.parquet"))
    want = con.execute(SQL_INVERTED_INDEX).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col]) == list(want[col]), col


def test_cross_block_merge_exact(ray_session) -> None:
    """A hot token straddling 20 blocks must merge exactly: df counts
    documents (not block partials), min/max/checksum fold across blocks,
    and rare singleton tokens survive."""
    import pyarrow as pa
    import ray.data as rd

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.indexing import (
        build_index,
    )

    n = 100
    docs = pa.table({
        "doc_id": pa.array(range(n), type=pa.int64()),
        "text": pa.array(["hot hot hot" if i % 2 == 0 else f"rare{i} hot"
                          for i in range(n)]),
    })
    out = build_index(rd.from_arrow(docs).repartition(20)).to_pandas()
    hot = out[out["token"] == "hot"].iloc[0]
    assert hot["df"] == n
    assert hot["total_tf"] == 3 * (n // 2) + n // 2
    assert hot["min_doc"] == 0 and hot["max_doc"] == n - 1
    assert hot["postings_sum"] == sum(3 * i for i in range(0, n, 2)) + \
        sum(i for i in range(1, n, 2))
    rare = out[out["token"] == "rare1"].iloc[0]
    assert (rare["df"], rare["total_tf"], rare["postings_sum"]) == (1, 1, 1)
    assert len(out) == 1 + n // 2


def test_bm25_block_prune_lossless(ray_session) -> None:
    """The per-block top-k prune must be lossless: the pipeline's top-5
    per query equals an unpruned single-process recompute of the same
    integer BM25 over the whole corpus, at an adversarial partitioning
    (every doc its own block candidate)."""
    from collections import Counter

    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.indexing import (
        BM25_QUERIES,
        _bm25_term_score,
        q_bm25_topk,
    )

    sf = "/root/testdata/sf0.001"
    got = q_bm25_topk(sf).to_pandas()

    tbl = pq.read_table(f"{sf}/documents.parquet",
                        columns=["doc_id", "text"])
    toks = {d: t.lower().split()
            for d, t in zip(tbl.column("doc_id").to_pylist(),
                            tbl.column("text").to_pylist())}
    n = len(toks)
    total_len = sum(len(v) for v in toks.values())
    want_rows = []
    for qid, terms in BM25_QUERIES:
        scores = []
        for d, tk in toks.items():
            cnt = Counter(tk)
            df_scores = sum(
                _bm25_term_score(
                    cnt[t], len(tk),
                    1000 * n // max(1, sum(1 for v in toks.values()
                                           if t in v)),
                    n, total_len)
                for t in terms if cnt[t])
            if df_scores > 0:
                scores.append((df_scores, d))
        scores.sort(key=lambda p: (-p[0], p[1]))
        for r, (s, d) in enumerate(scores[:5], 1):
            want_rows.append((qid, d, s, r))

    got_rows = list(got[["query_id", "doc_id", "score_scaled", "rank"]]
                    .itertuples(index=False, name=None))
    assert sorted(got_rows) == sorted(want_rows)


def test_hybrid_rrf_fusion_properties(ray_session) -> None:
    """RRF fusion sanity: every fused row's score equals the sum of its
    reciprocal-rank parts recomputed from the two source lists, and a
    doc present in BOTH lists outranks one with a single equal-rank
    appearance."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.indexing import (
        _HYBRID_PAIRS,
        _RRF_K,
        q_bm25_topk,
        q_hybrid_search_rrf,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.similarity import (
        q_embed_topk,
    )

    sf = "/root/testdata/sf0.001"
    lex = q_bm25_topk(sf).to_pandas()
    den = q_embed_topk(sf)
    den = den.to_pandas() if hasattr(den, "to_pandas") else den
    got = q_hybrid_search_rrf(sf)

    for row in got.itertuples(index=False):
        den_q = dict(_HYBRID_PAIRS)[row.query_id]
        want = 0
        l = lex[(lex.query_id == row.query_id)
                & (lex.doc_id == row.doc_id)]
        if len(l):
            want += 1000 // (_RRF_K + int(l["rank"].iloc[0]))
        d = den[(den.query_id == den_q)
                & (den.neighbor_id == row.doc_id)]
        if len(d):
            want += 1000 // (_RRF_K + int(d["rank"].iloc[0]))
        assert row.rrf_milli == want, row
    # ranks are 1..k per query, strictly ordered by (score desc, doc)
    for q, g in got.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        s = list(zip(-g.rrf_milli, g.doc_id))
        assert s == sorted(s)
