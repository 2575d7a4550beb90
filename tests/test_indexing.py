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
