"""Sequence packing: distributed prefix sum vs oracle + edge cases."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_matches_oracle_bit_for_bit(ray_session, monkeypatch) -> None:
    # tiny ranges so sf0.001's 500 docs exercise the full three-level
    # path (multiple r1 ranges AND multiple r2 super-ranges)
    monkeypatch.setenv("GRAFT_PACK_RANGE", "32")
    monkeypatch.setenv("GRAFT_PACK_RANGE2", "4")
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.packing import (
        SQL_SEQ_PACK,
        q_seq_pack,
    )

    got = q_seq_pack(SF).to_pandas()
    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{SF}/documents.parquet"))
    want = con.execute(SQL_SEQ_PACK).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col]) == list(want[col]), col


def test_prefix_sum_exact_with_sparse_ids_and_empty_docs(
        ray_session, tmp_path, monkeypatch) -> None:
    """Sparse doc_ids (range partitioning must not assume density),
    an empty doc, and a doc straddling many sequences."""
    monkeypatch.setenv("GRAFT_PACK_RANGE", "8")
    monkeypatch.setenv("GRAFT_PACK_RANGE2", "2")
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.packing import (
        SEQ_LEN,
        q_seq_pack,
    )

    ids = [0, 3, 17, 64, 65, 200]
    texts = ["a b c", "", "x " * 5000, "q", "r s", "t"]
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts)}), str(tmp_path / "documents.parquet"))

    got = q_seq_pack(str(tmp_path)).to_pandas()
    assert list(got["doc_id"]) == ids
    n = got["n_bpe_tokens"].to_numpy()
    off = got["offset_tokens"].to_numpy()
    # exact exclusive prefix sum in doc_id order
    assert list(off) == list(np.concatenate([[0], n.cumsum()[:-1]]))
    # empty doc spans its insertion point
    empty = got[got["doc_id"] == 3].iloc[0]
    assert empty["n_bpe_tokens"] == 0
    assert empty["seq_first"] == empty["seq_last"]
    # the 10k-token doc straddles multiple SEQ_LEN sequences
    big = got[got["doc_id"] == 17].iloc[0]
    assert big["seq_last"] - big["seq_first"] \
        == (big["offset_tokens"] + big["n_bpe_tokens"] - 1) // SEQ_LEN \
        - big["offset_tokens"] // SEQ_LEN
    assert big["seq_last"] > big["seq_first"]


def test_interval_partition_invariant(ray_session, monkeypatch) -> None:
    """Doc intervals tile the stream: consecutive docs' intervals are
    adjacent and the last interval ends at the total token count."""
    monkeypatch.setenv("GRAFT_PACK_RANGE", "64")
    monkeypatch.setenv("GRAFT_PACK_RANGE2", "4")
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.packing import (
        q_seq_pack,
    )

    got = q_seq_pack(SF).to_pandas()
    n = got["n_bpe_tokens"].to_numpy()
    off = got["offset_tokens"].to_numpy()
    assert (off[1:] == off[:-1] + n[:-1]).all()
    assert off[-1] + n[-1] == n.sum()
