"""Invariant pins for the analytics bank (value equality vs DuckDB is
the driver gate + tools/sqlcheck; these pin the structural semantics
that equality alone wouldn't localize on failure) and for bfs_hops."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_parts_coordered_bounds(ray_session) -> None:
    """Pairs are canonical (a<b), counts >= 2, ordering deterministic,
    and a brute-force pandas recount agrees on the returned pairs."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_parts_coordered,
    )
    df = q_parts_coordered(SF)
    assert (df.part_a < df.part_b).all()
    assert (df.n_orders >= 2).all()
    assert len(df) <= 100
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    d = li.drop_duplicates()
    m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
    m = m[m.l_partkey_a < m.l_partkey_b]
    truth = m.groupby(["l_partkey_a", "l_partkey_b"]).size()
    for r in df.itertuples():
        assert truth[(r.part_a, r.part_b)] == r.n_orders


def test_event_gaps_nonnegative_and_counts(ray_session) -> None:
    """Gaps are non-negative (sorted timeline), n_gaps = n_events-1 for
    every user present, max <= sum."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_event_gaps,
    )
    df = q_event_gaps(SF).to_pandas()
    assert (df.max_gap_s >= 0).all()
    assert (df.sum_gap_s >= df.max_gap_s).all()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id"]).to_pandas()
    per_user = ev.groupby("user_id").size()
    for r in df.itertuples():
        assert r.n_gaps == per_user[r.user_id] - 1


def test_user_scd2_partitions_timeline(ray_session) -> None:
    """Intervals tile each user's timeline: island ordinals are 1..k,
    consecutive intervals differ in event_type, interval n_events sum to
    the user's event count, and valid_to of island i == valid_from of
    island i+1 (-1 only on the last)."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_user_scd2,
    )
    df = q_user_scd2(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id"]).to_pandas()
    per_user = ev.groupby("user_id").size()
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("island")
        assert list(g.island) == list(range(1, len(g) + 1))
        assert g.n_events.sum() == per_user[uid]
        assert (g.event_type.to_numpy()[1:]
                != g.event_type.to_numpy()[:-1]).all()
        assert (g.valid_to_s.to_numpy()[:-1]
                == g.valid_from_s.to_numpy()[1:]).all()
        assert g.valid_to_s.iloc[-1] == -1


def test_customer_quartiles_exact_ntile(ray_session) -> None:
    """Quartile sizes follow NTILE semantics (first n%4 tiles one
    larger) and the assignment is monotone in (bal, custkey)."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_customer_quartiles,
    )
    df = q_customer_quartiles(SF).to_pandas()
    n = len(df)
    sizes = df.quartile.value_counts().sort_index()
    size, rem = divmod(n, 4)
    expected = [size + 1] * rem + [size] * (4 - rem)
    assert list(sizes) == [e for e in expected if e > 0]
    ordered = df.sort_values(["bal_cents", "c_custkey"])
    assert (np.diff(ordered.quartile.to_numpy()) >= 0).all()


def test_nation_top_names_order(ray_session) -> None:
    """Each nation's list is its top-3 by (balance desc, custkey) —
    recomputed brute-force from the customer table."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_nation_top_names,
    )
    df = q_nation_top_names(SF)
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    cust["bal_cents"] = np.round(cust.c_acctbal * 100).astype(np.int64)
    cust = cust.sort_values(["bal_cents", "c_custkey"],
                            ascending=[False, True])
    for r in df.itertuples():
        nk = int(nat.loc[nat.n_name == r.n_name, "n_nationkey"].iloc[0])
        want = ",".join(cust[cust.c_nationkey == nk].c_name.head(3))
        assert r.top_names == want


def test_doc_sentences_reconstruct(ray_session) -> None:
    """Explode is lossless: indices are a prefix-free enumeration and
    lengths are consistent with the pieces."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_doc_sentences,
    )
    df = q_doc_sentences(SF).to_pandas()
    assert (df.sent_len == df.sent.str.len()).all()
    assert (df.sent_len > 0).all()
    # ordinals strictly increase within a doc (gaps allowed: empty pieces)
    for _d, g in df.groupby("doc_id"):
        idx = g.sort_values("sent_idx").sent_idx.to_numpy()
        assert (np.diff(idx) > 0).all()


def test_weighted_sample_is_bottom_k(ray_session) -> None:
    """The 20 kept docs are exactly the globally smallest priorities —
    recomputed brute-force over the whole table."""
    import hashlib

    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_weighted_sample,
    )
    df = q_weighted_sample(SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    hv = np.array([int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
                   for d in docs.doc_id], dtype=np.int64)
    docs["prio"] = hv.astype(np.float64) / docs.n_chars.to_numpy(np.float64)
    want = docs.sort_values(["prio", "doc_id"]).head(20)
    assert list(df.doc_id) == list(want.doc_id)


def test_k_anonymity_covers_all_rows(ray_session) -> None:
    """Group sizes sum to the table row count; flag matches cnt >= 8."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_k_anonymity,
    )
    df = q_k_anonymity(SF)
    n = pq.ParquetFile(f"{SF}/customer.parquet").metadata.num_rows
    assert int(df.cnt.sum()) == n
    assert (df.k_anonymous == (df.cnt >= 8).astype(np.int64)).all()


def test_bfs_hops_frontier_correct(ray_session) -> None:
    """Distributed BFS equals a brute-force single-process BFS (set
    expansion) over the same closed-form graph, including min-hop
    labels; seeds all get hop 0."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.graph import (
        BFS_HOPS,
        BFS_SOURCE_MOD,
        _targets,
        q_bfs_hops,
    )
    df = q_bfs_hops(SF).to_pandas()
    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    dist: dict[int, int] = {u: 0 for u in range(0, n, BFS_SOURCE_MOD)}
    frontier = list(dist)
    for k in range(BFS_HOPS):
        nxt = []
        _, dst, _deg = _targets(np.array(frontier, dtype=np.int64), n)
        for v in dst.tolist():
            if v not in dist:
                dist[v] = k + 1
                nxt.append(v)
        frontier = nxt
    want = pd.DataFrame(sorted(dist.items()), columns=["node", "hop"])
    assert list(df.node) == list(want.node)
    assert list(df.hop) == list(want.hop)
