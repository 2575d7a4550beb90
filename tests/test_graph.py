"""Exact-integer distributed PageRank."""

from __future__ import annotations

import numpy as np

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
    graph as G,
)

SF = "/root/testdata/sf0.001"


def _dense_pagerank(n: int, iters: int) -> np.ndarray:
    """Float reference: textbook power iteration on the same graph."""
    r = np.full(n, 1.0 / n)
    src, dst, deg = G._targets(np.arange(n), n)
    per_node_share = 1.0 / np.repeat(deg, deg)
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, np.repeat(r, deg) * per_node_share)
        r = 0.15 / n + 0.85 * contrib
    return r


def test_exact_ranks_match_float_reference(ray_session) -> None:
    got = G.q_pagerank(SF).to_pandas()
    n = len(got)
    scale = n * 240 ** G.N_ITERS
    # exact mass conservation: ranks sum to 1 in scaled space
    assert int(got["rank_scaled"].sum()) == scale
    ref = _dense_pagerank(n, G.N_ITERS)
    unscaled = got.sort_values("node")["rank_scaled"].to_numpy() / scale
    np.testing.assert_allclose(unscaled, ref, rtol=1e-12)
    assert set(got["out_degree"]) <= {3, 4}


def test_determinism_across_runs(ray_session) -> None:
    a = G.q_pagerank(SF).to_pandas()
    b = G.q_pagerank(SF).to_pandas()
    assert a.equals(b)


def test_targets_closed_form() -> None:
    n = 500
    src, dst, deg = G._targets(np.arange(n), n)
    assert len(src) == len(dst) == deg.sum()
    assert np.all((deg >= 3) & (deg <= 4))
    assert np.all(src != dst)
    # derived identically for any node subset (block boundaries can't
    # change the graph)
    s2, d2, g2 = G._targets(np.arange(100, 200), n)
    mask = (src >= 100) & (src < 200)
    assert np.array_equal(d2, dst[mask])


def test_anchor_text_matches_oracle(ray_session) -> None:
    import duckdb
    import pyarrow.parquet as pq

    got = G.q_anchor_text(SF).to_pandas()
    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{SF}/documents.parquet"))
    want = con.execute(G.SQL_ANCHOR_TEXT).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col]) == list(want[col]), col


def test_anchor_text_brute_force(ray_session) -> None:
    """Aggregates equal a single-process recomputation from the raw
    edge list (catches combiner mistakes the oracle shares)."""
    import collections

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy()
    texts = dict(zip(ids, t.column("text").to_pylist()))
    n = len(ids)
    agg: dict[int, list] = collections.defaultdict(
        lambda: [0, set(), None, None])
    for u in ids:
        for j in range(4):
            v = (7 * int(u) + 13 * j + 1) % n
            if v == int(u):
                continue
            a = texts[int(u)][7 * j:7 * j + 7]
            e = agg[v]
            e[0] += 1
            e[1].add(int(u))
            e[2] = a if e[2] is None else min(e[2], a)
            e[3] = a if e[3] is None else max(e[3], a)
    got = G.q_anchor_text(SF).to_pandas().set_index("dst_id")
    assert len(got) == len(agg)
    for v, (cnt, srcs, lo, hi) in agg.items():
        row = got.loc[v]
        assert row["n_inlinks"] == cnt
        assert row["n_src"] == len(srcs)
        assert row["min_anchor"] == lo and row["max_anchor"] == hi


def test_triangle_count_brute_force(ray_session) -> None:
    """Per-node counts must equal a brute-force adjacency-set count of
    the same undirected graph, and the global invariant Σ n_triangles =
    3 · #triangles must hold (each triangle touches 3 nodes)."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.graph import (
        q_triangle_count,
    )

    sf = "/root/testdata/sf0.001"
    n = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    edges = set()
    for u in range(n):
        for j in range(4):
            v = (7 * u + 13 * j + 1) % n
            if v != u:
                edges.add((min(u, v), max(u, v)))
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    per_node: dict[int, int] = {}
    n_tri = 0
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:
                n_tri += 1
                for x in (a, b, c):
                    per_node[x] = per_node.get(x, 0) + 1

    got = q_triangle_count(sf).to_pandas()
    assert dict(zip(got.node, got.n_triangles)) == per_node
    assert int(got.n_triangles.sum()) == 3 * n_tri


def test_hits_matches_bruteforce(ray_session) -> None:
    """Unnormalized integer HITS vs a dense numpy recomputation over the
    explicit edge list (catches reverse-edge derivation mistakes the
    SQL oracle would share only if both used the same closed form)."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    n = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    edges = [(u, (7 * u + 13 * j + 1) % n)
             for u in range(n) for j in range(4)
             if (7 * u + 13 * j + 1) % n != u]
    h = np.ones(n, dtype=np.int64)
    for _ in range(G.N_HITS_ITERS):
        a = np.zeros(n, dtype=np.int64)
        for u, v in edges:
            a[v] += h[u]
        h = np.zeros(n, dtype=np.int64)
        for u, v in edges:
            h[u] += a[v]
    afin = np.zeros(n, dtype=np.int64)
    for u, v in edges:
        afin[v] += h[u]

    got = G.q_hits(sf).to_pandas()
    assert len(got) == n
    assert np.array_equal(got.sort_values("node")["auth_scaled"]
                          .to_numpy(), afin)
    assert np.array_equal(got.sort_values("node")["hub_scaled"]
                          .to_numpy(), h)


def test_in_sources_inverts_targets() -> None:
    """The reverse derivation must yield exactly the forward edge set,
    including when 7 | n (the multi-solution modular branch)."""
    for n in (500, 490):  # 490 = 7 * 70 exercises gcd = 7
        src, dst, _deg = G._targets(np.arange(n), n)
        fwd = set(zip(src.tolist(), dst.tolist()))
        v_rep, u = G._in_sources(np.arange(n), n)
        rev = set(zip(u.tolist(), v_rep.tolist()))
        assert fwd == rev


def test_sssp_matches_bellman_ford(ray_session) -> None:
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    n = pq.ParquetFile(f"{sf}/documents.parquet").metadata.num_rows
    INF = 1 << 60
    d = np.full(n, INF, dtype=np.int64)
    d[G.SSSP_SOURCE] = 0
    for _ in range(G.SSSP_ROUNDS):
        nd = d.copy()
        for u in range(n):
            if d[u] == INF:
                continue
            for j in range(4):
                v = (7 * u + 13 * j + 1) % n
                if v == u:
                    continue
                w = 1 + (u + j) % 5
                nd[v] = min(nd[v], d[u] + w)
        d = nd
    want = {v: int(d[v]) for v in range(n) if d[v] < INF}
    got = G.q_sssp(sf).to_pandas()
    assert dict(zip(got.node, got.dist)) == want
    # distances only shrink with more rounds (monotone frontier)
    assert (got.dist >= 0).all() and got.dist.min() == 0
