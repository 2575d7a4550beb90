"""Distributed PageRank over a deterministic link graph — the canonical
iterative shuffle algorithm a web-scale engine must run (host-graph
ranking, crawl prioritization, spam-mass scoring).  No counterpart in
the invoice reference; scope: the north-star's web-crawl corpus.

Graph: node u (= doc_id, contiguous 0..N-1) links to the distinct
targets ``(7u + 13j + 1) mod N`` for j in 0..3, self-loops removed —
out-degree is 3 or 4, never 0 (no dangling mass), and the whole edge
set is closed-form in (u, N), so edges are derived where needed instead
of shipped.

EXACT integer arithmetic (the oracle trick): with damping 17/20 and
degrees in {3, 4}, scaling rank by ``N * 240^k`` makes every term
integral — r0_num = 1, and

    r_{k+1}_num(v) = 36 * 240^k  +  sum_{u->v} r_k_num(u) * (204 // d(u))

since 204/3 = 68 and 204/4 = 51.  Floating-point summation order (the
classic distributed-PageRank nondeterminism) never enters; the Ray
result and the DuckDB oracle agree bit-for-bit.  int64 bound: ranks sum
to N * 240^k total mass — at 240^3 this holds to N ~ 6e11; a larger
corpus rebases the scale per iteration (documented limit, not a silent
overflow: the sum aggregate would raise).

Shape per iteration: ONE map_batches over the rank table (emits
per-batch pre-aggregated (dst, contrib) partials + a presence row per
node — the in-batch combiner) -> ONE groupby().sum() shuffle -> a
stateless base-term add.  Three iterations = three bucketed shuffles
over (node, int64) pairs only; the documents table is read once for its
ids and never reshuffled.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

DAMP_NUM, DAMP_DEN = 17, 20     # damping 0.85 as an exact rational
N_ITERS = 3
_FANOUT_J = np.arange(4)


def _targets(nodes: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray,
                                                 np.ndarray]:
    """Vectorized edge derivation: returns (src_rep, dst, deg_per_node)
    for the distinct non-self targets of each node."""
    dst = (7 * nodes[:, None] + 13 * _FANOUT_J[None, :] + 1) % n
    keep = dst != nodes[:, None]
    deg = keep.sum(axis=1)
    src_rep = np.repeat(nodes, deg)
    return src_rep, dst[keep], deg


def q_pagerank(sf_dir: str) -> rd.Dataset:
    from ..sources.io import read_parquet_sized

    import pyarrow.parquet as pq
    import os
    n = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows

    ranks = read_parquet_sized(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"], rows_per_block=2000)

    def init(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        return pa.table({
            "node": pa.array(ids.to_numpy(zero_copy_only=False),
                             type=pa.int64()),
            "num": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
        })

    ranks = ranks.map_batches(init, batch_format="pyarrow")

    for k in range(N_ITERS):
        base = 36 * (240 ** k)

        def contribs(batch: pa.Table, _base=base) -> pa.Table:
            nodes = batch.column("node").to_numpy(zero_copy_only=False)
            nums = batch.column("num").to_numpy(zero_copy_only=False)
            src_rep, dst, deg = _targets(nodes, n)
            per_edge = np.repeat(nums * (204 // deg).astype(np.int64),
                                 deg)
            # in-batch combiner: collapse to one partial per dst, then
            # presence rows so in-linkless nodes survive the groupby
            df = pd.DataFrame({"node": dst, "contrib": per_edge})
            part = df.groupby("node", as_index=False)["contrib"].sum()
            pres = pd.DataFrame({"node": nodes,
                                 "contrib": np.zeros(len(nodes),
                                                     dtype=np.int64)})
            out = pd.concat([part, pres], ignore_index=True)
            return pa.table({
                "node": pa.array(out["node"].to_numpy(), type=pa.int64()),
                "contrib": pa.array(out["contrib"].to_numpy(),
                                    type=pa.int64()),
            })

        def add_base(batch: pa.Table, _base=base) -> pa.Table:
            s = batch.column("sum(contrib)").to_numpy(
                zero_copy_only=False).astype(np.int64)
            return pa.table({
                "node": pa.array(batch.column("node").to_numpy(
                    zero_copy_only=False), type=pa.int64()),
                "num": pa.array(s + _base, type=pa.int64()),
            })

        ranks = (ranks.map_batches(contribs, batch_format="pyarrow")
                      .groupby("node").sum("contrib")
                      .map_batches(add_base, batch_format="pyarrow"))

    def finish(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").to_numpy(zero_copy_only=False)
        _, _, deg = _targets(nodes, n)
        return pa.table({
            "node": pa.array(nodes, type=pa.int64()),
            "out_degree": pa.array(deg.astype(np.int64)),
            "rank_scaled": pa.array(batch.column("num").to_numpy(
                zero_copy_only=False), type=pa.int64()),
        })

    return ranks.map_batches(finish, batch_format="pyarrow").sort("node")


def _pagerank_sql() -> str:
    """Unrolled 3-iteration exact-integer PageRank (aggregates are not
    allowed in a recursive CTE's step, so levels unroll)."""
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents)",
        "nodes AS (SELECT doc_id AS node FROM documents)",
        ("edges AS (SELECT node AS src, "
         "(7*node + 13*j.j + 1) % (SELECT c FROM nn) AS dst "
         "FROM nodes, (SELECT unnest(generate_series(0, 3)) AS j) j "
         "WHERE (7*node + 13*j.j + 1) % (SELECT c FROM nn) <> node)"),
        "deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src)",
        "r0 AS (SELECT node, CAST(1 AS BIGINT) AS num FROM nodes)",
    ]
    for k in range(N_ITERS):
        base = 36 * (240 ** k)
        parts.append(
            f"r{k + 1} AS (SELECT n.node, CAST({base} + COALESCE(SUM("
            f"r{k}.num * (204 // deg.d)), 0) AS BIGINT) AS num "
            f"FROM nodes n "
            f"LEFT JOIN edges e ON e.dst = n.node "
            f"LEFT JOIN deg ON deg.src = e.src "
            f"LEFT JOIN r{k} ON r{k}.node = e.src "
            f"GROUP BY n.node)")
    return (", ".join(parts)
            + f" SELECT n.node, CAST(deg2.d AS BIGINT) AS out_degree, "
              f"r{N_ITERS}.num AS rank_scaled "
              f"FROM nodes n JOIN deg deg2 ON deg2.src = n.node "
              f"JOIN r{N_ITERS} ON r{N_ITERS}.node = n.node "
              f"ORDER BY n.node")


SQL_PAGERANK = _pagerank_sql()


def q_anchor_text(sf_dir: str) -> rd.Dataset:
    """Anchor-text aggregation — the per-TARGET view of the link graph
    a search/crawl pipeline builds (inbound-link counts, distinct
    linking sources, lexicographic anchor extremes for index terms).

    Anchor model: the anchor of edge ``(u, j)`` is source u's text at
    codepoint window ``[7j, 7j+7)`` (Python slicing and SQL
    ``substring`` both count codepoints) — closed-form in the row, so
    anchors are
    DERIVED inside the batch that holds u, never joined.  Every
    aggregate is a per-batch combiner: counts and min/max are
    semilattices, and ``n_src`` (distinct sources) sums exactly because
    a source u lives in exactly ONE batch — per-batch dedup of (src,
    dst) is globally exact with no distinct-shuffle.  One combiner pass
    -> one bucketed (dst, partial) groupby; the documents table is
    never reshuffled.  Output rows are the targets with >= 1 in-link
    (matching the SQL GROUP BY over the edge set).

    String order note: anchors are UTF-8; numpy/Python compare code
    points and DuckDB compares UTF-8 bytes — identical total orders
    (UTF-8 is order-preserving), so MIN/MAX agree byte-for-byte.
    """
    import os

    import pyarrow.parquet as pq

    from ..sources.io import read_parquet_sized
    from .grouping import bucketed_group_apply

    n = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows

    docs = read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"],
                              rows_per_block=2000)

    def partial(batch: pa.Table) -> pd.DataFrame:
        nodes = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        src_rep, dst, deg = _targets(nodes, n)
        # j index within each source's kept-edge run
        j_all = np.tile(_FANOUT_J, len(nodes)).reshape(len(nodes), 4)
        keep = ((7 * nodes[:, None] + 13 * _FANOUT_J[None, :] + 1) % n
                != nodes[:, None])
        j_kept = j_all[keep]
        pos = {int(node): i for i, node in enumerate(nodes)}
        anchors = [texts[pos[int(s)]][7 * int(j):7 * int(j) + 7]
                   for s, j in zip(src_rep, j_kept)]
        df = pd.DataFrame({"dst": dst, "src": src_rep, "anchor": anchors})
        agg = df.groupby("dst", as_index=False).agg(
            n_inlinks=("src", "size"),
            n_src=("src", "nunique"),   # exact: src unique to this batch
            min_anchor=("anchor", "min"),
            max_anchor=("anchor", "max"))
        return agg

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("dst", as_index=False).agg(
            n_inlinks=("n_inlinks", "sum"),
            n_src=("n_src", "sum"),
            min_anchor=("min_anchor", "min"),
            max_anchor=("max_anchor", "max"))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "dst_id": pa.array(batch.column("dst").to_numpy(
                zero_copy_only=False), type=pa.int64()),
            "n_inlinks": pa.array(batch.column("n_inlinks").to_numpy(
                zero_copy_only=False), type=pa.int64()),
            "n_src": pa.array(batch.column("n_src").to_numpy(
                zero_copy_only=False), type=pa.int64()),
            "min_anchor": batch.column("min_anchor"),
            "max_anchor": batch.column("max_anchor"),
        })

    return (bucketed_group_apply(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["dst"], merge, num_buckets=16)
        .map_batches(finish, batch_format="pyarrow")
        .sort("dst_id"))


SQL_ANCHOR_TEXT = """
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
e AS (
  SELECT d.doc_id AS src,
         (7*d.doc_id + 13*j.j + 1) % (SELECT c FROM nn) AS dst,
         substring(d.text, 7*j.j + 1, 7) AS anchor
  FROM documents d, (SELECT unnest(generate_series(0, 3)) AS j) j
  WHERE (7*d.doc_id + 13*j.j + 1) % (SELECT c FROM nn) <> d.doc_id
)
SELECT dst AS dst_id,
       COUNT(*) AS n_inlinks,
       CAST(COUNT(DISTINCT src) AS BIGINT) AS n_src,
       MIN(anchor) AS min_anchor,
       MAX(anchor) AS max_anchor
FROM e GROUP BY dst ORDER BY dst
"""


def q_triangle_count(sf_dir: str) -> rd.Dataset:
    """Per-node triangle counts over the UNDIRECTED link graph — the
    classic graph-locality statistic (clustering coefficient numerator,
    spam-farm detection) and the canonical E^{3/2}-bounded distributed
    join.

    Degree-ordered algorithm (Suri & Vassilvitskii's MapReduce shape):
    1. canonical edges (min, max) derived closed-form per node block,
       deduped by ONE groupby;
    2. degrees by per-batch endpoint partials → groupby sum (node-sized
       table, never driver-side);
    3. each edge oriented from its (deg, id)-smaller endpoint — two
       bucketed cogroups attach endpoint degrees (node-sized ⋈
       edge-sized, neither broadcast);
    4. wedges: per oriented-src group, all out-neighbor pairs in
       (deg, id) order — orientation bounds out-degree by O(√E), so
       wedge volume is O(E^{3/2}) worst case instead of Σdeg²;
    5. ONE cogroup of wedges vs oriented edges on (b, c) closes
       triangles; per-node counts flat-emit 3 rows per triangle into a
       final bounded groupby.
    Every stage is a bucketed exchange of (int64, int64) rows; nothing
    corpus-sized is materialized or broadcast."""
    import os

    import pyarrow.parquet as pq

    from .grouping import bucketed_cogroup, bucketed_group_apply
    from ..sources.io import read_parquet_sized

    n = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    nodes = read_parquet_sized(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"], rows_per_block=2000)

    def edges_of(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src, dst, _ = _targets(np.asarray(ids, dtype=np.int64), n)
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        return pa.table({"a": pa.array(a, type=pa.int64()),
                         "b": pa.array(b, type=pa.int64())})

    raw = nodes.map_batches(edges_of, batch_format="pyarrow")

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["a", "b"]).astype(
            {"a": np.int64, "b": np.int64})

    # hash-bucketed dedup (native sort-groupby costs ~4 s of fixed
    # shuffle overhead at this size); edges and oriented are each
    # consumed by MULTIPLE downstream stages, so both materialize —
    # edge-sized tables, the documented residency trade (same caveat
    # as the dedup family's memoized hash sets)
    edges = bucketed_group_apply(raw, ["a", "b"], dedup,
                                 num_buckets=16).materialize()

    def deg_partial(batch: pa.Table) -> pd.DataFrame:
        ends = np.concatenate([
            batch.column("a").to_numpy(zero_copy_only=False),
            batch.column("b").to_numpy(zero_copy_only=False)])
        node, cnt = np.unique(ends, return_counts=True)
        return pd.DataFrame({"node": node.astype(np.int64),
                             "dpart": cnt.astype(np.int64)})

    def deg_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False).agg(deg=("dpart", "sum"))
        return g.astype({"node": np.int64, "deg": np.int64})

    degrees = bucketed_group_apply(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"], deg_merge, num_buckets=16)

    def attach(col: str, out: str):
        def fn(ef: pd.DataFrame, nf: pd.DataFrame) -> pd.DataFrame:
            if ef.empty:
                cols = {c: pd.Series(dtype=ef[c].dtype if c in ef
                                     else np.int64)
                        for c in list(ef.columns) + [out]}
                return pd.DataFrame(cols)
            m = ef.merge(nf.rename(columns={"node": col,
                                            "deg": out}), on=col)
            return m.astype({out: np.int64})
        return fn

    e1 = bucketed_cogroup(edges, degrees, ["a"], ["node"],
                          attach("a", "deg_a"), num_buckets=16)
    e2 = bucketed_cogroup(e1, degrees, ["b"], ["node"],
                          attach("b", "deg_b"), num_buckets=16)

    def orient(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        a_first = (df.deg_a < df.deg_b) | (
            (df.deg_a == df.deg_b) & (df.a < df.b))
        src = np.where(a_first, df.a, df.b).astype(np.int64)
        dst = np.where(a_first, df.b, df.a).astype(np.int64)
        sdeg = np.where(a_first, df.deg_a, df.deg_b).astype(np.int64)
        ddeg = np.where(a_first, df.deg_b, df.deg_a).astype(np.int64)
        return pa.table({"src": src, "dst": dst,
                         "sdeg": sdeg, "ddeg": ddeg})

    oriented = e2.map_batches(orient,
                              batch_format="pyarrow").materialize()

    def wedges_of(df: pd.DataFrame) -> pd.DataFrame:
        rows_a, rows_b, rows_c = [], [], []
        for src, g in df.groupby("src"):
            nbrs = sorted(zip(g.ddeg, g.dst))
            for i in range(len(nbrs)):
                for j in range(i + 1, len(nbrs)):
                    rows_a.append(src)
                    rows_b.append(nbrs[i][1])
                    rows_c.append(nbrs[j][1])
        return pd.DataFrame({
            "wa": pd.Series(rows_a, dtype=np.int64),
            "wb": pd.Series(rows_b, dtype=np.int64),
            "wc": pd.Series(rows_c, dtype=np.int64)})

    wedges = bucketed_group_apply(oriented, ["src"], wedges_of,
                                  num_buckets=16)

    def close(wf: pd.DataFrame, ef: pd.DataFrame) -> pd.DataFrame:
        if wf.empty or ef.empty:
            return pd.DataFrame({"node": pd.Series(dtype=np.int64),
                                 "tpart": pd.Series(dtype=np.int64)})
        m = wf.merge(ef.rename(columns={"src": "wb", "dst": "wc"}),
                     on=["wb", "wc"])
        nodes_flat = np.concatenate([m.wa.to_numpy(), m.wb.to_numpy(),
                                     m.wc.to_numpy()]).astype(np.int64)
        node, cnt = np.unique(nodes_flat, return_counts=True)
        return pd.DataFrame({"node": node.astype(np.int64),
                             "tpart": cnt.astype(np.int64)})

    closed = bucketed_cogroup(wedges,
                              oriented.select_columns(["src", "dst"]),
                              ["wb", "wc"], ["src", "dst"], close,
                              num_buckets=16)

    def tri_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False).agg(
            n_triangles=("tpart", "sum"))
        return g.astype({"node": np.int64, "n_triangles": np.int64})

    return bucketed_group_apply(closed, ["node"], tri_merge,
                                num_buckets=16).sort("node")


SQL_TRIANGLE_COUNT = """
WITH nn AS (SELECT COUNT(*) AS c FROM documents),
raw AS (
  SELECT d.doc_id AS u,
         (7*d.doc_id + 13*j.j + 1) % (SELECT c FROM nn) AS v
  FROM documents d, (SELECT unnest(generate_series(0, 3)) AS j) j
  WHERE (7*d.doc_id + 13*j.j + 1) % (SELECT c FROM nn) <> d.doc_id
), e AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), tn AS (
  SELECT unnest([x, y, z]) AS node FROM tri
)
SELECT CAST(node AS BIGINT) AS node, COUNT(*) AS n_triangles
FROM tn GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------------ BFS hops
BFS_HOPS = 3
BFS_SOURCE_MOD = 100


def q_bfs_hops(sf_dir: str) -> rd.Dataset:
    """Multi-source BFS: min-hop labels within 3 hops of the seed set
    {node : node % 100 == 0} (~1% of the corpus) over the closed-form
    link graph — the bounded-depth frontier-expansion iteration
    (crawl-depth / contamination-spread labeling; unbounded-depth
    connected components live in dedup.py).

    Per iteration: ONE map_batches over the distance table passes
    existing labels through and derives hop+1 candidates closed-form
    from frontier nodes (no edge table is ever shipped), with an
    in-batch min combiner, then one node-bucketed min merge.  Three
    iterations = three bucketed shuffles over (node, hop) int64 pairs;
    the table is bounded by |reached|, never |V| x iterations."""
    import os

    import pyarrow.parquet as pq

    from ..sources.io import read_parquet_sized
    from .grouping import bucketed_group_apply

    n = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet",
                            columns=["doc_id"], rows_per_block=2000)

    def seeds(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        src = ids[ids % BFS_SOURCE_MOD == 0].astype(np.int64)
        return pa.table({"node": pa.array(src, type=pa.int64()),
                         "hop": pa.array(np.zeros(len(src), np.int64))})

    dist = ds.map_batches(seeds, batch_format="pyarrow")

    def minmerge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False).hop.min()

    for k in range(BFS_HOPS):

        def expand(batch: pa.Table, _k=k) -> pa.Table:
            nodes = batch.column("node").to_numpy(zero_copy_only=False)
            hops = batch.column("hop").to_numpy(zero_copy_only=False)
            frontier = nodes[hops == _k]
            _, dst, _deg = _targets(frontier, n)
            df = pd.DataFrame({
                "node": np.concatenate([nodes, dst]),
                "hop": np.concatenate(
                    [hops, np.full(len(dst), _k + 1, dtype=np.int64)]),
            })
            part = df.groupby("node", as_index=False).hop.min()
            return pa.table({
                "node": pa.array(part.node.to_numpy(), type=pa.int64()),
                "hop": pa.array(part.hop.to_numpy(), type=pa.int64()),
            })

        dist = bucketed_group_apply(
            dist.map_batches(expand, batch_format="pyarrow"),
            ["node"], minmerge, num_buckets=16)

    return dist.sort("node")


SQL_BFS_HOPS = f"""
WITH RECURSIVE bfs(node, hop) AS (
    SELECT doc_id AS node, CAST(0 AS BIGINT) AS hop
    FROM documents WHERE doc_id % {BFS_SOURCE_MOD} = 0
  UNION ALL
    SELECT (7*b.node + 13*j.j + 1) % (SELECT COUNT(*) FROM documents),
           b.hop + 1
    FROM bfs b, (SELECT unnest(generate_series(0, 3)) AS j) j
    WHERE b.hop < {BFS_HOPS}
      AND (7*b.node + 13*j.j + 1) % (SELECT COUNT(*) FROM documents)
          <> b.node
)
SELECT node, CAST(MIN(hop) AS BIGINT) AS hop
FROM bfs GROUP BY node ORDER BY node
"""


# --------------------------------------------------- HITS (hubs/authorities)
N_HITS_ITERS = 2


def _in_sources(nodes: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Reverse edge derivation: for each v in ``nodes``, every u with
    u -> v in the closed-form graph — solved, not joined.  7u ≡ v-13j-1
    (mod n) has gcd(7, n) solutions when that gcd divides the residue:
    one via the modular inverse when gcd = 1 (every sf corpus), seven
    spaced n/7 apart when 7 | n.  Vectorized over the whole batch."""
    import math

    nodes = nodes.astype(np.int64)
    g = math.gcd(7, n)
    outs_v: list[np.ndarray] = []
    outs_u: list[np.ndarray] = []
    for j in range(4):
        c = (nodes - 13 * j - 1) % n
        if g == 1:
            inv7 = pow(7, -1, n)
            u = (inv7 * c) % n
            ok = u != nodes
            outs_v.append(nodes[ok])
            outs_u.append(u[ok])
        else:
            m = n // 7
            has = (c % 7) == 0
            base, vs = c[has] // 7, nodes[has]
            for t in range(7):
                u = (base + t * m) % n
                ok = u != vs
                outs_v.append(vs[ok])
                outs_u.append(u[ok])
    return np.concatenate(outs_v), np.concatenate(outs_u)


def q_hits(sf_dir: str) -> rd.Dataset:
    """HITS hubs/authorities over the closed-form link graph — the OTHER
    canonical link-analysis iteration (query-dependent ranking, spam/seed
    scoring) next to PageRank.  UNNORMALIZED integer HITS: with h0 = 1,

        a_{k+1}(v) = Σ_{u→v} h_k(u)     h_{k+1}(u) = Σ_{u→v} a_{k+1}(v)

    every score stays a small exact int64 (out-degree ≤ 4, in-degree
    ≤ 28 ⇒ after 2 full iterations scores < 4·28·4·28), so the classic
    float-normalization nondeterminism never enters and the DuckDB
    oracle agrees bit-for-bit.  Normalization is a POST-STEP a consumer
    can do on the bounded output (rank order is unaffected).

    Shape per half-iteration: ONE map_batches over the bounded
    (node, score) table with an in-batch (dst, partial) combiner —
    forward edges derived closed-form for the a-step, REVERSE edges
    solved closed-form (``_in_sources``, no edge-table broadcast or
    join) for the h-step — then one node-bucketed sum.  2 full
    iterations = 4 bucketed shuffles of (node, int64) pairs only; the
    documents table is read once for its ids."""
    import os

    import pyarrow.parquet as pq

    from ..sources.io import read_parquet_sized
    from .grouping import bucketed_group_apply

    n = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows

    ids = read_parquet_sized(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"], rows_per_block=2000)

    def init(batch: pa.Table) -> pa.Table:
        nodes = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(nodes.astype(np.int64)),
            "s": pa.array(np.ones(len(nodes), dtype=np.int64)),
        })

    def sum_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)["s"].sum()
        out["node"] = out["node"].astype(np.int64)
        out["s"] = out["s"].astype(np.int64)
        return out

    def a_emit(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").to_numpy(zero_copy_only=False)
        s = batch.column("s").to_numpy(zero_copy_only=False)
        src_rep, dst, deg = _targets(nodes, n)
        per_edge = np.repeat(s, deg)
        df = pd.DataFrame({"node": dst, "s": per_edge})
        part = df.groupby("node", as_index=False)["s"].sum()
        pres = pd.DataFrame({"node": nodes,
                             "s": np.zeros(len(nodes), np.int64)})
        out = pd.concat([part, pres], ignore_index=True)
        return pa.table({"node": pa.array(out["node"].to_numpy()
                                          .astype(np.int64)),
                         "s": pa.array(out["s"].to_numpy()
                                       .astype(np.int64))})

    def h_emit(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").to_numpy(zero_copy_only=False)
        s = batch.column("s").to_numpy(zero_copy_only=False)
        v_rep, u = _in_sources(nodes, n)
        # score of the v each (u, v) edge came from: v_rep indexes into
        # this batch's nodes via searchsorted on the batch-local sort
        order = np.argsort(nodes, kind="stable")
        pos = order[np.searchsorted(nodes[order], v_rep)]
        df = pd.DataFrame({"node": u, "s": s[pos]})
        part = df.groupby("node", as_index=False)["s"].sum()
        pres = pd.DataFrame({"node": nodes,
                             "s": np.zeros(len(nodes), np.int64)})
        out = pd.concat([part, pres], ignore_index=True)
        return pa.table({"node": pa.array(out["node"].to_numpy()
                                          .astype(np.int64)),
                         "s": pa.array(out["s"].to_numpy()
                                       .astype(np.int64))})

    h = ids.map_batches(init, batch_format="pyarrow")
    for _ in range(N_HITS_ITERS):
        a = bucketed_group_apply(
            h.map_batches(a_emit, batch_format="pyarrow"),
            ["node"], sum_merge, num_buckets=16)
        h = bucketed_group_apply(
            a.map_batches(h_emit, batch_format="pyarrow"),
            ["node"], sum_merge, num_buckets=16)

    # final a over the last h, then zip (a, h) per node in one merge
    a = bucketed_group_apply(
        h.map_batches(a_emit, batch_format="pyarrow"),
        ["node"], sum_merge, num_buckets=16)

    def tag(col: str):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table({
                "node": batch.column("node"),
                "auth_scaled": batch.column("s") if col == "a"
                else pa.array(np.zeros(batch.num_rows, np.int64)),
                "hub_scaled": batch.column("s") if col == "h"
                else pa.array(np.zeros(batch.num_rows, np.int64)),
            })
        return f

    def zip_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)[
            ["auth_scaled", "hub_scaled"]].sum()
        for c in out.columns:
            out[c] = out[c].astype(np.int64)
        return out

    both = (a.map_batches(tag("a"), batch_format="pyarrow")
            .union(h.map_batches(tag("h"), batch_format="pyarrow")))
    return bucketed_group_apply(both, ["node"], zip_merge,
                                num_buckets=16).sort("node")


def _hits_sql() -> str:
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents)",
        "nodes AS (SELECT doc_id AS node FROM documents)",
        ("edges AS (SELECT node AS src, "
         "(7*node + 13*j.j + 1) % (SELECT c FROM nn) AS dst "
         "FROM nodes, (SELECT unnest(generate_series(0, 3)) AS j) j "
         "WHERE (7*node + 13*j.j + 1) % (SELECT c FROM nn) <> node)"),
        "h0 AS (SELECT node, CAST(1 AS BIGINT) AS s FROM nodes)",
    ]
    for k in range(N_HITS_ITERS):
        parts.append(
            f"a{k + 1} AS (SELECT n.node, CAST(COALESCE(SUM(h{k}.s), 0)"
            f" AS BIGINT) AS s FROM nodes n "
            f"LEFT JOIN edges e ON e.dst = n.node "
            f"LEFT JOIN h{k} ON h{k}.node = e.src GROUP BY n.node)")
        parts.append(
            f"h{k + 1} AS (SELECT n.node, CAST(COALESCE(SUM(a{k + 1}.s),"
            f" 0) AS BIGINT) AS s FROM nodes n "
            f"LEFT JOIN edges e ON e.src = n.node "
            f"LEFT JOIN a{k + 1} ON a{k + 1}.node = e.dst "
            f"GROUP BY n.node)")
    k = N_HITS_ITERS
    parts.append(
        f"afin AS (SELECT n.node, CAST(COALESCE(SUM(h{k}.s), 0)"
        f" AS BIGINT) AS s FROM nodes n "
        f"LEFT JOIN edges e ON e.dst = n.node "
        f"LEFT JOIN h{k} ON h{k}.node = e.src GROUP BY n.node)")
    return (", ".join(parts)
            + f" SELECT n.node, afin.s AS auth_scaled, "
              f"h{k}.s AS hub_scaled FROM nodes n "
              f"JOIN afin ON afin.node = n.node "
              f"JOIN h{k} ON h{k}.node = n.node ORDER BY n.node")


SQL_HITS = _hits_sql()


# --------------------------------------- weighted SSSP (Bellman-Ford rounds)
SSSP_ROUNDS = 4
SSSP_SOURCE = 0


def _targets_weighted(nodes: np.ndarray, n: int) -> tuple[np.ndarray,
                                                          np.ndarray,
                                                          np.ndarray]:
    """Forward edges with their closed-form integer weights
    w(u, j) = 1 + (u + j) mod 5.  Returns (dst, w, deg) with the edges
    of nodes[i] contiguous in input order (np.repeat alignment)."""
    nodes = nodes.astype(np.int64)
    dst = (7 * nodes[:, None] + 13 * _FANOUT_J[None, :] + 1) % n
    w = 1 + (nodes[:, None] + _FANOUT_J[None, :]) % 5
    keep = dst != nodes[:, None]
    return dst[keep], w[keep].astype(np.int64), keep.sum(axis=1)


def q_sssp(sf_dir: str) -> rd.Dataset:
    """Single-source shortest paths with integer edge weights, bounded
    to ``SSSP_ROUNDS`` relaxation rounds — distributed Bellman-Ford, the
    weighted counterpart of bfs_hops (link-distance scoring, crawl-cost
    budgeting).  Weights w(u, j) = 1 + (u + j) mod 5 are closed-form in
    the edge, so no edge table ships; all-integer distances make the
    min-semilattice merge order-insensitive and the result bit-equal to
    the unrolled DuckDB oracle (d_{k+1}(v) = min(d_k(v),
    min_{u→v} d_k(u) + w(u, v))).

    Per round: ONE map_batches over the bounded frontier/dist table
    (pass-through rows + weighted hop+1 candidates, in-batch min
    combiner) → one node-bucketed min merge.  The table holds only
    REACHED nodes, never |V| rows per round."""
    import pyarrow.parquet as pq

    from .grouping import bucketed_group_apply

    n = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    dist = rd.from_arrow(pa.table({
        "node": pa.array([SSSP_SOURCE], type=pa.int64()),
        "dist": pa.array([0], type=pa.int64()),
    }))

    def minmerge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("node", as_index=False)["dist"].min()
        out["node"] = out["node"].astype(np.int64)
        out["dist"] = out["dist"].astype(np.int64)
        return out

    def relax(batch: pa.Table) -> pa.Table:
        nodes = batch.column("node").to_numpy(zero_copy_only=False)
        d = batch.column("dist").to_numpy(zero_copy_only=False)
        dst, w, deg = _targets_weighted(nodes, n)
        cand_d = np.repeat(d, deg) + w
        df = pd.DataFrame({
            "node": np.concatenate([nodes, dst]),
            "dist": np.concatenate([d, cand_d]),
        })
        part = df.groupby("node", as_index=False)["dist"].min()
        return pa.table({
            "node": pa.array(part["node"].to_numpy().astype(np.int64)),
            "dist": pa.array(part["dist"].to_numpy().astype(np.int64)),
        })

    for _ in range(SSSP_ROUNDS):
        dist = bucketed_group_apply(
            dist.map_batches(relax, batch_format="pyarrow"),
            ["node"], minmerge, num_buckets=16)

    return dist.sort("node")


def _sssp_sql() -> str:
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents)",
        "nodes AS (SELECT doc_id AS node FROM documents)",
        ("edges AS (SELECT node AS src, "
         "(7*node + 13*j.j + 1) % (SELECT c FROM nn) AS dst, "
         "1 + (node + j.j) % 5 AS w "
         "FROM nodes, (SELECT unnest(generate_series(0, 3)) AS j) j "
         "WHERE (7*node + 13*j.j + 1) % (SELECT c FROM nn) <> node)"),
        (f"d0 AS (SELECT CAST({SSSP_SOURCE} AS BIGINT) AS node, "
         f"CAST(0 AS BIGINT) AS dist)"),
    ]
    for k in range(SSSP_ROUNDS):
        parts.append(
            f"d{k + 1} AS (SELECT node, CAST(MIN(dist) AS BIGINT) AS "
            f"dist FROM (SELECT node, dist FROM d{k} UNION ALL "
            f"SELECT e.dst AS node, d{k}.dist + e.w AS dist "
            f"FROM d{k} JOIN edges e ON e.src = d{k}.node) "
            f"GROUP BY node)")
    return (", ".join(parts)
            + f" SELECT node, dist FROM d{SSSP_ROUNDS} ORDER BY node")


SQL_SSSP = _sssp_sql()


# ------------------------------------------------------ k-core peeling
# Coreness structure over the ANCESTRY graph u ~ u>>1, u>>2, u>>3 — a
# deliberately skewed hierarchy (low ids are hubs, leaves degree ~3)
# whose k-core onion peels non-trivially at every sf scale, unlike the
# near-regular 7u+13j+1 crawl graph (degree 6-8 everywhere).  Like
# sssp_dist's bounded-round Bellman-Ford, the operator is DEFINED as R
# bounded peel rounds: output is (node, peeled_round in 1..R, or R+1 if
# still in the k-core after R rounds) — the exact semantics the unrolled
# SQL oracle reproduces.
KCORE_K = 4
KCORE_ROUNDS = 4


def _und_neighbors(nodes: np.ndarray, n: int) -> tuple[np.ndarray,
                                                       np.ndarray]:
    """Closed-form undirected neighbors: parents u>>j (j=1..3) and the
    child ranges [2u,2u+1], [4u,4u+3], [8u,8u+7] clipped to [0,n) —
    derived per batch, never shipped as an edge table.  Returns
    deduplicated (src_rep, nbr) pairs (small-u self/overlap cases are
    deduped via one np.unique on the combined key)."""
    nodes = nodes.astype(np.int64)
    srcs, nbrs = [], []
    for j in (1, 2, 3):
        p = nodes >> j
        ok = p != nodes
        srcs.append(nodes[ok])
        nbrs.append(p[ok])
        lo, width = nodes << j, 1 << j
        cnt = np.clip(n - lo, 0, width)
        keep = cnt > 0
        rep = np.repeat(nodes[keep], cnt[keep])
        offs = np.concatenate([np.arange(c) for c in cnt[keep]]) \
            if keep.any() else np.array([], dtype=np.int64)
        child = np.repeat(lo[keep], cnt[keep]) + offs
        ok2 = child != rep
        srcs.append(rep[ok2])
        nbrs.append(child[ok2].astype(np.int64))
    s = np.concatenate(srcs)
    v = np.concatenate(nbrs)
    key = np.unique(s * np.int64(n) + v)
    return key // n, key % n


def q_kcore(sf_dir: str) -> rd.Dataset:
    """Distributed k-core peeling, R bounded rounds.

    Shape per round: ONE map_batches over the survivor table derives
    each survivor's closed-form neighbor pairs (deg <= 14, no edge
    table), a survivor-bucketed cogroup keeps pairs whose neighbor
    survives (semi-join), and one node-bucketed sum counts surviving
    degree — nodes below K are peeled.  2 bucketed exchanges per round
    over (node, int64) pairs only; survivors shrink monotonically.
    Removed rounds accumulate as tiny (node, round) tables unioned at
    the end."""
    import os

    import pyarrow.parquet as pq

    from ..sources.io import read_parquet_sized
    from .grouping import bucketed_cogroup, bucketed_group_apply

    n = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows

    survivors = read_parquet_sized(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
        rows_per_block=2000).map_batches(
            lambda b: pa.table({"node": b.column("doc_id")}),
            batch_format="pyarrow")

    peeled: list[rd.Dataset] = []
    for r in range(1, KCORE_ROUNDS + 1):
        survivors = survivors.materialize()   # consumed 3x this round

        def edges_of(batch: pa.Table) -> pa.Table:
            u, v = _und_neighbors(
                batch.column("node").to_numpy(zero_copy_only=False), n)
            return pa.table({"u": pa.array(u), "nbr": pa.array(v)})

        pairs = survivors.map_batches(edges_of, batch_format="pyarrow")

        def alive_deg(pf: pd.DataFrame, sf: pd.DataFrame) -> pd.DataFrame:
            keep = pf[pf.nbr.isin(sf.node)]
            out = keep.groupby("u", as_index=False).size()
            out.columns = ["node", "c"]
            return out.astype({"node": np.int64, "c": np.int64})

        partial = bucketed_cogroup(pairs, survivors, ["nbr"], ["node"],
                                   alive_deg, num_buckets=16)

        def total(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("node", as_index=False).c.sum()
            return out.astype({"node": np.int64, "c": np.int64})

        deg = bucketed_group_apply(partial, ["node"], total,
                                   num_buckets=16)

        def survive(df: pd.DataFrame, dg: pd.DataFrame,
                    _r=r) -> pd.DataFrame:
            m = df.merge(dg, on="node", how="left").fillna({"c": 0})
            m["peeled_round"] = np.int64(_r)
            dead = m[m.c < KCORE_K]
            return dead[["node", "peeled_round"]].astype(
                {"node": np.int64, "peeled_round": np.int64})

        dead = bucketed_cogroup(survivors, deg, ["node"], ["node"],
                                survive, num_buckets=16).materialize()
        peeled.append(dead)

        def still(df: pd.DataFrame, dd: pd.DataFrame) -> pd.DataFrame:
            out = df[~df.node.isin(dd.node)][["node"]]
            return out.astype({"node": np.int64})

        survivors = bucketed_cogroup(survivors, dead, ["node"], ["node"],
                                     still, num_buckets=16)

    core = survivors.map_batches(
        lambda b: pa.table({
            "node": b.column("node"),
            "peeled_round": pa.array(
                np.full(b.num_rows, KCORE_ROUNDS + 1, dtype=np.int64)),
        }), batch_format="pyarrow")
    out = core
    for d in peeled:
        out = out.union(d)
    return out.sort("node")


def _kcore_sql() -> str:
    parts = [
        "WITH nn AS (SELECT COUNT(*) AS c FROM documents)",
        "nodes AS (SELECT doc_id AS node FROM documents)",
        ("ed AS (SELECT DISTINCT LEAST(node, node // p.p) AS x, "
         "GREATEST(node, node // p.p) AS y "
         "FROM nodes, (VALUES (2), (4), (8)) p(p) "
         "WHERE node // p.p <> node)"),
        "edges AS (SELECT x AS a, y AS b FROM ed "
        "UNION ALL SELECT y, x FROM ed)",
        "s0 AS (SELECT node FROM nodes)",
    ]
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(
            f"d{r} AS (SELECT e.a AS node, COUNT(*) AS d FROM edges e "
            f"JOIN s{r - 1} sa ON sa.node = e.a "
            f"JOIN s{r - 1} sb ON sb.node = e.b GROUP BY 1)")
        parts.append(
            f"s{r} AS (SELECT node FROM d{r} WHERE d >= {KCORE_K})")
        parts.append(
            f"p{r} AS (SELECT node, CAST({r} AS BIGINT) AS peeled_round "
            f"FROM s{r - 1} WHERE node NOT IN (SELECT node FROM s{r}))")
    unions = " UNION ALL ".join(
        [f"SELECT * FROM p{r}" for r in range(1, KCORE_ROUNDS + 1)]
        + [f"SELECT node, CAST({KCORE_ROUNDS + 1} AS BIGINT) "
           f"FROM s{KCORE_ROUNDS}"])
    return (", ".join(parts)
            + f" SELECT node, peeled_round FROM ({unions}) ORDER BY node")


SQL_KCORE = _kcore_sql()


# ----------------------------------------------- common-neighbors score
# Link prediction on the ancestry graph: for NON-adjacent pairs, the
# common-neighbors count (Liben-Nowell & Kleinberg's simplest score,
# the building block of Adamic-Adar / resource allocation).  Top-100 by
# (score, a, b) — the candidate edges a recommender would propose.
_CN_TOPK = 100


def q_common_neighbors(sf_dir: str) -> pd.DataFrame:
    """Shape at scale: wedges derive per batch from each center's
    closed-form neighbor list (<= C(14,2) = 91 pairs per node, no edge
    table, no broadcast); per-batch pre-aggregation then ONE pair-keyed
    bucketed sum.  Adjacency of a candidate pair is a closed-form
    ARITHMETIC test (b>>j == a), so the anti-join that usually needs a
    second edge shuffle is a vectorized filter.  Final top-100 is a
    semilattice (per-bucket top-100, <= 100 x 16 driver rows)."""
    import os

    import pyarrow.parquet as pq

    from ..sources.io import read_parquet_sized
    from .grouping import bucketed_group_apply

    n = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows

    ids = read_parquet_sized(f"{sf_dir}/documents.parquet",
                             columns=["doc_id"], rows_per_block=2000)

    def wedges(batch: pa.Table) -> pd.DataFrame:
        nodes = batch.column("doc_id").to_numpy(zero_copy_only=False)
        u, v = _und_neighbors(nodes, n)
        rows_a, rows_b = [], []
        # neighbor lists are tiny and sorted by (u, v) via np.unique;
        # expand per-center pairs vectorized over run boundaries
        starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
        ends = np.r_[starts[1:], len(u)]
        for s, e in zip(starts, ends):
            nb = v[s:e]
            if len(nb) >= 2:
                ia, ib = np.triu_indices(len(nb), k=1)
                rows_a.append(nb[ia])
                rows_b.append(nb[ib])
        if not rows_a:
            return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                                 "b": pd.Series(dtype=np.int64),
                                 "cn": pd.Series(dtype=np.int64)})
        a = np.concatenate(rows_a)
        b = np.concatenate(rows_b)
        out = (pd.DataFrame({"a": a, "b": b})
               .groupby(["a", "b"], as_index=False).size()
               .rename(columns={"size": "cn"}))
        return out.astype({"a": np.int64, "b": np.int64, "cn": np.int64})

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["a", "b"], as_index=False).cn.sum()
        a = out.a.to_numpy()
        b = out.b.to_numpy()
        adj = ((b >> 1) == a) | ((b >> 2) == a) | ((b >> 3) == a)
        out = out[~adj]
        return (out.sort_values(["cn", "a", "b"],
                                ascending=[False, True, True])
                .head(_CN_TOPK)
                .astype({"a": np.int64, "b": np.int64, "cn": np.int64}))

    partial = ids.map_batches(wedges, batch_format="pyarrow")
    merged = bucketed_group_apply(partial, ["a", "b"], topk,
                                  num_buckets=16).to_pandas()
    return (merged.sort_values(["cn", "a", "b"],
                               ascending=[False, True, True])
            .head(_CN_TOPK).reset_index(drop=True))


SQL_COMMON_NEIGHBORS = f"""
WITH nodes AS (SELECT doc_id AS node FROM documents),
ed AS (SELECT DISTINCT LEAST(node, node // p.p) AS x,
              GREATEST(node, node // p.p) AS y
       FROM nodes, (VALUES (2), (4), (8)) p(p)
       WHERE node // p.p <> node),
dir AS (SELECT x AS c, y AS nb FROM ed UNION ALL SELECT y, x FROM ed),
wedge AS (
  SELECT e1.nb AS a, e2.nb AS b, COUNT(*) AS cn
  FROM dir e1 JOIN dir e2
    ON e1.c = e2.c AND e1.nb < e2.nb
  GROUP BY 1, 2
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(cn AS BIGINT) AS cn
FROM wedge w
WHERE NOT EXISTS (SELECT 1 FROM ed WHERE ed.x = w.a AND ed.y = w.b)
ORDER BY cn DESC, a, b LIMIT {_CN_TOPK}
"""


GRAPH_QUERIES = {
    "pagerank": (q_pagerank, SQL_PAGERANK),
    "kcore_peel": (q_kcore, SQL_KCORE),
    "common_neighbors": (q_common_neighbors, SQL_COMMON_NEIGHBORS),
    "anchor_text": (q_anchor_text, SQL_ANCHOR_TEXT),
    "triangle_count": (q_triangle_count, SQL_TRIANGLE_COUNT),
    "bfs_hops": (q_bfs_hops, SQL_BFS_HOPS),
    "hits_scores": (q_hits, SQL_HITS),
    "sssp_dist": (q_sssp, SQL_SSSP),
}
