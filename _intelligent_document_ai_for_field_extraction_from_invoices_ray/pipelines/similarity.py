"""Similarity search over the ``embeddings`` table (list<float> vectors).

- **brute-force cosine top-k**: broadcast query matrix (``ray.put`` once —
  the QUERY side is genuinely small), per-batch numpy matmul, per-batch
  partial top-k, tiny driver merge — the baseline exact path.
- **cosine near-dup pairs**: exact all-pairs via the block-pair grid
  (``grouping.pair_grid_apply``) — vectors shuffle into block-pair groups,
  nothing corpus-sized is broadcast or materialized driver-side.
- **LSH-bucketed ANN**: random-hyperplane signatures → bucket groupby →
  within-bucket exact search; the sub-linear scale path (recall < 1 by
  construction → verified by a recall pytest, not a SQL oracle).
- **IVF ANN**: sample-fit centroids (broadcast, tiny) → vectors shuffle
  into inverted lists as members + probe-queries → per-list vectorized
  search → per-vector reduce across probed lists.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

TOPK_QUERIES = 5      # vec_id < 5 are the query vectors
TOPK_K = 8


def _emb(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    emb = batch.column("embedding")
    if isinstance(emb, pa.ChunkedArray):
        emb = emb.combine_chunks()
    flat = emb.flatten().to_numpy(zero_copy_only=False)
    mat = flat.reshape(len(ids), -1).astype(np.float64)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


# ------------------------------------------------------------ exact top-k
def q_embed_topk(sf_dir: str) -> pd.DataFrame:
    """Exact cosine top-k for the first TOPK_QUERIES vectors.

    Emits (query_id, rank, neighbor_id); scores stay internal so the
    DuckDB comparison is float-order-insensitive."""
    ds = _emb(sf_dir)
    qdf = (rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])
           .filter(expr=f"vec_id < {TOPK_QUERIES}").to_pandas())
    q_ids = qdf.vec_id.to_numpy()
    q_mat = _normalize(np.stack(qdf.embedding.to_numpy()).astype(np.float64))
    q_ref = ray.put((q_ids, q_mat))

    def partial_topk(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _to_matrix(batch)
        qids, qmat = ray.get(q_ref)
        sims = _normalize(mat) @ qmat.T                 # (b, Q)
        rows = []
        for qi, qid in enumerate(qids):
            s = sims[:, qi]
            mask = ids != qid
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                continue
            order = cand[np.lexsort((ids[cand], -s[cand]))][:TOPK_K]
            for i in order:
                rows.append((int(qid), int(ids[i]), float(s[i])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim"])

    parts = ds.map_batches(partial_topk, batch_format="pyarrow",
                           batch_size=4096).to_pandas()
    out_rows = []
    for qid, g in parts.groupby("query_id"):
        g = g.sort_values(["sim", "neighbor_id"],
                          ascending=[False, True]).head(TOPK_K)
        for rank, (_, row) in enumerate(g.iterrows(), 1):
            out_rows.append((qid, rank, int(row.neighbor_id)))
    return pd.DataFrame(out_rows, columns=["query_id", "rank", "neighbor_id"])


SQL_EMBED_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings
           WHERE vec_id < {TOPK_QUERIES}),
s AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qe, e.embedding) AS sim
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id
)
SELECT query_id, rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id) AS rank
  FROM s) WHERE rank <= {TOPK_K}
ORDER BY query_id, rank
"""


# ------------------------------------------------------------ near-dup pairs
NEARDUP_BLOCKS = 8


def _pairs_frame(va=None, vb=None) -> pd.DataFrame:
    if va is None:
        return pd.DataFrame({"vec_a": pd.Series(dtype=np.int64),
                             "vec_b": pd.Series(dtype=np.int64)})
    return pd.DataFrame({"vec_a": va.astype(np.int64),
                         "vec_b": vb.astype(np.int64)})


def q_embed_neardup(sf_dir: str) -> pd.DataFrame:
    """All pairs with cosine ≥ 0.5 — EXACT all-pairs, distributed.

    Block-pair grid (grouping.pair_grid_apply): vectors shuffle into
    B(B+1)/2 block-pair groups (each vector replicated B times), every
    unordered pair lands in exactly one group, and the matmul runs
    per-group over two bounded blocks.  Nothing dataset-sized is
    broadcast or pulled to the driver; total flops stay O(n²) (inherent
    to the exact semantics — LSH/IVF below are the sub-quadratic paths)
    but memory per task is O((n/B)²) and tasks scale with the cluster."""
    from .grouping import pair_grid_apply

    def frame_matrix(df: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        ids = df.vec_id.to_numpy().astype(np.int64)
        mat = _normalize(np.stack(df.embedding.to_numpy()).astype(np.float64))
        return ids, mat

    def kernel(a: pd.DataFrame, b: pd.DataFrame | None) -> pd.DataFrame:
        if a.empty or (b is not None and b.empty):
            return _pairs_frame()
        ids_a, mat_a = frame_matrix(a)
        if b is None:                       # diagonal: within-block pairs
            sims = mat_a @ mat_a.T
            keep = (sims >= 0.5) & (ids_a[:, None] < ids_a[None, :])
            ai, bi = np.nonzero(keep)
            return _pairs_frame(ids_a[ai], ids_a[bi])
        ids_b, mat_b = frame_matrix(b)      # off-diagonal: cross pairs only
        sims = mat_a @ mat_b.T
        ai, bi = np.nonzero(sims >= 0.5)
        lo = np.minimum(ids_a[ai], ids_b[bi])
        hi = np.maximum(ids_a[ai], ids_b[bi])
        return _pairs_frame(lo, hi)

    out = pair_grid_apply(_emb(sf_dir), "vec_id", kernel,
                          num_blocks=NEARDUP_BLOCKS).to_pandas()
    if out.empty:
        # an empty Dataset to_pandas()es to a COLUMN-LESS frame
        return _pairs_frame()
    return out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)


SQL_EMBED_NEARDUP = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
ORDER BY vec_a, vec_b
"""


# ------------------------------------------------------------ LSH ANN
NUM_PLANES = 12
_plane_rng = np.random.RandomState(0xA11CE)


def _planes(dim: int) -> np.ndarray:
    rng = np.random.RandomState(0xA11CE)
    return rng.normal(size=(NUM_PLANES, dim))


LSH_MAX_BUCKET = 2048        # hot-bucket threshold (rows per task bound)
LSH_GRID_BLOCKS = 8
_NN_CHUNK = 1024             # chunked-matmul row window (memory bound)


def _df_matrix(g: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(ids, L2-normalized matrix) from a pandas frame carrying the
    Arrow list column as object-of-ndarray."""
    ids = g["vec_id"].to_numpy().astype(np.int64)
    mat = _normalize(np.stack([np.asarray(e, dtype=np.float64)
                               for e in g["embedding"].to_numpy()]))
    return ids, mat


def _nn_within(ids: np.ndarray, mat: np.ndarray) -> pd.DataFrame:
    """Deterministic exact NN inside one bucket: rows sorted by id, sims
    computed in _NN_CHUNK-row windows (memory O(chunk·k), never k²),
    ties broken toward the smallest neighbor id."""
    if len(ids) < 2:
        return pd.DataFrame({"vec_id": np.empty(0, np.int64),
                             "nn_id": np.empty(0, np.int64)})
    order = np.argsort(ids, kind="stable")
    ids, mat = ids[order], mat[order]
    nn = np.empty(len(ids), dtype=np.int64)
    for s in range(0, len(ids), _NN_CHUNK):
        e = min(len(ids), s + _NN_CHUNK)
        sims = mat[s:e] @ mat.T
        sims[np.arange(e - s), np.arange(s, e)] = -2.0   # mask self
        nn[s:e] = sims.argmax(axis=1)     # first max = smallest id (sorted)
    return pd.DataFrame({"vec_id": ids, "nn_id": ids[nn]})


def q_embed_ann_lsh(sf_dir: str) -> rd.Dataset:
    """Approximate NN via random-hyperplane buckets: each vector lands in
    one of 2^NUM_PLANES buckets; nearest neighbor searched within-bucket.
    Sub-linear at scale; recall is checked by pytest, not SQL.

    Scale shape (round 3; was one ``map_groups`` Python call per bucket
    with an unchunked k×k matmul): cold buckets run through
    ``bucketed_group_apply`` (64 tasks regardless of bucket count) with a
    chunked-matmul kernel; buckets larger than LSH_MAX_BUCKET — the
    low-entropy-embedding collapse case — are split over the
    ``pair_grid_apply`` block grid into bounded (k/B)² cells whose
    partial (vec_id, nn_id, sim) results reduce per vec_id (max sim,
    ties toward the smallest neighbor id), so no single task ever holds
    a corpus-sized bucket."""
    from .grouping import bucketed_group_apply, pair_grid_apply

    ds = _emb(sf_dir)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids, mat = _to_matrix(batch)
        planes = _planes(mat.shape[1])
        bits = (_normalize(mat) @ planes.T) > 0
        bucket = (bits.astype(np.int64)
                  * (1 << np.arange(NUM_PLANES))).sum(axis=1)
        return (batch.append_column("bucket", pa.array(bucket))
                .replace_schema_metadata(None))

    keyed = ds.map_batches(bucketize, batch_format="pyarrow",
                           batch_size=4096).materialize()

    # distributed hot-bucket histogram: only hot bucket ids (provably
    # < rows/LSH_MAX_BUCKET) reach the driver
    def bcount(batch: pa.Table) -> pa.Table:
        uniq, cnt = np.unique(
            batch.column("bucket").to_numpy(zero_copy_only=False),
            return_counts=True)
        return pa.table({"k": pa.array(uniq.astype(np.int64)),
                         "c": pa.array(cnt.astype(np.int64))})

    def hot_in_bucket(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby("k", as_index=False)["c"].sum()
        return s.loc[s["c"] > LSH_MAX_BUCKET, ["k"]]

    hot_df = bucketed_group_apply(
        keyed.map_batches(bcount, batch_format="pyarrow"),
        ["k"], hot_in_bucket, num_buckets=32).to_pandas()
    hot = (np.sort(hot_df["k"].to_numpy().astype(np.int64))
           if len(hot_df) else np.empty(0, np.int64))

    def cold_kernel(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("bucket"):
            ids, mat = _df_matrix(g)
            outs.append(_nn_within(ids, mat))
        if not outs:
            return pd.DataFrame({"vec_id": np.empty(0, np.int64),
                                 "nn_id": np.empty(0, np.int64)})
        return pd.concat(outs, ignore_index=True)

    def split(want_hot: bool):
        def f(batch: pa.Table) -> pa.Table:
            mask = np.isin(batch.column("bucket")
                           .to_numpy(zero_copy_only=False), hot)
            out = batch.filter(pa.array(mask if want_hot else ~mask))
            return out.replace_schema_metadata(None)
        return f

    if not len(hot):
        return bucketed_group_apply(keyed, ["bucket"], cold_kernel,
                                    num_buckets=64).sort("vec_id")

    nn_cold = bucketed_group_apply(
        keyed.map_batches(split(False), batch_format="pyarrow"),
        ["bucket"], cold_kernel, num_buckets=64)

    # hot buckets: block-grid partial NN + per-vec reduce.  The grid key
    # folds the bucket id in so distinct hot buckets never mix.
    def grid_kernel(a: pd.DataFrame, b: pd.DataFrame | None) -> pd.DataFrame:
        cols = {"vec_id": np.empty(0, np.int64),
                "nn_id": np.empty(0, np.int64),
                "sim": np.empty(0, np.float64)}
        outs = []
        if b is None:
            for _, g in a.groupby("bucket"):
                ids, mat = _df_matrix(g)
                if len(ids) < 2:
                    continue
                order = np.argsort(ids, kind="stable")
                ids, mat = ids[order], mat[order]
                for s in range(0, len(ids), _NN_CHUNK):
                    e = min(len(ids), s + _NN_CHUNK)
                    sims = mat[s:e] @ mat.T
                    sims[np.arange(e - s), np.arange(s, e)] = -2.0
                    j = sims.argmax(axis=1)
                    outs.append(pd.DataFrame({
                        "vec_id": ids[s:e], "nn_id": ids[j],
                        "sim": sims[np.arange(e - s), j]}))
        else:
            both = {k: (a.loc[a.bucket == k], b.loc[b.bucket == k])
                    for k in np.intersect1d(a.bucket.unique(),
                                            b.bucket.unique())}
            for _, (ga, gb) in both.items():
                if ga.empty or gb.empty:
                    continue
                ia, ma = _df_matrix(ga)
                ib, mb = _df_matrix(gb)
                oa = np.argsort(ia, kind="stable")
                ob = np.argsort(ib, kind="stable")
                ia, ma, ib, mb = ia[oa], ma[oa], ib[ob], mb[ob]
                for s in range(0, len(ia), _NN_CHUNK):
                    e = min(len(ia), s + _NN_CHUNK)
                    sims = ma[s:e] @ mb.T
                    j = sims.argmax(axis=1)
                    outs.append(pd.DataFrame({
                        "vec_id": ia[s:e], "nn_id": ib[j],
                        "sim": sims[np.arange(e - s), j]}))
                for s in range(0, len(ib), _NN_CHUNK):
                    e = min(len(ib), s + _NN_CHUNK)
                    sims = mb[s:e] @ ma.T
                    j = sims.argmax(axis=1)
                    outs.append(pd.DataFrame({
                        "vec_id": ib[s:e], "nn_id": ia[j],
                        "sim": sims[np.arange(e - s), j]}))
        if not outs:
            return pd.DataFrame(cols)
        return pd.concat(outs, ignore_index=True)

    def reduce_best(df: pd.DataFrame) -> pd.DataFrame:
        # max sim per vec_id; float ties (duplicate vectors) break
        # toward the smallest neighbor id for determinism
        df = df.sort_values(["vec_id", "sim", "nn_id"],
                            ascending=[True, False, True])
        best = df.drop_duplicates("vec_id")
        return best[["vec_id", "nn_id"]]

    partials = pair_grid_apply(
        keyed.map_batches(split(True), batch_format="pyarrow"),
        "vec_id", grid_kernel, num_blocks=LSH_GRID_BLOCKS)
    nn_hot = bucketed_group_apply(partials, ["vec_id"], reduce_best,
                                  num_buckets=32)
    return nn_cold.union(nn_hot).sort("vec_id")




# ------------------------------------------------------------ IVF ANN
IVF_LISTS = 16
IVF_PROBES = 4
IVF_ITERS = 8


IVF_FIT_SAMPLE = 4096


def _ivf_centroids(sample: np.ndarray) -> np.ndarray:
    """Deterministic coarse quantizer: seeded k-means on a FIXED-SIZE
    sample (the fit is O(sample·iters), independent of corpus size; at
    10^12 rows only the sample ever reaches the driver)."""
    rng = np.random.RandomState(0x1F5)
    cent = sample[rng.choice(len(sample),
                             size=min(IVF_LISTS, len(sample)),
                             replace=False)].copy()
    for _ in range(IVF_ITERS):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(len(cent)):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def q_embed_ann_ivf(sf_dir: str) -> rd.Dataset:
    """IVF approximate NN: coarse-quantize to IVF_LISTS inverted lists,
    each vector probes its IVF_PROBES nearest lists only.

    Distributed plan (no corpus-sized broadcast anywhere):
    1. fit centroids on a fixed-size sample (``limit(4096)``, driver-side
       k-means, centroids broadcast — IVF_LISTS·dim floats);
    2. ``map_batches`` emits each vector once as a MEMBER of its owner
       list and once per probe as a QUERY row → exchange is (1+probes)·n;
    3. ``groupby(list_id)`` co-locates each inverted list with the
       queries probing it; a vectorized matmul finds the per-list best;
    4. a final per-vec_id reduce takes the best across probed lists
       (owner lists are disjoint so candidates never double-count).
    Cost ∝ n·(probes/lists) of brute force.  Recall is checked by pytest
    (not SQL-expressible)."""
    from .grouping import bucketed_group_apply

    sample_df = _emb(sf_dir).limit(IVF_FIT_SAMPLE).to_pandas()
    sample = _normalize(np.stack(sample_df.embedding.to_numpy())
                        .astype(np.float64))
    cent = _ivf_centroids(sample)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _to_matrix(batch)
        mat = _normalize(mat)
        c = ray.get(cent_ref)
        sims_c = mat @ c.T                              # (b, LISTS)
        owner = sims_c.argmax(axis=1)
        probes = np.argsort(-sims_c, axis=1)[:, :IVF_PROBES]
        n = len(ids)
        emb_list = [r.tolist() for r in mat]
        frames = [pd.DataFrame({"list_id": owner.astype(np.int64),
                                "role": np.zeros(n, dtype=np.int8),
                                "vec_id": ids.astype(np.int64),
                                "emb": emb_list})]
        for p in range(min(IVF_PROBES, probes.shape[1])):
            frames.append(pd.DataFrame({
                "list_id": probes[:, p].astype(np.int64),
                "role": np.ones(n, dtype=np.int8),
                "vec_id": ids.astype(np.int64),
                "emb": emb_list}))
        return pd.concat(frames, ignore_index=True)

    def list_nn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                              "nn_id": pd.Series(dtype=np.int64),
                              "sim": pd.Series(dtype=np.float64)})
        mem = df[df.role == 0]
        qry = df[df.role == 1]
        if mem.empty or qry.empty:
            return empty
        mids = mem.vec_id.to_numpy()
        mmat = np.stack(mem.emb.to_numpy())
        qids = qry.vec_id.to_numpy()
        qmat = np.stack(qry.emb.to_numpy())
        sims = qmat @ mmat.T                            # (q, m)
        sims[qids[:, None] == mids[None, :]] = -np.inf  # mask self
        best = sims.max(axis=1)
        ok = best > -np.inf
        if not ok.any():
            return empty
        # tie-break: among equal-sim members take the smallest vec_id
        nn = np.where(sims[ok] == best[ok][:, None],
                      mids[None, :], np.iinfo(np.int64).max).min(axis=1)
        return pd.DataFrame({"vec_id": qids[ok].astype(np.int64),
                             "nn_id": nn.astype(np.int64),
                             "sim": best[ok]})

    per_list = bucketed_group_apply(
        _emb(sf_dir).map_batches(assign, batch_format="pyarrow",
                                 batch_size=1024),
        ["list_id"], lambda df: pd.concat(
            [list_nn(g) for _, g in df.groupby("list_id")],
            ignore_index=True) if len(df) else list_nn(df),
        num_buckets=IVF_LISTS)

    # sentinel guarantees every vec_id appears even with zero candidates
    def sentinel(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
        return pd.DataFrame({"vec_id": ids.astype(np.int64),
                             "nn_id": np.full(len(ids), -1, dtype=np.int64),
                             "sim": np.full(len(ids), -np.inf)})

    sent = _emb(sf_dir).map_batches(sentinel, batch_format="pyarrow")

    def best_across_lists(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["vec_id", "sim", "nn_id"],
                            ascending=[True, False, True])
        out = df.groupby("vec_id", as_index=False).first()
        return out[["vec_id", "nn_id"]].astype(np.int64)

    return bucketed_group_apply(per_list.union(sent), ["vec_id"],
                                best_across_lists,
                                num_buckets=32).sort("vec_id")


# ------------------------------------------------------------ k-means
KMEANS_K = 8
KMEANS_ITERS = 5


def kmeans_assign(ds: rd.Dataset, k: int = KMEANS_K,
                  iters: int = KMEANS_ITERS) -> rd.Dataset:
    """Distributed spherical k-means (Lloyd): centroids broadcast per
    round (k·dim floats — the only driver-resident state), each round is
    ONE streaming pass emitting per-batch (cluster, vector-sum, count)
    partials, and the driver reduces the tiny partial table into new
    centroids.  No shuffle at all — the reduction key space is k.

    Determinism: partials are reduced in (cluster, min-vec-id) sorted
    order so float summation order is fixed given the block layout;
    assignment ties break to the lowest cluster id (argmax-first)."""
    init_df = ds.limit(k).to_pandas()
    cent = _normalize(np.stack(init_df.embedding.to_numpy())
                      .astype(np.float64))

    for _ in range(iters):
        ref = ray.put(cent)

        def partial(batch: pa.Table) -> pd.DataFrame:
            ids, mat = _to_matrix(batch)
            mat = _normalize(mat)
            a = (mat @ ray.get(ref).T).argmax(axis=1)
            rows = {"cluster": [], "vsum": [], "cnt": [], "mn": []}
            for ci in np.unique(a):
                sel = a == ci
                rows["cluster"].append(int(ci))
                rows["vsum"].append(mat[sel].sum(axis=0).tolist())
                rows["cnt"].append(int(sel.sum()))
                rows["mn"].append(int(ids[sel].min()))
            return pd.DataFrame(rows)

        parts = (ds.map_batches(partial, batch_format="pyarrow",
                                batch_size=4096)
                 .to_pandas().sort_values(["cluster", "mn"]))
        new = cent.copy()
        for ci, g in parts.groupby("cluster"):
            s = np.sum(np.stack(g.vsum.to_numpy()), axis=0)
            v = s / int(g.cnt.sum())
            nv = np.linalg.norm(v)
            if nv > 0:
                new[int(ci)] = v / nv
        cent = new

    final_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _to_matrix(batch)
        a = (_normalize(mat) @ ray.get(final_ref).T).argmax(axis=1)
        return pd.DataFrame({"vec_id": ids.astype(np.int64),
                             "cluster_id": a.astype(np.int64)})

    return ds.map_batches(assign, batch_format="pyarrow", batch_size=4096)


def q_embed_kmeans(sf_dir: str) -> rd.Dataset:
    """Per-vector cluster assignment after KMEANS_ITERS Lloyd rounds over
    the embeddings table (k=KMEANS_K, deterministic first-k init).
    Iterative model fitting is not SQL-expressible → rows-only driver
    check; invariants (determinism, separable-corpus recovery, partition
    structure) are pinned by pytest."""
    return kmeans_assign(_emb(sf_dir)).sort("vec_id")


# ------------------------------------------------------------ SemDeDup
SEMDEDUP_TAU = 0.5          # == q_embed_neardup's exact threshold, so the
                            # within-cluster recall pin is apples-to-apples
SEMDEDUP_CHUNK = 2048       # rows per matmul chunk inside a hot cluster


def q_embed_semantic_dedup(sf_dir: str) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    semantic deduplication — cluster with the sample-fit k-means coarse
    quantizer, then WITHIN each cluster drop every vector that has a
    LOWER-id τ-cosine neighbor (keep-first).  Deterministic, and it
    yields the invariant that no two KEPT vectors in one cluster are
    τ-close.  Output per vector: (vec_id, cluster, keep, dup_of) where
    dup_of is the smallest earlier τ-neighbor (-1 for kept).

    Distributed plan: centroids fit on a fixed-size sample (driver cost
    O(sample), centroids broadcast via ray.put); one ``map_batches``
    assigns clusters; ONE bucketed shuffle co-locates each cluster; the
    per-cluster scan is a chunked matmul (memory O(chunk·|cluster|),
    never |cluster|²) over vec_id-sorted rows with an earlier-only
    mask.  Only within-cluster pairs are compared — that IS the SemDeDup
    approximation; within-cluster agreement with the EXACT pair list is
    pinned by pytest (iterative clustering is not SQL-expressible →
    rows-only driver check)."""
    from .grouping import bucketed_group_apply

    sample_df = _emb(sf_dir).limit(IVF_FIT_SAMPLE).to_pandas()
    sample = _normalize(np.stack(sample_df.embedding.to_numpy())
                        .astype(np.float64))
    cent_ref = ray.put(_ivf_centroids(sample))

    def assign(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _to_matrix(batch)
        mat = _normalize(mat)
        cluster = (mat @ ray.get(cent_ref).T).argmax(axis=1)
        return pd.DataFrame({"vec_id": ids.astype(np.int64),
                             "cluster": cluster.astype(np.int64),
                             "emb": [r.tolist() for r in mat]})

    def dedup_cluster(df: pd.DataFrame) -> pd.DataFrame:
        # the bucket may hold several whole clusters — process each
        frames = []
        for cl, g in df.groupby("cluster"):
            g = g.sort_values("vec_id")
            ids = g.vec_id.to_numpy().astype(np.int64)
            mat = np.stack(g.emb.to_numpy())
            n = len(ids)
            dup_of = np.full(n, -1, dtype=np.int64)
            for s in range(0, n, SEMDEDUP_CHUNK):
                e = min(s + SEMDEDUP_CHUNK, n)
                sims = mat[s:e] @ mat.T                 # (chunk, n)
                earlier = np.arange(n)[None, :] < np.arange(s, e)[:, None]
                hit = (sims >= SEMDEDUP_TAU) & earlier
                rows, cols = np.nonzero(hit)
                if len(rows):
                    first = pd.Series(cols).groupby(rows).min()
                    dup_of[s + first.index.to_numpy()] = \
                        ids[first.to_numpy()]
            frames.append(pd.DataFrame({
                "vec_id": ids,
                "cluster": np.full(n, cl, dtype=np.int64),
                "keep": dup_of < 0,
                "dup_of": dup_of}))
        if not frames:
            return pd.DataFrame({
                "vec_id": pd.Series(dtype=np.int64),
                "cluster": pd.Series(dtype=np.int64),
                "keep": pd.Series(dtype=bool),
                "dup_of": pd.Series(dtype=np.int64)})
        return pd.concat(frames, ignore_index=True)

    assigned = _emb(sf_dir).map_batches(assign, batch_format="pyarrow",
                                        batch_size=4096)
    return bucketed_group_apply(assigned, ["cluster"], dedup_cluster,
                                num_buckets=IVF_LISTS).sort("vec_id")


SIM_QUERIES = {
    "embed_topk": (q_embed_topk, SQL_EMBED_TOPK),
    "embed_neardup": (q_embed_neardup, SQL_EMBED_NEARDUP),
    "embed_ann_lsh": (q_embed_ann_lsh, None),
    "embed_ann_ivf": (q_embed_ann_ivf, None),
    "embed_kmeans": (q_embed_kmeans, None),
    "embed_semantic_dedup": (q_embed_semantic_dedup, None),
}
