"""Similarity search over the ``embeddings`` table (list<float> vectors).

- **brute-force cosine top-k**: broadcast query matrix (``ray.put`` once),
  per-batch numpy matmul, per-batch partial top-k, tiny driver merge —
  the baseline exact path.
- **cosine near-dup pairs**: blocked all-pairs matmul against a broadcast
  normalized matrix.
- **LSH-bucketed ANN**: random-hyperplane signatures → bucket groupby →
  within-bucket exact search; the sub-linear scale path (recall < 1 by
  construction → verified by a recall pytest, not a SQL oracle).
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
def q_embed_neardup(sf_dir: str) -> pd.DataFrame:
    """All pairs with cosine ≥ 0.5: blocked matmul vs a broadcast matrix."""
    full_ids, full_mat = _to_matrix(
        pa.Table.from_pandas(_emb(sf_dir).to_pandas()))
    order = np.argsort(full_ids)
    full_ids, full_mat = full_ids[order], _normalize(full_mat[order])
    ref = ray.put((full_ids, full_mat))

    def pairs(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _to_matrix(batch)
        fids, fmat = ray.get(ref)
        sims = _normalize(mat) @ fmat.T
        keep = (sims >= 0.5) & (ids[:, None] < fids[None, :])
        bi, ni = np.nonzero(keep)
        return pd.DataFrame({"vec_a": ids[bi].astype(np.int64),
                             "vec_b": fids[ni].astype(np.int64)})

    out = _emb(sf_dir).map_batches(pairs, batch_format="pyarrow",
                                   batch_size=1024).to_pandas()
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


def q_embed_ann_lsh(sf_dir: str) -> pd.DataFrame:
    """Approximate NN via random-hyperplane buckets: each vector lands in
    one of 2^NUM_PLANES buckets; nearest neighbor searched within-bucket.
    Sub-linear at scale; recall is checked by pytest, not SQL."""
    ds = _emb(sf_dir)

    def bucketize(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _to_matrix(batch)
        planes = _planes(mat.shape[1])
        bits = (_normalize(mat) @ planes.T) > 0
        bucket = (bits.astype(np.int64) * (1 << np.arange(NUM_PLANES))).sum(axis=1)
        return pd.DataFrame({"bucket": bucket, "vec_id": ids,
                             "emb": [r.tolist() for r in mat]})

    def bucket_nn(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["vec_id", "nn_id"])
        ids = g.vec_id.to_numpy()
        mat = _normalize(np.stack(g.emb.to_numpy()))
        sims = mat @ mat.T
        np.fill_diagonal(sims, -2.0)
        nn = sims.argmax(axis=1)
        return pd.DataFrame({"vec_id": ids.astype(np.int64),
                             "nn_id": ids[nn].astype(np.int64)})

    out = (ds.map_batches(bucketize, batch_format="pyarrow", batch_size=4096)
           .groupby("bucket").map_groups(bucket_nn, batch_format="pandas")
           .to_pandas())
    return out.sort_values("vec_id").reset_index(drop=True)




# ------------------------------------------------------------ IVF ANN
IVF_LISTS = 16
IVF_PROBES = 4
IVF_ITERS = 8


def _ivf_centroids(mat: np.ndarray) -> np.ndarray:
    """Deterministic coarse quantizer: seeded k-means on (a sample of) the
    corpus — the IVF scale path from the repo directives.  At 10^12 rows
    the fit runs on a driver-side sample; assignment is a blocked matmul."""
    rng = np.random.RandomState(0x1F5)
    n = min(len(mat), 4096)
    sample = mat[rng.choice(len(mat), size=n, replace=False)]
    cent = sample[rng.choice(n, size=IVF_LISTS, replace=False)].copy()
    for _ in range(IVF_ITERS):
        assign = (sample @ cent.T).argmax(axis=1)
        for c in range(IVF_LISTS):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cent[c] = v / nv
    return cent


def q_embed_ann_ivf(sf_dir: str) -> pd.DataFrame:
    """IVF approximate NN: coarse-quantize to IVF_LISTS inverted lists,
    then each vector searches its IVF_PROBES nearest lists only.

    Plan: fit centroids once (broadcast) → map_batches assigns vectors to
    lists → groupby(list) buckets → per-bucket exact search against the
    bucket's members for every vector probing it.  Cost ∝ n·(probes/lists)
    of brute force.  Recall is checked by pytest (not SQL-expressible)."""
    full_ids, full_mat = _to_matrix(
        pa.Table.from_pandas(_emb(sf_dir).to_pandas()))
    order = np.argsort(full_ids)
    full_ids, full_mat = full_ids[order], _normalize(full_mat[order])
    cent = _ivf_centroids(full_mat)
    cent_ref = ray.put(cent)
    # inverted lists: membership of every vector (its single nearest list)
    owner = (full_mat @ cent.T).argmax(axis=1)
    lists_ref = ray.put((full_ids, full_mat, owner))

    def probe(batch: pa.Table) -> pd.DataFrame:
        ids, mat = _to_matrix(batch)
        mat = _normalize(mat)
        c = ray.get(cent_ref)
        fids, fmat, fowner = ray.get(lists_ref)
        sims_c = mat @ c.T                             # (b, LISTS)
        probes = np.argsort(-sims_c, axis=1)[:, :IVF_PROBES]
        out = []
        for i in range(len(ids)):
            mask = np.isin(fowner, probes[i]) & (fids != ids[i])
            cand = np.nonzero(mask)[0]
            if cand.size == 0:
                out.append((int(ids[i]), -1))
                continue
            sims = fmat[cand] @ mat[i]
            best = cand[np.lexsort((fids[cand], -sims))][0]
            out.append((int(ids[i]), int(fids[best])))
        return pd.DataFrame(out, columns=["vec_id", "nn_id"])

    out = _emb(sf_dir).map_batches(probe, batch_format="pyarrow",
                                   batch_size=1024).to_pandas()
    return out.sort_values("vec_id").reset_index(drop=True)


SIM_QUERIES = {
    "embed_topk": (q_embed_topk, SQL_EMBED_TOPK),
    "embed_neardup": (q_embed_neardup, SQL_EMBED_NEARDUP),
    "embed_ann_lsh": (q_embed_ann_lsh, None),
    "embed_ann_ivf": (q_embed_ann_ivf, None),
}
