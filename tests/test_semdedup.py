"""SemDeDup (embed_semantic_dedup) invariants: determinism, the
kept-set separation property, exact within-cluster agreement with the
brute-force pair list, and dup_of well-formedness.  The fixture plants
duplicate groups (same base vector + tiny noise) inside well-separated
gaussian clusters — the real sf0.001 embeddings contain almost no
tau-pairs, so they cannot exercise the drop path.  Iterative clustering
is not SQL-expressible, so these pins ARE the correctness gate
(rows-only at the driver)."""

import numpy as np
import pandas as pd
import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
    similarity as S,
)


@pytest.fixture(scope="module")
def sem_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("sem_sf")
    rng = np.random.RandomState(31)
    dim, rows = 16, []
    centers = rng.randn(4, dim) * 4
    vid = 0
    for c in range(4):
        for _ in range(30):                    # singletons
            rows.append((vid, centers[c] + rng.randn(dim) * 0.5)); vid += 1
        for _ in range(6):                     # planted duplicate triples
            base = centers[c] + rng.randn(dim) * 0.5
            for _ in range(3):
                rows.append((vid, base + rng.randn(dim) * 0.01)); vid += 1
    perm = rng.permutation(len(rows))          # ids uncorrelated with order
    pd.DataFrame({
        "vec_id": np.array([rows[i][0] for i in perm], dtype=np.int64),
        "embedding": [rows[i][1].astype(np.float32).tolist() for i in perm],
        "label": np.zeros(len(rows), dtype=np.int32),
    }).to_parquet(d / "embeddings.parquet", row_group_size=32)
    return str(d)


@pytest.fixture(scope="module")
def result(ray_session, sem_sf):
    return S.q_embed_semantic_dedup(sem_sf).to_pandas()


@pytest.fixture(scope="module")
def norm_embs(sem_sf):
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sem_sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    order = np.argsort(ids)
    return ids[order], mat[order]


@pytest.mark.usefixtures("ray_session")
def test_deterministic(result, sem_sf):
    again = S.q_embed_semantic_dedup(sem_sf).to_pandas()
    pd.testing.assert_frame_equal(result.reset_index(drop=True),
                                  again.reset_index(drop=True))


def test_rows_and_schema(result):
    assert list(result.columns) == ["vec_id", "cluster", "keep", "dup_of"]
    assert result.vec_id.is_monotonic_increasing
    assert result.keep.sum() > 0


def test_kept_set_separation(result, norm_embs):
    """No two KEPT vectors in one cluster are tau-close — the property
    keep-first guarantees."""
    ids, mat = norm_embs
    pos = {v: i for i, v in enumerate(ids)}
    kept = result[result.keep]
    for _, g in kept.groupby("cluster"):
        idx = [pos[v] for v in g.vec_id]
        sims = mat[idx] @ mat[idx].T
        np.fill_diagonal(sims, 0.0)
        assert sims.max() < S.SEMDEDUP_TAU + 1e-12


def test_within_cluster_agreement_with_exact(result, norm_embs):
    """Every EXACT tau-pair whose two vectors landed in the same cluster
    must drop the higher id (dup_of <= the lower); pairs split across
    clusters are the SemDeDup approximation and are exempt."""
    ids, mat = norm_embs
    sims = mat @ mat.T
    ai, bi = np.nonzero(np.triu(sims >= S.SEMDEDUP_TAU, k=1))
    by_vec = result.set_index("vec_id")
    same = 0
    for a, b in zip(ids[ai], ids[bi]):
        if by_vec.loc[a, "cluster"] == by_vec.loc[b, "cluster"]:
            same += 1
            hi = max(a, b)
            assert not by_vec.loc[hi, "keep"]
            assert by_vec.loc[hi, "dup_of"] <= min(a, b)
    assert same > 0        # the corpus must actually exercise the path


def test_dup_of_wellformed(result, norm_embs):
    """Every dropped vector's dup_of is an earlier vector in the SAME
    cluster at cosine >= tau."""
    ids, mat = norm_embs
    pos = {v: i for i, v in enumerate(ids)}
    by_vec = result.set_index("vec_id")
    dropped = result[~result.keep]
    assert (dropped.dup_of < dropped.vec_id).all()
    for _, r in dropped.iterrows():
        assert by_vec.loc[r.dup_of, "cluster"] == r.cluster
        assert mat[pos[r.vec_id]] @ mat[pos[r.dup_of]] >= S.SEMDEDUP_TAU - 1e-12


@pytest.mark.usefixtures("ray_session")
def test_semdedup_hot_cluster_all_equal():
    """All-identical embeddings put the whole corpus in ONE cluster no
    matter how k scales — the quantizer-collapse case.  The hot-cluster
    grid path must engage (no task holds the whole cluster) and the
    keep-first semantics must still be exact: vec 0 kept, every other
    vector dup_of == 0."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 6000                      # > SEM_MAX_CLUSTER -> hot path engaged
    vec = list(np.ones(16) / 4.0)
    tbl = pa.table({"vec_id": pa.array(list(range(n)), type=pa.int64()),
                    "embedding": pa.array([vec] * n,
                                          type=pa.list_(pa.float32()))})
    d = tempfile.mkdtemp(prefix="sem_hot_")
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))

    out = S.q_embed_semantic_dedup(d).to_pandas().sort_values("vec_id")
    assert len(out) == n
    assert bool(out.keep.iloc[0]) and int(out.dup_of.iloc[0]) == -1
    rest = out.iloc[1:]
    assert (~rest.keep).all() and (rest.dup_of.to_numpy() == 0).all()
    assert out.cluster.nunique() == 1
