"""ANN recall vs brute force — the check SQL can't express."""

import numpy as np
import pytest

import ray.data as rd

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
    similarity as S,
)

SF = "/root/testdata/sf0.001"


def _brute_nn():
    import pyarrow as pa

    ids, mat = S._to_matrix(pa.Table.from_pandas(S._emb(SF).to_pandas()))
    order = np.argsort(ids)
    ids, mat = ids[order], S._normalize(mat[order])
    sims = mat @ mat.T
    np.fill_diagonal(sims, -2.0)
    nn = sims.argmax(axis=1)
    return dict(zip(ids.tolist(), ids[nn].tolist()))


@pytest.mark.usefixtures("ray_session")
def test_ivf_recall_vs_brute_force():
    truth = _brute_nn()
    ivf = S.q_embed_ann_ivf(SF).to_pandas()
    hits = sum(1 for _, r in ivf.iterrows() if truth.get(r.vec_id) == r.nn_id)
    recall = hits / len(ivf)
    # 4 of 16 lists probed: recall well above the 25% floor of random lists
    assert recall >= 0.6, recall


@pytest.mark.usefixtures("ray_session")
def test_lsh_ann_sane():
    """Within-bucket NN is a valid vector id and deterministic."""
    a = S.q_embed_ann_lsh(SF).to_pandas()
    b = S.q_embed_ann_lsh(SF).to_pandas()
    assert a.equals(b)
    assert (a.vec_id != a.nn_id).all()


@pytest.mark.usefixtures("ray_session")
def test_topk_self_consistency():
    out = S.q_embed_topk(SF)
    assert set(out.query_id) == set(range(S.TOPK_QUERIES))
    for q, g in out.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, S.TOPK_K + 1))
        assert q not in set(g.neighbor_id)


@pytest.mark.usefixtures("ray_session")
def test_neardup_pair_grid_exact_vs_brute_force():
    """pair_grid_apply must enumerate EXACTLY the brute-force pair set —
    dense synthetic clusters exercise diagonal and off-diagonal groups."""
    import pandas as pd
    import pyarrow as pa

    rng = np.random.RandomState(7)
    # 6 tight clusters of 20 → many qualifying pairs across blocks
    centers = S._normalize(rng.normal(size=(6, 16)))
    vecs, ids = [], []
    for c in range(6):
        for i in range(20):
            v = centers[c] + 0.05 * rng.normal(size=16)
            vecs.append(v)
            ids.append(c * 100 + i)
    mat = S._normalize(np.array(vecs))
    ds = rd.from_arrow(pa.table({"vec_id": pa.array(ids, type=pa.int64()),
                                 "embedding": pa.array([v.tolist() for v in mat])}))

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.grouping import (
        pair_grid_apply,
    )

    # reuse the production kernel via q_embed_neardup's internals: run the
    # grid directly with the same kernel semantics
    def frame_matrix(df):
        return (df.vec_id.to_numpy().astype(np.int64),
                S._normalize(np.stack(df.embedding.to_numpy()).astype(np.float64)))

    def kernel(a, b):
        if a.empty or (b is not None and b.empty):
            return S._pairs_frame()
        ia, ma = frame_matrix(a)
        if b is None:
            sims = ma @ ma.T
            keep = (sims >= 0.5) & (ia[:, None] < ia[None, :])
            x, y = np.nonzero(keep)
            return S._pairs_frame(ia[x], ia[y])
        ib, mb = frame_matrix(b)
        sims = ma @ mb.T
        x, y = np.nonzero(sims >= 0.5)
        return S._pairs_frame(np.minimum(ia[x], ib[y]), np.maximum(ia[x], ib[y]))

    got = (pair_grid_apply(ds, "vec_id", kernel, num_blocks=4)
           .to_pandas().sort_values(["vec_a", "vec_b"]).reset_index(drop=True))

    sims = mat @ mat.T
    ids_np = np.array(ids)
    keep = (sims >= 0.5) & (ids_np[:, None] < ids_np[None, :])
    x, y = np.nonzero(keep)
    want = (pd.DataFrame({"vec_a": ids_np[x], "vec_b": ids_np[y]})
            .sort_values(["vec_a", "vec_b"]).reset_index(drop=True))
    assert len(want) > 50          # the scenario is actually dense
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_kmeans_recovers_separable_clusters():
    """Lloyd rounds on a well-separated synthetic corpus must (a) be
    deterministic across runs and (b) put every planted cluster in one
    k-means cell, exactly matching a local numpy reference of the same
    algorithm."""
    import pandas as pd
    import pyarrow as pa

    rng = np.random.RandomState(11)
    centers = S._normalize(rng.normal(size=(4, 16)))
    vecs, ids, planted = [], [], []
    for c in range(4):
        for i in range(30):
            vecs.append(centers[c] + 0.03 * rng.normal(size=16))
            ids.append(c * 1000 + i)
            planted.append(c)
    mat = S._normalize(np.array(vecs))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array([v.tolist() for v in mat])}))

    a = (S.kmeans_assign(ds, k=4, iters=5).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    b = (S.kmeans_assign(ds, k=4, iters=5).to_pandas()
         .sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)          # deterministic

    got = a.set_index("vec_id")["cluster_id"]
    df = pd.DataFrame({"vec_id": ids, "planted": planted})
    df["cell"] = got.loc[df.vec_id].to_numpy()
    # each planted cluster maps to exactly one k-means cell, all distinct
    cells = df.groupby("planted")["cell"].nunique()
    assert (cells == 1).all(), df.groupby(["planted", "cell"]).size()
    assert df.groupby("planted")["cell"].first().nunique() == 4


@pytest.mark.usefixtures("ray_session")
def test_kmeans_on_sf_corpus_structure():
    out = S.q_embed_kmeans(SF).to_pandas()
    emb = S._emb(SF).to_pandas()
    assert len(out) == len(emb)
    assert set(out.vec_id) == set(emb.vec_id)
    assert out.cluster_id.between(0, S.KMEANS_K - 1).all()


@pytest.mark.usefixtures("ray_session")
def test_lsh_ann_hot_bucket_all_equal():
    """All-equal embeddings collapse every vector into ONE hyperplane
    bucket — the adversarial case for within-bucket exact NN.  The hot
    path must split it over the block grid (bounded per-task memory)
    and still produce the deterministic answer: everyone's NN is the
    smallest other id."""
    import pyarrow as pa

    import ray.data as rd

    n = 4000                      # > LSH_MAX_BUCKET -> hot path engaged
    vec = list(np.ones(16) / 4.0)
    tbl = pa.table({"vec_id": pa.array(list(range(n)), type=pa.int64()),
                    "embedding": pa.array([vec] * n,
                                          type=pa.list_(pa.float32()))})
    import tempfile, os
    import pyarrow.parquet as pq
    d = tempfile.mkdtemp(prefix="lsh_hot_")
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))

    out = S.q_embed_ann_lsh(d).to_pandas()
    assert len(out) == n
    want_nn = np.where(out.vec_id.to_numpy() == 0, 1, 0)
    assert (out.nn_id.to_numpy() == want_nn).all()


@pytest.mark.usefixtures("ray_session")
def test_ivf_hot_list_all_equal():
    """All-equal embeddings collapse every vector into ONE inverted list
    regardless of k — the case adaptive cluster counts cannot fix.  The
    hot-list path must split the list's members over hash blocks
    (queries replicated per block, bounded per-task rows) and the
    per-vec reduce must still produce the exact answer: everyone's NN is
    the smallest other id."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 3000                      # (1+probes)*n > IVF_MAX_TASK_ROWS
    vec = list(np.ones(16) / 4.0)
    tbl = pa.table({"vec_id": pa.array(list(range(n)), type=pa.int64()),
                    "embedding": pa.array([vec] * n,
                                          type=pa.list_(pa.float32()))})
    d = tempfile.mkdtemp(prefix="ivf_hot_")
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))

    out = S.q_embed_ann_ivf(d).to_pandas()
    assert len(out) == n
    want_nn = np.where(out.vec_id.to_numpy() == 0, 1, 0)
    assert (out.nn_id.to_numpy() == want_nn).all()


@pytest.mark.usefixtures("ray_session")
def test_ivfpq_exact_on_codebook_representable_corpus():
    """When every vector IS a codeword combination (here: a handful of
    distinct vectors, so the PQ codebooks reproduce them exactly), the
    quantization error is zero and IVF-PQ must return the same answer as
    exact within-probed-lists search: each vector's NN is the nearest
    distinct vector's smallest id (its own duplicate group first)."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(7)
    bases = rng.randn(6, 16)
    bases /= np.linalg.norm(bases, axis=1, keepdims=True)
    n = 600
    which = np.arange(n) % 6
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n), type=pa.int64()),
        "embedding": pa.array([bases[w].astype(np.float32).tolist()
                               for w in which], type=pa.list_(pa.float32())),
    })
    d = tempfile.mkdtemp(prefix="ivfpq_exact_")
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))

    out = S.q_embed_ann_ivfpq(d).to_pandas().sort_values("vec_id")
    assert len(out) == n
    # duplicates are cosine-1.0: everyone's NN is the smallest OTHER id
    # of its own base group (ids are assigned round-robin: group g has
    # ids g, g+6, g+12, ...)
    vid = out.vec_id.to_numpy()
    want = np.where(vid < 6, vid + 6, vid % 6)
    assert (out.nn_id.to_numpy() == want).all()


@pytest.mark.usefixtures("ray_session")
def test_ivfpq_recall_vs_brute_force():
    """On the real sf0.001 embeddings, PQ adds quantization error on top
    of list pruning — recall@1 must still clear a meaningful floor and
    the result must be deterministic."""
    truth = _brute_nn()
    a = S.q_embed_ann_ivfpq(SF).to_pandas()
    b = S.q_embed_ann_ivfpq(SF).to_pandas()
    assert a.equals(b)
    hits = sum(1 for _, r in a.iterrows() if truth.get(r.vec_id) == r.nn_id)
    assert hits / len(a) >= 0.35, hits / len(a)


@pytest.mark.usefixtures("ray_session")
def test_ann_recall_on_structured_corpus():
    """Intended-regime recall floors (VERDICT r4 next-round #5): on a
    corpus with coarse cluster structure + PQ-representable subspace
    structure, IVF pruning must be ~lossless and IVF-PQ must clear 0.8
    recall@1 — the counterpart to the random-data worst-case floors
    above.  Artifact: tools/ann_recall.py → BENCH/ann_recall.json."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.sources.corpus import (
        structured_embeddings,
    )

    tbl = structured_embeddings(3000)
    d = tempfile.mkdtemp(prefix="ann_structured_")
    pq.write_table(tbl, os.path.join(d, "embeddings.parquet"))

    ids, mat = S._to_matrix(tbl.select(["vec_id", "embedding"]))
    mat = S._normalize(mat)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -2.0)
    truth = dict(zip(ids.tolist(), ids[sims.argmax(axis=1)].tolist()))

    ivf = S.q_embed_ann_ivf(d).to_pandas()
    hits = (ivf.nn_id.to_numpy()
            == np.array([truth[v] for v in ivf.vec_id])).mean()
    assert hits >= 0.95, f"IVF recall {hits}"

    pq_out = S.q_embed_ann_ivfpq(d).to_pandas()
    hits = (pq_out.nn_id.to_numpy()
            == np.array([truth[v] for v in pq_out.vec_id])).mean()
    assert hits >= 0.8, f"IVF-PQ recall {hits}"

    lsh = S.q_embed_ann_lsh(d).to_pandas()
    assert len(lsh) == 3000          # multi-probe: every vector answered
    hits = (lsh.nn_id.to_numpy()
            == np.array([truth[v] for v in lsh.vec_id])).mean()
    assert hits >= 0.7, f"LSH recall {hits}"


def test_label_centroids_exact_sums(ray_session) -> None:
    """Per-(label, dim) integer sums equal a single-process recompute,
    n_vecs is constant across dims of a label, and every vector is
    accounted for."""
    import numpy as np
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.similarity import (
        q_label_centroids,
    )
    sf = "/root/testdata/sf0.001"
    df = q_label_centroids(sf).to_pandas()
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["label", "embedding"]).to_pandas()
    mat = np.floor(np.stack(t.embedding.to_numpy()).astype(np.float64)
                   * 1_000_000).astype(np.int64)
    labels = t.label.to_numpy()
    for lb in np.unique(labels):
        m = labels == lb
        want = mat[m].sum(axis=0)
        g = df[df.label == lb].sort_values("dim")
        assert (g.n_vecs == int(m.sum())).all()
        assert (g.sum_micro.to_numpy() == want).all()
    assert int(df.groupby("label").n_vecs.first().sum()) == len(t)
