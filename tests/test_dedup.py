"""Dedup-operator invariants SQL can't (or shouldn't) express:
prefix-filter completeness and the MinHash-LSH precision/recall contract.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
    dedup as D,
)

SF = "/root/testdata/sf0.001"


def _no_tensor_casting():
    from ray.data import DataContext
    DataContext.get_current().enable_tensor_extension_casting = False


def _near_dup_corpus():
    """60 docs: 12 clusters of near-identical texts + 12 singletons."""
    rng = np.random.RandomState(11)
    vocab = [f"tok{i}" for i in range(400)]
    ids, texts = [], []
    k = 0
    for c in range(12):
        base = list(rng.choice(vocab, size=60, replace=False))
        for v in range(4):
            words = list(base)
            for _ in range(v):           # v substitutions: J ~ (60-v)/(60+v)
                words[rng.randint(len(words))] = str(rng.choice(vocab))
            ids.append(k)
            texts.append(" ".join(words))
            k += 1
    for _ in range(12):
        ids.append(k)
        texts.append(" ".join(rng.choice(vocab, size=50, replace=False)))
        k += 1
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})


def _brute_pairs(tbl: pa.Table, kind: str, num: int, den: int) -> set:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
        sketch as SK,
    )
    memo: dict = {}
    sets = {}
    for d, t in zip(tbl.column("doc_id").to_pylist(),
                    tbl.column("text").to_pylist()):
        toks = t.lower().split()
        if kind == "token":
            sets[d] = set(SK.token_hashes_unique(toks, memo).tolist())
        else:
            sets[d] = set(np.unique(
                SK.shingle_hashes(toks, 3, memo).view(np.int64)).tolist())
    out = set()
    ds_sorted = sorted(sets)
    for i, a in enumerate(ds_sorted):
        for b in ds_sorted[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union and den * inter >= num * union:
                out.add((a, b))
    return out


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("kind,num,den", [("token", 19, 20), ("token", 4, 5),
                                          ("shingle", 4, 5)])
def test_prefix_filter_join_exact(kind, num, den):
    """prefix_candidates ∪ verify must reproduce the brute-force pair set
    exactly — the completeness guarantee of the prefix-filter lemma."""
    _no_tensor_casting()
    tbl = _near_dup_corpus()
    want = _brute_pairs(tbl, kind, num, den)
    sets = D.hash_sets(rd.from_arrow(tbl), kind).materialize()
    cands = D.prefix_candidates(sets, num, den)
    got_df = D.verify_pairs(cands, sets, num, den, emit=D._jm).to_pandas()
    got = set(zip(got_df.doc_a, got_df.doc_b))
    assert len(want) >= 12       # corpus is actually dense at this threshold
    assert got == want


@pytest.mark.usefixtures("ray_session")
def test_minhash_lsh_precision_and_recall():
    """MinHash+LSH pairs: precision MUST be 1 (exact verify), recall vs
    the exhaustive shingle join ≥ 0.9 (16-band/4-row curve at j≥0.8 puts
    the expected miss rate near 2e-4)."""
    _no_tensor_casting()
    tbl = _near_dup_corpus()
    docs = rd.from_arrow(tbl)
    exact_sets = D.hash_sets(docs, "shingle").materialize()
    exact = D.verify_pairs(D.prefix_candidates(exact_sets, 4, 5),
                           exact_sets, 4, 5, emit=D._jm).to_pandas()
    mh = D.minhash_lsh_pairs(docs, jaccard_milli=800).to_pandas()
    eset = set(zip(exact.doc_a, exact.doc_b))
    mset = set(zip(mh.doc_a, mh.doc_b))
    assert len(eset) >= 12
    assert mset <= eset                       # precision == 1
    assert len(mset & eset) / len(eset) >= 0.9
    # verified jaccard values must agree where both report the pair
    merged = mh.merge(exact, on=["doc_a", "doc_b"], suffixes=("_m", "_e"))
    assert (merged.jaccard_milli_m == merged.jaccard_milli_e).all()


@pytest.mark.usefixtures("ray_session")
def test_minhash_matches_exact_on_sf0001():
    _no_tensor_casting()
    mh = D.q_minhash_pairs(SF).to_pandas()
    sp = D.q_shingle_pairs(SF).to_pandas()
    assert set(zip(mh.doc_a, mh.doc_b)) <= set(zip(sp.doc_a, sp.doc_b))


@pytest.mark.usefixtures("ray_session")
def test_lazy_cogroup_chain_keeps_all_rows():
    """Regression: a LAZY chain of two bucketed_cogroup joins (union +
    groupby twice in one streaming plan, with some empty buckets) used to
    silently drop most rows when block schemas carried pandas metadata —
    Ray's shuffle failed to hash them and degraded the union schema."""
    import ray.data as rd

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.grouping import (
        bucketed_cogroup,
        bucketed_group_apply,
    )

    n = 500
    left = rd.from_arrow(pa.table({
        "k1": pa.array(np.arange(n) % 97, type=pa.int64()),
        "k2": pa.array(np.arange(n) % 89, type=pa.int64()),
        "v": pa.array(np.arange(n), type=pa.int64())}))
    dim1 = rd.from_arrow(pa.table({
        "d1": pa.array(np.arange(97), type=pa.int64()),
        "a": pa.array(np.arange(97) * 10, type=pa.int64())}))
    dim2 = rd.from_arrow(pa.table({
        "d2": pa.array(np.arange(89), type=pa.int64()),
        "b": pa.array(np.arange(89) * 100, type=pa.int64())}))

    # pass left through a pandas-building group stage first (the shape
    # that produced pandas-metadata blocks), then chain two lazy cogroups
    left2 = bucketed_group_apply(left, ["k1"],
                                 lambda df: df.drop_duplicates(), 16)

    def join_on(key_l, key_r):
        def fn(lf, rf):
            if lf.empty or rf.empty:
                return lf.head(0).merge(rf.head(0), left_on=key_l,
                                        right_on=key_r)
            return lf.merge(rf, left_on=key_l, right_on=key_r)
        return fn

    j1 = bucketed_cogroup(left2, dim1, ["k1"], ["d1"],
                          join_on("k1", "d1"), num_buckets=64)  # LAZY
    j2 = bucketed_cogroup(j1, dim2, ["k2"], ["d2"],
                          join_on("k2", "d2"), num_buckets=64)
    out = j2.to_pandas()
    assert len(out) == n
    assert (out.a == out.k1 * 10).all()
    assert (out.b == out.k2 * 100).all()


@pytest.mark.usefixtures("ray_session")
def test_connected_components_vs_union_find():
    """Distributed hash-to-min label propagation must equal a driver-side
    union-find over the same edge set (dense clustered corpus)."""
    _no_tensor_casting()
    tbl = _near_dup_corpus()
    docs = rd.from_arrow(tbl)
    sets = D.hash_sets(docs, "shingle").materialize()
    edges_df = D.verify_pairs(D.prefix_candidates(sets, 4, 5), sets, 4, 5,
                              emit=D._jm).to_pandas()
    nodes = rd.from_arrow(tbl.select(["doc_id"]))
    edges = rd.from_pandas(edges_df[["doc_a", "doc_b"]])
    got = (D.connected_components(edges, nodes).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    # union-find ground truth
    parent = {int(d): int(d) for d in tbl.column("doc_id").to_pylist()}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in zip(edges_df.doc_a, edges_df.doc_b):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {d: find(d) for d in parent}

    assert len(edges_df) >= 12            # graph actually has clusters
    assert {int(r.doc_id): int(r.label) for r in got.itertuples()} == want


@pytest.mark.usefixtures("ray_session")
def test_connected_components_path_graph_log_rounds():
    """A 200-node path graph (diameter 199) must converge inside a
    ~log2(n) round budget — pins the pointer-jumping step: plain one-hop
    min propagation needs ~199 rounds here and would now RAISE instead
    of silently returning wrong labels."""
    n = 200
    nodes = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64)}))
    edges = rd.from_pandas(pd.DataFrame({
        "doc_a": np.arange(n - 1, dtype=np.int64),
        "doc_b": np.arange(1, n, dtype=np.int64)}))
    got = D.connected_components(edges, nodes, max_rounds=14).to_pandas()
    assert len(got) == n
    assert (got.label == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_hot_key_grid_split_equals_inline():
    """A planted hot key (group far above max_group) must yield exactly
    the same candidate pair set through the block-grid path as through
    the inline path — every unordered pair in exactly one grid cell."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    rng = np.random.RandomState(5)
    # one hot key with 600 members + 50 cold keys with 2-4 members
    rows = {"tok": [], "doc_id": [], "n": [], "p": []}
    for i in range(600):
        rows["tok"].append(777)
        rows["doc_id"].append(i)
        rows["n"].append(int(rng.randint(95, 105)))   # sizes within window
        rows["p"].append(0)
    nid = 10_000
    for k in range(50):
        for j in range(int(rng.randint(2, 5))):
            rows["tok"].append(1000 + k)
            rows["doc_id"].append(nid)
            rows["n"].append(int(rng.randint(50, 200)))
            rows["p"].append(0)
            nid += 1
    df = pd.DataFrame(rows)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)
                       .replace_schema_metadata(None))

    grid = (D._pairs_from_keys(ds, "tok", num=19, den=20, dedup=True,
                               max_group=64, grid_blocks=4)
            .to_pandas().sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))
    inline = (D._pairs_from_keys(ds, "tok", num=19, den=20, dedup=True,
                                 max_group=10**9)
              .to_pandas().sort_values(["doc_a", "doc_b"])
              .reset_index(drop=True))
    assert len(inline) > 1000           # the hot group really is dense
    pd.testing.assert_frame_equal(grid, inline)


@pytest.mark.usefixtures("ray_session")
def test_hot_key_grid_split_band_path():
    """Unfiltered (LSH band) path through the grid: same pair set."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    rows = {"band": [7] * 90 + [8] * 3,
            "doc_id": list(range(90)) + [500, 501, 502]}
    ds = rd.from_arrow(pa.Table.from_pandas(pd.DataFrame(rows),
                                            preserve_index=False)
                       .replace_schema_metadata(None))
    grid = (D._pairs_from_keys(ds, "band", dedup=True, max_group=16,
                               grid_blocks=4)
            .to_pandas().sort_values(["doc_a", "doc_b"])
            .reset_index(drop=True))
    inline = (D._pairs_from_keys(ds, "band", dedup=True, max_group=10**9)
              .to_pandas().sort_values(["doc_a", "doc_b"])
              .reset_index(drop=True))
    assert len(inline) == 90 * 89 // 2 + 3
    pd.testing.assert_frame_equal(grid, inline)


@pytest.mark.usefixtures("ray_session")
def test_degenerate_identical_corpus():
    """All-identical corpus: every LSH band bucket is one giant hot
    group and every candidate verifies — the worst case for both the
    band exchange and the block-grid verify.  300 clones must yield all
    C(300,2) pairs at jaccard 1000, and exact dedup one keeper."""
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd

    text = "invoice total 1,23,456 rs dealer mahindra tractor model 575 di"
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(300)), type=pa.int64()),
        "text": pa.array([text] * 300)}))

    pairs = D.minhash_lsh_pairs(docs, jaccard_milli=800).to_pandas()
    assert len(pairs) == 300 * 299 // 2
    assert (pairs["jaccard_milli"] == 1000).all()

    sets = D.hash_sets(docs, "shingle").materialize()
    exact = D.verify_pairs(D.prefix_candidates(sets, 4, 5), sets, 4, 5,
                           emit=D._jm).to_pandas()
    assert len(exact) == 300 * 299 // 2


@pytest.mark.usefixtures("ray_session")
def test_simhash_pairs_match_bruteforce_reference():
    """The distributed simhash pipeline (segment-key candidates through
    the hot-key grid + XOR-popcount grid verify) must find EXACTLY the
    pairs a brute-force O(n^2) scan finds: the 4x16-bit pigeonhole is
    lossless for radius 3, and the verify join must not lose or invent
    pairs."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
        sketch as SK,
    )

    got = D.q_simhash_pairs(SF).to_pandas()

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    memo: dict = {}
    ids = np.asarray(docs.column("doc_id").to_pylist())
    sigs = np.array([SK.simhash64(t.lower().split(), memo)
                     for t in docs.column("text").to_pylist()],
                    dtype=np.uint64)
    ia, ib = np.triu_indices(len(ids), k=1)
    h = SK.popcount64_batch(sigs[ia] ^ sigs[ib])
    keep = h <= 3
    lo = np.minimum(ids[ia[keep]], ids[ib[keep]])
    hi = np.maximum(ids[ia[keep]], ids[ib[keep]])
    want = (pd.DataFrame({"doc_a": lo, "doc_b": hi, "hamming": h[keep]})
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert len(want) > 0          # corpus has near-dup templates
    pd.testing.assert_frame_equal(
        got.astype({"hamming": np.int64}), want.astype({"hamming": np.int64}))


@pytest.mark.usefixtures("ray_session")
def test_simhash_identical_corpus_bounded():
    """All-identical corpus: every segment bucket is one giant hot group
    (the adversarial case the old per-pair Python loop stalled on).  The
    grid split must complete fast and emit all C(n,2) pairs at hamming 0."""
    import time

    import ray.data as rd

    text = "invoice total 1,23,456 rs dealer mahindra tractor model 575 di"
    n = 400
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), type=pa.int64()),
        "text": pa.array([text] * n)}))

    t0 = time.time()
    sigs = D.simhash_signatures(docs).materialize()
    seg = sigs.map_batches(
        lambda b: pa.table({
            "seg_key": pa.array(np.concatenate([
                (np.int64(s) << np.int64(16))
                | ((D._sig_u64(b.column("sig").to_numpy(zero_copy_only=False))
                    >> np.uint64(16 * s)) & np.uint64(0xFFFF)).astype(np.int64)
                for s in range(4)])),
            "doc_id": pa.concat_arrays(
                [b.column("doc_id").combine_chunks()] * 4),
        }).replace_schema_metadata(None),
        batch_format="pyarrow")
    cands = D._pairs_from_keys(seg, "seg_key", dedup=True, max_group=64)
    out = D.verify_hamming(cands, sigs, max_h=3).to_pandas()
    took = time.time() - t0
    assert len(out) == n * (n - 1) // 2
    assert (out["hamming"] == 0).all()
    assert took < 120, f"degenerate corpus took {took:.0f}s"


def test_sets_rescan_flag_identical_output(ray_session, monkeypatch):
    """GRAFT_SETS_RESCAN=1 trades the memoized/materialized hash-set
    table for lazy re-scans (zero object-store residency); the pair
    output must be identical either way."""
    _no_tensor_casting()
    base = D.q_jaccard_pairs(SF).to_pandas()
    monkeypatch.setenv("GRAFT_SETS_RESCAN", "1")
    D._SETS_CACHE.clear()
    D._SHINGLE_EDGES_CACHE.clear()
    try:
        rescan = D.q_jaccard_pairs(SF).to_pandas()
    finally:
        monkeypatch.delenv("GRAFT_SETS_RESCAN")
        D._SETS_CACHE.clear()
        D._SHINGLE_EDGES_CACHE.clear()
    pd.testing.assert_frame_equal(
        base.sort_values(["doc_a", "doc_b"]).reset_index(drop=True),
        rescan.sort_values(["doc_a", "doc_b"]).reset_index(drop=True))


def test_clean_corpus_composition(ray_session) -> None:
    """clean_corpus == quality gate → exact keep-min → per-cluster
    keep-min-survivor, recomputed single-process from the same primitive
    outputs (quality metrics, md5, cluster labels)."""
    import hashlib

    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
        vocab as V,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.dedup import (
        CLEAN_MIN_STOP_MILLI,
        CLEAN_MIN_TOKENS,
        q_clean_corpus,
        q_dedup_clusters,
    )
    sf = "/root/testdata/sf0.001"
    got = q_clean_corpus(sf).to_pandas()
    docs = pq.read_table(f"{sf}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    rows = []
    for r in docs.itertuples():
        toks = r.text.lower().split()
        n = len(toks)
        if n < CLEAN_MIN_TOKENS:
            continue
        ns = sum(1 for w in toks if w in V.STOPWORDS)
        if (2000 * ns + n) // (2 * n) < CLEAN_MIN_STOP_MILLI:
            continue
        rows.append((r.doc_id, n,
                     hashlib.md5(r.text.encode("utf-8")).hexdigest()))
    s1 = pd.DataFrame(rows, columns=["doc_id", "n_tokens", "fp"])
    s2 = s1[s1.doc_id == s1.groupby("fp").doc_id.transform("min")]
    labels = q_dedup_clusters(sf).to_pandas()
    m = s2.merge(labels, on="doc_id")
    keep = m[m.doc_id == m.groupby("cluster_id").doc_id.transform("min")]
    want = keep[["doc_id", "n_tokens"]].sort_values("doc_id")
    assert list(got.doc_id) == list(want.doc_id)
    assert list(got.n_tokens) == list(want.n_tokens)
    assert len(got) < len(docs)


def test_sorted_neighborhood_matches_oracle(ray_session) -> None:
    import duckdb
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
        dedup as D,
    )

    sf = "/root/testdata/sf0.001"
    got = D.q_sorted_neighborhood(sf).to_pandas()
    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{sf}/documents.parquet"))
    want = con.execute(D.SQL_SORTED_NEIGHBORHOOD).df()
    assert len(got) == len(want) > 0
    for c in got.columns:
        assert list(got[c]) == list(want[c]), c


def test_sorted_neighborhood_chunk_boundaries(ray_session, monkeypatch) -> None:
    """Pairs must be invariant to the rank-chunk size: a tiny chunk
    forces most windows to straddle chunk boundaries, exercising the
    replicated-context path (each chunk's last W rows spill to the next
    chunk; pairs are owned by the higher rank's home chunk)."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
        dedup as D,
    )

    sf = "/root/testdata/sf0.001"
    base = D.q_sorted_neighborhood(sf).to_pandas()
    monkeypatch.setattr(D, "_SN_CHUNK", 16)
    tiny = D.q_sorted_neighborhood(sf).to_pandas()
    assert base.equals(tiny)


def test_lev_batch_matches_scalar() -> None:
    """Vectorized multi-pair DP equals the scalar DP on random-ish
    deterministic strings of mixed lengths."""
    import numpy as np

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
        dedup as D,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.spellfix import (
        levenshtein,
    )

    rng = np.random.RandomState(7)
    alpha = "abcde"
    sa, sb = [], []
    for _ in range(60):
        la, lb = rng.randint(0, 12), rng.randint(0, 12)
        sa.append("".join(alpha[i] for i in rng.randint(0, 5, la)))
        sb.append("".join(alpha[i] for i in rng.randint(0, 5, lb)))
    got = D._lev_pairs(sa, sb)
    want = [levenshtein(a, b) for a, b in zip(sa, sb)]
    assert list(got) == want
