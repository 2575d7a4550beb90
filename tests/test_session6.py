"""Structural pins for the session-6 operator batch (value equality vs
DuckDB is the driver gate; these localize semantics the hash alone
wouldn't — coverage guarantees, brute-force equivalence, resume)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------------- winnowing
def _brute_winnow(toks: list[str], k: int, w: int):
    """Straight-from-the-paper reference: every window picks its min
    hash, rightmost on ties; distinct (pos, hash) selections."""
    import hashlib
    g = len(toks) - k + 1
    if g <= 0:
        return set()
    hs = [hashlib.md5(" ".join(toks[i:i + k]).encode()).hexdigest()
          for i in range(g)]
    sel = set()
    if g <= w:
        windows = [(0, g)]
    else:
        windows = [(s, s + w) for s in range(g - w + 1)]
    for lo, hi in windows:
        best = None
        for i in range(lo, hi):
            if best is None or hs[i] <= hs[best]:   # <= => rightmost wins
                best = i
        sel.add((best + 1, hs[best]))
    return sel


def test_winnow_matches_brute_force() -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.winnow import (
        K, W, _winnow_doc,
    )
    rng = np.random.RandomState(7)
    vocab = ["a", "bb", "ccc", "dd", "e", "ff"]
    for trial in range(40):
        n = int(rng.randint(0, 30))
        toks = [vocab[i] for i in rng.randint(0, len(vocab), n)]
        g, nw, sel = _winnow_doc(toks)
        assert set(sel) == _brute_winnow(toks, K, W)
        assert g == max(0, n - K + 1)
        if g:
            assert nw == (1 if g <= W else g - W + 1)
            assert 1 <= len(sel) <= nw


def test_winnow_coverage_guarantee() -> None:
    """Two docs sharing >= W+K-1 consecutive tokens share a fingerprint
    hash (the winnowing theorem), regardless of surrounding context."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.winnow import (
        K, W, _winnow_doc,
    )
    shared = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    assert len(shared) >= W + K - 1
    d1 = ["xx", "yy"] + shared + ["zz"]
    d2 = ["qq"] + shared + ["rr", "ss", "tt"]
    h1 = {h for _, h in _winnow_doc(d1)[2]}
    h2 = {h for _, h in _winnow_doc(d2)[2]}
    assert h1 & h2


def test_winnow_query_shape(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.winnow import (
        q_winnow_fingerprint,
    )
    out = q_winnow_fingerprint(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    assert len(out) == len(docs)
    nz = out[out.n_grams > 0]
    assert (nz.n_fps >= 1).all()
    assert (nz.n_fps <= nz.n_windows).all()
    assert (nz.min_fp <= nz.max_fp).all()


# ---------------------------------------------------------- max drawdown
def test_value_drawdown_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.series import (
        q_value_drawdown,
    )
    out = q_value_drawdown(SF).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["v"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    for ty, g in ev.groupby("event_type"):
        s = g.groupby("ts").v.sum().sort_index()
        pref = s.to_numpy().cumsum()
        runmax = np.maximum.accumulate(pref)
        row = out.loc[ty]
        assert row.n_points == len(s)
        assert row.total_cents == pref[-1]
        assert row.max_prefix_cents == pref.max()
        assert row.min_prefix_cents == pref.min()
        assert row.max_drawdown_cents == (runmax - pref).max()
        assert row.max_drawdown_cents >= 0


# --------------------------------------------------------- k-core peel
def test_kcore_matches_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.graph import (
        KCORE_K, KCORE_ROUNDS, q_kcore,
    )
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    adj: list[set] = [set() for _ in range(n)]
    for u in range(n):
        for j in (1, 2, 3):
            v = u >> j
            if v != u:
                adj[u].add(v)
                adj[v].add(u)
    expected = {}
    alive = set(range(n))
    for r in range(1, KCORE_ROUNDS + 1):
        dead = {u for u in alive if len(adj[u] & alive) < KCORE_K}
        for u in dead:
            expected[u] = r
        alive -= dead
    for u in alive:
        expected[u] = KCORE_ROUNDS + 1

    out = q_kcore(SF).to_pandas()
    assert len(out) == n
    got = dict(zip(out.node, out.peeled_round))
    assert got == expected
    # the onion is non-trivial at this scale: every round peels someone
    # and a core survives
    rounds = set(expected.values())
    assert rounds == set(range(1, KCORE_ROUNDS + 2))


# ------------------------------------------------------ association rules
def test_assoc_rules_metrics(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.mining import (
        q_assoc_rules,
    )
    out = q_assoc_rules(SF)
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    dp = li.drop_duplicates()
    nb = dp.l_orderkey.nunique()
    c1 = dp.groupby("l_partkey").size()
    baskets = dp.groupby("l_orderkey").l_partkey.apply(set)
    for r in out.itertuples():
        assert 0 < r.conf_milli <= 1000
        assert r.n_pairs >= 2
        assert r.n_ante == c1[r.antecedent]
        assert r.n_pairs <= r.n_ante
        true_pairs = sum(1 for b in baskets
                         if r.antecedent in b and r.consequent in b)
        assert r.n_pairs == true_pairs
        assert r.lift_milli == (1000 * r.n_pairs * nb) // (
            c1[r.antecedent] * c1[r.consequent])
    # ranking is by (lift, conf) descending
    key = list(zip(-out.lift_milli, -out.conf_milli,
                   out.antecedent, out.consequent))
    assert key == sorted(key)


# -------------------------------------------------- ORC / IPC round-trip
def test_orc_ipc_roundtrip_resume(ray_session, tmp_path) -> None:
    """The custom shards reproduce the source table exactly, and the
    _DONE marker makes the write resumable (second call is a no-op)."""
    import os

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.altsource import (
        _read_shards, _write_shards,
    )
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang", "source", "n_chars"])
    for fmt in ("orc", "ipc"):
        out = _write_shards(SF, fmt)
        mt = {f: os.path.getmtime(os.path.join(out, f))
              for f in os.listdir(out)}
        assert _write_shards(SF, fmt) == out    # resume: no rewrite
        assert mt == {f: os.path.getmtime(os.path.join(out, f))
                      for f in os.listdir(out)}
        got = (_read_shards(out, fmt).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = (src.to_pandas().sort_values("doc_id")
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(got[want.columns], want)


# ----------------------------------------------- lag-1 autocorrelation
def test_autocorr_brute_force(ray_session) -> None:
    from fractions import Fraction

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.series import (
        q_events_autocorr,
    )
    out = q_events_autocorr(SF).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["v"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    for ty, g in ev.groupby("event_type"):
        x = g.groupby("ts").v.sum().sort_index().to_numpy().tolist()
        m = len(x)
        mean = Fraction(sum(x), m)
        num = sum((Fraction(x[t]) - mean) * (Fraction(x[t + 1]) - mean)
                  for t in range(m - 1))
        den = sum((Fraction(xi) - mean) ** 2 for xi in x)
        want = 0 if den == 0 else (1000 * num.numerator * den.denominator) \
            // (num.denominator * den.numerator)
        row = out.loc[ty]
        assert row.n_points == m
        assert row.r1_milli == want
        assert -1000 <= row.r1_milli <= 1000


# ------------------------------------------------------- changepoint
def test_changepoint_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.series import (
        q_events_changepoint,
    )
    out = q_events_changepoint(SF).to_pandas().set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["v"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    for ty, g in ev.groupby("event_type"):
        s = g.groupby("ts").v.sum().sort_index()
        pref = s.to_numpy().cumsum()
        m, tot = len(s), int(pref[-1])
        dev = np.abs(m * pref - np.arange(1, m + 1) * tot)
        best = int(dev.argmax())          # numpy argmax = first max
        row = out.loc[ty]
        assert row.n_points == m
        assert row.total_cents == tot
        assert row.max_absdev_scaled == dev[best]
        want_ts = int(s.index[best].value) // 10**9
        assert row.cp_epoch_s == want_ts


# ------------------------------------------------------- winnow pairs
def test_winnow_pairs_brute_force(ray_session) -> None:
    from collections import defaultdict
    from itertools import combinations

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.winnow import (
        _STOP_DOCS, _winnow_doc, q_winnow_pairs,
    )
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    by_fp = defaultdict(set)
    for r in docs.itertuples():
        for _, h in _winnow_doc(r.text.lower().split())[2]:
            by_fp[h].add(r.doc_id)
    shared = defaultdict(int)
    for h, ds_ in by_fp.items():
        if len(ds_) <= _STOP_DOCS:
            for a, b in combinations(sorted(ds_), 2):
                shared[(a, b)] += 1
    want = sorted(((c, a, b) for (a, b), c in shared.items() if c >= 2),
                  key=lambda t: (-t[0], t[1], t[2]))[:100]
    out = q_winnow_pairs(SF)
    got = [(r.n_shared, r.a, r.b) for r in out.itertuples()]
    assert got == want


# -------------------------------------------------- common neighbors
def test_common_neighbors_brute_force(ray_session) -> None:
    from collections import defaultdict
    from itertools import combinations

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.graph import (
        q_common_neighbors,
    )
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    adj = [set() for _ in range(n)]
    for u in range(n):
        for j in (1, 2, 3):
            v = u >> j
            if v != u:
                adj[u].add(v)
                adj[v].add(u)
    cn = defaultdict(int)
    for c in range(n):
        for a, b in combinations(sorted(adj[c]), 2):
            cn[(a, b)] += 1
    want = sorted(((v, a, b) for (a, b), v in cn.items()
                   if b not in adj[a]),
                  key=lambda t: (-t[0], t[1], t[2]))[:100]
    out = q_common_neighbors(SF)
    got = [(r.cn, r.a, r.b) for r in out.itertuples()]
    assert got == want


# ------------------------------------------------------------ benford
def test_benford_counts(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.mining import (
        q_events_benford,
    )
    out = q_events_benford(SF).to_pandas()
    assert out.digit.between(1, 9).all()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    v = np.abs(np.round(ev.value.to_numpy() * 100).astype(np.int64))
    ev = ev[v > 0]
    v = v[v > 0]
    first = np.array([int(str(x)[0]) for x in v])
    want = (pd.DataFrame({"event_type": ev.event_type.to_numpy(),
                          "digit": first})
            .groupby(["event_type", "digit"]).size())
    for r in out.itertuples():
        assert r.cnt == want.loc[(r.event_type, r.digit)]
        assert 0 <= r.obs_milli <= 1000


# ----------------------------------------------------- brand pareto
def test_brand_pareto_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_brand_pareto,
    )
    out = q_brand_pareto(SF).to_pandas().set_index("p_brand")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_extendedprice"]).to_pandas()
    pt = pq.read_table(f"{SF}/part.parquet",
                       columns=["p_partkey", "p_brand"]).to_pandas()
    li["rev"] = np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
    pr = li.groupby("l_partkey", as_index=False).rev.sum().merge(
        pt, left_on="l_partkey", right_on="p_partkey")
    for brand, g in pr.groupby("p_brand"):
        g = g.sort_values(["rev", "l_partkey"], ascending=[False, True])
        rev = g.rev.to_numpy()
        tot = int(rev.sum())
        cum = rev.cumsum()
        row = out.loc[brand]
        assert row.n_parts == len(rev)
        assert row.total_cents == tot
        assert row.n_parts_80 == int(np.argmax(5 * cum >= 4 * tot)) + 1
        assert row.top_share_milli == (1000 * int(rev[0])) // tot


# ------------------------------------------------------ t-closeness
def test_t_closeness_brute_force(ray_session) -> None:
    from fractions import Fraction

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.mining import (
        q_t_closeness,
    )
    out = q_t_closeness(SF).to_pandas().set_index(["segment", "nationkey"])
    cu = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    cu["sens"] = (np.round(cu.c_acctbal.to_numpy() * 100).astype(np.int64)
                  // 100_000)
    dom = np.sort(cu.sens.unique())
    n, b = len(cu), len(dom)
    gcum = np.cumsum([int((cu.sens == s).sum()) for s in dom])
    for (seg, nat), g in cu.groupby(["c_mktsegment", "c_nationkey"]):
        gn = len(g)
        cg = np.cumsum([int((g.sens == s).sum()) for s in dom])
        emd = sum(Fraction(abs(int(a) * n - int(c) * gn), gn * n * (b - 1))
                  for a, c in zip(cg, gcum))
        want = (1000 * emd.numerator) // emd.denominator
        row = out.loc[(seg, nat)]
        assert row.n_rows == gn
        assert row.emd_milli == want
        assert row.meets_t == int(want <= 200)
        assert 0 <= row.emd_milli < 1000


# ------------------------------------------------------------- RFM
def test_user_rfm_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.mining import (
        q_user_rfm,
    )
    out = q_user_rfm(SF).to_pandas().set_index("user_id")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["s"] = ev.ts.astype("datetime64[ns]").astype("int64") // 10**9
    ev["v"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    u = ev.groupby("user_id").agg(last_s=("s", "max"), freq=("s", "size"),
                                  mon=("v", "sum")).reset_index()
    mt = int(u.last_s.max())
    u["rec_s"] = mt - u.last_s
    nu = len(u)

    def quint(col):
        order = u.sort_values([col, "user_id"]).user_id.to_numpy()
        rank = {uid: i + 1 for i, uid in enumerate(order)}
        return {uid: (rank[uid] - 1) * 5 // nu + 1 for uid in order}

    rq, fq, mq = quint("rec_s"), quint("freq"), quint("mon")
    for r in u.itertuples():
        row = out.loc[r.user_id]
        assert row.rec_s == r.rec_s
        assert row.freq == r.freq
        assert row.mon_cents == r.mon
        assert (row.r_q, row.f_q, row.m_q) == \
            (rq[r.user_id], fq[r.user_id], mq[r.user_id])
        assert row.rfm_code == 100 * row.r_q + 10 * row.f_q + row.m_q
    # quintiles actually spread (even-split formula)
    assert set(out.r_q) | set(out.f_q) | set(out.m_q) <= set(range(1, 6))


# ------------------------------------------------------ media phash
def test_media_phash_properties(ray_session) -> None:
    """aHash is deterministic, invariant to small per-pixel noise, and
    separates structurally different images."""
    import numpy as np

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import rawmedia as rm
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.media import (
        MediaPerceptualHasher,
    )
    ah = MediaPerceptualHasher._ahash
    rng = np.random.RandomState(3)
    gx = np.linspace(0, 255, 96, dtype=np.float32)
    base = np.clip(np.broadcast_to(gx, (64, 96))[..., None]
                   + np.zeros((64, 96, 3), np.float32), 0, 255)
    img = base.astype(np.uint8)
    noisy = np.clip(base + rng.randint(-6, 7, size=img.shape), 0,
                    255).astype(np.uint8)
    flipped = img[:, ::-1]
    assert ah(img) == ah(img)                       # deterministic
    h1, h2 = int(ah(img), 16), int(ah(noisy), 16)
    assert bin(h1 ^ h2).count("1") <= 4             # noise-robust
    h3 = int(ah(flipped), 16)
    assert bin(h1 ^ h3).count("1") >= 16            # content-sensitive
    # encode -> decode roundtrip hashes identically
    assert ah(rm.decode_ppm(rm.encode_ppm(img))) == ah(img)


def test_media_phash_query(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.media import (
        q_media_phash,
    )
    out = q_media_phash(SF).to_pandas()
    assert len(out) > 0
    assert out.phash.str.len().eq(16).all()
    assert out.phash.is_unique
    assert (out.n_refs <= out.n_rows).all()
    assert int(out.n_rows.sum()) >= int(out.n_refs.sum())


def test_media_phash_pairs_brute_force(ray_session) -> None:
    """Pipeline pairs == brute-force all-pairs hamming<=3 over distinct
    refs, and the planted near-dup families are actually found."""
    import ray.data as rd

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.extract import (
        generate_corpus_ray,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.media import (
        MediaPerceptualHasher, media_table_from_docs, q_media_phash_pairs,
    )
    n = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    docs_path, _ = generate_corpus_ray(n, f"/tmp/dai_corpus/sf0.001-{n}")
    hashed = (media_table_from_docs(rd.read_parquet(docs_path))
              .map_batches(MediaPerceptualHasher, batch_format="pyarrow",
                           batch_size=256, concurrency=2)
              .to_pandas().drop_duplicates("media_ref"))
    u = np.array([int(h, 16) for h in hashed.phash], dtype=np.uint64)
    refs = hashed.media_ref.to_numpy()
    want = set()
    for i in range(len(u)):
        x = u[i] ^ u[i + 1:]
        ham = np.zeros(len(x), dtype=np.int64)
        for s in range(64):
            ham += ((x >> np.uint64(s)) & np.uint64(1)).astype(np.int64)
        for j in np.flatnonzero(ham <= 3):
            a, b = sorted((refs[i], refs[i + 1 + int(j)]))
            want.add((a, b, int(ham[j])))
    out = q_media_phash_pairs(SF).to_pandas()
    got = {(r.ref_a, r.ref_b, r.hamming) for r in out.itertuples()}
    assert got == want
    assert len(got) > 0          # the planted families exist at sf0.001


# ---------------------------------------------- Q3 shipping priority
def test_shipping_priority_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_shipping_priority,
    )
    out = q_shipping_priority(SF)
    cu = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    cutoff = pd.Timestamp("1995-03-15")
    keys = set(cu[cu.c_mktsegment == "BUILDING"].c_custkey)
    od = od[(od.o_orderdate < cutoff) & od.o_custkey.isin(keys)]
    li = li[li.l_shipdate > cutoff]
    li = li[li.l_orderkey.isin(set(od.o_orderkey))]
    rev = (np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
           * (100 - np.round(li.l_discount.to_numpy() * 100)
              .astype(np.int64)))
    want = (pd.DataFrame({"k": li.l_orderkey, "rev": rev})
            .groupby("k").rev.sum()
            .sort_values(ascending=False))
    want = sorted(zip(-want.to_numpy(), want.index))[:10]
    got = [(-r.rev, r.o_orderkey) for r in out.itertuples()]
    assert got == want
    assert len(out) == 10


# ----------------------------------------------- chi-square drift
def test_source_lang_chi2_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_source_lang_chi2,
    )
    out = q_source_lang_chi2(SF).to_pandas().set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "lang"]).to_pandas()
    n = len(docs)
    col = docs.groupby("lang").size()
    for src, g in docs.groupby("source"):
        r = len(g)
        num = 0
        for lang, c in col.items():
            o = int((g.lang == lang).sum())
            num += (1000 * (o * n - r * c) ** 2) // (r * c * n)
        row = out.loc[src]
        assert row.n_docs == r
        assert row.chi2_milli == num
        assert row.chi2_milli >= 0
