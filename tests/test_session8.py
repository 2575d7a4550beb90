"""Pins for the session-8 additions: RAG-style chunk explode
(reconstruction + boundary laws) and per-field confidence AUC
(exact brute-force pairwise agreement)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_doc_chunks_reconstructs_documents(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        q_doc_chunks,
    )
    out = q_doc_chunks(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    texts = dict(zip(docs.doc_id, docs.text))
    assert set(out.doc_id) == set(docs.doc_id)  # no doc disappears
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("chunk_id")
        t = texts[doc_id]
        # chunk ordinals are gapless from 0
        assert list(g.chunk_id) == list(range(len(g)))
        # stride-prefix concatenation reconstructs the document exactly
        rebuilt = "".join(c[:CHUNK_STRIDE] for c in g.chunk_text[:-1])
        rebuilt += g.chunk_text.iloc[-1]
        assert rebuilt == t
        # every chunk except the last is either full-size or covers the
        # tail; overlap between neighbours is CHUNK_SIZE - CHUNK_STRIDE
        for prev, cur, k in zip(g.chunk_text, g.chunk_text[1:],
                                g.chunk_id[1:]):
            assert t[k * CHUNK_STRIDE:
                     k * CHUNK_STRIDE + CHUNK_SIZE] == cur
            assert prev[CHUNK_STRIDE:] == cur[:CHUNK_SIZE - CHUNK_STRIDE]
        assert (g.chunk_len == g.chunk_text.str.len()).all()


def test_extract_auc_matches_pairwise_bruteforce(ray_session) -> None:
    import __ray_entry__ as e

    out = e.queries()["extract_auc"](SF).set_index("field")
    # reconstruct the (confidence, correct) pairs exactly as the
    # operator does, then score with the O(n^2) textbook definition
    import pyarrow.parquet as pq2

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.evaluate import (
        _CONF_FIELDS,
        _doc_checks,
    )

    (_docs, gt_path), _ = e._corpus_for(SF)
    gt = {r["doc_id"]: r for r in pq2.read_table(gt_path).to_pylist()}
    res_rows = []
    for ref_batch in e._run_flagship(SF).iter_batches(
            batch_format="pyarrow"):
        res_rows.extend(ref_batch.to_pylist())
    for f in _CONF_FIELDS:
        pos, neg = [], []
        for row in res_rows:
            g = gt.get(row["doc_id"])
            if g is None:
                continue
            checks = _doc_checks(row, g)
            if checks[f] is None:
                continue
            cm = int(float(row[f"{f}_confidence"] or 0.0) * 1000)
            (pos if checks[f] else neg).append(cm)
        row = out.loc[f]
        assert row.n_pos == len(pos) and row.n_neg == len(neg)
        if not pos or not neg:
            assert row.auc_milli == -1
            continue
        p = np.asarray(pos)[:, None]
        n = np.asarray(neg)[None, :]
        u2 = int((2 * (p > n) + (p == n)).sum())
        assert row.u2 == u2
        assert row.auc_milli == (1000 * u2) // (2 * len(pos) * len(neg))


def test_shard_manifest_covers_corpus_and_balances(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        SHARD_CKSUM_P,
        SHARD_MIX,
        SHARD_N,
        q_shard_manifest,
    )
    out = q_shard_manifest(SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    # conservation: every document lands in exactly one shard
    assert int(out.n_docs.sum()) == len(docs)
    assert int(out.total_chars.sum()) == int(docs.n_chars.sum())
    # placement is the pure function of doc_id (re-run determinism)
    did = docs.doc_id.to_numpy().astype(np.int64)
    shard = (did * SHARD_MIX) % 4294967296 % SHARD_N
    exp_n = pd.Series(shard).value_counts().sort_index()
    got = out.set_index("shard_id").n_docs
    assert got.to_dict() == exp_n.to_dict()
    # checksum is order-independent: brute-force mod-sum agrees
    term = (did * 31 + docs.n_chars.to_numpy().astype(np.int64)) \
        % SHARD_CKSUM_P
    for sid, row in out.set_index("shard_id").iterrows():
        assert row.cksum == int(term[shard == sid].sum()) % SHARD_CKSUM_P
    # no empty or runaway shard at this corpus size
    assert out.n_docs.max() <= 4 * max(1, out.n_docs.min())


def test_chunk_dup_stats_bruteforce(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import (
        CHUNK_SIZE,
        CHUNK_STRIDE,
        q_chunk_dup_stats,
    )
    out = q_chunk_dup_stats(SF).set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "source"]).to_pandas()
    from collections import Counter
    per: dict[str, Counter] = {}
    for _, r in docs.iterrows():
        t = r.text
        for p in range(0, max(len(t), 1), CHUNK_STRIDE):
            per.setdefault(r.source, Counter())[t[p:p + CHUNK_SIZE]] += 1
    for src, c in per.items():
        row = out.loc[src]
        assert row.n_chunks == sum(c.values())
        assert row.n_distinct == len(c)
        assert row.n_dup_texts == sum(1 for v in c.values() if v > 1)
        assert row.n_dup_occurrences == sum(v for v in c.values() if v > 1)
        assert row.max_occ == max(c.values())
    assert set(out.index) == set(per)


def test_embed_dim_stats_bruteforce_moments(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.similarity import (
        q_embed_dim_stats,
    )
    out = q_embed_dim_stats(SF)
    emb = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["embedding"]).to_pandas()
    mat = np.floor(np.stack(emb.embedding.to_numpy()).astype(np.float64)
                   * 1_000_000).astype(object)  # python ints, no wrap
    n = mat.shape[0]
    assert list(out.dim) == list(range(1, mat.shape[1] + 1))
    for j, row in enumerate(out.itertuples()):
        col = [int(v) for v in mat[:, j]]
        sq, sq2 = sum(col), sum(v * v for v in col)
        assert (row.n, row.sum_q, row.sum_q2) == (n, sq, sq2)
        assert row.mean_micro == sq // n          # Python FLOOR division
        assert row.var_micro2 == (n * sq2 - sq * sq) // (n * n)
        assert row.var_micro2 >= 0


def test_dup_cluster_sizes_conservation(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.dedup import (
        q_dedup_clusters,
        q_dup_cluster_sizes,
    )
    out = q_dup_cluster_sizes(SF)
    cl = q_dedup_clusters(SF).to_pandas()
    # conservation: histogram covers every doc and every cluster
    assert int(out.n_docs.sum()) == len(cl)
    assert int(out.n_clusters.sum()) == cl.cluster_id.nunique()
    # definitional identity per bin: n_docs = size * n_clusters
    assert (out.n_docs == out.cluster_size * out.n_clusters).all()
    # brute force the histogram from the labeling itself
    szs = cl.groupby("cluster_id").size().value_counts().sort_index()
    assert dict(zip(out.cluster_size, out.n_clusters)) == szs.to_dict()


def test_token_coverage_curve_bruteforce(ray_session) -> None:
    from collections import Counter

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import (
        COVERAGE_KS,
        q_token_coverage_curve,
    )
    out = q_token_coverage_curve(SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    c = Counter()
    for t in docs.text:
        w = t.split()
        c.update(a + " " + b for a, b in zip(w, w[1:]))
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())
    assert list(out.k) == list(COVERAGE_KS)
    prev = -1
    for row in out.itertuples():
        covered = sum(v for _, v in ranked[:row.k])
        assert row.covered_occ == covered
        assert row.total_occ == total
        assert row.coverage_milli == (1000 * covered) // total
        assert row.covered_occ >= prev          # monotone in k
        prev = row.covered_occ


def test_neardup_quality_consistent_with_pair_queries(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.dedup import (
        q_minhash_pairs,
        q_neardup_quality,
        q_shingle_pairs,
    )
    out = q_neardup_quality(SF).iloc[0]
    t = q_shingle_pairs(SF).to_pandas()
    p = q_minhash_pairs(SF).to_pandas()
    tset = set(zip(t.doc_a, t.doc_b))
    pset = set(zip(p.doc_a, p.doc_b))
    assert out.n_true == len(tset) and out.n_pred == len(pset)
    assert out.n_hit == len(tset & pset)
    # LSH may miss but never invents: predicted pairs are verified, so
    # precision must be exact-1000 whenever n_pred > 0
    if out.n_pred:
        assert out.precision_milli == 1000


def test_split_leakage_audit_bruteforce(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        SPLIT_CUTOFF,
        q_split_leakage_audit,
    )
    out = q_split_leakage_audit(SF).iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    cut = pd.Timestamp(SPLIT_CUTOFF)
    tr = ev[ev.ts < cut].groupby("user_id").size()
    te = ev[ev.ts >= cut].groupby("user_id").size()
    assert out.n_train_events == len(ev[ev.ts < cut])
    assert out.n_test_events == len(ev) - out.n_train_events
    both = set(tr.index) & set(te.index)
    assert out.users_both == len(both)
    assert out.users_train_only == len(set(tr.index) - both)
    assert out.users_test_only == len(set(te.index) - both)
    n = out.users_train_only + out.users_test_only + out.users_both
    assert out.leakage_milli == (1000 * out.users_both) // n


def test_coordinated_sample_referential_closure(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        CS_MIX,
        CS_PCT,
        q_coordinated_sample,
    )
    out = q_coordinated_sample(SF).iloc[0]
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_totalprice"]).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_extendedprice"]).to_pandas()

    def keep(k):
        return ((k.astype(np.int64) * CS_MIX) % 4294967296) % 100 < CS_PCT

    so = o[keep(o.o_orderkey.to_numpy())]
    sl = li[keep(li.l_orderkey.to_numpy())]
    assert out.n_orders == len(so) and out.n_lineitems == len(sl)
    assert out.order_cents == int(np.round(so.o_totalprice * 100).sum())
    assert out.lineitem_cents == int(np.round(sl.l_extendedprice
                                              * 100).sum())
    assert out.n_lineitem_orders == sl.l_orderkey.nunique()
    # the coordinated property itself: every sampled lineitem's parent
    # order is sampled (closure holds with NO join)
    assert set(sl.l_orderkey) <= set(so.o_orderkey)
    assert out.n_orphan_orders == 0


def test_ingest_dedup_new_against_pairs(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.dedup import (
        q_ingest_dedup_new,
        q_shingle_pairs,
    )
    out = q_ingest_dedup_new(SF).to_pandas()
    pairs = q_shingle_pairs(SF).to_pandas()
    n = len(pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]))
    cut = n // 2
    cross = pairs[(pairs.doc_a < cut) & (pairs.doc_b >= cut)]
    exp = (cross.groupby("doc_b")
           .agg(keeper=("doc_a", "min"), cnt=("doc_a", "size")))
    assert dict(zip(out.new_doc_id, out.keeper_doc_id)) \
        == exp.keeper.to_dict()
    assert dict(zip(out.new_doc_id, out.n_existing_matches)) \
        == exp.cnt.to_dict()
    # every reported keeper really is on the existing side
    assert (out.keeper_doc_id < cut).all()
    assert (out.new_doc_id >= cut).all()


def test_doc_rank_in_source_is_permutation(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import (
        q_doc_rank_in_source,
    )
    out = q_doc_rank_in_source(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source",
                                  "n_chars"]).to_pandas()
    assert len(out) == len(docs)
    for src, g in out.groupby("source"):
        n = len(g)
        # ranks are a permutation of 1..n within the source
        assert sorted(g.rank_in_source) == list(range(1, n + 1))
        # rank order agrees with the (n_chars, doc_id) sort order
        s = g.sort_values("rank_in_source")
        expect = g.sort_values(["n_chars", "doc_id"])
        assert list(s.doc_id) == list(expect.doc_id)
        # normalized rank endpoints
        assert s.rank_milli.iloc[0] == 0
        assert s.rank_milli.iloc[-1] == (1000 if n > 1 else 0)


def test_corpus_report_bruteforce(ray_session) -> None:
    import hashlib

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import (
        q_corpus_report,
    )
    out = q_corpus_report(SF).iloc[0]
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    assert out.n_docs == len(docs)
    assert out.total_chars == int(docs.text.str.len().sum())
    assert out.total_tokens == sum(len(t.split()) for t in docs.text)
    assert out.n_sources == docs.source.nunique()
    assert out.n_langs == docs.lang.nunique()
    distinct = len({hashlib.md5(t.encode()).hexdigest()
                    for t in docs.text})
    assert out.n_distinct_texts == distinct
    assert out.dup_docs == len(docs) - distinct
    assert out.dup_rate_milli == (1000 * out.dup_docs) // len(docs)


def test_zone_prune_audit_semantics(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        ZP_CENT_HI,
        ZP_CENT_LO,
        ZP_USER_HI,
        ZP_USER_LO,
        q_zone_prune_audit,
    )
    out = q_zone_prune_audit(SF).iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id",
                                "value"]).to_pandas()
    cents = np.floor(ev.value.to_numpy(np.float64) * 100).astype(np.int64)
    match = ((ev.user_id >= ZP_USER_LO) & (ev.user_id <= ZP_USER_HI)
             & (cents >= ZP_CENT_LO) & (cents <= ZP_CENT_HI))
    assert out.n_rows == len(ev)
    assert out.n_match == int(match.sum())
    # zone maps can never prune a matching row: scanned >= matching
    assert out.rows_scanned_z >= out.n_match
    assert out.rows_scanned_id >= out.n_match
    assert out.zones_scanned_z <= out.n_zones_z
    assert out.zones_scanned_id <= out.n_zones_id
    # the whole point: the Morton layout scans fewer rows than the
    # arrival layout for this 2-D predicate
    assert out.rows_scanned_z < out.rows_scanned_id


def test_nation_revenue_share_sums(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_nation_revenue_share,
    )
    out = q_nation_revenue_share(SF)
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_totalprice"]).to_pandas()
    total = int(np.round(orders.o_totalprice * 100).sum())
    # conservation: nation cents sum to the global total
    assert int(out.nation_cents.sum()) == total
    for _, g in out.groupby("r_name"):
        # nations partition their region's revenue exactly
        assert int(g.nation_cents.sum()) == int(g.region_cents.iloc[0])
        # floored milli shares sum to <= 1000 and within rounding slack
        s = int(g.nation_share_milli.sum())
        assert 1000 - len(g) < s <= 1000
    # region shares cover the total the same way
    rs = out.drop_duplicates("r_name").region_share_milli
    assert 1000 - len(rs) < int(rs.sum()) <= 1000


def test_events_did_cell_identity(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        DID_CONTROL,
        DID_CUTOFF,
        DID_TREAT,
        q_events_did,
    )
    out = q_events_did(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "ts",
                                "value"]).to_pandas()
    cut = pd.Timestamp(DID_CUTOFF)
    means = {}
    for grp in (DID_TREAT, DID_CONTROL):
        for period in ("pre", "post"):
            d = ev[(ev.event_type == grp)
                   & ((ev.ts >= cut) if period == "post"
                      else (ev.ts < cut))]
            cents = np.round(d.value * 100).astype(np.int64)
            row = out[(out.grp == grp) & (out.period == period)].iloc[0]
            assert row.n_events == len(d)
            assert row.sum_cents == int(cents.sum())
            means[(grp, period)] = (1000 * int(cents.sum())) // len(d)
            assert row.mean_millicents == means[(grp, period)]
    did = ((means[(DID_TREAT, "post")] - means[(DID_TREAT, "pre")])
           - (means[(DID_CONTROL, "post")]
              - means[(DID_CONTROL, "pre")]))
    assert (out.did_millicents == did).all()


def test_ab_test_eval_bruteforce(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        AB_CONV_TYPE,
        AB_MIX,
        q_ab_test_eval,
    )
    out = q_ab_test_eval(SF).iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    conv = (ev.assign(c=(ev.event_type == AB_CONV_TYPE))
            .groupby("user_id").c.max())
    variant = (conv.index.to_numpy().astype(np.int64)
               * AB_MIX) % 4294967296 % 2
    na, nb = int((variant == 0).sum()), int((variant == 1).sum())
    ca = int(conv.to_numpy()[variant == 0].sum())
    cb = int(conv.to_numpy()[variant == 1].sum())
    assert (out.n_a, out.conv_a, out.n_b, out.conv_b) == (na, ca, nb, cb)
    n, c, d = na + nb, ca + cb, ca * nb - cb * na
    sig = int(0 < c < n
              and 10000 * d * d * n > 38416 * na * nb * c * (n - c))
    assert out.significant == sig


def test_seasonal_backtest_bruteforce(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        BT_CUTOFF,
        q_seasonal_backtest,
    )
    out = q_seasonal_backtest(SF).iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "value"]).to_pandas()
    s = ev.ts.astype("datetime64[ns]").astype("int64") // 10**9
    key = (s // 86400 + 4) % 7 * 24 + (s % 86400) // 3600
    cents = np.round(ev.value * 100).astype(np.int64)
    cut = int(pd.Timestamp(BT_CUTOFF).value // 10**9)
    tr, te = s < cut, s >= cut
    model = {}
    for k, g in pd.DataFrame({"k": key[tr],
                              "c": cents[tr]}).groupby("k"):
        model[k] = (1000 * int(g.c.sum())) // len(g)
    pred = np.array([model.get(k, 0) for k in key[te]])
    err = int(np.abs(1000 * cents[te].to_numpy() - pred).sum())
    assert out.n_train == int(tr.sum())
    assert out.n_test == int(te.sum())
    assert out.n_model_cells == len(model)
    assert out.sum_abs_err_millicents == err
    assert out.mae_millicents == err // int(te.sum())


def test_event_dedup_window_bruteforce(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        DEDUP_WINDOW_S,
        q_event_dedup_window,
    )
    out = q_event_dedup_window(SF).set_index("event_type")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["cents"] = np.round(ev.value * 100).astype(np.int64)
    ev["s"] = ev.ts.astype("datetime64[ns]").astype("int64") // 10**9
    counts: dict[str, list[int]] = {}
    for (_, t, _), g in ev.groupby(["user_id", "event_type", "cents"]):
        g = g.sort_values(["s", "event_id"])
        s = g.s.to_numpy()
        sup = int(((s[1:] - s[:-1]) <= DEDUP_WINDOW_S).sum())
        c = counts.setdefault(t, [0, 0])
        c[0] += len(g)
        c[1] += sup
    for t, (n, sup) in counts.items():
        row = out.loc[t]
        assert row.n_events == n
        assert row.n_suppressed == sup
        assert row.suppress_milli == (1000 * sup) // n


def test_hll_accuracy_within_bound(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_hll_accuracy,
    )
    out = q_hll_accuracy(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "user_id"]).to_pandas()
    exact = ev.groupby("event_type").user_id.nunique()
    assert dict(zip(out.event_type, out.exact_users)) == exact.to_dict()
    # p=12 HLL: |error| well under 5% on these cardinalities
    assert (out.err_milli.abs() <= 50).all()


def test_events_ks_test_matches_scipy_free_bruteforce(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        KS_A,
        KS_B,
        q_events_ks_test,
    )
    out = q_events_ks_test(SF).iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    a = np.sort(np.round(ev.value[ev.event_type == KS_A] * 100)
                .astype(np.int64))
    b = np.sort(np.round(ev.value[ev.event_type == KS_B] * 100)
                .astype(np.int64))
    assert (out.n_a, out.n_b) == (len(a), len(b))
    # textbook exact KS over the union of observed thresholds
    thresholds = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, thresholds, side="right")
    cb = np.searchsorted(b, thresholds, side="right")
    d = int(np.abs(ca.astype(object) * len(b)
                   - cb.astype(object) * len(a)).max())
    assert out.d_scaled == d
    assert out.ks_milli == (1000 * d) // (len(a) * len(b))
    assert out.n_values == len(thresholds)


def test_blocklist_filter_rate_bruteforce(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import (
        BLOCKLIST,
        q_blocklist_filter_rate,
    )
    out = q_blocklist_filter_rate(SF).set_index("source")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text", "source"]).to_pandas()
    for src, g in docs.groupby("source"):
        toks = [set(t.split()) for t in g.text]
        row = out.loc[src]
        assert row.n_docs == len(g)
        flagged = sum(1 for w in toks if any(t in w for t in BLOCKLIST))
        assert row.n_flagged == flagged
        for t in BLOCKLIST:
            assert row[f"hit_{t}"] == sum(1 for w in toks if t in w)
        assert row.flag_milli == (1000 * flagged) // len(g)
    # whole-word semantics: a dead term stays dead
    assert int(out.hit_crash.sum()) == 0
