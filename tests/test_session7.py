"""Structural pins for the session-7 operator batch (value equality vs
DuckDB is the driver gate; these localize semantics the hash alone
wouldn't — order independence, boundary handling, conservation laws)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ Q13 count-of-counts
def test_custdist_conserves_customers(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_custdist,
    )
    out = q_custdist(SF)
    n_cust = len(pq.read_table(f"{SF}/customer.parquet",
                               columns=["c_custkey"]))
    # every customer lands in exactly one histogram bin (zero included)
    assert int(out.custdist.sum()) == n_cust
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_custkey", "o_orderpriority"]).to_pandas()
    kept = od[od.o_orderpriority != "1-URGENT"]
    # total order mass is conserved: sum(c_count * custdist) = kept orders
    assert int((out.c_count * out.custdist).sum()) == len(kept)


# ------------------------------------------------ gaps-and-islands
def test_user_streaks_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_user_streaks,
    )
    out = q_user_streaks(SF).to_pandas().set_index("user_id")
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    ev["d"] = ev.ts.astype("datetime64[ns]").astype("int64") \
        // 1_000_000_000 // 86400
    for uid, g in ev.groupby("user_id"):
        days = np.unique(g.d.to_numpy())
        runs, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        row = out.loc[uid]
        assert row.n_days == len(days)
        assert row.n_streaks == len(runs)
        assert row.max_streak == max(runs)


# ------------------------------------------------ Q22-shaped anti-join
def test_idle_balance_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        IDLE_CUTOFF,
        q_idle_balance,
    )
    out = q_idle_balance(SF).to_pandas().set_index("c_nationkey")
    cu = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_custkey", "o_orderdate"]).to_pandas()
    bal = np.round(cu.c_acctbal.to_numpy() * 100).astype(np.int64)
    pos = bal[bal > 0]
    active = set(od[od.o_orderdate >= pd.Timestamp(IDLE_CUTOFF)].o_custkey)
    keep = (bal * len(pos) > int(pos.sum())) \
        & ~cu.c_custkey.isin(active).to_numpy()
    want = pd.DataFrame({
        "n": cu.c_nationkey.to_numpy()[keep],
        "bal": bal[keep]}).groupby("n").agg(
            n_cust=("bal", "size"), total=("bal", "sum"))
    assert len(out) == len(want)
    for n, row in want.iterrows():
        assert out.loc[n].n_cust == row.n_cust
        assert out.loc[n].total_bal_cents == row.total
    assert keep.sum() > 0               # cutoff is non-trivial at sf0.001


# ------------------------------------------------ partition checksums
def test_table_checksum_order_independent(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_table_checksum,
    )
    out = q_table_checksum(SF).to_pandas().set_index("bucket")
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    # brute force over a REVERSED row order — XOR must not care
    od = od.iloc[::-1].reset_index(drop=True)
    cents = np.round(od.o_totalprice.to_numpy() * 100).astype(np.int64)
    es = od.o_orderdate.astype("datetime64[ns]").astype("int64") \
        // 1_000_000_000
    agg: dict[int, tuple[int, int]] = {}
    for k, c, st, ct, e, pr in zip(od.o_orderkey, od.o_custkey,
                                   od.o_orderstatus, cents, es,
                                   od.o_orderpriority):
        hv = int(hashlib.md5(
            f"{k}|{c}|{st}|{ct}|{e}|{pr}".encode()).hexdigest()[:15], 16)
        b = int(k) % 64
        n, x = agg.get(b, (0, 0))
        agg[b] = (n + 1, x ^ hv)
    assert len(out) == len(agg)
    for b, (n, x) in agg.items():
        assert out.loc[b].n_rows == n
        assert out.loc[b].checksum == x


# ------------------------------------------------ novelty conservation
def test_gram_novelty_invariants(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import (
        q_gram_novelty,
    )
    out = q_gram_novelty(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    grams_by_doc = {}
    for d, t in zip(docs.doc_id, docs.text):
        toks = t.lower().split()
        grams_by_doc[d] = {" ".join(toks[i:i + 3])
                           for i in range(len(toks) - 2)}
    all_grams = set().union(*grams_by_doc.values())
    # conservation: every distinct gram is novel in exactly one doc
    assert int(out.n_novel.sum()) == len(all_grams)
    byid = out.set_index("doc_id")
    for d, gs in grams_by_doc.items():
        assert byid.loc[d].n_grams == len(gs)
    # the lowest doc_id that has grams is 100% novel
    first = min(d for d, gs in grams_by_doc.items() if gs)
    assert byid.loc[first].novelty_milli == 1000


# ------------------------------------------------ vocabulary overlap
def test_vocab_overlap_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import (
        q_vocab_overlap,
    )
    out = q_vocab_overlap(SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["source", "text"]).to_pandas()
    vocab: dict[str, set] = {}
    for s, t in zip(docs.source, docs.text):
        vocab.setdefault(s, set()).update(t.lower().split())
    srcs = sorted(vocab)
    want = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            inter = len(vocab[a] & vocab[b])
            if inter:
                want[(a, b)] = (inter, 1000 * inter
                                // len(vocab[a] | vocab[b]))
    got = {(r.src_a, r.src_b): (r.inter, r.jaccard_milli)
           for r in out.itertuples()}
    assert got == want


# ------------------------------------------------ inversion counter
def test_count_inversions_brute_force() -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        _count_inversions,
    )
    rng = np.random.default_rng(7)
    cases = [np.array([], dtype=np.int64), np.array([5]),
             np.array([1, 2, 3]), np.array([3, 2, 1]),
             np.array([2, 2, 2, 2])]
    for n in (2, 3, 7, 8, 16, 33, 100, 257):
        cases.append(rng.integers(0, 10, n))       # heavy ties
        cases.append(rng.integers(0, 10**9, n))    # distinct-ish
    for v in cases:
        want = sum(int(v[i] > v[j])
                   for i in range(len(v)) for j in range(i + 1, len(v)))
        assert _count_inversions(np.asarray(v, dtype=np.int64)) == want


# ------------------------------------------------ Kendall vs brute force
def test_user_kendall_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_user_kendall,
    )
    out = q_user_kendall(SF).to_pandas().set_index("user_id")
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["v"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    for uid, g in ev.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        v = g.v.to_numpy()
        n = len(v)
        d = sum(int(v[i] > v[j])
                for i in range(n) for j in range(i + 1, n))
        t = sum(int(v[i] == v[j])
                for i in range(n) for j in range(i + 1, n))
        total = n * (n - 1) // 2
        row = out.loc[uid]
        assert row.n_pairs == total
        assert row.n_discordant == d
        assert row.tau_milli == (1000 * (total - t - 2 * d)) // total


# ------------------------------------------------ attribution conservation
def test_first_touch_conserves_purchases(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_first_touch,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_user_sessions,
    )
    out = q_first_touch(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type"]).to_pandas()
    # every purchase lands in exactly one session's credit
    assert int(out.n_purchases.sum()) == int((ev.event_type ==
                                              "purchase").sum())
    # every session has exactly one first-touch type
    n_sessions = q_user_sessions(SF).count()
    assert int(out.n_sessions.sum()) == n_sessions


# ------------------------------------------------ fk audit detects orphans
def test_fk_audit_detects_injected_orphans(ray_session, tmp_path) -> None:
    import pyarrow as pa
    import shutil
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_fk_audit,
    )
    clean = q_fk_audit(SF)
    assert (clean.orphan_rows == 0).all()
    assert (clean.orphan_keys == 0).all()
    # corrupt a copy: give 3 orders a custkey no customer has (2 distinct)
    for t in ("customer", "orders", "lineitem", "part", "supplier",
              "nation", "region"):
        shutil.copy(f"{SF}/{t}.parquet", tmp_path / f"{t}.parquet")
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    bad = od.head(3).copy()
    bad["o_custkey"] = np.int64(10**12) + np.array([0, 0, 1])
    bad["o_orderkey"] = od.o_orderkey.max() + np.arange(1, 4)
    corrupted = pd.concat([od, bad], ignore_index=True)
    pq.write_table(pa.Table.from_pandas(corrupted, preserve_index=False),
                   tmp_path / "orders.parquet")
    dirty = q_fk_audit(str(tmp_path)).set_index("relation")
    assert dirty.loc["orders->customer"].orphan_rows == 3
    assert dirty.loc["orders->customer"].orphan_keys == 2
    assert dirty.loc["orders->customer"].n_rows == len(od) + 3
    # the other relations stay clean
    assert dirty.drop("orders->customer").orphan_rows.sum() == 0


# ------------------------------------------------ Q17 brute force
def test_small_qty_revenue_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_small_qty_revenue,
    )
    out = q_small_qty_revenue(SF).to_pandas().set_index("p_brand")
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    pt = pq.read_table(f"{SF}/part.parquet").to_pandas()
    li["q"] = np.round(li.l_quantity.to_numpy()).astype(np.int64)
    li["cents"] = np.round(li.l_extendedprice.to_numpy() * 100) \
        .astype(np.int64)
    st = li.groupby("l_partkey").agg(sq=("q", "sum"), n=("q", "size"))
    keep = li[5 * li.q.to_numpy()
              * li.l_partkey.map(st.n).to_numpy()
              < li.l_partkey.map(st.sq).to_numpy()]
    m = keep.merge(pt, left_on="l_partkey", right_on="p_partkey")
    want = m.groupby("p_brand").agg(n_items=("cents", "size"),
                                    rev=("cents", "sum"))
    assert len(out) == len(want)
    for b, row in want.iterrows():
        assert out.loc[b].n_items == row.n_items
        assert out.loc[b].rev_cents == row.rev


# ------------------------------------------------ Q19 disjuncts
def test_disjunctive_revenue_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        _Q19_CLAUSES,
        q_disjunctive_revenue,
    )
    out = q_disjunctive_revenue(SF).to_pandas().set_index("clause")
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    pt = pq.read_table(f"{SF}/part.parquet").to_pandas()
    m = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    q = np.round(m.l_quantity.to_numpy()).astype(np.int64)
    cents = np.round(m.l_extendedprice.to_numpy() * 100).astype(np.int64)
    for label, brand, slo, shi, lo, hi in _Q19_CLAUSES:
        keep = ((m.p_brand == brand).to_numpy()
                & (m.p_size.to_numpy() >= slo)
                & (m.p_size.to_numpy() <= shi)
                & (q >= lo) & (q <= hi))
        assert out.loc[label].n_items == keep.sum()
        assert out.loc[label].rev_cents == cents[keep].sum()
    assert out.n_items.sum() > 0        # predicates are live at sf0.001


# ------------------------------------------------ Q8 market share
def test_market_share_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        MS_NATION,
        MS_REGION,
        q_market_share,
    )
    out = q_market_share(SF).set_index("yr")
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    cu = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    su = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    na = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    re = pq.read_table(f"{SF}/region.parquet").to_pandas()
    rk = int(re[re.r_name == MS_REGION].r_regionkey.iloc[0])
    asia = set(na[na.n_regionkey == rk].n_nationkey)
    tnk = int(na[na.n_name == MS_NATION].n_nationkey.iloc[0])
    m = (li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
         .merge(cu, left_on="o_custkey", right_on="c_custkey")
         .merge(su, left_on="l_suppkey", right_on="s_suppkey"))
    m = m[m.c_nationkey.isin(asia)]
    cents = np.round(m.l_extendedprice.to_numpy() * 100).astype(np.int64)
    yr = m.o_orderdate.dt.year.to_numpy()
    is_nat = (m.s_nationkey == tnk).to_numpy().astype(np.int64)
    want = pd.DataFrame({"yr": yr, "c": cents, "n": cents * is_nat}) \
        .groupby("yr").agg(total=("c", "sum"), nat=("n", "sum"))
    assert len(out) == len(want)
    for y, row in want.iterrows():
        assert out.loc[y].total_cents == row.total
        assert out.loc[y].nation_cents == row.nat
        assert out.loc[y].share_milli == 1000 * row.nat // row.total


# ------------------------------------------------ above-median orders
def test_above_median_orders_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_above_median_orders,
    )
    out = q_above_median_orders(SF).set_index("o_orderpriority")
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    od["cents"] = np.round(od.o_totalprice.to_numpy() * 100) \
        .astype(np.int64)
    med = od.groupby("o_custkey").cents.apply(
        lambda s: np.sort(s.to_numpy())[(len(s) - 1) // 2])
    keep = od[od.cents > od.o_custkey.map(med)]
    want = keep.groupby("o_orderpriority").agg(n=("cents", "size"),
                                               rev=("cents", "sum"))
    assert len(out) == len(want)
    for p, row in want.iterrows():
        assert out.loc[p].n_orders == row.n
        assert out.loc[p].rev_cents == row.rev


# ------------------------------------------------ yoy growth
def test_orders_yoy_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_orders_yoy,
    )
    out = q_orders_yoy(SF)
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    od["cents"] = np.round(od.o_totalprice.to_numpy() * 100) \
        .astype(np.int64)
    want = od.groupby(od.o_orderdate.dt.year).cents.sum().sort_index()
    assert list(out.yr) == list(want.index)
    assert list(out.rev_cents) == list(want.to_numpy())
    for i in range(1, len(out)):
        prev = int(want.iloc[i - 1])
        delta = int(want.iloc[i]) - prev
        assert out.prev_cents.iloc[i] == prev
        assert out.yoy_milli.iloc[i] == (1000 * delta) // prev
    assert out.prev_cents.iloc[0] == 0 and out.yoy_milli.iloc[0] == 0


# ------------------------------------------------ Q10 returned revenue
def test_returned_revenue_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        RET_HI,
        RET_LO,
        q_returned_revenue,
    )
    out = q_returned_revenue(SF)
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    od = od[(od.o_orderdate >= pd.Timestamp(RET_LO))
            & (od.o_orderdate < pd.Timestamp(RET_HI))]
    li = li[li.l_returnflag == "R"]
    m = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    rev = (np.round(m.l_extendedprice.to_numpy() * 100).astype(np.int64)
           * (100 - np.round(m.l_discount.to_numpy() * 100)
              .astype(np.int64)))
    per = (pd.DataFrame({"k": m.o_custkey, "rev": rev})
           .groupby("k").rev.sum())
    want = sorted(zip(-per.to_numpy(), per.index))[:20]
    got = [(-r.rev, r.c_custkey) for r in out.itertuples()]
    assert got == want


# ------------------------------------------------ Q14 promo share
def test_promo_share_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_promo_share,
    )
    out = q_promo_share(SF).set_index("ym")
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    pt = pq.read_table(f"{SF}/part.parquet").to_pandas()
    m = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    rev = (np.round(m.l_extendedprice.to_numpy() * 100).astype(np.int64)
           * (100 - np.round(m.l_discount.to_numpy() * 100)
              .astype(np.int64)))
    ym = (m.l_shipdate.dt.year * 100 + m.l_shipdate.dt.month).to_numpy()
    pr = (m.p_type == "PROMO").to_numpy().astype(np.int64)
    want = pd.DataFrame({"ym": ym, "t": rev, "p": rev * pr}) \
        .groupby("ym").agg(t=("t", "sum"), p=("p", "sum"))
    assert len(out) == len(want)
    for y, row in want.iterrows():
        assert out.loc[y].total_cents == row.t
        assert out.loc[y].promo_cents == row.p
        assert out.loc[y].promo_milli == 1000 * row.p // row.t


# ------------------------------------------------ Q15 argmax ties survive
def test_top_supplier_ties_survive(ray_session, tmp_path) -> None:
    import pyarrow as pa
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        TS_LO,
        q_top_supplier,
    )
    # craft an exact revenue tie between suppliers 1 and 2, far apart in
    # key space so they land in different hash buckets; supplier 3 ships
    # outside the window and must not count
    t = pd.DataFrame({
        "l_suppkey": np.array([1, 1, 100002, 3], dtype=np.int64),
        "l_shipdate": pd.to_datetime([TS_LO, TS_LO, TS_LO, "1999-01-01"]),
        "l_extendedprice": [100.0, 200.0, 300.0, 999.0],
        "l_discount": [0.0, 0.0, 0.0, 0.0],
    })
    pq.write_table(pa.Table.from_pandas(t, preserve_index=False),
                   tmp_path / "lineitem.parquet")
    out = q_top_supplier(str(tmp_path))
    assert list(out.s_suppkey) == [1, 100002]
    assert list(out.total_rev) == [30000 * 100, 30000 * 100]

    # and on the real corpus the winner matches brute force
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        TS_HI,
    )
    li = li[(li.l_shipdate >= pd.Timestamp(TS_LO))
            & (li.l_shipdate < pd.Timestamp(TS_HI))]
    rev = (np.round(li.l_extendedprice.to_numpy() * 100).astype(np.int64)
           * (100 - np.round(li.l_discount.to_numpy() * 100)
              .astype(np.int64)))
    per = (pd.DataFrame({"k": li.l_suppkey, "rev": rev})
           .groupby("k").rev.sum())
    best = per.max()
    want = sorted(per[per == best].index)
    got = q_top_supplier(SF)
    assert list(got.s_suppkey) == want
    assert (got.total_rev == best).all()


# ------------------------------------------------ lang confusion audit
def test_lang_confusion_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
        textnorm as T,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import (
        q_lang_confusion,
    )
    out = q_lang_confusion(SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "text"]).to_pandas()
    want: dict[tuple[str, str], int] = {}
    for lang, t in zip(docs.lang, docs.text):
        k = (lang, T.detect_language_ocr(t.strip()))
        want[k] = want.get(k, 0) + 1
    got = {(r.lang, r.lang_pred): r.n for r in out.itertuples()}
    assert got == want
    # conservation: every doc lands in exactly one cell
    assert int(out.n.sum()) == len(docs)


# ------------------------------------------------ grouped quantiles
def test_lang_length_quantiles_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.textstats import (
        q_lang_length_quantiles,
    )
    out = q_lang_length_quantiles(SF).to_pandas().set_index("lang")
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["lang", "text"]).to_pandas()
    docs["n_tokens"] = [len(t.split()) for t in docs.text]
    for lang, g in docs.groupby("lang"):
        v = np.sort(g.n_tokens.to_numpy())
        n = len(v)
        row = out.loc[lang]
        assert row.n_docs == n
        assert row.p50_tokens == v[(n + 1) // 2 - 1]
        assert row.p90_tokens == v[(9 * n + 9) // 10 - 1]


# ------------------------------------------------ seasonality grid
def test_event_seasonality_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_event_seasonality,
    )
    out = q_event_seasonality(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    cents = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    want = pd.DataFrame({
        "t": ev.event_type, "d": ev.ts.dt.dayofweek + 1,
        "h": ev.ts.dt.hour, "c": cents}).groupby(
            ["t", "d", "h"]).agg(n=("c", "size"), v=("c", "sum"))
    assert len(out) == len(want)
    got = out.set_index(["event_type", "isodow", "hour"])
    for (t, d, h), row in want.iterrows():
        assert got.loc[(t, d, h)].n == row.n
        assert got.loc[(t, d, h)].value_cents == row.v
    assert int(out.n.sum()) == len(ev)
