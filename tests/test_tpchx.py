"""Structural pins for the TPC-H completion bank (value equality vs
DuckDB is the driver gate; these localize the semantics the hash alone
wouldn't — argmax tie-breaks, EXISTS boundaries, global-threshold
conservation, unique-holder correlation)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _li(cols):
    return pq.read_table(f"{SF}/lineitem.parquet", columns=cols).to_pandas()


# ------------------------------------------------ Q2 argmax tie-break
def test_min_bal_supplier_is_true_argmax(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.tpchx import (
        Q2_SIZE_HI,
        Q2_SIZE_LO,
        Q2_TYPE,
        q_min_bal_supplier,
    )
    out = q_min_bal_supplier(SF).to_pandas()
    part = pq.read_table(f"{SF}/part.parquet").to_pandas()
    supp = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    pairs = _li(["l_partkey", "l_suppkey"]).drop_duplicates()
    bal = dict(zip(supp.s_suppkey, np.round(supp.s_acctbal * 100).astype(np.int64)))
    keep = part[(part.p_type == Q2_TYPE)
                & part.p_size.between(Q2_SIZE_LO, Q2_SIZE_HI)]
    assert set(out.p_partkey) == set(keep.p_partkey) & set(pairs.l_partkey)
    for _, row in out.iterrows():
        sks = sorted(pairs.l_suppkey[pairs.l_partkey == row.p_partkey])
        best = max(bal[s] for s in sks)
        # argmax value is the max; tie-break is the SMALLEST suppkey
        assert row.best_bal_cents == best
        assert row.best_suppkey == min(s for s in sks if bal[s] == best)


# ------------------------------------------------ Q4 EXISTS boundary
def test_priority_waiting_strict_inequality(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.tpchx import (
        Q4_HI,
        Q4_LO,
        q_priority_waiting,
    )
    out = q_priority_waiting(SF)
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    li = _li(["l_orderkey", "l_shipdate"])
    mx = li.groupby("l_orderkey").l_shipdate.max()
    w = orders[(orders.o_orderdate >= pd.Timestamp(Q4_LO))
               & (orders.o_orderdate < pd.Timestamp(Q4_HI))].copy()
    # strictly-after semantics: shipdate == orderdate must NOT count
    late = w.o_orderkey.map(mx) > w.o_orderdate
    exp = w[late].groupby("o_orderpriority").size()
    got = dict(zip(out.o_orderpriority, out.order_count))
    assert got == exp.to_dict()


# --------------------------------------- Q11 global-threshold boundary
def test_important_parts_threshold_and_conservation(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.tpchx import (
        Q11_MEAN_MULT,
        q_important_parts,
    )
    out = q_important_parts(SF).to_pandas()
    assert len(out)
    total = None
    # reconstruct the nation-filtered per-part values brute-force
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.tpchx import (
        Q11_NATION,
    )
    nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    supp = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    nk = int(nat.n_nationkey[nat.n_name == Q11_NATION].iloc[0])
    sks = set(supp.s_suppkey[supp.s_nationkey == nk])
    li = _li(["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
    li = li[li.l_suppkey.isin(sks)]
    v = (np.round(li.l_extendedprice * 100).astype(np.int64)
         * (100 - np.round(li.l_discount * 100).astype(np.int64)))
    per = v.groupby(li.l_partkey).sum()
    total, n_parts = int(per.sum()), len(per)
    exp = per[per * n_parts > Q11_MEAN_MULT * total]
    assert dict(zip(out.l_partkey, out.value_scaled)) == exp.to_dict()
    # every returned part is strictly above MULT x the global mean
    assert (out.value_scaled.to_numpy() * n_parts
            > Q11_MEAN_MULT * total).all()


# ------------------------------------------------ Q18 HAVING boundary
def test_large_orders_threshold_strict(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.tpchx import (
        Q18_MIN_QTY,
        q_large_orders,
    )
    out = q_large_orders(SF).to_pandas()
    li = _li(["l_orderkey", "l_quantity"])
    sums = li.groupby("l_orderkey").l_quantity.sum().astype(np.int64)
    exp = sums[sums > Q18_MIN_QTY]
    assert dict(zip(out.o_orderkey, out.total_qty)) == exp.to_dict()
    if len(out):
        assert out.total_qty.min() > Q18_MIN_QTY


# --------------------------------------- Q16 distinct-count brute force
def test_supplier_cnt_brute_force(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.tpchx import (
        Q16_EXCL_TYPE,
        Q16_SIZES,
        q_supplier_cnt,
    )
    out = q_supplier_cnt(SF).to_pandas()
    part = pq.read_table(f"{SF}/part.parquet").to_pandas()
    supp = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    bad = set(supp.s_suppkey[supp.s_acctbal < 0])
    pairs = _li(["l_partkey", "l_suppkey"]).drop_duplicates()
    pairs = pairs[~pairs.l_suppkey.isin(bad)]
    m = pairs.merge(part, left_on="l_partkey", right_on="p_partkey")
    m = m[(m.p_type != Q16_EXCL_TYPE) & m.p_size.isin(Q16_SIZES)]
    exp = (m.groupby(["p_brand", "p_type", "p_size"]).l_suppkey.nunique())
    got = {(r.p_brand, r.p_type, r.p_size): r.supplier_cnt
           for r in out.itertuples()}
    assert got == exp.to_dict()


# ---------------------------------------- Q21 unique-holder correlation
def test_waiting_suppliers_unique_holder(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.tpchx import (
        q_waiting_suppliers,
    )
    out = q_waiting_suppliers(SF)
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    fkeys = set(orders.o_orderkey[orders.o_orderstatus == "F"])
    li = _li(["l_orderkey", "l_suppkey", "l_shipdate"])
    li = li[li.l_orderkey.isin(fkeys)]
    counts: dict[int, int] = {}
    for ok, g in li.groupby("l_orderkey"):
        if g.l_suppkey.nunique() < 2:
            continue  # single-supplier orders never qualify
        holders = set(g.l_suppkey[g.l_shipdate == g.l_shipdate.max()])
        if len(holders) == 1:  # the max must be held by ONE supplier
            sk = next(iter(holders))
            counts[sk] = counts.get(sk, 0) + 1
    assert dict(zip(out.s_suppkey, out.numwait)) == counts


def test_fulfillment_lag_quantiles_bruteforce(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.tpchx import (
        q_fulfillment_lag_quantiles,
    )
    out = q_fulfillment_lag_quantiles(SF).set_index("o_orderpriority")
    li = _li(["l_orderkey", "l_shipdate"])
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    sd = (li.l_shipdate.astype("datetime64[ns]").astype("int64")
          // 10**9 // 86400)
    mx = sd.groupby(li.l_orderkey).max()
    od = (orders.o_orderdate.astype("datetime64[ns]").astype("int64")
          // 10**9 // 86400)
    lag = orders.o_orderkey.map(mx) - od
    keep = lag.notna()
    d = pd.DataFrame({"pri": orders.o_orderpriority[keep],
                      "lag": lag[keep].astype(np.int64)})
    for pri, g in d.groupby("pri"):
        v = np.sort(g.lag.to_numpy())
        n = len(v)
        row = out.loc[pri]
        assert row.n_orders == n
        assert row.p50_days == v[(n + 1) // 2 - 1]
        assert row.p90_days == v[(9 * n + 9) // 10 - 1]
        assert row.p99_days == v[(99 * n + 99) // 100 - 1]
