"""Invariant pins for the analytics bank (value equality vs DuckDB is
the driver gate + tools/sqlcheck; these pin the structural semantics
that equality alone wouldn't localize on failure) and for bfs_hops."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_parts_coordered_bounds(ray_session) -> None:
    """Pairs are canonical (a<b), counts >= 2, ordering deterministic,
    and a brute-force pandas recount agrees on the returned pairs."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_parts_coordered,
    )
    df = q_parts_coordered(SF)
    assert (df.part_a < df.part_b).all()
    assert (df.n_orders >= 2).all()
    assert len(df) <= 100
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    d = li.drop_duplicates()
    m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
    m = m[m.l_partkey_a < m.l_partkey_b]
    truth = m.groupby(["l_partkey_a", "l_partkey_b"]).size()
    for r in df.itertuples():
        assert truth[(r.part_a, r.part_b)] == r.n_orders


def test_event_gaps_nonnegative_and_counts(ray_session) -> None:
    """Gaps are non-negative (sorted timeline), n_gaps = n_events-1 for
    every user present, max <= sum."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_event_gaps,
    )
    df = q_event_gaps(SF).to_pandas()
    assert (df.max_gap_s >= 0).all()
    assert (df.sum_gap_s >= df.max_gap_s).all()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id"]).to_pandas()
    per_user = ev.groupby("user_id").size()
    for r in df.itertuples():
        assert r.n_gaps == per_user[r.user_id] - 1


def test_user_scd2_partitions_timeline(ray_session) -> None:
    """Intervals tile each user's timeline: island ordinals are 1..k,
    consecutive intervals differ in event_type, interval n_events sum to
    the user's event count, and valid_to of island i == valid_from of
    island i+1 (-1 only on the last)."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_user_scd2,
    )
    df = q_user_scd2(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id"]).to_pandas()
    per_user = ev.groupby("user_id").size()
    for uid, g in df.groupby("user_id"):
        g = g.sort_values("island")
        assert list(g.island) == list(range(1, len(g) + 1))
        assert g.n_events.sum() == per_user[uid]
        assert (g.event_type.to_numpy()[1:]
                != g.event_type.to_numpy()[:-1]).all()
        assert (g.valid_to_s.to_numpy()[:-1]
                == g.valid_from_s.to_numpy()[1:]).all()
        assert g.valid_to_s.iloc[-1] == -1


def test_customer_quartiles_exact_ntile(ray_session) -> None:
    """Quartile sizes follow NTILE semantics (first n%4 tiles one
    larger) and the assignment is monotone in (bal, custkey)."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_customer_quartiles,
    )
    df = q_customer_quartiles(SF).to_pandas()
    n = len(df)
    sizes = df.quartile.value_counts().sort_index()
    size, rem = divmod(n, 4)
    expected = [size + 1] * rem + [size] * (4 - rem)
    assert list(sizes) == [e for e in expected if e > 0]
    ordered = df.sort_values(["bal_cents", "c_custkey"])
    assert (np.diff(ordered.quartile.to_numpy()) >= 0).all()


def test_nation_top_names_order(ray_session) -> None:
    """Each nation's list is its top-3 by (balance desc, custkey) —
    recomputed brute-force from the customer table."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_nation_top_names,
    )
    df = q_nation_top_names(SF)
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    nat = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    cust["bal_cents"] = np.round(cust.c_acctbal * 100).astype(np.int64)
    cust = cust.sort_values(["bal_cents", "c_custkey"],
                            ascending=[False, True])
    for r in df.itertuples():
        nk = int(nat.loc[nat.n_name == r.n_name, "n_nationkey"].iloc[0])
        want = ",".join(cust[cust.c_nationkey == nk].c_name.head(3))
        assert r.top_names == want


def test_doc_sentences_reconstruct(ray_session) -> None:
    """Explode is lossless: indices are a prefix-free enumeration and
    lengths are consistent with the pieces."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_doc_sentences,
    )
    df = q_doc_sentences(SF).to_pandas()
    assert (df.sent_len == df.sent.str.len()).all()
    assert (df.sent_len > 0).all()
    # ordinals strictly increase within a doc (gaps allowed: empty pieces)
    for _d, g in df.groupby("doc_id"):
        idx = g.sort_values("sent_idx").sent_idx.to_numpy()
        assert (np.diff(idx) > 0).all()


def test_weighted_sample_is_bottom_k(ray_session) -> None:
    """The 20 kept docs are exactly the globally smallest priorities —
    recomputed brute-force over the whole table."""
    import hashlib

    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_weighted_sample,
    )
    df = q_weighted_sample(SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "n_chars"]).to_pandas()
    hv = np.array([int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
                   for d in docs.doc_id], dtype=np.int64)
    docs["prio"] = hv.astype(np.float64) / docs.n_chars.to_numpy(np.float64)
    want = docs.sort_values(["prio", "doc_id"]).head(20)
    assert list(df.doc_id) == list(want.doc_id)


def test_k_anonymity_covers_all_rows(ray_session) -> None:
    """Group sizes sum to the table row count; flag matches cnt >= 8."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_k_anonymity,
    )
    df = q_k_anonymity(SF)
    n = pq.ParquetFile(f"{SF}/customer.parquet").metadata.num_rows
    assert int(df.cnt.sum()) == n
    assert (df.k_anonymous == (df.cnt >= 8).astype(np.int64)).all()


def test_bfs_hops_frontier_correct(ray_session) -> None:
    """Distributed BFS equals a brute-force single-process BFS (set
    expansion) over the same closed-form graph, including min-hop
    labels; seeds all get hop 0."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.graph import (
        BFS_HOPS,
        BFS_SOURCE_MOD,
        _targets,
        q_bfs_hops,
    )
    df = q_bfs_hops(SF).to_pandas()
    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    dist: dict[int, int] = {u: 0 for u in range(0, n, BFS_SOURCE_MOD)}
    frontier = list(dist)
    for k in range(BFS_HOPS):
        nxt = []
        _, dst, _deg = _targets(np.array(frontier, dtype=np.int64), n)
        for v in dst.tolist():
            if v not in dist:
                dist[v] = k + 1
                nxt.append(v)
        frontier = nxt
    want = pd.DataFrame(sorted(dist.items()), columns=["node", "hop"])
    assert list(df.node) == list(want.node)
    assert list(df.hop) == list(want.hop)


def test_regional_revenue_matches_bruteforce(ray_session) -> None:
    """The three-cogroup Q5 join equals a single-process pandas join at
    sf0.001, and output is revenue-descending over the region's nations."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        REV_FROM,
        REV_REGION,
        REV_TO,
        q_regional_revenue,
    )
    df = q_regional_revenue(SF)
    assert list(df.revenue_scaled) == sorted(df.revenue_scaled,
                                             reverse=True)
    t = {n: pq.read_table(f"{SF}/{n}.parquet").to_pandas()
         for n in ["customer", "orders", "lineitem", "supplier",
                   "nation", "region"]}
    rk = t["region"].loc[t["region"].r_name == REV_REGION,
                         "r_regionkey"].iloc[0]
    nat = t["nation"][t["nation"].n_regionkey == rk]
    o = t["orders"]
    o = o[(o.o_orderdate >= np.datetime64(REV_FROM))
          & (o.o_orderdate < np.datetime64(REV_TO))]
    m = (t["lineitem"].merge(o, left_on="l_orderkey", right_on="o_orderkey")
         .merge(t["customer"], left_on="o_custkey", right_on="c_custkey")
         .merge(t["supplier"], left_on="l_suppkey", right_on="s_suppkey"))
    m = m[m.c_nationkey == m.s_nationkey]
    m = m.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    rev = (np.round(m.l_extendedprice * 100).astype(np.int64)
           * (100 - np.round(m.l_discount * 100).astype(np.int64)))
    want = (m.assign(rev=rev).groupby("n_name").rev.agg(["sum", "size"])
            .sort_values(["sum"], ascending=False))
    assert list(df.n_name) == list(want.index)
    assert list(df.revenue_scaled) == list(want["sum"])
    assert list(df.n_items) == list(want["size"])


def test_orders_moving_sum_frame_semantics(ray_session) -> None:
    """One row per order; the moving sum includes the current row
    (>= price), is capped by 3 rows, and a brute-force per-customer
    rolling recompute agrees."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_orders_moving_sum,
    )
    df = q_orders_moving_sum(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    assert len(df) == len(orders)
    assert (df.moving3_cents >= df.price_cents).all()
    o = orders.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    o["price_cents"] = np.round(o.o_totalprice * 100).astype(np.int64)
    want = (o.groupby("o_custkey").price_cents
            .rolling(3, min_periods=1).sum()
            .reset_index(level=0, drop=True).astype(np.int64))
    o["moving3_cents"] = want
    merged = df.merge(o[["o_orderkey", "moving3_cents"]],
                      on="o_orderkey", suffixes=("", "_want"))
    assert (merged.moving3_cents == merged.moving3_cents_want).all()


def test_session_overlap_conservation(ray_session) -> None:
    """Hour buckets are contiguous-bounded by the event time range, every
    count >= 1, and total session-hours equal a single-process
    sessionize-and-expand recompute."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_session_overlap,
    )
    df = q_session_overlap(SF).to_pandas()
    assert (df.n_sessions >= 1).all()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ns = ev.ts.astype("datetime64[ns]").astype("int64")
    brk = (ev.user_id != ev.user_id.shift()) | \
          (ns - ns.shift() > 30 * 60 * 1_000_000_000)
    sid = brk.cumsum()
    sess = pd.DataFrame({"sid": sid, "ns": ns}).groupby("sid").ns.agg(
        ["min", "max"])
    h0 = (sess["min"] // 1_000_000_000) // 3600
    h1 = (sess["max"] // 1_000_000_000) // 3600
    want_total = int((h1 - h0 + 1).sum())
    assert int(df.n_sessions.sum()) == want_total
    assert df.hour_bucket.min() == h0.min() and df.hour_bucket.max() == h1.max()


def test_snapshot_diff_classification(ray_session) -> None:
    """'added' rows have a null old_type, 'changed' rows differ, users
    are unique, and no user outside the diff actually changed (full
    complement check against a brute-force recompute)."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_snapshot_diff,
    )
    df = q_snapshot_diff(SF).to_pandas()
    assert df.user_id.is_unique
    added = df[df.change == "added"]
    changed = df[df.change == "changed"]
    assert len(added) + len(changed) == len(df)
    assert added.old_type.isna().all()
    assert (changed.old_type != changed.new_type).all()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    es = ev.ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000
    cutoff = (int(es.min()) + int(es.max())) // 2
    new = ev.groupby("user_id").event_type.last()
    old = ev[es <= cutoff].groupby("user_id").event_type.last()
    want = new.to_frame("new_type").join(old.to_frame("old_type"), how="left")
    want = want[want.old_type.isna() | (want.old_type != want.new_type)]
    assert sorted(df.user_id) == sorted(want.index)


def test_cohort_retention_distinct_exact(ray_session) -> None:
    """Offset 0 of every cohort counts exactly its cohort size, cell
    counts never exceed the cohort size, and a brute-force pandas
    recompute agrees cell-for-cell."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_cohort_retention,
    )
    df = q_cohort_retention(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    day = (ev.ts.astype("datetime64[ns]").astype("int64")
           // 1_000_000_000) // 86400
    d = pd.DataFrame({"user_id": ev.user_id, "day": day}).drop_duplicates()
    first = d.groupby("user_id").day.transform("min")
    want = (pd.DataFrame({"cohort_day": first, "day_offset": d.day - first})
            .groupby(["cohort_day", "day_offset"]).size()
            .rename("n_users").reset_index()
            .sort_values(["cohort_day", "day_offset"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(df.reset_index(drop=True), want,
                                  check_dtype=False)
    sizes = df[df.day_offset == 0].set_index("cohort_day").n_users
    merged = df.join(sizes.rename("cohort_size"), on="cohort_day")
    assert (merged.n_users <= merged.cohort_size).all()


def test_events_daily_ohlc_semilattice(ray_session) -> None:
    """low <= open/close <= high, counts conserve the event count, and a
    single-process recompute agrees (including the argmin/argmax-by-time
    open/close under the (ts, event_id) tie-break)."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_events_daily_ohlc,
    )
    df = q_events_daily_ohlc(SF).to_pandas()
    assert (df.low_cents <= df.open_cents).all()
    assert (df.low_cents <= df.close_cents).all()
    assert (df.high_cents >= df.open_cents).all()
    assert (df.high_cents >= df.close_cents).all()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert df.n_events.sum() == len(ev)
    us = ev.ts.astype("datetime64[ns]").astype("int64") // 1_000
    d = pd.DataFrame({"event_type": ev.event_type,
                      "day": (us // 1_000_000) // 86400,
                      "us": us, "eid": ev.event_id,
                      "v": np.round(ev.value * 100).astype(np.int64)})
    d = d.sort_values(["event_type", "day", "us", "eid"])
    want = d.groupby(["event_type", "day"], as_index=False).agg(
        open_cents=("v", "first"), close_cents=("v", "last"),
        low_cents=("v", "min"), high_cents=("v", "max"),
        n_events=("v", "size"), value_cents=("v", "sum"))
    got = df[["event_type", "day", "open_cents", "close_cents",
              "low_cents", "high_cents", "n_events", "value_cents"]]
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_user_twap_integral(ray_session) -> None:
    """held_s telescopes to last-first per user, vdt is bounded by
    held_s x [min_v, max_v], and the TWAP lies within each user's value
    range; brute-force recompute agrees."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_user_twap,
    )
    df = q_user_twap(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    s = ev.ts.astype("datetime64[ns]").astype("int64") // 1_000_000_000
    v = np.round(ev.value * 100).astype(np.int64)
    d = pd.DataFrame({"user_id": ev.user_id, "s": s, "v": v})
    span = d.groupby("user_id").s.agg(["min", "max"])
    nxt = d.s.shift(-1)
    same = d.user_id == d.user_id.shift(-1)
    d["dt"] = np.where(same, nxt - d.s, np.nan)
    d = d[d.dt.notna()]
    d["dt"] = d.dt.astype(np.int64)
    want = d.assign(vdt=d.v * d.dt).groupby("user_id").agg(
        held_s=("dt", "sum"), vdt=("vdt", "sum"))
    want = want[want.held_s > 0]
    want["twap_cents"] = (2 * want.vdt + want.held_s) // (2 * want.held_s)
    assert list(df.user_id) == list(want.index)
    assert list(df.vdt) == list(want.vdt)
    assert list(df.twap_cents) == list(want.twap_cents)
    got_span = span.loc[df.user_id]
    assert (df.held_s.to_numpy()
            == (got_span["max"] - got_span["min"]).to_numpy()).all()
    vr = d.groupby("user_id").v.agg(["min", "max"]).loc[df.user_id]
    assert (df.twap_cents.to_numpy() >= vr["min"].to_numpy()).all()
    assert (df.twap_cents.to_numpy() <= vr["max"].to_numpy()).all()


def test_events_trailing_1h_range_frame(ray_session) -> None:
    """RANGE-frame semantics: every event's trailing sum includes itself
    and all same-second peers; a brute-force per-user O(n^2) recompute
    agrees exactly."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_events_trailing_1h,
    )
    df = q_events_trailing_1h(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert len(df) == len(ev)
    es = (ev.ts.astype("datetime64[ns]").astype("int64")
          // 1_000_000_000).to_numpy()
    v = np.round(ev.value * 100).astype(np.int64).to_numpy()
    uid = ev.user_id.to_numpy()
    want = {}
    for i in range(len(ev)):
        m = (uid == uid[i]) & (es >= es[i] - 3600) & (es <= es[i])
        want[int(ev.event_id.iloc[i])] = int(v[m].sum())
    got = dict(zip(df.event_id, df.trail_cents))
    assert got == want
    assert (df.trail_cents >= 0).all()


def test_user_top_type_mode(ray_session) -> None:
    """One row per user; the reported type has the user's max count and
    wins lexicographic ties (brute-force recount)."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_user_top_type,
    )
    df = q_user_top_type(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "event_type"]).to_pandas()
    assert df.user_id.is_unique
    assert set(df.user_id) == set(ev.user_id)
    counts = ev.groupby(["user_id", "event_type"]).size()
    for r in df.itertuples():
        per = counts[r.user_id]
        assert per[r.event_type] == r.n_events == per.max()
        assert r.event_type == min(per.index[per == per.max()])


def test_order_balance_audit_topk(ray_session) -> None:
    """diff = price - items for every returned order, the rows are the
    global top-100 by (|diff|, orderkey), and itemless orders audit at
    items_cents = 0."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_order_balance_audit,
    )
    df = q_order_balance_audit(SF)
    assert len(df) == 100
    assert (df.diff_cents == df.price_cents - df.items_cents).all()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_totalprice"]).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_extendedprice"]).to_pandas()
    items = (np.round(li.l_extendedprice * 100).astype(np.int64)
             .groupby(li.l_orderkey).sum())
    o["item_c"] = o.o_orderkey.map(items).fillna(0).astype(np.int64)
    o["diff"] = (np.round(o.o_totalprice * 100).astype(np.int64)
                 - o["item_c"])
    o["_a"] = o["diff"].abs()
    want = o.sort_values(["_a", "o_orderkey"],
                         ascending=[False, True]).head(100)
    assert list(df.o_orderkey) == list(want.o_orderkey)
    assert list(df.diff_cents) == list(want["diff"])


def test_brand_type_cube_consistency(ray_session) -> None:
    """All four grouping sets are present and internally consistent:
    per-brand rows sum to (brand, ALL), per-type to (ALL, type), and
    both marginals to the grand total."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_brand_type_cube,
    )
    df = q_brand_type_cube(SF)
    fine = df[(df.p_brand != "ALL") & (df.p_type != "ALL")]
    b = df[(df.p_brand != "ALL") & (df.p_type == "ALL")]
    t = df[(df.p_brand == "ALL") & (df.p_type != "ALL")]
    g = df[(df.p_brand == "ALL") & (df.p_type == "ALL")]
    assert len(g) == 1
    assert fine.n_parts.sum() == b.n_parts.sum() == t.n_parts.sum() \
        == g.n_parts.iloc[0]
    fb = fine.groupby("p_brand").retail_cents.sum()
    assert dict(zip(b.p_brand, b.retail_cents)) == fb.to_dict()
    ft = fine.groupby("p_type").retail_cents.sum()
    assert dict(zip(t.p_type, t.retail_cents)) == ft.to_dict()


def test_value_winsor_mean_bounds(ray_session) -> None:
    """Thresholds are actual data values with lo <= hi, the winsorized
    sum is between n*lo and n*hi, and a brute-force clamp agrees."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_value_winsor_mean,
    )
    r = q_value_winsor_mean(SF).iloc[0]
    v = np.round(pq.read_table(f"{SF}/events.parquet", columns=["value"])
                 .to_pandas().value * 100).astype(np.int64).to_numpy()
    assert r.lo_cents in v and r.hi_cents in v and r.lo_cents <= r.hi_cents
    n = len(v)
    vs = np.sort(v)
    assert r.lo_cents == vs[(n + 19) // 20 - 1]
    assert r.hi_cents == vs[(19 * n + 19) // 20 - 1]
    want = int(np.clip(v, r.lo_cents, r.hi_cents).sum())
    assert r.winsor_sum_cents == want
    assert r.n_events == n


def test_orders_profile_exact_ndv(ray_session) -> None:
    """Profile NDVs equal pandas nunique per column and n_rows is the
    table size everywhere."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_orders_profile,
    )
    df = q_orders_profile(SF)
    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    assert (df.n_rows == len(o)).all()
    assert (df.n_nulls == 0).all()
    got = dict(zip(df.col_name, df.n_distinct))
    assert got["o_orderkey"] == o.o_orderkey.nunique()
    assert got["o_custkey"] == o.o_custkey.nunique()
    assert got["o_orderstatus"] == o.o_orderstatus.nunique()
    assert got["o_orderpriority"] == o.o_orderpriority.nunique()
    assert got["o_orderdate"] == o.o_orderdate.nunique()
    assert got["o_totalprice"] == (
        np.round(o.o_totalprice * 100).astype(np.int64)).nunique()


def test_rolling_wau_exact_distinct(ray_session) -> None:
    """Every day's WAU equals a brute-force distinct count of users
    active in its trailing 7 days, and day 0's window equals its DAU."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_rolling_wau,
    )
    df = q_rolling_wau(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    day = (ev.ts.astype("datetime64[ns]").astype("int64")
           // 1_000_000_000) // 86400
    pairs = pd.DataFrame({"u": ev.user_id, "d": day}).drop_duplicates()
    for r in df.itertuples():
        want = pairs[(pairs.d >= r.day - 6) & (pairs.d <= r.day)].u.nunique()
        assert r.wau == want
    first = int(pairs.d.min())
    dau0 = pairs[pairs.d == first].u.nunique()
    assert int(df.loc[df.day == first, "wau"].iloc[0]) == dau0


def test_events_mad_exact(ray_session) -> None:
    """Median and MAD per type equal a brute-force sorted recompute with
    the same ceil(n/2) rank convention."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_events_mad,
    )
    df = q_events_mad(SF)
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    ev["c"] = np.round(ev.value * 100).astype(np.int64)
    for r in df.itertuples():
        vals = np.sort(ev.loc[ev.event_type == r.event_type, "c"].to_numpy())
        n = len(vals)
        assert r.n_events == n
        med = int(vals[(n + 1) // 2 - 1])
        assert r.median_cents == med
        dev = np.sort(np.abs(vals - med))
        assert r.mad_cents == int(dev[(n + 1) // 2 - 1])


def test_order_allocation_conserves_totals(ray_session) -> None:
    """Every order's allocations sum exactly to its header cents, each
    allocation is base or base+1, and larger-remainder items get the
    extra cent first."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_order_allocation,
    )
    df = q_order_allocation(SF).to_pandas()
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderkey", "o_totalprice"]).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_linenumber",
                                "l_extendedprice"]).to_pandas()
    assert len(df) == len(li)
    price = dict(zip(o.o_orderkey,
                     np.round(o.o_totalprice * 100).astype(np.int64)))
    sums = df.groupby("l_orderkey").alloc_cents.sum()
    for ok, s in sums.items():
        assert s == price[ok]
    # multiset equality per order vs a brute-force largest-remainder
    # recompute ((l_orderkey, l_linenumber) is NOT unique in the
    # synthetic lineitem, so row-level joins fan out; the allocation is
    # deterministic as a multiset)
    got = {k: sorted(g.alloc_cents) for k, g in df.groupby("l_orderkey")}
    for ok, g in li.groupby("l_orderkey"):
        ext = np.round(g.l_extendedprice * 100).astype(np.int64).to_numpy()
        p = price[ok]
        tot = ext.sum()
        base = p * ext // tot
        rem = p * ext % tot
        order = np.lexsort((g.l_linenumber.to_numpy(), -rem))
        alloc = base.copy()
        alloc[order[: p - base.sum()]] += 1
        assert got[ok] == sorted(alloc)


def test_event_percentile_cume_dist(ray_session) -> None:
    """Percentiles are monotone in value within a type, the max value of
    each type gets exactly 1000, and a brute-force count(<=v)//n agrees."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_event_percentile,
    )
    df = q_event_percentile(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "event_type", "value"]).to_pandas()
    assert len(df) == len(ev)
    ev["c"] = np.round(ev.value * 100).astype(np.int64)
    for t, g in ev.groupby("event_type"):
        vs = np.sort(g.c.to_numpy())
        n = len(vs)
        sub = df[df.event_type == t]
        want = dict(zip(
            g.event_id,
            (1000 * np.searchsorted(vs, g.c.to_numpy(), side="right")) // n))
        got = dict(zip(sub.event_id, sub.pctile_milli))
        assert got == want
        assert sub.loc[sub.value_cents == vs[-1], "pctile_milli"].eq(1000).all()


def test_events_interpolated_linear(ray_session) -> None:
    """Grid values at event seconds equal the event's value, values
    between observations lie within the segment's [min, max], and a
    brute-force per-user recompute agrees."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_events_interpolated,
    )
    df = q_events_interpolated(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["es"] = (ev.ts.astype("datetime64[ns]").astype("int64")
                // 1_000_000_000)
    ev["v"] = np.round(ev.value * 100).astype(np.int64)
    ee = ev.groupby(["user_id", "es"], as_index=False).v.last()
    for uid, g in ee.groupby("user_id"):
        es = g.es.to_numpy()
        v = g.v.to_numpy()
        sub = df[df.user_id == uid]
        h0, h1 = (es.min() + 3599) // 3600, es.max() // 3600
        assert list(sub.hour) == list(range(h0, h1 + 1))
        for r in sub.itertuples():
            gs = r.hour * 3600
            i = np.searchsorted(es, gs, side="right") - 1
            if i + 1 < len(es):
                t0, v0, t1, v1 = es[i], v[i], es[i + 1], v[i + 1]
                want = v0 + (v1 - v0) * (gs - t0) // (t1 - t0)
            else:
                want = v[i]
            assert r.value_interp_cents == want


def test_priority_gini_pairwise(ray_session) -> None:
    """The rank-weighted sum equals the brute-force sum of all pairwise
    absolute differences, and gini lies in [0, 1000)."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_priority_gini,
    )
    df = q_priority_gini(SF)
    o = pq.read_table(f"{SF}/orders.parquet",
                      columns=["o_orderpriority", "o_totalprice"]).to_pandas()
    o["c"] = np.round(o.o_totalprice * 100).astype(np.int64)
    for r in df.itertuples():
        x = o.loc[o.o_orderpriority == r.o_orderpriority, "c"].to_numpy()
        assert r.n_orders == len(x)
        # the rank-weighted sum counts each unordered pair once; the
        # brute-force ordered-pair sum is exactly twice that
        assert 2 * r.absdiff_cents == int(np.abs(x[:, None] - x[None, :]).sum())
        assert 0 <= r.gini_milli < 1000


def test_zorder_layout_locality(ray_session) -> None:
    """Zone-map property: every block's (user, cents) extremes must
    bound the rows mapped to it by an independent Morton recomputation,
    and block populations must conserve the corpus."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.analytics import (
        q_zorder_layout,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/events.parquet",
                      columns=["user_id", "value"])
    uid = t.column("user_id").to_numpy().astype(np.int64)
    cents = np.floor(t.column("value").to_numpy() * 100.0).astype(np.int64)
    x = uid % 65536
    y = ((cents % 65536) + 65536) % 65536
    z = np.zeros(len(uid), dtype=np.int64)
    for i in range(16):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    zb = z >> 20

    got = q_zorder_layout(sf)
    assert int(got.n_events.sum()) == len(uid)
    for _, row in got.iterrows():
        m = zb == row.zblock
        assert m.sum() == row.n_events
        assert uid[m].min() == row.min_user and uid[m].max() == row.max_user
        assert cents[m].min() == row.min_cents
        assert cents[m].max() == row.max_cents


def test_late_events_bruteforce_replay(ray_session) -> None:
    """Engine per-type lateness equals a single-process replay of the
    same synthetic arrival permutation (catches carry-in/prefix-max
    mistakes the SQL oracle shares only if both replay identically)."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
        analytics as A,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/events.parquet",
                      columns=["event_id", "ts", "event_type"])
    eid = t.column("event_id").to_numpy()
    n = len(eid)
    es = t.column("ts").to_numpy().astype("datetime64[ns]").astype(
        np.int64) // 1_000_000_000
    typ = t.column("event_type").to_pylist()
    arr = (eid.astype(np.int64) * A._LATE_MULT) % n
    order = np.lexsort((eid, arr))
    agg: dict[str, list] = {}
    wm = None
    for i in order:
        e = agg.setdefault(typ[i], [0, 0, 0])
        e[0] += 1
        if wm is not None and es[i] + A.LATE_WM_S < wm:
            e[1] += 1
            e[2] = max(e[2], int(wm - A.LATE_WM_S - es[i]))
        wm = int(es[i]) if wm is None else max(wm, int(es[i]))

    got = A.q_late_events(sf).set_index("event_type")
    assert len(got) == len(agg)
    for k, (ne, nl, ml) in agg.items():
        assert got.loc[k, "n_events"] == ne, k
        assert got.loc[k, "n_late"] == nl, k
        assert got.loc[k, "max_lateness_s"] == ml, k
    assert int(got["n_late"].sum()) > 0   # the permutation makes lateness real


def test_type_trend_exact_ols(ray_session) -> None:
    """Sufficient-stats slope equals numpy lstsq on the same (x, y)
    within float tolerance, and the integer identities hold exactly."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
        analytics as A,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/events.parquet",
                      columns=["ts", "value", "event_type"]).to_pandas()
    es = t.ts.astype("datetime64[ns]").astype(np.int64) // 1_000_000_000
    base = int(es.min())
    x = ((es - base) // 3600).to_numpy()
    y = np.floor(t.value.to_numpy() * 100.0).astype(np.int64)

    got = A.q_type_trend(sf).set_index("event_type")
    for typ in got.index:
        m = (t.event_type == typ).to_numpy()
        r = got.loc[typ]
        assert r.n_events == m.sum()
        assert r.sum_x == int(x[m].sum())
        assert r.sum_y == int(y[m].sum())
        assert r.sum_xy == int((x[m] * y[m]).sum())
        assert r.sum_xx == int((x[m] * x[m]).sum())
        slope_f = np.polyfit(x[m].astype(float), y[m].astype(float), 1)[0]
        assert abs(r.slope_micro / 1e6 - slope_f) < 1e-3


def test_value_quantile_sketch_rank_error(ray_session) -> None:
    """One-pass mergeable sketch: every reported quantile's value must
    sit within 1.5% rank error of its target rank in the EXACT sorted
    distribution (measured ~0.1%), and the compactor must conserve
    total weight."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
        analytics as A,
    )

    sf = "/root/testdata/sf0.01"
    got = A.q_value_quantile_sketch(sf)
    cents = np.sort(np.floor(
        pq.read_table(f"{sf}/events.parquet", columns=["value"])
        .column("value").to_numpy() * 100.0).astype(np.int64))
    n = len(cents)
    assert list(got.p_milli) == sorted(got.p_milli)
    for _, r in got.iterrows():
        lo = np.searchsorted(cents, r.est_cents, side="left")
        hi = np.searchsorted(cents, r.est_cents, side="right")
        target = (n * r.p_milli + 999) // 1000
        err = 0 if lo <= target <= hi else min(abs(lo - target),
                                               abs(hi - target))
        assert err / n <= 0.015, (r.p_milli, err / n)
    # compactor conserves weight and respects the cap
    vals = np.arange(10000, dtype=np.int64)
    c = A._qsk_compact(vals, np.ones(10000, dtype=np.int64))
    assert len(c) <= A._QSK_CAP
    assert int(c.w.sum()) == 10000
    assert (np.diff(c.v.to_numpy()) >= 0).all()
