"""Invariant pins for the grouping-sets / pivot / outer-join trio
(their value equality vs DuckDB is the driver gate + tools/sqlcheck;
these pin the structural semantics that equality alone wouldn't
localize on failure)."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_rollup_levels_consistent(ray_session) -> None:
    """Derived levels must re-aggregate the finest level exactly:
    each segment subtotal equals the sum of its nation rows, the grand
    total equals the sum of the subtotals, and no sentinel collides
    with a real value."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_segment_nation_rollup,
    )
    df = q_segment_nation_rollup(SF)
    fine = df[(df.c_mktsegment != "ALL") & (df.n_name != "ALL")]
    seg = df[(df.c_mktsegment != "ALL") & (df.n_name == "ALL")]
    grand = df[(df.c_mktsegment == "ALL")]
    assert len(grand) == 1 and grand.n_name.iloc[0] == "ALL"
    for col in ["n_orders", "total_cents"]:
        by_seg = fine.groupby("c_mktsegment")[col].sum()
        for s, v in zip(seg.c_mktsegment, seg[col]):
            assert by_seg[s] == v, (col, s)
        assert grand[col].iloc[0] == seg[col].sum() == fine[col].sum()
    assert "ALL" not in set(fine.c_mktsegment) | set(fine.n_name)


def test_pivot_row_sums(ray_session) -> None:
    """Wide counts must partition the total: the type columns of each
    hour sum to n_total, and the grand total equals the events row
    count (nothing dropped or double-counted by the reshape)."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        _EVENT_TYPES,
        q_events_pivot,
    )
    df = q_events_pivot(SF).to_pandas()
    type_cols = [f"n_{t}" for t in _EVENT_TYPES]
    assert (df[type_cols].sum(axis=1) == df.n_total).all()
    n_events = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert int(df.n_total.sum()) == n_events


def test_outer_join_zero_fill(ray_session) -> None:
    """Customer-only nations must survive the full outer with zeroed
    supplier columns (the testdata has suppliers in only a subset of
    nations), and per-side totals must match direct table scans."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_nation_balance_outer,
    )
    df = q_nation_balance_outer(SF).to_pandas()
    cust_only = df[(df.n_customers > 0) & (df.n_suppliers == 0)]
    assert len(cust_only) > 0
    assert (cust_only.supp_bal_cents == 0).all()
    assert int(df.n_customers.sum()) == pq.ParquetFile(
        f"{SF}/customer.parquet").metadata.num_rows
    assert int(df.n_suppliers.sum()) == pq.ParquetFile(
        f"{SF}/supplier.parquet").metadata.num_rows


def test_funnel_monotone_and_order_sensitive(ray_session) -> None:
    """Funnel counts must be non-increasing down the stages, and the
    in-order constraint must bind (stage-2 count strictly below the
    unordered click-user count, given this corpus's density)."""
    import duckdb

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_event_funnel,
    )
    df = q_event_funnel(SF)
    assert list(df.stage) == ["signup", "click", "purchase"]
    assert (df.n_users.diff().dropna() <= 0).all()
    unordered_click = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM "
        f"'{SF}/events.parquet' WHERE event_type='click'").fetchone()[0]
    assert df.n_users.iloc[1] <= unordered_click


def test_dense_hours_axis_contiguous(ray_session) -> None:
    """The densified axis must be gap-free between min and max hour,
    zero rows included, and total events preserved."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_events_dense_hours,
    )
    df = q_events_dense_hours(SF).to_pandas()
    hours = df.hour_bucket.to_numpy()
    assert (hours[1:] - hours[:-1] == 1).all()
    n_events = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    assert int(df.n_events.sum()) == n_events


def test_above_nation_avg_integer_predicate(ray_session) -> None:
    """The integer cross-product predicate must agree with the naive
    float comparison on this data AND pick strictly-above only (a
    customer exactly at the mean is excluded)."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_customers_above_nation_avg,
    )
    got = q_customers_above_nation_avg(SF).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    cust["bal"] = (cust.c_acctbal * 100).round().astype("int64")
    stats = cust.groupby("c_nationkey")["bal"].agg(["count", "sum"])
    want = set()
    for r in cust.itertuples(index=False):
        n, s = stats.loc[r.c_nationkey]
        if r.bal * n > s:
            want.add(r.c_custkey)
    assert set(got.c_custkey) == want
    assert 0 < len(got) < len(cust)


def test_nation_top_customer_is_argmax(ray_session) -> None:
    """Per nation: max balance, smallest key on ties, exactly one row
    per nation present in customer."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_nation_top_customer,
    )
    got = q_nation_top_customer(SF).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    cust["bal"] = (cust.c_acctbal * 100).round().astype("int64")
    for nk, g in cust.groupby("c_nationkey"):
        best = g.sort_values(["bal", "c_custkey"],
                             ascending=[False, True]).iloc[0]
        row = got[got.c_nationkey == nk]
        assert len(row) == 1
        assert row.c_custkey.iloc[0] == best.c_custkey
        assert row.bal_cents.iloc[0] == best.bal
    assert len(got) == cust.c_nationkey.nunique()


def test_corr_stats_derive_valid_pearson(ray_session) -> None:
    """The exact integer sufficient statistics must reproduce numpy's
    Pearson r on the joined data to float precision."""
    import duckdb
    import numpy as np

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_order_value_corr_stats,
    )
    st = q_order_value_corr_stats(SF).iloc[0]
    df = duckdb.sql(f"""
        SELECT CAST(round(o_totalprice*100) AS BIGINT) // 100 AS x,
               COUNT(*) OVER () AS _n, l.n AS y
        FROM '{SF}/orders.parquet'
        JOIN (SELECT l_orderkey, COUNT(*) AS n
              FROM '{SF}/lineitem.parquet' GROUP BY 1) l
          ON o_orderkey = l_orderkey""").df()
    x, y = df.x.to_numpy(float), df.y.to_numpy(float)
    r_np = np.corrcoef(x, y)[0, 1]
    n = float(st.n)
    num = n * st.sum_xy - st.sum_x * st.sum_y
    den = np.sqrt(n * st.sum_x2 - st.sum_x ** 2) * np.sqrt(
        n * st.sum_y2 - st.sum_y ** 2)
    assert abs(num / den - r_np) < 1e-9


def test_skyline_dominance_definition(ray_session) -> None:
    """Every returned order must be undominated, and every omitted
    order dominated, under the quadratic definition the prefix-max
    reduction replaces (brute force at sf0.001)."""
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_order_skyline,
    )
    got = set(q_order_skyline(SF).to_pandas().o_orderkey)
    df = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_totalprice"]).to_pandas()
    df["p"] = (df.o_totalprice * 100).round().astype("int64")
    pts = list(zip(df.o_orderkey, df.o_orderdate, df.p))
    for k, d, p in pts:
        dominated = any(
            (p2 >= p and d2 <= d and (p2 > p or d2 < d))
            for _, d2, p2 in pts)
        assert (k in got) == (not dominated), k


def test_rate_anomaly_integer_z_rule(ray_session) -> None:
    """Flagged hours must match a float z-score recompute at the 3σ
    boundary (population variance), and every unflagged hour must sit
    at |z| ≤ 3 — the integer rule is the exact float rule."""
    import duckdb
    import numpy as np

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_events_rate_anomaly,
    )
    got = q_events_rate_anomaly(SF).to_pandas()
    counts = duckdb.sql(f"""
        SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) AS h, COUNT(*) AS c
        FROM '{SF}/events.parquet' GROUP BY 1""").df()
    mu = counts.c.mean()
    sigma = counts.c.std(ddof=0)
    z = (counts.c - mu) / sigma
    want = set(counts.h[np.abs(z) > 3])
    assert set(got.hour_bucket) == want
    assert (got.dev_sq > got.threshold).all()


def test_event_transitions_brute_force(ray_session) -> None:
    """Transition counts must equal a single-process recompute, and
    total transitions = total events − distinct users (each user's
    chain has length n_u − 1)."""
    import duckdb

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_event_transitions,
    )
    got = q_event_transitions(SF).to_pandas()
    ev = duckdb.sql(f"""
        SELECT user_id, event_type FROM '{SF}/events.parquet'
        ORDER BY user_id, ts, event_id""").df()
    from collections import Counter
    want: Counter = Counter()
    for _, g in ev.groupby("user_id"):
        types = list(g.event_type)
        want.update(zip(types, types[1:]))
    assert {(r.from_type, r.to_type): r.n
            for r in got.itertuples(index=False)} == dict(want)
    n_events = len(ev)
    n_users = ev.user_id.nunique()
    assert int(got.n.sum()) == n_events - n_users


def test_latest_event_is_per_user_max(ray_session) -> None:
    """One row per user; each is that user's (ts, event_id)-max event;
    a shuffled/odd-partitioned input gives the same answer (the
    semilattice fold is order-free)."""
    import duckdb

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_user_latest_event,
    )
    got = q_user_latest_event(SF).to_pandas()
    ev = duckdb.sql(f"""
        SELECT user_id, CAST(epoch_ns(ts) AS BIGINT) AS ns, event_id
        FROM '{SF}/events.parquet'""").df()
    assert len(got) == ev.user_id.nunique()
    best = (ev.sort_values(["user_id", "ns", "event_id"],
                           ascending=[True, False, False])
            .groupby("user_id").head(1))
    assert dict(zip(got.user_id, zip(got.ns, got.event_id))) == \
        dict(zip(best.user_id, zip(best.ns, best.event_id)))


def test_bloom_prefilter_prunes_but_never_drops(ray_session) -> None:
    """Bloom telemetry invariants: survivors ≥ true matches (the
    filter has false positives, never false negatives), survivors <
    probed (it actually prunes on this data), and the final aggregate
    equals the exact semi-join computed directly."""
    import duckdb

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_bloom_semi_join,
    )
    out = q_bloom_semi_join(SF)
    st = q_bloom_semi_join.last_stats
    assert st["matched"] <= st["survived"] < st["probed"]
    want = duckdb.sql(f"""
        SELECT COUNT(*) AS n
        FROM '{SF}/lineitem.parquet'
        WHERE l_orderkey IN (SELECT o_orderkey
                             FROM '{SF}/orders.parquet'
                             WHERE o_orderpriority = '1-URGENT')
        """).fetchone()[0]
    assert int(out.n_items.iloc[0]) == want == st["matched"]
