"""Structural pins for the mining bank (value equality vs DuckDB is the
driver gate; these localize the semantics equality alone wouldn't)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _events() -> pd.DataFrame:
    return pq.read_table(f"{SF}/events.parquet").to_pandas()


def test_pit_join_containment(ray_session) -> None:
    """Every matched fact's timestamp falls inside its dimension
    interval (brute-force interval rebuild), unmatched facts precede
    the user's first dimension version, and every odd event appears
    exactly once."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.mining import (
        q_events_pit_join,
    )
    out = q_events_pit_join(SF).to_pandas()
    ev = _events()
    ev["es"] = ev.ts.astype("datetime64[ns]").astype("int64") // 10**9
    facts = ev[ev.event_id % 2 == 1]
    assert sorted(out.event_id) == sorted(facts.event_id)

    dims = ev[ev.event_id % 2 == 0].sort_values(["ts", "event_id"])
    for u, g in dims.groupby("user_id"):
        runs = (g.event_type != g.event_type.shift()).cumsum()
        iv = g.groupby(runs).agg(ty=("event_type", "first"),
                                 frm=("es", "min"))
        iv["to"] = iv.frm.shift(-1).fillna(-1).astype(np.int64)
        sub = out[out.user_id == u]
        for r in sub.itertuples():
            hit = iv[(iv.frm <= r.fact_ts_s) &
                     ((iv.to == -1) | (r.fact_ts_s < iv.to))]
            if len(hit):
                assert r.dim_type == hit.ty.iloc[0]
            else:
                assert pd.isna(r.dim_type)
                assert pd.isna(r.dim_island)


def test_value_outliers_bounds(ray_session) -> None:
    """Quartiles ordered, fence counts strictly inside n, and the exact
    inverted-CDF ranks agree with a brute-force sorted lookup."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.mining import (
        q_value_outliers,
    )
    df = q_value_outliers(SF)
    assert (df.q1_cents <= df.q3_cents).all()
    assert (df.n_low + df.n_high < df.n_events).all()
    ev = _events()
    ev["c"] = np.round(ev.value.to_numpy() * 100).astype(np.int64)
    for r in df.itertuples():
        v = np.sort(ev.loc[ev.event_type == r.event_type, "c"].to_numpy())
        n = len(v)
        assert n == r.n_events
        assert v[(n + 3) // 4 - 1] == r.q1_cents
        assert v[(3 * n + 3) // 4 - 1] == r.q3_cents
        assert int((2 * v < 5 * r.q1_cents - 3 * r.q3_cents).sum()) == r.n_low
        assert int((2 * v > 5 * r.q3_cents - 3 * r.q1_cents).sum()) == r.n_high


def test_l_diversity_vs_k_anonymity(ray_session) -> None:
    """l <= group size, group sizes sum to |customer|, and a group can
    meet k=8 while failing l=3 (the audit's reason to exist) — checked
    against a brute-force pandas recount."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.mining import (
        q_l_diversity,
    )
    df = q_l_diversity(SF)
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    assert int(df.n_rows.sum()) == len(cust)
    assert (df.l_distinct <= df.n_rows).all()
    cust["sens"] = (np.round(cust.c_acctbal.to_numpy() * 100)
                    .astype(np.int64) // 100_000)
    truth = cust.groupby(["c_mktsegment", "c_nationkey"]).sens.nunique()
    for r in df.itertuples():
        assert truth[(r.segment, r.nationkey)] == r.l_distinct


def test_count_min_point_queries(ray_session) -> None:
    """CMS invariants: every row sums to the total token count, the
    point estimate never undercounts, and the measured overcount stays
    within 4*eps*N for the 30 most frequent tokens (eps = e/w)."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.mining import (
        _CM_D, _CM_W, cm_point_query, q_count_min,
    )
    sk = q_count_min(SF)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["text"]).to_pandas()
    toks: list[str] = []
    for t in docs.text:
        toks.extend(t.split())
    n_total = len(toks)
    per_row = sk.groupby("sketch_row").cnt.sum()
    assert len(per_row) == _CM_D
    assert (per_row == n_total).all()

    truth = pd.Series(toks).value_counts()
    eps_n = int(np.ceil(np.e / _CM_W * n_total))
    for tok, cnt in truth.head(30).items():
        est = cm_point_query(sk, tok)
        assert est >= cnt
        assert est - cnt <= 4 * eps_n
