"""HyperLogLog contract: merge semantics and error bound vs exact —
the checks SQL can't express for an approximate operator."""

import numpy as np
import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    sketch as SK,
)


def test_hll_register_merge_is_union():
    a = np.arange(0, 5000, dtype=np.int64)
    b = np.arange(2500, 9000, dtype=np.int64)
    merged = SK.hll_merge(SK.hll_registers(a), SK.hll_registers(b))
    union = SK.hll_registers(np.arange(0, 9000, dtype=np.int64))
    assert np.array_equal(merged, union)     # max-merge == sketch of union


def test_hll_estimate_error_across_scales():
    rng = np.random.RandomState(3)
    for n in (50, 500, 5_000, 200_000):
        keys = rng.randint(-2**62, 2**62, size=n * 3, dtype=np.int64)
        keys = np.unique(keys)[:n]
        est = SK.hll_estimate(SK.hll_registers(keys))
        err = abs(est - len(keys)) / len(keys)
        # p=12 → σ≈1.6%; 5% ≈ 3σ, and linear counting covers the small range
        assert err <= 0.05, (n, est, err)


def test_hll_partial_order_independent():
    keys = np.arange(10_000, dtype=np.int64)
    splits = np.array_split(keys, 7)
    regs = np.zeros(SK.HLL_M, dtype=np.uint8)
    for s in reversed(splits):
        regs = SK.hll_merge(regs, SK.hll_registers(s))
    assert SK.hll_estimate(regs) == SK.hll_estimate(SK.hll_registers(keys))


@pytest.mark.usefixtures("ray_session")
def test_hll_query_matches_exact_within_bound():
    import duckdb

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
        relational as R,
    )

    sf = "/root/testdata/sf0.001"
    out = R.q_events_hll_users(sf)
    exact = duckdb.sql(
        "SELECT event_type, COUNT(DISTINCT user_id) AS ex FROM "
        f"read_parquet('{sf}/events.parquet') GROUP BY 1").df()
    m = out.merge(exact, on="event_type")
    assert len(m) == len(out)
    assert ((m.approx_users - m.ex).abs() / m.ex <= 0.05).all(), m


@pytest.mark.usefixtures("ray_session")
def test_decontamination_invariants():
    """Eval docs with >=5 tokens must hit their own spans; hit counts are
    bounded by each doc's distinct span count."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
        textstats as T,
    )

    sf = "/root/testdata/sf0.001"
    out = T.q_decontamination(sf).to_pandas()
    docs = T._docs(sf).to_pandas().set_index("doc_id")["text"]
    toks = docs.str.lower().str.split().str.len().reindex(out.doc_id).to_numpy()
    ev = out.is_eval.to_numpy() == 1
    long_enough = toks >= 5
    assert (out.eval_ngrams_hit.to_numpy()[ev & long_enough] > 0).all()
    assert (out.eval_ngrams_hit >= 0).all()
    assert len(out) == len(docs)
