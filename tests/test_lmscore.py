"""Char-bigram LM surprisal scoring."""

from __future__ import annotations

import duckdb
import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_matches_oracle_bit_for_bit(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.lmscore import (
        SQL_LM_SURPRISAL,
        q_lm_surprisal,
    )

    got = q_lm_surprisal(SF).to_pandas()
    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{SF}/documents.parquet"))
    want = con.execute(SQL_LM_SURPRISAL).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col]) == list(want[col]), col


def test_model_fit_is_exact_and_bounded(ray_session) -> None:
    import pyarrow as pa
    import ray.data as rd

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.lmscore import (
        fit_bigram_model,
    )

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2], type=pa.int64()),
        "text": pa.array(["abab", "ba", "x"]),
    })
    model, total = fit_bigram_model(rd.from_arrow(docs).repartition(3))
    # "abab" -> ab, ba, ab ; "ba" -> ba ; "x" -> none
    assert model == {"ab": 2, "ba": 2}
    assert total == 4


def test_lm_tier_matches_oracle(ray_session) -> None:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.lmscore import (
        SQL_LM_TIER,
        q_lm_tier,
    )

    got = q_lm_tier(SF).to_pandas()
    con = duckdb.connect()
    con.register("documents", pq.read_table(f"{SF}/documents.parquet"))
    want = con.execute(SQL_LM_TIER).df()
    assert len(got) == len(want) > 0
    for col in got.columns:
        assert list(got[col]) == list(want[col]), col


def test_lm_tier_semantics(ray_session) -> None:
    """Tiers are ordered by rate (head <= middle <= tail), cover ~1/3
    each up to threshold ties, and empty docs land in 'empty'."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.lmscore import (
        q_lm_tier,
    )

    df = q_lm_tier(SF).to_pandas()
    scored = df[df["tier"] != "empty"]
    n = len(scored)
    assert n > 0
    h = scored[scored.tier == "head"]["rate_milli"]
    m = scored[scored.tier == "middle"]["rate_milli"]
    t = scored[scored.tier == "tail"]["rate_milli"]
    if len(h) and len(m):
        assert h.max() < m.min()
    if len(m) and len(t):
        assert m.max() < t.min()
    # head holds at least its tertile (ties only ever grow the better tier)
    assert len(h) >= (n + 2) // 3
    assert (df[df["rate_milli"] == -1]["tier"] == "empty").all()


def test_surprisal_semantics(ray_session) -> None:
    """Rarer bigrams must score higher; the score is the exact sum of
    per-term floor(100*ln(total/count)+0.5) centinats."""
    import pyarrow as pa
    import ray.data as rd

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.lmscore import (
        fit_bigram_model,
    )

    docs = pa.table({
        "doc_id": pa.array(list(range(10)), type=pa.int64()),
        "text": pa.array(["cc"] + ["cd"] * 9),
    })
    model, total = fit_bigram_model(rd.from_arrow(docs))
    assert (model, total) == ({"cc": 1, "cd": 9}, 10)
    rare = int(np.floor(100 * np.log(10 / 1) + 0.5))
    common = int(np.floor(100 * np.log(10 / 9) + 0.5))
    assert rare > common
    assert rare == 230 and common == 11  # ln10=2.302..., ln(10/9)=0.105...
