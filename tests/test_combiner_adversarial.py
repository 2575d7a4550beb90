"""Adversarial tie inputs for the per-batch semilattice combiners.

``q_top_orders`` / ``q_events_top3_per_type`` / ``q_distinct_flags`` keep
only a few rows per batch before a tiny merge.  That is only correct when
the per-batch cut and the global merge use the SAME total order — with
value ties the tie-break column (the unique id) carries the proof.  The
sf corpora have essentially no exact price ties, so this pins the tie
case explicitly: every value identical, many batches, compared against
the module's own oracle SQL on the same parquet files.
"""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
    relational as R,
)


@pytest.fixture(scope="module")
def tie_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("tie_sf")
    rng = np.random.RandomState(7)
    n = 20_000                      # >> one block, so partials really merge
    keys = rng.permutation(n).astype(np.int64)
    pd.DataFrame({
        "o_orderkey": keys,
        "o_custkey": rng.randint(0, 500, n).astype(np.int64),
        "o_totalprice": np.full(n, 123.45),          # every price ties
    }).to_parquet(d / "orders.parquet", row_group_size=1000)
    pd.DataFrame({
        "event_id": keys,
        "event_type": rng.choice(["click", "view", "buy"], n),
        "value": np.full(n, 9.99),                   # every value ties
    }).to_parquet(d / "events.parquet", row_group_size=1000)
    pd.DataFrame({
        "l_returnflag": rng.choice(["A", "N", "R"], n),
        "l_linestatus": rng.choice(["F", "O"], n),
    }).to_parquet(d / "lineitem.parquet", row_group_size=1000)
    return str(d)


def _oracle(sf_dir: str, sql: str, tables=("orders", "events", "lineitem")):
    con = duckdb.connect()
    for t in tables:
        p = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


@pytest.mark.usefixtures("ray_session")
def test_top_orders_all_ties(tie_sf):
    got = _canon(q_to_pandas(R.q_top_orders(tie_sf)))
    want = _canon(_oracle(tie_sf, R.SQL_TOP_ORDERS))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_events_top3_all_ties(tie_sf):
    got = _canon(q_to_pandas(R.q_events_top3_per_type(tie_sf)))
    want = _canon(_oracle(tie_sf, R.SQL_EVENTS_TOP3))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_distinct_flags_all_ties(tie_sf):
    got = _canon(q_to_pandas(R.q_distinct_flags(tie_sf)))
    want = _canon(_oracle(tie_sf, R.SQL_DISTINCT_FLAGS))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def q_to_pandas(r):
    return r.to_pandas() if hasattr(r, "to_pandas") and not isinstance(
        r, pd.DataFrame) else r
