"""q_source_quota: absolute per-source quota capping.

Pins the combiner property the scale shape relies on (per-batch cap then
per-bucket cap == global cap, i.e. the cap is a semilattice that commutes
with union) and the full Ray-vs-DuckDB equality on a skewed corpus where
sources straddle many small row groups."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
    textstats as T,
)


@pytest.fixture(scope="module")
def quota_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("quota_sf")
    rng = np.random.RandomState(3)
    n = 600
    # heavy skew: source 'hot' holds half the corpus; some sources are
    # UNDER the cap (kept whole); tiny row groups force each source to
    # straddle many batches so the per-batch partial cap actually engages
    sources = ["hot"] * 300 + [f"s{i % 7}" for i in range(280)] + ["rare"] * 20
    rng.shuffle(sources)
    pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": ["token " * 5] * n,
        "source": sources,
    }).to_parquet(d / "documents.parquet", row_group_size=16)
    return str(d)


def test_source_quota_matches_oracle(ray_session, quota_sf):
    got = T.q_source_quota(quota_sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{quota_sf}/documents.parquet')")
    exp = con.execute(T.SQL_SOURCE_QUOTA).df()
    got = got[exp.columns.tolist()]
    pd.testing.assert_frame_equal(got, exp)
    counts = got.groupby("source").size()
    assert counts["hot"] == T.QUOTA_CAP          # capped
    assert counts["rare"] == T.QUOTA_CAP         # exactly at cap (20 > 15)
    assert counts.max() <= T.QUOTA_CAP
