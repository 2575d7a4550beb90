"""auto_join planner: both paths must produce identical rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
    relational as R,
)


def _tables():
    rng = np.random.RandomState(2)
    big = pd.DataFrame({"k": rng.randint(0, 50, 5000),
                        "v": rng.randint(0, 1000, 5000)})
    small = pd.DataFrame({"sk": np.arange(0, 40),       # keys 40-49 unmatched
                          "name": [f"dim{i}" for i in range(40)]})
    return big, small


def _ds(df):
    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)
                         .replace_schema_metadata(None))


def _canon(df):
    return (df[sorted(df.columns)].sort_values(sorted(df.columns))
            .reset_index(drop=True))


@pytest.mark.usefixtures("ray_session")
def test_auto_join_paths_agree(monkeypatch):
    big, small = _tables()
    want = _canon(big.merge(small.rename(columns={"sk": "k"}), on="k"))

    bcast = _canon(R.auto_join(_ds(big), _ds(small), "k", "sk").to_pandas())
    pd.testing.assert_frame_equal(bcast, want)

    monkeypatch.setattr(R, "BROADCAST_ROW_LIMIT", 10)   # force the shuffle
    shuffled = R.auto_join(_ds(big), _ds(small), "k", "sk").to_pandas()
    shuffled = _canon(shuffled.rename(columns={"sk": "k2"})
                      .drop(columns=["k2"]))
    pd.testing.assert_frame_equal(shuffled, want)


@pytest.mark.usefixtures("ray_session")
def test_segment_sales_routes_through_auto_join(monkeypatch):
    """q_segment_sales joins a SCALING dimension (customer), so it must
    obey the auto_join guard: with the broadcast limit forced to 0 the
    bucketed hash-join path must produce the identical aggregate."""
    sf = "/root/testdata/sf0.001"
    base = R.q_segment_sales(sf)
    monkeypatch.setattr(R, "BROADCAST_ROW_LIMIT", 0)
    shuffled = R.q_segment_sales(sf)
    pd.testing.assert_frame_equal(base, shuffled)
