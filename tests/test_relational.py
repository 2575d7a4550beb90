"""Incremental-view-maintenance pin: the micro-batch path must be
bit-equal to the batch aggregate (value equality vs DuckDB is the
driver gate; this localizes a merge bug to the incremental machinery)."""

from __future__ import annotations

import pandas as pd


def test_events_hourly_incremental_equals_batch(ray_session) -> None:
    """The three-micro-batch merged view is bit-equal to the one-shot
    batch aggregate."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.relational import (
        q_events_hourly,
        q_events_hourly_incremental,
    )
    sf = "/root/testdata/sf0.001"
    inc = q_events_hourly_incremental(sf).to_pandas()
    bat = q_events_hourly(sf).to_pandas()
    pd.testing.assert_frame_equal(inc.reset_index(drop=True),
                                  bat.reset_index(drop=True))
