"""CSV/JSONL round-trip pins (pipelines/altsource.py): shard layout,
idempotent re-use, and row preservation."""

from __future__ import annotations

import os

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_preserves_rows(ray_session) -> None:
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.altsource import (
        q_csv_source_stats,
    )
    df = q_csv_source_stats(SF).to_pandas()
    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert int(df.n_docs.sum()) == n


def test_jsonl_roundtrip_preserves_rows_and_reuses_shards(
        ray_session) -> None:
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.altsource import (
        _roundtrip_dir,
        q_jsonl_source_stats,
    )
    df = q_jsonl_source_stats(SF).to_pandas()
    n = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert int(df.n_docs.sum()) == n
    out = _roundtrip_dir(SF, "jsonl")
    shards = [f for f in os.listdir(out) if f.endswith(".json")]
    assert len(shards) >= 1            # per-block shard layout
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in shards}
    q_jsonl_source_stats(SF).to_pandas()   # second run: no rewrite
    assert mtimes == {f: os.path.getmtime(os.path.join(out, f))
                      for f in shards}
