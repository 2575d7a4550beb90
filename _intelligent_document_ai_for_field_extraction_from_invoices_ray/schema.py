"""Arrow schemas for the interleaved-document engine (SURVEY.md §1.2).

Input table (BASELINE.json ``input_hint``):
    (doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)
A document MAY be split across several input rows (chunked ingest);
``offset`` is the global reading-order position within the document, which
is what makes the ``groupby(doc_id)`` + sort(offset) reassembly a semantic
requirement rather than a formality.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_TYPE = pa.struct([
    ("kind", pa.string()),        # 'text' | 'media'
    ("text", pa.string()),        # '' for media spans
    ("media_ref", pa.string()),   # '' for text spans
    ("offset", pa.int32()),       # reading-order position, unique per doc
])

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_TYPE)),
])

# exploded span-row layout produced by the recover (+normalize) stages.
# Deliberately minimal: per-span confidence is a pure function of
# (doc_id, offset) recomputed post-shuffle, and block language is dead
# metadata in the reference extractor — neither ships through the
# reassembly exchange.
SPAN_ROW_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
    ("norm_text", pa.string()),
])

BBOX = pa.list_(pa.float64())

# flat result row (ProcessingResult analog, executable.py:56-137)
RESULT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("dealer_name", pa.string()),
    ("dealer_name_confidence", pa.float64()),
    ("model_name", pa.string()),
    ("model_name_confidence", pa.float64()),
    ("horse_power", pa.float64()),
    ("horse_power_confidence", pa.float64()),
    ("asset_cost", pa.int64()),
    ("asset_cost_confidence", pa.float64()),
    ("signature_present", pa.bool_()),
    ("signature_bbox", BBOX),
    ("signature_confidence", pa.float64()),
    ("signature_iou", pa.float64()),
    ("stamp_present", pa.bool_()),
    ("stamp_bbox", BBOX),
    ("stamp_confidence", pa.float64()),
    ("stamp_iou", pa.float64()),
    ("overall_confidence", pa.float64()),
    ("status", pa.string()),
    ("error_message", pa.string()),
    # per-doc timing breakdown + cost estimate (executable.py:118-127,
    # 473-488) — wall-clock, excluded from oracle equality
    ("processing_time_ms", pa.float64()),
    ("ocr_time_ms", pa.float64()),
    ("extraction_time_ms", pa.float64()),
    ("detection_time_ms", pa.float64()),
    ("validation_time_ms", pa.float64()),
    ("cost_estimate_usd", pa.float64()),
    ("n_spans", pa.int32()),
    ("norm_spans", pa.list_(SPAN_TYPE)),   # THE invariant columns
])

GROUND_TRUTH_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("dealer_name", pa.string()),
    ("model_name", pa.string()),
    ("horse_power", pa.float64()),
    ("asset_cost", pa.float64()),
    ("signature_present", pa.bool_()),
    ("signature_bbox", BBOX),
    ("stamp_present", pa.bool_()),
    ("stamp_bbox", BBOX),
])
