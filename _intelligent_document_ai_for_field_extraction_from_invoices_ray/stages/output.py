"""Required-format JSON projection (M19, executable.py:102-137).

Maps flat result rows to the reference's nested ``to_json_output``
structure with its exact rounding conventions: confidences ``round(4)``,
processing time ``round(2)``, IoU ``round(4) if iou else None`` (the
reference's falsy check — an IoU of exactly 0.0 renders as null, a quirk
preserved here).
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa

import ray.data as rd


def row_to_json_output(row: dict) -> dict:
    def field(name):
        return {"value": row.get(name),
                "confidence": round(row.get(f"{name}_confidence", 0.0), 4)}

    def binary(name):
        iou = row.get(f"{name}_iou")
        return {"present": bool(row.get(f"{name}_present", False)),
                "bbox": row.get(f"{name}_bbox"),
                "confidence": round(row.get(f"{name}_confidence", 0.0), 4),
                "iou": round(iou, 4) if iou else None}

    return {
        "document_id": row["doc_id"],
        "dealer_name": field("dealer_name"),
        "model_name": field("model_name"),
        "horse_power": field("horse_power"),
        "asset_cost": field("asset_cost"),
        "signature": binary("signature"),
        "stamp": binary("stamp"),
        "overall_confidence": round(row.get("overall_confidence", 0.0), 4),
        "processing_time_ms": round(row.get("processing_time_ms", 0.0), 2),
        "status": row.get("status"),
    }


def format_json_output(results: rd.Dataset) -> rd.Dataset:
    """(doc_id, json) rows in the required output format."""

    def fmt(batch: pa.Table) -> pd.DataFrame:
        rows = batch.to_pylist()
        return pd.DataFrame({
            "doc_id": [r["doc_id"] for r in rows],
            "json": [json.dumps(row_to_json_output(r), ensure_ascii=False,
                                sort_keys=True)
                     for r in rows],
        })

    return results.map_batches(fmt, batch_format="pyarrow")


def write_json_output(results: rd.Dataset, out_dir: str) -> None:
    """output.json analog as a partitioned JSON directory sink."""
    format_json_output(results).write_json(out_dir)
