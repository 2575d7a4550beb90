"""Corpus summary aggregation (reference A1, executable.py:596-681).

One pass over the result Dataset with per-batch partial counters merged on
the driver — the scalable replacement for the reference's driver-side list
comprehension over all results.  No shuffle: the partials are one tiny row
per batch.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd


def summarize_results(results: rd.Dataset) -> dict:
    def partial(batch: pa.Table) -> pd.DataFrame:
        cols = ["status", "overall_confidence", "dealer_name", "model_name",
                "horse_power", "asset_cost", "signature_present",
                "stamp_present"]
        has_timing = "processing_time_ms" in batch.column_names
        if has_timing:
            cols += ["processing_time_ms", "cost_estimate_usd"]
        df = batch.select(cols).to_pandas()
        ok = df[df.status == "success"]
        # `timed` counts successful rows that actually carry timing
        # columns: shards written before those columns existed (resume
        # across versions) must not poison the rollup with +/-inf
        timing = {
            "timed": len(ok) if has_timing else 0,
            "time_sum": float(ok.processing_time_ms.sum()) if has_timing else 0.0,
            "time_min": float(ok.processing_time_ms.min())
                        if has_timing and len(ok) else float("inf"),
            "time_max": float(ok.processing_time_ms.max())
                        if has_timing and len(ok) else float("-inf"),
            "cost_sum": float(ok.cost_estimate_usd.sum()) if has_timing else 0.0,
        }
        return pd.DataFrame([{
            **timing,
            "total": len(df),
            "successful": len(ok),
            "failed": len(df) - len(ok),
            "conf_sum": ok.overall_confidence.sum(),
            "conf_min": ok.overall_confidence.min() if len(ok) else 2.0,
            "conf_max": ok.overall_confidence.max() if len(ok) else -1.0,
            "high_conf": int((ok.overall_confidence >= 0.85).sum()),
            "med_conf": int(((ok.overall_confidence >= 0.65)
                             & (ok.overall_confidence < 0.85)).sum()),
            "low_conf": int((ok.overall_confidence < 0.65).sum()),
            "dealer_ok": int(ok.dealer_name.notna().sum()),
            "model_ok": int(ok.model_name.notna().sum()),
            "hp_ok": int(ok.horse_power.notna().sum()),
            "cost_ok": int(ok.asset_cost.notna().sum()),
            "sig": int(ok.signature_present.sum()),
            "stamp": int(ok.stamp_present.sum()),
        }])

    parts = results.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty or "total" not in parts.columns:
        # empty input (e.g. a fully-resumed rerun produced no new work)
        parts = partial(pa.Table.from_pylist([], schema=pa.schema([
            ("status", pa.string()), ("overall_confidence", pa.float64()),
            ("dealer_name", pa.string()), ("model_name", pa.string()),
            ("horse_power", pa.float64()), ("asset_cost", pa.int64()),
            ("signature_present", pa.bool_()), ("stamp_present", pa.bool_())])))
    total, succ = int(parts.total.sum()), int(parts.successful.sum())
    timed = int(parts.timed.sum()) if "timed" in parts.columns else 0
    summary = {
        "total_documents": total,
        "successful": succ,
        "failed": int(parts.failed.sum()),
        "success_rate": succ / total if total else 0.0,
        "confidence_stats": {
            "mean": float(parts.conf_sum.sum() / succ) if succ else 0.0,
            "min": float(parts.conf_min.min()) if succ else 0.0,
            "max": float(parts.conf_max.max()) if succ else 0.0,
            "high_count": int(parts.high_conf.sum()),
            "medium_count": int(parts.med_conf.sum()),
            "low_count": int(parts.low_conf.sum()),
        },
        "field_extraction_stats": {
            f: {"extracted": int(parts[c].sum()),
                "rate": float(parts[c].sum() / succ) if succ else 0.0}
            for f, c in [("dealer_name", "dealer_ok"), ("model_name", "model_ok"),
                         ("horse_power", "hp_ok"), ("asset_cost", "cost_ok")]
        },
        "signature_detection": {"detected": int(parts.sig.sum()),
                                "rate": float(parts.sig.sum() / succ) if succ else 0.0},
        "stamp_detection": {"detected": int(parts.stamp.sum()),
                            "rate": float(parts.stamp.sum() / succ) if succ else 0.0},
        # reference time/cost rollups (executable.py:646-667)
        "processing_time_stats": {
            "mean_ms": float(parts.time_sum.sum() / timed) if timed else 0.0,
            "min_ms": float(parts.time_min.min()) if timed else 0.0,
            "max_ms": float(parts.time_max.max()) if timed else 0.0,
            "total_sec": float(parts.time_sum.sum() / 1000.0),
        },
        "cost_stats": {
            "mean_usd": float(parts.cost_sum.sum() / timed) if timed else 0.0,
            "total_usd": float(parts.cost_sum.sum()),
        },
    }
    return summary


def summary_frame(results: rd.Dataset) -> pd.DataFrame:
    """Flat single-row integer view (driver-friendly)."""
    s = summarize_results(results)
    return pd.DataFrame([{
        "total_documents": s["total_documents"],
        "successful": s["successful"],
        "failed": s["failed"],
        "high_count": s["confidence_stats"]["high_count"],
        "medium_count": s["confidence_stats"]["medium_count"],
        "low_count": s["confidence_stats"]["low_count"],
        "dealer_extracted": s["field_extraction_stats"]["dealer_name"]["extracted"],
        "model_extracted": s["field_extraction_stats"]["model_name"]["extracted"],
        "hp_extracted": s["field_extraction_stats"]["horse_power"]["extracted"],
        "cost_extracted": s["field_extraction_stats"]["asset_cost"]["extracted"],
        "signature_detected": s["signature_detection"]["detected"],
        "stamp_detected": s["stamp_detection"]["detected"],
    }])
