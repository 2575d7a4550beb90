"""Low-confidence fallback branch: the T3 "VLM fallback" analog.

The reference routes low-confidence documents through a Qwen2.5-VL model
(utils/vlm_fallback.py); no VLM runs in this sandbox, so the fallback
extractor is the *normalizer scalar bank* (a genuinely different second
opinion: utils/normalizer.py:279-362 patterns over the concatenated doc
text, vs the extractor's per-block candidate machinery) — the plumbing
that matters is reproduced faithfully:

- trigger predicate  ≙ should_use_vlm_fallback (vlm_fallback.py:410-438):
  overall_confidence < 0.7 OR ≥2 critical fields missing/low(<0.6)
- branch split       ≙ ds.filter + union of the two branches (SURVEY T3):
  the expensive model pool only ever sees the low-confidence slice
- merge policies     ≙ merge_results (vlm_fallback.py:441-507):
  fill-missing @0.8 / agreement-boost ×1.25 cap 0.95 / higher-conf-wins,
  then mean-of-present-confidences overall
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import textnorm as T

CRITICAL = ("dealer_name", "model_name", "horse_power", "asset_cost")
FALLBACK_CONFIDENCE = 0.8


def needs_fallback_row(row: dict,
                       confidence_threshold: float = 0.7,
                       min_fields_threshold: int = 2) -> bool:
    """Trigger predicate over a flat result row (vlm_fallback.py:410-438)."""
    if row.get("overall_confidence", 0.0) < confidence_threshold:
        return True
    low = sum(
        1 for f in CRITICAL
        if row.get(f) is None or row.get(f + "_confidence", 0.0) < 0.6
    )
    return low >= min_fields_threshold


def _scalar_bank_extract(text: str) -> dict:
    """Default second opinion: the normalizer scalar bank (a genuinely
    different extractor family than the per-block candidate machinery)."""
    numbers = T.extract_numbers(text)
    return {"dealer_name": None,          # the scalar bank has no dealer op
            "model_name": T.extract_model_name(text),
            "horse_power": T.extract_horse_power(text),
            "asset_cost": next((int(round(n)) for n in numbers
                                if 50_000 <= n <= 5_000_000), None)}


class FallbackExtractor:
    """Actor-pool second-opinion extractor over the reassembled doc text.

    Stands in for the VLM worker (model load once per actor; here the
    normalizer scalar bank is the 'model').  Consumes flat result rows
    that still carry ``norm_spans`` and emits the merged rows."""

    def __init__(self, vlm_confidence: float = FALLBACK_CONFIDENCE,
                 extract_fn=None):
        """``extract_fn(text) -> {dealer_name, model_name, horse_power,
        asset_cost}`` is the pluggable second-opinion extractor — the
        ``create_llm_extraction_prompt`` extension surface of the
        reference (extractor.py:653-714): a user plugs a prompt-driven
        LLM/VLM callable here and the branch/merge plumbing is reused
        unchanged.  Default: the normalizer scalar bank."""
        self.vlm_confidence = vlm_confidence
        self.extract_fn = extract_fn or _scalar_bank_extract

    def _second_opinion(self, norm_spans: list[dict]) -> dict:
        text = " ".join(s["text"] for s in norm_spans if s["kind"] == "text")
        return self.extract_fn(text)

    def _merge_field(self, row: dict, field: str, alt_value) -> None:
        """merge_results policies for one field (vlm_fallback.py:459-490)."""
        rule_value = row[field]
        rule_conf = row[field + "_confidence"]
        if rule_value is None and alt_value is not None:
            row[field] = alt_value
            row[field + "_confidence"] = self.vlm_confidence
            row[field + "_source"] = "fallback_fill"
        elif rule_value is not None and alt_value is not None:
            rule_norm = str(rule_value).lower().replace(" ", "")
            alt_norm = str(alt_value).lower().replace(" ", "")
            if rule_norm == alt_norm or alt_norm in rule_norm or rule_norm in alt_norm:
                row[field + "_confidence"] = min(rule_conf * 1.25, 0.95)
                row[field + "_source"] = "rule+fallback_confirmed"
            elif self.vlm_confidence > rule_conf:
                row[field] = alt_value
                row[field + "_confidence"] = self.vlm_confidence
                row[field + "_source"] = "fallback_override"

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        out_rows = []
        for row in batch.to_pylist():
            alt = self._second_opinion(row.get("norm_spans") or [])
            for f in CRITICAL:
                row.setdefault(f + "_source", "rule")
                self._merge_field(row, f, alt[f])
            confs = [row[f + "_confidence"] for f in CRITICAL
                     if row[f] is not None]
            if confs:
                row["overall_confidence"] = sum(confs) / len(confs)
            row.pop("norm_spans", None)
            out_rows.append(row)
        return pd.DataFrame(out_rows)


def with_fallback(results: rd.Dataset,
                  confidence_threshold: float = 0.7,
                  concurrency: int = 2, batch_size: int = 256,
                  extract_fn=None) -> rd.Dataset:
    """Split → fallback-extract the low slice on an actor pool → union.

    ``results`` must carry ``norm_spans`` (emit_norm_spans=True)."""

    def is_low(batch: pa.Table) -> pa.Table:
        import numpy as np

        mask = np.array([needs_fallback_row(r, confidence_threshold)
                         for r in batch.to_pylist()])
        return batch.append_column("_low", pa.array(mask))

    # Materialize the tag point: consuming one Dataset from two branches
    # re-executes the whole upstream per branch (doubling its actor pools —
    # a deadlock on small CPU budgets).  At real scale the equivalent
    # checkpoint is the shard sink the pipeline already writes
    # (output_dir + load_results), from which both branches re-read.
    tagged = results.map_batches(is_low, batch_format="pyarrow").materialize()

    def keep(low: bool):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            m = batch.column("_low")
            if not low:
                m = pc.invert(m)
            return batch.filter(m).drop_columns(["_low"])
        return fn

    high = tagged.map_batches(keep(False), batch_format="pyarrow")

    def finalize_high(batch: pa.Table) -> pa.Table:
        cols = [c for c in batch.column_names if c != "norm_spans"]
        batch = batch.select(cols)
        for f in CRITICAL:   # align schema with the fallback branch
            batch = batch.append_column(
                f + "_source", pa.array(["rule"] * batch.num_rows))
        return batch

    high = high.map_batches(finalize_high, batch_format="pyarrow")
    low = (tagged.map_batches(keep(True), batch_format="pyarrow")
           .map_batches(FallbackExtractor, batch_format="pyarrow",
                        batch_size=batch_size, concurrency=concurrency,
                        fn_constructor_kwargs={"extract_fn": extract_fn}))
    return high.union(low)
