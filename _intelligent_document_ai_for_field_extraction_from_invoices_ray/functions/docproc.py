"""Whole-document processing: the per-group function of the reassembly stage.

``process_document`` is THE shared semantic core: the Ray pipeline calls it
once per ``groupby(doc_id)`` group (after sorting by ``offset``), and the
oracle calls it per input document.  Both therefore produce identical
results by construction; pytest verifies the *plumbing* around it
(explode / shuffle / reassembly / ordering) against the oracle.

Pipeline step parity with the reference's per-document flow
(executable.py:218-407):
  1. span recovery ≙ OCR word emission (ocr.py:275-300); empty-text spans
     dropped (the reference computes but never applies min-confidence —
     ocr.py:273-281 — replicated: only the empty-text filter exists)
  2. inline block normalization (executable.py:271-281: normalized_text is
     just ``text.lower()`` in the main path)
  3. rule-based field extraction (extractor.py:143-185)
  4. media classification ≙ signature/stamp detection (detector.py:318-394)
  5. validation (validator.py:340-368)
  6. flat result row ≙ ProcessingResult (executable.py:56-137)

The invariant columns ``norm_spans`` carry the *fully* normalized span
sequence (normalizer.py:153-208 chain incl. PII masking) in reading order:
``(kind, text, media_ref, order)`` equality vs the oracle is the per-row
correctness contract from BASELINE.json.
"""

from __future__ import annotations

from time import perf_counter
from zlib import crc32

from . import detect as D
from . import fieldex as F
from . import textnorm as T
from . import validate as VA
from . import vocab as V

NO_TEXT_ERROR = "No text extracted from document"


def span_confidence(doc_id: str, offset: int) -> float:
    """Deterministic per-span OCR-style confidence in [0.70, 0.98]."""
    h = crc32(f"{doc_id}|{offset}".encode("utf-8"))
    return 0.70 + (h % 29) / 100.0


def span_bbox(offset: int, text: str) -> list[float]:
    """Deterministic reading-order layout box (one span per line)."""
    y1 = float(30 + (offset * 22) % (V.MEDIA_PAGE_H - 60))
    x1 = 40.0
    return [x1, y1, x1 + 8.0 * max(1, len(text)), y1 + 18.0]


def sort_spans(spans: list[dict]) -> list[dict]:
    """Reading order: offset ascending (ties impossible by contract;
    break by kind then text for total determinism anyway)."""
    return sorted(spans, key=lambda s: (s["offset"], s["kind"], s["text"], s["media_ref"]))


def normalized_span_sequence(spans_sorted: list[dict], memo: dict | None = None) -> list[dict]:
    """The invariant span sequence: empty-text spans dropped, text spans
    carry the fully-normalized text, media spans pass through.

    Spans may carry a precomputed ``norm_text`` (set by the pipeline's
    vectorized normalize stage); absent that, it is computed here — both
    paths call the same ``textnorm.normalize_text``, so results are equal
    by construction.
    """
    if memo is None:
        memo = {}
    out = []
    for s in spans_sorted:
        if s["kind"] == "media":
            out.append({"kind": "media", "text": "", "media_ref": s["media_ref"],
                        "offset": s["offset"]})
        else:
            if not s["text"].strip():
                continue
            norm = s.get("norm_text")
            if norm is None:
                norm = memo.get(s["text"])
                if norm is None:
                    norm = T.normalize_text(s["text"])
                    memo[s["text"]] = norm
            out.append({"kind": "text", "text": norm, "media_ref": "",
                        "offset": s["offset"]})
    return out


def media_detections(spans_sorted: list[dict], model: D.MediaModel) -> list[dict]:
    """Gated detections in reading order.

    Prefers per-span precomputed fields ``det_class``/``det_conf``/
    ``det_bbox`` (set by the actor-pool classify stage; ``det_class=''``
    marks a span suppressed by the confidence/area gates), falling back to
    running the model inline (oracle path).
    """
    dets: list[dict] = []
    for s in spans_sorted:
        if s["kind"] != "media":
            continue
        if "det_class" in s:
            if s["det_class"]:
                bbox = list(s["det_bbox"])
                dets.append({"media_ref": s["media_ref"], "class_name": s["det_class"],
                             "confidence": s["det_conf"], "bbox": bbox,
                             "area": (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])})
        else:
            dets.extend(model.predict([s["media_ref"]]))
    return dets


def process_document(doc_id: str,
                     spans: list[dict],
                     ground_truth: dict | None = None,
                     dealer_master: list[str] | None = None,
                     model_master: set[str] | None = None,
                     rulebook: VA.RuleBook | None = None,
                     media_model: D.MediaModel | None = None,
                     norm_memo: dict | None = None,
                     use_gpu: bool = False) -> dict:
    """spans: dicts with keys (kind, text, media_ref, offset), any order.

    Emits the reference's per-document timing breakdown and cost estimate
    (executable.py:118-127, 473-488): ocr ≙ span recovery+normalize,
    then extraction / detection / validation; cost = total_sec ×
    ($0.10/hr GPU else $0.01/hr CPU)/3600.  Wall-clock values are
    inherently non-deterministic — excluded from oracle equality."""
    t0 = perf_counter()
    spans_sorted = sort_spans(spans)
    norm_spans = normalized_span_sequence(spans_sorted, memo=norm_memo)

    raw_blocks = []
    for s in spans_sorted:
        if s["kind"] != "media":
            text = s["text"].strip()
            if not text:
                continue
            raw_blocks.append({
                "text": text,
                "normalized_text": text.lower(),     # executable.py:277 main path
                "bbox": span_bbox(s["offset"], text),
                "confidence": s.get("confidence") if s.get("confidence") is not None
                              else span_confidence(doc_id, s["offset"]),
                # block-level language is metadata the extractor never reads
                # (reference parity: ocr.py:295 computes it, extractor
                # ignores it); the normalize stage / lang_id operator supply
                # it when wanted, so the per-doc path does not pay for it
                "language": s.get("language", "unknown"),
            })

    t_ocr = perf_counter()

    base = {
        "doc_id": doc_id,
        "n_spans": len(spans),
        "norm_spans": norm_spans,
    }

    if not raw_blocks:
        # reference raises -> failed row (executable.py:263-264, 374-407):
        # elapsed time recorded, cost pinned to 0.0 (executable.py:403-404)
        timing = _timing_row((t_ocr - t0) * 1000.0, 0.0, 0.0, 0.0, use_gpu)
        timing["cost_estimate_usd"] = 0.0
        return {**base, **_empty_fields_row(), "status": "failed",
                "error_message": NO_TEXT_ERROR, **timing}

    extracted = F.extract_fields(raw_blocks, dealer_master, model_master,
                                 memo=norm_memo)
    t_extract = perf_counter()

    gt_boxes = None
    if ground_truth is not None:
        gt_boxes = {"signature": ground_truth.get("signature_bbox"),
                    "stamp": ground_truth.get("stamp_bbox")}
    dets = media_detections(spans_sorted, media_model or D.MediaModel())
    detection = D.summarize_detections(D.nms(dets), gt_boxes)
    extracted["signature"] = detection["signature"]
    extracted["stamp"] = detection["stamp"]
    t_detect = perf_counter()

    validated = VA.validate_document(extracted, rulebook, memo=norm_memo)
    t_validate = perf_counter()

    return {
        **base,
        **_timing_row((t_ocr - t0) * 1000.0, (t_extract - t_ocr) * 1000.0,
                      (t_detect - t_extract) * 1000.0,
                      (t_validate - t_detect) * 1000.0, use_gpu),
        "dealer_name": validated["dealer_name"].get("value"),
        "dealer_name_confidence": float(validated["dealer_name"].get("confidence", 0.0)),
        "model_name": validated["model_name"].get("value"),
        "model_name_confidence": float(validated["model_name"].get("confidence", 0.0)),
        "horse_power": _opt_float(validated["horse_power"].get("value")),
        "horse_power_confidence": float(validated["horse_power"].get("confidence", 0.0)),
        "asset_cost": validated["asset_cost"].get("value"),
        "asset_cost_confidence": float(validated["asset_cost"].get("confidence", 0.0)),
        "signature_present": bool(validated["signature"].get("present", False)),
        "signature_bbox": validated["signature"].get("bbox"),
        "signature_confidence": float(validated["signature"].get("confidence", 0.0)),
        "signature_iou": _opt_float(validated["signature"].get("iou")),
        "stamp_present": bool(validated["stamp"].get("present", False)),
        "stamp_bbox": validated["stamp"].get("bbox"),
        "stamp_confidence": float(validated["stamp"].get("confidence", 0.0)),
        "stamp_iou": _opt_float(validated["stamp"].get("iou")),
        "overall_confidence": float(validated.get("overall_confidence", 0.0)),
        "status": "success",
        "error_message": None,
    }


def _timing_row(ocr_ms: float, extract_ms: float, detect_ms: float,
                validate_ms: float, use_gpu: bool) -> dict:
    """Cost model parity (executable.py:473-488): total seconds × hourly
    rate ($0.10 GPU / $0.01 CPU) / 3600."""
    total_ms = ocr_ms + extract_ms + detect_ms + validate_ms
    rate_per_sec = (0.10 if use_gpu else 0.01) / 3600.0
    return {
        "processing_time_ms": total_ms,
        "ocr_time_ms": ocr_ms,
        "extraction_time_ms": extract_ms,
        "detection_time_ms": detect_ms,
        "validation_time_ms": validate_ms,
        "cost_estimate_usd": (total_ms / 1000.0) * rate_per_sec,
    }


TIMING_COLS = ["processing_time_ms", "ocr_time_ms", "extraction_time_ms",
               "detection_time_ms", "validation_time_ms", "cost_estimate_usd"]


def _opt_float(x):
    return float(x) if x is not None else None


def _empty_fields_row() -> dict:
    return {
        "dealer_name": None, "dealer_name_confidence": 0.0,
        "model_name": None, "model_name_confidence": 0.0,
        "horse_power": None, "horse_power_confidence": 0.0,
        "asset_cost": None, "asset_cost_confidence": 0.0,
        "signature_present": False, "signature_bbox": None,
        "signature_confidence": 0.0, "signature_iou": None,
        "stamp_present": False, "stamp_bbox": None,
        "stamp_confidence": 0.0, "stamp_iou": None,
        "overall_confidence": 0.0,
    }
