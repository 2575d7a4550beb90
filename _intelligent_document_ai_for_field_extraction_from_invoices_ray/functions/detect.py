"""Deterministic media-span classification (signature/stamp detection).

The reference runs YOLOv8 over page pixels (utils/detector.py:178-268).
This sandbox has no vision stack and the engine's input carries media as
opaque ``media_ref`` spans, so the *model call* is replaced by a
deterministic classifier keyed on a stable hash of ``media_ref`` — a
clearly-marked stand-in (see ``MediaModel``) — while every surrounding
decision is kept semantically faithful:

- class-specific confidence gates   detector.py:238-239
- relative area gates               detector.py:242-243
- greedy NMS at IoU 0.5             detector.py:270-316
- best-detection-per-class argmax   detector.py:354-386
- IoU vs ground truth + 0.5 pass    detector.py:34-46, 388-392

All outputs are pure functions of ``media_ref`` strings, so the Ray
actor-pool stage and the oracle agree bit-for-bit.
"""

from __future__ import annotations

from zlib import crc32

from . import vocab as V


class MediaModel:
    """STAND-IN for a learned detector (no vision libs in this sandbox).

    A real deployment would load YOLO weights here and run batched
    inference in ``predict``; the deterministic hash keeps the pipeline
    plumbing (actor pools, batch sizing, NMS, argmax) real and testable.
    Swap ``predict_one`` for an actual model to productionize.
    """

    def __init__(self, conf_thresholds: dict[str, float] | None = None):
        self.conf_thresholds = dict(conf_thresholds or V.MEDIA_CONF_THRESHOLDS)

    @staticmethod
    def predict_one(media_ref: str) -> tuple[str, float, list[float]]:
        """(class_name, confidence, bbox) for one media span."""
        h = crc32(media_ref.encode("utf-8"))
        cls_bucket = h % 5
        if cls_bucket <= 1:
            cls = "signature"
        elif cls_bucket <= 3:
            cls = "stamp"
        else:
            cls = "other"
        conf = 0.25 + ((h >> 8) % 7300) / 10000.0          # [0.25, 0.98)
        x1 = float((h >> 3) % (V.MEDIA_PAGE_W - 360))
        y1 = float((h >> 7) % (V.MEDIA_PAGE_H - 260))
        w = 60.0 + (h >> 11) % 300
        ht = 40.0 + (h >> 13) % 200
        return cls, conf, [x1, y1, x1 + w, y1 + ht]

    def predict(self, media_refs: list[str]) -> list[dict]:
        """Batched classify with confidence + area gates applied."""
        page_area = V.MEDIA_PAGE_W * V.MEDIA_PAGE_H
        out = []
        for ref in media_refs:
            cls, conf, bbox = self.predict_one(ref)
            if conf < self.conf_thresholds.get(cls, 0.5):
                continue
            area = (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])
            if area < V.MEDIA_AREA_MIN_FRAC * page_area or area > V.MEDIA_AREA_MAX_FRAC * page_area:
                continue
            out.append({"media_ref": ref, "class_name": cls, "confidence": conf,
                        "bbox": bbox, "area": area})
        return out


def iou(b1: list[float], b2: list[float]) -> float:
    x1, y1 = max(b1[0], b2[0]), max(b1[1], b2[1])
    x2, y2 = min(b1[2], b2[2]), min(b1[3], b2[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    a1 = (b1[2] - b1[0]) * (b1[3] - b1[1])
    a2 = (b2[2] - b2[0]) * (b2[3] - b2[1])
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def nms(detections: list[dict], iou_threshold: float = V.MEDIA_NMS_IOU) -> list[dict]:
    """Greedy confidence-descending NMS; stable on ties (input order)."""
    if not detections:
        return []
    ordered = sorted(detections, key=lambda d: -d["confidence"])
    kept: list[dict] = []
    for det in ordered:
        if all(iou(det["bbox"], k["bbox"]) <= iou_threshold for k in kept):
            kept.append(det)
    return kept


def summarize_detections(detections: list[dict],
                         ground_truth: dict | None = None) -> dict:
    """Best-per-class argmax + optional IoU eval (detector.py:318-394)."""
    results = {
        "signature": {"present": False, "bbox": None, "confidence": 0.0, "count": 0, "iou": None},
        "stamp": {"present": False, "bbox": None, "confidence": 0.0, "count": 0, "iou": None},
    }
    for cls in ("signature", "stamp"):
        cls_dets = [d for d in detections if d["class_name"] == cls]
        if not cls_dets:
            continue
        best = max(cls_dets, key=lambda d: d["confidence"])
        results[cls] = {"present": True, "bbox": best["bbox"],
                        "confidence": best["confidence"], "count": len(cls_dets),
                        "iou": None}
        if ground_truth and ground_truth.get(cls):
            results[cls]["iou"] = iou(best["bbox"], ground_truth[cls])
    return results


def classify_document_media(media_refs: list[str],
                            model: MediaModel | None = None,
                            ground_truth: dict | None = None) -> dict:
    """Full per-document media path: classify → NMS → summarize."""
    m = model or MediaModel()
    return summarize_detections(nms(m.predict(media_refs)), ground_truth)
