"""Evaluation metrics vs ground truth (reference A5, evaluate.py:62-347).

Tolerance semantics replicated exactly:
- dealer: fuzzy ratio ≥ 0.9 (evaluate.py:109-115; fuzz.ratio analog)
- model: exact case-insensitive (evaluate.py:117-122)
- HP / cost: within ±5 % of GT (evaluate.py:124-135)
- signature / stamp: presence equality (evaluate.py:138-149)
- DLA = all checks pass; partial = ≥4 of 6 checked fields correct
  (evaluate.py:100-152, 154-206)

Implementation: GT broadcast via ``ray.put``, per-batch vectorized checks,
per-batch partial counters, driver merge — no shuffle.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..functions.fuzzy import ratio

FIELDS = ("dealer_name", "model_name", "horse_power", "asset_cost",
          "signature", "stamp")


def _doc_checks(row: dict, gt: dict) -> dict[str, bool | None]:
    """None = field not comparable (missing on either side) — mirrors the
    reference's skip-if-absent checks."""
    out: dict[str, bool | None] = {}
    out["dealer_name"] = (ratio(str(row["dealer_name"]).lower(),
                                str(gt["dealer_name"]).lower()) / 100.0 >= 0.9
                          if row["dealer_name"] and gt.get("dealer_name") else None)
    out["model_name"] = (str(row["model_name"]).strip().upper()
                         == str(gt["model_name"]).strip().upper()
                         if row["model_name"] and gt.get("model_name") else None)
    out["horse_power"] = (abs(float(row["horse_power"]) - float(gt["horse_power"]))
                          <= abs(float(gt["horse_power"]) * 0.05)
                          if row["horse_power"] and gt.get("horse_power") else None)
    out["asset_cost"] = (abs(float(row["asset_cost"]) - float(gt["asset_cost"]))
                         <= abs(float(gt["asset_cost"]) * 0.05)
                         if row["asset_cost"] and gt.get("asset_cost") else None)
    out["signature"] = (bool(row["signature_present"]) == bool(gt.get("signature_present"))
                        if gt.get("signature_present") is not None else None)
    out["stamp"] = (bool(row["stamp_present"]) == bool(gt.get("stamp_present"))
                    if gt.get("stamp_present") is not None else None)
    return out


def evaluate_results(results: rd.Dataset, ground_truth: dict[str, dict]) -> dict:
    gt_ref = ray.put(ground_truth)

    def partial(batch: pa.Table) -> pd.DataFrame:
        gt_map = ray.get(gt_ref)
        counters = {"total": 0, "with_gt": 0, "correct": 0, "partial": 0}
        for f in FIELDS:
            counters[f"tp_{f}"] = counters[f"fp_{f}"] = counters[f"fn_{f}"] = 0
        for row in batch.to_pylist():
            counters["total"] += 1
            gt = gt_map.get(row["doc_id"])
            if gt is None:
                continue
            counters["with_gt"] += 1
            checks = _doc_checks(row, gt)
            valid = [v for v in checks.values() if v is not None]
            if valid and all(valid):
                counters["correct"] += 1
            elif sum(bool(v) for v in valid) >= 4 and len(valid) >= 4:
                counters["partial"] += 1
            # field-level TP/FP/FN (predicted vs GT presence + correctness)
            for f in ("dealer_name", "model_name", "horse_power", "asset_cost"):
                pred = row[f] is not None
                has_gt = gt.get(f) is not None
                if pred and has_gt and checks[f]:
                    counters[f"tp_{f}"] += 1
                elif pred and (not has_gt or not checks[f]):
                    counters[f"fp_{f}"] += 1
                elif not pred and has_gt:
                    counters[f"fn_{f}"] += 1
        return pd.DataFrame([counters])

    parts = results.map_batches(partial, batch_format="pyarrow").to_pandas()
    total = int(parts.total.sum())
    correct = int(parts.correct.sum())
    metrics = {
        "total_documents": total,
        "with_ground_truth": int(parts.with_gt.sum()),
        "correct_documents": correct,
        "partially_correct": int(parts.partial.sum()),
        "document_level_accuracy": round(correct / total * 100, 2) if total else 0.0,
        "target_accuracy": 95.0,
        "achieved_target": (correct / total * 100 >= 95.0) if total else False,
        "per_field": {},
    }
    for f in ("dealer_name", "model_name", "horse_power", "asset_cost"):
        tp = int(parts[f"tp_{f}"].sum())
        fp = int(parts[f"fp_{f}"].sum())
        fn = int(parts[f"fn_{f}"].sum())
        precision = tp / (tp + fp) if tp + fp else 0.0
        recall = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
        metrics["per_field"][f] = {"tp": tp, "fp": fp, "fn": fn,
                                   "precision": precision, "recall": recall,
                                   "f1": f1}
    return metrics


def error_samples(results: rd.Dataset, k: int = 10) -> pd.DataFrame:
    """Bottom-k lowest-confidence documents (evaluate.py:551-578): a
    distributed sort + limit over the result table."""
    out = (results.sort(["overall_confidence", "doc_id"])
           .limit(k)
           .select_columns(["doc_id", "overall_confidence", "status",
                            "dealer_name", "model_name"]))
    return out.to_pandas()


def error_buckets(results: rd.Dataset, ground_truth: dict[str, dict]) -> dict:
    """Error analysis (evaluate.py:487-608): per-field counts of
    missing-prediction vs wrong-value errors, via partial counters."""
    gt_ref = ray.put(ground_truth)
    value_fields = ("dealer_name", "model_name", "horse_power", "asset_cost")

    def partial(batch: pa.Table) -> pd.DataFrame:
        gt_map = ray.get(gt_ref)
        c = {}
        for f in value_fields:
            c[f"missing_{f}"] = c[f"wrong_{f}"] = 0
        c["failed_docs"] = 0
        for row in batch.to_pylist():
            if row["status"] != "success":
                c["failed_docs"] += 1
                continue
            gt = gt_map.get(row["doc_id"])
            if gt is None:
                continue
            checks = _doc_checks(row, gt)
            for f in value_fields:
                if row[f] is None and gt.get(f) is not None:
                    c[f"missing_{f}"] += 1
                elif checks[f] is False:
                    c[f"wrong_{f}"] += 1
        return pd.DataFrame([c])

    parts = results.map_batches(partial, batch_format="pyarrow").to_pandas()
    return {col: int(parts[col].sum()) for col in parts.columns}


def evaluation_frame(results: rd.Dataset, ground_truth: dict[str, dict]) -> pd.DataFrame:
    m = evaluate_results(results, ground_truth)
    row = {"total_documents": m["total_documents"],
           "correct_documents": m["correct_documents"],
           "partially_correct": m["partially_correct"]}
    for f, d in m["per_field"].items():
        row[f"tp_{f}"] = d["tp"]
        row[f"fp_{f}"] = d["fp"]
        row[f"fn_{f}"] = d["fn"]
    return pd.DataFrame([row])
