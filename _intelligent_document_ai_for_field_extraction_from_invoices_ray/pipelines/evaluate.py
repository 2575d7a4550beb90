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

import numpy as np
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


_CALIB_BINS = 10
_CONF_FIELDS = ("dealer_name", "model_name", "horse_power", "asset_cost")


def calibration_frame(results: rd.Dataset,
                      ground_truth: dict[str, dict]) -> pd.DataFrame:
    """Confidence-calibration audit (reliability diagram + ECE): bucket
    every comparable (field confidence, field correct?) pair into 10
    confidence bins and report per-bin accuracy vs stated confidence —
    the eval an extraction pipeline needs before its confidences can
    gate auto-accept routing.  Same distributed shape as
    evaluate_results: GT broadcast once via ``ray.put``, per-batch
    integer partials (bin, n, n_correct, conf_milli_sum), bounded
    10-row driver merge.  ece_milli = Σ n_b·|acc_b − conf_b| / N is
    repeated on each row (all-integer, floor)."""
    gt_ref = ray.put(ground_truth)

    def partial(batch: pa.Table) -> pd.DataFrame:
        gt_map = ray.get(gt_ref)
        n = np.zeros(_CALIB_BINS, dtype=np.int64)
        ok = np.zeros(_CALIB_BINS, dtype=np.int64)
        cs = np.zeros(_CALIB_BINS, dtype=np.int64)
        for row in batch.to_pylist():
            gt = gt_map.get(row["doc_id"])
            if gt is None:
                continue
            checks = _doc_checks(row, gt)
            for f in _CONF_FIELDS:
                if checks[f] is None:
                    continue
                conf = float(row[f"{f}_confidence"] or 0.0)
                b = min(int(conf * _CALIB_BINS), _CALIB_BINS - 1)
                n[b] += 1
                ok[b] += int(bool(checks[f]))
                cs[b] += int(conf * 1000)
        return pd.DataFrame({"bin": np.arange(_CALIB_BINS),
                             "n": n, "ok": ok, "cs": cs})

    parts = (results.map_batches(partial, batch_format="pyarrow")
             .to_pandas().groupby("bin", as_index=False).sum())
    n = parts.n.to_numpy()
    ok = parts.ok.to_numpy()
    cs = parts.cs.to_numpy()
    total = int(n.sum())
    acc = np.where(n > 0, (1000 * ok) // np.maximum(n, 1), 0)
    conf = np.where(n > 0, cs // np.maximum(n, 1), 0)
    ece = int(np.abs(n * (acc - conf)).sum() // total) if total else 0
    out = pd.DataFrame({
        "bin": parts.bin.to_numpy().astype(np.int64),
        "n_pairs": n.astype(np.int64),
        "n_correct": ok.astype(np.int64),
        "acc_milli": acc.astype(np.int64),
        "conf_milli": conf.astype(np.int64),
        "ece_milli": np.full(_CALIB_BINS, ece, dtype=np.int64),
    })
    return out[out.n_pairs > 0].reset_index(drop=True)


def auc_frame(results: rd.Dataset,
              ground_truth: dict[str, dict]) -> pd.DataFrame:
    """Per-field ranking quality of the stated confidences (Mann-Whitney
    AUC with exact midrank tie handling): does a higher confidence
    actually mean a higher chance the field is correct?  Complements
    calibration_frame (which scores the VALUES of the confidences, not
    their ORDER).

    Distributed shape: confidences are milli-resolution, so per-batch
    partials aggregate to (field, conf_milli) -> (n_pos, n_neg) — a
    bounded <=4x1001-row exchange regardless of corpus size; the AUC
    itself is then exact integer arithmetic on the merged histogram:
    2U = sum_c(2*pos_c*neg_below_c + pos_c*neg_c), auc_milli =
    1000*2U // (2*n_pos*n_neg)."""
    gt_ref = ray.put(ground_truth)

    def partial(batch: pa.Table) -> pd.DataFrame:
        gt_map = ray.get(gt_ref)
        rows: dict[tuple, list[int]] = {}
        for row in batch.to_pylist():
            gt = gt_map.get(row["doc_id"])
            if gt is None:
                continue
            checks = _doc_checks(row, gt)
            for f in _CONF_FIELDS:
                if checks[f] is None:
                    continue
                cm = int(float(row[f"{f}_confidence"] or 0.0) * 1000)
                c = rows.setdefault((f, cm), [0, 0])
                c[int(bool(checks[f]))] += 1
        return pd.DataFrame(
            [{"field": f, "conf_milli": cm, "n_neg": c[0], "n_pos": c[1]}
             for (f, cm), c in sorted(rows.items())]) if rows else \
            pd.DataFrame({"field": pd.Series([], dtype=str),
                          "conf_milli": pd.Series([], dtype=np.int64),
                          "n_neg": pd.Series([], dtype=np.int64),
                          "n_pos": pd.Series([], dtype=np.int64)})

    hist = (results.map_batches(partial, batch_format="pyarrow")
            .to_pandas()
            .groupby(["field", "conf_milli"], as_index=False).sum())
    out_rows = []
    for f, g in hist.groupby("field"):
        g = g.sort_values("conf_milli")
        pos = g.n_pos.to_numpy().astype(np.int64)
        neg = g.n_neg.to_numpy().astype(np.int64)
        neg_below = np.concatenate(([0], np.cumsum(neg)[:-1]))
        u2 = int((2 * pos * neg_below + pos * neg).sum())
        n1, n0 = int(pos.sum()), int(neg.sum())
        auc_milli = (1000 * u2) // (2 * n1 * n0) if n1 and n0 else -1
        out_rows.append({"field": f, "n_pos": n1, "n_neg": n0,
                         "u2": u2, "auc_milli": auc_milli})
    return (pd.DataFrame(out_rows)
            .astype({"n_pos": np.int64, "n_neg": np.int64,
                     "u2": np.int64, "auc_milli": np.int64})
            .sort_values("field").reset_index(drop=True))


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


# ---------------------------------------------------------------- analyses
# Reference secondary analyses (evaluate.py:349-485), as single-pass
# distributed aggregations: exact mean/std/min/max/counts from per-batch
# moment partials; the MEDIAN uses a fixed log-spaced histogram (4096 bins
# over 1e-3..1e5) merged on the driver — resolution <0.6% relative, the
# scale-safe substitute for the reference's in-memory statistics.median.

_HIST_BINS = 4096
_HIST_LO, _HIST_HI = 1e-3, 1e5


def _hist_index(vals: np.ndarray) -> np.ndarray:
    clipped = np.clip(vals, _HIST_LO, _HIST_HI)
    frac = (np.log(clipped) - np.log(_HIST_LO)) / (np.log(_HIST_HI) - np.log(_HIST_LO))
    return np.minimum((frac * _HIST_BINS).astype(np.int64), _HIST_BINS - 1)


def _hist_median(counts: "np.ndarray") -> float:
    total = counts.sum()
    if total == 0:
        return 0.0
    cum = np.cumsum(counts)
    if total % 2 == 1:
        i = int(np.searchsorted(cum, total // 2 + 1))
        lo_v = hi_v = i
    else:
        lo_v = int(np.searchsorted(cum, total // 2))
        hi_v = int(np.searchsorted(cum, total // 2 + 1))
    def center(b):
        frac = (b + 0.5) / _HIST_BINS
        return float(np.exp(np.log(_HIST_LO)
                            + frac * (np.log(_HIST_HI) - np.log(_HIST_LO))))

    return (center(lo_v) + center(hi_v)) / 2.0


def _moment_partial(vals: "np.ndarray") -> dict:
    hist = np.bincount(_hist_index(vals), minlength=_HIST_BINS) if len(vals) else np.zeros(_HIST_BINS, dtype=np.int64)
    return {"n": len(vals), "sum": float(vals.sum()),
            "sumsq": float((vals.astype("float64") ** 2).sum()),
            "min": float(vals.min()) if len(vals) else float("inf"),
            "max": float(vals.max()) if len(vals) else float("-inf"),
            "hist": hist.tolist()}


def _merge_moments(parts: list[dict]) -> dict:
    n = sum(p["n"] for p in parts)
    s = sum(p["sum"] for p in parts)
    ss = sum(p["sumsq"] for p in parts)
    hist = np.sum([np.array(p["hist"]) for p in parts], axis=0) if parts else np.zeros(_HIST_BINS)
    var = (ss - s * s / n) / (n - 1) if n > 1 else 0.0
    return {"n": n, "mean": s / n if n else 0.0, "std": max(var, 0.0) ** 0.5,
            "min": min((p["min"] for p in parts), default=0.0) if n else 0.0,
            "max": max((p["max"] for p in parts), default=0.0) if n else 0.0,
            "sum": s, "median": _hist_median(hist)}


def analyze_confidence(results: rd.Dataset) -> dict:
    """Confidence distribution (evaluate.py:349-393): mean/median/std/
    min/max over successful docs + high/med/low buckets and threshold
    counts (confidences are in [0,1] so the histogram is linear here)."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["status", "overall_confidence"]).to_pandas()
        c = df.loc[df.status == "success", "overall_confidence"].to_numpy()
        # linear 0..1 histogram at 1e-4 resolution for the exact-ish median
        hist = np.bincount(np.minimum((c * 10000).astype(np.int64), 9999),
                            minlength=10000) if len(c) else np.zeros(10000, dtype=np.int64)
        return pd.DataFrame([{
            "n": len(c), "sum": float(c.sum()),
            "sumsq": float((c ** 2).sum()),
            "min": float(c.min()) if len(c) else float("inf"),
            "max": float(c.max()) if len(c) else float("-inf"),
            "high": int((c >= 0.9).sum()),
            "med": int(((c >= 0.7) & (c < 0.9)).sum()),
            "low": int((c < 0.7).sum()),
            "a95": int((c >= 0.95).sum()), "a90": int((c >= 0.90).sum()),
            "a80": int((c >= 0.80).sum()), "a70": int((c >= 0.70).sum()),
            "hist": [hist.tolist()],
        }])

    parts = results.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = int(parts.n.sum())
    if n == 0:
        return {"error": "No successful results"}
    s, ss = float(parts["sum"].sum()), float(parts.sumsq.sum())
    var = (ss - s * s / n) / (n - 1) if n > 1 else 0.0
    hist = np.sum([np.array(h[0]) for h in parts["hist"]], axis=0)
    cum = np.cumsum(hist)
    if n % 2 == 1:
        med = (int(np.searchsorted(cum, n // 2 + 1)) + 0.5) / 10000
    else:
        med = ((int(np.searchsorted(cum, n // 2))
                + int(np.searchsorted(cum, n // 2 + 1)) + 1.0) / 2.0) / 10000
    pct = lambda k: round(k / n * 100, 1)  # noqa: E731
    return {
        "total_documents": n,
        "mean_confidence": round(s / n, 3),
        "median_confidence": round(med, 3),
        "std_confidence": round(max(var, 0.0) ** 0.5, 3),
        "min_confidence": round(float(parts["min"].min()), 3),
        "max_confidence": round(float(parts["max"].max()), 3),
        "confidence_distribution": {
            "high": {"count": int(parts.high.sum()), "percentage": pct(int(parts.high.sum()))},
            "medium": {"count": int(parts.med.sum()), "percentage": pct(int(parts.med.sum()))},
            "low": {"count": int(parts.low.sum()), "percentage": pct(int(parts.low.sum()))},
        },
        "threshold_analysis": {
            "above_95": int(parts.a95.sum()), "above_90": int(parts.a90.sum()),
            "above_80": int(parts.a80.sum()), "above_70": int(parts.a70.sum()),
        },
    }


def analyze_performance(results: rd.Dataset) -> dict:
    """Performance metrics (evaluate.py:395-450): per-doc processing-time
    stats + component breakdown + throughput.  The reference's 'vlm'
    component is the fallback pipeline's concern; the base pipeline
    reports its validation stage in that slot's stead."""
    comp_cols = ["ocr_time_ms", "extraction_time_ms", "detection_time_ms",
                 "validation_time_ms"]

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["status", "processing_time_ms"] + comp_cols).to_pandas()
        ok = df[df.status == "success"]
        t = ok.processing_time_ms.to_numpy() / 1000.0   # sec, as the reference
        row = _moment_partial(t)
        row["hist"] = [row["hist"]]
        row["under_30s"] = int((t <= 30).sum())
        for c in comp_cols:
            row[f"sum_{c}"] = float(ok[c].sum()) / 1000.0
        return pd.DataFrame([row])

    parts = results.map_batches(partial, batch_format="pyarrow").to_pandas()
    plist = [{**r, "hist": r["hist"][0]} for r in parts.to_dict("records")]
    m = _merge_moments(plist)
    if m["n"] == 0:
        return {"error": "No successful results"}
    comp = {}
    for c in comp_cols:
        mean_c = float(parts[f"sum_{c}"].sum()) / m["n"]
        comp[c.replace("_time_ms", "")] = {
            "mean": round(mean_c, 3),
            "percentage": round(mean_c / m["mean"] * 100, 1) if m["mean"] else 0.0,
        }
    return {
        "total_documents": m["n"],
        "processing_time": {
            "mean": round(m["mean"], 3), "median": round(m["median"], 3),
            "std": round(m["std"], 3), "min": round(m["min"], 3),
            "max": round(m["max"], 3), "total": round(m["sum"], 3),
            "target_30s": sum(p["under_30s"] for p in plist),
        },
        "component_times": comp,
        "throughput": {
            "documents_per_hour": round(m["n"] / (m["sum"] / 3600), 1) if m["sum"] else 0.0,
            "average_time_per_doc": round(m["mean"], 3),
        },
    }


def analyze_cost(results: rd.Dataset) -> dict:
    """Cost metrics (evaluate.py:452-485): distribution buckets + the
    $0.01/doc target analysis over successful docs."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["status", "cost_estimate_usd"]).to_pandas()
        c = df.loc[df.status == "success", "cost_estimate_usd"].to_numpy()
        row = _moment_partial(c * 1e6)      # micro-USD keeps the histogram range sane
        row["hist"] = [row["hist"]]
        row["b1"] = int((c < 0.001).sum())
        row["b2"] = int(((c >= 0.001) & (c < 0.005)).sum())
        row["b3"] = int(((c >= 0.005) & (c < 0.01)).sum())
        row["b4"] = int((c >= 0.01).sum())
        return pd.DataFrame([row])

    parts = results.map_batches(partial, batch_format="pyarrow").to_pandas()
    plist = [{**r, "hist": r["hist"][0]} for r in parts.to_dict("records")]
    m = _merge_moments(plist)
    if m["n"] == 0:
        return {"error": "No successful results"}
    scale = 1e-6
    below = int(parts.b1.sum() + parts.b2.sum() + parts.b3.sum())
    return {
        "total_documents": m["n"],
        "cost_metrics": {
            "mean": round(m["mean"] * scale, 6), "median": round(m["median"] * scale, 6),
            "std": round(m["std"] * scale, 6), "min": round(m["min"] * scale, 6),
            "max": round(m["max"] * scale, 6), "total": round(m["sum"] * scale, 6),
        },
        "cost_distribution": {
            "below_001": int(parts.b1.sum()), "001_to_005": int(parts.b2.sum()),
            "005_to_01": int(parts.b3.sum()), "above_01": int(parts.b4.sum()),
        },
        "target_analysis": {
            "target_cost": 0.01,
            "below_target": below,
            "above_target": int(parts.b4.sum()),
            "percentage_below_target": round(below / m["n"] * 100, 1),
        },
    }
