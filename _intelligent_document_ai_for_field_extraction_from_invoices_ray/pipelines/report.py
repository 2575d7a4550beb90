"""Comprehensive evaluation report sink (reference ``evaluate.py:610-909``).

The reference renders four matplotlib PNGs, a markdown report and two JSON
files from driver-resident result rows (``generate_comprehensive_report``,
evaluate.py:693-740; ``generate_visualizations`` :610-691;
``_generate_markdown_summary`` :835-909).  This engine computes every
input to those renderings distributedly — the analyses are the existing
single-pass partial pipelines in ``evaluate.py``/``summary.py`` — and
renders SVG instead of PNG (no matplotlib/cv2 wheels in this container;
SVG is this repo's viz medium, see ``stages/viz.py``).  Scale posture:

- every analysis is one ``map_batches`` partial pass + tiny driver merge;
- the scatter chart hash-samples to <= ``scatter_k`` points inside the
  pipeline (deterministic md5 predicate, coordination-free) so no
  corpus-sized point cloud ever reaches the driver;
- ``results`` is materialized ONCE and re-read by each analysis pass.
"""

from __future__ import annotations

import hashlib
import html
import json
import math
import os
from datetime import datetime

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .evaluate import (
    analyze_confidence,
    analyze_cost,
    analyze_performance,
    error_buckets,
    error_samples,
    evaluate_results,
)
from .summary import summarize_results

# ------------------------------------------------------------ chart data


def _conf_hist20(results: rd.Dataset) -> np.ndarray:
    """20-bin confidence histogram over successful docs (the PNG
    histogram's bins, evaluate.py:626-628) via bincount partials."""

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["status", "overall_confidence"]).to_pandas()
        c = df.loc[df.status == "success", "overall_confidence"].to_numpy()
        h = (np.bincount(np.minimum((c * 20).astype(np.int64), 19),
                         minlength=20) if len(c)
             else np.zeros(20, dtype=np.int64))
        return pd.DataFrame([{"hist": [h.tolist()]}])

    parts = results.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return np.zeros(20, dtype=np.int64)
    return np.sum([np.array(h[0]) for h in parts["hist"]], axis=0)


def _scatter_sample(results: rd.Dataset, k: int = 2000) -> pd.DataFrame:
    """<=k (processing_time_sec, confidence) points for the scatter chart
    (evaluate.py:640-652), picked by a deterministic md5 predicate so the
    sample is reproducible and no corpus-sized collect happens."""
    n = results.count()
    keep_permille = 1000 if n <= k else max(1, int(k / n * 1000))

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["doc_id", "status", "overall_confidence",
                           "processing_time_ms"]).to_pandas()
        df = df[df.status == "success"]
        if keep_permille < 1000 and len(df):
            m = df.doc_id.map(lambda d: int(hashlib.md5(
                str(d).encode()).hexdigest()[:8], 16) % 1000 < keep_permille)
            df = df[m]
        return pd.DataFrame({
            "t_sec": df.processing_time_ms.to_numpy() / 1000.0,
            "conf": df.overall_confidence.to_numpy()})

    return results.map_batches(partial, batch_format="pyarrow").to_pandas()


# ------------------------------------------------------------ SVG charts

_W, _H, _ML, _MB, _MT = 640, 400, 60, 50, 40


def _svg_open(title: str) -> list[str]:
    return [f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
            f'height="{_H}" viewBox="0 0 {_W} {_H}">',
            f'<rect width="{_W}" height="{_H}" fill="white"/>',
            f'<text x="{_W / 2}" y="24" font-size="16" text-anchor="middle" '
            f'font-weight="bold">{html.escape(title)}</text>']


def _axes(x_label: str, y_label: str) -> list[str]:
    x0, y0, x1, y1 = _ML, _H - _MB, _W - 20, _MT
    return [f'<line x1="{x0}" y1="{y0}" x2="{x1}" y2="{y0}" stroke="#333"/>',
            f'<line x1="{x0}" y1="{y0}" x2="{x0}" y2="{y1}" stroke="#333"/>',
            f'<text x="{(x0 + x1) / 2}" y="{_H - 12}" font-size="12" '
            f'text-anchor="middle">{html.escape(x_label)}</text>',
            f'<text x="16" y="{(y0 + y1) / 2}" font-size="12" '
            f'text-anchor="middle" transform="rotate(-90 16 '
            f'{(y0 + y1) / 2})">{html.escape(y_label)}</text>']


def _vline_at(xfrac: float, color: str, label: str) -> str:
    x = _ML + xfrac * (_W - 20 - _ML)
    return (f'<line x1="{x:.1f}" y1="{_MT}" x2="{x:.1f}" y2="{_H - _MB}" '
            f'stroke="{color}" stroke-dasharray="5,4"/>'
            f'<text x="{x + 3:.1f}" y="{_MT + 12}" font-size="10" '
            f'fill="{color}">{html.escape(label)}</text>')


def svg_confidence_histogram(hist: np.ndarray) -> str:
    """Confidence distribution with the 0.95 target / 0.90 good guide
    lines (evaluate.py:626-638)."""
    parts = _svg_open("Confidence Distribution Across Documents")
    parts += _axes("Confidence Score", "Number of Documents")
    top = max(int(hist.max()), 1)
    bw = (_W - 20 - _ML) / len(hist)
    for i, c in enumerate(hist):
        h = (c / top) * (_H - _MB - _MT)
        x = _ML + i * bw
        parts.append(f'<rect x="{x:.1f}" y="{_H - _MB - h:.1f}" '
                     f'width="{bw - 1:.1f}" height="{h:.1f}" '
                     f'fill="skyblue" stroke="black" stroke-width="0.5"/>')
    parts.append(_vline_at(0.95, "red", "Target (95%)"))
    parts.append(_vline_at(0.90, "orange", "Good (90%)"))
    parts.append("</svg>")
    return "\n".join(parts)


def svg_time_vs_confidence(points: pd.DataFrame) -> str:
    """Processing-time vs confidence scatter with the 30 s / 0.9 guide
    lines (evaluate.py:640-652); input is the hash-sampled point set."""
    parts = _svg_open("Processing Time vs Confidence Score")
    parts += _axes("Processing Time (seconds)", "Confidence Score")
    tmax = max(float(points.t_sec.max()) if len(points) else 0.0, 30.0) * 1.05
    for t, c in zip(points.t_sec, points.conf):
        x = _ML + (t / tmax) * (_W - 20 - _ML)
        y = _H - _MB - c * (_H - _MB - _MT)
        parts.append(f'<circle cx="{x:.1f}" cy="{y:.1f}" r="2.5" '
                     f'fill="green" fill-opacity="0.6"/>')
    y90 = _H - _MB - 0.9 * (_H - _MB - _MT)
    parts.append(f'<line x1="{_ML}" y1="{y90:.1f}" x2="{_W - 20}" '
                 f'y2="{y90:.1f}" stroke="orange" stroke-dasharray="5,4"/>')
    parts.append(_vline_at(30.0 / tmax, "red", "30s Target"))
    parts.append("</svg>")
    return "\n".join(parts)


def svg_field_rates(rates: dict[str, float]) -> str:
    """Per-field extraction-rate bars with value labels and the 90%
    target line (evaluate.py:654-678)."""
    parts = _svg_open("Field Extraction Success Rates")
    parts += _axes("Field", "Extraction Rate (%)")
    colors = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728"]
    n = max(len(rates), 1)
    bw = (_W - 20 - _ML) / n
    for i, (f, r) in enumerate(rates.items()):
        h = (r / 100.0) * (_H - _MB - _MT)
        x = _ML + i * bw + bw * 0.15
        parts.append(f'<rect x="{x:.1f}" y="{_H - _MB - h:.1f}" '
                     f'width="{bw * 0.7:.1f}" height="{h:.1f}" '
                     f'fill="{colors[i % len(colors)]}"/>')
        parts.append(f'<text x="{x + bw * 0.35:.1f}" '
                     f'y="{_H - _MB - h - 4:.1f}" font-size="11" '
                     f'text-anchor="middle">{r:.1f}%</text>')
        parts.append(f'<text x="{x + bw * 0.35:.1f}" y="{_H - _MB + 14}" '
                     f'font-size="10" text-anchor="middle">'
                     f'{html.escape(f)}</text>')
    y_t = _H - _MB - 0.9 * (_H - _MB - _MT)
    parts.append(f'<line x1="{_ML}" y1="{y_t:.1f}" x2="{_W - 20}" '
                 f'y2="{y_t:.1f}" stroke="red" stroke-dasharray="5,4"/>')
    parts.append("</svg>")
    return "\n".join(parts)


def svg_time_breakdown(component_means: dict[str, float]) -> str:
    """Mean per-component time share pie (evaluate.py:680-689)."""
    parts = _svg_open("Average Processing Time Breakdown by Component")
    colors = ["#ff9999", "#66b3ff", "#99ff99", "#ffcc99", "#d0b0ff"]
    cx, cy, r = _W / 2, (_H + _MT) / 2, 130
    total = sum(component_means.values()) or 1.0
    ang = -math.pi / 2                      # start at 12 o'clock
    for i, (name, v) in enumerate(component_means.items()):
        frac = v / total
        a2 = ang + frac * 2 * math.pi
        x1, y1 = cx + r * math.cos(ang), cy + r * math.sin(ang)
        x2, y2 = cx + r * math.cos(a2), cy + r * math.sin(a2)
        large = 1 if frac > 0.5 else 0
        parts.append(f'<path d="M{cx},{cy} L{x1:.1f},{y1:.1f} '
                     f'A{r},{r} 0 {large} 1 {x2:.1f},{y2:.1f} Z" '
                     f'fill="{colors[i % len(colors)]}" stroke="white"/>')
        am = (ang + a2) / 2
        lx, ly = cx + (r + 28) * math.cos(am), cy + (r + 28) * math.sin(am)
        parts.append(f'<text x="{lx:.1f}" y="{ly:.1f}" font-size="11" '
                     f'text-anchor="middle">{html.escape(name)} '
                     f'{frac * 100:.1f}%</text>')
        ang = a2
    parts.append("</svg>")
    return "\n".join(parts)


# ------------------------------------------------------------ summary


def _assessment(targets: dict[str, bool]) -> str:
    """evaluate.py:777-789 tiering."""
    achieved, total = sum(targets.values()), len(targets)
    if achieved == total:
        return "EXCELLENT - All targets achieved"
    if achieved >= total * 0.75:
        return "GOOD - Most targets achieved"
    if achieved >= total * 0.5:
        return "FAIR - Some targets achieved"
    return "NEEDS IMPROVEMENT - Few targets achieved"


def _recommendations(conf: dict, perf: dict, err: dict) -> list[str]:
    """Data-driven improvement hints (evaluate.py:791-833 semantics:
    each trigger inspects the same analysis slot)."""
    recs = []
    low_pct = (conf.get("confidence_distribution", {})
               .get("low", {}).get("percentage", 0))
    if low_pct > 20:
        recs.append("Improve text recovery for low-confidence documents "
                    "with better preprocessing")
    total = perf.get("total_documents", 0)
    if perf.get("processing_time", {}).get("target_30s", 0) < total * 0.9:
        recs.append("Gate the fallback extractor on very low confidence "
                    "only, to cut per-document latency")
    if err.get("failed_docs", 0) > total * 0.1:
        recs.append("Add retry logic for failed documents with different "
                    "recovery parameters")
    recs.extend([
        "Mine low-confidence documents for new extraction patterns",
        "Add more language-specific patterns for multilingual documents",
        "Tune detection thresholds with more labeled signature/stamp data",
        "Cache per-template extraction plans for frequently seen layouts",
    ])
    return recs


def _generate_summary(conf: dict, perf: dict, cost: dict,
                      summ: dict, err: dict) -> dict:
    """Executive summary block (evaluate.py:742-775): key metrics, the
    four reference targets, assessment tier, recommendations."""
    avg_conf = conf.get("mean_confidence", 0.0)
    avg_time = perf.get("processing_time", {}).get("mean", 0.0)
    avg_cost = cost.get("cost_metrics", {}).get("mean", 0.0)
    success_rate = summ.get("success_rate", 0.0) * 100
    targets = {
        "confidence_target": avg_conf >= 0.95,
        "processing_time_target": avg_time <= 30,
        "cost_target": avg_cost <= 0.01,
        "success_rate_target": success_rate >= 95,
    }
    return {
        "key_metrics": {
            "average_confidence": round(avg_conf, 3),
            "average_processing_time_sec": round(avg_time, 3),
            "average_cost_usd": round(avg_cost, 6),
            "success_rate_percent": round(success_rate, 1),
        },
        "target_achievement": targets,
        "overall_assessment": _assessment(targets),
        "recommendations": _recommendations(conf, perf, err),
    }


# ------------------------------------------------------------ report


def _markdown_report(report: dict) -> str:
    """Markdown rendering of the report dict (evaluate.py:835-909
    structure: summary table, accuracy, field table, perf, cost,
    recommendations, file manifest)."""
    s = report["summary"]
    m, t = s["key_metrics"], s["target_achievement"]
    ok = lambda b: "yes" if b else "NO"  # noqa: E731
    lines = [
        "# Document AI Pipeline Evaluation Report", "",
        "## Executive Summary", "",
        f"**Overall Assessment:** {s['overall_assessment']}", "",
        "### Key Metrics",
        "| Metric | Value | Target | Met |",
        "|--------|-------|--------|-----|",
        f"| Average Confidence | {m['average_confidence']:.3f} | >=0.95 "
        f"| {ok(t['confidence_target'])} |",
        f"| Avg Processing Time | {m['average_processing_time_sec']:.2f}s "
        f"| <=30s | {ok(t['processing_time_target'])} |",
        f"| Avg Cost/Document | ${m['average_cost_usd']:.6f} | <=$0.01 "
        f"| {ok(t['cost_target'])} |",
        f"| Success Rate | {m['success_rate_percent']:.1f}% | >=95% "
        f"| {ok(t['success_rate_target'])} |",
        "", "## Detailed Analysis", "",
    ]
    dla = report["document_level_accuracy"]
    if "error" not in dla:
        lines += [
            f"### Document-Level Accuracy: {dla['document_level_accuracy']}%",
            f"- Target: {dla['target_accuracy']}%",
            f"- Achieved target: {ok(dla['achieved_target'])}",
            f"- Correct documents: {dla['correct_documents']}"
            f"/{dla['total_documents']}", "",
        ]
    flm = report["field_level_metrics"]
    if flm:
        lines += ["### Field-Level Performance",
                  "| Field | Precision | Recall | F1 Score |",
                  "|-------|-----------|--------|----------|"]
        for field, fm in flm.items():
            lines.append(
                f"| {field.replace('_', ' ').title()} | {fm['precision']:.3f} "
                f"| {fm['recall']:.3f} | {fm['f1']:.3f} |")
        lines.append("")
    perf = report["performance_analysis"]
    if "error" not in perf:
        pt = perf["processing_time"]
        lines += [
            "### Performance Metrics",
            f"- Average processing time: {pt['mean']:.2f}s",
            f"- Documents within 30s target: {pt['target_30s']}"
            f"/{perf['total_documents']}",
            f"- Throughput: {perf['throughput']['documents_per_hour']:.0f} "
            f"documents/hour", "",
        ]
    cost = report["cost_analysis"]
    if "error" not in cost:
        ta = cost["target_analysis"]
        lines += [
            "### Cost Analysis",
            f"- Average cost/document: ${cost['cost_metrics']['mean']:.6f}",
            f"- Documents below $0.01 target: {ta['below_target']}"
            f"/{cost['total_documents']} ({ta['percentage_below_target']}%)",
            "",
        ]
    lines += ["## Recommendations", ""]
    lines += [f"{i}. {r}" for i, r in enumerate(s["recommendations"], 1)]
    lines += ["", "## Generated Files", "",
              "- `analysis.json`: complete analysis data",
              "- `error_samples.json`: detailed error cases",
              "- `markdown_report.md`: this report",
              "- `*.svg`: visualization charts",
              "", f"*Report generated on {report['timestamp']}*", ""]
    return "\n".join(lines)


def comprehensive_report(results: rd.Dataset,
                         ground_truth: dict[str, dict],
                         output_dir: str,
                         scatter_k: int = 2000) -> dict:
    """Run every analysis over the result table and write the report
    bundle: ``analysis.json``, ``error_samples.json``,
    ``markdown_report.md`` and four SVG charts — the Ray-native analog
    of ``generate_comprehensive_report`` (evaluate.py:693-740).

    ``results`` is materialized once; each analysis is an independent
    single-pass partial pipeline over the materialized blocks."""
    os.makedirs(output_dir, exist_ok=True)
    results = results.materialize()

    summ = summarize_results(results)
    conf = analyze_confidence(results)
    perf = analyze_performance(results)
    cost = analyze_cost(results)
    err = error_buckets(results, ground_truth)
    err["success_rate"] = summ["success_rate"] * 100
    field_rates = {f: st["rate"] * 100 for f, st in
                   summ["field_extraction_stats"].items()}
    err["field_extraction_rates"] = field_rates
    eva = evaluate_results(results, ground_truth)
    samples = error_samples(results, k=20)

    report = {
        "timestamp": datetime.now().isoformat(),
        "total_documents": summ["total_documents"],
        "document_level_accuracy": {
            k: eva[k] for k in ("total_documents", "correct_documents",
                                "partially_correct",
                                "document_level_accuracy",
                                "target_accuracy", "achieved_target")},
        "field_level_metrics": eva["per_field"],
        "confidence_analysis": conf,
        "performance_analysis": perf,
        "cost_analysis": cost,
        "error_analysis": err,
        "error_samples": samples.to_dict("records"),
    }
    report["summary"] = _generate_summary(conf, perf, cost, summ, err)

    def _write(name: str, text: str) -> None:
        with open(os.path.join(output_dir, name), "w",
                  encoding="utf-8") as f:
            f.write(text)

    _write("analysis.json", json.dumps(report, indent=2, default=str))
    _write("error_samples.json",
           json.dumps(report["error_samples"], indent=2, default=str))
    _write("markdown_report.md", _markdown_report(report))
    _write("confidence_distribution.svg",
           svg_confidence_histogram(_conf_hist20(results)))
    _write("time_vs_confidence.svg",
           svg_time_vs_confidence(_scatter_sample(results, scatter_k)))
    _write("field_extraction_rates.svg", svg_field_rates(field_rates))
    if "error" not in perf:
        _write("time_breakdown.svg", svg_time_breakdown(
            {c: v["mean"] for c, v in perf["component_times"].items()}))
    return report


def report_frame(results: rd.Dataset, ground_truth: dict[str, dict],
                 output_dir: str) -> pd.DataFrame:
    """One-row driver-friendly view of the report (assessment + key
    metrics + which files were written)."""
    rep = comprehensive_report(results, ground_truth, output_dir)
    files = sorted(f for f in os.listdir(output_dir)
                   if f.endswith((".json", ".md", ".svg")))
    return pd.DataFrame([{
        "overall_assessment": rep["summary"]["overall_assessment"],
        **{k: v for k, v in rep["summary"]["key_metrics"].items()},
        "targets_met": int(sum(
            rep["summary"]["target_achievement"].values())),
        "n_files": len(files),
        "files": ",".join(files),
    }])
