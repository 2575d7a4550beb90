"""Evaluation (A5) and summary (A1) semantics."""

import pytest

import ray.data as rd

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.evaluate import (
    _doc_checks,
    evaluate_results,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.summary import (
    summarize_results,
)


def _row(**kw):
    base = {"doc_id": "d", "dealer_name": None, "model_name": None,
            "horse_power": None, "asset_cost": None,
            "signature_present": False, "stamp_present": False,
            "dealer_name_confidence": 0.0, "model_name_confidence": 0.0,
            "horse_power_confidence": 0.0, "asset_cost_confidence": 0.0,
            "overall_confidence": 0.0, "status": "success"}
    base.update(kw)
    return base


def test_tolerance_semantics():
    gt = {"dealer_name": "Kumar Tractors Ltd", "model_name": "575 DI",
          "horse_power": 50.0, "asset_cost": 650000.0,
          "signature_present": True, "stamp_present": False}
    # dealer fuzzy >= 0.9 (evaluate.py:109-115)
    c = _doc_checks(_row(dealer_name="Kumar Tractors Ltd."), gt)
    assert c["dealer_name"] is True
    c = _doc_checks(_row(dealer_name="Completely Different"), gt)
    assert c["dealer_name"] is False
    # model exact case-insensitive
    assert _doc_checks(_row(model_name="575 di"), gt)["model_name"] is True
    assert _doc_checks(_row(model_name="575"), gt)["model_name"] is False
    # HP/cost +-5%
    assert _doc_checks(_row(horse_power=52.0), gt)["horse_power"] is True
    assert _doc_checks(_row(horse_power=53.0), gt)["horse_power"] is False
    assert _doc_checks(_row(asset_cost=680000), gt)["asset_cost"] is True
    assert _doc_checks(_row(asset_cost=700000), gt)["asset_cost"] is False
    # missing on either side -> not comparable (None)
    assert _doc_checks(_row(), gt)["dealer_name"] is None


@pytest.mark.usefixtures("ray_session")
def test_dla_and_field_metrics():
    gt = {"doc1": {"dealer_name": "A Motors Ltd", "model_name": "575 DI",
                   "horse_power": 50.0, "asset_cost": 650000.0,
                   "signature_present": True, "stamp_present": True},
          "doc2": {"dealer_name": "B Tractors", "model_name": "744 FE",
                   "horse_power": 48.0, "asset_cost": 500000.0,
                   "signature_present": False, "stamp_present": False}}
    rows = [
        _row(doc_id="doc1", dealer_name="A Motors Ltd", model_name="575 DI",
             horse_power=50.0, asset_cost=650000, signature_present=True,
             stamp_present=True),                     # fully correct
        _row(doc_id="doc2", dealer_name="B Tractors", model_name="WRONG",
             horse_power=48.0, asset_cost=500000),    # 5/6 -> partial
    ]
    m = evaluate_results(rd.from_items(rows), gt)
    assert m["correct_documents"] == 1
    assert m["partially_correct"] == 1
    assert m["document_level_accuracy"] == 50.0
    f = m["per_field"]["model_name"]
    assert (f["tp"], f["fp"], f["fn"]) == (1, 1, 0)
    assert m["per_field"]["horse_power"]["precision"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_summary_counts():
    rows = [
        _row(doc_id="a", overall_confidence=0.9, dealer_name="X",
             signature_present=True),
        _row(doc_id="b", overall_confidence=0.7),
        _row(doc_id="c", overall_confidence=0.2),
        _row(doc_id="d", status="failed"),
    ]
    s = summarize_results(rd.from_items(rows))
    assert s["total_documents"] == 4 and s["successful"] == 3
    cs = s["confidence_stats"]
    assert (cs["high_count"], cs["medium_count"], cs["low_count"]) == (1, 1, 1)
    assert s["field_extraction_stats"]["dealer_name"]["extracted"] == 1
    assert s["signature_detection"]["detected"] == 1


@pytest.mark.usefixtures("ray_session")
def test_comprehensive_report_bundle(tmp_path):
    """Report sink (evaluate.py:693-909 analog): writes analysis.json,
    error_samples.json, markdown_report.md and the four SVG charts; the
    markdown carries the key sections and the JSON is strict-parseable."""
    import json
    import xml.etree.ElementTree as ET

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.report import (
        comprehensive_report,
    )

    rows = []
    for i in range(40):
        rows.append(_row(
            doc_id=f"d{i}", dealer_name="A Motors Ltd", model_name="575 DI",
            horse_power=50.0, asset_cost=650000,
            overall_confidence=0.5 + (i % 5) * 0.1,
            signature_present=bool(i % 2), stamp_present=False,
            processing_time_ms=10.0 + i, ocr_time_ms=4.0,
            extraction_time_ms=3.0, detection_time_ms=2.0,
            validation_time_ms=1.0 + i, cost_estimate_usd=0.0005 * (i % 3)))
    rows.append(_row(doc_id="bad", status="failed",
                     processing_time_ms=5.0, ocr_time_ms=5.0,
                     extraction_time_ms=0.0, detection_time_ms=0.0,
                     validation_time_ms=0.0, cost_estimate_usd=0.0))
    gt = {f"d{i}": {"dealer_name": "A Motors Ltd", "model_name": "575 DI",
                    "horse_power": 50.0, "asset_cost": 650000.0,
                    "signature_present": bool(i % 2), "stamp_present": False}
          for i in range(40)}
    rep = comprehensive_report(rd.from_items(rows), gt, str(tmp_path))

    for f in ("analysis.json", "error_samples.json", "markdown_report.md",
              "confidence_distribution.svg", "time_vs_confidence.svg",
              "field_extraction_rates.svg", "time_breakdown.svg"):
        assert (tmp_path / f).exists(), f
        if f.endswith(".svg"):
            ET.fromstring((tmp_path / f).read_text())   # well-formed XML
    parsed = json.loads((tmp_path / "analysis.json").read_text())
    assert parsed["total_documents"] == 41
    assert 0.0 < parsed["summary"]["key_metrics"]["average_confidence"] < 1.0
    assert len(parsed["error_samples"]) == 20
    md = (tmp_path / "markdown_report.md").read_text()
    for section in ("Executive Summary", "Field-Level Performance",
                    "Cost Analysis", "Recommendations", "Overall Assessment"):
        assert section in md, section
    # document-level accuracy wired through: all 40 ok docs are correct
    assert rep["document_level_accuracy"]["correct_documents"] == 40
    assert rep["summary"]["target_achievement"]["processing_time_target"]


@pytest.mark.usefixtures("ray_session")
def test_summary_without_timing_columns_is_strict_json():
    """Shards written before the timing/cost columns existed (resume
    across versions) must roll up to finite zeros, not +/-Infinity —
    the summary JSON has to stay strict-JSON serializable."""
    import json

    rows = [_row(doc_id="a", overall_confidence=0.9),
            _row(doc_id="b", overall_confidence=0.4)]
    assert "processing_time_ms" not in rows[0]
    s = summarize_results(rd.from_items(rows))
    ts = s["processing_time_stats"]
    assert (ts["mean_ms"], ts["min_ms"], ts["max_ms"]) == (0.0, 0.0, 0.0)
    assert s["cost_stats"]["mean_usd"] == 0.0
    json.dumps(s, allow_nan=False)   # raises on Infinity/NaN


@pytest.mark.usefixtures("ray_session")
def test_json_output_format():
    """M19: required-format projection with round(4) and the falsy-IoU
    quirk (iou==0.0 renders null, like executable.py:126)."""
    import json

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.stages.output import (
        format_json_output,
    )

    rows = [_row(doc_id="j1", dealer_name="X Motors",
                 dealer_name_confidence=0.123456, overall_confidence=0.98765,
                 signature_present=True, signature_confidence=0.5)]
    rows[0]["signature_bbox"] = [1.0, 2.0, 3.0, 4.0]
    rows[0]["signature_iou"] = 0.0
    rows[0]["stamp_bbox"] = None
    rows[0]["stamp_iou"] = None
    out = format_json_output(rd.from_items(rows)).to_pandas()
    d = json.loads(out.json.iloc[0])
    assert d["dealer_name"] == {"value": "X Motors", "confidence": 0.1235}
    assert d["overall_confidence"] == 0.9877
    assert d["signature"]["present"] is True
    assert d["signature"]["iou"] is None      # falsy-0.0 quirk preserved
    assert d["signature"]["bbox"] == [1.0, 2.0, 3.0, 4.0]


@pytest.mark.usefixtures("ray_session")
def test_timing_and_cost_columns():
    """Per-doc cost model parity (executable.py:473-488): cost ==
    total_sec x $0.01/hr/3600 on CPU; components sum to the total;
    failed docs pin cost to 0.0 (executable.py:403-404)."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.oracle import (
        run_oracle,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.sources.corpus import (
        corpus_tables,
    )

    docs, _ = corpus_tables(160)          # doc 149 is the no-text 'failed' doc
    df = run_oracle(docs).to_pandas()
    ok = df[df.status == "success"]
    assert (ok.processing_time_ms > 0).all()
    comp = (ok.ocr_time_ms + ok.extraction_time_ms
            + ok.detection_time_ms + ok.validation_time_ms)
    assert ((ok.processing_time_ms - comp).abs() < 1e-9).all()
    want_cost = (ok.processing_time_ms / 1000.0) * (0.01 / 3600.0)
    assert ((ok.cost_estimate_usd - want_cost).abs() < 1e-15).all()
    failed = df[df.status == "failed"]
    assert len(failed) >= 1
    assert (failed.cost_estimate_usd == 0.0).all()
    assert (failed.processing_time_ms > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_summary_and_analyses_rollups():
    """Summary time/cost rollups (executable.py:646-667) and the three
    secondary analyses (evaluate.py:349-485) agree with a driver-side
    recomputation from the same result table."""
    import numpy as np

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.evaluate import (
        analyze_confidence,
        analyze_cost,
        analyze_performance,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.oracle import (
        run_oracle,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.sources.corpus import (
        corpus_tables,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_tensor_extension_casting = False
    docs, _ = corpus_tables(120)
    tbl = run_oracle(docs)
    df = tbl.to_pandas()
    ok = df[df.status == "success"]
    ds = rd.from_arrow(tbl)

    s = summarize_results(ds)
    assert abs(s["processing_time_stats"]["mean_ms"]
               - ok.processing_time_ms.mean()) < 1e-9
    assert abs(s["processing_time_stats"]["total_sec"]
               - ok.processing_time_ms.sum() / 1000) < 1e-9
    assert abs(s["cost_stats"]["total_usd"] - ok.cost_estimate_usd.sum()) < 1e-15

    c = analyze_confidence(ds)
    assert c["total_documents"] == len(ok)
    assert c["mean_confidence"] == round(ok.overall_confidence.mean(), 3)
    assert abs(c["median_confidence"]
               - np.median(ok.overall_confidence)) <= 0.001
    hi = int((ok.overall_confidence >= 0.9).sum())
    assert c["confidence_distribution"]["high"]["count"] == hi

    p = analyze_performance(ds)
    t = ok.processing_time_ms / 1000
    assert p["processing_time"]["mean"] == round(t.mean(), 3)
    assert p["processing_time"]["target_30s"] == int((t <= 30).sum())
    # log-histogram median: within 0.6% relative of the exact median
    assert abs(p["processing_time"]["median"] - np.median(t)) <= max(
        0.006 * np.median(t), 2e-3)

    co = analyze_cost(ds)
    assert co["cost_metrics"]["total"] == round(ok.cost_estimate_usd.sum(), 6)
    assert co["target_analysis"]["below_target"] == len(ok)


@pytest.mark.usefixtures("ray_session")
def test_visualization_sink(tmp_path):
    """S8: annotated-page SVG sink — span boxes colored by the 0.7
    confidence threshold (ocr.py:598), detection boxes with class:conf
    labels (detector.py:733-763)."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.oracle import (
        run_oracle,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.sources.corpus import (
        corpus_tables,
    )
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.stages.viz import (
        render_doc_svg,
        write_visualizations,
    )
    from ray.data import DataContext

    DataContext.get_current().enable_tensor_extension_casting = False
    docs, _ = corpus_tables(40)
    tbl = run_oracle(docs)
    rows = tbl.to_pylist()

    svg = render_doc_svg(rows[0])
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert "<rect" in svg
    sig = next((r for r in rows if r["signature_present"]), None)
    if sig is not None:
        s = render_doc_svg(sig)
        assert "signature:" in s and "#00c000" in s

    out = tmp_path / "viz"
    n = write_visualizations(rd.from_arrow(tbl), str(out), limit=10)
    files = list(out.glob("*.svg"))
    assert n == 10 and len(files) == 10
    assert files[0].read_text().startswith("<svg")


def test_extract_calibration_invariants(ray_session) -> None:
    """Calibration bins must conserve the comparable-pair population,
    bound accuracy by population, and report a consistent ECE."""
    import importlib
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo")
    e = importlib.import_module("__ray_entry__")
    df = e.queries()["extract_calibration"]("/root/testdata/sf0.001")
    assert len(df) > 0
    assert (df.n_correct <= df.n_pairs).all()
    assert (df.acc_milli <= 1000).all() and (df.acc_milli >= 0).all()
    assert df.ece_milli.nunique() == 1
    # bins carry their own confidence range: mean conf in [bin/10, (bin+1)/10)
    lo = df.bin.to_numpy() * 100
    hi = (df.bin.to_numpy() + 1) * 100
    assert ((df.conf_milli >= lo) & (df.conf_milli <= hi)).all()
    n = df.n_pairs.to_numpy()
    ece = int(np.abs(n * (df.acc_milli.to_numpy()
                          - df.conf_milli.to_numpy())).sum() // n.sum())
    assert int(df.ece_milli.iloc[0]) == ece
