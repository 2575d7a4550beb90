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
