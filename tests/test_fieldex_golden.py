"""Golden field-extraction + validation cases.

Ported from the reference's inline harnesses:
- the 4 extractor scenarios (utils/extractor.py:761-820)
- the validator good/bad documents (utils/validator.py:755-779)

Expected values were hand-traced through the reference logic (pattern
banks, boosts, caps, dedup-argmax, rule multipliers, cross-validations)
and include its *quirks*: scenario 1's model comes from the dealer header
via the brand pattern (higher-confidence block), scenario 4's dealer
rejects "SINGH AUTOMOBILES LTD" because "MOBILE" is a reject term
(extractor.py:342), etc.
"""

import pytest

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    fieldex as F,
    validate as VA,
)


def blocks(rows):
    return [
        {"text": t, "bbox": [0, 0, 10, 10], "confidence": c, "language": "en"}
        for t, c in rows
    ]


S1 = blocks([
    ("M/s Mahindra Tractors Pvt Ltd", 0.95),
    ("Village: Rampur, Meerut, UP", 0.90),
    ("QUOTATION", 0.96),
    ("Model: SWARAJ 744 FE", 0.94),
    ("Engine Specifications", 0.92),
    ("Horse Power: 48 HP", 0.96),
    ("Financial Details", 0.93),
    ("Ex-showroom Price: ₹6,85,000", 0.92),
    ("Grand Total: ₹6,85,000", 0.94),
])

S2 = blocks([
    ("RAJESH MOTORS PRIVATE LIMITED", 0.94),
    ("Authorized Tractor Dealer", 0.91),
    ("Mahindra 575 DI", 0.95),
    ("Power: 50 HP", 0.93),
    ("Total Amount: Rs. 5,25,000/-", 0.90),
])

S3 = blocks([
    ("KUMAR TRACTORS AND SERVICES", 0.92),
    ("Village: Rampur, Dist: Meerut", 0.88),
    ("Tractor Model: New Holland 3630", 0.93),
    ("Engine Capacity: 55 HP", 0.91),
    ("Price: 7.45 Lakh", 0.89),
    ("Grand Total: 7.45 Lakh", 0.92),
])

S4 = blocks([
    ("SINGH AUTOMOBILES LTD", 0.93),
    ("Tractor Sales & Service", 0.90),
    ("Sonalika DI 60", 0.94),
    ("60 HP Engine", 0.92),
    ("₹ 8,50,000", 0.91),
])


def test_scenario1_complete_invoice():
    r = F.extract_fields(S1)
    assert r["dealer_name"]["value"] == "Mahindra Tractors Pvt Ltd"
    assert r["dealer_name"]["confidence"] == pytest.approx(0.96)  # capped suffix boost
    # faithful quirk: the 0.95-conf header beats the 0.94 model line through
    # the brand pattern, so the winning model is the dealer header
    assert r["model_name"]["value"] == "MAHINDRA TRACTORS PVT LTD"
    assert r["horse_power"]["value"] == 48.0
    assert r["asset_cost"]["value"] == 685000
    assert r["asset_cost"]["source"] == "pattern"


def test_scenario2_business_suffix():
    r = F.extract_fields(S2)
    assert r["dealer_name"]["value"] == "RAJESH MOTORS Pvt Ltd"   # standardized suffix
    assert r["model_name"]["value"] == "MAHINDRA 575 DI"
    assert r["horse_power"]["value"] == 50.0
    assert r["horse_power"]["confidence"] == pytest.approx(0.93 * 0.91 * 1.08)
    assert r["asset_cost"]["value"] == 525000


def test_scenario3_lakh_format():
    r = F.extract_fields(S3)
    assert r["dealer_name"]["value"] == "KUMAR TRACTORS"  # company pattern stops at suffix
    assert r["model_name"]["value"] == "NEW HOLLAND 3630"
    assert r["horse_power"]["value"] == 55.0
    assert r["asset_cost"]["value"] == 745000             # 7.45 Lakh -> 745000


def test_scenario4_no_labels():
    r = F.extract_fields(S4)
    # "SINGH AUTOMOBILES LTD" is rejected: "MOBILE" is a reject term
    assert r["dealer_name"]["value"] == "Tractor Sales & Service"
    assert r["dealer_name"]["source"] == "business_suffix"
    assert r["model_name"]["value"] == "SONALIKA DI 60"
    assert r["horse_power"]["value"] == 60.0
    assert r["asset_cost"]["value"] == 850000


def test_validator_good_document():
    doc = {
        "dealer_name": {"value": "Mahindra Tractors Pvt Ltd", "confidence": 0.88},
        "model_name": {"value": "575 DI", "confidence": 0.85},
        "horse_power": {"value": 50.0, "confidence": 0.82},
        "asset_cost": {"value": 650000.0, "confidence": 0.86},
        "signature": {"present": True, "confidence": 0.75, "bbox": [100, 400, 200, 450]},
        "stamp": {"present": True, "confidence": 0.72, "bbox": [250, 400, 350, 480]},
    }
    v = VA.validate_document(doc)
    # all four value fields boost past the 0.98 clamp
    for f in ("dealer_name", "model_name", "horse_power", "asset_cost"):
        assert v[f]["confidence"] == pytest.approx(0.98)
    assert v["signature"]["confidence"] == pytest.approx(0.75 * 1.10 * 1.08)
    assert v["stamp"]["confidence"] == pytest.approx(0.72 * 1.10 * 1.08)
    assert v["overall_confidence"] == pytest.approx(0.969318, abs=1e-6)


def test_validator_bad_document():
    doc = {
        "dealer_name": {"value": "XYZ123!@#", "confidence": 0.65},
        "model_name": {"value": "999", "confidence": 0.60},
        "horse_power": {"value": 30.0, "confidence": 0.55},
        "asset_cost": {"value": 5000.0, "confidence": 0.50},
    }
    v = VA.validate_document(doc)
    assert v["dealer_name"]["confidence"] == pytest.approx(0.65 * 1.05)
    assert v["model_name"]["confidence"] == pytest.approx(0.60 * 1.20 * 1.10)
    # hp: range boosts then severe HP-cost mismatch x0.65
    assert v["horse_power"]["confidence"] == pytest.approx(0.55 * 1.15 * 1.08 * 1.05 * 0.65)
    assert v["asset_cost"]["confidence"] == pytest.approx(0.50 * 1.06 * 0.65)
    assert v["overall_confidence"] == pytest.approx(0.570965, abs=1e-5)


def test_model_hp_cross_validation_penalty():
    # mismatched HP for a mapped model gets x0.75 on both fields
    doc = {
        "dealer_name": {"value": None, "confidence": 0.0},
        "model_name": {"value": "575 DI", "confidence": 0.50},
        "horse_power": {"value": 90.0, "confidence": 0.50},
        "asset_cost": {"value": None, "confidence": 0.0},
    }
    v = VA.validate_document(doc)
    # model: pattern+digits boosts then x0.75; hp boosts then x0.75
    assert v["model_name"]["confidence"] == pytest.approx(0.50 * 1.20 * 1.10 * 0.75)
    assert v["horse_power"]["confidence"] == pytest.approx(0.50 * 1.15 * 1.08 * 1.05 * 0.75)


def test_model_hp_range_lookup_order():
    assert VA.find_model_hp_range("575 DI") == (48, 56)   # exact beats partial
    assert VA.find_model_hp_range("575") == (47, 55)
    assert VA.find_model_hp_range("SWARAJ 744 FE") == (45, 52)  # partial '744'
    assert VA.find_model_hp_range("UNKNOWN") is None


def test_dedup_argmax_keeps_max_per_value():
    cands = [
        {"value": 50.0, "confidence": 0.6, "source": "a", "bbox": None},
        {"value": 50.0, "confidence": 0.9, "source": "b", "bbox": None},
        {"value": 55.0, "confidence": 0.7, "source": "c", "bbox": None},
    ]
    best = F._dedup_argmax(cands)
    assert best["value"] == 50.0 and best["source"] == "b"


def test_custom_rule_extension():
    rb = VA.RuleBook()
    rb.add_custom_rule("asset_cost", VA.Rule("gst_round", lambda x: x % 500 == 0, 1.5))
    doc = {"asset_cost": {"value": 100500.0, "confidence": 0.5},
           "dealer_name": {"value": None, "confidence": 0.0},
           "model_name": {"value": None, "confidence": 0.0},
           "horse_power": {"value": None, "confidence": 0.0}}
    v = VA.validate_document(doc, rb)
    # in_valid_range 1.15, custom boost 1.5 (other boosts fail silently)
    assert v["asset_cost"]["confidence"] == pytest.approx(0.5 * 1.15 * 1.5)


def test_fuzzy_second_generation_chain():
    """Strategy 4 iterates the LIVE candidate list while appending
    (extractor.py:297-307): the appended fuzzy candidate is re-matched at
    pct≈100 against its own master entry and spawns a second-generation
    candidate with confidence ×(100/90), capped at 0.97; the `seen` set
    terminates the chain. Pins the live-iteration semantics end-to-end."""
    bl = F.prepare_blocks(blocks([("RAJESH MOTORS PRIVATE LIMITED", 0.70)]))
    master = ["Rajesh Motors Co Pvt Ltd"]

    base = F.extract_dealer_name(bl)                     # pattern candidate
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions.fuzzy import (
        token_sort_ratio,
    )
    pct = token_sort_ratio(base["value"], master[0])
    assert 75 < pct < 96                                 # sub-cap regime
    gen1 = min(base["confidence"] * (pct / 90), 0.97)
    gen2 = min(gen1 * (100 / 90), 0.97)

    out = F.extract_dealer_name(bl, dealer_master=master)
    assert out["source"] == "fuzzy_match"
    assert out["value"] == master[0]
    assert out["confidence"] == pytest.approx(gen2)      # NOT gen1 (snapshot)
    assert out["confidence"] > gen1
