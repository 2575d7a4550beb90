"""The per-partition extraction memos are perf details, not semantics:
memo-on and memo-off paths must be bit-identical, including on repeated
text (hit path) and after rulebook mutation (id-keyed rules memo).

Covers fieldex._text_features/_clean_valid/_dealer_pattern_names/
_model_pattern_hits/_brand_context_hits/_hp_pattern_hits/
_cost_pattern_hits and validate.apply_field_rules."""
import copy

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    fieldex as F,
    validate as VA,
)

_TEXTS = [
    "Dealer: RAJESH MOTORS PVT LTD",
    "M/s Sharma Tractors Limited",
    "MAHINDRA 575 DI Model",
    "Total Amount: Rs 5,25,000",
    "Horse Power: 45 HP",
    "Engine 33.5 kw rating",
    "Price 5.5 lakh only",
    "dealer: lowercase should fail",
    "Specifications: engine details",
    "quotation for SWARAJ 744 FE",
]


def _blocks(texts):
    return [{"text": t, "bbox": [0, i * 10, 100, i * 10 + 10],
             "confidence": 0.7 + (i % 3) * 0.1, "language": "en"}
            for i, t in enumerate(texts)]


def _strip_priv(r):
    return r


def test_extract_fields_memo_equivalence_repeated_texts():
    # 30 docs cycling the same 10 lines => high memo hit rate; one shared
    # memo across docs (the per-partition shape assemble uses)
    memo = {}
    docs = [_blocks(_TEXTS[i % len(_TEXTS)] for i in range(j, j + 6))
            for j in range(30)]
    with_memo = [F.extract_fields(copy.deepcopy(d), memo=memo) for d in docs]
    without = [F.extract_fields(copy.deepcopy(d)) for d in docs]
    assert with_memo == without
    # the memo actually populated (hit path exercised, not vacuous)
    assert any(k[0] == "blk" for k in memo)
    assert any(k[0] in ("dpn", "mpn", "hpn", "cpn", "bcx") for k in memo)


def test_dealer_master_fuzzy_with_memo():
    memo = {}
    bl = F.prepare_blocks(_blocks(["Dealer: RAJESH MOTORS PVT LTD"]), memo=memo)
    master = ["RAJESH MOTORS PRIVATE LIMITED", "OTHER TRACTORS"]
    a = F.extract_dealer_name(bl, dealer_master=master, memo=memo)
    b = F.extract_dealer_name(
        F.prepare_blocks(_blocks(["Dealer: RAJESH MOTORS PVT LTD"])),
        dealer_master=master)
    assert a == b


def test_apply_field_rules_memo_identical_and_rulebook_mutation_safe():
    rb = VA.RuleBook()
    memo = {}

    def run(rulebook, memo_):
        doc = {
            "dealer_name": {"value": "RAJESH MOTORS Pvt Ltd", "confidence": 0.8},
            "model_name": {"value": "MAHINDRA 575", "confidence": 0.8},
            "horse_power": {"value": 45.0, "confidence": 0.8},
            "asset_cost": {"value": 525000, "confidence": 0.8},
            "signature": {"present": True, "bbox": None, "confidence": 0.7},
            "stamp": {"present": False, "bbox": None, "confidence": 0.0},
        }
        return VA.validate_document(doc, rulebook, memo=memo_)

    first = run(rb, memo)
    again = run(rb, memo)          # memo hit path
    plain = run(rb, None)          # unmemoized reference
    assert first == again == plain

    # mutate the rulebook: rules tuple is REPLACED (new id) — the memo
    # must not serve the old outcome for the new rules
    rb.add_custom_rule("horse_power", VA.Rule(
        name="custom_floor", condition=lambda v: v > 100,
        multiplier=0.5, is_boost=False, severity="warn"))
    mutated = run(rb, memo)
    mutated_plain = run(rb, None)
    assert mutated == mutated_plain
    assert mutated["horse_power"]["confidence"] != plain["horse_power"]["confidence"]


def test_memo_value_type_distinction():
    # True==1 hash-equal: the rules memo must not conflate them
    rules = (VA.Rule(name="is_int", condition=lambda v: str(v) == "1",
                     multiplier=1.5, is_boost=True, severity="info"),)
    memo = {}
    d_int = {"value": 1, "confidence": 0.5}
    d_bool = {"value": True, "confidence": 0.5}
    VA.apply_field_rules(d_int, rules, "asset_cost", memo=memo)
    VA.apply_field_rules(d_bool, rules, "asset_cost", memo=memo)
    d_int2 = {"value": 1, "confidence": 0.5}
    d_bool2 = {"value": True, "confidence": 0.5}
    VA.apply_field_rules(d_int2, rules, "asset_cost")
    VA.apply_field_rules(d_bool2, rules, "asset_cost")
    assert d_int == d_int2
    assert d_bool == d_bool2
