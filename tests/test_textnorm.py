"""Normalizer semantics — golden cases ported from the reference's inline
harness (utils/normalizer.py:630-696) and its documented behaviors."""

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions import (
    textnorm as T,
)


def test_pii_masking():
    assert T.mask_pii("Contact: dealer@email.com") == "Contact: [EMAIL]"
    # the +91 prefix is part of the pattern and gets masked too
    assert T.mask_pii("Phone: +91 9876543210") == "Phone: [PHONE]"
    # bare 10-digit starting 6-9
    assert T.mask_pii("call 9876543210 now") == "call [PHONE] now"
    assert T.mask_pii("PAN: ABCDE1234F") == "PAN: [PAN]"
    assert T.mask_pii("GST: 27ABCDE1234F1Z5") == "GST: [GST]"
    assert T.mask_pii("Aadhar: 1234 5678 9012") == "Aadhar: [AADHAR]"
    assert T.mask_pii("Date: 15/01/2024") == "Date: [DATE]"
    assert T.mask_pii("on 2024-01-15 ok") == "on [DATE] ok"


def test_normalize_text_chain():
    # currency stripped, noise chars dropped, specials spaced, lowered
    assert T.normalize_text("Price: ₹5,25,000") == "price: 5,25,000"
    assert T.normalize_text("Total Cost: Rs. 4.5 lakh") == "total cost: 4.5 lakh"
    assert T.normalize_text("A|B_C~D`E^F") == "abcdef"
    assert T.normalize_text("Hello@World!") == "hello world"
    # long mixed-case string goes through the full chain
    assert T.normalize_text("  Many   Spaces  Here ") == "many spaces here"
    # short lowercase ascii takes the fast path -> inner spaces preserved
    assert T.normalize_text("  many   spaces  ") == "many   spaces"


def test_normalize_fast_path():
    # short lowercase ascii strings bypass the chain (normalizer.py:175-176)
    assert T.normalize_text("abc@def!") == "abc@def!"          # fast path keeps specials
    assert T.normalize_text("x" * 25 + "@!") != "x" * 25 + "@!"  # long -> full chain


def test_extract_numbers_indian():
    # multipliers first, then plain numbers, order-preserving dedup
    assert T.extract_numbers("Total Cost: Rs. 4.5 lakh") == [450000.0, 4.5]
    assert T.extract_numbers("2.5 crore rupees") == [25000000.0, 2.5]
    # faithful quirk: the indian-number regex's greedy (?:,\d{2})* consumes
    # ",00" of the final group, so "5,25,000" parses as 52500 (the trailing
    # lone 0 is filtered by the 0<n gate) — exactly like the reference
    assert T.extract_numbers("₹5,25,000 and 42") == [52500.0, 42.0]
    assert T.extract_numbers("nothing here") == []
    # 0 < n < 1e12 gate
    assert T.extract_numbers("0 and 999999999999999") == []


def test_extract_horse_power():
    assert T.extract_horse_power("Horse Power: 50 HP") == 50.0
    assert T.extract_horse_power("48 HP engine") == 48.0
    assert T.extract_horse_power("37.3 kW") == round(37.3 * 1.34, 1)
    assert T.extract_horse_power("5 HP") is None          # below 10
    assert T.extract_horse_power("500 HP") is None        # above 150
    # adjacency fallback: number next to a power word
    assert T.extract_horse_power("power 55 rated") == 55.0


def test_extract_model_name():
    assert T.extract_model_name("Model: 575 DI") == "575 DI"
    assert T.extract_model_name("SWARAJ 744 FE") == "744 FE"   # first pattern hits digits
    assert T.extract_model_name("Type: Farmtrac 60") == "FARMTRAC 60"
    # faithful quirk: the keyword fallback takes whatever word follows
    # "model", even prose (normalizer.py:347-356)
    assert T.extract_model_name("no model here") == "HERE"
    assert T.extract_model_name("plain text only") is None


def test_detect_language_variants():
    assert T.detect_language("Dealer: Mahindra Tractors") == "en"
    assert T.detect_language("विक्रेता नाम मूल्य") == "hi"
    assert T.detect_language("ડીલર કિંમત રકમ") == "gu"
    assert T.detect_language("") == "unknown"
    assert T.detect_language("12345") == "unknown"
    # OCR variant codes + >30% rule
    assert T.detect_language_ocr("Mahindra") == "eng"
    assert T.detect_language_ocr("विक्रेता") == "hin"
    assert T.detect_language_ocr("ડીલર") == "guj"
    assert T.detect_language_ocr("ab विक्रेता cd") in ("mixed", "hin")


def test_keywords_and_flags():
    kw = T.detect_keyword_families("authorized dealer price total")
    assert kw["dealer"] and kw["cost"]
    assert not kw["model"]
    assert T.has_currency_symbol("₹ 100")
    assert T.has_currency_symbol("Rs 100")
    assert not T.has_currency_symbol("100 only")
    assert T.has_business_suffix("Rajesh Motors Pvt Ltd")
    assert not T.has_business_suffix("plain text")
