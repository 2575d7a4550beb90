"""Compiled regex banks — the pattern *data* of the extraction semantics.

Patterns are the observable spec of the reference extractor; they are kept
semantically identical so the rebuilt engine matches it decision-for-
decision.  Sources: normalizer patterns ``utils/normalizer.py:90-146``,
extractor banks ``utils/extractor.py:68-126``, validator patterns
``utils/validator.py:45-47``.  Everything is compiled once at import time
(each Ray worker process pays this exactly once — the actor-pool analog of
the reference's compile-in-ctor).
"""

from __future__ import annotations

import re

from .vocab import COMMON_BRANDS, CURRENCY_SYMBOLS

# ---------------------------------------------------------------- normalizer
_currency_alt = "|".join(re.escape(s) for s in sorted(CURRENCY_SYMBOLS, key=lambda s: (-len(s), s)))
# NOTE: the reference builds the alternation from an (arbitrary-order)
# frozenset; longest-first ordering here gives the deterministic superset
# behavior ("Rs." matches before "Rs") which is what CPython's set order
# happened to give for the common cases exercised by its tests.
CURRENCY_STRIP = re.compile(f"({_currency_alt})[\\s:]*", re.I)

NUMBER = re.compile(r"\d+(?:,\d+)*(?:\.\d+)?")
INDIAN_NUMBER = re.compile(r"\d+(?:,\d{2})*(?:,\d{3})?(?:\.\d+)?")
MULTIPLIER = re.compile(r"(\d+(?:\.\d+)?)\s*(lakh|lac|lakhs|crore|cr|crores)", re.I)

NORM_HP_PATTERNS = (
    re.compile(r"(\d+(?:\.\d+)?)\s*(?:HP|H\.P\.?|Horse\s*Power|BHP)", re.I),
    re.compile(r"(?:HP|H\.P\.?|Horse\s*Power)[\s:]*(\d+(?:\.\d+)?)", re.I),
    re.compile(r"(\d+(?:\.\d+)?)\s*(?:हॉर्स\s*पावर|એચપી|હોર્સ\s*પાવર)", re.I),
    re.compile(r"(\d+(?:\.\d+)?)\s*kw", re.I),
)

NORM_MODEL_PATTERNS = (
    re.compile(r"\b([2-9]\d{2,3}\s*(?:DI|XP|XT|MX|TA|FE|GT|R|S|E|PRO|PLUS)?)\b", re.I),
    re.compile(r"(?:model|type)[\s:]+([A-Za-z0-9\s\-/]{2,30})", re.I),
    re.compile(r"\b(MAHINDRA|SWARAJ|JOHN\s+DEERE)\s+([A-Za-z0-9\s\-]{2,20})", re.I),
)

# PII masks (normalizer.py:117-127) applied in this exact order
PII_RULES: tuple[tuple[re.Pattern, str], ...] = (
    (re.compile(r"\b[\w.%+-]+@[\w.-]+\.[A-Z|a-z]{2,}\b"), "[EMAIL]"),
    (re.compile(r"(?:\+91[\-\s]?)?[6789]\d{9}\b"), "[PHONE]"),
    (re.compile(r"\b[A-Z]{5}\d{4}[A-Z]\b"), "[PAN]"),
    (re.compile(r"\b\d{2}[A-Z]{5}\d{4}[A-Z]\d[Z]\d\b"), "[GST]"),
    (re.compile(r"\b\d{4}\s?\d{4}\s?\d{4}\b"), "[AADHAR]"),
    (re.compile(r"\b\d{1,2}[/\-]\d{1,2}[/\-]\d{2,4}\b"), "[DATE]"),
    (re.compile(r"\b\d{4}[/\-]\d{1,2}[/\-]\d{1,2}\b"), "[DATE]"),
)

WHITESPACE = re.compile(r"\s+")
SPECIAL_CHARS = re.compile(r"[^\w\s.,;:()\-/₹]", re.UNICODE)
NOISE_TABLE = str.maketrans("", "", "|_~`^")

# ---------------------------------------------------------------- extractor
_char = r"[A-Za-z0-9\s&.,()\'\"-]"
DEALER_PATTERNS = (
    re.compile(r"(?:dealer(?:\s+name)?|seller|vendor|supplier|authorized\s+dealer)[\s:]+(" + _char + r"{3,80})", re.I),
    re.compile(r"(?:M/s|M\.s\.|Messrs\.?)[\s:]*(" + _char + r"{3,80})", re.I),
    re.compile(r"(?:name\s+of\s+dealer|dealer\s+name)[\s:]+(" + _char + r"{3,80})", re.I),
    re.compile(r"\b([A-Z]" + _char + r"{2,60}(?:PVT\.?\s*LTD\.?|PRIVATE\s+LIMITED|LTD\.?|LIMITED|ENTERPRISES|TRADERS|MOTORS|TRACTORS|AUTOMOBILES))\b", re.I),
    re.compile(r"\b([A-Z]" + _char + r"{3,50})\s*(?:AT|POST|VILLAGE|TALUKA|DIST|ADDRESS)", re.I),
    re.compile(r"(?:QUOTATION|INVOICE|PROFORMA)\s+(?:FROM|BY)[\s:]+(" + _char + r"{3,80})", re.I),
    re.compile(r"(?:डीलर|ડીલર|विक्रेता)[\s:]+([^\n]{3,60})", re.I),
)

_brand_alt = "|".join(sorted(COMMON_BRANDS, key=lambda s: (-len(s), s)))
EXT_MODEL_PATTERNS = (
    re.compile(r"(?:model(?:\s+name)?|tractor\s+model|model\s+no\.?)[\s:]+([A-Za-z0-9\s\-/]{2,40})", re.I),
    re.compile(r"\b((?:[A-Z]+\s+)?[2-9]\d{2,3}\s*(?:DI|XP|XT|MX|TA|FE|GT|PRO|PLUS|POWER)?)\b", re.I),
    re.compile(r"(?:variant|type)[\s:]+([A-Za-z0-9\s\-/]{2,40})", re.I),
    re.compile(r"(?:मॉडल|મોડેલ)[\s:]+([^\n]{2,40})", re.I),
    re.compile(r"\b(" + _brand_alt + r")\s+([A-Z0-9\s\-/]{2,20})\b", re.I),
)

EXT_HP_PATTERNS = (
    re.compile(r"(?:horse\s*power|hp|h\.p\.|bhp|power)[\s:]*(\d+(?:\.\d+)?)", re.I),
    re.compile(r"(\d+(?:\.\d+)?)\s*(?:hp|bhp|h\.p\.)", re.I),
    re.compile(r"(\d+(?:\.\d+)?)\s*kw", re.I),
    re.compile(r"(?:हॉर्स\s*पावर|શક્તિ)[\s:]*(\d+(?:\.\d+)?)", re.I),
    re.compile(r"(?:engine|capacity)[\s:]*(\d+)\s*hp", re.I),
)

EXT_COST_PATTERNS = (
    re.compile(r"(?:total\s*(?:cost|price|amount)|asset\s*cost|price|ex-?showroom|grand\s+total)[\s:]*[₹$Rs.]*\s*([0-9,]+(?:\.[0-9]+)?)", re.I),
    re.compile(r"[₹]\s*([0-9,]+(?:\.[0-9]+)?)", re.I),
    re.compile(r"(?:Rs\.?|INR)[\s]*([0-9,]+(?:\.[0-9]+)?)", re.I),
    re.compile(r"([0-9,]+(?:\.[0-9]+)?)\s*(lakh|lac|crore|cr)", re.I),
    re.compile(r"(?:payable|amount\s+payable)[\s:]*[₹$Rs.]*\s*([0-9,]+)", re.I),
    re.compile(r"(?:net\s+amount|final\s+amount)[\s:]*[₹$Rs.]*\s*([0-9,]+)", re.I),
)

SIMPLE_NUMBER = re.compile(r"\d+(?:\.\d+)?")          # extractor.py:218
DEALER_PREFIX_STRIP = re.compile(r"^(?:M/s|M\.s\.|Messrs\.?|Ms\.?|Sri|Shri)\s*", re.I)
TRAILING_PUNCT = re.compile(r"[,.:;]+$")
PVT_LTD_STD = re.compile(r"\s*(?:Pvt\.?\s*Ltd\.?|Private\s+Limited)\s*$", re.I)
LTD_STD = re.compile(r"\s*(?:Ltd\.?|Limited)\s*$", re.I)
BRAND_TAIL = re.compile(r"^[:\s]*([A-Z0-9\s\-/]{2,20})", re.I)  # extractor.py:415
WORD_TRAILING_PUNCT = re.compile(r"[,:;.]$")           # normalizer.py:354

# ------------------------------------------------------- fast predicates
# compiled alternations, boolean-equivalent to `any(term in text)` scans
# but evaluated in C (hot path: every block of every document)
from .vocab import BUSINESS_SUFFIXES as _SUF, DEALER_REJECT_TERMS as _REJ

DIGIT_SEARCH = re.compile(r"\d")
SUFFIX_SEARCH = re.compile("|".join(re.escape(x) for x in sorted(_SUF, key=len, reverse=True)))
BRAND_SEARCH = re.compile("|".join(re.escape(x) for x in sorted(COMMON_BRANDS, key=len, reverse=True)))
REJECT_SEARCH = re.compile("|".join(re.escape(x) for x in sorted(_REJ, key=len, reverse=True)))

# ---------------------------------------------------------------- validator
VAL_MODEL_PATTERN = re.compile(r"\b([2-9]\d{2,3}\s*(?:[A-Z]{1,3})?)\b", re.I)
VAL_DIGIT = re.compile(r"\d")
VAL_SPECIAL_CHAR = re.compile(r"[^a-zA-Z0-9\s&.,()-]")
