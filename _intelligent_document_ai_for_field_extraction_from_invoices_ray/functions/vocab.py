"""Vocabulary & constant tables driving the extraction semantics.

Everything here is *data*, not behavior: keyword sets, brand lists,
validation ranges, field weights and the model→HP lookup.  The values
mirror the reference's decision tables so the rebuilt engine makes the
same decisions (semantics parity targets, per file:line):

- currency symbols / language keyword sets: ``utils/normalizer.py:33-67``
- brands / business suffixes / ranges:      ``utils/extractor.py:31-54``
- field weights:                            ``utils/extractor.py:22-29``
- section keywords:                         ``utils/extractor.py:121-126``
- validator suffixes, brands, HP-range map: ``utils/validator.py:50-93``
- extractor point-estimate model→HP map:    ``utils/extractor.py:41-46``
"""

from __future__ import annotations

# --- currency -----------------------------------------------------------
CURRENCY_SYMBOLS = frozenset([
    "₹", "Rs", "Rs.", "INR", "रु", "रु.", "रुपए", "રૂ", "રૂ.", "રૂપિયા",
    "$", "USD", "€", "EUR", "£", "GBP", "¥", "JPY", "र", "रू",
])

# subset used by the extractor's per-block currency flag (utils/extractor.py:204)
BLOCK_CURRENCY_MARKS = ("₹", "Rs", "INR", "$")

# --- unicode script ranges (normalizer.py:39-41 / ocr.py:328-333) -------
DEVANAGARI = (0x0900, 0x097F)
GUJARATI = (0x0A80, 0x0AFF)
LATIN_UPPER = (0x0041, 0x005A)
LATIN_LOWER = (0x0061, 0x007A)

# --- multilingual keyword families (normalizer.py:44-67) ----------------
KEYWORD_FAMILIES: dict[str, frozenset[str]] = {
    "dealer": frozenset([
        "dealer", "seller", "vendor", "supplier", "distributor", "authorized",
        "डीलर", "विक्रेता", "वेंडर", "ડીલર", "વેચનાર", "વિતરક",
    ]),
    "model": frozenset([
        "model", "type", "variant", "version", "tractor",
        "मॉडल", "प्रकार", "किस्म", "મોડેલ", "પ્રકાર", "વિવિધતા",
    ]),
    "horse_power": frozenset([
        "horse power", "hp", "h.p.", "h.p", "power", "bhp",
        "हॉर्स पावर", "एचपी", "शक्ति", "હોર્સ પાવર", "શક્તિ",
    ]),
    "cost": frozenset([
        "cost", "price", "amount", "total", "value", "asset cost", "ex-showroom",
        "लागत", "मूल्य", "राशि", "कुल", "ખર્ચ", "કિંમત", "રકમ", "કુલ",
    ]),
    "invoice": frozenset([
        "invoice", "bill", "quotation", "quote", "estimate", "proforma",
        "बीजक", "बिल", "કોટેશન", "બિલ",
    ]),
}

# --- extractor section keywords (extractor.py:121-126) ------------------
SECTION_KEYWORDS: dict[str, frozenset[str]] = {
    "dealer": frozenset(["dealer", "seller", "vendor", "supplier", "authorized", "distributor"]),
    "model": frozenset(["model", "tractor", "variant", "type", "specification", "vehicle"]),
    "specs": frozenset(["specification", "specs", "technical", "engine", "power", "capacity"]),
    "financial": frozenset(["cost", "price", "amount", "total", "payment", "invoice", "payable"]),
}

# --- brands & suffixes --------------------------------------------------
COMMON_BRANDS = frozenset([
    "MAHINDRA", "SWARAJ", "ESCORTS", "EICHER", "JOHN DEERE",
    "CASE", "NEW HOLLAND", "SONALIKA", "KUBOTA", "MASSEY FERGUSON",
    "ACE", "PREET", "CAPTAIN", "POWERTRAC", "VST", "FARMTRAC",
    "TAFE", "INDO FARM", "STANDARD", "SAME DEUTZ-FAHR", "DEUTZ",
])

BUSINESS_SUFFIXES = (
    "PVT LTD", "PRIVATE LIMITED", "LTD", "LIMITED",
    "CORPORATION", "CORP", "INC", "ENTERPRISES",
    "TRADERS", "MOTORS", "TRACTORS", "INDUSTRIES",
    "SALES", "SERVICES", "CO", "AND CO", "& CO",
    "DEALERSHIP", "AGENCY", "DISTRIBUTOR", "AUTOMOBILES",
)

DEALER_REJECT_TERMS = (
    "QUOTATION", "INVOICE", "PROFORMA", "DATE", "ADDRESS",
    "PHONE", "EMAIL", "MOBILE", "GST", "PAN", "BILL", "TAX",
    "CUSTOMER", "BUYER", "PURCHASER",
)

# validator's lowercase dealer-suffix set (validator.py:50-54)
DEALER_SUFFIXES_LOWER = frozenset([
    "tractors", "motors", "agency", "enterprises", "pvt", "ltd",
    "limited", "company", "corp", "inc", "dealer", "distributor",
    "trading", "sales", "services", "automotive", "machinery",
])

# validator's brand set drops the two DEUTZ entries (validator.py:56-61)
VALIDATOR_BRANDS = frozenset(COMMON_BRANDS - {"SAME DEUTZ-FAHR", "DEUTZ"})

# --- numeric ranges -----------------------------------------------------
EXTRACTOR_HP_RANGE = (20.0, 120.0)          # extractor.py:38
EXTRACTOR_COST_RANGE = (50_000.0, 5_000_000.0)  # extractor.py:39
VALIDATOR_HP_RANGE = (10.0, 150.0)          # validator.py:91
VALIDATOR_COST_RANGE = (50_000.0, 10_000_000.0)  # validator.py:92
COST_PER_HP_RANGE = (8_000.0, 25_000.0)     # validator.py:93
NORMALIZER_HP_RANGE = (10.0, 150.0)         # normalizer.py:301-302
KW_TO_HP = 1.34

# --- field weights (extractor.py:22-29 == validator.py:96-127) ----------
FIELD_WEIGHTS: dict[str, float] = {
    "dealer_name": 0.20,
    "model_name": 0.25,
    "horse_power": 0.20,
    "asset_cost": 0.25,
    "signature": 0.05,
    "stamp": 0.05,
}
VALUE_FIELDS = ("dealer_name", "model_name", "horse_power", "asset_cost")
BINARY_FIELDS = ("signature", "stamp")

# per-field confidence clamp (validator.py:30-31 FieldConfig defaults)
FIELD_MIN_CONFIDENCE = 0.30
FIELD_MAX_CONFIDENCE = 0.98

# --- model→HP tables ----------------------------------------------------
# point estimates used by the extractor cross-check (extractor.py:41-46)
MODEL_HP_POINT: dict[str, float] = {
    "275": 35, "475": 42, "575": 50, "595": 50, "605": 51,
    "265": 31, "475 DI": 45, "585": 48, "595 DI": 55,
    "735": 40, "744": 48, "855": 55, "963": 63,
    "DI": 50, "XP": 55, "XT": 60, "MX": 65, "3630": 55,
}

# ranges used by the validator cross-check (validator.py:75-88).
# NOTE: insertion order matters — the partial-match scan iterates in
# insertion order and returns the first hit (validator.py:454-457).
MODEL_HP_RANGES: dict[str, tuple[int, int]] = {
    "265": (28, 35), "275": (32, 38), "475": (40, 48),
    "485": (43, 51), "575": (47, 55), "585": (48, 56),
    "595": (50, 58), "605": (53, 63), "275 DI": (32, 38),
    "475 DI": (42, 50), "575 DI": (48, 56), "595 DI": (52, 62),
    "735": (38, 45), "744": (45, 52), "855": (52, 60), "963": (60, 68),
    "3600": (48, 56), "4710": (52, 60), "5620": (60, 68),
    "DI": (40, 60), "XP": (48, 62), "XT": (53, 68),
    "MX": (58, 72), "GT": (65, 78), "PRO": (55, 70),
}

# --- Indian number multipliers (normalizer.py:134-141) ------------------
INDIAN_MULTIPLIERS: dict[str, float] = {
    "lakh": 100_000, "lac": 100_000, "lakhs": 100_000,
    "crore": 10_000_000, "cr": 10_000_000, "crores": 10_000_000,
}

# --- media classification (deterministic stand-in for YOLO) -------------
# class names / default thresholds mirror utils/detector.py:57-58
MEDIA_CLASS_NAMES = ("signature", "stamp", "other")
MEDIA_CONF_THRESHOLDS = {"signature": 0.4, "stamp": 0.5}
MEDIA_NMS_IOU = 0.5        # detector.py:273 _fast_nms default
MEDIA_PAGE_W, MEDIA_PAGE_H = 1000, 1400   # synthetic page geometry
# area gates relative to page area (detector.py:243)
MEDIA_AREA_MIN_FRAC, MEDIA_AREA_MAX_FRAC = 0.00005, 0.6

# --- text quality / training-data ops -----------------------------------
STOPWORDS = frozenset([
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "this", "that",
])
