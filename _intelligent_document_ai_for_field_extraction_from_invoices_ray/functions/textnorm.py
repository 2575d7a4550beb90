"""Text normalization & scalar extraction semantics.

Pure functions (no state beyond the compiled patterns), so the Ray
pipeline stages and the single-process oracle share the exact same code
path — a deliberate design decision to keep float/text results identical
bit-for-bit across both (see SURVEY.md §7.4 "Float determinism").

Semantics parity targets in the reference:
- ``normalize_text``      utils/normalizer.py:153-208 (NFKC → PII → currency
                          strip → noise translate → special-char sub →
                          whitespace collapse → lower, with the ascii fast path)
- ``mask_pii``            utils/normalizer.py:210-231
- ``extract_numbers``     utils/normalizer.py:233-277 (multipliers first,
                          order-preserving dedup, 0<n<1e12 gate)
- ``extract_horse_power`` utils/normalizer.py:279-324 (4 patterns + kW×1.34 +
                          10..150 gate + adjacency fallback)
- ``extract_model_name``  utils/normalizer.py:326-362 (lastindex group pick +
                          keyword-adjacency fallback)
- ``detect_language``     two variants: the normalizer's >60% rule returning
                          'en'/'hi'/'gu'/'mixed'/'unknown'
                          (utils/normalizer.py:364-405) and the OCR module's
                          >30% rule returning 'eng'/'hin'/'guj'/'mixed'
                          (utils/ocr.py:314-348) — the pipeline tags spans
                          with the OCR variant, exactly like the reference.
- keyword tagging         utils/normalizer.py:463-483
"""

from __future__ import annotations

import unicodedata

from . import patterns as P
from . import vocab as V


# ----------------------------------------------------------------- normalize
def mask_pii(text: str) -> str:
    for pat, repl in P.PII_RULES:
        text = pat.sub(repl, text)
    return text


def normalize_text(text: str, preserve_case: bool = False, remove_pii: bool = True) -> str:
    if not text or not isinstance(text, str):
        return ""
    # ascii fast path (normalizer.py:175-176): short, already-lowercase
    # ascii strings skip the whole chain
    if text.isascii() and len(text) < 20 and text.islower():
        return text.strip()
    text = unicodedata.normalize("NFKC", text)
    if remove_pii:
        text = mask_pii(text)
    text = P.CURRENCY_STRIP.sub("", text)
    text = text.translate(P.NOISE_TABLE)
    text = P.SPECIAL_CHARS.sub(" ", text)
    text = P.WHITESPACE.sub(" ", text).strip()
    if not preserve_case:
        text = text.lower()
    return text


# ----------------------------------------------------------------- numbers
def extract_numbers(text: str, handle_indian: bool = True) -> list[float]:
    numbers: list[float] = []
    if handle_indian:
        for m in P.MULTIPLIER.finditer(text):
            try:
                numbers.append(float(m.group(1)) * V.INDIAN_MULTIPLIERS.get(m.group(2).lower(), 1))
            except ValueError:
                continue
    pat = P.INDIAN_NUMBER if handle_indian else P.NUMBER
    for m in pat.finditer(text):
        try:
            num = float(m.group().replace(",", ""))
        except ValueError:
            continue
        if 0 < num < 1e12:
            numbers.append(num)
    return list(dict.fromkeys(numbers))


def simple_numbers(text: str) -> list[float]:
    """Comma-stripped plain numbers (utils/extractor.py:214-223)."""
    out: list[float] = []
    for m in P.SIMPLE_NUMBER.finditer(text.replace(",", "")):
        try:
            out.append(float(m.group()))
        except ValueError:
            pass
    return out


# ----------------------------------------------------------------- HP / model
def extract_horse_power(text: str) -> float | None:
    lo, hi = V.NORMALIZER_HP_RANGE
    for pat in P.NORM_HP_PATTERNS:
        m = pat.search(text)
        if m:
            hp = float(m.group(1))
            if "kw" in text.lower():
                hp *= V.KW_TO_HP
            if lo <= hp <= hi:
                return round(hp, 1)
    words = text.lower().split()
    for i, word in enumerate(words):
        if any(kw in word for kw in ("hp", "power", "हॉर्स", "શક્તિ")):
            for off in (-1, 1):
                j = i + off
                if 0 <= j < len(words):
                    try:
                        hp = float(words[j].replace(",", ""))
                    except ValueError:
                        continue
                    if lo <= hp <= hi:
                        return round(hp, 1)
    return None


def extract_model_name(text: str) -> str | None:
    for pat in P.NORM_MODEL_PATTERNS:
        m = pat.search(text)
        if m:
            model = m.group(m.lastindex).strip().upper()
            if len(model) >= 2:
                return model
    words = text.split()
    for i, word in enumerate(words):
        if word.lower() in ("model", "model:", "type", "type:"):
            if i + 1 < len(words):
                cand = P.WORD_TRAILING_PUNCT.sub("", words[i + 1].strip())
                if len(cand) >= 2:
                    return cand.upper()
    return None


# ----------------------------------------------------------------- language
def _script_counts(text: str, latin_alpha_only: bool) -> tuple[int, int, int]:
    dev = guj = lat = 0
    for ch in text:
        c = ord(ch)
        if V.DEVANAGARI[0] <= c <= V.DEVANAGARI[1]:
            dev += 1
        elif V.GUJARATI[0] <= c <= V.GUJARATI[1]:
            guj += 1
        elif (V.LATIN_UPPER[0] <= c <= V.LATIN_UPPER[1]) or (V.LATIN_LOWER[0] <= c <= V.LATIN_LOWER[1]):
            if not latin_alpha_only or ch.isalpha():
                lat += 1
    return dev, guj, lat


def detect_language(text: str) -> str:
    """Normalizer variant: 200-char sample, >60% rule (normalizer.py:364-405)."""
    if not text:
        return "unknown"
    dev, guj, lat = _script_counts(text[:200], latin_alpha_only=True)
    total = dev + guj + lat
    if total == 0:
        return "unknown"
    if dev / total > 0.6:
        return "hi"
    if guj / total > 0.6:
        return "gu"
    if lat / total > 0.6:
        return "en"
    if dev + guj > 0:
        return "mixed"
    return "en"


def detect_language_ocr(text: str) -> str:
    """OCR variant: full text, >30% rule (ocr.py:314-348)."""
    if not text or not text.strip():
        return "unknown"
    dev, guj, lat = _script_counts(text, latin_alpha_only=False)
    total = dev + guj + lat
    if total == 0:
        return "unknown"
    if dev / total > 0.3:
        return "hin"
    if guj / total > 0.3:
        return "guj"
    if lat / total > 0.3:
        return "eng"
    return "mixed"


# ----------------------------------------------------------------- flags
def has_currency_symbol(text: str) -> bool:
    return any(sym in text for sym in V.CURRENCY_SYMBOLS)


def has_block_currency(text: str) -> bool:
    """Extractor's narrower per-block flag (extractor.py:204)."""
    return any(s in text for s in V.BLOCK_CURRENCY_MARKS)


def has_business_suffix(text: str) -> bool:
    return P.SUFFIX_SEARCH.search(text.upper()) is not None


def detect_keyword_families(normalized_text: str) -> dict[str, bool]:
    """Per-family keyword presence (normalizer.py:463-483)."""
    lower = normalized_text.lower()
    words = set(lower.split())
    return {
        fam: bool(words & kws) or any(kw in lower for kw in kws)
        for fam, kws in V.KEYWORD_FAMILIES.items()
    }


def detect_section_keywords(lower_text: str) -> dict[str, bool]:
    """Extractor section tags (extractor.py:225-230)."""
    return {
        section: any(kw in lower_text for kw in kws)
        for section, kws in V.SECTION_KEYWORDS.items()
    }


# ----------------------------------------------------------------- batch API
def normalize_many(texts, memo: dict | None = None) -> list[str]:
    """Vectorized-ish normalization over a batch column.

    The reference leaned on ``lru_cache`` across calls; caching there is a
    perf detail, not semantics (functions are pure), so a per-batch memo is
    the idiomatic replacement inside ``map_batches``.
    """
    if memo is None:
        memo = {}
    out = []
    for t in texts:
        r = memo.get(t)
        if r is None:
            r = normalize_text(t)
            memo[t] = r
        out.append(r)
    return out
