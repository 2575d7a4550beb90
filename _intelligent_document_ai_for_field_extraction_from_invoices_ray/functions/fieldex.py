"""Per-document field extraction: candidate generation + dedup-argmax.

Operates on an *ordered* list of prepared text blocks (the reassembled
span sequence of one document).  Pure function of its inputs — executed
identically inside the Ray ``groupby(doc_id).map_groups`` stage and the
single-process oracle.

Semantics parity targets (reference file:line):
- block preparation               utils/extractor.py:187-207
- dealer strategies 1-4+fallback  utils/extractor.py:232-329
- dealer validity / cleaning      utils/extractor.py:331-369
- model patterns + brand context  utils/extractor.py:371-431
- HP patterns + spec fallback     utils/extractor.py:433-490
- cost patterns + financial fb    utils/extractor.py:492-562
- section scan                    utils/extractor.py:564-570
- weighted overall confidence     utils/extractor.py:588-605
- extractor-level validation      utils/extractor.py:607-638

Determinism note: wherever the reference iterates an unordered frozenset
(brand-context scan), this engine iterates a *sorted* tuple so results are
identical across worker processes regardless of PYTHONHASHSEED; the
reference itself is process-order-dependent in those edge cases.
"""

from __future__ import annotations

from . import patterns as P
from . import textnorm as T
from . import vocab as V
from .fuzzy import token_sort_ratio

_SORTED_BRANDS = tuple(sorted(V.COMMON_BRANDS))

_EMPTY = {"value": None, "confidence": 0.0, "source": None, "bbox": None}


def empty_field() -> dict:
    return dict(_EMPTY)


# ------------------------------------------------------------------ blocks
def _text_features(text: str, memo: dict | None) -> tuple:
    """The six pure string-derived block features, memoized per partition
    (invoice corpora repeat line text heavily; every function here is
    pure, so the memo is a perf detail with no semantic effect).
    ``nums`` is stored as a tuple and re-listed per block so no two
    blocks ever alias one mutable list."""
    if memo is not None:
        hit = memo.get(("blk", text))
        if hit is not None:
            return hit
    upper = text.upper()
    has_digit = P.DIGIT_SEARCH.search(text) is not None
    out = (upper, text.lower(), has_digit,
           tuple(T.simple_numbers(text)) if has_digit else (),
           T.has_block_currency(text),
           P.SUFFIX_SEARCH.search(upper) is not None)
    if memo is not None:
        memo[("blk", text)] = out
    return out


def prepare_blocks(raw_blocks: list[dict], memo: dict | None = None) -> list[dict]:
    """raw block: {'text','normalized_text'?,'bbox','confidence','language'}.

    ``_upper``/``_digit`` are private hot-path caches used by the exact
    regex guards below; ``keywords`` is computed-but-never-read in the
    reference (extractor.py:202 vs :568 which re-tests the raw text), so
    the dead compute is skipped (``detect_section_keywords`` stays
    available as the M15 operator).
    """
    blocks = []
    for idx, rb in enumerate(raw_blocks):
        text = rb.get("text", "").strip()
        if not text:
            continue
        upper, lower, has_digit, nums, has_cur, has_suf = \
            _text_features(text, memo)
        blocks.append({
            "idx": idx,
            "text": rb.get("normalized_text", lower),
            "original": text,
            "bbox": rb.get("bbox", [0, 0, 0, 0]),
            "conf": rb.get("confidence", 0.0),
            "nums": list(nums),
            "keywords": None,
            "lang": rb.get("language", "unknown"),
            "has_currency": has_cur,
            "has_business_suffix": has_suf,
            "_upper": upper,
            "_lower": lower,
            "_digit": has_digit,
        })
    return blocks


def _find_section_blocks(blocks: list[dict], section: str, context: int,
                         memo: dict | None = None) -> list[dict]:
    keywords = V.SECTION_KEYWORDS.get(section, frozenset())
    for i, block in enumerate(blocks):
        text = block["text"]
        if memo is not None:
            key = ("sec", section, text)
            hit = memo.get(key)
            if hit is None:
                hit = any(kw in text for kw in keywords)
                memo[key] = hit
        else:
            hit = any(kw in text for kw in keywords)
        if hit:
            return blocks[i:min(i + context, len(blocks))]
    return []


# ------------------------------------------------------------------ dealer
def is_valid_dealer_name(name: str) -> bool:
    if not name or len(name) < 3:
        return False
    if name.islower():
        return False
    if P.REJECT_SEARCH.search(name.upper()) is not None:
        return False
    # map(str.isdigit, ...) is the same Unicode-aware count as the genexpr
    # form, minus one Python frame per character (hot: ~9 calls/doc)
    if sum(map(str.isdigit, name)) > len(name) * 0.3:
        return False
    return True


def _clean_valid(raw: str, memo: dict | None) -> tuple[str, bool]:
    """clean_dealer_name + is_valid_dealer_name, memoized per partition.

    Both are pure string functions, so the memo is a perf detail with no
    semantic effect (same contract as textnorm.normalize_many's memo —
    the reference's lru_cache analog, T6).  Invoice fleets repeat dealer
    strings heavily, so the hit rate is high in exactly the workloads
    that matter."""
    if memo is not None:
        hit = memo.get(("dnv", raw))
        if hit is not None:
            return hit
    name = clean_dealer_name(raw)
    out = (name, is_valid_dealer_name(name))
    if memo is not None:
        memo[("dnv", raw)] = out
    return out


def clean_dealer_name(name: str) -> str:
    name = P.DEALER_PREFIX_STRIP.sub("", name)
    name = P.TRAILING_PUNCT.sub("", name)
    name = P.PVT_LTD_STD.sub(" Pvt Ltd", name)
    name = P.LTD_STD.sub(" Ltd", name)
    return " ".join(name.split()).strip()


def _dealer_pattern_names(text: str, lower: str, has_suffix: bool,
                          memo: dict | None) -> tuple:
    """Strategy-1 pattern scan for one block text: the ordered tuple of
    (valid cleaned name, cleaned-name-has-business-suffix) hits.  Pure in
    the text (guards, finditer, clean, valid, suffix all text-derived),
    so memoized per partition; conf/bbox arithmetic stays per block."""
    if memo is not None:
        hit = memo.get(("dpn", text))
        if hit is not None:
            return hit
    # each pattern carries an exact substring guard (a condition implied
    # by the regex) so non-matching texts skip the costly finditer
    guards = (
        ("dealer" in lower or "seller" in lower or "vendor" in lower
         or "supplier" in lower),
        ("m/s" in lower or "m.s." in lower or "messrs" in lower),
        "dealer" in lower,
        has_suffix,
        True,                                  # AT/POST/... too common to guard
        ("quotation" in lower or "invoice" in lower or "proforma" in lower),
        ("डीलर" in text or "ડીલર" in text or "विक्रेता" in text),
    )
    out = []
    for pat, guard in zip(P.DEALER_PATTERNS, guards):
        if not guard:
            continue
        for m in pat.finditer(text):
            name, ok = _clean_valid(m.group(1).strip(), memo)
            if ok:
                out.append((name, T.has_business_suffix(name)))
    out = tuple(out)
    if memo is not None:
        memo[("dpn", text)] = out
    return out


def extract_dealer_name(blocks: list[dict], dealer_master: list[str] | None = None,
                        memo: dict | None = None) -> dict:
    candidates: list[dict] = []

    # strategy 1: labelled / structural patterns over the document head
    for block in blocks[:25]:
        for name, suffixed in _dealer_pattern_names(
                block["original"], block["_lower"],
                block["has_business_suffix"], memo):
            score = block["conf"] * 0.88
            if suffixed:
                score = min(score * 1.15, 0.96)
            candidates.append({"value": name, "confidence": score,
                               "source": "pattern", "bbox": block["bbox"]})

    # strategy 2: business-suffix lines near the top
    for i, block in enumerate(blocks[:15]):
        if block["has_business_suffix"]:
            name, ok = _clean_valid(block["original"], memo)
            if ok:
                score = block["conf"] * 0.82
                if i < 5:
                    score = min(score * 1.12, 0.94)
                candidates.append({"value": name, "confidence": score,
                                   "source": "business_suffix", "bbox": block["bbox"]})

    # strategy 3: adjacent capitalized, number-free lines joined
    for i in range(min(20, len(blocks) - 1)):
        b1, b2 = blocks[i], blocks[i + 1]
        if (b1["original"] and b1["original"][0].isupper()
                and b2["original"] and b2["original"][0].isupper()
                and not b1["nums"] and not b2["nums"]):
            name, ok = _clean_valid(f"{b1['original']} {b2['original']}", memo)
            if ok and len(name) > 10:
                candidates.append({"value": name,
                                   "confidence": min(b1["conf"], b2["conf"]) * 0.75,
                                   "source": "multiline", "bbox": b1["bbox"]})

    # strategy 4: fuzzy lift against the master list (broadcast state).
    # NOTE: the reference (extractor.py:297-307) iterates the LIVE list while
    # appending, so a first-generation fuzzy candidate is itself re-matched
    # (pct≈100 against the master entry it came from) and spawns a
    # second-generation candidate at confidence ×(100/90), capped 0.97; the
    # `seen` set terminates the chain.  Replicated verbatim.
    if dealer_master:
        seen: set[str] = set()
        for cand in candidates:
            if cand["value"] in seen:
                continue
            seen.add(cand["value"])
            matched, pct = _fuzzy_best(cand["value"], dealer_master)
            if pct > 75:
                candidates.append({"value": matched,
                                   "confidence": min(cand["confidence"] * (pct / 90), 0.97),
                                   "source": "fuzzy_match", "bbox": cand["bbox"]})

    if candidates:
        return max(candidates, key=lambda c: c["confidence"])

    # fallback: first capitalized multi-word, number-free block
    for block in blocks[:10]:
        if (block["original"] and block["original"][0].isupper()
                and len(block["original"].split()) >= 2 and not block["nums"]):
            name, ok = _clean_valid(block["original"], memo)
            if ok:
                return {"value": name, "confidence": block["conf"] * 0.60,
                        "source": "fallback", "bbox": block["bbox"]}

    return empty_field()


def _fuzzy_best(candidate: str, master: list[str]) -> tuple[str, float]:
    best, best_score = candidate, 0.0
    for entry in master:
        s = token_sort_ratio(candidate, entry)
        if s > best_score:
            best, best_score = entry, s
    return best, best_score


# ------------------------------------------------------------------ model
def _model_pattern_hits(text: str, lower: str, upper: str, has_digit: bool,
                        memo: dict | None) -> tuple:
    """Strategy-1 pattern scan for one block text: ordered tuple of
    (model string, contains-a-common-brand) hits.  Text-pure (master
    membership is checked by the caller — it is broadcast state, not
    text), memoized per partition."""
    if memo is not None:
        hit = memo.get(("mpn", text))
        if hit is not None:
            return hit
    has_brand = P.BRAND_SEARCH.search(upper) is not None
    guards = (
        "model" in lower,
        has_digit,
        ("variant" in lower or "type" in lower),
        ("मॉडल" in text or "મોડેલ" in text),
        has_brand,
    )
    out = []
    for pat, guard in zip(P.EXT_MODEL_PATTERNS, guards):
        if not guard:
            continue
        for m in pat.finditer(text):
            if len(m.groups()) > 1 and m.group(2):
                model = f"{m.group(1)} {m.group(2)}".strip().upper()
            else:
                model = m.group(1).strip().upper()
            if len(model) < 2 or len(model) > 40:
                continue
            out.append((model,
                        any(brand in model for brand in V.COMMON_BRANDS)))
    out = tuple(out)
    if memo is not None:
        memo[("mpn", text)] = out
    return out


def _brand_context_hits(text: str, upper: str, memo: dict | None) -> tuple:
    """Brand-context scan for one block text (sorted brand order for
    cross-process determinism).  Text-pure, memoized per partition."""
    if memo is not None:
        hit = memo.get(("bcx", text))
        if hit is not None:
            return hit
    out = []
    for brand in _SORTED_BRANDS:
        if brand in upper:
            after = text[upper.find(brand) + len(brand):].strip()
            m = P.BRAND_TAIL.match(after)
            if m:
                out.append(f"{brand} {m.group(1).strip()}".upper())
    out = tuple(out)
    if memo is not None:
        memo[("bcx", text)] = out
    return out


def extract_model_field(blocks: list[dict], model_master: set[str] | None = None,
                        memo: dict | None = None) -> dict:
    candidates: list[dict] = []

    for block in blocks:
        for model, branded in _model_pattern_hits(
                block["original"], block["_lower"], block["_upper"],
                block["_digit"], memo):
            score = block["conf"] * 0.90
            if branded:
                score = min(score * 1.10, 0.96)
            if model_master and model in model_master:
                score = min(score * 1.08, 0.98)
            candidates.append({"value": model, "confidence": score,
                               "source": "pattern", "bbox": block["bbox"]})

    for block in blocks:
        for value in _brand_context_hits(block["original"], block["_upper"], memo):
            candidates.append({
                "value": value,
                "confidence": block["conf"] * 0.85,
                "source": "brand_context", "bbox": block["bbox"]})

    if candidates:
        return max(candidates, key=lambda c: c["confidence"])
    return empty_field()


# ------------------------------------------------------------------ HP
def _hp_pattern_hits(text: str, norm: str, memo: dict | None) -> tuple:
    """HP pattern scan for one block: ordered tuple of (rounded hp,
    keyword-boosted) hits.  Pure in (original text, normalized text) —
    the normalized text drives the kW conversion and the boost — so the
    memo key carries both strings."""
    if memo is not None:
        hit = memo.get(("hpn", text, norm))
        if hit is not None:
            return hit
    lo, hi = V.EXTRACTOR_HP_RANGE
    kw = "kw" in norm
    boosted = any(k in norm for k in ("horse", "power", "hp"))
    out = []
    for pat in P.EXT_HP_PATTERNS:
        for m in pat.finditer(text):
            try:
                hp = float(m.group(1))
            except (ValueError, IndexError):
                continue
            if kw:
                hp *= V.KW_TO_HP
            if lo <= hp <= hi:
                out.append((round(hp, 1), boosted))
    out = tuple(out)
    if memo is not None:
        memo[("hpn", text, norm)] = out
    return out


def extract_hp_field(blocks: list[dict], memo: dict | None = None) -> dict:
    candidates: list[dict] = []
    lo, hi = V.EXTRACTOR_HP_RANGE

    for block in blocks:
        if not block["_digit"]:        # every HP pattern requires a digit
            continue
        for value, boosted in _hp_pattern_hits(
                block["original"], block["text"], memo):
            score = block["conf"] * 0.91
            if boosted:
                score = min(score * 1.08, 0.96)
            candidates.append({"value": value, "confidence": score,
                               "source": "pattern", "bbox": block["bbox"]})

    for block in _find_section_blocks(blocks, "specs", 6, memo):
        for num in block["nums"]:
            if lo <= num <= hi:
                candidates.append({"value": round(num, 1),
                                   "confidence": block["conf"] * 0.73,
                                   "source": "spec_section", "bbox": block["bbox"]})

    return _dedup_argmax(candidates)


# ------------------------------------------------------------------ cost
def _cost_pattern_hits(text: str, norm: str, memo: dict | None) -> tuple:
    """Cost pattern scan for one block: ordered tuple of (rupee value,
    keyword-boosted) hits.  Pure in (original text, normalized text) —
    the normalized text drives the lakh/crore fallback and the boost."""
    if memo is not None:
        hit = memo.get(("cpn", text, norm))
        if hit is not None:
            return hit
    lo, hi = V.EXTRACTOR_COST_RANGE
    boosted = any(k in norm for k in ("total", "grand", "payable", "net", "final"))
    out = []
    for pat in P.EXT_COST_PATTERNS:
        for m in pat.finditer(text):
            try:
                cost = float(m.group(1).replace(",", ""))
            except (ValueError, IndexError):
                continue
            if len(m.groups()) > 1 and m.group(2):
                mult = m.group(2).lower()
                if "lakh" in mult or "lac" in mult:
                    cost *= 100_000
                elif "crore" in mult or "cr" in mult:
                    cost *= 10_000_000
            elif "lakh" in norm and cost < 1000:
                cost *= 100_000
            elif "crore" in norm and cost < 100:
                cost *= 10_000_000
            if lo <= cost <= hi:
                out.append((int(round(cost)), boosted))
    out = tuple(out)
    if memo is not None:
        memo[("cpn", text, norm)] = out
    return out


def extract_cost_field(blocks: list[dict], memo: dict | None = None) -> dict:
    candidates: list[dict] = []
    lo, hi = V.EXTRACTOR_COST_RANGE

    for block in blocks:
        if not block["_digit"]:        # every cost pattern requires a digit
            continue
        for value, boosted in _cost_pattern_hits(
                block["original"], block["text"], memo):
            score = block["conf"] * 0.86
            if boosted:
                score = min(score * 1.12, 0.95)
            candidates.append({"value": value, "confidence": score,
                               "source": "pattern", "bbox": block["bbox"]})

    for block in _find_section_blocks(blocks, "financial", 8, memo):
        if block["has_currency"]:
            for num in block["nums"]:
                for mult in (1, 100_000, 10_000_000):
                    cost = num * mult
                    if lo <= cost <= hi:
                        candidates.append({"value": int(round(cost)),
                                           "confidence": block["conf"] * 0.68,
                                           "source": "financial_section", "bbox": block["bbox"]})

    return _dedup_argmax(candidates)


def _dedup_argmax(candidates: list[dict]) -> dict:
    """Keep max-confidence candidate per distinct value, then argmax.

    Ties resolve to the earliest-inserted candidate (Python ``max``
    semantics), identically in pipeline and oracle.
    """
    if not candidates:
        return empty_field()
    unique: dict = {}
    for c in candidates:
        prev = unique.get(c["value"])
        if prev is None or c["confidence"] > prev["confidence"]:
            unique[c["value"]] = c
    return max(unique.values(), key=lambda c: c["confidence"])


# ------------------------------------------------------------------ overall
def overall_confidence(results: dict) -> float:
    weighted = total = 0.0
    for fld, weight in V.FIELD_WEIGHTS.items():
        data = results.get(fld)
        if data is None:
            continue
        if fld in V.BINARY_FIELDS:
            if data.get("present"):
                weighted += data.get("confidence", 0.0) * weight
                total += weight
        elif data.get("value") is not None:
            weighted += data.get("confidence", 0.0) * weight
            total += weight
    return weighted / total if total > 0 else 0.0


def extract_fields(raw_blocks: list[dict],
                   dealer_master: list[str] | None = None,
                   model_master: set[str] | None = None,
                   memo: dict | None = None) -> dict:
    """The per-document field extraction entry (extractor.py:143-185).

    ``memo`` is the caller's per-partition memo dict (the one assemble
    already threads for normalization) — used for pure string-level
    sub-results only, never for anything depending on block conf/bbox."""
    results = {
        "dealer_name": empty_field(),
        "model_name": empty_field(),
        "horse_power": empty_field(),
        "asset_cost": empty_field(),
        "signature": {"present": False, "bbox": None, "confidence": 0.0},
        "stamp": {"present": False, "bbox": None, "confidence": 0.0},
    }
    if not raw_blocks:
        results["overall_confidence"] = 0.0
        return results
    blocks = prepare_blocks(raw_blocks, memo=memo)
    results["dealer_name"] = extract_dealer_name(blocks, dealer_master, memo=memo)
    results["model_name"] = extract_model_field(blocks, model_master, memo=memo)
    results["horse_power"] = extract_hp_field(blocks, memo=memo)
    results["asset_cost"] = extract_cost_field(blocks, memo=memo)
    results["overall_confidence"] = overall_confidence(results)
    return results


def extractor_validate(results: dict) -> dict:
    """Extractor-level cross checks (extractor.py:607-638)."""
    hp = results["horse_power"].get("value")
    if hp is not None:
        lo, hi = V.EXTRACTOR_HP_RANGE
        if not (lo <= hp <= hi):
            results["horse_power"]["confidence"] *= 0.5
    cost = results["asset_cost"].get("value")
    if cost is not None:
        lo, hi = V.EXTRACTOR_COST_RANGE
        if not (lo <= cost <= hi):
            results["asset_cost"]["confidence"] *= 0.6
    model = results["model_name"].get("value")
    if model and hp:
        for key, expected in V.MODEL_HP_POINT.items():
            if key in str(model):
                if abs(hp - expected) > 10:
                    results["horse_power"]["confidence"] *= 0.75
                break
    results["overall_confidence"] = overall_confidence(results)
    return results
