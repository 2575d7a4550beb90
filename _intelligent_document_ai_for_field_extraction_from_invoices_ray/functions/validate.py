"""Rule-based document validation with cross-field consistency checks.

Rules are *data* (ordered tuples of ``Rule``), preserving the reference's
``add_custom_rule`` extension surface (utils/validator.py:706-716) without
its singleton: a ``RuleBook`` is plain picklable state that a Ray stage
ships to workers.

Semantics parity targets (reference file:line):
- per-field rule tables         utils/validator.py:139-328
- rule application + clamping   utils/validator.py:370-428
- model↔HP cross check          utils/validator.py:444-502
- HP↔cost cross check           utils/validator.py:504-544
- dealer↔model brand check      utils/validator.py:546-569
- weighted overall confidence   utils/validator.py:571-594
- completeness / quality levels utils/validator.py:596-700
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable

from . import patterns as P
from . import vocab as V


@dataclass(frozen=True)
class Rule:
    name: str
    condition: Callable[[Any], bool]
    multiplier: float
    is_boost: bool = True
    severity: str = "medium"


def _bbox_area_ok(bbox, min_area: int, max_area: int) -> bool:
    if not bbox or len(bbox) != 4:
        return False
    x1, y1, x2, y2 = bbox
    return min_area <= (x2 - x1) * (y2 - y1) <= max_area


def _is_num(x) -> bool:
    return isinstance(x, (int, float)) and not isinstance(x, bool)


DEALER_RULES = (
    Rule("min_length", lambda x: len(str(x).strip()) >= 3, 0.6, False, "high"),
    Rule("max_length", lambda x: len(str(x).strip()) <= 100, 0.7, False, "medium"),
    Rule("no_excessive_digits", lambda x: len(P.VAL_DIGIT.findall(str(x))) <= 3, 0.75, False, "medium"),
    Rule("has_suffix", lambda x: any(s in str(x).lower() for s in V.DEALER_SUFFIXES_LOWER), 1.15, True, "low"),
    Rule("capitalized", lambda x: any(c.isupper() for c in str(x)), 1.05, True, "low"),
    Rule("no_special_chars", lambda x: not P.VAL_SPECIAL_CHAR.search(str(x)), 1.08, True, "low"),
)

MODEL_RULES = (
    Rule("min_length", lambda x: len(str(x).strip()) >= 2, 0.6, False, "high"),
    Rule("max_length", lambda x: len(str(x).strip()) <= 30, 0.7, False, "medium"),
    Rule("pattern_match", lambda x: bool(P.VAL_MODEL_PATTERN.search(str(x))), 1.20, True, "low"),
    Rule("has_brand", lambda x: any(b in str(x).upper() for b in V.VALIDATOR_BRANDS), 1.15, True, "low"),
    Rule("has_digits", lambda x: bool(P.VAL_DIGIT.search(str(x))), 1.10, True, "low"),
)

HP_RULES = (
    Rule("is_numeric", lambda x: _is_num(x) and x > 0, 0.5, False, "high"),
    Rule("in_valid_range", lambda x: V.VALIDATOR_HP_RANGE[0] <= float(x) <= V.VALIDATOR_HP_RANGE[1] if _is_num(x) else False, 1.15, True, "medium"),
    Rule("reasonable_value", lambda x: 20 <= float(x) <= 100 if _is_num(x) else False, 1.08, True, "low"),
    Rule("not_fractional", lambda x: float(x) == int(float(x)) if _is_num(x) else False, 1.05, True, "low"),
)

COST_RULES = (
    Rule("is_numeric", lambda x: _is_num(x) and x > 0, 0.5, False, "high"),
    Rule("in_valid_range", lambda x: V.VALIDATOR_COST_RANGE[0] <= float(x) <= V.VALIDATOR_COST_RANGE[1] if _is_num(x) else False, 1.15, True, "medium"),
    Rule("reasonable_rounding", lambda x: float(x) % 1000 == 0 if _is_num(x) else False, 1.06, True, "low"),
    Rule("typical_range", lambda x: 200_000 <= float(x) <= 2_000_000 if _is_num(x) else False, 1.08, True, "low"),
)

SIGNATURE_RULES = (
    Rule("has_bbox", lambda x: x.get("bbox") is not None and len(x.get("bbox", [])) == 4, 1.10, True, "medium"),
    Rule("reasonable_size", lambda x: _bbox_area_ok(x.get("bbox"), 100, 100_000), 1.08, True, "low"),
)

STAMP_RULES = (
    Rule("has_bbox", lambda x: x.get("bbox") is not None and len(x.get("bbox", [])) == 4, 1.10, True, "medium"),
    Rule("reasonable_size", lambda x: _bbox_area_ok(x.get("bbox"), 400, 200_000), 1.08, True, "low"),
)


@dataclass
class RuleBook:
    """Mutable per-pipeline rule configuration (add_custom_rule analog)."""
    rules: dict[str, tuple[Rule, ...]] = dc_field(default_factory=lambda: {
        "dealer_name": DEALER_RULES,
        "model_name": MODEL_RULES,
        "horse_power": HP_RULES,
        "asset_cost": COST_RULES,
        "signature": SIGNATURE_RULES,
        "stamp": STAMP_RULES,
    })

    def add_custom_rule(self, field_name: str, rule: Rule) -> None:
        if field_name in self.rules:
            self.rules[field_name] = self.rules[field_name] + (rule,)


DEFAULT_RULEBOOK = RuleBook()


# ---------------------------------------------------------------- application
def apply_field_rules(field_data: dict, rules: tuple[Rule, ...], field_name: str,
                      memo: dict | None = None) -> None:
    value = field_data.get("value")
    if field_name in V.BINARY_FIELDS:
        if not field_data.get("present"):
            return
        value = field_data
    if value is None:
        return
    confidence = field_data.get("confidence", 0.5)
    # Rule outcomes depend only on `value` (conditions are pure), so the
    # per-partition memo caches the MULTIPLIER SEQUENCE + issue/boost
    # names per (field, rules-instance, value) and replays it — sequence,
    # not product, so the float multiply order (and thus every last bit
    # of the confidence) is identical to the unmemoized path.  Scalar
    # values only; BINARY_FIELDS pass the whole dict and skip the memo.
    key = None
    if memo is not None and isinstance(value, (str, int, float, bool)):
        # value.__class__ in the key: True==1 and 5==5.0 hash-equal but a
        # condition may observe the type (str(value), isinstance checks)
        key = ("afr", field_name, id(rules), value.__class__, value)
        hit = memo.get(key)
        if hit is not None:
            # hit[0] pins the rules tuple alive so the id in the key can
            # never be recycled onto a different tuple during memo life
            _, mults, issues_t, boosts_t = hit
            for m in mults:
                confidence *= m
            field_data["confidence"] = min(
                max(confidence, V.FIELD_MIN_CONFIDENCE), V.FIELD_MAX_CONFIDENCE)
            if issues_t:
                field_data["validation_issues"] = [
                    {"rule": n, "severity": s} for n, s in issues_t]
            if boosts_t:
                field_data["validation_boosts"] = list(boosts_t)
            return
    mults: list[float] = []
    issues, boosts = [], []
    for rule in rules:
        try:
            passes = rule.condition(value)
        except Exception:
            continue
        if passes and rule.is_boost:
            confidence *= rule.multiplier
            mults.append(rule.multiplier)
            boosts.append(rule.name)
        elif not passes and not rule.is_boost:
            confidence *= rule.multiplier
            mults.append(rule.multiplier)
            issues.append({"rule": rule.name, "severity": rule.severity})
    if key is not None:
        memo[key] = (rules, tuple(mults),
                     tuple((i["rule"], i["severity"]) for i in issues),
                     tuple(boosts))
    field_data["confidence"] = min(max(confidence, V.FIELD_MIN_CONFIDENCE), V.FIELD_MAX_CONFIDENCE)
    if issues:
        field_data["validation_issues"] = issues
    if boosts:
        field_data["validation_boosts"] = boosts


def find_model_hp_range(model_str: str) -> tuple[int, int] | None:
    model_upper = str(model_str).upper().strip()
    hit = V.MODEL_HP_RANGES.get(model_upper)
    if hit is not None:
        return hit
    for key, rng in V.MODEL_HP_RANGES.items():   # insertion order, first hit
        if key in model_upper or model_upper in key:
            return rng
    return None


def _cap(conf: float) -> float:
    return min(conf, V.FIELD_MAX_CONFIDENCE)


def cross_validate_model_hp(data: dict) -> None:
    model_value = data["model_name"].get("value")
    hp_value = data["horse_power"].get("value")
    if not (model_value and _is_num(hp_value)):
        return
    hp_range = find_model_hp_range(str(model_value))
    if hp_range is None:
        return
    lo, hi = hp_range
    multiplier = 1.18 if lo <= hp_value <= hi else 0.75
    data["model_name"]["confidence"] = _cap(data["model_name"].get("confidence", 0.5) * multiplier)
    data["horse_power"]["confidence"] = _cap(data["horse_power"].get("confidence", 0.5) * multiplier)


def cross_validate_hp_cost(data: dict) -> None:
    hp_value = data["horse_power"].get("value")
    cost_value = data["asset_cost"].get("value")
    if not (_is_num(hp_value) and _is_num(cost_value)):
        return
    expected_min = hp_value * V.COST_PER_HP_RANGE[0]
    expected_max = hp_value * V.COST_PER_HP_RANGE[1]
    if expected_min <= cost_value <= expected_max:
        multiplier = 1.12
    elif cost_value < expected_min * 0.5 or cost_value > expected_max * 2:
        multiplier = 0.65
    else:
        multiplier = 0.85
    data["horse_power"]["confidence"] = _cap(data["horse_power"].get("confidence", 0.5) * multiplier)
    data["asset_cost"]["confidence"] = _cap(data["asset_cost"].get("confidence", 0.5) * multiplier)


def cross_validate_dealer_model(data: dict) -> None:
    dealer = str(data["dealer_name"].get("value", "")).upper()
    model = str(data["model_name"].get("value", "")).upper()
    multiplier = 1.0
    for brand in sorted(V.VALIDATOR_BRANDS):
        if brand in dealer and brand in model:
            multiplier = 1.06
            break
    data["dealer_name"]["confidence"] = _cap(data["dealer_name"].get("confidence", 0.5) * multiplier)


def weighted_overall_confidence(data: dict) -> float:
    total = weighted = 0.0
    for field_name, weight in V.FIELD_WEIGHTS.items():
        field_data = data.get(field_name)
        if field_data is None:
            continue
        if field_name in V.BINARY_FIELDS:
            if field_data.get("present"):
                weighted += field_data.get("confidence", 0.0) * weight
                total += weight
        elif field_data.get("value") is not None:
            weighted += field_data.get("confidence", 0.0) * weight
            total += weight
    return weighted / total if total > 0 else 0.0


def validate_document(data: dict, rulebook: RuleBook | None = None,
                      memo: dict | None = None) -> dict:
    rb = rulebook or DEFAULT_RULEBOOK
    for field_name, rules in rb.rules.items():
        if field_name in data:
            apply_field_rules(data[field_name], rules, field_name, memo=memo)
    if "model_name" in data and "horse_power" in data:
        cross_validate_model_hp(data)
    if "horse_power" in data and "asset_cost" in data:
        cross_validate_hp_cost(data)
    if "dealer_name" in data and "model_name" in data:
        cross_validate_dealer_model(data)
    data["overall_confidence"] = weighted_overall_confidence(data)
    return data


# ---------------------------------------------------------------- summaries
def check_completeness(data: dict) -> dict:
    required = [f for f in V.VALUE_FIELDS]   # validator.py: value fields required
    complete, missing = [], []
    for f in required:
        fd = data.get(f)
        if fd is not None and fd.get("value") is not None:
            complete.append(f)
        else:
            missing.append(f)
    score = len(complete) / len(required) if required else 1.0
    return {"missing_fields": missing, "complete_fields": complete,
            "completeness_score": score, "total_required": len(required),
            "total_complete": len(complete)}


def quality_level(overall_conf: float, completeness_score: float) -> str:
    if overall_conf >= 0.85 and completeness_score >= 0.8:
        return "high"
    if overall_conf >= 0.65 and completeness_score >= 0.6:
        return "medium"
    return "low"
