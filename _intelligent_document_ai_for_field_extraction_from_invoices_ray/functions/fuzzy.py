"""Fuzzy string similarity (Levenshtein ratio family).

Self-contained implementation of the standard similarity measures the
reference gets from ``thefuzz`` (``fuzz.ratio`` / ``token_sort_ratio`` /
``token_set_ratio``, used at utils/extractor.py:577,585 and
evaluate.py:208-212).  That wheel is not available here, and the
algorithms are textbook public knowledge: ``ratio`` is the normalized
indel (insert/delete-only Levenshtein) similarity; the token variants
canonicalize the token multiset first.
"""

from __future__ import annotations


def _indel_distance(a: str, b: str) -> int:
    """Insert/delete-only edit distance (substitution cost 2)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            if ca == cb:
                cur.append(prev[j - 1])
            else:
                # substitution = delete + insert (cost 2), matching the
                # indel metric used by fuzz.ratio
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + 2))
        prev = cur
    return prev[-1]


def ratio(a: str, b: str) -> float:
    """Similarity in [0, 100], rounded like fuzz.ratio."""
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    return round(100.0 * (total - _indel_distance(a, b)) / total)


def _tokenize(s: str) -> list[str]:
    return "".join(c.lower() if c.isalnum() else " " for c in s).split()


def token_sort_ratio(a: str, b: str) -> float:
    return ratio(" ".join(sorted(_tokenize(a))), " ".join(sorted(_tokenize(b))))


def token_set_ratio(a: str, b: str) -> float:
    ta, tb = set(_tokenize(a)), set(_tokenize(b))
    inter = " ".join(sorted(ta & tb))
    sa = (inter + " " + " ".join(sorted(ta - tb))).strip()
    sb = (inter + " " + " ".join(sorted(tb - ta))).strip()
    return max(ratio(inter, sa), ratio(inter, sb), ratio(sa, sb))
