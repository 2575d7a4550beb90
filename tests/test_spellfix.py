"""Pins for the OCR post-correction operator (pipelines/spellfix.py).
Value equality vs DuckDB levenshtein is the driver gate; these pin the
FastSS machinery itself."""

from __future__ import annotations

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.spellfix import (
    del1,
    levenshtein,
)

SF = "/root/testdata/sf0.001"


def test_levenshtein_reference_cases() -> None:
    cases = [("", "", 0), ("a", "", 1), ("abc", "abc", 0),
             ("abc", "abd", 1), ("abc", "ab", 1), ("abc", "bc", 1),
             ("ab", "ba", 2), ("kitten", "sitting", 3),
             ("flaw", "lawn", 2)]
    for a, b, d in cases:
        assert levenshtein(a, b) == d, (a, b)
        assert levenshtein(b, a) == d, (a, b)


def test_fastss_variant_intersection_needs_verify() -> None:
    """'ab' and 'ba' share a deletion variant yet sit at distance 2 —
    the false positive the exact-verify step exists for."""
    assert del1("ab") & del1("ba")
    assert levenshtein("ab", "ba") == 2


def test_corrector_brute_force_equivalence(ray_session) -> None:
    """The FastSS-pruned decision must equal a brute-force min over the
    whole lexicon for every corrected doc: same winner, same distance,
    same candidate count (pruning is lossless for ed ≤ 1)."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.spellfix import (
        corpus_lexicon,
        _docs,
        q_ocr_correct,
    )
    lex = corpus_lexicon(_docs(SF))
    got = q_ocr_correct(SF).to_pandas()
    assert len(got) > 0
    for row in got.itertuples(index=False):
        brute = sorted((levenshtein(row.corrupted, w), w) for w in lex
                       if levenshtein(row.corrupted, w) <= 1)
        assert brute, row
        assert (row.ed, row.corrected) == brute[0], row
        assert row.n_candidates == len(brute), row


def test_single_deletion_always_recoverable(ray_session) -> None:
    """The corruption model deletes one char of a lexicon word, so
    every emitted row must sit at distance ≤ 1 (the true word is always
    a candidate)."""
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.spellfix import (
        q_ocr_correct,
    )
    got = q_ocr_correct(SF).to_pandas()
    assert (got.ed <= 1).all()
    assert (got.n_candidates >= 1).all()
