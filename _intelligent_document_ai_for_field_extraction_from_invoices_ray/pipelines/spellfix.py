"""OCR post-correction against the corpus lexicon — the cleanup stage
every OCR-fed extraction stack runs between text recovery and field
matching (the reference repo's fuzzy master-data matching,
`utils/fuzzy_matcher.py`, solves the same problem per-field; this is
the corpus-level operator).

Semantics: each document deterministically yields one corrupted token
(the token at index ``doc_id % n_tokens`` with the character at
``doc_id % len(token)`` deleted — a single-deletion OCR error model),
and the operator corrects it against the corpus lexicon by minimum
edit distance (≤ 1), ties broken lexicographically.

Scale shape (FastSS, Bocek et al. 2007 — public algorithm):
1. The lexicon is a distributed distinct over tokens (per-batch set
   partials → one vocabulary-sized groupby), materialized ONCE — it is
   vocabulary-sized, not corpus-sized — and broadcast to the actor
   pool via ``ray.put`` (read per actor in ``__init__``, never
   re-shipped per batch).
2. Each actor builds the deletion-variant index {variant → words} once
   in ``__init__``; per batch, candidate generation is hash lookups on
   ``{tok} ∪ del1(tok)`` and every candidate is VERIFIED with an exact
   Levenshtein (the variant intersection admits false positives, e.g.
   'ab' / 'ba' share variants at distance 2), so the index only
   prunes — correctness never depends on it.
No corpus shuffle anywhere: one streaming pass after the lexicon
reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _docs(sf_dir: str) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"],
                              rows_per_block=1000)


def levenshtein(a: str, b: str) -> int:
    """Plain DP edit distance (insert/delete/substitute, unit costs) —
    semantics of DuckDB's ``levenshtein``; called only on FastSS
    candidates, never across the vocabulary."""
    if a == b:
        return 0
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def del1(tok: str) -> set[str]:
    return {tok[:i] + tok[i + 1:] for i in range(len(tok))}


def corpus_lexicon(docs: rd.Dataset) -> list[str]:
    """Distributed distinct tokens: per-batch set partial (one row per
    token per batch) → one vocabulary-sized groupby.  The result is
    vocabulary-sized and safe to materialize."""

    def part(batch: pa.Table) -> pd.DataFrame:
        vocab = set()
        for t in batch.column("text").to_pylist():
            vocab.update(t.lower().split())
        return pd.DataFrame({"word": sorted(vocab)})

    rows = (docs.map_batches(part, batch_format="pyarrow")
            .groupby("word").count().take_all())
    return sorted(r["word"] for r in rows)


class _Corrector:
    """Actor-pool stage: deletion-variant index built once per actor
    from the broadcast lexicon ref."""

    def __init__(self, lex_ref) -> None:
        self.lexicon = ray.get(lex_ref)
        self.words = set(self.lexicon)
        index: dict[str, list[str]] = {}
        for w in self.lexicon:
            for v in del1(w):
                index.setdefault(v, []).append(w)
        self.index = index

    def _candidates(self, tok: str) -> set[str]:
        cand = set()
        if tok in self.words:
            cand.add(tok)
        probes = {tok} | del1(tok)
        for p in probes:
            cand.update(self.index.get(p, ()))
            if p in self.words:
                cand.add(p)
        return cand

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "corrupted": [], "corrected": [],
               "ed": [], "n_candidates": []}
        for d, text in zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist()):
            toks = text.lower().split()
            if not toks:
                continue
            tok = toks[d % len(toks)]
            if len(tok) < 3:
                continue
            p = d % len(tok)
            corrupt = tok[:p] + tok[p + 1:]
            verified = sorted(
                (levenshtein(corrupt, w), w)
                for w in self._candidates(corrupt)
                if levenshtein(corrupt, w) <= 1)
            if not verified:
                continue
            ed, best = verified[0]
            out["doc_id"].append(d)
            out["corrupted"].append(corrupt)
            out["corrected"].append(best)
            out["ed"].append(ed)
            out["n_candidates"].append(len(verified))
        return pa.table({
            "doc_id": pa.array(out["doc_id"], type=pa.int64()),
            "corrupted": pa.array(out["corrupted"], type=pa.string()),
            "corrected": pa.array(out["corrected"], type=pa.string()),
            "ed": pa.array(out["ed"], type=pa.int64()),
            "n_candidates": pa.array(out["n_candidates"],
                                     type=pa.int64()),
        })


def q_ocr_correct(sf_dir: str) -> rd.Dataset:
    docs = _docs(sf_dir)
    lex_ref = ray.put(corpus_lexicon(docs))
    return (docs.map_batches(_Corrector,
                             fn_constructor_args=(lex_ref,),
                             concurrency=(1, 4),
                             batch_format="pyarrow")
            .sort("doc_id"))


SQL_OCR_CORRECT = r"""
WITH toks AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '\s+') AS arr
  FROM documents WHERE trim(lower(text)) <> ''
), lex AS (
  SELECT DISTINCT unnest(arr) AS word FROM toks
), pick AS (
  SELECT doc_id, arr[(doc_id % len(arr)) + 1] AS tok FROM toks
), corr AS (
  SELECT doc_id,
         substr(tok, 1, doc_id % length(tok))
           || substr(tok, (doc_id % length(tok)) + 2) AS corrupted
  FROM pick WHERE length(tok) >= 3
), cand AS (
  SELECT c.doc_id, c.corrupted, l.word,
         CAST(levenshtein(c.corrupted, l.word) AS BIGINT) AS ed
  FROM corr c CROSS JOIN lex l
  WHERE levenshtein(c.corrupted, l.word) <= 1
), ranked AS (
  SELECT doc_id, corrupted, word AS corrected, ed,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY ed, word) AS rn,
         COUNT(*) OVER (PARTITION BY doc_id) AS n_candidates
  FROM cand
)
SELECT doc_id, corrupted, corrected, ed,
       CAST(n_candidates AS BIGINT) AS n_candidates
FROM ranked WHERE rn = 1 ORDER BY doc_id
"""


SPELL_QUERIES = {
    "ocr_correct": (q_ocr_correct, SQL_OCR_CORRECT),
}
