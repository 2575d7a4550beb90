"""Corpus-trained language-model quality scoring (char-bigram
surprisal) — the CCNet/Gopher-style "LM filter" of a training-data
pipeline: fit a cheap LM on the corpus, score every document, filter or
stratify on the score.

Two passes:
1. **Fit** — exact char-bigram counts.  The bigram space is bounded by
   the charset (|Σ|²), NOT the corpus, so per-batch partial Counters fold
   through one vocabulary-sized groupby and the finished model (≤ a few
   thousand rows) is legitimately driver-resident and broadcast via
   ``ray.put`` — the canonical small-side broadcast, never re-shipped
   per batch.
2. **Score** — stateless ``map_batches``: each doc's surprisal against
   the broadcast model.

EXACT integer discipline (same idea as PageRank's scaled ranks): the
per-bigram surprisal term is ``floor(100 * ln(total / count) + 0.5)``
centinats — rounded to an integer BEFORE summing, so the per-doc score
is a sum of integers and float summation order never matters.  DuckDB
and numpy evaluate the same IEEE-double ``ln`` on the same machine, so
the oracle reproduces every term bit-for-bit; the one discipline needed
is ``floor(x + 0.5)`` on both sides (DuckDB ``round`` is half-away,
Python half-even — neither is used).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _docs(sf_dir: str) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"],
                              rows_per_block=1000)


def _bigram_counts(batch: pa.Table) -> pd.DataFrame:
    from collections import Counter
    c: Counter = Counter()
    for t in batch.column("text").to_pylist():
        c.update(t[i:i + 2] for i in range(len(t) - 1))
    return pd.DataFrame({"b": list(c.keys()),
                         "c": pd.Series(list(c.values()), dtype=np.int64)})


def fit_bigram_model(ds: rd.Dataset) -> tuple[dict[str, int], int]:
    """Exact corpus bigram counts: bounded-vocab partials -> one tiny
    groupby fold -> driver-resident dict (bounded by |charset|²)."""

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"b": [group["b"].iloc[0]],
                             "c": [int(group["c"].sum())]})

    rows = (ds.map_batches(_bigram_counts, batch_format="pyarrow")
              .groupby("b").map_groups(merge, batch_format="pandas")
              .take_all())  # bounded: |charset|^2 rows, NOT corpus-sized
    model = {r["b"]: int(r["c"]) for r in rows}
    return model, sum(model.values())


def q_lm_surprisal(sf_dir: str) -> rd.Dataset:
    import ray

    model, total = fit_bigram_model(_docs(sf_dir))
    model_ref = ray.put(model)  # broadcast once, read per actor/task

    def score(batch: pa.Table) -> pa.Table:
        from collections import Counter
        m = ray.get(model_ref)
        ids = batch.column("doc_id").to_pylist()
        n_bg, scores = [], []
        for t in batch.column("text").to_pylist():
            c = Counter(t[i:i + 2] for i in range(len(t) - 1))
            # per-term integer rounding BEFORE the sum: associativity-free
            s = sum(int(np.floor(100.0 * np.log(total / m[b]) + 0.5)) * k
                    for b, k in c.items())
            n_bg.append(sum(c.values()))
            scores.append(s)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_bigrams": pa.array(n_bg, type=pa.int64()),
            "score_centinats": pa.array(scores, type=pa.int64()),
        })

    return (_docs(sf_dir)
            .map_batches(score, batch_format="pyarrow")
            .sort("doc_id"))


SQL_LM_SURPRISAL = """
WITH bg AS (
  SELECT d.doc_id,
         substring(d.text, CAST(g.i AS BIGINT), 2) AS b
  FROM documents d,
       LATERAL (SELECT unnest(generate_series(1, length(d.text) - 1))
                AS i) g
), counts AS (
  SELECT b, COUNT(*) AS c FROM bg GROUP BY b
), tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS t FROM counts
), scored AS (
  SELECT bg.doc_id,
         COUNT(*) AS n_bigrams,
         SUM(CAST(floor(100 * ln((SELECT t FROM tot) / counts.c) + 0.5)
             AS BIGINT)) AS s
  FROM bg JOIN counts USING (b)
  GROUP BY bg.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(COALESCE(sc.s, 0) AS BIGINT) AS score_centinats
FROM documents d LEFT JOIN scored sc ON sc.doc_id = d.doc_id
ORDER BY d.doc_id
"""


LM_QUERIES = {
    "lm_surprisal": (q_lm_surprisal, SQL_LM_SURPRISAL),
}
