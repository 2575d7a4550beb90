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


def scored_docs(sf_dir: str) -> rd.Dataset:
    """LAZY (doc_id, n_bigrams, score_centinats) scan: the bigram model
    is fit ONCE on the driver (bounded table) and broadcast via
    ``ray.put``; every consumer of the returned Dataset re-executes only
    the cheap stateless scoring pass — re-scan over materialize is the
    scale-safe default for a corpus-sized intermediate."""
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

    return _docs(sf_dir).map_batches(score, batch_format="pyarrow")


def q_lm_surprisal(sf_dir: str) -> rd.Dataset:
    return scored_docs(sf_dir).sort("doc_id")


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


def q_lm_tier(sf_dir: str) -> rd.Dataset:
    """CCNet-style quality-TIER bucketing: split the corpus into
    head / middle / tail thirds by per-bigram surprisal RATE (low rate =
    most in-distribution = head), the canonical "LM filter then keep the
    best tier" step of a web-scale training-data pipeline.

    Scale shape: tier thresholds are positional tertiles of the rate
    distribution computed from an exact distributed HISTOGRAM —
    per-batch (rate, count) partials fold through ``two_level_combine``
    so the driver pull is bounded by O(64 × distinct-rates-per-block),
    never corpus-sized; the two integer thresholds then ride a closure
    into one stateless assignment pass.  Ties at a threshold all land in
    the better tier on both engine and oracle (tier depends only on
    rate vs threshold, not on rank).

    Integer discipline: ``rate_milli = (score * 1000) // n_bigrams`` —
    both operands non-negative, so DuckDB's truncating ``//`` and
    Python's flooring ``//`` agree.  Docs with no bigrams (empty or
    1-char text) get rate −1 / tier 'empty' on both sides.
    """
    from .grouping import two_level_combine

    sc = scored_docs(sf_dir)

    def rate_of(batch: pa.Table) -> np.ndarray:
        n = batch.column("n_bigrams").to_numpy()
        s = batch.column("score_centinats").to_numpy()
        rate = np.full(len(n), -1, dtype=np.int64)
        pos = n > 0
        rate[pos] = (s[pos] * 1000) // n[pos]
        return rate

    def hist_partial(batch: pa.Table) -> pd.DataFrame:
        rate = rate_of(batch)
        uniq, cnt = np.unique(rate[rate >= 0], return_counts=True)
        return pd.DataFrame({"rate_milli": uniq,
                             "c": cnt.astype(np.int64)})

    def hist_merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("rate_milli", as_index=False).agg(c=("c", "sum"))

    hist = (two_level_combine(
                sc.map_batches(hist_partial, batch_format="pyarrow"),
                hist_merge, num_blocks=64)
            .to_pandas())
    hist = (hist.groupby("rate_milli", as_index=False).agg(c=("c", "sum"))
            .sort_values("rate_milli"))
    n = int(hist["c"].sum())
    if n:
        cum = hist["c"].cumsum().to_numpy()
        rates = hist["rate_milli"].to_numpy()
        k1, k2 = (n + 2) // 3, (2 * n + 2) // 3   # ceil(n/3), ceil(2n/3)
        t1 = int(rates[np.searchsorted(cum, k1)])
        t2 = int(rates[np.searchsorted(cum, k2)])
    else:                                          # all-empty corpus
        t1 = t2 = -1

    def assign(batch: pa.Table) -> pa.Table:
        rate = rate_of(batch)
        tier = np.where(rate < 0, "empty",
                        np.where(rate <= t1, "head",
                                 np.where(rate <= t2, "middle", "tail")))
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "rate_milli": pa.array(rate, type=pa.int64()),
            "tier": pa.array(tier.tolist(), type=pa.string()),
        })

    return sc.map_batches(assign, batch_format="pyarrow").sort("doc_id")


# thresholds are positional tertiles over rates ORDERED BY rate — the
# element at 1-indexed position ceil(n/3) / ceil(2n/3); GREATEST guards
# the all-empty-corpus case (rates CTE empty -> scalar subqueries NULL,
# but every row is tier 'empty' before the thresholds are consulted)
SQL_LM_TIER = """
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
), rates AS (
  -- both operands non-negative: truncating // == flooring //
  SELECT doc_id, (s * 1000) // n_bigrams AS rate_milli FROM scored
), nn AS (
  SELECT COUNT(*) AS n FROM rates
), t1 AS (
  SELECT rate_milli AS t FROM rates ORDER BY rate_milli
  LIMIT 1 OFFSET (SELECT GREATEST((n + 2) // 3 - 1, 0) FROM nn)
), t2 AS (
  SELECT rate_milli AS t FROM rates ORDER BY rate_milli
  LIMIT 1 OFFSET (SELECT GREATEST((2 * n + 2) // 3 - 1, 0) FROM nn)
)
SELECT d.doc_id,
       CAST(COALESCE(r.rate_milli, -1) AS BIGINT) AS rate_milli,
       CASE WHEN r.doc_id IS NULL THEN 'empty'
            WHEN r.rate_milli <= (SELECT t FROM t1) THEN 'head'
            WHEN r.rate_milli <= (SELECT t FROM t2) THEN 'middle'
            ELSE 'tail' END AS tier
FROM documents d LEFT JOIN rates r USING (doc_id)
ORDER BY d.doc_id
"""


LM_QUERIES = {
    "lm_surprisal": (q_lm_surprisal, SQL_LM_SURPRISAL),
    "lm_tier": (q_lm_tier, SQL_LM_TIER),
}
