"""Distributed BPE merge learning — tokenizer TRAINING (Sennrich et
al. 2016), the iterative counting loop behind every byte-pair-encoding
tokenizer.  (`textstats.q_bpe_tokens` applies a fixed merge table;
this operator LEARNS the table from the corpus.)

Scale shape (the HF-tokenizers factorization):
1. ONE corpus-sized pass reduces documents to the (word, count) table
   — per-batch Counter partials → one vocabulary-sized groupby.  All
   subsequent rounds touch only this table (vocabulary-sized, i.e.
   bounded by distinct words, not corpus rows), materialized once.
2. Each merge round is: map_batches adjacency-pair counting partials
   (weighted by word count) → one pair-vocabulary-sized groupby sum →
   a DISTRIBUTED argmax (sort desc + take(1) — never a driver-side
   table pull) → the winning pair broadcast by closure into a
   stateless merge-apply map.  T rounds = T bounded shuffles; the
   corpus is never re-read.

Exactness trick (the SQL oracle): symbol sequences travel as
double-separator strings ``||s1||s2||…||`` so merge application is a
plain non-overlapping left-to-right REPLACE of ``|L||R|`` with
``|LR|`` — each match consumes one of the two boundary pipes and
leaves the other for the neighbouring pair, so consecutive
occurrences (`abab` under merge a+b) all fire, exactly matching BPE's
greedy left-to-right application — and Python ``str.replace`` and
DuckDB ``replace`` share these semantics bit-for-bit.  Ties on pair
count break by (lsym, rsym) ascending.  Assumes symbols never contain
``|`` (corpus tokens are lowercase alphanumerics).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

N_MERGES = 6


def _docs(sf_dir: str) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["text"], rows_per_block=1000)


def word_counts(docs: rd.Dataset) -> rd.Dataset:
    """Corpus → (word, cnt, seq) with seq the initial per-char
    double-separator symbol string."""
    from collections import Counter

    def part(batch: pa.Table) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(t.lower().split())
        return pd.DataFrame({"word": list(c.keys()),
                             "cpart": pd.Series(list(c.values()),
                                                dtype=np.int64)})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("word", as_index=False).agg(cnt=("cpart", "sum"))
        g["seq"] = ["||" + "||".join(w) + "||" for w in g["word"]]
        return g.astype({"cnt": np.int64})

    from .grouping import bucketed_group_apply

    return bucketed_group_apply(
        docs.map_batches(part, batch_format="pyarrow"),
        ["word"], merge, num_buckets=32)


def learn_merges(words: rd.Dataset, n_merges: int = N_MERGES,
                 return_words: bool = False):
    """T rounds of weighted pair-count → argmax → merge-apply over the
    materialized word table.  Returns [(lsym, rsym, pair_count)] (and,
    with ``return_words``, the final re-segmented word table too)."""
    words = words.materialize()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        def pair_part(batch: pa.Table) -> pd.DataFrame:
            agg: dict[tuple[str, str], int] = {}
            for seq, cnt in zip(batch.column("seq").to_pylist(),
                                batch.column("cnt").to_pylist()):
                syms = seq.strip("|").split("||")
                for i in range(len(syms) - 1):
                    k = (syms[i], syms[i + 1])
                    agg[k] = agg.get(k, 0) + cnt
            return pd.DataFrame({
                "lsym": [k[0] for k in agg],
                "rsym": [k[1] for k in agg],
                "c": pd.Series(list(agg.values()), dtype=np.int64)})

        from ray.data.aggregate import Sum

        pairs = (words.map_batches(pair_part, batch_format="pyarrow")
                 .groupby(["lsym", "rsym"])
                 .aggregate(Sum("c", alias_name="c")))
        best_rows = (pairs.sort(["c", "lsym", "rsym"],
                                descending=[True, False, False])
                     .take(1))
        if not best_rows:
            break
        best = best_rows[0]
        lsym, rsym, c = best["lsym"], best["rsym"], int(best["c"])
        merges.append((lsym, rsym, c))

        pat, repl = f"|{lsym}||{rsym}|", f"|{lsym}{rsym}|"

        def apply(batch: pa.Table, pat=pat, repl=repl) -> pa.Table:
            seqs = [s.replace(pat, repl)
                    for s in batch.column("seq").to_pylist()]
            return pa.table({"word": batch.column("word"),
                             "cnt": batch.column("cnt"),
                             "seq": pa.array(seqs, type=pa.string())})

        words = words.map_batches(apply,
                                  batch_format="pyarrow").materialize()
    if return_words:
        return merges, words
    return merges


def q_bpe_learn(sf_dir: str) -> pd.DataFrame:
    merges = learn_merges(word_counts(_docs(sf_dir)))
    return pd.DataFrame({
        "rank": pd.Series(range(1, len(merges) + 1), dtype=np.int64),
        "lsym": [m[0] for m in merges],
        "rsym": [m[1] for m in merges],
        "pair_count": pd.Series([m[2] for m in merges],
                                dtype=np.int64)})


def _bpe_sql(n_merges: int = N_MERGES) -> str:
    """Unrolled oracle: one (pairs → best → re-written words) CTE
    triple per merge round, byte-identical replace semantics."""
    parts = [r"""
WITH wc AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
        AS word
    FROM documents WHERE trim(lower(text)) <> ''
  ) GROUP BY word
), w0 AS (
  SELECT word, cnt,
         '||' || regexp_replace(word, '(.)', '\1||', 'g') AS seq
  FROM wc
)"""]
    for k in range(n_merges):
        parts.append(f""",
p{k} AS (
  SELECT arr[i] AS lsym, arr[i+1] AS rsym,
         CAST(SUM(cnt) AS BIGINT) AS c
  FROM (SELECT cnt, string_split(trim(seq, '|'), '||') AS arr
        FROM w{k}) s,
       unnest(generate_series(1, len(arr)-1)) AS t(i)
  GROUP BY 1, 2
), b{k} AS (
  SELECT lsym, rsym, c FROM p{k} ORDER BY c DESC, lsym, rsym LIMIT 1
), w{k + 1} AS (
  SELECT w.word, w.cnt,
         replace(w.seq, '|' || b.lsym || '||' || b.rsym || '|',
                 '|' || b.lsym || b.rsym || '|') AS seq
  FROM w{k} w CROSS JOIN b{k} b
)""")
    selects = " UNION ALL ".join(
        f"SELECT CAST({k + 1} AS BIGINT) AS rank, lsym, rsym, "
        f"pair_count FROM (SELECT lsym, rsym, c AS pair_count "
        f"FROM b{k})"
        for k in range(n_merges))
    parts.append(f"\nSELECT * FROM ({selects}) ORDER BY rank")
    return "".join(parts)


SQL_BPE_LEARN = _bpe_sql()


def q_bpe_vocab_apply(sf_dir: str) -> rd.Dataset:
    """The re-segmented vocabulary AFTER the T learned merges — per
    word: its count, symbol count, and the full symbol-sequence string.
    Byte-pins the entire merge APPLICATION (not just the learned table)
    against the oracle's unrolled CTE chain: both sides must produce
    the identical double-separator string for every word."""

    _, words = learn_merges(word_counts(_docs(sf_dir)),
                            return_words=True)

    def finish(batch: pa.Table) -> pa.Table:
        seqs = batch.column("seq").to_pylist()
        n_syms = [len(s.strip("|").split("||")) for s in seqs]
        return pa.table({
            "word": batch.column("word"),
            "cnt": batch.column("cnt"),
            "n_syms": pa.array(n_syms, type=pa.int64()),
            "seq": batch.column("seq"),
        })

    return (words.map_batches(finish, batch_format="pyarrow")
            .sort("word"))


def _bpe_vocab_sql(n_merges: int = N_MERGES) -> str:
    chain = _bpe_sql(n_merges)
    # reuse the learn chain's CTEs, select the final word table instead
    head = chain[:chain.rindex("\nSELECT * FROM (")]
    return head + f"""
SELECT word, cnt,
       CAST(len(string_split(trim(seq, '|'), '||')) AS BIGINT)
           AS n_syms,
       seq
FROM w{n_merges} ORDER BY word
"""


SQL_BPE_VOCAB_APPLY = _bpe_vocab_sql()


BPE_QUERIES = {
    "bpe_learn": (q_bpe_learn, SQL_BPE_LEARN),
    "bpe_vocab_apply": (q_bpe_vocab_apply, SQL_BPE_VOCAB_APPLY),
}
