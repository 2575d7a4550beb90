"""Inverted-index construction — the index-build operator of a search /
retrieval stack (posting-list assembly per token).

Shape: stateless ``map_batches`` partial posting stats per (batch,
token) — the in-batch combiner, so the ONE ``groupby(token)`` assembly
shuffle moves vocabulary-sized partials, never the corpus — then a
semilattice merge per token.  Posting CONTENT (not just counts) is
pinned by an order-independent checksum (sum of doc_id*tf) the SQL
oracle recomputes exactly in integer arithmetic.

Tokenization: ``text.lower().split()`` — the repo-wide convention
(textstats module header documents the single-spaced-corpus whitespace
discipline that makes it equal DuckDB's ``string_split(lower(text),
' ')``).
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


def build_index(ds: rd.Dataset) -> rd.Dataset:
    """(doc_id, text) -> per-token posting stats; see module docstring."""
    from collections import Counter

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        tok_rows, doc_rows, tf_rows = [], [], []
        for d, t in zip(ids, texts):
            for tok, tf in Counter(t.lower().split()).items():
                tok_rows.append(tok)
                doc_rows.append(d)
                tf_rows.append(tf)
        df = pd.DataFrame({
            "token": tok_rows,
            "doc": pd.Series(doc_rows, dtype=np.int64),
            "tf": pd.Series(tf_rows, dtype=np.int64),
        })
        df["ck"] = df["doc"] * df["tf"]
        return (df.groupby("token", as_index=False)
                  .agg(df_part=("doc", "size"),
                       total_tf=("tf", "sum"),
                       min_doc=("doc", "min"),
                       max_doc=("doc", "max"),
                       postings_sum=("ck", "sum")))

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "token": [group["token"].iloc[0]],
            "df": [int(group["df_part"].sum())],
            "total_tf": [int(group["total_tf"].sum())],
            "min_doc": [int(group["min_doc"].min())],
            "max_doc": [int(group["max_doc"].max())],
            "postings_sum": [int(group["postings_sum"].sum())],
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("token")
              .map_groups(merge, batch_format="pandas")
              .sort("token"))


def q_inverted_index(sf_dir: str) -> rd.Dataset:
    return build_index(_docs(sf_dir))


SQL_INVERTED_INDEX = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
  FROM documents WHERE length(text) > 0
), posting AS (
  SELECT token, doc_id, COUNT(*) AS tf FROM toks GROUP BY token, doc_id
)
SELECT token,
       COUNT(*) AS df,
       CAST(SUM(tf) AS BIGINT) AS total_tf,
       MIN(doc_id) AS min_doc,
       MAX(doc_id) AS max_doc,
       CAST(SUM(doc_id * tf) AS BIGINT) AS postings_sum
FROM posting GROUP BY token ORDER BY token
"""


INDEX_QUERIES = {
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
}
