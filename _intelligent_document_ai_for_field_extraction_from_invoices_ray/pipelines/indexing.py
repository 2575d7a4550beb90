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


#: Fixed retrieval bank: (query_id, terms).  Small and static — the
#: realistic regime for index-time evaluation queries; broadcast by
#: closure, never joined.
BM25_QUERIES: list[tuple[str, list[str]]] = [
    ("q_hash_join", ["hash", "join"]),
    ("q_stream_window", ["stream", "window"]),
    ("q_sort_merge_scan", ["sort", "merge", "scan"]),
    ("q_spark", ["spark"]),
]

#: BM25 constants k1=1.2, b=0.75 folded into integer arithmetic (see
#: q_bm25_topk docstring).
_BM25_TOPK = 5


def _bm25_term_score(tf: int, dl: int, idf_s: int, n: int, total_len: int
                     ) -> int:
    """Integer BM25 term contribution.  With k1=6/5, b=3/4 and
    avgdl=L/N, the textbook term  idf·tf·(k1+1)/(tf+k1·(1−b+b·dl/avgdl))
    multiplied through by 10·L becomes the exact rational
    22·L·tf·idf / (10·L·tf + 3·L + 9·dl·N); flooring each term (not the
    sum) keeps every operation integer and SQL-reproducible.  idf is the
    same integer surrogate as tfidf_topk: idf_s = 1000·N // df (ln-based
    idf would hinge on libm equality between numpy and DuckDB)."""
    return (22 * total_len * tf * idf_s) // (
        10 * total_len * tf + 3 * total_len + 9 * dl * n)


def q_bm25_topk(sf_dir: str) -> rd.Dataset:
    """BM25 top-5 documents per retrieval query — the query-time half of
    the search stack `inverted_index` builds the index-time half of.

    Scale shape: two streaming passes, no corpus shuffle.  Pass 1
    computes the global stats BM25 needs (N, total token length, df per
    query term) as per-batch partials reduced by Ray's native tree
    aggregate (`Dataset.sum` — never a driver-side concat).  Pass 2 is
    stateless scoring: per-batch Counter tf → integer term scores →
    per-block top-k partial (k·|queries| rows per block, so the final
    exchange is block-count·20 tiny rows), finished by one
    vocabulary-free groupby(query_id) rank.  The global top-k is a
    subset of the union of per-block top-ks, so partial top-k is
    lossless."""
    from collections import Counter

    terms = sorted({t for _, ts in BM25_QUERIES for t in ts})
    docs = _docs(sf_dir)

    def stat_partial(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column("text").to_pylist()
        toks = [t.lower().split() for t in texts]
        row = {"n_part": np.int64(len(toks)),
               "len_part": np.int64(sum(len(tk) for tk in toks))}
        for t in terms:
            row[f"df_{t}"] = np.int64(sum(1 for tk in toks if t in tk))
        return pd.DataFrame([row])

    stats = (docs.map_batches(stat_partial, batch_format="pyarrow")
             .sum(on=["n_part", "len_part"] + [f"df_{t}" for t in terms]))
    n = int(stats["sum(n_part)"])
    total_len = int(stats["sum(len_part)"])
    idf_s = {t: 1000 * n // max(1, int(stats[f"sum(df_{t})"]))
             for t in terms}

    def score_partial(batch: pa.Table) -> pd.DataFrame:
        qids, dids, scores = [], [], []
        for d, text in zip(batch.column("doc_id").to_pylist(),
                           batch.column("text").to_pylist()):
            cnt = Counter(text.lower().split())
            dl = sum(cnt.values())
            for qid, qterms in BM25_QUERIES:
                s = sum(_bm25_term_score(cnt[t], dl, idf_s[t], n,
                                         total_len)
                        for t in qterms if cnt[t])
                if s > 0:
                    qids.append(qid)
                    dids.append(d)
                    scores.append(s)
        df = pd.DataFrame({"query_id": qids,
                           "doc_id": pd.Series(dids, dtype=np.int64),
                           "score_scaled": pd.Series(scores,
                                                     dtype=np.int64)})
        # lossless per-block prune: keep each query's block-local top-k
        df = df.sort_values(["query_id", "score_scaled", "doc_id"],
                            ascending=[True, False, True])
        return df.groupby("query_id", as_index=False).head(_BM25_TOPK)

    def finish(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["score_scaled", "doc_id"],
                              ascending=[False, True]).head(_BM25_TOPK)
        g = g.reset_index(drop=True)
        return g.assign(rank=pd.Series(np.arange(1, len(g) + 1),
                                       dtype=np.int64))

    return (docs.map_batches(score_partial, batch_format="pyarrow")
            .groupby("query_id")
            .map_groups(finish, batch_format="pandas")
            .sort(["query_id", "rank"]))


def _bm25_sql() -> str:
    term_vals = ", ".join(
        f"('{qid}', '{t}')" for qid, ts in BM25_QUERIES for t in ts)
    return rf"""
WITH stats AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CASE WHEN trim(lower(text)) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(lower(text)),
                                                 '\s+')) END)
              AS BIGINT) AS total_len
  FROM documents
), qterms(query_id, term) AS (VALUES {term_vals}),
toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS token
  FROM documents WHERE trim(lower(text)) <> ''
), dlen AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), tf AS (
  SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, token
), dfreq AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
), scored AS (
  SELECT q.query_id, t.doc_id,
         CAST(SUM((22 * s.total_len * t.tf * (1000 * s.n // d.df))
                  // (10 * s.total_len * t.tf + 3 * s.total_len
                      + 9 * l.dl * s.n)) AS BIGINT) AS score_scaled
  FROM qterms q
  JOIN tf t ON t.token = q.term
  JOIN dfreq d ON d.token = q.term
  JOIN dlen l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY q.query_id, t.doc_id
), ranked AS (
  SELECT query_id, doc_id, score_scaled,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY score_scaled DESC, doc_id)
              AS BIGINT) AS rank
  FROM scored WHERE score_scaled > 0
)
SELECT query_id, doc_id, score_scaled, rank
FROM ranked WHERE rank <= {_BM25_TOPK} ORDER BY query_id, rank
"""


SQL_BM25_TOPK = _bm25_sql()


#: lexical query ↔ embedding query pairing for hybrid fusion (the
#: embedding side uses vec_id < TOPK_QUERIES as its query set)
_HYBRID_PAIRS = [("q_hash_join", 0), ("q_stream_window", 1),
                 ("q_sort_merge_scan", 2), ("q_spark", 3)]
_RRF_K = 60
_HYBRID_TOPK = 5


def q_hybrid_search_rrf(sf_dir: str) -> pd.DataFrame:
    """Hybrid retrieval: BM25 (lexical) and cosine top-k (dense)
    result lists fused by Reciprocal Rank Fusion (Cormack et al. 2009)
    — `rrf_milli = Σ 1000 // (60 + rank)` over the lists a candidate
    appears in.  RRF is rank-only, so the fusion is exact integer
    arithmetic and the oracle composes the two already-gated SQL
    chains verbatim.

    Scale shape: the heavy work is the two underlying gated queries
    (each distributed, each bounded top-k output); fusion itself
    touches only |queries| × (k_lex + k_dense) rows — inherently
    driver-scale."""
    from .similarity import q_embed_topk

    lex = q_bm25_topk(sf_dir).to_pandas()      # ≤ 4×5 rows
    den = q_embed_topk(sf_dir)
    den = den.to_pandas() if hasattr(den, "to_pandas") else den

    rows = []
    for lex_q, den_q in _HYBRID_PAIRS:
        cand: dict[int, int] = {}
        for r in lex[lex.query_id == lex_q].itertuples(index=False):
            cand[int(r.doc_id)] = (cand.get(int(r.doc_id), 0)
                                   + 1000 // (_RRF_K + int(r.rank)))
        for r in den[den.query_id == den_q].itertuples(index=False):
            nid = int(r.neighbor_id)
            cand[nid] = cand.get(nid, 0) + 1000 // (_RRF_K + int(r.rank))
        fused = sorted(cand.items(), key=lambda kv: (-kv[1], kv[0]))
        for i, (doc, s) in enumerate(fused[:_HYBRID_TOPK], 1):
            rows.append((lex_q, i, doc, s))
    return pd.DataFrame({
        "query_id": [r[0] for r in rows],
        "rank": pd.Series([r[1] for r in rows], dtype=np.int64),
        "doc_id": pd.Series([r[2] for r in rows], dtype=np.int64),
        "rrf_milli": pd.Series([r[3] for r in rows], dtype=np.int64)})


def _hybrid_sql() -> str:
    from .similarity import SQL_EMBED_TOPK

    pairs = ", ".join(f"('{lq}', {dq})" for lq, dq in _HYBRID_PAIRS)
    return f"""
WITH lex AS (SELECT * FROM ({SQL_BM25_TOPK.rstrip()}) ),
den AS (SELECT * FROM ({SQL_EMBED_TOPK.rstrip()}) ),
qmap(lex_q, den_q) AS (VALUES {pairs}),
scores AS (
  SELECT m.lex_q AS query_id, l.doc_id,
         CAST(1000 // ({_RRF_K} + l.rank) AS BIGINT) AS part
  FROM qmap m JOIN lex l ON l.query_id = m.lex_q
  UNION ALL
  SELECT m.lex_q, d.neighbor_id,
         CAST(1000 // ({_RRF_K} + d.rank) AS BIGINT)
  FROM qmap m JOIN den d ON d.query_id = m.den_q
), fused AS (
  SELECT query_id, doc_id, CAST(SUM(part) AS BIGINT) AS rrf_milli
  FROM scores GROUP BY 1, 2
)
SELECT query_id, rank, doc_id, rrf_milli FROM (
  SELECT query_id, doc_id, rrf_milli,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                 ORDER BY rrf_milli DESC, doc_id)
              AS BIGINT) AS rank
  FROM fused) WHERE rank <= {_HYBRID_TOPK}
ORDER BY query_id, rank
"""


INDEX_QUERIES = {
    "inverted_index": (q_inverted_index, SQL_INVERTED_INDEX),
    "bm25_topk": (q_bm25_topk, SQL_BM25_TOPK),
    "hybrid_search_rrf": (q_hybrid_search_rrf, _hybrid_sql()),
}
