"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003 — the MOSS algorithm): the position-robust fingerprint
selection scheme plagiarism/near-dup systems use when rolling full-text
hashes are too dense and single whole-doc hashes too brittle.

Per doc: word K-grams are hashed; a window of W consecutive gram hashes
slides over the sequence and each window SELECTS its minimum hash —
rightmost position on ties (the paper's tie rule).  The distinct
(position, hash) selections are the doc's fingerprints; winnowing
guarantees any shared substring of length >= W+K-1 tokens yields at
least one shared fingerprint, while keeping density ~2/(W+1).

Hash parity with the oracle: the gram hash is md5 of the gram STRING,
compared lexicographically on the fixed-width lowercase hex — identical
total order in numpy (bytes 'S32' compare) and DuckDB (VARCHAR min).
The rightmost-on-ties rule is encoded in SQL by minimizing the
composite key ``hash || lpad(BIG - pos)`` (descending-position
suffix), and in numpy by an argmax over the reversed equality mask.

Scale shape: fingerprint selection is EMBARRASSINGLY parallel — one
map_batches pass, no shuffle; each doc's grams/windows live only inside
its batch.  The output is O(docs) scalar rows through one distributed
sort.  (The md5-per-gram loop is the same accepted per-string kernel as
q_fingerprint/q_sample_docs — md5 is the established cross-engine hash
seam; grams per doc are bounded by token count.)

Docs with fewer than W grams still emit fingerprints from the single
window covering all their grams (the coverage guarantee extends to
short docs); docs with zero grams (< K tokens) emit a zero row.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

K = 3          # tokens per gram
W = 4          # grams per window
_POS_BIG = 10_000_000   # > any gram count per doc; encodes pos DESC in SQL


def _docs(sf_dir: str) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"],
                              rows_per_block=1000)


def _winnow_doc(toks: list[str]) -> tuple[int, int, list[tuple[int, str]]]:
    """Returns (n_grams, n_windows, selections) for one doc; selections
    are distinct (pos, md5hex) pairs, pos 1-based to match the SQL.

    The 128-bit hash order + rightmost-tie rule is encoded as ONE int64
    rank per gram (lexsort by (hi64, lo64, pos DESC)); window minima
    over ranks are then a plain vectorized sliding min."""
    g = len(toks) - K + 1
    if g <= 0:
        return 0, 0, []
    hexes = [hashlib.md5(" ".join(toks[i:i + K]).encode("utf-8"))
             .hexdigest() for i in range(g)]
    hi = np.array([int(h[:16], 16) for h in hexes], dtype=np.uint64)
    lo = np.array([int(h[16:], 16) for h in hexes], dtype=np.uint64)
    rev = np.arange(g - 1, -1, -1, dtype=np.int64)   # pos DESC tiebreak
    order = np.lexsort((rev, lo, hi))
    rank = np.empty(g, dtype=np.int64)
    rank[order] = np.arange(g, dtype=np.int64)
    w = min(W, g)
    win = np.lib.stride_tricks.sliding_window_view(rank, w)
    if g <= W:
        win = win[:1]                 # one window covering all grams
    starts = np.arange(win.shape[0])
    amin = win.argmin(axis=1)
    idx = starts + amin               # selected gram index (0-based)
    sel = {(int(i) + 1, hexes[int(i)]) for i in idx}
    return g, win.shape[0], sorted(sel)


def q_winnow_fingerprint(sf_dir: str) -> rd.Dataset:
    """Per-doc winnowing fingerprint summary: gram/window counts, number
    of selected fingerprints, distinct hash count, and the min/max
    selected hash (spot-checkable anchors)."""

    def fn(batch: pa.Table) -> pd.DataFrame:
        rows = []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            g, nw, sel = _winnow_doc(t.lower().split())
            hset = sorted({h for _, h in sel})
            rows.append((d, g, nw, len(sel), len(hset),
                         hset[0] if hset else "",
                         hset[-1] if hset else ""))
        out = pd.DataFrame(rows, columns=[
            "doc_id", "n_grams", "n_windows", "n_fps", "n_distinct_fp",
            "min_fp", "max_fp"])
        for c in ("doc_id", "n_grams", "n_windows", "n_fps",
                  "n_distinct_fp"):
            out[c] = out[c].astype(np.int64)
        return out

    return (_docs(sf_dir).map_batches(fn, batch_format="pyarrow")
            .sort("doc_id"))


SQL_WINNOW_FINGERPRINT = rf"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
         END AS toks
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(toks[i : i + {K - 1}], ' ')) AS h
  FROM t, UNNEST(generate_series(1, len(toks) - {K - 1})) AS g(i)
), win AS (
  SELECT doc_id, pos,
         COUNT(*) OVER (PARTITION BY doc_id) AS g,
         MIN(h || lpad(CAST({_POS_BIG} - pos AS VARCHAR), 8, '0'))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW) AS k
  FROM grams
), sel AS (
  SELECT DISTINCT doc_id,
         {_POS_BIG} - CAST(substr(k, 33, 8) AS BIGINT) AS fpos,
         substr(k, 1, 32) AS fp
  FROM win
  WHERE pos >= {W} OR pos = g
), agg AS (
  SELECT doc_id, COUNT(*) AS n_fps,
         COUNT(DISTINCT fp) AS n_distinct_fp,
         MIN(fp) AS min_fp, MAX(fp) AS max_fp
  FROM sel GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(GREATEST(len(t.toks) - {K - 1}, 0) AS BIGINT) AS n_grams,
       CAST(CASE WHEN len(t.toks) - {K - 1} <= 0 THEN 0
                 WHEN len(t.toks) - {K - 1} <= {W} THEN 1
                 ELSE len(t.toks) - {K - 1} - {W} + 1 END AS BIGINT)
         AS n_windows,
       CAST(COALESCE(a.n_fps, 0) AS BIGINT) AS n_fps,
       CAST(COALESCE(a.n_distinct_fp, 0) AS BIGINT) AS n_distinct_fp,
       COALESCE(a.min_fp, '') AS min_fp,
       COALESCE(a.max_fp, '') AS max_fp
FROM t LEFT JOIN agg a USING (doc_id)
ORDER BY doc_id
"""


# ----------------------------------------------- fingerprint pair join
# MOSS's second half: docs sharing selected fingerprints are near-dup /
# plagiarism candidates.  Fingerprints selected by >
# _STOP_DOCS distinct docs are "stop fingerprints" (boilerplate grams)
# and excluded — the LSH stop-bucket rule, mirrored exactly in the SQL.
_STOP_DOCS = 50
_PAIR_TOPK = 100


def q_winnow_pairs(sf_dir: str) -> pd.DataFrame:
    """Top-100 doc pairs by number of SHARED winnowed fingerprints.

    Shape at scale: selection is the shuffle-free map pass; the (fp,
    doc) exchange buckets by fingerprint, so each bucket holds every
    doc selecting its fps — group sizes are globally correct, the stop
    rule and pair expansion (<= C(50,2) per fp) apply in-bucket, and
    per-pair counts pre-aggregate before the second (pair-keyed)
    shuffle.  Final top-100 is a semilattice (per-bucket top-100,
    <= 100 x 16 rows to the driver).  The fp ships as the 32-char hex
    (the oracle seam); a production variant ships the 16-byte binary."""
    from .grouping import bucketed_group_apply

    def explode(batch: pa.Table) -> pd.DataFrame:
        ids, fps = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            _, _, sel = _winnow_doc(t.lower().split())
            for h in {h for _, h in sel}:
                ids.append(d)
                fps.append(h)
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype=np.int64),
                             "fp": pd.Series(fps, dtype=object)})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        sizes = df.groupby("fp").doc_id.transform("size")
        df = df[sizes <= _STOP_DOCS]
        m = df.merge(df, on="fp", suffixes=("_a", "_b"))
        m = m[m.doc_id_a < m.doc_id_b]
        out = m.groupby(["doc_id_a", "doc_id_b"], as_index=False).agg(
            n_shared=("fp", "size"))
        return out.rename(columns={"doc_id_a": "a", "doc_id_b": "b"}
                          ).astype({"a": np.int64, "b": np.int64,
                                    "n_shared": np.int64})

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["a", "b"], as_index=False).n_shared.sum()
        out = out[out.n_shared >= 2]
        return (out.sort_values(["n_shared", "a", "b"],
                                ascending=[False, True, True])
                .head(_PAIR_TOPK)
                .astype({"a": np.int64, "b": np.int64,
                         "n_shared": np.int64}))

    exploded = _docs(sf_dir).map_batches(explode, batch_format="pyarrow")
    per_fp = bucketed_group_apply(exploded, ["fp"], pairs, num_buckets=16)
    merged = bucketed_group_apply(per_fp, ["a", "b"], topk,
                                  num_buckets=16).to_pandas()
    return (merged.sort_values(["n_shared", "a", "b"],
                               ascending=[False, True, True])
            .head(_PAIR_TOPK).reset_index(drop=True))


SQL_WINNOW_PAIRS = rf"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
         END AS toks
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos,
         md5(array_to_string(toks[i : i + {K - 1}], ' ')) AS h
  FROM t, UNNEST(generate_series(1, len(toks) - {K - 1})) AS g(i)
), win AS (
  SELECT doc_id, pos,
         COUNT(*) OVER (PARTITION BY doc_id) AS g,
         MIN(h || lpad(CAST({_POS_BIG} - pos AS VARCHAR), 8, '0'))
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW) AS k
  FROM grams
), docfp AS (
  SELECT DISTINCT doc_id, substr(k, 1, 32) AS fp
  FROM win
  WHERE pos >= {W} OR pos = g
), elig AS (
  SELECT fp FROM docfp GROUP BY fp HAVING COUNT(*) <= {_STOP_DOCS}
), pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_shared
  FROM docfp x JOIN docfp y
    ON x.fp = y.fp AND x.doc_id < y.doc_id
  WHERE x.fp IN (SELECT fp FROM elig)
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(n_shared AS BIGINT) AS n_shared
FROM pairs ORDER BY n_shared DESC, a, b LIMIT {_PAIR_TOPK}
"""


WINNOW_QUERIES = {
    "winnow_fingerprint": (q_winnow_fingerprint, SQL_WINNOW_FINGERPRINT),
    "winnow_pairs": (q_winnow_pairs, SQL_WINNOW_PAIRS),
}
