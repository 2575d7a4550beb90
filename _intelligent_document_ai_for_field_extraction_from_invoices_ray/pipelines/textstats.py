"""Text-analysis operators over the ``documents`` table — the training-data
pipeline toolkit (language ID, quality scoring, token counting, PII
masking, fingerprinting), each as a vectorized ``map_batches`` stage with
a DuckDB oracle.

Integer discipline: ratios are emitted as exactly-reproducible integers
(``round(1000 * a / b)`` of two int operands → identical double → identical
round in both engines)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import textnorm as T
from ..functions import vocab as V

_STOP_SQL = "(" + ",".join(f"'{w}'" for w in sorted(V.STOPWORDS)) + ")"


def _docs(sf_dir: str, columns=("doc_id", "text")) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# ------------------------------------------------------------ token counts
def q_doc_tokens(sf_dir: str) -> pd.DataFrame:
    def fn(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column("text").to_pylist()
        return pd.DataFrame({
            "doc_id": batch.column("doc_id").to_pylist(),
            "n_tokens": [len(t.split()) for t in texts],
            "n_chars": [len(t) for t in texts],
        })

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").to_pandas()


SQL_DOC_TOKENS = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE CAST(array_length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
       END AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------------ quality
def q_doc_quality(sf_dir: str) -> pd.DataFrame:
    """Quality heuristics: stopword ratio + mean token length (milli-units)."""
    stop = V.STOPWORDS

    def fn(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n_tok, stop_milli, len_milli = [], [], []
        for t in texts:
            toks = t.lower().split()
            n = len(toks)
            n_tok.append(n)
            n_stop = sum(1 for w in toks if w in stop)
            total_len = sum(len(w) for w in toks)
            # exact integer round-half-up on both sides (python round() is
            # half-even, DuckDB's is half-away — integer division dodges both)
            stop_milli.append((2000 * n_stop + n) // (2 * n) if n else 0)
            len_milli.append((2000 * total_len + n) // (2 * n) if n else 0)
        return pd.DataFrame({"doc_id": doc_ids, "n_tokens": n_tok,
                             "stop_ratio_milli": stop_milli,
                             "mean_token_len_milli": len_milli})

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").to_pandas()


SQL_DOC_QUALITY = rf"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
         END AS toks
  FROM documents
)
SELECT doc_id,
       CAST(array_length(toks) AS BIGINT) AS n_tokens,
       CASE WHEN array_length(toks) = 0 THEN 0
            ELSE CAST((2000 * len(list_filter(toks, w -> w IN {_STOP_SQL})) + array_length(toks))
                      // (2 * array_length(toks)) AS BIGINT)
       END AS stop_ratio_milli,
       CASE WHEN array_length(toks) = 0 THEN 0
            ELSE CAST((2000 * list_sum(list_transform(toks, w -> length(w))) + array_length(toks))
                      // (2 * array_length(toks)) AS BIGINT)
       END AS mean_token_len_milli
FROM t ORDER BY doc_id
"""


# ------------------------------------------------------------ language ID
def q_lang_id(sf_dir: str) -> pd.DataFrame:
    """Unicode-script language ID (the OCR >30% rule, ocr.py:314-348)."""

    def fn(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch.column("doc_id").to_pylist(),
            "lang_pred": [T.detect_language_ocr(t.strip())
                          for t in batch.column("text").to_pylist()],
        })

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").to_pandas()


SQL_LANG_ID = r"""
WITH c AS (
  SELECT doc_id,
         length(regexp_replace(text, '[^\x{0900}-\x{097F}]', '', 'g')) AS dev,
         length(regexp_replace(text, '[^\x{0A80}-\x{0AFF}]', '', 'g')) AS guj,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS lat
  FROM documents
)
SELECT doc_id,
       CASE WHEN dev + guj + lat = 0 THEN 'unknown'
            WHEN dev * 1.0 / (dev + guj + lat) > 0.3 THEN 'hin'
            WHEN guj * 1.0 / (dev + guj + lat) > 0.3 THEN 'guj'
            WHEN lat * 1.0 / (dev + guj + lat) > 0.3 THEN 'eng'
            ELSE 'mixed' END AS lang_pred
FROM c ORDER BY doc_id
"""


# ------------------------------------------------------------ PII masking
_PII_SUFFIX = " ref 9876543210 mail a.b@example.com PAN ABCDE1234F on 15/01/2024"


def q_pii_mask(sf_dir: str) -> pd.DataFrame:
    """PII masking over text (a deterministic PII suffix is appended so the
    masks actually fire on this PII-free corpus); mirrors the reference
    chain normalizer.py:210-231 as a vectorized stage."""

    def fn(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch.column("doc_id").to_pylist(),
            "masked": [T.mask_pii(t + _PII_SUFFIX)
                       for t in batch.column("text").to_pylist()],
        })

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").to_pandas()


SQL_PII_MASK = rf"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
  regexp_replace(regexp_replace(
    text || '{_PII_SUFFIX}',
    '\b[\w.%+-]+@[\w.-]+\.[A-Z|a-z]{{2,}}\b', '[EMAIL]', 'g'),
    '(?:\+91[\-\s]?)?[6789]\d{{9}}\b', '[PHONE]', 'g'),
    '\b[A-Z]{{5}}\d{{4}}[A-Z]\b', '[PAN]', 'g'),
    '\b\d{{2}}[A-Z]{{5}}\d{{4}}[A-Z]\d[Z]\d\b', '[GST]', 'g'),
    '\b\d{{4}}\s?\d{{4}}\s?\d{{4}}\b', '[AADHAR]', 'g'),
    '\b\d{{1,2}}[/\-]\d{{1,2}}[/\-]\d{{2,4}}\b', '[DATE]', 'g'),
    '\b\d{{4}}[/\-]\d{{1,2}}[/\-]\d{{1,2}}\b', '[DATE]', 'g') AS masked
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------------ fingerprint
def q_fingerprint(sf_dir: str) -> pd.DataFrame:
    """Canonical-text md5 fingerprint (lower + whitespace collapse)."""

    def fn(batch: pa.Table) -> pd.DataFrame:
        fps = []
        for t in batch.column("text").to_pylist():
            canon = " ".join(t.lower().split())
            fps.append(hashlib.md5(canon.encode("utf-8")).hexdigest())
        return pd.DataFrame({"doc_id": batch.column("doc_id").to_pylist(),
                             "fingerprint": fps})

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").to_pandas()


SQL_FINGERPRINT = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id
"""





# ------------------------------------------------------------ sampling
SAMPLE_MOD = 10      # keep 1-in-10


def q_sample_docs(sf_dir: str) -> pd.DataFrame:
    """Deterministic hash sampling — the scale-safe train/val splitter:
    keep a doc iff md5(doc_id) mod K == 0.  No RNG state, no coordination,
    identical on every worker/rerun, and any table keyed by doc_id can be
    co-sampled with the same predicate.  (ds.random_sample would be
    nondeterministic across runs and unjoinable across tables.)"""

    def fn(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_pylist()
        keep, kept_ids = [], []
        for d in ids:
            h = int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
            if h % SAMPLE_MOD == 0:
                kept_ids.append(d)
        return pd.DataFrame({"doc_id": pd.Series(kept_ids, dtype=np.int64)})

    out = (rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
           .map_batches(fn, batch_format="pyarrow").to_pandas())
    return out.sort_values("doc_id").reset_index(drop=True)


SQL_SAMPLE_DOCS = f"""
SELECT doc_id FROM documents
WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
      % {SAMPLE_MOD} = 0
ORDER BY doc_id
"""


# ------------------------------------------------------------ histogram
def q_token_histogram(sf_dir: str) -> pd.DataFrame:
    """Corpus doc-length distribution: log2-bucketed token counts with
    per-bucket doc and token totals — per-batch partial histograms merged
    by ONE tiny groupby (the corpus-stats pass every training-data run
    starts with)."""

    def fn(batch: pa.Table) -> pd.DataFrame:
        n = np.array([len(t.split()) for t in
                      batch.column("text").to_pylist()], dtype=np.int64)
        bucket = np.where(n > 0, np.floor(np.log2(np.maximum(n, 1))), -1).astype(np.int64)
        df = pd.DataFrame({"log2_bucket": bucket, "n": n})
        return df.groupby("log2_bucket", as_index=False).agg(
            n_docs=("n", "size"), total_tokens=("n", "sum"))

    from ray.data.aggregate import Sum

    out = (_docs(sf_dir).map_batches(fn, batch_format="pyarrow")
           .groupby("log2_bucket")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("total_tokens", alias_name="total_tokens"))
           .to_pandas())
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["total_tokens"] = out["total_tokens"].astype(np.int64)
    return out.sort_values("log2_bucket").reset_index(drop=True)


SQL_TOKEN_HISTOGRAM = r"""
WITH t AS (
  SELECT CASE WHEN trim(text) = '' THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
         END AS n
  FROM documents
)
SELECT CASE WHEN n > 0 THEN CAST(floor(log2(n)) AS BIGINT) ELSE -1 END AS log2_bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n) AS BIGINT) AS total_tokens
FROM t GROUP BY 1 ORDER BY log2_bucket
"""


TEXT_QUERIES = {
    "doc_tokens": (q_doc_tokens, SQL_DOC_TOKENS),
    "doc_quality": (q_doc_quality, SQL_DOC_QUALITY),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "pii_mask": (q_pii_mask, SQL_PII_MASK),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "sample_docs": (q_sample_docs, SQL_SAMPLE_DOCS),
    "token_histogram": (q_token_histogram, SQL_TOKEN_HISTOGRAM),
}
