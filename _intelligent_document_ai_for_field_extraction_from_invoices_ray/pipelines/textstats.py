"""Text-analysis operators over the ``documents`` table — the training-data
pipeline toolkit (language ID, quality scoring, token counting, PII
masking, fingerprinting), each as a vectorized ``map_batches`` stage with
a DuckDB oracle.

Integer discipline: ratios are emitted as exactly-reproducible integers
(``round(1000 * a / b)`` of two int operands → identical double → identical
round in both engines).

Whitespace discipline: the ``str.split()``-tokenized queries assume
ASCII-whitespace corpora — Python splits on Unicode whitespace (NBSP,
ideographic space) while the DuckDB oracles' RE2 ``\\s`` is ASCII-only,
so a corpus token containing U+00A0 would tokenize differently across
engines.  ``q_bpe_tokens`` spells the RE2 class out explicitly and is
immune; the testdata corpus (and typical OCR output) is ASCII-spaced."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import textnorm as T
from ..functions import vocab as V

_STOP_SQL = "(" + ",".join(f"'{w}'" for w in sorted(V.STOPWORDS)) + ")"


def _typed_empty(**cols) -> "pa.Table":
    """Explicitly-typed zero-row Arrow table — an empty pandas OBJECT
    column infers Arrow ``null`` and poisons shuffle schema tracking
    ("new schema: ." -> silent row loss); every group fn here that can
    emit zero rows WITH a string column returns one of these (same
    convention as tpchx._typed_empty / dedup._empty_table)."""
    return pa.table({k: pa.array([], type=t) for k, t in cols.items()})


def _docs(sf_dir: str, columns=("doc_id", "text")) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    # text-heavy per-row map work (tokenizers) wants parallelism sooner
    return read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=list(columns), rows_per_block=1000)


# ------------------------------------------------------------ token counts
def q_doc_tokens(sf_dir: str) -> rd.Dataset:
    def fn(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column("text").to_pylist()
        return pd.DataFrame({
            "doc_id": batch.column("doc_id").to_pylist(),
            "n_tokens": [len(t.split()) for t in texts],
            "n_chars": [len(t) for t in texts],
        })

    # lazy: the driver/harness materializes; sort is distributed
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


SQL_DOC_TOKENS = r"""
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE CAST(array_length(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
       END AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents ORDER BY doc_id
"""


# ------------------------------------------------------------ quality
def q_doc_quality(sf_dir: str) -> rd.Dataset:
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

    # lazy: the driver/harness materializes; sort is distributed
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


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
def q_lang_id(sf_dir: str) -> rd.Dataset:
    """Unicode-script language ID (the OCR >30% rule, ocr.py:314-348)."""

    def fn(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch.column("doc_id").to_pylist(),
            "lang_pred": [T.detect_language_ocr(t.strip())
                          for t in batch.column("text").to_pylist()],
        })

    # lazy: the driver/harness materializes; sort is distributed
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


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


def q_pii_mask(sf_dir: str) -> rd.Dataset:
    """PII masking over text (a deterministic PII suffix is appended so the
    masks actually fire on this PII-free corpus); mirrors the reference
    chain normalizer.py:210-231 as a vectorized stage."""

    def fn(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": batch.column("doc_id").to_pylist(),
            "masked": [T.mask_pii(t + _PII_SUFFIX)
                       for t in batch.column("text").to_pylist()],
        })

    # lazy: the driver/harness materializes; sort is distributed
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


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
def q_fingerprint(sf_dir: str) -> rd.Dataset:
    """Canonical-text md5 fingerprint (lower + whitespace collapse)."""

    def fn(batch: pa.Table) -> pd.DataFrame:
        fps = []
        for t in batch.column("text").to_pylist():
            canon = " ".join(t.lower().split())
            fps.append(hashlib.md5(canon.encode("utf-8")).hexdigest())
        return pd.DataFrame({"doc_id": batch.column("doc_id").to_pylist(),
                             "fingerprint": fps})

    # lazy: the driver/harness materializes; sort is distributed
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


SQL_FINGERPRINT = r"""
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint
FROM documents ORDER BY doc_id
"""





# ------------------------------------------------------------ sampling
SAMPLE_MOD = 10      # keep 1-in-10


def q_sample_docs(sf_dir: str) -> rd.Dataset:
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

    return (_docs(sf_dir, columns=("doc_id",))
            .map_batches(fn, batch_format="pyarrow").sort("doc_id"))


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


# ------------------------------------------------------------ quantiles
def q_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact corpus doc-length quantiles from a distributed value
    histogram: token counts have a bounded value domain, so per-batch
    (n, count) partials reduce to a tiny histogram and the driver takes a
    cumulative scan — exact order statistics with ONE small shuffle and
    no global sort.  Quantile q = smallest n with cum_count ≥ ceil(q·N)
    (the inverted-CDF definition, stated explicitly so the SQL oracle
    computes the identical statistic)."""

    def fn(batch: pa.Table) -> pd.DataFrame:
        n = np.array([len(t.split()) for t in
                      batch.column("text").to_pylist()], dtype=np.int64)
        uniq, cnt = np.unique(n, return_counts=True)
        return pd.DataFrame({"n": uniq, "c": cnt.astype(np.int64)})

    from ray.data.aggregate import Sum

    hist = (_docs(sf_dir).map_batches(fn, batch_format="pyarrow")
            .groupby("n").aggregate(Sum("c", alias_name="c"))
            .to_pandas().sort_values("n"))
    total = int(hist["c"].sum())
    cum = hist["c"].cumsum().to_numpy()
    ns = hist["n"].to_numpy()

    def q_at(p: float) -> int:
        need = int(np.ceil(p * total))
        return int(ns[np.searchsorted(cum, need, side="left")])

    return pd.DataFrame({"n_docs": pd.Series([total], dtype=np.int64),
                         "p50": pd.Series([q_at(0.5)], dtype=np.int64),
                         "p90": pd.Series([q_at(0.9)], dtype=np.int64),
                         "p99": pd.Series([q_at(0.99)], dtype=np.int64),
                         "max_tokens": pd.Series([int(ns[-1])], dtype=np.int64)})


SQL_LENGTH_QUANTILES = r"""
WITH t AS (
  SELECT CASE WHEN trim(text) = '' THEN 0
              ELSE array_length(regexp_split_to_array(trim(text), '\s+'))
         END AS n
  FROM documents
), g AS (
  SELECT n, COUNT(*) AS c FROM t GROUP BY n
), cum AS (
  SELECT n, SUM(c) OVER (ORDER BY n) AS cc FROM g
), tot AS (SELECT COUNT(*) AS nd FROM t)
SELECT CAST(tot.nd AS BIGINT) AS n_docs,
       CAST((SELECT MIN(n) FROM cum WHERE cc >= ceil(0.5  * tot.nd)) AS BIGINT) AS p50,
       CAST((SELECT MIN(n) FROM cum WHERE cc >= ceil(0.9  * tot.nd)) AS BIGINT) AS p90,
       CAST((SELECT MIN(n) FROM cum WHERE cc >= ceil(0.99 * tot.nd)) AS BIGINT) AS p99,
       CAST((SELECT MAX(n) FROM t) AS BIGINT) AS max_tokens
FROM tot
"""


# ------------------------------------------------------------ stratified
STRAT_DENOM = 10     # keep ceil(|stratum| / 10) docs per stratum


def q_stratified_sample(sf_dir: str) -> rd.Dataset:
    """Stratified deterministic sample: within every ``lang`` stratum keep
    the ceil(|stratum|/10) docs with the smallest md5(doc_id) hash — an
    order-statistic per group, computed with one lang-bucketed shuffle
    (each stratum is wholly inside its bucket, so the group count and the
    bottom-k are local).  Deterministic, coordination-free, and the kept
    set is reproducible from the doc_id alone given the stratum sizes."""
    from .grouping import bucketed_group_apply

    def keyed(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_pylist()
        hv = [int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
              for d in ids]
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype=np.int64),
                             "lang": batch.column("lang").to_pylist(),
                             "hv": pd.Series(hv, dtype=np.int64)})

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, g in df.groupby("lang"):
            k = -(-len(g) // STRAT_DENOM)
            outs.append(g.sort_values(["hv", "doc_id"]).head(k))
        out = pd.concat(outs) if outs else df
        return out[["doc_id", "lang"]]

    ds = (_docs(sf_dir, columns=("doc_id", "lang"))
          .map_batches(keyed, batch_format="pyarrow"))
    return bucketed_group_apply(ds, ["lang"], per_bucket,
                                num_buckets=16).sort("doc_id")


SQL_STRATIFIED_SAMPLE = f"""
WITH h AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM documents
), r AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY hv, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS cnt
  FROM h
)
SELECT doc_id, lang FROM r
WHERE rn <= CAST(ceil(cnt / {STRAT_DENOM}.0) AS BIGINT)
ORDER BY doc_id
"""


QUOTA_CAP = 15       # absolute per-source cap


def q_source_quota(sf_dir: str) -> rd.Dataset:
    """Per-source quota capping — the mixture-control dual of
    ``q_stratified_sample``: keep at most QUOTA_CAP docs per ``source``
    (the smallest-md5(doc_id) ones), capping over-represented sources at
    an absolute budget the way curation stacks rebalance crawl dumps.

    Scale shape: each batch pre-selects its own QUOTA_CAP smallest
    hashes per source (a semilattice combiner — the cap commutes with
    union), so the source-bucketed shuffle moves at most
    cap × sources × blocks partial rows, never the corpus."""
    from .grouping import bucketed_group_apply

    def partial(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_pylist()
        hv = [int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)
              for d in ids]
        df = pd.DataFrame({"doc_id": pd.Series(ids, dtype=np.int64),
                           "source": batch.column("source").to_pylist(),
                           "hv": pd.Series(hv, dtype=np.int64)})
        df = df.sort_values(["hv", "doc_id"])
        return df.groupby("source", as_index=False, sort=False).head(QUOTA_CAP)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["hv", "doc_id"])
        out = df.groupby("source", as_index=False, sort=False).head(QUOTA_CAP)
        return out[["doc_id", "source"]]

    ds = (_docs(sf_dir, columns=("doc_id", "source"))
          .map_batches(partial, batch_format="pyarrow"))
    return bucketed_group_apply(ds, ["source"], per_bucket,
                                num_buckets=16).sort("doc_id")


SQL_SOURCE_QUOTA = f"""
WITH h AS (
  SELECT doc_id, source,
         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS hv
  FROM documents
), r AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rn
  FROM h
)
SELECT doc_id, source FROM r
WHERE rn <= {QUOTA_CAP}
ORDER BY doc_id
"""


# ------------------------------------------------------------ tf-idf
def q_tfidf_topk(sf_dir: str) -> rd.Dataset:
    """Top-3 distinguishing terms per doc by integer-ratio TF-IDF
    (score = 1000·tf·N // df — a pure-integer idf surrogate, exactly
    reproducible in SQL; ln-based idf would hinge on libm equality).

    Fully distributed, no vocabulary broadcast: (doc, token, tf) rows
    bucket by TOKEN, so each bucket sees every occurrence of its tokens
    and computes df as the group size and the score in place; a second
    bucketed shuffle by DOC picks each doc's top-3 (score desc, token
    asc).  Two shuffles ∝ distinct (doc, token) pairs."""
    from collections import Counter

    from .grouping import bucketed_group_apply

    docs = _docs(sf_dir)
    n_docs = int(docs.count())

    def explode(batch: pa.Table) -> pd.DataFrame:
        ids, toks, tfs = [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            for tok, tf in Counter(t.lower().split()).items():
                ids.append(d)
                toks.append(tok)
                tfs.append(tf)
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype=np.int64),
                             "token": toks,
                             "tf": pd.Series(tfs, dtype=np.int64)})

    def score_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # every row of a token is in this bucket → df = group size
        dfreq = df.groupby("token")["doc_id"].transform("size")
        score = (1000 * df["tf"].to_numpy() * n_docs) // dfreq.to_numpy()
        return df.assign(score_scaled=score)[["doc_id", "token",
                                              "score_scaled"]]

    def topk_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "score_scaled", "token"],
                            ascending=[True, False, True])
        df["rnk"] = df.groupby("doc_id").cumcount() + 1
        return df[df["rnk"] <= 3]

    def topk_typed(df: pd.DataFrame) -> pd.DataFrame:
        out = topk_bucket(df)
        return out.assign(rnk=out["rnk"].astype(np.int64))

    scored = bucketed_group_apply(
        docs.map_batches(explode, batch_format="pyarrow"),
        ["token"], score_bucket, num_buckets=64)
    return bucketed_group_apply(scored, ["doc_id"], topk_typed,
                                num_buckets=64).sort(["doc_id", "rnk"])


SQL_TFIDF_TOPK = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
         END AS toks
  FROM documents
), u AS (
  SELECT doc_id, unnest(toks) AS token FROM t
), tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM u GROUP BY doc_id, token
), dfq AS (
  SELECT token, COUNT(*) AS dfd FROM tf GROUP BY token
), s AS (
  SELECT tf.doc_id, tf.token,
         CAST((1000 * tf.tf * (SELECT COUNT(*) FROM documents)) // dfq.dfd
              AS BIGINT) AS score_scaled
  FROM tf JOIN dfq USING (token)
), r AS (
  SELECT doc_id, token, score_scaled,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score_scaled DESC, token) AS rnk
  FROM s
)
SELECT doc_id, token, score_scaled, CAST(rnk AS BIGINT) AS rnk
FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk
"""


# ------------------------------------------------------------ hotspots
def q_ngram_hotspots(sf_dir: str) -> pd.DataFrame:
    """Top-20 most-repeated 5-token spans across the corpus (multiset
    occurrence counts — the contamination / boilerplate detector).
    Per-batch Counter partials → token-bucketed sum → per-bucket top-20 →
    tiny driver merge; only (ngram, count) partials ever move."""
    from collections import Counter

    from .grouping import bucketed_group_apply

    K = 5

    def partial(batch: pa.Table) -> pd.DataFrame:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = t.lower().split()
            for i in range(len(toks) - K + 1):
                c[" ".join(toks[i:i + K])] += 1
        if not c:
            return pd.DataFrame({"ngram": pd.Series(dtype=object),
                                 "n_occurrences": pd.Series(dtype=np.int64)})
        return pd.DataFrame({"ngram": list(c.keys()),
                             "n_occurrences": pd.Series(list(c.values()),
                                                        dtype=np.int64)})

    def sum_top(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("ngram", as_index=False)["n_occurrences"].sum()
        return g.sort_values(["n_occurrences", "ngram"],
                             ascending=[False, True]).head(20)

    parts = bucketed_group_apply(
        _docs(sf_dir).map_batches(partial, batch_format="pyarrow"),
        ["ngram"], sum_top, num_buckets=32).to_pandas()
    out = parts.sort_values(["n_occurrences", "ngram"],
                            ascending=[False, True]).head(20)
    return out.reset_index(drop=True)


SQL_NGRAM_HOTSPOTS = r"""
WITH t AS (
  SELECT CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
         END AS w
  FROM documents
), g AS (
  SELECT unnest(list_transform(range(1, array_length(w) - 3),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                     || w[i+3] || ' ' || w[i+4])) AS ngram
  FROM t WHERE array_length(w) >= 5
)
SELECT ngram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM g GROUP BY ngram
ORDER BY n_occurrences DESC, ngram LIMIT 20
"""


# ------------------------------------------------------- BPE-ish tokens
# whitespace is the EXPLICIT RE2 \s class [\t\n\f\r ]: Python's \s is
# Unicode-aware (NBSP, ideographic space...) while DuckDB's RE2 \s is
# ASCII-only, so spelling the class out makes both engines tokenize
# exotic-whitespace text identically (NBSP falls into the symbol-run
# branch on BOTH sides)
_BPE_PAT = (r"'s|'t|'re|'ve|'m|'ll|'d"
            r"| ?[A-Za-z]+| ?[0-9]+| ?[^\t\n\f\r A-Za-z0-9]+|[\t\n\f\r ]+")


def q_bpe_tokens(sf_dir: str) -> rd.Dataset:
    """Token counting under a GPT-2-style BPE PRE-tokenizer regex (the
    contraction / letter-run / digit-run / symbol-run / whitespace
    alternation) — the LLM-budget view of document length, vs
    ``q_doc_tokens``' whitespace split.  The pattern is deliberately
    lookahead-free and spells whitespace as the explicit RE2 class
    [\\t\\n\\f\\r ] so Python ``re`` and DuckDB's RE2 tokenize
    identically even on Unicode whitespace (verified incl.
    Devanagari/Gujarati and NBSP — non-Latin scripts and exotic spaces
    fall into the symbol-run branch on both sides, like tiktoken treats
    bytes outside its letter classes).  One compiled-regex
    ``map_batches`` pass, no shuffle; lazy distributed-sorted Dataset
    out."""
    import re

    rx = re.compile(_BPE_PAT)

    def fn(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        n = np.empty(len(texts), dtype=np.int64)
        d = np.empty(len(texts), dtype=np.int64)
        for r, t in enumerate(texts):
            toks = rx.findall(t)
            n[r] = len(toks)
            d[r] = len(set(toks))
        return pd.DataFrame({"doc_id": ids, "n_bpe_tokens": n,
                             "distinct_bpe": d})

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


SQL_BPE_TOKENS = r"""
WITH t AS (
  SELECT doc_id,
         regexp_extract_all(text,
           $$'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+$$)
           AS toks
  FROM documents
)
SELECT doc_id,
       CAST(array_length(toks) AS BIGINT) AS n_bpe_tokens,
       CAST(length(list_distinct(toks)) AS BIGINT) AS distinct_bpe
FROM t ORDER BY doc_id
"""


# ------------------------------------------------------- heavy hitters
def q_token_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Exact top-20 tokens by corpus occurrence count via a
    sketch-then-verify plan whose exchange is VOCABULARY-INDEPENDENT —
    the scale-path complement to ``q_ngram_hotspots``' exact Counter
    partials (those ship every distinct term a batch saw; at 100 TB the
    per-batch vocabulary IS the batch).

    Plan (Misra-Gries/SpaceSaving family, mergeable-summary shape):
      1. per batch: exact local Counter, emit only the top-K_SKETCH
         (=256) tokens (a lower bound L(t) of each token's true count)
         plus one sentinel row carrying the batch's largest DROPPED
         count — the max any token could be undercounted by this batch.
      2. bucketed sum of those bounded partials (exchange ≤ (K+1)·blocks
         rows, whatever the vocabulary); global top-C (=64) by L become
         candidates, Σ sentinels = err.
      3. exact pass: broadcast the 64 candidates, count them per batch
         (set-membership filter), bucketed sum of the ≤64-row partials
         → exact counts (exchange ≤ 64·blocks, result ≤ 64 rows).
      4. CERTIFICATE: any non-candidate's true count ≤ min L(cand) +
         err; if the exact 20th beats that bound the result is provably
         the exact top-20 (ties included — a non-candidate cannot even
         equal it).  On the rare certificate miss (near-uniform token
         distribution) fall back to the exact full-vocabulary plan, so
         the result is ALWAYS exact and SQL-checkable.

    Two corpus passes, zero all-to-all of corpus-sized data."""
    from collections import Counter

    from .grouping import bucketed_group_apply

    K_SKETCH, CAND, TOPN = 256, 64, 20
    docs = _docs(sf_dir)

    # ONE tokenizer for all three passes — the exactness certificate
    # requires the sketch, verify and fallback passes to count the same
    # tokens the SQL oracle's regexp_split does
    def _count(batch: pa.Table, keep: set | None = None) -> Counter:
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            toks = t.lower().split()
            c.update(toks if keep is None
                     else (tok for tok in toks if tok in keep))
        return c

    def _frame(pairs, dropped: int | None = None) -> pa.Table:
        # explicit Arrow types: an EMPTY pandas partial would infer a
        # float64/null token column and fork the block schema through
        # the shuffle (the silent-row-loss hazard grouping.py documents).
        # The dropped-count travels as a TYPED kind=1 row, never as a
        # magic token — str.split() CAN yield NUL-containing corpus
        # tokens (\x00 is not whitespace), so a "\x00err" sentinel
        # would swallow them
        toks = [t for t, _ in pairs]
        cnts = [v for _, v in pairs]
        kinds = [0] * len(pairs)
        if dropped is not None:
            toks.append("")          # key is ignored for kind=1 rows
            cnts.append(dropped)
            kinds.append(1)
        return pa.table({"token": pa.array(toks, type=pa.string()),
                         "cnt": pa.array(cnts, type=pa.int64()),
                         "kind": pa.array(kinds, type=pa.int8())})

    def partial(batch: pa.Table) -> pd.DataFrame:
        top = _count(batch).most_common(K_SKETCH + 1)
        dropped = 0
        if len(top) > K_SKETCH:
            dropped = top[-1][1]
            top = top[:K_SKETCH]
        return _frame(top, dropped)

    def sum_bucket(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["token", "kind"], as_index=False)["cnt"].sum()
        sent = g[g.kind == 1]
        rest = (g[g.kind == 0]
                .sort_values(["cnt", "token"], ascending=[False, True])
                .head(CAND))
        return pd.concat([rest, sent], ignore_index=True)

    parts = bucketed_group_apply(
        docs.map_batches(partial, batch_format="pyarrow"),
        ["token"], sum_bucket, num_buckets=16).to_pandas()
    err = int(parts.loc[parts.kind == 1, "cnt"].sum())
    lower = (parts[parts.kind == 0]
             .sort_values(["cnt", "token"], ascending=[False, True])
             .head(CAND))
    cand = lower["token"].to_numpy()
    bound = int(lower["cnt"].iloc[-1]) + err if len(lower) else err

    cand_set = set(cand)

    def exact_partial(batch: pa.Table) -> pd.DataFrame:
        return _frame(list(_count(batch, keep=cand_set).items()))

    def sum_all(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("token", as_index=False)["cnt"].sum()

    exact = (bucketed_group_apply(
        docs.map_batches(exact_partial, batch_format="pyarrow"),
        ["token"], sum_all, num_buckets=4).to_pandas()
        .sort_values(["cnt", "token"], ascending=[False, True])
        .head(TOPN).reset_index(drop=True))

    if len(exact) < TOPN or int(exact["cnt"].iloc[-1]) <= bound:
        # certificate miss: fall back to the exact full-vocabulary plan
        def full_partial(batch: pa.Table) -> pd.DataFrame:
            return _frame(list(_count(batch).items()))

        def sum_top(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("token", as_index=False)["cnt"].sum()
            return g.sort_values(["cnt", "token"],
                                 ascending=[False, True]).head(TOPN)

        exact = (bucketed_group_apply(
            docs.map_batches(full_partial, batch_format="pyarrow"),
            ["token"], sum_top, num_buckets=16).to_pandas()
            .sort_values(["cnt", "token"], ascending=[False, True])
            .head(TOPN).reset_index(drop=True))

    return exact.rename(columns={"cnt": "n_occurrences"})


SQL_TOKEN_HEAVY_HITTERS = r"""
WITH t AS (
  SELECT CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
         END AS toks
  FROM documents
), u AS (
  SELECT unnest(toks) AS token FROM t
)
SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM u GROUP BY token
ORDER BY n_occurrences DESC, token LIMIT 20
"""


# ------------------------------------------------------- repetition filter
def q_repetition_stats(sf_dir: str) -> rd.Dataset:
    """Gopher-style per-doc repetition metrics — the quality-filter
    family that catches templated / machine-looped text exact-dedup
    misses: most-common-token share, duplicate-bigram share and
    most-common-bigram share, all exact integer milli-ratios (floor
    division on both sides, so no float-hash fragility).

    Embarrassingly parallel: one ``map_batches`` pass, no shuffle; the
    per-doc Counter loop IS the vectorization choice here — measured 2x
    faster than a pandas str.split/explode/groupby chain on this corpus
    (short docs: the explode machinery costs more than the loop).
    Scale shape: output is O(docs) scalar rows, nothing corpus-sized is
    held anywhere; the trailing sort is distributed and lazy."""
    from collections import Counter

    def fn(batch: pa.Table) -> pd.DataFrame:
        doc_ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out = np.zeros((len(texts), 5), dtype=np.int64)
        for r, t in enumerate(texts):
            toks = t.lower().split()
            n = len(toks)
            if not n:
                continue
            ctok = Counter(toks)
            out[r, 0] = n
            out[r, 1] = len(ctok)
            out[r, 2] = 1000 * max(ctok.values()) // n
            if n > 1:
                cbi = Counter(zip(toks, toks[1:]))
                nb = n - 1
                out[r, 3] = 1000 * (nb - len(cbi)) // nb
                out[r, 4] = 1000 * max(cbi.values()) // nb
        return pd.DataFrame({
            "doc_id": doc_ids,
            "n_tokens": out[:, 0], "distinct_tokens": out[:, 1],
            "top_token_milli": out[:, 2], "dup_bigram_milli": out[:, 3],
            "top_bigram_milli": out[:, 4],
        })

    # lazy: the driver/harness materializes; sort is distributed
    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow").sort("doc_id")


SQL_REPETITION_STATS = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
         END AS toks
  FROM documents
), base AS (
  SELECT doc_id, toks,
         list_transform(generate_series(1, len(toks)-1),
                        i -> toks[i] || ' ' || toks[i+1]) AS bigrams
  FROM t
), tok_stats AS (
  SELECT doc_id, SUM(cnt) AS n_tokens, COUNT(*) AS distinct_tokens,
         MAX(cnt) AS top_tok
  FROM (SELECT doc_id, tok, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(toks) AS tok FROM base)
        GROUP BY doc_id, tok)
  GROUP BY doc_id
), bi_stats AS (
  SELECT doc_id, SUM(cnt) AS n_bigrams, COUNT(*) AS distinct_bigrams,
         MAX(cnt) AS top_bg
  FROM (SELECT doc_id, bg, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(bigrams) AS bg FROM base)
        GROUP BY doc_id, bg)
  GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(COALESCE(ts.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(ts.distinct_tokens, 0) AS BIGINT) AS distinct_tokens,
       CAST(CASE WHEN COALESCE(ts.n_tokens, 0) = 0 THEN 0
            ELSE (1000 * ts.top_tok) // ts.n_tokens END AS BIGINT) AS top_token_milli,
       CAST(CASE WHEN COALESCE(bs.n_bigrams, 0) = 0 THEN 0
            ELSE (1000 * (bs.n_bigrams - bs.distinct_bigrams)) // bs.n_bigrams
            END AS BIGINT) AS dup_bigram_milli,
       CAST(CASE WHEN COALESCE(bs.n_bigrams, 0) = 0 THEN 0
            ELSE (1000 * bs.top_bg) // bs.n_bigrams END AS BIGINT) AS top_bigram_milli
FROM base b
LEFT JOIN tok_stats ts USING (doc_id)
LEFT JOIN bi_stats bs USING (doc_id)
ORDER BY doc_id
"""


# ------------------------------------------------------- duplicate passages
def q_dup_passages(sf_dir: str) -> rd.Dataset:
    """Exact duplicated-PASSAGE coverage per doc — the k-gram-anchor
    analog of suffix-array substring dedup (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"): a
    word-8-gram occurring in ≥2 DISTINCT docs marks its 8-token window
    duplicated; per doc we report the flagged anchor count and the
    union-of-windows token coverage (gaps-and-islands: Σ min(8, gap to
    next anchor)).  Catches copied paragraphs inside otherwise-unique
    docs, which whole-doc exact/near dedup both miss; within-doc
    repetition is deliberately NOT flagged (that is q_repetition_stats'
    job — cross-doc only, via COUNT(DISTINCT doc_id) > 1).

    Scale shape: stage 1 emits (h1, h2, doc_id, pos) anchors — the gram
    itself never ships: two independent 64-bit siphashes of the 8-token
    window (128 bits total — collision-free in practice at 10^12 grams;
    a collision could only FLAG an extra window, never unflag one) cut
    the exchange ~2.5x vs the ~55-byte gram string.  Anchors bucket by
    hash (no vocabulary broadcast — each bucket sees every occurrence of
    its grams, flags cross-doc ones with one vectorized transform);
    stage 2 re-buckets only the FLAGGED (doc_id, pos) pairs by doc and
    co-groups them with the tiny per-doc token counts to compute
    coverage.  Two shuffles: first ∝ total token positions, second ∝
    flagged anchors only.  Nothing corpus-sized touches the driver;
    output is a lazy distributed-sorted Dataset of O(docs) scalar rows."""
    from .grouping import bucketed_cogroup, bucketed_group_apply

    K = 8
    docs = _docs(sf_dir)

    def explode(batch: pa.Table) -> pd.DataFrame:
        ids, poss, grams = [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            toks = t.lower().split()
            for i in range(len(toks) - K + 1):
                ids.append(d)
                poss.append(i)
                grams.append(" ".join(toks[i:i + K]))
        g = pd.Series(grams, dtype=object)
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype=np.int64),
            "pos": pd.Series(poss, dtype=np.int64),
            # deterministic across processes: pandas siphash, fixed keys
            "h1": pd.util.hash_pandas_object(g, index=False).to_numpy()
                    .astype(np.int64),
            "h2": pd.util.hash_pandas_object(
                g, index=False, hash_key="dup_passages_k2!").to_numpy()
                    .astype(np.int64),
        })

    def flag_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # every occurrence of a gram(-hash) is in this bucket →
        # cross-doc test is one transform; only flagged rows leave
        nuniq = df.groupby(["h1", "h2"])["doc_id"].transform("nunique")
        return df.loc[nuniq.to_numpy() > 1, ["doc_id", "pos"]]

    def counts(batch: pa.Table) -> pd.DataFrame:
        texts = batch.column("text").to_pylist()
        return pd.DataFrame({
            "doc_id": pd.Series(batch.column("doc_id").to_pylist(),
                                dtype=np.int64),
            "n_tokens": pd.Series([len(t.split()) for t in texts],
                                  dtype=np.int64)})

    def coverage(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        # lf: (doc_id, n_tokens) for this bucket; rf: flagged anchors
        out = lf[["doc_id", "n_tokens"]].copy()
        if rf.empty:
            dp = pd.Series(0, index=out.index, dtype=np.int64)
            cov = dp
        else:
            s = rf.sort_values(["doc_id", "pos"])
            nxt = s["pos"].shift(-1)
            same = s["doc_id"].shift(-1).eq(s["doc_id"])
            gap = np.where(same.to_numpy(), nxt.to_numpy() - s["pos"].to_numpy(), K)
            agg = (s.assign(_c=np.minimum(gap, K).astype(np.int64))
                    .groupby("doc_id").agg(dp=("pos", "size"), cov=("_c", "sum")))
            m = out.merge(agg, left_on="doc_id", right_index=True, how="left")
            dp = m["dp"].fillna(0).astype(np.int64)
            cov = m["cov"].fillna(0).astype(np.int64)
        n = out["n_tokens"].to_numpy()
        return pd.DataFrame({
            "doc_id": out["doc_id"].to_numpy(),
            "n_tokens": n,
            "dup_positions": dp.to_numpy(),
            "dup_cov_tokens": cov.to_numpy(),
            "dup_cov_milli": np.where(n > 0, (1000 * cov.to_numpy()) // np.maximum(n, 1), 0),
        })

    flagged = bucketed_group_apply(
        docs.map_batches(explode, batch_format="pyarrow"),
        ["h1", "h2"], flag_bucket, num_buckets=64)
    stats = docs.map_batches(counts, batch_format="pyarrow")
    return bucketed_cogroup(stats, flagged, ["doc_id"], ["doc_id"],
                            coverage, num_buckets=64).sort("doc_id")


SQL_DUP_PASSAGES = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
         END AS toks
  FROM documents
), grams AS (
  SELECT doc_id, i AS pos, array_to_string(toks[i : i + 7], ' ') AS gram
  FROM t, UNNEST(generate_series(1, len(toks) - 7)) AS g(i)
), flagged AS (
  SELECT doc_id, pos FROM grams
  WHERE gram IN (SELECT gram FROM grams GROUP BY gram
                 HAVING COUNT(DISTINCT doc_id) > 1)
), cov AS (
  SELECT doc_id, COUNT(*) AS dup_positions,
         SUM(LEAST(8, COALESCE(next_pos - pos, 8))) AS cov_tokens
  FROM (SELECT doc_id, pos,
               LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS next_pos
        FROM flagged)
  GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(COALESCE(c.dup_positions, 0) AS BIGINT) AS dup_positions,
       CAST(COALESCE(c.cov_tokens, 0) AS BIGINT) AS dup_cov_tokens,
       CAST(CASE WHEN len(t.toks) = 0 THEN 0
            ELSE (1000 * COALESCE(c.cov_tokens, 0)) // len(t.toks)
            END AS BIGINT) AS dup_cov_milli
FROM t LEFT JOIN cov c USING (doc_id)
ORDER BY doc_id
"""


# ------------------------------------------------------- decontamination
def q_decontamination(sf_dir: str) -> rd.Dataset:
    """Benchmark decontamination: flag every doc by how many DISTINCT
    5-token spans it shares with the eval set (the held-out docs chosen
    by the deterministic md5 predicate — the same coordination-free
    splitter as ``sample_docs``).

    Pass 1 collects the eval set's distinct span hashes (the eval side
    of a decontamination run is a fixed benchmark — bounded by
    construction, so the hash set broadcasts; a corpus-sized right side
    would use the bucketed join instead).  Pass 2 is one vectorized
    ``np.isin`` per batch.  Span identity is a 64-bit polynomial hash of
    the token blake2b hashes (collision odds ~2^-64 per pair)."""
    from ..functions import sketch as SK

    K = 5

    def _is_eval(doc_id) -> bool:
        h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        return h % SAMPLE_MOD == 0

    def _doc_grams(text: str, memo: dict) -> np.ndarray:
        toks = text.lower().split()
        return np.unique(SK.shingle_hashes(toks, K, memo).view(np.int64)) \
            if len(toks) >= K else np.empty(0, dtype=np.int64)

    def eval_grams(batch: pa.Table) -> pa.Table:
        memo: dict = {}
        out = []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if _is_eval(d):
                out.append(_doc_grams(t, memo))
        allh = np.unique(np.concatenate(out)) if out \
            else np.empty(0, dtype=np.int64)
        return pa.table({"g": pa.array(allh, type=pa.int64())})

    ev = _docs(sf_dir).map_batches(eval_grams,
                                   batch_format="pyarrow").to_pandas()
    eval_set = np.unique(ev["g"].to_numpy()) if len(ev) \
        else np.empty(0, dtype=np.int64)

    def count_hits(batch: pa.Table) -> pd.DataFrame:
        memo: dict = {}
        ids = batch.column("doc_id").to_pylist()
        hits, evs = [], []
        for d, t in zip(ids, batch.column("text").to_pylist()):
            grams = _doc_grams(t, memo)
            hits.append(int(np.isin(grams, eval_set).sum()))
            evs.append(np.int64(1 if _is_eval(d) else 0))
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype=np.int64),
                             "eval_ngrams_hit": pd.Series(hits,
                                                          dtype=np.int64),
                             "is_eval": pd.Series(evs, dtype=np.int64)})

    return (_docs(sf_dir).map_batches(count_hits, batch_format="pyarrow")
            .sort("doc_id"))


SQL_DECONTAMINATION = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\\s+')
         END AS w
  FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(range(1, array_length(w) - 3),
                i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                     || w[i+3] || ' ' || w[i+4]))) AS ngram
  FROM t WHERE array_length(w) >= 5
), ev AS (
  SELECT DISTINCT ngram FROM g
  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
        % {SAMPLE_MOD} = 0
), hits AS (
  SELECT g.doc_id, COUNT(*) AS n FROM g JOIN ev USING (ngram)
  GROUP BY g.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS eval_ngrams_hit,
       CAST(CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))
                      AS BIGINT) % {SAMPLE_MOD} = 0 THEN 1 ELSE 0 END
            AS BIGINT) AS is_eval
FROM documents d LEFT JOIN hits h USING (doc_id)
ORDER BY d.doc_id
"""


# ------------------------------------------------------------ PMI
_PMI_MIN_COUNT = 5
_PMI_TOPK = 50


def q_token_pmi(sf_dir: str) -> pd.DataFrame:
    """Top-50 adjacent-bigram collocations by pointwise mutual
    information — the association statistic (Church & Hanks 1990)
    behind phrase mining and collocation extraction.

    Integer PMI surrogate (the repo's libm-avoidance discipline): the
    probability ratio  P(a,b)/(P(a)P(b)) = c₂·N₁²/(N₂·c₁ₐ·c₁ᵦ)  is
    emitted as the two-step floor  ((1000·c₂·N₁ // c₁ₐ) · N₁) //
    (c₁ᵦ·N₂)  — each step stays under int64 because c₂ ≤ c₁ₐ (holds to
    N₁ ~ 10¹³ tokens; beyond that the scale rebases — a raise, not a
    silent wrap), and the identical expression runs in DuckDB.

    Scale shape: bigram-count partials → one bucketed merge; unigram
    counts the same; then TWO bucketed cogroups attach c₁ₐ and c₁ᵦ to
    the bigram table (vocabulary-sized ⋈ bigram-vocabulary-sized —
    neither corpus-sized, neither broadcast); distributed
    sort-desc + limit picks the top-50, so only 50 rows ever reach the
    driver."""
    from .grouping import bucketed_cogroup, bucketed_group_apply

    docs = _docs(sf_dir, ("text",))

    def bigram_part(batch: pa.Table) -> pd.DataFrame:
        agg: dict[tuple[str, str], int] = {}
        n_tok = 0
        for t in batch.column("text").to_pylist():
            toks = t.lower().split()
            n_tok += len(toks)
            for i in range(len(toks) - 1):
                k = (toks[i], toks[i + 1])
                agg[k] = agg.get(k, 0) + 1
        return pd.DataFrame({
            "a": [k[0] for k in agg], "b": [k[1] for k in agg],
            "c2": pd.Series(list(agg.values()), dtype=np.int64)})

    def uni_part(batch: pa.Table) -> pd.DataFrame:
        from collections import Counter
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(t.lower().split())
        return pd.DataFrame({"tok": list(c.keys()),
                             "c1": pd.Series(list(c.values()),
                                             dtype=np.int64)})

    def merge_bi(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["a", "b"], as_index=False).agg(c2=("c2", "sum"))
        return g.astype({"c2": np.int64})

    def merge_uni(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", as_index=False).agg(c1=("c1", "sum"))
        return g.astype({"c1": np.int64})

    bi = bucketed_group_apply(
        docs.map_batches(bigram_part, batch_format="pyarrow"),
        ["a", "b"], merge_bi, num_buckets=16)
    uni = bucketed_group_apply(
        docs.map_batches(uni_part, batch_format="pyarrow"),
        ["tok"], merge_uni, num_buckets=16).materialize()

    # exact global totals from the unigram/bigram tables
    n1 = int(uni.sum("c1"))
    bi = bi.materialize()
    n2 = int(bi.sum("c2"))

    def attach(col: str, out: str):
        def fn(bf: pd.DataFrame, uf: pd.DataFrame) -> pd.DataFrame:
            if bf.empty:
                cols = {c: pd.Series(dtype=np.int64
                                     if c != "a" and c != "b" else object)
                        for c in list(bf.columns) + [out]}
                return pd.DataFrame(cols)
            m = bf.merge(uf.rename(columns={"tok": col, "c1": out}),
                         on=col)
            return m.astype({out: np.int64})
        return fn

    j1 = bucketed_cogroup(bi, uni, ["a"], ["tok"], attach("a", "c1a"),
                          num_buckets=16)
    j2 = bucketed_cogroup(j1, uni, ["b"], ["tok"], attach("b", "c1b"),
                          num_buckets=16)

    def score(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df.c2 >= _PMI_MIN_COUNT]
        step1 = (1000 * df.c2.to_numpy() * n1) // df.c1a.to_numpy()
        pmi = (step1 * n1) // (df.c1b.to_numpy() * n2)
        out = df.assign(pmi_scaled=pmi.astype(np.int64))
        return out[["a", "b", "c2", "pmi_scaled"]]

    top = (j2.map_batches(score, batch_format="pyarrow")
           .sort(["pmi_scaled", "a", "b"],
                 descending=[True, False, False])
           .limit(_PMI_TOPK).to_pandas())
    top = top.astype({"c2": np.int64, "pmi_scaled": np.int64})
    top["rank"] = pd.Series(np.arange(1, len(top) + 1), dtype=np.int64)
    return top[["rank", "a", "b", "c2", "pmi_scaled"]]


SQL_TOKEN_PMI = rf"""
WITH toks AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS arr
  FROM documents WHERE trim(lower(text)) <> ''
), uni AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS c1 FROM (
    SELECT unnest(arr) AS tok FROM toks) GROUP BY tok
), bi AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c2 FROM (
    SELECT arr[i] AS a, arr[i+1] AS b
    FROM toks, unnest(generate_series(1, len(arr)-1)) AS t(i)
  ) GROUP BY a, b
), tot AS (
  SELECT (SELECT SUM(c1) FROM uni) AS n1,
         (SELECT SUM(c2) FROM bi) AS n2
), scored AS (
  SELECT bi.a, bi.b, bi.c2,
         CAST(((1000 * bi.c2 * t.n1 // ua.c1) * t.n1)
              // (ub.c1 * t.n2) AS BIGINT) AS pmi_scaled
  FROM bi
  JOIN uni ua ON ua.tok = bi.a
  JOIN uni ub ON ub.tok = bi.b
  CROSS JOIN tot t
  WHERE bi.c2 >= {_PMI_MIN_COUNT}
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY pmi_scaled DESC, a, b)
            AS BIGINT) AS rank,
       a, b, c2, pmi_scaled
FROM scored ORDER BY pmi_scaled DESC, a, b LIMIT {_PMI_TOPK}
"""


# ------------------------------------------ first-occurrence novelty
def q_gram_novelty(sf_dir: str) -> rd.Dataset:
    """Per-doc 3-gram NOVELTY: the share of a doc's distinct word
    3-grams whose global first occurrence (min doc_id) is this doc —
    the contribution-vs-repetition audit a corpus curator runs before
    adding a new crawl slice (a doc that introduces nothing is a dedup
    candidate even when no single passage crosses dup_passages' bar).

    Scale shape: stage 1 ships distinct (h1, h2, doc_id) gram anchors
    (the 128-bit double siphash convention of dup_passages — gram text
    never leaves the batch); stage 2 buckets by gram hash, computes
    each gram's min doc_id with ONE vectorized transform, and emits
    per-doc (n_grams, n_novel) partials already shrunk to docs-per-
    bucket; stage 3 is a doc-bucketed sum LEFT-cogrouped against the
    doc-id column so gramless docs report zeros.  Two content-sized
    exchanges, histogram-sized output."""
    from .grouping import bucketed_cogroup, bucketed_group_apply

    K = 3
    docs = _docs(sf_dir)

    def explode(batch: pa.Table) -> pd.DataFrame:
        ids, grams = [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            toks = t.lower().split()
            for i in range(len(toks) - K + 1):
                ids.append(d)
                grams.append(" ".join(toks[i:i + K]))
        g = pd.Series(grams, dtype=object)
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype=np.int64),
            "h1": pd.util.hash_pandas_object(g, index=False).to_numpy()
                    .astype(np.int64),
            "h2": pd.util.hash_pandas_object(
                g, index=False, hash_key="gram_novelty_k2!").to_numpy()
                    .astype(np.int64),
        }).drop_duplicates()

    anchors = docs.map_batches(explode, batch_format="pyarrow")

    def per_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()          # across-batch distinct
        first = df.groupby(["h1", "h2"])["doc_id"].transform("min")
        d = pd.DataFrame({
            "doc_id": df.doc_id.to_numpy(),
            "novel": (df.doc_id.to_numpy() == first.to_numpy())
            .astype(np.int64)})
        out = d.groupby("doc_id", as_index=False).agg(
            n_grams=("novel", "size"), n_novel=("novel", "sum"))
        return out.astype(np.int64)

    partials = bucketed_group_apply(anchors, ["h1", "h2"], per_doc,
                                    num_buckets=32)
    ids = _docs(sf_dir, ("doc_id",))

    def finish(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        per = rf.groupby("doc_id").agg(n_grams=("n_grams", "sum"),
                                       n_novel=("n_novel", "sum"))
        out = pd.DataFrame({"doc_id": lf.doc_id.to_numpy()})
        out["n_grams"] = out.doc_id.map(per.n_grams).fillna(0)
        out["n_novel"] = out.doc_id.map(per.n_novel).fillna(0)
        out = out.astype(np.int64)
        ng = out.n_grams.to_numpy()
        out["novelty_milli"] = np.where(
            ng > 0, (1000 * out.n_novel.to_numpy()) // np.maximum(ng, 1),
            0).astype(np.int64)
        return out

    return bucketed_cogroup(ids, partials, ["doc_id"], ["doc_id"],
                            finish, num_buckets=16).sort("doc_id")


SQL_GRAM_NOVELTY = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS arr
  FROM documents WHERE trim(text) <> ''
), grams AS (
  SELECT DISTINCT doc_id,
         arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS g
  FROM toks, unnest(generate_series(1, len(arr) - 2)) AS t(i)
), firsts AS (
  SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g
), per AS (
  SELECT gr.doc_id, COUNT(*) AS n_grams,
         COUNT(*) FILTER (WHERE f.first_doc = gr.doc_id) AS n_novel
  FROM grams gr JOIN firsts f ON f.g = gr.g GROUP BY 1
)
SELECT d.doc_id, CAST(COALESCE(p.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(COALESCE(p.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(CASE WHEN p.n_grams IS NULL THEN 0
            ELSE (1000 * p.n_novel) // p.n_grams END AS BIGINT)
         AS novelty_milli
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
ORDER BY d.doc_id
"""


# ------------------------------------------- source vocabulary overlap
def q_vocab_overlap(sf_dir: str) -> pd.DataFrame:
    """Pairwise source-vocabulary Jaccard — the corpus-mixing overlap
    matrix (how much of feed A's vocabulary feed B already covers).
    Sources are a FIXED-cardinality dimension (like nation/region), so
    the pair table is bounded; the vocabulary is not, and never leaves
    the cluster: per-batch distinct (token-hash, source) partials
    bucket by token, each bucket folds its tokens' source sets into
    per-pair intersection counts and per-source vocab counts, and the
    driver merges |sources|^2-bounded partials.  jaccard_milli =
    1000*|A∩B| // (|A|+|B|-|A∩B|), exact integers end-to-end."""
    from .grouping import bucketed_group_apply

    docs = _docs(sf_dir, ("text", "source"))

    def part(batch: pa.Table) -> pd.DataFrame:
        srcs, toks = [], []
        for s, t in zip(batch.column("source").to_pylist(),
                        batch.column("text").to_pylist()):
            for w in set(t.lower().split()):
                srcs.append(s)
                toks.append(w)
        g = pd.Series(toks, dtype=object)
        return pd.DataFrame({
            "h1": pd.util.hash_pandas_object(g, index=False).to_numpy()
                    .astype(np.int64),
            "h2": pd.util.hash_pandas_object(
                g, index=False, hash_key="vocab_overlap_2!").to_numpy()
                    .astype(np.int64),
            "source": pd.Series(srcs, dtype=object),
        }).drop_duplicates()

    anchors = docs.map_batches(part, batch_format="pyarrow")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        size = (df.groupby("source", as_index=False).size()
                .rename(columns={"size": "cnt"}))
        m = df.merge(df, on=["h1", "h2"])
        m = m[m.source_x < m.source_y]
        inter = (m.groupby(["source_x", "source_y"], as_index=False)
                 .size().rename(columns={"size": "cnt"}))
        size["kind"] = np.int64(0)
        size["source_x"] = size.source
        size["source_y"] = size.source
        inter["kind"] = np.int64(1)
        out = pd.concat([size[["kind", "source_x", "source_y", "cnt"]],
                         inter], ignore_index=True)
        return out.astype({"kind": np.int64, "cnt": np.int64})

    parts = bucketed_group_apply(anchors, ["h1", "h2"], fold,
                                 num_buckets=32).to_pandas()
    merged = parts.groupby(["kind", "source_x", "source_y"],
                           as_index=False).cnt.sum()
    vocab = (merged[merged.kind == 0].set_index("source_x").cnt)
    inter = merged[merged.kind == 1]
    va = inter.source_x.map(vocab).to_numpy()
    vb = inter.source_y.map(vocab).to_numpy()
    i = inter.cnt.to_numpy()
    out = pd.DataFrame({
        "src_a": inter.source_x.to_numpy(),
        "src_b": inter.source_y.to_numpy(),
        "inter": i.astype(np.int64),
        "jaccard_milli": ((1000 * i) // (va + vb - i)).astype(np.int64)})
    return out.sort_values(["src_a", "src_b"]).reset_index(drop=True)


SQL_VOCAB_OVERLAP = r"""
WITH ts AS (
  SELECT DISTINCT tok, source FROM (
    SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok,
           source
    FROM documents WHERE trim(text) <> '')
), sz AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM ts GROUP BY 1
), inter AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CAST(COUNT(*) AS BIGINT) AS i
  FROM ts a JOIN ts b ON a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT src_a, src_b, i AS inter,
       CAST((1000 * i) // (za.v + zb.v - i) AS BIGINT) AS jaccard_milli
FROM inter
JOIN sz za ON za.source = src_a
JOIN sz zb ON zb.source = src_b
ORDER BY src_a, src_b
"""


# ------------------------------------------ classifier-vs-label audit
def q_lang_confusion(sf_dir: str) -> pd.DataFrame:
    """Confusion matrix of the script-heuristic language classifier
    (the lang_id operator's kernel) against the corpus's labeled
    ``lang`` column — the model-quality audit that turns a classifier
    stage into a measured one (per-cell counts localize WHICH label
    leaks into which prediction; this corpus is Latin-script-heavy so
    most labels predict 'eng'/'mixed' — that skew is the finding).

    Shape at scale: the classifier runs per batch (same kernel as
    lang_id); per-batch (lang, pred, n) partials are bounded by
    |labels| x |predictions|; ONE tiny bucketed merge."""
    from .grouping import bucketed_group_apply

    docs = _docs(sf_dir, ("text", "lang"))

    def part(batch: pa.Table) -> pd.DataFrame:
        d = pd.DataFrame({
            "lang": batch.column("lang").to_pylist(),
            "lang_pred": [T.detect_language_ocr(t.strip())
                          for t in batch.column("text").to_pylist()]})
        out = (d.groupby(["lang", "lang_pred"], as_index=False).size()
               .rename(columns={"size": "n"}))
        return out.astype({"n": np.int64})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(["lang", "lang_pred"], as_index=False).n.sum()
                .astype({"n": np.int64}))

    parts = bucketed_group_apply(
        docs.map_batches(part, batch_format="pyarrow"),
        ["lang", "lang_pred"], merge, num_buckets=4).to_pandas()
    out = (parts.groupby(["lang", "lang_pred"], as_index=False).n.sum()
           .astype({"n": np.int64}))
    return out.sort_values(["lang", "lang_pred"]).reset_index(drop=True)


SQL_LANG_CONFUSION = r"""
WITH c AS (
  SELECT doc_id, lang,
         length(regexp_replace(text, '[^\x{0900}-\x{097F}]', '', 'g')) AS dev,
         length(regexp_replace(text, '[^\x{0A80}-\x{0AFF}]', '', 'g')) AS guj,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS lat
  FROM documents
), p AS (
  SELECT lang,
         CASE WHEN dev + guj + lat = 0 THEN 'unknown'
              WHEN dev * 1.0 / (dev + guj + lat) > 0.3 THEN 'hin'
              WHEN guj * 1.0 / (dev + guj + lat) > 0.3 THEN 'guj'
              WHEN lat * 1.0 / (dev + guj + lat) > 0.3 THEN 'eng'
              ELSE 'mixed' END AS lang_pred
  FROM c
)
SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
FROM p GROUP BY 1, 2 ORDER BY lang, lang_pred
"""


# ------------------------------------------- grouped exact quantiles
def q_lang_length_quantiles(sf_dir: str) -> rd.Dataset:
    """Exact per-LANGUAGE token-length p50/p90 — grouped quantiles,
    which unlike grouped sums are not semilattice-mergeable: each
    group's full value multiset must co-locate, which ONE lang-bucketed
    exchange of (lang, n_tokens) pairs provides.  Ranks use the
    integer ceil(p·n) convention ((n+1)//2, (9n+9)//10) on BOTH sides —
    float p·n misranks exactly when n divides the quantile (the
    value_winsor_mean gotcha)."""
    from .grouping import bucketed_group_apply

    docs = _docs(sf_dir, ("lang", "text"))

    def part(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "lang": batch.column("lang").to_pylist(),
            "n_tokens": pd.Series(
                [len(t.split()) for t in
                 batch.column("text").to_pylist()], dtype=np.int64)})

    def quant(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, g in df.groupby("lang", sort=True):
            v = np.sort(g.n_tokens.to_numpy())
            n = len(v)
            rows.append((lang, n, int(v[(n + 1) // 2 - 1]),
                         int(v[(9 * n + 9) // 10 - 1])))
        return pd.DataFrame(rows, columns=[
            "lang", "n_docs", "p50_tokens", "p90_tokens"]).astype(
                {"n_docs": np.int64, "p50_tokens": np.int64,
                 "p90_tokens": np.int64})

    return bucketed_group_apply(
        docs.map_batches(part, batch_format="pyarrow"),
        ["lang"], quant, num_buckets=4).sort("lang")


SQL_LANG_LENGTH_QUANTILES = r"""
WITH t AS (
  SELECT lang,
         CASE WHEN trim(text) = '' THEN 0
              ELSE CAST(array_length(regexp_split_to_array(trim(text),
                                                           '\s+'))
                   AS BIGINT) END AS n_tokens
  FROM documents
), r AS (
  SELECT lang, n_tokens,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM t
)
SELECT lang, CAST(MAX(n) AS BIGINT) AS n_docs,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN n_tokens END)
            AS BIGINT) AS p50_tokens,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN n_tokens END)
            AS BIGINT) AS p90_tokens
FROM r GROUP BY lang ORDER BY lang
"""


# ------------------------------------------------------------ doc_chunks
CHUNK_SIZE = 240       # chars per chunk
CHUNK_STRIDE = 180     # step between chunk starts (60-char overlap)


def q_doc_chunks(sf_dir: str) -> rd.Dataset:
    """Overlapping fixed-window chunking — the RAG/embedding
    preprocessing primitive: one output row per (doc, window) with a
    CHUNK_SIZE-char window every CHUNK_STRIDE chars (empty docs emit
    one empty chunk, so no document silently disappears).

    Shape at scale: pure flat_map — zero shuffle, output blocks stay
    proportional to input blocks (×~len/stride).  The per-batch loop
    is over the CHUNK ORDINAL (bounded by the longest doc in the
    batch), each iteration a vectorized ``str.slice`` over every doc
    that still has a k-th chunk — never over rows."""
    ds = _docs(sf_dir)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        n = df.text.str.len().to_numpy()
        n_chunks = (np.maximum(n, 1) - 1) // CHUNK_STRIDE + 1
        frames = []
        for k in range(int(n_chunks.max(initial=0))):
            m = n_chunks > k
            sl = df.text[m].str.slice(k * CHUNK_STRIDE,
                                      k * CHUNK_STRIDE + CHUNK_SIZE)
            frames.append(pd.DataFrame({
                "doc_id": df.doc_id[m].to_numpy().astype(np.int64),
                "chunk_id": np.full(int(m.sum()), k, dtype=np.int64),
                "chunk_text": sl.to_numpy(),
                "chunk_len": sl.str.len().to_numpy().astype(np.int64)}))
        if not frames:
            return _typed_empty(doc_id=pa.int64(), chunk_id=pa.int64(),
                                chunk_text=pa.string(),
                                chunk_len=pa.int64())
        return pd.concat(frames, ignore_index=True)

    return ds.map_batches(explode, batch_format="pandas")


SQL_DOC_CHUNKS = f"""
WITH pos AS (
  SELECT doc_id, text,
         unnest(range(0, CAST(greatest(length(text), 1) AS BIGINT),
                      {CHUNK_STRIDE})) AS p
  FROM documents
)
SELECT doc_id, CAST(p / {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
       substr(text, CAST(p + 1 AS BIGINT), {CHUNK_SIZE}) AS chunk_text,
       CAST(length(substr(text, CAST(p + 1 AS BIGINT), {CHUNK_SIZE}))
            AS BIGINT) AS chunk_len
FROM pos ORDER BY doc_id, chunk_id
"""


# ------------------------------------------------------- chunk_dup_stats
def q_chunk_dup_stats(sf_dir: str) -> pd.DataFrame:
    """Chunk-level redundancy audit per source — after chunking for
    embeddings (see q_doc_chunks), how much of the chunk stream is
    duplicate text?  This is the measurement that decides whether to
    dedup BEFORE the (expensive) embedding stage.

    Shape at scale: per-batch (source, chunk_text) pre-counts, ONE
    text-hash-bucketed exchange (equal texts always co-locate, so
    per-bucket distinct counts ADD across buckets); driver merge is
    sources x buckets rows."""
    from .grouping import bucketed_group_apply

    ds = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        n = df.text.str.len().to_numpy()
        n_chunks = (np.maximum(n, 1) - 1) // CHUNK_STRIDE + 1
        frames = []
        for k in range(int(n_chunks.max(initial=0))):
            m = n_chunks > k
            frames.append(pd.DataFrame({
                "source": df.source[m].to_numpy(),
                "chunk_text": df.text[m].str.slice(
                    k * CHUNK_STRIDE,
                    k * CHUNK_STRIDE + CHUNK_SIZE).to_numpy()}))
        if not frames:
            return _typed_empty(source=pa.string(),
                                chunk_text=pa.string(), cnt=pa.int64())
        out = pd.concat(frames, ignore_index=True)
        g = out.groupby(["source", "chunk_text"], as_index=False).size()
        return g.rename(columns={"size": "cnt"}).astype({"cnt": np.int64})

    def bucket_stats(df: pd.DataFrame) -> pd.DataFrame:
        c = (df.groupby(["source", "chunk_text"], as_index=False)
             .agg(cnt=("cnt", "sum")))
        cnt = c.cnt.to_numpy()
        g = pd.DataFrame({"source": c.source, "cnt": cnt,
                          "dup": (cnt > 1).astype(np.int64)})
        out = g.groupby("source", as_index=False).agg(
            n_chunks=("cnt", "sum"), n_distinct=("cnt", "size"),
            n_dup_texts=("dup", "sum"), max_occ=("cnt", "max"))
        out["n_dup_occurrences"] = (
            g[g.dup == 1].groupby("source").cnt.sum()
            .reindex(out.source).fillna(0).to_numpy().astype(np.int64))
        return out.astype({"n_chunks": np.int64, "n_distinct": np.int64,
                           "n_dup_texts": np.int64, "max_occ": np.int64})

    parts = (bucketed_group_apply(
        ds.map_batches(chunks, batch_format="pandas"),
        ["chunk_text"], bucket_stats, num_buckets=16).to_pandas())
    out = parts.groupby("source", as_index=False).agg(
        n_chunks=("n_chunks", "sum"), n_distinct=("n_distinct", "sum"),
        n_dup_texts=("n_dup_texts", "sum"),
        n_dup_occurrences=("n_dup_occurrences", "sum"),
        max_occ=("max_occ", "max"))
    for c in ("n_chunks", "n_distinct", "n_dup_texts",
              "n_dup_occurrences", "max_occ"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


SQL_CHUNK_DUP_STATS = f"""
WITH pos AS (
  SELECT source, text,
         unnest(range(0, CAST(greatest(length(text), 1) AS BIGINT),
                      {CHUNK_STRIDE})) AS p
  FROM documents
), c AS (
  SELECT source,
         substr(text, CAST(p + 1 AS BIGINT), {CHUNK_SIZE}) AS chunk_text,
         COUNT(*) AS cnt
  FROM pos GROUP BY 1, 2
)
SELECT source,
       CAST(SUM(cnt) AS BIGINT) AS n_chunks,
       CAST(COUNT(*) AS BIGINT) AS n_distinct,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_texts,
       CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT)
         AS n_dup_occurrences,
       CAST(MAX(cnt) AS BIGINT) AS max_occ
FROM c GROUP BY source ORDER BY source
"""


# -------------------------------------------------- token_coverage_curve
COVERAGE_KS = (10, 30, 100, 300)


def q_token_coverage_curve(sf_dir: str) -> pd.DataFrame:
    """Vocabulary-sizing curve: what fraction of all word-BIGRAM
    occurrences do the top-k most frequent bigrams cover, for a ladder
    of k — the measurement behind choosing a tokenizer vocab size
    (unigrams are useless here: the synthetic corpus has only 31
    distinct words, bigrams give a ~10^3 vocabulary).

    Shape at scale: per-batch bigram pre-counts -> ONE gram-bucketed
    exchange for exact global counts -> per-bucket top-max(k) (lossless:
    a global top-k member is a top-k member of its bucket) -> driver
    resort of <= max(k) x buckets rows; ties broken by gram text so the
    curve is deterministic."""
    from .grouping import bucketed_group_apply

    ds = _docs(sf_dir)
    kmax = max(COVERAGE_KS)

    def grams(df: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, int] = {}
        for t in df.text:
            w = t.split()
            for a, b in zip(w, w[1:]):
                g = a + " " + b
                rows[g] = rows.get(g, 0) + 1
        if not rows:
            return _typed_empty(gram=pa.string(), cnt=pa.int64())
        out = pd.DataFrame({"gram": list(rows), "cnt": list(rows.values())})
        return out.astype({"cnt": np.int64})

    def bucket_top(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby("gram", as_index=False).agg(cnt=("cnt", "sum"))
        c["cnt"] = c.cnt.astype(np.int64)
        return c.sort_values(["cnt", "gram"],
                             ascending=[False, True]).head(kmax)

    # the global total needs no gram exchange at all: it is
    # sum(max(len(words)-1, 0)) per document — one per-batch sum
    def occ(df: pd.DataFrame) -> pd.DataFrame:
        n = df.text.str.split().str.len().fillna(0).to_numpy(np.int64)
        return pd.DataFrame({"t": [np.int64(np.maximum(n - 1, 0).sum())]})

    total = int(ds.map_batches(occ, batch_format="pandas")
                .to_pandas().t.sum())

    parts = bucketed_group_apply(
        ds.map_batches(grams, batch_format="pandas"),
        ["gram"], bucket_top, num_buckets=16).to_pandas()
    ranked = parts.sort_values(["cnt", "gram"],
                               ascending=[False, True]).reset_index(drop=True)
    out_rows = []
    for k in COVERAGE_KS:
        covered = int(ranked.cnt.head(k).sum())
        out_rows.append({"k": k, "covered_occ": covered,
                         "total_occ": total,
                         "coverage_milli": (1000 * covered) // total
                         if total else 0})
    return pd.DataFrame(out_rows).astype(np.int64)


SQL_TOKEN_COVERAGE_CURVE = r"""
WITH w AS (
  SELECT regexp_split_to_array(trim(text), '\s+') AS a
  FROM documents WHERE trim(text) <> ''
), g AS (
  SELECT unnest(list_transform(range(1, len(a)),
                               i -> a[i] || ' ' || a[i+1])) AS gram
  FROM w WHERE len(a) > 1
), c AS (
  SELECT gram, COUNT(*) AS cnt FROM g GROUP BY 1
), r AS (
  SELECT cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, gram) AS rn FROM c
)
SELECT CAST(v.k AS BIGINT) AS k,
       CAST(SUM(CASE WHEN r.rn <= v.k THEN r.cnt ELSE 0 END) AS BIGINT)
         AS covered_occ,
       CAST((SELECT SUM(cnt) FROM c) AS BIGINT) AS total_occ,
       CAST(1000 * SUM(CASE WHEN r.rn <= v.k THEN r.cnt ELSE 0 END)
            // (SELECT SUM(cnt) FROM c) AS BIGINT) AS coverage_milli
FROM (VALUES (10), (30), (100), (300)) AS v(k), r
GROUP BY v.k ORDER BY k
"""


# --------------------------------------------------- doc_rank_in_source
def q_doc_rank_in_source(sf_dir: str) -> rd.Dataset:
    """Per-document exact rank WITHIN its source by length (ties broken
    by doc_id), plus the milli-scaled normalized rank — the per-row
    grouped-window primitive behind percentile features and
    curriculum ordering, emitted for EVERY row (unlike the grouped
    quantile summaries, which reduce).

    Shape at scale: ONE source-bucketed exchange co-locates each
    source's rows; the in-bucket rank is one vectorized argsort per
    source run — no per-row Python, no global sort."""
    from .grouping import bucketed_group_apply

    ds = _docs(sf_dir, columns=("doc_id", "source", "n_chars"))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        out_parts = []
        for src, g in df.groupby("source"):
            g = g.sort_values(["n_chars", "doc_id"])
            n = len(g)
            r = np.arange(1, n + 1, dtype=np.int64)
            out_parts.append(pd.DataFrame({
                "doc_id": g.doc_id.to_numpy().astype(np.int64),
                "source": np.full(n, src),
                "n_chars": g.n_chars.to_numpy().astype(np.int64),
                "rank_in_source": r,
                "rank_milli": (1000 * (r - 1)) // (n - 1)
                if n > 1 else np.zeros(n, dtype=np.int64)}))
        return pd.concat(out_parts, ignore_index=True)

    return bucketed_group_apply(ds, ["source"], rank,
                                num_buckets=16).sort("doc_id")


SQL_DOC_RANK_IN_SOURCE = """
WITH r AS (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY n_chars, doc_id) AS rk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
)
SELECT doc_id, source, n_chars,
       CAST(rk AS BIGINT) AS rank_in_source,
       CAST(CASE WHEN n > 1 THEN (1000 * (rk - 1)) // (n - 1)
                 ELSE 0 END AS BIGINT) AS rank_milli
FROM r ORDER BY doc_id
"""


# -------------------------------------------------------- corpus_report
def q_corpus_report(sf_dir: str) -> pd.DataFrame:
    """One-row corpus datasheet — the dataset-card numbers (volume,
    diversity, redundancy) a training run records before it starts:
    doc/char/token totals, source and language cardinalities, distinct
    text count and the exact-duplicate rate.

    Shape at scale: one pass of per-batch partials for the additive
    stats (langs/sources are bounded-cardinality full-key partials,
    the documented domain_stats convention); the ONLY exchange is the
    md5-bucketed distinct-text count (per-bucket distincts add, the
    exact_dedup machinery).  Driver merge is a handful of rows."""
    from .grouping import bucketed_group_apply

    ds = _docs(sf_dir, columns=("doc_id", "text", "source", "lang"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df.text.str.split().str.len().fillna(0).to_numpy(np.int64)
        return pd.DataFrame({
            "n_docs": [np.int64(len(df))],
            "total_chars": [np.int64(df.text.str.len().sum())],
            "total_tokens": [np.int64(toks.sum())],
            "srcs": [",".join(sorted(set(df.source)))],
            "langs": [",".join(sorted(set(df.lang)))]})

    import hashlib as _h

    def fps(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "fp": [_h.md5(t.encode("utf-8")).hexdigest()
                   for t in df.text]})

    def bucket_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"d": [np.int64(df.fp.nunique())]})

    p = ds.map_batches(partial, batch_format="pandas").to_pandas()
    distinct = int(bucketed_group_apply(
        ds.map_batches(fps, batch_format="pandas"),
        ["fp"], bucket_distinct, num_buckets=16).to_pandas().d.sum())
    n_docs = int(p.n_docs.sum())
    srcs = sorted({s for row in p.srcs for s in row.split(",") if s})
    langs = sorted({s for row in p.langs for s in row.split(",") if s})
    return pd.DataFrame([{
        "n_docs": n_docs,
        "total_chars": int(p.total_chars.sum()),
        "total_tokens": int(p.total_tokens.sum()),
        "n_sources": len(srcs),
        "n_langs": len(langs),
        "n_distinct_texts": distinct,
        "dup_docs": n_docs - distinct,
        "dup_rate_milli": (1000 * (n_docs - distinct)) // n_docs
        if n_docs else 0,
    }]).astype(np.int64)


SQL_CORPUS_REPORT = r"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(CASE WHEN trim(text) = '' THEN 0
                ELSE array_length(regexp_split_to_array(trim(text),
                                                        '\s+')) END)
            AS BIGINT) AS total_tokens,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
       CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT) AS dup_docs,
       CAST(1000 * (COUNT(*) - COUNT(DISTINCT md5(text))) // COUNT(*)
            AS BIGINT) AS dup_rate_milli
FROM documents
"""


# ------------------------------------------------- blocklist filter rate
BLOCKLIST = ("slow", "scan", "crash")   # crash: dead term, audit shows 0


def q_blocklist_filter_rate(sf_dir: str) -> pd.DataFrame:
    """Safety/content-filter audit: per source, how many documents a
    term-blocklist filter would drop, with per-term hit counts — the
    filter-rate report a corpus curation run reviews before committing
    a blocklist (a term that nukes 40% of one source is probably
    overbroad).  Whole-word semantics via tokenization on whitespace
    (substring matching would flag 'error' inside 'terror').

    Shape at scale: pure per-batch vectorized token-set membership +
    bounded (source x term) partials — no shuffle at all."""
    ds = _docs(sf_dir, columns=("text", "source"))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df.text.str.split()
        hits = {t: toks.apply(lambda w, t=t: t in w).to_numpy()
                for t in BLOCKLIST}
        any_hit = np.logical_or.reduce(list(hits.values()))
        g = pd.DataFrame({"source": df.source.to_numpy(),
                          "n": 1, "flagged": any_hit.astype(np.int64)})
        for t in BLOCKLIST:
            g[f"hit_{t}"] = hits[t].astype(np.int64)
        agg = {"n_docs": ("n", "sum"), "n_flagged": ("flagged", "sum")}
        agg.update({f"hit_{t}": (f"hit_{t}", "sum")
                    for t in BLOCKLIST})
        return (g.groupby("source", as_index=False).agg(**agg)
                .astype({c: np.int64 for c in
                         ["n_docs", "n_flagged"]
                         + [f"hit_{t}" for t in BLOCKLIST]}))

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cols = ["n_docs", "n_flagged"] + [f"hit_{t}" for t in BLOCKLIST]
    out = (parts.groupby("source", as_index=False)
           .agg(**{c: (c, "sum") for c in cols}))
    out["flag_milli"] = ((1000 * out.n_flagged)
                         // out.n_docs).astype(np.int64)
    for c in cols:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


def _blocklist_sql() -> str:
    # any-whitespace word boundaries, matching Python str.split():
    # fold tab/newline/CR into spaces before the padded LIKE
    ws = ("replace(replace(replace(text, chr(9), ' '), chr(10), ' '), "
          "chr(13), ' ')")

    def has(t: str) -> str:
        # whole-word: pad both sides with spaces
        return (f"CASE WHEN ' ' || {ws} || ' ' LIKE '% {t} %' "
                "THEN 1 ELSE 0 END")

    hit_cols = ",\n       ".join(
        f"CAST(SUM({has(t)}) AS BIGINT) AS hit_{t}" for t in BLOCKLIST)
    any_hit = " + ".join(has(t) for t in BLOCKLIST)
    return f"""
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN ({any_hit}) > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged,
       {hit_cols},
       CAST(1000 * SUM(CASE WHEN ({any_hit}) > 0 THEN 1 ELSE 0 END)
            // COUNT(*) AS BIGINT) AS flag_milli
FROM documents GROUP BY source ORDER BY source
"""


SQL_BLOCKLIST_FILTER_RATE = _blocklist_sql()


TEXT_QUERIES = {
    "doc_chunks": (q_doc_chunks, SQL_DOC_CHUNKS),
    "blocklist_filter_rate": (q_blocklist_filter_rate,
                              SQL_BLOCKLIST_FILTER_RATE),
    "corpus_report": (q_corpus_report, SQL_CORPUS_REPORT),
    "doc_rank_in_source": (q_doc_rank_in_source, SQL_DOC_RANK_IN_SOURCE),
    "token_coverage_curve": (q_token_coverage_curve,
                             SQL_TOKEN_COVERAGE_CURVE),
    "chunk_dup_stats": (q_chunk_dup_stats, SQL_CHUNK_DUP_STATS),
    "doc_tokens": (q_doc_tokens, SQL_DOC_TOKENS),
    "gram_novelty": (q_gram_novelty, SQL_GRAM_NOVELTY),
    "vocab_overlap": (q_vocab_overlap, SQL_VOCAB_OVERLAP),
    "lang_confusion": (q_lang_confusion, SQL_LANG_CONFUSION),
    "lang_length_quantiles": (q_lang_length_quantiles,
                              SQL_LANG_LENGTH_QUANTILES),
    "doc_quality": (q_doc_quality, SQL_DOC_QUALITY),
    "lang_id": (q_lang_id, SQL_LANG_ID),
    "pii_mask": (q_pii_mask, SQL_PII_MASK),
    "fingerprint": (q_fingerprint, SQL_FINGERPRINT),
    "sample_docs": (q_sample_docs, SQL_SAMPLE_DOCS),
    "token_histogram": (q_token_histogram, SQL_TOKEN_HISTOGRAM),
    "length_quantiles": (q_length_quantiles, SQL_LENGTH_QUANTILES),
    "stratified_sample": (q_stratified_sample, SQL_STRATIFIED_SAMPLE),
    "source_quota": (q_source_quota, SQL_SOURCE_QUOTA),
    "tfidf_topk": (q_tfidf_topk, SQL_TFIDF_TOPK),
    "ngram_hotspots": (q_ngram_hotspots, SQL_NGRAM_HOTSPOTS),
    "token_heavy_hitters": (q_token_heavy_hitters, SQL_TOKEN_HEAVY_HITTERS),
    "bpe_tokens": (q_bpe_tokens, SQL_BPE_TOKENS),
    "repetition_stats": (q_repetition_stats, SQL_REPETITION_STATS),
    "dup_passages": (q_dup_passages, SQL_DUP_PASSAGES),
    "decontamination": (q_decontamination, SQL_DECONTAMINATION),
    "token_pmi": (q_token_pmi, SQL_TOKEN_PMI),
}
