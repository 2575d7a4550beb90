"""Deduplication operators over the ``documents`` table.

Four families, each a first-class training-data-pipeline component:

- **exact**: content-hash groupby → canonical doc per hash (scales as one
  shuffle of (hash, doc_id) pairs, never the texts).
- **token-set jaccard (exact near-dup)**: pairwise exact jaccard with a
  pure-integer threshold test (``20·|∩| ≥ 19·|∪|`` ⟺ j ≥ 0.95) so the
  DuckDB oracle agrees bit-for-bit.  Pairing uses a broadcast token-bitmap
  matrix + blocked matmul per batch — right for corpora whose *candidate
  structure* is dense (tiny vocab); the LSH path below is the sparse-/
  web-scale route.
- **MinHash + LSH (scale path)**: shingle → 64-perm signature → 16-band
  bucket groupby → candidate pairs → exact-jaccard verify.  At 10^12 docs
  this is the only tractable near-dup plan: cost ∝ docs + colliding pairs.
- **SimHash**: 64-bit signatures + hamming-radius pairs via 4-segment
  pigeonhole bucketing (any pair within hamming 3 shares ≥1 exact segment).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..functions import sketch as SK


def _docs(sf_dir: str) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# ------------------------------------------------------------ exact dedup
def q_exact_dedup(sf_dir: str) -> pd.DataFrame:
    """Canonical doc per exact content hash: md5 → min(doc_id), count."""

    def hash_batch(batch: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "fp": [hashlib.md5(t.encode("utf-8")).hexdigest()
                   for t in batch.column("text").to_pylist()],
            "doc_id": batch.column("doc_id").to_pylist(),
        })

    from .grouping import bucketed_group_apply

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("fp", as_index=False).agg(
            keeper_doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))

    out = bucketed_group_apply(
        _docs(sf_dir).map_batches(hash_batch, batch_format="pyarrow"),
        ["fp"], agg).to_pandas()
    return out.sort_values("fp").reset_index(drop=True)


SQL_EXACT_DEDUP = """
SELECT md5(text) AS fp, MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY fp
"""


# ------------------------------------------------------------ token prep
def _token_sets(batch: pa.Table) -> pd.DataFrame:
    rows = []
    for d, t in zip(batch.column("doc_id").to_pylist(),
                    batch.column("text").to_pylist()):
        rows.append((d, sorted(set(t.lower().split()))))
    return pd.DataFrame({"doc_id": [r[0] for r in rows],
                         "tokens": [r[1] for r in rows]})


# ------------------------------------------------------------ exact jaccard
def q_jaccard_pairs(sf_dir: str) -> pd.DataFrame:
    """All near-dup pairs with token-set jaccard ≥ 0.95 (exact, integer
    threshold).  The doc→bitmap matrix is broadcast once; each batch
    matmuls its slice against it (blocked all-pairs)."""
    tok = _docs(sf_dir).map_batches(_token_sets, batch_format="pyarrow")
    tok_df = tok.to_pandas()          # (doc_id, tokens) — tiny vs the texts

    vocab = sorted({w for toks in tok_df.tokens for w in toks})
    v_index = {w: i for i, w in enumerate(vocab)}
    mat = np.zeros((len(tok_df), len(vocab)), dtype=np.int32)
    doc_ids = tok_df.doc_id.to_numpy()
    order = np.argsort(doc_ids)
    tok_df = tok_df.iloc[order].reset_index(drop=True)
    doc_ids = tok_df.doc_id.to_numpy()
    for i, toks in enumerate(tok_df.tokens):
        for w in toks:
            mat[i, v_index[w]] = 1
    sizes = mat.sum(axis=1)
    mat_ref = ray.put((mat, sizes, doc_ids))

    def pairs_batch(batch: pa.Table) -> pd.DataFrame:
        full, full_sizes, full_ids = ray.get(mat_ref)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(full_ids, ids)
        inter = full[idx] @ full.T                        # (b, N)
        union = full_sizes[idx][:, None] + full_sizes[None, :] - inter
        keep = (20 * inter >= 19 * union) & (ids[:, None] < full_ids[None, :])
        bi, ni = np.nonzero(keep)
        return pd.DataFrame({"doc_a": ids[bi], "doc_b": full_ids[ni],
                             "inter_tokens": inter[bi, ni].astype(np.int64),
                             "union_tokens": union[bi, ni].astype(np.int64)})

    ids_only = rd.from_pandas(tok_df[["doc_id"]])
    out = ids_only.map_batches(pairs_batch, batch_format="pyarrow",
                               batch_size=128).to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


SQL_JACCARD_PAIRS = r"""
WITH t AS (
  SELECT doc_id,
         list_distinct(regexp_split_to_array(trim(lower(text)), '\s+')) AS toks
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS inter_tokens,
       CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS BIGINT)
         AS union_tokens
FROM t a JOIN t b ON a.doc_id < b.doc_id
WHERE 20 * len(list_intersect(a.toks, b.toks))
      >= 19 * (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)))
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------------ minhash LSH
def minhash_lsh_pairs(docs: rd.Dataset, jaccard_milli: int = 800,
                      shingle_k: int = 3) -> rd.Dataset:
    """MinHash+LSH near-dup candidates, exact-verified.

    Plan: signature per doc (map_batches) → explode to (band_key, doc_id,
    shingle_hashes) → groupby(band_key) → within-bucket candidate pairs →
    exact jaccard on the shingle-hash sets → integer threshold.
    Verification is per-bucket; global dedup of (a,b) via a final groupby.
    """

    def sigs(batch: pa.Table) -> pd.DataFrame:
        out = {"band_key": [], "doc_id": [], "sh": []}
        tok_memo: dict = {}
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            hashes = SK.shingle_hashes(t.lower().split(), shingle_k, tok_memo)
            sig = SK.minhash_signature(hashes)
            for key in SK.lsh_band_keys(sig):
                out["band_key"].append(key)
                out["doc_id"].append(d)
                out["sh"].append(hashes.astype(np.int64).tolist())
        return pd.DataFrame(out)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard_milli"])
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        rows = []
        recs = list(g.itertuples(index=False))
        for i in range(len(recs)):
            sa = set(recs[i].sh)
            for j in range(i + 1, len(recs)):
                sb = set(recs[j].sh)
                inter = len(sa & sb)
                union = len(sa) + len(sb) - inter
                if union and 2000 * inter >= (2 * jaccard_milli) * union:
                    jm = (2000 * inter + union) // (2 * union)
                    rows.append((recs[i].doc_id, recs[j].doc_id, jm))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "jaccard_milli"])

    from .grouping import bucketed_group_apply

    def bucket_apply(df: pd.DataFrame) -> pd.DataFrame:
        outs = [bucket_pairs(g) for _, g in df.groupby("band_key")]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard_milli"])
        return pd.concat(outs, ignore_index=True)

    pairs = bucketed_group_apply(docs.map_batches(sigs, batch_format="pyarrow"),
                                 ["band_key"], bucket_apply, num_buckets=128)

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            jaccard_milli=("jaccard_milli", "max"))

    # a pair can surface from several bands -> dedup
    return bucketed_group_apply(pairs, ["doc_a", "doc_b"], dedup_pairs,
                                num_buckets=32)


def q_minhash_pairs(sf_dir: str) -> pd.DataFrame:
    out = minhash_lsh_pairs(_docs(sf_dir), jaccard_milli=800).to_pandas()
    return out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


# shingle-set jaccard (not token-set): SQL oracle builds the same 3-shingles
SQL_MINHASH_PAIRS = r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w
  FROM documents
), s AS (
  SELECT doc_id,
         list_distinct(CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_transform(range(1, len(w) - 1),
                                  i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
              END) AS sh
  FROM t
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       (2000 * len(list_intersect(a.sh, b.sh))
        + (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))))
       // (2 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))))
         AS jaccard_milli
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE 2000 * len(list_intersect(a.sh, b.sh))
      >= 1600 * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------------ simhash
def q_simhash_pairs(sf_dir: str) -> pd.DataFrame:
    """SimHash near-dup: hamming(sig_a, sig_b) ≤ 3 via pigeonhole — split
    the 64-bit signature into 4 segments; any pair within radius 3 agrees
    on ≥1 segment, so grouping by (segment index, segment value) finds all
    candidates with one shuffle."""

    def sigs(batch: pa.Table) -> pd.DataFrame:
        out = {"seg_key": [], "doc_id": [], "sig": []}
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            sig = SK.simhash64(t.lower().split())
            for seg in range(4):
                val = (sig >> (16 * seg)) & 0xFFFF
                out["seg_key"].append((seg << 16) | val)
                out["doc_id"].append(d)
                out["sig"].append(np.int64(sig - (1 << 63)))  # store as int64
        return pd.DataFrame(out)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
        g = g.sort_values("doc_id").drop_duplicates("doc_id")
        recs = list(g.itertuples(index=False))
        rows = []
        for i in range(len(recs)):
            for j in range(i + 1, len(recs)):
                h = SK.hamming64(int(recs[i].sig) & ((1 << 64) - 1),
                                 int(recs[j].sig) & ((1 << 64) - 1))
                if h <= 3:
                    rows.append((recs[i].doc_id, recs[j].doc_id, h))
        return pd.DataFrame(rows, columns=["doc_a", "doc_b", "hamming"])

    from .grouping import bucketed_group_apply

    def bucket_apply(df: pd.DataFrame) -> pd.DataFrame:
        outs = [bucket_pairs(g) for _, g in df.groupby("seg_key")]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
        return pd.concat(outs, ignore_index=True)

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["doc_a", "doc_b"], as_index=False).agg(
            hamming=("hamming", "min"))

    pairs = bucketed_group_apply(
        _docs(sf_dir).map_batches(sigs, batch_format="pyarrow"),
        ["seg_key"], bucket_apply, num_buckets=128)
    pairs = bucketed_group_apply(pairs, ["doc_a", "doc_b"], dedup_pairs,
                                 num_buckets=32)
    return pairs.to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)


DEDUP_QUERIES = {
    "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
    "jaccard_pairs": (q_jaccard_pairs, SQL_JACCARD_PAIRS),
    "minhash_pairs": (q_minhash_pairs, SQL_MINHASH_PAIRS),
    "simhash_pairs": (q_simhash_pairs, None),   # not SQL-expressible
}
