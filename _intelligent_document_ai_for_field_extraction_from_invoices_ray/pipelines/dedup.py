"""Deduplication operators over the ``documents`` table.

Four families, each a first-class training-data-pipeline component, all
built on distributed exchanges (no driver-side materialization, no
corpus-sized broadcast):

- **exact**: content-hash groupby → canonical doc per hash (one shuffle of
  (hash, doc_id) pairs, never the texts).
- **exact set-similarity joins** (``jaccard_pairs`` token-level ≥0.95,
  ``shingle_pairs`` 3-shingle-level ≥0.8): prefix filtering (Chaudhuri et
  al. SSJoin / Bayardo AllPairs).  Under a global token order, two sets
  with J ≥ t=num/den must share an element in their first
  ``n - ceil(t·n) + 1`` elements, so each doc ships only that prefix to
  the candidate shuffle (~n/20 hashes at 0.95); candidates are then
  exact-verified by joining the pair list back to the full hash-sets with
  two bucketed co-group joins.  Candidate exchange ∝ prefix size · docs;
  verify exchange ∝ sets + pairs.  (Ordering by global token frequency,
  rare-first, would shrink candidates further — a stats pass we skip; the
  hash order used here is already a valid total order.)
- **MinHash + LSH (scale path)**: shingle → 64-perm signature → 16-band
  bucket keys.  The band exchange ships ONLY (band_key:int64, doc_id) —
  16×~16 B per doc, not the shingle sets — and candidates are
  exact-verified through the same co-group join.  Recall < 1 by LSH
  construction (miss ≈ (1-j⁴)¹⁶, ~2e-4 at j=0.8), so this operator is
  deliberately NOT SQL-checked; a pytest pins precision == 1 and recall
  against the exhaustive ``shingle_pairs``.
- **SimHash**: 64-bit signatures + hamming-radius pairs via 4-segment
  pigeonhole bucketing (any pair within hamming 3 shares ≥1 exact
  segment).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import sketch as SK
from ..functions import vocab as _V


def _docs(sf_dir: str) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "text"], rows_per_block=1000)


def _pa_type(series: pd.Series) -> pa.DataType:
    """Arrow type for a pandas column, treating object as string (doc
    ids).  Used to build SCHEMA-STABLE empty group outputs: a pandas
    empty object column infers as Arrow `null`, and blocks whose schema
    disagrees with their siblings make Ray's union/groupby silently
    degrade the dataset schema (the 'new schema: .' warning) and drop
    rows downstream."""
    if series.dtype == object:
        return pa.string()
    return pa.from_numpy_dtype(series.dtype)


def _empty_table(cols: list[tuple[str, pa.DataType]]) -> pa.Table:
    return pa.Table.from_pylist([], schema=pa.schema(
        [pa.field(n, t) for n, t in cols]))


# ------------------------------------------------------------ exact dedup
def q_exact_dedup(sf_dir: str) -> rd.Dataset:
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

    return bucketed_group_apply(
        _docs(sf_dir).map_batches(hash_batch, batch_format="pyarrow"),
        ["fp"], agg).sort("fp")


SQL_EXACT_DEDUP = """
SELECT md5(text) AS fp, MIN(doc_id) AS keeper_doc_id,
       COUNT(*) AS n_copies
FROM documents GROUP BY md5(text) ORDER BY fp
"""


# ------------------------------------------------------------ hash sets
COMMON_SAMPLE = 2048       # docs sampled for the stop-token list
COMMON_DF = 0.02           # tokens in ≥2% of sampled docs are "common"

# per-(sf_dir, kind) memo: the stop-token sample is deterministic for a
# given input directory, and three queries (jaccard/shingle/clusters)
# recompute it otherwise
_COMMON_CACHE: dict[tuple, frozenset] = {}


def common_hashes_cached(sf_dir: str, kind: str) -> frozenset:
    # a frozenset holds no object refs, so only the input-mtime part of
    # the token matters here — but reuse the same key discipline
    key = (sf_dir, kind, _cache_token(sf_dir))
    if key not in _COMMON_CACHE:
        _COMMON_CACHE[key] = common_hashes(_docs(sf_dir), kind)
    return _COMMON_CACHE[key]


def common_hashes(docs: rd.Dataset, kind: str = "token") -> frozenset:
    """Deterministic stop-token list: hash values of tokens/shingles that
    appear in ≥COMMON_DF of a fixed-size document sample.  Demoting these
    to the END of the canonical order (frequency-ordered prefixes, the
    AllPairs/PPJoin trick) keeps template boilerplate out of the prefix —
    on the sf0.1 corpus this cuts candidates 10.2M → 1.9M for 191k true
    pairs (and total query time 55.7s → 13.7s, vs 180s for the DuckDB
    oracle).  Sample is O(1) regardless of corpus size; the broadcast set
    is bounded by the sample vocabulary.  Document-frequency counting runs
    distributed (per-batch ``np.unique`` partials, tiny driver merge) —
    only the (hash, df) partials ever reach the driver."""
    sample = docs.limit(COMMON_SAMPLE)

    def partial_df(batch: pa.Table) -> pa.Table:
        memo: dict = {}
        per_doc = []
        for t in batch.column("text").to_pylist():
            toks = t.lower().split()
            if kind == "token":
                per_doc.append(SK.token_hashes_unique(toks, memo))
            else:
                per_doc.append(np.unique(
                    SK.shingle_hashes(toks, 3, memo).view(np.int64)))
        allh = (np.concatenate(per_doc) if per_doc
                else np.empty(0, dtype=np.int64))
        uniq, cnt = np.unique(allh, return_counts=True)
        # one marker row (kind=1) carries the batch's doc count, so the
        # sample size comes back with the partials (no second execution);
        # a null key would float64-ize the 64-bit hashes in pandas
        return pa.table({
            "h": pa.array(np.append(uniq, 0), type=pa.int64()),
            "c": pa.array(np.append(cnt.astype(np.int64), batch.num_rows)),
            "kind": pa.array(np.append(np.zeros(len(uniq), np.int8),
                                       np.int8(1)))})

    parts = sample.map_batches(partial_df, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return frozenset()
    n_docs = int(parts.loc[parts["kind"] == 1, "c"].sum())
    data = parts[parts["kind"] == 0]
    df_counts = data.groupby("h")["c"].sum()
    cut = max(2, int(n_docs * COMMON_DF))
    return frozenset(int(h) for h in df_counts.index[df_counts >= cut])


# per-(sf_dir, kind) memo of the MATERIALIZED demoted hash-set table.
# Four queries consume it (jaccard / shingle / clusters / minhash — the
# demoted order is only a reordering of each doc's set, and both the
# minhash signature (min over permuted values) and the verify kernel
# (lexsort-based intersection count) are order-independent), so within
# one driver-gate process the corpus is tokenized+hashed ONCE per kind
# instead of once per query.  Residency: the memo pins ~sets-size blocks
# in the object store for the process lifetime (spill-tolerant); set
# GRAFT_SETS_RESCAN=1 to trade that residency for re-scans — the table
# stays LAZY and each consumer re-reads + re-hashes the corpus.
_SETS_CACHE: dict[tuple, rd.Dataset] = {}


def _rescan_mode() -> bool:
    import os
    return os.environ.get("GRAFT_SETS_RESCAN", "") == "1"


def _cache_token(sf_dir: str) -> tuple:
    """Session+input identity folded into every process-lifetime memo
    key: a ray.shutdown()/init() cycle in the same process invalidates
    MaterializedDataset object refs, and parquet files changing under
    the same path invalidate the contents — both must MISS the cache
    rather than serve dead refs / stale data (ADVICE r4)."""
    import os

    import ray
    job = (ray.get_runtime_context().get_job_id()
           if ray.is_initialized() else None)
    try:
        mtime = os.stat(os.path.join(sf_dir, "documents.parquet")).st_mtime_ns
    except OSError:
        mtime = 0
    return (job, mtime)


def sets_cached(sf_dir: str, kind: str) -> rd.Dataset:
    key = (sf_dir, kind, _cache_token(sf_dir))
    cached = _SETS_CACHE.get(key)
    if cached is None:
        common = common_hashes_cached(sf_dir, kind)
        cached = hash_sets(_docs(sf_dir), kind, demote=common)
        if not _rescan_mode():
            cached = cached.materialize()
            _SETS_CACHE.clear()          # one live session/input at a time
            _SETS_CACHE[key] = cached
    return cached


# per-sf_dir memo of the VERIFIED shingle-jaccard>=0.8 pair list (with
# jaccard_milli) — shingle_pairs and dedup_clusters share the same edge
# set, so the whole prefix-filter + verify plan runs once per process.
_SHINGLE_EDGES_CACHE: dict[tuple, rd.Dataset] = {}


def shingle_edges_cached(sf_dir: str) -> rd.Dataset:
    sets = None
    if _rescan_mode():
        # zero-residency mode: hand back the LAZY verify plan, uncached —
        # each consumer re-runs prefix+verify (verify_pairs' own internal
        # candidate checkpoint stays unconditional for plan determinism)
        sets = sets_cached(sf_dir, "shingle")
        return verify_pairs(prefix_candidates(sets, 4, 5), sets, 4, 5,
                            emit=_jm)
    key = (sf_dir, _cache_token(sf_dir))
    cached = _SHINGLE_EDGES_CACHE.get(key)
    if cached is None:
        sets = sets_cached(sf_dir, "shingle")
        cached = verify_pairs(prefix_candidates(sets, 4, 5), sets, 4, 5,
                              emit=_jm).materialize()
        _SHINGLE_EDGES_CACHE.clear()
        _SHINGLE_EDGES_CACHE[key] = cached
    return cached


def hash_sets(docs: rd.Dataset, kind: str = "token",
              demote: frozenset | None = None) -> rd.Dataset:
    """(doc_id, th) where th is the unique int64 hash set of the doc's
    tokens (kind='token') or 3-shingles (kind='shingle'), stored in the
    prefix-filter's canonical total order: (is_common, hash) — rare
    hashes sorted first, demoted common hashes sorted after them.  Any
    total order satisfies the prefix lemma; this one makes prefixes
    rare-token-heavy so candidate generation stays near the true pairs."""

    def fn(batch: pa.Table) -> pa.Table:
        memo: dict = {}
        out = []
        for t in batch.column("text").to_pylist():
            toks = t.lower().split()
            if kind == "token":
                hs = SK.token_hashes_unique(toks, memo)
            else:
                hs = np.unique(
                    SK.shingle_hashes(toks, 3, memo).view(np.int64))
            if demote:
                mask = np.isin(hs, _demote_arr)
                hs = np.concatenate([hs[~mask], hs[mask]])
            out.append(hs)
        # build the list column straight from values+offsets (no per-doc
        # Python lists, no pandas object round-trip)
        lens = np.fromiter((len(h) for h in out), dtype=np.int64,
                           count=len(out))
        offsets = np.zeros(len(out) + 1, dtype=np.int32)
        np.cumsum(lens, out=offsets[1:])
        values = (np.concatenate(out) if out
                  else np.empty(0, dtype=np.int64))
        th = pa.ListArray.from_arrays(pa.array(offsets),
                                      pa.array(values, type=pa.int64()))
        return pa.table({"doc_id": batch.column("doc_id"), "th": th}
                        ).replace_schema_metadata(None)

    _demote_arr = (np.fromiter(demote, dtype=np.int64, count=len(demote))
                   if demote else np.empty(0, dtype=np.int64))
    _demote_arr.sort()
    return docs.map_batches(fn, batch_format="pyarrow")


# ------------------------------------------------------------ candidates
def _zeros(t: pa.DataType, n: int) -> pa.Array:
    if pa.types.is_string(t):
        return pa.array([""] * n, type=t)
    return pa.array(np.zeros(n, dtype=np.int64), type=t)


GRID_MAX_GROUP = 4096        # key groups above this split across the grid
GRID_BLOCKS = 8


def _windowed_pairs_grouped(key, ids, ns, ps, num, den):
    """(doc_a, doc_b) length+positional-filtered window pairs for arrays
    SORTED by (key, n, id): each element pairs with the contiguous run of
    same-group predecessors whose size clears the length filter
    (den*na >= num*nb), located with ONE searchsorted over a
    (group-rank << 32 | n) composite.  Returns None when no pairs."""
    m = len(key)
    if m < 2:
        return None
    new_grp = np.ones(m, dtype=bool)
    new_grp[1:] = key[1:] != key[:-1]
    grp_rank = np.cumsum(new_grp) - 1
    comp = (grp_rank << np.int64(32)) | ns
    target = (grp_rank << np.int64(32)) | ((num * ns + den - 1) // den)
    start = np.searchsorted(comp, target, side="left")
    counts = np.arange(m) - start
    total = int(counts.sum())
    if total == 0:
        return None
    r_idx = np.repeat(np.arange(m), counts)
    run_start = np.cumsum(counts) - counts
    l_idx = np.repeat(start, counts) + (
        np.arange(total) - np.repeat(run_start, counts))
    keep = ids[l_idx] != ids[r_idx]
    if ps is not None:
        # positional filter (PPJoin): at the earliest shared prefix token
        # the overlap is <= min(na-pa, nb-pb); J >= t needs overlap >=
        # ceil(num(na+nb)/(num+den))
        amax = np.minimum(ns[l_idx] - ps[l_idx], ns[r_idx] - ps[r_idx])
        need = -(-(num * (ns[l_idx] + ns[r_idx])) // (num + den))
        keep &= amax >= need
    l_idx, r_idx = l_idx[keep], r_idx[keep]
    if len(l_idx) == 0:
        return None
    return (np.minimum(ids[l_idx], ids[r_idx]),
            np.maximum(ids[l_idx], ids[r_idx]))


def _windowed_pairs_cross(ids1, ns1, ps1, ids2, ns2, ps2, num, den):
    """Window pairs ACROSS two disjoint sides of one key group (side 1
    sorted by n).  The length filter is two-sided here: partner sizes for
    n_y lie in [ceil(num*n_y/den), floor(den*n_y/num)].  With num/den
    None (unfiltered band path) every cross pair is generated."""
    if num is None:
        lo = np.zeros(len(ids2), dtype=np.int64)
        hi = np.full(len(ids2), len(ids1), dtype=np.int64)
    else:
        lo = np.searchsorted(ns1, (num * ns2 + den - 1) // den, side="left")
        hi = np.searchsorted(ns1, (den * ns2) // num, side="right")
    counts = np.maximum(hi - lo, 0)
    total = int(counts.sum())
    if total == 0:
        return None
    y_idx = np.repeat(np.arange(len(ids2)), counts)
    run_start = np.cumsum(counts) - counts
    x_idx = np.repeat(lo, counts) + (
        np.arange(total) - np.repeat(run_start, counts))
    if num is not None and ps1 is not None:
        amax = np.minimum(ns1[x_idx] - ps1[x_idx], ns2[y_idx] - ps2[y_idx])
        need = -(-(num * (ns1[x_idx] + ns2[y_idx])) // (num + den))
        keep = amax >= need
        x_idx, y_idx = x_idx[keep], y_idx[keep]
    if len(x_idx) == 0:
        return None
    return (np.minimum(ids1[x_idx], ids2[y_idx]),
            np.maximum(ids1[x_idx], ids2[y_idx]))


def _allpairs_grouped(key, ids):
    """All intra-group (doc_a < doc_b) pairs, arrays sorted by (key, id)
    with (key, id) duplicates removed.  Returns None when no pairs."""
    m = len(key)
    if m < 2:
        return None
    new_grp = np.ones(m, dtype=bool)
    new_grp[1:] = key[1:] != key[:-1]
    grp_start = np.flatnonzero(new_grp)
    sizes = np.diff(np.append(grp_start, m))
    within = np.arange(m) - np.repeat(grp_start, sizes)
    total = int(within.sum())
    if total == 0:
        return None
    r_idx = np.repeat(np.arange(m), within)
    run_start = np.cumsum(within) - within
    l_local = np.arange(total) - np.repeat(run_start, within)
    l_idx = np.repeat(np.repeat(grp_start, sizes), within) + l_local
    return ids[l_idx], ids[r_idx]


def _pairs_from_keys(keyed: rd.Dataset, key_col: str,
                     num: int | None = None,
                     den: int | None = None,
                     dedup: bool = True,
                     max_group: int = GRID_MAX_GROUP,
                     grid_blocks: int = GRID_BLOCKS) -> rd.Dataset:
    """(key, doc_id[, n, p]) rows -> (doc_a < doc_b) candidate pairs
    sharing a key.

    HOT-KEY HANDLING: a key shared by k docs implies O(k^2) pair work,
    so a single 10^5-member group (one boilerplate template at corpus
    scale) would stall or OOM the one worker its bucket lands on.  A
    tiny key-histogram pass (per-batch np.unique partials, driver merge
    — the histogram is bounded by rows/1 distinct keys but only keys
    with count > max_group matter, of which there are < rows/max_group)
    finds the hot keys first.  The common case (no hot keys) runs the
    original single-shuffle plan at zero extra cost; hot keys split
    across ``grid_blocks`` block-pair cells — stage 2 buckets by
    (key, cell), every unordered pair lands in exactly one cell, and
    per-task work is bounded by (k/B)^2 at a replication cost of B
    rows per hot-group member.

    With a num/den threshold the LENGTH filter restricts partners to a
    contiguous size window (see _windowed_pairs_grouped/_cross);
    without it (LSH band path) all intra-group pairs are generated —
    the grid split equally protects degenerate band buckets."""
    from .grouping import bucketed_group_apply, hot_keys, split_hot

    B = grid_blocks

    def pairs_in_bucket(df: pd.DataFrame) -> pa.Table:
        size_filter = num is not None and "n" in df.columns
        pos_filter = size_filter and "p" in df.columns
        t = _pa_type(df["doc_id"])
        empty = _empty_table([("doc_a", t), ("doc_b", t)])
        if df.empty:
            return empty
        key = df[key_col].to_numpy()
        ids = df["doc_id"].to_numpy()
        if size_filter:
            ns_in = df["n"].to_numpy()
            order = np.lexsort((df["p"].to_numpy(), ids, ns_in, key)
                               if pos_filter else (ids, ns_in, key))
            res = _windowed_pairs_grouped(
                key[order], ids[order], ns_in[order],
                df["p"].to_numpy()[order] if pos_filter else None, num, den)
        else:
            order = np.lexsort((ids, key))
            key, ids = key[order], ids[order]
            first = np.ones(len(key), dtype=bool)
            first[1:] = (key[1:] != key[:-1]) | (ids[1:] != ids[:-1])
            res = _allpairs_grouped(key[first], ids[first])
        if res is None:
            return empty
        return pa.table({"doc_a": pa.array(res[0], type=t),
                         "doc_b": pa.array(res[1], type=t)}
                        ).replace_schema_metadata(None)

    # hot-key detection via the shared grouping.hot_keys pass.  The
    # singleton-trim (min_batch_count=2) applies only when NB is small
    # relative to max_group so the miss bound stays ~2x max_group; at
    # extreme block counts fall back to the exact histogram.
    keyed = keyed.materialize()
    min_cnt = 2 if keyed.num_blocks() <= max_group else 1
    hot = hot_keys(keyed, key_col, max_group, min_batch_count=min_cnt)

    if not len(hot):
        pairs = bucketed_group_apply(keyed, [key_col], pairs_in_bucket,
                                     num_buckets=128)
    else:
        cold = keyed.map_batches(split_hot(key_col, hot, False),
                                 batch_format="pyarrow")
        pairs_cold = bucketed_group_apply(cold, [key_col], pairs_in_bucket,
                                          num_buckets=128)

        def replicate(batch: pa.Table) -> pa.Table:
            blk = _doc_blocks(batch.column("doc_id").to_pandas(), B)
            nrows = batch.num_rows
            idxs, cells, blks = [], [], []
            for q in range(B):
                idxs.append(np.arange(nrows))
                cells.append((np.minimum(blk, q) * B
                              + np.maximum(blk, q)).astype(np.int32))
                blks.append(blk.astype(np.int8))
            out = batch.take(pa.array(np.concatenate(idxs)))
            out = out.append_column("_cell", pa.array(np.concatenate(cells)))
            out = out.append_column("_blk", pa.array(np.concatenate(blks)))
            return out.replace_schema_metadata(None)

        members = (keyed.map_batches(split_hot(key_col, hot, True),
                                     batch_format="pyarrow")
                   .map_batches(replicate, batch_format="pyarrow"))

        def stage2(df: pd.DataFrame) -> pa.Table:
            size_filter = num is not None and "n" in df.columns
            t = _pa_type(df["doc_id"])
            empty = _empty_table([("doc_a", t), ("doc_b", t)])
            if df.empty:
                return empty
            outs_a, outs_b = [], []
            for (gk, cell), g in df.groupby([key_col, "_cell"]):
                lo, hi = divmod(int(cell), B)
                ids = g["doc_id"].to_numpy()
                if lo == hi:
                    if size_filter:
                        ns = g["n"].to_numpy()
                        ps = g["p"].to_numpy()
                        order = np.lexsort((ps, ids, ns))
                        res = _windowed_pairs_grouped(
                            np.zeros(len(ids), np.int64), ids[order],
                            ns[order], ps[order], num, den)
                    else:
                        ids_s = np.unique(ids)
                        res = _allpairs_grouped(
                            np.zeros(len(ids_s), np.int64), ids_s)
                else:
                    m1 = g["_blk"].to_numpy() == lo
                    g1, g2 = g[m1], g[~m1]
                    if not len(g1) or not len(g2):
                        continue
                    ids1 = g1["doc_id"].to_numpy()
                    ids2 = g2["doc_id"].to_numpy()
                    if size_filter:
                        ns1 = g1["n"].to_numpy()
                        ps1 = g1["p"].to_numpy()
                        o1 = np.lexsort((ids1, ns1))
                        res = _windowed_pairs_cross(
                            ids1[o1], ns1[o1], ps1[o1], ids2,
                            g2["n"].to_numpy(), g2["p"].to_numpy(),
                            num, den)
                    else:
                        res = _windowed_pairs_cross(
                            ids1, None, None, ids2, None, None,
                            None, None)
                if res is not None:
                    outs_a.append(res[0])
                    outs_b.append(res[1])
            if not outs_a:
                return empty
            return pa.table(
                {"doc_a": pa.array(np.concatenate(outs_a), type=t),
                 "doc_b": pa.array(np.concatenate(outs_b), type=t)}
            ).replace_schema_metadata(None)

        pairs_hot = bucketed_group_apply(members, [key_col, "_cell"],
                                         stage2, num_buckets=128)
        pairs = pairs_cold.union(pairs_hot)

    if not dedup:
        return pairs
    return bucketed_group_apply(
        pairs, ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]), num_buckets=32)


def prefix_candidates(sets: rd.Dataset, num: int, den: int) -> rd.Dataset:
    """Prefix-filter candidate pairs for J ≥ num/den: each doc emits only
    the first ``n - ceil(t·n) + 1`` hashes of its sorted set."""

    def emit(batch: pa.Table) -> pd.DataFrame:
        col = batch.column("th")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        offsets = col.offsets.to_numpy()
        values = col.values.to_numpy()
        n = np.diff(offsets)
        plen = np.where(n > 0, n - ((num * n + den - 1) // den) + 1, 0)
        starts = np.repeat(offsets[:-1], plen)
        within = np.arange(plen.sum()) - np.repeat(np.cumsum(plen) - plen, plen)
        toks = values[starts + within]
        ids = np.repeat(
            batch.column("doc_id").to_numpy(zero_copy_only=False), plen)
        sizes = np.repeat(n, plen)
        return pd.DataFrame({"tok": toks.astype(np.int64), "doc_id": ids,
                             "n": sizes.astype(np.int64),
                             "p": within.astype(np.int64)})

    return _pairs_from_keys(sets.map_batches(emit, batch_format="pyarrow"),
                            "tok", num=num, den=den, dedup=False)


# ------------------------------------------------------------ verify join
def _doc_blocks(vals: pd.Series, num_blocks: int) -> np.ndarray:
    """Deterministic doc-id → block assignment (pandas siphash, fixed
    key — identical across worker processes)."""
    h = pd.util.hash_pandas_object(vals, index=False).to_numpy()
    return (h % np.uint64(num_blocks)).astype(np.int64)


def verify_pairs(pairs: rd.Dataset, sets: rd.Dataset, num: int, den: int,
                 emit, num_blocks: int = 16) -> rd.Dataset:
    """Exact-verify candidate (doc_a, doc_b) pairs against the full hash
    sets via the BLOCK-GRID exchange: each doc's hash set is replicated
    to its ``num_blocks`` block-pair keys (a bounded B× copy of the
    corpus sets), each candidate pair routes ONCE to the block-pair of
    its two doc blocks, and one co-group join co-locates them.  The
    per-bucket kernel then counts intersections for ALL its pairs with
    one lexsort (both set sides are unique, so |∩| = duplicate
    (pair, hash) entries after concatenating the gathered sides).

    Exchange cost: sets·B + pairs — NOT pairs·set_size.  The earlier
    per-pair attach join shipped both full hash lists per candidate
    (≈2·|set| ints × pairs); on near-dup-dense corpora (1.9M candidates
    at sf0.1) that was ~50× more bytes than the grid.  Raise
    ``num_blocks`` to shrink per-bucket state at scale.

    ``emit(inter: ndarray, union: ndarray) -> dict[str, ndarray]`` builds
    the operator-specific output columns (vectorized contract)."""
    from .grouping import bucketed_cogroup

    B = num_blocks
    # Checkpoint the candidate list (ids only — the smallest intermediate
    # in the plan).  Chaining the candidate groupby lazily into the
    # co-group join (all-to-alls + unions in one streaming plan)
    # nondeterministically dropped rows in this Ray version (observed
    # 114/1887 pairs on repeat runs); the materialized boundary makes the
    # plan deterministic and costs only the pair-id exchange.
    pairs = pairs.materialize()

    def tag_pairs(batch: pa.Table) -> pa.Table:
        a = _doc_blocks(batch.column("doc_a").to_pandas(), B)
        b = _doc_blocks(batch.column("doc_b").to_pandas(), B)
        pk = np.minimum(a, b) * B + np.maximum(a, b)
        return (batch.append_column("_pk", pa.array(pk))
                .replace_schema_metadata(None))

    def tag_sets(batch: pa.Table) -> pa.Table:
        blk = _doc_blocks(batch.column("doc_id").to_pandas(), B)
        n = batch.num_rows
        idxs, pks = [], []
        for q in range(B):
            idxs.append(np.arange(n))
            pks.append(np.minimum(blk, q) * B + np.maximum(blk, q))
        out = batch.take(pa.array(np.concatenate(idxs)))
        return (out.append_column("_pk", pa.array(np.concatenate(pks)))
                .replace_schema_metadata(None))

    cands_t = pairs.map_batches(tag_pairs, batch_format="pyarrow")
    sets_t = sets.map_batches(tag_sets, batch_format="pyarrow")

    probe = emit(np.array([1], dtype=np.int64),
                 np.array([1], dtype=np.int64))
    CHUNK_VALUES = 4_000_000   # bound per-kernel gather memory

    def kernel(lf: pd.DataFrame, rf: pd.DataFrame) -> pa.Table:
        # lf: candidates (doc_a, doc_b, _pk); rf: set replicas
        # (doc_id, th, _pk).  Bucket collisions may merge several _pk
        # groups — harmless: co-location is preserved, duplicate set
        # replicas are dropped by doc_id.
        if lf.empty or rf.empty:
            t = _pa_type(lf["doc_a"]) if not lf.empty else pa.int64()
            return _empty_table([("doc_a", t), ("doc_b", t)]
                                + [(k, pa.int64()) for k in probe])
        lf = lf.drop_duplicates(["doc_a", "doc_b"])
        rf = rf.drop_duplicates("doc_id")
        ths = rf["th"].to_numpy()
        lens = np.fromiter((len(x) for x in ths), dtype=np.int64,
                           count=len(ths))
        offs = np.zeros(len(ths) + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        raw = (np.concatenate(ths) if len(ths)
               else np.empty(0, dtype=np.int64)).astype(np.int64)
        # remap hashes to bucket-local dense vocabulary ids so the
        # per-chunk duplicate count can use ONE single-key np.sort
        # (row<<vbits | vid) instead of a two-key lexsort — ~3x faster
        uvals, vals = np.unique(raw, return_inverse=True)
        vals = vals.astype(np.int64)
        vbits = max(1, int(len(uvals)).bit_length())
        idx = pd.Index(rf["doc_id"])
        ia_all = idx.get_indexer(lf["doc_a"])
        ib_all = idx.get_indexer(lf["doc_b"])
        ok = (ia_all >= 0) & (ib_all >= 0)   # replication invariant guard
        lf = lf.loc[ok]
        ia_all, ib_all = ia_all[ok], ib_all[ok]

        def gather(i_arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
            n = lens[i_arr]
            total = int(n.sum())
            pos = np.arange(total) - np.repeat(np.cumsum(n) - n, n)
            return vals[np.repeat(offs[i_arr], n) + pos], n

        out_a, out_b, out_i, out_u = [], [], [], []
        npairs = len(ia_all)
        avg = max(1, int(lens.mean()) if len(lens) else 1)
        step = max(1024, CHUNK_VALUES // (2 * avg))
        for s in range(0, npairs, step):
            ia, ib = ia_all[s:s + step], ib_all[s:s + step]
            va, na = gather(ia)
            vb, nb = gather(ib)
            m = len(ia)
            row = np.concatenate([np.repeat(np.arange(m), na),
                                  np.repeat(np.arange(m), nb)])
            key = np.concatenate([va, vb]) | (row << vbits)
            key.sort()
            dup = key[1:] == key[:-1]
            inter = np.bincount(key[1:][dup] >> vbits, minlength=m)
            union = na + nb - inter
            keep = (union > 0) & (den * inter >= num * union)
            out_a.append(lf["doc_a"].to_numpy()[s:s + step][keep])
            out_b.append(lf["doc_b"].to_numpy()[s:s + step][keep])
            out_i.append(inter[keep].astype(np.int64))
            out_u.append(union[keep].astype(np.int64))
        doc_a = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        doc_b = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        inter = np.concatenate(out_i) if out_i else np.empty(0, np.int64)
        union = np.concatenate(out_u) if out_u else np.empty(0, np.int64)
        cols = {"doc_a": pa.array(doc_a), "doc_b": pa.array(doc_b)}
        for k, v in emit(inter, union).items():
            cols[k] = pa.array(np.asarray(v, dtype=np.int64))
        return pa.table(cols).replace_schema_metadata(None)

    return bucketed_cogroup(cands_t, sets_t, ["_pk"], ["_pk"], kernel,
                            num_buckets=max(32, B * (B + 1) // 2))


# ------------------------------------------------------------ exact jaccard
def q_jaccard_pairs(sf_dir: str) -> rd.Dataset:
    """All near-dup pairs with token-set jaccard ≥ 0.95 (exact, integer
    threshold ``20·|∩| ≥ 19·|∪|``) via the frequency-ordered
    prefix-filter join.

    The hash-set table is ``materialize()``d (via ``sets_cached``)
    because three stages consume it (candidate gen + both verify joins)
    and Ray re-executes lazy lineage per consumer; the object store
    spills it block-by-block at scale.  The alternative — re-reading and
    re-hashing the corpus per consumer — trades 2 extra corpus scans for
    zero store residency; ``GRAFT_SETS_RESCAN=1`` flips to that mode
    (identical output, pinned by pytest) if store pressure ever beats
    scan cost."""
    sets = sets_cached(sf_dir, "token")
    cands = prefix_candidates(sets, num=19, den=20)
    return verify_pairs(
        cands, sets, num=19, den=20,
        emit=lambda i, u: {"inter_tokens": i, "union_tokens": u}
    ).sort(["doc_a", "doc_b"])


# inverted-index formulation (exact): candidates = doc pairs sharing at
# least one token, intersection = count of shared distinct tokens.  J >=
# 0.95 > 0 requires a shared token, so candidates-only is lossless, and
# the O(n_docs^2) list_intersect nested loop (~180 s at sf0.1) becomes an
# equi-join + group-count (~25 s) -- the driver gate can never starve on it
SQL_JACCARD_PAIRS = r"""
WITH t0 AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE list_distinct(regexp_split_to_array(trim(lower(text)), '\s+'))
         END AS toks
  FROM documents
), t AS (
  SELECT doc_id, len(toks) AS n FROM t0
), x AS (
  SELECT doc_id, unnest(toks) AS g FROM t0
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM x a JOIN x b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       CAST(c.i AS BIGINT) AS inter_tokens,
       CAST(na.n + nb.n - c.i AS BIGINT) AS union_tokens
FROM cand c JOIN t na ON na.doc_id = c.doc_a
            JOIN t nb ON nb.doc_id = c.doc_b
WHERE 20 * c.i >= 19 * (na.n + nb.n - c.i)
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------------ shingle pairs
def _jm(inter, union) -> dict:
    """Integer-milli jaccard (half-up rounding), elementwise over numpy
    arrays (the vectorized ``verify_pairs`` emit contract)."""
    return {"jaccard_milli": (2000 * inter + union) // (2 * union)}


def q_shingle_pairs(sf_dir: str) -> rd.Dataset:
    """All pairs with 3-shingle jaccard ≥ 0.8 — exact (prefix-filter join
    over shingle-hash sets); the exhaustive ground truth the MinHash+LSH
    path below approximates."""
    return shingle_edges_cached(sf_dir).sort(["doc_a", "doc_b"])


# shingle-set jaccard (not token-set): SQL builds the same 3-shingles
SQL_SHINGLE_PAIRS = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
         END AS w
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(range(1, len(w) - 1),
                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              END AS sh
  FROM t
), sn AS (
  SELECT doc_id, len(sh) AS n FROM s
), x AS (
  SELECT doc_id, unnest(sh) AS g FROM s
), cand AS (
  -- inverted-index candidates: J >= 0.8 > 0 requires a shared shingle,
  -- so the equi-join is lossless; i = |A ∩ B| since lists are distinct
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM x a JOIN x b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT c.doc_a, c.doc_b,
       CAST((2000 * c.i + (na.n + nb.n - c.i)) // (2 * (na.n + nb.n - c.i))
         AS BIGINT) AS jaccard_milli
FROM cand c JOIN sn na ON na.doc_id = c.doc_a
            JOIN sn nb ON nb.doc_id = c.doc_b
WHERE 2000 * c.i >= 1600 * (na.n + nb.n - c.i)
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------------ minhash LSH
def minhash_lsh_pairs(docs: rd.Dataset, jaccard_milli: int = 800,
                      sets: rd.Dataset | None = None) -> rd.Dataset:
    """MinHash+LSH near-dup pairs, exact-verified.

    Plan: 64-perm signature per doc → explode to 16 compact
    (band_key:int64, doc_id) rows — the whole band exchange is ~16×16 B
    per doc — → groupby(band) → candidate pairs → exact shingle-jaccard
    verification through the shared co-group verify join.  Cost ∝ docs +
    colliding pairs; recall ≈ 1-(1-j⁴)¹⁶ (<1 ⇒ rows-only driver check;
    pinned against the exhaustive shingle_pairs by pytest).

    ``sets`` lets the caller pass a pre-built (doc_id, th) shingle-set
    table (any per-doc ordering — signature and verify are both
    order-independent) so the gate's four set-consumers share one
    tokenize+hash pass."""
    if sets is None:
        sets = hash_sets(docs, "shingle").materialize()

    def band_keys(batch: pa.Table) -> pd.DataFrame:
        import pyarrow.compute as pc

        col = batch.column("th")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        values = pc.list_flatten(col).to_numpy()
        lens = pc.list_value_length(col).to_numpy().astype(np.int64)
        offsets = np.zeros(len(lens) + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        sigs = SK.minhash_signatures_batch(values, offsets)
        keys = SK.lsh_band_keys_batch(sigs)          # (ndocs, BANDS)
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return pd.DataFrame({
            "band": keys.reshape(-1),
            "doc_id": np.repeat(ids, SK.LSH_BANDS)})

    cands = _pairs_from_keys(sets.map_batches(band_keys, batch_format="pyarrow"),
                             "band", dedup=False)
    # exact threshold fraction: jaccard_milli/1000 reduced by gcd (the
    # round-2 `milli // 200 / 5` silently lowered e.g. 850 -> 0.8)
    g = math.gcd(jaccard_milli, 1000)
    return verify_pairs(cands, sets, num=jaccard_milli // g,
                        den=1000 // g, emit=_jm)


def q_minhash_pairs(sf_dir: str) -> rd.Dataset:
    return minhash_lsh_pairs(_docs(sf_dir), jaccard_milli=800,
                             sets=sets_cached(sf_dir, "shingle")
                             ).sort(["doc_a", "doc_b"])


# ------------------------------------------------------------ simhash
def simhash_signatures(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, sig:int64) per document — the 64-bit SimHash stored via
    two's-complement shift (``sig - 2**63``) so Arrow carries it as
    int64; recover with ``_sig_u64``."""

    def sig_batch(batch: pa.Table) -> pa.Table:
        memo: dict = {}
        ids = batch.column("doc_id")
        vals = np.fromiter(
            (SK.simhash64(t.lower().split(), memo) - (1 << 63)
             for t in batch.column("text").to_pylist()),
            dtype=np.int64, count=batch.num_rows)
        return pa.table({"doc_id": ids, "sig": pa.array(vals)}
                        ).replace_schema_metadata(None)

    return docs.map_batches(sig_batch, batch_format="pyarrow")


def _sig_u64(stored: np.ndarray) -> np.ndarray:
    """Invert the ``sig - 2**63`` int64 storage back to the raw uint64
    signature (wrapping add of 2**63 to the reinterpreted bit pattern)."""
    with np.errstate(over="ignore"):
        return stored.astype(np.int64).view(np.uint64) + np.uint64(1 << 63)


def verify_hamming(pairs: rd.Dataset, sigs: rd.Dataset, max_h: int = 3,
                   num_blocks: int = 8) -> rd.Dataset:
    """Exact Hamming verification of candidate (doc_a, doc_b) pairs
    against per-doc 64-bit signatures, using the same block-grid
    exchange as :func:`verify_pairs` (cost sigs·B + pairs, never
    pairs·payload) with a fully vectorized XOR-popcount kernel."""
    from .grouping import bucketed_cogroup

    B = num_blocks
    pairs = pairs.materialize()

    def tag_pairs(batch: pa.Table) -> pa.Table:
        a = _doc_blocks(batch.column("doc_a").to_pandas(), B)
        b = _doc_blocks(batch.column("doc_b").to_pandas(), B)
        pk = np.minimum(a, b) * B + np.maximum(a, b)
        return (batch.append_column("_pk", pa.array(pk))
                .replace_schema_metadata(None))

    def tag_sigs(batch: pa.Table) -> pa.Table:
        blk = _doc_blocks(batch.column("doc_id").to_pandas(), B)
        n = batch.num_rows
        idxs, pks = [], []
        for q in range(B):
            idxs.append(np.arange(n))
            pks.append(np.minimum(blk, q) * B + np.maximum(blk, q))
        out = batch.take(pa.array(np.concatenate(idxs)))
        return (out.append_column("_pk", pa.array(np.concatenate(pks)))
                .replace_schema_metadata(None))

    def kernel(lf: pd.DataFrame, rf: pd.DataFrame) -> pa.Table:
        t = _pa_type(lf["doc_a"]) if not lf.empty else pa.int64()
        empty = _empty_table([("doc_a", t), ("doc_b", t),
                              ("hamming", pa.int64())])
        if lf.empty or rf.empty:
            return empty
        lf = lf.drop_duplicates(["doc_a", "doc_b"])
        rf = rf.drop_duplicates("doc_id")
        idx = pd.Index(rf["doc_id"])
        ia = idx.get_indexer(lf["doc_a"])
        ib = idx.get_indexer(lf["doc_b"])
        ok = (ia >= 0) & (ib >= 0)    # replication invariant guard
        if not ok.any():
            return empty
        u = _sig_u64(rf["sig"].to_numpy())
        h = SK.popcount64_batch(u[ia[ok]] ^ u[ib[ok]])
        keep = h <= max_h
        sub = lf.loc[ok]
        return pa.table({
            "doc_a": pa.array(sub["doc_a"].to_numpy()[keep], type=t),
            "doc_b": pa.array(sub["doc_b"].to_numpy()[keep], type=t),
            "hamming": pa.array(h[keep])}).replace_schema_metadata(None)

    return bucketed_cogroup(
        pairs.map_batches(tag_pairs, batch_format="pyarrow"),
        sigs.map_batches(tag_sigs, batch_format="pyarrow"),
        ["_pk"], ["_pk"], kernel, num_buckets=B * B)


def q_simhash_pairs(sf_dir: str) -> rd.Dataset:
    """SimHash near-dup: hamming(sig_a, sig_b) ≤ 3 via pigeonhole — split
    the 64-bit signature into 4 segments; any pair within radius 3 agrees
    on ≥1 segment, so grouping by (segment index, segment value) finds all
    candidates with one shuffle.

    Round-3 rebuild (was a per-segment-bucket ``itertuples`` double loop —
    O(k²) *Python* hamming calls in one task on a template-heavy corpus):
    candidates now flow through :func:`_pairs_from_keys`, inheriting the
    hot-key block grid that caps any segment bucket at (k/B)² per task,
    and verification is one vectorized XOR-popcount grid join
    (:func:`verify_hamming`).  Equivalence vs a brute-force O(n²) NumPy
    reference and bounded time on an all-identical corpus are pinned by
    ``tests/test_dedup.py``."""
    sigs = simhash_signatures(_docs(sf_dir)).materialize()

    def seg_keys(batch: pa.Table) -> pa.Table:
        u = _sig_u64(batch.column("sig").to_numpy(zero_copy_only=False))
        n = len(u)
        ids = batch.column("doc_id")
        segs, docs = [], []
        for seg in range(4):
            val = (u >> np.uint64(16 * seg)) & np.uint64(0xFFFF)
            segs.append((np.int64(seg) << np.int64(16))
                        | val.astype(np.int64))
            docs.append(np.arange(n))
        out = pa.table({
            "seg_key": pa.array(np.concatenate(segs)),
            "doc_id": pa.concat_arrays(
                [ids.combine_chunks().take(pa.array(d)) for d in docs]),
        })
        return out.replace_schema_metadata(None)

    cands = _pairs_from_keys(sigs.map_batches(seg_keys,
                                              batch_format="pyarrow"),
                             "seg_key", dedup=True)
    return verify_hamming(cands, sigs, max_h=3).sort(["doc_a", "doc_b"])





# ------------------------------------------------------------ components
def connected_components(edges: rd.Dataset, nodes: rd.Dataset,
                         max_rounds: int = 30, jump_after: int = 3,
                         num_buckets: int = 32) -> rd.Dataset:
    """Connected components over a near-dup pair graph → per-doc cluster
    canonical (min reachable doc_id) — the step that turns pair detection
    into actual deduplication at corpus scale.

    Hash-to-min label propagation WITH adaptive pointer jumping: every
    round each node's label becomes the min of (its own, its neighbors'
    labels, and — in jump-enabled rounds — its label's label).  The
    neighbor min is one bucketed co-group of labels onto edge sources;
    the pointer jump a second co-group of the label table onto itself;
    both fold into one bucketed min-reduce.  The jump doubles the hop
    distance a min travels per round, so convergence is
    O(jump_after + log diameter) rounds (plain one-hop propagation —
    round 2's version — needs O(diameter): a 10^5-node path graph would
    silently exhaust the round budget).  The jump stage only engages
    after ``jump_after`` one-hop rounds fail to reach the fixpoint:
    real near-dup graphs are star/clique-shaped with diameter ≤ 2-3, so
    the common case pays zero extra exchanges (measured 2x on the sf0.1
    corpus when jumping unconditionally) while a pathological deep
    component still converges logarithmically.  Labels only ever
    decrease, so
    the global label SUM is a monotone convergence witness — one tiny
    aggregate per round, no per-node change join; if the budget is
    exhausted before the fixpoint the witness makes that detectable and
    this function RAISES rather than returning wrong labels.  Each
    round's label table is checkpointed (materialize ≙ the parquet
    checkpoint a multi-day 10^12-row run would write).

    ``edges``: (doc_a, doc_b) int64 pairs; ``nodes``: (doc_id) int64.
    ``num_buckets`` sizes every per-round exchange AND the label-table
    block count — callers scale it with the node count (each round pays
    2-3 all-to-alls whose task matrix is O(blocks x buckets), so 32
    buckets on a 500-node graph is pure scheduling overhead).
    """
    from .grouping import bucketed_cogroup, bucketed_group_apply

    nb = num_buckets

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a")
        b = batch.column("doc_b")
        return pa.table({"src": pa.concat_arrays([a.combine_chunks(), b.combine_chunks()]),
                         "dst": pa.concat_arrays([b.combine_chunks(), a.combine_chunks()])})

    # coalesce block counts at every round boundary: map_groups emits one
    # tiny block per input slice and union CONCATENATES block lists, so
    # without repartition the label table snowballed 64 -> 256 -> 640
    # blocks and per-round task overhead tripled each round (observed
    # 2.9 s -> 8.2 s -> ... on a 512-edge graph)
    e = (edges.map_batches(both_dirs, batch_format="pyarrow")
         .repartition(nb).materialize())

    def init_labels(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        return pa.table({"doc_id": ids, "label": ids})

    labels = (nodes.map_batches(init_labels, batch_format="pyarrow")
              .repartition(nb).materialize())

    def send(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        # lf: edges bucketed by src; rf: labels bucketed by doc_id
        if lf.empty or rf.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "label": pd.Series(dtype=np.int64)})
        m = lf.merge(rf.rename(columns={"doc_id": "src"}), on="src")
        return pd.DataFrame({"doc_id": m.dst, "label": m.label})

    def jump(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        # pointer doubling: (d, l) x (l, l2) -> (d, l2); l2 <= l so the
        # min-reduce below keeps it monotone
        if lf.empty or rf.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                                 "label": pd.Series(dtype=np.int64)})
        m = lf.merge(rf.rename(columns={"doc_id": "label",
                                        "label": "label2"}), on="label")
        return pd.DataFrame({"doc_id": m.doc_id, "label": m.label2})

    def min_label(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False).agg(label=("label", "min"))

    def label_sum(ds: rd.Dataset) -> int:
        from ray.data.aggregate import Sum
        return int(ds.aggregate(Sum("label"))["sum(label)"])

    prev = cur = label_sum(labels)
    for rnd in range(max_rounds):
        # materialize the message stage: lazily chaining the co-group into
        # the min-reduce (2 groupbys + 2 unions in one plan) ran 3-10x
        # slower in this Ray version (22 s observed for a 512-edge round);
        # the boundary costs only the (dst, label) message exchange
        msgs = bucketed_cogroup(e, labels, ["src"], ["doc_id"], send,
                                num_buckets=nb).materialize()
        fused = labels.union(msgs)
        if rnd >= jump_after:
            jumps = bucketed_cogroup(labels, labels, ["label"], ["doc_id"],
                                     jump, num_buckets=nb).materialize()
            fused = fused.union(jumps)
        labels = (bucketed_group_apply(fused, ["doc_id"], min_label,
                                       num_buckets=nb)
                  .repartition(nb).materialize())
        cur = label_sum(labels)
        if cur == prev:        # labels are monotone non-increasing
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} "
            f"rounds (label sum still decreasing: {prev} -> {cur}); "
            "raise max_rounds — returning here would yield wrong labels")
    return labels


def q_dedup_clusters(sf_dir: str) -> rd.Dataset:
    """Cluster id (min reachable doc_id) per document over the exact
    shingle-jaccard ≥0.8 near-dup graph; singletons are their own
    cluster.  Completes the dedup family: pairs → clusters → canonical
    keeper per cluster."""
    import pyarrow.parquet as _pq

    edges = shingle_edges_cached(sf_dir).map_batches(
        lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow")
    from ..sources.io import read_parquet_sized
    docs_path = f"{sf_dir}/documents.parquet"
    nodes = read_parquet_sized(docs_path, columns=["doc_id"],
                               rows_per_block=20_000)
    # CC pays 2-3 all-to-alls PER ROUND; size them with the node count
    # (20k labels/bucket keeps a bucket ~tiny; cap covers 10^9+ nodes)
    n_docs = _pq.read_metadata(docs_path).num_rows
    nb = max(4, min(256, -(-n_docs // 20_000)))
    return (connected_components(edges, nodes, num_buckets=nb)
            .map_batches(lambda b: (b.select(["doc_id", "label"])
                                    .rename_columns(["doc_id", "cluster_id"])),
                         batch_format="pyarrow")
            .sort("doc_id"))


# cluster id = min doc_id reachable through the near-dup graph; DuckDB
# computes it with a recursive transitive closure over the same edge set
SQL_DEDUP_CLUSTERS = r"""
WITH RECURSIVE t AS (
  SELECT doc_id,
         CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
         END AS w
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(range(1, len(w) - 1),
                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              END AS sh
  FROM t
), sn AS (
  SELECT doc_id, len(sh) AS n FROM s
), x AS (
  SELECT doc_id, unnest(sh) AS g FROM s
), cand AS (
  -- inverted-index candidates (lossless for J >= 0.8; see SQL_SHINGLE_PAIRS)
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM x a JOIN x b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), p AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c JOIN sn na ON na.doc_id = c.doc_a
              JOIN sn nb ON nb.doc_id = c.doc_b
  WHERE 2000 * c.i >= 1600 * (na.n + nb.n - c.i)
), e AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION ALL
  SELECT doc_b, doc_a FROM p
), reach AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
)
SELECT d.doc_id,
       CAST(LEAST(d.doc_id,
                  COALESCE((SELECT MIN(r.dst) FROM reach r
                            WHERE r.src = d.doc_id), d.doc_id))
            AS BIGINT) AS cluster_id
FROM documents d ORDER BY doc_id
"""


# ------------------------------------------------------ cleaning recipe
CLEAN_MIN_TOKENS = 30        # Gopher-style floor on document length
CLEAN_MIN_STOP_MILLI = 20    # ≥2% stopwords (gibberish filter)


def q_clean_corpus(sf_dir: str) -> rd.Dataset:
    """The C4/Gopher-style corpus-cleaning recipe composed END-TO-END as
    one lazy plan: quality filter → exact dedup → near-dup removal,
    emitting the surviving (doc_id, n_tokens) — what an LLM-data user
    actually runs, not the individual diagnostics.

    Stages and their exchanges:
    1. quality gate (n_tokens ≥ 30, stopword ratio ≥ 2%) fused with the
       md5 fingerprint into ONE map_batches over the text — drops ~25%
       of rows before anything shuffles;
    2. exact dedup: fp-bucketed keep-min(doc_id) (ships survivors only);
    3. near-dup removal: reuses the memoized verified shingle-edge set
       and the pointer-jumping connected components (one tokenise+hash
       pass per process across the whole dedup family), attaches labels
       to survivors with ONE doc-bucketed cogroup, and keeps each
       cluster's minimum SURVIVING doc — a near-dup cluster whose
       canonical was quality- or exact-filtered still keeps its best
       remaining member."""
    import pyarrow.parquet as _pqm

    from ..functions import vocab as V
    from ..sources.io import read_parquet_sized
    from .grouping import bucketed_cogroup, bucketed_group_apply

    stop = V.STOPWORDS
    docs = _docs(sf_dir)

    def quality(batch: pa.Table) -> pd.DataFrame:
        ids, ns, fps = [], [], []
        for d, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            toks = t.lower().split()
            n = len(toks)
            if n < CLEAN_MIN_TOKENS:
                continue
            n_stop = sum(1 for w in toks if w in stop)
            if (2000 * n_stop + n) // (2 * n) < CLEAN_MIN_STOP_MILLI:
                continue
            ids.append(d)
            ns.append(n)
            fps.append(hashlib.md5(t.encode("utf-8")).hexdigest())
        return pd.DataFrame({"doc_id": pd.Series(ids, dtype=np.int64),
                             "n_tokens": pd.Series(ns, dtype=np.int64),
                             "fp": pd.Series(fps, dtype=object)})

    surv = docs.map_batches(quality, batch_format="pyarrow")

    def exact_keep(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.doc_id == df.groupby("fp").doc_id.transform("min")
        return df.loc[keep, ["doc_id", "n_tokens"]]

    surv = bucketed_group_apply(surv, ["fp"], exact_keep, num_buckets=16)

    edges = shingle_edges_cached(sf_dir).map_batches(
        lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow")
    docs_path = f"{sf_dir}/documents.parquet"
    nodes = read_parquet_sized(docs_path, columns=["doc_id"],
                               rows_per_block=20_000)
    n_docs = _pqm.read_metadata(docs_path).num_rows
    nb = max(4, min(256, -(-n_docs // 20_000)))
    labels = connected_components(edges, nodes, num_buckets=nb)

    def attach(s: pd.DataFrame, l: pd.DataFrame) -> pd.DataFrame:
        m = s.merge(l, on="doc_id")
        return m[["doc_id", "n_tokens", "label"]]

    lab = bucketed_cogroup(surv, labels, ["doc_id"], ["doc_id"], attach,
                           num_buckets=16)

    def cluster_keep(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.doc_id == df.groupby("label").doc_id.transform("min")
        return df.loc[keep, ["doc_id", "n_tokens"]]

    return bucketed_group_apply(lab, ["label"], cluster_keep,
                                num_buckets=16).sort("doc_id")


_STOP_SQL_C = "(" + ",".join(f"'{w}'" for w in sorted(_V.STOPWORDS)) + ")"

SQL_CLEAN_CORPUS = r"""
WITH RECURSIVE t AS (
  SELECT doc_id, text,
         CASE WHEN trim(lower(text)) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(lower(text)), '\s+')
         END AS w
  FROM documents
), s AS (
  SELECT doc_id,
         CASE WHEN len(w) = 0 THEN CAST([] AS VARCHAR[])
              WHEN len(w) < 3 THEN [array_to_string(w, ' ')]
              ELSE list_distinct(list_transform(range(1, len(w) - 1),
                                 i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
              END AS sh
  FROM t
), sn AS (
  SELECT doc_id, len(sh) AS n FROM s
), x AS (
  SELECT doc_id, unnest(sh) AS g FROM s
), cand AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM x a JOIN x b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), p AS (
  SELECT c.doc_a, c.doc_b
  FROM cand c JOIN sn na ON na.doc_id = c.doc_a
              JOIN sn nb ON nb.doc_id = c.doc_b
  WHERE 2000 * c.i >= 1600 * (na.n + nb.n - c.i)
), e AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION ALL
  SELECT doc_b, doc_a FROM p
), reach AS (
  SELECT src, dst FROM e
  UNION
  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src
), lbl AS (
  SELECT d.doc_id,
         CAST(LEAST(d.doc_id,
                    COALESCE((SELECT MIN(r.dst) FROM reach r
                              WHERE r.src = d.doc_id), d.doc_id))
              AS BIGINT) AS cluster_id
  FROM documents d
), q AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CASE WHEN len(w) = 0 THEN 0
              ELSE (2000 * len(list_filter(w, y -> y IN __STOP__))
                    + len(w)) // (2 * len(w)) END AS sr,
         md5(text) AS fp
  FROM t
), s1 AS (
  SELECT doc_id, n_tokens, fp FROM q
  WHERE n_tokens >= 30 AND sr >= 20
), s2 AS (
  SELECT doc_id, n_tokens FROM s1
  QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY fp)
)
SELECT s2.doc_id, s2.n_tokens
FROM s2 JOIN lbl ON lbl.doc_id = s2.doc_id
QUALIFY s2.doc_id = MIN(s2.doc_id) OVER (PARTITION BY lbl.cluster_id)
ORDER BY s2.doc_id
""".replace("__STOP__", _STOP_SQL_C)


# ------------------------------------ sorted-neighborhood ER blocking
SN_WINDOW = 5          # rank-space neighborhood (Hernández-Stolfo w)
SN_VERIFY_CHARS = 64   # verify on a bounded slice, never the full doc
SN_LEV_MAX = 8
_SN_NB = 64            # key-range buckets for the distributed rank
_SN_CHUNK = 1024       # rank-space chunk for pair generation


def _lev_batch(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Vectorized Levenshtein over P string pairs at once (A: (P, La),
    B: (P, Lb) codepoint matrices — callers group pairs by length
    combo).  The in-row dependency cur[j] = min(t[j], cur[j-1]+1)
    resolves as a prefix-min of t[j]-j (then +j), so the whole DP is
    La iterations of (P, Lb) numpy ops — no per-pair Python loop."""
    P, La = A.shape
    Lb = B.shape[1]
    jj = np.arange(Lb + 1, dtype=np.int32)
    prev = np.tile(jj, (P, 1))
    for i in range(1, La + 1):
        t = np.empty((P, Lb + 1), dtype=np.int32)
        t[:, 0] = i
        t[:, 1:] = np.minimum(prev[:, 1:] + 1,
                              prev[:, :-1] + (A[:, i - 1:i] != B))
        prev = np.minimum.accumulate(t - jj, axis=1) + jj
    return prev[:, -1]


def _lev_pairs(sa: list[str], sb: list[str]) -> np.ndarray:
    """Exact edit distance for a list of pairs, vectorized per
    (len_a, len_b) combo (bounded: verify slices are ≤ 64 chars)."""
    out = np.zeros(len(sa), dtype=np.int64)
    by_len: dict[tuple[int, int], list[int]] = {}
    for i, (a, b) in enumerate(zip(sa, sb)):
        by_len.setdefault((len(a), len(b)), []).append(i)
    for (la, lb), idx in by_len.items():
        if la == 0 or lb == 0:
            out[idx] = max(la, lb)
            continue
        A = np.array([[ord(c) for c in sa[i]] for i in idx],
                     dtype=np.int32)
        B = np.array([[ord(c) for c in sb[i]] for i in idx],
                     dtype=np.int32)
        out[idx] = _lev_batch(A, B)
    return out


def q_sorted_neighborhood(sf_dir: str) -> rd.Dataset:
    """Sorted-neighborhood entity-resolution blocking (Hernández &
    Stolfo): sort the corpus by a cheap blocking key (first 8 chars,
    doc_id tiebreak), slide a window of ``SN_WINDOW`` over the GLOBAL
    rank order, and exact-verify each in-window pair with edit distance
    ≤ ``SN_LEV_MAX`` on a 64-char slice — the classic complement to the
    set-similarity joins above (catches prefix-preserving near-dups
    with O(n·w) candidates instead of O(n²)).

    Distributed total rank WITHOUT a global sort (same primitive as
    customer_quartiles): (1) prep ships only (doc_id, 8-char key,
    64-char verify slice) — the corpus text never reshuffles; (2) a
    64-bucket KEY-RANGE histogram over a 4-byte order-preserving prefix
    proxy gives driver-side prefix offsets (64 ints); equal proxies land
    in one bucket by construction so local sort order == global.  A
    low-entropy key (every doc starting 'INVOICE') collapses buckets —
    the documented refinement is widening the proxy to more key bytes,
    the same recursion the hot-key grid uses.  (3) pair generation
    chunks RANK space (ranks are a permutation, so chunks are
    contiguous); each chunk's last ``SN_WINDOW`` rows replicate to the
    next chunk as read-only context, every pair is generated exactly
    once (owned by the higher rank's home chunk), and gap-g partners
    are pure array slices — no per-row loop.  Verification is the
    vectorized multi-pair DP above."""
    ds = _docs(sf_dir)

    def prep(batch: pa.Table) -> pd.DataFrame:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        k8 = [t[:8] for t in texts]
        proxy = np.fromiter(
            (int.from_bytes(s.encode("utf-8")[:4].ljust(4, b"\0"),
                            "big") for s in k8),
            dtype=np.int64, count=len(k8))
        return pd.DataFrame({
            "doc_id": ids.astype(np.int64),
            "k8": k8,
            "k64": [t[:SN_VERIFY_CHARS] for t in texts],
            "proxy": proxy,
        })

    prepped = ds.map_batches(prep, batch_format="pyarrow").materialize()

    def bcounts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lo": [int(df.proxy.min())],
                             "hi": [int(df.proxy.max())],
                             "n": [len(df)]})

    parts = prepped.map_batches(bcounts, batch_format="pandas").to_pandas()
    lo, hi = int(parts.lo.min()), int(parts.hi.max())
    width = max(1, (hi - lo + _SN_NB) // _SN_NB)

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.minimum((v - lo) // width, _SN_NB - 1).astype(np.int64)

    def pb(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(bucket_of(df.proxy.to_numpy()),
                         return_counts=True)
        return pd.DataFrame({"b": u, "n": c})

    bc = prepped.map_batches(pb, batch_format="pandas").to_pandas()
    counts = np.zeros(_SN_NB, dtype=np.int64)
    agg = bc.groupby("b").n.sum()
    counts[agg.index.to_numpy()] = agg.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        outs = [pd.DataFrame({"doc_id": pd.Series(dtype=np.int64),
                              "k64": pd.Series(dtype="string"),
                              "rn": pd.Series(dtype=np.int64)})]
        for rb, g in df.groupby("_rb"):
            g = g.sort_values(["k8", "doc_id"], kind="mergesort")
            rn = offsets[int(rb)] + np.arange(1, len(g) + 1,
                                              dtype=np.int64)
            outs.append(pd.DataFrame({
                "doc_id": g.doc_id.to_numpy().astype(np.int64),
                "k64": g.k64.to_numpy(),
                "rn": rn}))
        return pd.concat(outs, ignore_index=True)

    # Exchange buckets are assigned by MODULO over contiguous ids, not
    # by key hash: hash partitioning with few distinct keys leaves
    # empty partitions, whose zero-column blocks degrade downstream
    # schema tracking (grouping.py lore).  Nonempty range buckets and
    # rank chunks are both contiguous integer sequences, so modulo
    # routing fills every partition by construction.
    n_total = int(counts.sum())
    nonempty_rb = np.flatnonzero(counts)      # sorted nonempty buckets
    rank_buckets = max(1, min(_SN_NB, len(nonempty_rb)))
    chunk_buckets = max(1, min(32, n_total // _SN_CHUNK + 1))

    def tag_mod(df: pd.DataFrame) -> pd.DataFrame:
        rb = bucket_of(df.proxy.to_numpy())
        pos = np.searchsorted(nonempty_rb, rb)
        return df.assign(_rb=rb, _kb=(pos % rank_buckets).astype(np.int64))

    def rank_apply(df: pd.DataFrame) -> pd.DataFrame:
        return rank_bucket(df.drop(columns=["_kb"]))

    from .grouping import _to_arrow

    ranked = (prepped.map_batches(tag_mod, batch_format="pandas")
              .groupby("_kb")
              .map_groups(lambda g: _to_arrow(rank_apply(g.to_pandas())),
                          batch_format="pyarrow"))

    def to_chunks(df: pd.DataFrame) -> pd.DataFrame:
        rn = df.rn.to_numpy()
        home = rn // _SN_CHUNK
        own = df.assign(_ck=home, _own=True)
        spill_mask = (rn % _SN_CHUNK) >= _SN_CHUNK - SN_WINDOW
        spill = df[spill_mask].assign(
            _ck=home[spill_mask] + 1, _own=False)
        return pd.concat([own, spill], ignore_index=True)

    def _empty_pairs() -> pd.DataFrame:
        return pd.DataFrame({
            "doc_a": pd.Series(dtype=np.int64),
            "doc_b": pd.Series(dtype=np.int64),
            "rank_gap": pd.Series(dtype=np.int64),
            "lev": pd.Series(dtype=np.int64)})

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        outs = [_empty_pairs()]
        for _ck, g in df.groupby("_ck"):
            g = g.sort_values("rn", kind="mergesort")
            ids = g.doc_id.to_numpy()
            k64 = g.k64.to_numpy()
            own = g._own.to_numpy()
            for gap in range(1, SN_WINDOW + 1):
                if len(g) <= gap:
                    break
                a_ids, b_ids = ids[:-gap], ids[gap:]
                keep = own[gap:]          # pair owned by higher rank
                if not keep.any():
                    continue
                sa = [str(s) for s in k64[:-gap][keep]]
                sb = [str(s) for s in k64[gap:][keep]]
                lev = _lev_pairs(sa, sb)
                hit = lev <= SN_LEV_MAX
                if hit.any():
                    outs.append(pd.DataFrame({
                        "doc_a": a_ids[keep][hit].astype(np.int64),
                        "doc_b": b_ids[keep][hit].astype(np.int64),
                        "rank_gap": np.full(int(hit.sum()), gap,
                                            dtype=np.int64),
                        "lev": lev[hit].astype(np.int64)}))
        return pd.concat(outs, ignore_index=True)

    def chunk_tag(df: pd.DataFrame) -> pd.DataFrame:
        df = to_chunks(df)
        return df.assign(
            _kb=(df._ck.to_numpy() % chunk_buckets).astype(np.int64))

    out = (ranked.map_batches(chunk_tag, batch_format="pandas")
           .groupby("_kb")
           .map_groups(lambda g: _to_arrow(
               pairs(g.to_pandas().drop(columns=["_kb"]))),
               batch_format="pyarrow"))
    # typed empty seed: keeps the final distributed sort schema-stable
    # even if every block comes back empty (embed_neardup precedent).
    # Ray's groupby still emits zero-column blocks for its own empty
    # shuffle partitions (input blocks > distinct keys) — harmless
    # under the seed, but the "new schema" warning it logs is Ray's,
    # not a row-loss bug here (value-equality pinned at 3 scales).
    seed = rd.from_arrow(_empty_table(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()),
         ("rank_gap", pa.int64()), ("lev", pa.int64())]))
    return seed.union(out).sort(["doc_a", "doc_b"])


SQL_SORTED_NEIGHBORHOOD = f"""
WITH r AS (
  SELECT doc_id,
         substring(text, 1, {SN_VERIFY_CHARS}) AS k64,
         ROW_NUMBER() OVER (ORDER BY substring(text, 1, 8), doc_id)
           AS rn
  FROM documents
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(b.rn - a.rn AS BIGINT) AS rank_gap,
       CAST(levenshtein(a.k64, b.k64) AS BIGINT) AS lev
FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND {SN_WINDOW}
WHERE levenshtein(a.k64, b.k64) <= {SN_LEV_MAX}
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------- cluster composition
def q_dup_cluster_sizes(sf_dir: str) -> pd.DataFrame:
    """Near-dup cluster size histogram — the composition report that
    turns the CC labeling into a dedup POLICY input (how much of the
    corpus sits in 2-doc pairs vs giant templates decides keep-one vs
    keep-none).  Chains q_dedup_clusters, so the memoized shingle edge
    set and the CC run are shared with the rest of the dedup family.

    Shape at scale: ONE cluster-bucketed exchange of (cluster_id)
    partial counts finishes exact per-cluster sizes; the histogram is
    per-batch (size, count) partials with a driver merge bounded by the
    number of DISTINCT sizes (<= corpus max cluster size, in practice
    tens)."""
    from .grouping import bucketed_group_apply

    cl = q_dedup_clusters(sf_dir).map_batches(
        lambda b: b.select(["cluster_id"]), batch_format="pyarrow")

    def per_cluster(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("cluster_id", as_index=False).size()
               .rename(columns={"size": "sz"}))
        return out.astype({"cluster_id": np.int64, "sz": np.int64})

    sizes = bucketed_group_apply(cl, ["cluster_id"], per_cluster,
                                 num_buckets=16)

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("sz", as_index=False)
               .agg(n_clusters=("cluster_id", "size"),
                    n_docs=("sz", "sum")))
        return out.astype(np.int64)

    parts = sizes.map_batches(hist, batch_format="pandas").to_pandas()
    out = (parts.groupby("sz", as_index=False)
           .agg(n_clusters=("n_clusters", "sum"),
                n_docs=("n_docs", "sum"))
           .rename(columns={"sz": "cluster_size"})
           .astype(np.int64))
    return out.sort_values("cluster_size").reset_index(drop=True)


SQL_DUP_CLUSTER_SIZES = f"""
WITH c AS ({SQL_DEDUP_CLUSTERS}),
s AS (SELECT cluster_id, COUNT(*) AS sz FROM c GROUP BY 1)
SELECT CAST(sz AS BIGINT) AS cluster_size,
       CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(sz) AS BIGINT) AS n_docs
FROM s GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------- incremental ingest
def q_ingest_dedup_new(sf_dir: str) -> rd.Dataset:
    """Incremental-ingestion dedup: treat the doc_id midpoint as the
    boundary between the EXISTING corpus and a NEW ingest batch, and
    report each new doc that NEAR-duplicates (3-shingle jaccard >=0.8)
    some existing doc, with the earliest existing match as the
    canonical keeper — the production shape where every nightly batch
    dedups against the accumulated corpus, not just against itself.

    Shape at scale: reuses the memoized verified shingle edge set (no
    recompute — the same table backs shingle_pairs, dedup_clusters,
    clean_corpus and minhash); the boundary filter and the per-new-doc
    keeper argmin are per-batch combiners + ONE new-doc-bucketed
    exchange of (new_doc_id, min_keeper, cnt) partials."""
    import pyarrow.parquet as _pqt

    from .grouping import bucketed_group_apply

    docs_path = f"{sf_dir}/documents.parquet"
    n_docs = _pqt.read_metadata(docs_path).num_rows
    cut = n_docs // 2            # doc_id < cut = existing corpus

    edges = shingle_edges_cached(sf_dir).map_batches(
        lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow")

    def cross_partial(df: pd.DataFrame) -> pd.DataFrame:
        # pairs are (doc_a < doc_b); old ids all < cut, so the existing
        # side of a cross pair is always doc_a
        m = (df.doc_a.to_numpy() < cut) & (df.doc_b.to_numpy() >= cut)
        d = df[m]
        out = (d.groupby("doc_b", as_index=False)
               .agg(keeper_doc_id=("doc_a", "min"),
                    n_existing_matches=("doc_a", "size")))
        return out.rename(columns={"doc_b": "new_doc_id"}) \
                  .astype(np.int64)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("new_doc_id", as_index=False)
                .agg(keeper_doc_id=("keeper_doc_id", "min"),
                     n_existing_matches=("n_existing_matches", "sum"))
                .astype(np.int64))

    return bucketed_group_apply(
        edges.map_batches(cross_partial, batch_format="pandas"),
        ["new_doc_id"], combine, num_buckets=16).sort("new_doc_id")


# wraps the exact shingle-pair oracle so both stay in lockstep
SQL_INGEST_DEDUP_NEW = f"""
WITH p AS ({SQL_SHINGLE_PAIRS}),
b AS (SELECT (SELECT COUNT(*) FROM documents) // 2 AS cut)
SELECT p.doc_b AS new_doc_id,
       CAST(MIN(p.doc_a) AS BIGINT) AS keeper_doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_existing_matches
FROM p, b
WHERE p.doc_a < b.cut AND p.doc_b >= b.cut
GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------- approximate-dedup scoring
def q_neardup_quality(sf_dir: str) -> pd.DataFrame:
    """Precision/recall of the MinHash+LSH near-dup pairs against the
    EXACT shingle-jaccard >=0.8 ground truth — the quality scorecard an
    approximate dedup needs before it may replace the exact join at
    scale.  Previously only a pytest pin; as a registered query the
    number lands in the driver gate artifacts.

    Shape at scale: both pair sets come from the per-process memoized
    shingle machinery (no recompute); ONE pair-bucketed cogroup counts
    |truth|, |pred|, |hit| per bucket (equal pairs co-locate), and the
    driver merge is buckets x 1 rows."""
    from .grouping import bucketed_cogroup

    true_pairs = shingle_edges_cached(sf_dir).map_batches(
        lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow")
    pred_pairs = minhash_lsh_pairs(_docs(sf_dir), jaccard_milli=800,
                                   sets=sets_cached(sf_dir, "shingle")
                                   ).map_batches(
        lambda b: b.select(["doc_a", "doc_b"]), batch_format="pyarrow")

    def stats(tf: pd.DataFrame, pf: pd.DataFrame) -> pd.DataFrame:
        tset = set(zip(tf.doc_a.to_numpy(), tf.doc_b.to_numpy()))
        pset = set(zip(pf.doc_a.to_numpy(), pf.doc_b.to_numpy()))
        return pd.DataFrame({
            "n_true": [np.int64(len(tset))],
            "n_pred": [np.int64(len(pset))],
            "n_hit": [np.int64(len(tset & pset))]})

    parts = bucketed_cogroup(true_pairs, pred_pairs,
                             ["doc_a", "doc_b"], ["doc_a", "doc_b"],
                             stats, num_buckets=16).to_pandas()
    nt, npred, nh = (int(parts.n_true.sum()), int(parts.n_pred.sum()),
                     int(parts.n_hit.sum()))
    return pd.DataFrame({
        "n_true": [nt], "n_pred": [npred], "n_hit": [nh],
        "precision_milli": [(1000 * nh) // npred if npred else -1],
        "recall_milli": [(1000 * nh) // nt if nt else -1],
    }).astype(np.int64)


DEDUP_QUERIES = {
    "exact_dedup": (q_exact_dedup, SQL_EXACT_DEDUP),
    "dup_cluster_sizes": (q_dup_cluster_sizes, SQL_DUP_CLUSTER_SIZES),
    "ingest_dedup_new": (q_ingest_dedup_new, SQL_INGEST_DEDUP_NEW),
    "jaccard_pairs": (q_jaccard_pairs, SQL_JACCARD_PAIRS),
    "shingle_pairs": (q_shingle_pairs, SQL_SHINGLE_PAIRS),
    "dedup_clusters": (q_dedup_clusters, SQL_DEDUP_CLUSTERS),
    "clean_corpus": (q_clean_corpus, SQL_CLEAN_CORPUS),
    "sorted_neighborhood": (q_sorted_neighborhood,
                            SQL_SORTED_NEIGHBORHOOD),
    # LSH recall < 1 ⇒ rows-only driver check; precision/recall pinned
    # against shingle_pairs by tests/test_properties.py
    "minhash_pairs": (q_minhash_pairs, None),
    "simhash_pairs": (q_simhash_pairs, None),   # not SQL-expressible
    "neardup_quality": (q_neardup_quality, None),  # scores an approx op
}
