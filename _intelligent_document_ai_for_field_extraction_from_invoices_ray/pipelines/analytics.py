"""Analytics operator suite — the classic distributed patterns the other
banks don't yet cover, each with an exact DuckDB oracle:

- market-basket co-occurrence (``parts_coordered``): the frequent-pair
  mining shape — per-group pair expansion bounded by group size, then a
  pair-keyed count shuffle.
- window LAG deltas (``event_gaps``): per-key inter-event time gaps.
- SCD type-2 compaction (``user_scd2``): CDC log -> validity intervals
  via gaps-and-islands on value CHANGE (complements ``user_latest_event``
  = type-1 latest-wins in relational.py).
- exact global NTILE (``customer_quartiles``): the distributed total-rank
  primitive — range-partition by value histogram, driver-side prefix
  offsets (bounded by bucket count), per-bucket local rank.
- ordered string_agg of a per-group top-k (``nation_top_names``).
- flat_map explode (``doc_sentences``): one row per sentence with its
  ordinal — no shuffle at all, pure per-batch expansion.
- weighted bottom-k sampling (``weighted_sample``): A-Res-style
  deterministic priorities h(doc)/weight; semilattice per-block bottom-k
  so the exchange is k rows per block.
- k-anonymity audit (``k_anonymity``): privacy QA over quasi-identifier
  groups (complements the PII masker in functions/textnorm.py).

Float discipline matches relational.py: money in exact cents, time in
floored epoch seconds, and the one float column (sampling priority) is a
single IEEE division of two exactly-represented integers — bit-identical
in numpy and DuckDB.

Scale notes are per-operator in the docstrings; nothing here
materializes an unbounded table on the driver — driver-side merges are
bounded by (k x buckets) or fixed key cardinality.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

import ray.data as rd


def _pq(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr) -> np.ndarray:
    return np.round(np.asarray(arr, dtype=np.float64) * 100).astype(np.int64)


def _epoch_s(ts: pd.Series) -> pd.Series:
    """Floored epoch seconds from a timestamp column (matches DuckDB's
    ``CAST(floor(epoch(ts)) AS BIGINT)``)."""
    ns = ts.astype("datetime64[ns]").astype("int64")
    return ns // 1_000_000_000


# --------------------------------------------------- market-basket pairs
def q_parts_coordered(sf_dir: str) -> pd.DataFrame:
    """Frequent part PAIRS across orders (market-basket co-occurrence).

    Shape at scale: pair expansion happens inside an orderkey-bucketed
    group apply, so the emitted exchange is O(sum_g C(|g|, 2)) — bounded
    by per-order line counts (<= 7 in TPC-H), never |parts|^2.  Each
    bucket pre-counts its pairs before the second (pair-keyed) shuffle;
    the final top-100 is a semilattice (per-bucket top-100, <=100 x 16
    rows merged on the driver)."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m.l_partkey_a < m.l_partkey_b]
        out = m.groupby(["l_partkey_a", "l_partkey_b"], as_index=False).agg(
            n_orders=("l_orderkey", "size"))
        return out.rename(columns={"l_partkey_a": "part_a",
                                   "l_partkey_b": "part_b"})

    def top100(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["part_a", "part_b"], as_index=False).agg(
            n_orders=("n_orders", "sum"))
        out = out[out.n_orders >= 2]
        return out.sort_values(["n_orders", "part_a", "part_b"],
                               ascending=[False, True, True]).head(100)

    partial = bucketed_group_apply(ds, ["l_orderkey"], pairs,
                                   num_buckets=16)
    merged = bucketed_group_apply(partial, ["part_a", "part_b"], top100,
                                  num_buckets=16).to_pandas()
    return (merged.sort_values(["n_orders", "part_a", "part_b"],
                               ascending=[False, True, True])
            .head(100).reset_index(drop=True))


SQL_PARTS_COORDERED = """
WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       COUNT(*) AS n_orders
FROM dp a JOIN dp b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2 HAVING COUNT(*) >= 2
ORDER BY n_orders DESC, part_a, part_b LIMIT 100
"""


# ------------------------------------------------------- window LAG gaps
def q_event_gaps(sf_dir: str) -> rd.Dataset:
    """Per-user inter-event gap statistics (windowed LAG).

    One user-bucketed shuffle; the gap computation is a vectorized shift
    per bucket.  Output is one row per user with >= 2 events."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"]).copy()
        df["_s"] = _epoch_s(df.ts)
        gap = df._s - df._s.shift()
        gap[df.user_id != df.user_id.shift()] = np.nan
        df["gap_s"] = gap
        df = df[df.gap_s.notna()]
        out = df.groupby("user_id", as_index=False).agg(
            n_gaps=("gap_s", "size"), max_gap_s=("gap_s", "max"),
            sum_gap_s=("gap_s", "sum"))
        out["max_gap_s"] = out.max_gap_s.astype(np.int64)
        out["sum_gap_s"] = out.sum_gap_s.astype(np.int64)
        return out

    return bucketed_group_apply(ds, ["user_id"], gaps).sort("user_id")


SQL_EVENT_GAPS = """
WITH g AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT)
         - LAG(CAST(floor(epoch(ts)) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
  FROM events)
SELECT user_id, COUNT(*) AS n_gaps,
       CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
       CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s
FROM g WHERE gap_s IS NOT NULL
GROUP BY user_id ORDER BY user_id
"""


# ------------------------------------------------------ SCD2 compaction
def q_user_scd2(sf_dir: str) -> rd.Dataset:
    """Slowly-changing-dimension type-2 compaction of the event log:
    consecutive runs of the same event_type per user become ONE validity
    interval [valid_from_s, valid_to_s) (-1 = still open).  The type-1
    counterpart (latest value wins) is ``user_latest_event``.

    One user-bucketed shuffle; islands, interval bounds and the LEAD to
    the next interval are all vectorized per bucket."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def scd2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"]).copy()
        df["_s"] = _epoch_s(df.ts)
        chg = (df.user_id != df.user_id.shift()) | \
              (df.event_type != df.event_type.shift())
        # global cumsum: chg is True at every user boundary, so islands
        # are unique within the bucket; per-user ordinals re-derived below
        df["island"] = chg.cumsum()
        out = df.groupby(["user_id", "island"], as_index=False).agg(
            event_type=("event_type", "first"),
            valid_from_s=("_s", "min"), n_events=("_s", "size"))
        # per-user 1-based island ordinal + LEAD(valid_from) as valid_to
        out = out.sort_values(["user_id", "valid_from_s", "island"])
        out["island"] = out.groupby("user_id").cumcount() + 1
        nxt = out.groupby("user_id").valid_from_s.shift(-1)
        out["valid_to_s"] = nxt.fillna(-1).astype(np.int64)
        return out[["user_id", "island", "event_type", "valid_from_s",
                    "valid_to_s", "n_events"]]

    return bucketed_group_apply(ds, ["user_id"], scd2).sort(
        ["user_id", "island"])


SQL_USER_SCD2 = """
WITH e AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
              THEN 1 ELSE 0 END AS chg
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM e),
c AS (
  SELECT user_id, CAST(island AS BIGINT) AS island,
         MIN(event_type) AS event_type,
         CAST(floor(epoch(MIN(ts))) AS BIGINT) AS valid_from_s,
         COUNT(*) AS n_events
  FROM s GROUP BY user_id, island)
SELECT user_id, island, event_type, valid_from_s,
       CAST(COALESCE(LEAD(valid_from_s)
              OVER (PARTITION BY user_id ORDER BY island), -1) AS BIGINT)
         AS valid_to_s,
       n_events
FROM c ORDER BY user_id, island
"""


# -------------------------------------------------- exact global NTILE
def q_customer_quartiles(sf_dir: str) -> rd.Dataset:
    """Exact global NTILE(4) over (c_acctbal, c_custkey) — the
    distributed total-order rank primitive.

    Two passes, no global sort: (1) one map_batches computes per-block
    counts + min/max into 64 VALUE-RANGE buckets (driver merge is
    64 x blocks ints); (2) rows route to their range bucket, each bucket
    sorts locally and adds its driver-computed prefix offset — global
    rank without a global sort, then NTILE arithmetic.  Equal values
    land in one bucket by construction so local sort order == global."""
    from .grouping import bucketed_group_apply

    NB = 64
    ds = _pq(sf_dir, "customer", ["c_custkey", "c_acctbal"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"c_custkey": df.c_custkey,
                             "bal_cents": _cents(df.c_acctbal)})

    prepped = ds.map_batches(prep, batch_format="pandas").materialize()

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"lo": [int(df.bal_cents.min())],
                             "hi": [int(df.bal_cents.max())],
                             "n": [len(df)]})

    parts = prepped.map_batches(hist, batch_format="pandas").to_pandas()
    lo, hi = int(parts.lo.min()), int(parts.hi.max())
    width = max(1, (hi - lo + NB) // NB)

    def bucket_of(v: np.ndarray) -> np.ndarray:
        return np.minimum((v - lo) // width, NB - 1).astype(np.int64)

    def bcounts(df: pd.DataFrame) -> pd.DataFrame:
        b = bucket_of(df.bal_cents.to_numpy())
        u, c = np.unique(b, return_counts=True)
        return pd.DataFrame({"b": u, "n": c})

    bc = prepped.map_batches(bcounts, batch_format="pandas").to_pandas()
    counts = np.zeros(NB, dtype=np.int64)
    agg = bc.groupby("b").n.sum()
    counts[agg.index.to_numpy()] = agg.to_numpy()
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    n_total = int(counts.sum())
    size, rem = divmod(n_total, 4)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_rb=bucket_of(df.bal_cents.to_numpy()))

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        # several range buckets may hash-collide into one exchange bucket;
        # rank each range bucket independently (<= 64 groups total)
        outs = []
        cut = rem * (size + 1)
        for rb, g in df.groupby("_rb"):
            g = g.sort_values(["bal_cents", "c_custkey"])
            r = offsets[int(rb)] + np.arange(len(g), dtype=np.int64)
            quart = np.where(r < cut, r // (size + 1),
                             rem + (r - cut) // max(size, 1)) + 1
            outs.append(pd.DataFrame({"c_custkey": g.c_custkey,
                                      "bal_cents": g.bal_cents,
                                      "quartile": quart.astype(np.int64)}))
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(
        prepped.map_batches(tag, batch_format="pandas"), ["_rb"],
        rank_bucket, num_buckets=NB).sort("c_custkey")


SQL_CUSTOMER_QUARTILES = """
SELECT c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents,
       CAST(NTILE(4) OVER (ORDER BY CAST(round(c_acctbal*100) AS BIGINT),
                           c_custkey) AS BIGINT) AS quartile
FROM customer ORDER BY c_custkey
"""


# --------------------------------------- ordered string_agg of top-k
def q_nation_top_names(sf_dir: str) -> pd.DataFrame:
    """Per-nation comma-joined names of the top-3 customers by balance —
    ordered string aggregation over a per-group top-k.

    Top-3 is a semilattice: each batch keeps <= 3 rows per nation before
    the (25-key) merge, so the exchange is 3 x 25 x blocks rows; the
    nation-name join is a 25-row broadcast dict."""
    import pyarrow.parquet as pq

    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey",
                                  "c_acctbal"])

    def top3(df: pd.DataFrame) -> pd.DataFrame:
        if "bal_cents" not in df.columns:
            df = df.assign(bal_cents=_cents(df.c_acctbal))
        df = df.sort_values(["c_nationkey", "bal_cents", "c_custkey"],
                            ascending=[True, False, True])
        keep = df.groupby("c_nationkey").cumcount() < 3
        return df.loc[keep, ["c_nationkey", "c_custkey", "c_name",
                             "bal_cents"]]

    merged = bucketed_group_apply(
        ds.map_batches(top3, batch_format="pandas"), ["c_nationkey"],
        top3, num_buckets=8).to_pandas()

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_name"]).to_pandas()
    merged = merged.sort_values(["c_nationkey", "bal_cents", "c_custkey"],
                                ascending=[True, False, True])
    agg = merged.groupby("c_nationkey", as_index=False).agg(
        top_names=("c_name", lambda s: ",".join(s)))
    out = agg.merge(nat, left_on="c_nationkey", right_on="n_nationkey")
    return (out[["n_name", "top_names"]]
            .sort_values("n_name").reset_index(drop=True))


SQL_NATION_TOP_NAMES = """
WITH r AS (
  SELECT c_nationkey, c_name,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY CAST(round(c_acctbal*100) AS BIGINT)
                                     DESC, c_custkey) AS rn
  FROM customer)
SELECT n_name, string_agg(c_name, ',' ORDER BY rn) AS top_names
FROM r JOIN nation ON n_nationkey = c_nationkey
WHERE rn <= 3 GROUP BY n_name ORDER BY n_name
"""


# ------------------------------------------------------ flat_map explode
def q_doc_sentences(sf_dir: str) -> rd.Dataset:
    """Sentence explode: one output row per delimited piece with its
    1-based ordinal — the flat_map expansion shape.  Zero shuffle: the
    explode is a per-batch vectorized operation and output blocks stay
    proportional to input blocks.  The synthetic corpus has no
    punctuation, so the word ``the`` serves as the deterministic
    pseudo-sentence boundary (~2.5 pieces per doc)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "text"])

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        out = (df[["doc_id"]].assign(sent=df.text.str.split(" the "))
               .explode("sent"))
        out["sent_idx"] = (out.groupby("doc_id").cumcount() + 1
                           ).astype(np.int64)
        out = out[out.sent.str.len() > 0]
        out["sent_len"] = out.sent.str.len().astype(np.int64)
        return out[["doc_id", "sent_idx", "sent", "sent_len"]]

    return ds.map_batches(explode, batch_format="pandas").sort(
        ["doc_id", "sent_idx"])


SQL_DOC_SENTENCES = """
SELECT doc_id, CAST(i AS BIGINT) AS sent_idx, sent,
       CAST(len(sent) AS BIGINT) AS sent_len
FROM (SELECT doc_id, unnest(parts) AS sent,
             generate_subscripts(parts, 1) AS i
      FROM (SELECT doc_id, string_split(text, ' the ') AS parts
            FROM documents))
WHERE len(sent) > 0 ORDER BY doc_id, sent_idx
"""


# --------------------------------------------- weighted bottom-k sample
def q_weighted_sample(sf_dir: str) -> pd.DataFrame:
    """Deterministic weighted sampling (A-Res shape): priority =
    hash(doc_id)/weight, keep the 20 smallest — longer docs (weight =
    n_chars) are proportionally likelier to be kept.  The hash is the
    first 60 bits of md5 (exactly representable in a double) and the
    priority is ONE IEEE division of two exact integers, so numpy and
    DuckDB agree bit-for-bit.

    Per-block bottom-20 semilattice, then one single-bucket merge — the
    exchange is 20 rows per block, block-count-independent driver load."""
    from .grouping import bucketed_group_apply

    K = 20
    ds = _pq(sf_dir, "documents", ["doc_id", "n_chars"])

    def bottomk(df: pd.DataFrame) -> pd.DataFrame:
        if "prio" not in df.columns:
            hv = np.array([int(hashlib.md5(str(d).encode()).hexdigest()[:15],
                               16) for d in df.doc_id], dtype=np.int64)
            df = df.assign(hv=hv,
                           prio=hv.astype(np.float64)
                           / df.n_chars.to_numpy(np.float64))
        df = df.assign(_k=np.int64(0))
        return df.sort_values(["prio", "doc_id"]).head(K)

    out = bucketed_group_apply(
        ds.map_batches(bottomk, batch_format="pandas"), ["_k"], bottomk,
        num_buckets=1).to_pandas()
    return (out.sort_values(["prio", "doc_id"]).head(K)
            [["doc_id", "n_chars", "hv", "prio"]].reset_index(drop=True))


SQL_WEIGHTED_SAMPLE = """
SELECT doc_id, n_chars, hv, CAST(hv AS DOUBLE) / n_chars AS prio
FROM (SELECT doc_id, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                  AS BIGINT) AS hv
      FROM documents)
ORDER BY prio, doc_id LIMIT 20
"""


# ------------------------------------------------------ k-anonymity audit
def q_k_anonymity(sf_dir: str) -> pd.DataFrame:
    """k-anonymity audit over the quasi-identifier (segment, nation,
    $1000-balance bucket): every group with its size and whether it
    meets k=8 — the aggregate privacy QA a PII pipeline runs before
    release (the row-level masker is ``pii_mask``).

    Key cardinality is fixed (5 x 25 x 11), so a per-batch combiner +
    one tiny groupby suffices; output size is data-independent."""
    from .grouping import bucketed_group_apply

    K = 8
    ds = _pq(sf_dir, "customer", ["c_mktsegment", "c_nationkey",
                                  "c_acctbal"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.assign(bal_bucket=_cents(df.c_acctbal) // 100_000)
        out = g.groupby(["c_mktsegment", "c_nationkey", "bal_bucket"],
                        as_index=False).agg(cnt=("c_acctbal", "size"))
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["c_mktsegment", "c_nationkey", "bal_bucket"],
                         as_index=False).agg(cnt=("cnt", "sum"))
        out["k_anonymous"] = (out.cnt >= K).astype(np.int64)
        return out

    out = bucketed_group_apply(
        ds.map_batches(part, batch_format="pandas"),
        ["c_mktsegment", "c_nationkey", "bal_bucket"], merge,
        num_buckets=8).to_pandas()
    return (out.sort_values(["c_mktsegment", "c_nationkey", "bal_bucket"])
            .reset_index(drop=True))


SQL_K_ANONYMITY = """
SELECT c_mktsegment, c_nationkey,
       CAST(floor(CAST(round(c_acctbal*100) AS BIGINT) / 100000)
            AS BIGINT) AS bal_bucket,
       COUNT(*) AS cnt,
       CAST(CASE WHEN COUNT(*) >= 8 THEN 1 ELSE 0 END AS BIGINT)
         AS k_anonymous
FROM customer GROUP BY 1, 2, 3
ORDER BY c_mktsegment, c_nationkey, bal_bucket
"""


# ------------------------------------------------- deep multi-join (Q5)
REV_REGION = "ASIA"
REV_FROM = "1997-01-01"
REV_TO = "1998-01-01"


def q_regional_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5-shaped deep join: revenue per nation for one region where
    the supplying nation equals the customer nation —
    lineitem ⋈ orders ⋈ customer ⋈ supplier (+ broadcast nation/region).

    Distributed shape: the two FIXED-cardinality dims (region 5 rows,
    nation 25 — constants of the schema, not the scale factor) are read
    driver-side and broadcast as a nationkey set / name map; customer
    rows prune to the region's nations at the scan.  The three
    SCALE-side joins are each a :func:`bucketed_cogroup` (orders×customer
    on custkey, lineitem×that on orderkey, result×supplier on suppkey) —
    neither side of any of them ever lands on the driver.  The final
    exchange is per-bucket (nationkey, n, rev) partials: the driver
    merge is ≤ |region's nations| × buckets rows."""
    import pyarrow.parquet as pq

    from .grouping import bucketed_cogroup

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkey = int(reg.loc[reg.r_name == REV_REGION, "r_regionkey"].iloc[0])
    nat = nat[nat.n_regionkey == rkey]
    nation_keys = np.sort(nat.n_nationkey.to_numpy().astype(np.int64))
    name_of = dict(zip(nat.n_nationkey.astype(np.int64), nat.n_name))

    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def prune_cust(df: pd.DataFrame) -> pd.DataFrame:
        nk = df.c_nationkey.to_numpy().astype(np.int64)
        keep = np.isin(nk, nation_keys)
        return pd.DataFrame({"c_custkey": df.c_custkey.to_numpy()[keep],
                             "c_nationkey": nk[keep]})

    cust = cust.map_batches(prune_cust, batch_format="pandas")

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    lo = np.datetime64(REV_FROM)
    hi = np.datetime64(REV_TO)

    def prune_orders(df: pd.DataFrame) -> pd.DataFrame:
        d = df.o_orderdate.to_numpy().astype("datetime64[ns]")
        keep = (d >= lo) & (d < hi)
        return pd.DataFrame({"o_orderkey": df.o_orderkey.to_numpy()[keep],
                             "o_custkey": df.o_custkey.to_numpy()[keep]})

    orders = orders.map_batches(prune_orders, batch_format="pandas")

    def join_oc(o: pd.DataFrame, c: pd.DataFrame) -> pd.DataFrame:
        m = o.merge(c, left_on="o_custkey", right_on="c_custkey")
        return m[["o_orderkey", "c_nationkey"]]

    oc = bucketed_cogroup(orders, cust, ["o_custkey"], ["c_custkey"],
                          join_oc, num_buckets=16)

    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    def prep_li(df: pd.DataFrame) -> pd.DataFrame:
        rev = _cents(df.l_extendedprice) * (100 - _cents(df.l_discount))
        return pd.DataFrame({"l_orderkey": df.l_orderkey,
                             "l_suppkey": df.l_suppkey, "rev": rev})

    def join_lo(l: pd.DataFrame, o: pd.DataFrame) -> pd.DataFrame:
        m = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        return m[["l_suppkey", "c_nationkey", "rev"]]

    los = bucketed_cogroup(li.map_batches(prep_li, batch_format="pandas"),
                           oc, ["l_orderkey"], ["o_orderkey"],
                           join_lo, num_buckets=16)

    sup = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def join_ls(l: pd.DataFrame, s: pd.DataFrame) -> pd.DataFrame:
        m = l.merge(s, left_on="l_suppkey", right_on="s_suppkey")
        m = m[m.c_nationkey.to_numpy().astype(np.int64)
              == m.s_nationkey.to_numpy().astype(np.int64)]
        out = m.groupby("c_nationkey", as_index=False).agg(
            n_items=("rev", "size"), revenue_scaled=("rev", "sum"))
        return pd.DataFrame({
            "nationkey": out.c_nationkey.to_numpy().astype(np.int64),
            "n_items": out.n_items.to_numpy().astype(np.int64),
            "revenue_scaled": out.revenue_scaled.to_numpy().astype(np.int64)})

    parts = bucketed_cogroup(los, sup, ["l_suppkey"], ["s_suppkey"],
                             join_ls, num_buckets=16).to_pandas()
    merged = parts.groupby("nationkey", as_index=False).agg(
        n_items=("n_items", "sum"), revenue_scaled=("revenue_scaled", "sum"))
    merged["n_name"] = merged.nationkey.map(name_of)
    merged = merged.sort_values(["revenue_scaled", "n_name"],
                                ascending=[False, True])
    return merged[["n_name", "revenue_scaled",
                   "n_items"]].reset_index(drop=True)


SQL_REGIONAL_REVENUE = f"""
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT)))
            AS BIGINT) AS revenue_scaled,
       COUNT(*) AS n_items
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = '{REV_REGION}'
  AND o_orderdate >= DATE '{REV_FROM}' AND o_orderdate < DATE '{REV_TO}'
GROUP BY n_name ORDER BY revenue_scaled DESC, n_name
"""


# ------------------------------------------- window-frame moving sum
def q_orders_moving_sum(sf_dir: str) -> rd.Dataset:
    """Per-customer 3-order moving spend (ROWS BETWEEN 2 PRECEDING AND
    CURRENT ROW over (o_orderdate, o_orderkey)) — the bounded-frame
    window-function shape, complementing the unbounded running sum
    (``running_spend``) and LAG (``event_gaps``).

    One custkey-bucketed shuffle; the rolling sum is one vectorized
    pandas pass per bucket (a frame of width k never needs more than the
    bucket's own rows — no cross-bucket carry exists because a customer
    never straddles buckets)."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "orders",
             ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])

    def win(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"]).copy()
        df["price_cents"] = _cents(df.o_totalprice)
        mov = (df.groupby("o_custkey").price_cents
               .rolling(3, min_periods=1).sum()
               .reset_index(level=0, drop=True))
        df["moving3_cents"] = mov.astype(np.int64)
        return df[["o_custkey", "o_orderkey", "price_cents",
                   "moving3_cents"]]

    return bucketed_group_apply(ds, ["o_custkey"], win).sort(
        ["o_custkey", "o_orderkey"])


SQL_ORDERS_MOVING_SUM = """
SELECT o_custkey, o_orderkey,
       CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS moving3_cents
FROM orders ORDER BY o_custkey, o_orderkey
"""


# ------------------------------------------- interval-overlap counting
def q_session_overlap(sf_dir: str) -> rd.Dataset:
    """Hourly session concurrency: how many user sessions (30-min
    inactivity gap, same boundary rule as ``user_sessions``) are ACTIVE
    in each hour bucket — the interval-overlap / range-count shape
    (intervals × time grid), done as bounded replication instead of an
    interval join.

    Stage 1 (user-bucketed): gaps-and-islands sessionization, then each
    session expands to its covered hour buckets with ``np.repeat`` —
    replication is bounded by session duration / 1 h + 1 — and
    pre-counts within the bucket.  Stage 2: ONE hour-bucketed shuffle
    sums the partials.  No interval ever meets another interval."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])
    gap_ns = 30 * 60 * 1_000_000_000

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"]).copy()
        ns = df.ts.astype("datetime64[ns]").astype("int64")
        df["_ns"] = ns
        brk = (df.user_id != df.user_id.shift()) | \
              (df._ns - df._ns.shift() > gap_ns)
        df["_sid"] = brk.cumsum()
        sess = df.groupby("_sid").agg(lo=("_ns", "min"), hi=("_ns", "max"))
        h0 = (sess.lo.to_numpy() // 1_000_000_000) // 3600
        h1 = (sess.hi.to_numpy() // 1_000_000_000) // 3600
        reps = (h1 - h0 + 1).astype(np.int64)
        starts = np.repeat(h0, reps)
        offs = np.arange(int(reps.sum()), dtype=np.int64) \
            - np.repeat(np.cumsum(reps) - reps, reps)
        hours = starts + offs
        u, c = np.unique(hours, return_counts=True)
        return pd.DataFrame({"hour_bucket": u,
                             "n_sessions": c.astype(np.int64)})

    partial = bucketed_group_apply(ds, ["user_id"], expand, num_buckets=16)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("hour_bucket", as_index=False).agg(
            n_sessions=("n_sessions", "sum"))

    return bucketed_group_apply(partial, ["hour_bucket"], total,
                                num_buckets=8).sort("hour_bucket")


SQL_SESSION_OVERLAP = """
WITH e AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), sess AS (
  SELECT user_id, sid,
         CAST(floor(epoch(MIN(ts))/3600) AS BIGINT) AS h0,
         CAST(floor(epoch(MAX(ts))/3600) AS BIGINT) AS h1
  FROM s GROUP BY user_id, sid
), hours AS (
  SELECT unnest(generate_series(h0, h1)) AS hour_bucket FROM sess
)
SELECT hour_bucket, COUNT(*) AS n_sessions
FROM hours GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------- snapshot reconciliation
def q_snapshot_diff(sf_dir: str) -> rd.Dataset:
    """Snapshot diff / reconciliation: latest event_type per user at the
    corpus MIDPOINT vs at the END, emitting added / changed users — the
    table-compare shape (CDC backfill audits, replica reconciliation).
    Latest-wins tie-break is (ts, event_id), same as
    ``user_latest_event``.

    Pass 1 computes the midpoint cutoff from per-block (min, max) epoch
    partials (driver merge = 2 ints × blocks).  Pass 2 is ONE
    user-bucketed shuffle where each bucket derives both snapshots
    vectorized and diffs them locally — a user's entire history is in
    one bucket, so no cross-snapshot join ever shuffles.  Emits Arrow
    directly with a typed nullable ``old_type`` so empty/all-added
    buckets cannot fork the union schema."""
    import pyarrow as pa

    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def mm(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy()  # epoch µs
        s = us // 1_000_000
        return pa.table({"lo": pa.array([int(s.min())], pa.int64()),
                         "hi": pa.array([int(s.max())], pa.int64())})

    parts = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    # epochs are positive, so integer // == floor on both sides
    cutoff = (int(parts.lo.min()) + int(parts.hi.max())) // 2

    def diff(df: pd.DataFrame) -> pa.Table:
        df = df.sort_values(["user_id", "ts", "event_id"]).copy()
        df["_s"] = _epoch_s(df.ts)
        new = df.groupby("user_id").event_type.last()
        old = df[df._s <= cutoff].groupby("user_id").event_type.last()
        out = new.to_frame("new_type").join(old.to_frame("old_type"),
                                            how="left")
        added = out.old_type.isna()
        keep = added | (out.old_type != out.new_type)
        out = out[keep]
        old_vals = [None if pd.isna(v) else str(v) for v in out.old_type]
        return pa.table({
            "user_id": pa.array(out.index.to_numpy().astype(np.int64),
                                pa.int64()),
            "old_type": pa.array(old_vals, pa.string()),
            "new_type": pa.array([str(v) for v in out.new_type],
                                 pa.string()),
            "change": pa.array(["added" if a else "changed"
                                for a in added[keep]], pa.string())})

    return bucketed_group_apply(ds, ["user_id"], diff).sort("user_id")


SQL_SNAPSHOT_DIFF = """
WITH s AS (
  SELECT user_id, event_type, ts, event_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events
), b AS (
  SELECT (MIN(es) + MAX(es)) // 2 AS cutoff FROM s
), old AS (
  SELECT user_id, event_type FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM s, b WHERE es <= cutoff) WHERE rn = 1
), new AS (
  SELECT user_id, event_type FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM s) WHERE rn = 1
)
SELECT n.user_id, o.event_type AS old_type, n.event_type AS new_type,
       CASE WHEN o.user_id IS NULL THEN 'added' ELSE 'changed' END AS change
FROM new n LEFT JOIN old o USING (user_id)
WHERE o.user_id IS NULL OR o.event_type <> n.event_type
ORDER BY user_id
"""


# ------------------------------------------------ inequality measure
def q_priority_gini(sf_dir: str) -> pd.DataFrame:
    """Exact Gini coefficient of order value per order priority — the
    order-statistics aggregate: mean absolute difference over all pairs,
    computed in O(n log n) as the rank-weighted sum
    Σ (2·rank − n − 1)·x₍rank₎ of the SORTED values (no pair
    enumeration).  All integers: the pair-difference sum and total are
    exact; gini_milli = 1000·absdiff // (2·n·sum).

    One priority-bucketed shuffle (a priority's rows co-locate), sort +
    vectorized weight inside the bucket; output is one row per priority
    — bounded by attribute cardinality."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def gini(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for p, g in df.groupby("o_orderpriority", sort=False):
            x = np.sort(_cents(g.o_totalprice))
            n = len(x)
            rk = np.arange(1, n + 1, dtype=np.int64)
            absdiff = int(((2 * rk - n - 1) * x).sum())
            s = int(x.sum())
            rows.append((p, n, s, absdiff,
                         (1000 * absdiff) // (2 * n * s)))
        out = pd.DataFrame(rows, columns=["o_orderpriority", "n_orders",
                                          "total_cents", "absdiff_cents",
                                          "gini_milli"])
        for c in out.columns[1:]:
            out[c] = out[c].astype(np.int64)
        return out

    out = bucketed_group_apply(ds, ["o_orderpriority"], gini,
                               num_buckets=4).to_pandas()
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_PRIORITY_GINI = """
WITH v AS (
  SELECT o_orderpriority,
         CAST(round(o_totalprice*100) AS BIGINT) AS c
  FROM orders
), r AS (
  SELECT o_orderpriority, c,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY c) AS rk,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM v
)
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(c) AS BIGINT) AS total_cents,
       CAST(SUM((2*rk - n - 1) * c) AS BIGINT) AS absdiff_cents,
       CAST((1000 * SUM((2*rk - n - 1) * c))
            // (2 * COUNT(*) * SUM(c)) AS BIGINT) AS gini_milli
FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ------------------------------------------- resample + interpolation
def q_events_interpolated(sf_dir: str) -> rd.Dataset:
    """Hourly resampling of each user's value series with exact LINEAR
    interpolation — the two-sided asof shape (last event ≤ t AND first
    event > t), distinct from the one-sided asof join and the zero-fill
    densification.  Grid = every whole hour inside [first, last] event
    second per user; at tied seconds the latest (ts, event_id) value
    wins; past the last known point the value holds.

    One user-bucketed shuffle.  Both asof lookups for ALL grid points
    of ALL users in the bucket are TWO global ``searchsorted`` calls via
    the composite user-key trick (no per-user loop); interpolation is
    integer floor arithmetic — the SQL oracle reproduces floor (not
    DuckDB's truncating ``//``, which differs on negative slopes) with
    the modulo identity a − ((a % b) + b) % b."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def interp(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "user_id": pd.Series(dtype=np.int64),
            "hour": pd.Series(dtype=np.int64),
            "value_interp_cents": pd.Series(dtype=np.int64)})
        if df.empty:
            return empty
        df = df.sort_values(["user_id", "ts", "event_id"])
        es = _epoch_s(df.ts).to_numpy()
        v = _cents(df.value)
        codes, uniq = pd.factorize(df.user_id, sort=False)
        codes = codes.astype(np.int64)
        uniq = np.asarray(uniq)
        big = np.int64(int(es.max()) + 3601)
        keys = codes * big + es
        # collapse tied (user, second) rows to the LATEST event_id's
        # value (the sort puts it last) — matches the oracle's ee CTE;
        # without this the "next" lookup could land on a tied second
        keep = np.append(keys[1:] != keys[:-1], True)
        codes, es, v, keys = codes[keep], es[keep], v[keep], keys[keep]
        # per-user grid bounds
        starts = np.searchsorted(codes, np.arange(len(uniq)))
        ends = np.append(starts[1:], len(es))
        first = es[starts]
        last = es[ends - 1]
        # ceil via (x + 3599) // 3600: positive ints, so trunc == floor
        # on both sides (DuckDB's // truncates; -(-x//3600) would differ)
        h0 = (first + 3599) // 3600
        h1 = last // 3600
        reps = np.maximum(h1 - h0 + 1, 0)
        total = int(reps.sum())
        if total == 0:
            return empty
        gcode = np.repeat(np.arange(len(uniq), dtype=np.int64), reps)
        offs = (np.arange(total, dtype=np.int64)
                - np.repeat(np.cumsum(reps) - reps, reps))
        gh = np.repeat(h0, reps) + offs
        gs = gh * 3600
        gkeys = gcode * big + gs
        prev = np.searchsorted(keys, gkeys, side="right") - 1
        nxt = prev + 1
        t0, v0 = es[prev], v[prev]
        has_next = (nxt < len(es)) & (codes[np.minimum(nxt, len(es) - 1)]
                                      == gcode)
        safe = np.where(has_next, nxt, prev)
        t1, v1 = es[safe], v[safe]
        dt = np.where(has_next, t1 - t0, 1)
        val = np.where(has_next,
                       v0 + (v1 - v0) * (gs - t0) // dt, v0)
        return pd.DataFrame({
            "user_id": uniq[gcode].astype(np.int64),
            "hour": gh.astype(np.int64),
            "value_interp_cents": val.astype(np.int64)})

    return bucketed_group_apply(ds, ["user_id"], interp,
                                num_buckets=16).sort(["user_id", "hour"])


SQL_EVENTS_INTERPOLATED = """
WITH e AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(round(value*100) AS BIGINT) AS v, event_id
  FROM events
), ee AS (
  SELECT user_id, es, v FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, es
                                 ORDER BY event_id DESC) AS rn
    FROM e) WHERE rn = 1
), span AS (
  SELECT user_id,
         (MIN(es) + 3599) // 3600 AS h0, MAX(es) // 3600 AS h1
  FROM e GROUP BY 1
), grid AS (
  SELECT user_id, unnest(generate_series(h0, h1)) AS h
  FROM span WHERE h1 >= h0
), p AS (
  SELECT g.user_id, g.h, g.h * 3600 AS gs,
    (SELECT es FROM ee WHERE ee.user_id = g.user_id
       AND ee.es <= g.h*3600 ORDER BY es DESC LIMIT 1) AS t0,
    (SELECT v FROM ee WHERE ee.user_id = g.user_id
       AND ee.es <= g.h*3600 ORDER BY es DESC LIMIT 1) AS v0,
    (SELECT es FROM ee WHERE ee.user_id = g.user_id
       AND ee.es > g.h*3600 ORDER BY es ASC LIMIT 1) AS t1,
    (SELECT v FROM ee WHERE ee.user_id = g.user_id
       AND ee.es > g.h*3600 ORDER BY es ASC LIMIT 1) AS v1
  FROM grid g
)
SELECT user_id, h AS hour,
  CAST(CASE WHEN t1 IS NULL THEN v0
       ELSE v0 + (
         (v1 - v0) * (gs - t0)
         - (((((v1 - v0) * (gs - t0)) % (t1 - t0)) + (t1 - t0))
            % (t1 - t0))
       ) // (t1 - t0)
  END AS BIGINT) AS value_interp_cents
FROM p ORDER BY user_id, hour
"""


# --------------------------------------------- per-row percentile rank
def q_event_percentile(sf_dir: str) -> rd.Dataset:
    """Exact per-event percentile (CUME_DIST) of its value within its
    event type, in integer milli-units — the per-row global-rank join:
    every ROW gets a statistic of its whole GROUP'S distribution.

    SQL's CUME_DIST() returns a float (n_le/n — hash-fragile), so both
    sides compute milli = 1000·count(≤ v) // n in integers.  One
    type-bucketed shuffle: a type's rows and its value histogram live in
    the same bucket, so the rank lookup is one vectorized searchsorted
    against the bucket-local sorted values — no second exchange."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "event_type", "value"])

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["c"] = _cents(df.value)
        outs = []
        for t, g in df.groupby("event_type", sort=False):
            vs = np.sort(g.c.to_numpy())
            n = len(vs)
            le = np.searchsorted(vs, g.c.to_numpy(), side="right")
            outs.append(pd.DataFrame({
                "event_id": g.event_id.to_numpy(),
                "event_type": t,
                "value_cents": g.c.to_numpy(),
                "pctile_milli": (1000 * le) // n}))
        return pd.concat(outs, ignore_index=True)

    return bucketed_group_apply(ds, ["event_type"], rank,
                                num_buckets=8).sort("event_id")


SQL_EVENT_PERCENTILE = """
WITH v AS (
  SELECT event_id, event_type,
         CAST(round(value*100) AS BIGINT) AS value_cents
  FROM events
), r AS (
  SELECT event_id, event_type, value_cents,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY value_cents
                        RANGE BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW) AS n_le,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM v
)
SELECT event_id, event_type, value_cents,
       CAST((1000 * n_le) // n AS BIGINT) AS pctile_milli
FROM r ORDER BY event_id
"""


# ------------------------------------------- largest-remainder split
def q_order_allocation(sf_dir: str) -> rd.Dataset:
    """Largest-remainder apportionment: split each order's header total
    (cents) across its line items proportionally to extended price, with
    the classic integer discipline — floor shares, then +1 cent to the
    items with the largest remainders (ties to the lowest line number) —
    so every order's allocations sum EXACTLY to its header total.  The
    constrained-integer-allocation shape (monetary splits, quota
    apportionment).

    One orderkey-bucketed cogroup of lineitem with orders; inside a
    bucket the floor shares, remainders, per-order remainder ranks and
    the +1 assignment are all vectorized (sort + cumcount)."""
    from .grouping import bucketed_cogroup

    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_linenumber", "l_extendedprice"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def alloc(l: pd.DataFrame, o: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame({
                "l_orderkey": pd.Series(dtype=np.int64),
                "l_linenumber": pd.Series(dtype=np.int64),
                "alloc_cents": pd.Series(dtype=np.int64)})
        m = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
        m["ext"] = _cents(m.l_extendedprice)
        m["price"] = _cents(m.o_totalprice)
        tot = m.groupby("l_orderkey").ext.transform("sum")
        share = m.price * m.ext
        m["base"] = share // tot
        m["rem"] = share % tot
        leftover = (m.price
                    - m.groupby("l_orderkey").base.transform("sum"))
        # ext joins the tie-break: equal (rem, linenumber) rows with
        # different ext would otherwise be assigned the extra cent
        # engine-vs-SQL-arbitrarily
        m = m.sort_values(["l_orderkey", "rem", "l_linenumber", "ext"],
                          ascending=[True, False, True, True])
        rank = m.groupby("l_orderkey").cumcount() + 1
        m["alloc_cents"] = (m.base
                            + (rank <= leftover.loc[m.index])
                            .astype(np.int64))
        out = m[["l_orderkey", "l_linenumber", "alloc_cents"]].copy()
        out["l_linenumber"] = out.l_linenumber.astype(np.int64)
        out["alloc_cents"] = out.alloc_cents.astype(np.int64)
        return out

    return bucketed_cogroup(li, orders, ["l_orderkey"], ["o_orderkey"],
                            alloc, num_buckets=16).sort(
        ["l_orderkey", "l_linenumber"])


SQL_ORDER_ALLOCATION = """
WITH m AS (
  SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
         CAST(round(l.l_extendedprice*100) AS BIGINT) AS ext,
         CAST(round(o.o_totalprice*100) AS BIGINT) AS price
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
), s AS (
  SELECT *, SUM(ext) OVER (PARTITION BY l_orderkey) AS tot FROM m
), b AS (
  SELECT *, (price * ext) // tot AS base,
         (price * ext) % tot AS rem
  FROM s
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey
                            ORDER BY rem DESC, l_linenumber, ext) AS rk,
         price - SUM(base) OVER (PARTITION BY l_orderkey) AS leftover
  FROM b
)
SELECT l_orderkey, l_linenumber,
       CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
         AS alloc_cents
FROM r ORDER BY l_orderkey, l_linenumber
"""


# ------------------------------------------------ median abs deviation
def q_events_mad(sf_dir: str) -> pd.DataFrame:
    """Exact median absolute deviation of event value per type — the
    TWO-DEPENDENT-PASS robust-statistic shape (a statistic of a
    statistic): pass 2's input depends on pass 1's result, so the
    operator is inherently a barrier, unlike the single-pass winsorized
    mean.

    Both passes ship (type, cents) histogram partials (bounded by the
    VALUE RANGE per type, not the corpus); medians use the inverted-CDF
    integer rank ceil(n/2) = (n+1)//2.  The per-type medians (a
    fixed-cardinality dict) broadcast into pass 2's deviation kernel."""
    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def hist1(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"t": df.event_type, "c": _cents(df.value)})
        return d.groupby(["t", "c"]).size().reset_index(name="cnt")

    def fold(h: pd.DataFrame) -> dict[str, tuple[int, int]]:
        out = {}
        for t, g in h.groupby("t"):
            g = (g.groupby("c", as_index=False).cnt.sum()
                 .sort_values("c"))
            n = int(g.cnt.sum())
            cum = g.cnt.cumsum().to_numpy()
            out[t] = (n, int(g.c.to_numpy()[
                np.searchsorted(cum, (n + 1) // 2)]))
        return out

    med = fold(ds.map_batches(hist1, batch_format="pandas").to_pandas())

    def hist2(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df.value)
        m = df.event_type.map({t: v[1] for t, v in med.items()}).to_numpy()
        d = pd.DataFrame({"t": df.event_type, "c": np.abs(c - m)})
        return d.groupby(["t", "c"]).size().reset_index(name="cnt")

    mad = fold(ds.map_batches(hist2, batch_format="pandas").to_pandas())
    rows = [(t, med[t][0], med[t][1], mad[t][1]) for t in sorted(med)]
    out = pd.DataFrame(rows, columns=["event_type", "n_events",
                                      "median_cents", "mad_cents"])
    for c in ("n_events", "median_cents", "mad_cents"):
        out[c] = out[c].astype(np.int64)
    return out


SQL_EVENTS_MAD = """
WITH v AS (
  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events
), n AS (
  SELECT event_type, COUNT(*) AS n FROM v GROUP BY 1
), h AS (
  SELECT event_type, c, COUNT(*) AS cnt FROM v GROUP BY 1, 2
), cdf AS (
  SELECT event_type, c,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum
  FROM h
), med AS (
  SELECT n.event_type,
         (SELECT MIN(c) FROM cdf
          WHERE cdf.event_type = n.event_type
            AND cum >= (n.n + 1) // 2) AS med
  FROM n
), d AS (
  SELECT v.event_type, abs(v.c - med.med) AS dev
  FROM v JOIN med USING (event_type)
), hd AS (
  SELECT event_type, dev, COUNT(*) AS cnt FROM d GROUP BY 1, 2
), cdfd AS (
  SELECT event_type, dev,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev) AS cum
  FROM hd
)
SELECT n.event_type, n.n AS n_events,
       (SELECT med FROM med WHERE med.event_type = n.event_type)
         AS median_cents,
       (SELECT MIN(dev) FROM cdfd
        WHERE cdfd.event_type = n.event_type
          AND cum >= (n.n + 1) // 2) AS mad_cents
FROM n ORDER BY 1
"""


# ------------------------------------------------ rolling active users
def q_rolling_wau(sf_dir: str) -> rd.Dataset:
    """Rolling weekly-active-users: for every day D (that any trailing
    window reaches), the number of DISTINCT users active in [D-6, D] —
    the sliding-distinct shape (WAU/MAU dashboards), which plain window
    functions cannot express because COUNT(DISTINCT) doesn't decompose
    over sliding frames.

    Exact with zero distinct shuffles: ONE user-bucketed pass dedups
    (user, day), replicates each pair to its 7 target days (bounded
    expansion), dedups (user, target) — all within the user's bucket, so
    each user contributes ≤1 per target day and the per-bucket counts
    are exact distinct-user partials; ONE day-bucketed sum finishes."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"user_id": df.user_id,
                          "day": _epoch_s(df.ts) // 86400}).drop_duplicates()
        rep = pd.concat([d.assign(day=d.day + i) for i in range(7)],
                        ignore_index=True).drop_duplicates()
        out = rep.groupby("day", as_index=False).agg(wau=("user_id", "size"))
        out["wau"] = out.wau.astype(np.int64)
        return out

    partial = bucketed_group_apply(ds, ["user_id"], per_user,
                                   num_buckets=16)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("day", as_index=False).agg(wau=("wau", "sum"))

    return bucketed_group_apply(partial, ["day"], total,
                                num_buckets=8).sort("day")


SQL_ROLLING_WAU = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)/86400) AS BIGINT) AS day
  FROM events
), t AS (
  SELECT DISTINCT user_id, day + i AS day
  FROM d, (SELECT unnest(generate_series(0, 6)) AS i) i
)
SELECT day, COUNT(*) AS wau FROM t GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------ robust statistics
def q_value_winsor_mean(sf_dir: str) -> pd.DataFrame:
    """Winsorized mean of event value: clamp to the exact [p5, p95]
    (inverted-CDF quantiles, same statistic as events_value_quantiles)
    then the exact clamped mean — the two-pass robust-statistics shape
    (outlier-insensitive KPIs).

    Pass 1 builds a global cents histogram from per-batch partials
    (exchange bounded by DISTINCT cent values — the value range, not the
    corpus) and derives the thresholds with INTEGER rank arithmetic
    (ceil(n/20) = (n+19)//20 — float 0.05·n would misrank at n divisible
    by 20: 0.05 is not binary-exact).  Pass 2 clamps per batch and ships
    (sum, count) partials.  Mean in milli-cents, half-up integer
    division."""
    ds = _pq(sf_dir, "events", ["value"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        u, c = np.unique(_cents(df.value), return_counts=True)
        return pd.DataFrame({"c": u, "cnt": c.astype(np.int64)})

    h = (ds.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby("c", as_index=False).cnt.sum().sort_values("c"))
    n = int(h.cnt.sum())
    cum = h.cnt.cumsum().to_numpy()
    cs = h.c.to_numpy()
    lo = int(cs[np.searchsorted(cum, (n + 19) // 20)])
    hi = int(cs[np.searchsorted(cum, (19 * n + 19) // 20)])

    def clamp(df: pd.DataFrame) -> pd.DataFrame:
        wc = np.clip(_cents(df.value), lo, hi)
        return pd.DataFrame({"s": [int(wc.sum())], "k": [len(wc)]})

    parts = ds.map_batches(clamp, batch_format="pandas").to_pandas()
    s, k = int(parts.s.sum()), int(parts.k.sum())
    return pd.DataFrame({
        "n_events": pd.Series([k], dtype=np.int64),
        "lo_cents": pd.Series([lo], dtype=np.int64),
        "hi_cents": pd.Series([hi], dtype=np.int64),
        "winsor_sum_cents": pd.Series([s], dtype=np.int64),
        "winsor_mean_milli": pd.Series([(2000 * s + k) // (2 * k)],
                                       dtype=np.int64)})


SQL_VALUE_WINSOR_MEAN = """
WITH v AS (SELECT CAST(round(value*100) AS BIGINT) AS c FROM events),
n AS (SELECT COUNT(*) AS n FROM v),
h AS (SELECT c, COUNT(*) AS cnt FROM v GROUP BY c),
cdf AS (SELECT c, SUM(cnt) OVER (ORDER BY c) AS cum FROM h),
b AS (SELECT
  (SELECT MIN(c) FROM cdf, n WHERE cum >= (n.n + 19) // 20) AS lo,
  (SELECT MIN(c) FROM cdf, n WHERE cum >= (19 * n.n + 19) // 20) AS hi),
w AS (SELECT LEAST(GREATEST(v.c, b.lo), b.hi) AS wc FROM v, b)
SELECT COUNT(*) AS n_events,
       (SELECT lo FROM b) AS lo_cents,
       (SELECT hi FROM b) AS hi_cents,
       CAST(SUM(wc) AS BIGINT) AS winsor_sum_cents,
       CAST((2000 * SUM(wc) + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
         AS winsor_mean_milli
FROM w
"""


# ------------------------------------------------ table profiling
_PROFILE_COLS = ["o_custkey", "o_orderdate", "o_orderkey",
                 "o_orderpriority", "o_orderstatus", "o_totalprice"]


def q_orders_profile(sf_dir: str) -> pd.DataFrame:
    """ANALYZE-style table profile: exact row count, null count and
    DISTINCT count for every orders column — the statistics pass a
    query planner runs before choosing join orders.

    Exact NDV for ALL columns in ONE combined exchange: each batch
    emits its DISTINCT (col_id, value-key) pairs (keys injective per
    column: ints/cents/epoch as decimal strings), a (col, key)-bucketed
    dedup counts survivors per column — a value's pair lands in exactly
    one bucket, so per-bucket distinct counts are additive — and the
    driver merges |cols| × buckets partials.  Null counts ride along as
    per-batch (col, n_null) rows."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "orders", _PROFILE_COLS)

    def keys_of(df: pd.DataFrame) -> dict[str, pd.Series]:
        return {
            "o_orderkey": df.o_orderkey.map(str),
            "o_custkey": df.o_custkey.map(str),
            "o_orderstatus": df.o_orderstatus,
            "o_orderpriority": df.o_orderpriority,
            "o_orderdate": pd.Series(
                df.o_orderdate.astype("datetime64[ns]").astype("int64")
            ).map(str),
            "o_totalprice": pd.Series(_cents(df.o_totalprice)).map(str),
        }

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols, keys = [], []
        for col, sval in keys_of(df).items():
            u = pd.unique(sval.dropna())
            cols.extend([col] * len(u))
            keys.extend(u)
        return pd.DataFrame({"col_name": cols, "sval": keys})

    def ndv_part(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        out = d.groupby("col_name", as_index=False).agg(
            nd=("sval", "size"))
        out["nd"] = out.nd.astype(np.int64)
        return out

    nd = (bucketed_group_apply(
        ds.map_batches(pairs, batch_format="pandas"),
        ["col_name", "sval"], ndv_part, num_buckets=16).to_pandas()
        .groupby("col_name", as_index=False).nd.sum())

    def nulls(df: pd.DataFrame) -> pd.DataFrame:
        rows = [(c, int(df[c].isna().sum()), len(df))
                for c in _PROFILE_COLS]
        return pd.DataFrame(rows, columns=["col_name", "nn", "nr"])

    nl = (ds.map_batches(nulls, batch_format="pandas").to_pandas()
          .groupby("col_name", as_index=False).agg(nn=("nn", "sum"),
                                                   nr=("nr", "sum")))
    out = nl.merge(nd, on="col_name")
    return pd.DataFrame({
        "col_name": out.col_name,
        "n_rows": out.nr.astype(np.int64),
        "n_nulls": out.nn.astype(np.int64),
        "n_distinct": out.nd.astype(np.int64),
    }).sort_values("col_name").reset_index(drop=True)


SQL_ORDERS_PROFILE = """
SELECT 'o_custkey' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(o_custkey) AS n_nulls,
       COUNT(DISTINCT o_custkey) AS n_distinct FROM orders
UNION ALL
SELECT 'o_orderdate', COUNT(*), COUNT(*) - COUNT(o_orderdate),
       COUNT(DISTINCT o_orderdate) FROM orders
UNION ALL
SELECT 'o_orderkey', COUNT(*), COUNT(*) - COUNT(o_orderkey),
       COUNT(DISTINCT o_orderkey) FROM orders
UNION ALL
SELECT 'o_orderpriority', COUNT(*), COUNT(*) - COUNT(o_orderpriority),
       COUNT(DISTINCT o_orderpriority) FROM orders
UNION ALL
SELECT 'o_orderstatus', COUNT(*), COUNT(*) - COUNT(o_orderstatus),
       COUNT(DISTINCT o_orderstatus) FROM orders
UNION ALL
SELECT 'o_totalprice', COUNT(*), COUNT(*) - COUNT(o_totalprice),
       COUNT(DISTINCT CAST(round(o_totalprice*100) AS BIGINT)) FROM orders
ORDER BY col_name
"""


# ----------------------------------------------------- grouped mode
def q_user_top_type(sf_dir: str) -> rd.Dataset:
    """Most frequent event_type per user (grouped MODE), deterministic
    tie-break (higher count, then lexicographically smaller type).

    One user-bucketed shuffle: a user's rows never straddle buckets, so
    count + argmax are exact inside the bucket; output is one row per
    user."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def mode(df: pd.DataFrame) -> pd.DataFrame:
        c = df.groupby(["user_id", "event_type"], as_index=False).size()
        c = c.sort_values(["user_id", "size", "event_type"],
                          ascending=[True, False, True])
        top = c.groupby("user_id", as_index=False).first()
        top = top.rename(columns={"size": "n_events"})
        top["n_events"] = top.n_events.astype(np.int64)
        return top[["user_id", "event_type", "n_events"]]

    return bucketed_group_apply(ds, ["user_id"], mode).sort("user_id")


SQL_USER_TOP_TYPE = """
SELECT user_id, event_type, n_events FROM (
  SELECT user_id, event_type, COUNT(*) AS n_events,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS rn
  FROM events GROUP BY user_id, event_type)
WHERE rn = 1 ORDER BY user_id
"""


# -------------------------------------------- reconciliation audit
def q_order_balance_audit(sf_dir: str) -> pd.DataFrame:
    """Cross-table balance audit: each order's header total vs the sum
    of its line items, top-100 discrepancies — the reconciliation sweep
    a finance pipeline runs after ingest.

    lineitem pre-aggregates per orderkey INSIDE each batch before the
    one orderkey-bucketed cogroup with orders (LEFT: itemless orders
    audit at items=0); each bucket emits only its top-100 by
    (|diff| desc, orderkey), so the driver merge is ≤ 100 × buckets."""
    from .grouping import bucketed_cogroup

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def li_part(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"l_orderkey": df.l_orderkey,
                          "c": _cents(df.l_extendedprice)})
        return d.groupby("l_orderkey", as_index=False).agg(
            items_cents=("c", "sum"))

    def audit(o: pd.DataFrame, l: pd.DataFrame) -> pd.DataFrame:
        items = l.groupby("l_orderkey", as_index=False).agg(
            items_cents=("items_cents", "sum"))
        m = o.merge(items, left_on="o_orderkey", right_on="l_orderkey",
                    how="left")
        price = _cents(m.o_totalprice)
        items_c = m.items_cents.fillna(0).astype(np.int64).to_numpy()
        out = pd.DataFrame({"o_orderkey": m.o_orderkey,
                            "price_cents": price,
                            "items_cents": items_c,
                            "diff_cents": price - items_c})
        out["_a"] = out.diff_cents.abs()
        out = out.sort_values(["_a", "o_orderkey"],
                              ascending=[False, True]).head(100)
        return out.drop(columns=["_a"])

    parts = bucketed_cogroup(orders, li.map_batches(li_part,
                                                    batch_format="pandas"),
                             ["o_orderkey"], ["l_orderkey"], audit,
                             num_buckets=16).to_pandas()
    parts["_a"] = parts.diff_cents.abs()
    parts = parts.sort_values(["_a", "o_orderkey"],
                              ascending=[False, True]).head(100)
    return parts.drop(columns=["_a"]).reset_index(drop=True)


SQL_ORDER_BALANCE_AUDIT = """
WITH li AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
           AS items_cents
  FROM lineitem GROUP BY 1
)
SELECT o.o_orderkey,
       CAST(round(o.o_totalprice*100) AS BIGINT) AS price_cents,
       CAST(COALESCE(li.items_cents, 0) AS BIGINT) AS items_cents,
       CAST(round(o.o_totalprice*100) AS BIGINT)
         - CAST(COALESCE(li.items_cents, 0) AS BIGINT) AS diff_cents
FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey
ORDER BY abs(diff_cents) DESC, o.o_orderkey LIMIT 100
"""


# ------------------------------------------------------ CUBE rollup
def q_brand_type_cube(sf_dir: str) -> pd.DataFrame:
    """GROUP BY CUBE(p_brand, p_type) over part counts/retail value —
    all four grouping sets, extending the rollup (``segment_nation_
    rollup``) with the cross term (ALL, type).

    Scale shape identical to the rollup: only the FINEST level
    (brand × type, bounded by attribute cardinalities, not corpus size)
    touches the table — per-batch combiner then one bounded bucketed
    merge; the three coarser sets are derived from the finest aggregate
    driver-side."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "part", ["p_brand", "p_type", "p_retailprice"])

    def part_comb(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"p_brand": df.p_brand, "p_type": df.p_type,
                          "c": _cents(df.p_retailprice)})
        return d.groupby(["p_brand", "p_type"], as_index=False).agg(
            n_parts=("c", "size"), retail_cents=("c", "sum"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["p_brand", "p_type"], as_index=False).agg(
            n_parts=("n_parts", "sum"), retail_cents=("retail_cents", "sum"))

    fine = bucketed_group_apply(
        ds.map_batches(part_comb, batch_format="pandas"),
        ["p_brand", "p_type"], merge, num_buckets=8).to_pandas()

    def lvl(d: pd.DataFrame, by: list[str]) -> pd.DataFrame:
        if by:
            out = d.groupby(by, as_index=False).agg(
                n_parts=("n_parts", "sum"),
                retail_cents=("retail_cents", "sum"))
        else:
            out = pd.DataFrame({"n_parts": [int(d.n_parts.sum())],
                                "retail_cents": [int(d.retail_cents.sum())]})
        for col in ("p_brand", "p_type"):
            if col not in by:
                out[col] = "ALL"
        return out[["p_brand", "p_type", "n_parts", "retail_cents"]]

    cube = pd.concat([fine[["p_brand", "p_type", "n_parts", "retail_cents"]],
                      lvl(fine, ["p_brand"]), lvl(fine, ["p_type"]),
                      lvl(fine, [])], ignore_index=True)
    cube["n_parts"] = cube.n_parts.astype(np.int64)
    cube["retail_cents"] = cube.retail_cents.astype(np.int64)
    return cube.sort_values(["p_brand", "p_type"]).reset_index(drop=True)


SQL_BRAND_TYPE_CUBE = """
SELECT COALESCE(p_brand, 'ALL') AS p_brand,
       COALESCE(p_type, 'ALL') AS p_type,
       COUNT(*) AS n_parts,
       CAST(SUM(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT)
         AS retail_cents
FROM part GROUP BY CUBE(p_brand, p_type)
ORDER BY COALESCE(p_brand, 'ALL'), COALESCE(p_type, 'ALL')
"""


# --------------------------------------------- RANGE-frame trailing sum
def q_events_trailing_1h(sf_dir: str) -> rd.Dataset:
    """Per-event trailing-1-hour spend for the event's user — the
    RANGE (time-based) window frame, which no other operator covers:
    ``orders_moving_sum`` is a ROWS frame, ``events_sliding`` a global
    bucket grid, ``event_gaps`` a LAG.  RANGE peer semantics are kept
    exactly: all events tied on the same floored second are in each
    other's frames regardless of event_id order.

    One user-bucketed shuffle; inside a bucket the frame sums are a
    prefix-cumsum plus two vectorized ``searchsorted`` bounds per row
    (lo = first index ≥ t−3600, hi = last peer of t) — O(n log n) per
    bucket, no per-row Python."""
    from .grouping import bucketed_group_apply

    W = 3600
    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def trail(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "event_id": pd.Series(dtype=np.int64),
                "user_id": pd.Series(dtype=np.int64),
                "es": pd.Series(dtype=np.int64),
                "trail_cents": pd.Series(dtype=np.int64)})
        df = df.sort_values(["user_id", "ts", "event_id"])
        s = _epoch_s(df.ts).to_numpy()
        v = _cents(df.value)
        # one GLOBAL searchsorted for all users: composite key
        # user_code·BIG + rebased_s is monotone over the (user, s) sort
        # and users are BIG apart, so a per-user time bound never crosses
        # into a neighboring user's range
        codes = pd.factorize(df.user_id, sort=False)[0].astype(np.int64)
        s0 = s - s.min()
        big = np.int64(int(s0.max()) + W + 2)
        keys = codes * big + s0
        cum = np.concatenate([[0], np.cumsum(v)])
        lo = np.searchsorted(keys, keys - W, side="left")
        hi = np.searchsorted(keys, keys, side="right")
        return pd.DataFrame({"event_id": df.event_id.to_numpy(),
                             "user_id": df.user_id.to_numpy(),
                             "es": s,
                             "trail_cents": cum[hi] - cum[lo]})

    return bucketed_group_apply(ds, ["user_id"], trail).sort("event_id")


SQL_EVENTS_TRAILING_1H = """
WITH e AS (
  SELECT event_id, user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS es,
         CAST(round(value*100) AS BIGINT) AS v
  FROM events
)
SELECT event_id, user_id, es,
       CAST(SUM(v) OVER (PARTITION BY user_id ORDER BY es
                         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
            AS BIGINT) AS trail_cents
FROM e ORDER BY event_id
"""


# --------------------------------------------- time-weighted average
def q_user_twap(sf_dir: str) -> rd.Dataset:
    """Time-weighted average value per user (TWAP): each event's value
    holds until the user's next event; the average weights by holding
    time — the step-function-integral window shape (position/price
    marking, metering), distinct from the row-frame (orders_moving_sum)
    and LAG (event_gaps) windows.

    One user-bucketed shuffle; ∫v dt is a vectorized shift-multiply per
    bucket.  All integers: values in cents, time in floored epoch
    seconds, the mean as half-up integer division ((2a+b)//(2b) — exact
    on both sides; values are positive so floor == trunc).  Users whose
    events span zero floored seconds carry no holding time and are
    excluded, like single-event users."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def twap(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"]).copy()
        df["_s"] = _epoch_s(df.ts)
        df["v"] = _cents(df.value)
        nxt = df._s.shift(-1)
        same = df.user_id == df.user_id.shift(-1)
        df["dt"] = np.where(same, nxt - df._s, np.nan)
        df = df[df.dt.notna()]
        df["dt"] = df.dt.astype(np.int64)
        out = df.assign(vdt=df.v * df.dt).groupby(
            "user_id", as_index=False).agg(held_s=("dt", "sum"),
                                           vdt=("vdt", "sum"))
        out = out[out.held_s > 0]
        out["twap_cents"] = (2 * out.vdt + out.held_s) // (2 * out.held_s)
        return out[["user_id", "held_s", "vdt", "twap_cents"]]

    return bucketed_group_apply(ds, ["user_id"], twap).sort("user_id")


SQL_USER_TWAP = """
WITH e AS (
  SELECT user_id, CAST(round(value*100) AS BIGINT) AS v,
         CAST(floor(epoch(ts)) AS BIGINT) AS es, ts, event_id
  FROM events
), d AS (
  SELECT user_id, v,
         LEAD(es) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - es AS dt
  FROM e
), a AS (
  SELECT user_id, CAST(SUM(dt) AS BIGINT) AS held_s,
         CAST(SUM(v*dt) AS BIGINT) AS vdt
  FROM d WHERE dt IS NOT NULL GROUP BY user_id
)
SELECT user_id, held_s, vdt,
       CAST((2*vdt + held_s) // (2*held_s) AS BIGINT) AS twap_cents
FROM a WHERE held_s > 0 ORDER BY user_id
"""


# ------------------------------------------------- daily OHLC rollup
def q_events_daily_ohlc(sf_dir: str) -> rd.Dataset:
    """Daily OHLC per event type: open/close = value at the first/last
    event of the (type, day) group by (ts, event_id), plus low / high /
    count / exact-cents sum — the first_value/last_value-by-time rollup
    a streaming engine maintains incrementally.

    The whole state is a SEMILATTICE: (argmin-by-time value, argmax-by-
    time value, min, max, count, sum) partials combine associatively, so
    one map_batches pre-reduces each batch to ≤ (types × days) partial
    rows carrying their arg-timestamps, and ONE small bucketed shuffle
    finishes the reduce — raw events never shuffle."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        us = df.ts.astype("datetime64[ns]").astype("int64") // 1_000
        d = pd.DataFrame({"event_type": df.event_type,
                          "day": (us // 1_000_000) // 86400,
                          "us": us, "eid": df.event_id,
                          "v": _cents(df.value)})
        d = d.sort_values(["event_type", "day", "us", "eid"])
        return d.groupby(["event_type", "day"], as_index=False).agg(
            o_us=("us", "first"), o_eid=("eid", "first"),
            open_cents=("v", "first"),
            c_us=("us", "last"), c_eid=("eid", "last"),
            close_cents=("v", "last"),
            low_cents=("v", "min"), high_cents=("v", "max"),
            n_events=("v", "size"), value_cents=("v", "sum"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        keys = ["event_type", "day"]
        op = (df.sort_values(keys + ["o_us", "o_eid"])
              .groupby(keys, as_index=False).agg(open_cents=("open_cents",
                                                             "first")))
        cl = (df.sort_values(keys + ["c_us", "c_eid"])
              .groupby(keys, as_index=False).agg(close_cents=("close_cents",
                                                              "last")))
        ag = df.groupby(keys, as_index=False).agg(
            low_cents=("low_cents", "min"), high_cents=("high_cents", "max"),
            n_events=("n_events", "sum"), value_cents=("value_cents", "sum"))
        out = op.merge(cl, on=keys).merge(ag, on=keys)
        return out[keys + ["open_cents", "close_cents", "low_cents",
                           "high_cents", "n_events", "value_cents"]]

    return bucketed_group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "day"], merge, num_buckets=8).sort(
        ["event_type", "day"])


SQL_EVENTS_DAILY_OHLC = """
WITH e AS (
  SELECT event_type,
         CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
         CAST(round(value*100) AS BIGINT) AS v, ts, event_id
  FROM events
), w AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type, day
                            ORDER BY ts, event_id) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, day
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT event_type, day,
       CAST(MAX(CASE WHEN rn_a = 1 THEN v END) AS BIGINT) AS open_cents,
       CAST(MAX(CASE WHEN rn_d = 1 THEN v END) AS BIGINT) AS close_cents,
       MIN(v) AS low_cents, MAX(v) AS high_cents,
       COUNT(*) AS n_events, CAST(SUM(v) AS BIGINT) AS value_cents
FROM w GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------------- cohort retention
def q_cohort_retention(sf_dir: str) -> rd.Dataset:
    """Cohort retention matrix: users cohorted by their FIRST active day,
    counted at each later day-offset they were active — the classic
    growth-analytics shape whose hard part at scale is the DISTINCT-user
    count per (cohort, offset) cell.

    Exact without any distinct shuffle: ONE user-bucketed shuffle puts a
    user's whole history in one bucket, where first-day + distinct
    active days are vectorized (sorted drop_duplicates); each user
    contributes exactly one row per (cohort_day, day_offset), so the
    per-bucket counts are already distinct-user partials.  A second
    (cohort, offset)-bucketed sum merges them — exchange bounded by
    cells × buckets, never by users."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"user_id": df.user_id,
                          "day": _epoch_s(df.ts) // 86400})
        d = d.drop_duplicates()
        first = d.groupby("user_id").day.transform("min")
        out = pd.DataFrame({"cohort_day": first, "day_offset": d.day - first})
        return out.groupby(["cohort_day", "day_offset"],
                           as_index=False).agg(n_users=("day_offset", "size"))

    partial = bucketed_group_apply(ds, ["user_id"], per_user,
                                   num_buckets=16)

    def total(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["cohort_day", "day_offset"],
                          as_index=False).agg(n_users=("n_users", "sum"))

    return bucketed_group_apply(partial, ["cohort_day", "day_offset"],
                                total, num_buckets=8).sort(
        ["cohort_day", "day_offset"])


SQL_COHORT_RETENTION = """
WITH d AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)/86400) AS BIGINT) AS day
  FROM events
), c AS (
  SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id
)
SELECT c.cohort_day, d.day - c.cohort_day AS day_offset,
       COUNT(*) AS n_users
FROM d JOIN c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------- Z-order layout clustering
def q_zorder_layout(sf_dir: str) -> pd.DataFrame:
    """Z-order (Morton-curve) layout statistics over events — the
    data-layout-optimization primitive behind multi-dimensional
    clustering (Delta/Iceberg OPTIMIZE ZORDER BY): interleave the low 16
    bits of the two query dimensions (user_id, value cents) so rows
    close in BOTH dimensions land in the same layout block, then report
    per-block min/max zone-map stats — exactly what a scan planner
    prunes on.  At 100 TB this is the write-side operator: compute z,
    ``repartition`` by z-range, write one file per block; here the
    bounded per-block zone maps ARE the output so the oracle can check
    the curve bit-for-bit.

    All integer: cents = floor(value·100) over an exact DOUBLE product
    (both sides), bit interleave is closed-form, one map_batches with an
    in-batch combiner → one zblock-bucketed merge (≤ 4096 blocks)."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy().astype(np.int64)
        cents = np.floor(df["value"].to_numpy(dtype=np.float64)
                         * 100.0).astype(np.int64)
        x = uid % 65536
        y = ((cents % 65536) + 65536) % 65536
        z = np.zeros(len(df), dtype=np.int64)
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        out = pd.DataFrame({"zblock": z >> 20, "user_id": uid,
                            "cents": cents})
        g = out.groupby("zblock", as_index=False).agg(
            n_events=("user_id", "size"),
            min_user=("user_id", "min"), max_user=("user_id", "max"),
            min_cents=("cents", "min"), max_cents=("cents", "max"))
        return g

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("zblock", as_index=False).agg(
            n_events=("n_events", "sum"),
            min_user=("min_user", "min"), max_user=("max_user", "max"),
            min_cents=("min_cents", "min"),
            max_cents=("max_cents", "max"))
        for c in g.columns:
            g[c] = g[c].astype(np.int64)
        return g

    pre = ds.map_batches(lambda b: part(b.to_pandas()),
                         batch_format="pyarrow")
    out = bucketed_group_apply(pre, ["zblock"], merge,
                               num_buckets=16).to_pandas()
    return out.sort_values("zblock").reset_index(drop=True)


def _zorder_sql() -> str:
    xbit = " + ".join(
        f"(((x >> {i}) & 1) << {2 * i})" for i in range(16))
    ybit = " + ".join(
        f"(((y >> {i}) & 1) << {2 * i + 1})" for i in range(16))
    return f"""
WITH v AS (
  SELECT user_id AS uid,
         CAST(floor(value * 100) AS BIGINT) AS cents
  FROM events
), b AS (
  SELECT uid, cents, uid % 65536 AS x,
         ((cents % 65536) + 65536) % 65536 AS y
  FROM v
), z AS (
  SELECT uid, cents, ({xbit} + {ybit}) >> 20 AS zblock FROM b
)
SELECT zblock, COUNT(*) AS n_events,
       MIN(uid) AS min_user, MAX(uid) AS max_user,
       MIN(cents) AS min_cents, MAX(cents) AS max_cents
FROM z GROUP BY zblock ORDER BY zblock
"""


SQL_ZORDER_LAYOUT = _zorder_sql()


# -------------------------------------- watermark / late-data audit
LATE_WM_S = 900           # allowed lateness (15-min watermark)
_LATE_MULT = 1000003      # arrival-order permutation multiplier
_LATE_NB = 64             # contiguous arrival-range chunks


def q_late_events(sf_dir: str) -> pd.DataFrame:
    """Out-of-order / late-data audit — the streaming-ingest QA
    operator: replay the corpus in ARRIVAL order, maintain the running
    event-time high-watermark, and count events arriving more than
    ``LATE_WM_S`` behind it, per event_type (what a Beam/Flink-style
    pipeline must know to size allowed-lateness).  The synthetic
    arrival log is the closed-form permutation
    arr = (event_id·1000003) mod n (ties broken by event_id, so the
    order is total even when the multiplier isn't coprime to n) — the
    oracle replays the identical order.

    The running max over a permuted total order is the distributed
    prefix-scan shape (same as running_spend): pass A computes per-
    arrival-range-chunk maxima (bounded: 64 ints × blocks to the
    driver), the driver prefix-maxes 64 values, pass B re-scans each
    chunk locally with its carry-in watermark and emits per-type
    partials (≤ 64 × |types| rows).  Event times are floored epoch
    seconds; everything stays int64."""
    import pyarrow.parquet as pq

    from .grouping import bucketed_group_apply

    n = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    ds = _pq(sf_dir, "events", ["event_id", "ts", "event_type"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        eid = df.event_id.to_numpy().astype(np.int64)
        arr = (eid * _LATE_MULT) % n
        return pd.DataFrame({
            "event_type": df.event_type,
            "es": _epoch_s(df.ts).to_numpy(),
            "arr": arr,
            "event_id": eid,
            "chunk": (arr * _LATE_NB) // n,
        })

    prepped = ds.map_batches(prep, batch_format="pandas").materialize()

    # pass A: per-chunk event-time maxima (bounded driver merge)
    def cmax(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("chunk", as_index=False)["es"].max()
        return g.rename(columns={"es": "mx"})

    cm = prepped.map_batches(cmax, batch_format="pandas").to_pandas()
    maxima = np.full(_LATE_NB, np.iinfo(np.int64).min, dtype=np.int64)
    agg = cm.groupby("chunk").mx.max()
    maxima[agg.index.to_numpy()] = agg.to_numpy()
    # carry[c] = max event time over all chunks < c
    carry = np.empty(_LATE_NB, dtype=np.int64)
    carry[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(maxima[:-1], out=carry[1:])

    # pass B: per-chunk replay with carry-in watermark
    def replay(df: pd.DataFrame) -> pd.DataFrame:
        outs = [pd.DataFrame({
            "event_type": pd.Series(dtype="string"),
            "n_events": pd.Series(dtype=np.int64),
            "n_late": pd.Series(dtype=np.int64),
            "max_lateness_s": pd.Series(dtype=np.int64)})]
        for ck, g in df.groupby("chunk"):
            g = g.sort_values(["arr", "event_id"], kind="mergesort")
            es = g.es.to_numpy()
            run = np.maximum.accumulate(es)
            wm = np.empty(len(es), dtype=np.int64)
            wm[0] = carry[int(ck)]
            wm[1:] = np.maximum(run[:-1], carry[int(ck)])
            # es + W < wm, NOT es < wm - W: the no-watermark sentinel
            # is int64 min and wm - W would wrap around
            late = es + LATE_WM_S < wm
            lateness = np.where(late, wm - LATE_WM_S - es, 0)
            part = pd.DataFrame({
                "event_type": g.event_type.to_numpy(),
                "one": np.ones(len(es), dtype=np.int64),
                "late": late.astype(np.int64),
                "lateness": lateness.astype(np.int64)})
            a = part.groupby("event_type", as_index=False).agg(
                n_events=("one", "sum"), n_late=("late", "sum"),
                max_lateness_s=("lateness", "max"))
            outs.append(a)
        return pd.concat(outs, ignore_index=True)

    parts = bucketed_group_apply(prepped, ["chunk"], replay,
                                 num_buckets=_LATE_NB).to_pandas()
    out = parts.groupby("event_type", as_index=False).agg(
        n_events=("n_events", "sum"), n_late=("n_late", "sum"),
        max_lateness_s=("max_lateness_s", "max"))
    for c in ["n_events", "n_late", "max_lateness_s"]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_LATE_EVENTS = f"""
WITH nn AS (SELECT COUNT(*) AS c FROM events),
a AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS es,
         (event_id * {_LATE_MULT}) % (SELECT c FROM nn) AS arr,
         event_id
  FROM events
), w AS (
  SELECT event_type, es,
         MAX(es) OVER (ORDER BY arr, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING) AS wm
  FROM a
)
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN es < wm - {LATE_WM_S} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       CAST(COALESCE(MAX(CASE WHEN es < wm - {LATE_WM_S}
                          THEN wm - {LATE_WM_S} - es END), 0)
            AS BIGINT) AS max_lateness_s
FROM w GROUP BY event_type ORDER BY event_type
"""


# -------------------------------------- per-group exact OLS trend
def q_type_trend(sf_dir: str) -> pd.DataFrame:
    """Per-event-type least-squares trend of value over time — grouped
    regression via EXACT integer sufficient statistics (n, Σx, Σy,
    Σxy, Σx²), the textbook distributed-ML aggregation shape: raw rows
    never shuffle, each batch emits one bounded partial per type, and
    the slope is assembled from the merged sums.  x = whole hours since
    the corpus' first event (global min = one bounded pre-pass), y =
    value cents; slope_micro = 10⁶·(nΣxy − ΣxΣy) ÷ (nΣx² − (Σx)²) with
    FLOOR division.

    Int64 audit: per-type partials stay < 5.2e5·n (x ≤ corpus span in
    hours); the final n·Σx² product can exceed int64 for n ≳ 4e6, so
    the 5-row driver combine runs in arbitrary-precision Python ints —
    the distributed exchange never carries the big products.  The SQL
    oracle reproduces floor on a possibly-negative numerator with the
    modulo identity a − ((a%b)+b)%b (DuckDB ``//`` truncates)."""
    ds = _pq(sf_dir, "events", ["ts", "value", "event_type"])

    def premin(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"mn": [int(_epoch_s(df.ts).min())]})

    base = int(ds.map_batches(premin, batch_format="pandas")
               .to_pandas().mn.min())

    def part(df: pd.DataFrame) -> pd.DataFrame:
        x = (_epoch_s(df.ts).to_numpy() - base) // 3600
        y = np.floor(df.value.to_numpy(dtype=np.float64)
                     * 100.0).astype(np.int64)
        p = pd.DataFrame({"event_type": df.event_type, "n": 1,
                          "sx": x, "sy": y, "sxy": x * y, "sxx": x * x})
        return p.groupby("event_type", as_index=False).sum()

    merged = (ds.map_batches(part, batch_format="pandas")
              .to_pandas().groupby("event_type", as_index=False).sum())

    rows = []
    for _, r in merged.iterrows():
        n, sx, sy, sxy, sxx = (int(r.n), int(r.sx), int(r.sy),
                               int(r.sxy), int(r.sxx))
        den = n * sxx - sx * sx
        num = 10**6 * (n * sxy - sx * sy)
        slope = (num - (((num % den) + den) % den)) // den if den else 0
        rows.append((r.event_type, n, sx, sy, sxy, sxx, slope))
    out = pd.DataFrame(rows, columns=["event_type", "n_events", "sum_x",
                                      "sum_y", "sum_xy", "sum_xx",
                                      "slope_micro"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_TYPE_TREND = """
WITH b AS (
  SELECT CAST(min(CAST(floor(epoch(ts)) AS BIGINT)) AS BIGINT) AS base
  FROM events
), v AS (
  SELECT event_type,
         (CAST(floor(epoch(ts)) AS BIGINT) - (SELECT base FROM b))
           // 3600 AS x,
         CAST(floor(value * 100) AS BIGINT) AS y
  FROM events
), s AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM v GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       CAST(sx AS BIGINT) AS sum_x, CAST(sy AS BIGINT) AS sum_y,
       CAST(sxy AS BIGINT) AS sum_xy, CAST(sxx AS BIGINT) AS sum_xx,
       CAST(CASE WHEN n*sxx - sx*sx = 0 THEN 0 ELSE
         (1000000*(n*sxy - sx*sy)
          - ((((1000000*(n*sxy - sx*sy)) % (n*sxx - sx*sx))
              + (n*sxx - sx*sx)) % (n*sxx - sx*sx)))
         // (n*sxx - sx*sx) END AS BIGINT) AS slope_micro
FROM s ORDER BY event_type
"""


# --------------------------------- mergeable quantile sketch (one-pass)
_QSK_CAP = 512                 # per-partial compacted sample size
_QSK_PCTS = (10, 50, 100, 250, 500, 750, 900, 950, 990)  # milli


def _qsk_compact(vals: np.ndarray, wts: np.ndarray,
                 cap: int = _QSK_CAP) -> pd.DataFrame:
    """Compact a weighted value multiset to ≤ cap (value, weight) rows
    by midpoint-stride sampling over the SORTED expansion: each kept
    value represents a contiguous weight-stride of the distribution, so
    per-compaction rank error ≤ stride/2 — deterministic, mergeable,
    and order-insensitive (inputs are sorted first)."""
    order = np.argsort(vals, kind="mergesort")
    vals, wts = vals[order], wts[order]
    total = int(wts.sum())
    if len(vals) <= cap:
        return pd.DataFrame({"v": vals.astype(np.int64),
                             "w": wts.astype(np.int64)})
    stride = -(-total // cap)                 # ceil
    cum = np.cumsum(wts)                      # 1-based end-ranks
    # representative of chunk k = value at rank k*stride + stride//2
    targets = np.arange(stride // 2, total, stride, dtype=np.int64)
    idx = np.searchsorted(cum, targets + 1)
    w = np.full(len(targets), stride, dtype=np.int64)
    w[-1] = total - stride * (len(targets) - 1)
    return pd.DataFrame({"v": vals[idx].astype(np.int64), "w": w})


def q_value_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """Approximate value quantiles via a one-pass MERGEABLE sketch —
    the bounded-memory companion to the exact events_value_quantiles
    (which range-shuffles): each batch compacts its sorted values to
    ≤ 512 weighted rows, a repartition(8) level re-compacts
    (two_level_combine shape, so driver rows are block-count-
    independent), and the driver's final compaction answers any
    quantile.  Deliberately NOT SQL-checked — the sketch is
    approximate by construction; a pytest pins rank error ≤ 1.5 % of n
    against the exact distribution at three scales (the HLL/MinHash
    precedent).  At 100 TB this is the only quantile shape that needs
    neither a shuffle nor corpus-sized state."""
    from .grouping import _to_arrow, two_level_combine

    ds = _pq(sf_dir, "events", ["value"])

    # emit metadata-free Arrow blocks (pandas-built blocks carry a
    # metadata dict whose schema Ray's dedup cannot hash — grouping lore)
    def part(df: pd.DataFrame):
        cents = np.floor(df.value.to_numpy(dtype=np.float64)
                         * 100.0).astype(np.int64)
        return _to_arrow(_qsk_compact(cents,
                                      np.ones(len(cents), dtype=np.int64)))

    def recompact(df: pd.DataFrame):
        return _to_arrow(_qsk_compact(df.v.to_numpy(), df.w.to_numpy()))

    partials = ds.map_batches(part, batch_format="pandas")
    merged = two_level_combine(partials, recompact,
                               num_blocks=8).to_pandas()
    final = _qsk_compact(merged.v.to_numpy(), merged.w.to_numpy())
    v, w = final.v.to_numpy(), final.w.to_numpy()
    cum = np.cumsum(w)
    total = int(cum[-1])
    rows = []
    for pm in _QSK_PCTS:
        target = (total * pm + 999) // 1000    # ceil(p·n), integer
        i = int(np.searchsorted(cum, max(target, 1)))
        rows.append((pm, int(v[min(i, len(v) - 1)])))
    out = pd.DataFrame(rows, columns=["p_milli", "est_cents"])
    out["p_milli"] = out["p_milli"].astype(np.int64)
    out["est_cents"] = out["est_cents"].astype(np.int64)
    return out


# ------------------------------------------- Q3-shaped top-k join
def q_shipping_priority(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q3 shape: BUILDING-segment customers' orders placed before
    a date cutoff, revenue from lineitems shipped after it, top-10 by
    revenue — the canonical selective 3-way join + top-k benchmark
    (Q5-shaped regional_revenue covers the dim-star variant; this is
    the fact-fact variant with predicates on BOTH join sides).

    Money stays exact: revenue = sum of round(ext*100) * (100 - disc%)
    in units of cents/100 (disc is a whole percent in this corpus,
    pinned by order_balance_audit's identical convention).

    Shape at scale: the customer semi-join ships only the filtered
    custkey set through a custkey-bucketed cogroup (never broadcast);
    surviving orders cogroup with pre-aggregated per-order lineitem
    revenue on ONE orderkey-bucketed exchange; top-10 is a semilattice
    (per-bucket top-10, <= 10 x 16 driver rows)."""
    from .grouping import bucketed_cogroup, bucketed_group_apply

    cutoff = np.datetime64("1995-03-15")
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate",
                  "o_orderpriority"])
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def keep_cust(df: pd.DataFrame) -> pd.DataFrame:
        return df[df.c_mktsegment == "BUILDING"][["c_custkey"]]

    def keep_orders(df: pd.DataFrame) -> pd.DataFrame:
        m = df.o_orderdate.to_numpy() < cutoff
        return df[m]

    def semi(of: pd.DataFrame, cf: pd.DataFrame) -> pd.DataFrame:
        out = of[of.o_custkey.isin(cf.c_custkey)]
        return out[["o_orderkey", "o_orderdate", "o_orderpriority"]]

    surviving = bucketed_cogroup(
        orders.map_batches(keep_orders, batch_format="pandas"),
        cust.map_batches(keep_cust, batch_format="pandas"),
        ["o_custkey"], ["c_custkey"], semi, num_buckets=16)

    def li_rev(df: pd.DataFrame) -> pd.DataFrame:
        m = df.l_shipdate.to_numpy() > cutoff
        d = df[m]
        rev = (_cents(d.l_extendedprice)
               * (100 - np.round(d.l_discount.to_numpy() * 100)
                  .astype(np.int64)))
        out = (pd.DataFrame({"l_orderkey": d.l_orderkey, "rev": rev})
               .groupby("l_orderkey", as_index=False).rev.sum())
        return out.astype({"l_orderkey": np.int64, "rev": np.int64})

    rev = li.map_batches(li_rev, batch_format="pandas")

    def join_top(of: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        r = rf.groupby("l_orderkey", as_index=False).rev.sum()
        m = of.merge(r, left_on="o_orderkey", right_on="l_orderkey",
                     how="inner")
        m["o_date_s"] = (m.o_orderdate.astype("datetime64[ns]")
                         .astype("int64") // 10**9)
        out = m[["o_orderkey", "rev", "o_date_s", "o_orderpriority"]]
        return (out.sort_values(["rev", "o_orderkey"],
                                ascending=[False, True]).head(10)
                .astype({"o_orderkey": np.int64, "rev": np.int64,
                         "o_date_s": np.int64}))

    merged = bucketed_cogroup(surviving, rev, ["o_orderkey"],
                              ["l_orderkey"], join_top,
                              num_buckets=16).to_pandas()
    return (merged.sort_values(["rev", "o_orderkey"],
                               ascending=[False, True]).head(10)
            .reset_index(drop=True))


SQL_SHIPPING_PRIORITY = """
SELECT o.o_orderkey,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS rev,
       CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS o_date_s,
       o.o_orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY o.o_orderkey, o_date_s, o.o_orderpriority
ORDER BY rev DESC, o.o_orderkey LIMIT 10
"""


# ----------------------------------------- chi-square drift screen
def q_source_lang_chi2(sf_dir: str) -> rd.Dataset:
    """Pearson chi-square homogeneity of the language distribution per
    SOURCE vs the whole corpus — the drift/imbalance screen a crawl
    mixer runs per upstream feed.  Exact integer arithmetic: each
    cell's (O*n - r*c)^2 // (r*c*n) contribution is summed in Python
    bigints and floor-scaled to milli.

    Shape at scale: per-batch (source, lang) partials (bounded by
    |sources| x |langs| per batch) -> ONE source-bucketed merge with
    the tiny lang-marginal closure."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "documents", ["source", "lang"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["source", "lang"], as_index=False).size()
               .rename(columns={"size": "cnt"}))
        return out.astype({"cnt": np.int64})

    partials = ds.map_batches(part, batch_format="pandas").materialize()

    lg = partials.to_pandas().groupby("lang").cnt.sum().sort_index()
    langs = lg.index.to_numpy()
    col = lg.to_numpy().astype(object)
    n = int(col.sum())

    def chi2(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        cells = df.groupby(["source", "lang"], as_index=False).cnt.sum()
        for src, sub in cells.groupby("source", sort=True):
            obs = np.zeros(len(langs), dtype=object)
            idx = np.searchsorted(langs, sub.lang.to_numpy())
            obs[idx] = sub.cnt.to_numpy().astype(object)
            r = int(sum(obs))
            num = 0
            for o, c in zip(obs, col):
                num += (1000 * (int(o) * n - r * int(c)) ** 2) \
                    // (r * int(c) * n)
            rows.append((src, r, int(num)))
        return pd.DataFrame(rows, columns=[
            "source", "n_docs", "chi2_milli"]).astype(
                {"n_docs": np.int64, "chi2_milli": np.int64})

    return bucketed_group_apply(partials, ["source"], chi2,
                                num_buckets=8).sort("source")


SQL_SOURCE_LANG_CHI2 = """
WITH cell AS (
  SELECT source, lang, COUNT(*) AS o FROM documents GROUP BY 1, 2
), dom AS (SELECT DISTINCT lang FROM documents),
lg AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
tot AS (SELECT COUNT(*) AS n FROM documents),
src AS (SELECT source, COUNT(*) AS r FROM documents GROUP BY 1),
grid AS (
  SELECT s.source, CAST(s.r AS HUGEINT) AS r, d.lang,
         CAST(lg.c AS HUGEINT) AS c,
         CAST(COALESCE(cell.o, 0) AS HUGEINT) AS o,
         CAST(t.n AS HUGEINT) AS n
  FROM src s CROSS JOIN dom d
  JOIN lg ON lg.lang = d.lang CROSS JOIN tot t
  LEFT JOIN cell ON cell.source = s.source AND cell.lang = d.lang
)
SELECT source, CAST(MAX(r) AS BIGINT) AS n_docs,
       CAST(SUM((1000 * (o * n - r * c) * (o * n - r * c))
                // (r * c * n)) AS BIGINT) AS chi2_milli
FROM grid GROUP BY 1 ORDER BY source
"""


# -------------------------------------------------- Pareto coverage
def q_brand_pareto(sf_dir: str) -> rd.Dataset:
    """Per-brand Pareto (80/20) audit over gross part revenue: how many
    of the brand's parts cover >= 80% of its revenue (integer test
    5*cum >= 4*total — no ratio forms), plus the top part's per-mille
    share.  The concentration screen a catalog/assortment pipeline runs.

    Shape at scale: per-batch (partkey, cents) combiners -> ONE
    partkey-bucketed sum -> ONE partkey-bucketed cogroup against the
    part dim for the brand -> ONE brand-bucketed finish (parts are
    vocabulary-sized; the in-bucket sort is per brand).  Raw lineitem
    rows never reshuffle."""
    from .grouping import bucketed_cogroup, bucketed_group_apply

    li = _pq(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
    parts = _pq(sf_dir, "part", ["p_partkey", "p_brand"])

    def part_rev(df: pd.DataFrame) -> pd.DataFrame:
        g = df.assign(rev=_cents(df.l_extendedprice)).groupby(
            "l_partkey", as_index=False).rev.sum()
        return g.astype({"l_partkey": np.int64, "rev": np.int64})

    def rev_merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("l_partkey", as_index=False).rev.sum()
                .astype({"l_partkey": np.int64, "rev": np.int64}))

    per_part = bucketed_group_apply(
        li.map_batches(part_rev, batch_format="pandas"),
        ["l_partkey"], rev_merge, num_buckets=16)

    def attach_brand(rf: pd.DataFrame, pf: pd.DataFrame) -> pd.DataFrame:
        m = rf.merge(pf.rename(columns={"p_partkey": "l_partkey"}),
                     on="l_partkey", how="inner")
        return m[["p_brand", "l_partkey", "rev"]]

    branded = bucketed_cogroup(per_part, parts, ["l_partkey"],
                               ["p_partkey"], attach_brand,
                               num_buckets=16)

    def pareto(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for brand, sub in df.groupby("p_brand", sort=True):
            sub = sub.sort_values(["rev", "l_partkey"],
                                  ascending=[False, True])
            rev = sub.rev.to_numpy()
            tot = int(rev.sum())
            cum = rev.cumsum()
            n80 = int(np.argmax(5 * cum >= 4 * tot)) + 1
            rows.append((brand, len(rev), tot, n80,
                         int(1000 * rev[0]) // tot if tot else 0))
        return pd.DataFrame(rows, columns=[
            "p_brand", "n_parts", "total_cents", "n_parts_80",
            "top_share_milli"]).astype({
                "n_parts": np.int64, "total_cents": np.int64,
                "n_parts_80": np.int64, "top_share_milli": np.int64})

    return bucketed_group_apply(branded, ["p_brand"], pareto,
                                num_buckets=8).sort("p_brand")


SQL_BRAND_PARETO = """
WITH pr AS (
  SELECT l_partkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
              AS BIGINT) AS rev
  FROM lineitem GROUP BY 1
), b AS (
  SELECT p.p_brand, pr.l_partkey, pr.rev
  FROM pr JOIN part p ON p.p_partkey = pr.l_partkey
), c AS (
  SELECT p_brand, rev,
         SUM(rev) OVER (PARTITION BY p_brand
                        ORDER BY rev DESC, l_partkey) AS cum,
         SUM(rev) OVER (PARTITION BY p_brand) AS tot,
         COUNT(*) OVER (PARTITION BY p_brand) AS np,
         MAX(rev) OVER (PARTITION BY p_brand) AS mx,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY rev DESC, l_partkey) AS rn
  FROM b
)
SELECT p_brand, CAST(MAX(np) AS BIGINT) AS n_parts,
       CAST(MAX(tot) AS BIGINT) AS total_cents,
       CAST(MIN(CASE WHEN 5 * cum >= 4 * tot THEN rn END)
            AS BIGINT) AS n_parts_80,
       CAST((1000 * MAX(mx)) // MAX(tot) AS BIGINT) AS top_share_milli
FROM c GROUP BY 1 ORDER BY p_brand
"""


# ----------------------------------------- Q13 count-of-counts
def q_custdist(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q13 shape: the customer-order-count DISTRIBUTION including
    zero-order customers — the filtered LEFT join whose aggregate
    becomes the key of a SECOND aggregate (count-of-counts).  The
    predicate (priority <> '1-URGENT') sits on the JOIN, not a WHERE,
    so excluded orders still leave their customers in the histogram.

    Shape at scale: per-batch (custkey, cnt) combiners -> ONE
    custkey-bucketed LEFT cogroup against the customer key column
    (zero-fill happens in-bucket) that emits each bucket's LOCAL
    count-of-counts, already histogram-sized; the driver merge is
    bounded by max-orders-per-customer x buckets, never customers."""
    from .grouping import bucketed_cogroup

    cust = _pq(sf_dir, "customer", ["c_custkey"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderpriority"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df.o_orderpriority != "1-URGENT"]
        out = (d.groupby("o_custkey", as_index=False).size()
               .rename(columns={"size": "cnt"}))
        return out.astype({"o_custkey": np.int64, "cnt": np.int64})

    parts = orders.map_batches(part, batch_format="pandas")

    def hist(cf: pd.DataFrame, of: pd.DataFrame) -> pd.DataFrame:
        per = of.groupby("o_custkey").cnt.sum()
        c_count = (cf.c_custkey.map(per).fillna(0).astype(np.int64)
                   if len(cf) else pd.Series(dtype=np.int64))
        out = (pd.DataFrame({"c_count": c_count})
               .groupby("c_count", as_index=False).size()
               .rename(columns={"size": "custdist"}))
        return out.astype({"c_count": np.int64, "custdist": np.int64})

    merged = bucketed_cogroup(cust, parts, ["c_custkey"], ["o_custkey"],
                              hist, num_buckets=16).to_pandas()
    out = (merged.groupby("c_count", as_index=False).custdist.sum()
           .astype({"c_count": np.int64, "custdist": np.int64}))
    return (out.sort_values(["custdist", "c_count"], ascending=False)
            .reset_index(drop=True))


SQL_CUSTDIST = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


# ------------------------------------------- gaps-and-islands streaks
def q_user_streaks(sf_dir: str) -> rd.Dataset:
    """Longest consecutive-active-DAY streak per user — the classic
    gaps-and-islands on a distinct-day grid (user_scd2 islands on value
    CHANGE; this islands on calendar ADJACENCY, the retention-streak
    shape product analytics runs).

    Shape at scale: per-batch distinct (user, day) partials (bounded by
    users x days per batch) -> ONE user-bucketed exchange; the island
    scan is one vectorized np.diff per user on its deduped sorted days
    (bounded by the calendar span, not events)."""
    from .grouping import bucketed_group_apply

    ev = _pq(sf_dir, "events", ["user_id", "ts"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "user_id": df.user_id.to_numpy(),
            "d": _epoch_s(df.ts).to_numpy() // 86400}).drop_duplicates()
        return out.astype({"user_id": np.int64, "d": np.int64})

    parts = ev.map_batches(part, batch_format="pandas")

    def streaks(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in df.groupby("user_id", sort=True):
            days = np.unique(g.d.to_numpy())
            brk = np.flatnonzero(np.diff(days) != 1)
            runs = np.diff(np.r_[0, brk + 1, len(days)])
            rows.append((uid, len(days), len(runs), int(runs.max())))
        return pd.DataFrame(rows, columns=[
            "user_id", "n_days", "n_streaks", "max_streak"]).astype(
                np.int64)

    return bucketed_group_apply(parts, ["user_id"], streaks,
                                num_buckets=16).sort("user_id")


SQL_USER_STREAKS = """
WITH days AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d FROM events
), grp AS (
  SELECT user_id, d,
         d - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS g
  FROM days
), runs AS (
  SELECT user_id, g, COUNT(*) AS run FROM grp GROUP BY 1, 2
)
SELECT user_id, CAST(SUM(run) AS BIGINT) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(MAX(run) AS BIGINT) AS max_streak
FROM runs GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------- Q22-shaped anti-join
IDLE_CUTOFF = "2001-01-01"


def q_idle_balance(sf_dir: str) -> rd.Dataset:
    """TPC-H Q22 shape: high-balance customers gone IDLE — balance
    above the global average of positive-balance customers AND no order
    on/after the cutoff — grouped by nation.  The global-scalar
    threshold + anti-join composition.

    Exactness: the average is never formed; the filter cross-multiplies
    (bal_cents * n_pos > sum_pos_cents) in int64 — exact to ~9e16
    customers x max balance.

    Shape at scale: pass 1 is a two-int global (sum, count) reduce;
    pass 2 pre-shrinks orders to distinct recent custkeys per batch,
    then ONE custkey-bucketed LEFT cogroup does the anti-join and emits
    per-nation partials (bounded by nations x buckets)."""
    from .grouping import bucketed_cogroup

    cust = _pq(sf_dir, "customer",
               ["c_custkey", "c_nationkey", "c_acctbal"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderdate"])
    cutoff = np.datetime64(IDLE_CUTOFF)

    def pos_part(df: pd.DataFrame) -> pd.DataFrame:
        bal = _cents(df.c_acctbal)
        keep = bal > 0
        return pd.DataFrame({"s": [int(bal[keep].sum())],
                             "n": [int(keep.sum())]}).astype(np.int64)

    tot = cust.map_batches(pos_part, batch_format="pandas").to_pandas()
    s_pos, n_pos = int(tot.s.sum()), int(tot.n.sum())

    def recent(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df.o_orderdate.to_numpy() >= cutoff]
        return (d[["o_custkey"]].drop_duplicates()
                .astype({"o_custkey": np.int64}))

    active = orders.map_batches(recent, batch_format="pandas")

    def anti(cf: pd.DataFrame, of: pd.DataFrame) -> pd.DataFrame:
        bal = _cents(cf.c_acctbal)
        keep = (bal * n_pos > s_pos) & ~cf.c_custkey.isin(
            set(of.o_custkey)).to_numpy()
        d = pd.DataFrame({"c_nationkey": cf.c_nationkey.to_numpy()[keep],
                          "bal": bal[keep]})
        out = d.groupby("c_nationkey", as_index=False).agg(
            n_cust=("bal", "size"), total_bal_cents=("bal", "sum"))
        return out.astype(np.int64)

    merged = bucketed_cogroup(cust, active, ["c_custkey"], ["o_custkey"],
                              anti, num_buckets=16)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("c_nationkey", as_index=False).agg(
            n_cust=("n_cust", "sum"),
            total_bal_cents=("total_bal_cents", "sum"))
        return out.astype(np.int64)

    from .grouping import bucketed_group_apply
    return bucketed_group_apply(merged, ["c_nationkey"], finish,
                                num_buckets=4).sort("c_nationkey")


SQL_IDLE_BALANCE = f"""
WITH pos AS (
  SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer WHERE CAST(round(c_acctbal * 100) AS BIGINT) > 0
), k AS (
  SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal
  FROM customer, pos
  WHERE CAST(round(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
    AND NOT EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c_custkey
                      AND o.o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}')
)
SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
       CAST(SUM(bal) AS BIGINT) AS total_bal_cents
FROM k GROUP BY 1 ORDER BY c_nationkey
"""


# ------------------------------------------ partition checksums
def q_table_checksum(sf_dir: str) -> rd.Dataset:
    """Order-independent per-bucket content checksums of the orders
    table — the anti-entropy / replica-reconciliation primitive (two
    replicas compare 64 (bucket, n_rows, xor-of-row-hashes) rows
    instead of the table; a mismatched bucket localizes the repair).
    XOR is the merge, so row order, block order and batch boundaries
    are all irrelevant by construction.

    Canonical row form: ints as decimal, money in cents, timestamps in
    floored epoch seconds, '|'-joined — then md5's top 15 hex digits as
    int64 (the repo's established SQL-reproducible hash).

    Shape at scale: per-batch (bucket, xor, cnt) partials -> ONE
    64-row-bounded bucketed merge.  Raw rows never reshuffle."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "orders",
             ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
              "o_orderdate", "o_orderpriority"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(df.o_totalprice)
        es = _epoch_s(df.o_orderdate).to_numpy()
        hv = np.fromiter(
            (int(hashlib.md5(
                f"{k}|{c}|{st}|{ct}|{e}|{pr}".encode()).hexdigest()[:15],
                 16)
             for k, c, st, ct, e, pr in zip(
                 df.o_orderkey.to_numpy(), df.o_custkey.to_numpy(),
                 df.o_orderstatus, cents, es, df.o_orderpriority)),
            dtype=np.int64, count=len(df))
        d = pd.DataFrame({"bucket": df.o_orderkey.to_numpy() % 64,
                          "hv": hv})
        out = d.groupby("bucket", as_index=False).agg(
            n_rows=("hv", "size"),
            checksum=("hv", lambda s: int(np.bitwise_xor.reduce(
                s.to_numpy()))))
        return out.astype(np.int64)

    parts = ds.map_batches(part, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("bucket", as_index=False).agg(
            n_rows=("n_rows", "sum"),
            checksum=("checksum", lambda s: int(np.bitwise_xor.reduce(
                s.to_numpy()))))
        return out.astype(np.int64)

    return bucketed_group_apply(parts, ["bucket"], merge,
                                num_buckets=8).sort("bucket")


SQL_TABLE_CHECKSUM = """
WITH h AS (
  SELECT o_orderkey % 64 AS bucket,
         CAST(('0x' || substr(md5(
             CAST(o_orderkey AS VARCHAR) || '|'
             || CAST(o_custkey AS VARCHAR) || '|' || o_orderstatus || '|'
             || CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)
             || '|'
             || CAST(CAST(floor(epoch(o_orderdate)) AS BIGINT) AS VARCHAR)
             || '|' || o_orderpriority), 1, 15)) AS BIGINT) AS hv
  FROM orders)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(hv) AS BIGINT) AS checksum
FROM h GROUP BY 1 ORDER BY bucket
"""


# ------------------------------------- Q17 decorrelated self-aggregate
def q_small_qty_revenue(sf_dir: str) -> rd.Dataset:
    """TPC-H Q17 shape: revenue locked in SMALL orders — lineitems whose
    quantity is below 20% of their part's average — per brand.  The
    canonical correlated-subquery-over-the-same-fact decorrelation:
    aggregate the fact per key, join the fact back to its own aggregate.

    Exactness: the 0.2·avg threshold is never a float —
    5·q·n_part < sum_q_part cross-multiplied in int64 (quantities are
    integer-valued in this corpus; round() pins the cast).

    Shape at scale: per-batch (partkey, Σq, n) combiners -> ONE
    partkey-bucketed cogroup of the slimmed fact rows (partkey, q,
    cents) against their own stats (the single content-sized exchange
    Q17 fundamentally needs) -> per-part survivors pre-aggregate in
    bucket -> ONE vocabulary-sized cogroup against the part dim for the
    brand -> bounded brand merge."""
    from .grouping import bucketed_cogroup, bucketed_group_apply

    li = _pq(sf_dir, "lineitem",
             ["l_partkey", "l_quantity", "l_extendedprice"])
    parts = _pq(sf_dir, "part", ["p_partkey", "p_brand"])

    def stats_part(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "l_partkey": df.l_partkey.to_numpy(),
            "sq": np.round(df.l_quantity.to_numpy()).astype(np.int64)})
        out = d.groupby("l_partkey", as_index=False).agg(
            sq=("sq", "sum"), n=("sq", "size"))
        return out.astype(np.int64)

    stats = li.map_batches(stats_part, batch_format="pandas")

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": df.l_partkey.to_numpy().astype(np.int64),
            "q": np.round(df.l_quantity.to_numpy()).astype(np.int64),
            "cents": _cents(df.l_extendedprice)})

    rows = li.map_batches(slim, batch_format="pandas")

    def qualify(rf: pd.DataFrame, sf: pd.DataFrame) -> pd.DataFrame:
        s = sf.groupby("l_partkey").agg(sq=("sq", "sum"), n=("n", "sum"))
        sq = rf.l_partkey.map(s.sq).to_numpy()
        n = rf.l_partkey.map(s.n).to_numpy()
        keep = 5 * rf.q.to_numpy() * n < sq
        d = rf[keep]
        out = d.groupby("l_partkey", as_index=False).agg(
            n_items=("cents", "size"), rev_cents=("cents", "sum"))
        return out.astype(np.int64)

    qual = bucketed_cogroup(rows, stats, ["l_partkey"], ["l_partkey"],
                            qualify, num_buckets=16)

    def brandify(qf: pd.DataFrame, pf: pd.DataFrame) -> pd.DataFrame:
        m = qf.merge(pf.rename(columns={"p_partkey": "l_partkey"}),
                     on="l_partkey", how="inner")
        out = m.groupby("p_brand", as_index=False).agg(
            n_items=("n_items", "sum"), rev_cents=("rev_cents", "sum"))
        return out.astype({"n_items": np.int64, "rev_cents": np.int64})

    branded = bucketed_cogroup(qual, parts, ["l_partkey"], ["p_partkey"],
                               brandify, num_buckets=16)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("p_brand", as_index=False).agg(
            n_items=("n_items", "sum"), rev_cents=("rev_cents", "sum"))
        return out.astype({"n_items": np.int64, "rev_cents": np.int64})

    return bucketed_group_apply(branded, ["p_brand"], finish,
                                num_buckets=8).sort("p_brand")


SQL_SMALL_QTY_REVENUE = """
WITH s AS (
  SELECT l_partkey, SUM(CAST(round(l_quantity) AS BIGINT)) AS sq,
         COUNT(*) AS n
  FROM lineitem GROUP BY 1
), q AS (
  SELECT l.l_partkey,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l JOIN s ON s.l_partkey = l.l_partkey
  WHERE 5 * CAST(round(l.l_quantity) AS BIGINT) * s.n < s.sq
)
SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(q.cents) AS BIGINT) AS rev_cents
FROM q JOIN part p ON p.p_partkey = q.l_partkey
GROUP BY 1 ORDER BY p_brand
"""


# ------------------------------------------ referential-integrity audit
_FK_RELATIONS = [
    # (label, child table, child key col, parent table, parent key col)
    ("customer->nation", "customer", "c_nationkey", "nation",
     "n_nationkey"),
    ("lineitem->orders", "lineitem", "l_orderkey", "orders",
     "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier",
     "s_suppkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation",
     "n_nationkey"),
]


def q_fk_audit(sf_dir: str) -> pd.DataFrame:
    """Referential-integrity audit over every foreign key in the star —
    the ingestion-QA gate a warehouse load runs before publishing a
    snapshot (orphan children mean a torn load or an out-of-order CDC
    apply).  Reports child row count, orphan ROW count and orphan KEY
    count per relation; all-zero orphan columns are the assertion, not
    a tautology — the oracle checks the counts, a corrupted load would
    go red.

    Shape at scale: per relation, per-batch (key, cnt) combiners ->
    ONE key-bucketed cogroup against the parent key column; each
    bucket emits ONE (n_rows, orphan_rows, orphan_keys) triple, so the
    driver merge is |relations| x buckets rows.  Child rows never
    reshuffle; parent tables ship key columns only."""
    from .grouping import bucketed_cogroup

    out_rows = []
    for label, child, ckey, parent, pkey in _FK_RELATIONS:
        cds = _pq(sf_dir, child, [ckey])
        pds = _pq(sf_dir, parent, [pkey])

        def part(df: pd.DataFrame, _k=ckey) -> pd.DataFrame:
            out = (df.groupby(_k, as_index=False).size()
                   .rename(columns={"size": "cnt"}))
            return out.astype(np.int64)

        def audit(cf: pd.DataFrame, pf: pd.DataFrame,
                  _k=ckey, _p=pkey) -> pd.DataFrame:
            orphan = ~cf[_k].isin(set(pf[_p])).to_numpy()
            return pd.DataFrame({
                "n_rows": [int(cf.cnt.sum())],
                "orphan_rows": [int(cf.cnt.to_numpy()[orphan].sum())],
                "orphan_keys": [int(orphan.sum())]}).astype(np.int64)

        parts = cds.map_batches(part, batch_format="pandas")
        merged = bucketed_cogroup(parts, pds, [ckey], [pkey], audit,
                                  num_buckets=8).to_pandas()
        out_rows.append((label, int(merged.n_rows.sum()),
                         int(merged.orphan_rows.sum()),
                         int(merged.orphan_keys.sum())))
    out = pd.DataFrame(out_rows, columns=[
        "relation", "n_rows", "orphan_rows", "orphan_keys"])
    return (out.sort_values("relation").reset_index(drop=True)
            .astype({"n_rows": np.int64, "orphan_rows": np.int64,
                     "orphan_keys": np.int64}))


def _fk_audit_sql() -> str:
    selects = []
    for label, child, ckey, parent, pkey in _FK_RELATIONS:
        selects.append(f"""
SELECT '{label}' AS relation,
       CAST((SELECT COUNT(*) FROM {child}) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(*) FROM {child} c WHERE NOT EXISTS
             (SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey}))
            AS BIGINT) AS orphan_rows,
       CAST((SELECT COUNT(DISTINCT {ckey}) FROM {child} c WHERE NOT EXISTS
             (SELECT 1 FROM {parent} p WHERE p.{pkey} = c.{ckey}))
            AS BIGINT) AS orphan_keys""")
    return " UNION ALL ".join(selects) + " ORDER BY relation"


SQL_FK_AUDIT = _fk_audit_sql()


# --------------------------------------------- first-touch attribution
def q_first_touch(sf_dir: str) -> pd.DataFrame:
    """First-touch conversion attribution: each purchase is credited to
    the event TYPE that OPENED its session (30-min inactivity gap, the
    exact user_sessions boundary rule) — the marketing-attribution shape
    product analytics runs on top of sessionization.

    Shape at scale: ONE user-bucketed exchange; sessionize + first-row
    pick + purchase count are all vectorized inside the bucket, which
    emits (first_type, n_sessions, n_purchases) partials bounded by
    |event types|; driver merge is types x buckets rows."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts",
                                "event_type"])
    gap_ns = 30 * 60 * 1_000_000_000

    def attribute(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"]).copy()
        ns = df.ts.astype("datetime64[ns]").astype("int64")
        new_session = (df.user_id != df.user_id.shift()) | \
                      (ns - ns.shift() > gap_ns)
        sid = new_session.cumsum()
        first_type = df.event_type.groupby(sid.to_numpy()).transform(
            "first")
        d = pd.DataFrame({
            "first_type": first_type.to_numpy(),
            "sid": sid.to_numpy(),
            "purchase": (df.event_type == "purchase").to_numpy()
            .astype(np.int64)})
        per = d.groupby(["first_type", "sid"], as_index=False).agg(
            np=("purchase", "sum"))
        out = per.groupby("first_type", as_index=False).agg(
            n_sessions=("np", "size"), n_purchases=("np", "sum"))
        return out.astype({"n_sessions": np.int64,
                           "n_purchases": np.int64})

    parts = bucketed_group_apply(ds, ["user_id"], attribute,
                                 num_buckets=16).to_pandas()
    out = (parts.groupby("first_type", as_index=False).agg(
        n_sessions=("n_sessions", "sum"),
        n_purchases=("n_purchases", "sum"))
        .astype({"n_sessions": np.int64, "n_purchases": np.int64}))
    return out.sort_values("first_type").reset_index(drop=True)


SQL_FIRST_TOUCH = """
WITH e AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
                               ORDER BY ts, event_id) AS rn
  FROM s
), f AS (
  SELECT user_id, sid,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS first_type,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS np
  FROM r GROUP BY 1, 2
)
SELECT first_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(np) AS BIGINT) AS n_purchases
FROM f GROUP BY 1 ORDER BY first_type
"""


# ------------------------------------------- Kendall rank concordance
def _count_inversions(vals: np.ndarray) -> int:
    """Strict inversions (# pairs i<j with vals[i] > vals[j]) in
    O(n log^2 n), fully vectorized: bottom-up mergesort where each
    level counts cross-run pairs with ONE flattened row-offset
    searchsorted (pads rank n sit in the global suffix, so a padded
    A-run implies an all-pad B-run and pads can never miscount)."""
    n = len(vals)
    if n < 2:
        return 0
    sv = np.sort(vals)
    ranks = np.searchsorted(sv, vals).astype(np.int64)    # ties share rank
    k = 1 << int(n - 1).bit_length()
    a = np.concatenate([ranks, np.full(k - n, n, dtype=np.int64)])
    inv, run = 0, 1
    while run < k:
        m = k // (2 * run)
        pairs = a.reshape(m, 2, run)
        A = np.sort(pairs[:, 0, :], axis=1)
        B = pairs[:, 1, :]
        off = np.arange(m, dtype=np.int64)[:, None] * np.int64(n + 2)
        pos = np.searchsorted((A + off).ravel(), (B + off).ravel(),
                              side="right")
        within = pos.reshape(m, run) - np.arange(m)[:, None] * run
        inv += int((run - within).sum())
        a = np.sort(pairs.reshape(m, 2 * run), axis=1).ravel()
        run *= 2
    return inv


def q_user_kendall(sf_dir: str) -> rd.Dataset:
    """Kendall tau-a concordance between EVENT ORDER and VALUE per user
    — "do this user's spends trend with time?" as a rank statistic, the
    nonparametric cousin of type_trend's OLS slope.  Discordant pairs
    are strict inversions of the value sequence in (ts, event_id)
    order; ties count to neither side; tau_milli =
    floor(1000·(C−D)/total) in exact integers.

    Shape at scale: ONE user-bucketed exchange; the per-user inversion
    count is the vectorized O(n log^2 n) merge counter above (no
    per-pair work, no Python DP), so a heavy user costs log-factors
    over linear, not n^2."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def kendall(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for uid, g in df.groupby("user_id", sort=True):
            g = g.sort_values(["ts", "event_id"])
            v = _cents(g.value)
            n = len(v)
            total = n * (n - 1) // 2
            d = _count_inversions(v)
            _, cnt = np.unique(v, return_counts=True)
            t = int((cnt * (cnt - 1) // 2).sum())
            tau = int((1000 * (total - t - 2 * d)) // total) if total \
                else 0
            rows.append((uid, n, total, d, tau))
        return pd.DataFrame(rows, columns=[
            "user_id", "n_events", "n_pairs", "n_discordant",
            "tau_milli"]).astype(np.int64)

    return bucketed_group_apply(ds, ["user_id"], kendall,
                                num_buckets=16).sort("user_id")


SQL_USER_KENDALL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tus,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), p AS (
  SELECT a.user_id,
         SUM(CASE WHEN a.v > b.v THEN 1 ELSE 0 END) AS d,
         SUM(CASE WHEN a.v = b.v THEN 1 ELSE 0 END) AS t,
         COUNT(*) AS tot
  FROM e a JOIN e b ON a.user_id = b.user_id
       AND (a.tus < b.tus OR (a.tus = b.tus AND a.event_id < b.event_id))
  GROUP BY 1
), n AS (SELECT user_id, COUNT(*) AS n FROM e GROUP BY 1)
SELECT n.user_id, CAST(n.n AS BIGINT) AS n_events,
       CAST(COALESCE(p.tot, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(p.d, 0) AS BIGINT) AS n_discordant,
       CAST(CASE WHEN p.tot IS NULL OR p.tot = 0 THEN 0 ELSE
         (1000*(p.tot - p.t - 2*p.d)
          - ((((1000*(p.tot - p.t - 2*p.d)) % p.tot) + p.tot) % p.tot))
         // p.tot END AS BIGINT) AS tau_milli
FROM n LEFT JOIN p ON p.user_id = n.user_id ORDER BY n.user_id
"""


# ------------------------------------- Q19 disjunctive predicate join
_Q19_CLAUSES = [
    # (label, brand, size_lo, size_hi, qty_lo, qty_hi) — all inclusive
    ("c1", "Brand#12", 1, 10, 1, 11),
    ("c2", "Brand#23", 10, 20, 10, 20),
    ("c3", "Brand#34", 20, 35, 20, 30),
]


def q_disjunctive_revenue(sf_dir: str) -> rd.Dataset:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs predicate spanning
    BOTH join sides (part attrs AND lineitem quantity per disjunct) —
    the shape that defeats naive predicate pushdown because no single
    conjunct can be pushed below the join.  Reported per clause so the
    result localizes which disjunct drifted.

    Shape at scale: lineitem pre-slims to (partkey, q, cents) with the
    UNION of the quantity ranges pushed down (rows outside every qty
    window never ship); ONE partkey-bucketed cogroup against the part
    dim evaluates all clauses vectorized; per-clause partials merge in
    a bounded final."""
    from .grouping import bucketed_cogroup, bucketed_group_apply

    li = _pq(sf_dir, "lineitem",
             ["l_partkey", "l_quantity", "l_extendedprice"])
    parts = _pq(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    qlo = min(c[4] for c in _Q19_CLAUSES)
    qhi = max(c[5] for c in _Q19_CLAUSES)

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        q = np.round(df.l_quantity.to_numpy()).astype(np.int64)
        keep = (q >= qlo) & (q <= qhi)          # union-of-ranges pushdown
        return pd.DataFrame({
            "l_partkey": df.l_partkey.to_numpy()[keep].astype(np.int64),
            "q": q[keep], "cents": _cents(df.l_extendedprice)[keep]})

    rows = li.map_batches(slim, batch_format="pandas")

    def clauses(rf: pd.DataFrame, pf: pd.DataFrame) -> pd.DataFrame:
        m = rf.merge(pf.rename(columns={"p_partkey": "l_partkey"}),
                     on="l_partkey", how="inner")
        out = []
        q = m.q.to_numpy()
        size = m.p_size.to_numpy()
        for label, brand, slo, shi, lo, hi in _Q19_CLAUSES:
            keep = ((m.p_brand == brand).to_numpy()
                    & (size >= slo) & (size <= shi)
                    & (q >= lo) & (q <= hi))
            out.append((label, int(keep.sum()),
                        int(m.cents.to_numpy()[keep].sum())))
        return pd.DataFrame(out, columns=[
            "clause", "n_items", "rev_cents"]).astype(
                {"n_items": np.int64, "rev_cents": np.int64})

    merged = bucketed_cogroup(rows, parts, ["l_partkey"], ["p_partkey"],
                              clauses, num_buckets=16)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("clause", as_index=False).agg(
            n_items=("n_items", "sum"), rev_cents=("rev_cents", "sum"))
        return out.astype({"n_items": np.int64, "rev_cents": np.int64})

    return bucketed_group_apply(merged, ["clause"], finish,
                                num_buckets=4).sort("clause")


def _disjunctive_sql() -> str:
    selects = []
    for label, brand, slo, shi, lo, hi in _Q19_CLAUSES:
        selects.append(f"""
SELECT '{label}' AS clause, CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COALESCE(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)),
                     0) AS BIGINT) AS rev_cents
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = '{brand}' AND p.p_size BETWEEN {slo} AND {shi}
  AND CAST(round(l.l_quantity) AS BIGINT) BETWEEN {lo} AND {hi}""")
    return " UNION ALL ".join(selects) + " ORDER BY clause"


SQL_DISJUNCTIVE_REVENUE = _disjunctive_sql()


# ---------------------------------------------- Q8 market share
MS_REGION = "ASIA"
MS_NATION = "NATION_2"


def q_market_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q8 shape: NATION_2 suppliers' share of revenue sold to
    ASIA customers, per order year — the two-dimension-path join
    (supplier->nation on one leg, customer->nation->region on the
    other) whose answer is a ratio of two aggregates over the same
    join tree.

    Shape at scale: nation/region are FIXED-cardinality dims — their
    keys broadcast as plain sets (the region_customers convention);
    customer, supplier, orders, lineitem all co-partition through
    bucketed cogroups (custkey -> suppkey -> orderkey), each stage
    emitting slimmed columns only.  Per-year partials are bounded;
    share_milli = 1000*nation_cents // total_cents exact."""
    from .grouping import bucketed_cogroup

    nat = _pq(sf_dir, "nation",
              ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    asia_rk = int(reg[reg.r_name == MS_REGION].r_regionkey.iloc[0])
    asia_nations = set(nat[nat.n_regionkey == asia_rk].n_nationkey)
    target_nk = int(nat[nat.n_name == MS_NATION].n_nationkey.iloc[0])

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_extendedprice"])
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def o_slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": df.o_orderkey.to_numpy().astype(np.int64),
            "o_custkey": df.o_custkey.to_numpy().astype(np.int64),
            "yr": df.o_orderdate.dt.year.to_numpy().astype(np.int64)})

    def asia_orders(of: pd.DataFrame, cf: pd.DataFrame) -> pd.DataFrame:
        keep_c = set(cf.c_custkey[cf.c_nationkey.isin(asia_nations)])
        keep = of.o_custkey.isin(keep_c).to_numpy()
        return of[keep][["o_orderkey", "yr"]]

    ao = bucketed_cogroup(orders.map_batches(o_slim,
                                             batch_format="pandas"),
                          cust, ["o_custkey"], ["c_custkey"],
                          asia_orders, num_buckets=16)

    def li_slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": df.l_orderkey.to_numpy().astype(np.int64),
            "l_suppkey": df.l_suppkey.to_numpy().astype(np.int64),
            "cents": _cents(df.l_extendedprice)})

    def tag_nation(lf: pd.DataFrame, sf: pd.DataFrame) -> pd.DataFrame:
        target = set(sf.s_suppkey[sf.s_nationkey == target_nk])
        out = lf[["l_orderkey", "cents"]].copy()
        out["is_nat"] = lf.l_suppkey.isin(target).to_numpy() \
            .astype(np.int64)
        return out

    tagged = bucketed_cogroup(li.map_batches(li_slim,
                                             batch_format="pandas"),
                              supp, ["l_suppkey"], ["s_suppkey"],
                              tag_nation, num_buckets=16)

    def per_year(af: pd.DataFrame, tf: pd.DataFrame) -> pd.DataFrame:
        m = tf.merge(af.rename(columns={"o_orderkey": "l_orderkey"}),
                     on="l_orderkey", how="inner")
        m["nat_cents"] = m.cents.to_numpy() * m.is_nat.to_numpy()
        out = m.groupby("yr", as_index=False).agg(
            total_cents=("cents", "sum"), nation_cents=("nat_cents",
                                                         "sum"))
        return out.astype(np.int64)

    parts = bucketed_cogroup(ao, tagged, ["o_orderkey"], ["l_orderkey"],
                             per_year, num_buckets=16).to_pandas()
    out = parts.groupby("yr", as_index=False).agg(
        total_cents=("total_cents", "sum"),
        nation_cents=("nation_cents", "sum")).astype(np.int64)
    out["share_milli"] = (1000 * out.nation_cents.to_numpy()
                          // out.total_cents.to_numpy()).astype(np.int64)
    return out.sort_values("yr").reset_index(drop=True)


SQL_MARKET_SHARE = f"""
WITH base AS (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS yr,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS cents,
         CASE WHEN sn.n_name = '{MS_NATION}' THEN 1 ELSE 0 END AS is_nat
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation cn ON cn.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = cn.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation sn ON sn.n_nationkey = s.s_nationkey
  WHERE r.r_name = '{MS_REGION}'
)
SELECT yr, CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(cents * is_nat) AS BIGINT) AS nation_cents,
       CAST((1000 * SUM(cents * is_nat)) // SUM(cents) AS BIGINT)
         AS share_milli
FROM base GROUP BY yr ORDER BY yr
"""


# --------------------------------------- above-customer-median orders
def q_above_median_orders(sf_dir: str) -> pd.DataFrame:
    """Orders strictly above their OWN customer's (lower) median order
    value, aggregated per priority — Q17's decorrelation shape with a
    MEDIAN, which unlike avg is not a semilattice: the per-key
    statistic needs the key's full value multiset co-located, which is
    exactly what ONE custkey-bucketed exchange provides.

    The in-bucket median is vectorized (sort once, pick each group's
    (n-1)//2-th element via run-boundary arithmetic — no per-group
    Python).  Per-priority partials merge in a bounded final."""
    from .grouping import bucketed_group_apply

    orders = _pq(sf_dir, "orders",
                 ["o_custkey", "o_totalprice", "o_orderpriority"])

    def above(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "k": df.o_custkey.to_numpy().astype(np.int64),
            "cents": _cents(df.o_totalprice),
            "pri": df.o_orderpriority.to_numpy()})
        s = d.sort_values(["k", "cents"])
        keys = s.k.to_numpy()
        starts = np.r_[0, np.flatnonzero(keys[1:] != keys[:-1]) + 1]
        sizes = np.diff(np.r_[starts, len(s)])
        med_at = starts + (sizes - 1) // 2
        med = pd.Series(s.cents.to_numpy()[med_at], index=keys[starts])
        keep = d.cents.to_numpy() > d.k.map(med).to_numpy()
        out = d[keep].groupby("pri", as_index=False).agg(
            n_orders=("cents", "size"), rev_cents=("cents", "sum"))
        return out.astype({"n_orders": np.int64, "rev_cents": np.int64})

    parts = bucketed_group_apply(orders, ["o_custkey"], above,
                                 num_buckets=16).to_pandas()
    out = (parts.groupby("pri", as_index=False).agg(
        n_orders=("n_orders", "sum"), rev_cents=("rev_cents", "sum"))
        .rename(columns={"pri": "o_orderpriority"})
        .astype({"n_orders": np.int64, "rev_cents": np.int64}))
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_ABOVE_MEDIAN_ORDERS = """
WITH o AS (
  SELECT o_custkey, o_orderpriority,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n
  FROM o
), m AS (
  SELECT o_custkey, MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END)
           AS med
  FROM r GROUP BY 1
)
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o.cents) AS BIGINT) AS rev_cents
FROM o JOIN m ON m.o_custkey = o.o_custkey
WHERE o.cents > m.med
GROUP BY 1 ORDER BY o_orderpriority
"""


# ------------------------------------------------ year-over-year growth
def q_orders_yoy(sf_dir: str) -> pd.DataFrame:
    """Year-over-year revenue growth — the period-over-period report:
    per-batch (year, cents) combiners -> a years-sized driver series ->
    LAG + exact floored per-mille delta (the only LAG that is correct
    to run driver-side: the series is bounded by the calendar, not the
    data)."""
    orders = _pq(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "yr": df.o_orderdate.dt.year.to_numpy().astype(np.int64),
            "cents": _cents(df.o_totalprice)})
        return d.groupby("yr", as_index=False).cents.sum().astype(
            np.int64)

    parts = orders.map_batches(part, batch_format="pandas").to_pandas()
    out = (parts.groupby("yr", as_index=False).cents.sum()
           .rename(columns={"cents": "rev_cents"}).sort_values("yr")
           .reset_index(drop=True))
    prev = out.rev_cents.shift(1).fillna(0).astype(np.int64)
    out["prev_cents"] = prev
    delta = out.rev_cents.to_numpy() - prev.to_numpy()
    out["yoy_milli"] = np.where(
        prev.to_numpy() > 0,
        (1000 * delta) // np.maximum(prev.to_numpy(), 1),
        0).astype(np.int64)
    return out.astype({"yr": np.int64, "rev_cents": np.int64})


SQL_ORDERS_YOY = """
WITH y AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
         CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents
  FROM orders GROUP BY 1
), l AS (
  SELECT yr, rev_cents,
         CAST(COALESCE(LAG(rev_cents) OVER (ORDER BY yr), 0) AS BIGINT)
           AS prev_cents
  FROM y
)
SELECT yr, rev_cents, prev_cents,
       CAST(CASE WHEN prev_cents = 0 THEN 0 ELSE
         (1000*(rev_cents - prev_cents)
          - ((((1000*(rev_cents - prev_cents)) % prev_cents)
              + prev_cents) % prev_cents))
         // prev_cents END AS BIGINT) AS yoy_milli
FROM l ORDER BY yr
"""


# ------------------------------------------- Q10 returned-item report
RET_LO, RET_HI = "1996-07-01", "1997-01-01"


def q_returned_revenue(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue LOST to returns
    (returnflag = 'R') for orders placed in a half-year window — the
    fact-fact-dim join + top-k report.  Revenue convention matches
    shipping_priority: round(ext*100) * (100 - disc%) in cents/100.

    Shape at scale: lineitem pre-filters to returned rows and
    pre-aggregates per order; ONE orderkey-bucketed cogroup against the
    windowed orders; per-customer sums then cogroup the customer dim on
    custkey (name attaches in-bucket, never broadcast); top-20 is a
    per-bucket semilattice, driver sees <= 20 x buckets rows."""
    from .grouping import bucketed_cogroup

    lo, hi = np.datetime64(RET_LO), np.datetime64(RET_HI)
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_extendedprice", "l_discount",
              "l_returnflag"])
    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _pq(sf_dir, "customer",
               ["c_custkey", "c_name", "c_nationkey"])

    def li_ret(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df.l_returnflag == "R"]
        rev = (_cents(d.l_extendedprice)
               * (100 - np.round(d.l_discount.to_numpy() * 100)
                  .astype(np.int64)))
        out = (pd.DataFrame({"l_orderkey": d.l_orderkey, "rev": rev})
               .groupby("l_orderkey", as_index=False).rev.sum())
        return out.astype(np.int64)

    def o_window(df: pd.DataFrame) -> pd.DataFrame:
        dt = df.o_orderdate.to_numpy()
        return df[(dt >= lo) & (dt < hi)][["o_orderkey", "o_custkey"]]

    def per_cust(rf: pd.DataFrame, of: pd.DataFrame) -> pd.DataFrame:
        m = rf.merge(of.rename(columns={"o_orderkey": "l_orderkey"}),
                     on="l_orderkey", how="inner")
        out = (m.groupby("o_custkey", as_index=False).rev.sum()
               .rename(columns={"o_custkey": "c_custkey"}))
        return out.astype(np.int64)

    pc = bucketed_cogroup(li.map_batches(li_ret, batch_format="pandas"),
                          orders.map_batches(o_window,
                                             batch_format="pandas"),
                          ["l_orderkey"], ["o_orderkey"], per_cust,
                          num_buckets=16)

    def named_topk(rf: pd.DataFrame, cf: pd.DataFrame) -> pd.DataFrame:
        per = rf.groupby("c_custkey", as_index=False).rev.sum()
        m = per.merge(cf, on="c_custkey", how="inner")
        m["c_nationkey"] = m.c_nationkey.astype(np.int64)
        return (m.sort_values(["rev", "c_custkey"],
                              ascending=[False, True]).head(20)
                .astype({"rev": np.int64}))

    merged = bucketed_cogroup(pc, cust, ["c_custkey"], ["c_custkey"],
                              named_topk, num_buckets=16).to_pandas()
    return (merged.sort_values(["rev", "c_custkey"],
                               ascending=[False, True]).head(20)
            .reset_index(drop=True)
            [["c_custkey", "c_name", "c_nationkey", "rev"]])


SQL_RETURNED_REVENUE = f"""
SELECT c.c_custkey, c.c_name, CAST(c.c_nationkey AS BIGINT) AS c_nationkey,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS rev
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '{RET_LO}'
  AND o.o_orderdate < TIMESTAMP '{RET_HI}'
GROUP BY 1, 2, 3 ORDER BY rev DESC, c.c_custkey LIMIT 20
"""


# ----------------------------------------------- Q14 promo share
def q_promo_share(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q14 shape: PROMO parts' per-mille share of discounted
    revenue per ship month — the conditional-aggregate ratio over a
    fact-dim join, reported as a bounded calendar series.

    Shape at scale: lineitem slims to (partkey, month, rev); ONE
    partkey-bucketed cogroup tags promo parts (the dim ships its
    (key, is_promo) columns only); per-month partials merge in a
    months-bounded final; share is exact integer per-mille."""
    from .grouping import bucketed_cogroup

    li = _pq(sf_dir, "lineitem",
             ["l_partkey", "l_shipdate", "l_extendedprice",
              "l_discount"])
    parts = _pq(sf_dir, "part", ["p_partkey", "p_type"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        rev = (_cents(df.l_extendedprice)
               * (100 - np.round(df.l_discount.to_numpy() * 100)
                  .astype(np.int64)))
        ym = (df.l_shipdate.dt.year * 100
              + df.l_shipdate.dt.month).to_numpy().astype(np.int64)
        return pd.DataFrame({
            "l_partkey": df.l_partkey.to_numpy().astype(np.int64),
            "ym": ym, "rev": rev})

    def tag(rf: pd.DataFrame, pf: pd.DataFrame) -> pd.DataFrame:
        promo = set(pf.p_partkey[pf.p_type == "PROMO"])
        d = pd.DataFrame({
            "ym": rf.ym.to_numpy(), "rev": rf.rev.to_numpy(),
            "p": rf.l_partkey.isin(promo).to_numpy().astype(np.int64)})
        d["prev"] = d.rev * d.p
        out = d.groupby("ym", as_index=False).agg(
            total=("rev", "sum"), promo=("prev", "sum"))
        return out.astype(np.int64)

    merged = bucketed_cogroup(li.map_batches(slim,
                                             batch_format="pandas"),
                              parts, ["l_partkey"], ["p_partkey"], tag,
                              num_buckets=16).to_pandas()
    out = merged.groupby("ym", as_index=False).agg(
        total_cents=("total", "sum"),
        promo_cents=("promo", "sum")).astype(np.int64)
    out["promo_milli"] = (1000 * out.promo_cents.to_numpy()
                          // out.total_cents.to_numpy()).astype(np.int64)
    return (out.sort_values("ym").reset_index(drop=True)
            [["ym", "promo_cents", "total_cents", "promo_milli"]])


SQL_PROMO_SHARE = """
WITH b AS (
  SELECT CAST(EXTRACT(year FROM l.l_shipdate) * 100
              + EXTRACT(month FROM l.l_shipdate) AS BIGINT) AS ym,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev,
         CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS pr
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT ym, CAST(SUM(rev * pr) AS BIGINT) AS promo_cents,
       CAST(SUM(rev) AS BIGINT) AS total_cents,
       CAST((1000 * SUM(rev * pr)) // SUM(rev) AS BIGINT) AS promo_milli
FROM b GROUP BY ym ORDER BY ym
"""


# ---------------------------------------- Q15 global argmax with ties
TS_LO, TS_HI = "1996-01-01", "1996-04-01"


def q_top_supplier(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q15 shape: the supplier(s) achieving MAXIMUM quarterly
    revenue — global argmax where ties must ALL surface (the
    view-then-max-then-filter composition).  Two-level semilattice:
    each suppkey bucket emits only ITS max-revenue rows, the driver
    takes the max-of-maxes and filters — ties survive both levels by
    construction.

    Shape at scale: per-batch (suppkey, rev) combiners -> ONE
    suppkey-bucketed sum; the exchange is supplier-sized, the driver
    sees <= ties x buckets rows."""
    from .grouping import bucketed_group_apply

    lo, hi = np.datetime64(TS_LO), np.datetime64(TS_HI)
    li = _pq(sf_dir, "lineitem",
             ["l_suppkey", "l_shipdate", "l_extendedprice",
              "l_discount"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        dt = df.l_shipdate.to_numpy()
        d = df[(dt >= lo) & (dt < hi)]
        rev = (_cents(d.l_extendedprice)
               * (100 - np.round(d.l_discount.to_numpy() * 100)
                  .astype(np.int64)))
        out = (pd.DataFrame({"l_suppkey": d.l_suppkey, "rev": rev})
               .groupby("l_suppkey", as_index=False).rev.sum())
        return out.astype(np.int64)

    def bucket_max(df: pd.DataFrame) -> pd.DataFrame:
        per = df.groupby("l_suppkey", as_index=False).rev.sum()
        if per.empty:
            return per.astype(np.int64)
        return per[per.rev == per.rev.max()].astype(np.int64)

    cand = bucketed_group_apply(
        li.map_batches(part, batch_format="pandas"),
        ["l_suppkey"], bucket_max, num_buckets=16).to_pandas()
    best = int(cand.rev.max())
    out = (cand[cand.rev == best]
           .rename(columns={"l_suppkey": "s_suppkey",
                            "rev": "total_rev"})
           .sort_values("s_suppkey").reset_index(drop=True))
    return out.astype({"s_suppkey": np.int64, "total_rev": np.int64})


SQL_TOP_SUPPLIER = f"""
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TS_LO}'
    AND l_shipdate < TIMESTAMP '{TS_HI}'
  GROUP BY 1
)
SELECT s_suppkey, total_rev FROM r
WHERE total_rev = (SELECT MAX(total_rev) FROM r)
ORDER BY s_suppkey
"""


# --------------------------------------------- calendar seasonality
def q_event_seasonality(sf_dir: str) -> rd.Dataset:
    """Per-type (ISO weekday, hour) traffic grid — the seasonality
    profile a capacity planner reads.  isodow (Mon=1..Sun=7) is used
    on BOTH sides because pandas dayofweek (Mon=0) and DuckDB dow
    (Sun=0) disagree; the grid is bounded (types x 7 x 24), so partials
    merge in ONE tiny bucketed exchange."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_type", "ts", "value"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "event_type": df.event_type.to_numpy(),
            "isodow": (df.ts.dt.dayofweek.to_numpy() + 1)
            .astype(np.int64),
            "hour": df.ts.dt.hour.to_numpy().astype(np.int64),
            "cents": _cents(df.value)})
        out = d.groupby(["event_type", "isodow", "hour"],
                        as_index=False).agg(
            n=("cents", "size"), value_cents=("cents", "sum"))
        return out.astype({"n": np.int64, "value_cents": np.int64,
                           "isodow": np.int64, "hour": np.int64})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["event_type", "isodow", "hour"],
                         as_index=False).agg(
            n=("n", "sum"), value_cents=("value_cents", "sum"))
        return out.astype({"n": np.int64, "value_cents": np.int64,
                           "isodow": np.int64, "hour": np.int64})

    return bucketed_group_apply(
        ds.map_batches(part, batch_format="pandas"),
        ["event_type"], merge, num_buckets=4).sort(
            ["event_type", "isodow", "hour"])


SQL_EVENT_SEASONALITY = """
SELECT event_type, CAST(EXTRACT(isodow FROM ts) AS BIGINT) AS isodow,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
         AS value_cents
FROM events GROUP BY 1, 2, 3 ORDER BY event_type, isodow, hour
"""


# ------------------------------------------------------- shard manifest
SHARD_N = 64                 # training output shards
SHARD_MIX = 2654435761       # Knuth multiplicative hash (fits int64
#                              products for doc_id < 2^31 at test scale;
#                              the point is DETERMINISTIC placement both
#                              engines can compute, not crypto quality)
SHARD_CKSUM_P = 2305843009213693951  # 2^61 - 1 (Mersenne)


def q_shard_manifest(sf_dir: str) -> pd.DataFrame:
    """Deterministic training-shard assignment + balance audit — the
    write-side manifest a resumable 100-TB job needs: every doc maps to
    a shard by a pure function of its id (re-runs and retries place
    rows identically), and each shard row carries an order-independent
    content checksum so a resumed run can verify finished shards
    without re-reading them (pairs with state/manifest.py's lineage
    records).

    Shape at scale: one pass of per-batch partials (shard, n, chars,
    cksum-mod-p, min/max doc_id) — a bounded SHARD_N x blocks exchange,
    no data shuffle at all (the manifest is metadata; the actual
    write_parquet would partition by the same key)."""
    ds = _pq(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        did = df.doc_id.to_numpy().astype(np.int64)
        h = (did * SHARD_MIX) % 4294967296
        shard = h % SHARD_N
        chars = df.n_chars.to_numpy().astype(np.int64)
        term = (did * 31 + chars) % SHARD_CKSUM_P
        g = pd.DataFrame({"shard_id": shard, "n": 1, "chars": chars,
                          "ck": term, "lo": did, "hi": did})
        out = g.groupby("shard_id", as_index=False).agg(
            n_docs=("n", "sum"), total_chars=("chars", "sum"),
            cksum=("ck", "sum"), min_doc_id=("lo", "min"),
            max_doc_id=("hi", "max"))
        # mod p per partial keeps the running sum far from int64 wrap
        # at any batch size ((Σx) % p == (Σ(x%p)) % p for x >= 0)
        out["cksum"] = out.cksum % SHARD_CKSUM_P
        return out.astype(np.int64)

    parts = (ds.map_batches(partial, batch_format="pandas").to_pandas())
    out = parts.groupby("shard_id", as_index=False).agg(
        n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"),
        cksum=("cksum", "sum"), min_doc_id=("min_doc_id", "min"),
        max_doc_id=("max_doc_id", "max"))
    out["cksum"] = (out.cksum % SHARD_CKSUM_P).astype(np.int64)
    return (out.astype(np.int64).sort_values("shard_id")
            .reset_index(drop=True))


SQL_SHARD_MANIFEST = f"""
WITH d AS (
  SELECT doc_id, n_chars,
         ((doc_id * {SHARD_MIX}) % 4294967296) % {SHARD_N} AS shard_id,
         (doc_id * 31 + n_chars) % {SHARD_CKSUM_P} AS term
  FROM documents
)
SELECT CAST(shard_id AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(term) % {SHARD_CKSUM_P} AS BIGINT) AS cksum,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
       CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
FROM d GROUP BY 1 ORDER BY 1
"""


# -------------------------------------------------- split leakage audit
SPLIT_CUTOFF = "2024-01-22"


def q_split_leakage_audit(sf_dir: str) -> pd.DataFrame:
    """Temporal train/test split accounting + entity-leakage audit: a
    time cutoff splits the event log, and the audit reports how many
    USERS appear on both sides — the quantity that decides whether a
    user-level model evaluated on the test window is contaminated.

    Shape at scale: per-batch (user, n_train, n_test) partials -> ONE
    user-bucketed exchange -> per-bucket classification counts -> a
    3-integer driver merge.  Events never shuffle, only per-user
    partial counters do."""
    from .grouping import bucketed_group_apply

    cut = int(pd.Timestamp(SPLIT_CUTOFF).value // 1_000_000_000)
    ds = _pq(sf_dir, "events", ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = np.asarray(_epoch_s(df.ts))
        d = pd.DataFrame({
            "user_id": df.user_id.to_numpy().astype(np.int64),
            "tr": (s < cut).astype(np.int64)})
        d["te"] = 1 - d.tr
        return (d.groupby("user_id", as_index=False)
                .agg(n_train=("tr", "sum"), n_test=("te", "sum"))
                .astype(np.int64))

    def classify(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("user_id", as_index=False)
             .agg(n_train=("n_train", "sum"), n_test=("n_test", "sum")))
        both = (g.n_train > 0) & (g.n_test > 0)
        return pd.DataFrame({
            "n_train_events": [np.int64(g.n_train.sum())],
            "n_test_events": [np.int64(g.n_test.sum())],
            "users_train_only": [np.int64(((g.n_train > 0)
                                           & (g.n_test == 0)).sum())],
            "users_test_only": [np.int64(((g.n_train == 0)
                                          & (g.n_test > 0)).sum())],
            "users_both": [np.int64(both.sum())]})

    parts = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], classify, num_buckets=16).to_pandas()
    out = pd.DataFrame([{
        "n_train_events": int(parts.n_train_events.sum()),
        "n_test_events": int(parts.n_test_events.sum()),
        "users_train_only": int(parts.users_train_only.sum()),
        "users_test_only": int(parts.users_test_only.sum()),
        "users_both": int(parts.users_both.sum()),
    }])
    n_users = int(out.users_train_only.iloc[0]
                  + out.users_test_only.iloc[0] + out.users_both.iloc[0])
    out["leakage_milli"] = ((1000 * out.users_both) // n_users
                            if n_users else 0)
    return out.astype(np.int64)


SQL_SPLIT_LEAKAGE_AUDIT = f"""
WITH u AS (
  SELECT user_id,
         SUM(CASE WHEN ts < TIMESTAMP '{SPLIT_CUTOFF}' THEN 1 ELSE 0 END)
           AS n_train,
         SUM(CASE WHEN ts >= TIMESTAMP '{SPLIT_CUTOFF}' THEN 1 ELSE 0
             END) AS n_test
  FROM events GROUP BY 1
)
SELECT CAST(SUM(n_train) AS BIGINT) AS n_train_events,
       CAST(SUM(n_test) AS BIGINT) AS n_test_events,
       CAST(SUM(CASE WHEN n_train > 0 AND n_test = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS users_train_only,
       CAST(SUM(CASE WHEN n_train = 0 AND n_test > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS users_test_only,
       CAST(SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS users_both,
       CAST(1000 * SUM(CASE WHEN n_train > 0 AND n_test > 0 THEN 1
                       ELSE 0 END) // COUNT(*) AS BIGINT)
         AS leakage_milli
FROM u
"""


# ------------------------------------------------- coordinated sampling
CS_MIX = 2654435761          # shared with shard_manifest: same family
CS_PCT = 5                   # keep ~5% of orderkeys


def q_coordinated_sample(sf_dir: str) -> pd.DataFrame:
    """Consistent (coordinated) sampling across orders AND lineitem by
    a shared pure hash of the join key — how a dev corpus is cut from
    100 TB with referential integrity intact and ZERO joins: both
    tables filter independently on h(orderkey), and closure holds by
    construction.  The audit row proves it: sampled lineitems' distinct
    orderkeys == sampled orders (every lineitem parent is sampled too).

    Shape at scale: two independent filtered scans with per-batch
    count/sum partials; the only exchange is the bounded audit
    distinct (orderkey-bucketed partial distincts)."""
    from .grouping import bucketed_group_apply

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice"])

    def keep(keys: np.ndarray) -> np.ndarray:
        return ((keys * CS_MIX) % 4294967296) % 100 < CS_PCT

    def o_part(df: pd.DataFrame) -> pd.DataFrame:
        k = df.o_orderkey.to_numpy().astype(np.int64)
        m = keep(k)
        return pd.DataFrame({
            "n_orders": [np.int64(m.sum())],
            "order_cents": [np.int64(_cents(df.o_totalprice)[m].sum())]})

    def l_part(df: pd.DataFrame) -> pd.DataFrame:
        k = df.l_orderkey.to_numpy().astype(np.int64)
        m = keep(k)
        return pd.DataFrame({
            "ok": k[m], "cents": _cents(df.l_extendedprice)[m]})

    op = orders.map_batches(o_part, batch_format="pandas").to_pandas()
    lp = li.map_batches(l_part, batch_format="pandas")

    def l_stats(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "n_li": [np.int64(len(df))],
            "li_cents": [np.int64(df.cents.sum())],
            "n_li_orders": [np.int64(df.ok.nunique())]})

    ls = bucketed_group_apply(lp, ["ok"], l_stats,
                              num_buckets=16).to_pandas()
    n_orders = int(op.n_orders.sum())
    n_li_orders = int(ls.n_li_orders.sum()) if len(ls) else 0
    return pd.DataFrame([{
        "n_orders": n_orders,
        "order_cents": int(op.order_cents.sum()),
        "n_lineitems": int(ls.n_li.sum()) if len(ls) else 0,
        "lineitem_cents": int(ls.li_cents.sum()) if len(ls) else 0,
        "n_lineitem_orders": n_li_orders,
        # referential closure: every sampled lineitem's parent sampled
        "n_orphan_orders": n_li_orders - min(n_li_orders, n_orders),
    }]).astype(np.int64)


SQL_COORDINATED_SAMPLE = f"""
WITH so AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE ((o_orderkey * {CS_MIX}) % 4294967296) % 100 < {CS_PCT}
), sl AS (
  SELECT l_orderkey,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem
  WHERE ((l_orderkey * {CS_MIX}) % 4294967296) % 100 < {CS_PCT}
)
SELECT CAST((SELECT COUNT(*) FROM so) AS BIGINT) AS n_orders,
       CAST((SELECT SUM(cents) FROM so) AS BIGINT) AS order_cents,
       CAST((SELECT COUNT(*) FROM sl) AS BIGINT) AS n_lineitems,
       CAST((SELECT SUM(cents) FROM sl) AS BIGINT) AS lineitem_cents,
       CAST((SELECT COUNT(DISTINCT l_orderkey) FROM sl) AS BIGINT)
         AS n_lineitem_orders,
       CAST(GREATEST((SELECT COUNT(DISTINCT l_orderkey) FROM sl)
                     - (SELECT COUNT(*) FROM so), 0) AS BIGINT)
         AS n_orphan_orders
"""


# --------------------------------------------------- zone prune audit
ZP_USER_LO, ZP_USER_HI = 5, 12
ZP_CENT_LO, ZP_CENT_HI = 1_000, 3_000
ZP_ID_BLOCK = 256            # rows per block in the arrival layout


def q_zone_prune_audit(sf_dir: str) -> pd.DataFrame:
    """Does the Z-order clustering actually prune scans?  For one fixed
    two-dimensional range predicate, compare zone-map pruning under the
    Morton layout (zorder_layout's zblock) against the naive
    arrival-order layout (event_id // block): zones scanned, rows
    scanned, and the matching-row count — the number a table OPTIMIZE
    decision is made on.

    Shape at scale: ONE pass computes per-batch zone partials for BOTH
    layouts plus the exact match count; two bounded zone-bucketed
    merges (zones ≤ 4096 / n_rows/block); the overlap test runs on the
    merged zone maps (driver-side, zone-count bounded)."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "value"])

    def parts(df: pd.DataFrame) -> pd.DataFrame:
        uid = df.user_id.to_numpy().astype(np.int64)
        cents = np.floor(df.value.to_numpy(dtype=np.float64)
                         * 100.0).astype(np.int64)
        eid = df.event_id.to_numpy().astype(np.int64)
        x = uid % 65536
        y = ((cents % 65536) + 65536) % 65536
        z = np.zeros(len(df), dtype=np.int64)
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        match = ((uid >= ZP_USER_LO) & (uid <= ZP_USER_HI)
                 & (cents >= ZP_CENT_LO) & (cents <= ZP_CENT_HI))
        rows = []
        for kind, blk in (("z", z >> 20), ("id", eid // ZP_ID_BLOCK)):
            g = pd.DataFrame({"blk": blk, "uid": uid, "cents": cents})
            p = g.groupby("blk", as_index=False).agg(
                n=("uid", "size"),
                ulo=("uid", "min"), uhi=("uid", "max"),
                clo=("cents", "min"), chi=("cents", "max"))
            p.insert(0, "kind", kind)
            rows.append(p)
        out = pd.concat(rows, ignore_index=True)
        # exact match count travels as its own (kind='m') marker row so
        # the zone merge can sum it without double-counting per layout
        out_match = pd.DataFrame({
            "kind": ["m"], "blk": [np.int64(-1)],
            "n": [np.int64(match.sum())], "ulo": [np.int64(0)],
            "uhi": [np.int64(0)], "clo": [np.int64(0)],
            "chi": [np.int64(0)]})
        return pd.concat([out, out_match], ignore_index=True)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["kind", "blk"], as_index=False).agg(
            n=("n", "sum"), ulo=("ulo", "min"), uhi=("uhi", "max"),
            clo=("clo", "min"), chi=("chi", "max"))
        g["n"] = g.n.astype(np.int64)
        return g

    zones = bucketed_group_apply(
        ds.map_batches(parts, batch_format="pandas"),
        ["kind", "blk"], merge, num_buckets=16).to_pandas()
    n_match = int(zones[zones.kind == "m"].n.sum())
    out = {}
    for kind in ("z", "id"):
        zk = zones[zones.kind == kind]
        scanned = zk[(zk.uhi >= ZP_USER_LO) & (zk.ulo <= ZP_USER_HI)
                     & (zk.chi >= ZP_CENT_LO) & (zk.clo <= ZP_CENT_HI)]
        out[f"n_zones_{kind}"] = len(zk)
        out[f"zones_scanned_{kind}"] = len(scanned)
        out[f"rows_scanned_{kind}"] = int(scanned.n.sum())
    n_rows = int(zones[zones.kind == "z"].n.sum())
    return pd.DataFrame([{
        "n_rows": n_rows, "n_match": n_match, **out,
        "scan_milli_z": (1000 * out["rows_scanned_z"]) // n_rows
        if n_rows else 0,
        "scan_milli_id": (1000 * out["rows_scanned_id"]) // n_rows
        if n_rows else 0,
    }]).astype(np.int64)


def _zp_interleave_sql() -> str:
    return " | ".join(
        f"(((u >> {i}) & 1) << {2 * i}) | (((c >> {i}) & 1) << {2 * i + 1})"
        for i in range(16))


SQL_ZONE_PRUNE_AUDIT = f"""
WITH base AS (
  SELECT event_id, user_id AS uid,
         CAST(floor(CAST(value AS DOUBLE) * 100) AS BIGINT) AS cents
  FROM events
), zb AS (
  SELECT ({_zp_interleave_sql()}) >> 20 AS blk, uid, cents
  FROM (SELECT uid % 65536 AS u,
               ((cents % 65536) + 65536) % 65536 AS c, uid, cents
        FROM base)
), ib AS (
  SELECT event_id // {ZP_ID_BLOCK} AS blk, uid, cents FROM base
), zz AS (
  SELECT blk, COUNT(*) AS n, MIN(uid) ulo, MAX(uid) uhi,
         MIN(cents) clo, MAX(cents) chi FROM zb GROUP BY 1
), iz AS (
  SELECT blk, COUNT(*) AS n, MIN(uid) ulo, MAX(uid) uhi,
         MIN(cents) clo, MAX(cents) chi FROM ib GROUP BY 1
)
SELECT CAST((SELECT COUNT(*) FROM base) AS BIGINT) AS n_rows,
       CAST((SELECT COUNT(*) FROM base
             WHERE uid BETWEEN {ZP_USER_LO} AND {ZP_USER_HI}
               AND cents BETWEEN {ZP_CENT_LO} AND {ZP_CENT_HI})
            AS BIGINT) AS n_match,
       CAST((SELECT COUNT(*) FROM zz) AS BIGINT) AS n_zones_z,
       CAST((SELECT COUNT(*) FROM zz
             WHERE uhi >= {ZP_USER_LO} AND ulo <= {ZP_USER_HI}
               AND chi >= {ZP_CENT_LO} AND clo <= {ZP_CENT_HI})
            AS BIGINT) AS zones_scanned_z,
       CAST((SELECT COALESCE(SUM(n), 0) FROM zz
             WHERE uhi >= {ZP_USER_LO} AND ulo <= {ZP_USER_HI}
               AND chi >= {ZP_CENT_LO} AND clo <= {ZP_CENT_HI})
            AS BIGINT) AS rows_scanned_z,
       CAST((SELECT COUNT(*) FROM iz) AS BIGINT) AS n_zones_id,
       CAST((SELECT COUNT(*) FROM iz
             WHERE uhi >= {ZP_USER_LO} AND ulo <= {ZP_USER_HI}
               AND chi >= {ZP_CENT_LO} AND clo <= {ZP_CENT_HI})
            AS BIGINT) AS zones_scanned_id,
       CAST((SELECT COALESCE(SUM(n), 0) FROM iz
             WHERE uhi >= {ZP_USER_LO} AND ulo <= {ZP_USER_HI}
               AND chi >= {ZP_CENT_LO} AND clo <= {ZP_CENT_HI})
            AS BIGINT) AS rows_scanned_id,
       CAST(1000 * (SELECT COALESCE(SUM(n), 0) FROM zz
                    WHERE uhi >= {ZP_USER_LO} AND ulo <= {ZP_USER_HI}
                      AND chi >= {ZP_CENT_LO} AND clo <= {ZP_CENT_HI})
            // (SELECT COUNT(*) FROM base) AS BIGINT) AS scan_milli_z,
       CAST(1000 * (SELECT COALESCE(SUM(n), 0) FROM iz
                    WHERE uhi >= {ZP_USER_LO} AND ulo <= {ZP_USER_HI}
                      AND chi >= {ZP_CENT_LO} AND clo <= {ZP_CENT_HI})
            // (SELECT COUNT(*) FROM base) AS BIGINT) AS scan_milli_id
FROM (SELECT 1)
"""


# ---------------------------------------------- percent-of-parent rollup
def q_nation_revenue_share(sf_dir: str) -> pd.DataFrame:
    """Hierarchical share-of-parent report: each nation's order revenue
    as a share of its REGION's revenue, and each region's share of the
    GLOBAL total — the percent-of-parent rollup (distinct from CUBE /
    grouping sets, which aggregate levels independently; here each
    level divides by its parent's aggregate).

    Shape at scale: revenue reduces through ONE custkey-bucketed
    cogroup (orders x customer) into per-nation partials; nation/region
    are the fixed broadcast dims, so the two-level share math runs on a
    25-row driver frame.  All shares are exact floored milli."""
    from .grouping import bucketed_cogroup

    nat = _pq(sf_dir, "nation",
              ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def o_slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ck": df.o_custkey.to_numpy().astype(np.int64),
            "cents": _cents(df.o_totalprice)})

    def per_nation(of: pd.DataFrame, cf: pd.DataFrame) -> pd.DataFrame:
        nk = pd.Series(cf.c_nationkey.to_numpy().astype(np.int64),
                       index=cf.c_custkey.to_numpy().astype(np.int64))
        d = of.copy()
        d["nk"] = d.ck.map(nk).astype(np.int64)
        return (d.groupby("nk", as_index=False)
                .agg(cents=("cents", "sum")).astype(np.int64))

    parts = bucketed_cogroup(
        orders.map_batches(o_slim, batch_format="pandas"),
        cust, ["ck"], ["c_custkey"], per_nation,
        num_buckets=16).to_pandas()
    nrev = (parts.groupby("nk", as_index=False)
            .agg(cents=("cents", "sum")))
    d = nrev.merge(nat, left_on="nk", right_on="n_nationkey") \
            .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    rrev = d.groupby("r_name").cents.sum()
    total = int(d.cents.sum())
    out = pd.DataFrame({
        "r_name": d.r_name,
        "n_name": d.n_name,
        "nation_cents": d.cents.astype(np.int64),
        "region_cents": d.r_name.map(rrev).astype(np.int64)})
    out["nation_share_milli"] = (1000 * out.nation_cents
                                 // out.region_cents).astype(np.int64)
    out["region_share_milli"] = (1000 * out.region_cents
                                 // total).astype(np.int64)
    return (out.sort_values(["r_name", "n_name"])
            .reset_index(drop=True))


SQL_NATION_REVENUE_SHARE = """
WITH nr AS (
  SELECT r.r_name, n.n_name,
         CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
              AS BIGINT) AS nation_cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name, nation_cents,
       CAST(SUM(nation_cents) OVER (PARTITION BY r_name) AS BIGINT)
         AS region_cents,
       CAST(1000 * nation_cents
            // SUM(nation_cents) OVER (PARTITION BY r_name) AS BIGINT)
         AS nation_share_milli,
       CAST(1000 * SUM(nation_cents) OVER (PARTITION BY r_name)
            // SUM(nation_cents) OVER () AS BIGINT)
         AS region_share_milli
FROM nr ORDER BY r_name, n_name
"""


# ------------------------------------------- difference-in-differences
DID_CUTOFF = "2024-01-15"
DID_TREAT, DID_CONTROL = "purchase", "click"


def q_events_did(sf_dir: str) -> pd.DataFrame:
    """Difference-in-differences over the event log: mean event value
    of the treatment type vs the control type, before vs after a
    cutoff — the 2x2 causal-analytics primitive.  Cell means are
    floored micro-cents (sum*1000 // n) and the DiD estimate is the
    exact integer (post_t - pre_t) - (post_c - pre_c).

    Shape at scale: one pass of per-batch (group, period, n, cents)
    partials — a 4-cell bounded merge, no shuffle at all."""
    cut = int(pd.Timestamp(DID_CUTOFF).value // 1_000_000_000)
    ds = _pq(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.event_type.isin([DID_TREAT, DID_CONTROL]).to_numpy()
        d = df[keep]
        s = np.asarray(_epoch_s(d.ts))
        g = pd.DataFrame({
            "grp": (d.event_type == DID_TREAT).to_numpy()
            .astype(np.int64),
            "post": (s >= cut).astype(np.int64),
            "cents": _cents(d.value)})
        return (g.groupby(["grp", "post"], as_index=False)
                .agg(n=("cents", "size"), cents=("cents", "sum"))
                .astype(np.int64))

    parts = (ds.map_batches(partial, batch_format="pandas").to_pandas()
             .groupby(["grp", "post"], as_index=False)
             .agg(n=("n", "sum"), cents=("cents", "sum")))
    cells = {(int(r.grp), int(r.post)): (int(r.n), int(r.cents))
             for r in parts.itertuples()}

    def mean_milli(grp: int, post: int) -> int:
        n, c = cells.get((grp, post), (0, 0))
        return (1000 * c) // n if n else 0

    rows = []
    for grp, name in ((1, DID_TREAT), (0, DID_CONTROL)):
        for post in (0, 1):
            n, c = cells.get((grp, post), (0, 0))
            rows.append({"grp": name, "period": "post" if post
                         else "pre", "n_events": n, "sum_cents": c,
                         "mean_millicents": mean_milli(grp, post)})
    out = pd.DataFrame(rows)
    did = ((mean_milli(1, 1) - mean_milli(1, 0))
           - (mean_milli(0, 1) - mean_milli(0, 0)))
    out["did_millicents"] = np.int64(did)
    return out.astype({"n_events": np.int64, "sum_cents": np.int64,
                       "mean_millicents": np.int64,
                       "did_millicents": np.int64})


SQL_EVENTS_DID = f"""
WITH c AS (
  SELECT CASE WHEN event_type = '{DID_TREAT}' THEN '{DID_TREAT}'
              ELSE '{DID_CONTROL}' END AS grp,
         CASE WHEN ts >= TIMESTAMP '{DID_CUTOFF}' THEN 'post'
              ELSE 'pre' END AS period,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
  FROM events WHERE event_type IN ('{DID_TREAT}', '{DID_CONTROL}')
  GROUP BY 1, 2
), scaffold AS (
  SELECT g.grp, p.period
  FROM (VALUES ('{DID_TREAT}'), ('{DID_CONTROL}')) AS g(grp),
       (VALUES ('pre'), ('post')) AS p(period)
), m AS (
  -- zero-filled 2x2: a missing cell must read n=0/mean=0 exactly like
  -- the engine's cells.get((grp, post), (0, 0)) default
  SELECT s.grp, s.period,
         CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events,
         CAST(COALESCE(c.sum_cents, 0) AS BIGINT) AS sum_cents,
         CAST(CASE WHEN COALESCE(c.n_events, 0) > 0
              THEN 1000 * c.sum_cents // c.n_events ELSE 0 END
              AS BIGINT) AS mean_millicents
  FROM scaffold s
  LEFT JOIN c ON c.grp = s.grp AND c.period = s.period
), d AS (
  SELECT CAST(
    (MAX(CASE WHEN grp = '{DID_TREAT}' AND period = 'post'
         THEN mean_millicents END)
     - MAX(CASE WHEN grp = '{DID_TREAT}' AND period = 'pre'
           THEN mean_millicents END))
    - (MAX(CASE WHEN grp = '{DID_CONTROL}' AND period = 'post'
           THEN mean_millicents END)
       - MAX(CASE WHEN grp = '{DID_CONTROL}' AND period = 'pre'
             THEN mean_millicents END)) AS BIGINT) AS did
  FROM m
)
SELECT m.grp, m.period, m.n_events, m.sum_cents, m.mean_millicents,
       (SELECT did FROM d) AS did_millicents
FROM m
ORDER BY CASE WHEN m.grp = '{DID_TREAT}' THEN 0 ELSE 1 END,
         CASE WHEN m.period = 'pre' THEN 0 ELSE 1 END
"""


# ----------------------------------------------------- A/B test readout
AB_MIX = 2654435761
AB_CONV_TYPE = "purchase"


def q_ab_test_eval(sf_dir: str) -> pd.DataFrame:
    """Experiment readout: users hash-split into variants A/B, converted
    = has at least one purchase event; report per-variant conversion
    and the two-proportion z-test decision with ALL divisions cleared
    (the events_rate_anomaly trick): z^2 > 3.8416 (alpha = 0.05) iff
    10000*D^2*N > 38416*nA*nB*C*(N-C) where D = cA*nB - cB*nA, all in
    Python bigints on a 2-cell driver frame.

    Shape at scale: per-batch (user, converted) partials -> ONE
    user-bucketed exchange for exact per-user conversion -> per-bucket
    (variant, n, conv) counts -> 2-row merge."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "user_id": df.user_id.to_numpy().astype(np.int64),
            "conv": (df.event_type == AB_CONV_TYPE).to_numpy()
            .astype(np.int64)})
        return (d.groupby("user_id", as_index=False)
                .agg(conv=("conv", "max")).astype(np.int64))

    def per_variant(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("user_id", as_index=False)
             .agg(conv=("conv", "max")))
        uid = g.user_id.to_numpy()
        variant = ((uid * AB_MIX) % 4294967296) % 2
        out = pd.DataFrame({"variant": variant,
                            "conv": g.conv.to_numpy()})
        return (out.groupby("variant", as_index=False)
                .agg(n_users=("conv", "size"),
                     n_converted=("conv", "sum")).astype(np.int64))

    parts = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], per_variant, num_buckets=16).to_pandas()
    g = (parts.groupby("variant", as_index=False)
         .agg(n_users=("n_users", "sum"),
              n_converted=("n_converted", "sum")))
    cells = {int(r.variant): (int(r.n_users), int(r.n_converted))
             for r in g.itertuples()}
    na, ca = cells.get(0, (0, 0))
    nb, cb = cells.get(1, (0, 0))
    n, c = na + nb, ca + cb
    d = ca * nb - cb * na
    sig = int(n > 0 and 0 < c < n
              and 10000 * d * d * n > 38416 * na * nb * c * (n - c))
    return pd.DataFrame([{
        "n_a": na, "conv_a": ca,
        "rate_a_milli": (1000 * ca) // na if na else 0,
        "n_b": nb, "conv_b": cb,
        "rate_b_milli": (1000 * cb) // nb if nb else 0,
        "significant": sig,
    }]).astype(np.int64)


SQL_AB_TEST_EVAL = f"""
WITH u AS (
  SELECT user_id,
         ((user_id * {AB_MIX}) % 4294967296) % 2 AS variant,
         MAX(CASE WHEN event_type = '{AB_CONV_TYPE}' THEN 1 ELSE 0 END)
           AS conv
  FROM events GROUP BY 1, 2
), v AS (
  SELECT variant, COUNT(*) AS n, SUM(conv) AS c
  FROM u GROUP BY 1
), w AS (
  -- COALESCE: an absent variant must read 0 exactly like the
  -- engine's cells.get(v, (0, 0)) default, not NULL
  SELECT CAST(COALESCE(MAX(CASE WHEN variant = 0 THEN n END), 0)
              AS HUGEINT) AS na,
         CAST(COALESCE(MAX(CASE WHEN variant = 0 THEN c END), 0)
              AS HUGEINT) AS ca,
         CAST(COALESCE(MAX(CASE WHEN variant = 1 THEN n END), 0)
              AS HUGEINT) AS nb,
         CAST(COALESCE(MAX(CASE WHEN variant = 1 THEN c END), 0)
              AS HUGEINT) AS cb
  FROM v
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(ca AS BIGINT) AS conv_a,
       CAST(CASE WHEN na > 0 THEN 1000 * ca // na ELSE 0 END AS BIGINT)
         AS rate_a_milli,
       CAST(nb AS BIGINT) AS n_b, CAST(cb AS BIGINT) AS conv_b,
       CAST(CASE WHEN nb > 0 THEN 1000 * cb // nb ELSE 0 END AS BIGINT)
         AS rate_b_milli,
       CAST(CASE WHEN (ca + cb) > 0 AND (ca + cb) < (na + nb)
                  AND 10000 * (ca*nb - cb*na) * (ca*nb - cb*na)
                      * (na + nb)
                      > 38416 * na * nb * (ca + cb)
                        * (na + nb - ca - cb)
            THEN 1 ELSE 0 END AS BIGINT) AS significant
FROM w
"""


# ----------------------------------------------- seasonal-naive backtest
BT_CUTOFF = "2024-01-22"


def q_seasonal_backtest(sf_dir: str) -> pd.DataFrame:
    """Forecast-quality backtest: a seasonal-naive model (per
    (day-of-week, hour) mean value learned on events BEFORE the
    cutoff) scored by MAE on events after it — the temporal
    train/evaluate loop as one distributed query.  Day-of-week comes
    from pure epoch arithmetic ((days + 4) % 7) so neither engine's
    calendar convention leaks in; all errors are exact scaled ints.

    Shape at scale: pass 1 reduces train events to a 168-cell
    (dow, hour) model (per-batch partials, bounded merge); the model
    broadcasts into pass 2, which sums |1000*cents - mean_milli| per
    batch — two scans, zero shuffles."""
    cut = int(pd.Timestamp(BT_CUTOFF).value // 1_000_000_000)
    ds = _pq(sf_dir, "events", ["ts", "value"])

    def keyed(df: pd.DataFrame):
        s = np.asarray(_epoch_s(df.ts))
        dow = (s // 86400 + 4) % 7
        hour = (s % 86400) // 3600
        return s, dow * 24 + hour, _cents(df.value)

    def train_part(df: pd.DataFrame) -> pd.DataFrame:
        s, key, cents = keyed(df)
        m = s < cut
        g = pd.DataFrame({"key": key[m], "n": 1, "cents": cents[m]})
        return (g.groupby("key", as_index=False)
                .agg(n=("n", "sum"), cents=("cents", "sum"))
                .astype(np.int64))

    tp = (ds.map_batches(train_part, batch_format="pandas").to_pandas()
          .groupby("key", as_index=False)
          .agg(n=("n", "sum"), cents=("cents", "sum")))
    lookup = np.zeros(168, dtype=np.int64)    # (dow, hour) model table
    for r in tp.itertuples():
        lookup[int(r.key)] = (1000 * int(r.cents)) // int(r.n)
    n_cells = len(tp)

    def test_part(df: pd.DataFrame) -> pd.DataFrame:
        s, key, cents = keyed(df)
        m = s >= cut
        pred = lookup[key[m]]                 # vectorized 168-cell map
        err = np.abs(1000 * cents[m] - pred)
        return pd.DataFrame({"n": [np.int64(m.sum())],
                             "abs_err": [np.int64(err.sum())]})

    te = ds.map_batches(test_part, batch_format="pandas").to_pandas()
    n_test, abs_err = int(te.n.sum()), int(te.abs_err.sum())
    return pd.DataFrame([{
        "n_train": int(tp.n.sum()),
        "n_test": n_test,
        "n_model_cells": n_cells,
        "sum_abs_err_millicents": abs_err,
        "mae_millicents": abs_err // n_test if n_test else 0,
    }]).astype(np.int64)


SQL_SEASONAL_BACKTEST = f"""
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS s,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), k AS (
  SELECT s, cents,
         ((s // 86400 + 4) % 7) * 24 + (s % 86400) // 3600 AS key
  FROM e
), model AS (
  SELECT key, CAST(1000 * SUM(cents) // COUNT(*) AS BIGINT)
           AS mean_milli
  FROM k WHERE s < epoch(TIMESTAMP '{BT_CUTOFF}') GROUP BY 1
), test AS (
  SELECT k.cents, COALESCE(m.mean_milli, 0) AS pred
  FROM k LEFT JOIN model m ON m.key = k.key
  WHERE k.s >= epoch(TIMESTAMP '{BT_CUTOFF}')
)
SELECT CAST((SELECT SUM(1) FROM k
             WHERE s < epoch(TIMESTAMP '{BT_CUTOFF}')) AS BIGINT)
         AS n_train,
       CAST((SELECT COUNT(*) FROM test) AS BIGINT) AS n_test,
       CAST((SELECT COUNT(*) FROM model) AS BIGINT) AS n_model_cells,
       CAST((SELECT SUM(abs(1000 * cents - pred)) FROM test) AS BIGINT)
         AS sum_abs_err_millicents,
       CAST((SELECT SUM(abs(1000 * cents - pred)) FROM test)
            // (SELECT COUNT(*) FROM test) AS BIGINT) AS mae_millicents
"""


# --------------------------------------- two-sample KS distribution test
KS_A, KS_B = "purchase", "click"


def q_events_ks_test(sf_dir: str) -> pd.DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between the value
    distributions of two event types — the distribution-drift test a
    pipeline runs before trusting that two cohorts/sources are
    exchangeable.  Exact integers throughout: with counts a_i, b_i per
    cents value, D = max_i |A_i*nb - B_i*na| (A,B cumulative), and
    ks_milli = 1000*D // (na*nb).

    Shape at scale: the exchange is a per-batch (cents, group) count
    histogram — bounded by the VALUE RESOLUTION (distinct cents), not
    the corpus — merged in one cents-bucketed exchange; the ordered
    cumulative scan runs driver-side over that resolution-bounded
    histogram (a corpus-sized value domain would swap in the
    range-partitioned prefix machinery of late_events/value_drawdown)."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.event_type.isin([KS_A, KS_B]).to_numpy()
        d = df[keep]
        g = pd.DataFrame({
            "cents": _cents(d.value),
            "ga": (d.event_type == KS_A).to_numpy().astype(np.int64)})
        g["gb"] = 1 - g.ga
        return (g.groupby("cents", as_index=False)
                .agg(a=("ga", "sum"), b=("gb", "sum")).astype(np.int64))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("cents", as_index=False)
                .agg(a=("a", "sum"), b=("b", "sum")).astype(np.int64))

    hist = (bucketed_group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["cents"], merge, num_buckets=16).to_pandas()
        .sort_values("cents"))
    na, nb = int(hist.a.sum()), int(hist.b.sum())
    ca = hist.a.to_numpy().cumsum()
    cb = hist.b.to_numpy().cumsum()
    d = int(np.abs(ca.astype(object) * nb
                   - cb.astype(object) * na).max()) if len(hist) else 0
    return pd.DataFrame([{
        "n_a": na, "n_b": nb,
        "n_values": len(hist),
        "d_scaled": d,
        "ks_milli": (1000 * d) // (na * nb) if na and nb else 0,
    }]).astype(np.int64)


SQL_EVENTS_KS_TEST = f"""
WITH h AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
         SUM(CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN event_type = '{KS_B}' THEN 1 ELSE 0 END) AS b
  FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
  GROUP BY 1
), c AS (
  SELECT cents,
         SUM(a) OVER (ORDER BY cents) AS ca,
         SUM(b) OVER (ORDER BY cents) AS cb
  FROM h
), t AS (
  SELECT CAST((SELECT SUM(a) FROM h) AS HUGEINT) AS na,
         CAST((SELECT SUM(b) FROM h) AS HUGEINT) AS nb
)
SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
       CAST((SELECT COUNT(*) FROM h) AS BIGINT) AS n_values,
       CAST((SELECT MAX(abs(CAST(ca AS HUGEINT) * t.nb
                            - CAST(cb AS HUGEINT) * t.na)) FROM c)
            AS BIGINT) AS d_scaled,
       CAST(1000 * (SELECT MAX(abs(CAST(ca AS HUGEINT) * t.nb
                                   - CAST(cb AS HUGEINT) * t.na))
                    FROM c) // (t.na * t.nb) AS BIGINT) AS ks_milli
FROM t
"""


ANALYTICS_QUERIES = {
    "shard_manifest": (q_shard_manifest, SQL_SHARD_MANIFEST),
    "events_ks_test": (q_events_ks_test, SQL_EVENTS_KS_TEST),
    "ab_test_eval": (q_ab_test_eval, SQL_AB_TEST_EVAL),
    "seasonal_backtest": (q_seasonal_backtest, SQL_SEASONAL_BACKTEST),
    "split_leakage_audit": (q_split_leakage_audit,
                            SQL_SPLIT_LEAKAGE_AUDIT),
    "coordinated_sample": (q_coordinated_sample, SQL_COORDINATED_SAMPLE),
    "zone_prune_audit": (q_zone_prune_audit, SQL_ZONE_PRUNE_AUDIT),
    "nation_revenue_share": (q_nation_revenue_share,
                             SQL_NATION_REVENUE_SHARE),
    "events_did": (q_events_did, SQL_EVENTS_DID),
    "parts_coordered": (q_parts_coordered, SQL_PARTS_COORDERED),
    "brand_pareto": (q_brand_pareto, SQL_BRAND_PARETO),
    "shipping_priority": (q_shipping_priority, SQL_SHIPPING_PRIORITY),
    "source_lang_chi2": (q_source_lang_chi2, SQL_SOURCE_LANG_CHI2),
    "event_gaps": (q_event_gaps, SQL_EVENT_GAPS),
    "user_scd2": (q_user_scd2, SQL_USER_SCD2),
    "customer_quartiles": (q_customer_quartiles, SQL_CUSTOMER_QUARTILES),
    "nation_top_names": (q_nation_top_names, SQL_NATION_TOP_NAMES),
    "doc_sentences": (q_doc_sentences, SQL_DOC_SENTENCES),
    "weighted_sample": (q_weighted_sample, SQL_WEIGHTED_SAMPLE),
    "k_anonymity": (q_k_anonymity, SQL_K_ANONYMITY),
    "regional_revenue": (q_regional_revenue, SQL_REGIONAL_REVENUE),
    "orders_moving_sum": (q_orders_moving_sum, SQL_ORDERS_MOVING_SUM),
    "session_overlap": (q_session_overlap, SQL_SESSION_OVERLAP),
    "snapshot_diff": (q_snapshot_diff, SQL_SNAPSHOT_DIFF),
    "cohort_retention": (q_cohort_retention, SQL_COHORT_RETENTION),
    "events_daily_ohlc": (q_events_daily_ohlc, SQL_EVENTS_DAILY_OHLC),
    "user_twap": (q_user_twap, SQL_USER_TWAP),
    "events_trailing_1h": (q_events_trailing_1h, SQL_EVENTS_TRAILING_1H),
    "user_top_type": (q_user_top_type, SQL_USER_TOP_TYPE),
    "order_balance_audit": (q_order_balance_audit, SQL_ORDER_BALANCE_AUDIT),
    "brand_type_cube": (q_brand_type_cube, SQL_BRAND_TYPE_CUBE),
    "value_winsor_mean": (q_value_winsor_mean, SQL_VALUE_WINSOR_MEAN),
    "orders_profile": (q_orders_profile, SQL_ORDERS_PROFILE),
    "rolling_wau": (q_rolling_wau, SQL_ROLLING_WAU),
    "events_mad": (q_events_mad, SQL_EVENTS_MAD),
    "order_allocation": (q_order_allocation, SQL_ORDER_ALLOCATION),
    "event_percentile": (q_event_percentile, SQL_EVENT_PERCENTILE),
    "events_interpolated": (q_events_interpolated, SQL_EVENTS_INTERPOLATED),
    "priority_gini": (q_priority_gini, SQL_PRIORITY_GINI),
    "zorder_layout": (q_zorder_layout, SQL_ZORDER_LAYOUT),
    "late_events": (q_late_events, SQL_LATE_EVENTS),
    "type_trend": (q_type_trend, SQL_TYPE_TREND),
    "value_quantile_sketch": (q_value_quantile_sketch, None),
    "custdist": (q_custdist, SQL_CUSTDIST),
    "user_streaks": (q_user_streaks, SQL_USER_STREAKS),
    "idle_balance": (q_idle_balance, SQL_IDLE_BALANCE),
    "table_checksum": (q_table_checksum, SQL_TABLE_CHECKSUM),
    "small_qty_revenue": (q_small_qty_revenue, SQL_SMALL_QTY_REVENUE),
    "fk_audit": (q_fk_audit, SQL_FK_AUDIT),
    "first_touch": (q_first_touch, SQL_FIRST_TOUCH),
    "user_kendall": (q_user_kendall, SQL_USER_KENDALL),
    "disjunctive_revenue": (q_disjunctive_revenue,
                            SQL_DISJUNCTIVE_REVENUE),
    "market_share": (q_market_share, SQL_MARKET_SHARE),
    "above_median_orders": (q_above_median_orders,
                            SQL_ABOVE_MEDIAN_ORDERS),
    "orders_yoy": (q_orders_yoy, SQL_ORDERS_YOY),
    "returned_revenue": (q_returned_revenue, SQL_RETURNED_REVENUE),
    "promo_share": (q_promo_share, SQL_PROMO_SHARE),
    "top_supplier": (q_top_supplier, SQL_TOP_SUPPLIER),
    "event_seasonality": (q_event_seasonality, SQL_EVENT_SEASONALITY),
}
