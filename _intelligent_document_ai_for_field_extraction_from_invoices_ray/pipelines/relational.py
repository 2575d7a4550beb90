"""Relational operator suite over the TPC-H-ish testdata tables.

Demonstrates the engine's general operator coverage (SURVEY.md §2.4-§2.7
join/aggregate/sort/dedup families) Ray-Data-first, each with a DuckDB
oracle registered in ``__ray_entry__.oracle_sql``:

- grouped aggregation with a per-batch partial combiner (no raw-row shuffle)
- broadcast hash join (small side via ``ray.put``, zero shuffle)
- explicit bucketed hash join for two large sides (the portable pattern:
  co-partition by key-hash bucket, join per bucket)
- sort + limit (top-k), distinct, windowed/grouped event analytics,
  running totals per key, JSON field extraction

Float discipline: every aggregate is exact-integer arithmetic (money in
cents / scaled units) so Ray and DuckDB agree bit-for-bit regardless of
summation order — floating-point sums are NOT associative and DuckDB
rounds half-away-from-zero while numpy rounds half-even, so raw double
aggregates would be flaky oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd


def _pq(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr) -> np.ndarray:
    """Exact cents from a 2-decimal double column (never lands on .5)."""
    return np.round(np.asarray(arr, dtype=np.float64) * 100).astype(np.int64)


# ------------------------------------------------------------ q_pricing_summary
def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-style pricing summary with partial per-batch combining.

    Each batch pre-aggregates to ≤ |flag×status| rows before the groupby,
    so the shuffle moves O(groups × blocks) rows, not O(n).
    """
    ds = _pq(sf_dir, "lineitem",
             ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
              "l_discount", "l_tax", "l_shipdate"])

    cutoff = np.datetime64("1998-09-02T00:00:00")

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        df = df[df.l_shipdate.to_numpy() <= cutoff]
        if df.empty:
            return pd.DataFrame(columns=["l_returnflag", "l_linestatus", "sum_qty",
                                         "sum_base_cents", "sum_disc_scaled",
                                         "sum_charge_scaled", "count_order"])
        ext_c = _cents(df.l_extendedprice)
        disc_pct = _cents(df.l_discount)       # 0..100 scaled by 100? -> actually x100
        tax_pct = _cents(df.l_tax)
        disc_scaled = ext_c * (100 - disc_pct)
        charge_scaled = disc_scaled * (100 + tax_pct)
        out = pd.DataFrame({
            "l_returnflag": df.l_returnflag, "l_linestatus": df.l_linestatus,
            "qty": df.l_quantity.astype(np.int64), "base": ext_c,
            "disc": disc_scaled, "charge": charge_scaled,
        })
        g = out.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("qty", "sum"), sum_base_cents=("base", "sum"),
            sum_disc_scaled=("disc", "sum"), sum_charge_scaled=("charge", "sum"),
            count_order=("qty", "size"))
        return g

    from ray.data.aggregate import Sum

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    out = (partials.groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_base_cents", alias_name="sum_base_cents"),
                      Sum("sum_disc_scaled", alias_name="sum_disc_scaled"),
                      Sum("sum_charge_scaled", alias_name="sum_charge_scaled"),
                      Sum("count_order", alias_name="count_order"))
           .to_pandas())
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


SQL_PRICING_SUMMARY = """
WITH t AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS ext_c,
         CAST(round(l_discount * 100) AS BIGINT) AS disc_pct,
         CAST(round(l_tax * 100) AS BIGINT) AS tax_pct
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
SELECT l_returnflag, l_linestatus,
       CAST(SUM(qty) AS BIGINT) AS sum_qty,
       CAST(SUM(ext_c) AS BIGINT) AS sum_base_cents,
       CAST(SUM(ext_c * (100 - disc_pct)) AS BIGINT) AS sum_disc_scaled,
       CAST(SUM(ext_c * (100 - disc_pct) * (100 + tax_pct)) AS BIGINT) AS sum_charge_scaled,
       COUNT(*) AS count_order
FROM t GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------ q_revenue_filter
def q_revenue_filter(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q6-style predicate + global sum (column-pruned read)."""
    ds = _pq(sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount",
                                  "l_shipdate"])
    lo = np.datetime64("1996-01-01T00:00:00")
    hi = np.datetime64("1997-01-01T00:00:00")

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        sd = df.l_shipdate.to_numpy()
        disc_pct = _cents(df.l_discount)
        mask = ((sd >= lo) & (sd < hi) & (disc_pct >= 5) & (disc_pct <= 7)
                & (df.l_quantity.to_numpy() < 24))
        ext_c = _cents(df.l_extendedprice[mask])
        rev = (ext_c * disc_pct[mask]).sum()
        return pd.DataFrame({"revenue_scaled": [int(rev)]})

    total = (ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
             .to_pandas()["revenue_scaled"].sum())
    return pd.DataFrame({"revenue_scaled": [int(total)]})


SQL_REVENUE_FILTER = """
SELECT CAST(COALESCE(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
           * CAST(round(l_discount*100) AS BIGINT)), 0) AS BIGINT) AS revenue_scaled
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND CAST(round(l_discount*100) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


# ------------------------------------------------------------ broadcast join
def broadcast_lookup(ds: rd.Dataset, small_df: pd.DataFrame, key: str,
                     batch_size: int = 65536,
                     how: str = "left") -> rd.Dataset:
    """Join a small dimension into a big fact table with zero shuffle:
    the small side ships once via ``ray.put`` and maps per batch."""
    ref = ray.put(small_df)

    def join_batch(batch: pa.Table) -> pd.DataFrame:
        small = ray.get(ref)
        return batch.to_pandas().merge(small, on=key, how=how)

    return ds.map_batches(join_batch, batch_format="pyarrow", batch_size=batch_size)


def q_segment_sales(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer → per-segment totals.  Customer SCALES with the
    corpus, so the join routes through ``auto_join``: broadcast while it
    fits under BROADCAST_ROW_LIMIT, bucketed hash join beyond (a
    hand-applied ``to_pandas()`` broadcast here was a driver+worker OOM
    at 100× — round-3 verdict)."""
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["price_c"] = _cents(df.o_totalprice)
        g = df.groupby("c_mktsegment", as_index=False).agg(
            n_orders=("price_c", "size"), total_cents=("price_c", "sum"))
        return g

    from ray.data.aggregate import Sum

    joined = auto_join(orders, cust, "o_custkey", "c_custkey")
    out = (joined.map_batches(partial, batch_format="pandas")
           .groupby("c_mktsegment")
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("total_cents", alias_name="total_cents"))
           .to_pandas())
    return out.sort_values("c_mktsegment").reset_index(drop=True)


SQL_SEGMENT_SALES = """
SELECT c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# ------------------------------------------------------------ bucketed hash join
def bucketed_hash_join(left: rd.Dataset, right: rd.Dataset,
                       left_on: str, right_on: str,
                       num_buckets: int = 32) -> rd.Dataset:
    """Explicit partitioned hash join for two large sides (guide pattern):
    co-partition by key-hash bucket with ONE union groupby
    (``grouping.bucketed_cogroup``) and pandas-merge inside each bucket.
    Skewed keys can be salted by raising ``num_buckets``.

    Benchmarked against Ray's native ``Dataset.join`` on priority_revenue
    at sf0.1/32cpu: bucketed 2.91 s vs native 2.96 s (best-of-2) — a tie;
    this portable pattern stays the default, the native path is exercised
    by q_segment_status_native."""
    from .grouping import bucketed_cogroup

    def join_bucket(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        return lf.merge(rf, left_on=left_on, right_on=right_on, how="inner")

    return bucketed_cogroup(left, right, [left_on], [right_on],
                            join_bucket, num_buckets=num_buckets)


# a broadcast side must fit comfortably in EVERY worker's heap alongside
# a batch; ~200k narrow rows ≈ tens of MB.  Tune per deployment — it is
# a memory bound, not a performance crossover (broadcast wins whenever
# it is safe, because it removes the shuffle entirely).
BROADCAST_ROW_LIMIT = 200_000


def auto_join(big: rd.Dataset, small: rd.Dataset,
              big_on: str, small_on: str,
              num_buckets: int = 32) -> rd.Dataset:
    """Join planner: broadcast the small side when its row count (cheap —
    parquet metadata / block metadata, no data scan for simple reads) is
    under ``BROADCAST_ROW_LIMIT``, else co-partition both sides with the
    bucketed hash join.  Inner join on big_on == small_on.

    This encodes the policy the query suite applies by hand
    (``segment_sales``/``supplier_nation`` broadcast dimensions;
    ``priority_revenue``'s order side shuffles): broadcast eliminates the
    all-to-all entirely and is strictly better whenever the side fits in
    worker memory — the limit is a safety bound, not a crossover."""
    n = small.count()
    if n <= BROADCAST_ROW_LIMIT:
        sdf = small.to_pandas()
        if small_on != big_on:
            sdf = sdf.rename(columns={small_on: big_on})
        return broadcast_lookup(big, sdf, big_on, how="inner")
    return bucketed_hash_join(big, small, big_on, small_on,
                              num_buckets=num_buckets)


def q_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """lineitem ⋈ orders → revenue by order priority, with the
    aggregation pushed BELOW the join: lineitem pre-aggregates to
    per-orderkey partials inside ``map_batches`` (the combiner), the
    partials co-group with orders on the key buckets, and each bucket
    reduces straight to its 5 priority rows — ONE union shuffle carrying
    ~1 row per (batch, orderkey) instead of raw lineitem, and the final
    reduce is a driver-side merge of buckets × 5 rows."""
    from .grouping import bucketed_cogroup

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = _cents(df.l_extendedprice) * (100 - _cents(df.l_discount))
        return (df.assign(revenue=rev)
                .groupby("l_orderkey", as_index=False)
                .agg(n_items=("revenue", "size"),
                     revenue_scaled=("revenue", "sum")))

    lp = li.map_batches(li_partial, batch_format="pandas")

    def per_bucket(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if lf.empty or rf.empty:
            return pd.DataFrame({
                "o_orderpriority": pd.Series(dtype=object),
                "n_items": pd.Series(dtype=np.int64),
                "revenue_scaled": pd.Series(dtype=np.int64)})
        m = lf.merge(rf.rename(columns={"o_orderkey": "l_orderkey"}),
                     on="l_orderkey")
        return m.groupby("o_orderpriority", as_index=False).agg(
            n_items=("n_items", "sum"),
            revenue_scaled=("revenue_scaled", "sum"))

    out = bucketed_cogroup(lp, orders, ["l_orderkey"], ["o_orderkey"],
                           per_bucket).to_pandas()
    out = out.groupby("o_orderpriority", as_index=False).agg(
        n_items=("n_items", "sum"), revenue_scaled=("revenue_scaled", "sum"))
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_PRIORITY_REVENUE = """
SELECT o_orderpriority,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) AS revenue_scaled
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ------------------------------------------------------------ dim chain
def q_region_customers(sf_dir: str) -> pd.DataFrame:
    """customer ⋈ nation ⋈ region via a broadcast dimension chain.

    nation (25 rows) and region (5 rows) are FIXED-cardinality dims —
    they do not scale with the corpus, so the driver-side chain merge is
    O(1) and the unconditional broadcast is safe at any scale (the
    scaling side, customer, streams through ``map_batches``).  Joins
    whose small side scales route through ``auto_join`` instead
    (q_segment_sales)."""
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _pq(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    dim = dim.rename(columns={"n_nationkey": "c_nationkey"})[["c_nationkey", "r_name"]]
    cust = _pq(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["bal_c"] = _cents(df.c_acctbal)
        return df.groupby("r_name", as_index=False).agg(
            n_customers=("bal_c", "size"), total_acctbal_cents=("bal_c", "sum"))

    from ray.data.aggregate import Sum

    out = (broadcast_lookup(cust, dim, "c_nationkey")
           .map_batches(partial, batch_format="pandas")
           .groupby("r_name")
           .aggregate(Sum("n_customers", alias_name="n_customers"),
                      Sum("total_acctbal_cents", alias_name="total_acctbal_cents"))
           .to_pandas())
    return out.sort_values("r_name").reset_index(drop=True)


SQL_REGION_CUSTOMERS = """
SELECT r_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS total_acctbal_cents
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name ORDER BY r_name
"""


# ------------------------------------------------------------ sort / limit
def q_top_orders(sf_dir: str) -> pd.DataFrame:
    """Global top-10 orders by price.  Top-k is a semilattice: each
    batch emits its local top-10, a second combine level re-reduces the
    partials in ~16 blocks (block-count-independent driver pull — at
    800k input blocks the driver sees ≤160 rows, not 8M), and the
    driver merges that — no all-to-all sort of the table for 10 output
    rows (``sort().limit()`` would shuffle everything)."""
    from .grouping import two_level_combine

    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def partial_topk(batch: pa.Table) -> pa.Table:
        cents = _cents(batch.column("o_totalprice").to_numpy())
        keys = batch.column("o_orderkey").to_numpy()
        idx = np.lexsort((keys, -cents))[:10]
        out = batch.take(pa.array(idx))
        return (out.append_column("price_cents", pa.array(cents[idx]))
                .drop_columns(["o_totalprice"]).replace_schema_metadata(None))

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["price_cents", "o_orderkey"],
                              ascending=[False, True]).head(10)

    parts = two_level_combine(
        ds.map_batches(partial_topk, batch_format="pyarrow"),
        combine, num_blocks=16).to_pandas()
    out = parts.sort_values(["price_cents", "o_orderkey"],
                            ascending=[False, True]).head(10)
    return (out[["o_orderkey", "o_custkey", "price_cents"]]
            .reset_index(drop=True))


SQL_TOP_ORDERS = """
SELECT o_orderkey, o_custkey,
       CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
FROM orders ORDER BY price_cents DESC, o_orderkey LIMIT 10
"""


def q_distinct_flags(sf_dir: str) -> pd.DataFrame:
    """Distinct (returnflag, linestatus) pairs.  Distinct is a
    semilattice: each batch emits its local distinct pairs (≤ |flag ×
    status| rows), a second combine level re-dedups the partials in
    ~16 blocks (driver pull independent of input block count), and the
    driver unions that — no shuffle of the full table for a handful of
    output rows."""
    from .grouping import two_level_combine

    ds = _pq(sf_dir, "lineitem", ["l_returnflag", "l_linestatus"])

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    out = (two_level_combine(ds.map_batches(uniq, batch_format="pandas"),
                             uniq, num_blocks=16)
           .to_pandas().drop_duplicates())
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


SQL_DISTINCT_FLAGS = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------ events
def q_events_hourly(sf_dir: str) -> rd.Dataset:
    """Tumbling-hour window per user: count + exact-cents sum.

    ~10^5 output groups → the coarse-bucket pattern (grouping.py): one
    shuffle into 64 key-hash buckets, vectorized pandas agg per bucket."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["ts", "user_id", "value"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        ns = df.ts.astype("datetime64[ns]").astype("int64")
        return pd.DataFrame({"user_id": df.user_id,
                             "hour_bucket": (ns // 3_600_000_000_000).astype(np.int64),
                             "v": _cents(df.value)})

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "hour_bucket"], as_index=False).agg(
            n_events=("v", "size"), value_cents=("v", "sum"))

    return bucketed_group_apply(ds.map_batches(prep, batch_format="pandas"),
                                ["user_id", "hour_bucket"],
                                agg).sort(["user_id", "hour_bucket"])


SQL_EVENTS_HOURLY = """
SELECT user_id,
       CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_bucket,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_events_hourly_incremental(sf_dir: str) -> rd.Dataset:
    """Incremental view maintenance: the hourly aggregate built from
    THREE chronological micro-batches — each chunk aggregates
    independently and ``materialize()``s (≙ the checkpointed view state
    a streaming job persists between arrivals), then the states merge
    with the SAME combine — provably equal to the batch answer because
    (count, sum) partials form a semilattice.  Same oracle as
    ``events_hourly``: the incremental path must be bit-equal to batch.

    Exchange: each chunk pays one bucketed shuffle over ITS rows only
    (≙ per-arrival work in a real stream); the merge shuffles just
    3 × |view| partial rows, never raw events."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["ts", "user_id", "value"])

    def mm(batch: pa.Table) -> pa.Table:
        ns = batch.column("ts").cast(pa.int64()).to_numpy() * 1_000
        return pa.table({"lo": pa.array([int(ns.min())], pa.int64()),
                         "hi": pa.array([int(ns.max())], pa.int64())})

    bounds = ds.map_batches(mm, batch_format="pyarrow").to_pandas()
    lo, hi = int(bounds.lo.min()), int(bounds.hi.max()) + 1
    cuts = [lo, lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3, hi]

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "hour_bucket"], as_index=False).agg(
            n_events=("v", "size"), value_cents=("v", "sum"))

    states = []
    for i in range(3):
        a, b = cuts[i], cuts[i + 1]

        def prep(df: pd.DataFrame, _a=a, _b=b) -> pd.DataFrame:
            ns = df.ts.astype("datetime64[ns]").astype("int64")
            keep = (ns >= _a) & (ns < _b)
            return pd.DataFrame({
                "user_id": df.user_id[keep],
                "hour_bucket": (ns[keep] // 3_600_000_000_000)
                .astype(np.int64),
                "v": _cents(df.value[keep])})

        state = bucketed_group_apply(
            ds.map_batches(prep, batch_format="pandas"),
            ["user_id", "hour_bucket"], agg, num_buckets=16).materialize()
        states.append(state)

    def remerge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["user_id", "hour_bucket"], as_index=False).agg(
            n_events=("n_events", "sum"), value_cents=("value_cents", "sum"))

    merged = states[0].union(states[1]).union(states[2])
    return bucketed_group_apply(merged, ["user_id", "hour_bucket"],
                                remerge, num_buckets=16).sort(
        ["user_id", "hour_bucket"])


# ------------------------------------------------------------ sliding window
SLIDE_W = 3600          # window length (s)
SLIDE_S = 900           # slide step (s) — W/S = 4 windows per event


def q_events_sliding(sf_dir: str) -> rd.Dataset:
    """SLIDING-window aggregate per event type: 1-hour windows sliding
    every 15 minutes (count + exact-cents sum per (event_type,
    window_start)).  Completes the window family: tumbling
    (events_hourly), session (user_sessions), range (event_followers),
    as-of (asof_latest_order) — this is the overlapping-window shape a
    streaming engine would maintain incrementally.

    Distributed shape: each event belongs to exactly W/S = 4 windows
    (window starts are the 4 slide ticks in (t−W, t]), so one
    ``map_batches`` replicates each row 4× with vectorized numpy (a
    bounded, shuffle-free expansion — the streaming-window analog of
    the pair-grid's bounded replication), pre-aggregates within the
    batch, and ONE bucketed shuffle sums the partials.  Exchange ≤
    4·rows but ≤ (types × windows-per-batch) after the in-batch
    combine."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["ts", "event_type", "value"])
    reps = SLIDE_W // SLIDE_S

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        sec = (df.ts.astype("datetime64[ns]").astype("int64")
               // 1_000_000_000).to_numpy()
        v = _cents(df.value)
        base = sec // SLIDE_S
        frames = []
        for i in range(reps):
            frames.append(pd.DataFrame({
                "event_type": df.event_type.to_numpy(),
                "window_start": (base - i) * SLIDE_S,
                "v": v}))
        out = pd.concat(frames, ignore_index=True)
        # in-batch combine: the exchange ships (type, window) partials
        return out.groupby(["event_type", "window_start"],
                           as_index=False).agg(n_events=("v", "size"),
                                               value_cents=("v", "sum"))

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "window_start"],
                          as_index=False).agg(
            n_events=("n_events", "sum"),
            value_cents=("value_cents", "sum"))

    return bucketed_group_apply(
        ds.map_batches(prep, batch_format="pandas"),
        ["event_type", "window_start"], agg,
        num_buckets=16).sort(["event_type", "window_start"])


# every event joins the 4 windows whose start lies in (t-W, t]; with
# W = 4*S those are exactly starts (sec//S - i)*S for i in 0..3
SQL_EVENTS_SLIDING = f"""
WITH e AS (
  SELECT event_type,
         CAST(round(value*100) AS BIGINT) AS v,
         -- floor(x / S), not x // S: DuckDB's // truncates toward zero
         -- (-7 // 2 = -3) while the engine's numpy path floors
         -- (-7 // 2 = -4); floor() keeps pre-1970 timestamps in the
         -- same window on both sides
         CAST(floor(epoch(ts) / {SLIDE_S}) AS BIGINT) AS tick
  FROM events
), w AS (
  SELECT event_type, v, (tick - i) * {SLIDE_S} AS window_start
  FROM e CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)
)
SELECT event_type, window_start,
       COUNT(*) AS n_events,
       CAST(SUM(v) AS BIGINT) AS value_cents
FROM w GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_events_top3_per_type(sf_dir: str) -> pd.DataFrame:
    """Grouped top-k: 3 highest-value events per type.

    Top-k is a semilattice (top-3 of a union == top-3 of per-part
    top-3s under the same total order), so a per-batch combiner keeps
    only 3 rows per type per batch before the shuffle — the exchange is
    O(3 · types · blocks), not O(events).  The merge runs through the
    coarse-bucket pattern (one key-hash shuffle, vectorized rank per
    bucket) rather than raw ``map_groups``, so a high-cardinality key
    costs num_buckets Python calls, not one per group."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "event_type", "value"])

    def _top3(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "value_cents", "event_id"],
                            ascending=[True, False, True])
        keep = df.groupby("event_type").cumcount() < 3
        return df.loc[keep, ["event_type", "event_id", "value_cents"]]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return _top3(df.assign(value_cents=_cents(df.value)))

    out = bucketed_group_apply(
        ds.map_batches(combine, batch_format="pandas"),
        ["event_type"], _top3, num_buckets=8).to_pandas()
    return out.sort_values(["event_type", "value_cents", "event_id"],
                           ascending=[True, False, True]).reset_index(drop=True)


SQL_EVENTS_TOP3 = """
SELECT event_type, event_id, value_cents FROM (
  SELECT event_type, event_id,
         CAST(round(value*100) AS BIGINT) AS value_cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY CAST(round(value*100) AS BIGINT) DESC,
                                     event_id) AS rn
  FROM events) WHERE rn <= 3
ORDER BY event_type, value_cents DESC, event_id
"""


def q_events_json(sf_dir: str) -> pd.DataFrame:
    """JSON prop extraction (vectorized per batch) + grouped sum."""
    import json

    ds = _pq(sf_dir, "events", ["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks = df.props.map(lambda s: int(json.loads(s)["k"]))
        out = pd.DataFrame({"event_type": df.event_type, "k": ks})
        return out.groupby("event_type", as_index=False).agg(
            n=("k", "size"), k_total=("k", "sum"))

    from ray.data.aggregate import Sum

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("n", alias_name="n"), Sum("k_total", alias_name="k_total"))
           .to_pandas())
    return out.sort_values("event_type").reset_index(drop=True)


SQL_EVENTS_JSON = """
SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_total
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_running_spend(sf_dir: str) -> rd.Dataset:
    """Per-customer running order spend (windowed cumulative sum)."""
    ds = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice",
                                "o_orderdate"])

    def running(df: pd.DataFrame) -> pd.DataFrame:
        # vectorized per bucket: sort once, grouped cumulative sum
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        df = df.assign(price_c=_cents(df.o_totalprice))
        df["running_spend_cents"] = df.groupby("o_custkey").price_c.cumsum()
        return df[["o_orderkey", "running_spend_cents"]]

    from .grouping import bucketed_group_apply

    return bucketed_group_apply(ds, ["o_custkey"], running).sort("o_orderkey")


SQL_RUNNING_SPEND = """
SELECT o_orderkey,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_spend_cents
FROM orders ORDER BY o_orderkey
"""




# ------------------------------------------------------------ as-of join
def q_asof_latest_order(sf_dir: str) -> rd.Dataset:
    """As-of join: each event matched to the latest prior order of the
    customer with custkey == user_id.  BOTH large sides shuffle into the
    same key-hash buckets (``bucketed_cogroup``) and ``pd.merge_asof``
    runs per bucket — no side is materialized on the driver or broadcast.
    The right side is first deduped to one order per (custkey, orderdate)
    [max orderkey], distributed, so tie semantics are deterministic and
    match the SQL oracle."""
    from .grouping import bucketed_cogroup, bucketed_group_apply

    events = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"])

    def dedup_orders(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["o_custkey", "o_orderdate"], as_index=False).agg(
            o_orderkey=("o_orderkey", "max"))

    o_dedup = bucketed_group_apply(orders, ["o_custkey"], dedup_orders,
                                   num_buckets=32)

    def asof_bucket(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if lf.empty or rf.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype=np.int64),
                                 "o_orderkey": pd.Series(dtype=np.int64)})
        out = pd.merge_asof(lf.sort_values("ts"),
                            rf.sort_values("o_orderdate"),
                            left_on="ts", right_on="o_orderdate",
                            left_by="user_id", right_by="o_custkey",
                            direction="backward")
        out = out[out.o_orderkey.notna()]
        return pd.DataFrame({"event_id": out.event_id,
                             "o_orderkey": out.o_orderkey.astype(np.int64)})

    return bucketed_cogroup(events, o_dedup, ["user_id"], ["o_custkey"],
                            asof_bucket, num_buckets=32).sort("event_id")


SQL_ASOF_LATEST_ORDER = """
WITH o AS (
  SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, o.o_orderkey
FROM events e ASOF JOIN o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
"""


# ------------------------------------------------------------ semi / anti
def _distinct_keys(ds: rd.Dataset, key: str,
                   batch_filter=None) -> rd.Dataset:
    """Per-batch key dedup (vectorized combiner) — shrinks the semi/anti
    exchange to near-distinct keys before the co-group shuffle."""
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        if batch_filter is not None:
            batch = batch.filter(batch_filter(batch))
        return pa.table({key: pc.unique(batch.column(key))})

    return ds.map_batches(fn, batch_format="pyarrow")


def q_customers_without_orders(sf_dir: str) -> rd.Dataset:
    """Anti join of two large tables: customers with no big-ticket order
    (>3000 whole currency units).  The order keys are deduped per batch
    (combiner), then BOTH sides co-partition by key hash — the key set is
    built per bucket, never on the driver."""
    import pyarrow.compute as pc

    from .grouping import bucketed_cogroup

    okeys = _distinct_keys(
        _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"]), "o_custkey",
        batch_filter=lambda b: pc.greater(b.column("o_totalprice"), 300_000))

    def anti_bucket(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if lf.empty:
            return pd.DataFrame({"c_custkey": pd.Series(dtype=np.int64),
                                 "c_name": pd.Series(dtype=object)})
        return lf[~lf.c_custkey.isin(rf.o_custkey.to_numpy())]

    return bucketed_cogroup(_pq(sf_dir, "customer", ["c_custkey", "c_name"]),
                            okeys, ["c_custkey"], ["o_custkey"],
                            anti_bucket, num_buckets=32).sort("c_custkey")


SQL_CUSTOMERS_WITHOUT_ORDERS = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
ORDER BY c_custkey
"""


def q_parts_ordered_large(sf_dir: str) -> rd.Dataset:
    """Semi join of two large tables: parts of size > 25 that appear in
    any lineitem.  lineitem keys are deduped per batch (combiner) and both
    sides co-partition by key hash — no driver-side key set."""
    from .grouping import bucketed_cogroup

    lkeys = _distinct_keys(_pq(sf_dir, "lineitem", ["l_partkey"]),
                           "l_partkey")
    parts = (_pq(sf_dir, "part", ["p_partkey", "p_name", "p_size"])
             .filter(expr="p_size > 25"))

    def semi_bucket(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if lf.empty:
            return pd.DataFrame({"p_partkey": pd.Series(dtype=np.int64),
                                 "p_name": pd.Series(dtype=object),
                                 "p_size": pd.Series(dtype=np.int64)})
        return lf[lf.p_partkey.isin(rf.l_partkey.to_numpy())]

    return bucketed_cogroup(parts, lkeys, ["p_partkey"], ["l_partkey"],
                            semi_bucket, num_buckets=32).sort("p_partkey")


SQL_PARTS_ORDERED_LARGE = """
SELECT p_partkey, p_name, p_size FROM part
WHERE p_size > 25 AND p_partkey IN (SELECT l_partkey FROM lineitem)
ORDER BY p_partkey
"""


def q_part_brand_stats(sf_dir: str) -> pd.DataFrame:
    """Per-brand part stats (covers the part table aggregation path)."""
    ds = _pq(sf_dir, "part", ["p_brand", "p_retailprice", "p_size"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["price_c"] = _cents(df.p_retailprice)
        return df.groupby("p_brand", as_index=False).agg(
            n_parts=("price_c", "size"), total_retail_cents=("price_c", "sum"),
            total_size=("p_size", "sum"))

    from ray.data.aggregate import Sum

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("p_brand")
           .aggregate(Sum("n_parts", alias_name="n_parts"),
                      Sum("total_retail_cents", alias_name="total_retail_cents"),
                      Sum("total_size", alias_name="total_size"))
           .to_pandas())
    return out.sort_values("p_brand").reset_index(drop=True)


SQL_PART_BRAND_STATS = """
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(CAST(round(p_retailprice*100) AS BIGINT)) AS BIGINT) AS total_retail_cents,
       CAST(SUM(p_size) AS BIGINT) AS total_size
FROM part GROUP BY p_brand ORDER BY p_brand
"""


def q_supplier_nation(sf_dir: str) -> pd.DataFrame:
    """supplier ⋈ nation (broadcast dim) → per-nation supplier stats.
    nation is a FIXED 25-row dim (never scales — see
    q_region_customers); the scaling side, supplier, streams."""
    nation = _pq(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nation = nation.rename(columns={"n_nationkey": "s_nationkey"})
    ds = _pq(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["bal_c"] = _cents(df.s_acctbal)
        return df.groupby("n_name", as_index=False).agg(
            n_suppliers=("bal_c", "size"), total_acctbal_cents=("bal_c", "sum"))

    from ray.data.aggregate import Sum

    out = (broadcast_lookup(ds, nation, "s_nationkey")
           .map_batches(partial, batch_format="pandas")
           .groupby("n_name")
           .aggregate(Sum("n_suppliers", alias_name="n_suppliers"),
                      Sum("total_acctbal_cents", alias_name="total_acctbal_cents"))
           .to_pandas())
    return out.sort_values("n_name").reset_index(drop=True)


SQL_SUPPLIER_NATION = """
SELECT n_name, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(round(s_acctbal*100) AS BIGINT)) AS BIGINT) AS total_acctbal_cents
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""




# ------------------------------------------------------------ sessionization
def q_user_sessions(sf_dir: str) -> rd.Dataset:
    """Session windows (30-min inactivity gap) per user — the guide's
    stream-shaped pattern: partition by key, sort by time inside the
    bucket, gaps-and-islands with vectorized pandas."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    gap_ns = 30 * 60 * 1_000_000_000

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"]).copy()
        ns = df.ts.astype("datetime64[ns]").astype("int64")
        df["_ns"] = ns
        df["v"] = _cents(df.value)
        new_session = (df.user_id != df.user_id.shift()) | \
                      (df._ns - df._ns.shift() > gap_ns)
        df["_sid"] = new_session.cumsum()
        out = df.groupby(["user_id", "_sid"], as_index=False).agg(
            session_start_s=("_ns", "min"), n_events=("v", "size"),
            value_cents=("v", "sum"))
        out["session_start_s"] = out.session_start_s // 1_000_000_000
        return out[["user_id", "session_start_s", "n_events", "value_cents"]]

    return bucketed_group_apply(ds, ["user_id"], sessions).sort(
        ["user_id", "session_start_s"])


SQL_USER_SESSIONS = """
WITH e AS (
  SELECT user_id, ts, event_id, CAST(round(value*100) AS BIGINT) AS v,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM e
)
SELECT user_id, CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_s,
       COUNT(*) AS n_events, CAST(SUM(v) AS BIGINT) AS value_cents
FROM s GROUP BY user_id, sid ORDER BY user_id, session_start_s
"""




# ------------------------------------------------------------ native join
def q_segment_status_native(sf_dir: str) -> pd.DataFrame:
    """Ray's built-in hash-partitioned ``Dataset.join`` (available in this
    Ray version — the explicit ``bucketed_hash_join`` above remains the
    portable pattern), then a grouped aggregate."""
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"])
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    joined = orders.join(cust, "inner", 8, on=("o_custkey",),
                         right_on=("c_custkey",))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["price_c"] = _cents(df.o_totalprice)
        return df.groupby(["c_mktsegment", "o_orderstatus"], as_index=False).agg(
            n_orders=("price_c", "size"), total_cents=("price_c", "sum"))

    from ray.data.aggregate import Sum

    out = (joined.map_batches(partial, batch_format="pandas")
           .groupby(["c_mktsegment", "o_orderstatus"])
           .aggregate(Sum("n_orders", alias_name="n_orders"),
                      Sum("total_cents", alias_name="total_cents"))
           .to_pandas())
    return out.sort_values(["c_mktsegment", "o_orderstatus"]).reset_index(drop=True)


SQL_SEGMENT_STATUS_NATIVE = """
SELECT c_mktsegment, o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment, o_orderstatus ORDER BY c_mktsegment, o_orderstatus
"""


# ------------------------------------------------------------ range join
def q_event_followers(sf_dir: str) -> rd.Dataset:
    """RANGE (interval) self-join over a large table: for each event, how
    many events by the same user land in the following hour.  Both sides
    are the events table co-partitioned by user key (one union shuffle via
    ``bucketed_cogroup``); inside each bucket the interval predicate is
    evaluated with two vectorized ``searchsorted`` calls over the
    per-user time-sorted array — the portable range-join pattern (the
    as-of join above is its `nearest-only` special case)."""
    from .grouping import bucketed_cogroup

    left = _pq(sf_dir, "events", ["event_id", "user_id", "ts"])
    right = _pq(sf_dir, "events", ["user_id", "ts"])

    def range_bucket(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        # Merge-count: ONE lexsort of (right rows + both query endpoints)
        # by (user, ts, is_query) replaces the per-user filter+searchsorted
        # loop (round 2 scanned the whole bucket once per user).  For each
        # query endpoint, the running count of right rows inside its user
        # segment gives |{ts_r <= endpoint}|; followers = hi - lo.
        if lf.empty or rf.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype=np.int64),
                                 "n_followers": pd.Series(dtype=np.int64)})
        nR, nL = len(rf), len(lf)
        codes, _ = pd.factorize(
            pd.concat([rf.user_id, lf.user_id], ignore_index=True))
        r_codes, l_codes = codes[:nR], codes[nR:]
        lts = lf.ts.to_numpy()
        u_all = np.concatenate([r_codes, l_codes, l_codes])
        t_all = np.concatenate([rf.ts.to_numpy(), lts,
                                lts + np.timedelta64(1, "h")])
        f_all = np.concatenate([np.zeros(nR, np.int8),
                                np.ones(2 * nL, np.int8)])
        tag = np.concatenate([np.full(nR, -1, np.int64),
                              np.arange(2 * nL, dtype=np.int64)])
        order = np.lexsort((f_all, t_all, u_all))
        is_r = (f_all[order] == 0).astype(np.int64)
        cum = np.cumsum(is_r)                 # rights with key <= here
        uo = u_all[order]
        seg_first = np.ones(len(uo), bool)
        seg_first[1:] = uo[1:] != uo[:-1]
        # rights before each user segment; nondecreasing across segments,
        # so a max-accumulate broadcasts the segment-start value forward
        seg_offset = np.maximum.accumulate(
            np.where(seg_first, cum - is_r, -1))
        counts_at = cum - seg_offset
        qtag = tag[order]
        qmask = qtag >= 0
        res = np.empty(2 * nL, np.int64)
        res[qtag[qmask]] = counts_at[qmask]
        n = res[nL:] - res[:nL]               # ts_r in (ts, ts + 1h]
        keep = n > 0
        return pd.DataFrame({
            "event_id": lf.event_id.to_numpy()[keep].astype(np.int64),
            "n_followers": n[keep]})

    return bucketed_cogroup(left, right, ["user_id"], ["user_id"],
                            range_bucket, num_buckets=32).sort("event_id")


SQL_EVENT_FOLLOWERS = """
SELECT a.event_id, COUNT(*) AS n_followers
FROM events a JOIN events b
  ON b.user_id = a.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
GROUP BY a.event_id ORDER BY a.event_id
"""



# ------------------------------------------------------- grouped quantiles
def q_events_value_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-group percentiles (p50/p95 of event value per type) from
    a distributed (type, cents) histogram — no per-group sort, no
    materialized groups: per-batch partial histograms shuffle once keyed
    by type, each type folds its histogram with one cumulative scan.
    Quantile q = smallest value with cum_count ≥ ceil(q·N) (inverted
    CDF, stated so the SQL oracle computes the identical statistic)."""
    from .grouping import bucketed_group_apply

    ev = _pq(sf_dir, "events", ["event_type", "value"])

    def hist(batch: pa.Table) -> pd.DataFrame:
        cents = _cents(batch.column("value").to_numpy())
        df = pd.DataFrame({"event_type": batch.column("event_type").to_pylist(),
                           "cents": cents})
        return (df.groupby(["event_type", "cents"]).size()
                .reset_index(name="c"))

    def quantiles(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("event_type"):
            g = (g.groupby("cents", as_index=False)["c"].sum()
                 .sort_values("cents"))
            total = int(g["c"].sum())
            cum = g["c"].cumsum().to_numpy()
            cs = g["cents"].to_numpy()
            p50 = int(cs[np.searchsorted(cum, int(np.ceil(0.5 * total)))])
            p95 = int(cs[np.searchsorted(cum, int(np.ceil(0.95 * total)))])
            rows.append((t, total, p50, p95))
        return pd.DataFrame(rows, columns=["event_type", "n_events",
                                           "p50_cents", "p95_cents"])

    out = bucketed_group_apply(
        ev.map_batches(hist, batch_format="pyarrow"),
        ["event_type"], quantiles, num_buckets=8).to_pandas()
    for c in ("n_events", "p50_cents", "p95_cents"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_EVENTS_VALUE_QUANTILES = """
WITH v AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), g AS (
  SELECT event_type, cents, COUNT(*) AS c FROM v GROUP BY 1, 2
), cum AS (
  SELECT event_type, cents,
         SUM(c) OVER (PARTITION BY event_type ORDER BY cents) AS cc,
         SUM(c) OVER (PARTITION BY event_type) AS tot
  FROM g
)
SELECT event_type,
       CAST(MAX(tot) AS BIGINT) AS n_events,
       CAST(MIN(CASE WHEN cc >= ceil(0.50 * tot) THEN cents END) AS BIGINT) AS p50_cents,
       CAST(MIN(CASE WHEN cc >= ceil(0.95 * tot) THEN cents END) AS BIGINT) AS p95_cents
FROM cum GROUP BY event_type ORDER BY event_type
"""


# ------------------------------------------------------------ HLL distinct
DEDUP_WINDOW_S = 3600


def q_event_dedup_window(sf_dir: str) -> pd.DataFrame:
    """Streaming duplicate suppression: an event is suppressed when the
    SAME logical event — identical (user, type, value cents) — already
    occurred within the previous DEDUP_WINDOW_S seconds (LAG semantics:
    measured against the previous OCCURRENCE, suppressed or not; the
    stateful last-KEPT variant needs an iterative scan and is noted,
    not implemented).  This is the at-least-once -> effectively-once
    idempotency primitive in front of every event ingest.

    Shape at scale: ONE (user, type, cents)-bucketed exchange
    co-locates each logical key's occurrences; in-bucket the previous
    occurrence is a vectorized composite-key sort + shift, no per-key
    Python; the report merge is |event_type| bounded."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events",
             ["event_id", "user_id", "event_type", "ts", "value"])

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": df.user_id.to_numpy().astype(np.int64),
            "event_type": df.event_type.to_numpy(),
            "cents": np.round(df.value.to_numpy(np.float64)
                              * 100).astype(np.int64),
            "s": df.ts.astype("datetime64[ns]").astype("int64")
            .to_numpy() // 1_000_000_000,
            "event_id": df.event_id.to_numpy().astype(np.int64)})

    def suppress(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["user_id", "event_type", "cents", "s",
                            "event_id"])
        same_key = ((d.user_id.to_numpy()[1:]
                     == d.user_id.to_numpy()[:-1])
                    & (d.event_type.to_numpy()[1:]
                       == d.event_type.to_numpy()[:-1])
                    & (d.cents.to_numpy()[1:]
                       == d.cents.to_numpy()[:-1]))
        gap = d.s.to_numpy()[1:] - d.s.to_numpy()[:-1]
        sup = np.concatenate(
            ([False], same_key & (gap <= DEDUP_WINDOW_S)))
        out = pd.DataFrame({"event_type": d.event_type.to_numpy(),
                            "sup": sup.astype(np.int64)})
        return (out.groupby("event_type", as_index=False)
                .agg(n_events=("sup", "size"),
                     n_suppressed=("sup", "sum")).astype(
                         {"n_events": np.int64,
                          "n_suppressed": np.int64}))

    parts = bucketed_group_apply(
        ds.map_batches(slim, batch_format="pandas"),
        ["user_id", "event_type", "cents"], suppress,
        num_buckets=16).to_pandas()
    out = (parts.groupby("event_type", as_index=False)
           .agg(n_events=("n_events", "sum"),
                n_suppressed=("n_suppressed", "sum")))
    out["suppress_milli"] = ((1000 * out.n_suppressed)
                             // out.n_events).astype(np.int64)
    out["n_events"] = out.n_events.astype(np.int64)
    out["n_suppressed"] = out.n_suppressed.astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


SQL_EVENT_DEDUP_WINDOW = f"""
WITH e AS (
  SELECT event_id, user_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         CAST(floor(epoch(ts)) AS BIGINT) AS s
  FROM events
), l AS (
  SELECT event_type, s,
         LAG(s) OVER (PARTITION BY user_id, event_type, cents
                      ORDER BY s, event_id) AS prev_s
  FROM e
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN prev_s IS NOT NULL
                      AND s - prev_s <= {DEDUP_WINDOW_S}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_suppressed,
       CAST(1000 * SUM(CASE WHEN prev_s IS NOT NULL
                             AND s - prev_s <= {DEDUP_WINDOW_S}
                       THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT)
         AS suppress_milli
FROM l GROUP BY 1 ORDER BY 1
"""


def q_hll_accuracy(sf_dir: str) -> pd.DataFrame:
    """Sketch-error scorecard: HLL estimate vs EXACT distinct users per
    event type, with the signed error in milli — turns the pytest-only
    accuracy pin into a driver-gate artifact (the neardup_quality idea
    applied to the sketch family).  Rows-only (the estimate is not
    SQL-expressible); the exact side reuses the bounded per-type
    distinct machinery."""
    est = q_events_hll_users(sf_dir).rename(
        columns={"approx_users": "hll_users"})
    ev = _pq(sf_dir, "events", ["event_type", "user_id"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "event_type": batch.column("event_type").to_pylist(),
            "user_id": batch.column("user_id").to_numpy()})
        return df.drop_duplicates()

    from .grouping import bucketed_group_apply

    def exact(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.drop_duplicates().groupby("event_type", as_index=False)
             .agg(exact_users=("user_id", "nunique")))
        g["exact_users"] = g.exact_users.astype(np.int64)
        return g

    ex = (bucketed_group_apply(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type", "user_id"], exact, num_buckets=16).to_pandas()
        .groupby("event_type", as_index=False)
        .agg(exact_users=("exact_users", "sum")))
    out = est.merge(ex, on="event_type")
    out["err_milli"] = ((1000 * (out.hll_users - out.exact_users))
                        // out.exact_users).astype(np.int64)
    out["hll_users"] = out.hll_users.astype(np.int64)
    out["exact_users"] = out.exact_users.astype(np.int64)
    return (out[["event_type", "hll_users", "exact_users", "err_milli"]]
            .sort_values("event_type").reset_index(drop=True))


def q_events_hll_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users per event type via HyperLogLog
    (p=12, ~1.6% σ): per-batch 4096-byte register partials, one tiny
    shuffle keyed by type, elementwise-max merge — the constant-memory
    answer to COUNT(DISTINCT) at 10^12 rows, where the exact groupby
    would shuffle every (type, user) pair.  Approximate ⇒ rows-only
    driver check; the error bound vs exact is pinned by pytest."""
    from ..functions import sketch as SK
    from .grouping import bucketed_group_apply

    ev = _pq(sf_dir, "events", ["event_type", "user_id"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({"event_type": batch.column("event_type").to_pylist(),
                           "user_id": batch.column("user_id").to_numpy()})
        rows = {"event_type": [], "regs": []}
        for t, g in df.groupby("event_type"):
            rows["event_type"].append(t)
            rows["regs"].append(
                SK.hll_registers(g["user_id"].to_numpy()).tolist())
        return pd.DataFrame(rows)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for t, g in df.groupby("event_type"):
            regs = np.zeros(SK.HLL_M, dtype=np.uint8)
            for r in g["regs"]:
                regs = SK.hll_merge(regs, np.asarray(r, dtype=np.uint8))
            rows.append((t, SK.hll_estimate(regs)))
        return pd.DataFrame(rows, columns=["event_type", "approx_users"])

    out = bucketed_group_apply(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["event_type"], merge, num_buckets=8).to_pandas()
    out["approx_users"] = out["approx_users"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


# ------------------------------------------------------------ rollup
def q_segment_nation_rollup(sf_dir: str) -> pd.DataFrame:
    """GROUP BY ROLLUP(segment, nation) over order revenue — grouping
    sets computed the scale-correct way: ONLY the finest level
    (segment × nationkey, ≤ 5×25 = 125 keys) ever touches the corpus
    (per-batch combiner below the auto-routed orders ⋈ customer join,
    then one bounded groupby); the coarser levels (per-segment
    subtotals, grand total) are DERIVED from the finest aggregate —
    re-aggregating 125 rows, never re-scanning orders.  Rolled-up
    levels use the 'ALL' sentinel (COALESCE in the oracle); no real
    segment or nation is named 'ALL'."""
    cust = _pq(sf_dir, "customer",
               ["c_custkey", "c_mktsegment", "c_nationkey"])
    orders = _pq(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    nation = _pq(sf_dir, "nation",
                 ["n_nationkey", "n_name"]).to_pandas()  # fixed 25 rows

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df["price_c"] = _cents(df.o_totalprice)
        return df.groupby(["c_mktsegment", "c_nationkey"],
                          as_index=False).agg(
            n_orders=("price_c", "size"), total_cents=("price_c", "sum"))

    from ray.data.aggregate import Sum

    finest = (auto_join(orders, cust, "o_custkey", "c_custkey")
              .map_batches(partial, batch_format="pandas")
              .groupby(["c_mktsegment", "c_nationkey"])
              .aggregate(Sum("n_orders", alias_name="n_orders"),
                         Sum("total_cents", alias_name="total_cents"))
              .to_pandas())          # ≤ 125 rows by construction
    finest = finest.merge(nation, left_on="c_nationkey",
                          right_on="n_nationkey")
    fine = finest[["c_mktsegment", "n_name", "n_orders", "total_cents"]]
    seg = (fine.groupby("c_mktsegment", as_index=False)
           .agg(n_orders=("n_orders", "sum"),
                total_cents=("total_cents", "sum"))
           .assign(n_name="ALL"))
    grand = pd.DataFrame({"c_mktsegment": ["ALL"], "n_name": ["ALL"],
                          "n_orders": [fine["n_orders"].sum()],
                          "total_cents": [fine["total_cents"].sum()]})
    out = pd.concat([fine, seg, grand], ignore_index=True)
    out = out.astype({"n_orders": np.int64, "total_cents": np.int64})
    return (out[["c_mktsegment", "n_name", "n_orders", "total_cents"]]
            .sort_values(["c_mktsegment", "n_name"])
            .reset_index(drop=True))


SQL_SEGMENT_NATION_ROLLUP = """
SELECT COALESCE(c_mktsegment, 'ALL') AS c_mktsegment,
       COALESCE(n_name, 'ALL') AS n_name,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(c_mktsegment, n_name)
ORDER BY 1, 2
"""


# ------------------------------------------------------------ pivot
_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_events_pivot(sf_dir: str) -> rd.Dataset:
    """Pivot events to a wide per-hour table (one count column per
    event type + total) — the long→wide reshape every reporting stack
    needs.  The pivoted column set must be FIXED for a stable schema
    (here the closed 5-type vocabulary); a data-driven column set would
    need a schema pre-pass.

    Scale shape: per-batch crosstab partial (≤ hours-in-batch rows,
    already wide) then one groupby(hour_bucket) sum over partials —
    the exchange carries wide partial rows bounded by distinct hours
    (~10⁵ for a decade), never raw events."""

    ds = _pq(sf_dir, "events", ["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ns = df.ts.astype("datetime64[ns]").astype("int64")
        hours = (ns // 3_600_000_000_000).astype(np.int64)
        wide = pd.crosstab(hours, df.event_type)
        for t in _EVENT_TYPES:
            if t not in wide.columns:
                wide[t] = 0
        wide = wide[_EVENT_TYPES].astype(np.int64)
        wide.columns = [f"n_{t}" for t in _EVENT_TYPES]
        wide["n_total"] = wide.sum(axis=1).astype(np.int64)
        return wide.rename_axis("hour_bucket").reset_index()

    from .grouping import bucketed_group_apply

    cols = [f"n_{t}" for t in _EVENT_TYPES] + ["n_total"]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("hour_bucket", as_index=False)[cols].sum()
        return g.astype({c: np.int64 for c in ["hour_bucket"] + cols})

    return (bucketed_group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["hour_bucket"], merge, num_buckets=16)
        .sort("hour_bucket"))


SQL_EVENTS_PIVOT = """
SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_bucket,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       COUNT(*) AS n_total
FROM events GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------------------ full outer join
def q_nation_balance_outer(sf_dir: str) -> rd.Dataset:
    """FULL OUTER join of two per-nation aggregates (customer vs
    supplier account balances).  Suppliers span only a subset of the
    customer nations in the testdata, so both outer semantics are
    exercised (customer-only nations must survive with zeroed supplier
    columns).

    Scale shape: the distributed full outer is a tagged UNION +
    groupby — each side pre-aggregates per batch to its bounded key
    space (≤25 nations), the tagged partials union through ONE
    groupby(nationkey) exchange, and each group folds both sides'
    partials with zero-fill for the absent side.  No broadcast, no
    driver-side merge, and the same shape holds for an unbounded key
    space (the exchange carries per-(batch, key) partials only)."""

    cust = _pq(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
    supp = _pq(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])

    def c_part(df: pd.DataFrame) -> pd.DataFrame:
        df["bal"] = _cents(df.c_acctbal)
        g = df.groupby("c_nationkey", as_index=False).agg(
            n_customers=("bal", "size"), cust_bal_cents=("bal", "sum"))
        return g.rename(columns={"c_nationkey": "nationkey"}).assign(
            n_suppliers=np.int64(0), supp_bal_cents=np.int64(0))

    def s_part(df: pd.DataFrame) -> pd.DataFrame:
        df["bal"] = _cents(df.s_acctbal)
        g = df.groupby("s_nationkey", as_index=False).agg(
            n_suppliers=("bal", "size"), supp_bal_cents=("bal", "sum"))
        return g.rename(columns={"s_nationkey": "nationkey"}).assign(
            n_customers=np.int64(0), cust_bal_cents=np.int64(0))

    cols = ["nationkey", "n_customers", "cust_bal_cents",
            "n_suppliers", "supp_bal_cents"]
    tagged = (cust.map_batches(c_part, batch_format="pandas")
              .select_columns(cols)
              .union(supp.map_batches(s_part, batch_format="pandas")
                     .select_columns(cols)))

    from ray.data.aggregate import Sum

    return (tagged.groupby("nationkey")
            .aggregate(*[Sum(c, alias_name=c) for c in cols[1:]])
            .sort("nationkey"))


SQL_NATION_BALANCE_OUTER = """
WITH c AS (
  SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers,
         CAST(SUM(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT)
             AS cust_bal_cents
  FROM customer GROUP BY 1
), s AS (
  SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers,
         CAST(SUM(CAST(round(s_acctbal*100) AS BIGINT)) AS BIGINT)
             AS supp_bal_cents
  FROM supplier GROUP BY 1
)
SELECT CAST(COALESCE(c.nationkey, s.nationkey) AS BIGINT) AS nationkey,
       COALESCE(c.n_customers, 0) AS n_customers,
       COALESCE(c.cust_bal_cents, 0) AS cust_bal_cents,
       COALESCE(s.n_suppliers, 0) AS n_suppliers,
       COALESCE(s.supp_bal_cents, 0) AS supp_bal_cents
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
ORDER BY nationkey
"""


# ------------------------------------------------------------ funnel
_FUNNEL = ["signup", "click", "purchase"]


def q_event_funnel(sf_dir: str) -> pd.DataFrame:
    """Ordered-sequence funnel: how many users did signup → click →
    purchase IN ORDER (each stage strictly after the previous stage's
    first completion) — the event-sequence analytic no plain groupby
    expresses.

    Scale shape: funnel state is per-user, so ONE bucketed shuffle on
    user_id; inside a bucket the stage times are vectorized
    first-match folds (min ts of stage k events after the user's
    stage-k−1 time), and each bucket emits one 3-int partial row.  The
    driver merges buckets × 1 row."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["ts", "user_id", "event_type"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        ns = df.ts.astype("datetime64[ns]").astype("int64")
        df = pd.DataFrame({"user_id": df.user_id, "ns": ns,
                           "et": df.event_type})
        counts = np.zeros(len(_FUNNEL), dtype=np.int64)
        # vectorized stage fold: prev maps user -> first completion time
        # of the previous stage; each stage is one filter + merge + min
        prev = None
        for k, stage in enumerate(_FUNNEL):
            ev = df[df.et == stage]
            if prev is not None:
                ev = ev.merge(prev, on="user_id")
                ev = ev[ev.ns > ev.prev_ns]
            cur = (ev.groupby("user_id", as_index=False)
                   .agg(prev_ns=("ns", "min")))
            counts[k] = len(cur)
            prev = cur
        return pd.DataFrame({"stage_idx": np.arange(
            1, len(_FUNNEL) + 1, dtype=np.int64),
            "npart": counts})

    parts = bucketed_group_apply(ds, ["user_id"], fold,
                                 num_buckets=32).to_pandas()
    out = (parts.groupby("stage_idx", as_index=False)
           .agg(n_users=("npart", "sum")))
    out["stage"] = [_FUNNEL[i - 1] for i in out.stage_idx]
    return (out[["stage_idx", "stage", "n_users"]]
            .astype({"stage_idx": np.int64, "n_users": np.int64})
            .sort_values("stage_idx").reset_index(drop=True))


SQL_EVENT_FUNNEL = """
WITH u1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY 1
), u2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN u1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1
), u3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN u2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1
)
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS stage_idx, 'signup' AS stage,
         (SELECT COUNT(*) FROM u1) AS n_users
  UNION ALL
  SELECT 2, 'click', (SELECT COUNT(*) FROM u2)
  UNION ALL
  SELECT 3, 'purchase', (SELECT COUNT(*) FROM u3)
) ORDER BY stage_idx
"""


# ------------------------------------------------------------ gap fill
def q_events_dense_hours(sf_dir: str) -> rd.Dataset:
    """Sparse → dense time series: total events per hour INCLUDING
    empty hours (zero-filled) between the global min and max hour —
    the densification every downstream window/forecast stage assumes.

    Scale shape: per-batch hour-count partials → one bounded
    groupby(hour) (cardinality = distinct hours, ~10⁵ for a decade);
    the dense axis comes from a GENERATED `ray.data.range` source (no
    driver-side list) unioned as zero rows into the same groupby, so
    gap filling adds no extra shuffle and nothing corpus-sized moves."""

    ds = _pq(sf_dir, "events", ["ts"])

    def hour_part(df: pd.DataFrame) -> pd.DataFrame:
        ns = df.ts.astype("datetime64[ns]").astype("int64")
        hours = (ns // 3_600_000_000_000).astype(np.int64)
        h, c = np.unique(hours, return_counts=True)
        return pd.DataFrame({"hour_bucket": h.astype(np.int64),
                             "n_events": c.astype(np.int64)})

    from .grouping import bucketed_group_apply

    def hour_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("hour_bucket", as_index=False)
             .agg(n_events=("n_events", "sum")))
        return g.astype({"hour_bucket": np.int64, "n_events": np.int64})

    # hash-bucketed merges (native sort-groupby costs seconds of fixed
    # shuffle overhead at this size); counts materialized once — it is
    # the hours-sized table both the bounds probe and the final union
    # consume, so its lineage must not re-execute per consumer
    counts = bucketed_group_apply(
        ds.map_batches(hour_part, batch_format="pandas"),
        ["hour_bucket"], hour_merge, num_buckets=16).materialize()
    h_min = int(counts.min("hour_bucket"))
    h_max = int(counts.max("hour_bucket"))

    def to_zero_rows(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "hour_bucket": (batch["id"] + h_min).astype(np.int64),
            "n_events": np.zeros(len(batch), dtype=np.int64)})

    dense = (rd.range(h_max - h_min + 1, override_num_blocks=4)
             .map_batches(to_zero_rows, batch_format="pandas"))

    return (bucketed_group_apply(counts.union(dense), ["hour_bucket"],
                                 hour_merge, num_buckets=8)
            .sort("hour_bucket"))


SQL_EVENTS_DENSE_HOURS = """
WITH c AS (
  SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_bucket,
         COUNT(*) AS n_events
  FROM events GROUP BY 1
), axis AS (
  SELECT unnest(generate_series((SELECT MIN(hour_bucket) FROM c),
                                (SELECT MAX(hour_bucket) FROM c)))
      AS hour_bucket
)
SELECT axis.hour_bucket,
       CAST(COALESCE(c.n_events, 0) AS BIGINT) AS n_events
FROM axis LEFT JOIN c USING (hour_bucket)
ORDER BY hour_bucket
"""


# ------------------------------------------------ decorrelated subquery
def q_customers_above_nation_avg(sf_dir: str) -> rd.Dataset:
    """Customers with balance above their own nation's average — the
    canonical correlated subquery, DECORRELATED the distributed way:
    the per-nation average is a bounded aggregate (per-batch partials →
    one ≤25-row groupby) broadcast by closure into a stateless filter
    pass; the customer table streams twice and never shuffles.

    Exactness: `bal > avg` is evaluated as the integer cross-product
    `bal_cents · n_nation > sum_cents_nation` — no float division on
    either side (the oracle compares the same products)."""

    cust = _pq(sf_dir, "customer",
               ["c_custkey", "c_nationkey", "c_acctbal"])

    def avg_part(df: pd.DataFrame) -> pd.DataFrame:
        df["bal"] = _cents(df.c_acctbal)
        return df.groupby("c_nationkey", as_index=False).agg(
            n=("bal", "size"), s=("bal", "sum"))

    from ray.data.aggregate import Sum

    stats = (cust.map_batches(avg_part, batch_format="pandas")
             .groupby("c_nationkey")
             .aggregate(Sum("n", alias_name="n"),
                        Sum("s", alias_name="s"))
             .to_pandas())            # ≤ 25 rows
    n_by = dict(zip(stats.c_nationkey, stats.n))
    s_by = dict(zip(stats.c_nationkey, stats.s))

    def above(df: pd.DataFrame) -> pd.DataFrame:
        bal = _cents(df.c_acctbal)
        n = df.c_nationkey.map(n_by).to_numpy(dtype=np.int64)
        s = df.c_nationkey.map(s_by).to_numpy(dtype=np.int64)
        keep = bal * n > s
        out = pd.DataFrame({
            "c_custkey": df.c_custkey[keep].astype(np.int64),
            "c_nationkey": df.c_nationkey[keep].astype(np.int64),
            "bal_cents": pd.Series(bal[keep], dtype=np.int64,
                                   index=df.index[keep])})
        return out

    return (cust.map_batches(above, batch_format="pandas")
            .sort("c_custkey"))


SQL_CUSTOMERS_ABOVE_NATION_AVG = """
WITH b AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal*100) AS BIGINT) AS bal FROM customer
), s AS (
  SELECT c_nationkey, COUNT(*) AS n, SUM(bal) AS tot
  FROM b GROUP BY 1
)
SELECT CAST(b.c_custkey AS BIGINT) AS c_custkey,
       CAST(b.c_nationkey AS BIGINT) AS c_nationkey,
       b.bal AS bal_cents
FROM b JOIN s USING (c_nationkey)
WHERE b.bal * s.n > s.tot
ORDER BY c_custkey
"""


# ------------------------------------------------------------ argmax
def q_nation_top_customer(sf_dir: str) -> rd.Dataset:
    """Per-nation argmax: the customer with the highest balance (ties →
    smallest custkey) — the arg-max AGGREGATE, reduced as a semilattice:
    each batch emits one candidate per nation seen, one bounded groupby
    folds candidates with the same (max-bal, min-key) rule.  Unlike a
    sort-based top-1, nothing rank-shuffles; the exchange is ≤ one row
    per (batch, nation)."""

    cust = _pq(sf_dir, "customer",
               ["c_custkey", "c_nationkey", "c_acctbal"])

    def cand(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(bal_cents=_cents(df.c_acctbal))
        df = df.sort_values(["c_nationkey", "bal_cents", "c_custkey"],
                            ascending=[True, False, True])
        top = df.groupby("c_nationkey", as_index=False).head(1)
        return top[["c_nationkey", "c_custkey", "bal_cents"]].astype(
            {"c_nationkey": np.int64, "c_custkey": np.int64,
             "bal_cents": np.int64})

    # candidate partials already carry bal_cents; fold re-applies the
    # same (bal desc, key asc) head-1 rule per nation
    def fold2(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["c_nationkey", "bal_cents", "c_custkey"],
                            ascending=[True, False, True])
        top = df.groupby("c_nationkey", as_index=False).head(1)
        return top.astype({"c_nationkey": np.int64,
                           "c_custkey": np.int64,
                           "bal_cents": np.int64})

    from .grouping import bucketed_group_apply

    return bucketed_group_apply(
        cust.map_batches(cand, batch_format="pandas"),
        ["c_nationkey"], fold2, num_buckets=16).sort("c_nationkey")


SQL_NATION_TOP_CUSTOMER = """
WITH b AS (
  SELECT c_nationkey, c_custkey,
         CAST(round(c_acctbal*100) AS BIGINT) AS bal_cents
  FROM customer
), r AS (
  SELECT c_nationkey, c_custkey, bal_cents,
         ROW_NUMBER() OVER (PARTITION BY c_nationkey
                            ORDER BY bal_cents DESC, c_custkey) AS rn
  FROM b
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(c_custkey AS BIGINT) AS c_custkey, bal_cents
FROM r WHERE rn = 1 ORDER BY c_nationkey
"""


# ------------------------------------------------ correlation stats
def q_order_value_corr_stats(sf_dir: str) -> pd.DataFrame:
    """Sufficient statistics for corr(order value, line count) —
    distributed statistics the numerically honest way: the five power
    sums are EXACT integers (cents / counts), merged associatively
    (per-batch partials → one tiny fold), and any float (Pearson r,
    slope) is derived downstream from the one exact row.  Avoids the
    classic distributed-variance cancellation bug by never subtracting
    running means in the reduce.  x is whole FLOORED dollars
    (cents // 100, identical integer division both sides) so sum_x2
    stays inside int64 to ~10⁸ orders; beyond that the stat needs a
    per-partition rebase (documented limit, not a silent overflow —
    the int sums below are unbounded Python ints until the final
    cast, which would raise).

    Join shape: line counts per order come from a per-batch lineitem
    combiner co-grouped with orders on the key buckets (aggregation
    below the join, as priority_revenue)."""
    from .grouping import bucketed_cogroup

    li = _pq(sf_dir, "lineitem", ["l_orderkey"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    def li_part(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("l_orderkey", as_index=False)
                .agg(n_lines=("l_orderkey", "size")))

    lp = li.map_batches(li_part, batch_format="pandas")

    def per_bucket(lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        cols = ["n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]
        if lf.empty or rf.empty:
            return pd.DataFrame({c: pd.Series(dtype=np.int64)
                                 for c in cols})
        lines = (lf.groupby("l_orderkey", as_index=False)
                 .agg(n_lines=("n_lines", "sum")))
        m = lines.merge(rf.rename(columns={"o_orderkey": "l_orderkey"}),
                        on="l_orderkey")
        x = (_cents(m.o_totalprice) // 100).astype(object)  # floored $
        y = m.n_lines.to_numpy().astype(object)
        return pd.DataFrame([{
            "n": np.int64(len(m)),
            "sum_x": int(sum(x)), "sum_y": int(sum(y)),
            "sum_xy": int(sum(x * y)),
            "sum_x2": int(sum(x * x)), "sum_y2": int(sum(y * y))}])

    parts = bucketed_cogroup(lp, orders, ["l_orderkey"], ["o_orderkey"],
                             per_bucket).to_pandas()
    out = pd.DataFrame([{c: int(parts[c].sum())
                         for c in ["n", "sum_x", "sum_y", "sum_xy",
                                   "sum_x2", "sum_y2"]}])
    return out.astype({c: np.int64 for c in out.columns})


SQL_ORDER_VALUE_CORR_STATS = """
WITH l AS (
  SELECT l_orderkey, COUNT(*) AS n_lines FROM lineitem GROUP BY 1
), m AS (
  SELECT CAST(round(o_totalprice*100) AS BIGINT) // 100 AS x,
         CAST(n_lines AS BIGINT) AS y
  FROM orders JOIN l ON o_orderkey = l_orderkey
)
SELECT COUNT(*) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_x,
       CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(x*y) AS BIGINT) AS sum_xy,
       CAST(SUM(x*x) AS BIGINT) AS sum_x2,
       CAST(SUM(y*y) AS BIGINT) AS sum_y2
FROM m
"""


# ------------------------------------------------------------ skyline
def q_order_skyline(sf_dir: str) -> rd.Dataset:
    """2-D skyline (Pareto frontier) of orders: not dominated on
    (totalprice max, orderdate min) — i.e. no other order is both ≥ on
    price and ≤ on date with one strict.  The multi-objective "best
    orders" frontier no single ORDER BY expresses.

    Scale shape: the 2-D skyline REDUCES to per-date max + strict
    prefix max — so instead of the quadratic dominance join, the
    pipeline is (1) per-batch per-date price-max partials → one
    date-cardinality groupby (bounded: ~2.4k distinct dates for 7
    years; ~10⁵ for three centuries), (2) a date-sized prefix-max
    scan on the driver (bounded by the same cardinality, documented),
    (3) thresholds broadcast by closure into a stateless filter pass:
    keep rows with price = their date's max AND price > every earlier
    date's max.  Orders stream twice, shuffle never."""

    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_totalprice"])

    def date_max(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(price_cents=_cents(df.o_totalprice))
        return (df.groupby("o_orderdate", as_index=False)
                .agg(pmax=("price_cents", "max")))

    def date_max_merge(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("o_orderdate", as_index=False)
                .agg(pmax=("pmax", "max")))

    from .grouping import bucketed_group_apply

    # hash-bucketed merge, not native groupby().aggregate(): Ray's
    # sort-based groupby costs ~12 s on this timestamp key at sf0.1
    # where 16 hash buckets cost 0.6 s (measured; same result)
    dm = (bucketed_group_apply(
        orders.map_batches(date_max, batch_format="pandas"),
        ["o_orderdate"], date_max_merge, num_buckets=16)
        .to_pandas())                       # date-cardinality, bounded
    dm = dm.sort_values("o_orderdate").reset_index(drop=True)
    dm["prev_max"] = dm.pmax.cummax().shift(1).fillna(-1).astype(np.int64)
    pmax_by = dict(zip(dm.o_orderdate, dm.pmax))
    prev_by = dict(zip(dm.o_orderdate, dm.prev_max))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        price = _cents(df.o_totalprice)
        pm = df.o_orderdate.map(pmax_by).to_numpy(dtype=np.int64)
        pv = df.o_orderdate.map(prev_by).to_numpy(dtype=np.int64)
        mask = (price == pm) & (price > pv)
        out = pd.DataFrame({
            "o_orderkey": df.o_orderkey[mask].astype(np.int64),
            "o_orderdate": df.o_orderdate[mask].dt.strftime(
                "%Y-%m-%d"),
            "price_cents": pd.Series(price[mask], dtype=np.int64,
                                     index=df.index[mask])})
        return out

    return (orders.map_batches(keep, batch_format="pandas")
            .sort("o_orderkey"))


SQL_ORDER_SKYLINE = """
WITH p AS (
  SELECT o_orderkey, o_orderdate,
         CAST(round(o_totalprice*100) AS BIGINT) AS price_cents
  FROM orders
), d AS (
  SELECT o_orderdate, MAX(price_cents) AS pmax FROM p GROUP BY 1
), dd AS (
  SELECT o_orderdate, pmax,
         COALESCE(MAX(pmax) OVER (ORDER BY o_orderdate
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), -1) AS prev_max
  FROM d
)
SELECT CAST(p.o_orderkey AS BIGINT) AS o_orderkey,
       strftime(p.o_orderdate, '%Y-%m-%d') AS o_orderdate,
       p.price_cents
FROM p JOIN dd USING (o_orderdate)
WHERE p.price_cents = dd.pmax AND p.price_cents > dd.prev_max
ORDER BY o_orderkey
"""


# ------------------------------------------------------------ anomaly
def q_events_rate_anomaly(sf_dir: str) -> rd.Dataset:
    """Hours whose event rate deviates ≥3σ from the corpus mean — rate
    anomaly detection with the z-test done in EXACT integers: with n
    hours, S = Σc, SS = Σc², hour h is anomalous iff
    (n·c_h − S)² > 9·(n·SS − S²)  — the 3σ rule cleared of divisions,
    so both engines compare the same int64s (no float mean/variance,
    no distributed-variance cancellation).

    Scale shape: per-batch hour-count partials → one bounded
    groupby(hour) merge (distinct-hours cardinality); S/SS via the
    native tree aggregate over the merged counts; thresholds broadcast
    by closure into a stateless filter over the counts table."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["ts"])

    def hour_part(df: pd.DataFrame) -> pd.DataFrame:
        ns = df.ts.astype("datetime64[ns]").astype("int64")
        hours = (ns // 3_600_000_000_000).astype(np.int64)
        h, c = np.unique(hours, return_counts=True)
        return pd.DataFrame({"hour_bucket": h.astype(np.int64),
                             "n_events": c.astype(np.int64)})

    def hour_merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby("hour_bucket", as_index=False)
             .agg(n_events=("n_events", "sum")))
        return g.astype({"hour_bucket": np.int64, "n_events": np.int64})

    counts = bucketed_group_apply(
        ds.map_batches(hour_part, batch_format="pandas"),
        ["hour_bucket"], hour_merge, num_buckets=16).materialize()

    def sq(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(sq=(df.n_events * df.n_events).astype(np.int64))

    stats = counts.map_batches(sq, batch_format="pandas").sum(
        on=["n_events", "sq"])
    n = int(counts.count())
    s = int(stats["sum(n_events)"])
    ss = int(stats["sum(sq)"])
    thr = 9 * (n * ss - s * s)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        dev = n * df.n_events.to_numpy(dtype=np.int64) - s
        keep = dev * dev > thr
        out = df[keep].assign(
            dev_sq=pd.Series(dev[keep] ** 2, dtype=np.int64,
                             index=df.index[keep]),
            threshold=np.int64(thr))
        return out.astype({"dev_sq": np.int64, "threshold": np.int64})

    return (counts.map_batches(flag, batch_format="pandas")
            .sort("hour_bucket"))


SQL_EVENTS_RATE_ANOMALY = """
WITH c AS (
  SELECT CAST(floor(epoch(ts)/3600) AS BIGINT) AS hour_bucket,
         COUNT(*) AS n_events
  FROM events GROUP BY 1
), st AS (
  SELECT COUNT(*) AS n, CAST(SUM(n_events) AS BIGINT) AS s,
         CAST(SUM(n_events * n_events) AS BIGINT) AS ss
  FROM c
)
SELECT c.hour_bucket, c.n_events,
       CAST((st.n * c.n_events - st.s) * (st.n * c.n_events - st.s)
            AS BIGINT) AS dev_sq,
       CAST(9 * (st.n * st.ss - st.s * st.s) AS BIGINT) AS threshold
FROM c CROSS JOIN st
WHERE (st.n * c.n_events - st.s) * (st.n * c.n_events - st.s)
      > 9 * (st.n * st.ss - st.s * st.s)
ORDER BY hour_bucket
"""


# ------------------------------------------------------- transitions
def q_event_transitions(sf_dir: str) -> rd.Dataset:
    """Markov transition counts between consecutive events of each
    user (ts order, event_id tie-break): the (from_type, to_type)
    matrix behind clickstream path analysis — the event-stream analog
    of token bigrams.

    Scale shape: transitions are per-user state, so ONE bucketed
    shuffle on user_id; inside a bucket a vectorized sort + shift
    produces consecutive pairs, pre-reduced to per-bucket (from, to)
    partials; the final 5×5-bounded merge folds partials.  The events
    table never shuffles twice."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["ts", "event_id", "user_id",
                                "event_type"])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"])
        same_user = df.user_id.eq(df.user_id.shift(-1))
        out = pd.DataFrame({
            "from_type": df.event_type[same_user],
            "to_type": df.event_type.shift(-1)[same_user]})
        g = (out.groupby(["from_type", "to_type"], as_index=False)
             .agg(n=("from_type", "size")))
        return g.astype({"n": np.int64})

    parts = bucketed_group_apply(ds, ["user_id"], fold, num_buckets=32)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["from_type", "to_type"], as_index=False)
             .agg(n=("n", "sum")))
        return g.astype({"n": np.int64})

    return bucketed_group_apply(parts, ["from_type", "to_type"], merge,
                                num_buckets=4).sort(["from_type",
                                                     "to_type"])


SQL_EVENT_TRANSITIONS = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
FROM s WHERE next_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------------------- log compaction
def q_user_latest_event(sf_dir: str) -> rd.Dataset:
    """Latest-wins compaction: each user's most recent event ((ts,
    event_id) max — event_id breaks exact-ts ties deterministically) —
    the merge-on-read/CDC upsert semantics every mutable-table layer
    compacts to, at REAL key cardinality (one state row per user, not
    a 25-key dimension).

    Scale shape: the same semilattice argmax as nation_top_customer —
    per-batch one candidate per user seen (bounded by users-in-batch),
    ONE bucketed fold re-applying the identical (ts, event_id)-max
    rule — but exercised at a key space that scales with the corpus,
    so the exchange is ≤ one row per (batch, user) and no task ever
    holds more than its bucket's users."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["ts", "event_id", "user_id",
                                "event_type", "value"])

    def cand(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            ns=df.ts.astype("datetime64[ns]").astype("int64"),
            value_cents=_cents(df.value))
        df = df.sort_values(["user_id", "ns", "event_id"],
                            ascending=[True, False, False])
        top = df.groupby("user_id", as_index=False).head(1)
        return top[["user_id", "ns", "event_id", "event_type",
                    "value_cents"]].astype(
            {"user_id": np.int64, "ns": np.int64,
             "event_id": np.int64, "value_cents": np.int64})

    def refold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ns", "event_id"],
                            ascending=[True, False, False])
        top = df.groupby("user_id", as_index=False).head(1)
        return top.astype({"user_id": np.int64, "ns": np.int64,
                           "event_id": np.int64,
                           "value_cents": np.int64})

    return (bucketed_group_apply(
        ds.map_batches(cand, batch_format="pandas"),
        ["user_id"], refold, num_buckets=32)
        .sort("user_id"))


SQL_USER_LATEST_EVENT = """
WITH r AS (
  SELECT user_id,
         CAST(epoch_ns(ts) AS BIGINT) AS ns,
         event_id, event_type,
         CAST(round(value*100) AS BIGINT) AS value_cents,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, ns, event_id, event_type, value_cents
FROM r WHERE rn = 1 ORDER BY user_id
"""


# ------------------------------------------------------- bloom semi-join
_BLOOM_BITS = 1 << 20       # 1 Mib filter; build side scales the pattern
_BLOOM_HASHES = ((2654435761, 0x9E3779B1), (40503, 0x85EBCA6B))


def _bloom_positions(keys: np.ndarray) -> list[np.ndarray]:
    """k=2 multiplicative hashes → bit positions (identical arithmetic
    wherever the filter is built or probed; int64 keys, uint64 mixing)."""
    out = []
    k = keys.astype(np.uint64)
    for mult, xorc in _BLOOM_HASHES:
        h = (k * np.uint64(mult)) ^ np.uint64(xorc)
        h ^= h >> np.uint64(31)
        out.append((h % np.uint64(_BLOOM_BITS)).astype(np.int64))
    return out


def q_bloom_semi_join(sf_dir: str) -> pd.DataFrame:
    """Revenue of lineitems whose order is URGENT — computed through a
    BLOOM-PREFILTERED semi-join, the standard 100-TB join-pruning
    pattern: a compact bit filter of the build side (urgent orderkeys)
    broadcasts to every probe task and discards most non-matching rows
    BEFORE the shuffle; survivors (matches + Bloom false positives)
    then verify EXACTLY against the real key set in the bucketed
    cogroup, so the filter only prunes — the result is bit-identical
    to the exact semi-join, which is what the oracle computes.

    Scale shape: the filter is built distributively (per-batch bitmap
    partials OR-folded — each partial is the fixed 1 Mib bitmap, so
    the reduce is block-count × 128 KiB, key-count-independent),
    broadcast once via ray.put; probe is stateless; only survivors
    enter the verify cogroup.  The output records the pruning
    telemetry (probed/survived) alongside the aggregate so the
    false-positive behavior is observable — but only the exact
    aggregate columns are oracle-checked semantics; probed == total
    lineitems and survived ≥ matched are pinned by pytest."""
    import ray

    from .grouping import bucketed_cogroup

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_extendedprice", "l_discount"])

    def bitmap_part(df: pd.DataFrame) -> pd.DataFrame:
        keys = df.o_orderkey[df.o_orderpriority == "1-URGENT"] \
            .to_numpy(dtype=np.int64)
        bits = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
        for pos in _bloom_positions(keys):
            np.bitwise_or.at(bits, pos // 64,
                             np.uint64(1) << (pos % 64).astype(np.uint64))
        return pd.DataFrame([{"bits": bits.tobytes()}])

    parts = (orders.map_batches(bitmap_part, batch_format="pandas")
             .take_all())        # block-count × 128 KiB, bounded
    bloom = np.zeros(_BLOOM_BITS // 64, dtype=np.uint64)
    for r in parts:
        bloom |= np.frombuffer(r["bits"], dtype=np.uint64)
    bloom_ref = ray.put(bloom)

    class Probe:
        def __init__(self, ref) -> None:
            self.bloom = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            df = batch.to_pandas()
            keys = df.l_orderkey.to_numpy(dtype=np.int64)
            hit = np.ones(len(keys), dtype=bool)
            for pos in _bloom_positions(keys):
                word = self.bloom[pos // 64]
                hit &= (word >> (pos % 64).astype(np.uint64)
                        ) & np.uint64(1) > 0
            out = df[hit]
            return pa.table({
                "l_orderkey": pa.array(out.l_orderkey, type=pa.int64()),
                "rev": pa.array(
                    _cents(out.l_extendedprice)
                    * (100 - _cents(out.l_discount)), type=pa.int64()),
                "probed": pa.array(
                    np.full(len(out), 0, dtype=np.int64)),
            }).replace_schema_metadata(None)

    n_probed = int(li.count())
    survivors = li.map_batches(Probe, fn_constructor_args=(bloom_ref,),
                               concurrency=(1, 4),
                               batch_format="pyarrow").materialize()
    n_survived = int(survivors.count())

    urgent = (orders.map_batches(
        lambda df: df[df.o_orderpriority == "1-URGENT"]
        [["o_orderkey"]], batch_format="pandas"))

    def verify(sf: pd.DataFrame, of: pd.DataFrame) -> pd.DataFrame:
        if sf.empty or of.empty:
            return pd.DataFrame({"n": pd.Series(dtype=np.int64),
                                 "rev": pd.Series(dtype=np.int64)})
        m = sf.merge(of.drop_duplicates()
                     .rename(columns={"o_orderkey": "l_orderkey"}),
                     on="l_orderkey")
        return pd.DataFrame([{"n": np.int64(len(m)),
                              "rev": np.int64(m.rev.sum())}])

    agg = bucketed_cogroup(survivors.select_columns(["l_orderkey",
                                                     "rev"]),
                           urgent, ["l_orderkey"], ["o_orderkey"],
                           verify).to_pandas()
    # telemetry (probed / survived / matched) is pytest-pinned via
    # bloom_semi_join_stats — Bloom FP counts depend on uint64
    # wrap-around arithmetic SQL can't reproduce, so the oracle checks
    # only the exact-semantics aggregate
    q_bloom_semi_join.last_stats = {  # type: ignore[attr-defined]
        "probed": n_probed, "survived": n_survived,
        "matched": int(agg.n.sum())}
    return pd.DataFrame([{
        "n_items": np.int64(agg.n.sum()),
        "revenue_scaled": np.int64(agg.rev.sum())}])


SQL_BLOOM_SEMI_JOIN = """
SELECT COUNT(*) AS n_items,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(round(l_discount*100) AS BIGINT)))
            AS BIGINT) AS revenue_scaled
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT')
"""


QUERIES = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "revenue_filter": (q_revenue_filter, SQL_REVENUE_FILTER),
    "segment_sales": (q_segment_sales, SQL_SEGMENT_SALES),
    "priority_revenue": (q_priority_revenue, SQL_PRIORITY_REVENUE),
    "region_customers": (q_region_customers, SQL_REGION_CUSTOMERS),
    "top_orders": (q_top_orders, SQL_TOP_ORDERS),
    "distinct_flags": (q_distinct_flags, SQL_DISTINCT_FLAGS),
    "events_hourly": (q_events_hourly, SQL_EVENTS_HOURLY),
    # incremental path must equal the batch view — same oracle
    "events_hourly_incremental": (q_events_hourly_incremental,
                                  SQL_EVENTS_HOURLY),
    "events_sliding": (q_events_sliding, SQL_EVENTS_SLIDING),
    "events_top3_per_type": (q_events_top3_per_type, SQL_EVENTS_TOP3),
    "events_json": (q_events_json, SQL_EVENTS_JSON),
    "running_spend": (q_running_spend, SQL_RUNNING_SPEND),
    "asof_latest_order": (q_asof_latest_order, SQL_ASOF_LATEST_ORDER),
    "event_followers": (q_event_followers, SQL_EVENT_FOLLOWERS),
    "events_value_quantiles": (q_events_value_quantiles, SQL_EVENTS_VALUE_QUANTILES),
    "events_hll_users": (q_events_hll_users, None),   # approximate: rows-only
    "hll_accuracy": (q_hll_accuracy, None),           # scores the sketch
    "event_dedup_window": (q_event_dedup_window, SQL_EVENT_DEDUP_WINDOW),
    "customers_without_orders": (q_customers_without_orders, SQL_CUSTOMERS_WITHOUT_ORDERS),
    "parts_ordered_large": (q_parts_ordered_large, SQL_PARTS_ORDERED_LARGE),
    "part_brand_stats": (q_part_brand_stats, SQL_PART_BRAND_STATS),
    "supplier_nation": (q_supplier_nation, SQL_SUPPLIER_NATION),
    "user_sessions": (q_user_sessions, SQL_USER_SESSIONS),
    "segment_status_native": (q_segment_status_native, SQL_SEGMENT_STATUS_NATIVE),
    "segment_nation_rollup": (q_segment_nation_rollup, SQL_SEGMENT_NATION_ROLLUP),
    "events_pivot": (q_events_pivot, SQL_EVENTS_PIVOT),
    "nation_balance_outer": (q_nation_balance_outer, SQL_NATION_BALANCE_OUTER),
    "event_funnel": (q_event_funnel, SQL_EVENT_FUNNEL),
    "events_dense_hours": (q_events_dense_hours, SQL_EVENTS_DENSE_HOURS),
    "customers_above_nation_avg": (q_customers_above_nation_avg,
                                   SQL_CUSTOMERS_ABOVE_NATION_AVG),
    "nation_top_customer": (q_nation_top_customer,
                            SQL_NATION_TOP_CUSTOMER),
    "order_value_corr_stats": (q_order_value_corr_stats,
                               SQL_ORDER_VALUE_CORR_STATS),
    "order_skyline": (q_order_skyline, SQL_ORDER_SKYLINE),
    "events_rate_anomaly": (q_events_rate_anomaly,
                            SQL_EVENTS_RATE_ANOMALY),
    "event_transitions": (q_event_transitions, SQL_EVENT_TRANSITIONS),
    "user_latest_event": (q_user_latest_event, SQL_USER_LATEST_EVENT),
    "bloom_semi_join": (q_bloom_semi_join, SQL_BLOOM_SEMI_JOIN),
}
