"""TPC-H completion bank — the ten classic shapes the other banks did
not yet cover (Q2, Q4, Q7, Q9, Q11, Q12, Q16, Q18, Q20, Q21), each
adapted to the available columns (no partsupp table, no
commitdate/receiptdate/shipmode in lineitem) and each with an exact
integer DuckDB oracle:

- ``min_bal_supplier`` (Q2): per-part argmax supplier over the
  lineitem-derived distinct (partkey, suppkey) relation — the
  correlated-min-subquery shape.
- ``priority_waiting`` (Q4): EXISTS semi-join — orders in a window
  having any lineitem shipped after the order date.
- ``nation_volume`` (Q7): two-nation bidirectional trade volume per
  year — the two-path dimension join.
- ``product_profit`` (Q9): per-(nation, year) profit for a part-name
  pattern — the four-table chained join with derived measure.
- ``important_parts`` (Q11): per-part value vs a GLOBAL total scalar —
  the decorrelated global-threshold shape.
- ``ship_class_counts`` (Q12): priority-class pivot counts per
  linestatus — the flag-pivot join.
- ``supplier_cnt`` (Q16): COUNT(DISTINCT supplier) per part attribute
  triple with a NOT-IN supplier exclusion.
- ``large_orders`` (Q18): HAVING SUM(qty) > threshold — the
  group-filter-then-join shape.
- ``promo_suppliers`` (Q20): suppliers holding an outsized share of a
  part's shipped quantity — nested per-key share threshold.
- ``waiting_suppliers`` (Q21): multi-exists — the supplier uniquely
  holding the latest ship date of a multi-supplier order.

Float discipline matches relational.py/analytics.py: money in exact
cents, discount/tax as integer percent, revenue as
``cents * (100 - disc_pct)`` (scaled 1e-4 dollars), quantities as
int64, time as floored epoch seconds.  Every aggregate is exact int64
so the DuckDB hash comparison is bit-stable.

Scale shapes: every join is a ``bucketed_cogroup`` (both sides
shuffled by key hash, nothing corpus-sized on the driver); the only
broadcasts are the documented fixed/bounded dims (nation names, one
nation's supplier keys, the negative-balance "complaint" list).
Per-batch combiners run before every exchange that tolerates them;
final merges are bounded by fixed key cardinality (priorities,
nations×years, linestatus, suppliers-per-nation).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _typed_empty(**cols: pa.DataType) -> pa.Table:
    """Explicitly-typed zero-row Arrow table.  An empty pandas object
    column infers Arrow ``null`` and poisons the shuffle's schema
    tracking ("new schema: ." -> silent row loss, see grouping._to_arrow)
    — every group fn that can emit zero rows WITH a string column must
    return one of these instead."""
    return pa.table({k: pa.array([], type=t) for k, t in cols.items()})


def _pq(sf_dir: str, table: str, columns: list[str] | None = None) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(arr) -> np.ndarray:
    return np.round(np.asarray(arr, dtype=np.float64) * 100).astype(np.int64)


def _epoch_s(ts: pd.Series) -> np.ndarray:
    ns = ts.astype("datetime64[ns]").astype("int64").to_numpy()
    return ns // 1_000_000_000


def _ts(s: str) -> int:
    return int(pd.Timestamp(s).value // 1_000_000_000)


def _nation_names(sf_dir: str) -> dict[int, str]:
    """nationkey -> name; nation is a FIXED-cardinality dim (25 rows at
    every scale) — the documented broadcast convention."""
    df = _pq(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    return dict(zip(df.n_nationkey.astype(int), df.n_name))


# --------------------------------------------------- Q2: min-bal supplier
Q2_TYPE = "PROMO"
Q2_SIZE_LO, Q2_SIZE_HI = 10, 20


def q_min_bal_supplier(sf_dir: str) -> rd.Dataset:
    """TPC-H Q2 shape: for each part of a given type/size band, the
    supplier with the best account balance among suppliers who actually
    shipped it (the lineitem-derived distinct part-supplier relation
    stands in for partsupp), tie-broken by smallest suppkey — the
    correlated argmin/argmax-per-key join.

    Shape at scale: lineitem slims to locally-deduped (partkey,
    suppkey) pairs per batch, balances attach through a
    suppkey-bucketed cogroup, the part filter + final per-part argmax
    run in ONE partkey-bucketed cogroup (global pair dedup falls out of
    the partkey bucketing — equal pairs always co-locate)."""
    from .grouping import bucketed_cogroup

    li = _pq(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_acctbal"])
    part = _pq(sf_dir, "part",
               ["p_partkey", "p_name", "p_type", "p_size"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        return pd.DataFrame({
            "pk": d.l_partkey.to_numpy().astype(np.int64),
            "sk": d.l_suppkey.to_numpy().astype(np.int64)})

    def attach_bal(lf: pd.DataFrame, sf: pd.DataFrame) -> pd.DataFrame:
        bal = pd.Series(_cents(sf.s_acctbal),
                        index=sf.s_suppkey.to_numpy().astype(np.int64))
        out = lf.drop_duplicates()
        out["bal"] = out.sk.map(bal).astype(np.int64)
        return out

    pb = bucketed_cogroup(li.map_batches(pairs, batch_format="pandas"),
                          supp, ["sk"], ["s_suppkey"], attach_bal,
                          num_buckets=16)

    def part_slim(df: pd.DataFrame) -> pd.DataFrame:
        keep = ((df.p_type == Q2_TYPE)
                & (df.p_size >= Q2_SIZE_LO)
                & (df.p_size <= Q2_SIZE_HI)).to_numpy()
        d = df[keep]
        return pd.DataFrame({
            "p_partkey": d.p_partkey.to_numpy().astype(np.int64),
            "p_name": d.p_name.to_numpy()})

    def argmax(lf: pd.DataFrame, rf: pd.DataFrame):
        empty = _typed_empty(p_partkey=pa.int64(), p_name=pa.string(),
                             best_suppkey=pa.int64(),
                             best_bal_cents=pa.int64())
        if not len(lf) or not len(rf):
            return empty
        d = (lf.drop_duplicates(["pk", "sk"])
               .merge(rf, left_on="pk", right_on="p_partkey")
               .sort_values(["pk", "bal", "sk"],
                            ascending=[True, False, True]))
        d = d.drop_duplicates("pk", keep="first")
        if not len(d):
            return empty
        return pd.DataFrame({
            "p_partkey": d.pk.to_numpy().astype(np.int64),
            "p_name": d.p_name.to_numpy(),
            "best_suppkey": d.sk.to_numpy().astype(np.int64),
            "best_bal_cents": d.bal.to_numpy().astype(np.int64)})

    return bucketed_cogroup(pb,
                            part.map_batches(part_slim,
                                             batch_format="pandas"),
                            ["pk"], ["p_partkey"], argmax,
                            num_buckets=16).sort("p_partkey")


SQL_MIN_BAL_SUPPLIER = f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
j AS (
  SELECT p.p_partkey, p.p_name, ps.l_suppkey AS sk,
         CAST(round(s.s_acctbal * 100) AS BIGINT) AS bal
  FROM ps
  JOIN part p ON p.p_partkey = ps.l_partkey
  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
  WHERE p.p_type = '{Q2_TYPE}'
    AND p.p_size BETWEEN {Q2_SIZE_LO} AND {Q2_SIZE_HI}
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY p_partkey
                               ORDER BY bal DESC, sk) AS rn
  FROM j
)
SELECT p_partkey, p_name, CAST(sk AS BIGINT) AS best_suppkey,
       bal AS best_bal_cents
FROM r WHERE rn = 1 ORDER BY p_partkey
"""


# ------------------------------------------------- Q4: priority waiting
Q4_LO, Q4_HI = "1997-01-01", "1997-07-01"


def q_priority_waiting(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q4 shape: orders placed in a six-month window having at
    least one lineitem shipped AFTER the order date (the
    late-commitment EXISTS), counted per priority.

    Shape at scale: the EXISTS collapses to a semilattice — lineitem
    pre-reduces per batch to per-order MAX(shipdate), so the
    orderkey-bucketed cogroup ships one row per (order, batch) instead
    of one per lineitem; the final merge is 5 fixed priority rows."""
    from .grouping import bucketed_cogroup

    lo, hi = _ts(Q4_LO), _ts(Q4_HI)
    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def o_slim(df: pd.DataFrame) -> pd.DataFrame:
        od = _epoch_s(df.o_orderdate)
        keep = (od >= lo) & (od < hi)
        return pd.DataFrame({
            "ok": df.o_orderkey.to_numpy().astype(np.int64)[keep],
            "od": od[keep],
            "pri": df.o_orderpriority.to_numpy()[keep]})

    def li_max(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "ok": df.l_orderkey.to_numpy().astype(np.int64),
            "sd": _epoch_s(df.l_shipdate)})
        return d.groupby("ok", as_index=False).sd.max()

    def count_waiting(of: pd.DataFrame, lf: pd.DataFrame):
        empty = _typed_empty(pri=pa.string(), order_count=pa.int64())
        if not len(of) or not len(lf):
            return empty
        mx = lf.groupby("ok").sd.max()
        late = of.od.to_numpy() < of.ok.map(mx).fillna(-2**62).to_numpy()
        out = (of[late].groupby("pri", as_index=False)
               .agg(order_count=("ok", "size")))
        if not len(out):
            return empty
        out["order_count"] = out.order_count.astype(np.int64)
        return out

    parts = bucketed_cogroup(
        orders.map_batches(o_slim, batch_format="pandas"),
        li.map_batches(li_max, batch_format="pandas"),
        ["ok"], ["ok"], count_waiting, num_buckets=16).to_pandas()
    out = (parts.groupby("pri", as_index=False)
           .agg(order_count=("order_count", "sum"))
           .rename(columns={"pri": "o_orderpriority"}))
    out["order_count"] = out.order_count.astype(np.int64)
    return out.sort_values("o_orderpriority").reset_index(drop=True)


SQL_PRIORITY_WAITING = f"""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{Q4_LO}'
  AND o.o_orderdate < TIMESTAMP '{Q4_HI}'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --------------------------------------------------- Q7: nation volume
Q7_NATION_A, Q7_NATION_B = "NATION_3", "NATION_7"
Q7_LO, Q7_HI = "1996-01-01", "1998-01-01"


def q_nation_volume(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q7 shape: bidirectional shipping volume between two
    nations per ship year — supplier-nation on one join path,
    customer-nation through orders on the other, keeping only the two
    (supp, cust) nation orderings.

    Shape at scale: nation is the fixed broadcast dim; customer and
    supplier tag their big-side partners through custkey-/suppkey-
    bucketed cogroups (each pre-filtered to the two nations, so the
    tagged intermediates carry only qualifying rows); the final
    orderkey cogroup emits (pair, year) partials — a 2x2-years merge."""
    from .grouping import bucketed_cogroup

    names = _nation_names(sf_dir)
    nk = {v: k for k, v in names.items()}
    nk_a, nk_b = nk[Q7_NATION_A], nk[Q7_NATION_B]
    lo, hi = _ts(Q7_LO), _ts(Q7_HI)

    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _pq(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_shipdate",
              "l_extendedprice", "l_discount"])
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def o_slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ok": df.o_orderkey.to_numpy().astype(np.int64),
            "ck": df.o_custkey.to_numpy().astype(np.int64)})

    def tag_cust(of: pd.DataFrame, cf: pd.DataFrame) -> pd.DataFrame:
        cn = pd.Series(cf.c_nationkey.to_numpy().astype(np.int64),
                       index=cf.c_custkey.to_numpy().astype(np.int64))
        out = pd.DataFrame({
            "ok": of.ok,
            "cnk": of.ck.map(cn).fillna(-1).astype(np.int64)})
        return out[out.cnk.isin([nk_a, nk_b])]

    co = bucketed_cogroup(orders.map_batches(o_slim,
                                             batch_format="pandas"),
                          cust, ["ck"], ["c_custkey"], tag_cust,
                          num_buckets=16)

    def li_slim(df: pd.DataFrame) -> pd.DataFrame:
        sd = _epoch_s(df.l_shipdate)
        keep = (sd >= lo) & (sd < hi)
        d = df[keep]
        return pd.DataFrame({
            "ok": d.l_orderkey.to_numpy().astype(np.int64),
            "sk": d.l_suppkey.to_numpy().astype(np.int64),
            "yr": d.l_shipdate.dt.year.to_numpy().astype(np.int64),
            "rev": _cents(d.l_extendedprice)
                   * (100 - _cents(d.l_discount))})

    def tag_supp(lf: pd.DataFrame, sf: pd.DataFrame) -> pd.DataFrame:
        sn = pd.Series(sf.s_nationkey.to_numpy().astype(np.int64),
                       index=sf.s_suppkey.to_numpy().astype(np.int64))
        out = lf[["ok", "yr", "rev"]].copy()
        out["snk"] = lf.sk.map(sn).fillna(-1).astype(np.int64)
        return out[out.snk.isin([nk_a, nk_b])]

    ls = bucketed_cogroup(li.map_batches(li_slim, batch_format="pandas"),
                          supp, ["sk"], ["s_suppkey"], tag_supp,
                          num_buckets=16)

    def volume(cf: pd.DataFrame, lf: pd.DataFrame) -> pd.DataFrame:
        m = lf.merge(cf, on="ok")
        m = m[m.snk.to_numpy() != m.cnk.to_numpy()]
        if not len(m):
            return pd.DataFrame({
                "snk": pd.Series([], dtype=np.int64),
                "cnk": pd.Series([], dtype=np.int64),
                "yr": pd.Series([], dtype=np.int64),
                "rev": pd.Series([], dtype=np.int64)})
        return (m.groupby(["snk", "cnk", "yr"], as_index=False)
                .agg(rev=("rev", "sum")).astype(np.int64))

    parts = bucketed_cogroup(co, ls, ["ok"], ["ok"], volume,
                             num_buckets=16).to_pandas()
    out = (parts.groupby(["snk", "cnk", "yr"], as_index=False)
           .agg(rev=("rev", "sum")))
    out = pd.DataFrame({
        "supp_nation": out.snk.map(names),
        "cust_nation": out.cnk.map(names),
        "l_year": out.yr.astype(np.int64),
        "rev_scaled": out.rev.astype(np.int64)})
    return (out.sort_values(["supp_nation", "cust_nation", "l_year"])
            .reset_index(drop=True))


SQL_NATION_VOLUME = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
            AS BIGINT) AS rev_scaled
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
WHERE l.l_shipdate >= TIMESTAMP '{Q7_LO}'
  AND l.l_shipdate < TIMESTAMP '{Q7_HI}'
  AND ((sn.n_name = '{Q7_NATION_A}' AND cn.n_name = '{Q7_NATION_B}')
    OR (sn.n_name = '{Q7_NATION_B}' AND cn.n_name = '{Q7_NATION_A}'))
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# -------------------------------------------------- Q9: product profit
Q9_PATTERN = "red"


def q_product_profit(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q9 shape: profit per (supplier nation, order year) over
    parts whose name contains a token — the four-table chained join
    with a derived measure.  With no partsupp.ps_supplycost, cost is
    quantity x p_retailprice (same scaled-integer algebra):
    profit = ext_cents*(100-disc) - qty*retail_cents*100.

    Shape at scale: three chained bucketed cogroups (partkey ->
    suppkey -> orderkey), each emitting only surviving slim columns;
    the part filter drops non-matching rows at the FIRST join so the
    later exchanges carry only qualifying lineitems.  Final merge is
    nations x years."""
    from .grouping import bucketed_cogroup

    names = _nation_names(sf_dir)
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
              "l_extendedprice", "l_discount"])
    part = _pq(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

    def li_slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ok": df.l_orderkey.to_numpy().astype(np.int64),
            "pk": df.l_partkey.to_numpy().astype(np.int64),
            "sk": df.l_suppkey.to_numpy().astype(np.int64),
            "q": df.l_quantity.to_numpy().astype(np.int64),
            "ext": _cents(df.l_extendedprice),
            "disc": _cents(df.l_discount)})

    def p_slim(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.p_name.str.contains(Q9_PATTERN, regex=False).to_numpy()
        d = df[keep]
        return pd.DataFrame({
            "p_partkey": d.p_partkey.to_numpy().astype(np.int64),
            "retail": _cents(d.p_retailprice)})

    def amount(lf: pd.DataFrame, pf: pd.DataFrame) -> pd.DataFrame:
        ret = pd.Series(pf.retail.to_numpy(),
                        index=pf.p_partkey.to_numpy())
        r = lf.pk.map(ret)
        keep = r.notna().to_numpy()
        d = lf[keep]
        rc = r[keep].to_numpy().astype(np.int64)
        return pd.DataFrame({
            "ok": d.ok, "sk": d.sk,
            "amt": d.ext.to_numpy() * (100 - d.disc.to_numpy())
                   - d.q.to_numpy() * rc * 100})

    la = bucketed_cogroup(li.map_batches(li_slim, batch_format="pandas"),
                          part.map_batches(p_slim,
                                           batch_format="pandas"),
                          ["pk"], ["p_partkey"], amount, num_buckets=16)

    def tag_nation(lf: pd.DataFrame, sf: pd.DataFrame) -> pd.DataFrame:
        sn = pd.Series(sf.s_nationkey.to_numpy().astype(np.int64),
                       index=sf.s_suppkey.to_numpy().astype(np.int64))
        out = lf[["ok", "amt"]].copy()
        out["nk"] = lf.sk.map(sn).astype(np.int64)
        return out

    ln = bucketed_cogroup(la, supp, ["sk"], ["s_suppkey"], tag_nation,
                          num_buckets=16)

    def o_slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ok": df.o_orderkey.to_numpy().astype(np.int64),
            "yr": df.o_orderdate.dt.year.to_numpy().astype(np.int64)})

    def per_ny(lf: pd.DataFrame, of: pd.DataFrame) -> pd.DataFrame:
        yr = pd.Series(of.yr.to_numpy(), index=of.ok.to_numpy())
        d = lf.copy()
        d["yr"] = d.ok.map(yr).astype(np.int64)
        return (d.groupby(["nk", "yr"], as_index=False)
                .agg(profit=("amt", "sum")).astype(np.int64))

    parts = bucketed_cogroup(ln,
                             orders.map_batches(o_slim,
                                                batch_format="pandas"),
                             ["ok"], ["ok"], per_ny,
                             num_buckets=16).to_pandas()
    out = (parts.groupby(["nk", "yr"], as_index=False)
           .agg(profit=("profit", "sum")))
    out = pd.DataFrame({
        "n_name": out.nk.map(names),
        "o_year": out.yr.astype(np.int64),
        "profit_scaled": out.profit.astype(np.int64)})
    return (out.sort_values(["n_name", "o_year"])
            .reset_index(drop=True))


SQL_PRODUCT_PROFIT = f"""
SELECT sn.n_name AS n_name,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
                - CAST(l.l_quantity AS BIGINT)
                  * CAST(round(p.p_retailprice * 100) AS BIGINT) * 100)
            AS BIGINT) AS profit_scaled
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%{Q9_PATTERN}%'
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------------ Q11: important parts
Q11_NATION = "NATION_3"
Q11_MEAN_MULT = 2            # keep parts with value > MULT x mean value


def q_important_parts(sf_dir: str) -> rd.Dataset:
    """TPC-H Q11 shape: per-part inventory value restricted to one
    nation's suppliers, kept only where the part's value exceeds a
    multiple of the GLOBAL mean part value — the decorrelated
    global-scalar-threshold query.  (TPC-H scales its total-value
    fraction by 1/SF; a mean-relative threshold is the scale-free
    equivalent — value*n > MULT*total is selective at every sf.)

    Shape at scale: supplier pre-filters to the nation through a
    suppkey-bucketed cogroup; per-part values reduce through per-batch
    combiners + ONE partkey-bucketed exchange; the global total is the
    sum of bounded per-block partials (a scalar), broadcast back into a
    distributed filter — the per-part value table itself never lands
    on the driver."""
    from .grouping import bucketed_cogroup

    names = _nation_names(sf_dir)
    nk = {v: k for k, v in names.items()}[Q11_NATION]

    li = _pq(sf_dir, "lineitem",
             ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
    supp = _pq(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])

    def li_slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "pk": df.l_partkey.to_numpy().astype(np.int64),
            "sk": df.l_suppkey.to_numpy().astype(np.int64),
            "val": _cents(df.l_extendedprice)
                   * (100 - _cents(df.l_discount))})

    def nation_only(lf: pd.DataFrame, sf: pd.DataFrame) -> pd.DataFrame:
        keep_sk = set(sf.s_suppkey[sf.s_nationkey == nk]
                      .to_numpy().astype(np.int64))
        d = lf[lf.sk.isin(keep_sk).to_numpy()]
        return (d.groupby("pk", as_index=False)
                .agg(val=("val", "sum")).astype(np.int64))

    vals = bucketed_cogroup(
        li.map_batches(li_slim, batch_format="pandas"),
        supp, ["sk"], ["s_suppkey"], nation_only,
        num_buckets=16)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("pk", as_index=False)
                .agg(val=("val", "sum")).astype(np.int64))

    from .grouping import bucketed_group_apply, maybe_checkpoint
    # TWO consumers read per_pk (the scalar total below and the final
    # filter) — checkpoint so the lineitem scan + cogroup + group-apply
    # run once, not twice (respects GRAFT_SETS_RESCAN)
    per_pk = maybe_checkpoint(
        bucketed_group_apply(vals, ["pk"], per_part, num_buckets=16))

    def block_total(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"t": [np.int64(df.val.sum())],
                             "n": [np.int64(len(df))]})

    # a zero-block per_pk (nation absent at tiny sf) yields a
    # column-less to_pandas — treat as total 0
    tp = per_pk.map_batches(block_total, batch_format="pandas").to_pandas()
    total = int(tp.t.sum()) if "t" in tp.columns else 0
    n_parts = int(tp.n.sum()) if "n" in tp.columns else 0

    def keep_important(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df.val.to_numpy() * n_parts > Q11_MEAN_MULT * total]
        return pd.DataFrame({
            "l_partkey": d.pk.to_numpy().astype(np.int64),
            "value_scaled": d.val.to_numpy().astype(np.int64)})

    # typed seed block keeps the output schema stable even when the
    # filtered result is empty (the similarity.py embed_neardup pattern)
    seed = rd.from_arrow(_typed_empty(l_partkey=pa.int64(),
                                      value_scaled=pa.int64()))
    return (seed.union(per_pk.map_batches(keep_important,
                                          batch_format="pandas"))
            .sort("l_partkey"))


SQL_IMPORTANT_PARTS = f"""
WITH v AS (
  SELECT l.l_partkey,
         CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
              AS BIGINT) AS value_scaled
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = '{Q11_NATION}'
  GROUP BY 1
)
SELECT l_partkey, value_scaled
FROM v
WHERE value_scaled * (SELECT COUNT(*) FROM v)
      > {Q11_MEAN_MULT} * (SELECT SUM(value_scaled) FROM v)
ORDER BY l_partkey
"""


# ---------------------------------------------- Q12: ship class counts
Q12_LO, Q12_HI = "1998-01-01", "1999-01-01"
Q12_HIGH = ("1-URGENT", "2-HIGH")


def q_ship_class_counts(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q12 shape: per linestatus (standing in for the absent
    shipmode), how many shipped lineitems in a year belong to
    high-priority orders vs low — the boolean-pivot join.

    Shape at scale: lineitem pre-filters + pre-counts per (orderkey,
    linestatus) per batch; orders slims to (orderkey, is_high); ONE
    orderkey-bucketed cogroup; final merge is |linestatus| rows."""
    from .grouping import bucketed_cogroup

    lo, hi = _ts(Q12_LO), _ts(Q12_HI)
    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_linestatus", "l_shipdate"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def li_slim(df: pd.DataFrame) -> pd.DataFrame:
        sd = _epoch_s(df.l_shipdate)
        keep = (sd >= lo) & (sd < hi)
        d = df[keep]
        g = pd.DataFrame({
            "ok": d.l_orderkey.to_numpy().astype(np.int64),
            "ls": d.l_linestatus.to_numpy()})
        return (g.groupby(["ok", "ls"], as_index=False)
                .agg(n=("ok", "size")))

    def o_slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ok": df.o_orderkey.to_numpy().astype(np.int64),
            "hi": df.o_orderpriority.isin(Q12_HIGH)
                  .to_numpy().astype(np.int64)})

    def pivot(lf: pd.DataFrame, of: pd.DataFrame):
        if not len(lf) or not len(of):
            return _typed_empty(ls=pa.string(), high_count=pa.int64(),
                                low_count=pa.int64())
        h = pd.Series(of.hi.to_numpy(), index=of.ok.to_numpy())
        d = lf.copy()
        d["hi"] = d.ok.map(h).astype(np.int64)
        n = d.n.to_numpy()
        d["high_n"] = n * d.hi.to_numpy()
        d["low_n"] = n * (1 - d.hi.to_numpy())
        return (d.groupby("ls", as_index=False)
                .agg(high_count=("high_n", "sum"),
                     low_count=("low_n", "sum")))

    parts = bucketed_cogroup(
        li.map_batches(li_slim, batch_format="pandas"),
        orders.map_batches(o_slim, batch_format="pandas"),
        ["ok"], ["ok"], pivot, num_buckets=16).to_pandas()
    out = (parts.groupby("ls", as_index=False)
           .agg(high_count=("high_count", "sum"),
                low_count=("low_count", "sum"))
           .rename(columns={"ls": "l_linestatus"})
           .astype({"high_count": np.int64, "low_count": np.int64}))
    return out.sort_values("l_linestatus").reset_index(drop=True)


SQL_SHIP_CLASS_COUNTS = f"""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('{Q12_HIGH[0]}',
                     '{Q12_HIGH[1]}') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('{Q12_HIGH[0]}',
                     '{Q12_HIGH[1]}') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{Q12_LO}'
  AND l.l_shipdate < TIMESTAMP '{Q12_HI}'
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------- Q16: supplier cnt
Q16_EXCL_TYPE = "PROMO"
Q16_SIZES = (1, 7, 14, 21, 28, 35, 42, 49)


def q_supplier_cnt(sf_dir: str) -> rd.Dataset:
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per (brand, type,
    size) over the lineitem-derived part-supplier relation, excluding
    one part type and a data-derived supplier blacklist (negative
    balance standing in for 'complaints' comments).

    Shape at scale: the blacklist is a tiny bounded broadcast (the
    complaint set); part attrs attach through a partkey-bucketed
    cogroup over locally-deduped pairs; the distinct-count groups by
    the attribute triple in a second bucketed exchange where equal
    (triple, suppkey) rows co-locate, so nunique is exact."""
    from .grouping import bucketed_cogroup, bucketed_group_apply

    supp = _pq(sf_dir, "supplier",
               ["s_suppkey", "s_acctbal"]).to_pandas()
    bad = set(supp.s_suppkey[supp.s_acctbal < 0]
              .to_numpy().astype(np.int64))

    li = _pq(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
    part = _pq(sf_dir, "part",
               ["p_partkey", "p_brand", "p_type", "p_size"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        sk = d.l_suppkey.to_numpy().astype(np.int64)
        keep = ~np.isin(sk, list(bad)) if bad else np.ones(len(d), bool)
        return pd.DataFrame({
            "pk": d.l_partkey.to_numpy().astype(np.int64)[keep],
            "sk": sk[keep]})

    def p_slim(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df.p_type != Q16_EXCL_TYPE).to_numpy() \
               & df.p_size.isin(Q16_SIZES).to_numpy()
        d = df[keep]
        return pd.DataFrame({
            "p_partkey": d.p_partkey.to_numpy().astype(np.int64),
            "brand": d.p_brand.to_numpy(),
            "type": d.p_type.to_numpy(),
            "size": d.p_size.to_numpy().astype(np.int64)})

    def attach(lf: pd.DataFrame, pf: pd.DataFrame):
        d = (lf.drop_duplicates(["pk", "sk"])
             .merge(pf, left_on="pk", right_on="p_partkey"))
        if not len(d):
            return _typed_empty(brand=pa.string(), type=pa.string(),
                                size=pa.int64(), sk=pa.int64())
        return d[["brand", "type", "size", "sk"]].drop_duplicates()

    tagged = bucketed_cogroup(
        li.map_batches(pairs, batch_format="pandas"),
        part.map_batches(p_slim, batch_format="pandas"),
        ["pk"], ["p_partkey"], attach, num_buckets=16)

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        out = (d.groupby(["brand", "type", "size"], as_index=False)
               .agg(supplier_cnt=("sk", "nunique")))
        out["supplier_cnt"] = out.supplier_cnt.astype(np.int64)
        out["size"] = out["size"].astype(np.int64)
        return out.rename(columns={"brand": "p_brand", "type": "p_type",
                                   "size": "p_size"})

    return (bucketed_group_apply(tagged, ["brand", "type", "size"],
                                 count_distinct, num_buckets=16)
            .sort(["p_brand", "p_type", "p_size"]))


SQL_SUPPLIER_CNT = f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_type <> '{Q16_EXCL_TYPE}'
  AND p.p_size IN ({", ".join(str(s) for s in Q16_SIZES)})
  AND ps.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ----------------------------------------------------- Q18: large orders
Q18_MIN_QTY = 250


def q_large_orders(sf_dir: str) -> rd.Dataset:
    """TPC-H Q18 shape: orders whose total lineitem quantity exceeds a
    threshold, joined back to the order header — the
    HAVING-SUM-then-join query.

    Shape at scale: lineitem pre-sums (orderkey, qty) per batch (a
    semilattice), one orderkey-bucketed exchange finishes the per-order
    sums and filters; only qualifying keys (a tiny fraction) cogroup
    with orders for the header columns."""
    from .grouping import bucketed_cogroup

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_totalprice"])

    def li_part(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "ok": df.l_orderkey.to_numpy().astype(np.int64),
            "q": df.l_quantity.to_numpy().astype(np.int64)})
        return d.groupby("ok", as_index=False).agg(q=("q", "sum"))

    def big(lf: pd.DataFrame, of: pd.DataFrame) -> pd.DataFrame:
        s = lf.groupby("ok", as_index=False).agg(q=("q", "sum"))
        s = s[s.q.to_numpy() > Q18_MIN_QTY]
        m = s.merge(of, left_on="ok", right_on="o_orderkey")
        return pd.DataFrame({
            "o_orderkey": m.ok.to_numpy().astype(np.int64),
            "o_custkey": m.o_custkey.to_numpy().astype(np.int64),
            "total_cents": _cents(m.o_totalprice),
            "total_qty": m.q.to_numpy().astype(np.int64)})

    return bucketed_cogroup(
        li.map_batches(li_part, batch_format="pandas"),
        orders, ["ok"], ["o_orderkey"], big,
        num_buckets=16).sort("o_orderkey")


SQL_LARGE_ORDERS = f"""
WITH s AS (
  SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS total_qty
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(l_quantity AS BIGINT)) > {Q18_MIN_QTY}
)
SELECT o.o_orderkey, o.o_custkey,
       CAST(round(o.o_totalprice * 100) AS BIGINT) AS total_cents,
       s.total_qty
FROM s JOIN orders o ON o.o_orderkey = s.l_orderkey
ORDER BY o.o_orderkey
"""


# -------------------------------------------------- Q20: promo suppliers
Q20_NATION = "NATION_3"
Q20_PATTERN = "red"
Q20_SHARE_PCT = 15           # supplier's share of a part's qty, percent


def q_promo_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q20 shape: suppliers of one nation holding an outsized
    share (> SHARE_PCT%) of the shipped quantity of some pattern-named
    part — the nested per-key-share threshold (availqty > 0.5*sum(qty)
    in the original), counting qualifying parts per supplier.

    Shape at scale: the pattern-part keys attach through a
    partkey-bucketed cogroup; per-(part, supplier) sums AND the
    per-part totals both complete inside that same bucket (partkey
    co-locates them), so the share test needs no second exchange; the
    nation's supplier keys are the documented bounded broadcast.
    Output is at most |suppliers of one nation| rows."""
    from .grouping import bucketed_cogroup

    names = _nation_names(sf_dir)
    nk = {v: k for k, v in names.items()}[Q20_NATION]
    sup = _pq(sf_dir, "supplier",
              ["s_suppkey", "s_nationkey"]).to_pandas()
    nat_sk = set(sup.s_suppkey[sup.s_nationkey == nk]
                 .to_numpy().astype(np.int64))

    li = _pq(sf_dir, "lineitem",
             ["l_partkey", "l_suppkey", "l_quantity"])
    part = _pq(sf_dir, "part", ["p_partkey", "p_name"])

    def li_part(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "pk": df.l_partkey.to_numpy().astype(np.int64),
            "sk": df.l_suppkey.to_numpy().astype(np.int64),
            "q": df.l_quantity.to_numpy().astype(np.int64)})
        return d.groupby(["pk", "sk"], as_index=False).agg(q=("q", "sum"))

    def p_slim(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.p_name.str.startswith(Q20_PATTERN).to_numpy()
        return pd.DataFrame({
            "p_partkey": df.p_partkey.to_numpy().astype(np.int64)[keep]})

    def share(lf: pd.DataFrame, pf: pd.DataFrame) -> pd.DataFrame:
        d = lf[lf.pk.isin(set(pf.p_partkey.to_numpy())).to_numpy()]
        if not len(d):
            return pd.DataFrame({
                "sk": pd.Series([], dtype=np.int64),
                "n_parts": pd.Series([], dtype=np.int64)})
        d = d.groupby(["pk", "sk"], as_index=False).agg(q=("q", "sum"))
        tot = d.groupby("pk").q.sum()
        hold = d.q.to_numpy() * 100 > d.pk.map(tot).to_numpy() \
               * Q20_SHARE_PCT
        d = d[hold & d.sk.isin(nat_sk).to_numpy()]
        out = d.groupby("sk", as_index=False).agg(n_parts=("pk", "size"))
        return out.astype(np.int64)

    parts = bucketed_cogroup(
        li.map_batches(li_part, batch_format="pandas"),
        part.map_batches(p_slim, batch_format="pandas"),
        ["pk"], ["p_partkey"], share, num_buckets=16).to_pandas()
    if "sk" not in parts.columns:       # zero-block result at tiny sf
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "n_parts": pd.Series([], dtype=np.int64)})
    out = (parts.groupby("sk", as_index=False)
           .agg(n_parts=("n_parts", "sum"))
           .rename(columns={"sk": "s_suppkey"})
           .astype({"s_suppkey": np.int64, "n_parts": np.int64}))
    return out.sort_values("s_suppkey").reset_index(drop=True)


SQL_PROMO_SUPPLIERS = f"""
WITH sp AS (
  SELECT l.l_partkey AS pk, l.l_suppkey AS sk,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '{Q20_PATTERN}%'
  GROUP BY 1, 2
), tot AS (
  SELECT pk, SUM(q) AS tq FROM sp GROUP BY 1
)
SELECT sp.sk AS s_suppkey, CAST(COUNT(*) AS BIGINT) AS n_parts
FROM sp
JOIN tot ON tot.pk = sp.pk
JOIN supplier s ON s.s_suppkey = sp.sk
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE sp.q * 100 > tot.tq * {Q20_SHARE_PCT}
  AND n.n_name = '{Q20_NATION}'
GROUP BY 1 ORDER BY 1
"""


# ----------------------------------------------- Q21: waiting suppliers
def q_waiting_suppliers(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q21 shape: for finished ('F') multi-supplier orders, the
    supplier who UNIQUELY holds the latest ship date (they alone held
    the order up) — the exists/not-exists double correlation, counted
    per supplier.

    Shape at scale: orders slims to qualifying keys; lineitem ships
    (orderkey, suppkey, shipdate) once; inside the orderkey bucket the
    per-order max, the multi-supplier test and the unique-holder test
    are all vectorized run-boundary arithmetic; the final count merge
    is |suppliers| bounded."""
    from .grouping import bucketed_cogroup

    li = _pq(sf_dir, "lineitem",
             ["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _pq(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

    def o_slim(df: pd.DataFrame) -> pd.DataFrame:
        keep = (df.o_orderstatus == "F").to_numpy()
        return pd.DataFrame({
            "ok": df.o_orderkey.to_numpy().astype(np.int64)[keep]})

    def li_slim(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "ok": df.l_orderkey.to_numpy().astype(np.int64),
            "sk": df.l_suppkey.to_numpy().astype(np.int64),
            "sd": _epoch_s(df.l_shipdate)})

    def holders(lf: pd.DataFrame, of: pd.DataFrame) -> pd.DataFrame:
        d = lf[lf.ok.isin(set(of.ok.to_numpy())).to_numpy()]
        if not len(d):
            return pd.DataFrame({
                "sk": pd.Series([], dtype=np.int64),
                "numwait": pd.Series([], dtype=np.int64)})
        g = d.groupby("ok")
        mx = g.sd.transform("max").to_numpy()
        nsup = g.sk.transform("nunique").to_numpy()
        at_max = d[(d.sd.to_numpy() == mx) & (nsup > 1)]
        per = at_max.groupby("ok").sk.agg(["min", "max"])
        solo = per[per["min"] == per["max"]]["min"]
        out = (pd.DataFrame({"sk": solo.to_numpy().astype(np.int64)})
               .groupby("sk", as_index=False)
               .agg(numwait=("sk", "size")))
        return out.astype(np.int64)

    parts = bucketed_cogroup(
        li.map_batches(li_slim, batch_format="pandas"),
        orders.map_batches(o_slim, batch_format="pandas"),
        ["ok"], ["ok"], holders, num_buckets=16).to_pandas()
    out = (parts.groupby("sk", as_index=False)
           .agg(numwait=("numwait", "sum"))
           .rename(columns={"sk": "s_suppkey"})
           .astype({"s_suppkey": np.int64, "numwait": np.int64}))
    return out.sort_values("s_suppkey").reset_index(drop=True)


SQL_WAITING_SUPPLIERS = """
WITH f AS (
  SELECT l.l_orderkey AS ok, l.l_suppkey AS sk, l.l_shipdate AS sd
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
), m AS (
  SELECT ok, MAX(sd) AS mx, COUNT(DISTINCT sk) AS ns
  FROM f GROUP BY 1
), h AS (
  SELECT f.ok, MIN(f.sk) AS lo, MAX(f.sk) AS hi
  FROM f JOIN m ON m.ok = f.ok
  WHERE f.sd = m.mx AND m.ns > 1
  GROUP BY 1
)
SELECT CAST(lo AS BIGINT) AS s_suppkey,
       CAST(COUNT(*) AS BIGINT) AS numwait
FROM h WHERE lo = hi GROUP BY 1 ORDER BY 1
"""


# --------------------------------------- fulfillment lag quantiles
def q_fulfillment_lag_quantiles(sf_dir: str) -> pd.DataFrame:
    """Order-to-last-shipment lag percentiles per priority (p50/p90/p99
    in whole days) — the fulfillment-SLA report, computed the
    bounded-histogram way: lag values live in a DAY domain (a few
    thousand distinct values at any corpus size), so per-(priority,
    lag) counts are an exchange bounded by the domain, not the corpus,
    and exact quantiles come from a cumulative scan of that histogram
    (contrast lang_length_quantiles, which co-locates full multisets).
    Ranks use the integer ceil(p*n) convention on both sides.  Day
    arithmetic subtracts two FLOORED epoch-days so no negative-division
    convention can leak in.

    Shape at scale: lineitem pre-reduces per batch to per-order MAX
    shipdate (semilattice); ONE orderkey cogroup attaches priority;
    per-batch (priority, lag_days) counts merge in one bounded
    exchange; the quantile scan is 5 x |day domain| driver rows."""
    from .grouping import bucketed_cogroup, bucketed_group_apply

    li = _pq(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
    orders = _pq(sf_dir, "orders",
                 ["o_orderkey", "o_orderdate", "o_orderpriority"])

    def li_max(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "ok": df.l_orderkey.to_numpy().astype(np.int64),
            "sd": _epoch_s(df.l_shipdate) // 86400})
        return d.groupby("ok", as_index=False).sd.max()

    def lag_counts(lf: pd.DataFrame, of: pd.DataFrame) -> pd.DataFrame:
        if not len(lf) or not len(of):
            return _typed_empty(pri=pa.string(), lag_days=pa.int64(),
                                cnt=pa.int64())
        mx = lf.groupby("ok").sd.max()
        od = _epoch_s(of.o_orderdate) // 86400
        sd = of.o_orderkey.map(mx)
        has_li = sd.notna().to_numpy()   # inner-join semantics: orders
        lag = sd.to_numpy()[has_li] - od[has_li]  # w/o lineitems drop
        g = pd.DataFrame({
            "pri": of.o_orderpriority.to_numpy()[has_li],
            "lag_days": lag.astype(np.int64)})
        out = (g.groupby(["pri", "lag_days"], as_index=False)
               .agg(cnt=("lag_days", "size")))
        return out.astype({"lag_days": np.int64, "cnt": np.int64})

    counts = bucketed_cogroup(
        li.map_batches(li_max, batch_format="pandas"),
        orders, ["ok"], ["o_orderkey"], lag_counts, num_buckets=16)

    def quantiles(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for pri, g in df.groupby("pri", sort=True):
            h = (g.groupby("lag_days", as_index=False)
                 .agg(cnt=("cnt", "sum")).sort_values("lag_days"))
            n = int(h.cnt.sum())
            cum = h.cnt.to_numpy().cumsum()
            days = h.lag_days.to_numpy()

            def at(rank: int) -> int:
                return int(days[np.searchsorted(cum, rank)])

            rows.append((pri, n, at((n + 1) // 2),
                         at((9 * n + 9) // 10), at((99 * n + 99) // 100)))
        return pd.DataFrame(rows, columns=[
            "o_orderpriority", "n_orders", "p50_days", "p90_days",
            "p99_days"]).astype({"n_orders": np.int64,
                                 "p50_days": np.int64,
                                 "p90_days": np.int64,
                                 "p99_days": np.int64})

    out = (bucketed_group_apply(counts, ["pri"], quantiles,
                                num_buckets=4).to_pandas())
    return (out.sort_values("o_orderpriority").reset_index(drop=True))


SQL_FULFILLMENT_LAG_QUANTILES = """
WITH m AS (
  SELECT l_orderkey AS ok,
         MAX(CAST(floor(epoch(l_shipdate)) AS BIGINT) // 86400) AS sd
  FROM lineitem GROUP BY 1
), j AS (
  SELECT o.o_orderpriority AS pri,
         m.sd - CAST(floor(epoch(o.o_orderdate)) AS BIGINT) // 86400
           AS lag_days
  FROM orders o JOIN m ON m.ok = o.o_orderkey
), r AS (
  SELECT pri, lag_days,
         ROW_NUMBER() OVER (PARTITION BY pri ORDER BY lag_days) AS rn,
         COUNT(*) OVER (PARTITION BY pri) AS n
  FROM j
)
SELECT pri AS o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN lag_days END)
            AS BIGINT) AS p50_days,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN lag_days END)
            AS BIGINT) AS p90_days,
       CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN lag_days END)
            AS BIGINT) AS p99_days
FROM r GROUP BY 1 ORDER BY 1
"""


TPCHX_QUERIES = {
    "fulfillment_lag_quantiles": (q_fulfillment_lag_quantiles,
                                  SQL_FULFILLMENT_LAG_QUANTILES),
    "min_bal_supplier": (q_min_bal_supplier, SQL_MIN_BAL_SUPPLIER),
    "priority_waiting": (q_priority_waiting, SQL_PRIORITY_WAITING),
    "nation_volume": (q_nation_volume, SQL_NATION_VOLUME),
    "product_profit": (q_product_profit, SQL_PRODUCT_PROFIT),
    "important_parts": (q_important_parts, SQL_IMPORTANT_PARTS),
    "ship_class_counts": (q_ship_class_counts, SQL_SHIP_CLASS_COUNTS),
    "supplier_cnt": (q_supplier_cnt, SQL_SUPPLIER_CNT),
    "large_orders": (q_large_orders, SQL_LARGE_ORDERS),
    "promo_suppliers": (q_promo_suppliers, SQL_PROMO_SUPPLIERS),
    "waiting_suppliers": (q_waiting_suppliers, SQL_WAITING_SUPPLIERS),
}
