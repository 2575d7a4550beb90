"""Data-mining / warehouse operators the other banks don't cover yet,
each with an exact DuckDB oracle:

- point-in-time SCD2 join (``events_pit_join``): the temporal-warehouse
  correctness primitive — facts join the dimension VERSION valid at the
  fact's timestamp, never the latest one.  Dimension = type-2 intervals
  compacted from the even-event CDC stream; facts = the odd events.
  Complements ``user_scd2`` (builds intervals) and ``asof_latest_order``
  (nearest-at-or-before, no validity END).
- IQR outlier fences (``value_outliers``): per-type exact quartiles via
  integer inverted-CDF ranks, Tukey 1.5x fences in cross-multiplied
  integer arithmetic (2c < 5*q1 - 3*q3), second pass counts fence
  violations — the data-QA screen before training-set admission.
- l-diversity audit (``l_diversity``): per quasi-identifier group, the
  number of DISTINCT sensitive values (k-anonymity's companion: a group
  can be large yet leak if every member shares the sensitive value).
- Count-Min sketch (``count_min``): the mergeable frequency sketch —
  d=4 salted-md5 rows x w=256 counters over document tokens.  Counters
  are exact sums of hashed token counts, so the WHOLE sketch is
  SQL-expressible and value-gated (unlike HLL/quantile sketches whose
  estimates are rows-only); the point-query property (min over rows
  >= true count) is pytest-pinned.

Float discipline matches analytics.py: money in exact cents, time in
floored epoch seconds; no float column ships or compares.

Scale notes are per-operator in the docstrings; driver-side merges are
bounded by sketch size (1024 rows), fixed QI cardinality, or per-type
value-range histograms — never corpus-sized.
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
    ns = ts.astype("datetime64[ns]").astype("int64")
    return ns // 1_000_000_000


# ------------------------------------------- point-in-time SCD2 join
def q_events_pit_join(sf_dir: str) -> rd.Dataset:
    """Point-in-time join: each ODD event (fact) picks up the event_type
    interval of the EVEN-event CDC stream (dimension) that was valid at
    the fact's timestamp — [valid_from, valid_to) containment, open last
    interval, NULL when the fact precedes the user's first dim version.

    Shape at scale: ONE user-bucketed shuffle carries BOTH roles (the
    even/odd split happens inside the bucket), so dimension intervals
    and facts for a user are co-located without a second exchange; the
    per-bucket kernel is a vectorized islands pass + one searchsorted
    per user.  Empty intervals (two type flips inside one epoch second)
    are excluded exactly as the SQL range predicate excludes them."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

    def pit(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"]).copy()
        df["_s"] = _epoch_s(df.ts)
        even = df[df.event_id % 2 == 0]
        facts = df[df.event_id % 2 == 1]
        # islands over the dimension stream (per-bucket global cumsum;
        # per-user ordinals re-derived below, as in user_scd2)
        chg = (even.user_id != even.user_id.shift()) | \
              (even.event_type != even.event_type.shift())
        dim = even.assign(island=chg.cumsum()).groupby(
            ["user_id", "island"], as_index=False).agg(
            dim_type=("event_type", "first"), valid_from_s=("_s", "min"))
        dim = dim.sort_values(["user_id", "valid_from_s", "island"])
        dim["island"] = dim.groupby("user_id").cumcount() + 1

        out_island = np.full(len(facts), -1, dtype=np.int64)
        out_type = np.full(len(facts), None, dtype=object)
        fu = facts.user_id.to_numpy()
        fs = facts._s.to_numpy()
        grp = {u: g for u, g in dim.groupby("user_id")}
        # one searchsorted per user present in this bucket's facts
        order = np.argsort(fu, kind="stable")
        i = 0
        while i < len(order):
            j = i
            u = fu[order[i]]
            while j < len(order) and fu[order[j]] == u:
                j += 1
            g = grp.get(u)
            if g is not None:
                vf = g.valid_from_s.to_numpy()
                isl = g.island.to_numpy()
                ty = g.dim_type.to_numpy()
                sel = order[i:j]
                pos = np.searchsorted(vf, fs[sel], side="right") - 1
                ok = pos >= 0
                out_island[sel[ok]] = isl[pos[ok]]
                out_type[sel[ok]] = ty[pos[ok]]
            i = j
        out = pd.DataFrame({
            "event_id": facts.event_id.to_numpy(),
            "user_id": facts.user_id.to_numpy(),
            "fact_ts_s": fs,
            "fact_type": facts.event_type.to_numpy(),
            "dim_island": pd.array(
                np.where(out_island >= 0, out_island, 0),
                dtype="Int64"),
            "dim_type": out_type,
        })
        out.loc[out_island < 0, "dim_island"] = pd.NA
        out["dim_type"] = out.dim_type.astype("string")
        return out

    return bucketed_group_apply(ds, ["user_id"], pit).sort("event_id")


SQL_EVENTS_PIT_JOIN = """
WITH e AS (
  SELECT event_id, user_id, event_type, ts,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events),
d0 AS (
  SELECT *, CASE WHEN LAG(event_type) OVER w IS DISTINCT FROM event_type
                 THEN 1 ELSE 0 END AS chg
  FROM e WHERE event_id % 2 = 0
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
d1 AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM d0),
dim AS (
  SELECT user_id, CAST(island AS BIGINT) AS island,
         MIN(event_type) AS dim_type, MIN(es) AS valid_from_s
  FROM d1 GROUP BY user_id, island),
dim2 AS (
  SELECT user_id, island, dim_type, valid_from_s,
         COALESCE(LEAD(valid_from_s)
           OVER (PARTITION BY user_id ORDER BY island), -1) AS valid_to_s
  FROM dim),
f AS (
  SELECT event_id, user_id, event_type AS fact_type, es
  FROM e WHERE event_id % 2 = 1)
SELECT f.event_id, f.user_id, f.es AS fact_ts_s, f.fact_type,
       d.island AS dim_island, d.dim_type
FROM f LEFT JOIN dim2 d
  ON f.user_id = d.user_id
 AND f.es >= d.valid_from_s
 AND (d.valid_to_s = -1 OR f.es < d.valid_to_s)
ORDER BY f.event_id
"""


# ------------------------------------------------- IQR outlier fences
def q_value_outliers(sf_dir: str) -> pd.DataFrame:
    """Tukey-fence outlier counts per event type — exact quartiles from
    (type, cents) histogram partials (inverted-CDF integer ranks
    ceil(n/4) and ceil(3n/4)), fences compared in cross-multiplied
    integers (2c vs 5*q1 - 3*q3), second histogram-free pass counts
    violations per batch.

    Shape at scale: both passes ship per-batch (type, ...) partials
    bounded by the per-type VALUE RANGE (pass 1) or type cardinality
    (pass 2); the quartile dict broadcast into pass 2 is one entry per
    type.  Same two-dependent-pass shape as events_mad."""
    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"t": df.event_type, "c": _cents(df.value)})
        return d.groupby(["t", "c"]).size().reset_index(name="cnt")

    h = ds.map_batches(hist, batch_format="pandas").to_pandas()
    quart: dict[str, tuple[int, int, int]] = {}
    for t, g in h.groupby("t"):
        g = g.groupby("c", as_index=False).cnt.sum().sort_values("c")
        n = int(g.cnt.sum())
        cum = g.cnt.cumsum().to_numpy()
        vals = g.c.to_numpy()
        q1 = int(vals[np.searchsorted(cum, (n + 3) // 4)])
        q3 = int(vals[np.searchsorted(cum, (3 * n + 3) // 4)])
        quart[t] = (n, q1, q3)

    def fences(df: pd.DataFrame) -> pd.DataFrame:
        c2 = 2 * _cents(df.value)
        q1 = df.event_type.map({t: v[1] for t, v in quart.items()}).to_numpy()
        q3 = df.event_type.map({t: v[2] for t, v in quart.items()}).to_numpy()
        lo = c2 < 5 * q1 - 3 * q3
        hi = c2 > 5 * q3 - 3 * q1
        d = pd.DataFrame({"t": df.event_type, "lo": lo.astype(np.int64),
                          "hi": hi.astype(np.int64)})
        return d.groupby("t", as_index=False).agg(n_low=("lo", "sum"),
                                                  n_high=("hi", "sum"))

    f = (ds.map_batches(fences, batch_format="pandas").to_pandas()
         .groupby("t", as_index=False).sum())
    f = f.set_index("t")
    rows = [(t, quart[t][0], quart[t][1], quart[t][2],
             int(f.n_low.get(t, 0)), int(f.n_high.get(t, 0)))
            for t in sorted(quart)]
    out = pd.DataFrame(rows, columns=["event_type", "n_events", "q1_cents",
                                      "q3_cents", "n_low", "n_high"])
    for c in out.columns[1:]:
        out[c] = out[c].astype(np.int64)
    return out


SQL_VALUE_OUTLIERS = """
WITH v AS (
  SELECT event_type, CAST(round(value*100) AS BIGINT) AS c FROM events),
n AS (SELECT event_type, COUNT(*) AS n FROM v GROUP BY 1),
h AS (SELECT event_type, c, COUNT(*) AS cnt FROM v GROUP BY 1, 2),
cdf AS (
  SELECT event_type, c,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY c) AS cum
  FROM h),
q AS (
  SELECT n.event_type, n.n,
         (SELECT MIN(c) FROM cdf WHERE cdf.event_type = n.event_type
            AND cum >= (n.n + 3) // 4) AS q1,
         (SELECT MIN(c) FROM cdf WHERE cdf.event_type = n.event_type
            AND cum >= (3 * n.n + 3) // 4) AS q3
  FROM n)
SELECT q.event_type AS event_type, q.n AS n_events,
       q.q1 AS q1_cents, q.q3 AS q3_cents,
       CAST(SUM(CASE WHEN 2*v.c < 5*q.q1 - 3*q.q3 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN 2*v.c > 5*q.q3 - 3*q.q1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high
FROM q JOIN v ON v.event_type = q.event_type
GROUP BY 1, 2, 3, 4 ORDER BY event_type
"""


# ---------------------------------------------------- l-diversity audit
def q_l_diversity(sf_dir: str) -> pd.DataFrame:
    """l-diversity audit over the (segment, nation) quasi-identifier with
    the $1000-balance bucket as the sensitive attribute: group size AND
    the number of distinct sensitive values per group (k-anonymity's
    blind spot — a size-1000 group whose members all share one sensitive
    value still re-identifies it).

    Shape at scale: per-batch DISTINCT (qi, sensitive) partials with
    counts -> one QI-bucketed merge; the exchange is bounded by
    |QI| x |sensitive buckets| per batch (5 x 25 x 11 here), never
    row count."""
    from .grouping import bucketed_group_apply

    L = 3
    ds = _pq(sf_dir, "customer", ["c_mktsegment", "c_nationkey",
                                  "c_acctbal"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.assign(sens=_cents(df.c_acctbal) // 100_000)
        return g.groupby(["c_mktsegment", "c_nationkey", "sens"],
                         as_index=False).agg(cnt=("c_acctbal", "size"))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        s = df.groupby(["c_mktsegment", "c_nationkey", "sens"],
                       as_index=False).cnt.sum()
        out = s.groupby(["c_mktsegment", "c_nationkey"],
                        as_index=False).agg(n_rows=("cnt", "sum"),
                                            l_distinct=("sens", "size"))
        out["meets_l"] = (out.l_distinct >= L).astype(np.int64)
        return out

    res = bucketed_group_apply(
        ds.map_batches(part, batch_format="pandas"),
        ["c_mktsegment", "c_nationkey"], merge, num_buckets=16).to_pandas()
    res = res.rename(columns={"c_mktsegment": "segment",
                              "c_nationkey": "nationkey"})
    for c in ("n_rows", "l_distinct", "meets_l"):
        res[c] = res[c].astype(np.int64)
    res["nationkey"] = res.nationkey.astype(np.int64)
    return (res.sort_values(["segment", "nationkey"])
            .reset_index(drop=True))


SQL_L_DIVERSITY = """
WITH s AS (
  SELECT c_mktsegment AS segment, CAST(c_nationkey AS BIGINT) AS nationkey,
         CAST(floor(CAST(round(c_acctbal*100) AS BIGINT) / 100000)
              AS BIGINT) AS sens
  FROM customer)
SELECT segment, nationkey, COUNT(*) AS n_rows,
       COUNT(DISTINCT sens) AS l_distinct,
       CAST(CASE WHEN COUNT(DISTINCT sens) >= 3 THEN 1 ELSE 0 END
            AS BIGINT) AS meets_l
FROM s GROUP BY 1, 2 ORDER BY segment, nationkey
"""


# ----------------------------------------------------- Count-Min sketch
_CM_D, _CM_W = 4, 256


def _cm_buckets(tokens: np.ndarray) -> np.ndarray:
    """(len(tokens), d) bucket ids from salted md5 — the same 60-bit
    hex-prefix construction DuckDB evaluates (weighted_sample precedent,
    analytics.py)."""
    out = np.empty((len(tokens), _CM_D), dtype=np.int64)
    for i, t in enumerate(tokens):
        for r in range(_CM_D):
            h = hashlib.md5(f"{r}:{t}".encode("utf-8")).hexdigest()[:15]
            out[i, r] = int(h, 16) % _CM_W
    return out


def q_count_min(sf_dir: str) -> pd.DataFrame:
    """Count-Min sketch over document tokens: d=4 salted rows x w=256
    counters.  Every counter is an EXACT sum of the counts of tokens
    hashing to it, so the full sketch state is value-gated against SQL;
    the point-query guarantee (min over rows >= true frequency, error
    <= eps*N with prob 1-(1/2)^d) is pytest-pinned.

    Shape at scale: per-batch partial sketches (a 4x256 int64 array per
    batch, built from the batch's UNIQUE tokens only) -> one bounded
    merge; the sketch never exceeds 1024 rows regardless of corpus or
    vocabulary size — that is the point of the sketch.  Merge of two
    sketches = elementwise sum (semilattice), which is what makes it
    the distributed/streaming frequency structure."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "documents", ["text"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        acc = np.zeros((_CM_D, _CM_W), dtype=np.int64)
        toks: list[str] = []
        for t in df.text:
            toks.extend(t.split())
        if toks:
            uniq, cnt = np.unique(np.asarray(toks, dtype=object),
                                  return_counts=True)
            bk = _cm_buckets(uniq)
            for r in range(_CM_D):
                np.add.at(acc[r], bk[:, r], cnt)
        r, b = np.nonzero(acc)
        return pd.DataFrame({"sketch_row": r.astype(np.int64),
                             "bucket": b.astype(np.int64),
                             "cnt": acc[r, b]})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["sketch_row", "bucket"], as_index=False).cnt.sum()

    out = bucketed_group_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["sketch_row", "bucket"], merge, num_buckets=8).to_pandas()
    out = out.sort_values(["sketch_row", "bucket"]).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


def cm_point_query(sketch: pd.DataFrame, token: str) -> int:
    """CMS point estimate: min over rows of the token's counter."""
    est = []
    for r in range(_CM_D):
        h = int(hashlib.md5(f"{r}:{token}".encode()).hexdigest()[:15], 16)
        row = sketch[(sketch.sketch_row == r) & (sketch.bucket == h % _CM_W)]
        est.append(int(row.cnt.iloc[0]) if len(row) else 0)
    return min(est)


SQL_COUNT_MIN = r"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
  FROM documents WHERE trim(text) <> ''),
salted AS (
  SELECT r.i AS sketch_row,
         CAST(('0x' || substr(md5(CAST(r.i AS VARCHAR) || ':' || tok),
                              1, 15)) AS BIGINT) % 256 AS bucket
  FROM toks CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) r)
SELECT sketch_row, bucket, COUNT(*) AS cnt
FROM salted GROUP BY 1, 2 ORDER BY sketch_row, bucket
"""


# ------------------------------------------------- association rules
# Market-basket rules (Agrawal-Srikant): parts_coordered stops at
# frequent PAIRS; this derives the directional rules A=>B with exact
# integer-scaled confidence (1000*c2 // c1(A)) and lift
# (1000*c2*N // (c1(A)*c1(B))), N = distinct baskets.  Top-100 by
# (lift, confidence) — the interestingness ranking.
_RULE_MIN_PAIRS = 2
_RULE_TOPK = 100


def q_assoc_rules(sf_dir: str) -> pd.DataFrame:
    """Shape at scale: pair expansion inside an orderkey-bucketed group
    apply (bounded by per-basket line counts); pair and item counts each
    take ONE bucketed sum; metrics attach via TWO pair-vs-item bucketed
    cogroups (antecedent side, then consequent side) — the item table is
    vocabulary-sized and never broadcast or driver-held.  The basket
    count N is the only driver scalar (16 partial rows).  Final top-100
    is a semilattice: per-bucket top-100, <=100 x 16 rows merged."""
    from .grouping import bucketed_cogroup, bucketed_group_apply

    ds = _pq(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        m = d.merge(d, on="l_orderkey", suffixes=("_a", "_b"))
        m = m[m.l_partkey_a < m.l_partkey_b]
        out = m.groupby(["l_partkey_a", "l_partkey_b"],
                        as_index=False).agg(c2=("l_orderkey", "size"))
        return out.rename(columns={"l_partkey_a": "pa",
                                   "l_partkey_b": "pb"})

    def items(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(["l_orderkey", "l_partkey"])
        out = d.groupby("l_partkey", as_index=False).agg(
            c1=("l_orderkey", "size"))
        return out.rename(columns={"l_partkey": "p"})

    by_order_p = bucketed_group_apply(ds, ["l_orderkey"], pairs,
                                      num_buckets=16)
    by_order_i = bucketed_group_apply(ds, ["l_orderkey"], items,
                                      num_buckets=16)

    def sum_pairs(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["pa", "pb"], as_index=False).c2.sum()
        out = out[out.c2 >= _RULE_MIN_PAIRS]
        return out.astype({"pa": np.int64, "pb": np.int64,
                           "c2": np.int64})

    def sum_items(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("p", as_index=False).c1.sum()
        return out.astype({"p": np.int64, "c1": np.int64})

    pair_ct = bucketed_group_apply(by_order_p, ["pa", "pb"], sum_pairs,
                                   num_buckets=16)
    item_ct = bucketed_group_apply(by_order_i, ["p"], sum_items,
                                   num_buckets=16)
    # N: per-orderkey-bucket distinct-basket partials (16 tiny rows);
    # orderkeys hash to exactly one bucket, so the partial sum is exact
    def basket_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"nb": pd.Series([df.l_orderkey.nunique()],
                                             dtype=np.int64)})

    nb = int(bucketed_group_apply(ds, ["l_orderkey"], basket_partial,
                                  num_buckets=16).to_pandas().nb.sum())

    def attach_a(pf: pd.DataFrame, itf: pd.DataFrame) -> pd.DataFrame:
        m = pf.merge(itf.rename(columns={"p": "pa", "c1": "c1a"}),
                     on="pa", how="inner")
        return m.astype({"c1a": np.int64})

    withA = bucketed_cogroup(pair_ct, item_ct, ["pa"], ["p"], attach_a,
                             num_buckets=16)

    def attach_b(pf: pd.DataFrame, itf: pd.DataFrame,
                 _nb=nb) -> pd.DataFrame:
        m = pf.merge(itf.rename(columns={"p": "pb", "c1": "c1b"}),
                     on="pb", how="inner")
        fwd = pd.DataFrame({
            "antecedent": m.pa, "consequent": m.pb, "n_pairs": m.c2,
            "n_ante": m.c1a,
            "conf_milli": (1000 * m.c2) // m.c1a,
            "lift_milli": (1000 * m.c2 * _nb) // (m.c1a * m.c1b)})
        rev = pd.DataFrame({
            "antecedent": m.pb, "consequent": m.pa, "n_pairs": m.c2,
            "n_ante": m.c1b,
            "conf_milli": (1000 * m.c2) // m.c1b,
            "lift_milli": (1000 * m.c2 * _nb) // (m.c1a * m.c1b)})
        out = pd.concat([fwd, rev], ignore_index=True)
        out = out.sort_values(
            ["lift_milli", "conf_milli", "antecedent", "consequent"],
            ascending=[False, False, True, True]).head(_RULE_TOPK)
        return out.astype({c: np.int64 for c in out.columns})

    merged = bucketed_cogroup(withA, item_ct, ["pb"], ["p"], attach_b,
                              num_buckets=16).to_pandas()
    return (merged.sort_values(
        ["lift_milli", "conf_milli", "antecedent", "consequent"],
        ascending=[False, False, True, True])
        .head(_RULE_TOPK).reset_index(drop=True))


SQL_ASSOC_RULES = f"""
WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS nb FROM lineitem),
c1 AS (SELECT l_partkey AS p, COUNT(*) AS c FROM dp GROUP BY 1),
c2 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
              COUNT(*) AS c
       FROM dp a JOIN dp b ON a.l_orderkey = b.l_orderkey
                          AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2 HAVING COUNT(*) >= {_RULE_MIN_PAIRS}),
j AS (SELECT pa, pb, c2.c, ca.c AS c1a, cb.c AS c1b, n.nb
      FROM c2 JOIN c1 ca ON ca.p = c2.pa
              JOIN c1 cb ON cb.p = c2.pb CROSS JOIN n),
rules AS (
  SELECT pa AS antecedent, pb AS consequent, c AS n_pairs, c1a AS n_ante,
         (1000 * c) // c1a AS conf_milli,
         (1000 * c * nb) // (c1a * c1b) AS lift_milli
  FROM j
  UNION ALL
  SELECT pb, pa, c, c1b,
         (1000 * c) // c1b,
         (1000 * c * nb) // (c1a * c1b)
  FROM j
)
SELECT CAST(antecedent AS BIGINT) AS antecedent,
       CAST(consequent AS BIGINT) AS consequent,
       CAST(n_pairs AS BIGINT) AS n_pairs,
       CAST(n_ante AS BIGINT) AS n_ante,
       CAST(conf_milli AS BIGINT) AS conf_milli,
       CAST(lift_milli AS BIGINT) AS lift_milli
FROM rules
ORDER BY lift_milli DESC, conf_milli DESC, antecedent, consequent
LIMIT {_RULE_TOPK}
"""


# -------------------------------------------------- Benford digit audit
def q_events_benford(sf_dir: str) -> rd.Dataset:
    """First-significant-digit distribution of value cents per
    event_type — the classic fraud/data-entry QA screen (Benford's law:
    organic amounts lean toward low leading digits; fabricated ones
    don't).  Output is the exact digit histogram plus the observed
    per-mille share; the judgment against log10(1+1/d) stays a human
    call (no float ships).

    Shape at scale: per-batch (type, digit) partial counts — the digit
    comes from a vectorized integer divide-down loop (<= 7 halvings at
    cents magnitudes; no string formatting, no log10 float edge cases)
    — then ONE bucketed sum per type; shares compute inside the type's
    bucket where all 9 digits co-locate."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = np.abs(_cents(df.value))
        ty = df.event_type.to_numpy()
        keep = v > 0
        v, ty = v[keep], ty[keep]
        while (v >= 10).any():
            big = v >= 10
            v[big] //= 10
        out = (pd.DataFrame({"event_type": ty, "digit": v})
               .groupby(["event_type", "digit"], as_index=False).size()
               .rename(columns={"size": "cnt"}))
        return out.astype({"digit": np.int64, "cnt": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "digit"], as_index=False).cnt.sum()
        tot = g.groupby("event_type").cnt.transform("sum")
        g["obs_milli"] = (1000 * g.cnt) // tot
        return g.astype({"digit": np.int64, "cnt": np.int64,
                         "obs_milli": np.int64})

    partials = ds.map_batches(partial, batch_format="pandas")
    return bucketed_group_apply(partials, ["event_type"], final,
                                num_buckets=8).sort(["event_type",
                                                     "digit"])


# --------------------------------------------------------- t-closeness
# Completes the privacy triad (k_anonymity: group size; l_diversity:
# distinct sensitive values; t_closeness: a large DIVERSE group still
# leaks if its sensitive DISTRIBUTION is skewed vs the table's).
_T_MILLI = 200


def q_t_closeness(sf_dir: str) -> rd.Dataset:
    """t-closeness audit over the (segment, nation) quasi-identifier
    with the ordered $1000-balance bucket as the sensitive attribute:
    per group, the Earth-Mover's Distance between the group's and the
    global sensitive distribution,

        EMD = (1/(b-1)) * sum_i |cumP_i - cumQ_i|

    evaluated EXACTLY as floor(1000 * sum_i |cg_i*n - ca_i*gn| /
    ((b-1)*gn*n)) — cross-multiplied integer cumulative counts, no
    float ratio ever forms.

    Shape at scale: per-batch (qi, sens) count partials (bounded by
    |QI| x |sens| per batch, never row count); the global distribution
    is the tiny sens-marginal of those partials (<= |sens| driver rows,
    shipped back as a closure constant); ONE QI-bucketed merge computes
    every group's EMD vectorized over the fixed sens domain."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "customer", ["c_mktsegment", "c_nationkey",
                                  "c_acctbal"])

    def part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.assign(sens=_cents(df.c_acctbal) // 100_000)
        out = g.groupby(["c_mktsegment", "c_nationkey", "sens"],
                        as_index=False).agg(cnt=("c_acctbal", "size"))
        return out.astype({"sens": np.int64, "cnt": np.int64})

    partials = ds.map_batches(part, batch_format="pandas").materialize()

    # global sensitive marginal: <= |sens buckets| x n_blocks tiny rows
    gl = (partials.to_pandas().groupby("sens").cnt.sum().sort_index())
    domain = gl.index.to_numpy()
    gcounts = gl.to_numpy()
    n = int(gcounts.sum())
    b = len(domain)
    gcum = gcounts.cumsum()

    def emd(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        cells = df.groupby(["c_mktsegment", "c_nationkey", "sens"],
                           as_index=False).cnt.sum()
        for (seg, nat), sub in cells.groupby(
                ["c_mktsegment", "c_nationkey"], sort=True):
            cnt = np.zeros(b, dtype=np.int64)
            idx = np.searchsorted(domain, sub.sens.to_numpy())
            cnt[idx] = sub.cnt.to_numpy()
            gn = int(cnt.sum())
            cg = cnt.cumsum()
            num = int(np.abs(cg.astype(object) * n
                             - gcum.astype(object) * gn).sum())
            emd_milli = 0 if b <= 1 else \
                (1000 * num) // ((b - 1) * gn * n)
            rows.append((seg, int(nat), gn, emd_milli,
                         int(emd_milli <= _T_MILLI)))
        return pd.DataFrame(rows, columns=[
            "segment", "nationkey", "n_rows", "emd_milli", "meets_t"]
            ).astype({"nationkey": np.int64, "n_rows": np.int64,
                      "emd_milli": np.int64, "meets_t": np.int64})

    return bucketed_group_apply(partials,
                                ["c_mktsegment", "c_nationkey"], emd,
                                num_buckets=8).sort(["segment",
                                                     "nationkey"])


SQL_T_CLOSENESS = f"""
WITH s AS (
  SELECT c_mktsegment AS segment, CAST(c_nationkey AS BIGINT) AS nationkey,
         CAST(floor(CAST(round(c_acctbal*100) AS BIGINT) / 100000)
              AS BIGINT) AS sens
  FROM customer
), dom AS (SELECT DISTINCT sens FROM s),
tot AS (SELECT COUNT(*) AS n, COUNT(DISTINCT sens) AS b FROM s),
gl AS (SELECT sens, COUNT(*) AS gc FROM s GROUP BY 1),
gcum AS (SELECT sens, SUM(gc) OVER (ORDER BY sens) AS ca FROM gl),
grp AS (SELECT segment, nationkey, COUNT(*) AS gn FROM s GROUP BY 1, 2),
cell AS (SELECT segment, nationkey, sens, COUNT(*) AS c
         FROM s GROUP BY 1, 2, 3),
grid AS (
  SELECT g.segment, g.nationkey, d.sens, g.gn, COALESCE(c.c, 0) AS c
  FROM grp g CROSS JOIN dom d
  LEFT JOIN cell c ON c.segment = g.segment
                  AND c.nationkey = g.nationkey AND c.sens = d.sens
), cum AS (
  SELECT segment, nationkey, gn, sens,
         SUM(c) OVER (PARTITION BY segment, nationkey ORDER BY sens)
           AS cg
  FROM grid
)
SELECT cum.segment, cum.nationkey,
       CAST(MAX(cum.gn) AS BIGINT) AS n_rows,
       CAST(CASE WHEN MAX(t.b) <= 1 THEN 0 ELSE
         (1000 * SUM(abs(cum.cg * t.n - gcum.ca * cum.gn)))
         // ((MAX(t.b) - 1) * MAX(cum.gn) * MAX(t.n)) END
         AS BIGINT) AS emd_milli,
       CAST(CASE WHEN MAX(t.b) <= 1 THEN 1 ELSE
         CASE WHEN (1000 * SUM(abs(cum.cg * t.n - gcum.ca * cum.gn)))
              // ((MAX(t.b) - 1) * MAX(cum.gn) * MAX(t.n))
              <= {_T_MILLI} THEN 1 ELSE 0 END END AS BIGINT) AS meets_t
FROM cum JOIN gcum ON gcum.sens = cum.sens CROSS JOIN tot t
GROUP BY 1, 2 ORDER BY segment, nationkey
"""


# ------------------------------------------------------ RFM segmentation
def q_user_rfm(sf_dir: str) -> rd.Dataset:
    """Recency / frequency / monetary quintile segmentation — the classic
    customer-scoring warehouse job, built on an EXACT distributed global
    rank per metric (no global sort): the sorted_neighborhood range-
    histogram trick, generalized to three metrics in ONE stacked
    exchange.

    Quintile = ((rank - 1) * 5) // n + 1 over the total order
    (metric value ASC, user_id ASC) — the even-spread bucket formula
    (NOT SQL NTILE, whose remainder all lands in the first buckets);
    the oracle uses the identical formula.

    Shape at scale: (1) per-batch user partials -> ONE user-bucketed
    merge = the user metric table (materialized; read three ways);
    (2) per-batch (metric, range-bucket) histogram partials -> driver
    prefix offsets (<= 3 x 64 rows — the only driver state); (3) the
    stacked (metric, v, uid) rows shuffle ONCE by (metric, range
    bucket), rank locally against the broadcast offsets, and (4) one
    uid-bucketed pivot assembles the 3 quintiles per user.  The range
    bucket is a monotone shift ``v >> s`` with s from the metric's max
    bit length, so bucket order == value order and local rank + offset
    is the exact global rank."""
    from .grouping import bucketed_group_apply

    ds = _pq(sf_dir, "events", ["user_id", "ts", "value"])

    def upart(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_s=_epoch_s(df.ts), _v=_cents(df.value))
        out = df.groupby("user_id", as_index=False).agg(
            last_s=("_s", "max"), freq=("_s", "size"), mon=("_v", "sum"))
        return out.astype({"user_id": np.int64, "last_s": np.int64,
                           "freq": np.int64, "mon": np.int64})

    def umerge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("user_id", as_index=False).agg(
            last_s=("last_s", "max"), freq=("freq", "sum"),
            mon=("mon", "sum"))
        return out.astype({"user_id": np.int64, "last_s": np.int64,
                           "freq": np.int64, "mon": np.int64})

    users = bucketed_group_apply(
        ds.map_batches(upart, batch_format="pandas"), ["user_id"],
        umerge, num_buckets=16).materialize()

    # driver scalars: global last-event second + per-metric extremes
    # (one bounded partial row per block)
    def extremes(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "mt": [df.last_s.max()], "min_last": [df.last_s.min()],
            "max_f": [df.freq.max()], "min_m": [df.mon.min()],
            "max_m": [df.mon.max()], "cnt": [len(df)]})

    ex = users.map_batches(extremes, batch_format="pandas").to_pandas()
    mt = int(ex.mt.max())
    n_users = int(ex.cnt.sum())
    spans = {0: mt - int(ex.min_last.min()),
             1: int(ex.max_f.max()),
             2: max(abs(int(ex.min_m.min())), abs(int(ex.max_m.max())))}
    shifts = {m: max(0, int(spans[m]).bit_length() - 6)
              for m in spans}

    def stack(df: pd.DataFrame) -> pd.DataFrame:
        uid = df.user_id.to_numpy()
        frames = []
        for m, v in ((0, mt - df.last_s.to_numpy()),
                     (1, df.freq.to_numpy()),
                     (2, df.mon.to_numpy())):
            frames.append(pd.DataFrame({
                "metric": np.full(len(uid), m, dtype=np.int64),
                "rb": (v >> shifts[m]).astype(np.int64),
                "v": v.astype(np.int64), "uid": uid}))
        return pd.concat(frames, ignore_index=True)

    stacked = users.map_batches(stack, batch_format="pandas")

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["metric", "rb"], as_index=False).size()
               .rename(columns={"size": "c"}))
        return out.astype({"metric": np.int64, "rb": np.int64,
                           "c": np.int64})

    h = (stacked.map_batches(hist, batch_format="pandas").to_pandas()
         .groupby(["metric", "rb"], as_index=False).c.sum()
         .sort_values(["metric", "rb"]))
    offsets: dict[tuple[int, int], int] = {}
    for m, sub in h.groupby("metric"):
        off = np.concatenate(([0], sub.c.to_numpy().cumsum()[:-1]))
        for rb, o in zip(sub.rb, off):
            offsets[(int(m), int(rb))] = int(o)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for (m, rb), sub in df.groupby(["metric", "rb"], sort=True):
            sub = sub.sort_values(["v", "uid"])
            rnk = offsets[(int(m), int(rb))] + np.arange(
                1, len(sub) + 1, dtype=np.int64)
            q = ((rnk - 1) * 5) // n_users + 1
            rows.append(pd.DataFrame({
                "uid": sub.uid.to_numpy(), "metric": int(m),
                "v": sub.v.to_numpy(), "q": q}))
        out = (pd.concat(rows, ignore_index=True) if rows
               else pd.DataFrame({"uid": pd.Series(dtype=np.int64),
                                  "metric": pd.Series(dtype=np.int64),
                                  "v": pd.Series(dtype=np.int64),
                                  "q": pd.Series(dtype=np.int64)}))
        return out.astype({"uid": np.int64, "metric": np.int64,
                           "v": np.int64, "q": np.int64})

    ranked = bucketed_group_apply(stacked, ["metric", "rb"], rank,
                                  num_buckets=16)

    def pivot(df: pd.DataFrame) -> pd.DataFrame:
        p = df.pivot_table(index="uid", columns="metric",
                           values=["v", "q"], aggfunc="first")
        out = pd.DataFrame({
            "user_id": p.index.to_numpy(),
            "rec_s": p[("v", 0)].to_numpy(),
            "freq": p[("v", 1)].to_numpy(),
            "mon_cents": p[("v", 2)].to_numpy(),
            "r_q": p[("q", 0)].to_numpy(),
            "f_q": p[("q", 1)].to_numpy(),
            "m_q": p[("q", 2)].to_numpy()})
        out["rfm_code"] = 100 * out.r_q + 10 * out.f_q + out.m_q
        return out.astype({c: np.int64 for c in out.columns})

    return bucketed_group_apply(ranked, ["uid"], pivot,
                                num_buckets=16).sort("user_id")


SQL_USER_RFM = """
WITH u AS (
  SELECT user_id,
         CAST(floor(epoch(MAX(ts))) AS BIGINT) AS last_s,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT)
           AS mon_cents
  FROM events GROUP BY 1
), m AS (SELECT MAX(last_s) AS mt FROM u),
r AS (
  SELECT user_id, (SELECT mt FROM m) - last_s AS rec_s, freq, mon_cents,
         COUNT(*) OVER () AS n,
         ROW_NUMBER() OVER (ORDER BY (SELECT mt FROM m) - last_s,
                            user_id) AS rr,
         ROW_NUMBER() OVER (ORDER BY freq, user_id) AS fr,
         ROW_NUMBER() OVER (ORDER BY mon_cents, user_id) AS mr
  FROM u
)
SELECT user_id, rec_s, freq, mon_cents,
       CAST((rr-1)*5//n + 1 AS BIGINT) AS r_q,
       CAST((fr-1)*5//n + 1 AS BIGINT) AS f_q,
       CAST((mr-1)*5//n + 1 AS BIGINT) AS m_q,
       CAST(100*((rr-1)*5//n + 1) + 10*((fr-1)*5//n + 1)
            + ((mr-1)*5//n + 1) AS BIGINT) AS rfm_code
FROM r ORDER BY user_id
"""


SQL_EVENTS_BENFORD = """
WITH v AS (
  SELECT event_type, abs(CAST(round(value * 100) AS BIGINT)) AS a
  FROM events
  WHERE abs(CAST(round(value * 100) AS BIGINT)) > 0
), d AS (
  SELECT event_type,
         CAST(substr(CAST(a AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM v
), c AS (
  SELECT event_type, digit, COUNT(*) AS cnt FROM d GROUP BY 1, 2
)
SELECT event_type, digit, CAST(cnt AS BIGINT) AS cnt,
       CAST((1000 * cnt) // SUM(cnt) OVER (PARTITION BY event_type)
            AS BIGINT) AS obs_milli
FROM c ORDER BY event_type, digit
"""


MINING_QUERIES = {
    "events_pit_join": (q_events_pit_join, SQL_EVENTS_PIT_JOIN),
    "assoc_rules": (q_assoc_rules, SQL_ASSOC_RULES),
    "events_benford": (q_events_benford, SQL_EVENTS_BENFORD),
    "t_closeness": (q_t_closeness, SQL_T_CLOSENESS),
    "user_rfm": (q_user_rfm, SQL_USER_RFM),
    "value_outliers": (q_value_outliers, SQL_VALUE_OUTLIERS),
    "l_diversity": (q_l_diversity, SQL_L_DIVERSITY),
    "count_min": (q_count_min, SQL_COUNT_MIN),
}
