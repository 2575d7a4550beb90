"""Order-statistics over cumulative series — maximum drawdown, the
canonical sequential-looking metric that actually distributes as a
semilattice (same family as late_events' prefix-max and running_spend's
prefix-sum).

``value_drawdown``: per event_type, treat the per-distinct-timestamp
net value (exact cents) as a time series; report the cumulative sum's
max drawdown ``max_{i<=j} (prefix_i - prefix_j)`` plus its prefix
extremes.  Pre-aggregating to DISTINCT timestamps makes the series
order total (ties within a timestamp collapse), so engine and oracle
walk the identical sequence.

Scale shape: ONE (type, hour-tick)-bucketed shuffle carries per-chunk
SUFFICIENT STATS only — (n, sum, max_prefix, min_prefix, drawdown) per
chunk — then a per-type combine over chunk stats in tick order, fully
vectorized (offset cumsum + running max), never touching raw events
again.  The combine law for adjacent chunks A then B:

    sum  = sA + sB
    maxp = max(mA, sA + mB)          minp = min(nA, sA + nB)
    dd   = max(dA, dB, mA - sA - nB)

is associative, so any chunking of the timeline gives the same answer.
Chunk stats are O(types x hours) rows — bounded by the time range,
independent of event count and block count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_HOUR_NS = 3600 * 1_000_000_000
_NEG_SENTINEL = -(2 ** 62)    # "no earlier peak"; far below any cents sum


def _events(sf_dir: str) -> rd.Dataset:
    from ..sources.io import read_parquet_sized
    return read_parquet_sized(f"{sf_dir}/events.parquet",
                              columns=["event_type", "ts", "value"])


def q_value_drawdown(sf_dir: str) -> rd.Dataset:
    from .grouping import bucketed_group_apply

    def prep(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ns = df.ts.astype("datetime64[ns]").astype("int64")
        return pd.DataFrame({
            "event_type": df.event_type,
            "tick": (ns // _HOUR_NS).astype(np.int64),
            "ns": ns.astype(np.int64),
            "v": np.round(df.value.to_numpy() * 100).astype(np.int64),
        })

    def chunk_stats(df: pd.DataFrame) -> pd.DataFrame:
        """Per (type, tick): collapse to distinct-ts net values, then one
        vectorized prefix pass -> sufficient stats."""
        g = (df.groupby(["event_type", "tick", "ns"], as_index=False)
             .v.sum().sort_values(["event_type", "tick", "ns"]))
        rows = []
        for (ty, tk), sub in g.groupby(["event_type", "tick"], sort=True):
            pref = sub.v.to_numpy().cumsum()
            runmax = np.maximum.accumulate(pref)
            rows.append((ty, tk, len(pref), int(pref[-1]),
                         int(pref.max()), int(pref.min()),
                         int((runmax - pref).max())))
        return pd.DataFrame(rows, columns=[
            "event_type", "tick", "n_points", "csum", "maxp", "minp",
            "dd"]).astype({"tick": np.int64, "n_points": np.int64,
                           "csum": np.int64, "maxp": np.int64,
                           "minp": np.int64, "dd": np.int64})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        """Per type: fold chunk stats in tick order — vectorized via the
        offset cumsum (chunk-start prefix totals) and a shifted running
        max of chunk peaks (peak strictly in an EARLIER chunk)."""
        out = []
        for ty, sub in df.groupby("event_type", sort=True):
            sub = sub.sort_values("tick")
            s = sub.csum.to_numpy()
            offset = np.concatenate(([0], s.cumsum()[:-1]))
            gmaxp = offset + sub.maxp.to_numpy()
            gminp = offset + sub.minp.to_numpy()
            prev_peak = np.concatenate(
                ([_NEG_SENTINEL], np.maximum.accumulate(gmaxp)[:-1]))
            dd = max(int(sub.dd.max()), int((prev_peak - gminp).max()), 0)
            out.append((ty, int(sub.n_points.sum()), int(s.sum()),
                        int(gmaxp.max()), int(gminp.min()), dd))
        return pd.DataFrame(out, columns=[
            "event_type", "n_points", "total_cents", "max_prefix_cents",
            "min_prefix_cents", "max_drawdown_cents"]).astype({
                "n_points": np.int64, "total_cents": np.int64,
                "max_prefix_cents": np.int64, "min_prefix_cents": np.int64,
                "max_drawdown_cents": np.int64})

    prepped = _events(sf_dir).map_batches(prep, batch_format="pyarrow")
    partial = bucketed_group_apply(prepped, ["event_type", "tick"],
                                   chunk_stats, num_buckets=32)
    return bucketed_group_apply(partial, ["event_type"], combine,
                                num_buckets=8).sort("event_type")


SQL_VALUE_DRAWDOWN = """
WITH s AS (
  SELECT event_type, ts,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), p AS (
  SELECT event_type, ts, v,
         SUM(v) OVER (PARTITION BY event_type ORDER BY ts) AS pref
  FROM s
), r AS (
  SELECT event_type, v, pref,
         MAX(pref) OVER (PARTITION BY event_type ORDER BY ts
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS runmax
  FROM p
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(v) AS BIGINT) AS total_cents,
       CAST(MAX(pref) AS BIGINT) AS max_prefix_cents,
       CAST(MIN(pref) AS BIGINT) AS min_prefix_cents,
       CAST(MAX(runmax - pref) AS BIGINT) AS max_drawdown_cents
FROM r GROUP BY 1 ORDER BY 1
"""


# ------------------------------------------------ lag-1 autocorrelation
def q_events_autocorr(sf_dir: str) -> rd.Dataset:
    """Per event_type exact lag-1 sample autocorrelation of the
    per-distinct-ts net-cents series:

        r1 = sum_{t<m} (x_t - mean)(x_{t+1} - mean) / sum (x_t - mean)^2

    reported as floor(1000 * r1).  Cross-multiplying by m^2 makes both
    numerator and denominator integral:

        m^2 num = m^2 Sxy - m S (2S - x_first - x_last) + (m-1) S^2
        m^2 den = m^2 Q   - m S^2

    Chunk partials are (m, S, Q, within-chunk Sxy, first, last); the
    per-type combine adds the BOUNDARY products last_i * first_{i+1} in
    tick order — the only coupling between chunks — then evaluates the
    m^2-scaled formula in Python bigints (n * Sxy exceeds int64 past
    m ~ 2e6, same discipline as type_trend).  One bucketed shuffle of
    bounded chunk stats; raw events are read once."""
    from .grouping import bucketed_group_apply

    def prep(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ns = df.ts.astype("datetime64[ns]").astype("int64")
        return pd.DataFrame({
            "event_type": df.event_type,
            "tick": (ns // _HOUR_NS).astype(np.int64),
            "ns": ns.astype(np.int64),
            "v": np.round(df.value.to_numpy() * 100).astype(np.int64),
        })

    def chunk_stats(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["event_type", "tick", "ns"], as_index=False)
             .v.sum().sort_values(["event_type", "tick", "ns"]))
        rows = []
        for (ty, tk), sub in g.groupby(["event_type", "tick"], sort=True):
            x = sub.v.to_numpy()
            rows.append((ty, tk, len(x), int(x.sum()),
                         int((x.astype(object) * x).sum()),
                         int((x[:-1].astype(object) * x[1:]).sum()),
                         int(x[0]), int(x[-1])))
        return pd.DataFrame(rows, columns=[
            "event_type", "tick", "m", "s", "q", "sxy", "first",
            "last"]).astype({"tick": np.int64, "m": np.int64,
                             "s": np.int64, "q": np.int64,
                             "sxy": np.int64, "first": np.int64,
                             "last": np.int64})

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for ty, sub in df.groupby("event_type", sort=True):
            sub = sub.sort_values("tick")
            m = int(sub.m.sum())
            s = int(sub.s.astype(object).sum())       # bigint-safe
            q = int(sub.q.astype(object).sum())
            sxy = int(sub.sxy.astype(object).sum())
            lasts = sub["last"].to_numpy()[:-1].astype(object)
            firsts = sub["first"].to_numpy()[1:].astype(object)
            sxy += int((lasts * firsts).sum()) if len(lasts) else 0
            x1 = int(sub["first"].iloc[0])
            xm = int(sub["last"].iloc[-1])
            num = m * m * sxy - m * s * (2 * s - x1 - xm) + (m - 1) * s * s
            den = m * m * q - m * s * s
            r1 = 0 if den == 0 else (1000 * num) // den
            out.append((ty, m, r1))
        return pd.DataFrame(out, columns=[
            "event_type", "n_points", "r1_milli"]).astype(
                {"n_points": np.int64, "r1_milli": np.int64})

    prepped = _events(sf_dir).map_batches(prep, batch_format="pyarrow")
    partial = bucketed_group_apply(prepped, ["event_type", "tick"],
                                   chunk_stats, num_buckets=32)
    return bucketed_group_apply(partial, ["event_type"], combine,
                                num_buckets=8).sort("event_type")


SQL_EVENTS_AUTOCORR = """
WITH s AS (
  SELECT event_type, ts,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), o AS (
  SELECT event_type, v, ts,
         LEAD(v) OVER (PARTITION BY event_type ORDER BY ts) AS nxt
  FROM s
), a AS (
  SELECT event_type,
         CAST(COUNT(*) AS HUGEINT) AS m,
         CAST(SUM(v) AS HUGEINT) AS sv,
         CAST(SUM(v * v) AS HUGEINT) AS q,
         CAST(COALESCE(SUM(CASE WHEN nxt IS NOT NULL
                                THEN v * nxt END), 0) AS HUGEINT) AS sxy,
         CAST(min_by(v, ts) AS HUGEINT) AS x1,
         CAST(max_by(v, ts) AS HUGEINT) AS xm
  FROM o GROUP BY 1
)
SELECT event_type, CAST(m AS BIGINT) AS n_points,
       CAST(CASE WHEN m * m * q - m * sv * sv = 0 THEN 0 ELSE
         (1000 * (m*m*sxy - m*sv*(2*sv - x1 - xm) + (m-1)*sv*sv)
          - ((((1000 * (m*m*sxy - m*sv*(2*sv - x1 - xm) + (m-1)*sv*sv))
               % (m*m*q - m*sv*sv)) + (m*m*q - m*sv*sv))
             % (m*m*q - m*sv*sv)))
         // (m*m*q - m*sv*sv) END AS BIGINT) AS r1_milli
FROM a ORDER BY event_type
"""


# --------------------------------------------------- changepoint (CUSUM)
def q_events_changepoint(sf_dir: str) -> rd.Dataset:
    """Per event_type changepoint estimate — the AMOC (at-most-one-
    change) screen: the timestamp maximizing the cross-multiplied
    deviation of the cumulative sum from uniform accumulation,

        dev_j = | m * prefix_j  -  j * total |

    (first timestamp on ties).  Exact integers throughout — no float
    ratio j/m ever forms.

    Two bounded passes (the winsor-mean pattern): pass 1 collects per
    (type, hour-tick) chunk (count, sum) partials — O(types x hours)
    rows — whose tick-ordered cumsums give every chunk its global index
    and prefix offsets plus the global (m, total); the tiny offset table
    ships back via ray.put.  Pass 2 recomputes each chunk's local
    prefixes and maximizes |m*(offS + p_k) - (offN + k)*T| vectorized;
    one per-type max/min-ts combine finishes.  Raw events shuffle only
    within their (type, tick) bucket; nothing corpus-sized is held."""
    import ray

    from .grouping import bucketed_group_apply

    def prep(batch: pa.Table) -> pd.DataFrame:
        df = batch.to_pandas()
        ns = df.ts.astype("datetime64[ns]").astype("int64")
        return pd.DataFrame({
            "event_type": df.event_type,
            "tick": (ns // _HOUR_NS).astype(np.int64),
            "ns": ns.astype(np.int64),
            "v": np.round(df.value.to_numpy() * 100).astype(np.int64),
        })

    prepped = _events(sf_dir).map_batches(
        prep, batch_format="pyarrow").materialize()   # consumed twice

    def pass1(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "tick", "ns"], as_index=False).v.sum()
        out = g.groupby(["event_type", "tick"], as_index=False).agg(
            cnt=("ns", "size"), s=("v", "sum"))
        return out.astype({"tick": np.int64, "cnt": np.int64,
                           "s": np.int64})

    marks = bucketed_group_apply(prepped, ["event_type", "tick"], pass1,
                                 num_buckets=32).to_pandas()
    marks = marks.sort_values(["event_type", "tick"])
    offs: dict[tuple[str, int], tuple[int, int, int, int]] = {}
    for ty, sub in marks.groupby("event_type", sort=True):
        cn = sub.cnt.to_numpy()
        sm = sub.s.to_numpy()
        off_n = np.concatenate(([0], cn.cumsum()[:-1]))
        off_s = np.concatenate(([0], sm.cumsum()[:-1]))
        m, tot = int(cn.sum()), int(sm.sum())
        for tk, on, os_ in zip(sub.tick, off_n, off_s):
            offs[(ty, int(tk))] = (int(on), int(os_), m, tot)
    offs_ref = ray.put(offs)

    def pass2(df: pd.DataFrame) -> pd.DataFrame:
        table = ray.get(offs_ref)
        g = (df.groupby(["event_type", "tick", "ns"], as_index=False)
             .v.sum().sort_values(["event_type", "tick", "ns"]))
        rows = []
        for (ty, tk), sub in g.groupby(["event_type", "tick"], sort=True):
            off_n, off_s, m, tot = table[(ty, int(tk))]
            pref = off_s + sub.v.to_numpy().cumsum()
            j = off_n + np.arange(1, len(sub) + 1, dtype=np.int64)
            dev = np.abs(m * pref - j * tot)
            best = int(dev.argmax())     # first max within the chunk
            rows.append((ty, m, tot, int(dev[best]),
                         int(sub.ns.to_numpy()[best]) // 1_000_000_000))
        return pd.DataFrame(rows, columns=[
            "event_type", "n_points", "total_cents", "dev", "cp_s"]
            ).astype({"n_points": np.int64, "total_cents": np.int64,
                      "dev": np.int64, "cp_s": np.int64})

    partial = bucketed_group_apply(prepped, ["event_type", "tick"], pass2,
                                   num_buckets=32)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["event_type", "dev", "cp_s"],
                            ascending=[True, False, True])
        out = df.groupby("event_type", as_index=False).head(1)
        out = out.rename(columns={"dev": "max_absdev_scaled",
                                  "cp_s": "cp_epoch_s"})
        return out[["event_type", "n_points", "total_cents",
                    "max_absdev_scaled", "cp_epoch_s"]]

    return bucketed_group_apply(partial, ["event_type"], final,
                                num_buckets=8).sort("event_type")


SQL_EVENTS_CHANGEPOINT = """
WITH s AS (
  SELECT event_type, ts,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
  FROM events GROUP BY 1, 2
), p AS (
  SELECT event_type, ts,
         SUM(v) OVER (PARTITION BY event_type ORDER BY ts) AS pref,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts) AS j,
         COUNT(*) OVER (PARTITION BY event_type) AS m,
         SUM(v) OVER (PARTITION BY event_type) AS tot
  FROM s
)
SELECT event_type,
       CAST(m AS BIGINT) AS n_points,
       CAST(tot AS BIGINT) AS total_cents,
       CAST(abs(m * pref - j * tot) AS BIGINT) AS max_absdev_scaled,
       CAST(floor(epoch(ts)) AS BIGINT) AS cp_epoch_s
FROM p
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type
                           ORDER BY abs(m * pref - j * tot) DESC, ts) = 1
ORDER BY event_type
"""


SERIES_QUERIES = {
    "value_drawdown": (q_value_drawdown, SQL_VALUE_DRAWDOWN),
    "events_autocorr": (q_events_autocorr, SQL_EVENTS_AUTOCORR),
    "events_changepoint": (q_events_changepoint, SQL_EVENTS_CHANGEPOINT),
}
