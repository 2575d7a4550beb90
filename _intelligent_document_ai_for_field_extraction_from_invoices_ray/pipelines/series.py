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


SERIES_QUERIES = {
    "value_drawdown": (q_value_drawdown, SQL_VALUE_DRAWDOWN),
}
