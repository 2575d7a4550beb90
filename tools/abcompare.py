"""Interleaved A/B benchmark of two repo checkouts in ONE host window.

This box's host both steals CPU in bursts and swings per-core speed
between windows (BASELINE.md load-regime notes), so cross-round bench
deltas from different windows are noise-dominated — the round-3 verdict
found a uniform ~1.3-2.4x "slowdown" across untouched code paths that
was pure host weather.  The fix is to interleave the two binaries
A,B,A,B,... in the same window and compare min-of-reps per query, with
each line's steal%% and single-thread canary recorded.

Usage:
  python tools/abcompare.py --a /root/repo --b /tmp/ab_r3 \
      [--reps 2] [--cpus 32] [--sf /root/testdata/sf0.1] [--headline-only]

Each rep runs `python bench.py` in A's dir then B's dir as fresh
subprocesses (fresh Ray sessions).  Output: one JSON document with the
raw lines plus a per-query min-of-reps comparison table.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys


def run_one(repo: str, cpus: int, sf: str, headline_only: bool) -> dict:
    env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf)
    if headline_only:
        env["GRAFT_HEADLINE_ONLY"] = "1"
    out = subprocess.run([sys.executable, os.path.join(repo, "bench.py")],
                         env=env, capture_output=True, text=True, check=True,
                         cwd=repo).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--a", required=True, help="checkout A (e.g. HEAD)")
    ap.add_argument("--b", required=True, help="checkout B (e.g. round-3)")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--headline-only", action="store_true")
    ap.add_argument("--out", default="/tmp/abcompare.json")
    args = ap.parse_args()

    runs_a, runs_b = [], []
    for i in range(args.reps):
        print(f"[abcompare] rep {i + 1}/{args.reps}: A...",
              file=sys.stderr, flush=True)
        runs_a.append(run_one(args.a, args.cpus, args.sf, args.headline_only))
        print(f"[abcompare] rep {i + 1}/{args.reps}: B...",
              file=sys.stderr, flush=True)
        runs_b.append(run_one(args.b, args.cpus, args.sf, args.headline_only))

    def best(runs, key):
        vals = [r[key] for r in runs if key in r]
        return min(vals) if vals else None

    table = {"headline_sec": {
        "a": best(runs_a, "value"), "b": best(runs_b, "value")}}
    qnames = set()
    for r in runs_a + runs_b:
        qnames.update(r.get("queries", {}))
    for q in sorted(qnames):
        a = min((r["queries"][q] for r in runs_a if q in r.get("queries", {})),
                default=None)
        b = min((r["queries"][q] for r in runs_b if q in r.get("queries", {})),
                default=None)
        row = {"a": a, "b": b}
        if a and b:
            row["a_over_b"] = round(a / b, 3)
        table[q] = row

    doc = {
        "cpus": args.cpus, "sf": args.sf, "reps": args.reps,
        "a_dir": args.a, "b_dir": args.b,
        "comparison_min_of_reps": table,
        "context": [{"side": s, "steal_pct": r.get("steal_pct"),
                     "canary": r.get("cpu_canary_sec"),
                     "load_start": r.get("load_start")}
                    for s, runs in (("a", runs_a), ("b", runs_b))
                    for r in runs],
        "runs_a": runs_a, "runs_b": runs_b,
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"headline": table["headline_sec"],
                      "out": args.out}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
