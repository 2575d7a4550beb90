"""Per-partition checkpoint manifest: lineage + metrics + resumability.

The reference has NO checkpointing (its usage guide claims "saves progress
every 50 documents" but no implementing code exists — SURVEY.md §4.1); the
north rule requires it, so this is engine-defined:

- every reassembly partition writes its output shard ATOMICALLY
  (``part-NNNNN.parquet.tmp`` → rename) and then an atomic per-partition
  manifest record ``part-NNNNN.json`` with doc-id range, row counts,
  per-stage wall-times and input lineage;
- a restart loads the completed-partition set and anti-filters those
  partitions out *before* the shuffle, so finished work is never redone
  and output shards are never duplicated;
- one JSON file per partition (not a shared append file) so concurrent
  tasks on many nodes never contend or corrupt — rename is atomic on every
  POSIX filesystem and on object stores it maps to a conditional put.
"""

from __future__ import annotations

import json
import os


def record_path(manifest_dir: str, partition_id: int) -> str:
    return os.path.join(manifest_dir, f"part-{partition_id:05d}.json")


def shard_path(output_dir: str, partition_id: int) -> str:
    return os.path.join(output_dir, f"part-{partition_id:05d}.parquet")


def write_record(manifest_dir: str, rec: dict) -> None:
    os.makedirs(manifest_dir, exist_ok=True)
    path = record_path(manifest_dir, rec["partition_id"])
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(rec, f)
    os.replace(tmp, path)


def load_records(manifest_dir: str) -> list[dict]:
    if not manifest_dir or not os.path.isdir(manifest_dir):
        return []
    out = []
    for name in sorted(os.listdir(manifest_dir)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(manifest_dir, name), encoding="utf-8") as f:
                out.append(json.load(f))
    return out


def completed_partitions(manifest_dir: str) -> set[int]:
    return {r["partition_id"] for r in load_records(manifest_dir)
            if r.get("status") == "done"}
