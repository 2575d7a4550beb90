"""Flagship pipeline: interleaved docs → extracted fields, Ray-Data-first.

Physical plan (SURVEY.md §3.4):

    read (Lance/Parquet)                          [streaming blocks]
    → map_batches(explode)                        [zero-copy Arrow fan-out]
    → (resume filter: completed partitions dropped before any heavy work)
    → map_batches(normalize_spans)                [stateless regex stage]
    → repartition(keys=['_salt'])                 [salted skew spreading]
    → map_batches(MediaClassifier, concurrency=N) [stateful actor pool]
    → groupby('_part').map_groups(assemble)       [THE shuffle: reassembly,
                                                   extraction, shard + manifest]
    → Dataset[RESULT_SCHEMA]                      [stream to sink/aggregate]

Everything stays lazy; nothing materializes the full corpus.  The corpus
generator is itself a Ray pipeline (``ray.data.range → map_batches``) so
arbitrarily large synthetic corpora are produced distributively.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import pyarrow as pa

import ray
import ray.data as rd
from ray.data import DataContext

from ..functions.validate import RuleBook
from ..schema import DOC_SCHEMA, GROUND_TRUTH_SCHEMA
from ..sources import corpus as corpus_mod
from ..sources import io as io_mod
from ..stages.assemble import make_assemble_fn
from ..stages.classify import MediaClassifier
from ..stages.normalize import normalize_spans
from ..stages.recover import make_explode
from ..state import manifest as mf


@dataclass
class ExtractConfig:
    """Knobs sized for a multi-node cluster; tests shrink them."""
    num_partitions: int = 64          # output shards; P so a partition fits a worker heap
    salt_buckets: int = 256           # _salt cardinality (doc-hash ^ offset-window)
    salt_shuffle: bool = True         # hash-repartition by _salt before classify
    explode_batch: int = 1024         # doc rows per explode call
    normalize_batch: int = 8192       # span rows per normalize call
    classify_batch: int = 4096
    classify_concurrency: int = 4     # fixed actor-pool size
    classify_num_gpus: float = 0.0    # >0 on GPU clusters (detector.py GPU path)
    # Scale tradeoff: with the pre-shuffle normalize stage ON, normalized
    # text ships through the reassembly shuffle (≈40% more bytes moved);
    # with it OFF the same shared function runs post-shuffle inside the
    # per-doc stage with a per-partition memo (more memo hits, same
    # output bit-for-bit).  Shuffle bytes beat recompute at scale, so
    # benchmarks turn it off; default keeps the SURVEY §3.4 plan.
    normalize_stage: bool = True
    # Return the norm_spans invariant column to the consumer.  At scale
    # the result payload ≈ the corpus; when results are sunk to shards
    # (or only scalar fields are consumed) there is no reason to also
    # stream the spans back through the object store.
    emit_norm_spans: bool = True
    # Compact exchange (DEFAULT): ship NESTED doc rows (doc_id, spans,
    # det-lists) through the reassembly shuffle instead of exploded span
    # rows — ~4.5x fewer rows, no per-span doc_id/_part duplication, same
    # semantics (the same process_document consumes the zipped spans) and
    # measured scaling efficiency ≥0.8 at both 4v16 and 8v32 cpus where
    # the exploded exchange sits at ~0.75 on a shared object store.
    # Set False for the exploded span-row plan (SURVEY §3.4 shape) when
    # upstream stages need span-level rows (e.g. the pre-shuffle
    # normalize stage or custom per-span operators).
    compact_shuffle: bool = True
    # Packed exchange (compact plan only): before the reassembly shuffle,
    # each map task groups its rows by _part and ships ONE
    # IPC+zlib(level 1) blob row per partition instead of N nested doc
    # rows — invoice-like text compresses 3.8-4.7x at realistic
    # (pack_batch / num_partitions)-doc windows, so the one all-to-all
    # moves ~4x fewer bytes at the cost of compress/decompress cpu and
    # one extra map pass.  Default OFF: measured on the single-box bench
    # (960k docs) it LOSES ~20% at both 16 and 32 cpus (packed 12.2k/18.2k
    # vs unpacked 15.2k/22.5k docs/s) because plasma transfers on one box
    # are memcpy-fast — compression cannot pay for its cpu when the
    # "exchange" never crosses a wire.  On a real multi-node cluster the
    # exchange crosses the network (the resource Spark-style engines
    # compress shuffles for by default); enable it there.  Semantics are
    # byte-identical either way (test_packed_exchange_matches_oracle).
    packed_exchange: bool = False
    pack_batch: int = 16384           # docs per pack call; window = this / num_partitions
    # per-class detection thresholds (set_confidence_thresholds analog,
    # detector.py:725-729); None = reference defaults {sig .4, stamp .5}
    media_conf_thresholds: dict | None = None


def build_extraction(docs: rd.Dataset,
                     cfg: ExtractConfig | None = None,
                     ground_truth: dict | None = None,
                     dealer_master: list[str] | None = None,
                     model_master: set[str] | None = None,
                     rulebook: RuleBook | None = None,
                     output_dir: str | None = None,
                     manifest_dir: str | None = None,
                     resume: bool = True,
                     input_lineage: list[str] | None = None) -> rd.Dataset:
    cfg = cfg or ExtractConfig()

    if cfg.compact_shuffle:
        return _build_compact(docs, cfg, ground_truth, dealer_master,
                              model_master, rulebook, output_dir, manifest_dir,
                              resume, input_lineage)

    spans = docs.map_batches(make_explode(cfg.num_partitions, cfg.salt_buckets),
                             batch_format="pyarrow", batch_size=cfg.explode_batch)

    if resume and manifest_dir:
        done = mf.completed_partitions(manifest_dir)
        if done:
            done_arr = pa.array(sorted(done), type=pa.int32())

            def drop_done(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                mask = pc.invert(pc.is_in(batch.column("_part"), value_set=done_arr))
                return batch.filter(mask)

            spans = spans.map_batches(drop_done, batch_format="pyarrow")

    if cfg.normalize_stage:
        spans = spans.map_batches(normalize_spans, batch_format="pyarrow",
                                  batch_size=cfg.normalize_batch)

    if cfg.salt_shuffle:
        # explicit skew handling: spans of one media-heavy document carry
        # many distinct _salt values (doc-hash ^ offset-window), so they
        # spread across blocks instead of hot-spotting one classify actor
        # (north-rule requirement).  Under Ray's HASH_SHUFFLE strategy this
        # is a true hash-repartition on the salt key; under the default
        # sort-based strategy (this sandbox: keyed repartition unsupported,
        # and HASH_SHUFFLE deadlocks in local mode) an equivalent full
        # redistribution achieves the same spreading.
        from ray.data.context import ShuffleStrategy

        if DataContext.get_current().shuffle_strategy == ShuffleStrategy.HASH_SHUFFLE:
            spans = spans.repartition(num_blocks=cfg.salt_buckets,
                                      keys=["_salt"], sort=False)
        else:
            spans = spans.repartition(num_blocks=cfg.salt_buckets, shuffle=True)

    # the salt has done its job (or was never used) — 4 B/span that
    # needn't ride the reassembly exchange
    spans = spans.drop_columns(["_salt"])

    spans = _classify_stage(spans, MediaClassifier,
                            cfg.classify_concurrency, cfg.classify_batch,
                            cfg.classify_num_gpus or None,
                            {"conf_thresholds": cfg.media_conf_thresholds})

    gt_ref = ray.put(ground_truth) if ground_truth else None
    dealer_ref = ray.put(dealer_master) if dealer_master else None
    model_ref = ray.put(model_master) if model_master else None

    assemble = make_assemble_fn(output_dir=output_dir, manifest_dir=manifest_dir,
                                gt_ref=gt_ref, dealer_master_ref=dealer_ref,
                                model_master_ref=model_ref, rulebook=rulebook,
                                input_lineage=input_lineage,
                                emit_norm_spans=cfg.emit_norm_spans,
                                use_gpu=cfg.classify_num_gpus > 0)
    return spans.groupby("_part").map_groups(assemble, batch_format="pyarrow")


def _pool_size(requested: int) -> int:
    """Clamp a FIXED actor-pool size to cluster CPUs - 1, or return 0
    when NO fixed pool can coexist with its producer.  A fixed pool
    reserves its CPUs for the stage's whole lifetime; sized >= the
    cluster it starves the upstream read of its 1 CPU and the streaming
    executor deadlocks (observed: 2-cpu session + 2-actor classify pool
    → ReadParquet backpressured forever, zero tasks running).  One spare
    CPU keeps the producer side live; on a 1-cpu session even a 1-actor
    pool deadlocks the same way, so 0 tells the caller to run the
    classifier as per-task functions instead (per-batch construction —
    slower, but a degenerate session stays functional).  At real sizes
    (pool ≤ cpus/4) the clamp never binds."""
    try:
        avail = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        avail = 0
    if avail <= 0:
        return requested
    if avail < 2:
        return 0
    return max(1, min(requested, avail - 1))


def _classify_stage(ds: rd.Dataset, cls, requested: int, batch_size: int,
                    num_gpus, ctor_kwargs: dict) -> rd.Dataset:
    """Attach the media-classify stage as a fixed actor pool, or — when
    _pool_size says no pool fits (1-cpu session) — as stateless tasks
    constructing the classifier per batch."""
    pool = _pool_size(requested)
    if pool == 0:
        def per_task(batch: pa.Table) -> pa.Table:
            return cls(**ctor_kwargs)(batch)

        # keep the GPU resource request in task mode: a GPU-configured
        # classifier must not silently run with no GPU reservation just
        # because the session is too small for an actor pool
        kw = {"num_gpus": num_gpus} if num_gpus else {}
        return ds.map_batches(per_task, batch_format="pyarrow",
                              batch_size=batch_size, **kw)
    return ds.map_batches(cls, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=pool,
                          num_gpus=num_gpus,
                          fn_constructor_kwargs=ctor_kwargs)


def _build_compact(docs, cfg, ground_truth, dealer_master, model_master,
                   rulebook, output_dir, manifest_dir, resume,
                   input_lineage) -> rd.Dataset:
    """Compact-exchange plan: nested doc rows through ONE shuffle."""
    from zlib import crc32

    import numpy as np

    from ..stages.assemble import make_assemble_nested_fn, make_assemble_packed_fn
    from ..stages.classify import MediaClassifierNested

    P = cfg.num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        memo: dict[str, int] = {}
        part = np.empty(len(ids), dtype=np.int32)
        for i, d in enumerate(ids):
            v = memo.get(d)
            if v is None:
                v = crc32(d.encode("utf-8")) % P
                memo[d] = v
            part[i] = v
        return batch.append_column("_part", pa.array(part))

    rows = docs.map_batches(add_part, batch_format="pyarrow",
                            batch_size=cfg.explode_batch)

    if resume and manifest_dir:
        done = mf.completed_partitions(manifest_dir)
        if done:
            done_arr = pa.array(sorted(done), type=pa.int32())

            def drop_done(batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc
                return batch.filter(pc.invert(
                    pc.is_in(batch.column("_part"), value_set=done_arr)))

            rows = rows.map_batches(drop_done, batch_format="pyarrow")

    rows = _classify_stage(rows, MediaClassifierNested,
                           cfg.classify_concurrency,
                           max(256, cfg.classify_batch // 8),
                           cfg.classify_num_gpus or None,
                           {"conf_thresholds": cfg.media_conf_thresholds})

    gt_ref = ray.put(ground_truth) if ground_truth else None
    dealer_ref = ray.put(dealer_master) if dealer_master else None
    model_ref = ray.put(model_master) if model_master else None
    mk = make_assemble_packed_fn if cfg.packed_exchange else make_assemble_nested_fn
    assemble = mk(output_dir=output_dir,
                  manifest_dir=manifest_dir,
                  gt_ref=gt_ref, dealer_master_ref=dealer_ref,
                  model_master_ref=model_ref,
                  rulebook=rulebook,
                  input_lineage=input_lineage,
                  emit_norm_spans=cfg.emit_norm_spans,
                  use_gpu=cfg.classify_num_gpus > 0)
    if cfg.packed_exchange:
        rows = rows.map_batches(_pack_by_part, batch_format="pyarrow",
                                batch_size=cfg.pack_batch)
    return rows.groupby("_part").map_groups(assemble, batch_format="pyarrow")


def _pack_by_part(batch: pa.Table) -> pa.Table:
    """Pack a pre-shuffle batch into one IPC+zlib blob per partition
    present — the exchange then moves compressed bytes, not Arrow rows.
    zlib level 1 over the raw IPC stream beats Arrow's built-in ipc-zstd
    at these window sizes (3.8x vs 3.0x at 26 docs/blob) and is stdlib.
    Blob window = batch_rows / partitions-touched; callers size
    ``pack_batch`` so windows land ≥~25 docs where the ratio flattens."""
    import io
    import zlib

    import numpy as np
    import pyarrow.ipc as ipc

    schema = pa.schema([("_part", pa.int32()), ("n_docs", pa.int64()),
                        ("blob", pa.large_binary())])
    if batch.num_rows == 0:
        return schema.empty_table()
    parts = batch.column("_part").to_numpy(zero_copy_only=False)
    order = np.argsort(parts, kind="stable")
    tbl = batch.take(pa.array(order))
    p = tbl.column("_part").to_numpy(zero_copy_only=False)
    payload = tbl.drop_columns(["_part"])
    bounds = np.flatnonzero(np.diff(p)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(p)]))
    pids, ndocs, blobs = [], [], []
    for s, e in zip(starts, ends):
        sub = payload.slice(s, e - s)
        sink = io.BytesIO()
        with ipc.new_stream(sink, sub.schema) as w:
            w.write_table(sub)
        pids.append(int(p[s]))
        ndocs.append(int(e - s))
        blobs.append(zlib.compress(sink.getvalue(), 1))
    return pa.table({"_part": pa.array(pids, type=pa.int32()),
                     "n_docs": pa.array(ndocs, type=pa.int64()),
                     "blob": pa.array(blobs, type=pa.large_binary())})


def run_extraction(input_uri: str,
                   cfg: ExtractConfig | None = None,
                   output_dir: str | None = None,
                   manifest_dir: str | None = None,
                   resume: bool = True,
                   **kwargs) -> rd.Dataset:
    docs = io_mod.read_docs_ray(input_uri)
    return build_extraction(docs, cfg=cfg, output_dir=output_dir,
                            manifest_dir=manifest_dir, resume=resume,
                            input_lineage=[input_uri], **kwargs)


def load_results(output_dir: str) -> rd.Dataset:
    """All completed shards (current + prior runs) as one Dataset."""
    return rd.read_parquet(output_dir)


# ------------------------------------------------------------------ corpus
def generate_corpus_ray(n_docs: int, out_dir: str, seed: int = 42,
                        overwrite: bool = False) -> tuple[str, str]:
    """Distributed deterministic corpus generation; cached on disk.

    Returns (docs_path, ground_truth_path).
    """
    docs_path = os.path.join(out_dir, "docs")
    gt_path = os.path.join(out_dir, "gt")
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker) and not overwrite:
        return docs_path, gt_path

    def gen_docs(batch: pa.Table) -> pa.Table:
        rows, _ = corpus_mod.generate_rows(batch.column("id").to_pylist(), seed)
        return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)

    def gen_gt(batch: pa.Table) -> pa.Table:
        _, gts = corpus_mod.generate_rows(batch.column("id").to_pylist(), seed)
        return pa.Table.from_pylist(gts, schema=GROUND_TRUTH_SCHEMA)

    # Build in a scratch dir and publish with one atomic rename: a crashed
    # generation can never leave a half-written corpus at out_dir, and a
    # re-run can never append duplicate parquet files into an existing dir
    # (write_parquet adds files; it does not truncate).
    import shutil
    tmp = f"{out_dir}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    try:
        (rd.range(n_docs)
           .map_batches(gen_docs, batch_format="pyarrow", batch_size=512)
           .write_parquet(os.path.join(tmp, "docs")))
        (rd.range(n_docs)
           .map_batches(gen_gt, batch_format="pyarrow", batch_size=512)
           .write_parquet(os.path.join(tmp, "gt")))
        with open(os.path.join(tmp, "_DONE"), "w") as f:
            f.write(str(n_docs))
        if os.path.exists(out_dir):
            # stale partial dir (no marker) or overwrite=True: clear it
            shutil.rmtree(out_dir, ignore_errors=True)
        try:
            os.rename(tmp, out_dir)
        except OSError:
            # lost a publish race; keep the winner if it is complete
            if not os.path.exists(marker):
                raise
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return docs_path, gt_path
