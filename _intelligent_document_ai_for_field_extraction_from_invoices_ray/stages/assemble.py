"""Reassembly stage: the one semantic shuffle of the pipeline.

``groupby('_part')`` (``_part = crc32(doc_id) % P``) co-locates every span
of a document — documents may arrive chunked across input rows — then the
per-partition group function:

  1. groups spans by ``doc_id`` and sorts each doc by ``offset``
     (Ray Data groups are unordered — SURVEY.md §7.4);
  2. runs the shared ``process_document`` semantics per doc (extraction,
     detection argmax/NMS, validation);
  3. writes its output shard atomically and a manifest record with
     lineage + per-stage timings (resumable layout);
  4. returns the result rows downstream as a streaming block.

Keying the shuffle on the doc-hash partition rather than raw ``doc_id``
gives deterministic, resume-stable output shards with ONE shuffle, and a
group size bounded by P (choose P so a partition's spans fit a worker's
heap; docs are ≤ ~10^3..10^4 spans so any P ≥ corpus/2k docs works).
Broadcast side state (ground truth, master data) travels by ``ray.put``
ref, fetched zero-copy once per worker process.
"""

from __future__ import annotations

import time
from collections import defaultdict

import pyarrow as pa

import ray

from ..functions import docproc
from ..functions.detect import MediaModel
from ..functions.validate import RuleBook
from ..schema import RESULT_SCHEMA
from ..state import manifest as mf

_REF_CACHE: dict[str, object] = {}


def _fetch(ref):
    """Per-process cache of broadcast objects (plasma get is zero-copy,
    but skip even that on repeat calls)."""
    if ref is None:
        return None
    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    if key not in _REF_CACHE:
        _REF_CACHE[key] = ray.get(ref)
    return _REF_CACHE[key]


def make_assemble_nested_fn(output_dir: str | None = None,
                            manifest_dir: str | None = None,
                            gt_ref=None, dealer_master_ref=None,
                            model_master_ref=None,
                            rulebook: RuleBook | None = None,
                            input_lineage: list[str] | None = None,
                            emit_norm_spans: bool = True,
                            use_gpu: bool = False):
    """Assemble for the COMPACT shuffle: groups of nested doc rows
    (doc_id, spans, det_* list columns) instead of exploded span rows.
    Identical semantics — the same ``process_document`` consumes the
    zipped span dicts — with ~4.5x fewer rows through the exchange."""

    def assemble(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        part_id = int(group.column("_part")[0].as_py())
        gt_map = _fetch(gt_ref) or {}
        dealer_master = _fetch(dealer_master_ref)
        model_master = _fetch(model_master_ref)

        # columnar decode: field-wise to_pylist of the flattened span
        # structs + zip, instead of row-wise Table.to_pylist (~1.6x less
        # decode time — the group stage was ~30% of assemble)
        import pyarrow.compute as pc

        by_doc: dict[str, list[dict]] = defaultdict(list)
        has_det = "det_class" in group.column_names
        doc_ids = group.column("doc_id").to_pylist()
        spans_col = group.column("spans")
        if isinstance(spans_col, pa.ChunkedArray):
            spans_col = spans_col.combine_chunks()
        # the offset walk below assumes every row has a (possibly empty)
        # spans LIST — a null list would make lens[r] None and corrupt
        # `pos`; explode always emits a list, make that contract explicit
        assert spans_col.null_count == 0, "null spans list reached assemble"
        flat = spans_col.flatten()
        span_names = [f.name for f in spans_col.type.value_type]
        fcols = [flat.field(nm).to_pylist() for nm in span_names]
        lens = pc.list_value_length(spans_col).to_pylist()
        if has_det:
            dcs = group.column("det_class").to_pylist()
            dfs = group.column("det_conf").to_pylist()
            dbs = group.column("det_bbox").to_pylist()
        # the classifier stage dropped `kind` from the exchanged struct
        # (derivable: media <=> non-empty media_ref) and aligned det_*
        # lists to the MEDIA ordinal — reconstruct both here
        slim = "kind" not in span_names
        pos = 0
        for r, d in enumerate(doc_ids):
            spans = [dict(zip(span_names, (c[k] for c in fcols)))
                     for k in range(pos, pos + lens[r])]
            pos += lens[r]
            if slim:
                for s in spans:
                    s["kind"] = "media" if s["media_ref"] else "text"
            if has_det:
                dc, df_, db = dcs[r], dfs[r], dbs[r]
                mi = 0
                for i, s in enumerate(spans):
                    if s["kind"] == "media":
                        j = mi if slim else i
                        s["det_class"] = dc[j]
                        s["det_conf"] = df_[j]
                        s["det_bbox"] = db[j]
                        mi += 1
            by_doc[d].extend(spans)
        t_group = time.perf_counter()

        media_model = MediaModel()
        memo: dict = {}
        results = []
        for doc_id in sorted(by_doc):
            results.append(docproc.process_document(
                doc_id, by_doc[doc_id], ground_truth=gt_map.get(doc_id),
                dealer_master=dealer_master, model_master=model_master,
                rulebook=rulebook, media_model=media_model, norm_memo=memo,
                use_gpu=use_gpu))
        t_extract = time.perf_counter()
        return _finalize(results, by_doc, part_id, output_dir, manifest_dir,
                         input_lineage, emit_norm_spans, t0, t_group, t_extract)

    return assemble


def _finalize(results, by_doc, part_id, output_dir, manifest_dir,
              input_lineage, emit_norm_spans, t0, t_group, t_extract) -> pa.Table:
    if emit_norm_spans:
        out = pa.Table.from_pylist(results, schema=RESULT_SCHEMA)
    else:
        light = RESULT_SCHEMA.remove(RESULT_SCHEMA.get_field_index("norm_spans"))
        for r in results:
            r.pop("norm_spans", None)
        out = pa.Table.from_pylist(results, schema=light)

    if output_dir:
        import os

        import pyarrow.parquet as pq

        os.makedirs(output_dir, exist_ok=True)
        path = mf.shard_path(output_dir, part_id)
        tmp = path + f".tmp-{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, path)
    t_write = time.perf_counter()

    if manifest_dir:
        doc_ids = sorted(by_doc)
        mf.write_record(manifest_dir, {
            "partition_id": part_id,
            "doc_id_min": doc_ids[0] if doc_ids else None,
            "doc_id_max": doc_ids[-1] if doc_ids else None,
            "n_docs": len(doc_ids),
            "rows": out.num_rows,
            "n_spans": sum(len(v) for v in by_doc.values()),
            "stage_ms": {
                "group": (t_group - t0) * 1000,
                "extract": (t_extract - t_group) * 1000,
                "write": (t_write - t_extract) * 1000,
            },
            "input_frags": input_lineage or [],
            "status": "done",
        })
    return out


def make_assemble_packed_fn(**kwargs):
    """Assemble for the PACKED exchange: each group row is an
    IPC+zlib-compressed blob of nested doc rows for this partition
    (see ``extract._pack_by_part``).  Decompress + concat, then delegate
    to the nested assemble — semantics are byte-identical, only the
    transport of the one all-to-all changes (measured 3.8-4.7x fewer
    exchange bytes on the synthetic corpus, window-size dependent)."""
    inner = make_assemble_nested_fn(**kwargs)

    def assemble(group: pa.Table) -> pa.Table:
        import io
        import zlib

        import pyarrow.ipc as ipc

        part_id = group.column("_part")[0].as_py()
        tables = []
        for b in group.column("blob"):      # ChunkedArray yields scalars
            with ipc.open_stream(io.BytesIO(
                    zlib.decompress(b.as_py()))) as r:
                tables.append(r.read_all())
        full = pa.concat_tables(tables)
        import pyarrow.compute as pc
        want = pc.sum(group.column("n_docs")).as_py() or 0
        if full.num_rows != want:
            # explicit raise, not assert: `python -O` compiles asserts
            # out, and this is the ONLY guard against a truncated or
            # duplicated blob decode silently corrupting the partition
            raise RuntimeError(
                f"packed exchange integrity: {full.num_rows} rows != {want}")
        full = full.append_column(
            "_part", pa.array([part_id] * full.num_rows, type=pa.int32()))
        return inner(full)

    return assemble


def make_assemble_fn(output_dir: str | None = None,
                     manifest_dir: str | None = None,
                     gt_ref=None, dealer_master_ref=None, model_master_ref=None,
                     rulebook: RuleBook | None = None,
                     input_lineage: list[str] | None = None,
                     emit_norm_spans: bool = True,
                     use_gpu: bool = False):
    def assemble(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        part_id = int(group.column("_part")[0].as_py())
        gt_map = _fetch(gt_ref) or {}
        dealer_master = _fetch(dealer_master_ref)
        model_master = _fetch(model_master_ref)

        # columnar decode (field-wise to_pylist + zip; skips the constant
        # _part column entirely) — faster than row-wise Table.to_pylist
        names = [n for n in group.column_names if n != "_part"]
        cols = [group.column(nm).to_pylist() for nm in names]
        doc_col = cols[names.index("doc_id")]
        by_doc: dict[str, list[dict]] = defaultdict(list)
        for i, d in enumerate(doc_col):
            by_doc[d].append(dict(zip(names, (c[i] for c in cols))))
        t_group = time.perf_counter()

        media_model = MediaModel()
        memo: dict = {}
        results = []
        for doc_id in sorted(by_doc):
            results.append(docproc.process_document(
                doc_id, by_doc[doc_id], ground_truth=gt_map.get(doc_id),
                dealer_master=dealer_master, model_master=model_master,
                rulebook=rulebook, media_model=media_model, norm_memo=memo,
                use_gpu=use_gpu))
        t_extract = time.perf_counter()
        # norm_spans is always COMPUTED (it is the normalization work
        # itself); emit=False only stops shipping it back through the
        # object store when the caller consumes scalar fields / shards
        return _finalize(results, by_doc, part_id, output_dir, manifest_dir,
                         input_lineage, emit_norm_spans, t0, t_group, t_extract)

    return assemble
