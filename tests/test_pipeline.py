"""Distributed-pipeline invariants vs the single-process oracle.

The span invariant from BASELINE.json: for every document, the pipeline's
normalized span sequence equals the oracle's under
``(kind, text, media_ref, order)``; plus full field equality at float
precision (both share the scalar code path — the comparison verifies the
explode/shuffle/salting/reassembly plumbing)."""

import os

import numpy as np
import pytest

import ray.data as rd

from _intelligent_document_ai_for_field_extraction_from_invoices_ray.oracle import run_oracle
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.extract import (
    ExtractConfig,
    build_extraction,
    load_results,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.sources.corpus import (
    corpus_tables,
)
from _intelligent_document_ai_for_field_extraction_from_invoices_ray.state import manifest as mf

# the exploded span-row plan (SURVEY §3.4): exercised explicitly here so
# BOTH exchanges stay covered now that compact is the config default
CFG = ExtractConfig(num_partitions=8, salt_buckets=16, classify_concurrency=2,
                    compact_shuffle=False)


def _no_tensor_casting():
    from ray.data import DataContext

    DataContext.get_current().enable_tensor_extension_casting = False


def _span_key(spans):
    return [(s["kind"], s["text"], s["media_ref"]) for s in spans]


def assert_matches_oracle(pdf, odf):
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions.docproc import (
        TIMING_COLS,
    )

    assert len(pdf) == len(odf)
    pdf = pdf.sort_values("doc_id").reset_index(drop=True)
    odf = odf.sort_values("doc_id").reset_index(drop=True)
    for col in odf.columns:
        if col in TIMING_COLS:
            continue                       # wall-clock, non-deterministic
        if col == "norm_spans":
            for a, b, d in zip(pdf[col], odf[col], odf["doc_id"]):
                assert _span_key(a) == _span_key(b), f"span mismatch in {d}"
        elif odf[col].dtype == object:
            assert (pdf[col].astype(str) == odf[col].astype(str)).all(), col
        elif np.issubdtype(odf[col].dtype, np.number):
            assert ((pdf[col].fillna(-1) - odf[col].fillna(-1)).abs() < 1e-12).all(), col
        else:
            assert (pdf[col] == odf[col]).all(), col


@pytest.mark.usefixtures("ray_session")
def test_pipeline_matches_oracle_span_invariant(tmp_path):
    _no_tensor_casting()
    docs, gt = corpus_tables(200)
    res = build_extraction(rd.from_arrow(docs), CFG,
                           output_dir=str(tmp_path / "out"),
                           manifest_dir=str(tmp_path / "mf"))
    pdf = res.to_pandas()
    odf = run_oracle(docs).to_pandas()
    assert_matches_oracle(pdf[odf.columns], odf)
    # resumable layout: one shard + one manifest record per partition
    assert len(os.listdir(tmp_path / "out")) == CFG.num_partitions
    recs = mf.load_records(str(tmp_path / "mf"))
    assert len(recs) == CFG.num_partitions
    assert all(r["status"] == "done" and "extract" in r["stage_ms"] for r in recs)
    assert sum(r["rows"] for r in recs) == 200


@pytest.mark.usefixtures("ray_session")
def test_pipeline_no_salt_shuffle_same_result(tmp_path):
    _no_tensor_casting()
    docs, _ = corpus_tables(120)
    cfg = ExtractConfig(num_partitions=4, salt_buckets=8,
                        classify_concurrency=2, salt_shuffle=False)
    pdf = build_extraction(rd.from_arrow(docs), cfg).to_pandas()
    odf = run_oracle(docs).to_pandas()
    assert_matches_oracle(pdf[odf.columns], odf)


@pytest.mark.usefixtures("ray_session")
def test_shuffled_input_rows_reassemble(tmp_path):
    """Chunked docs arrive as multiple rows in arbitrary order; forgetting
    the in-group offset sort would silently break the invariant
    (SURVEY.md §7.4 'In-group ordering')."""
    _no_tensor_casting()
    docs, _ = corpus_tables(56)        # every 7th doc (index%7==3) is chunked
    import pyarrow as pa

    perm = np.random.RandomState(7).permutation(docs.num_rows)
    shuffled = docs.take(pa.array(perm))
    pdf = build_extraction(rd.from_arrow(shuffled), CFG).to_pandas()
    odf = run_oracle(docs).to_pandas()
    assert_matches_oracle(pdf[odf.columns], odf)


@pytest.mark.usefixtures("ray_session")
def test_resume_from_partial_manifest(tmp_path):
    """Crash-rerun: delete a subset of shards+records, rerun with resume,
    assert completed partitions are skipped and the final output has no
    duplicate or missing documents."""
    _no_tensor_casting()
    out, man = str(tmp_path / "out"), str(tmp_path / "mf")
    docs, _ = corpus_tables(160)
    build_extraction(rd.from_arrow(docs), CFG, output_dir=out,
                     manifest_dir=man).materialize()

    # simulate a crash that lost partitions 1, 4, 6
    lost = {1, 4, 6}
    for p in lost:
        os.remove(mf.shard_path(out, p))
        os.remove(mf.record_path(man, p))
    kept_mtimes = {p: os.path.getmtime(mf.shard_path(out, p))
                   for p in range(CFG.num_partitions) if p not in lost}

    rerun = build_extraction(rd.from_arrow(docs), CFG, output_dir=out,
                             manifest_dir=man, resume=True)
    rerun_rows = rerun.count()
    # only the lost partitions were recomputed
    lost_docs = sum(r["rows"] for r in mf.load_records(man)
                    if r["partition_id"] in lost)
    assert rerun_rows == lost_docs
    for p, mtime in kept_mtimes.items():
        assert os.path.getmtime(mf.shard_path(out, p)) == mtime, \
            f"completed shard {p} was rewritten"

    final = load_results(out).to_pandas()
    assert len(final) == 160
    assert final.doc_id.is_unique
    assert_matches_oracle(final[run_oracle(docs).to_pandas().columns].copy(),
                          run_oracle(docs).to_pandas())


@pytest.mark.usefixtures("ray_session")
def test_media_heavy_skew_doc(tmp_path):
    """Doc index 613 carries 60 media spans + 240 line items (SKEW_FACTOR);
    the salted pipeline completes and matches the oracle."""
    _no_tensor_casting()
    docs, _ = corpus_tables(616)
    skew_rows = [r for r in docs.to_pylist() if r["doc_id"] == "invoice_00000613"]
    assert sum(len(r["spans"]) for r in skew_rows) > 250
    pdf = build_extraction(rd.from_arrow(docs), CFG).to_pandas()
    odf = run_oracle(docs).to_pandas()
    assert_matches_oracle(pdf[odf.columns], odf)
    row = pdf[pdf.doc_id == "invoice_00000613"].iloc[0]
    assert row.status == "success"
    assert len(row.norm_spans) > 250


@pytest.mark.usefixtures("ray_session")
def test_bench_light_config_same_fields(tmp_path):
    """The benchmark configuration (post-shuffle normalization, no span
    payload returned) must produce identical extraction fields — only the
    norm_spans column is withheld from the return path."""
    _no_tensor_casting()
    docs, _ = corpus_tables(120)
    cfg = ExtractConfig(num_partitions=4, salt_buckets=8, classify_concurrency=2,
                        normalize_stage=False, emit_norm_spans=False)
    pdf = build_extraction(rd.from_arrow(docs), cfg).to_pandas()
    assert "norm_spans" not in pdf.columns
    odf = run_oracle(docs).to_pandas().drop(columns=["norm_spans"])
    assert_matches_oracle(pdf[odf.columns], odf)


@pytest.mark.usefixtures("ray_session")
def test_compact_shuffle_matches_oracle(tmp_path):
    """The compact (nested-row) exchange must be semantically identical to
    the exploded span-row pipeline and the oracle — full columns incl.
    the norm_spans invariant."""
    _no_tensor_casting()
    docs, _ = corpus_tables(200)
    cfg = ExtractConfig(num_partitions=8, salt_buckets=16, classify_concurrency=2,
                        compact_shuffle=True)
    pdf = build_extraction(rd.from_arrow(docs), cfg,
                           output_dir=str(tmp_path / "out"),
                           manifest_dir=str(tmp_path / "mf")).to_pandas()
    odf = run_oracle(docs).to_pandas()
    assert_matches_oracle(pdf[odf.columns], odf)
    assert len(mf.load_records(str(tmp_path / "mf"))) == 8


@pytest.mark.usefixtures("ray_session")
def test_packed_exchange_matches_oracle(tmp_path):
    """The packed (IPC+zlib blob) exchange is a pure transport change:
    full column equality vs the oracle, shards + manifest intact.  A
    small pack_batch forces several blobs per partition so the
    decompress-concat path in make_assemble_packed_fn is really
    exercised (one blob per part would hide a concat bug)."""
    _no_tensor_casting()
    docs, _ = corpus_tables(200)
    cfg = ExtractConfig(num_partitions=8, salt_buckets=16, classify_concurrency=2,
                        compact_shuffle=True, packed_exchange=True,
                        pack_batch=32)
    pdf = build_extraction(rd.from_arrow(docs), cfg,
                           output_dir=str(tmp_path / "out"),
                           manifest_dir=str(tmp_path / "mf")).to_pandas()
    odf = run_oracle(docs).to_pandas()
    assert_matches_oracle(pdf[odf.columns], odf)
    assert len(mf.load_records(str(tmp_path / "mf"))) == 8


@pytest.mark.usefixtures("ray_session")
def test_oversized_actor_pool_clamped():
    """A fixed classify pool sized >= the session's CPUs must not
    deadlock the streaming executor (observed live: 2-cpu session +
    2-actor pool → ReadParquet starved of its 1 CPU forever).
    _pool_size clamps to CPUs-1; this session has 4 CPUs, so a
    requested 16-actor pool must still complete end-to-end."""
    import ray as _ray

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines.extract import (
        _pool_size,
    )

    cpus = int(_ray.cluster_resources()["CPU"])
    assert _pool_size(cpus * 4) == cpus - 1
    assert _pool_size(1) == 1

    _no_tensor_casting()
    docs, _ = corpus_tables(60)
    cfg = ExtractConfig(num_partitions=4, classify_concurrency=cpus * 4)
    out = build_extraction(rd.from_arrow(docs), cfg).to_pandas()
    assert len(out) == 60


@pytest.mark.usefixtures("ray_session")
def test_custom_detection_thresholds(tmp_path):
    """set_confidence_thresholds analog (detector.py:725-729): raising the
    signature threshold suppresses low-confidence detections, identically
    in pipeline and oracle."""
    _no_tensor_casting()
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.functions.detect import (
        MediaModel,
    )

    thresholds = {"signature": 0.9, "stamp": 0.9}
    docs, _ = corpus_tables(80)
    cfg = ExtractConfig(num_partitions=4, salt_buckets=8, classify_concurrency=2,
                        media_conf_thresholds=thresholds)
    pdf = build_extraction(rd.from_arrow(docs), cfg).to_pandas()
    odf = run_oracle(docs, media_model=MediaModel(thresholds)).to_pandas()
    assert_matches_oracle(pdf[odf.columns], odf)
    # stricter thresholds must reduce detections vs defaults
    base = run_oracle(docs).to_pandas()
    assert pdf.signature_present.sum() < base.signature_present.sum()


@pytest.mark.usefixtures("ray_session")
def test_master_data_fuzzy_path(tmp_path):
    """T4/J2: dealer master list broadcast to the extract stage activates
    the fuzzy-match strategy; pipeline and oracle share it."""
    _no_tensor_casting()
    docs, _ = corpus_tables(60)
    master = ["Singh Motors Limited", "Balaji Agencies Limited",
              "Kumar Tractors And Services"]
    cfg = ExtractConfig(num_partitions=4, salt_buckets=8, classify_concurrency=2)
    pdf = build_extraction(rd.from_arrow(docs), cfg,
                           dealer_master=master).to_pandas()
    odf = run_oracle(docs, dealer_master=master).to_pandas()
    assert_matches_oracle(pdf[odf.columns], odf)
    # at least one doc resolved through the master list
    base = run_oracle(docs).to_pandas()
    assert (pdf.dealer_name != base.dealer_name).any()


@pytest.mark.usefixtures("ray_session")
def test_empty_input_table(tmp_path):
    """A zero-row input table flows through the whole plan without error."""
    import pyarrow as pa

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.schema import (
        DOC_SCHEMA,
    )

    _no_tensor_casting()
    empty = pa.Table.from_pylist([], schema=DOC_SCHEMA)
    out = build_extraction(rd.from_arrow(empty), CFG)
    assert out.count() == 0


@pytest.mark.usefixtures("ray_session")
def test_compact_resume(tmp_path):
    """Crash-rerun under the compact exchange: same resume contract."""
    _no_tensor_casting()
    out, man = str(tmp_path / "out"), str(tmp_path / "mf")
    docs, _ = corpus_tables(120)
    cfg = ExtractConfig(num_partitions=6, classify_concurrency=2,
                        compact_shuffle=True)
    build_extraction(rd.from_arrow(docs), cfg, output_dir=out,
                     manifest_dir=man).materialize()
    os.remove(mf.shard_path(out, 2))
    os.remove(mf.record_path(man, 2))
    rerun = build_extraction(rd.from_arrow(docs), cfg, output_dir=out,
                             manifest_dir=man, resume=True)
    n_rerun = rerun.count()          # lazy: execute before reading manifest
    lost_docs = [r["rows"] for r in mf.load_records(man) if r["partition_id"] == 2]
    assert n_rerun == lost_docs[0]
    final = load_results(out).to_pandas()
    assert len(final) == 120 and final.doc_id.is_unique


@pytest.mark.usefixtures("ray_session")
def test_adversarial_span_content(tmp_path):
    """Nasty inputs the synthetic corpus never produces: control chars,
    newlines (dealer pattern 7 is newline-sensitive), RTL text, emoji,
    digit walls, whitespace-only, very long tokens. Pipeline must equal
    the oracle on all of them."""
    import pyarrow as pa

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.schema import (
        DOC_SCHEMA,
    )

    _no_tensor_casting()
    nasty = [
        "Dealer:\nM/s Newline Motors Pvt Ltd", "\t\t\t", "\x00\x01ctrl",
        "مرحبا موتورز", "🚜🚜 SWARAJ 744 FE 🚜", "9" * 500,
        "a" * 2000, "M/s " + "Very Long Name " * 40 + "Ltd",
        "Price: ₹-5,00,000", "HP: inf", "nan HP", "1e9 HP", "0x50 HP",
        "विक्रेता: टेस्ट\nट्रैक्टर्स", "Pow\u00aDer: 50 HP",   # soft hyphen
        "Total: ₹１２３４５６",                                  # fullwidth digits
        "  Model:   575    DI  ", "MODEL:575DI", ",,,,;;;;::::",
        "Grand Total: 7.45 Lakh Crore", "-42 HP", "50.0.0 HP",
    ]
    rows = []
    for i in range(40):
        spans = []
        for off in range(6):
            t = nasty[(i * 6 + off) % len(nasty)]
            spans.append({"kind": "text", "text": t, "media_ref": "", "offset": off})
        spans.append({"kind": "media", "text": "", "media_ref": f"m://adv{i}/0",
                      "offset": 6})
        rows.append({"doc_id": f"adv_{i:04d}", "spans": spans})
    docs = pa.Table.from_pylist(rows, schema=DOC_SCHEMA)
    pdf = build_extraction(rd.from_arrow(docs), CFG).to_pandas()
    odf = run_oracle(docs).to_pandas()
    assert_matches_oracle(pdf[odf.columns], odf)


def test_read_parquet_sized_block_policy(ray_session, tmp_path):
    """Small single-file reads must coalesce to ceil(rows/rows_per_block)
    blocks (Ray's ~2x-CPU default made a 200 KiB table 64 near-empty
    blocks and every all-to-all paid the task matrix); directories fall
    back to the default planner."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.sources.io import (
        read_parquet_sized,
    )

    f = tmp_path / "t.parquet"
    pq.write_table(pa.table({"x": list(range(2500))}), f)
    ds = read_parquet_sized(str(f), rows_per_block=1000)
    assert ds.materialize().num_blocks() == 3          # ceil(2500/1000)
    assert ds.count() == 2500
    # a directory path (multi-file input) keeps Ray's default plan
    d = tmp_path / "dir"
    d.mkdir()
    pq.write_table(pa.table({"x": [1, 2]}), d / "a.parquet")
    assert read_parquet_sized(str(d)).count() == 2
