"""CLI entry point (SURVEY.md §3.4 lifecycle).

Local:
    python -m _intelligent_document_ai_for_field_extraction_from_invoices_ray.run \
        --input /path/docs.parquet --output /out --manifest /out/manifest

Cluster (the north-rule launch path; same module, the job driver owns the
Ray session):
    ray job submit --working-dir . -- python -m \
        _intelligent_document_ai_for_field_extraction_from_invoices_ray.run \
        --input <lance-or-parquet uri> --output <dir> --manifest <dir>

Resumable by construction: rerunning after a crash skips every partition
with a manifest record.  Prints the corpus summary JSON on completion.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--input", required=True, help="docs table uri (lance/parquet)")
    ap.add_argument("--output", required=True, help="result shard directory")
    ap.add_argument("--manifest", required=True, help="checkpoint manifest directory")
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--salt-buckets", type=int, default=256)
    ap.add_argument("--classify-concurrency", type=int, default=4)
    ap.add_argument("--classify-num-gpus", type=float, default=0.0)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--exchange", choices=["compact", "exploded"],
                    default="compact",
                    help="reassembly exchange: compact nested-row (default,"
                         " fewer shuffle bytes) or exploded span-row"
                         " (required for span-level custom stages)")
    ap.add_argument("--limit", type=int, default=None,
                    help="process only the first N input rows (O4 analog)")
    ap.add_argument("--master-data", default=None,
                    help="master data JSON {'dealers': [...], 'models': "
                         "[...]} (reference --master-data, extractor.py:132)")
    ap.add_argument("--ground-truth", default=None,
                    help="ground-truth JSON {doc_id: {...}} or parquet; "
                         "adds evaluation metrics to the summary "
                         "(reference --ground-truth)")
    ap.add_argument("--gpu", action="store_true",
                    help="GPU cost-model rate ($0.10/hr) + detector GPU "
                         "slots (reference --gpu)")
    ap.add_argument("--viz-dir", default=None,
                    help="also write annotated-page SVGs here (S8 sink)")
    ap.add_argument("--viz-limit", type=int, default=100)
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="only for standalone runs; ignored under ray job submit")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    owns_session = True
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_tensor_extension_casting = False

    from .pipelines.extract import ExtractConfig
    from .pipelines.summary import summarize_results

    cfg = ExtractConfig(num_partitions=args.num_partitions,
                        salt_buckets=args.salt_buckets,
                        classify_concurrency=args.classify_concurrency,
                        classify_num_gpus=args.classify_num_gpus
                        or (1.0 if args.gpu else 0.0),
                        compact_shuffle=args.exchange == "compact")

    dealer_master = model_master = None
    if args.master_data:
        with open(args.master_data) as f:
            md = json.load(f)
        dealer_master = md.get("dealers") or None
        model_master = set(md.get("models") or []) or None

    ground_truth = None
    if args.ground_truth:
        if args.ground_truth.endswith(".json"):
            with open(args.ground_truth) as f:
                ground_truth = json.load(f)
        else:
            import pyarrow.parquet as pq
            ground_truth = {r["doc_id"]: r for r in
                            pq.read_table(args.ground_truth).to_pylist()}

    # --limit truncates the INPUT (before any side-effectful stage) so
    # shards/manifest records are only written for the limited document set
    from .pipelines.extract import build_extraction
    from .sources import io as io_mod

    docs = io_mod.read_docs_ray(args.input)
    if args.limit:
        docs = docs.limit(args.limit)
    results = build_extraction(docs, cfg=cfg, output_dir=args.output,
                               manifest_dir=args.manifest,
                               resume=not args.no_resume,
                               ground_truth=ground_truth,
                               dealer_master=dealer_master,
                               model_master=model_master,
                               input_lineage=[args.input])
    n_new = results.count()        # drives the pipeline (shards + manifest)

    # summarize everything completed (this run + prior resumed runs)
    from .pipelines.extract import load_results

    completed = load_results(args.output)
    summary = summarize_results(completed)
    summary["new_documents_this_run"] = n_new
    if ground_truth:
        from .pipelines.evaluate import evaluate_results
        summary["evaluation"] = evaluate_results(completed, ground_truth)
    if args.viz_dir:
        from .stages.viz import write_visualizations
        summary["visualizations_written"] = write_visualizations(
            completed, args.viz_dir, limit=args.viz_limit)
    print(json.dumps(summary))
    if owns_session:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
