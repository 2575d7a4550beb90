"""ANN recall@1 artifact: structured (clustered) corpus vs random corpus.

The sf* testdata embeddings are i.i.d. random — the provable WORST case
for product quantization (no subspace structure) and a hard case for any
pruning index.  This tool measures each ANN variant in BOTH regimes so
the quality claim is a pair of numbers, not an assertion:

    python tools/ann_recall.py [out_json]

writes {"structured": {...}, "random_sf0.001": {...}} with recall@1 for
embed_ann_lsh / embed_ann_ivf / embed_ann_ivfpq against exact brute-force
cosine NN, plus the corpus parameters.  Default out: BENCH/ann_recall.json.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N, DIM, CLUSTERS, NOISE = 4000, 64, 8, 0.005
RANDOM_SF = "/root/testdata/sf0.001"


def brute_truth(sf_dir: str) -> dict[int, int]:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
        similarity as S,
    )
    ids, mat = S._to_matrix(
        pq.read_table(f"{sf_dir}/embeddings.parquet",
                      columns=["vec_id", "embedding"]))
    order = np.argsort(ids)
    ids, mat = ids[order], S._normalize(mat[order])
    sims = mat @ mat.T
    np.fill_diagonal(sims, -2.0)
    return dict(zip(ids.tolist(), ids[sims.argmax(axis=1)].tolist()))


def recalls(sf_dir: str) -> dict:
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.pipelines import (
        similarity as S,
    )
    truth = brute_truth(sf_dir)
    out = {}
    for name, fn in [("lsh", S.q_embed_ann_lsh), ("ivf", S.q_embed_ann_ivf),
                     ("ivfpq", S.q_embed_ann_ivfpq)]:
        df = fn(sf_dir).to_pandas()
        hits = int((df.nn_id.to_numpy()
                    == np.array([truth[v] for v in df.vec_id])).sum())
        out[name] = {"recall_at_1": round(hits / len(df), 4), "n": len(df)}
    return out


def main() -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_tensor_extension_casting = False
    sys.path.insert(0, "/root/repo")
    from _intelligent_document_ai_for_field_extraction_from_invoices_ray.sources.corpus import (
        structured_embeddings,
    )

    sdir = f"/tmp/dai_ann_structured_v2_{N}_{DIM}_{CLUSTERS}"
    os.makedirs(sdir, exist_ok=True)
    path = f"{sdir}/embeddings.parquet"
    if not os.path.exists(path):
        pq.write_table(
            structured_embeddings(N, DIM, CLUSTERS, noise=NOISE), path)

    result = {
        "structured": {
            "params": {"n": N, "dim": DIM, "clusters": CLUSTERS,
                       "noise": NOISE},
            **recalls(sdir),
        },
        "random_sf0.001": {
            "params": {"note": "i.i.d. random vectors — PQ worst case"},
            **recalls(RANDOM_SF),
        },
        "notes": {
            "lsh": "multi-probe LSH (adaptive plane count targeting "
                   "~1024-vector buckets; own bucket + 3 lowest-margin "
                   "bit flips per query): every vector is answered; "
                   "residual misses are NNs whose signatures differ in "
                   ">1 probed bit",
        },
    }
    out_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/ann_recall.json"
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
