"""Single-process reference-faithful oracle.

Processes an interleaved-document Arrow table exactly like the reference's
per-document loop (executable.py:490-559: load → recover spans → extract →
detect → validate → result), with zero Ray involvement.  The pytest
invariant suite compares the distributed pipeline's output against this,
row for row, under span-sequence equality ``(kind, text, media_ref, order)``
plus full field equality at round(4).

The oracle intentionally shares the scalar semantics in ``functions/`` with
the pipeline — what it does NOT share is any of the distributed machinery
(explode, shuffle, salting, groupby reassembly, actor pools), which is
precisely what the comparison verifies.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

from .functions import docproc
from .functions.detect import MediaModel
from .functions.validate import RuleBook
from .schema import RESULT_SCHEMA


def run_oracle(docs: pa.Table,
               ground_truth: pa.Table | None = None,
               dealer_master: list[str] | None = None,
               model_master: set[str] | None = None,
               rulebook: RuleBook | None = None,
               media_model: MediaModel | None = None) -> pa.Table:
    """docs: (doc_id, spans) table, possibly with multiple rows per doc."""
    gt_by_id: dict[str, dict] = {}
    if ground_truth is not None:
        for row in ground_truth.to_pylist():
            gt_by_id[row["doc_id"]] = row

    spans_by_doc: dict[str, list[dict]] = defaultdict(list)
    for row in docs.to_pylist():
        spans_by_doc[row["doc_id"]].extend(row["spans"])

    media_model = media_model or MediaModel()
    memo: dict = {}
    results = []
    for doc_id in sorted(spans_by_doc):
        results.append(docproc.process_document(
            doc_id, spans_by_doc[doc_id],
            ground_truth=gt_by_id.get(doc_id),
            dealer_master=dealer_master, model_master=model_master,
            rulebook=rulebook, media_model=media_model, norm_memo=memo))
    return pa.Table.from_pylist(results, schema=RESULT_SCHEMA)
