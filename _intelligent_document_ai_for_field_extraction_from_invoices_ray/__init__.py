"""Ray-Data-native document field-extraction engine.

A from-scratch rebuild of the extraction *semantics* of
``YagnikMaru/-Intelligent-Document-AI-for-Field-Extraction-from-Invoices``
(read-only reference at ``/root/reference``) on a completely different
substrate: ``ray.data.Dataset`` pipelines over zero-copy Arrow batches of
interleaved text+media documents with schema
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.

Layout
------
- ``functions/``  pure scalar/vector semantics (regex banks, normalizer,
  field extraction, validation, deterministic media classification,
  sketches).  Shared verbatim by the distributed pipeline and the
  single-process oracle so both compute the exact same floats.
- ``sources/``    corpus generator, Lance/Parquet IO, testdata readers.
- ``stages/``     Ray Data stage builders (map_batches fns / actor classes).
- ``pipelines/``  end-to-end pipelines (flagship extraction, relational
  operator suite, dedup, text stats, similarity search, evaluation).
- ``state/``      checkpoint manifest + resume logic.
- ``oracle.py``   reference-faithful single-process implementation used as
  ground truth by the pytest invariant suite.

None of this code calls ``ray.init``/``ray.shutdown``; sessions are owned
by the test fixture, ``bench.py`` and CLI entry points only.
"""

__version__ = "0.1.0"
