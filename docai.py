"""Convenience alias: ``import docai`` for the package name SURVEY.md uses
(the engine lives in
``_intelligent_document_ai_for_field_extraction_from_invoices_ray``).

Usage::

    import docai
    docai.oracle.run_oracle(...)
    docai.pipelines.extract.build_extraction(...)
"""

import importlib
import sys

_PKG = "_intelligent_document_ai_for_field_extraction_from_invoices_ray"
_pkg = importlib.import_module(_PKG)

__version__ = _pkg.__version__

for _sub in ("schema", "oracle",
             "functions", "functions.textnorm", "functions.fieldex",
             "functions.validate", "functions.detect", "functions.docproc",
             "functions.sketch", "functions.fuzzy", "functions.vocab",
             "functions.patterns",
             "stages", "stages.recover", "stages.normalize",
             "stages.classify", "stages.assemble", "stages.output",
             "sources", "sources.corpus", "sources.io",
             "pipelines", "pipelines.extract", "pipelines.summary",
             "pipelines.evaluate", "pipelines.relational", "pipelines.dedup",
             "pipelines.textstats", "pipelines.similarity", "pipelines.media",
             "pipelines.fallback", "pipelines.grouping", "pipelines.report",
             "state", "state.manifest", "run"):
    _mod = importlib.import_module(f"{_PKG}.{_sub}")
    sys.modules[f"docai.{_sub}"] = _mod
    _top = _sub.split(".")[0]
    globals()[_top] = sys.modules[f"docai.{_top}"]
