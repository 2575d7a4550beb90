"""Visualization sinks (S8): annotated page renderings as SVG.

The reference draws OCR word boxes (`utils/ocr.py:562-622`, green above /
orange below the 0.7 confidence threshold, optional score labels) and
detection boxes with class:confidence labels (`utils/detector.py:733-763`,
green signature / red stamp) onto the page image with cv2.  This engine
has no raster image (spans are the payload) and no cv2 wheel, so the same
annotation semantics render to SVG — pure text, debuggable in any
browser, and writable as a partitioned Ray sink like every other output.

Semantics parity:
- span box color: green ``conf > 0.7`` else orange (ocr.py:598)
- span label: ``{text[:20]}:{conf:.2f}`` when ``show_confidence``
- detection color: signature green, stamp red, other yellow
  (detector.py:741-744); label ``{class}: {conf:.2f}`` (detector.py:754)
"""

from __future__ import annotations

import html
import os

import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import docproc
from ..functions import vocab as V

_DET_COLORS = {"signature": "#00c000", "stamp": "#d00000"}


def _rect(bbox, color, width=2) -> str:
    x1, y1, x2, y2 = bbox
    return (f'<rect x="{x1:.1f}" y="{y1:.1f}" width="{x2 - x1:.1f}" '
            f'height="{y2 - y1:.1f}" fill="none" stroke="{color}" '
            f'stroke-width="{width}"/>')


def _label(x, y, text, color) -> str:
    return (f'<text x="{x:.1f}" y="{y:.1f}" font-size="11" '
            f'fill="{color}">{html.escape(text)}</text>')


def render_doc_svg(row: dict, show_confidence: bool = True,
                   confidence_threshold: float = 0.7) -> str:
    """One result row (needs doc_id + norm_spans + detection fields) →
    annotated page SVG."""
    w, h = V.MEDIA_PAGE_W, V.MEDIA_PAGE_H
    parts = [f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" '
             f'height="{h}" viewBox="0 0 {w} {h}">',
             f'<rect width="{w}" height="{h}" fill="white" stroke="#888"/>']

    for s in row.get("norm_spans") or []:
        if s["kind"] != "text":
            continue
        text = s["text"]
        bbox = docproc.span_bbox(s["offset"], text)
        conf = docproc.span_confidence(row["doc_id"], s["offset"])
        color = "#00c000" if conf > confidence_threshold else "#ffa500"
        parts.append(_rect(bbox, color))
        if show_confidence:
            parts.append(_label(bbox[0], bbox[1] - 2,
                                f"{text[:20]}:{conf:.2f}", color))

    for cls in ("signature", "stamp"):
        if row.get(f"{cls}_present") and row.get(f"{cls}_bbox"):
            color = _DET_COLORS.get(cls, "#c0c000")
            bbox = list(row[f"{cls}_bbox"])
            parts.append(_rect(bbox, color))
            parts.append(_label(bbox[0], bbox[1] - 10,
                                f"{cls}: {row.get(f'{cls}_confidence', 0.0):.2f}",
                                color))

    parts.append("</svg>")
    return "\n".join(parts)


def write_visualizations(results: rd.Dataset, out_dir: str,
                         limit: int | None = 100) -> int:
    """Partitioned visualization sink: one ``<doc_id>.svg`` per document,
    written from the workers (debug tooling — ``limit`` keeps it from
    rendering a 10^12-doc corpus by accident).  Returns docs written."""
    os.makedirs(out_dir, exist_ok=True)
    ds = results if limit is None else results.limit(limit)

    def render(batch: pa.Table) -> pd.DataFrame:
        n = 0
        for row in batch.to_pylist():
            svg = render_doc_svg(row)
            path = os.path.join(out_dir, f"{row['doc_id']}.svg")
            tmp = path + f".tmp-{os.getpid()}"
            with open(tmp, "w") as f:
                f.write(svg)
            os.replace(tmp, path)
            n += 1
        return pd.DataFrame({"written": [n]})

    parts = ds.map_batches(render, batch_format="pyarrow").to_pandas()
    return int(parts.written.sum()) if len(parts) else 0
