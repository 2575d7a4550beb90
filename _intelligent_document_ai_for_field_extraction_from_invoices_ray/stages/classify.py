"""Stateful media-classification stage: the actor-pool analog of the
reference's YOLO singleton (utils/detector.py:60-140).

A callable CLASS for ``map_batches(MediaClassifier, concurrency=N,
batch_size=B, num_cpus=c, num_gpus=g)``: the model loads ONCE per actor in
``__init__`` (like YOLO weights), each ``__call__`` classifies one Arrow
batch.  Confidence/area gates (detector.py:238-243) are applied here;
suppressed spans get ``det_class=''``.  NMS and best-per-class stay in the
per-document reassembly stage because they need the whole document.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.detect import MediaModel
from ..functions import vocab as V


class MediaClassifierNested:
    """Actor-pool classifier for the COMPACT pipeline: doc rows with the
    nested ``spans`` column.  Flattens the list column zero-copy, runs the
    per-ref model + gates on MEDIA spans only, and re-wraps the detections
    as list columns, so nothing per-span ships as a separate row through
    the shuffle.

    EXCHANGE SLIMMING (this stage feeds the one reassembly shuffle):
    - ``kind`` is dropped from the shuffled span struct — it is derivable
      under the span contract (kind=='media' <=> non-empty media_ref,
      validated vectorized per batch, ValueError on violation);
    - ``det_*`` lists align to the MEDIA ordinal within each row, not the
      span ordinal, so text spans no longer carry dead det entries
      (an empty string + float64 zero + null bbox slot per text span).
    ``make_assemble_nested_fn`` is the matched consumer that reconstructs
    ``kind`` and re-attaches detections by media ordinal."""

    def __init__(self, conf_thresholds: dict[str, float] | None = None):
        self.inner = MediaClassifier(conf_thresholds)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np
        import pyarrow.compute as pc

        spans = batch.column("spans")
        if isinstance(spans, pa.ChunkedArray):
            spans = spans.combine_chunks()
        flat = spans.flatten()
        is_media = pc.equal(flat.field("kind"), "media")
        has_ref = pc.not_equal(flat.field("media_ref"), "")
        ok = pc.all(pc.equal(is_media, has_ref)).as_py()   # None on empty
        if ok is False:
            raise ValueError(
                "span contract violation: kind=='media' must coincide "
                "with a non-empty media_ref (required to drop `kind` "
                "from the reassembly exchange)")
        media_tbl = pa.table({"kind": flat.field("kind"),
                              "media_ref": flat.field("media_ref")}
                             ).filter(is_media)
        det = self.inner(media_tbl)

        # rebase offsets from value lengths (spans may be a sliced array
        # whose raw offsets don't start at 0)
        lengths = pc.list_value_length(spans).to_numpy(zero_copy_only=False)
        offsets = pa.array(
            np.concatenate([[0], np.cumsum(lengths)]).astype(np.int32))
        slim = pa.StructArray.from_arrays(
            [flat.field("text"), flat.field("media_ref"),
             flat.field("offset")],
            names=["text", "media_ref", "offset"])
        out = batch.set_column(batch.schema.get_field_index("spans"),
                               "spans", pa.ListArray.from_arrays(offsets, slim))

        # media-ordinal det offsets: per-row media-span counts
        parent = np.repeat(np.arange(batch.num_rows), lengths)
        im = is_media.to_numpy(zero_copy_only=False)
        media_counts = np.bincount(parent[im], minlength=batch.num_rows)
        moff = pa.array(
            np.concatenate([[0], np.cumsum(media_counts)]).astype(np.int32))
        for name in ("det_class", "det_conf", "det_bbox"):
            col = det.column(name)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            out = out.append_column(name, pa.ListArray.from_arrays(moff, col))
        return out


class MediaClassifier:
    def __init__(self, conf_thresholds: dict[str, float] | None = None):
        # model load happens once per actor (GPU-capable slot: a real
        # deployment passes num_gpus= to map_batches and moves weights here)
        self.model = MediaModel(conf_thresholds)
        self.page_area = V.MEDIA_PAGE_W * V.MEDIA_PAGE_H

    def __call__(self, batch: pa.Table) -> pa.Table:
        kind = batch.column("kind").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        n = len(kind)
        det_class = [""] * n
        det_conf = [0.0] * n
        det_bbox: list[list[float] | None] = [None] * n
        thresholds = self.model.conf_thresholds
        for i in range(n):
            if kind[i] != "media":
                continue
            cls, conf, bbox = self.model.predict_one(refs[i])
            if conf < thresholds.get(cls, 0.5):
                continue
            area = (bbox[2] - bbox[0]) * (bbox[3] - bbox[1])
            if (area < V.MEDIA_AREA_MIN_FRAC * self.page_area
                    or area > V.MEDIA_AREA_MAX_FRAC * self.page_area):
                continue
            det_class[i] = cls
            det_conf[i] = conf
            det_bbox[i] = bbox
        return (batch
                .append_column("det_class", pa.array(det_class, type=pa.string()))
                .append_column("det_conf", pa.array(det_conf, type=pa.float64()))
                .append_column("det_bbox", pa.array(det_bbox, type=pa.list_(pa.float64()))))
