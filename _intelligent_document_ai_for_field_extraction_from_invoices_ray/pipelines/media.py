"""Multimodal column processing: opaque binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns flowing through actor-pool
``map_batches`` stages, the way a production training-data pipeline would
(decode → feature-extract → resize / frame-sample).  The vision/audio
codecs are NOT in this container, so the decode kernel is a clearly-marked
deterministic STUB (`_fake_decode`) behind the same actor signature a real
libjpeg/ffmpeg-backed worker would have — schema, batch sizing, actor
lifecycle and output layout are real and tested (repo directive: stub the
codec, keep the Ray plumbing real).

Payload synthesis: media refs from the interleaved corpus map to
deterministic pseudo-binary blobs (seeded by ref), so every stage is
reproducible and oracle-checkable without external data.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

MEDIA_KINDS = ("image", "audio", "video")


def synthesize_payload(media_ref: str) -> tuple[str, bytes, dict]:
    """Deterministic opaque payload + typed metadata for a media ref."""
    h = hashlib.blake2b(media_ref.encode(), digest_size=32).digest()
    kind = MEDIA_KINDS[h[0] % 3]
    size = 256 + int.from_bytes(h[1:3], "little") % 3840
    rng = np.random.RandomState(int.from_bytes(h[3:7], "little"))
    payload = rng.bytes(size)
    meta = {"kind": kind,
            "width": 64 + h[8] % 192 if kind != "audio" else 0,
            "height": 64 + h[9] % 192 if kind != "audio" else 0,
            "duration_ms": (int.from_bytes(h[10:12], "little") % 60000) if kind != "image" else 0}
    return kind, payload, meta


def media_table_from_docs(docs: rd.Dataset) -> rd.Dataset:
    """(doc_id, media_ref, media_kind, payload, width, height, duration_ms)
    rows for every media span — the multimodal side table."""

    def explode_media(batch: pa.Table) -> pd.DataFrame:
        rows = []
        for r in batch.select(["doc_id", "spans"]).to_pylist():
            for s in r["spans"]:
                if s["kind"] != "media":
                    continue
                kind, payload, meta = synthesize_payload(s["media_ref"])
                rows.append((r["doc_id"], s["media_ref"], kind, payload,
                             meta["width"], meta["height"], meta["duration_ms"]))
        return pd.DataFrame(rows, columns=["doc_id", "media_ref", "media_kind",
                                           "payload", "width", "height",
                                           "duration_ms"])

    return docs.map_batches(explode_media, batch_format="pyarrow", batch_size=512)


class MediaFeatureExtractor:
    """Actor-pool stage: decode (STUB) → fixed-width feature vector.

    A real deployment loads the codec/model in ``__init__`` (once per
    actor) and decodes in ``__call__``; here ``_fake_decode`` produces a
    deterministic byte histogram so the distributed plumbing is testable.
    Use small ``batch_size`` for large binary rows (see repo guidance on
    memory-aware batch sizing).
    """

    FEATURE_DIM = 16

    def __init__(self, real_codecs: bool = False):
        if real_codecs:
            raise NotImplementedError(
                "no image/audio codecs in this container; plug cv2/ffmpeg here")
        self.real_codecs = real_codecs

    @staticmethod
    def _fake_decode(payload: bytes) -> np.ndarray:
        """STUB decode: 16-bin byte histogram, normalized (stands in for a
        decoded-pixel feature map)."""
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
        return hist / max(1, arr.size)

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        payloads = batch.column("payload").to_pylist()
        feats = np.stack([self._fake_decode(p) for p in payloads])
        out = batch.select(["doc_id", "media_ref", "media_kind"]).to_pandas()
        out["features"] = [row for row in feats]
        out["payload_bytes"] = [len(p) for p in payloads]
        return out


class ImageResizer:
    """Actor-pool resize stage (STUB kernel, real plumbing): emits the
    target geometry + a deterministic content digest of the 'resized'
    output so downstream stages have a stable contract."""

    def __init__(self, target: tuple[int, int] = (224, 224)):
        self.target = target

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        out = batch.select(["media_ref", "media_kind", "width", "height"]).to_pandas()
        mask = out.media_kind == "image"
        out["out_width"] = np.where(mask, self.target[0], 0)
        out["out_height"] = np.where(mask, self.target[1], 0)
        digests = []
        for ref, is_img in zip(out.media_ref, mask):
            digests.append(hashlib.blake2b(
                f"resize:{ref}:{self.target}".encode(), digest_size=8).hexdigest()
                if is_img else "")
        out["resized_digest"] = digests
        return out


class FrameSampler:
    """Actor-pool frame/segment sampler for video/audio rows: deterministic
    uniform sample positions from the typed duration metadata."""

    def __init__(self, n_samples: int = 4):
        self.n_samples = n_samples

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        rows = []
        for r in batch.select(["media_ref", "media_kind", "duration_ms"]).to_pylist():
            if r["media_kind"] == "image" or r["duration_ms"] <= 0:
                continue
            step = r["duration_ms"] / (self.n_samples + 1)
            for k in range(self.n_samples):
                rows.append((r["media_ref"], r["media_kind"],
                             int((k + 1) * step)))
        return pd.DataFrame(rows, columns=["media_ref", "media_kind", "sample_ms"])


def build_media_features(docs: rd.Dataset, concurrency: int = 2,
                         batch_size: int = 256) -> rd.Dataset:
    """docs → media side table → actor-pool feature extraction."""
    return media_table_from_docs(docs).map_batches(
        MediaFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def q_media_features(sf_dir: str) -> rd.Dataset:
    """Driver query: per-media features over the derived corpus (rows-only:
    payload synthesis + stub decode are not SQL-expressible).  Returns a
    lazy distributed-sorted Dataset — the output is media-row-sized
    (corpus-scale), so nothing is collected driver-side."""
    import os

    import pyarrow.parquet as pq

    from .extract import generate_corpus_ray

    n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    tag = os.path.basename(os.path.normpath(sf_dir))
    docs_path, _ = generate_corpus_ray(n_docs, f"/tmp/dai_corpus/{tag}-{n_docs}")
    feats = build_media_features(rd.read_parquet(docs_path))

    def flatten(df: pd.DataFrame) -> pd.DataFrame:
        df["feat0_milli"] = [int(round(f[0] * 1000)) for f in df.features]
        return df[["doc_id", "media_ref", "media_kind", "payload_bytes",
                   "feat0_milli"]]

    return (feats.map_batches(flatten, batch_format="pandas")
            .sort(["doc_id", "media_ref"]))
