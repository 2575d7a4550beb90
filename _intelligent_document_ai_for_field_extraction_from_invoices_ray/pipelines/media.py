"""Multimodal column processing: binary payloads + typed metadata.

Treats image/audio/video as ``binary`` columns flowing through actor-pool
``map_batches`` stages, the way a production training-data pipeline would
(decode → feature-extract → resize / frame-sample).  Since round 5 the
decode path is REAL: payloads are genuine PPM (P6) images, RIFF/WAVE PCM
audio and a seekable length-prefixed frame container (``functions/
rawmedia.py`` — pure numpy, no codec wheels), and every stage parses the
actual bytes.  External compressed formats (JPEG/MP4/…) would need
cv2/ffmpeg, which this container lacks — ``MediaFeatureExtractor(
real_codecs=True)`` marks that seam with an honest NotImplementedError.

Payload synthesis: media refs from the interleaved corpus map to
deterministic ENCODED payloads (pixels/samples/frames seeded by ref), so
every stage is reproducible and oracle-checkable without external data,
and the typed metadata columns (width/height/duration_ms) are exactly
what decoding the payload yields — pinned in tests.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..functions import rawmedia as rm

MEDIA_KINDS = ("image", "audio", "video")

AUDIO_RATE = 4000                       # Hz — small synth payloads


def _image_pixels(rng: np.random.RandomState, w: int, h: int,
                  signs: np.ndarray | None = None) -> np.ndarray:
    """Deterministic per-ref CONTENT: an 8x8 +/-1 sign pattern rendered
    at block scale over a mid-gray base, plus seeded pixel noise.  The
    pattern gives every ref ~64 bits of visual identity (the earlier
    global gradient made every image perceptually identical — aHash is
    gradient-invariant by construction); ``signs`` lets the caller plant
    near-duplicate families by flipping a few cells of a shared root."""
    if signs is None:
        signs = rng.choice(np.array([-1, 1], dtype=np.int64), (8, 8))
    by = (8 * np.arange(h)) // h
    bx = (8 * np.arange(w)) // w
    base = 128 + 48 * signs[by[:, None], bx[None, :]]
    noise = rng.randint(-16, 17, size=(h, w, 3))
    return np.clip(base[..., None] + noise, 0, 255).astype(np.uint8)


_FAMILY_SHARE_MOD = 10        # ~1 in 10 images joins a planted family
_N_FAMILIES = 32


def _image_signs(h: bytes) -> np.ndarray:
    """Sign pattern for an image ref digest: most refs draw an
    independent random pattern; ~10% derive from one of 32 family ROOT
    patterns with 0-3 cell flips — planted perceptual near-duplicates
    at aHash hamming distance <= 3 (the re-encode/re-noise/near-crop
    analog real corpora contain), so the phash dedup family has a
    truthful, bounded target."""
    if h[10] % _FAMILY_SHARE_MOD == 0:
        fam = h[11] % _N_FAMILIES
        prng = np.random.RandomState(1_000_000 + fam)
        signs = prng.choice(np.array([-1, 1], dtype=np.int64), (8, 8))
        nflip = h[12] % 4
        frng = np.random.RandomState(int.from_bytes(h[13:17], "little"))
        for flat in frng.choice(64, size=nflip, replace=False):
            signs.flat[flat] *= -1
        return signs
    return None


def synthesize_payload(media_ref: str) -> tuple[str, bytes, dict]:
    """Deterministic REAL-format payload + typed metadata for a media ref.

    The metadata is derived from (and verifiable against) the encoded
    bytes: width/height are the PPM/frame dims, duration_ms is exactly
    what the WAV sample count / VID0 frame schedule decodes to."""
    h = hashlib.blake2b(media_ref.encode(), digest_size=32).digest()
    kind = MEDIA_KINDS[h[0] % 3]
    rng = np.random.RandomState(int.from_bytes(h[3:7], "little"))
    if kind == "image":
        w, hh = 64 + h[8] % 192, 64 + h[9] % 192
        payload = rm.encode_ppm(_image_pixels(rng, w, hh,
                                              signs=_image_signs(h)))
        meta = {"kind": kind, "width": w, "height": hh, "duration_ms": 0}
    elif kind == "audio":
        dur_ms = 250 + int.from_bytes(h[10:12], "little") % 2750
        n = AUDIO_RATE * dur_ms // 1000
        t = np.arange(n, dtype=np.float64)
        freq = 100 + h[12] % 800
        wave = (8000 * np.sin(2 * np.pi * freq * t / AUDIO_RATE)
                + rng.randint(-2000, 2000, n)).astype(np.int16)
        payload = rm.encode_wav(wave, AUDIO_RATE)
        meta = {"kind": kind, "width": 0, "height": 0,
                "duration_ms": n * 1000 // AUDIO_RATE}
    else:
        w, hh = 32 + h[8] % 32, 24 + h[9] % 24
        n_frames = 2 + h[13] % 6
        interval_ms = 100 + int.from_bytes(h[10:12], "little") % 400
        frames = [_image_pixels(rng, w, hh) for _ in range(n_frames)]
        payload = rm.encode_vid(frames, fps_milli=1_000_000 // interval_ms)
        meta = {"kind": kind, "width": w, "height": hh,
                "duration_ms": n_frames * interval_ms}
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
    """Actor-pool stage: REAL decode → fixed-width feature vector.

    Dispatch is by magic-byte sniff: P6 images decode to pixels (feature
    = normalized 16-bin luma histogram), WAV audio to int16 samples
    (amplitude histogram), VID0 video to its first frame + O(1) frame
    count.  Unrecognized payloads fall back to the byte histogram
    (``_fake_decode``), so the stage never throws on foreign bytes.
    ``real_codecs=True`` requests external compressed-format support
    (JPEG/MP4 via cv2/ffmpeg) — absent in this container, honest raise.
    Use small ``batch_size`` for large binary rows (see repo guidance on
    memory-aware batch sizing).
    """

    FEATURE_DIM = 16

    def __init__(self, real_codecs: bool = False):
        if real_codecs:
            raise NotImplementedError(
                "no compressed-format codecs (cv2/ffmpeg) in this container; "
                "plug them here — the raw PPM/WAV/VID0 path is built in")
        self.real_codecs = real_codecs

    @staticmethod
    def _fake_decode(payload: bytes) -> np.ndarray:
        """Fallback for unrecognized formats: 16-bin byte histogram."""
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
        return hist / max(1, arr.size)

    @staticmethod
    def _decode_one(payload: bytes) -> tuple[np.ndarray, int, int, int]:
        """→ (feature[16], dec_width, dec_height, n_frames)."""
        kind = rm.sniff_kind(payload)
        if kind == "image":
            pix = rm.decode_ppm(payload)
            lum = rm.luminance(pix)
            hist = np.bincount((lum >> 4).ravel(), minlength=16)
            return (hist / max(1, lum.size), pix.shape[1], pix.shape[0], 1)
        if kind == "audio":
            _, samples = rm.decode_wav(payload)
            q = ((samples.astype(np.int32) + 32768) >> 12)
            hist = np.bincount(q, minlength=16)
            return (hist / max(1, samples.size), 0, 0, 0)
        if kind == "video":
            n_frames, _ = rm.vid_info(payload)
            pix = rm.decode_vid_frame(payload, 0)
            lum = rm.luminance(pix)
            hist = np.bincount((lum >> 4).ravel(), minlength=16)
            return (hist / max(1, lum.size), pix.shape[1], pix.shape[0],
                    n_frames)
        return (MediaFeatureExtractor._fake_decode(payload), 0, 0, 0)

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        payloads = batch.column("payload").to_pylist()
        decoded = [self._decode_one(p) for p in payloads]
        out = batch.select(["doc_id", "media_ref", "media_kind"]).to_pandas()
        out["features"] = [d[0] for d in decoded]
        out["payload_bytes"] = [len(p) for p in payloads]
        out["dec_width"] = np.array([d[1] for d in decoded], np.int32)
        out["dec_height"] = np.array([d[2] for d in decoded], np.int32)
        out["n_frames"] = np.array([d[3] for d in decoded], np.int32)
        return out


class ImageResizer:
    """Actor-pool resize stage: decodes each P6 payload and runs a REAL
    vectorized nearest-neighbor resample to ``target``; the digest is of
    the actual resized raster bytes, so any pixel change propagates."""

    def __init__(self, target: tuple[int, int] = (224, 224)):
        self.target = target

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        payloads = batch.column("payload").to_pylist()
        out = batch.select(["media_ref", "media_kind", "width", "height"]).to_pandas()
        mask = (out.media_kind == "image").to_numpy()
        out["out_width"] = np.where(mask, self.target[0], 0)
        out["out_height"] = np.where(mask, self.target[1], 0)
        digests = []
        for payload, is_img in zip(payloads, mask):
            if not is_img:
                digests.append("")
                continue
            resized = rm.resize_nearest(rm.decode_ppm(payload),
                                        self.target[0], self.target[1])
            digests.append(hashlib.blake2b(
                resized.tobytes(), digest_size=8).hexdigest())
        out["resized_digest"] = digests
        return out


class FrameSampler:
    """Actor-pool frame/segment sampler for video/audio rows: uniform
    sample positions from the typed duration metadata, then a REAL
    per-sample decode — VID0 frames are seeked (cost independent of
    video length) and their mean luma emitted; WAV windows are sliced
    and their RMS emitted.  ``frame_stat_milli`` ∈ [0, 1000]."""

    def __init__(self, n_samples: int = 4):
        self.n_samples = n_samples

    def _sample_video(self, payload: bytes, rows: list, ref: str) -> None:
        n_frames, fps_milli = rm.vid_info(payload)
        interval_ms = 1_000_000 // max(1, fps_milli)
        for k in range(self.n_samples):
            idx = min(n_frames - 1, k * n_frames // self.n_samples)
            lum = rm.luminance(rm.decode_vid_frame(payload, idx))
            rows.append((ref, "video", max(1, idx * interval_ms),
                         int(round(float(lum.mean()) / 255 * 1000))))

    def _sample_audio(self, payload: bytes, rows: list, ref: str) -> None:
        rate, samples = rm.decode_wav(payload)
        if not len(samples):
            return
        dur_ms = len(samples) * 1000 // rate
        step = dur_ms / (self.n_samples + 1)
        win = max(1, rate // 100)                      # 10 ms window
        for k in range(self.n_samples):
            ms = int((k + 1) * step)
            lo = min(len(samples) - 1, ms * rate // 1000)
            seg = samples[lo:lo + win].astype(np.float64)
            rms = float(np.sqrt(np.mean(seg * seg))) if len(seg) else 0.0
            rows.append((ref, "audio", max(1, ms),
                         int(round(rms / 32768 * 1000))))

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        rows: list = []
        kinds = batch.column("media_kind").to_pylist()
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for ref, kind, payload in zip(refs, kinds, payloads):
            if kind == "video" and rm.sniff_kind(payload) == "video":
                self._sample_video(payload, rows, ref)
            elif kind == "audio" and rm.sniff_kind(payload) == "audio":
                self._sample_audio(payload, rows, ref)
        return pd.DataFrame(rows, columns=["media_ref", "media_kind",
                                           "sample_ms", "frame_stat_milli"])


def build_media_features(docs: rd.Dataset, concurrency: int = 2,
                         batch_size: int = 256) -> rd.Dataset:
    """docs → media side table → actor-pool feature extraction."""
    return media_table_from_docs(docs).map_batches(
        MediaFeatureExtractor, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency)


def q_media_features(sf_dir: str) -> rd.Dataset:
    """Driver query: per-media DECODED features over the derived corpus
    (rows-only: payload synthesis + decode are not SQL-expressible).
    Emits the decoded geometry/frame stats alongside the feature scalar.
    Returns a lazy distributed-sorted Dataset — the output is
    media-row-sized (corpus-scale), so nothing is collected driver-side."""
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
                   "dec_width", "dec_height", "n_frames", "feat0_milli"]]

    return (feats.map_batches(flatten, batch_format="pandas")
            .sort(["doc_id", "media_ref"]))


class MediaPerceptualHasher:
    """Actor-pool stage: decode P6 images → 64-bit average-hash (aHash),
    the classic perceptual fingerprint: integer Rec.601 luma → exact
    8x8 block means (floor-partition block bounds, integer floor
    division — no float resize) → bit i = block_mean_i > mean-of-means.
    Two images differing by small noise/re-encoding collide; distinct
    content doesn't — the content-level dedup exact payload hashing
    misses.  Emitted as fixed-width hex so grouping/sorting order is
    identical everywhere."""

    def __init__(self):
        self._grid = np.arange(9)

    @staticmethod
    def _ahash(pixels: np.ndarray) -> str:
        luma = rm.luminance(pixels).astype(np.int64)
        h, w = luma.shape
        rb = (np.arange(9) * h) // 8
        cb = (np.arange(9) * w) // 8
        # exact block sums via the 2-D summed-area table
        ii = np.zeros((h + 1, w + 1), dtype=np.int64)
        np.cumsum(np.cumsum(luma, axis=0), axis=1, out=ii[1:, 1:])
        bs = (ii[rb[1:, None], cb[None, 1:]] - ii[rb[:-1, None], cb[None, 1:]]
              - ii[rb[1:, None], cb[None, :-1]]
              + ii[rb[:-1, None], cb[None, :-1]])
        cnt = ((rb[1:] - rb[:-1])[:, None] * (cb[1:] - cb[:-1])[None, :])
        means = bs // cnt
        bits = (means > (int(means.sum()) // 64)).ravel()
        val = 0
        for b in bits:
            val = (val << 1) | int(b)
        return f"{val:016x}"

    def __call__(self, batch: pa.Table) -> pd.DataFrame:
        rows = []
        for r in batch.select(["doc_id", "media_ref", "payload"]).to_pylist():
            if rm.sniff_kind(r["payload"]) != "image":
                continue
            rows.append((r["doc_id"], r["media_ref"],
                         self._ahash(rm.decode_ppm(r["payload"]))))
        # doc_id is the corpus's string id — no cast
        return pd.DataFrame(rows, columns=["doc_id", "media_ref", "phash"])


def q_media_phash(sf_dir: str) -> rd.Dataset:
    """Perceptual-hash image dedup groups over the derived corpus
    (rows-only: pixel decode is not SQL-expressible).  One row per
    distinct aHash with its occurrence/ref counts — identical phash
    under DIFFERENT refs is a perceptual duplicate exact payload
    dedup cannot see.

    Shape at scale: decode+hash on an actor pool (small batches for the
    binary rows), then ONE phash-bucketed count; output is
    distinct-image-sized, never collected driver-side."""
    import os

    import pyarrow.parquet as pq

    from .extract import generate_corpus_ray
    from .grouping import bucketed_group_apply

    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    tag = os.path.basename(os.path.normpath(sf_dir))
    docs_path, _ = generate_corpus_ray(
        n_docs, f"/tmp/dai_corpus/{tag}-{n_docs}")
    media = media_table_from_docs(rd.read_parquet(docs_path))
    hashed = media.map_batches(MediaPerceptualHasher,
                               batch_format="pyarrow", batch_size=256,
                               concurrency=2)

    def groups(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("phash", as_index=False).agg(
            n_rows=("media_ref", "size"),
            n_refs=("media_ref", "nunique"),
            min_ref=("media_ref", "min"))
        return out.astype({"n_rows": np.int64, "n_refs": np.int64})

    return bucketed_group_apply(hashed, ["phash"], groups,
                                num_buckets=16).sort("phash")


def q_media_phash_pairs(sf_dir: str) -> rd.Dataset:
    """Perceptual NEAR-dup image pairs: hamming(aHash) <= 3 over distinct
    image refs — the multimodal analog of simhash_pairs, and it REUSES
    that machinery wholesale (pigeonhole segment buckets via
    dedup._pairs_from_keys with the hot-key grid, exact XOR-popcount
    verification via dedup.verify_hamming).  Finds the planted
    re-encode/near-crop families the synthesis embeds (~10% of images
    derive from 32 family roots with <= 3 block flips).

    Rows-only (pixel decode is not SQL-expressible); equivalence vs a
    brute-force all-pairs NumPy reference is pytest-pinned.

    Shape at scale: decode+hash on the actor pool; ONE ref-bucketed
    dedup to distinct refs; the candidate/verify exchanges ship only
    (int64 id, int64 sig) — refs re-attach via two bounded cogroups at
    the end."""
    import os

    import pyarrow.parquet as pq

    from .dedup import _pairs_from_keys, _sig_u64, verify_hamming
    from .extract import generate_corpus_ray
    from .grouping import bucketed_cogroup, bucketed_group_apply

    n_docs = pq.read_metadata(
        os.path.join(sf_dir, "documents.parquet")).num_rows
    tag = os.path.basename(os.path.normpath(sf_dir))
    docs_path, _ = generate_corpus_ray(
        n_docs, f"/tmp/dai_corpus/{tag}-{n_docs}")
    media = media_table_from_docs(rd.read_parquet(docs_path))
    hashed = media.map_batches(MediaPerceptualHasher,
                               batch_format="pyarrow", batch_size=256,
                               concurrency=2)

    def distinct_refs(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates("media_ref")
        rid = np.array([int.from_bytes(
            hashlib.blake2b(r.encode(), digest_size=8).digest(),
            "little") >> 1 for r in d.media_ref], dtype=np.int64)
        sig = np.array([np.uint64(int(p, 16)) for p in d.phash],
                       dtype=np.uint64)
        return pd.DataFrame({
            "doc_id": rid,
            "media_ref": d.media_ref.to_numpy(),
            "sig": (sig - np.uint64(1 << 63)).view(np.int64)})

    refs = bucketed_group_apply(hashed, ["media_ref"], distinct_refs,
                                num_buckets=16).materialize()
    sigs = refs.select_columns(["doc_id", "sig"])

    def seg_keys(batch: pa.Table) -> pa.Table:
        from .dedup import _sig_u64 as su
        u = su(batch.column("sig").to_numpy(zero_copy_only=False))
        segs, idxs = [], []
        n = len(u)
        for seg in range(4):
            val = (u >> np.uint64(16 * seg)) & np.uint64(0xFFFF)
            segs.append((np.int64(seg) << np.int64(16))
                        | val.astype(np.int64))
            idxs.append(np.arange(n))
        out = pa.table({
            "seg_key": pa.array(np.concatenate(segs)),
            "doc_id": batch.column("doc_id").combine_chunks().take(
                pa.array(np.concatenate(idxs))),
        })
        return out.replace_schema_metadata(None)

    cands = _pairs_from_keys(sigs.map_batches(seg_keys,
                                              batch_format="pyarrow"),
                             "seg_key", dedup=True)
    ver = verify_hamming(cands, sigs, max_h=3)

    def attach(side: str, out_col: str):
        def fn(vf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
            m = vf.merge(rf.rename(columns={"doc_id": side,
                                            "media_ref": out_col}),
                         on=side, how="inner")
            return m.drop(columns=[c for c in ("sig",) if c in m])
        return fn

    withA = bucketed_cogroup(ver, refs.select_columns(
        ["doc_id", "media_ref"]), ["doc_a"], ["doc_id"],
        attach("doc_a", "ref_a"), num_buckets=8)
    withB = bucketed_cogroup(withA, refs.select_columns(
        ["doc_id", "media_ref"]), ["doc_b"], ["doc_id"],
        attach("doc_b", "ref_b"), num_buckets=8)

    def finish(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        a = df[["ref_a", "ref_b"]].min(axis=1)
        b = df[["ref_a", "ref_b"]].max(axis=1)
        return pa.table({"ref_a": pa.array(a, pa.string()),
                         "ref_b": pa.array(b, pa.string()),
                         "hamming": pa.array(
                             df.hamming.astype(np.int64))})

    return withB.map_batches(finish,
                             batch_format="pyarrow").sort(["ref_a",
                                                           "ref_b"])
