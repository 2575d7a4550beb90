"""Pure-Python/numpy raster + PCM codecs — no external codec wheels.

The container has no cv2/PIL/ffmpeg, but three formats are byte-parseable
with nothing beyond numpy, which is enough to make the multimodal
pipeline a REAL decode → resize → frame-sample path instead of a stub:

- **PPM (P6)** binary RGB — 3-token ASCII header + raw ``h*w*3`` bytes.
- **WAV** (RIFF, PCM 16-bit mono) — 44-byte canonical header + int16 LE.
- **VID0** — a deliberately trivial length-prefixed video container
  (``VID0 | u32 n_frames | u32 fps_milli | (u32 len | PPM frame)*``)
  so frame N can be SEEKED without decoding frames 0..N-1, the property
  a real frame-sampler needs at scale.

All encoders/decoders are deterministic, vectorized, and round-trip
(pinned in tests/test_media_fallback.py).
"""

from __future__ import annotations

import struct

import numpy as np

PPM_MAGIC = b"P6"
WAV_MAGIC = b"RIFF"
VID_MAGIC = b"VID0"


# ---------------------------------------------------------------- PPM (P6)

def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"need (h, w, 3) pixels, got {pixels.shape}")
    h, w = pixels.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        pixels, dtype=np.uint8).tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Binary P6 bytes → (h, w, 3) uint8.  Tolerates any whitespace run
    (and ``#`` comment lines) between the three header tokens, per spec."""
    if buf[:2] != PPM_MAGIC:
        raise ValueError("not a P6 PPM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":                 # comment to EOL
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(buf[start:pos]))
    pos += 1                                         # single ws after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"only maxval 255 supported, got {maxval}")
    need = h * w * 3
    raster = np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos)
    return raster.reshape(h, w, 3)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized nearest-neighbor resize (the classic sample-grid
    index map — two integer gathers, no Python pixel loop)."""
    h, w = pixels.shape[:2]
    rows = (np.arange(out_h) * h // out_h).astype(np.intp)
    cols = (np.arange(out_w) * w // out_w).astype(np.intp)
    return pixels[rows][:, cols]


def luminance(pixels: np.ndarray) -> np.ndarray:
    """Integer Rec.601 luma per pixel, uint8."""
    p = pixels.astype(np.uint32)
    return ((299 * p[..., 0] + 587 * p[..., 1] + 114 * p[..., 2])
            // 1000).astype(np.uint8)


# ---------------------------------------------------------- WAV (PCM s16le)

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → canonical 44-byte-header RIFF/WAVE bytes."""
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data))
    return hdr + data


def decode_wav(buf: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM-16 mono bytes → (sample_rate, int16 array)."""
    if buf[:4] != WAV_MAGIC or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate, = struct.unpack_from("<I", buf, 24)
    nbytes, = struct.unpack_from("<I", buf, 40)
    return rate, np.frombuffer(buf, dtype="<i2", count=nbytes // 2, offset=44)


# -------------------------------------------------- VID0 (seekable frames)

def encode_vid(frames: list[np.ndarray], fps_milli: int = 4000) -> bytes:
    """List of (h, w, 3) uint8 frames → VID0 container bytes."""
    parts = [VID_MAGIC, struct.pack("<II", len(frames), fps_milli)]
    for f in frames:
        ppm = encode_ppm(f)
        parts.append(struct.pack("<I", len(ppm)))
        parts.append(ppm)
    return b"".join(parts)


def vid_info(buf: bytes) -> tuple[int, int]:
    """(n_frames, fps_milli) from the container header — O(1)."""
    if buf[:4] != VID_MAGIC:
        raise ValueError("not a VID0 payload")
    return struct.unpack_from("<II", buf, 4)


def decode_vid_frame(buf: bytes, idx: int) -> np.ndarray:
    """Decode ONLY frame ``idx``, seeking over the length prefixes —
    sampled-frame decode cost is independent of video length."""
    n, _ = vid_info(buf)
    if not 0 <= idx < n:
        raise IndexError(f"frame {idx} of {n}")
    pos = 12
    for _ in range(idx):
        flen, = struct.unpack_from("<I", buf, pos)
        pos += 4 + flen
    flen, = struct.unpack_from("<I", buf, pos)
    return decode_ppm(buf[pos + 4:pos + 4 + flen])


def sniff_kind(buf: bytes) -> str:
    """Magic-byte format sniff: 'image' | 'audio' | 'video' | 'unknown'."""
    if buf[:2] == PPM_MAGIC:
        return "image"
    if buf[:4] == WAV_MAGIC:
        return "audio"
    if buf[:4] == VID_MAGIC:
        return "video"
    return "unknown"
