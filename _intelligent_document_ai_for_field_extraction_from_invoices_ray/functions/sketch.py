"""Deterministic sketches for dedup: MinHash, SimHash, rolling fingerprint.

All public-knowledge constructions (Broder '97 min-wise hashing; Charikar
'02 simhash), vectorized with numpy and seeded with fixed constants so
every worker process computes identical sketches.
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1
NUM_PERMS = 64
LSH_BANDS = 16          # 16 bands x 4 rows: P(candidate | j) = 1-(1-j^4)^16
LSH_ROWS = NUM_PERMS // LSH_BANDS

_rng = np.random.RandomState(0xD0C5EED)
_A = _rng.randint(1, _MERSENNE, size=NUM_PERMS, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, size=NUM_PERMS, dtype=np.int64).astype(np.uint64)


def token_hash64(token: str) -> int:
    """Stable 64-bit token hash (blake2b, process-independent)."""
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little")


def token_hashes_unique(tokens: list[str], memo: dict | None = None) -> np.ndarray:
    """Sorted unique int64 token-hash set (the canonical global order used
    by the prefix-filter join).  |set| equals the distinct-token count
    modulo 64-bit collisions."""
    if memo is None:
        memo = {}
    h = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        v = memo.get(t)
        if v is None:
            v = token_hash64(t)
            memo[t] = v
        h[i] = v
    return np.unique(h.view(np.int64))


def shingles(tokens: list[str], k: int = 3) -> set[str]:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)}


def shingle_hashes(tokens: list[str], k: int = 3,
                   memo: dict | None = None) -> np.ndarray:
    """Vectorized 64-bit shingle-set hashes: token-level blake2b (memoized
    over the corpus vocabulary) combined per window with a polynomial mix —
    numerically different from hashing shingle strings, but an equally
    valid shingle identity, and ~10x cheaper for repeated tokens."""
    if memo is None:
        memo = {}
    th = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        v = memo.get(t)
        if v is None:
            v = token_hash64(t)
            memo[t] = v
        th[i] = v
    if len(tokens) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(tokens) < k:
        acc = np.uint64(1469598103934665603)
        for v in th:
            acc = acc * np.uint64(1099511628211) + v
        return np.array([acc], dtype=np.uint64)
    P = np.uint64(1099511628211)
    acc = th[:len(th) - k + 1].copy()
    for j in range(1, k):
        acc = acc * P + th[j:len(th) - k + 1 + j]
    return np.unique(acc)


def minhash_signature(token_hashes: np.ndarray) -> np.ndarray:
    """(NUM_PERMS,) uint64 signature via universal hashing a*x+b mod p."""
    if token_hashes.size == 0:
        return np.full(NUM_PERMS, np.iinfo(np.uint64).max, dtype=np.uint64)
    x = token_hashes.astype(np.uint64)[:, None]          # (n, 1)
    hashed = (x * _A[None, :] + _B[None, :]) % np.uint64(_MERSENNE)
    return hashed.min(axis=0)


def lsh_band_keys(sig: np.ndarray) -> list[int]:
    """One 64-bit bucket key per band (band index folded in)."""
    keys = []
    for b in range(LSH_BANDS):
        chunk = sig[b * LSH_ROWS:(b + 1) * LSH_ROWS]
        h = hashlib.blake2b(chunk.tobytes() + bytes([b]), digest_size=8).digest()
        keys.append(int.from_bytes(h, "little"))
    return keys


def minhash_signatures_batch(values: np.ndarray,
                             offsets: np.ndarray) -> np.ndarray:
    """(ndocs, NUM_PERMS) uint64 signatures for a whole batch of hash
    sets given flattened ``values`` + ``offsets`` — one (chunk, 64)
    universal-hash matrix + ``np.minimum.reduceat`` per doc-aligned
    chunk instead of a Python call per doc.  Empty sets get the all-max
    signature (same as ``minhash_signature``)."""
    ndocs = len(offsets) - 1
    sigs = np.full((ndocs, NUM_PERMS), np.iinfo(np.uint64).max,
                   dtype=np.uint64)
    if len(values) == 0 or ndocs == 0:
        return sigs
    lens = np.diff(offsets)
    CHUNK_VALUES = 1_000_000          # × 64 perms × 8 B ≈ 512 MB peak
    d = 0
    while d < ndocs:
        e = d
        tot = 0
        while e < ndocs and (tot + lens[e] <= CHUNK_VALUES or e == d):
            tot += lens[e]
            e += 1
        seg = values[offsets[d]:offsets[e]].astype(np.uint64)
        if len(seg):
            hashed = (seg[:, None] * _A[None, :] + _B[None, :]) \
                % np.uint64(_MERSENNE)
            nonempty = np.flatnonzero(lens[d:e]) + d
            local = (offsets[nonempty] - offsets[d]).astype(np.int64)
            sigs[nonempty] = np.minimum.reduceat(hashed, local, axis=0)
        d = e
    return sigs


_BAND_MIX = np.uint64(0x9E3779B97F4A7C15)


def lsh_band_keys_batch(sigs: np.ndarray) -> np.ndarray:
    """(ndocs, LSH_BANDS) int64 bucket keys — a vectorized splitmix-style
    mix of each band's LSH_ROWS signature lanes with the band index
    folded in.  A different (but equally valid) band-key family than the
    per-doc blake2b path in ``lsh_band_keys``; any deterministic
    injective-enough mix gives the same LSH collision semantics."""
    n, _ = sigs.shape
    out = np.empty((n, LSH_BANDS), dtype=np.uint64)
    for b in range(LSH_BANDS):
        chunk = sigs[:, b * LSH_ROWS:(b + 1) * LSH_ROWS]
        acc = np.full(n, np.uint64(1469598103934665603))
        for r in range(LSH_ROWS):
            acc = (acc ^ chunk[:, r]) * np.uint64(1099511628211)
        acc ^= np.uint64(b) * _BAND_MIX
        acc ^= acc >> np.uint64(29)
        acc *= np.uint64(0xBF58476D1CE4E5B9)
        acc ^= acc >> np.uint64(32)
        out[:, b] = acc
    return out.view(np.int64)


def simhash64(tokens: list[str], memo: dict | None = None) -> int:
    """64-bit SimHash over the token multiset, vectorized: one (n, 64)
    bit-unpack + column sum instead of a per-token Python loop."""
    if not tokens:
        return 0
    if memo is None:
        memo = {}
    h = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        v = memo.get(t)
        if v is None:
            v = token_hash64(t)
            memo[t] = v
        h[i] = v
    bits = (h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    acc = 2 * bits.astype(np.int64).sum(axis=0) - len(tokens)
    return int(np.bitwise_or.reduce(
        np.where(acc > 0, np.uint64(1) << np.arange(64, dtype=np.uint64),
                 np.uint64(0))))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def popcount64_batch(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount over a uint64 array (numpy<2 lacks
    ``np.bitwise_count``): one byte-view unpackbits + row sum."""
    if x.size == 0:
        return np.zeros(0, dtype=np.int64)
    x = np.ascontiguousarray(x, dtype=np.uint64)
    return (np.unpackbits(x.view(np.uint8)).reshape(-1, 64)
            .sum(axis=1).astype(np.int64))


# ------------------------------------------------------------ HyperLogLog
HLL_P = 12                      # 2^12 = 4096 registers; σ ≈ 1.04/64 ≈ 1.6%
HLL_M = 1 << HLL_P
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)     # Flajolet et al. 2007


def _hll_hash64(vals: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix of int64 keys (splitmix64 finalizer)."""
    x = vals.astype(np.uint64)
    x = (x + np.uint64(0x9E3779B97F4A7C15))
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def hll_registers(vals: np.ndarray) -> np.ndarray:
    """(HLL_M,) uint8 register array for a batch of int64 keys —
    vectorized: bucket = top P bits, rho = leading-zero count of the
    rest + 1, register = max per bucket."""
    regs = np.zeros(HLL_M, dtype=np.uint8)
    if vals.size == 0:
        return regs
    h = _hll_hash64(np.asarray(vals, dtype=np.int64))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    w = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)  # low bits set
    # rho = leading zeros of w + 1; log2 of a uint64 via float is exact
    # for the leading-bit position
    lz = 63 - np.floor(np.log2(w.astype(np.float64))).astype(np.int64)
    # float64 can round w up across a power of two (~2^-54 of keys):
    # clip keeps rho in its valid range instead of emitting 0
    rho = np.clip(lz + 1, 1, 64 - HLL_P + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> int:
    """Cardinality estimate with the standard small-range (linear
    counting) correction."""
    est = _HLL_ALPHA * HLL_M * HLL_M / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * HLL_M and zeros:
        est = HLL_M * np.log(HLL_M / zeros)
    return int(round(est))


def rolling_fingerprint(text: str, base: int = 257, mod: int = (1 << 61) - 1) -> int:
    """Polynomial rolling hash of the canonical text (document fingerprint)."""
    h = 0
    for ch in text:
        h = (h * base + ord(ch)) % mod
    return h
