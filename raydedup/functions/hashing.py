"""Deterministic, process-independent 64-bit hashing kernels (numpy-vectorized).

All hashing in the engine goes through these so results are identical across
workers, runs and ``num_cpus`` levels (unlike Python's salted ``hash``).
"""

from __future__ import annotations

import zlib

import numpy as np

U64 = np.uint64
U64_MAX = np.uint64(0xFFFFFFFFFFFFFFFF)
_FNV_PRIME = U64(0x100000001B3)

# numpy integer overflow wraps silently for unsigned dtypes, which is exactly
# the mod-2^64 arithmetic these mixers rely on.
_err = np.seterr(over="ignore")


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain avalanche constants)."""
    z = x.astype(np.uint64, copy=True)
    z += U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> U64(30))) * U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> U64(27))) * U64(0x94D049BB133111EB)
    return z ^ (z >> U64(31))


def hash_tokens(tokens) -> np.ndarray:
    """64-bit hashes for an iterable of unique token strings.

    crc32 (C speed) widened + avalanched; call on the *unique* tokens of a
    batch (factorize first) so the Python loop is amortized.
    """
    n = len(tokens)
    out = np.fromiter(
        (zlib.crc32(t.encode("utf-8")) ^ (len(t) << 34) for t in tokens),
        dtype=np.uint64,
        count=n,
    )
    return splitmix64(out)


def hash_u64_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Combine two u64 arrays into one (order-sensitive)."""
    return splitmix64(a.astype(np.uint64) * _FNV_PRIME + b.astype(np.uint64))


def poly_window_hash(codes: np.ndarray, k: int) -> np.ndarray:
    """Hash every length-``k`` window of ``codes`` (1-D uint64) → (n-k+1,) u64.

    Polynomial in the FNV prime with mod-2^64 wraparound, then avalanched.
    If ``len(codes) < k`` (but > 0) the whole sequence is hashed as one window.
    """
    codes = codes.astype(np.uint64, copy=False)
    n = len(codes)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    kk = min(k, n)
    # Horner over k shifted 1-D slices: identical mod-2^64 result to the
    # (windows × descending powers) dot, but avoids the 2-D uint64 broadcast
    # multiply, which numpy executes ~20x slower than contiguous 1-D ops
    m = n - kk + 1
    h = codes[:m].astype(np.uint64, copy=True)
    for j in range(1, kk):
        h *= _FNV_PRIME
        h += codes[j : j + m]
    return splitmix64(h)


def hash_strings(values) -> np.ndarray:
    """64-bit content hash per string (full-string; used for exact dedup)."""
    out = np.fromiter(
        (
            zlib.crc32(b) ^ (zlib.crc32(b[::-1]) << 32) ^ len(b)
            for b in (v.encode("utf-8") for v in values)
        ),
        dtype=np.uint64,
        count=len(values),
    )
    return splitmix64(out)
