"""64-bit SimHash fingerprints — the Hamming-space analog of the reference's
cosine-similarity matcher (``face_recognition_custom.py:104-112``, threshold
cosine > 0.65): near-identical shingle multisets → near-identical bitwise
fingerprints.
"""

from __future__ import annotations

import numpy as np

_BITS = np.arange(64, dtype=np.uint64)
_CHUNK = 16384


def simhash64(shingles: np.ndarray) -> np.uint64:
    """Majority vote per bit over the document's shingle hashes; empty → 0."""
    n = len(shingles)
    if n == 0:
        return np.uint64(0)
    ones = np.zeros(64, dtype=np.int64)
    for lo in range(0, n, _CHUNK):
        chunk = shingles[lo : lo + _CHUNK, None]
        ones += ((chunk >> _BITS[None, :]) & np.uint64(1)).sum(axis=0, dtype=np.int64)
    bits = (ones * 2 >= n).astype(np.uint64)
    return np.uint64((bits << _BITS).sum(dtype=np.uint64))


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(xor) for uint64 arrays (numpy 1.x has no bit_count)."""
    x = np.bitwise_xor(np.asarray(a, dtype=np.uint64), np.asarray(b, dtype=np.uint64))
    bytes_view = x.reshape(-1, 1).view(np.uint8)
    return np.unpackbits(bytes_view, axis=1).sum(axis=1).astype(np.int64)
