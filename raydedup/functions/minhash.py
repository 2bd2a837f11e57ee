"""MinHash signatures (the compact analog of the 128-d face embedding,
``duplicate_face.py:44``) with universal-hash permutations.

``sig[j] = min over shingles s of (a[j]*s + b[j] mod 2^64)`` — a standard
multiply-shift permutation family; the permutation table is built once per
actor (seeded) and reused for every batch.
"""

from __future__ import annotations

import numpy as np

from raydedup.functions.hashing import U64_MAX

_CHUNK = 8192  # shingles per matmul chunk → bounds temp memory at num_perm*CHUNK*8 bytes
_PERM_CHUNK = 16  # permutations per segmented-reduceat chunk (batch path)


class MinHasher:
    def __init__(self, num_perm: int, seed: int):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = (rng.randint(1, 2**62, size=num_perm).astype(np.uint64) << np.uint64(1)) | np.uint64(1)
        self.b = rng.randint(0, 2**62, size=num_perm).astype(np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """(n_shingles,) uint64 → (num_perm,) uint64; empty set → all U64_MAX."""
        if len(shingles) == 0:
            return np.full(self.num_perm, U64_MAX, dtype=np.uint64)
        out = np.full(self.num_perm, U64_MAX, dtype=np.uint64)
        for lo in range(0, len(shingles), _CHUNK):
            s = shingles[lo : lo + _CHUNK, None]
            h = s * self.a[None, :] + self.b[None, :]
            np.minimum(out, h.min(axis=0), out=out)
        return out

    def signature_segments(self, flat: np.ndarray, offsets: np.ndarray) -> np.ndarray:
        """Segmented batch twin of :meth:`signature` — bit-identical output.

        ``flat`` is the concatenation of per-doc shingle sets; ``offsets`` the
        (n_docs+1,) int64 boundaries.  Returns (n_docs, num_perm) uint64 with
        all-U64_MAX rows for empty segments.  One ``np.minimum.reduceat`` per
        permutation chunk replaces the per-doc Python loop; temp memory is
        bounded at ``len(flat) * _PERM_CHUNK * 8`` bytes.
        """
        n_docs = len(offsets) - 1
        out = np.full((n_docs, self.num_perm), U64_MAX, dtype=np.uint64)
        if len(flat) == 0 or n_docs == 0:
            return out
        starts = offsets[:-1]
        # reduceat over non-empty segments only: an empty segment's start index
        # would otherwise need clamping, which shortens its predecessor's segment
        nonempty = np.flatnonzero(starts != offsets[1:])
        ne_starts = starts[nonempty]
        # per-permutation 1-D passes: contiguous uint64 multiply-add is ~20x
        # faster than the equivalent 2-D broadcast (measured), and the 1-D
        # reduceat segmented-min replaces the per-doc Python loop
        seg = np.empty((self.num_perm, len(nonempty)), dtype=np.uint64)
        for j in range(self.num_perm):
            h = flat * self.a[j]
            h += self.b[j]
            seg[j] = np.minimum.reduceat(h, ne_starts)
        out[nonempty] = seg.T
        return out


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Fraction of agreeing permutations — unbiased Jaccard estimator."""
    return float(np.mean(sig_a == sig_b))


def estimate_jaccard_matrix(sigs_a: np.ndarray, sigs_b: np.ndarray) -> np.ndarray:
    """Row-wise estimate for stacked signatures (n, num_perm) vs (n, num_perm)."""
    return (sigs_a == sigs_b).mean(axis=1)
