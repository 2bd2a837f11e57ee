"""Word-shingle extraction (the "feature extractor" — analog of
``face_locations``/``face_encodings`` yielding 0..k features per record,
``face_recognition_custom.py:82-84``).

A document's feature set is the set of 64-bit hashes of its ``k``-token
word shingles over the normalized text.  Batch path: tokens are factorized
once per batch and hashed only per unique token, then per-doc shingle
hashes come from a vectorized polynomial window hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from raydedup.functions.hashing import hash_tokens, poly_window_hash, splitmix64


def batch_shingles(texts: "list[str] | pd.Series", k: int, max_shingles: int = 0):
    """Shingle-hash sets for a batch of normalized documents.

    Returns ``(sets, capped_mask)`` where ``sets`` is a list of sorted unique
    uint64 arrays (one per doc; empty array for empty/None docs) and
    ``capped_mask`` is a per-doc bool array marking docs truncated by
    ``max_shingles`` (smallest-by-rehash deterministic sampling, which
    preserves MinHash/Jaccard in expectation).
    """
    texts = ["" if t is None else t for t in texts]
    # one flat token stream for the whole batch, with per-doc offsets
    token_lists = [t.split() for t in texts]
    lens = np.fromiter((len(tl) for tl in token_lists), dtype=np.int64, count=len(token_lists))
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    capped = np.zeros(len(texts), dtype=bool)
    if offsets[-1] == 0:
        return [np.empty(0, dtype=np.uint64) for _ in texts], capped

    flat = np.concatenate([np.asarray(tl, dtype=object) for tl in token_lists if tl])
    codes_idx, uniques = pd.factorize(flat)
    unique_hashes = hash_tokens(uniques)
    flat_codes = unique_hashes[codes_idx]

    sets = []
    for i in range(len(texts)):
        lo, hi = offsets[i], offsets[i + 1]
        if hi == lo:
            sets.append(np.empty(0, dtype=np.uint64))
            continue
        sh = np.unique(poly_window_hash(flat_codes[lo:hi], k))
        if max_shingles and len(sh) > max_shingles:
            # smallest-by-independent-rehash sampling: deterministic, unbiased
            order = np.argsort(splitmix64(sh))
            sh = np.sort(sh[order[:max_shingles]])
            capped[i] = True
        sets.append(sh)
    return sets, capped


def doc_shingles(text: str, k: int, max_shingles: int = 0) -> np.ndarray:
    """Scalar twin (oracle + tests); identical output to the batch path."""
    sets, _ = batch_shingles([text], k, max_shingles)
    return sets[0]


def exact_jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two sorted unique uint64 shingle arrays."""
    if len(a) == 0 or len(b) == 0:
        return 0.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)
