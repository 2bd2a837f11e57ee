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


def batch_shingles_flat(texts: "list[str] | pd.Series", k: int, max_shingles: int = 0):
    """Shingle-hash sets for a batch of normalized documents, flat layout.

    Returns ``(flat, offsets, capped_mask)``: ``flat`` is the concatenation of
    per-doc sorted unique uint64 shingle hashes, ``offsets`` the (n_docs+1,)
    int64 segment boundaries (empty segment for empty/None docs), and
    ``capped_mask`` marks docs truncated by ``max_shingles``
    (smallest-by-rehash deterministic sampling, which preserves
    MinHash/Jaccard in expectation).

    Fully vectorized: one global window hash over the flat token-code stream
    (windows crossing doc boundaries are dropped by construction), one
    lexsort-based segmented unique, one rank-based segmented cap — no per-doc
    Python loop except for the rare ``0 < n_tokens < k`` short docs.
    """
    n_docs = len(texts)
    texts = ["" if t is None else t for t in texts]
    # one flat token stream for the whole batch, with per-doc offsets
    token_lists = [t.split() for t in texts]
    lens = np.fromiter((len(tl) for tl in token_lists), dtype=np.int64, count=n_docs)
    toff = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=toff[1:])
    if toff[-1] == 0:
        return np.empty(0, dtype=np.uint64), toff, np.zeros(n_docs, dtype=bool)

    flat_tok = np.concatenate([np.asarray(tl, dtype=object) for tl in token_lists if tl])
    codes_idx, uniques = pd.factorize(flat_tok)
    unique_hashes = hash_tokens(uniques)
    flat_codes = unique_hashes[codes_idx]
    return _shingles_from_codes(flat_codes, toff, k, max_shingles)


def batch_shingles_flat_arrow(texts, k: int, max_shingles: int = 0):
    """Arrow-native twin of :func:`batch_shingles_flat` over a
    ``pa.Array``/``ChunkedArray`` of *normalized* documents (single-space
    separated, stripped — the reassembly contract), bit-identical output.

    Tokenization is ``pc.split_pattern`` + ``dictionary_encode`` (C-level);
    the per-token Python hash loop runs only over the batch's *unique*
    tokens, exactly like the factorize path.  Null/empty docs yield empty
    segments (Arrow splits "" into one empty token — corrected here)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n_docs = len(texts)
    texts = pc.fill_null(texts, "")
    toks = pc.split_pattern(texts, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_tok = toks.flatten()
    voff = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=voff[1:])
    # "" splits to [""], not []: drop those tokens and zero the doc's length
    empty_doc = np.flatnonzero(
        pc.equal(texts, "").to_numpy(zero_copy_only=False) & (lens == 1)
    )
    if len(empty_doc):
        keep = np.ones(len(flat_tok), dtype=bool)
        keep[voff[empty_doc]] = False
        flat_tok = flat_tok.filter(pa.array(keep))
        lens[empty_doc] = 0
    toff = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(lens, out=toff[1:])
    if toff[-1] == 0:
        return np.empty(0, dtype=np.uint64), toff, np.zeros(n_docs, dtype=bool)
    enc = flat_tok.dictionary_encode()
    unique_hashes = hash_tokens(enc.dictionary.to_pylist())
    flat_codes = unique_hashes[enc.indices.to_numpy(zero_copy_only=False)]
    return _shingles_from_codes(flat_codes, toff, k, max_shingles)


def _shingles_from_codes(flat_codes: np.ndarray, toff: np.ndarray, k: int, max_shingles: int):
    """Shared core: flat token-hash stream + doc offsets → shingle sets."""
    n_docs = len(toff) - 1
    lens = np.diff(toff)
    capped = np.zeros(n_docs, dtype=bool)

    # full-length docs: slice their windows out of ONE global window-hash pass
    all_win = poly_window_hash(flat_codes, k)  # window at p covers codes[p:p+k)
    wc = np.where(lens >= k, lens - k + 1, 0)
    doc_ids = np.repeat(np.arange(n_docs, dtype=np.int64), wc)
    woff = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(wc, out=woff[1:])
    win_pos = (
        np.arange(woff[-1], dtype=np.int64)
        - np.repeat(woff[:-1], wc)
        + np.repeat(toff[:-1], wc)
    )
    hashes = all_win[win_pos]
    # short docs (0 < n_tokens < k): whole sequence hashed as one window
    short = np.flatnonzero((lens > 0) & (lens < k))
    if len(short):
        short_h = np.concatenate(
            [poly_window_hash(flat_codes[toff[d] : toff[d + 1]], k) for d in short]
        )
        doc_ids = np.concatenate([doc_ids, short])
        hashes = np.concatenate([hashes, short_h])

    # segmented unique: one stable sort by (doc, hash), then boundary diff
    order = np.lexsort((hashes, doc_ids))
    d_s = doc_ids[order]
    h_s = hashes[order]
    keep = np.empty(len(d_s), dtype=bool)
    if len(keep):
        keep[0] = True
        keep[1:] = (d_s[1:] != d_s[:-1]) | (h_s[1:] != h_s[:-1])
    d_u = d_s[keep]
    h_u = h_s[keep]

    counts = np.bincount(d_u, minlength=n_docs).astype(np.int64)
    if max_shingles:
        over = counts > max_shingles
        if over.any():
            # smallest-by-independent-rehash sampling: deterministic, unbiased
            order2 = np.lexsort((splitmix64(h_u), d_u))
            starts = np.zeros(n_docs + 1, dtype=np.int64)
            np.cumsum(counts, out=starts[1:])
            rank = np.arange(len(d_u), dtype=np.int64) - starts[d_u[order2]]
            sel = np.sort(order2[rank < max_shingles])  # restore (doc, hash) order
            d_u = d_u[sel]
            h_u = h_u[sel]
            capped = over
            counts = np.minimum(counts, max_shingles)

    offsets = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    return h_u, offsets, capped


def batch_shingles(texts: "list[str] | pd.Series", k: int, max_shingles: int = 0):
    """Per-doc-list wrapper over :func:`batch_shingles_flat` (tests/oracle)."""
    flat, offsets, capped = batch_shingles_flat(texts, k, max_shingles)
    sets = [flat[offsets[i] : offsets[i + 1]] for i in range(len(offsets) - 1)]
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
