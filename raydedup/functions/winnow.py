"""Exact long-repeat fingerprints (the "suffix-array substring pass").

Winnowing-style content-defined anchoring: a rolling polynomial hash over
``window``-byte windows selects anchor positions (hash % anchor_mod == 0);
at each anchor the following ``fp_len`` bytes are fingerprinted.  Two
documents sharing a verbatim span of length >= window + fp_len + a few
anchor gaps share at least one fingerprint w.h.p. (expected anchor gap =
``anchor_mod`` bytes), while spans <= window + fp_len can never produce a
shared fingerprint — which keeps 200-400 char boilerplate system prompts
from generating exact-repeat edges (FIXTURES.md precision guard).

Implementation: O(n) per document.  With an odd base B (invertible mod
2^64), every window's polynomial hash is a difference of two prefix sums
scaled by a power of B — three vectorized passes over the byte buffer,
no per-window matrix product, no per-anchor checksum loop.

This catches long verbatim repeats (pasted stack traces, quoted documents)
that MinHash dilutes — the role the north rule assigns to the suffix-array
pass; a per-doc suffix automaton would find the same spans at higher cost.
"""

from __future__ import annotations

import numpy as np

from raydedup.functions.hashing import splitmix64

_B = np.uint64(0x100000001B3)  # odd → invertible mod 2^64


def _inv_u64(b: np.uint64) -> np.uint64:
    """Modular inverse of an odd uint64 via Newton iteration."""
    x = b  # 3 bits correct
    for _ in range(5):
        x = x * (np.uint64(2) - b * x)
    return x


_BINV = _inv_u64(_B)


def _window_hashes(buf: np.ndarray, w: int, starts: np.ndarray | None = None) -> np.ndarray:
    """Polynomial hash of every length-``w`` window of ``buf`` (uint64),
    H[i] = sum_t buf[i+t] * B^(w-1-t)  (mod 2^64), computed O(n) via
    prefix sums of buf[j] * B^(-j).  If ``starts`` is given, only those
    window positions are returned."""
    n = len(buf)
    exps = np.empty(n + 1, dtype=np.uint64)
    exps[0] = np.uint64(1)
    np.cumprod(np.full(n, _BINV, dtype=np.uint64), out=exps[1:])  # B^-j
    S = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(buf * exps[:n], out=S[1:])  # S[k] = sum_{j<k} buf[j] * B^-j
    pos = np.arange(n - w + 1, dtype=np.int64) if starts is None else starts
    # B^(w-1+i) = B^(w-1) * (B^i) ; B^i = inverse of exps[i]... compute directly
    bpow = np.empty(n + 1, dtype=np.uint64)
    bpow[0] = np.uint64(1)
    np.cumprod(np.full(n, _B, dtype=np.uint64), out=bpow[1:])  # B^j
    scale = bpow[pos + (w - 1)]
    return (S[pos + w] - S[pos]) * scale


def span_fingerprints(
    text: str, window: int = 64, fp_len: int = 320, anchor_mod: int = 64
) -> np.ndarray:
    """Unique uint64 fingerprints of anchored ``fp_len``-byte spans."""
    data = text.encode("utf-8")
    n = len(data)
    if n < window + fp_len:
        return np.empty(0, dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    wh = splitmix64(_window_hashes(buf, window))
    anchors = np.nonzero((wh % np.uint64(anchor_mod)) == 0)[0]
    anchors = anchors[anchors + window + fp_len <= n]
    if len(anchors) == 0:
        return np.empty(0, dtype=np.uint64)
    fps = _window_hashes(buf, fp_len, starts=anchors + window)
    return np.unique(splitmix64(fps))


def utf8_flat_bytes(arr):
    """Zero-copy (uint8 data, int64 offsets) view of an Arrow string array.

    Reads the utf-8 value buffer directly — no per-row Python string
    round-trip.  Null entries become empty segments; handles string and
    large_string, chunked input, and sliced arrays."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pa.compute.fill_null(arr, "")
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    off = np.frombuffer(arr.buffers()[1], dtype=odt)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    dbuf = arr.buffers()[2]
    if dbuf is None:
        return np.empty(0, dtype=np.uint8), off - off[0]
    data = np.frombuffer(dbuf, dtype=np.uint8)[off[0] : off[-1]]
    return data, off - off[0]


def span_fingerprints_flat(
    flat: np.ndarray,
    offsets: np.ndarray,
    window: int = 64,
    fp_len: int = 320,
    anchor_mod: int = 64,
):
    """Segmented twin of :func:`span_fingerprints` over a whole batch.

    ``flat`` is the concatenated utf-8 byte stream of all documents (uint8),
    ``offsets`` the (n_docs+1,) int64 segment boundaries.  Returns
    ``(doc_idx, fps)``: per-doc sorted unique fingerprints with their
    document indices, bit-identical to calling ``span_fingerprints`` per
    document — the window hash (S[p+w]−S[p])·B^(p+w−1) telescopes so the
    document's position in the flat buffer cancels out of every hash, and
    windows never cross a document boundary because each document's window
    starts stop ``window`` bytes before its segment end.  One set of prefix
    arrays per batch replaces three cumulative passes per document.
    """
    n_docs = len(offsets) - 1
    n = int(offsets[-1])
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64))
    if n == 0 or n_docs == 0:
        return empty
    w = int(window)
    lens = offsets[1:] - offsets[:-1]
    wc = np.where(lens >= w + fp_len, lens - w + 1, 0)
    tot = int(wc.sum())
    if tot == 0:
        return empty
    buf = flat.astype(np.uint64)
    exps = np.empty(n + 1, dtype=np.uint64)
    exps[0] = np.uint64(1)
    np.cumprod(np.full(n, _BINV, dtype=np.uint64), out=exps[1:])
    S = np.zeros(n + 1, dtype=np.uint64)
    np.cumsum(buf * exps[:n], out=S[1:])
    bpow = np.empty(n + 1, dtype=np.uint64)
    bpow[0] = np.uint64(1)
    np.cumprod(np.full(n, _B, dtype=np.uint64), out=bpow[1:])

    woff = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(wc, out=woff[1:])
    pos = (
        np.arange(tot, dtype=np.int64)
        - np.repeat(woff[:-1], wc)
        + np.repeat(offsets[:-1], wc)
    )
    wh = splitmix64((S[pos + w] - S[pos]) * bpow[pos + w - 1])
    doc_end = np.repeat(offsets[1:], wc)
    keep = ((wh % np.uint64(anchor_mod)) == 0) & (pos + w + fp_len <= doc_end)
    if not keep.any():
        return empty
    apos = pos[keep] + w
    fps = splitmix64((S[apos + fp_len] - S[apos]) * bpow[apos + fp_len - 1])
    d = np.repeat(np.arange(n_docs, dtype=np.int64), wc)[keep]
    # segmented unique: (doc, fp) sort, drop consecutive duplicates
    order = np.lexsort((fps, d))
    d_s, f_s = d[order], fps[order]
    uniq = np.empty(len(d_s), dtype=bool)
    uniq[0] = True
    uniq[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
    return d_s[uniq], f_s[uniq]
