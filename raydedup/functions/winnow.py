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
