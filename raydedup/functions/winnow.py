"""Exact long-repeat fingerprints (the "suffix-array substring pass").

Winnowing-style content-defined anchoring: a rolling polynomial hash over
``window``-byte windows selects anchor positions (hash % anchor_mod == 0);
at each anchor the following ``fp_len`` bytes are fingerprinted.  Two
documents sharing a verbatim span of length >= window + fp_len + a few
anchor gaps share at least one fingerprint w.h.p. (expected anchor gap =
``anchor_mod`` bytes), while spans <= window + fp_len can never produce a
shared fingerprint — which keeps 200-400 char boilerplate system prompts
from generating exact-repeat edges (FIXTURES.md precision guard).

This catches long verbatim repeats (pasted stack traces, quoted documents)
that MinHash dilutes — the role the north rule assigns to the suffix-array
pass; a per-doc suffix automaton would find the same spans at higher cost.
"""

from __future__ import annotations

import zlib

import numpy as np

from raydedup.functions.hashing import splitmix64

_B = np.uint64(0x100000001B3)


def span_fingerprints(
    text: str, window: int = 64, fp_len: int = 448, anchor_mod: int = 8
) -> np.ndarray:
    """Unique uint64 fingerprints of anchored ``fp_len``-byte spans."""
    data = text.encode("utf-8")
    n = len(data)
    if n < window + fp_len:
        return np.empty(0, dtype=np.uint64)
    buf = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(buf, window)
    powers = _B ** np.arange(window - 1, -1, -1, dtype=np.uint64)
    wh = splitmix64((win * powers[None, :]).sum(axis=1, dtype=np.uint64))
    # anchors whose fingerprint span fits in the document
    anchors = np.nonzero((wh % np.uint64(anchor_mod)) == 0)[0]
    anchors = anchors[anchors + window + fp_len <= n]
    if len(anchors) == 0:
        return np.empty(0, dtype=np.uint64)
    fps = np.fromiter(
        (
            zlib.crc32(data[i + window : i + window + fp_len])
            ^ (zlib.crc32(data[i + window : i + window + fp_len : 2]) << 32)
            for i in anchors
        ),
        dtype=np.uint64,
        count=len(anchors),
    )
    return np.unique(splitmix64(fps))
