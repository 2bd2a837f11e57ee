"""Vectorized within-block pair emission over hash-partitioned buckets.

This is the distributed replacement for the reference's linear-scan match
loop (``duplicate_face.py:57-82``): records that share an LSH band / SimHash
block / long-repeat fingerprint land in the same bucket, and every bucket
emits candidate edges.  The kernels here are pure numpy over a block whose
rows are already hash-partitioned (all rows of a bucket in one block) and
sorted by the bucket key — no per-group Python tasks, no per-group pandas
frames.

Emission policy per bucket of n members (SURVEY.md §4 skew row):
  * n <= cap           → full clique, n*(n-1)/2 edges
  * n  > cap           → chain + star (2n-3 edges) — preserves bucket
                         connectivity at O(n) cost; rows flagged ``capped``
                         so caps are never silent.
"""

from __future__ import annotations

import numpy as np


def group_ids_from_sorted(*key_cols: np.ndarray) -> np.ndarray:
    """0-based dense group ids for rows sorted by the given key columns."""
    n = len(key_cols[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    for col in key_cols:
        change[1:] |= col[1:] != col[:-1]
    return np.cumsum(change).astype(np.int64)


def emit_bucket_pairs(gid: np.ndarray, cap: int):
    """All-pairs (or capped chain+star) index emission per group.

    ``gid``: dense sorted group ids, one row per *unique* bucket member
    (callers drop duplicate members first).  Returns ``(i_idx, j_idx,
    capped)`` — row indices into the caller's member arrays with
    ``i_idx < j_idx`` positions inside each group, and a bool mask marking
    edges from capped (over-``cap``) buckets.
    """
    n = len(gid)
    if n == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, bool))
    starts = np.zeros(n, dtype=np.int64)
    is_start = np.ones(n, dtype=bool)
    is_start[1:] = gid[1:] != gid[:-1]
    start_vals = np.flatnonzero(is_start)
    starts = start_vals[np.cumsum(is_start) - 1]          # start row of my group
    pos = np.arange(n, dtype=np.int64) - starts           # position within group
    sizes = np.zeros(n, dtype=np.int64)
    grp_sizes = np.diff(np.append(start_vals, n))
    sizes = np.repeat(grp_sizes, grp_sizes)               # group size per row

    small = sizes <= cap

    # --- clique path: for every small-group row j with pos>0, pair with all i<j
    cj = np.flatnonzero(small & (pos > 0))
    reps = pos[cj]
    j_small = np.repeat(cj, reps)
    offs = np.arange(reps.sum(), dtype=np.int64) - np.repeat(np.cumsum(reps) - reps, reps)
    i_small = np.repeat(starts[cj], reps) + offs

    # --- capped path: chain (row j pairs with j-1) + star (start pairs with j)
    bj = np.flatnonzero(~small & (pos > 0))
    chain_i, chain_j = bj - 1, bj
    star_mask = pos[bj] > 1                               # star edge start→j (j-1 already via chain for pos==1)
    star_i, star_j = starts[bj[star_mask]], bj[star_mask]
    i_big = np.concatenate([chain_i, star_i])
    j_big = np.concatenate([chain_j, star_j])

    i_idx = np.concatenate([i_small, i_big])
    j_idx = np.concatenate([j_small, j_big])
    capped = np.concatenate([np.zeros(len(i_small), bool), np.ones(len(i_big), bool)])
    return i_idx, j_idx, capped


def dedup_sorted_members(gid: np.ndarray, member: np.ndarray):
    """Keep one row per (group, member); inputs sorted by (gid, member).

    Returns the boolean keep-mask.
    """
    n = len(gid)
    if n == 0:
        return np.empty(0, dtype=bool)
    keep = np.ones(n, dtype=bool)
    keep[1:] = (gid[1:] != gid[:-1]) | (member[1:] != member[:-1])
    return keep
