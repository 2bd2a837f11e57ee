"""Distributed "key seen ≥2 times" Bloom prefilter for pair-emitting shuffles.

A key (LSH band bucket, winnow fingerprint) that occurs in only ONE document
can never produce a candidate pair, yet in a mostly-unique corpus singleton
keys dominate the pair-emitting shuffles (the widest data movement in the
flagship).  This module counts key occurrences approximately in one narrow
pass: each block folds its key multiset into a fixed-size packed
(once, twice) bitmap pair, the partials merge associatively
(``twice |= once_a & once_b``), and the final ``twice`` bitmap broadcasts via
``ray.put`` so the shuffle ships only keys that (probably) occur twice.

Bloom false positives only let extra singleton keys through — they emit no
pairs, exactly as before; false negatives are structurally impossible
(inserted keys always set their bits), so downstream pairs are bit-identical
with and without the prefilter.  Driver/broadcast state is fixed at
``m_bits/8`` bytes regardless of key count.
"""

from __future__ import annotations

import numpy as np

from raydedup.functions.hashing import splitmix64

# two independent bloom hash seeds (k=2): at the flagship's 12M-turn scale
# (~45M inserted keys into the default 2^28 bits) the false-positive rate is
# ~8% — singleton leakage, not correctness
_SEEDS = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F))


def _positions(keys: np.ndarray, m_bits: int, seed: np.uint64) -> np.ndarray:
    return (splitmix64(keys ^ seed) % np.uint64(m_bits)).astype(np.int64)


def twice_partial(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """One block's packed (once | twice) partial over its raw key stream.

    ``keys``: uint64 key occurrences (repeats allowed — each row one
    occurrence).  Returns a packed uint8 array of length ``2 * m_bits / 8``:
    first the bitmap of keys seen ≥1 time in this block, then ≥2 times.
    """
    keys = np.asarray(keys, dtype=np.uint64)
    uniq, counts = np.unique(keys, return_counts=True)
    once = np.zeros(m_bits, dtype=bool)
    twice = np.zeros(m_bits, dtype=bool)
    dup = uniq[counts >= 2]
    for s in _SEEDS:
        once[_positions(uniq, m_bits, s)] = True
        if len(dup):
            twice[_positions(dup, m_bits, s)] = True
    return np.concatenate([np.packbits(once), np.packbits(twice)])


def _fold_pair(partials, m_bits: int):
    half = m_bits // 8
    acc_once = np.zeros(half, dtype=np.uint8)
    acc_twice = np.zeros(half, dtype=np.uint8)
    for p in partials:
        p = np.frombuffer(p, dtype=np.uint8) if isinstance(p, (bytes, bytearray)) else p
        acc_twice |= acc_once & p[:half]
        acc_twice |= p[half:]
        acc_once |= p[:half]
    return acc_once, acc_twice


def fold_partials(partials, m_bits: int) -> np.ndarray:
    """Associative merge of packed partials → packed ``twice`` bitmap.

    A key once in block A and once in block B enters ``twice`` via
    ``acc_once & part_once``; the fold is order-free, so hierarchical
    (tree) merging gives the same result as this sequential one.
    """
    return _fold_pair(partials, m_bits)[1]


def fold_partials_packed(partials, m_bits: int) -> np.ndarray:
    """Like ``fold_partials`` but returns the full packed (once|twice)
    accumulator, so the result is itself a valid partial for further
    (tree) folding — the ``once`` half must be carried across fold levels
    or a key occurring once in each of two subtrees would be missed."""
    return np.concatenate(_fold_pair(partials, m_bits))


def probe_packed(keys: np.ndarray, packed_twice: np.ndarray, m_bits: int) -> np.ndarray:
    """Membership mask: True where the key is (probably) a ≥2-occurrence key.

    Never False for a genuinely repeated key (no false negatives)."""
    keys = np.asarray(keys, dtype=np.uint64)
    hit = np.ones(len(keys), dtype=bool)
    for s in _SEEDS:
        idx = _positions(keys, m_bits, s)
        # packbits is MSB-first: bit p lives in byte p>>3 at offset 7-(p&7)
        hit &= ((packed_twice[idx >> 3] >> (7 - (idx & 7))) & 1).astype(bool)
    return hit


def prefilter_dup_keys(
    make_rows, key: str, m_bits: int, partial_rows: int = 4_000_000, fold_width: int = 16
):
    """Dataset-level wrapper: keep only rows whose ``key`` occurs ≥2 times.

    ``make_rows() -> Dataset`` is called twice — once for the narrow bloom
    build (no shuffle; one ``2*m_bits/8``-byte partial per ~``partial_rows``
    rows), once for the filtered pass that feeds the real shuffle.
    Recomputing beats materializing: upstream is a checkpoint read or an
    already-materialized dataset, and the row stream never has to fit in
    the object store.

    Partials merge in a distributed tree (``fold_width``-ary ``map_batches``
    levels) so driver traffic is bounded at ``fold_width`` packed bitmaps no
    matter the input size — at 100-TB scale the partial count grows linearly
    with rows and a flat ``take_all`` would ship tens of GB to the driver.
    The (once, twice) fold is exactly associative+commutative
    (twice = ∪ᵢtᵢ ∪ ⋃_{i<j}(oᵢ&oⱼ) regardless of grouping; see
    ``test_dupbloom_no_false_negatives_and_fold_associative``), so the tree
    result is bit-identical to a flat sequential fold.
    """
    import pyarrow as pa
    import ray

    def partial_fn(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key].to_numpy(zero_copy_only=False), dtype=np.uint64)
        return pa.table({"part": pa.array([twice_partial(k, m_bits).tobytes()], pa.binary())})

    def fold_fn(batch: pa.Table) -> pa.Table:
        packed = fold_partials_packed((v.as_py() for v in batch["part"]), m_bits)
        return pa.table({"part": pa.array([packed.tobytes()], pa.binary())})

    parts_ds = (
        make_rows()
        .select_columns([key])
        .map_batches(partial_fn, batch_format="pyarrow", batch_size=partial_rows)
        .materialize()
    )
    while parts_ds.count() > fold_width:
        parts_ds = parts_ds.map_batches(
            fold_fn, batch_format="pyarrow", batch_size=fold_width
        ).materialize()
    parts = parts_ds.take_all()
    packed_ref = ray.put(fold_partials((r["part"] for r in parts), m_bits))

    def probe_fn(batch: pa.Table) -> pa.Table:
        packed = ray.get(packed_ref)
        k = np.asarray(batch[key].to_numpy(zero_copy_only=False), dtype=np.uint64)
        return batch.filter(pa.array(probe_packed(k, packed, m_bits)))

    return make_rows().map_batches(probe_fn, batch_format="pyarrow")
