"""SimHash near-dup edges — the Hamming-space analog of the reference's
cosine matcher (``face_recognition_custom.py:104-112``).

Candidate generation is exact, not probabilistic: the 64-bit fingerprint is
split into ``hamming_threshold + 1`` bit blocks; by pigeonhole, any pair
within the Hamming threshold agrees on at least one whole block, so a hash
shuffle on ``(block_idx, block_value)`` co-locates every such pair.  Block
rows carry the 8-byte fingerprint itself, so verification (exact popcount)
runs inside the same vectorized block pass — no join needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.functions.pairs import (
    dedup_sorted_members,
    emit_bucket_pairs,
    group_ids_from_sorted,
)
from raydedup.functions.simhash import hamming64
from raydedup.ray_utils import keyed_blocks

_EMPTY = pd.DataFrame(
    {
        "a": pd.Series([], dtype=object),
        "b": pd.Series([], dtype=object),
        "est_sim": pd.Series([], dtype=np.float64),
    }
)


def make_block_rows(cfg: DedupConfig):
    n_blocks = cfg.hamming_threshold + 1
    bounds = np.linspace(0, cfg.simhash_bits, n_blocks + 1).astype(np.uint64)

    def blocks_fn(batch: pa.Table) -> pa.Table:
        keep = np.asarray(batch["n_shingles"]) > 0
        batch = batch.filter(pa.array(keep))
        n = batch.num_rows
        sh = np.asarray(batch["simhash"], dtype=np.uint64)
        conv = np.asarray(batch["conv_id"], dtype=object)
        out_idx, out_val, out_conv, out_sh = [], [], [], []
        for j in range(n_blocks):
            lo, hi = bounds[j], bounds[j + 1]
            width = np.uint64(hi - lo)
            mask = (np.uint64(1) << width) - np.uint64(1) if width < 64 else np.uint64(0xFFFFFFFFFFFFFFFF)
            val = (sh >> np.uint64(lo)) & mask
            out_idx.append(np.full(n, j, dtype=np.int32))
            out_val.append(val)
            out_conv.append(conv)
            out_sh.append(sh)
        return pa.table(
            {
                "block_idx": pa.array(np.concatenate(out_idx) if n else np.empty(0, np.int32)),
                "block_val": pa.array(np.concatenate(out_val) if n else np.empty(0, np.uint64)),
                "conv_id": pa.array(np.concatenate(out_conv) if n else [], pa.string()),
                "simhash": pa.array(np.concatenate(out_sh) if n else np.empty(0, np.uint64)),
            }
        )

    return blocks_fn


def make_block_emitter(cfg: DedupConfig):
    """Whole-block fn over hash-partitioned block rows → Hamming-verified pairs."""

    cap = cfg.bucket_pair_cap
    thr = cfg.hamming_threshold

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _EMPTY
        bi = df["block_idx"].to_numpy()
        bv = df["block_val"].to_numpy()
        cv = df["conv_id"].to_numpy(dtype=object)
        fp = df["simhash"].to_numpy().astype(np.uint64)
        order = np.lexsort((cv, bv, bi))
        bi, bv, cv, fp = bi[order], bv[order], cv[order], fp[order]
        gid = group_ids_from_sorted(bi, bv)
        keep = dedup_sorted_members(gid, cv)
        gid, cv, fp = gid[keep], cv[keep], fp[keep]
        i, j, _capped = emit_bucket_pairs(gid, cap)
        if len(i) == 0:
            return _EMPTY
        d = hamming64(fp[i], fp[j])
        ok = d <= thr
        if not ok.any():
            return _EMPTY
        return pd.DataFrame(
            {"a": cv[i[ok]], "b": cv[j[ok]], "est_sim": 1.0 - d[ok] / 64.0}
        )

    return emit


def simhash_pairs(sigs_ds, cfg: DedupConfig):
    """signatures → verified SimHash edges (a, b, est_sim, source='simhash').

    Edges may repeat across the ``hamming_threshold + 1`` pigeonhole
    blocks (deduped once in the combined pairs stage)."""
    blocks = sigs_ds.select_columns(["conv_id", "simhash", "n_shingles"]).map_batches(
        make_block_rows(cfg), batch_format="pyarrow", zero_copy_batch=True
    )
    raw = keyed_blocks(blocks, ["block_idx", "block_val"], cfg.num_partitions).map_batches(
        make_block_emitter(cfg), batch_size=None, batch_format="pandas"
    )
    return raw.map_batches(
        lambda t: t.append_column("source", pa.array(np.repeat("simhash", t.num_rows), pa.string())),
        batch_format="pyarrow",
    )
