"""Signature stage: docs → (MinHash, SimHash, shingle set) per conversation.

The stateful actor-pool analog of the reference's implicitly-loaded
embedding model (``face_recognition`` loads dlib once per process —
T1 in SURVEY.md §2.3): ``SignatureActor.__init__`` builds the seeded
MinHash permutation table once per actor; ``__call__`` is a pure
vectorized function of the batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.functions.minhash import MinHasher
from raydedup.functions.shingle import batch_shingles_flat_arrow
from raydedup.functions.simhash import simhash64_segments


_MINHASHER_CACHE: dict = {}


def _cached_minhasher(num_perm: int, seed: int) -> MinHasher:
    """Per-worker-process MinHasher cache: tasks get once-per-process
    permutation tables (the actor-pool benefit without actor spin-up)."""
    key = (num_perm, seed)
    mh = _MINHASHER_CACHE.get(key)
    if mh is None:
        mh = _MINHASHER_CACHE[key] = MinHasher(num_perm, seed)
    return mh


class SignatureActor:
    def __init__(self, cfg: DedupConfig, shingle_mask: np.ndarray | None = None):
        self.cfg = cfg
        self.mh = _cached_minhasher(cfg.num_perm, cfg.seed)
        # sorted uint64 hashes to drop before signing (boilerplate turns;
        # stages/boilerplate.py) — tiny, ships once in the task closure
        self.shingle_mask = (
            shingle_mask if shingle_mask is not None and len(shingle_mask) else None
        )

    def _apply_mask(self, flat: np.ndarray, offsets: np.ndarray) -> tuple:
        """Drop masked hashes from the flat shingle stream, recomputing the
        per-doc offsets — vectorized searchsorted against the sorted mask."""
        mask = self.shingle_mask
        idx = np.searchsorted(mask, flat)
        # out-of-range probes (flat > every mask value) re-point to slot 0:
        # they can never equal mask[0], which is strictly smaller
        idx[idx == len(mask)] = 0
        keep = mask[idx] != flat
        cum = np.concatenate(([0], np.cumsum(keep, dtype=offsets.dtype)))
        return flat[keep], cum[offsets]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cfg = self.cfg
        n = batch.num_rows
        ok = pc.equal(batch["status"], "ok")
        # quarantined docs contribute no shingles; text stays Arrow all the
        # way into the C-level tokenizer (no to_pylist round-trip)
        texts = pc.if_else(ok, batch["doc_text"], pa.scalar("", pa.string()))
        flat, offsets, capped = batch_shingles_flat_arrow(
            texts, cfg.shingle_k, cfg.max_shingles_per_doc
        )
        if self.shingle_mask is not None:
            flat, offsets = self._apply_mask(flat, offsets)
        n_shingles = np.diff(offsets)
        sigs = self.mh.signature_segments(flat, offsets)
        simhashes = simhash64_segments(flat, offsets)
        out_status = pc.if_else(
            pc.and_(ok, pa.array(n_shingles == 0)),
            pa.scalar("no_content", pa.string()),
            batch["status"],
        )

        mh_col = pa.FixedSizeListArray.from_arrays(pa.array(sigs.reshape(-1)), cfg.num_perm)
        if cfg.store_shingles:
            shingle_col = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int32()), pa.array(flat)
            )
        else:  # estimate-mode verification never reads the sets
            shingle_col = pa.ListArray.from_arrays(
                pa.array(np.zeros(n + 1), type=pa.int32()),
                pa.array(np.empty(0, dtype=np.uint64)),
            )
        return pa.table(
            {
                "conv_id": batch["conv_id"],
                "minhash": mh_col,
                "simhash": pa.array(simhashes),
                "n_shingles": pa.array(n_shingles),
                "shingles": shingle_col,
                "capped": pa.array(capped),
                "status": out_status,
            }
        )


def compute_signatures(docs_ds, cfg: DedupConfig, use_actors: bool = False,
                       shingle_mask: np.ndarray | None = None):
    """``Dataset[DOCS] → Dataset[SIGNATURES]``.

    Default: stateless tasks with a per-worker-process permutation-table
    cache (no pool spin-up latency).  ``use_actors=True`` switches to an
    explicit actor pool — the right choice when per-worker state is big
    enough that construction must be strictly bounded (e.g. very large
    ``num_perm``, model weights).  ``shingle_mask`` (sorted uint64) drops
    boilerplate shingles before signing (``stages/boilerplate.py``)."""
    if use_actors:
        return docs_ds.map_batches(
            SignatureActor,
            fn_constructor_args=(cfg, shingle_mask),
            batch_format="pyarrow",
            batch_size=cfg.sig_batch_size,
            concurrency=cfg.sig_concurrency,
            num_cpus=1,
            zero_copy_batch=True,
        )
    return docs_ds.map_batches(
        SignatureActor(cfg, shingle_mask),
        batch_format="pyarrow",
        batch_size=cfg.sig_batch_size,
        zero_copy_batch=True,
    )
