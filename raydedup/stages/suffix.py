"""Exact long-repeat pass ("suffix-array substring" stage).

Per-doc winnowing fingerprints (see ``raydedup.functions.winnow``) are
exploded to ``(fp, conv_id)`` rows; a hash shuffle on ``fp`` then links
documents sharing any verbatim span longer than the detection threshold —
the verbatim repeats (pasted stack traces, quoted documents) that MinHash
dilutes.  Emitted edges are exact matches by construction (``est_sim=1.0``)
and skip Jaccard verification.
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
from raydedup.functions.winnow import span_fingerprints
from raydedup.ray_utils import keyed_blocks

_EMPTY = pd.DataFrame(
    {"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object)}
)


def make_fp_rows(cfg: DedupConfig):
    def fp_fn(batch: pa.Table) -> pa.Table:
        keep = np.asarray(pa.compute.equal(batch["status"], "ok"))
        batch = batch.filter(pa.array(keep))
        texts = batch["doc_text"].to_pylist()  # already normalized at reassembly
        conv = np.asarray(batch["conv_id"], dtype=object)
        fps, ids = [], []
        for i, t in enumerate(texts):
            f = span_fingerprints(
                t or "", cfg.suffix_window, cfg.suffix_fp_len, cfg.suffix_anchor_mod
            )
            if len(f):
                fps.append(f)
                ids.append(np.repeat(conv[i], len(f)))
        if not fps:
            return pa.table({"fp": pa.array([], pa.uint64()), "conv_id": pa.array([], pa.string())})
        return pa.table(
            {"fp": pa.array(np.concatenate(fps)), "conv_id": pa.array(np.concatenate(ids), pa.string())}
        )

    return fp_fn


def make_fp_emitter(cfg: DedupConfig):
    """Whole-block fn over hash-partitioned (fp, conv_id) rows → exact edges.

    Exact-equal spans are transitive, so star emission (cap path) preserves
    everything that matters: connectivity.
    """

    cap = cfg.bucket_pair_cap

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _EMPTY
        fp = df["fp"].to_numpy().astype(np.uint64)
        cv = df["conv_id"].to_numpy(dtype=object)
        order = np.lexsort((cv, fp))
        fp, cv = fp[order], cv[order]
        gid = group_ids_from_sorted(fp)
        keep = dedup_sorted_members(gid, cv)
        gid, cv = gid[keep], cv[keep]
        i, j, _ = emit_bucket_pairs(gid, cap)
        if len(i) == 0:
            return _EMPTY
        return pd.DataFrame({"a": cv[i], "b": cv[j]})

    return emit


def suffix_pairs(docs_ds, cfg: DedupConfig, prefilter: bool = False):
    """docs → exact long-repeat edges (a, b, est_sim=1.0, source='suffix').

    Edges may repeat across shared fingerprints (deduped once in the
    combined pairs stage — one shuffle for all edge sources instead of one
    per source); emission already dedups within each fingerprint bucket.

    ``prefilter=True`` drops (probable-)singleton fingerprints before the
    fp shuffle via the twice-Bloom pass (bit-identical edges; see
    ``raydedup.functions.dupbloom``).  Fingerprints are recomputed for the
    second pass rather than materialized — the fp compute is ~25% of the
    stage and the row stream never has to fit in the object store.
    """

    def make_rows():
        return docs_ds.map_batches(
            make_fp_rows(cfg), batch_format="pyarrow", zero_copy_batch=True
        )

    if prefilter and cfg.prefilter_bloom_bits:
        from raydedup.functions.dupbloom import prefilter_dup_keys

        fps = prefilter_dup_keys(make_rows, "fp", cfg.prefilter_bloom_bits)
    else:
        fps = make_rows()
    raw = keyed_blocks(fps, ["fp"], cfg.num_partitions).map_batches(
        make_fp_emitter(cfg), batch_size=None, batch_format="pandas"
    )
    return raw.map_batches(
        lambda t: pa.table(
            {
                "a": t["a"].combine_chunks().cast(pa.string()) if isinstance(t["a"], pa.ChunkedArray) else t["a"].cast(pa.string()),
                "b": t["b"].combine_chunks().cast(pa.string()) if isinstance(t["b"], pa.ChunkedArray) else t["b"].cast(pa.string()),
                "est_sim": pa.array(np.ones(t.num_rows)),
                "source": pa.array(np.repeat("suffix", t.num_rows), pa.string()),
            }
        ),
        batch_format="pyarrow",
    )
