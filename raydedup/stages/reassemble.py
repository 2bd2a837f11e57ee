"""Turns → conversation documents (the analog of image decoding,
``duplicate_face.py:43``: the conversation *is* our record; its turns are
the pixels).

Shuffle 1 of the pipeline: hash-repartition by ``conv_id`` (all turns of a
conversation in one block), then a single vectorized ``map_batches`` pass
reassembles every conversation in the block — no per-group tasks.

Statuses mirror the reference's branches: dense-index + non-null turns →
``ok``; null text or non-dense ``turn_idx`` → ``corrupted`` (quarantine,
``duplicate_face.py:84-89``); empty normalized text → ``no_content`` (the
no-face branch, ``duplicate_face.py:46-52``).  Rows are never dropped and
batch functions never raise.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from raydedup.ray_utils import keyed_blocks

SEP = "\n"  # turn separator inside a reassembled document


def assemble_group(turn_idx: np.ndarray, texts: list) -> tuple:
    """Scalar core shared with the oracle/tests: (doc_text, status).

    ``doc_text`` is *normalized* (lowercase, collapsed whitespace — the
    analog of the reference's BGR→RGB normalization before feature
    extraction, ``face_recognition_custom.py:79``); downstream stages
    consume it as-is, so the normalization pass runs exactly once."""
    from raydedup.functions.textnorm import normalize_text

    order = np.argsort(turn_idx, kind="stable")
    idx = np.asarray(turn_idx)[order]
    n = len(idx)
    if any(t is None for t in texts) or not np.array_equal(idx, np.arange(n, dtype=idx.dtype)):
        return "", "corrupted"
    doc = normalize_text(SEP.join(texts[i] for i in order))
    if doc == "":
        return doc, "no_content"
    return doc, "ok"


def _assemble_block(t) -> "pa.Table":
    """Vectorized twin of :func:`assemble_group` over a whole block.

    Arrow end-to-end: C-level sort by (conv_id, turn_idx), group detection
    by neighbor equality, and per-group turn concatenation via
    ``binary_join`` over a ListArray built from the group offsets — no
    object-dtype pandas sort, no per-group Python join loop."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from raydedup.functions.textnorm import normalize_array

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "doc_text": pa.array([], pa.string()),
            "n_turns": pa.array([], pa.int32()),
            "status": pa.array([], pa.string()),
        }
    )
    if t.num_rows == 0:
        return empty
    idx = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    t = t.take(idx).combine_chunks()
    n = t.num_rows
    conv = t["conv_id"]
    is_start = np.ones(n, dtype=bool)
    if n > 1:
        is_start[1:] = ~pc.equal(conv.slice(1), conv.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    start_vals = np.flatnonzero(is_start)
    sizes = np.diff(np.append(start_vals, n))
    pos = np.arange(n, dtype=np.int64) - np.repeat(start_vals, sizes)

    turn_idx = t["turn_idx"].to_numpy(zero_copy_only=False)
    isnull = pc.is_null(t["text"]).to_numpy(zero_copy_only=False)
    non_dense = turn_idx != pos
    grp_bad = np.add.reduceat(non_dense | isnull, start_vals) > 0

    texts = pc.fill_null(t["text"], "").combine_chunks()
    offsets = pa.array(np.append(start_vals, n).astype(np.int32), pa.int32())
    docs = pc.binary_join(pa.ListArray.from_arrays(offsets, texts), SEP)
    docs = normalize_array(docs)
    empty_doc = pc.equal(docs, "").to_numpy(zero_copy_only=False)
    status = np.where(grp_bad, "corrupted", np.where(empty_doc, "no_content", "ok"))
    # corrupted docs carry no payload (quarantined)
    docs = pc.if_else(pa.array(grp_bad), pa.scalar("", pa.string()), docs)
    return pa.table(
        {
            "conv_id": conv.take(pa.array(start_vals)),
            "doc_text": docs,
            "n_turns": pa.array(sizes.astype(np.int32)),
            "status": pa.array(status),
        }
    )


def reassemble(turns_ds, num_partitions: int = 32, min_doc_chars: int = 1):
    """``Dataset[TRANSCRIPTS] → Dataset[DOCS]``.

    ``min_doc_chars`` is the quality gate analog of the reference's blur
    filter (``face_recognition_custom.py:73-77``): normalized docs shorter
    than it are flagged ``no_content`` instead of silently dropped."""
    slim = turns_ds.select_columns(["conv_id", "turn_idx", "text"])
    docs = keyed_blocks(slim, ["conv_id"], num_partitions).map_batches(
        _assemble_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )
    if min_doc_chars > 1:

        def gate(df: pd.DataFrame) -> pd.DataFrame:
            short = (df["status"] == "ok") & (df["doc_text"].str.len() < min_doc_chars)
            df.loc[short, "status"] = "no_content"
            return df

        docs = docs.map_batches(gate, batch_format="pandas")
    return docs
