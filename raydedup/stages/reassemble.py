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


def _assemble_block(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized twin of :func:`assemble_group` over a whole block."""
    empty = pd.DataFrame(
        {
            "conv_id": pd.Series([], dtype=object),
            "doc_text": pd.Series([], dtype=object),
            "n_turns": pd.Series([], dtype=np.int32),
            "status": pd.Series([], dtype=object),
        }
    )
    if len(df) == 0:
        return empty
    df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    conv = df["conv_id"].to_numpy(dtype=object)
    idx = df["turn_idx"].to_numpy()
    isnull = df["text"].isna().to_numpy()

    is_start = np.ones(len(conv), dtype=bool)
    is_start[1:] = conv[1:] != conv[:-1]
    start_vals = np.flatnonzero(is_start)
    sizes = np.diff(np.append(start_vals, len(conv)))
    pos = np.arange(len(conv), dtype=np.int64) - np.repeat(start_vals, sizes)

    non_dense = idx != pos
    grp_bad = np.add.reduceat(non_dense | isnull, start_vals) > 0

    texts = df["text"].fillna("").to_numpy(dtype=object)
    docs = np.empty(len(start_vals), dtype=object)
    bounds = np.append(start_vals, len(conv))
    for g in range(len(start_vals)):  # in-process join; C-speed-dominated
        docs[g] = SEP.join(texts[bounds[g] : bounds[g + 1]])

    import pyarrow as pa

    from raydedup.functions.textnorm import normalize_array

    docs = np.asarray(
        normalize_array(pa.array(docs.tolist(), pa.string())).to_pylist(), dtype=object
    )
    empty_doc = np.fromiter((d == "" for d in docs), dtype=bool, count=len(docs))
    status = np.where(grp_bad, "corrupted", np.where(empty_doc, "no_content", "ok"))
    docs[grp_bad] = ""  # corrupted docs carry no payload (quarantined)
    return pd.DataFrame(
        {
            "conv_id": conv[start_vals],
            "doc_text": docs,
            "n_turns": sizes.astype(np.int32),
            "status": status,
        }
    )


def reassemble(turns_ds, num_partitions: int = 32, min_doc_chars: int = 1):
    """``Dataset[TRANSCRIPTS] → Dataset[DOCS]``.

    ``min_doc_chars`` is the quality gate analog of the reference's blur
    filter (``face_recognition_custom.py:73-77``): normalized docs shorter
    than it are flagged ``no_content`` instead of silently dropped."""
    slim = turns_ds.select_columns(["conv_id", "turn_idx", "text"])
    docs = keyed_blocks(slim, ["conv_id"], num_partitions).map_batches(
        _assemble_block, batch_size=None, batch_format="pandas"
    )
    if min_doc_chars > 1:

        def gate(df: pd.DataFrame) -> pd.DataFrame:
            short = (df["status"] == "ok") & (df["doc_text"].str.len() < min_doc_chars)
            df.loc[short, "status"] = "no_content"
            return df

        docs = docs.map_batches(gate, batch_format="pandas")
    return docs
