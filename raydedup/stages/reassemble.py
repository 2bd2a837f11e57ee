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

from raydedup.ray_utils import clean_blocks, keyed_blocks

SEP = "\n"  # turn separator inside a reassembled document

# Map-side-combine payload compression (see _partial_block).  zstd-1:
# ~500 MB/s encode, 2-4x on repetitive transcript text — the shuffle is
# byte-bound (object-store copies, network at multi-node, spill I/O), the
# map side is not.
_PARTIAL_CODEC = "zstd"
_PARTIAL_LEVEL = 1



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


def _partial_schema():
    import pyarrow as pa

    return pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.list_(pa.int64())),
            ("lens", pa.list_(pa.int32())),
            ("nulls", pa.list_(pa.bool_())),
            ("payload", pa.binary()),
        ]
    )


def _string_offsets(arr) -> np.ndarray:
    """Byte offsets of a (large_)string/binary Array into its data buffer,
    honoring a possible slice offset."""
    import pyarrow as pa

    width = np.int64 if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type) else np.int32
    offs = np.frombuffer(arr.buffers()[1], dtype=width)
    return offs[arr.offset : arr.offset + len(arr) + 1]


def _partial_block(t) -> "pa.Table":
    """Map-side combine for the reassembly shuffle (shuffle 1): one row per
    conversation *per input block*, carrying that block's turns as a
    zstd-compressed concatenated byte payload plus per-turn lengths, turn
    indices and a null mask.

    This is the combiner that makes the engine's only raw-text shuffle
    byte-bound on *compressed* bytes: per-turn row overhead (conv_id
    repeated per turn, row framing) disappears and the text payload —
    highly repetitive transcript prose — shrinks 2-4x under zstd-1 before
    it enters the object store / network.  Fuses with the upstream read
    (plain map), so uncompressed text never crosses a stage boundary.
    ``_assemble_partials_block`` on the reduce side decompresses and
    re-derives the exact turn-level rows, then runs the unchanged
    ``_assemble_block`` kernel — output is bit-identical to the uncombined
    path (pinned by tests/test_stages.py parity test).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return _partial_schema().empty_table()
    idx = pc.sort_indices(
        t, sort_keys=[("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    t = t.select(["conv_id", "turn_idx", "text"]).take(idx).combine_chunks()
    n = t.num_rows
    conv = t["conv_id"].combine_chunks()
    is_start = np.ones(n, dtype=bool)
    if n > 1:
        is_start[1:] = ~pc.equal(conv.slice(1), conv.slice(0, n - 1)).to_numpy(
            zero_copy_only=False
        )
    starts = np.flatnonzero(is_start)
    group_offsets = pa.array(np.append(starts, n).astype(np.int32), pa.int32())

    # null turn_idx → -1: non-dense, hence 'corrupted' — the same verdict
    # the uncombined kernel reaches via its NaN comparison
    ti = pc.fill_null(t["turn_idx"], -1).cast(pa.int64()).combine_chunks()
    nulls_np = pc.is_null(t["text"]).to_numpy(zero_copy_only=False)
    texts = pc.fill_null(t["text"], "").combine_chunks()
    offs = _string_offsets(texts)
    buf = texts.buffers()[2]
    data = memoryview(buf) if buf is not None else memoryview(b"")
    codec = pa.Codec(_PARTIAL_CODEC, compression_level=_PARTIAL_LEVEL)
    bounds = np.append(starts, n)
    payloads = [
        codec.compress(data[offs[bounds[i]] : offs[bounds[i + 1]]], asbytes=True)
        for i in range(len(starts))
    ]
    return pa.table(
        {
            "conv_id": conv.take(pa.array(starts)),
            "turn_idx": pa.ListArray.from_arrays(group_offsets, ti),
            "lens": pa.ListArray.from_arrays(
                group_offsets, pa.array(np.diff(offs).astype(np.int32), pa.int32())
            ),
            "nulls": pa.ListArray.from_arrays(group_offsets, pa.array(nulls_np)),
            "payload": pa.array(payloads, pa.binary()),
        },
        schema=_partial_schema(),
    )


def _assemble_partials_block(t) -> "pa.Table":
    """Reduce side of the combined reassembly: decompress each partial's
    payload, rebuild the exact turn-level rows (text nulls restored from
    the mask), and hand them to the unchanged ``_assemble_block`` kernel.
    Blocks are conv_id-complete (hash-partitioned), so every partial of a
    conversation is present."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if t.num_rows == 0:
        return _assemble_block(
            pa.schema(
                [("conv_id", pa.string()), ("turn_idx", pa.int64()), ("text", pa.string())]
            ).empty_table()
        )
    t = t.combine_chunks()
    lens_col = t["lens"].combine_chunks()
    lens_vals = lens_col.values.to_numpy(zero_copy_only=False).astype(np.int64)
    lens_offs = lens_col.offsets.to_numpy()
    cs = np.concatenate([[0], np.cumsum(lens_vals)])
    row_sizes = cs[lens_offs[1:]] - cs[lens_offs[:-1]]
    total = int(cs[-1])
    if total > 2**31 - 8:
        raise ValueError(
            f"reassembly reduce block holds {total} text bytes (> int32 offsets); "
            "raise num_partitions so conv_id partitions stay under 2 GiB"
        )
    codec = pa.Codec(_PARTIAL_CODEC)
    payload = t["payload"].combine_chunks()
    blob = b"".join(
        codec.decompress(payload[i].as_py(), int(row_sizes[i]), asbytes=True)
        for i in range(t.num_rows)
    )
    val_offs = cs.astype(np.int32)
    texts = pa.Array.from_buffers(
        pa.utf8(),
        len(lens_vals),
        [None, pa.py_buffer(val_offs.tobytes()), pa.py_buffer(blob)],
    )
    nulls_flat = t["nulls"].combine_chunks().values
    texts = pc.if_else(nulls_flat, pa.nulls(len(lens_vals), pa.string()), texts)
    parent = pc.list_parent_indices(lens_col)
    turn_t = pa.table(
        {
            "conv_id": t["conv_id"].combine_chunks().take(parent),
            "turn_idx": t["turn_idx"].combine_chunks().values,
            "text": texts,
        }
    )
    return _assemble_block(turn_t)


def reassemble(
    turns_ds, num_partitions: int = 32, min_doc_chars: int = 1, combine: bool = False
):
    """``Dataset[TRANSCRIPTS] → Dataset[DOCS]``.

    ``min_doc_chars`` is the quality gate analog of the reference's blur
    filter (``face_recognition_custom.py:73-77``): normalized docs shorter
    than it are flagged ``no_content`` instead of silently dropped.

    ``combine`` inserts the map-side combiner: per-conv partial rows with
    zstd-compressed text payloads enter the conv_id shuffle instead of
    raw per-turn rows (see ``_partial_block``) — same output, 1.64× fewer
    bytes / 8.5× fewer rows (measured at 12M turns).  Off by default:
    on a single node the object-store exchange is shared-memory-cheap
    and the combine's sort+codec CPU is a measured net loss
    (BASELINE.md); enable for network-bound multi-node shuffles."""
    slim = turns_ds.select_columns(["conv_id", "turn_idx", "text"])
    if combine:
        parts = clean_blocks(slim).map_batches(
            _partial_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
        )
        docs = keyed_blocks(parts, ["conv_id"], num_partitions).map_batches(
            _assemble_partials_block,
            batch_size=None,
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
    else:
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
