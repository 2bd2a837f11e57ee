"""Content-defined chunking (CDC) over the ``documents`` table.

Fixed-window passage dedup (``passage.py``) breaks under INSERTION: one
added token shifts every later window boundary, so a near-copy with a
one-line edit shares zero fixed windows with its original.  CDC (gear
hashing per the FastCDC line of work — Xia et al., USENIX ATC'16 — and
the Rabin chunking tradition from LBFS, SOSP'01) derives boundaries from
the CONTENT itself: a position ends a chunk when a rolling hash of the
trailing bytes lands in a target set, so an insertion only perturbs the
chunks it touches and downstream chunks re-synchronize.  Storage
deduplicators (and long-document near-dup pipelines) use exactly this to
catch shifted duplicates that fixed windows miss.

Semantics here (deterministic, pure function of the byte string):

* gear hash ``h_i = Σ_{j=0..63} GEAR[b_{i-j}] << j`` — only the trailing
  64 bytes influence ``h_i`` (the ``<<1`` recurrence shifts older bytes
  out), which is what makes boundaries local and shift-resistant;
* candidate boundary wherever ``h_i & mask == 0`` with
  ``mask = 2^avg_bits - 1`` (expected chunk length ≈ 2^avg_bits bytes);
* greedy min/max clamp: accept the first candidate ≥ ``min_len`` bytes
  after the previous cut; force a cut at ``max_len`` when no candidate
  appears (bounds worst-case chunk size on pathological content).

Scale shape: chunking is a PURE MAP (flat_map shape: doc → chunk rows,
no shuffle); the dup profile reuses the two-shuffle pattern of
``passage.passage_dedup`` (chunk-md5 shuffle for exact global counts →
sparse doc_id shuffle for the per-doc fold), so all-to-all volume is
∝ chunk count, never corpus bytes.  The hash kernel is a 64-tap numpy
convolution over the batch's concatenated bytes (no per-byte Python);
only the min/max clamp walks the (sparse) candidate list per doc.

No SQL twin: a 64-tap rolling hash is not expressible in DuckDB —
correctness is pinned by the pytest property suite instead (exact
tiling, length bounds, partition determinism, and the shift-resistance
property that motivates CDC: a prefix-edited copy re-synchronizes and
shares most chunk hashes with its original, where fixed windows share
none).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.functions.hashing import splitmix64
from raydedup.ray_utils import (
    default_partitions,
    ensure_hash_shuffle,
    keyed_blocks,
    read_parquet_clean,
)

# deterministic 256-entry gear table (splitmix64 of the byte value) —
# process-independent, identical on every worker
_GEAR = splitmix64(np.arange(256, dtype=np.uint64))


def _P() -> int:
    return default_partitions()


def _docs(sf_dir: str, columns=None):
    ensure_hash_shuffle()
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def _gear_hashes(data: np.ndarray) -> np.ndarray:
    """Gear hash at every position of ``data`` (uint8): 64-tap shifted sum
    over the trailing bytes, fully vectorized (64 numpy passes, no Python
    per-byte loop).  Positions near the start use however many bytes
    exist — identical to running the ``h = (h << 1) + GEAR[b]`` recurrence
    from a zero state, because taps older than 64 positions have shifted
    out mod 2^64 either way."""
    n = len(data)
    g = _GEAR[data]
    h = np.zeros(n, dtype=np.uint64)
    for j in range(min(64, n)):
        # tap j: GEAR[b_{i-j}] << j for all i ≥ j
        if j == 0:
            h += g
        else:
            h[j:] += g[:-j] << np.uint64(j)
    return h


def _cut_points(h: np.ndarray, avg_bits: int, min_len: int, max_len: int) -> list:
    """Greedy boundary selection over precomputed gear hashes: returns the
    sorted cut END positions (exclusive), always ending at ``len(h)``.
    Walks only the sparse candidate array — O(chunks + candidates)."""
    n = len(h)
    if n == 0:
        return []
    mask = np.uint64((1 << avg_bits) - 1)
    cand = np.flatnonzero((h & mask) == 0) + 1  # cut AFTER the matching byte
    cuts = []
    last = 0
    ci = 0
    nc = len(cand)
    while last < n:
        lo, hi = last + min_len, last + max_len
        ci = np.searchsorted(cand, lo)
        if ci < nc and cand[ci] <= hi and cand[ci] < n:
            cut = int(cand[ci])
        else:
            cut = min(hi, n)
        cuts.append(cut)
        last = cut
    return cuts


_CHUNK_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("chunk_idx", pa.int64()), ("start", pa.int64()),
     ("length", pa.int64()), ("chunk_md5", pa.string())]
)


def cdc_chunks(sf_dir: str, avg_bits: int = 6, min_len: int = 16,
               max_len: int = 256):
    """(doc_id, chunk_idx, start, length, chunk_md5): content-defined
    chunk table — chunks tile each document's utf-8 bytes exactly (Σ
    length == byte length, starts contiguous), with expected chunk size
    ≈ 2^avg_bits bytes clamped to [min_len, max_len].  Pure map stage:
    no shuffle; rows ∝ bytes / 2^avg_bits."""

    def chunk(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _CHUNK_SCHEMA.empty_table()
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        out_doc: list = []
        out_idx: list = []
        out_start: list = []
        out_len: list = []
        out_md5: list = []
        md5 = hashlib.md5
        for doc_id, text in zip(ids, df["text"]):
            raw = ("" if text is None else text).encode("utf-8")
            data = np.frombuffer(raw, dtype=np.uint8)
            cuts = _cut_points(_gear_hashes(data), avg_bits, min_len, max_len)
            last = 0
            for i, cut in enumerate(cuts):
                out_doc.append(doc_id)
                out_idx.append(i)
                out_start.append(last)
                out_len.append(cut - last)
                out_md5.append(md5(raw[last:cut]).hexdigest())
                last = cut
        return pa.table(
            {"doc_id": pa.array(np.asarray(out_doc, dtype=np.int64)),
             "chunk_idx": pa.array(np.asarray(out_idx, dtype=np.int64)),
             "start": pa.array(np.asarray(out_start, dtype=np.int64)),
             "length": pa.array(np.asarray(out_len, dtype=np.int64)),
             "chunk_md5": pa.array(out_md5, pa.string())},
            schema=_CHUNK_SCHEMA,
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        chunk, batch_format="pandas"
    )


def cdc_dedup(sf_dir: str, avg_bits: int = 6, min_len: int = 16,
              max_len: int = 256, num_partitions: int = 0):
    """(doc_id, n_chunks, n_dup_chunks, dup_ratio): per-document CDC
    dup-chunk profile — ``passage.passage_dedup`` with content-defined
    boundaries, so SHIFTED copies (insertions/prefix edits) still read
    as duplicated.  Same two-shuffle shape: chunk-md5 shuffle (global
    counts exact in-block) → sparse doc_id shuffle fold."""

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "n": pd.Series([], dtype=np.int64),
                              "n_dup": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        dup = df.groupby("chunk_md5", sort=False)["doc_id"].transform("size") > 1
        out = (pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "dup": dup.to_numpy()})
               .groupby("doc_id", sort=False)["dup"]
               .agg(n="size", n_dup="sum").reset_index())
        return out.astype({"doc_id": np.int64, "n": np.int64, "n_dup": np.int64})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "n_chunks": pd.Series([], dtype=np.int64),
                              "n_dup_chunks": pd.Series([], dtype=np.int64),
                              "dup_ratio": pd.Series([], dtype=np.float64)})
        if len(df) == 0:
            return empty
        g = (df.groupby("doc_id", sort=False)
               .agg(n_chunks=("n", "sum"), n_dup_chunks=("n_dup", "sum"))
               .reset_index())
        g["dup_ratio"] = np.round(
            g["n_dup_chunks"].to_numpy(np.float64)
            / g["n_chunks"].to_numpy(np.float64), 6)
        return g.astype({"doc_id": np.int64, "n_chunks": np.int64,
                         "n_dup_chunks": np.int64})

    num_partitions = num_partitions or _P()
    chunks = cdc_chunks(sf_dir, avg_bits, min_len, max_len).select_columns(
        ["doc_id", "chunk_md5"]
    )
    flagged = keyed_blocks(chunks, ["chunk_md5"], num_partitions).map_batches(
        flag, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(flagged, ["doc_id"], num_partitions).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )
