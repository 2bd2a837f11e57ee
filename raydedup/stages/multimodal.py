"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded / feature-extracted by an actor-pool ``map_batches`` stage.

The real decoders (image/audio/video) are NOT available in this
environment — the decode step is STUBBED behind ``decoder="none"``
(deterministic fake features) and raises ``NotImplementedError`` for real
codecs.  Everything Ray-side — schema, batch sizing, actor signature,
zero-copy binary handling, output layout — is real and tested.

Design notes for 100-TB scale: binary payloads dominate block size, so the
stage takes a small ``batch_size`` (payload bytes × batch_size × pool size
must fit worker heaps) and relies on streaming execution + object-store
spilling; decoded features are small and flow on to the similarity /
dedup operators (e.g. embedding-cosine near-dup in
``raydedup.pipelines.similarity``).
"""

from __future__ import annotations

from raydedup.ray_utils import read_parquet_clean

import numpy as np
import pyarrow as pa

MEDIA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),   # image | audio | video
        ("payload", pa.binary()),      # opaque encoded bytes
        ("width", pa.int32()),         # typed metadata (0 when unknown)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURES = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),
        ("n_bytes", pa.int64()),
        ("feature", pa.list_(pa.float32())),  # decoded feature vector
        ("status", pa.string()),              # ok | decode_error | unsupported
    ]
)


class MediaFeatureActor:
    """Actor-pool stage: decode + featurize a batch of media payloads.

    ``decoder='none'`` → deterministic fake features (byte-histogram
    projection), exercising the full Ray plumbing without codec deps.
    Any other decoder raises ``NotImplementedError`` at actor construction
    (fail fast, once per actor, not per batch).
    """

    def __init__(self, decoder: str = "none", feature_dim: int = 16, seed: int = 42):
        if decoder != "none":
            raise NotImplementedError(
                f"decoder={decoder!r}: real image/audio/video codecs are not "
                "available in this environment; only the deterministic "
                "'none' stub is implemented"
            )
        self.feature_dim = feature_dim
        rng = np.random.RandomState(seed)
        # fixed projection from 256-bin byte histogram to feature_dim
        self.proj = rng.randn(256, feature_dim).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        # one segmented histogram over the concatenated payload buffer
        # (np.add.at on (row, byte) pairs), one (n,256)@(256,d) matmul —
        # no per-row Python loop over payloads
        col = batch["payload"]
        col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        col = col.cast(pa.large_binary())  # 64-bit offsets at any batch size
        # binary arrays expose offsets only through the raw buffer
        # (buffers() = [validity, offsets, data]); slice to the logical view
        all_offs = np.frombuffer(col.buffers()[1], dtype=np.int64)
        offs = all_offs[col.offset: col.offset + n + 1]
        flat = np.frombuffer(col.buffers()[2] or b"", dtype=np.uint8)
        valid = np.ones(n, dtype=bool) if col.null_count == 0 else ~np.asarray(
            col.is_null()
        )
        lengths = np.where(valid, offs[1:] - offs[:-1], 0)
        n_bytes = lengths.astype(np.int64)
        hist = np.zeros((n, 256), dtype=np.float32)
        total = int(lengths.sum())
        if total > 0:
            row_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
            if total == int(offs[-1] - offs[0]):
                # contiguous case (no null row holds a stored extent)
                vals = flat[offs[0]:offs[-1]]
            else:  # gather valid rows' extents explicitly
                vals = np.concatenate(
                    [flat[offs[i]:offs[i + 1]] for i in np.flatnonzero(lengths)]
                )
            np.add.at(hist, (row_idx, vals), np.float32(1.0))
        sums = hist.sum(axis=1, keepdims=True)
        np.divide(hist, sums, out=hist, where=sums > 0)
        feats = hist @ self.proj
        status = np.where(valid, "ok", "decode_error")
        return pa.table(
            {
                "media_id": batch["media_id"],
                "media_type": batch["media_type"],
                "n_bytes": pa.array(n_bytes),
                "feature": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), self.feature_dim
                ).cast(pa.list_(pa.float32())),
                "status": pa.array(status, pa.string()),
            }
        )


def extract_media_features(media_ds, decoder: str = "none", feature_dim: int = 16,
                           batch_size: int = 64, concurrency=(1, 4)):
    """``Dataset[MEDIA] → Dataset[FEATURES]`` via an actor pool.

    Small ``batch_size`` by design: payloads are large binaries."""
    return media_ds.map_batches(
        MediaFeatureActor,
        fn_constructor_kwargs={"decoder": decoder, "feature_dim": feature_dim},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        zero_copy_batch=True,
    )


def documents_as_media(sf_dir: str):
    """Fixture adapter: wrap the documents table's text bytes as fake
    image payloads (deterministic; exercises the binary path end-to-end)."""
    import pandas as pd

    import ray.data as rd

    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()

    def fn(df: pd.DataFrame) -> pa.Table:
        # NULL text maps to an EMPTY payload (COALESCE semantics, matching
        # the SQL twins); the actors' None-payload decode_error branch is
        # reserved for genuinely missing media in real deployments
        payloads = [(t or "").encode("utf-8") for t in df["text"]]
        n = len(df)
        return pa.table(
            {
                "media_id": pa.array([f"media-{i:010d}" for i in df["doc_id"]], pa.string()),
                "media_type": pa.array(["image"] * n, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(np.zeros(n, dtype=np.int32)),
                "height": pa.array(np.zeros(n, dtype=np.int32)),
                "duration_ms": pa.array(np.zeros(n, dtype=np.int32)),
            },
            schema=MEDIA,
        )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fn, batch_format="pandas")


def media_feature_pipeline(sf_dir: str):
    """(media_id, n_bytes, status) — oracle-checkable metadata output of the
    media decode/featurize pipeline over the fixture adapter."""
    feats = extract_media_features(documents_as_media(sf_dir))
    return feats.select_columns(["media_id", "n_bytes", "status"])


FRAMES = pa.schema(
    [
        ("media_id", pa.string()),
        ("frame_idx", pa.int64()),
        ("n_bytes_frame", pa.int64()),
        ("status", pa.string()),
    ]
)


class FrameSampleActor:
    """Actor-pool frame-sampling stage: one media row → up to
    ``max_frames`` frame rows (a 1→N explosion over binary payloads — the
    video-frame-sample plumbing shape).

    The real frame decoder is stubbed like ``MediaFeatureActor``: a
    "frame" is a contiguous ``chunk_bytes`` slice of the payload (first
    ``max_frames`` chunks), deterministic and oracle-checkable; a real
    deployment swaps the slicing for codec keyframe extraction, keeping
    the same schema and explosion shape.  Empty / null payloads emit no
    frames (mirrored by the SQL twin's ``nb > 0`` filter).
    """

    def __init__(self, decoder: str = "none", chunk_bytes: int = 256, max_frames: int = 4):
        if decoder != "none":
            raise NotImplementedError(
                f"decoder={decoder!r}: real video codecs are not available in "
                "this environment; only the deterministic chunk stub exists"
            )
        self.chunk = chunk_bytes
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, sizes = [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(), batch["payload"].to_pylist()):
            nb = 0 if p is None else len(p)
            if nb == 0:
                continue
            k = min(self.max_frames, -(-nb // self.chunk))
            for i in range(k):
                ids.append(mid)
                idxs.append(i)
                sizes.append(min(self.chunk, nb - i * self.chunk))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "frame_idx": pa.array(np.asarray(idxs, dtype=np.int64)),
                "n_bytes_frame": pa.array(np.asarray(sizes, dtype=np.int64)),
                "status": pa.array(["ok"] * len(ids), pa.string()),
            },
            schema=FRAMES,
        )


def frame_sample_pipeline(sf_dir: str, chunk_bytes: int = 256, max_frames: int = 4):
    """(media_id, frame_idx, n_bytes_frame, status) — frame-sample rows
    over the fixture media adapter; actor pool, small batches."""
    return documents_as_media(sf_dir).map_batches(
        FrameSampleActor,
        fn_constructor_kwargs={"chunk_bytes": chunk_bytes, "max_frames": max_frames},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
        num_cpus=1,
        zero_copy_batch=True,
    )


RESIZED = pa.schema(
    [
        ("media_id", pa.string()),
        ("payload", pa.binary()),
        ("n_bytes_in", pa.int64()),
        ("n_bytes_out", pa.int64()),
        ("status", pa.string()),
    ]
)


class MediaResizeActor:
    """Actor-pool resize stage: payload → bounded-size payload.

    The real image resampler is stubbed like the other decoders: "resize"
    is a deterministic truncation of the byte stream to ``target_bytes``
    (a real deployment swaps in codec decode → resample → re-encode,
    keeping the same 1→1 schema).  The plumbing this exercises is the
    payload-REWRITING shape: output blocks carry (smaller) binaries
    onward, so block sizes shrink mid-pipeline and downstream batch
    sizing can grow.
    """

    def __init__(self, decoder: str = "none", target_bytes: int = 512):
        if decoder != "none":
            raise NotImplementedError(
                f"decoder={decoder!r}: real image codecs are not available in "
                "this environment; only the deterministic truncation stub exists"
            )
        self.target = target_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        out, nin, nout, status = [], [], [], []
        for p in payloads:
            if p is None:
                out.append(None)
                nin.append(0)
                nout.append(0)
                status.append("decode_error")
                continue
            q = p[: self.target]
            out.append(q)
            nin.append(len(p))
            nout.append(len(q))
            status.append("ok")
        return pa.table(
            {
                "media_id": batch["media_id"],
                "payload": pa.array(out, pa.binary()),
                "n_bytes_in": pa.array(np.asarray(nin, dtype=np.int64)),
                "n_bytes_out": pa.array(np.asarray(nout, dtype=np.int64)),
                "status": pa.array(status, pa.string()),
            },
            schema=RESIZED,
        )


def media_resize_pipeline(sf_dir: str, target_bytes: int = 512):
    """(media_id, n_bytes_in, n_bytes_out, status) — metadata output of
    the resize stage over the fixture media adapter."""
    resized = documents_as_media(sf_dir).map_batches(
        MediaResizeActor,
        fn_constructor_kwargs={"target_bytes": target_bytes},
        batch_format="pyarrow",
        batch_size=64,
        concurrency=(1, 4),
        num_cpus=1,
        zero_copy_batch=True,
    )
    return resized.select_columns(["media_id", "n_bytes_in", "n_bytes_out", "status"])
