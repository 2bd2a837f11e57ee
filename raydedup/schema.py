"""Declared Arrow schemas for every logical table in the engine.

The reference has no table abstraction (its data model is implicit Python
collections — SURVEY.md §1.1); here every stage emits a declared schema so
``map_batches(batch_format="pyarrow")`` round-trips are stable.
"""

from __future__ import annotations

import pyarrow as pa

# Primary input: one row per conversation turn (BASELINE.json: input_hint).
TRANSCRIPTS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

# Reassembled conversation documents (analog of the decoded image,
# duplicate_face.py:43).  status: ok | no_content | corrupted.
DOCS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("doc_text", pa.string()),
        ("n_turns", pa.int32()),
        ("status", pa.string()),
    ]
)

# Per-document signatures (analog of the 128-d face embedding,
# duplicate_face.py:44).  shingles kept only when verify_mode == "exact".
SIGNATURES = pa.schema(
    [
        ("conv_id", pa.string()),
        ("minhash", pa.list_(pa.uint64())),
        ("simhash", pa.uint64()),
        ("n_shingles", pa.int64()),
        ("shingles", pa.list_(pa.uint64())),
        ("status", pa.string()),
    ]
)

# LSH band rows: the distributed replacement for the driver-resident
# known_face_encodings index (duplicate_face.py:147-148).  ``bucket`` is
# one mixed uint64 carrying (band_idx, band_hash, salt) — the minimal
# shuffle key; ``sk`` orders over-cap buckets through signature space.
BANDS = pa.schema(
    [
        ("bucket", pa.uint64()),
        ("sk", pa.uint64()),
        ("conv_id", pa.string()),
    ]
)

# Candidate / verified pairs. a < b lexicographically. source: minhash | simhash | suffix.
PAIRS = pa.schema(
    [
        ("a", pa.string()),
        ("b", pa.string()),
        ("est_sim", pa.float64()),
        ("source", pa.string()),
    ]
)

# Final cluster assignment: every input conv_id exactly once;
# cluster_id == min conv_id of the connected component.
CLUSTERS = pa.schema(
    [
        ("conv_id", pa.string()),
        ("cluster_id", pa.string()),
        ("status", pa.string()),
    ]
)

# Stage counters (replaces the reference's driver-side scalar counters,
# duplicate_face.py:29-31,153-155).
METRICS = pa.schema(
    [
        ("stage", pa.string()),
        ("counter", pa.string()),
        ("value", pa.int64()),
    ]
)
