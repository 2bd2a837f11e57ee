"""Alternative source / sink formats for the transcripts table.

The engine's native interchange format is Parquet (columnar, row-group
statistics, partition pruning); JSONL and CSV exist because real
transcript dumps arrive in them.  Both readers normalize to the exact
``input_hint`` schema (conv_id:string, turn_idx:int32, role:string,
text:string, tool:string, ts:timestamp[us]) so every downstream stage is
format-agnostic — read → cast once, then one pipeline.

Scale note: ``ray.data.read_json`` / ``read_csv`` stream file shards
exactly like ``read_parquet`` (no driver materialization); the cast is a
zero-copy-in / Arrow-kernel ``map_batches``.  Only schema normalization
lives here — everything else is the same Dataset.
"""

from __future__ import annotations

import pyarrow as pa

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)


def _normalize(batch: pa.Table) -> pa.Table:
    cols = {}
    for field in TRANSCRIPT_SCHEMA:
        if field.name in batch.column_names:
            col = batch[field.name]
            if pa.types.is_timestamp(field.type) and (
                pa.types.is_integer(col.type) or pa.types.is_floating(col.type)
            ):
                # JSON round-trips timestamps as epoch microseconds
                col = col.cast(pa.int64()).cast(field.type)
            else:
                col = col.cast(field.type)
        else:
            col = pa.nulls(batch.num_rows, field.type)
        cols[field.name] = col
    return pa.table(cols, schema=TRANSCRIPT_SCHEMA)


def transcripts_from_jsonl(path: str):
    """JSONL transcript dump → Dataset with the canonical schema."""
    import ray.data as rd

    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()  # before the read: the context binds at creation
    return rd.read_json(path).map_batches(_normalize, batch_format="pyarrow")


def transcripts_from_csv(path: str):
    """CSV transcript dump → Dataset with the canonical schema.

    CSV has no timestamp type; ``ts`` is parsed from ISO-8601 strings
    (pyarrow's CSV reader infers it) or cast from epoch integers.
    """
    import ray.data as rd

    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()  # before the read: the context binds at creation
    return rd.read_csv(path).map_batches(_normalize, batch_format="pyarrow")


def export_jsonl(ds, out_dir: str) -> str:
    """Dataset → JSONL shard files (one per block; timestamps as epoch
    microseconds so the round-trip is lossless)."""

    def ts_to_us(batch: pa.Table) -> pa.Table:
        cols = {}
        for name in batch.column_names:
            col = batch[name]
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())
            cols[name] = col
        return pa.table(cols)

    ds.map_batches(ts_to_us, batch_format="pyarrow").write_json(out_dir)
    return out_dir
