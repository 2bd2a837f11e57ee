"""Ray Data context knobs shared by every pipeline entry point.

The engine's wide operations are all *hash* shuffles (repartition by key +
vectorized within-block group processing) — the scalable replacement for
both the reference's driver-resident index scan (``duplicate_face.py:57-82``)
and Ray Data's per-group ``map_groups`` tasks, whose per-group Python
overhead dominates at millions of buckets.
"""

from __future__ import annotations


def ensure_hash_shuffle() -> None:
    """Switch the current DataContext to the hash-shuffle strategy.

    Required for ``Dataset.repartition(keys=...)`` and makes
    ``groupby``/``join`` hash-partitioned.  Idempotent; safe to call from
    every pipeline entry (the driver owns ``ray.init``, we only set the
    Data context).
    """
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    # Size aggregator pools to the actual cluster instead of the 64-actor
    # default: several pipelined shuffle ops would otherwise compete for
    # actor slots and stall up to min_wait (300s default) per op.
    try:
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        n_cpus = 8
    # Aggregator-actor spin-up is per shuffle op; the pool size is the
    # dominant fixed cost of small runs, so cap it (override for big
    # clusters via RAYDEDUP_MAX_AGGREGATORS).
    import os

    cap = int(os.environ.get("RAYDEDUP_MAX_AGGREGATORS", "8"))
    ctx.max_hash_shuffle_aggregators = max(2, min(cap, n_cpus // 2))
    ctx.min_hash_shuffle_aggregator_wait_time_in_s = 10
    # Keep aggregators lightweight so map/actor stages are never starved.
    # The reservation must stay well under n_cpus in AGGREGATE across every
    # concurrently-alive shuffle op: a plan with two hash shuffles spawns
    # both ops' aggregator actors up front, and if their combined CPU claim
    # leaves less than one full CPU, the 1-CPU map tasks feeding them can
    # never schedule — a hard deadlock (observed at num_cpus=4 with the
    # old flat 0.05/partition: 2 ops × 32 partitions × 0.05 = 3.2 of 4
    # CPUs held by idle aggregators, 0 tasks executing).  Budget ≤12.5% of
    # the cluster per shuffle op instead; the CPU figure is admission
    # control only — aggregator throughput is unaffected.
    per_partition = min(0.05, max(0.01, (0.125 * n_cpus) / 32))
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = per_partition
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = per_partition
    _silence_empty_partition_schema_warning()


def _silence_empty_partition_schema_warning() -> None:
    """Drop Ray's per-bundle schema-mismatch WARNING when the "mismatch"
    is an EMPTY hash-shuffle partition (zero-column schema).

    Small inputs with ``num_partitions`` > distinct keys produce empty
    partitions whose bundles carry no schema; Ray 2.49's streaming
    executor logs a warning per such bundle, flooding bench output.  A
    genuinely diverging non-empty schema (a real operator bug) still
    warns — the filter matches only the empty-new-schema form.  Verified
    Ray-internal: a bare hash shuffle of a 3-row dataset into 8
    partitions triggers it with no engine code in the loop.
    """
    import logging

    class _EmptySchemaBundleFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:  # True = keep
            msg = record.getMessage()
            return not (
                "different schema than the previous one" in msg
                and "new schema: ." in msg
            )

    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(isinstance(f, _EmptySchemaBundleFilter) for f in logger.filters):
        logger.addFilter(_EmptySchemaBundleFilter())


def _silence_empty_block_sizing_warning() -> None:
    """Drop Ray's per-block WARNING when it fails to size-sample an EMPTY
    object-dtype pandas column.

    ``PandasBlockAccessor.size_bytes`` samples object columns with
    ``np.vectorize``, which raises on zero-row input ("cannot call
    `vectorize` on size 0 inputs unless `otypes` is set"); Ray logs that
    per empty block — e.g. every filter-style map fn whose batch keeps no
    rows — flooding worker stderr into bench tails.  Sizing an empty
    column as 0 bytes is the correct outcome anyway.  Installed at module
    import so every worker that unpickles an engine fn gets it; only the
    size-0 vectorize form is dropped, real sizing failures still warn.
    """
    import logging

    class _EmptyBlockSizingFilter(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:  # True = keep
            msg = record.getMessage()
            return not (
                "Error calculating size for column" in msg
                and "size 0 inputs" in msg
            )

    logger = logging.getLogger("ray.data._internal.pandas_block")
    if not any(isinstance(f, _EmptyBlockSizingFilter) for f in logger.filters):
        logger.addFilter(_EmptyBlockSizingFilter())


# Worker-side: this module is imported wherever engine fns are unpickled,
# so installing here covers every worker process (the sizing happens in
# workers, where driver-side filters can't reach).
_silence_empty_block_sizing_warning()


def _strip_block_meta(t):
    """Zero-copy drop of schema-level metadata from an Arrow block.

    pandas-written Parquet and ``pa.Table.from_pandas`` both attach a
    ``b'pandas'`` schema-metadata entry whose presence makes
    ``hash(pyarrow.Schema)`` raise (``unhashable type: 'dict'``) — Ray Data
    then logs a "Failed to hash the schemas (for deduplication)" warning on
    every schema unification in every shuffle aggregator.  Stripping the
    metadata costs nothing (shared buffers) and restores hashability.
    """
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def clean_blocks(ds):
    """Coerce ``ds`` to Arrow blocks with no schema metadata (see
    ``_strip_block_meta``).  The map fuses with the upstream stage, and the
    pandas→Arrow conversion it may trigger is work the downstream hash
    shuffle would otherwise do itself."""
    return ds.map_batches(
        _strip_block_meta, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    )


def default_partitions() -> int:
    """Hash-partition count for the sf-scale query surface: ~one per CPU
    slot of the live session (floor 8 so small sessions still exercise
    real multi-partition shuffles, cap 256 so tiny tables aren't shredded
    into thousands of blocks on a huge cluster driver).  Every operator
    that uses this is partition-count invariant (pinned by the
    determinism tests and the DuckDB twins), so the value only moves wall
    time — resolve it lazily at call time, never at import (Ray may not
    be initialized yet, and the session's size can change between runs)."""
    try:
        import ray

        if ray.is_initialized():
            return int(min(256, max(8, ray.cluster_resources().get("CPU", 8))))
    except Exception:
        pass
    return 8


def read_parquet_clean(path, *, columns=None, **kwargs):
    """``read_parquet`` with an explicit metadata-free schema.

    Passing ``schema=`` (the file footer's schema with its pandas metadata
    removed, pruned to ``columns``) makes every block the read emits carry a
    hashable schema, silencing the per-task "Failed to hash the schemas"
    warning at the source instead of one stage downstream.

    The probe reads ONE file's footer and assumes every file under ``path``
    shares its schema — true for this engine's own checkpoints and the test
    fixtures.  Hive-partitioned directories (``kpart=i/`` layouts written by
    ``stage(..., partition_cols=...)``) are detected and read WITHOUT the
    explicit schema: partition columns live in directory names, not file
    footers, so pinning the footer schema would silently drop them.
    """
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    probe = path[0] if isinstance(path, (list, tuple)) and path else path
    hive = False
    if isinstance(probe, str) and os.path.isdir(probe):
        root = probe
        hits = sorted(glob.glob(os.path.join(probe, "**", "*.parquet"), recursive=True))
        probe = hits[0] if hits else None
        if probe:
            rel_dir = os.path.dirname(os.path.relpath(probe, root))
            hive = any("=" in seg for seg in rel_dir.split(os.sep) if seg)
    try:
        schema = pq.read_schema(probe).remove_metadata() if probe and not hive else None
        if schema is not None and columns:
            schema = pa.schema([schema.field(c) for c in columns])
    except Exception:
        schema = None
    return rd.read_parquet(path, columns=columns, schema=schema, **kwargs)


def keyed_blocks(ds, keys: list, num_partitions: int):
    """Hash-partition ``ds`` so all rows of a key land in one block.

    Downstream ``map_batches(fn, batch_size=None)`` then sees complete key
    groups per batch and can process them with vectorized numpy/pandas —
    the engine's standard wide-operation pattern.  Input blocks are coerced
    to metadata-free Arrow first so shuffle-side schema deduplication works
    (see ``_strip_block_meta``).
    """
    ensure_hash_shuffle()
    return clean_blocks(ds).repartition(num_blocks=num_partitions, keys=keys)
