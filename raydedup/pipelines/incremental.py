"""Cross-run incremental near-dup ingest over a persisted corpus index.

The durable analog of the reference's growing in-memory dedup index
(``duplicate_face.py:147-155``: every new frame is matched against all
accumulated uniques, and the whole index is lost on crash).  Here the
"index" is the signature checkpoint a previous :func:`run_pipeline` (or a
previous :func:`incremental_ingest`) already persisted: a new ingest
batch pays the docs + signature stages ONLY for its own rows, candidates
are generated against corpus ∪ batch with corpus-vs-corpus pairs pruned
inside the bucket emitter (at scale they are the overwhelming majority),
and the batch's own signature checkpoint becomes part of the corpus for
the next ingest — pass ``corpus_dirs=[run1_out, run2_out, ...]``.

Scale posture: the only driver-resident state is the NEW batch's conv_id
set (broadcast once via ``ray.put``; sized by the ingest batch, never the
corpus).  Everything else is the flagship's own shuffle machinery.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.ray_utils import ensure_hash_shuffle, keyed_blocks, read_parquet_clean
from raydedup.state.checkpoint import CheckpointStore, input_fingerprint

# signature-relevant config fields: two runs' checkpoints are cross-run
# compatible iff these agree (execution sizing / sinks may differ freely)
_SIG_FIELDS = (
    "shingle_k",
    "max_shingles_per_doc",
    "boilerplate_mask_min_convs",
    "num_perm",
    "seed",
    "bands",
    "rows",
    "simhash_bits",
    "verify_mode",
    "store_shingles",
    "min_doc_chars",
)


def sig_fingerprint(cfg: DedupConfig) -> tuple:
    return tuple(getattr(cfg, f) for f in _SIG_FIELDS)


def _corpus_signatures(corpus_dirs: list, cfg: DedupConfig, columns: list):
    """Column-pruned union of the corpus runs' signature checkpoints.

    Validates each checkpoint's manifest exists (the run completed its
    signature stage) — config compatibility is the caller's contract,
    checked via ``corpus_cfg`` in :func:`incremental_ingest`."""
    parts = []
    for d in corpus_dirs:
        sig_dir = os.path.join(d, "signatures")
        man = os.path.join(sig_dir, "_MANIFEST.json")
        if not os.path.exists(man):
            raise FileNotFoundError(
                f"no completed signature checkpoint under {sig_dir!r} — the "
                "corpus run must have finished its signature stage (disk mode)"
            )
        parts.append(read_parquet_clean(sig_dir, columns=columns))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


_NEWIDS_CACHE: dict = {}


def _newid_set(ref) -> frozenset:
    """Per-worker-process cache of the broadcast new-batch id set: one
    ``ray.get`` + one frozenset build per process, not per block."""
    import ray

    key = ref.hex()
    s = _NEWIDS_CACHE.get(key)
    if s is None:
        s = _NEWIDS_CACHE[key] = frozenset(ray.get(ref))
    return s


def incremental_ingest(
    new_input_path: str,
    corpus_dirs: str | list,
    out_dir: str,
    cfg: DedupConfig | None = None,
    corpus_cfg: DedupConfig | None = None,
):
    """Match a NEW transcript batch against persisted corpus signatures.

    ``corpus_dirs``: out_dir(s) of previous disk-mode :func:`run_pipeline`
    / ``incremental_ingest`` runs whose ``signatures/`` checkpoints form
    the standing corpus index.  ``corpus_cfg`` declares the config those
    runs used (defaults to ``cfg``); its manifest hash is verified against
    each corpus checkpoint and its signature-relevant fields must match
    ``cfg`` — silently mixing shingle/signature configs would produce
    garbage candidates.

    Returns dict with ``assignments`` (one row per NEW conversation:
    ``conv_id, canonical_id, matched_existing`` — canonical is the min
    corpus member of its duplicate component if any, else the min new
    member, else itself), the new batch's ``docs``/``signatures`` handles
    (the signatures checkpoint under ``out_dir`` is the corpus extension
    for the next ingest), and the store ``events`` (which prove the corpus
    signature stage was read, never recomputed).
    """
    import ray

    from raydedup.stages.components import connected_components
    from raydedup.stages.lsh import candidate_pairs
    from raydedup.stages.reassemble import reassemble
    from raydedup.stages.signatures import compute_signatures
    from raydedup.stages.verify import verified_pairs

    ensure_hash_shuffle()
    cfg = cfg or DedupConfig()
    corpus_cfg = corpus_cfg or cfg
    if cfg.checkpoint_mode != "disk":
        raise ValueError("incremental_ingest requires checkpoint_mode='disk'")
    if sig_fingerprint(corpus_cfg) != sig_fingerprint(cfg):
        raise ValueError(
            "corpus and ingest configs differ in signature-relevant fields "
            f"({_SIG_FIELDS}); cross-run signatures would not be comparable"
        )
    corpus_dirs = [corpus_dirs] if isinstance(corpus_dirs, str) else list(corpus_dirs)
    for d in corpus_dirs:
        man_p = os.path.join(d, "signatures", "_MANIFEST.json")
        if os.path.exists(man_p):
            man = json.load(open(man_p))
            if man.get("config_hash") != corpus_cfg.config_hash():
                raise ValueError(
                    f"corpus checkpoint {d!r} was written under a different "
                    "config than corpus_cfg declares (manifest hash mismatch)"
                )

    # the ingest run's lineage covers the new input AND the corpus
    # checkpoints' identity, so resume invalidates if either changes
    corpus_fp = "+".join(
        input_fingerprint(os.path.join(d, "signatures")) for d in corpus_dirs
    )
    store = CheckpointStore(
        out_dir,
        cfg.config_hash(),
        f"{input_fingerprint(new_input_path)}|corpus:{corpus_fp}",
        mode="disk",
        compression=cfg.checkpoint_compression,
    )

    docs = store.stage(
        "docs",
        lambda: reassemble(
            read_parquet_clean(new_input_path, columns=["conv_id", "turn_idx", "text"]),
            cfg.num_partitions,
            cfg.min_doc_chars,
            combine=cfg.combine_reassembly,
        ),
    )
    sigs_new = store.stage("signatures", lambda: compute_signatures(docs, cfg))

    # broadcast the new-batch id set once (ingest-batch-sized, not corpus-
    # sized); pair masking + canonical selection both look it up per block.
    # Collected as Arrow batches, never per-row Python dicts.
    new_ids: list = []
    for b in store.read("signatures", ["conv_id"]).iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        new_ids.extend(b["conv_id"].to_pylist())
    ids_ref = ray.put(np.array(sorted(new_ids), dtype=object))

    def pair_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        s = _newid_set(ids_ref)
        return (
            pd.Series(a).isin(s).to_numpy() | pd.Series(b).isin(s).to_numpy()
        )

    payload = "shingles" if cfg.verify_mode == "exact" else "minhash"
    band_cols = ["conv_id", "minhash", "n_shingles"]
    cands = store.stage(
        "candidates",
        lambda: candidate_pairs(
            _corpus_signatures(corpus_dirs, cfg, band_cols).union(
                store.read("signatures", band_cols)
            ),
            cfg,
            pair_mask_fn=pair_mask,
        ),
    )
    edges = store.stage(
        "pairs",
        lambda: verified_pairs(
            cands,
            _corpus_signatures(corpus_dirs, cfg, ["conv_id", payload]).union(
                store.read("signatures", ["conv_id", payload])
            ),
            cfg,
        ),
    )

    def compute_assignments():
        labels, _ = connected_components(store.read("pairs"), cfg)

        assigned_schema = pa.schema(
            [("node", pa.string()), ("canonical_id", pa.string()),
             ("matched_existing", pa.int64())]
        )

        def canonical_per_label(df: pd.DataFrame) -> pa.Table:
            if len(df) == 0:
                return assigned_schema.empty_table()
            s = _newid_set(ids_ref)
            new = df["node"].isin(s).to_numpy()
            # min corpus member per component ("~" sorts after ids)
            old_min = (
                df.assign(k=np.where(new, "~", df["node"]))
                .groupby("label", sort=False)["k"]
                .transform("min")
            )
            any_old = (old_min != "~").to_numpy()
            all_min = df.groupby("label", sort=False)["node"].transform("min").to_numpy()
            canon = np.where(any_old, old_min.to_numpy(), all_min)
            return pa.table(
                {
                    "node": pa.array(df["node"].to_numpy(dtype=object)[new], pa.string()),
                    "canonical_id": pa.array(canon[new].astype(object), pa.string()),
                    "matched_existing": pa.array(any_old[new].astype(np.int64)),
                },
                schema=assigned_schema,
            )

        assigned = keyed_blocks(labels, ["label"], cfg.num_partitions).map_batches(
            canonical_per_label, batch_size=None, batch_format="pandas"
        )

        # every new doc defaults to a self-canonical singleton (sentinel
        # matched=-1); one node-keyed shuffle resolves component rows first
        def new_defaults(df: pd.DataFrame) -> pa.Table:
            conv = df["conv_id"].to_numpy(dtype=object)
            return pa.table(
                {
                    "node": pa.array(conv, pa.string()),
                    "canonical_id": pa.array(conv, pa.string()),
                    "matched_existing": pa.array(np.full(len(conv), -1, dtype=np.int64)),
                },
                schema=assigned_schema,
            )

        defaults = store.read("signatures", ["conv_id"]).map_batches(
            new_defaults, batch_format="pandas"
        )

        out_schema = pa.schema(
            [("conv_id", pa.string()), ("canonical_id", pa.string()),
             ("matched_existing", pa.int64())]
        )

        def resolve(df: pd.DataFrame) -> pa.Table:
            if len(df) == 0:
                return out_schema.empty_table()
            df = df.sort_values(["node", "matched_existing"],
                                ascending=[True, False], kind="stable")
            df = df.drop_duplicates("node", keep="first")
            return pa.table(
                {
                    "conv_id": pa.array(df["node"].to_numpy(dtype=object), pa.string()),
                    "canonical_id": pa.array(
                        df["canonical_id"].to_numpy(dtype=object), pa.string()
                    ),
                    "matched_existing": pa.array(
                        np.maximum(df["matched_existing"].to_numpy(np.int64), 0)
                    ),
                },
                schema=out_schema,
            )

        return keyed_blocks(
            defaults.union(assigned), ["node"], cfg.num_partitions
        ).map_batches(resolve, batch_size=None, batch_format="pandas")

    assignments = store.stage("assignments", compute_assignments)
    return {
        "docs": docs,
        "signatures": sigs_new,
        "assignments": assignments,
        "events": store.events,
        "config": cfg,
    }


def incremental_ingest_demo(sf_dir: str, cfg: DedupConfig | None = None):
    """Driver-facing cross-run demonstration at sf scale: the sf-derived
    synth fixture splits ~75/25 by a deterministic conv-id hash into a
    corpus batch and an ingest batch.  The corpus batch runs the full
    disk-mode pipeline ONCE (its checkpoints under /tmp resume on repeat
    calls — the persisted index), then the ingest batch runs
    :func:`incremental_ingest` against those checkpoints.  Returns the
    per-new-conversation assignments (rows-only: iterative CC inside).
    """
    import re

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from raydedup.functions.hashing import splitmix64
    from raydedup.pipelines.dedup import run_pipeline
    from raydedup.ray_utils import default_partitions
    from raydedup.sources.synth import materialize

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    n_convs = max(200, int(200_000 * sf))
    fixture = materialize(seed=42, n_convs=n_convs)
    base = f"/tmp/raydedup_incr/n{n_convs}"
    marker = os.path.join(base, "_SUCCESS")
    if not os.path.exists(marker):
        os.makedirs(base, exist_ok=True)
        turns = pq.read_table(f"{fixture}/transcripts.parquet")
        ids = np.array(
            [int(c[5:]) for c in turns["conv_id"].to_pylist()], dtype=np.uint64
        )
        is_new = (splitmix64(ids) % np.uint64(4)) == np.uint64(0)
        pq.write_table(turns.filter(pa.array(~is_new)), f"{base}/corpus.parquet")
        pq.write_table(turns.filter(pa.array(is_new)), f"{base}/batch.parquet")
        open(marker, "w").close()
    cfg = cfg or DedupConfig(
        num_partitions=default_partitions(),
        sig_concurrency=(1, 4),
        checkpoint_mode="disk",
    )
    run_pipeline(f"{base}/corpus.parquet", f"{base}/corpus_run", cfg)
    res = incremental_ingest(
        f"{base}/batch.parquet", f"{base}/corpus_run", f"{base}/ingest_run", cfg
    )
    return res["assignments"]
