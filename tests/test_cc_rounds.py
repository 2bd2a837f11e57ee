"""Per-round, per-partition lineage for distributed label propagation
(the north rule's resume-mid-shuffle requirement applied to the CC
stage: stages/components.py::_staged_propagation)."""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raydedup.config import DedupConfig
from raydedup.state.checkpoint import CheckpointStore


def _chain_pairs(ray_session, n_chains=6, chain_len=40, n_parts=6):
    """Long path graphs (diameter >> 1) so propagation needs several
    rounds, plus singleton edges across chains."""
    import ray.data as rd

    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()
    rows = []
    for c in range(n_chains):
        for i in range(chain_len - 1):
            rows.append(
                {"a": f"n{c:02d}-{i:04d}", "b": f"n{c:02d}-{i + 1:04d}"}
            )
    return rd.from_pandas(pd.DataFrame(rows)).repartition(n_parts)


def _cfg(**kw):
    base = dict(
        num_partitions=8,
        sig_concurrency=(1, 2),
        cc_driver_finish_edges=0,  # force the distributed propagation path
        cc_rows_per_part=64,       # tiny parts -> several per round
    )
    base.update(kw)
    return DedupConfig(**base)


def _labels_df(labels_ds):
    return (
        labels_ds.to_pandas().sort_values("node").reset_index(drop=True)
    )


def test_staged_rounds_match_inmemory(ray_session, tmp_path):
    from raydedup.stages.components import connected_components

    pairs = _chain_pairs(ray_session).materialize()
    cfg = _cfg()
    mem_labels, mem_iters = connected_components(pairs, cfg)
    store = CheckpointStore(str(tmp_path / "cc"), cfg.config_hash(), "fp0")
    st_labels, st_iters = connected_components(pairs, cfg, store=store)
    pd.testing.assert_frame_equal(_labels_df(mem_labels), _labels_df(st_labels))
    assert st_iters > 0 and mem_iters > 0
    # every chain collapses to its minimum node
    df = _labels_df(st_labels)
    assert set(df["label"]) == {f"n{c:02d}-0000" for c in range(6)}
    # rounds left durable manifests with checksums
    rounds = sorted(glob.glob(str(tmp_path / "cc" / "rounds" / "round-*")))
    assert len(rounds) == st_iters + 1  # + round-0 state
    for r in rounds[1:]:
        m = json.load(open(os.path.join(r, "_MANIFEST.json")))
        assert {"x", "s", "rows"} <= set(m)


def test_staged_rounds_partition_lineage_resume(ray_session, tmp_path):
    """Kill K parts of a mid propagation round; the rerun recomputes
    exactly those parts (never completed ones) and labels are unchanged."""
    from raydedup.stages.components import connected_components

    pairs = _chain_pairs(ray_session).materialize()
    cfg = _cfg()
    store = CheckpointStore(str(tmp_path / "cc"), cfg.config_hash(), "fp0")
    labels1, iters1 = connected_components(pairs, cfg, store=store)
    base = _labels_df(labels1)

    # simulate a crash mid-round-2: drop its round manifest (round marked
    # incomplete) and destroy 2 of its part dirs; later rounds' manifests
    # stay — they must NOT be trusted once their input changes... they
    # don't change here (recomputed parts are bit-identical), so later
    # rounds resume from their part manifests, proving per-part lineage.
    r2 = str(tmp_path / "cc" / "rounds" / "round-2")
    os.remove(os.path.join(r2, "_MANIFEST.json"))
    part_dirs = sorted(glob.glob(os.path.join(r2, "src-*")))
    assert len(part_dirs) >= 3
    killed = part_dirs[:2]
    for d in killed:
        shutil.rmtree(d)

    store2 = CheckpointStore(str(tmp_path / "cc"), cfg.config_hash(), "fp0")
    labels2, iters2 = connected_components(pairs, cfg, store=store2)
    pd.testing.assert_frame_equal(base, _labels_df(labels2))
    assert iters2 == iters1
    ev = {e["stage"]: e for e in store2.events}
    assert ev["cc_round_0"]["action"] == "resumed"
    assert ev["cc_round_1"]["action"] == "resumed"
    # round 2 recomputed ONLY the killed parts
    assert ev["cc_round_2"]["action"] == "computed"
    assert ev["cc_round_2"]["parts_computed"] == len(killed)
    assert ev["cc_round_2"]["parts_resumed"] == len(part_dirs) - len(killed)
    # all later rounds resumed whole
    for k in range(3, iters1 + 1):
        assert ev[f"cc_round_{k}"]["action"] == "resumed"


def test_staged_rounds_config_invalidation(ray_session, tmp_path):
    """A changed lineage seed invalidates every round (stale state is
    never reused across different inputs)."""
    from raydedup.stages.components import connected_components

    pairs = _chain_pairs(ray_session).materialize()
    cfg = _cfg()
    store = CheckpointStore(str(tmp_path / "cc"), cfg.config_hash(), "fpA")
    connected_components(pairs, cfg, store=store)
    store2 = CheckpointStore(str(tmp_path / "cc"), cfg.config_hash(), "fpB")
    labels, _ = connected_components(pairs, cfg, store=store2)
    assert all(
        e["action"] == "computed" for e in store2.events if e["stage"].startswith("cc_round")
    )
    df = _labels_df(labels)
    assert set(df["label"]) == {f"n{c:02d}-0000" for c in range(6)}


def test_flagship_disk_uses_round_lineage_when_gate_off(ray_session, fixture_dir, tmp_path):
    """End-to-end: a disk-mode flagship with the CC driver endgame
    disabled routes propagation through the staged rounds and produces
    the same clusters as the default path."""
    from raydedup.pipelines.dedup import run_pipeline

    cfg_a = _cfg(cc_round_checkpoints=True)
    cfg_b = DedupConfig(num_partitions=4, sig_concurrency=(1, 2))
    res_a = run_pipeline(
        f"{fixture_dir}/transcripts.parquet", str(tmp_path / "a"), cfg_a
    )
    res_b = run_pipeline(
        f"{fixture_dir}/transcripts.parquet", str(tmp_path / "b"), cfg_b
    )
    ca = res_a["clusters"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    cb = res_b["clusters"].to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(ca, cb)
    assert any(e["stage"].startswith("cc_round") for e in res_a["events"])
    assert os.path.isdir(str(tmp_path / "a" / "cc_rounds" / "rounds"))
