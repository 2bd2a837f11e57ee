"""Unit tests for the checkpoint store (lineage chain, manifest validity,
parquet row counting) — driver-side only, no pipeline run."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from raydedup.state.checkpoint import CheckpointStore, _parquet_rows, input_fingerprint


def _write_stage_like(tmp_path, name, rows):
    d = tmp_path / name
    d.mkdir(parents=True)
    pq.write_table(pa.table({"x": list(range(rows))}), d / "part-0.parquet")
    return d


def test_parquet_rows(tmp_path):
    d = _write_stage_like(tmp_path, "s", 7)
    pq.write_table(pa.table({"x": [1, 2]}), d / "part-1.parquet")
    assert _parquet_rows(str(d)) == 9


def test_input_fingerprint_changes_with_content(tmp_path):
    f = tmp_path / "in.parquet"
    pq.write_table(pa.table({"x": [1]}), f)
    fp1 = input_fingerprint(str(f))
    os.utime(f, (1, 1))
    assert input_fingerprint(str(f)) != fp1


def test_manifest_validity_and_lineage_chain(tmp_path, ray_session):
    import ray.data as rd

    out = str(tmp_path / "out")
    store = CheckpointStore(out, "cfgA", "fpA")
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return rd.from_items([{"x": i} for i in range(5)])

    store.stage("alpha", compute)
    assert calls["n"] == 1
    lineage_after_alpha = store.lineage

    # identical store → resumed, not recomputed; lineage advances identically
    store2 = CheckpointStore(out, "cfgA", "fpA")
    store2.stage("alpha", compute)
    assert calls["n"] == 1
    assert store2.events[0]["action"] == "resumed"
    assert store2.lineage == lineage_after_alpha

    # different config hash → recompute
    store3 = CheckpointStore(out, "cfgB", "fpA")
    store3.stage("alpha", compute)
    assert calls["n"] == 2

    # corrupt manifest → recompute
    m = json.load(open(os.path.join(out, "alpha", "_MANIFEST.json")))
    m["lineage"] = "bogus"
    json.dump(m, open(os.path.join(out, "alpha", "_MANIFEST.json"), "w"))
    store4 = CheckpointStore(out, "cfgB", "fpA")
    store4.stage("alpha", compute)
    assert calls["n"] == 3


def test_read_prunes_columns(tmp_path, ray_session):
    import ray.data as rd

    out = str(tmp_path / "out")
    store = CheckpointStore(out, "c", "f")
    store.stage("s", lambda: rd.from_items([{"x": 1, "y": "a"}, {"x": 2, "y": "b"}]))
    slim = store.read("s", ["x"])
    assert slim.schema().names == ["x"]
    assert slim.count() == 2
