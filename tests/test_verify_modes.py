"""Verification-mode tests: exact shingle Jaccard vs MinHash-estimate
acceptance, and the endpoint semi-filter."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from raydedup.config import DedupConfig


def _mini_world(ray_session, verify_mode):
    """Three docs: a≈b (near dup), c unrelated. Returns verified pairs df."""
    import ray.data as rd

    from raydedup.ray_utils import ensure_hash_shuffle
    from raydedup.stages.lsh import candidate_pairs
    from raydedup.stages.signatures import compute_signatures
    from raydedup.stages.verify import verified_pairs

    ensure_hash_shuffle()
    cfg = DedupConfig(num_partitions=2, verify_mode=verify_mode, jaccard_threshold=0.8)
    base = " ".join(f"tok{i}" for i in range(60))
    docs = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c"],
            "doc_text": [base, base + " tok60", " ".join(f"zzz{i}" for i in range(60))],
            "n_turns": np.ones(3, dtype=np.int32),
            "status": ["ok"] * 3,
        }
    )
    docs_ds = rd.from_pandas(docs)
    sigs = compute_signatures(docs_ds, cfg).materialize()
    cands = candidate_pairs(sigs, cfg).materialize()
    return verified_pairs(cands, sigs, cfg).to_pandas()


def test_exact_mode_verifies_near_dup(ray_session):
    out = _mini_world(ray_session, "exact")
    assert set(zip(out.a, out.b)) == {("a", "b")}
    assert (out.est_sim >= 0.8).all()


def test_estimate_mode_verifies_near_dup(ray_session):
    out = _mini_world(ray_session, "estimate")
    assert ("a", "b") in set(zip(out.a, out.b))
    assert not any(("c" in p) for p in zip(out.a, out.b) for _ in [0] if "c" in p)


def test_estimate_margin_respected():
    cfg = DedupConfig(verify_mode="estimate", jaccard_threshold=0.8, est_margin=0.1)
    from raydedup.stages.verify import make_verify_block

    fn = make_verify_block(cfg)
    # two signatures agreeing on 72% of perms: below 0.8 but above 0.7 → kept
    n = cfg.num_perm
    sig_a = np.arange(n, dtype=np.uint64)
    sig_b = sig_a.copy()
    sig_b[: int(n * 0.28)] += np.uint64(1)
    t = pa.table(
        {
            "a": pa.array(["x", "x"]),
            "b": pa.array(["y", "y"]),
            "side": pa.array(np.array([0, 1], dtype=np.int8)),
            "payload": pa.array([sig_a.tolist(), sig_b.tolist()], pa.list_(pa.uint64())),
        }
    )
    out = fn(t)
    assert out.num_rows == 1
    expected = 1 - int(n * 0.28) / n
    assert abs(out["est_sim"][0].as_py() - expected) < 1e-9


def test_bad_verify_mode_rejected():
    with pytest.raises(ValueError):
        DedupConfig(verify_mode="nope")
    with pytest.raises(ValueError):
        DedupConfig(verify_mode="exact", store_shingles=False)
    assert DedupConfig(verify_mode="estimate").store_shingles is False
    assert DedupConfig().store_shingles is True


def test_estimate_mode_pipeline_recall(ray_session, fixture_dir, tmp_path):
    """Estimate-mode (no stored shingle sets) still hits the recall bar —
    the cheap path for scale."""
    from raydedup.pipelines.dedup import run_pipeline
    from raydedup.pipelines.oracle import greedy_star_pairs, pair_recall

    import pyarrow.parquet as pq

    cfg = DedupConfig(num_partitions=4, verify_mode="estimate")
    res = run_pipeline(f"{fixture_dir}/transcripts.parquet", str(tmp_path / "est"), cfg)
    cl = res["clusters"].to_pandas()
    turns = pq.read_table(f"{fixture_dir}/transcripts.parquet").to_pandas()
    ok = turns.dropna(subset=["text"]).sort_values(["conv_id", "turn_idx"])
    docs = [(cid, "\n".join(g["text"])) for cid, g in ok.groupby("conv_id", sort=True)]
    orc = greedy_star_pairs(docs, cfg.shingle_k, cfg.jaccard_threshold)
    recall = pair_recall(orc.pairs, dict(zip(cl.conv_id, cl.cluster_id)))
    assert recall >= 0.98


def test_endpoint_hash_semi_filter(ray_session):
    import ray.data as rd

    from raydedup.stages.verify import _endpoint_hash_set

    pairs = rd.from_pandas(pd.DataFrame({"a": ["p", "q"], "b": ["q", "r"]}))
    eh = _endpoint_hash_set(pairs)
    from raydedup.functions.hashing import hash_strings

    for s in ["p", "q", "r"]:
        h = hash_strings([s])[0]
        assert eh[np.searchsorted(eh, h)] == h
    h_miss = hash_strings(["zzz"])[0]
    pos = np.searchsorted(eh, h_miss)
    assert pos >= len(eh) or eh[pos] != h_miss


def test_exact_jaccard_sims_matches_per_pair_loop():
    """The vectorized block intersection equals the naive per-pair loop,
    including empty sets and offset bases > 0 (Arrow take layouts)."""
    from raydedup.stages.verify import exact_jaccard_sims

    rng = np.random.RandomState(7)
    sets0, sets1 = [], []
    for _ in range(50):
        n0, n1 = rng.randint(0, 40, size=2)
        common = rng.randint(0, 1 << 48, size=rng.randint(0, 20)).astype(np.uint64)
        s0 = np.unique(np.concatenate([common, rng.randint(1 << 48, 1 << 49, n0).astype(np.uint64)]))
        s1 = np.unique(np.concatenate([common, rng.randint(1 << 49, 1 << 50, n1).astype(np.uint64)]))
        sets0.append(s0)
        sets1.append(s1)
    off0 = np.concatenate([[0], np.cumsum([len(s) for s in sets0])])
    off1 = np.concatenate([[0], np.cumsum([len(s) for s in sets1])])
    val0 = np.concatenate(sets0) if sets0 else np.empty(0, np.uint64)
    val1 = np.concatenate(sets1) if sets1 else np.empty(0, np.uint64)
    got = exact_jaccard_sims(off0, val0, off1, val1, len(sets0))
    for i, (x, y) in enumerate(zip(sets0, sets1)):
        if len(x) == 0 or len(y) == 0:
            expected = 0.0
        else:
            inter = len(np.intersect1d(x, y, assume_unique=True))
            expected = inter / (len(x) + len(y) - inter)
        assert abs(got[i] - expected) < 1e-12, i
    # offset-base shift: same slices viewed through offsets starting at 3
    pad = np.zeros(3, np.uint64)
    got2 = exact_jaccard_sims(off0 + 3, np.concatenate([pad, val0]),
                              off1 + 3, np.concatenate([pad, val1]), len(sets0))
    assert np.allclose(got, got2)


def test_semi_filter_size_guard(ray_session):
    """Verified pairs are identical with the endpoint semi-filter on
    (default) and off (forced by a tiny semi_filter_max_endpoints)."""
    import ray.data as rd

    from raydedup.ray_utils import ensure_hash_shuffle
    from raydedup.stages.lsh import candidate_pairs
    from raydedup.stages.signatures import compute_signatures
    from raydedup.stages.verify import verified_pairs

    ensure_hash_shuffle()
    base = " ".join(f"tok{i}" for i in range(60))
    docs = pd.DataFrame(
        {
            "conv_id": ["a", "b", "c", "d"],
            "doc_text": [base, base + " tok60", base + " tok61",
                         " ".join(f"zzz{i}" for i in range(60))],
            "n_turns": np.ones(4, dtype=np.int32),
            "status": ["ok"] * 4,
        }
    )
    outs = {}
    for cap in (10_000_000, 0):  # 0 forces the skip path
        cfg = DedupConfig(num_partitions=2, semi_filter_max_endpoints=cap)
        sigs = compute_signatures(rd.from_pandas(docs), cfg).materialize()
        cands = candidate_pairs(sigs, cfg).materialize()
        out = verified_pairs(cands, sigs, cfg).to_pandas()
        outs[cap] = out.sort_values(["a", "b"]).reset_index(drop=True)
    assert len(outs[0]) > 0
    pd.testing.assert_frame_equal(outs[10_000_000], outs[0])
