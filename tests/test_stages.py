"""Unit tests for the vectorized stage kernels (no Ray needed)."""

import numpy as np
import pandas as pd

from raydedup.functions.pairs import (
    dedup_sorted_members,
    emit_bucket_pairs,
    group_ids_from_sorted,
)
from raydedup.stages.reassemble import _assemble_block, assemble_group


def test_group_ids_from_sorted():
    a = np.array([1, 1, 2, 2, 2, 3])
    b = np.array([0, 0, 0, 1, 1, 1])
    gid = group_ids_from_sorted(a, b)
    assert gid.tolist() == [0, 0, 1, 2, 2, 3]


def test_emit_bucket_pairs_clique_and_cap():
    # groups of size 3, 2, 1, 6 with cap=4
    gid = np.array([0, 0, 0, 1, 1, 2, 3, 3, 3, 3, 3, 3])
    i, j, capped = emit_bucket_pairs(gid, cap=4)
    assert (~capped).sum() == 3 + 1          # cliques: C(3,2) + C(2,2)
    assert capped.sum() == 2 * 6 - 3         # chain+star on the big group
    assert (i < j).all()
    # capped group stays connected: union-find over its edges
    big = {6: 6, 7: 7, 8: 8, 9: 9, 10: 10, 11: 11}

    def find(x):
        while big[x] != x:
            x = big[x]
        return x

    for a, b in zip(i[capped], j[capped]):
        big[find(a)] = find(b)
    assert len({find(x) for x in big}) == 1


def test_emit_bucket_pairs_empty_and_singletons():
    i, j, c = emit_bucket_pairs(np.array([], dtype=np.int64), cap=5)
    assert len(i) == 0
    i, j, c = emit_bucket_pairs(np.array([0, 1, 2]), cap=5)
    assert len(i) == 0


def test_dedup_sorted_members():
    gid = np.array([0, 0, 0, 1, 1])
    mem = np.array(["a", "a", "b", "a", "a"], dtype=object)
    keep = dedup_sorted_members(gid, mem)
    assert keep.tolist() == [True, False, True, True, False]


def _block_df(rows):
    return pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])


def test_assemble_block_matches_scalar():
    rows = [
        ("c1", 1, "world"),
        ("c1", 0, "hello"),
        ("c2", 0, None),          # null text → corrupted
        ("c2", 1, "x"),
        ("c3", 0, "a"),
        ("c3", 2, "b"),           # gap → corrupted
        ("c4", 0, "  "),
        ("c4", 1, ""),            # whitespace only → no_content
    ]
    import pyarrow as pa

    out = _block_df(rows)
    res = _assemble_block(pa.Table.from_pandas(out)).to_pandas().set_index("conv_id")
    assert res.loc["c1", "doc_text"] == "hello world"  # normalized at reassembly
    assert res.loc["c1", "status"] == "ok"
    assert res.loc["c2", "status"] == "corrupted" and res.loc["c2", "doc_text"] == ""
    assert res.loc["c3", "status"] == "corrupted"
    assert res.loc["c4", "status"] == "no_content"
    # parity with the scalar twin on every conversation
    for cid, g in _block_df(rows).groupby("conv_id"):
        texts = [None if pd.isna(t) else t for t in g["text"]]
        doc, status = assemble_group(g["turn_idx"].to_numpy(), texts)
        assert res.loc[cid, "doc_text"] == doc
        assert res.loc[cid, "status"] == status


def test_assemble_block_empty():
    import pyarrow as pa

    res = _assemble_block(
        pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    assert res.num_rows == 0
    assert res.column_names == ["conv_id", "doc_text", "n_turns", "status"]


def test_cc_pendant_chains_all_partitionings(ray_session):
    """Regression (stale-pointer bug): pendant nodes attached to long
    chains must converge to the component min at every partition count —
    an edge that contracts to a local self-loop must still deliver the
    merged label to the remote endpoint."""
    import ray.data as rd

    from raydedup.config import DedupConfig
    from raydedup.ray_utils import ensure_hash_shuffle
    from raydedup.stages.components import connected_components

    ensure_hash_shuffle()
    edges = [(f"c{i:03d}", f"c{i + 1:03d}") for i in range(30)]
    edges += [(f"c{i:03d}", f"p{i:03d}") for i in range(1, 31, 3)]  # pendants
    df = pd.DataFrame({"a": [a for a, _ in edges], "b": [b for _, b in edges]})
    expected = "c000"
    for p in (2, 5, 9):
        # gate disabled: this regression targets the distributed propagation
        labels, n_iters = connected_components(
            rd.from_pandas(df), DedupConfig(num_partitions=p, cc_driver_finish_edges=0)
        )
        lp = labels.to_pandas()
        assert n_iters > 0, "must converge"
        assert set(lp["label"]) == {expected}, f"partitions={p}"
        assert len(lp) == len(set(df.a) | set(df.b))


def test_cc_driver_endgame_matches_distributed(ray_session):
    """The size-gated driver endgame must produce byte-identical labels to
    the distributed propagation fixpoint on random graphs (chains, stars,
    isolated pairs, cross-links)."""
    import numpy as np
    import ray.data as rd

    from raydedup.config import DedupConfig
    from raydedup.ray_utils import ensure_hash_shuffle
    from raydedup.stages.components import connected_components

    ensure_hash_shuffle()
    rng = np.random.RandomState(11)
    for trial in range(3):
        n = 120
        m = rng.randint(40, 200)
        a = rng.randint(0, n, size=m)
        b = rng.randint(0, n, size=m)
        keep = a != b
        df = pd.DataFrame(
            {"a": [f"v{x:03d}" for x in a[keep]], "b": [f"v{x:03d}" for x in b[keep]]}
        )
        res = {}
        for gate in (0, 10**6):  # distributed vs driver endgame
            labels, n_iters = connected_components(
                rd.from_pandas(df),
                DedupConfig(num_partitions=3, cc_driver_finish_edges=gate),
            )
            assert n_iters > 0
            res[gate] = (
                labels.to_pandas().sort_values("node").reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(res[0], res[10**6])


def test_prefilter_bloom_pairs_identical(ray_session):
    """The singleton-key Bloom prefilter must not change emitted pairs —
    only shuffle volume.  Run candidate_pairs and suffix_pairs with and
    without the prefilter on the same synthetic corpus and compare."""
    import dataclasses

    import ray.data as rd

    from raydedup.config import DedupConfig
    from raydedup.ray_utils import ensure_hash_shuffle
    from raydedup.sources.synth import materialize
    from raydedup.stages.lsh import candidate_pairs
    from raydedup.stages.reassemble import reassemble
    from raydedup.stages.signatures import compute_signatures
    from raydedup.stages.suffix import suffix_pairs

    ensure_hash_shuffle()
    path = materialize(seed=42, n_convs=400)
    cfg = dataclasses.replace(DedupConfig(), prefilter_bloom_bits=1 << 16)
    docs = reassemble(
        rd.read_parquet(f"{path}/transcripts.parquet", columns=["conv_id", "turn_idx", "text"]),
        cfg.num_partitions,
    ).materialize()
    sigs = compute_signatures(docs, cfg).materialize()

    def pair_set(ds, cols=("a", "b")):
        df = ds.to_pandas()
        return set(zip(df[cols[0]], df[cols[1]]))

    base_c = pair_set(candidate_pairs(sigs, cfg, prefilter=False))
    pref_c = pair_set(candidate_pairs(sigs, cfg, prefilter=True))
    assert base_c == pref_c and len(base_c) > 0

    base_s = pair_set(suffix_pairs(docs, cfg, prefilter=False))
    pref_s = pair_set(suffix_pairs(docs, cfg, prefilter=True))
    assert base_s == pref_s and len(base_s) > 0
