"""Property-based tests (hypothesis) for the pure pair-emission and
hashing kernels — the invariants the distributed stages rely on, probed
over adversarial inputs no hand-written fixture would cover.  All pure
numpy: no Ray session needed."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from raydedup.functions.pairs import (
    dedup_sorted_members,
    emit_bucket_pairs,
    group_ids_from_sorted,
)
from raydedup.functions.shingle import batch_shingles, doc_shingles, exact_jaccard

group_sizes = st.lists(st.integers(min_value=1, max_value=12), min_size=1, max_size=30)


def _gid_from_sizes(sizes):
    return np.repeat(np.arange(len(sizes), dtype=np.int64), sizes)


@given(sizes=group_sizes, cap=st.integers(min_value=2, max_value=8))
@settings(max_examples=200, deadline=None)
def test_emit_bucket_pairs_invariants(sizes, cap):
    """Small groups → full clique; over-cap groups → connected 2n-3-edge
    graph with every edge flagged; always i<j within the same group."""
    gid = _gid_from_sizes(sizes)
    i, j, capped = emit_bucket_pairs(gid, cap)
    assert (i < j).all()
    assert (gid[i] == gid[j]).all()

    starts = np.concatenate([[0], np.cumsum(sizes)])
    for g, n in enumerate(sizes):
        lo, hi = starts[g], starts[g + 1]
        sel = (gid[i] == g)
        edges = set(zip(i[sel].tolist(), j[sel].tolist()))
        if n <= cap:
            exp = {(a, b) for a in range(lo, hi) for b in range(a + 1, hi)}
            assert edges == exp
            assert not capped[sel].any()
        else:
            assert len(edges) == 2 * n - 3
            assert capped[sel].all()
            # connectivity: union-find over the emitted edges
            parent = list(range(lo, hi))

            def find(x):
                while parent[x - lo] != x:
                    parent[x - lo] = parent[parent[x - lo] - lo]
                    x = parent[x - lo]
                return x

            for a, b in edges:
                ra, rb = find(a), find(b)
                parent[ra - lo] = rb
            assert len({find(x) for x in range(lo, hi)}) == 1


@given(
    keys=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 5)), min_size=1, max_size=50
    )
)
@settings(max_examples=200, deadline=None)
def test_group_ids_dense_and_key_consistent(keys):
    keys = sorted(keys)
    a = np.array([k[0] for k in keys], dtype=np.int64)
    b = np.array([k[1] for k in keys], dtype=np.int64)
    gid = group_ids_from_sorted(a, b)
    # dense 0-based ids, non-decreasing, +1 exactly at key changes
    assert gid[0] == 0
    diffs = np.diff(gid)
    assert set(diffs.tolist()) <= {0, 1}
    changes = (np.diff(a) != 0) | (np.diff(b) != 0)
    assert (diffs == changes.astype(np.int64)).all()


@given(
    pairs=st.lists(
        st.tuples(st.integers(0, 4), st.integers(0, 4)), min_size=1, max_size=40
    )
)
@settings(max_examples=200, deadline=None)
def test_dedup_sorted_members_first_of_run(pairs):
    pairs = sorted(pairs)
    gid = np.array([p[0] for p in pairs], dtype=np.int64)
    member = np.array([p[1] for p in pairs], dtype=np.int64)
    keep = dedup_sorted_members(gid, member)
    kept = list(zip(gid[keep].tolist(), member[keep].tolist()))
    assert kept == sorted(set(pairs))


words = st.lists(
    st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=0, max_size=30
).map(" ".join)


@given(texts=st.lists(words, min_size=1, max_size=8), k=st.integers(1, 4))
@settings(max_examples=100, deadline=None)
def test_batch_shingles_matches_scalar_twin(texts, k):
    """The flat-batch path is byte-identical to the per-doc scalar twin."""
    sets, capped = batch_shingles(texts, k)
    assert not capped.any()
    for t, s in zip(texts, sets):
        np.testing.assert_array_equal(s, doc_shingles(t, k))


@given(t=words, k=st.integers(1, 3), cap=st.integers(1, 6))
@settings(max_examples=100, deadline=None)
def test_shingle_cap_is_subset_and_deterministic(t, k, cap):
    full = doc_shingles(t, k)
    capped = doc_shingles(t, k, max_shingles=cap)
    assert len(capped) == min(len(full), cap)
    assert np.isin(capped, full).all()
    np.testing.assert_array_equal(capped, doc_shingles(t, k, max_shingles=cap))


@given(
    a=st.lists(st.integers(0, 50), max_size=30),
    b=st.lists(st.integers(0, 50), max_size=30),
)
@settings(max_examples=200, deadline=None)
def test_exact_jaccard_is_set_jaccard(a, b):
    aa = np.unique(np.array(a, dtype=np.uint64))
    bb = np.unique(np.array(b, dtype=np.uint64))
    got = exact_jaccard(aa, bb)
    sa, sb = set(a), set(b)
    exp = len(sa & sb) / len(sa | sb) if (sa | sb) else 0.0
    assert abs(got - exp) < 1e-12
