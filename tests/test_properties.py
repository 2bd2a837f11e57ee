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


@given(
    events=st.lists(
        st.tuples(st.integers(0, 5),        # user
                  st.integers(0, 40),       # ts (small int domain → many ties)
                  st.sampled_from(["a", "b", "c", "x"])),
        min_size=0, max_size=60,
    ),
    win=st.integers(0, 15),
)
@settings(max_examples=200, deadline=None)
def test_funnel_matcher_equals_bruteforce(events, win):
    """Vectorized greedy-earliest funnel == per-user brute-force walk."""
    import pandas as pd

    from raydedup.pipelines.docops import funnel_step_counts

    steps = ("a", "b", "c")
    df = pd.DataFrame(
        {
            "user_id": np.array([e[0] for e in events], dtype=np.int64),
            "ts": pd.to_datetime(np.array([e[1] for e in events], dtype=np.int64),
                                 unit="us"),
            "event_type": np.array([e[2] for e in events], dtype=object),
        }
    )
    got = funnel_step_counts(df, steps, np.int64(win))
    # brute force: per user, earliest step-0 event, then earliest
    # qualifying next step within [t_prev, t_prev + win]
    exp = [0, 0, 0]
    for u in set(e[0] for e in events):
        evs = sorted((t, s) for uu, t, s in events if uu == u)
        t_prev = None
        for k, stp in enumerate(steps):
            t_next = None
            for t, s in evs:
                if s != stp:
                    continue
                if k == 0 or (t_prev is not None and t_prev <= t <= t_prev + win):
                    t_next = t
                    break
            if t_next is None:
                break
            t_prev = t_next
            exp[k] += 1
    got_counts = ([0, 0, 0] if len(got) == 0
                  else got.set_index("step")["n_users"].reindex([1, 2, 3], fill_value=0).tolist())
    assert got_counts == exp, (got_counts, exp)


@given(
    vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1, max_size=400),
    s=st.integers(4, 64),
)
@settings(max_examples=200, deadline=None)
def test_compress_weighted_rank_error_bound(vals, s):
    """One compression step keeps every quantile within total/s rank error."""
    from raydedup.pipelines.curation import _compress_weighted

    v = np.sort(np.array(vals, dtype=np.float64))
    w = np.ones(len(v), dtype=np.float64)
    cv, cw = _compress_weighted(v, w, s)
    assert abs(cw.sum() - len(v)) < 1e-6  # total weight preserved
    assert (np.diff(cv) >= 0).all()       # stays sorted
    total = float(len(v))
    cum = np.cumsum(cw)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        idx = min(int(np.searchsorted(cum, q * total, side="left")), len(cv) - 1)
        est = cv[idx]
        # rank of the estimate in the exact data
        lo = np.searchsorted(v, est, side="left") / total
        hi = np.searchsorted(v, est, side="right") / total
        # estimate's rank interval must overlap [q - 1/s, q + 1/s]
        assert lo - 1.0 / s <= q <= hi + 1.0 / s, (q, est, lo, hi, s)


@given(
    docs=st.lists(
        st.text(alphabet="ab c\t", min_size=0, max_size=40), min_size=1, max_size=20
    ),
    n=st.integers(2, 5),
)
@settings(max_examples=200, deadline=None)
def test_gram_frame_matches_bruteforce(docs, n):
    """_gram_frame (flat shifted-concat kernel) == per-doc Python twin:
    distinct n-token windows per document, split on SINGLE spaces (the
    exact semantics of the DuckDB twins' string_split(text, ' '): empty
    tokens from space runs are real tokens, tabs stay inside tokens)."""
    import pandas as pd

    from raydedup.pipelines.curation import _gram_frame

    df = pd.DataFrame({"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs})
    got = _gram_frame(df, n)
    got_set = set(zip(got["doc_id"].tolist(), got["g"].tolist()))

    exp = set()
    for did, text in enumerate(docs):
        toks = text.split(" ")
        for i in range(len(toks) - n + 1):
            exp.add((did, " ".join(toks[i : i + n])))
    assert got_set == exp
    assert len(got) == len(got_set)  # no duplicate rows
