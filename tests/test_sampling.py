"""Sampling + embedding-curation operators: weighted A-Res sample,
mixture downsample, SemDeDup, prototypicality pruning."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _brute_weighted_topk(sf_dir: str, k: int) -> pd.DataFrame:
    import hashlib

    df = pq.read_table(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "n_chars"]).to_pandas()
    u = np.array(
        [(int(hashlib.md5(str(i).encode()).hexdigest()[:13], 16) + 1) / float(1 << 52)
         for i in df["doc_id"]]
    )
    # 12-decimal quantization mirrors the operator (absorbs last-ULP libm
    # variance vs the DuckDB twin; see sampling.weighted_sample)
    df["skey"] = np.round(np.log(u) / np.maximum(df["n_chars"].to_numpy(), 1), 12)
    return (df.sort_values(["skey", "doc_id"], ascending=[False, True])
              .head(k).reset_index(drop=True))


def test_weighted_sample_matches_brute_force(ray_session):
    from raydedup.pipelines.sampling import weighted_sample

    got = weighted_sample(SF, k=25).to_pandas().reset_index(drop=True)
    want = _brute_weighted_topk(SF, 25)
    assert list(got["doc_id"]) == list(want["doc_id"])
    assert np.allclose(got["skey"], want["skey"], rtol=0, atol=1e-15)


def test_weighted_sample_prefers_long_docs(ray_session):
    """Sanity on the weighting itself: the weighted sample's mean length
    must exceed the corpus mean (longer docs are more likely drawn)."""
    from raydedup.pipelines.sampling import weighted_sample

    got = weighted_sample(SF, k=50).to_pandas()
    corpus = pq.read_table(f"{SF}/documents.parquet", columns=["n_chars"]).to_pandas()
    assert got["n_chars"].mean() > corpus["n_chars"].mean()


def test_mixture_sample_balances_groups(ray_session):
    from raydedup.pipelines.sampling import mixture_sample

    got = mixture_sample(SF).to_pandas()
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "lang"]).to_pandas()
    quota = src["lang"].value_counts().min()
    counts = got["lang"].value_counts()
    assert set(counts.index) == set(src["lang"].unique())
    assert (counts == quota).all()
    # deterministic membership: lowest-md5 docs per group
    import hashlib

    src["sk"] = [hashlib.md5(str(i).encode()).hexdigest() for i in src["doc_id"]]
    want = (src.sort_values(["lang", "sk", "doc_id"])
               .groupby("lang").head(quota))
    assert set(got["doc_id"]) == set(want["doc_id"])


def _planted_embeddings(tmp_path, n_clusters=4, per=40, dim=16, n_dups=25):
    """Well-separated clusters + exact-duplicate rows appended at the end
    (vec_id >= base) duplicating the first ``n_dups`` base vectors."""
    rng = np.random.RandomState(7)
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0) + 0.05 * rng.randn(n_clusters * per, dim)
    base = len(vecs)
    vecs = np.vstack([vecs, vecs[:n_dups]])  # exact dups of ids 0..n_dups-1
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": pa.array(range(len(vecs)), pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float64())),
        }),
        d / "embeddings.parquet",
    )
    return str(d), base, n_dups, vecs


def test_semdedup_drops_planted_duplicates(ray_session, tmp_path):
    """Every planted exact duplicate (same vector ⇒ same k-means cell) must
    be dropped; the member-count invariant and within-cluster greedy oracle
    must hold exactly."""
    from raydedup.pipelines.similarity import semdedup

    d, base, n_dups, vecs = _planted_embeddings(tmp_path)
    got = semdedup(d, k=4, tau=0.999, n_iters=4).to_pandas().sort_values("vec_id")
    assert len(got) == len(vecs)  # row-preserving: one verdict per vector
    dup_rows = got[got["vec_id"] >= base]
    assert not dup_rows["keep"].any()  # all planted dups dropped
    assert got[got["vec_id"] < base]["keep"].all()  # originals all kept

    # greedy within-cluster oracle at a loose tau: recompute keep flags
    # locally from the SAME assignments and compare exactly
    loose = semdedup(d, k=4, tau=0.98, n_iters=4).to_pandas().sort_values("vec_id")
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for cid, g in loose.groupby("centroid_id"):
        ids = g["vec_id"].to_numpy()
        x = norm[ids]
        sims = x @ x.T
        want_keep = np.ones(len(ids), dtype=bool)
        for i in range(len(ids)):
            if (sims[i, :i] >= 0.98).any():
                want_keep[i] = False
        assert (g["keep"].to_numpy() == want_keep).all()


def test_prototype_prune_fraction_and_rank(ray_session, tmp_path):
    from raydedup.pipelines.similarity import prototype_prune

    d, base, n_dups, vecs = _planted_embeddings(tmp_path)
    p = 0.25
    got = prototype_prune(d, k=4, p=p, n_iters=4).to_pandas()
    assert len(got) == len(vecs)
    for cid, g in got.groupby("centroid_id"):
        n = len(g)
        # exactly floor(p*n) dropped, and the dropped are ranks 1..n_drop
        n_drop = int(np.floor(p * n))
        assert int((~g["keep"]).sum()) == n_drop
        assert set(g.loc[~g["keep"], "proto_rank"]) == set(range(1, n_drop + 1))
        assert sorted(g["proto_rank"]) == list(range(1, n + 1))


def test_prototype_prune_deterministic_across_partitioning(ray_session, tmp_path):
    from raydedup.pipelines.similarity import prototype_prune

    d, *_ = _planted_embeddings(tmp_path)
    a = prototype_prune(d, k=4, p=0.2, num_partitions=2).to_pandas().sort_values("vec_id")
    b = prototype_prune(d, k=4, p=0.2, num_partitions=7).to_pandas().sort_values("vec_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_sequence_pack_invariants(ray_session):
    from raydedup.pipelines.sampling import sequence_pack

    budget = 64
    got = sequence_pack(SF, budget=budget).to_pandas()
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    # every document assigned exactly once, with its true token count
    assert sorted(got["doc_id"]) == sorted(src["doc_id"])
    want_toks = dict(zip(src["doc_id"],
                         src["text"].fillna("").str.split(" ").str.len()))
    assert all(want_toks[d] == n for d, n in zip(got["doc_id"], got["n_toks"]))
    # packs respect the budget unless a single oversize doc
    per_pack = got.groupby("pack_id").agg(total=("n_toks", "sum"),
                                          n=("doc_id", "size"))
    over = per_pack[per_pack["total"] > budget]
    assert (over["n"] == 1).all()
    # pack ids embed the bucket; buckets are content-derived
    assert (got["bucket"] == got["doc_id"] % 8).all()
    assert ((got["pack_id"].to_numpy() >> 40) == got["bucket"].to_numpy()).all()
    # packing is reasonably dense: pack count within 1.5x of the LP bound
    fit = got[got["n_toks"] <= budget]
    lower = int(np.ceil(fit.groupby("bucket")["n_toks"].sum() / budget).sum())
    n_packs_fit = fit["pack_id"].nunique()
    assert n_packs_fit <= max(lower + 8, int(1.5 * lower))


def test_sequence_pack_deterministic_across_partitioning(ray_session):
    from raydedup.pipelines.sampling import sequence_pack

    a = sequence_pack(SF, num_partitions=2).to_pandas().sort_values("doc_id")
    b = sequence_pack(SF, num_partitions=7).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_shuffle_rank_matches_brute_force(ray_session):
    import hashlib

    from raydedup.pipelines.sampling import shuffle_rank

    got = shuffle_rank(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id"]).to_pandas()
    want = pd.DataFrame({"doc_id": src["doc_id"].to_numpy(np.int64)})
    want["skey"] = [
        int(hashlib.md5(f"{i}:1".encode()).hexdigest()[:13], 16)
        for i in want["doc_id"]
    ]
    want = want.sort_values(["skey", "doc_id"]).reset_index(drop=True)
    want["shuffle_rank"] = np.arange(1, len(want) + 1, dtype=np.int64)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # ranks are a permutation of 1..N
    assert sorted(got["shuffle_rank"]) == list(range(1, len(got) + 1))


def test_shuffle_rank_epochs_independent(ray_session):
    from raydedup.pipelines.sampling import shuffle_rank

    a = shuffle_rank(SF, epoch=1).to_pandas().set_index("doc_id")["shuffle_rank"]
    b = shuffle_rank(SF, epoch=2).to_pandas().set_index("doc_id")["shuffle_rank"]
    # both are full permutations, but different orders
    assert sorted(a) == sorted(b)
    assert (a != b.reindex(a.index)).any()


def test_shuffle_rank_deterministic_across_partitioning(ray_session):
    from raydedup.pipelines.sampling import shuffle_rank

    a = shuffle_rank(SF, num_partitions=2).to_pandas().sort_values("doc_id")
    b = shuffle_rank(SF, num_partitions=7).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))


def test_embedding_clusters_union_find_oracle(ray_session, tmp_path):
    from raydedup.pipelines.similarity import embedding_clusters, embedding_dup_pairs

    d, base, n_dups, vecs = _planted_embeddings(tmp_path)
    got = (embedding_clusters(d, threshold=0.95).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert len(got) == len(vecs)  # every vector labeled, singletons included
    # sequential union-find oracle over the SAME pair set
    pairs = embedding_dup_pairs(d, threshold=0.95).to_pandas()
    parent = list(range(len(vecs)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want_label = {}
    roots = {}
    for v in range(len(vecs)):
        r = find(v)
        roots.setdefault(r, min(r, v))
    want = [min(x for x in range(len(vecs)) if find(x) == find(v)) for v in range(len(vecs))]
    assert list(got["cluster_id"]) == want
    # planted exact duplicates must share a cluster with their originals
    for i in range(n_dups):
        assert got.loc[got["vec_id"] == base + i, "cluster_id"].iloc[0] == \
               got.loc[got["vec_id"] == i, "cluster_id"].iloc[0]


def _dbscan_oracle(vecs, eps, min_pts):
    """Sequential brute-force twin of similarity.embedding_dbscan's
    deterministic spec (min-label components over the core-core graph,
    border = min core-neighbor label, noise = -1)."""
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norm @ norm.T
    n = len(vecs)
    adj = (sims >= eps) & ~np.eye(n, dtype=bool)
    deg = adj.sum(axis=1)
    core = deg + 1 >= min_pts
    label = np.full(n, -1, dtype=np.int64)
    role = np.array(["noise"] * n, dtype=object)
    seen = np.zeros(n, dtype=bool)
    for s in range(n):
        if not core[s] or seen[s]:
            continue
        comp, stack = [], [s]
        seen[s] = True
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in np.flatnonzero(adj[u] & core & ~seen):
                seen[v] = True
                stack.append(v)
        lab = min(comp)
        for u in comp:
            label[u], role[u] = lab, "core"
    for u in range(n):
        if core[u]:
            continue
        neigh = np.flatnonzero(adj[u] & core)
        if len(neigh):
            label[u] = label[neigh].min()
            role[u] = "border"
    return label, role


def test_embedding_dbscan_matches_brute_force(ray_session, tmp_path):
    from raydedup.pipelines.similarity import embedding_dbscan

    d, base, n_dups, vecs = _planted_embeddings(tmp_path)
    # min_pts high enough that blob-edge members lose core status: the
    # planted fixture then yields all three roles (asserted below)
    eps, min_pts = 0.97, 8
    got = (embedding_dbscan(d, eps_sim=eps, min_pts=min_pts)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    label, role = _dbscan_oracle(vecs, eps, min_pts)
    assert len(got) == len(vecs)
    assert list(got["cluster_id"]) == list(label)
    assert list(got["role"]) == list(role)
    assert {"core", "border", "noise"} <= set(got["role"])


def test_embedding_dbscan_partition_invariant(ray_session, tmp_path):
    from raydedup.pipelines.similarity import embedding_dbscan

    d, *_ = _planted_embeddings(tmp_path, n_clusters=2, per=12, n_dups=5)
    a = (embedding_dbscan(d, eps_sim=0.97, min_pts=4, num_partitions=2)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    b = (embedding_dbscan(d, eps_sim=0.97, min_pts=4, num_partitions=7)
         .to_pandas().sort_values("vec_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
