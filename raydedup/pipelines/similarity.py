"""Similarity search over the ``embeddings`` table
(vec_id:int64, embedding:list<float>, label:int32).

* :func:`knn_bruteforce` — exact cosine top-k: the query matrix is tiny and
  broadcast once (``ray.put``), every block computes a float64 matmul
  against it and emits per-block partial top-k; the driver merges
  NQ×k×blocks candidate rows (small).  This is the distributed analog of
  the reference's linear similarity scan (``duplicate_face.py:64-75``),
  with the scan parallelized over blocks instead of a driver loop.
* :func:`ann_lsh` — the scale path: random-hyperplane LSH buckets
  (deterministic seed) prune candidates before the exact re-rank.
* :func:`embedding_dup_pairs` — embedding-cosine near-duplicate pairs at a
  threshold, exact via block × broadcast-matrix products (documented
  small-matrix assumption; the LSH variant is the scale path).
"""

from __future__ import annotations

from raydedup.ray_utils import read_parquet_clean

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.ray_utils import ensure_hash_shuffle, keyed_blocks


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    ensure_hash_shuffle()
    return read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _matrix(df: pd.DataFrame) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_bruteforce(sf_dir: str, n_queries: int = 8, k: int = 5):
    """Exact cosine top-k for queries ``vec_id < n_queries``.

    Returns (query_id, neighbor_id, rnk) with rnk 1..k ordered by
    (cosine desc, neighbor_id asc).
    """
    import ray

    ds = _read_embeddings(sf_dir)
    qdf = ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    qids = qdf["vec_id"].to_numpy(dtype=np.int64)
    qmat = _normalize(_matrix(qdf))
    q_ref = ray.put((qids, qmat))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "query_id": pd.Series([], dtype=np.int64),
            "neighbor_id": pd.Series([], dtype=np.int64),
            "sim": pd.Series([], dtype=np.float64),
        }
        if len(df) == 0:
            return pd.DataFrame(cols)
        qids_, qmat_ = ray.get(q_ref)
        vids = df["vec_id"].to_numpy(dtype=np.int64)
        m = _normalize(_matrix(df))
        sims = m @ qmat_.T  # (n_block, NQ)
        out_q, out_n, out_s = [], [], []
        for c in range(sims.shape[1]):
            col = sims[:, c]
            mask = vids != qids_[c]
            cand_idx = np.flatnonzero(mask)
            if len(cand_idx) == 0:
                continue
            take = min(len(cand_idx), 2 * k)
            top = cand_idx[np.argsort(-col[cand_idx], kind="stable")[:take]]
            out_q.append(np.full(len(top), qids_[c], dtype=np.int64))
            out_n.append(vids[top])
            out_s.append(col[top])
        if not out_q:
            return pd.DataFrame(cols)
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "sim": np.concatenate(out_s),
            }
        )

    partials = ds.map_batches(partial_topk, batch_format="pandas").to_pandas()
    # driver-side merge of NQ × 2k × n_blocks candidate rows (small)
    partials = partials.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    partials["rnk"] = partials.groupby("query_id").cumcount() + 1
    out = partials[partials["rnk"] <= k][["query_id", "neighbor_id", "rnk"]]
    return pa.Table.from_pandas(
        out.astype({"query_id": np.int64, "neighbor_id": np.int64, "rnk": np.int64}),
        preserve_index=False,
    )


def ann_lsh(sf_dir: str, n_queries: int = 8, k: int = 5, n_planes: int = 8, n_tables: int = 4,
            seed: int = 42):
    """Approximate top-k: random-hyperplane LSH bucket candidates, exact
    cosine re-rank.  Deterministic given the seed; recall < 1 by design
    (the scale path — candidates per query ∝ bucket size, not N)."""
    import ray

    ds = _read_embeddings(sf_dir)
    qdf = ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    qids = qdf["vec_id"].to_numpy(dtype=np.int64)
    qmat = _normalize(_matrix(qdf))
    dim = qmat.shape[1]
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_tables, n_planes, dim)
    pow2 = 1 << np.arange(n_planes, dtype=np.int64)
    q_sig = np.stack(
        [(qmat @ planes[t].T > 0).astype(np.int64) @ pow2 for t in range(n_tables)], axis=1
    )  # (NQ, n_tables)
    q_ref = ray.put((qids, qmat, q_sig))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "query_id": pd.Series([], dtype=np.int64),
            "neighbor_id": pd.Series([], dtype=np.int64),
            "sim": pd.Series([], dtype=np.float64),
        }
        if len(df) == 0:
            return pd.DataFrame(cols)
        qids_, qmat_, q_sig_ = ray.get(q_ref)
        vids = df["vec_id"].to_numpy(dtype=np.int64)
        m = _normalize(_matrix(df))
        sig = np.stack(
            [(m @ planes[t].T > 0).astype(np.int64) @ pow2 for t in range(n_tables)], axis=1
        )
        out_q, out_n, out_s = [], [], []
        for c in range(len(qids_)):
            cand = np.flatnonzero((sig == q_sig_[c][None, :]).any(axis=1) & (vids != qids_[c]))
            if len(cand) == 0:
                continue
            sims = m[cand] @ qmat_[c]
            take = min(len(cand), 2 * k)
            top = np.argsort(-sims, kind="stable")[:take]
            out_q.append(np.full(len(top), qids_[c], dtype=np.int64))
            out_n.append(vids[cand[top]])
            out_s.append(sims[top])
        if not out_q:
            return pd.DataFrame(cols)
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "sim": np.concatenate(out_s),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    partials = partials.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    partials["rnk"] = partials.groupby("query_id").cumcount() + 1
    out = partials[partials["rnk"] <= k][["query_id", "neighbor_id", "rnk"]]
    return pa.Table.from_pandas(
        out.astype({"query_id": np.int64, "neighbor_id": np.int64, "rnk": np.int64}),
        preserve_index=False,
    )


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.9,
                        max_broadcast_rows: int = 100_000):
    """Cosine near-duplicate pairs (a < b, cosine >= threshold).

    Size-gated: up to ``max_broadcast_rows`` vectors the exact
    block × broadcast-matrix path runs (complete result, what the DuckDB
    twin checks); above it the job switches to the LSH-bucketed path
    (:func:`embedding_dup_pairs_lsh`) — recall < 1 by design, never a
    whole-table driver materialization.  The row count comes from parquet
    metadata, not an execution."""
    ds = _read_embeddings(sf_dir)
    if ds.count() > max_broadcast_rows:
        return embedding_dup_pairs_lsh(sf_dir, threshold)
    return _embedding_dup_pairs_exact(ds, threshold)


def _embedding_dup_pairs_exact(ds, threshold: float):
    """Exact all-pairs: each block multiplies against the full normalized
    matrix broadcast once via ``ray.put`` — parallel over blocks, the
    distributed analog of the reference's linear scan
    (``duplicate_face.py:64-75``).  ``est_sim`` carries the exact cosine
    ROUNDed to 4 decimals (f32 input precision bounds cross-engine
    cosine divergence at ~1e-7, so a 1e-4 grid is parity-stable vs the
    DuckDB twin) — the per-pair score export the reference's
    similarity-matrix intent asks for (``README.md:132-138``)."""
    import ray

    all_df = ds.to_pandas()
    all_ids = all_df["vec_id"].to_numpy(dtype=np.int64)
    all_mat = _normalize(_matrix(all_df))
    ref = ray.put((all_ids, all_mat))

    def block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
                "est_sim": pd.Series([], dtype=np.float64)}
        if len(df) == 0:
            return pd.DataFrame(cols)
        ids_, mat_ = ray.get(ref)
        vids = df["vec_id"].to_numpy(dtype=np.int64)
        m = _normalize(_matrix(df))
        sims = m @ mat_.T
        ii, jj = np.nonzero(sims >= threshold)
        a, b = vids[ii], ids_[jj]
        keep = a < b
        return pd.DataFrame({"a": a[keep], "b": b[keep],
                             "est_sim": np.round(sims[ii, jj][keep], 4)})

    return ds.map_batches(block, batch_format="pandas")


def embedding_clusters(sf_dir: str, threshold: float = 0.9,
                       num_partitions: int = 4):
    """(vec_id, cluster_id): transitive closure of the cosine near-dup
    relation — every vector labeled with the MINIMUM vec_id of its
    near-duplicate component (singletons label themselves).  Completes
    the embedding dedup tier from pair level to cluster level, the same
    step the flagship takes from verified pairs to conv clusters (and
    the reference takes from matches to duplicate groups,
    ``duplicate_face.py:77-96``).

    Distribution: pairs from :func:`embedding_dup_pairs` (size-gated
    exact / LSH path), re-keyed to zero-padded string node ids so the
    CC kernel's lexicographic min IS the numeric min, then the shared
    :func:`raydedup.stages.components.connected_components` machinery
    (block contraction → driver endgame or propagation rounds).  The
    final labels join back to the full vec_id column with one union +
    key shuffle (no Dataset.join)."""
    import pyarrow.compute as pc

    from raydedup.config import DedupConfig
    from raydedup.stages.components import connected_components

    def fmt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        return pa.table({
            "a": pc.utf8_lpad(t["a"].cast(pa.string()), 12, "0"),
            "b": pc.utf8_lpad(t["b"].cast(pa.string()), 12, "0"),
        })

    edges = embedding_dup_pairs(sf_dir, threshold).map_batches(
        fmt, batch_format="pyarrow", zero_copy_batch=True
    )
    cfg = DedupConfig(num_partitions=num_partitions)
    labels, _ = connected_components(edges, cfg)

    def lab_rows(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                 "cluster_id": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({
            "vec_id": df["node"].astype(np.int64),
            "cluster_id": df["label"].astype(np.int64),
        })

    def self_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"vec_id": ids, "cluster_id": ids})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                 "cluster_id": pd.Series([], dtype=np.int64)})
        # labeled rows carry the component min; self rows carry vec_id —
        # min() picks the component label when present (label <= vec_id)
        g = df.groupby("vec_id", sort=False)["cluster_id"].min().reset_index()
        return g.astype({"vec_id": np.int64, "cluster_id": np.int64})

    labeled = labels.map_batches(lab_rows, batch_format="pandas")
    ensure_hash_shuffle()
    ids_only = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
    )
    selfs = ids_only.map_batches(self_rows, batch_format="pandas")
    return keyed_blocks(labeled.union(selfs), ["vec_id"], num_partitions).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )


def embedding_dup_pairs_lsh(sf_dir: str, threshold: float = 0.9,
                            n_planes: int = 8, n_tables: int = 8,
                            seed: int = 42, num_partitions: int = 16,
                            bucket_pair_cap: int = 100_000):
    """LSH-bucketed near-dup pair mining — the 100-TB path.

    Random-hyperplane signatures put similar vectors in shared buckets
    (``n_tables`` independent tables × ``n_planes`` bits); a hash shuffle
    on (table, bucket) co-locates each bucket, in-bucket pairs are
    verified with exact cosine (vectorized row-wise dot over the emitted
    pair indices — precision 1.0 relative to the exact path), and one
    more (a, b) shuffle dedups pairs found by several tables.  Recall < 1
    by design: a true pair in no common bucket is missed; at the default
    8×8 config recall for cosine ≥ 0.9 pairs is ≈ 1-(1-(1-acos(.9)/π)^8)^8
    ≈ 0.93 (unit-tested ≥ 0.9 on a clustered fixture)."""
    from raydedup.functions.pairs import (
        dedup_sorted_members,
        emit_bucket_pairs,
        group_ids_from_sorted,
    )
    from raydedup.ray_utils import keyed_blocks

    import pyarrow as pa

    ds = _read_embeddings(sf_dir)

    # the normalized vectors ride the shuffle as Arrow fixed-size-list
    # columns end-to-end (a pandas round-trip of list columns trips Ray's
    # tensor-extension dtype); all math is numpy over the flat values
    def bucket_rows(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "t": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "emb": pa.array([], pa.list_(pa.float64())),
            }
        )
        if tbl.num_rows == 0:
            return empty
        col = tbl["embedding"].combine_chunks()
        offs = col.offsets.to_numpy()
        vals = col.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
        dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
        m = _normalize(
            vals[np.add.outer(offs[:-1].astype(np.int64), np.arange(dim, dtype=np.int64))]
        )
        n = m.shape[0]
        # planes derive deterministically from (seed, dim): every task
        # regenerates the same tiny matrix instead of shipping state
        planes = np.random.RandomState(seed).randn(n_tables, n_planes, dim)
        pow2 = 1 << np.arange(n_planes, dtype=np.int64)
        vids = np.asarray(tbl["vec_id"], dtype=np.int64)
        buckets = np.stack(
            [(m @ planes[t].T > 0).astype(np.int64) @ pow2 for t in range(n_tables)]
        )  # (n_tables, n)
        emb_flat = np.tile(m.reshape(-1), n_tables)
        return pa.table(
            {
                "t": pa.array(np.repeat(np.arange(n_tables, dtype=np.int64), n)),
                "bucket": pa.array(buckets.reshape(-1)),
                "vec_id": pa.array(np.tile(vids, n_tables)),
                "emb": pa.FixedSizeListArray.from_arrays(pa.array(emb_flat), dim).cast(
                    pa.list_(pa.float64())
                ),
            }
        )

    rows = ds.map_batches(bucket_rows, batch_format="pyarrow", zero_copy_batch=True)

    def in_bucket_pairs(tbl: pa.Table) -> pa.Table:
        empty = pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "est_sim": pa.array([], pa.float64())}
        )
        if tbl.num_rows == 0:
            return empty
        tbl = tbl.combine_chunks()
        t = np.asarray(tbl["t"], dtype=np.int64)
        bk = np.asarray(tbl["bucket"], dtype=np.int64)
        vid = np.asarray(tbl["vec_id"], dtype=np.int64)
        emb = tbl["emb"].combine_chunks()
        offs = emb.offsets.to_numpy()
        dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
        vals = emb.values.to_numpy(zero_copy_only=False)
        # gather through offsets (robust to non-zero offset bases after take)
        m = vals[np.add.outer(offs[:-1].astype(np.int64), np.arange(dim, dtype=np.int64))]
        order = np.lexsort((vid, bk, t))
        t, bk, vid, m = t[order], bk[order], vid[order], m[order]
        gid = group_ids_from_sorted(t, bk)
        keep = dedup_sorted_members(gid, vid)
        gid, vid, m = gid[keep], vid[keep], m[keep]
        i, j, _ = emit_bucket_pairs(gid, bucket_pair_cap)
        if len(i) == 0:
            return empty
        sims = np.einsum("ij,ij->i", m[i], m[j])  # exact in-bucket verify
        ok = sims >= threshold
        a, b = vid[i][ok], vid[j][ok]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        # est_sim: exact cosine, same 4-decimal grid as the exact path;
        # identical across tables, so the (a, b) dedup below is score-safe
        return pa.table({"a": pa.array(lo), "b": pa.array(hi),
                         "est_sim": pa.array(np.round(sims[ok], 4))})

    raw = keyed_blocks(rows, ["t", "bucket"], num_partitions).map_batches(
        in_bucket_pairs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True
    )

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64),
                 "est_sim": pd.Series([], dtype=np.float64)}
            )
        return df.drop_duplicates(["a", "b"])

    return keyed_blocks(raw, ["a", "b"], num_partitions).map_batches(
        dedup, batch_size=None, batch_format="pandas"
    )


def embedding_dbscan(sf_dir: str, eps_sim: float = 0.4, min_pts: int = 3,
                     num_partitions: int = 4):
    """(vec_id, cluster_id, role): DBSCAN-style density clustering over
    the embedding cosine graph — the density-based option the reference
    README documents alongside its pairwise matcher
    (``README.md:193-196, 266-271``).

    Semantics (deterministic variant of Ester et al., KDD'96):

    * neighborhood: cosine(u, v) >= ``eps_sim`` (the ε-ball, via the
      size-gated exact/LSH pair miner — same edges as
      :func:`embedding_clusters`);
    * ``u`` is CORE iff its neighborhood including itself has at least
      ``min_pts`` members (degree + 1 >= min_pts);
    * clusters are connected components of the CORE-CORE subgraph,
      labeled by minimum core vec_id (a core with no core neighbor is
      its own cluster — classic DBSCAN keeps lone cores);
    * a non-core with >= 1 core neighbor is BORDER and joins the
      MINIMUM cluster label among its core neighbors (classic DBSCAN
      assigns first-reached — order-dependent; min is the
      deterministic, SQL-expressible refinement);
    * everything else is NOISE with cluster_id = -1.

    Distribution: every step is a keyed shuffle ∝ edges or nodes —
    symmetrize, degree/core flags per node, a v-keyed co-shuffle to
    annotate the far endpoint's coreness, the shared
    :func:`connected_components` machinery on the core-core subgraph,
    a v-keyed label attach for border candidates, and one vec_id fold.
    No broadcast grows with the corpus."""
    import pyarrow.compute as pc

    from raydedup.config import DedupConfig
    from raydedup.stages.components import connected_components

    pairs = embedding_dup_pairs(sf_dir, eps_sim)

    def sym(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64)})
        a = df["a"].to_numpy(np.int64)
        b = df["b"].to_numpy(np.int64)
        return pd.DataFrame({"u": np.concatenate([a, b]),
                             "v": np.concatenate([b, a])})

    edges = keyed_blocks(pairs.map_batches(sym, batch_format="pandas"),
                         ["u"], num_partitions)

    def mark_u(df: pd.DataFrame) -> pd.DataFrame:
        """Per-u degree → u_core flag on every edge row, plus one node
        row (kind=1) per core u (the core inventory)."""
        empty = pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                              "v": pd.Series([], dtype=np.int64),
                              "u_core": pd.Series([], dtype=np.int8),
                              "kind": pd.Series([], dtype=np.int8)})
        if len(df) == 0:
            return empty
        deg = df.groupby("u", sort=False)["v"].transform("size").to_numpy(np.int64)
        u_core = (deg + 1 >= min_pts).astype(np.int8)
        out = pd.DataFrame({"u": df["u"].to_numpy(np.int64),
                            "v": df["v"].to_numpy(np.int64),
                            "u_core": u_core,
                            "kind": np.zeros(len(df), np.int8)})
        cores = np.unique(df["u"].to_numpy(np.int64)[u_core == 1])
        nodes = pd.DataFrame({"u": cores, "v": cores,
                              "u_core": np.ones(len(cores), np.int8),
                              "kind": np.full(len(cores), 1, np.int8)})
        return pd.concat([out, nodes], ignore_index=True)

    marked = edges.map_batches(mark_u, batch_size=None, batch_format="pandas")

    def mark_v(df: pd.DataFrame) -> pd.DataFrame:
        """Co-shuffled on v: node rows (kind=1, u==v) carry v's coreness
        to every edge row ending at v.  Emits core-core edges (kind=0)
        and border-candidate edges non-core u → core v (kind=2)."""
        empty = pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                              "v": pd.Series([], dtype=np.int64),
                              "kind": pd.Series([], dtype=np.int8)})
        if len(df) == 0:
            return empty
        kind = df["kind"].to_numpy()
        core_v = set(df.loc[kind == 1, "v"].to_numpy(np.int64).tolist())
        e = df[kind == 0]
        v = e["v"].to_numpy(np.int64)
        v_core = np.fromiter((x in core_v for x in v), dtype=bool, count=len(v))
        u_core = e["u_core"].to_numpy() == 1
        cc = e[u_core & v_core]
        bc = e[~u_core & v_core]
        return pd.concat([
            pd.DataFrame({"u": cc["u"].to_numpy(np.int64),
                          "v": cc["v"].to_numpy(np.int64),
                          "kind": np.zeros(len(cc), np.int8)}),
            pd.DataFrame({"u": bc["u"].to_numpy(np.int64),
                          "v": bc["v"].to_numpy(np.int64),
                          "kind": np.full(len(bc), 2, np.int8)}),
        ], ignore_index=True)

    marked = marked.materialize()  # consumed twice (mark_v + core inventory)
    split = keyed_blocks(marked, ["v"], num_partitions).map_batches(
        mark_v, batch_size=None, batch_format="pandas"
    ).materialize()  # consumed by two sub-DAGs (CC edges + border rows)

    def fmt_cc(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["kind"], 0))
        if t.num_rows == 0:
            return pa.table({"a": pa.array([], pa.string()),
                             "b": pa.array([], pa.string())})
        return pa.table({
            "a": pc.utf8_lpad(t["u"].cast(pa.string()), 12, "0"),
            "b": pc.utf8_lpad(t["v"].cast(pa.string()), 12, "0"),
        })

    cfg = DedupConfig(num_partitions=num_partitions)
    cc_labels, _ = connected_components(
        split.map_batches(fmt_cc, batch_format="pyarrow", zero_copy_batch=True), cfg
    )

    # node-label table for cores: CC label where present, else self (lone
    # cores); the marked stage's kind=1 rows are the core inventory
    def core_self(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["kind"].to_numpy() == 1]
        ids = m["u"].to_numpy(np.int64)
        return pd.DataFrame({"node": ids, "lab": ids})

    def cc_rows(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "lab": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"node": df["node"].astype(np.int64),
                             "lab": df["label"].astype(np.int64)})

    def lab_fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"node": pd.Series([], dtype=np.int64),
                                 "lab": pd.Series([], dtype=np.int64)})
        return (df.groupby("node", sort=False)["lab"].min().reset_index()
                .astype(np.int64))

    core_labels = keyed_blocks(
        marked.map_batches(core_self, batch_size=None, batch_format="pandas")
        .union(cc_labels.map_batches(cc_rows, batch_format="pandas")),
        ["node"], num_partitions,
    ).map_batches(lab_fold, batch_size=None, batch_format="pandas")

    # border candidates pick up label(v) via a v-keyed attach, then fold
    # min per u; final fold over every vec_id applies the role precedence
    def border_rows(df: pd.DataFrame) -> pd.DataFrame:
        m = df[df["kind"].to_numpy() == 2]
        return pd.DataFrame({"u": m["u"].to_numpy(np.int64),
                             "node": m["v"].to_numpy(np.int64),
                             "lab": np.full(len(m), -1, np.int64),
                             "side": np.zeros(len(m), np.int8)})

    def lab_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": np.full(len(df), -1, np.int64),
                             "node": df["node"].to_numpy(np.int64),
                             "lab": df["lab"].to_numpy(np.int64),
                             "side": np.ones(len(df), np.int8)})

    def attach(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                              "lab": pd.Series([], dtype=np.int64),
                              "pri": pd.Series([], dtype=np.int8)})
        if len(df) == 0:
            return empty
        side = df["side"].to_numpy()
        labs = df[side == 1][["node", "lab"]]
        cand = df[side == 0][["u", "node"]]
        if len(cand) == 0 or len(labs) == 0:
            return empty
        j = cand.merge(labs, on="node")
        return pd.DataFrame({"vec_id": j["u"].to_numpy(np.int64),
                             "lab": j["lab"].to_numpy(np.int64),
                             "pri": np.full(len(j), 1, np.int8)})

    border = keyed_blocks(
        split.map_batches(border_rows, batch_size=None, batch_format="pandas")
        .union(core_labels.map_batches(lab_side, batch_format="pandas")),
        ["node"], num_partitions,
    ).map_batches(attach, batch_size=None, batch_format="pandas")

    def core_pri(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"vec_id": df["node"].to_numpy(np.int64),
                             "lab": df["lab"].to_numpy(np.int64),
                             "pri": np.zeros(len(df), np.int8)})

    def all_pri(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["vec_id"].to_numpy(np.int64)
        return pd.DataFrame({"vec_id": ids,
                             "lab": np.full(len(ids), -1, np.int64),
                             "pri": np.full(len(ids), 2, np.int8)})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                              "cluster_id": pd.Series([], dtype=np.int64),
                              "role": pd.Series([], dtype=object)})
        if len(df) == 0:
            return empty
        best = df.groupby("vec_id", sort=False)["pri"].min()
        j = df.merge(best.rename("best"), left_on="vec_id", right_index=True)
        j = j[j["pri"].to_numpy() == j["best"].to_numpy()]
        g = j.groupby("vec_id", sort=False).agg(
            cluster_id=("lab", "min"), pri=("pri", "min")).reset_index()
        roles = np.array(["core", "border", "noise"], dtype=object)
        g["role"] = roles[g["pri"].to_numpy(np.int8)]
        return g[["vec_id", "cluster_id", "role"]].astype(
            {"vec_id": np.int64, "cluster_id": np.int64})

    ids_only = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id"])
    return keyed_blocks(
        core_labels.map_batches(core_pri, batch_format="pandas")
        .union(border)
        .union(ids_only.map_batches(all_pri, batch_format="pandas")),
        ["vec_id"], num_partitions,
    ).map_batches(final, batch_size=None, batch_format="pandas")


def ann_ivf(sf_dir: str, n_queries: int = 8, k: int = 5, n_cells: int = 16,
            n_probe: int = 4, sample_rows: int = 2048, kmeans_iters: int = 10,
            seed: int = 42):
    """IVF (inverted-file) approximate top-k — the coarse-quantizer scale
    path alongside :func:`ann_lsh`.

    A tiny spherical k-means codebook is trained on a bounded driver-side
    sample (``sample_rows``, deterministic: the table head + seeded init),
    then broadcast once.  Each block assigns its vectors to their nearest
    centroid and scans a vector only for queries probing that cell
    (``n_probe`` nearest cells per query), so scanned candidates per query
    scale with ``n_probe / n_cells`` of the data instead of N.  Exact
    cosine re-rank inside probed cells; same partial-top-k + small driver
    merge as the brute-force path.  Recall < 1 by design (a neighbor whose
    cell is not probed is missed) → no SQL twin.
    """
    import ray

    ds = _read_embeddings(sf_dir)

    # --- codebook: spherical k-means on a bounded sample (driver, tiny) ---
    sample = ds.limit(sample_rows).to_pandas()
    smat = _normalize(_matrix(sample))
    rng = np.random.RandomState(seed)
    n_cells = min(n_cells, len(smat))
    cent = smat[rng.choice(len(smat), size=n_cells, replace=False)]
    for _ in range(kmeans_iters):
        assign = np.argmax(smat @ cent.T, axis=1)
        for c in range(n_cells):
            members = smat[assign == c]
            if len(members):
                cent[c] = members.sum(axis=0)
        cent = _normalize(cent)

    qdf = ds.filter(expr=f"vec_id < {n_queries}").to_pandas()
    qids = qdf["vec_id"].to_numpy(dtype=np.int64)
    qmat = _normalize(_matrix(qdf))
    n_probe = min(n_probe, n_cells)
    q_cells = np.argsort(-(qmat @ cent.T), axis=1, kind="stable")[:, :n_probe]
    ref = ray.put((qids, qmat, q_cells, cent))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "query_id": pd.Series([], dtype=np.int64),
            "neighbor_id": pd.Series([], dtype=np.int64),
            "sim": pd.Series([], dtype=np.float64),
        }
        if len(df) == 0:
            return pd.DataFrame(cols)
        qids_, qmat_, q_cells_, cent_ = ray.get(ref)
        vids = df["vec_id"].to_numpy(dtype=np.int64)
        m = _normalize(_matrix(df))
        cell = np.argmax(m @ cent_.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for c in range(len(qids_)):
            cand = np.flatnonzero(np.isin(cell, q_cells_[c]) & (vids != qids_[c]))
            if len(cand) == 0:
                continue
            sims = m[cand] @ qmat_[c]
            top = np.argsort(-sims, kind="stable")[: min(len(cand), 2 * k)]
            out_q.append(np.full(len(top), qids_[c], dtype=np.int64))
            out_n.append(vids[cand[top]])
            out_s.append(sims[top])
        if not out_q:
            return pd.DataFrame(cols)
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "sim": np.concatenate(out_s),
            }
        )

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    partials = partials.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True]
    )
    partials["rnk"] = partials.groupby("query_id").cumcount() + 1
    out = partials[partials["rnk"] <= k][["query_id", "neighbor_id", "rnk"]]
    return pa.Table.from_pandas(
        out.astype({"query_id": np.int64, "neighbor_id": np.int64, "rnk": np.int64}),
        preserve_index=False,
    )


# ---------------------------------------------------------------- k-means
_KQ = float(1 << 20)  # quantization scale for order-free centroid sums


def kmeans(sf_dir: str, k: int = 8, n_iters: int = 5):
    """(vec_id, centroid_id): Lloyd's k-means over the embeddings table —
    the iterative broadcast + partial-reduce pattern (data-mixing /
    corpus-clustering building block).

    Distribution: centroids are broadcast once per iteration (``ray.put``,
    read inside ``map_batches`` — never re-shipped per batch); each block
    assigns its rows to the nearest centroid (squared Euclidean, ties →
    lowest centroid id) and emits ONE quantized partial-sum frame of
    k × dim rows.  The driver folds the tiny partials (k × dim × blocks
    rows, independent of N) and updates centroids.  Integer-quantized
    sums (``floor(x · 2^20)``) make the update independent of block
    order, so assignments are bit-deterministic across partitioning.
    The table is re-scanned per iteration (streaming, column-pruned) —
    nothing materializes the full dataset.

    Init: the k lowest-``vec_id`` embeddings.  An empty cluster keeps its
    previous centroid.  Analog of the reference's embedding-space
    grouping (``face_recognition_custom.py:104-117``) recast as a global
    objective instead of greedy first-match.
    """
    import ray

    ds = _read_embeddings(sf_dir)
    centroids = _kmeans_centroids(ds, k, n_iters)
    c_ref = ray.put(centroids)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype=np.int64),
                    "centroid_id": pd.Series([], dtype=np.int64),
                }
            )
        c = ray.get(c_ref)
        x = _matrix(df)
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(dtype=np.int64),
                "centroid_id": d2.argmin(axis=1).astype(np.int64),
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


def _kmeans_centroids(ds, k: int, n_iters: int) -> np.ndarray:
    """The Lloyd iteration loop of :func:`kmeans`, factored out so
    centroid-reusing operators (:func:`semdedup`, :func:`prototype_prune`)
    share the same broadcast + quantized-partial pattern and the same
    bit-deterministic result."""
    import ray

    init = ds.filter(expr=f"vec_id < {k}").to_pandas().sort_values("vec_id")
    centroids = _matrix(init)  # (k, d)

    def make_partial(c_ref):
        def partial(df: pd.DataFrame) -> pd.DataFrame:
            cols = {
                "cid": pd.Series([], dtype=np.int64),
                "dim": pd.Series([], dtype=np.int64),
                "sum_q": pd.Series([], dtype=np.int64),
                "n": pd.Series([], dtype=np.int64),
            }
            if len(df) == 0:
                return pd.DataFrame(cols)
            c = ray.get(c_ref)
            x = _matrix(df)
            d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
            a = d2.argmin(axis=1)  # first (lowest cid) wins ties
            q = np.floor(x * _KQ).astype(np.int64)
            kk, d = c.shape
            acc = np.zeros((kk, d), dtype=np.int64)
            np.add.at(acc, a, q)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            return pd.DataFrame(
                {
                    "cid": np.repeat(np.arange(kk, dtype=np.int64), d),
                    "dim": np.tile(np.arange(d, dtype=np.int64), kk),
                    "sum_q": acc.reshape(-1),
                    "n": np.repeat(cnt, d),
                }
            )

        return partial

    for _ in range(n_iters):
        c_ref = ray.put(centroids)
        folded = (
            ds.map_batches(make_partial(c_ref), batch_format="pandas")
            .to_pandas()  # k × dim × blocks rows — tiny at any N
            .groupby(["cid", "dim"], sort=True)
            .agg(sum_q=("sum_q", "sum"), n=("n", "sum"))
            .reset_index()
        )
        kk, d = centroids.shape
        new = centroids.copy()
        sums = np.zeros((kk, d), dtype=np.int64)
        cnts = np.zeros(kk, dtype=np.int64)
        sums[folded["cid"].to_numpy(), folded["dim"].to_numpy()] = folded["sum_q"].to_numpy()
        cnt_rows = folded[folded["dim"] == 0]
        cnts[cnt_rows["cid"].to_numpy()] = cnt_rows["n"].to_numpy()
        nonempty = cnts > 0
        new[nonempty] = sums[nonempty] / (cnts[nonempty, None] * _KQ)
        centroids = new

    return centroids


def _assigned_with_vectors(sf_dir: str, k: int, n_iters: int):
    """(vec_id, centroid_id, embedding) dataset + the centroid matrix —
    the shared front half of the cluster-then-prune curation operators."""
    import ray

    ds = _read_embeddings(sf_dir)
    centroids = _kmeans_centroids(ds, k, n_iters)
    c_ref = ray.put(centroids)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype=np.int64),
                    "centroid_id": pd.Series([], dtype=np.int64),
                    "embedding": pd.Series([], dtype=object),
                }
            )
        c = ray.get(c_ref)
        x = _matrix(df)
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        return pd.DataFrame(
            {
                "vec_id": df["vec_id"].to_numpy(dtype=np.int64),
                "centroid_id": d2.argmin(axis=1).astype(np.int64),
                "embedding": list(df["embedding"]),
            }
        )

    return ds.map_batches(assign, batch_format="pandas"), centroids


def semdedup(sf_dir: str, k: int = 8, tau: float = 0.95, n_iters: int = 5,
             num_partitions: int = 4, chunk: int = 2048):
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication → (vec_id, centroid_id, keep).

    Cluster the embeddings with k-means, then WITHIN each cluster drop
    every vector whose cosine similarity to a lower-``vec_id`` cluster
    member is ≥ ``tau`` (greedy keep-first, deterministic).  The k-means
    gate bounds the quadratic pair work to cluster-local comparisons —
    the paper's trick for making semantic dedup tractable at corpus
    scale; at 100 TB you raise ``k`` so clusters stay ~10⁴ vectors.

    Distribution: centroids are broadcast once; the only shuffle keys the
    (vec_id, cid, embedding) rows by ``centroid_id`` so each cluster is
    block-local; the in-cluster scan is a chunked float64 matmul
    (``chunk`` × cluster rows per step — bounded memory, no n² buffer).
    """
    assigned, _ = _assigned_with_vectors(sf_dir, k, n_iters)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                 "centroid_id": pd.Series([], dtype=np.int64),
                                 "keep": pd.Series([], dtype=bool)})
        outs = []
        for cid, g in df.groupby("centroid_id", sort=False):
            g = g.sort_values("vec_id")
            x = _normalize(_matrix(g))
            n = len(g)
            keep = np.ones(n, dtype=bool)
            for s in range(0, n, chunk):
                e = min(s + chunk, n)
                sims = x[s:e] @ x[:e].T  # rows s..e vs ALL earlier rows
                j = np.arange(e)
                dup = ((sims >= tau) & (j[None, :] < np.arange(s, e)[:, None])).any(1)
                keep[s:e] = ~dup
            outs.append(pd.DataFrame({
                "vec_id": g["vec_id"].to_numpy(np.int64),
                "centroid_id": np.full(n, cid, dtype=np.int64),
                "keep": keep,
            }))
        return pd.concat(outs, ignore_index=True)

    keyed = keyed_blocks(assigned, ["centroid_id"], num_partitions)
    return keyed.map_batches(prune, batch_size=None, batch_format="pandas")


def prototype_prune(sf_dir: str, k: int = 8, p: float = 0.25, n_iters: int = 5,
                    num_partitions: int = 4):
    """SSL-prototypes / D4-style prototypicality pruning (Sorscher et al.
    2022; Tirumala et al. 2023): → (vec_id, centroid_id, proto_rank, keep).

    Cluster with k-means, rank each cluster's members by cosine to their
    OWN centroid (rank 1 = most prototypical), and drop the top ``p``
    fraction per cluster — the published recipe for removing the
    easiest / most redundant examples after semantic dedup.  Ties break
    to the lower ``vec_id`` (dropped first), so output is deterministic.

    Distribution: same shape as :func:`semdedup` minus the pair matmul —
    one centroid broadcast, one ``centroid_id``-keyed shuffle, then a
    per-cluster vectorized rank; per-row cost is one dot product.
    """
    import ray

    assigned, centroids = _assigned_with_vectors(sf_dir, k, n_iters)
    cn = centroids / np.maximum(np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12)
    c_ref = ray.put(cn)

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"vec_id": pd.Series([], dtype=np.int64),
                                 "centroid_id": pd.Series([], dtype=np.int64),
                                 "proto_rank": pd.Series([], dtype=np.int64),
                                 "keep": pd.Series([], dtype=bool)})
        c = ray.get(c_ref)
        outs = []
        for cid, g in df.groupby("centroid_id", sort=False):
            # Fix the row order BEFORE the BLAS call: shuffle arrival order
            # permutes group rows across partitionings, and a row's float
            # dot product is only guaranteed bit-identical when the matrix
            # it sits in is bit-identical.  Sorting makes the gemv input —
            # and therefore every _cos and the (cos, vec_id) rank — exactly
            # partition-invariant (same pattern as semdedup's prune).
            g = g.sort_values("vec_id")
            x = _normalize(_matrix(g))
            cos = x @ c[int(cid)]
            g = g.assign(_cos=cos).sort_values(["_cos", "vec_id"],
                                               ascending=[False, True], kind="stable")
            n = len(g)
            rnk = np.arange(1, n + 1, dtype=np.int64)
            n_drop = int(np.floor(p * n))
            outs.append(pd.DataFrame({
                "vec_id": g["vec_id"].to_numpy(np.int64),
                "centroid_id": np.full(n, cid, dtype=np.int64),
                "proto_rank": rnk,
                "keep": rnk > n_drop,
            }))
        return pd.concat(outs, ignore_index=True)

    keyed = keyed_blocks(assigned, ["centroid_id"], num_partitions)
    return keyed.map_batches(rank, batch_size=None, batch_format="pandas")


_PCAQ = np.int64(1 << 12)  # per-row quantization for order-free Gram sums


def embedding_pca(sf_dir: str, n_components: int = 8):
    """(vec_id, pc0..pc{k-1}): principal-component projection of the
    embeddings table — the dimensionality-reduction building block of
    corpus visualization / clustering / compaction pipelines.

    Distribution (two passes, nothing materializes the table):

    * pass 1 — each block quantizes its rows once (``floor(x · 2^12)``
      int64) and reduces to THREE exactly-mergeable integer partials:
      Σx (d), the Gram matrix ΣxᵀΣx-style ``Xq.T @ Xq`` (d × d, int64
      matmul), and the row count.  Row-level quantization makes the
      integer sums independent of block layout, so the fitted basis is
      bit-deterministic across partitioning (same trick as
      :func:`kmeans`).  Partial volume ∝ blocks × d², never ∝ N.
    * driver — folds the d × d partials, forms the covariance of the
      quantized data, ``eigh``, keeps the top ``n_components``
      eigenvectors (signs fixed: largest-|loading| coordinate made
      positive) — O(d³) on a 64-dim table, trivial.
    * pass 2 — mean + basis broadcast via ``ray.put``; every block
      projects ``(x − μ) @ V`` vectorized.

    Rows-only driver check (no SQL twin — DuckDB has no eig); pytest
    pins the result against a sequential numpy twin of the same
    quantized algorithm (the fitted basis is bit-deterministic; the
    projection matmul agrees to machine epsilon across block layouts)
    and checks the projection is decorrelated with descending variance.
    """
    import ray

    ds = _read_embeddings(sf_dir)

    def gram_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"kind": pd.Series([], dtype=np.int64),
                                 "i": pd.Series([], dtype=np.int64),
                                 "j": pd.Series([], dtype=np.int64),
                                 "v": pd.Series([], dtype=np.int64)})
        xq = np.floor(_matrix(df) * float(_PCAQ)).astype(np.int64)
        d = xq.shape[1]
        g = xq.T @ xq  # exact int64; safe to ~1e12 rows at |x|~1
        s = xq.sum(axis=0)
        ii, jj = np.meshgrid(np.arange(d, dtype=np.int64),
                             np.arange(d, dtype=np.int64), indexing="ij")
        return pd.DataFrame(
            {
                "kind": np.concatenate([np.zeros(d * d, np.int64),
                                        np.ones(d, np.int64),
                                        np.full(1, 2, np.int64)]),
                "i": np.concatenate([ii.reshape(-1), np.arange(d, dtype=np.int64),
                                     np.zeros(1, np.int64)]),
                "j": np.concatenate([jj.reshape(-1), np.zeros(d, np.int64),
                                     np.zeros(1, np.int64)]),
                "v": np.concatenate([g.reshape(-1), s,
                                     np.full(1, len(df), np.int64)]),
            }
        )

    folded = (
        ds.map_batches(gram_partial, batch_format="pandas")
        .to_pandas()  # blocks × (d² + d + 1) int rows — tiny at any N
        .groupby(["kind", "i", "j"], sort=True)["v"].sum().reset_index()
    )
    n = int(folded.loc[folded["kind"] == 2, "v"].iloc[0])
    srows = folded[folded["kind"] == 1].sort_values("i")
    d = len(srows)
    s = srows["v"].to_numpy(np.float64)
    grows = folded[folded["kind"] == 0].sort_values(["i", "j"])
    g = grows["v"].to_numpy(np.float64).reshape(d, d)
    q = float(_PCAQ)
    mean = s / (n * q)
    cov = (g / q**2 - np.outer(s, s) / (q**2 * n)) / max(n - 1, 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:n_components]
    basis = evecs[:, order]  # (d, k)
    # deterministic signs: the largest-|loading| coordinate of each
    # component is made positive (ties → lowest index wins via argmax)
    flip = np.sign(basis[np.abs(basis).argmax(axis=0), np.arange(basis.shape[1])])
    flip[flip == 0] = 1.0
    basis = basis * flip[None, :]
    ref = ray.put((mean, basis))

    def project(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"vec_id": pd.Series([], dtype=np.int64)}
        cols.update({f"pc{c}": pd.Series([], dtype=np.float64)
                     for c in range(n_components)})
        if len(df) == 0:
            return pd.DataFrame(cols)
        mu, v = ray.get(ref)
        proj = (_matrix(df) - mu[None, :]) @ v
        out = {"vec_id": df["vec_id"].to_numpy(np.int64)}
        out.update({f"pc{c}": proj[:, c] for c in range(n_components)})
        return pd.DataFrame(out)

    return ds.map_batches(project, batch_format="pandas")
