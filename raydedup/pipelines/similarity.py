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

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.ray_utils import ensure_hash_shuffle


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    ensure_hash_shuffle()
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


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


def embedding_dup_pairs(sf_dir: str, threshold: float = 0.9):
    """Exact cosine near-duplicate pairs (a < b, cosine >= threshold).

    Each block multiplies against the full normalized matrix broadcast via
    ``ray.put`` — exact, and parallel over blocks; assumes the matrix fits
    worker memory (the LSH-bucketed variant in :func:`ann_lsh` is the
    100-TB path)."""
    import ray

    ds = _read_embeddings(sf_dir)
    all_df = ds.to_pandas()
    all_ids = all_df["vec_id"].to_numpy(dtype=np.int64)
    all_mat = _normalize(_matrix(all_df))
    ref = ray.put((all_ids, all_mat))

    def block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"a": pd.Series([], dtype=np.int64), "b": pd.Series([], dtype=np.int64)}
        if len(df) == 0:
            return pd.DataFrame(cols)
        ids_, mat_ = ray.get(ref)
        vids = df["vec_id"].to_numpy(dtype=np.int64)
        m = _normalize(_matrix(df))
        sims = m @ mat_.T
        ii, jj = np.nonzero(sims >= threshold)
        a, b = vids[ii], ids_[jj]
        keep = a < b
        return pd.DataFrame({"a": a[keep], "b": b[keep]})

    return ds.map_batches(block, batch_format="pandas")
