"""Candidate-pair verification (the analog of the reference's actual
threshold compare — Euclidean tolerance at ``duplicate_face.py:66-67``,
cosine at ``face_recognition_custom.py:104-106`` — applied distributed,
after LSH instead of against a linear index).

Payload attachment avoids a relational join: pairs explode to one row per
endpoint, union with the signature payload rows, and a single hash shuffle
on the endpoint key co-locates each pair endpoint with its payload; a
second shuffle on ``(a, b)`` reunites the two endpoints, and similarity is
computed vectorized per block:

* ``verify_mode="exact"``  — exact Jaccard of the stored shingle-hash sets
  (matches the oracle's threshold exactly);
* ``verify_mode="estimate"`` — agreement fraction of the full MinHash
  signatures, accepted at ``threshold - est_margin``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.ray_utils import keyed_blocks

_PAYLOAD_TYPE = pa.list_(pa.uint64())


def _payload_col(cfg: DedupConfig) -> str:
    return "shingles" if cfg.verify_mode == "exact" else "minhash"


def _endpoint_rows(pairs_ds):
    """pairs → two rows per pair: (endpoint, a, b, side∈{0,1}, payload=null)."""

    def explode(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) else t["a"]
        b = t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) else t["b"]
        a, b = a.cast(pa.string()), b.cast(pa.string())
        n = t.num_rows
        return pa.table(
            {
                "endpoint": pa.concat_arrays([a, b]),
                "a": pa.concat_arrays([a, a]),
                "b": pa.concat_arrays([b, b]),
                "side": pa.array(np.concatenate([np.zeros(n), np.ones(n)]).astype(np.int8)),
                "payload": pa.nulls(2 * n, _PAYLOAD_TYPE),
            }
        )

    return pairs_ds.select_columns(["a", "b"]).map_batches(explode, batch_format="pyarrow")


def _sig_rows(sigs_ds, cfg: DedupConfig):
    col = _payload_col(cfg)

    def tag(t: pa.Table) -> pa.Table:
        payload = t[col].combine_chunks() if isinstance(t[col], pa.ChunkedArray) else t[col]
        payload = payload.cast(_PAYLOAD_TYPE)
        n = t.num_rows
        return pa.table(
            {
                "endpoint": t["conv_id"],
                "a": pa.nulls(n, pa.string()),
                "b": pa.nulls(n, pa.string()),
                "side": pa.array(np.full(n, -1, dtype=np.int8)),
                "payload": payload,
            }
        )

    return sigs_ds.select_columns(["conv_id", col]).map_batches(tag, batch_format="pyarrow")


def _attach_block(df: pd.DataFrame) -> pd.DataFrame:
    """Block fn keyed by endpoint: give each pair-endpoint row its payload."""
    cols = ["a", "b", "side", "payload"]
    if len(df) == 0:
        return df.reindex(columns=cols)
    sig = df.loc[df["side"] == -1, ["endpoint", "payload"]].rename(columns={"payload": "sig_payload"})
    ep = df.loc[df["side"] >= 0, ["endpoint", "a", "b", "side"]]
    m = ep.merge(sig, on="endpoint", how="inner")
    return pd.DataFrame(
        {"a": m["a"], "b": m["b"], "side": m["side"], "payload": m["sig_payload"]}
    )


def make_verify_block(cfg: DedupConfig):
    exact = cfg.verify_mode == "exact"
    tau = cfg.jaccard_threshold if exact else cfg.jaccard_threshold - cfg.est_margin

    empty = pd.DataFrame(
        {
            "a": pd.Series([], dtype=object),
            "b": pd.Series([], dtype=object),
            "est_sim": pd.Series([], dtype=np.float64),
            "source": pd.Series([], dtype=object),
        }
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return empty
        s0 = df.loc[df["side"] == 0, ["a", "b", "payload"]].rename(columns={"payload": "p0"})
        s1 = df.loc[df["side"] == 1, ["a", "b", "payload"]].rename(columns={"payload": "p1"})
        m = s0.merge(s1, on=["a", "b"], how="inner")
        if len(m) == 0:
            return empty
        p0, p1 = m["p0"].to_numpy(), m["p1"].to_numpy()
        sims = np.empty(len(m), dtype=np.float64)
        if exact:
            for i in range(len(m)):
                x = np.asarray(p0[i], dtype=np.uint64)
                y = np.asarray(p1[i], dtype=np.uint64)
                if len(x) == 0 or len(y) == 0:
                    sims[i] = 0.0
                    continue
                inter = len(np.intersect1d(x, y, assume_unique=True))
                sims[i] = inter / (len(x) + len(y) - inter)
        else:
            va = np.stack([np.asarray(v, dtype=np.uint64) for v in p0])
            vb = np.stack([np.asarray(v, dtype=np.uint64) for v in p1])
            sims = (va == vb).mean(axis=1)
        keep = sims >= tau
        return pd.DataFrame(
            {
                "a": m["a"].to_numpy()[keep],
                "b": m["b"].to_numpy()[keep],
                "est_sim": sims[keep],
                "source": np.repeat("minhash", int(keep.sum())).astype(object),
            }
        )

    return verify


def verified_pairs(pairs_ds, sigs_ds, cfg: DedupConfig):
    """candidate pairs → PAIRS rows passing the similarity threshold."""
    combined = _endpoint_rows(pairs_ds).union(_sig_rows(sigs_ds, cfg))
    attached = keyed_blocks(combined, ["endpoint"], cfg.num_partitions).map_batches(
        _attach_block, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(attached, ["a", "b"], cfg.num_partitions).map_batches(
        make_verify_block(cfg), batch_size=None, batch_format="pandas"
    )
