"""Distributed connected components over the verified pair graph.

Replaces the reference's order-dependent star attribution
(``duplicate_face.py:69-70``: dup → first-seen canonical) with an
order-free rule: cluster id = min ``conv_id`` of the connected component.
Components ⊇ every reference star (each reference pair is a thresholded
edge), which is the ≥0.99 pair-recall argument of SURVEY.md §2.6.

Algorithm: iterative min-label propagation, hash-partitioned by node.
Each iteration is two hash shuffles over edge-sized data with fully
vectorized block functions (pandas merge / groupby-min — no per-group
tasks, no driver-resident state; BTS/ICDE'24-style label propagation).
Convergence is detected with an order-independent checksum of the label
assignment.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.functions.hashing import hash_strings
from raydedup.ray_utils import keyed_blocks

_EMPTY_LABELS = pd.DataFrame(
    {"node": pd.Series([], dtype=object), "label": pd.Series([], dtype=object)}
)


def _label_checksum(labels_ds) -> tuple:
    """Order-independent checksum of (node,label): per-block XOR + wrapping
    sum of pair-hashes, combined on the driver (one tiny row per block —
    no overflow, no shuffle)."""

    def h(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"x": pa.array([], pa.int64()), "s": pa.array([], pa.int64())})
        hn = hash_strings(batch["node"].to_pylist())
        hl = hash_strings(batch["label"].to_pylist())
        v = (hn * np.uint64(0x9E3779B97F4A7C15)) ^ hl
        x = np.bitwise_xor.reduce(v)
        s = v.sum(dtype=np.uint64)  # wrapping mod-2^64 sum
        return pa.table(
            {
                "x": pa.array([np.int64(x.astype(np.int64))]),
                "s": pa.array([np.int64(s.astype(np.int64))]),
            }
        )

    parts = labels_ds.map_batches(h, batch_format="pyarrow").take_all()
    x_all, s_all = np.uint64(0), np.uint64(0)
    for p in parts:
        x_all ^= np.uint64(np.int64(p["x"]).astype(np.uint64))
        s_all += np.uint64(np.int64(p["s"]).astype(np.uint64))
    return int(x_all), int(s_all)


def _min_label_block(df: pd.DataFrame) -> pd.DataFrame:
    if len(df) == 0:
        return _EMPTY_LABELS
    out = df.groupby("node", sort=False).agg(label=("label", "min")).reset_index()
    return out


def _make_propagate_block():
    """Block fn over union(edge rows, label rows) hash-partitioned by node.

    Edge rows have ``nbr`` set, label rows have ``label`` set.  Emits, for
    each node in the block: ``(node, its_label)`` plus ``(nbr, its_label)``
    for every out-edge — all vectorized (merge + concat).
    """

    def propagate(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _EMPTY_LABELS
        lab = df.loc[df["label"].notna(), ["node", "label"]]
        # invariant: exactly one label row per node; guard with a min anyway
        lab = lab.groupby("node", sort=False).agg(label=("label", "min")).reset_index()
        edges = df.loc[df["nbr"].notna(), ["node", "nbr"]]
        sent = edges.merge(lab, on="node", how="inner")[["nbr", "label"]].rename(
            columns={"nbr": "node"}
        )
        return pd.concat([lab, sent], ignore_index=True)

    return propagate


def connected_components(pairs_ds, cfg: DedupConfig):
    """pairs(a,b,...) → (labels_ds(node,label), n_iters).

    Only nodes incident to an edge appear; callers default absent nodes to
    singleton clusters (label = own conv_id).
    """
    edges = pairs_ds.select_columns(["a", "b"])

    def contract_block(df: pd.DataFrame) -> pd.DataFrame:
        """Local union-find per edge block → star edges to block-local roots
        (both directions).  Cuts edge multiplicity and caps the local
        diameter at 2, so global propagation converges in fewer rounds."""
        if len(df) == 0:
            return pd.DataFrame(
                {"node": pd.Series([], dtype=object), "nbr": pd.Series([], dtype=object)}
            )
        a = df["a"].to_numpy(dtype=object)
        b = df["b"].to_numpy(dtype=object)
        nodes, codes = np.unique(np.concatenate([a, b]), return_inverse=True)
        ca, cb = codes[: len(a)], codes[len(a) :]
        parent = np.arange(len(nodes))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for i in range(len(ca)):
            ra, rb = find(ca[i]), find(cb[i])
            if ra != rb:  # smaller index (lexicographically smaller node) wins
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        roots = np.array([find(i) for i in range(len(nodes))])
        non_root = np.flatnonzero(roots != np.arange(len(nodes)))
        n_node = nodes[non_root]
        n_root = nodes[roots[non_root]]
        return pd.DataFrame(
            {
                "node": np.concatenate([n_node, n_root]),
                "nbr": np.concatenate([n_root, n_node]),
            }
        )

    directed = (
        keyed_blocks(
            edges.map_batches(contract_block, batch_format="pandas"),
            ["node"],
            cfg.num_partitions,
        )
        .materialize()
    )

    # initial labels: every node labels itself
    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _EMPTY_LABELS
        nodes = pd.unique(df["node"])
        return pd.DataFrame({"node": nodes, "label": nodes})

    labels = directed.map_batches(init_labels, batch_size=None, batch_format="pandas").materialize()

    with_null_label = directed.map_batches(
        lambda t: t.append_column("label", pa.nulls(t.num_rows, pa.string())),
        batch_format="pyarrow",
    ).materialize()

    propagate = _make_propagate_block()
    prev_sum = None
    n_iters = 0
    for _ in range(cfg.max_cc_iters):
        n_iters += 1
        lab_rows = labels.map_batches(
            lambda t: pa.table(
                {"node": t["node"], "nbr": pa.nulls(t.num_rows, pa.string()), "label": t["label"]}
            ),
            batch_format="pyarrow",
        )
        combined = keyed_blocks(
            with_null_label.union(lab_rows), ["node"], cfg.num_partitions
        )
        msgs = combined.map_batches(propagate, batch_size=None, batch_format="pandas")
        labels = (
            keyed_blocks(msgs, ["node"], cfg.num_partitions)
            .map_batches(_min_label_block, batch_size=None, batch_format="pandas")
            .materialize()
        )
        cur = _label_checksum(labels)
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
    return labels, n_iters
