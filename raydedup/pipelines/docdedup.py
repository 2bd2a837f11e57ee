"""Near-duplicate operators over the ``documents`` table, reusing the
transcript-dedup stages (a document is a one-turn conversation).

These are the probabilistic / sketch-based dedup family (MinHash+LSH,
SimHash) re-targeted at the flat document corpus; exact variants live in
``raydedup.pipelines.docops``.  Results are deterministic given the config
seed but not SQL-expressible → rows-only driver check.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.config import DedupConfig
from raydedup.ray_utils import ensure_hash_shuffle
from raydedup.stages.components import connected_components
from raydedup.stages.lsh import candidate_pairs
from raydedup.stages.signatures import compute_signatures
from raydedup.stages.simhash_pairs import simhash_pairs
from raydedup.stages.verify import verified_pairs


def _doc_config(**overrides) -> DedupConfig:
    base = dict(num_partitions=8, sig_concurrency=(1, 4), jaccard_threshold=0.5)
    base.update(overrides)
    return DedupConfig(**base)


def documents_as_docs(sf_dir: str):
    """documents → DOCS-shaped dataset (conv_id='doc-<id>', doc_text, status)."""
    import ray.data as rd

    ensure_hash_shuffle()

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        from raydedup.functions.textnorm import normalize_array

        text = pd.Series(
            normalize_array(pa.array(df["text"].fillna("").tolist(), pa.string())).to_pylist()
        )
        status = np.where(
            df["text"].isna(), "corrupted",
            np.where(text == "", "no_content", "ok"),
        )
        return pd.DataFrame(
            {
                "conv_id": df["doc_id"].map(lambda i: f"doc-{i:010d}").to_numpy(),
                "doc_text": text.to_numpy(),
                "n_turns": np.ones(len(df), dtype=np.int32),
                "status": status,
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fn, batch_format="pandas")


def minhash_doc_clusters(sf_dir: str, cfg: DedupConfig | None = None):
    """MinHash+LSH near-dup clusters over documents: (conv_id, cluster_id)."""
    cfg = cfg or _doc_config()
    docs = documents_as_docs(sf_dir)
    sigs = compute_signatures(docs, cfg).materialize()
    cands = candidate_pairs(sigs, cfg).materialize()
    edges = verified_pairs(cands, sigs, cfg).materialize()
    labels, _ = connected_components(edges, cfg)
    joined = docs.select_columns(["conv_id"]).join(
        labels,
        join_type="left_outer",
        num_partitions=cfg.num_partitions,
        on=("conv_id",),
        right_on=("node",),
    )

    def finalize(t: pa.Table) -> pa.Table:
        lab = t["label"].to_pylist()
        conv = t["conv_id"].to_pylist()
        out = [l if l is not None else c for l, c in zip(lab, conv)]
        return pa.table({"conv_id": t["conv_id"], "cluster_id": pa.array(out, pa.string())})

    return joined.map_batches(finalize, batch_format="pyarrow")


def simhash_doc_pairs(sf_dir: str, cfg: DedupConfig | None = None):
    """SimHash Hamming-near pairs over documents: (a, b, est_sim, source)."""
    cfg = cfg or _doc_config(hamming_threshold=8)
    docs = documents_as_docs(sf_dir)
    sigs = compute_signatures(docs, cfg).materialize()
    return simhash_pairs(sigs, cfg)


def cluster_report(sf_dir: str, cfg: DedupConfig | None = None, sample: int = 3):
    """Per-cluster size + first-``sample`` members (the reference's faces
    summary table, ``face_recognition_custom.py:140-154`` — A5) over the
    MinHash document clusters: (cluster_id, n_members, members)."""
    cfg = cfg or _doc_config()
    clusters = minhash_doc_clusters(sf_dir, cfg)

    from raydedup.ray_utils import keyed_blocks

    def report(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "cluster_id": pd.Series([], dtype=object),
                    "n_members": pd.Series([], dtype=np.int64),
                    "members": pd.Series([], dtype=object),
                }
            )
        df = df.sort_values(["cluster_id", "conv_id"], kind="stable")
        g = df.groupby("cluster_id", sort=False)["conv_id"]
        out = g.agg([("n_members", "size"), ("members", lambda s: ",".join(s.head(sample)))])
        out = out.reset_index()
        out["n_members"] = out["n_members"].astype(np.int64)
        return out

    return keyed_blocks(clusters, ["cluster_id"], cfg.num_partitions).map_batches(
        report, batch_size=None, batch_format="pandas"
    )


def minhash_doc_signatures(sf_dir: str, cfg: DedupConfig | None = None):
    """Per-document MinHash + SimHash signature table (conv_id, simhash,
    n_shingles) — the sketch table other pipelines join against."""
    cfg = cfg or _doc_config()
    docs = documents_as_docs(sf_dir)
    return compute_signatures(docs, cfg).select_columns(
        ["conv_id", "simhash", "n_shingles", "status"]
    )
