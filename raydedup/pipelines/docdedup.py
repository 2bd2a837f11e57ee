"""Near-duplicate operators over the ``documents`` table, reusing the
transcript-dedup stages (a document is a one-turn conversation).

These are the probabilistic / sketch-based dedup family (MinHash+LSH,
SimHash) re-targeted at the flat document corpus; exact variants live in
``raydedup.pipelines.docops``.  Results are deterministic given the config
seed but not SQL-expressible → rows-only driver check.
"""

from __future__ import annotations

from raydedup.ray_utils import read_parquet_clean

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


def _doc_conv_ids(ids: pd.Series) -> np.ndarray:
    """``doc-<id zero-padded to 10>`` per row — Arrow cast + lpad + join
    kernels (≈4× the per-row ``f"doc-{i:010d}"`` format path, identical
    output for the non-negative ids the fixtures carry)."""
    import pyarrow.compute as pc

    padded = pc.utf8_lpad(pa.array(ids.to_numpy(np.int64)).cast(pa.string()), 10, "0")
    return pc.binary_join_element_wise(pa.scalar("doc-"), padded, "").to_numpy(
        zero_copy_only=False
    )


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
                "conv_id": _doc_conv_ids(df["doc_id"]),
                "doc_text": text.to_numpy(),
                "n_turns": np.ones(len(df), dtype=np.int32),
                "status": status,
            }
        )

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fn, batch_format="pandas")


def minhash_doc_clusters(sf_dir: str, cfg: DedupConfig | None = None):
    """MinHash+LSH near-dup clusters over documents: (conv_id, cluster_id)."""
    cfg = cfg or _doc_config()
    docs = documents_as_docs(sf_dir)
    sigs = compute_signatures(docs, cfg).materialize()
    cands = candidate_pairs(sigs, cfg).materialize()
    # edges feed connected_components exactly once (it contracts and
    # materializes internally), so no barrier here; the join side reads
    # conv_id from the materialized sigs instead of recomputing docs
    edges = verified_pairs(cands, sigs, cfg)
    labels, _ = connected_components(edges, cfg)
    joined = sigs.select_columns(["conv_id"]).join(
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


def exact_doc_clusters(sf_dir: str):
    """(conv_id, cluster_id): exact text-equality clusters (md5 groups,
    min-doc_id label) rendered in the docs id space (``doc-<id>``).

    The SQL-expressible clustering: feeding it to :func:`cluster_report`
    / :func:`cluster_canonicals` certifies their fold/selection logic
    against full DuckDB twins at hash level, while the MinHash-fed
    defaults stay rows-only (sketch clustering has no SQL twin)."""
    from raydedup.pipelines.docops import exact_dedup

    def fmt(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"conv_id": _doc_conv_ids(df["doc_id"]),
                             "cluster_id": _doc_conv_ids(df["canonical_id"])})

    return exact_dedup(sf_dir).map_batches(fmt, batch_format="pandas")


def cluster_report(sf_dir: str, cfg: DedupConfig | None = None, sample: int = 3,
                   clusters=None):
    """Per-cluster size + first-``sample`` members (the reference's faces
    summary table, ``face_recognition_custom.py:140-154`` — A5) over the
    MinHash document clusters (or any (conv_id, cluster_id) Dataset
    passed via ``clusters``): (cluster_id, n_members, members)."""
    cfg = cfg or _doc_config()
    if clusters is None:
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


def suffix_doc_pairs(sf_dir: str, cfg: DedupConfig | None = None):
    """Exact long-repeat pairs over documents: (a, b) linked by a shared
    verbatim span longer than the winnowing window — the suffix-array
    substring pass (flagship stage ``stages/suffix.py``) exposed
    standalone over the flat corpus.  Edges may repeat across shared
    fingerprints inside the stage, so one (a, b) shuffle dedups here.
    Deterministic, not SQL-expressible → rows-only driver check."""
    from raydedup.ray_utils import keyed_blocks
    from raydedup.stages.suffix import suffix_pairs

    cfg = cfg or _doc_config()
    import pyarrow.parquet as pq

    n_docs = pq.ParquetFile(f"{sf_dir}/documents.parquet").metadata.num_rows
    raw = suffix_pairs(documents_as_docs(sf_dir), cfg, n_docs=n_docs)

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"a": pd.Series([], dtype=object), "b": pd.Series([], dtype=object)}
            )
        return df.drop_duplicates(["a", "b"])[["a", "b"]]

    return keyed_blocks(raw, ["a", "b"], cfg.num_partitions).map_batches(
        dedup, batch_size=None, batch_format="pandas"
    )


def minhash_doc_signatures(sf_dir: str, cfg: DedupConfig | None = None):
    """Per-document MinHash + SimHash signature table (conv_id, simhash,
    n_shingles) — the sketch table other pipelines join against."""
    cfg = cfg or _doc_config()
    docs = documents_as_docs(sf_dir)
    return compute_signatures(docs, cfg).select_columns(
        ["conv_id", "simhash", "n_shingles", "status"]
    )


def incremental_dedup(sf_dir: str, cfg: DedupConfig | None = None):
    """Incremental near-dup dedup — the scale analog of the reference's
    growing index (T2, ``duplicate_face.py:57-82``: every new item scanned
    against all accumulated uniques, first match wins).

    A deterministic hash split designates ~25% of documents as the NEW
    batch and the rest as the already-deduplicated corpus.  New docs are
    matched against the corpus AND each other; corpus-vs-corpus pairs are
    never generated (the corpus is assumed deduped — the incremental
    contract).  In a real deployment the corpus signatures are the
    persisted signature checkpoint of previous runs: only the new batch
    pays the signature stage.

    Returns one row per NEW document:
    ``(conv_id, canonical_id, matched_existing)`` — canonical is the
    minimum corpus member of its duplicate component if any
    (``matched_existing=1``), else the minimum new member (a
    first-seen-canonical batch, ``matched_existing=0``), else itself.
    """
    from raydedup.functions.hashing import splitmix64
    from raydedup.ray_utils import keyed_blocks

    cfg = cfg or _doc_config()

    def is_new_mask(conv) -> np.ndarray:
        ids = pd.Series(conv).str[4:].astype(np.int64).to_numpy()
        return (splitmix64(ids.astype(np.uint64)) % np.uint64(4)) == np.uint64(0)

    docs = documents_as_docs(sf_dir)
    sigs = compute_signatures(docs, cfg).materialize()
    # corpus-vs-corpus pairs are pruned INSIDE the bucket emitter — they
    # never enter the (a, b) dedup shuffle (at scale they are the
    # overwhelming majority of bucket pairs)
    new_cands = candidate_pairs(
        sigs, cfg,
        pair_mask_fn=lambda a, b: is_new_mask(a) | is_new_mask(b),
    ).materialize()
    # consumed once by connected_components — no barrier needed
    edges = verified_pairs(new_cands, sigs, cfg)
    labels, _ = connected_components(edges, cfg)

    assigned_schema = pa.schema(
        [("node", pa.string()), ("canonical_id", pa.string()),
         ("matched_existing", pa.int64())]
    )

    def canonical_per_label(df: pd.DataFrame) -> pa.Table:
        # typed empty table: an all-object empty pandas frame would become
        # null-typed arrow columns and wreck the downstream join schema
        if len(df) == 0:
            return assigned_schema.empty_table()
        new = is_new_mask(df["node"])
        # min corpus member per component (sentinel "~" sorts after ids)
        old_min = (
            df.assign(k=np.where(new, "~", df["node"]))
            .groupby("label", sort=False)["k"]
            .transform("min")
        )
        any_old = (old_min != "~").to_numpy()
        all_min = df.groupby("label", sort=False)["node"].transform("min").to_numpy()
        canon = np.where(any_old, old_min.to_numpy(), all_min)
        return pa.table(
            {
                "node": pa.array(df["node"].to_numpy(dtype=object)[new], pa.string()),
                "canonical_id": pa.array(canon[new].astype(object), pa.string()),
                "matched_existing": pa.array(any_old[new].astype(np.int64)),
            },
            schema=assigned_schema,
        )

    assigned = keyed_blocks(labels, ["label"], cfg.num_partitions).map_batches(
        canonical_per_label, batch_size=None, batch_format="pandas"
    )

    # default every new doc to a self-canonical singleton (sentinel
    # matched=-1), union with the component assignments, and resolve with
    # one key shuffle — robust where a left-outer Dataset.join is not
    # (empty right hash partitions of a tiny assigned table break it)
    def new_defaults(df: pd.DataFrame) -> pa.Table:
        conv = df["conv_id"].to_numpy(dtype=object)[is_new_mask(df["conv_id"])]
        return pa.table(
            {
                "node": pa.array(conv, pa.string()),
                "canonical_id": pa.array(conv, pa.string()),
                "matched_existing": pa.array(np.full(len(conv), -1, dtype=np.int64)),
            },
            schema=assigned_schema,
        )

    defaults = sigs.select_columns(["conv_id"]).map_batches(
        new_defaults, batch_format="pandas"
    )

    def resolve(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            out_schema = pa.schema(
                [("conv_id", pa.string()), ("canonical_id", pa.string()),
                 ("matched_existing", pa.int64())]
            )
            return out_schema.empty_table()
        df = df.sort_values(["node", "matched_existing"],
                            ascending=[True, False], kind="stable")
        df = df.drop_duplicates("node", keep="first")
        return pa.table(
            {
                "conv_id": pa.array(df["node"].to_numpy(dtype=object), pa.string()),
                "canonical_id": pa.array(
                    df["canonical_id"].to_numpy(dtype=object), pa.string()
                ),
                "matched_existing": pa.array(
                    np.maximum(df["matched_existing"].to_numpy(np.int64), 0)
                ),
            }
        )

    return keyed_blocks(defaults.union(assigned), ["node"], cfg.num_partitions).map_batches(
        resolve, batch_size=None, batch_format="pandas"
    )


def cluster_canonicals(sf_dir: str, cfg: DedupConfig | None = None,
                       clusters=None):
    """Quality-based canonical selection per near-dup cluster:
    (conv_id, cluster_id, canonical_id, is_canonical) — over the MinHash
    clusters, or any (conv_id, cluster_id) Dataset passed via
    ``clusters``.

    The "which copy do we keep" step after near-dup clustering: the
    canonical is the member with the longest original text (``n_chars``),
    ties broken by lowest conv_id — unlike the reference's first-seen
    star center (order-dependent, ``duplicate_face.py:69-70``), this is a
    deterministic order-free rule.  One inner join to attach lengths and
    one cluster-keyed shuffle; selection is vectorized in-block.
    """
    import ray.data as rd

    from raydedup.ray_utils import keyed_blocks

    cfg = cfg or _doc_config()
    if clusters is None:
        clusters = minhash_doc_clusters(sf_dir, cfg)

    def lens_fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "conv_id": _doc_conv_ids(df["doc_id"]),
                "n_chars": df["n_chars"].to_numpy(dtype=np.int64),
            }
        )

    lens = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"]
    ).map_batches(lens_fn, batch_format="pandas")
    joined = clusters.join(
        lens,
        join_type="inner",
        num_partitions=cfg.num_partitions,
        on=("conv_id",),
        right_on=("conv_id",),
    )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "conv_id": pd.Series([], dtype=object),
                    "cluster_id": pd.Series([], dtype=object),
                    "canonical_id": pd.Series([], dtype=object),
                    "is_canonical": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(
            ["cluster_id", "n_chars", "conv_id"],
            ascending=[True, False, True],
            kind="stable",
        )
        canon = df.groupby("cluster_id", sort=False)["conv_id"].transform("first")
        return pd.DataFrame(
            {
                "conv_id": df["conv_id"].to_numpy(),
                "cluster_id": df["cluster_id"].to_numpy(),
                "canonical_id": canon.to_numpy(),
                "is_canonical": (df["conv_id"] == canon).to_numpy().astype(np.int64),
            }
        )

    return keyed_blocks(joined, ["cluster_id"], cfg.num_partitions).map_batches(
        pick, batch_size=None, batch_format="pandas"
    )
