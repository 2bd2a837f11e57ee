"""Weighted and mixture sampling operators for training-data assembly.

Two deterministic, shuffle-light sampling primitives a 100-TB corpus
pipeline needs beyond the engine's plain hash sample (``docops.sample_docs``)
and per-group k-sample (``curation.sample_per_group``):

- ``weighted_sample``: weighted sampling WITHOUT replacement
  (Efraimidis–Spirakis A-Res, Inf. Proc. Letters 2006): each row gets the
  key ``u**(1/w)`` for a uniform ``u`` and weight ``w``; the global top-k
  by key IS an exact weighted sample.  The uniform is derived from
  ``md5(doc_id)`` — no RNG state, reproducible across runs, partitionings
  and cluster sizes, and SQL-twinnable (the DuckDB twin recomputes the
  identical key).
- ``mixture_sample``: class-balance / data-mixing downsample — compute the
  per-group cardinalities (tiny aggregate), derive a per-group quota (the
  minority-group count, the classic balancing mix), then keep each group's
  ``quota`` lowest-hash documents.  Two passes over the corpus, both
  streaming; the quota table is a broadcast small side, never a join.

Scale shape (both): per-block pre-pruning to the local top-k/quota means
the only data movement is ≤ blocks × k (or blocks × groups × quota) rows —
never the corpus.  Reference parity note: the reference has no sampling
surface at all; these are beyond-parity additions for LLM-corpus work
(mixture weighting per Gopher/The Pile-style source mixing).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from raydedup.ray_utils import ensure_hash_shuffle, keyed_blocks, read_parquet_clean

# 13 hex chars = 52 bits — exactly representable in a float64, so
# `(v + 1) / 2**52` is bit-identical between numpy and the DuckDB twin.
_U_HEX = 13
_U_DEN = float(1 << 52)


def _docs(sf_dir: str, columns):
    ensure_hash_shuffle()  # before read_parquet: the context binds at creation
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def _md5_keys52(payloads: list) -> np.ndarray:
    """First 52 bits of md5 over each byte string, as int64 — identical to
    ``int(md5(p).hexdigest()[:13], 16)`` but ~25% faster at 1M keys: one
    raw-digest pass, then a single numpy big-endian parse of the
    concatenated digest buffer instead of per-item hex render + int().
    The md5 itself stays per-item (required: the DuckDB twins recompute
    ``md5(CAST(id AS VARCHAR))`` value-for-value)."""
    if not payloads:
        return np.empty(0, np.int64)
    md5 = hashlib.md5
    buf = b"".join([md5(p).digest() for p in payloads])
    u8 = np.frombuffer(buf, dtype=np.uint8).reshape(-1, 16)[:, :8]
    return (u8.copy().view(">u8").ravel() >> np.uint64(12)).astype(np.int64)


def _md5_uniform(ids: np.ndarray) -> np.ndarray:
    """Deterministic uniform in (0, 1]: first 52 bits of md5(str(id)).

    md5 of a short string is CPU-trivial next to the scan; the per-value
    hashlib call matches the DuckDB twin's ``md5(CAST(id AS VARCHAR))``
    bit-for-bit (a vectorized integer mixer would be faster but has no
    SQL-side equivalent, which would break the correctness contract).
    """
    v = _md5_keys52([str(i).encode() for i in ids.tolist()])
    return (v + 1) / _U_DEN


def weighted_sample(sf_dir: str, k: int = 64):
    """Exact weighted sample without replacement → (doc_id, n_chars, skey).

    A-Res keys: ``skey = ln(u) / w`` with ``w = max(n_chars, 1)`` (the
    log of ``u**(1/w)`` — monotone, so top-k by ``skey`` descending is the
    same sample, and the log form is exact for tiny keys).  Longer
    documents are proportionally more likely to be drawn — the
    byte-weighted sampling used when a token budget, not a doc budget,
    defines the slice.

    Scale shape: two-level top-k exactly like ``docops.longest_docs`` —
    each block keeps its local top-k (argsort over ≤ batch rows), the
    ≤ blocks × k survivors collapse into one tiny block for the exact
    global cut.  No global sort, no shuffle of the corpus.
    """

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        w = np.maximum(df["n_chars"].to_numpy(dtype=np.int64), 1)
        # quantize to 12 decimals: numpy's log and DuckDB's ln differ in
        # the last ULP (~1e-20) on some inputs, which breaks bit-exact
        # comparison with the SQL twin; a 1e-12 grid absorbs that noise
        # (ties, if any, resolve by doc_id identically on both sides)
        skey = np.round(np.log(_md5_uniform(ids)) / w, 12)
        out = pd.DataFrame({"doc_id": ids, "n_chars": df["n_chars"].to_numpy(np.int64),
                            "skey": skey})
        if len(out) > k:
            out = out.sort_values(["skey", "doc_id"], ascending=[False, True],
                                  kind="stable").head(k)
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "n_chars": pd.Series([], dtype=np.int64),
                                 "skey": pd.Series([], dtype=np.float64)})
        return (df.sort_values(["skey", "doc_id"], ascending=[False, True],
                               kind="stable").head(k).reset_index(drop=True))

    cands = _docs(sf_dir, ["doc_id", "n_chars"]).map_batches(
        local_topk, batch_format="pandas"
    )
    return cands.repartition(1).map_batches(final, batch_size=None,
                                            batch_format="pandas")


def mixture_sample(sf_dir: str, group: str = "lang", num_partitions: int = 4):
    """Class-balanced downsample → (doc_id, lang): every language keeps
    exactly ``min_g count(g)`` documents, chosen as the group's
    lowest-``md5(doc_id)`` rows (deterministic, content-free).

    The two-pass broadcast pattern: pass 1 is a per-block ``value_counts``
    partial folded into the global per-group counts (≤ blocks × groups
    rows — a driver-safe small side); the min-count quota then rides into
    pass 2 as a plain closure constant.  Pass 2 prunes each block to its
    local per-group quota-head before the ``group``-keyed shuffle, so the
    exchange moves ≤ blocks × groups × quota rows.
    """

    counts_partial = _docs(sf_dir, [group]).map_batches(
        lambda df: df[group].value_counts().rename_axis(group).reset_index(name="n"),
        batch_format="pandas",
    )
    counts = counts_partial.to_pandas().groupby(group)["n"].sum()  # groups rows — tiny
    if len(counts) == 0:
        return _docs(sf_dir, ["doc_id", group]).limit(0)
    quota = int(counts.min())

    def _key(ids: np.ndarray) -> pd.Series:
        return pd.Series(
            [hashlib.md5(str(i).encode()).hexdigest() for i in ids], dtype=object
        )

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 group: pd.Series([], dtype=object),
                                 "sk": pd.Series([], dtype=object)})
        df = df.assign(sk=_key(df["doc_id"].to_numpy(dtype=np.int64)))
        df = df.sort_values([group, "sk", "doc_id"], kind="stable")
        return df.groupby(group, sort=False).head(quota)[["doc_id", group, "sk"]]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 group: pd.Series([], dtype=object)})
        df = df.sort_values([group, "sk", "doc_id"], kind="stable")
        out = df.groupby(group, sort=False).head(quota).reset_index(drop=True)
        return out[["doc_id", group]].astype({"doc_id": np.int64})

    pruned = _docs(sf_dir, ["doc_id", group]).map_batches(
        local_prune, batch_format="pandas"
    )
    return keyed_blocks(pruned, [group], num_partitions).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def shuffle_rank(sf_dir: str, epoch: int = 1, num_partitions: int = 4):
    """Deterministic epoch-shuffle order → (doc_id, skey, shuffle_rank):
    the global training-data shuffle, as a rank column.  ``skey`` is the
    first 52 bits of ``md5(doc_id || ':' || epoch)`` (unique per epoch —
    changing ``epoch`` re-shuffles the corpus into an independent order)
    and ``shuffle_rank`` is exactly SQL ``ROW_NUMBER() OVER (ORDER BY
    skey, doc_id)`` — no RNG state, reproducible across runs and cluster
    sizes, SQL-twinnable bit-for-bit.

    Scale shape — a global ORDER BY without a global sort (same family
    as ``docops.doc_length_rank``): md5 keys are uniform, so the top 16
    bits partition the key space into 65,536 balanced rank buckets.
    Pass 1 pre-reduces each block to a (bucket, cnt) histogram, one SMALL
    bucket shuffle merges the partials (≤ 65,536 rows total), and the
    cumulative offsets broadcast once via ``ray.put``.  Pass 2 shuffles
    only (doc_id, skey) pairs by bucket — volume ∝ rows, never corpus
    bytes — and ranks each complete bucket in-block with one vectorized
    lexsort: rank = bucket offset + intra-bucket position.  The two
    corpus passes are the streaming trade for never materializing the
    key column (mirrors ``mixture_sample``).
    """
    import ray

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        v = _md5_keys52([f"{i}:{epoch}".encode() for i in ids.tolist()])
        return pd.DataFrame({"doc_id": ids, "skey": v, "bucket": v >> 36})

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        vc = keys(df)["bucket"].value_counts()
        return pd.DataFrame({"bucket": vc.index.to_numpy(np.int64),
                             "cnt": vc.to_numpy(np.int64)})

    def merge_hist(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"bucket": pd.Series([], dtype=np.int64),
                                 "cnt": pd.Series([], dtype=np.int64)})
        agg = df.groupby("bucket", sort=False)["cnt"].sum().reset_index()
        return agg.astype({"bucket": np.int64, "cnt": np.int64})

    docs = _docs(sf_dir, ["doc_id"])
    parts = (
        keyed_blocks(docs.map_batches(hist, batch_format="pandas"),
                     ["bucket"], num_partitions)
        .map_batches(merge_hist, batch_size=None, batch_format="pandas")
        .take_all()
    )
    if parts:
        hp = pd.DataFrame(parts).groupby("bucket", sort=True)["cnt"].sum()
        bvals = hp.index.to_numpy(np.int64)
        # offset[i] = rows in all buckets strictly below bvals[i]
        offs = np.concatenate(([0], np.cumsum(hp.to_numpy(np.int64))[:-1]))
    else:
        bvals, offs = np.empty(0, np.int64), np.empty(0, np.int64)
    dist_ref = ray.put((bvals, offs))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "skey": pd.Series([], dtype=np.int64),
                              "shuffle_rank": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        bv, of = ray.get(dist_ref)
        df = df.sort_values(["bucket", "skey", "doc_id"],
                            kind="stable").reset_index(drop=True)
        base = of[np.searchsorted(bv, df["bucket"].to_numpy(np.int64))]
        intra = df.groupby("bucket", sort=False).cumcount().to_numpy(np.int64)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "skey": df["skey"].to_numpy(np.int64),
                             "shuffle_rank": base + intra + 1})

    keyed = keyed_blocks(docs.map_batches(keys, batch_format="pandas"),
                         ["bucket"], num_partitions)
    return keyed.map_batches(rank, batch_size=None, batch_format="pandas")


def sequence_pack(sf_dir: str, budget: int = 128, num_buckets: int = 8,
                  num_partitions: int = 4):
    """Greedy sequence packing → (doc_id, bucket, pack_id, n_toks): assign
    every document to a fixed-token-budget training sequence (pack) using
    best-fit-decreasing bin packing — the assembly step that turns a
    curated corpus into dense fixed-length training rows (padding waste =
    pack underfill).

    Partitioning assumption (documented, content-derived): packing is
    performed independently within ``doc_id % num_buckets`` buckets, so
    results are bit-deterministic across cluster sizes and partition
    counts — the bucket, NOT the physical partition, is the packing
    domain.  Global pack ids are ``bucket * 2**40 + seq``.  A document
    longer than ``budget`` gets a singleton (oversize) pack.

    Scale shape: one keyed shuffle moves only (doc_id, n_toks) pairs —
    shuffle ∝ rows, not bytes; the per-bucket best-fit loop is
    O(n log n) per-document work (bisect over open-pack capacities), the
    honest cost of bin packing, parallel across buckets.  Raise
    ``num_buckets`` with corpus size to keep buckets worker-local.
    """
    from bisect import bisect_left, insort

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        n = df["text"].fillna("").str.split(" ").str.len().to_numpy(dtype=np.int64)
        return pd.DataFrame({"doc_id": ids, "bucket": ids % num_buckets,
                             "n_toks": n})

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "bucket": pd.Series([], dtype=np.int64),
                              "pack_id": pd.Series([], dtype=np.int64),
                              "n_toks": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        outs = []
        for bucket, g in df.groupby("bucket", sort=False):
            g = g.sort_values(["n_toks", "doc_id"], ascending=[False, True],
                              kind="stable")
            ids = g["doc_id"].to_numpy(np.int64)
            toks = g["n_toks"].to_numpy(np.int64)
            # open packs as a capacity-sorted list of (remaining, pack_seq);
            # best fit = smallest remaining >= need (tightest hole)
            open_caps: list = []
            assign = np.empty(len(ids), dtype=np.int64)
            next_seq = 0
            for i in range(len(ids)):
                need = int(toks[i])
                j = bisect_left(open_caps, (need, -1))
                if need <= budget and j < len(open_caps):
                    rem, seq = open_caps.pop(j)
                    assign[i] = seq
                    insort(open_caps, (rem - need, seq))
                else:
                    assign[i] = next_seq  # new pack (incl. oversize docs)
                    if need < budget:
                        insort(open_caps, (budget - need, next_seq))
                    next_seq += 1
            outs.append(pd.DataFrame({
                "doc_id": ids,
                "bucket": np.full(len(ids), bucket, dtype=np.int64),
                "pack_id": np.int64(bucket) * (np.int64(1) << 40) + assign,
                "n_toks": toks,
            }))
        return pd.concat(outs, ignore_index=True)

    cts = _docs(sf_dir, ["doc_id", "text"]).map_batches(counts, batch_format="pandas")
    return keyed_blocks(cts, ["bucket"], num_partitions).map_batches(
        pack, batch_size=None, batch_format="pandas"
    )


def stratified_sample(sf_dir: str, group: str = "source",
                      num: int = 1, den: int = 10):
    """Proportional stratified sample → (doc_id, source): every stratum
    keeps exactly ``ceil(n_g · num/den)`` documents (integer-exact quota
    ``(n_g·num + den − 1) // den``), chosen as the stratum's
    lowest-``md5(doc_id)`` rows — deterministic, content-free, and
    reproducible across runs/partitionings/cluster sizes.

    Same two-pass broadcast shape as ``mixture_sample``: pass 1 folds the
    per-group cardinalities (≤ blocks × groups rows), the per-group quota
    dict rides into pass 2 as a closure constant, and each block prunes to
    its local per-group quota-head BEFORE the group-keyed shuffle, so the
    exchange moves ≤ blocks × groups × quota rows.  For large sampling
    fractions over a 100-TB corpus prefer a hash-threshold sample
    (``docops.sample_docs``) — rank-exact quotas are for the small
    held-out / eval slices where exact stratum proportions matter.
    """
    counts_partial = _docs(sf_dir, [group]).map_batches(
        lambda df: df[group].value_counts().rename_axis(group).reset_index(name="n"),
        batch_format="pandas",
    )
    counts = counts_partial.to_pandas().groupby(group)["n"].sum()  # tiny
    if len(counts) == 0:
        return _docs(sf_dir, ["doc_id", group]).limit(0)
    quotas = {g: (int(n) * num + den - 1) // den for g, n in counts.items()}

    def _key(ids: np.ndarray) -> pd.Series:
        return pd.Series(
            [hashlib.md5(str(i).encode()).hexdigest() for i in ids], dtype=object
        )

    def _head_by_quota(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([group, "sk", "doc_id"], kind="stable")
        keep = df.groupby(group, sort=False).cumcount() < df[group].map(quotas)
        return df[keep]

    def local_prune(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 group: pd.Series([], dtype=object),
                                 "sk": pd.Series([], dtype=object)})
        df = df.assign(sk=_key(df["doc_id"].to_numpy(dtype=np.int64)))
        return _head_by_quota(df)[["doc_id", group, "sk"]]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 group: pd.Series([], dtype=object)})
        out = _head_by_quota(df).reset_index(drop=True)
        return out[["doc_id", group]].astype({"doc_id": np.int64})

    pruned = _docs(sf_dir, ["doc_id", group]).map_batches(
        local_prune, batch_format="pandas"
    )
    return keyed_blocks(pruned, [group], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )
