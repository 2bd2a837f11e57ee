"""Passage-level (sub-document) overlap operators over ``documents``.

Document-level dedup (``docops.exact_dedup``, ``tiers``) misses the
dominant failure mode of web-scale corpora: REUSED SPANS — boilerplate
navigation, licence blocks, quoted paragraphs — inside otherwise-unique
documents.  CCNet and Dolma both dedup at the paragraph level for this
reason; the fixture's texts carry no newlines, so the passage unit here
is the fixed ``k``-token non-overlapping window (the same unit
``docops.chunk_docs`` splits on), which generalizes the paragraph to
any segmentation the corpus supports.

Reference parity note: the reference has a single whole-record matcher
(``duplicate_face.py:65-75``); sub-record overlap is the text-native
extension of its duplicate test, at the granularity training-data
curation actually uses.

Operators:

* :func:`passage_dedup` — per-document duplicated-passage profile
  (n_passages, n_dup_passages, dup_ratio): the CCNet-style signal a
  curation policy thresholds on ("drop docs that are >50% recycled").
* :func:`dup_passages` — the shared passages themselves (hash, distinct
  docs, occurrences, canonical owner): the boilerplate inventory, and
  the mask-building input for the flagship's boilerplate shingle mask.
* :func:`split_doc_pairs` — continuation detection: doc A's last ``k``
  tokens equal doc B's first ``k`` (chunked uploads, paginated crawls);
  the re-join signal a corpus assembler needs BEFORE dedup decides the
  halves are unrelated.
* :func:`cross_source_overlap` — exact-duplicate leakage matrix between
  sources (n_identical_pairs per source pair): which feeds double-count
  the same content, the first read when weighting a source mixture.
* :func:`passage_scrub` — the passage-dedup TRANSFORM: rebuild each
  document keeping one canonical copy of every duplicated passage
  (CCNet's paragraph-dedup applied as corpus cleaning, not a profile).

Scale shape: every PROFILE operator melts to (md5-key, small-int) rows
at the read — shuffles carry ∝ passage/document COUNT, never text bytes
(the scrub TRANSFORM is the exception by necessity: its output contains
text, so its shuffles carry passage text — see its docstring).
Passage counts per hash are exact after one key shuffle (complete
groups per block); per-document folds ride a second sparse doc_id
shuffle.  ``cross_source_overlap`` pre-aggregates (hash, source) counts
per block, so pair emission is ∝ distinct sources² per duplicated hash
(bounded by the source cardinality, not rows).  Tokenization is the
engine-wide single-space split (== DuckDB ``string_split(text, ' ')``),
so every operator hash-matches its DuckDB twin bit-for-bit.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from raydedup.functions.textstats import md5_fingerprints
from raydedup.ray_utils import (
    default_partitions,
    ensure_hash_shuffle,
    keyed_blocks,
    read_parquet_clean,
)

def _P() -> int:
    """Hash partitions, resolved from the live session at call time
    (see ray_utils.default_partitions); twin/determinism tests pin
    partition-count invariance."""
    return default_partitions()


def _docs(sf_dir: str, columns=None):
    ensure_hash_shuffle()
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def _passage_rows(df: pd.DataFrame, k: int, hex_keys: bool = False) -> pd.DataFrame:
    """Melt each doc into (ph, doc_id) rows — one md5 per ``k``-token
    window (trailing partial window included, so every doc emits ≥1 row:
    DuckDB ``string_split('', ' ')`` == Python ``''.split(' ')`` ==
    ``['']``).  Per-doc loop is the measured-faster choice for short
    windows (same rationale as ``tiers._bow_keys``); md5 stays per-item
    for twin parity.

    ``hex_keys=False`` ships the raw 16-byte digest — half the shuffle
    key bytes of the 32-char hex — for operators whose key is internal
    (``passage_dedup``, ``passage_scrub``); ``dup_passages`` needs hex
    because ``passage_md5`` appears in its OUTPUT and must equal the
    twin's ``md5()`` hex rendering."""
    ids = df["doc_id"].to_numpy(dtype=np.int64)
    out_ids: list = []
    out_ph: list = []
    md5 = hashlib.md5
    for doc_id, text in zip(ids, df["text"]):
        toks = ("" if text is None else text).split(" ")
        for i in range(0, len(toks), k):
            d = md5(" ".join(toks[i : i + k]).encode("utf-8"))
            out_ph.append(d.hexdigest() if hex_keys else d.digest())
            out_ids.append(doc_id)
    return pd.DataFrame(
        {"ph": pd.Series(out_ph, dtype=object),
         "doc_id": np.asarray(out_ids, dtype=np.int64)}
    )


def passage_dedup(sf_dir: str, k: int = 16, num_partitions: int = 0):
    """(doc_id, n_passages, n_dup_passages, dup_ratio): per-document
    duplicated-passage profile.  A passage is "duplicated" when its md5
    occurs more than once in the whole corpus (within- or cross-doc).

    Two shuffles, both ∝ passage rows (≈ tokens/k):
    shuffle 1 on ``ph`` makes the global occurrence count exact
    in-block; blocks emit per-doc PARTIAL (n, n_dup) counter rows;
    shuffle 2 on ``doc_id`` folds the partials and derives the ratio.
    """

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"ph": pd.Series([], dtype=object),
                                 "doc_id": pd.Series([], dtype=np.int64)})
        return _passage_rows(df, k)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "n": pd.Series([], dtype=np.int64),
                              "n_dup": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        dup = df.groupby("ph", sort=False)["doc_id"].transform("size") > 1
        out = (
            pd.DataFrame({"doc_id": df["doc_id"].to_numpy(), "dup": dup.to_numpy()})
            .groupby("doc_id", sort=False)["dup"]
            .agg(n="size", n_dup="sum")
            .reset_index()
        )
        return out.astype({"doc_id": np.int64, "n": np.int64, "n_dup": np.int64})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "n_passages": pd.Series([], dtype=np.int64),
                              "n_dup_passages": pd.Series([], dtype=np.int64),
                              "dup_ratio": pd.Series([], dtype=np.float64)})
        if len(df) == 0:
            return empty
        g = (df.groupby("doc_id", sort=False)
               .agg(n_passages=("n", "sum"), n_dup_passages=("n_dup", "sum"))
               .reset_index())
        g["dup_ratio"] = np.round(
            g["n_dup_passages"].to_numpy(dtype=np.float64)
            / g["n_passages"].to_numpy(dtype=np.float64),
            6,
        )
        return g.astype({"doc_id": np.int64, "n_passages": np.int64,
                         "n_dup_passages": np.int64})

    num_partitions = num_partitions or _P()
    melted = _docs(sf_dir, ["doc_id", "text"]).map_batches(melt, batch_format="pandas")
    flagged = keyed_blocks(melted, ["ph"], num_partitions).map_batches(
        flag, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(flagged, ["doc_id"], num_partitions).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )


def dup_passages(sf_dir: str, k: int = 16, min_count: int = 2,
                 num_partitions: int = 0):
    """(passage_md5, n_docs, n_occurrences, canonical_id): the shared
    passages themselves — every ``k``-token window occurring at least
    ``min_count`` times corpus-wide, with its distinct-document reach and
    min-doc_id owner (T3 canonical semantics).  One ``ph`` shuffle;
    groups are complete per block so every count is exact in-block."""

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"ph": pd.Series([], dtype=object),
                                 "doc_id": pd.Series([], dtype=np.int64)})
        return _passage_rows(df, k, hex_keys=True)

    import pyarrow as pa

    # typed Arrow output: a fully-unique corpus yields an all-empty
    # result, which only keeps its schema as an explicit table
    schema = pa.schema([("passage_md5", pa.string()), ("n_docs", pa.int64()),
                        ("n_occurrences", pa.int64()), ("canonical_id", pa.int64())])

    def fold(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return schema.empty_table()
        g = (df.groupby("ph", sort=False)["doc_id"]
               .agg(n_docs="nunique", n_occurrences="size", canonical_id="min")
               .reset_index()
               .rename(columns={"ph": "passage_md5"}))
        g = g[g["n_occurrences"] >= min_count]
        return pa.table(
            {"passage_md5": pa.array(g["passage_md5"].to_numpy(dtype=object), pa.string()),
             "n_docs": pa.array(g["n_docs"].to_numpy(dtype=np.int64)),
             "n_occurrences": pa.array(g["n_occurrences"].to_numpy(dtype=np.int64)),
             "canonical_id": pa.array(g["canonical_id"].to_numpy(dtype=np.int64))},
            schema=schema,
        )

    melted = _docs(sf_dir, ["doc_id", "text"]).map_batches(melt, batch_format="pandas")
    return keyed_blocks(melted, ["ph"], num_partitions or _P()).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )


def split_doc_pairs(sf_dir: str, k: int = 16, num_partitions: int = 0,
                    max_side: int = 0):
    """(doc_a, doc_b): continuation pairs — doc_a's LAST ``k`` tokens
    equal doc_b's FIRST ``k`` tokens verbatim (doc_a ≠ doc_b; both docs
    must have ≥ k tokens).  The chunk-boundary re-join signal: crawls and
    uploads that split one document in two produce exactly this overlap.

    One hash shuffle on the boundary md5; blocks pair tail-side rows
    against head-side rows with a vectorized in-block merge.  Emission
    is ∝ tails×heads PER boundary hash — with a 16-token boundary the
    collision groups are boilerplate openings (see
    ``tiers.prefix_dup_groups``).  On a corpus whose openings run hot,
    ``max_side > 0`` caps each side per boundary hash at the lowest
    ``max_side`` doc_ids (deterministic; bounds emission at max_side²
    per hash, the same discipline as ``docops.ngram_jaccard_pairs``'s
    df-cap).  The default 0 is exact and is what the DuckDB twin
    certifies."""

    import pyarrow as pa

    melt_schema = pa.schema([("h", pa.binary()), ("side", pa.int8()),
                             ("doc_id", pa.int64())])

    def melt(t: pa.Table) -> pa.Table:
        """Arrow-native boundary extraction: split_pattern → flat token
        values + offsets → numpy index gather of the first/last ``k``
        token slots → binary_join.  The only per-row Python left is the
        two md5 calls per qualifying doc (the boundary strings are short;
        md5 keeps the 16-byte shuffle key and exact-equality semantics —
        a 64-bit hash would mint false pairs at 10^12-doc scale)."""
        import pyarrow.compute as pc

        if t.num_rows == 0:
            return melt_schema.empty_table()
        la = pc.split_pattern(pc.coalesce(t["text"], ""), " ")
        la = la.combine_chunks() if isinstance(la, pa.ChunkedArray) else la
        if la.offset != 0:  # normalize so offsets index `values` directly
            la = pa.concat_arrays([la])
        off = la.offsets.to_numpy()
        n = off[1:] - off[:-1]
        keep = np.flatnonzero(n >= k)
        if keep.size == 0:
            return melt_schema.empty_table()
        ids = t["doc_id"].to_numpy()[keep].astype(np.int64, copy=False)
        span = np.arange(k, dtype=np.int64)
        head_idx = (off[keep, None] + span).ravel()
        tail_idx = (off[keep + 1, None] - k + span).ravel()
        uni_off = pa.array(np.arange(0, (keep.size + 1) * k, k, dtype=np.int32))
        join = pc.binary_join
        heads = join(pa.ListArray.from_arrays(uni_off, la.values.take(pa.array(head_idx))), " ")
        tails = join(pa.ListArray.from_arrays(uni_off, la.values.take(pa.array(tail_idx))), " ")
        md5 = hashlib.md5
        hs = [md5(s.encode("utf-8")).digest() for s in tails.to_pylist()]
        hs += [md5(s.encode("utf-8")).digest() for s in heads.to_pylist()]
        sides = np.zeros(2 * keep.size, np.int8)
        sides[keep.size:] = 1  # tail rows (side 0) then head rows (side 1)
        return pa.table(
            {"h": pa.array(hs, pa.binary()),
             "side": pa.array(sides),
             "doc_id": pa.array(np.concatenate([ids, ids]))},
            schema=melt_schema,
        )

    # typed Arrow output: a corpus without continuation pairs yields an
    # ALL-EMPTY result, which only keeps its schema as an explicit table
    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def pair(df: pd.DataFrame) -> pa.Table:
        empty = schema.empty_table()
        if len(df) == 0:
            return empty
        side = df["side"].to_numpy()
        tails = df.loc[side == 0, ["h", "doc_id"]].rename(columns={"doc_id": "doc_a"})
        heads = df.loc[side == 1, ["h", "doc_id"]].rename(columns={"doc_id": "doc_b"})
        if len(tails) == 0 or len(heads) == 0:
            return empty
        if max_side > 0:
            # deterministic hot-boundary cap: lowest doc_ids per hash
            tails = (tails.sort_values(["h", "doc_a"], kind="mergesort")
                     .groupby("h", sort=False).head(max_side))
            heads = (heads.sort_values(["h", "doc_b"], kind="mergesort")
                     .groupby("h", sort=False).head(max_side))
        m = tails.merge(heads, on="h")
        m = m[m["doc_a"] != m["doc_b"]]
        return pa.table(
            {"doc_a": pa.array(m["doc_a"].to_numpy(dtype=np.int64)),
             "doc_b": pa.array(m["doc_b"].to_numpy(dtype=np.int64))},
            schema=schema,
        )

    melted = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        melt, batch_format="pyarrow", zero_copy_batch=True
    )
    return keyed_blocks(melted, ["h"], num_partitions or _P()).map_batches(
        pair, batch_size=None, batch_format="pandas"
    )


def cross_source_overlap(sf_dir: str, num_partitions: int = 0,
                         passage_k: int = 0):
    """(source_a, source_b, n_pairs): exact-duplicate leakage matrix —
    for every unordered source pair (a < b), the number of document
    pairs whose texts are verbatim-identical across the two sources.
    The double-counting diagnostic a mixture-weighting pass reads first.

    ``passage_k > 0`` switches the unit from whole documents to
    ``passage_k``-token windows (the ``_passage_rows`` segmentation):
    n_pairs then counts cross-source PASSAGE occurrence pairs — the
    sub-document leakage matrix, which catches shared boilerplate and
    quoted spans that whole-text equality misses (and is the variant
    with non-empty output on corpora without verbatim cross-source
    docs, so the DuckDB twin certifies the join path non-vacuously).

    Blocks pre-aggregate (md5, source) counts; one hash shuffle on the
    md5 co-locates each unit's per-source counts, and the in-block
    fold emits n_a×n_b partial rows per cross-source hash (∝ distinct
    sources² per duplicated unit, never rows²); a tiny (source_a,
    source_b) shuffle sums the partials."""

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"h": pd.Series([], dtype=object),
                              "source": pd.Series([], dtype=object),
                              "c": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        if passage_k > 0:
            rows = _passage_rows(
                df.reset_index(drop=True).reset_index(names="_row")
                  .rename(columns={"doc_id": "_doc", "_row": "doc_id"}),
                passage_k,
            )
            src = df["source"].to_numpy(dtype=object)[rows["doc_id"].to_numpy()]
            keyed = pd.DataFrame({"h": rows["ph"], "source": src})
        else:
            keyed = pd.DataFrame({"h": md5_fingerprints(df["text"]),
                                  "source": df["source"].to_numpy(dtype=object)})
        out = (keyed.groupby(["h", "source"], sort=False)
               .size().rename("c").reset_index())
        return out.astype({"c": np.int64})

    import pyarrow as pa

    # explicit Arrow schemas end-to-end: a fixture without cross-source
    # duplicates yields ALL-EMPTY intermediate blocks, and only a typed
    # empty table keeps the schema alive through the final fold (same
    # posture as tiers.prefix_dup_groups / docops.dup_groups)
    part_schema = pa.schema([("source_a", pa.string()), ("source_b", pa.string()),
                             ("n", pa.int64())])
    schema = pa.schema([("source_a", pa.string()), ("source_b", pa.string()),
                        ("n_pairs", pa.int64())])

    def _part_table(out: pd.DataFrame) -> pa.Table:
        return pa.table(
            {"source_a": pa.array(out["source_a"].to_numpy(dtype=object), pa.string()),
             "source_b": pa.array(out["source_b"].to_numpy(dtype=object), pa.string()),
             "n": pa.array(out["n"].to_numpy(dtype=np.int64))},
            schema=part_schema,
        )

    def cross(df: pd.DataFrame) -> pa.Table:
        empty = part_schema.empty_table()
        if len(df) == 0:
            return empty
        # partials for one h may arrive from several input blocks: re-merge
        g = df.groupby(["h", "source"], sort=False)["c"].sum().reset_index()
        multi = g.groupby("h", sort=False)["source"].transform("size") > 1
        g = g[multi]
        if len(g) == 0:
            return empty
        m = g.merge(g, on="h", suffixes=("_a", "_b"))
        m = m[m["source_a"] < m["source_b"]]
        if len(m) == 0:
            return empty
        m["n"] = m["c_a"].to_numpy(dtype=np.int64) * m["c_b"].to_numpy(dtype=np.int64)
        out = m.groupby(["source_a", "source_b"], sort=False)["n"].sum().reset_index()
        return _part_table(out)

    def fold(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return schema.empty_table()
        out = (df.groupby(["source_a", "source_b"], sort=False)["n"]
                 .sum().rename("n_pairs").reset_index())
        return pa.table(
            {"source_a": pa.array(out["source_a"].to_numpy(dtype=object), pa.string()),
             "source_b": pa.array(out["source_b"].to_numpy(dtype=object), pa.string()),
             "n_pairs": pa.array(out["n_pairs"].to_numpy(dtype=np.int64))},
            schema=schema,
        )

    import ray
    import ray.data

    num_partitions = num_partitions or _P()
    pairs = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        pre, batch_format="pandas"
    )
    partial = keyed_blocks(pairs, ["h"], num_partitions).map_batches(
        cross, batch_size=None, batch_format="pandas"
    )
    # final fold is a BOUNDED driver collect (≤ sources² × blocks partial
    # rows — the source cardinality squared, independent of corpus size):
    # Ray's repartition(1) DROPS all-empty blocks and loses the schema, so
    # the corpus-without-cross-source-dups case would surface as a
    # schema-less Dataset; folding the tiny partials on the driver keeps
    # the typed result in both cases
    return ray.data.from_arrow(fold(partial.to_pandas()))


def passage_scrub(sf_dir: str, k: int = 16, num_partitions: int = 0):
    """(doc_id, text, n_kept, n_pruned): the passage-dedup TRANSFORM —
    rebuild each document keeping exactly ONE canonical copy of every
    duplicated passage corpus-wide (the lowest-doc_id, earliest-offset
    occurrence; unique passages always survive).  This is the CCNet-style
    paragraph-dedup applied as corpus cleaning rather than as a profile:
    the output is a drop-in replacement ``documents`` text column.

    Distribution: unlike the profile operators above, the shuffles here
    CARRY PASSAGE TEXT (the output must contain it), so all-to-all
    volume is ∝ corpus bytes — the same posture as the flagship's docs
    reassembly stage, and the honest lower bound for any corpus-rewriting
    transform.  Shuffle 1 on ``ph`` picks each passage's canonical
    occurrence exactly (complete groups per block) and folds dropped
    occurrences to per-doc counter rows; shuffle 2 on ``doc_id``
    reassembles surviving passages in offset order.  Every doc emits at
    least one row into shuffle 2 (each of its passages is either kept or
    counted), so fully-scrubbed docs still appear with text=''."""

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"ph": pd.Series([], dtype=object),
                              "doc_id": pd.Series([], dtype=np.int64),
                              "pidx": pd.Series([], dtype=np.int64),
                              "ptext": pd.Series([], dtype=object)})
        if len(df) == 0:
            return empty
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        md5 = hashlib.md5
        out_ph: list = []
        out_id: list = []
        out_pidx: list = []
        out_pt: list = []
        for doc_id, text in zip(ids, df["text"]):
            toks = ("" if text is None else text).split(" ")
            for pidx, i in enumerate(range(0, len(toks), k)):
                pt = " ".join(toks[i : i + k])
                # internal key: raw digest halves shuffle key bytes
                out_ph.append(md5(pt.encode("utf-8")).digest())
                out_id.append(doc_id)
                out_pidx.append(pidx)
                out_pt.append(pt)
        return pd.DataFrame({"ph": pd.Series(out_ph, dtype=object),
                             "doc_id": np.asarray(out_id, dtype=np.int64),
                             "pidx": np.asarray(out_pidx, dtype=np.int64),
                             "ptext": pd.Series(out_pt, dtype=object)})

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "kind": pd.Series([], dtype=np.int8),
                              "pidx": pd.Series([], dtype=np.int64),
                              "ptext": pd.Series([], dtype=object)})
        if len(df) == 0:
            return empty
        own_doc = df.groupby("ph", sort=False)["doc_id"].transform("min")
        is_own = df["doc_id"].to_numpy() == own_doc.to_numpy()
        own_pidx = df[is_own].groupby("ph", sort=False)["pidx"].min()
        keep_mask = is_own & (
            df["pidx"].to_numpy() == df["ph"].map(own_pidx).to_numpy()
        )
        kept = df.loc[keep_mask, ["doc_id", "pidx", "ptext"]].copy()
        kept["kind"] = np.int8(0)
        dropped = (df.loc[~keep_mask]
                   .groupby("doc_id", sort=False).size().rename("pidx")
                   .reset_index())
        dropped["kind"] = np.int8(2)
        dropped["ptext"] = None
        out = pd.concat(
            [kept[["doc_id", "kind", "pidx", "ptext"]],
             dropped[["doc_id", "kind", "pidx", "ptext"]]],
            ignore_index=True,
        )
        return out.astype({"doc_id": np.int64, "kind": np.int8,
                           "pidx": np.int64})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "text": pd.Series([], dtype=object),
                              "n_kept": pd.Series([], dtype=np.int64),
                              "n_pruned": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        kind = df["kind"].to_numpy()
        k0 = df[kind == 0].sort_values(["doc_id", "pidx"], kind="mergesort")
        text = k0.groupby("doc_id", sort=False)["ptext"].agg(" ".join)
        n_kept = k0.groupby("doc_id", sort=False).size()
        n_pruned = df[kind == 2].groupby("doc_id", sort=False)["pidx"].sum()
        ids = np.unique(df["doc_id"].to_numpy())
        out = pd.DataFrame({"doc_id": ids.astype(np.int64)})
        out["text"] = out["doc_id"].map(text).fillna("")
        out["n_kept"] = out["doc_id"].map(n_kept).fillna(0).astype(np.int64)
        out["n_pruned"] = out["doc_id"].map(n_pruned).fillna(0).astype(np.int64)
        return out

    num_partitions = num_partitions or _P()
    melted = _docs(sf_dir, ["doc_id", "text"]).map_batches(melt, batch_format="pandas")
    decided = keyed_blocks(melted, ["ph"], num_partitions).map_batches(
        keep, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(decided, ["doc_id"], num_partitions).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )
