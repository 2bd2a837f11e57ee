"""Tiered exact-family deduplication over the ``documents`` table.

Production dedup is a LADDER, not one operator (RefinedWeb / Gopher /
FineWeb all run several passes of increasing looseness): verbatim
byte-equality first, then canonicalized equality (here: bag-of-words —
token-order-insensitive), then shared-opening (prefix) grouping, with
the sketch tiers (MinHash/SimHash/suffix, ``docdedup``/``dedup``) below
those.  This module adds the SQL-exact rungs the engine was missing and
a per-document tier verdict that names the STRICTEST rung that flags
each doc — the routing signal a curation pipeline keys retention
policies on.  Reference parity note: the reference's matcher has a
single tier (embedding threshold, ``face_recognition_custom.py:104``);
the ladder is the text-native generalization.

Scale shape (all three operators): every key is an md5 hex computed at
the read — shuffles carry (doc_id, 32-char key) rows, volume ∝ row
count, never corpus bytes (same discipline as ``docops.exact_dedup``).
Tokenization is the engine-wide single-space split (``str.split(" ")``
== DuckDB ``string_split(text, ' ')``, empty-token semantics verified
in tests/test_properties.py), so every operator here hash-matches its
DuckDB twin bit-for-bit.
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
    """Hash partitions for the sf-scale query surface — resolved at call
    time from the live Ray session (~1/CPU, floor 8, cap 256; see
    ray_utils.default_partitions).  Partition-count invariance is pinned
    by the determinism tests and DuckDB twins."""
    return default_partitions()

# tier codes, strictest first: exact ⊂ bow (order-insensitive equality
# is implied by equality); prefix is independent of both
_KIND_EXACT, _KIND_BOW, _KIND_PREFIX = 0, 1, 2
_TIER_NAMES = {_KIND_EXACT: "exact", _KIND_BOW: "bow", _KIND_PREFIX: "prefix"}


def _docs(sf_dir: str, columns=None):
    ensure_hash_shuffle()  # before read_parquet: the context binds at creation
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def _bow_keys(texts: pd.Series) -> list:
    """md5 of the sorted-token rendering — matches the DuckDB twin's
    ``md5(array_to_string(list_sort(string_split(text, ' ')), ' '))``
    (binary collation == Python codepoint sort; verified for the ASCII
    fixture alphabet).

    Deliberately a plain loop: for short docs the per-row ``sorted`` +
    ``join`` is ~1 µs/doc, and the measured Arrow alternative
    (split_pattern → flatten → np.lexsort → binary_join) is ~5× SLOWER
    at 300k docs — the flat-array rebuild dominates when lists are
    short.  The md5 itself must stay per-item for twin parity."""
    return [
        hashlib.md5(
            " ".join(sorted(("" if t is None else t).split(" "))).encode("utf-8")
        ).hexdigest()
        for t in texts
    ]


def _prefix_keys(texts: pd.Series, k: int) -> list:
    """md5 of the first ``k`` tokens re-joined — matches
    ``md5(array_to_string(string_split(text, ' ')[1:k], ' '))`` (DuckDB
    list slices are 1-based inclusive ≡ Python ``[:k]``)."""
    return [
        hashlib.md5(
            " ".join(("" if t is None else t).split(" ")[:k]).encode("utf-8")
        ).hexdigest()
        for t in texts
    ]


def bow_dedup(sf_dir: str):
    """(doc_id, canonical_id): canonical = min doc_id sharing the same
    token MULTISET (bag-of-words equality — catches shuffled/reordered
    near-verbatim copies exact dedup misses).  One hash shuffle on the
    32-char bow key; per-block transform('min') exactly as
    ``docops.exact_dedup``."""

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "bow_md5": _bow_keys(df["text"]),
            }
        )

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "canonical_id": pd.Series([], dtype=np.int64)})
        canonical = df.groupby("bow_md5", sort=False)["doc_id"].transform("min")
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "canonical_id": canonical.to_numpy()})

    hashed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        keys, batch_format="pandas"
    )
    return keyed_blocks(hashed, ["bow_md5"], _P()).map_batches(
        block, batch_size=None, batch_format="pandas"
    )


def prefix_dup_groups(sf_dir: str, k: int = 16):
    """Shared-opening groups: (prefix_md5, n_docs, canonical_id) for every
    first-``k``-token prefix shared by >1 document — the boilerplate-
    opening detector (templated intros, shared system prompts).  Same
    two-level aggregate as ``docops.dup_groups``: block pre-aggregation
    would not help here (the group key is already the shuffle key), so
    it is one key shuffle ∝ rows, then an in-block groupby."""

    import pyarrow as pa

    schema = pa.schema(
        [("prefix_md5", pa.string()), ("n_docs", pa.int64()), ("canonical_id", pa.int64())]
    )

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "prefix_md5": _prefix_keys(df["text"], k),
            }
        )

    def block(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return schema.empty_table()
        out = (
            df.groupby("prefix_md5", sort=False)
            .agg(n_docs=("doc_id", "size"), canonical_id=("doc_id", "min"))
            .reset_index()
        )
        out = out[out["n_docs"] > 1]
        return pa.table(
            {
                "prefix_md5": pa.array(out["prefix_md5"].to_numpy(dtype=object), pa.string()),
                "n_docs": pa.array(out["n_docs"].to_numpy(dtype=np.int64)),
                "canonical_id": pa.array(out["canonical_id"].to_numpy(dtype=np.int64)),
            },
            schema=schema,
        )

    hashed = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        keys, batch_format="pandas"
    )
    return keyed_blocks(hashed, ["prefix_md5"], _P()).map_batches(
        block, batch_size=None, batch_format="pandas"
    )


def dedup_tiers(sf_dir: str, k: int = 16, num_partitions: int = 0):
    """Per-document tier verdict → (doc_id, tier): the STRICTEST rung of
    the exact-family ladder that flags the doc as duplicated —
    ``'exact'`` (verbatim copy exists), else ``'bow'`` (token-multiset
    copy exists), else ``'prefix'`` (shares its first-``k``-token opening
    with another doc), else ``'unique'``.

    Distribution (two shuffles, both ∝ rows):

    * read pass computes all three md5 keys per doc and melts to
      (doc_id, kind, h) rows — 3 tiny rows per doc, never text bytes;
    * shuffle 1 keys on (kind, h): each block holds complete key groups
      for every kind, so ``dup = group size > 1`` is exact in-block.
      The exact kind re-emits every doc (the exactly-once carrier row);
      bow/prefix kinds emit only their DUPLICATED docs (sparse);
    * shuffle 2 keys the (doc_id, kind) flag rows on doc_id — volume
      N + (sparse dup flags) — and folds each doc's flags to the
      strictest present tier, emitting each doc exactly once.
    """

    def keys(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        n = len(ids)
        return pd.DataFrame(
            {
                "doc_id": np.tile(ids, 3),
                "kind": np.repeat(
                    np.array([_KIND_EXACT, _KIND_BOW, _KIND_PREFIX], dtype=np.int8), n
                ),
                "h": (
                    md5_fingerprints(df["text"])
                    + _bow_keys(df["text"])
                    + _prefix_keys(df["text"], k)
                ),
            }
        )

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "kind": pd.Series([], dtype=np.int8),
                              "dup": pd.Series([], dtype=bool)})
        if len(df) == 0:
            return empty
        dup = df.groupby(["kind", "h"], sort=False)["doc_id"].transform("size") > 1
        keep = (df["kind"].to_numpy() == _KIND_EXACT) | dup.to_numpy()
        out = df.loc[keep, ["doc_id", "kind"]].copy()
        out["dup"] = dup.to_numpy()[keep]
        return out.astype({"doc_id": np.int64, "kind": np.int8, "dup": bool})

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "tier": pd.Series([], dtype=object)})
        dup_rows = df[df["dup"]]
        # strictest = lowest kind code among duplicated kinds
        best = dup_rows.groupby("doc_id", sort=False)["kind"].min()
        ids = df["doc_id"].unique()
        tier = pd.Series("unique", index=ids, dtype=object)
        tier.loc[best.index] = best.map(_TIER_NAMES).to_numpy()
        return pd.DataFrame({"doc_id": ids.astype(np.int64),
                             "tier": tier.to_numpy(dtype=object)})

    melted = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        keys, batch_format="pandas"
    )
    num_partitions = num_partitions or _P()  # 0 → call-time session size
    flagged = keyed_blocks(melted, ["kind", "h"], num_partitions).map_batches(
        flag, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(flagged, ["doc_id"], num_partitions).map_batches(
        verdict, batch_size=None, batch_format="pandas"
    )
