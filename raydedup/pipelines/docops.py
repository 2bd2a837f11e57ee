"""Training-data text operators over the ``documents`` table
(doc_id:int64, text, lang, source, n_chars).

Each operator is a Ray Data pipeline with a DuckDB-checkable twin in
``__ray_entry__.oracle_sql`` (column names match exactly).  Patterns:

* per-row maps       → ``map_batches`` (vectorized pandas/pyarrow)
* exact dedup        → hash-repartition by text, per-block min (the
                       distributed analog of the reference's exact-match
                       branch in its linear index scan,
                       ``duplicate_face.py:64-75``)
* grouped aggregates → partial-aggregate per block, then one small hash
                       shuffle on the group key (pre-aggregation keeps the
                       all-to-all exchange proportional to group count,
                       not row count)
* similarity join    → inverted-index explode + two hash shuffles
                       (exact n-gram Jaccard accounting, no driver state)
"""

from __future__ import annotations

from raydedup.ray_utils import read_parquet_clean

import numpy as np
import pandas as pd

from raydedup.functions.textstats import md5_fingerprints, token_counts
from raydedup.ray_utils import default_partitions, ensure_hash_shuffle, keyed_blocks

def _P() -> int:
    """Hash partitions for the sf-scale query surface — resolved at call
    time from the live Ray session (~1/CPU, floor 8, cap 256; see
    ray_utils.default_partitions).  Partition-count invariance is pinned
    by the determinism tests and DuckDB twins."""
    return default_partitions()


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    ensure_hash_shuffle()
    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------- exact dedup
def _hashed_docs(sf_dir: str):
    """(doc_id, text_md5): the 128-bit content key is computed at the read,
    so every downstream exact-dedup shuffle carries a 32-char hex key
    instead of full document bytes (shuffle volume ∝ row count, not corpus
    size).  md5 collisions are accepted as negligible at 2^-64 scale per
    pair — the same identity the DuckDB twins use via ``md5(text)``."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "text_md5": md5_fingerprints(df["text"]),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def exact_dedup(sf_dir: str):
    """(doc_id, canonical_id): canonical = min doc_id sharing the exact text."""

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "canonical_id": pd.Series([], dtype=np.int64)})
        canonical = df.groupby("text_md5", sort=False)["doc_id"].transform("min")
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                             "canonical_id": canonical.to_numpy()})

    return keyed_blocks(_hashed_docs(sf_dir), ["text_md5"], _P()).map_batches(
        block, batch_size=None, batch_format="pandas"
    )


def dup_groups(sf_dir: str):
    """Exact-duplicate groups with >1 member: (text_md5, n_docs, canonical_id)."""

    import pyarrow as pa

    schema = pa.schema(
        [("text_md5", pa.string()), ("n_docs", pa.int64()), ("canonical_id", pa.int64())]
    )

    def block(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return schema.empty_table()
        out = (
            df.groupby("text_md5", sort=False)
            .agg(n_docs=("doc_id", "size"), canonical_id=("doc_id", "min"))
            .reset_index()
        )
        out = out[out["n_docs"] > 1]
        return pa.table(
            {
                "text_md5": pa.array(out["text_md5"].to_numpy(dtype=object), pa.string()),
                "n_docs": pa.array(out["n_docs"].to_numpy(dtype=np.int64)),
                "canonical_id": pa.array(out["canonical_id"].to_numpy(dtype=np.int64)),
            },
            schema=schema,
        )

    return keyed_blocks(_hashed_docs(sf_dir), ["text_md5"], _P()).map_batches(
        block, batch_size=None, batch_format="pandas"
    )


def source_dup_profile(sf_dir: str):
    """Per-source exact-duplication profile → (source, n_docs, n_distinct,
    n_dups): how much of each ingestion source is verbatim-duplicated —
    the diagnostic that decides which sources are worth deduplicating
    (the reference's duplicate-count report, S8, cut by provenance).

    Scale shape: blocks pre-reduce to distinct (source, text_md5, cnt)
    rows (shuffle volume ∝ distinct texts per block, key is the 32-char
    hex, never document bytes); one hash shuffle on ``text_md5``
    co-locates all copies of a text, each partition folds to one
    (source, n_docs, n_distinct) partial per source it saw, and a tiny
    second shuffle on ``source`` (∝ sources × partitions rows) produces
    the exact per-source counts."""

    def with_source(df: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame({"source": df["source"].to_numpy(dtype=object),
                          "text_md5": md5_fingerprints(df["text"])})
            .groupby(["source", "text_md5"], sort=False)
            .size().rename("cnt").reset_index()
        )

    def per_hash(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "n_docs": pd.Series([], dtype=np.int64),
                                 "n_distinct": pd.Series([], dtype=np.int64)})
        g = (df.groupby(["source", "text_md5"], sort=False)["cnt"].sum()
               .reset_index())
        out = (g.groupby("source", sort=False)
                .agg(n_docs=("cnt", "sum"), n_distinct=("text_md5", "size"))
                .reset_index())
        return out.astype({"n_docs": np.int64, "n_distinct": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"source": pd.Series([], dtype=object),
                                 "n_docs": pd.Series([], dtype=np.int64),
                                 "n_distinct": pd.Series([], dtype=np.int64),
                                 "n_dups": pd.Series([], dtype=np.int64)})
        g = (df.groupby("source", sort=False)
               .agg(n_docs=("n_docs", "sum"), n_distinct=("n_distinct", "sum"))
               .reset_index())
        g["n_dups"] = g["n_docs"] - g["n_distinct"]
        return g.astype({"n_docs": np.int64, "n_distinct": np.int64,
                         "n_dups": np.int64})

    partials = _docs(sf_dir, ["doc_id", "text", "source"]).map_batches(
        with_source, batch_format="pandas"
    )
    per = keyed_blocks(partials, ["text_md5"], _P()).map_batches(
        per_hash, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(per, ["source"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def dup_degree_profile(sf_dir: str, num_partitions: int = 0,
                       df_cap: int | None = None):
    """(doc_id, dup_degree) for EVERY document: how many n-gram-Jaccard
    near-duplicate pairs the doc participates in (0 for clean docs) —
    the per-doc severity signal retention policies threshold on, and the
    skew diagnostic for the pair stages (a doc with degree 10⁴ is a
    boilerplate hub that belongs in the df-cap/salting discussion).

    Scale shape: composes :func:`ngram_jaccard_pairs` (already df-capped
    and shuffle-bounded), melts each pair to two (doc_id, 1) endpoint
    rows, unions one (doc_id, 0) marker row per document (so degree-0
    docs survive), and folds with ONE doc_id-keyed shuffle — volume
    ∝ docs + 2·pairs, no join."""

    import pyarrow as pa

    schema = pa.schema([("doc_id", pa.int64()), ("cnt", pa.int64())])

    def melt(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return schema.empty_table()
        ids = pa.concat_arrays([
            t["a"].combine_chunks() if isinstance(t["a"], pa.ChunkedArray) else t["a"],
            t["b"].combine_chunks() if isinstance(t["b"], pa.ChunkedArray) else t["b"],
        ])
        return pa.table(
            {"doc_id": ids, "cnt": pa.array(np.ones(len(ids), dtype=np.int64))},
            schema=schema,
        )

    def marker(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
            "cnt": np.zeros(len(df), dtype=np.int64),
        })

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "dup_degree": pd.Series([], dtype=np.int64)})
        g = df.groupby("doc_id", sort=False)["cnt"].sum().reset_index()
        return pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                             "dup_degree": g["cnt"].to_numpy(np.int64)})

    ends = ngram_jaccard_pairs(
        sf_dir, df_cap=NGRAM_DF_CAP if df_cap is None else df_cap
    ).map_batches(melt, batch_format="pyarrow", zero_copy_batch=True)
    marks = _docs(sf_dir, ["doc_id"]).map_batches(marker, batch_format="pandas")
    return keyed_blocks(ends.union(marks), ["doc_id"],
                        num_partitions or _P()).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )


# ---------------------------------------------------------------- per-row maps
def doc_token_stats(sf_dir: str):
    """(doc_id, n_tokens, n_chars_calc) — whitespace token + char counts."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_tokens": token_counts(df["text"]),
                "n_chars_calc": df["text"].fillna("").str.len().to_numpy(dtype=np.int64),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def doc_quality_flags(sf_dir: str, min_tokens: int = 5):
    """(doc_id, keep): integerized quality gate — the text analog of the
    reference's blur gate (``face_recognition_custom.py:73-77``), flagging
    instead of dropping.  keep=1 iff n_tokens >= min_tokens and digits make
    up <= 30% of characters (10*n_digits <= 3*n_chars)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        n_tok = token_counts(df["text"])
        n_digits = t.str.count(r"[0-9]").to_numpy(dtype=np.int64)
        n_chars = t.str.len().to_numpy(dtype=np.int64)
        keep = (n_tok >= min_tokens) & (10 * n_digits <= 3 * n_chars)
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "keep": keep.astype(np.int64)}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def doc_repetition_stats(sf_dir: str):
    """(doc_id, n_lines, n_dup_lines, top_token_n, rep_keep) — Gopher-style
    intra-document repetition quality metrics (duplicate-line fraction and
    top-token concentration), the standard pretraining-corpus gate for
    boilerplate/spam documents.  Pure vectorized map, no shuffle."""
    from raydedup.functions.textstats import repetition_stats

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        out = repetition_stats(df["text"])
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(),
                "n_lines": out["n_lines"],
                "n_dup_lines": out["n_dup_lines"],
                "top_token_n": out["top_token_n"],
                "rep_keep": out["rep_keep"],
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def doc_fingerprint(sf_dir: str):
    """(doc_id, fp_md5) — whole-document md5 fingerprint."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "fp_md5": md5_fingerprints(df["text"])}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def doc_langid(sf_dir: str):
    """(doc_id, lang_pred) — stopword-overlap language heuristic."""
    from raydedup.functions.textstats import langid

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].to_numpy(), "lang_pred": langid(df["text"])}
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


# ------------------------------------------------------- grouped aggregations
def docs_by_source_lang(sf_dir: str):
    """(source, lang, n_docs, total_chars) — partial agg per block, then one
    small shuffle on the group key."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["source", "lang"], sort=False)
            .agg(n_docs=("doc_id", "size"), total_chars=("n_chars", "sum"))
            .reset_index()
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "source": pd.Series([], dtype=object),
                    "lang": pd.Series([], dtype=object),
                    "n_docs": pd.Series([], dtype=np.int64),
                    "total_chars": pd.Series([], dtype=np.int64),
                }
            )
        out = (
            df.groupby(["source", "lang"], sort=False)
            .agg(n_docs=("n_docs", "sum"), total_chars=("total_chars", "sum"))
            .reset_index()
        )
        out["n_docs"] = out["n_docs"].astype(np.int64)
        out["total_chars"] = out["total_chars"].astype(np.int64)
        return out

    ds = _docs(sf_dir, ["doc_id", "source", "lang", "n_chars"])
    partials = ds.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["source", "lang"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def events_by_user(sf_dir: str):
    """(user_id, n_events, n_types) over the events stream table."""
    import ray.data as rd

    ensure_hash_shuffle()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("user_id", sort=False)
            .agg(n_events=("event_id", "size"), types=("event_type", lambda s: list(set(s))))
            .reset_index()
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "n_types": pd.Series([], dtype=np.int64),
                }
            )
        rows = []
        for uid, g in df.groupby("user_id", sort=False):
            types = set()
            for t in g["types"]:
                types.update(t)
            rows.append((uid, int(g["n_events"].sum()), len(types)))
        out = pd.DataFrame(rows, columns=["user_id", "n_events", "n_types"])
        return out.astype({"user_id": np.int64, "n_events": np.int64, "n_types": np.int64})

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "event_type"]
    )
    partials = ds.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["user_id"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def dup_size_histogram(sf_dir: str):
    """(n_docs, n_groups): distribution of exact-duplicate group sizes —
    the reference's summary-table analog (A4/A5)."""

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"n_docs": pd.Series([], dtype=np.int64),
                 "n_groups": pd.Series([], dtype=np.int64)}
            )
        sizes = df.groupby("text_md5", sort=False).size()
        out = sizes.value_counts().rename_axis("n_docs").rename("n_groups").reset_index()
        return out.astype({"n_docs": np.int64, "n_groups": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"n_docs": pd.Series([], dtype=np.int64),
                 "n_groups": pd.Series([], dtype=np.int64)}
            )
        out = df.groupby("n_docs", sort=False).agg(n_groups=("n_groups", "sum")).reset_index()
        return out.astype({"n_docs": np.int64, "n_groups": np.int64})

    partial = keyed_blocks(_hashed_docs(sf_dir), ["text_md5"], _P()).map_batches(
        block, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(partial, ["n_docs"], 2).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def events_by_type(sf_dir: str):
    """(event_type, n_events) — status-class counting analog (A4)."""
    import ray.data as rd

    ensure_hash_shuffle()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", sort=False).size().rename("n_events").reset_index()
        return out.astype({"n_events": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "n_events": pd.Series([], dtype=np.int64)}
            )
        out = df.groupby("event_type", sort=False).agg(n_events=("n_events", "sum")).reset_index()
        out["n_events"] = out["n_events"].astype(np.int64)
        return out

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type"])
    partials = ds.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["event_type"], 2).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


# ---------------------------------------------- exact n-gram Jaccard pair join
# Tokens in more than this many documents generate no candidate pairs
# (stopword-class tokens at corpus scale).  Pair emission is bounded at
# df_cap²/2 rows per hot token, so the default is the scale lever: the old
# 4096 default was a no-op on the sf0.1 fixture's 31-token hot vocabulary
# and emitted ~240M pair rows (~310 s at 8 CPUs); 512 keeps every token at
# the sf0.01 correctness scale (max df ~402 — the pair logic is fully
# exercised and hash-checked there) while dropping the stopword-class hubs
# (df > 512 ⇒ the token co-occurs in >0.25% of a 200k-doc corpus) that
# no retention policy keys on.  The cap is mirrored verbatim in the DuckDB
# twins (__ray_entry__._ngram_df_cap), so any value is exact by
# construction; tests/test_docops.py additionally checks the cap semantics
# against DuckDB at a small cap.
NGRAM_DF_CAP = 512


def ngram_jaccard_pairs(sf_dir: str, tau_num: int = 1, tau_den: int = 2,
                        df_cap: int = NGRAM_DF_CAP):
    """1-gram (distinct word) Jaccard similarity pairs with
    jaccard >= tau_num/tau_den, via inverted-index explode + hash shuffles.

    Scale shape: each token row carries its document's distinct-token
    count (``n``) through the shuffle, so pair rows reunite both set sizes
    with zero driver-side state; and tokens whose document frequency
    exceeds ``df_cap`` are dropped *inside* the token-keyed block (all
    rows of a token land in one block, so the global df is local) — the
    hot-token analog of the LSH mega-bucket cap, bounding per-token pair
    emission at df_cap²/2.  Intersections count only capped-index tokens
    while union uses full set sizes; the DuckDB twin mirrors the same cap
    so results match by construction.  Output (a, b, n_inter, n_union)
    integer-only for the hash compare.
    """
    raw = _ngram_pair_rows(sf_dir, df_cap)

    def count_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "a": pd.Series([], dtype=np.int64),
            "b": pd.Series([], dtype=np.int64),
            "n_inter": pd.Series([], dtype=np.int64),
            "n_union": pd.Series([], dtype=np.int64),
        }
        if len(df) == 0:
            return pd.DataFrame(cols)
        g = (
            df.groupby(["a", "b"], sort=False)
            .agg(n_inter=("na", "size"), na=("na", "first"), nb=("nb", "first"))
            .reset_index()
        )
        inter = g["n_inter"].to_numpy(dtype=np.int64)
        union = g["na"].to_numpy(dtype=np.int64) + g["nb"].to_numpy(dtype=np.int64) - inter
        keep = tau_den * inter >= tau_num * union
        return pd.DataFrame(
            {
                "a": g["a"].to_numpy(dtype=np.int64)[keep],
                "b": g["b"].to_numpy(dtype=np.int64)[keep],
                "n_inter": inter[keep],
                "n_union": union[keep],
            }
        )

    return keyed_blocks(raw, ["a", "b"], _P()).map_batches(
        count_block, batch_size=None, batch_format="pandas"
    )


def ngram_containment_pairs(sf_dir: str, tau_num: int = 4, tau_den: int = 5,
                            df_cap: int = NGRAM_DF_CAP):
    """Set-containment pairs: (a, b, n_inter, n_min) where the smaller
    document's distinct-token set is >= tau (4/5) inside the other's —
    catches quotes / supersets / partial copies that Jaccard misses when
    the documents' sizes differ a lot.  Same inverted-index shape and
    df-cap as ``ngram_jaccard_pairs`` (one token shuffle + one pair
    shuffle, no driver state)."""
    raw = _ngram_pair_rows(sf_dir, df_cap)

    def count_block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "a": pd.Series([], dtype=np.int64),
            "b": pd.Series([], dtype=np.int64),
            "n_inter": pd.Series([], dtype=np.int64),
            "n_min": pd.Series([], dtype=np.int64),
        }
        if len(df) == 0:
            return pd.DataFrame(cols)
        g = (
            df.groupby(["a", "b"], sort=False)
            .agg(n_inter=("na", "size"), na=("na", "first"), nb=("nb", "first"))
            .reset_index()
        )
        inter = g["n_inter"].to_numpy(dtype=np.int64)
        nmin = np.minimum(g["na"].to_numpy(dtype=np.int64), g["nb"].to_numpy(dtype=np.int64))
        keep = tau_den * inter >= tau_num * nmin
        return pd.DataFrame(
            {
                "a": g["a"].to_numpy(dtype=np.int64)[keep],
                "b": g["b"].to_numpy(dtype=np.int64)[keep],
                "n_inter": inter[keep],
                "n_min": nmin[keep],
            }
        )

    return keyed_blocks(raw, ["a", "b"], _P()).map_batches(
        count_block, batch_size=None, batch_format="pandas"
    )


def _ngram_pair_rows(sf_dir: str, df_cap: int):
    """Shared inverted-index core for the exact n-gram pair operators:
    token explode (each row carrying its doc's distinct-token count) →
    token-keyed shuffle → in-block df-cap + pair emission.  Returns raw
    (a, b, na, nb) rows, one per co-occurring capped token."""
    from raydedup.functions.pairs import (
        dedup_sorted_members,
        emit_bucket_pairs,
        group_ids_from_sorted,
    )

    def tok_rows(df: pd.DataFrame) -> pd.DataFrame:
        # C-level explode + dedup; `pos` keeps docs in input order with
        # tokens sorted ascending within each doc — bit-identical row
        # order to the original per-doc sorted(set(...)) emission, which
        # the downstream cap logic depends on
        toks = df["text"].fillna("").str.lower().str.strip().str.split()
        flat = (
            pd.DataFrame({"pos": np.arange(len(df), dtype=np.int64),
                          "doc_id": df["doc_id"].to_numpy(np.int64),
                          "tok": toks})
            .explode("tok")
            .dropna(subset=["tok"])
            .drop_duplicates(subset=["pos", "tok"])
            .sort_values(["pos", "tok"], kind="stable")
        )
        flat["n"] = flat.groupby("pos", sort=False)["tok"].transform("size").to_numpy(np.int64)
        return (flat[["doc_id", "tok", "n"]].reset_index(drop=True)
                .astype({"doc_id": np.int64, "n": np.int64}))

    toks = _docs(sf_dir, ["doc_id", "text"]).map_batches(tok_rows, batch_format="pandas")

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "a": pd.Series([], dtype=np.int64),
            "b": pd.Series([], dtype=np.int64),
            "na": pd.Series([], dtype=np.int64),
            "nb": pd.Series([], dtype=np.int64),
        }
        if len(df) == 0:
            return pd.DataFrame(cols)
        tok = df["tok"].to_numpy(dtype=object)
        did = df["doc_id"].to_numpy(dtype=np.int64)
        nn = df["n"].to_numpy(dtype=np.int64)
        order = np.lexsort((did, tok))
        tok, did, nn = tok[order], did[order], nn[order]
        gid = group_ids_from_sorted(tok)
        keep = dedup_sorted_members(gid, did)
        gid, did, nn = gid[keep], did[keep], nn[keep]
        # df-cap: drop whole token groups above the document-frequency cap
        sizes = np.bincount(gid)
        small = sizes[gid] <= df_cap
        gid, did, nn = gid[small], did[small], nn[small]
        i, j, _ = emit_bucket_pairs(gid, cap=1 << 30)  # exact within the capped index
        if len(i) == 0:
            return pd.DataFrame(cols)
        return pd.DataFrame({"a": did[i], "b": did[j], "na": nn[i], "nb": nn[j]})

    return keyed_blocks(toks, ["tok"], _P()).map_batches(
        emit, batch_size=None, batch_format="pandas"
    )


def top_tokens(sf_dir: str, k: int = 100):
    """Heavy hitters: top-``k`` tokens by document frequency →
    (tok, df, rnk), rank tie-broken by token text ascending.

    Scale shape: each block pre-reduces its docs to distinct (tok,
    partial-df) rows, one hash shuffle on ``tok`` (volume ∝ vocabulary ×
    blocks, not corpus size) sums exact document frequencies, each block
    keeps only its local top-``k`` candidates, and the final exact top-``k``
    runs over the ≤ partitions × k survivors in a single tiny block —
    the classic two-level heavy-hitter reduction, no driver-side state.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.strip().str.split()
        flat = (
            pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64), "tok": toks})
            .explode("tok")
            .dropna(subset=["tok"])
        )
        # per-doc distinct (set semantics) via one C-level dedup, then df counts
        out = (
            flat.drop_duplicates()
            .groupby("tok", sort=False).size().rename("df").reset_index()
        )
        return out.astype({"df": np.int64})

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"tok": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype=np.int64)})
        out = df.groupby("tok", sort=False).agg(df=("df", "sum")).reset_index()
        out = out.sort_values(["df", "tok"], ascending=[False, True], kind="stable")
        return out.head(k).astype({"df": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"tok": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype=np.int64),
                                 "rnk": pd.Series([], dtype=np.int64)})
        out = df.sort_values(["df", "tok"], ascending=[False, True], kind="stable").head(k)
        out = out.reset_index(drop=True)
        out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out.astype({"df": np.int64, "rnk": np.int64})

    docs = _docs(sf_dir, ["doc_id", "text"])
    partials = docs.map_batches(partial, batch_format="pandas")
    cands = keyed_blocks(partials, ["tok"], _P()).map_batches(
        local_topk, batch_size=None, batch_format="pandas"
    )
    return cands.repartition(1).map_batches(final, batch_size=None, batch_format="pandas")


def length_quantiles(sf_dir: str):
    """Per-source token-count quantiles → (source, p50, p90, p99).

    Exact quantiles without a global sort: token counts are small
    integers, so each block pre-reduces to (source, n_tokens, cnt)
    histogram rows, one small hash shuffle on ``source`` co-locates each
    source's histogram, and the quantile is read off the cumulative
    distribution — count-distribution quantiles, shuffle volume ∝
    sources × distinct lengths, never ∝ rows.  Index semantics match
    DuckDB ``quantile_disc``: sorted position ``ceil(q·n) − 1``.
    """
    qs = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"source": df["source"].to_numpy(dtype=object),
                            "n_tokens": token_counts(df["text"])})
        out = out.groupby(["source", "n_tokens"], sort=False).size().rename("cnt").reset_index()
        return out.astype({"n_tokens": np.int64, "cnt": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"source": pd.Series([], dtype=object)}
        cols.update({name: pd.Series([], dtype=np.int64) for name, _ in qs})
        if len(df) == 0:
            return pd.DataFrame(cols)
        rows = []
        agg = df.groupby(["source", "n_tokens"], sort=False).agg(cnt=("cnt", "sum")).reset_index()
        for src, g in agg.groupby("source", sort=False):
            g = g.sort_values("n_tokens", kind="stable")
            vals = g["n_tokens"].to_numpy(dtype=np.int64)
            cum = np.cumsum(g["cnt"].to_numpy(dtype=np.int64))
            n = cum[-1]
            row = [src]
            for _, q in qs:
                idx = max(0, int(np.ceil(round(q * n, 9))) - 1)
                row.append(int(vals[np.searchsorted(cum, idx + 1)]))
            rows.append(row)
        out = pd.DataFrame(rows, columns=["source"] + [name for name, _ in qs])
        return out.astype({name: np.int64 for name, _ in qs})

    docs = _docs(sf_dir, ["source", "text"])
    partials = docs.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["source"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def sample_docs(sf_dir: str, hex_cap: str = "1f"):
    """Deterministic content-addressed sample → (doc_id, source).

    Keeps a document iff the first two hex chars of ``md5(str(doc_id))``
    are <= ``hex_cap`` ('1f' → 32/256 = a 12.5% sample).  Pure map — no
    shuffle, no RNG state, reproducible across cluster sizes and runs,
    and consistent across tables (any table keyed by doc_id samples the
    same ids) — the standard hash-based sampling idiom for building
    held-out slices of a 100-TB corpus.
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        pref = np.asarray(
            [hashlib_md5_prefix(str(i)) for i in ids], dtype=object
        )
        keep = pref <= hex_cap
        return pd.DataFrame(
            {"doc_id": ids[keep], "source": df["source"].to_numpy(dtype=object)[keep]}
        )

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(fn, batch_format="pandas")


def hashlib_md5_prefix(s: str) -> str:
    import hashlib

    return hashlib.md5(s.encode("utf-8")).hexdigest()[:2]


def docs_enriched(sf_dir: str):
    """Broadcast-join enrichment → (doc_id, source, source_n_docs).

    The map-side join pattern for small dimension tables: the per-source
    count table (rows = #sources, tiny) is aggregated with one partial-agg
    pass, put in the object store ONCE (``ray.put``), and every map task
    reads the shared reference — the 100-TB alternative to shuffling the
    big side for a join whose right side fits in one block.
    """
    import ray

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("source", sort=False).size().rename("n").reset_index()
        return out.astype({"n": np.int64})

    parts = (
        _docs(sf_dir, ["source"])
        .map_batches(count_partial, batch_format="pandas")
        .to_pandas()  # tiny: one row per (source, block)
    )
    dim = parts.groupby("source", sort=False)["n"].sum()
    dim_ref = ray.put(dim.to_dict())

    def enrich(df: pd.DataFrame) -> pd.DataFrame:
        lookup = ray.get(dim_ref)
        src = df["source"].to_numpy(dtype=object)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "source": src,
                "source_n_docs": np.asarray([lookup[s] for s in src], dtype=np.int64),
            }
        )

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(enrich, batch_format="pandas")


def asof_attribution(sf_dir: str, left_type: str = "purchase", right_type: str = "click"):
    """As-of join: each ``left_type`` event attributed to the same user's
    most recent ``right_type`` event at-or-before it →
    (event_id, user_id, attributed_id).

    The as-of/range-join operator Ray Data lacks, composed as one hash
    shuffle on ``user_id`` (rows pre-filtered to the two event types and
    pruned to 4 columns) + a fully vectorized in-block merge: sort by
    (ts, event_id), forward-fill the right-side ids with one
    ``np.maximum.accumulate``, select left rows.  Tie rule — a right
    event at the identical timestamp attributes iff its event_id is
    smaller — makes the result deterministic; the DuckDB twin encodes
    the same rule via LAST_VALUE IGNORE NULLS over (ts, event_id).
    Left rows with no prior right event are dropped (no NULLs → stable
    value hashing).
    """
    import ray.data as rd

    ensure_hash_shuffle()

    def block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "event_id": pd.Series([], dtype=np.int64),
            "user_id": pd.Series([], dtype=np.int64),
            "attributed_id": pd.Series([], dtype=np.int64),
        }
        if len(df) == 0:
            return pd.DataFrame(cols)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy(dtype=np.int64)
        eid = df["event_id"].to_numpy(dtype=np.int64)
        is_right = (df["event_type"] == right_type).to_numpy()
        # forward-fill the running row index of the last right-side event,
        # reset at user boundaries by masking the fill across them
        idx = np.where(is_right, np.arange(len(df)), -1)
        filled = np.maximum.accumulate(idx)
        new_user = np.ones(len(df), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        first_of_user = np.maximum.accumulate(np.where(new_user, np.arange(len(df)), -1))
        ok = (df["event_type"] == left_type).to_numpy() & (filled >= first_of_user)
        return pd.DataFrame(
            {
                "event_id": eid[ok],
                "user_id": uid[ok],
                "attributed_id": eid[filled[ok]],
            }
        )

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    ).filter(expr=f"event_type == '{left_type}' or event_type == '{right_type}'")
    return keyed_blocks(ds, ["user_id"], 4).map_batches(
        block, batch_size=None, batch_format="pandas"
    )


def events_by_window(sf_dir: str, hours: int = 1):
    """Tumbling-window event counts: (window_start, event_type, n_events).

    The windowed-aggregate operator a streaming training-data pipeline
    needs (SURVEY.md §2.5 notes the reference has none — this is engine
    surface beyond parity).  Partial aggregation inside ``map_batches``
    (each block pre-reduces to one row per (window, type)) then one small
    hash shuffle over the reduced keys — never a shuffle of raw events.
    ``window_start`` is emitted as an ISO string so the DuckDB twin
    hash-matches across timestamp dtypes.
    """
    import ray.data as rd

    ensure_hash_shuffle()
    freq = f"{hours}h"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["ts"].dt.floor(freq).dt.strftime("%Y-%m-%d %H:%M:%S")
        out = (
            df.assign(window_start=w)
            .groupby(["window_start", "event_type"], sort=False)
            .size()
            .rename("n_events")
            .reset_index()
        )
        return out.astype({"n_events": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "window_start": pd.Series([], dtype=object),
                    "event_type": pd.Series([], dtype=object),
                    "n_events": pd.Series([], dtype=np.int64),
                }
            )
        out = (
            df.groupby(["window_start", "event_type"], sort=False)
            .agg(n_events=("n_events", "sum"))
            .reset_index()
        )
        return out.astype({"n_events": np.int64})

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    partials = ds.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["window_start", "event_type"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def events_by_hopping_window(sf_dir: str, size_hours: int = 2, hop_hours: int = 1):
    """Hopping (sliding) window event counts: (window_start, event_type,
    n_events), each event counted in ``size/hop`` overlapping windows.

    Same distribution shape as the tumbling ``events_by_window``: the
    window explosion happens inside the partial-aggregation map (each
    block pre-reduces to one row per (window, type) — the explosion
    multiplies *reduced* keys, never raw events leave the block
    unaggregated), then one small hash shuffle over the reduced keys.
    """
    import ray.data as rd

    ensure_hash_shuffle()
    assert size_hours % hop_hours == 0, "window size must be a multiple of the hop"
    ratio = size_hours // hop_hours
    hop = pd.Timedelta(hours=hop_hours)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        base = df["ts"].dt.floor(f"{hop_hours}h")
        frames = [
            pd.DataFrame(
                {"window_start": base - k * hop, "event_type": df["event_type"]}
            )
            for k in range(ratio)
        ]
        allw = pd.concat(frames, ignore_index=True)
        out = (
            allw.assign(
                window_start=allw["window_start"].dt.strftime("%Y-%m-%d %H:%M:%S")
            )
            .groupby(["window_start", "event_type"], sort=False)
            .size()
            .rename("n_events")
            .reset_index()
        )
        return out.astype({"n_events": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "window_start": pd.Series([], dtype=object),
                    "event_type": pd.Series([], dtype=object),
                    "n_events": pd.Series([], dtype=np.int64),
                }
            )
        out = (
            df.groupby(["window_start", "event_type"], sort=False)
            .agg(n_events=("n_events", "sum"))
            .reset_index()
        )
        return out.astype({"n_events": np.int64})

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    partials = ds.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["window_start", "event_type"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def events_rollup(sf_dir: str):
    """ROLLUP(event_type, day) counts: (event_type, day, n_events) rows at
    three levels — (type, day), (type, 'ALL') and ('ALL', 'ALL') — the
    multi-level report aggregate.

    One partial aggregation per block (reduced to (type, day) keys), one
    hash shuffle on ``event_type``: because the shuffle co-locates every
    row of a type, the per-type subtotal is computed in-block with no
    extra exchange; the grand total folds from the per-type subtotals on
    the driver (#types rows — metadata-sized at any scale).
    """
    import pyarrow as pa
    import ray
    import ray.data as rd

    ensure_hash_shuffle()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.assign(day=df["ts"].dt.strftime("%Y-%m-%d"))
            .groupby(["event_type", "day"], sort=False)
            .size()
            .rename("n_events")
            .reset_index()
        )
        return out.astype({"n_events": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "day": pd.Series([], dtype=object),
                    "n_events": pd.Series([], dtype=np.int64),
                }
            )
        fine = (
            df.groupby(["event_type", "day"], sort=False)
            .agg(n_events=("n_events", "sum"))
            .reset_index()
        )
        sub = (
            fine.groupby("event_type", sort=False)
            .agg(n_events=("n_events", "sum"))
            .reset_index()
            .assign(day="ALL")
        )
        return pd.concat([fine, sub[["event_type", "day", "n_events"]]],
                         ignore_index=True).astype({"n_events": np.int64})

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    partials = ds.map_batches(partial, batch_format="pandas")
    levels = keyed_blocks(partials, ["event_type"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )
    # the rolled-up result is #types × #days + #types rows — driver-sized
    tbl = pa.concat_tables(
        [t.cast(pa.schema([("event_type", pa.string()), ("day", pa.string()),
                           ("n_events", pa.int64())]))
         for t in ray.get(levels.to_arrow_refs())]
    )
    subtot = tbl.filter(pa.compute.equal(tbl["day"], "ALL"))
    grand = pa.table(
        {
            "event_type": pa.array(["ALL"]),
            "day": pa.array(["ALL"]),
            "n_events": pa.array(
                [pa.compute.sum(subtot["n_events"]).as_py() or 0], pa.int64()
            ),
        }
    )
    return pa.concat_tables([tbl.cast(grand.schema), grand])


def user_sessions(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization: (user_id, n_events, n_sessions).

    A new session starts when a user's inter-event gap exceeds
    ``gap_minutes``.  One hash shuffle co-locates each user's (pruned)
    rows; the block function is fully vectorized (one sort + diff per
    block, C-level groupby sums — no per-user Python).  Deterministic
    under timestamp ties: the multiset of consecutive gaps of a sorted
    timestamp sequence is invariant to tie order.
    """
    import ray.data as rd

    ensure_hash_shuffle()
    gap = np.timedelta64(gap_minutes * 60, "s")

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype=np.int64),
                    "n_events": pd.Series([], dtype=np.int64),
                    "n_sessions": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(["user_id", "ts"], kind="stable")
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy()
        new_user = np.ones(len(df), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        gap_break = np.zeros(len(df), dtype=bool)
        gap_break[1:] = (ts[1:] - ts[:-1]) > gap
        starts = new_user | gap_break
        out = (
            pd.DataFrame({"user_id": uid, "s": starts})
            .groupby("user_id", sort=False)
            .agg(n_events=("s", "size"), n_sessions=("s", "sum"))
            .reset_index()
        )
        return out.astype(
            {"user_id": np.int64, "n_events": np.int64, "n_sessions": np.int64}
        )

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return keyed_blocks(ds, ["user_id"], 4).map_batches(
        block, batch_size=None, batch_format="pandas"
    )

def top_docs_per_group(sf_dir: str, k: int = 3):
    """Windowed rank within partitions: the ``k`` longest documents per
    language → (lang, doc_id, n_chars, rnk) — the distributed analog of
    ``ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_chars DESC, doc_id)``.

    Scale shape: every block pre-prunes to its local top-``k`` per lang
    (sort + C-level ``groupby.head``), so the hash shuffle on ``lang``
    moves ≤ blocks × langs × k rows, never the corpus; the final exact
    rank runs per co-located language group.  Deterministic tie rule:
    longer first, then smaller ``doc_id``.
    """

    def _empty():
        return pd.DataFrame(
            {
                "lang": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype=np.int64),
                "n_chars": pd.Series([], dtype=np.int64),
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _empty()
        df = df.sort_values(["lang", "n_chars", "doc_id"],
                            ascending=[True, False, True], kind="stable")
        return df.groupby("lang", sort=False).head(k)[["lang", "doc_id", "n_chars"]]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = _empty()
            out["rnk"] = pd.Series([], dtype=np.int64)
            return out
        df = df.sort_values(["lang", "n_chars", "doc_id"],
                            ascending=[True, False, True], kind="stable")
        df = df.groupby("lang", sort=False).head(k).reset_index(drop=True)
        df["rnk"] = df.groupby("lang", sort=False).cumcount().to_numpy() + 1
        return df.astype({"doc_id": np.int64, "n_chars": np.int64, "rnk": np.int64})

    docs = _docs(sf_dir, ["doc_id", "lang", "n_chars"])
    partials = docs.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["lang"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def tfidf_top_terms(sf_dir: str, k: int = 5, df_cap: int | None = None):
    """Per-document top-``k`` TF-IDF terms →
    (doc_id, tok, tf, df, score, rnk).

    Three-stage shape, no driver-side vocabulary: (1) a map pass emits
    one (doc_id, tok, tf) row per distinct token per document (each doc
    lives in one block, so tf is exact without a shuffle); (2) one hash
    shuffle on ``tok`` attaches the exact document frequency (df = group
    size, since (doc, tok) rows are globally unique); (3) one hash
    shuffle on ``doc_id`` scores ``tf · ln(N/df)`` and keeps the per-doc
    top-``k``.  Shuffle volume ∝ distinct (doc, token) pairs — the same
    inverted-index explode as ``ngram_jaccard_pairs``.  ``df_cap`` is the
    100-TB hot-token guard: tokens appearing in more than ``df_cap``
    documents are dropped at the df-attach stage (they carry near-zero
    IDF anyway), bounding the doc-shuffle volume under boilerplate skew;
    the default ``None`` keeps exact oracle parity.  Ranking uses the
    score ROUNDED to 6 decimals (ties then broken by token ascending) so
    the DuckDB twin orders identically.
    """
    n_docs = _docs(sf_dir, ["doc_id"]).count()  # parquet metadata, no scan

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].fillna("").str.lower().str.strip().str.split()
        flat = (
            pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64), "tok": toks})
            .explode("tok")
            .dropna(subset=["tok"])
        )
        out = (
            flat.groupby(["doc_id", "tok"], sort=False)
            .size().rename("tf").reset_index()
        )
        return out.astype({"doc_id": np.int64, "tf": np.int64})

    def attach_df(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df["df"] = pd.Series([], dtype=np.int64)
            return df
        df = df.copy()
        df["df"] = df.groupby("tok", sort=False)["tok"].transform("size").to_numpy(np.int64)
        if df_cap is not None:
            df = df[df["df"] <= df_cap]
        return df

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            df["score"] = pd.Series([], dtype=np.float64)
            df["rnk"] = pd.Series([], dtype=np.int64)
            return df
        df = df.copy()
        df["score"] = np.round(
            df["tf"].to_numpy(np.float64) * np.log(n_docs / df["df"].to_numpy(np.float64)),
            6,
        )
        df = df.sort_values(["doc_id", "score", "tok"],
                            ascending=[True, False, True], kind="stable")
        df = df.groupby("doc_id", sort=False).head(k).reset_index(drop=True)
        df["rnk"] = df.groupby("doc_id", sort=False).cumcount().to_numpy() + 1
        return df.astype({"tf": np.int64, "df": np.int64, "rnk": np.int64})

    docs = _docs(sf_dir, ["doc_id", "text"])
    tf_rows = docs.map_batches(explode, batch_format="pandas")
    with_df = keyed_blocks(tf_rows, ["tok"], _P()).map_batches(
        attach_df, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(with_df, ["doc_id"], _P()).map_batches(
        topk, batch_size=None, batch_format="pandas"
    )


def docs_events_antijoin(sf_dir: str, semi: bool = False):
    """Broadcast anti-join (``semi=True`` → semi-join): documents whose
    ``doc_id`` has no (any) event activity under the author-id = user-id
    convention → (doc_id, source).

    The small side (distinct event user ids) is reduced with one partial
    pass, shipped to the object store ONCE (``ray.put``), and the big
    side filters against the shared set inside ``map_batches`` — the
    broadcast pattern for semi/anti joins whose key set fits in a block;
    above that, flip to the two-sided hash-shuffle join (`keyed_blocks`
    on the key + presence flag), same block function.
    """
    import ray
    import ray.data as rd

    ensure_hash_shuffle()

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"].unique().astype(np.int64)})

    users = (
        read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(distinct_partial, batch_format="pandas")
        .to_pandas()  # tiny: ≤ distinct users × blocks rows
    )
    uid_ref = ray.put(frozenset(users["user_id"].tolist()))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        uids = ray.get(uid_ref)
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        present = np.fromiter((i in uids for i in ids), dtype=bool, count=len(ids))
        keep = present if semi else ~present
        return pd.DataFrame(
            {"doc_id": ids[keep], "source": df["source"].to_numpy(dtype=object)[keep]}
        )

    return _docs(sf_dir, ["doc_id", "source"]).map_batches(fn, batch_format="pandas")


def docs_events_semijoin_bloom(sf_dir: str, bloom_bits: int = 1 << 17,
                               n_hashes: int = 4):
    """Bloom-prefiltered EXACT semi-join: same result as
    ``docs_events_antijoin(semi=True)`` — documents whose ``doc_id`` has
    event activity → (doc_id, source) — built for the regime where the
    dim key set is too big to broadcast exactly.

    The 100-TB broadcast-shrinking pattern: instead of shipping the raw
    key set (8 B/key, unbounded), the distinct keys are folded into a
    FIXED-SIZE Bloom filter (``bloom_bits`` bits — 16 KiB here —
    regardless of key count).  The build itself is distributed: each
    dim block packs its keys into a partial bitmap (``np.packbits``,
    one bloom_bits/8-byte row per block) and the driver OR-merges those
    fixed-size partials — driver state is bloom_bits/8 bytes at ANY key
    count, never the key set.  The merged filter ships once via
    ``ray.put``; the fact side probes it inside ``map_batches``
    (vectorized splitmix64 hashes, no per-row Python) and drops every
    definite non-match BEFORE the shuffle; Bloom false positives
    (~(1−e^{−kn/m})^k) are removed by an exact co-shuffle verify
    against the true key rows, so the output is exact and hash-matches
    the same SQL twin as the exact-broadcast semi-join.  Shuffle volume
    = matches + false positives, never the full fact table.
    """
    import ray
    import ray.data as rd

    from raydedup.functions.hashing import splitmix64

    ensure_hash_shuffle()
    m = np.uint64(bloom_bits)
    seeds = (np.arange(n_hashes, dtype=np.uint64) + np.uint64(1)) * np.uint64(
        0x9E3779B97F4A7C15
    )

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": df["user_id"].unique().astype(np.int64)})

    users_ds = (
        read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(distinct_partial, batch_format="pandas")
    )

    def bloom_partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(int(m), dtype=bool)
        uk = df["user_id"].to_numpy(np.int64).astype(np.uint64)
        for s in seeds:
            bits[(splitmix64(uk ^ s) % m).astype(np.int64)] = True
        return pd.DataFrame({"bloom": [np.packbits(bits).tobytes()]})

    bloom = np.zeros(int(m) // 8, dtype=np.uint8)
    for row in users_ds.map_batches(bloom_partial, batch_format="pandas").take_all():
        bloom |= np.frombuffer(row["bloom"], dtype=np.uint8)
    bloom_ref = ray.put(np.unpackbits(bloom).view(bool))

    def probe(df: pd.DataFrame) -> pd.DataFrame:
        blm = ray.get(bloom_ref)
        ids = df["doc_id"].to_numpy(np.int64)
        keys = ids.astype(np.uint64)
        hit = np.ones(len(ids), dtype=bool)
        for s in seeds:
            hit &= blm[(splitmix64(keys ^ s) % m).astype(np.int64)]
        return pd.DataFrame(
            {
                "key": ids[hit],
                "source": df["source"].to_numpy(dtype=object)[hit],
                "is_dim": np.zeros(int(hit.sum()), dtype=np.int64),
            }
        )

    def dim_rows(df: pd.DataFrame) -> pd.DataFrame:
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame({"key": u, "source": np.full(len(u), "", dtype=object),
                             "is_dim": np.ones(len(u), dtype=np.int64)})

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "source": pd.Series([], dtype=object)})
        true_keys = np.unique(df.loc[df["is_dim"] == 1, "key"].to_numpy(np.int64))
        fact = (df["is_dim"] == 0).to_numpy()
        keep = fact & np.isin(df["key"].to_numpy(np.int64), true_keys)
        return pd.DataFrame(
            {
                "doc_id": df["key"].to_numpy(np.int64)[keep],
                "source": df["source"].to_numpy(dtype=object)[keep],
            }
        )

    facts = _docs(sf_dir, ["doc_id", "source"]).map_batches(
        probe, batch_format="pandas"
    )
    dims = users_ds.map_batches(dim_rows, batch_format="pandas")
    return keyed_blocks(facts.union(dims), ["key"], 4).map_batches(
        verify, batch_size=None, batch_format="pandas"
    )


def event_value_pivot(
    sf_dir: str, types: tuple = ("click", "error", "purchase", "signup", "view")
):
    """Pivot (long → wide) aggregate: per-user total ``value`` by event
    type → (user_id, click, error, purchase, signup, view), sums rounded
    to 6 decimals.

    Pivot needs its output column domain declared up front (``types``) —
    the standard contract for a distributed pivot, since discovering the
    domain would itself be a pass.  Partial aggregation per block to
    (user_id, event_type, v) rows, one hash shuffle on ``user_id``, then
    a vectorized in-block pivot_table; shuffle volume ∝ users × types.
    """
    import ray.data as rd

    ensure_hash_shuffle()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (
            df.groupby(["user_id", "event_type"], sort=False)
            .agg(v=("value", "sum"))
            .reset_index()
        )
        return out.astype({"user_id": np.int64, "v": np.float64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            cols = {"user_id": pd.Series([], dtype=np.int64)}
            cols.update({t: pd.Series([], dtype=np.float64) for t in types})
            return pd.DataFrame(cols)
        wide = df.pivot_table(
            index="user_id", columns="event_type", values="v", aggfunc="sum", fill_value=0.0
        )
        out = pd.DataFrame({"user_id": wide.index.to_numpy(dtype=np.int64)})
        for t in types:
            vals = wide[t].to_numpy(np.float64) if t in wide.columns else np.zeros(len(wide))
            out[t] = np.round(vals, 6)
        return out

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"])
    partials = ds.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["user_id"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )

def user_cumulative_value(sf_dir: str):
    """Ordered running-window aggregate: each event with its user's
    cumulative ``value`` so far → (event_id, user_id, cum_value) — the
    distributed ``SUM(value) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)``.

    One hash shuffle on ``user_id`` co-locates each user's (pruned) rows;
    the block function is one sort + C-level per-group ``cumsum`` — no
    per-user Python.  The per-group accumulation is sequential in frame
    order, i.e. the exact double-addition sequence the SQL window
    computes, so sums are bit-identical to the twin; emitted rounded to
    6 decimals.
    """
    import ray.data as rd

    ensure_hash_shuffle()

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "cum_value": pd.Series([], dtype=np.float64),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        cum = df.groupby("user_id", sort=False)["value"].cumsum().to_numpy(np.float64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(dtype=np.int64),
                "user_id": df["user_id"].to_numpy(dtype=np.int64),
                "cum_value": np.round(cum, 6),
            }
        )

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    return keyed_blocks(ds, ["user_id"], 4).map_batches(
        block, batch_size=None, batch_format="pandas"
    )

def user_rolling_value(sf_dir: str, n: int = 5):
    """Sliding-window aggregate: each event with its user's trailing
    ``n``-event mean ``value`` → (event_id, user_id, roll_avg) — the
    distributed ``AVG(value) OVER (PARTITION BY user_id ORDER BY ts,
    event_id ROWS BETWEEN n−1 PRECEDING AND CURRENT ROW)``.

    Same shape as ``user_cumulative_value``: ONE ``user_id`` hash shuffle
    co-locates each user's rows, then the block function is a sort plus a
    C-level per-group cumsum read off as window sums (``c_i − c_{i−n}``)
    over counts ``min(i+1, n)`` — no per-user Python, shuffle volume ∝
    pruned event rows.  Emitted rounded to 6 decimals (absorbs the
    summation-order ulp variance vs the twin's windowed AVG).
    """
    ensure_hash_shuffle()

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "roll_avg": pd.Series([], dtype=np.float64),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = df.groupby("user_id", sort=False)["value"]
        cum = g.cumsum().to_numpy(np.float64)
        pos = g.cumcount().to_numpy(np.int64)  # 0-based index within user
        # trailing-window sum: cum[i] - cum[i-n] of the SAME user (the
        # shifted value is valid only where the window is full)
        shifted = np.concatenate([np.full(min(n, len(cum)), np.nan),
                                  cum[:-n] if len(cum) > n else np.empty(0)])
        full = pos >= n
        wsum = np.where(full, cum - np.where(np.isnan(shifted), 0.0, shifted), cum)
        cnt = np.minimum(pos + 1, n).astype(np.float64)
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(dtype=np.int64),
                "user_id": df["user_id"].to_numpy(dtype=np.int64),
                "roll_avg": np.round(wsum / cnt, 6),
            }
        )

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "value"]
    )
    return keyed_blocks(ds, ["user_id"], _P()).map_batches(
        block, batch_size=None, batch_format="pandas"
    )


def source_zscore(sf_dir: str):
    """Group-wise normalization → (doc_id, source, z): each document's
    length z-scored against its source's population mean/stddev — the
    distributed ``(n_chars − AVG(..) OVER (PARTITION BY source)) /
    STDDEV_POP(..) OVER (PARTITION BY source)``, the standard per-domain
    feature-normalization step before mixing sources.

    Two-pass broadcast: pass 1 folds per-block (source, count, Σx, Σx²)
    moment partials (≤ blocks × sources rows — driver-safe), the derived
    mean/std dict broadcasts into pass 2 as a closure constant, and the
    z-score itself is a pure vectorized map — zero shuffles of the big
    side.  Degenerate strata (std = 0) emit z = 0.0.  Rounded to 6
    decimals (absorbs Welford-vs-moments ulp variance vs the twin).
    """

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_chars"].to_numpy(np.float64)
        g = pd.DataFrame({"source": df["source"].to_numpy(dtype=object),
                          "cnt": 1, "s1": x, "s2": x * x})
        out = g.groupby("source", sort=False).sum().reset_index()
        return out.astype({"cnt": np.int64})

    parts = (
        _docs(sf_dir, ["source", "n_chars"])
        .map_batches(moments, batch_format="pandas")
        .to_pandas()  # ≤ blocks × sources rows — tiny
    )
    if len(parts) == 0:
        return _docs(sf_dir, ["doc_id", "source"]).limit(0)
    agg = parts.groupby("source").sum()
    mean = agg["s1"] / agg["cnt"]
    var = np.maximum(agg["s2"] / agg["cnt"] - mean * mean, 0.0)
    stats = {s: (float(mean[s]), float(np.sqrt(var[s]))) for s in agg.index}

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        src = df["source"].to_numpy(dtype=object)
        mu = np.array([stats[s][0] for s in src])
        sd = np.array([stats[s][1] for s in src])
        x = df["n_chars"].to_numpy(np.float64)
        z = np.round(np.divide(x - mu, sd, out=np.zeros(len(x)), where=sd > 0), 6)
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "source": src, "z": z})

    return _docs(sf_dir, ["doc_id", "source", "n_chars"]).map_batches(
        fn, batch_format="pandas"
    )


def event_interarrival(sf_dir: str):
    """LAG window: each event with the microsecond gap to the SAME user's
    previous event → (event_id, user_id, gap_us; first event per user →
    −1) — the distributed ``ts − LAG(ts) OVER (PARTITION BY user_id ORDER
    BY ts, event_id)``, the inter-arrival-time building block of bot /
    burst detection over an event stream.

    Same shape as ``user_cumulative_value``: one hash shuffle on
    ``user_id`` co-locates each user's pruned rows, then the block
    function is one sort + a C-level shifted diff with group-boundary
    masking — no per-user Python, integer-exact output (no float hashing
    risk in the contract).
    """
    import ray.data as rd

    ensure_hash_shuffle()

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype=np.int64),
                    "user_id": pd.Series([], dtype=np.int64),
                    "gap_us": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy(np.int64)
        # NaT-safe: a NaT ts casts to int64-min garbage, so rows where
        # either endpoint is NaT get gap_us=-1 explicitly — the twin's
        # NULL-propagating date_diff + COALESCE(-1) semantics (pandas
        # sorts NaT last per user, matching DuckDB's NULLS LAST)
        valid = df["ts"].notna().to_numpy()
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        gap = np.empty(len(df), dtype=np.int64)
        gap[0] = -1
        gap[1:] = np.where(
            (uid[1:] == uid[:-1]) & valid[1:] & valid[:-1], ts[1:] - ts[:-1], -1
        )
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy(dtype=np.int64),
                "user_id": uid,
                "gap_us": gap,
            }
        )

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )
    return keyed_blocks(ds, ["user_id"], 4).map_batches(
        block, batch_size=None, batch_format="pandas"
    )


def window_active_users(sf_dir: str, hours: int = 1):
    """Exact COUNT(DISTINCT user_id) per tumbling window →
    (window_start, n_active) — the distinct aggregate ``events_by_window``
    can't express with plain partial sums.

    Distinct-safe partial aggregation: each block first reduces to its
    DISTINCT (window, user) pairs (C-level drop_duplicates), the hash
    shuffle then carries at most windows × users reduced rows (never raw
    events), and the per-window distinct count is exact in-partition —
    cross-block duplicate pairs collapse because the shuffle co-locates
    equal pairs.  ``window_start`` is an ISO string so the twin
    hash-matches across timestamp dtypes.
    """
    import ray.data as rd

    ensure_hash_shuffle()
    freq = f"{hours}h"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df["ts"].dt.floor(freq).dt.strftime("%Y-%m-%d %H:%M:%S")
        out = pd.DataFrame({"window_start": w, "user_id": df["user_id"].to_numpy(np.int64)})
        return out.drop_duplicates(["window_start", "user_id"]).reset_index(drop=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"window_start": pd.Series([], dtype=object),
                                 "n_active": pd.Series([], dtype=np.int64)})
        d = df.drop_duplicates(["window_start", "user_id"])
        # dropna=False: a NaT-derived NULL window must surface as its own
        # group row (the DuckDB twin's GROUP BY groups NULLs together);
        # default pandas groupby would silently drop it
        out = (
            d.groupby("window_start", sort=False, dropna=False)
            .size()
            .rename("n_active")
            .reset_index()
        )
        return out.astype({"n_active": np.int64})

    ds = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
    partials = ds.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["window_start"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def event_type_transitions(sf_dir: str):
    """Markov transition counts over each user's event sequence →
    (t_from, t_to, n_trans): how often ``t_from`` is immediately followed
    by ``t_to`` for the same user (LAG + GROUP BY in SQL) — the
    session-behavior building block next to ``user_funnel``.

    One hash shuffle on ``user_id``, a sorted C-level shift per block,
    then a per-block partial count so the second shuffle carries ≤
    type² × blocks tiny rows, never the event stream.
    """
    import ray.data as rd

    ensure_hash_shuffle()

    def block(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"t_from": pd.Series([], dtype=object),
                "t_to": pd.Series([], dtype=object),
                "n_trans": pd.Series([], dtype=np.int64)}
        if len(df) == 0:
            return pd.DataFrame(cols)
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy(np.int64)
        et = df["event_type"].to_numpy(dtype=object)
        same = uid[1:] == uid[:-1]
        out = pd.DataFrame({"t_from": et[:-1][same], "t_to": et[1:][same]})
        if len(out) == 0:
            return pd.DataFrame(cols)
        agg = out.groupby(["t_from", "t_to"], sort=False).size().rename("n_trans").reset_index()
        return agg.astype({"n_trans": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"t_from": pd.Series([], dtype=object),
                                 "t_to": pd.Series([], dtype=object),
                                 "n_trans": pd.Series([], dtype=np.int64)})
        agg = df.groupby(["t_from", "t_to"], sort=False)["n_trans"].sum().reset_index()
        return agg.astype({"n_trans": np.int64})

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts", "event_type"]
    )
    partials = keyed_blocks(ds, ["user_id"], 4).map_batches(
        block, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(partials, ["t_from", "t_to"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


# GPT-2-style pre-tokenizer approximation, restricted to syntax both
# Python re and DuckDB RE2 implement with identical leftmost-first
# semantics (verified empirically over contraction/punct/unicode cases):
# contractions | space?letters | space?digits | space?other-punct-runs
_BPE_PAT = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def doc_bpe_tokens(sf_dir: str):
    """BPE-ish token counting → (doc_id, n_bpe_tokens, n_ws_tokens):
    the GPT-2-pre-tokenizer-shaped regex count next to the whitespace
    count — the cheap proxy for "how many LLM tokens is this corpus"
    that a training-data pipeline budgets with.  Pure vectorized map
    (compiled regex, C-level ``str.count``); no shuffle.
    """
    import re

    pat = re.compile(_BPE_PAT)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "n_bpe_tokens": t.str.count(pat).to_numpy(dtype=np.int64),
                "n_ws_tokens": token_counts(df["text"]),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")

def curate_corpus(sf_dir: str, min_tokens: int = 5):
    """Composed curation pipeline — the end-to-end shape of a training-data
    prep job, every stage streaming: quality gate (same rule as
    ``doc_quality_flags``) → exact dedup among survivors (min ``doc_id``
    per identical text keeps one copy) → language-ID annotation →
    curated table (doc_id, source, lang_pred, n_tokens).

    One vectorized map computes the gate, the 128-bit content key, the
    language prediction and the token count in a single pass over the
    pruned (doc_id, text, source) columns; rejected docs never enter the
    one hash shuffle (volume ∝ surviving rows); the dedup collapse is a
    per-block ``transform('min')``.
    """
    from raydedup.functions.textstats import langid

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        t = df["text"].fillna("")
        n_tok = token_counts(df["text"])
        n_digits = t.str.count(r"[0-9]").to_numpy(dtype=np.int64)
        n_chars = t.str.len().to_numpy(dtype=np.int64)
        keep = (n_tok >= min_tokens) & (10 * n_digits <= 3 * n_chars)
        out = pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "source": df["source"].to_numpy(dtype=object),
                "text_md5": np.asarray(md5_fingerprints(df["text"]), dtype=object),
                "lang_pred": langid(df["text"]),
                "n_tokens": n_tok,
            }
        )
        return out[keep].reset_index(drop=True)

    def dedup_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=np.int64),
                    "source": pd.Series([], dtype=object),
                    "lang_pred": pd.Series([], dtype=object),
                    "n_tokens": pd.Series([], dtype=np.int64),
                }
            )
        canon = df.groupby("text_md5", sort=False)["doc_id"].transform("min")
        sel = df["doc_id"].to_numpy() == canon.to_numpy()
        return df[sel][["doc_id", "source", "lang_pred", "n_tokens"]].reset_index(drop=True)

    docs = _docs(sf_dir, ["doc_id", "text", "source"])
    survivors = docs.map_batches(prep, batch_format="pandas")
    return keyed_blocks(survivors, ["text_md5"], _P()).map_batches(
        dedup_block, batch_size=None, batch_format="pandas"
    )


# ------------------------------------------------------------- global top-k
def longest_docs(sf_dir: str, k: int = 100):
    """Global ranked top-``k`` documents by length → (doc_id, n_chars,
    rnk), ordered by n_chars descending with doc_id as the tie-break.

    Scale shape: a global ``ds.sort`` for a top-``k`` would be an
    all-to-all exchange of every row; instead each block keeps its local
    top-``k`` (vectorized argsort over ≤ batch rows), the ≤ blocks × k
    survivors collapse into one tiny block, and the exact global rank is
    assigned there — the same two-level cut as ``top_tokens``, shuffle
    volume ∝ blocks × k, never ∝ corpus size.
    """

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["doc_id", "n_chars"]]
        if len(out) > k:
            out = out.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                                  kind="stable").head(k)
        return out.astype({"doc_id": np.int64, "n_chars": np.int64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "n_chars": pd.Series([], dtype=np.int64),
                                 "rnk": pd.Series([], dtype=np.int64)})
        out = df.sort_values(["n_chars", "doc_id"], ascending=[False, True],
                             kind="stable").head(k).reset_index(drop=True)
        out["rnk"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out.astype({"doc_id": np.int64, "n_chars": np.int64, "rnk": np.int64})

    docs = _docs(sf_dir, ["doc_id", "n_chars"])
    cands = docs.map_batches(local_topk, batch_format="pandas")
    return cands.repartition(1).map_batches(final, batch_size=None,
                                            batch_format="pandas")


def doc_length_rank(sf_dir: str):
    """Global window function without a global sort: (doc_id, n_chars,
    len_rank) where ``len_rank`` is SQL ``RANK() OVER (ORDER BY n_chars
    DESC)`` over the whole corpus.

    Scale shape: a window rank via ``ds.sort`` would all-to-all exchange
    every row; instead each block pre-reduces to a (n_chars, cnt)
    histogram (lengths are small integers), one SMALL hash shuffle on
    ``n_chars`` merges the blocks × distinct-lengths partials down to one
    row per distinct length (so the driver fold is ∝ distinct lengths,
    never ∝ blocks × lengths), ``ray.put`` broadcasts the cumulative
    distribution once, and a pure vectorized map assigns every row its
    exact rank by ``searchsorted`` — the row stream itself never shuffles.
    """
    import ray

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        vc = df["n_chars"].value_counts()
        return pd.DataFrame({"n_chars": vc.index.to_numpy(np.int64),
                             "cnt": vc.to_numpy(np.int64)})

    def merge_hist(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"n_chars": pd.Series([], dtype=np.int64),
                                 "cnt": pd.Series([], dtype=np.int64)})
        agg = df.groupby("n_chars", sort=False)["cnt"].sum().reset_index()
        return agg.astype({"n_chars": np.int64, "cnt": np.int64})

    docs = _docs(sf_dir, ["doc_id", "n_chars"])
    parts = (
        keyed_blocks(docs.map_batches(hist, batch_format="pandas"), ["n_chars"], 4)
        .map_batches(merge_hist, batch_size=None, batch_format="pandas")
        .take_all()
    )
    if parts:
        hp = pd.DataFrame(parts).groupby("n_chars", sort=True)["cnt"].sum()
        vals = hp.index.to_numpy(np.int64)
        cum_le = np.cumsum(hp.to_numpy(np.int64))       # docs with length <= vals[i]
        total = int(cum_le[-1])
    else:
        vals, cum_le, total = np.empty(0, np.int64), np.empty(0, np.int64), 0
    dist_ref = ray.put((vals, cum_le, total))

    def rank_fn(df: pd.DataFrame) -> pd.DataFrame:
        v, c, tot = ray.get(dist_ref)
        nc = df["n_chars"].to_numpy(np.int64)
        idx = np.searchsorted(v, nc, side="right")      # == position after my value
        le = c[idx - 1]                                 # my value always present
        return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                             "n_chars": nc,
                             "len_rank": (tot - le + 1).astype(np.int64)})

    return docs.map_batches(rank_fn, batch_format="pandas")


# --------------------------------------------------------- bigram collocations
def bigram_collocations(sf_dir: str, min_pair: int = 5):
    """Corpus bigram collocation counts → (w1, w2, n_pair, n_w1, n_w2)
    for every adjacent token pair occurring ≥ ``min_pair`` times, with
    the corpus-wide occurrence counts of both member tokens attached
    (the exact integer inputs of PMI / log-likelihood collocation
    scores, left unreduced so the result hash-matches SQL bit-for-bit —
    no float log in the contract surface).

    Scale shape: blocks pre-reduce to distinct (w1, w2, partial-count)
    and (tok, partial-count) rows (shuffle volume ∝ vocabulary², not
    corpus size); exact pair counts are cut to ≥ ``min_pair`` BEFORE the
    two attach joins; each attach is a co-shuffle join (tagged union,
    one hash shuffle, vectorized in-block merge) on w1 then w2 — the
    same pattern as ``segment_revenue``, no broadcast of an unbounded
    vocabulary.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def _flat_tokens(t: pa.Table):
        """Flat Arrow token values + per-doc lengths for non-empty texts,
        split on single spaces to mirror the SQL twin exactly.  All-kernel
        (split_pattern stays in C++); replaces the round-4 object-dtype
        ``np.fromiter`` explode (VERDICT r4 item 7)."""
        txt = pc.coalesce(t["text"], "")
        txt = txt.combine_chunks() if isinstance(txt, pa.ChunkedArray) else txt
        txt = txt.filter(pc.not_equal(txt, ""))
        la = pc.split_pattern(txt, " ")
        la = la.combine_chunks() if isinstance(la, pa.ChunkedArray) else la
        if la.offset != 0:
            la = pa.concat_arrays([la])
        off = la.offsets.to_numpy()
        return la.values, off[1:] - off[:-1]

    pair_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                             ("n_pair", pa.int64())])
    uni_schema = pa.schema([("tok", pa.string()), ("n_uni", pa.int64())])

    def pair_partial(t: pa.Table) -> pa.Table:
        flat, lens = _flat_tokens(t)
        if len(flat) < 2:
            return pair_schema.empty_table()
        # position i starts a bigram unless it is the last token of a doc
        starts = np.ones(len(flat) - 1, dtype=bool)
        starts[np.cumsum(lens)[:-1] - 1] = False
        idx = np.flatnonzero(starts)
        if idx.size == 0:
            return pair_schema.empty_table()
        pairs = pa.table({"w1": flat.take(pa.array(idx)),
                          "w2": flat.take(pa.array(idx + 1))})
        g = pairs.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return pa.table({"w1": g["w1"], "w2": g["w2"],
                         "n_pair": g["count_all"].cast(pa.int64())},
                        schema=pair_schema)

    def uni_partial(t: pa.Table) -> pa.Table:
        flat, _lens = _flat_tokens(t)
        if len(flat) == 0:
            return uni_schema.empty_table()
        vc = pc.value_counts(flat)
        return pa.table({"tok": vc.field("values"),
                         "n_uni": vc.field("counts").cast(pa.int64())},
                        schema=uni_schema)

    def pair_reduce(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "n_pair": pd.Series([], dtype=np.int64)})
        g = df.groupby(["w1", "w2"], sort=False).agg(n_pair=("n_pair", "sum")).reset_index()
        g = g[g["n_pair"] >= min_pair]
        return g.astype({"n_pair": np.int64}).reset_index(drop=True)

    def uni_reduce(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"tok": pd.Series([], dtype=object),
                                 "n_uni": pd.Series([], dtype=np.int64)})
        g = df.groupby("tok", sort=False).agg(n_uni=("n_uni", "sum")).reset_index()
        return g.astype({"n_uni": np.int64})

    def attach(key_col: str, out_col: str):
        """In-block merge of pair rows (side=1) with unigram counts
        (side=0) co-shuffled on ``key``."""

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            cols = [c for c in df.columns if c not in ("side", "key", "n_uni")]
            if len(df) == 0:
                dt = lambda c: np.int64 if c.startswith("n_") else object
                return pd.DataFrame({**{c: pd.Series([], dtype=dt(c)) for c in cols},
                                     out_col: pd.Series([], dtype=np.int64)})
            dim = df[df["side"] == 0][["key", "n_uni"]]
            fact = df[df["side"] == 1][cols + ["key"]]
            j = fact.merge(dim, on="key", how="left")
            j[out_col] = j["n_uni"].fillna(0).astype(np.int64)
            return j[cols + [out_col]]

        return fn

    docs = _docs(sf_dir, ["text"])
    pairs = keyed_blocks(
        docs.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["w1", "w2"], _P()
    ).map_batches(pair_reduce, batch_size=None, batch_format="pandas")
    # exact unigram counts, materialized once (vocabulary-sized) and
    # co-shuffled into both attach joins
    uni = keyed_blocks(
        docs.map_batches(uni_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["tok"], _P()
    ).map_batches(uni_reduce, batch_size=None, batch_format="pandas").materialize()

    def tag_pairs_w1(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["key"] = out["w1"]
        out["side"] = np.int8(1)
        out["n_uni"] = np.int64(0)
        return out

    def tag_uni(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"w1": np.full(len(df), "", dtype=object),
                             "w2": np.full(len(df), "", dtype=object),
                             "n_pair": np.zeros(len(df), dtype=np.int64),
                             "key": df["tok"].to_numpy(dtype=object),
                             "side": np.full(len(df), 0, dtype=np.int8),
                             "n_uni": df["n_uni"].to_numpy(np.int64)})

    j1 = keyed_blocks(
        pairs.map_batches(tag_pairs_w1, batch_format="pandas")
        .union(uni.map_batches(tag_uni, batch_format="pandas")),
        ["key"], _P(),
    ).map_batches(attach("key", "n_w1"), batch_size=None, batch_format="pandas")

    def tag_pairs_w2(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["key"] = out["w2"]
        out["side"] = np.int8(1)
        out["n_uni"] = np.int64(0)
        return out

    def tag_uni2(df: pd.DataFrame) -> pd.DataFrame:
        out = tag_uni(df)
        out["n_w1"] = np.zeros(len(df), dtype=np.int64)
        return out

    j2 = keyed_blocks(
        j1.map_batches(tag_pairs_w2, batch_format="pandas")
        .union(uni.map_batches(tag_uni2, batch_format="pandas")),
        ["key"], _P(),
    ).map_batches(attach("key", "n_w2"), batch_size=None, batch_format="pandas")

    def project(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["w1", "w2", "n_pair", "n_w1", "n_w2"]]
        return out.astype({"n_pair": np.int64, "n_w1": np.int64, "n_w2": np.int64})

    return j2.map_batches(project, batch_format="pandas")


# ------------------------------------------------------------ range self-join
def events_recent_activity(sf_dir: str, window_minutes: int = 60):
    """Range self-join: for every event, the number of SAME-USER events
    in the trailing window [ts − window, ts], inclusive of itself →
    (event_id, n_recent).

    The distributed range join the Dataset API lacks, composed per the
    engine's partitioning rule: ONE hash shuffle on ``user_id``
    co-locates each user's events, and the in-block kernel is fully
    vectorized — rows sort by (user, ts), each user's timestamps embed
    into a disjoint band of a single int64 axis (user_ordinal × span),
    and two ``searchsorted`` calls over that composite axis answer every
    row's interval count at once.  No per-user Python loop, no
    O(n·window) expansion; shuffle volume ∝ events, work ∝ n log n per
    block.  Tie-safe: counts depend only on the timestamp multiset, so
    the result is deterministic under equal-ts orderings.
    """
    import ray.data as rd

    ensure_hash_shuffle()
    win_us = np.int64(window_minutes) * 60 * 1_000_000

    def block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                                 "n_recent": pd.Series([], dtype=np.int64)})
        df = df.sort_values(["user_id", "ts"], kind="stable")
        uid = df["user_id"].to_numpy(np.int64)
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        eid = df["event_id"].to_numpy(np.int64)
        # dense user ordinal per sorted row
        new_user = np.ones(len(df), dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        uord = np.cumsum(new_user).astype(np.int64) - 1
        t0 = ts.min()
        span = np.int64(ts.max() - t0) + win_us + np.int64(2)
        n_users = int(uord[-1]) + 1
        if span > 0 and n_users > (np.iinfo(np.int64).max // span) - 1:
            # composite-axis overflow (astronomically wide ts range ×
            # users per block): fall back to per-user slices
            out = np.empty(len(df), dtype=np.int64)
            starts = np.flatnonzero(new_user)
            bounds = np.append(starts, len(df))
            for s, e in zip(bounds[:-1], bounds[1:]):
                seg = ts[s:e]
                out[s:e] = (np.arange(s, e) - s + 1) - np.searchsorted(
                    seg, seg - win_us, side="left"
                )
        else:
            comp = uord * span + (ts - t0)
            lo = np.searchsorted(comp, comp - win_us, side="left")
            hi = np.searchsorted(comp, comp, side="right")
            out = hi - lo
        return pd.DataFrame({"event_id": eid, "n_recent": out.astype(np.int64)})

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    return keyed_blocks(ds, ["user_id"], 4).map_batches(
        block, batch_size=None, batch_format="pandas"
    )


# ----------------------------------------------------- sequence-pattern funnel
def funnel_step_counts(df: pd.DataFrame, steps: tuple,
                       win_us: np.int64) -> pd.DataFrame:
    """Pure in-block funnel matcher (see :func:`user_funnel` for the
    semantics): all users in ``df`` are matched greedily against
    ``steps``; returns one (step, step_type, n_users) partial row per
    step.  Module-level so the property suite can probe it against a
    brute-force twin without a Ray session."""
    empty = pd.DataFrame({"step": pd.Series([], dtype=np.int64),
                          "step_type": pd.Series([], dtype=object),
                          "n_users": pd.Series([], dtype=np.int64)})
    if len(df) == 0:
        return empty
    df = df.sort_values(["user_id", "ts"], kind="stable")
    uid = df["user_id"].to_numpy(np.int64)
    ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
    et = df["event_type"].to_numpy(dtype=object)
    new_user = np.ones(len(df), dtype=bool)
    new_user[1:] = uid[1:] != uid[:-1]
    uord = np.cumsum(new_user).astype(np.int64) - 1
    n_users = int(uord[-1]) + 1

    NOPE = np.int64(-1)
    t_prev = np.full(n_users, NOPE, dtype=np.int64)  # matched ts per user
    out_rows = []
    for k, s in enumerate(steps):
        cand = np.flatnonzero(et == s)
        if k == 0:
            ok = cand
        else:
            tu = t_prev[uord[cand]]
            m = (tu != NOPE) & (ts[cand] >= tu) & (ts[cand] <= tu + win_us)
            ok = cand[m]
        t_next = np.full(n_users, NOPE, dtype=np.int64)
        if len(ok):
            # rows are ts-sorted within user, so the first occurrence
            # per user ordinal IS the earliest qualifying event
            u_ok = uord[ok]
            first_u, first_i = np.unique(u_ok, return_index=True)
            t_next[first_u] = ts[ok][first_i]
        t_prev = t_next
        out_rows.append((np.int64(k + 1), s,
                         np.int64((t_prev != NOPE).sum())))
    return pd.DataFrame({"step": [r[0] for r in out_rows],
                         "step_type": [r[1] for r in out_rows],
                         "n_users": [r[2] for r in out_rows]}).astype(
        {"step": np.int64, "n_users": np.int64})


def user_funnel(sf_dir: str, steps: tuple = ("view", "click", "purchase"),
                window_days: int = 7):
    """Ordered sequence-pattern match (funnel): how many users completed
    each prefix of ``steps``, where step *k* must occur at-or-after the
    matched step *k−1* event and within ``window_days`` of it →
    (step, step_type, n_users).

    Greedy-earliest semantics (each step matches its EARLIEST qualifying
    event), so the result is deterministic and has an exact SQL twin of
    chained ``MIN(ts)`` subqueries.  Scale shape: ONE hash shuffle on
    ``user_id`` co-locates each user's history; the in-block matcher is
    fully vectorized — rows sort by (user, ts) once, each step is one
    boolean mask + first-per-user cut (``np.unique`` on the dense user
    ordinal), no per-user Python loop.  Blocks emit one partial count
    row per step; the final shuffle carries ≤ steps × blocks rows.
    """
    import functools

    import ray.data as rd

    ensure_hash_shuffle()
    win_us = np.int64(window_days) * 86400 * 1_000_000
    steps = tuple(steps)
    block = functools.partial(funnel_step_counts, steps=steps, win_us=win_us)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"step": pd.Series([], dtype=np.int64),
                                 "step_type": pd.Series([], dtype=object),
                                 "n_users": pd.Series([], dtype=np.int64)})
        g = (
            df.groupby(["step", "step_type"], sort=False)
            .agg(n_users=("n_users", "sum"))
            .reset_index()
        )
        return g.astype({"step": np.int64, "n_users": np.int64})

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "event_type"])
    partials = keyed_blocks(ds, ["user_id"], 4).map_batches(
        block, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(partials, ["step"], 2).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


# -------------------------------------------------- semi-structured extraction
def event_props_stats(sf_dir: str, field: str = "k"):
    """Semi-structured JSON extraction + aggregate: parse the ``props``
    JSON column, pull the integer ``field``, and summarize it per event
    type → (event_type, n_events, n_with_k, sum_k, min_k, max_k).

    The extraction is vectorized: a compiled regex (pandas
    ``str.extract``, C loop) handles the flat ``"field": int`` case that
    dominates real telemetry; only rows the regex misses but that do
    mention the field fall back to per-row ``json.loads`` — so the hot
    path never enters Python row-at-a-time.  Groups where no row carries
    the field report 0 for sum/min/max (COALESCE semantics, mirrored in
    the DuckDB twin).  Scale shape: per-block partial aggregate → one
    tiny key shuffle on ``event_type``; shuffle volume ∝ event types ×
    blocks, never rows.
    """
    import json
    import re

    import ray.data as rd

    ensure_hash_shuffle()
    pat = re.compile(r'"%s"\s*:\s*(-?\d+)(?=\s*[,}\]])' % re.escape(field))
    needle = f'"{field}"'

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        props = df["props"].fillna("")
        k = pd.to_numeric(props.str.extract(pat, expand=False), errors="coerce")
        miss = k.isna() & props.str.contains(needle, regex=False)
        if miss.any():
            def slow(p: str):
                try:
                    v = json.loads(p).get(field)
                except Exception:
                    return np.nan
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    return np.nan
                return float(v)

            k = k.where(~miss, props[miss].map(slow))
        g = pd.DataFrame({"event_type": df["event_type"].to_numpy(dtype=object),
                          "k": k.to_numpy(np.float64)})
        out = (
            g.groupby("event_type", sort=False)
            .agg(n_events=("k", "size"), n_with_k=("k", "count"),
                 sum_k=("k", lambda s: s.fillna(0).sum()),
                 min_k=("k", "min"), max_k=("k", "max"))
            .reset_index()
        )
        return out.astype({"n_events": np.int64, "n_with_k": np.int64,
                           "sum_k": np.float64, "min_k": np.float64,
                           "max_k": np.float64})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "n_events": pd.Series([], dtype=np.int64),
                                 "n_with_k": pd.Series([], dtype=np.int64),
                                 "sum_k": pd.Series([], dtype=np.int64),
                                 "min_k": pd.Series([], dtype=np.int64),
                                 "max_k": pd.Series([], dtype=np.int64)})
        g = (
            df.groupby("event_type", sort=False)
            .agg(n_events=("n_events", "sum"), n_with_k=("n_with_k", "sum"),
                 sum_k=("sum_k", "sum"), min_k=("min_k", "min"),
                 max_k=("max_k", "max"))
            .reset_index()
        )
        none = g["n_with_k"] == 0
        for c in ("sum_k", "min_k", "max_k"):
            g.loc[none, c] = 0.0
        return g.astype({"n_events": np.int64, "n_with_k": np.int64,
                         "sum_k": np.int64, "min_k": np.int64,
                         "max_k": np.int64})

    ds = read_parquet_clean(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    partials = ds.map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["event_type"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


# ------------------------------------------------------------ chunking
CHUNK_TOKENS = 64  # default context-window chunk size (tokens)


def chunk_docs(sf_dir: str, chunk: int = CHUNK_TOKENS):
    """Fixed-size token chunking → (doc_id, chunk_idx, chunk_text, n_toks):
    split every document into consecutive ``chunk``-token windows — the
    context-window / RAG-chunking primitive of a training-data pipeline
    (each output row is one training sequence; the last window per doc is
    short).

    Scale shape: a pure ``flat_map``-style batch transform — no shuffle at
    all; output rows ∝ input tokens / chunk.  Tokenization is the single-
    space split shared with every gram operator (exact DuckDB-twin
    semantics); empty/NULL texts yield no chunks, matching the twin's
    ``text <> ''`` guard.  Chunk assembly is one pandas groupby-join over
    (doc, chunk) groups — per-chunk, not per-token, work.
    """

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                              "chunk_idx": pd.Series([], dtype=np.int64),
                              "chunk_text": pd.Series([], dtype=object),
                              "n_toks": pd.Series([], dtype=np.int64)})
        df = df[df["text"].notna() & (df["text"] != "")]
        if len(df) == 0:
            return empty
        toks = df["text"].str.split(" ")
        ex = (pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64), "tok": toks})
              .explode("tok"))
        ex["chunk_idx"] = ex.groupby("doc_id", sort=False).cumcount() // chunk
        g = (ex.groupby(["doc_id", "chunk_idx"], sort=False)["tok"]
               .agg([(" ".join), "size"])
               .reset_index())
        g.columns = ["doc_id", "chunk_idx", "chunk_text", "n_toks"]
        return g.astype({"doc_id": np.int64, "chunk_idx": np.int64,
                         "n_toks": np.int64})

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pandas")


def windowed_dedup(sf_dir: str, hours: int = 1, num_partitions: int = 0):
    """Streaming-window deduplication over the events table: keep the
    EARLIEST event per (user_id, event_type) within each tumbling
    ``hours``-hour window → (event_id, user_id, event_type, window_start,
    ts_us).  The event-stream analog of exact dedup — the throttling /
    at-most-once-per-window pass a feature-extraction or notification
    pipeline runs before aggregation.

    Distribution: blocks pre-reduce to their LOCAL earliest row per key
    (shuffle volume ∝ distinct (user, type, window) keys per block,
    never raw events), then one hash shuffle on the key co-locates the
    partials and the in-block fold picks the global earliest; ties (none
    in the fixture — (user, ts) is unique) break on event_id for full
    determinism.  ``ts_us`` is epoch microseconds (int64) so the hash
    matches DuckDB's ``epoch_us`` across timestamp dtype renderings;
    ``window_start`` is the hour-aligned ISO string as in
    ``events_by_window``.
    """
    ensure_hash_shuffle()
    freq = f"{hours}h"

    def _reduce(df: pd.DataFrame) -> pd.DataFrame:
        # earliest (ts_us, event_id) per key — works for both the
        # per-block partial and the post-shuffle exact fold
        df = df.sort_values(["user_id", "event_type", "window_start",
                             "ts_us", "event_id"], kind="mergesort")
        return df.drop_duplicates(["user_id", "event_type", "window_start"],
                                  keep="first")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_id": pd.Series([], dtype=np.int64),
                              "user_id": pd.Series([], dtype=np.int64),
                              "event_type": pd.Series([], dtype=object),
                              "window_start": pd.Series([], dtype=object),
                              "ts_us": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        out = pd.DataFrame({
            "event_id": df["event_id"].to_numpy(dtype=np.int64),
            "user_id": df["user_id"].to_numpy(dtype=np.int64),
            "event_type": df["event_type"].to_numpy(dtype=object),
            "window_start": df["ts"].dt.floor(freq)
                .dt.strftime("%Y-%m-%d %H:%M:%S").to_numpy(dtype=object),
            # unit pinned explicitly: a ns-resolution read would otherwise
            # silently emit epoch-nanoseconds through the bare int64 view
            "ts_us": df["ts"].to_numpy("datetime64[us]").astype(np.int64),
        })
        return _reduce(out)

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    partials = ds.map_batches(partial, batch_format="pandas")
    return keyed_blocks(
        partials, ["user_id", "event_type", "window_start"],
        num_partitions or default_partitions(),
    ).map_batches(_reduce, batch_size=None, batch_format="pandas")
