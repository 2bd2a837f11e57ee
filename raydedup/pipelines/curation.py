"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup: benchmark decontamination, deterministic train/val/test
splits, global distinct counts, PII scrubbing, per-label embedding
centroids, data-quality profiling, per-group deterministic sampling, and
a partition-aware export sink.

Each operator follows the engine's standard patterns (see ``docops``):
vectorized ``map_batches`` for per-row work, partial-aggregate → one small
hash shuffle for wide work, ``ray.put`` broadcast for small lookup sides.
Every SQL-expressible operator has a DuckDB twin in
``__ray_entry__.oracle_sql`` with identical column names and dtypes.

Reference parity note: the reference has no curation surface at all (its
only gate is the blur filter, ``face_recognition_custom.py:32-34``); these
operators are the engine's beyond-parity additions for LLM-corpus work.
"""

from __future__ import annotations

from raydedup.ray_utils import read_parquet_clean

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
import pyarrow as pa

from raydedup.ray_utils import default_partitions, keyed_blocks

def _P() -> int:
    """Hash partitions for the sf-scale query surface — resolved at call
    time from the live Ray session (~1/CPU, floor 8, cap 256; see
    ray_utils.default_partitions).  Partition-count invariance is pinned
    by the determinism tests and DuckDB twins."""
    return default_partitions()

# --------------------------------------------------------- decontamination
# Probe derivation is data-deterministic (no external benchmark files in
# this sandbox): the first-40-char prefixes of the N lowest-doc_id
# documents with n_chars >= min_chars stand in for a benchmark probe set.
PROBE_LEN = 40
N_PROBES = 5
PROBE_MIN_CHARS = 80


@lru_cache(maxsize=8)
def _cached_probe_regex(probes: tuple):
    """Per-worker-process compile cache (cf. the minhasher cache in
    ``stages/signatures.py``): a multi-thousand-alternative pattern is
    compiled once per worker, not once per batch."""
    import re

    return re.compile("|".join(re.escape(p) for p in probes))


def _probe_list(sf_dir: str) -> list:
    """Top-k smallest doc_id probe docs via per-block partial top-k → tiny
    driver merge (the same partial/merge shape as ``knn_bruteforce``; no
    global sort, no full materialization)."""
    import ray.data as rd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["n_chars"] >= PROBE_MIN_CHARS]
        d = d.nsmallest(N_PROBES, "doc_id")
        return pd.DataFrame(
            {
                "doc_id": d["doc_id"].to_numpy(dtype=np.int64),
                "probe": d["text"].fillna("").str.slice(0, PROBE_LEN),
            }
        )

    parts = (
        read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "n_chars"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # ≤ N_PROBES × num_blocks rows — tiny at any scale
    )
    return parts.nsmallest(N_PROBES, "doc_id")["probe"].tolist()


def decontaminate(sf_dir: str):
    """(doc_id, n_hits, contaminated): docs containing any probe string.

    The probe set is broadcast once (``ray.put``) and each batch runs a
    vectorized substring scan per probe (``Series.str.contains`` with
    ``regex=False``) — the classic benchmark-decontamination shape: a
    small pattern side against a 100-TB corpus, no shuffle at all.
    """
    import ray
    import ray.data as rd

    probes_ref = ray.put(_probe_list(sf_dir))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        probes = ray.get(probes_ref)
        text = df["text"].fillna("")
        n_hits = np.zeros(len(df), dtype=np.int64)
        if probes:
            # one combined-alternation pass prunes to candidate rows, then
            # the per-probe indicator loop runs only on those — with large
            # probe sets and low contamination rates the scan stays ~one
            # regex pass per batch instead of one pass per probe
            any_probe = _cached_probe_regex(tuple(probes))
            cand = text.str.contains(any_probe, regex=True).to_numpy()
            if cand.any():
                hit_text = text[cand]
                hits = np.zeros(int(cand.sum()), dtype=np.int64)
                for p in probes:
                    hits += hit_text.str.contains(p, regex=False).to_numpy()
                n_hits[cand] = hits
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "n_hits": n_hits,
                "contaminated": (n_hits > 0).astype(np.int64),
            }
        )

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        scan, batch_format="pandas"
    )


# -------------------------------------------------- deterministic split
# Hex-string bucket thresholds (first 2 md5 hex chars, 256 buckets):
# lexicographic compare on fixed-width lowercase hex == numeric compare,
# so the same thresholds work verbatim in the DuckDB twin.
SPLIT_TRAIN_CAP = "cc"  # 0x00-0xcb → 204/256 ≈ 79.7% train
SPLIT_VALID_CAP = "e6"  # 0xcc-0xe5 →  26/256 ≈ 10.2% valid; rest test


def train_split(sf_dir: str):
    """(doc_id, bucket, split): deterministic content-free assignment by
    md5 of the doc id — stable across runs, partitions and cluster sizes,
    the property a training-data split needs (pure map, no shuffle)."""
    import ray.data as rd

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(dtype=np.int64)
        buckets = [hashlib.md5(str(i).encode()).hexdigest()[:2] for i in ids]
        b = pd.Series(buckets)
        split = np.where(
            b < SPLIT_TRAIN_CAP, "train", np.where(b < SPLIT_VALID_CAP, "valid", "test")
        )
        return pd.DataFrame({"doc_id": ids, "bucket": b, "split": split})

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        fn, batch_format="pandas"
    )


# -------------------------------------------------------- distinct counts
def distinct_counts(sf_dir: str) -> pd.DataFrame:
    """One row: exact distinct cardinalities over the events table.

    One scan, one shuffle: each block emits its distinct values for BOTH
    columns as tagged ``(col, value)`` string rows (the partial combiner —
    shuffle volume ∝ distinct-per-block, not rows), one hash shuffle on
    the tagged value co-locates duplicates, a per-block unique + count
    yields tiny per-column partial counts the driver sums.  NULLs are
    dropped to match ``COUNT(DISTINCT)`` semantics.
    """
    import ray.data as rd

    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()  # before read_parquet: the context binds at creation

    def tagged_uniques(df: pd.DataFrame) -> pd.DataFrame:
        frames = []
        for col in ("user_id", "event_type"):
            vals = df[col].dropna().unique()
            frames.append(pd.DataFrame({"col": col, "val": vals.astype(str)}))
        return pd.concat(frames, ignore_index=True)

    def count_block(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["col", "val"]).groupby("col", sort=False).size()
        return pd.DataFrame({"col": g.index.to_numpy(), "n": g.to_numpy(np.int64)})

    parts = (
        keyed_blocks(
            read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id", "event_type"])
            .map_batches(tagged_uniques, batch_format="pandas"),
            ["col", "val"],
            _P(),
        )
        .map_batches(count_block, batch_size=None, batch_format="pandas")
        .to_pandas()  # ≤ 2 rows per partition
    )
    totals = parts.groupby("col")["n"].sum()
    return pd.DataFrame(
        {
            "n_users": [np.int64(totals.get("user_id", 0))],
            "n_event_types": [np.int64(totals.get("event_type", 0))],
        }
    )


# ------------------------------------------------------------ PII scrub
# ASCII-explicit character classes so Python `re` and DuckDB's RE2 agree
# (RE2 `\d` is ASCII, Python `\d` is unicode — never mix them here).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONGNUM_RE = r"[0-9]{6,}"


def pii_scrub(sf_dir: str):
    """(doc_id, n_emails, n_longnums, clean_text): count and redact
    email-shaped and long-digit-run spans.  Pure vectorized map (pandas
    str kernels over compiled regexes); emails are replaced before digit
    runs so the two passes compose identically to the SQL twin's nested
    ``regexp_replace``."""
    import ray.data as rd

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        text = df["text"].fillna("")
        n_emails = text.str.count(EMAIL_RE).to_numpy(dtype=np.int64)
        n_longnums = text.str.count(LONGNUM_RE).to_numpy(dtype=np.int64)
        clean = text.str.replace(EMAIL_RE, "<EMAIL>", regex=True).str.replace(
            LONGNUM_RE, "<NUM>", regex=True
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(dtype=np.int64),
                "n_emails": n_emails,
                "n_longnums": n_longnums,
                "clean_text": clean,
            }
        )

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        fn, batch_format="pandas"
    )


# ------------------------------------------------- per-label centroids
# Fixed-point quantization scale: a power of two, so float32 → float64
# products are EXACT and floor() agrees bit-for-bit between numpy and
# DuckDB (a decimal scale like 1e6 would round differently per engine).
_QSCALE = 1048576.0  # 2**20


def label_centroids(sf_dir: str):
    """(label, dim, sum_q, n): integer-exact per-label embedding sums —
    the partial-aggregate side of a centroid / cluster-mean computation
    (divide sum_q / (n · 2^20) for the float centroid).

    Per block: one ``np.add.at`` scatter over (label, 64-dim) quantized
    rows, emitting labels×64 partial rows; one small hash shuffle on
    ``label`` then a final groupby.  Shuffle volume ∝ labels × dims ×
    blocks — independent of row count.
    """
    import ray.data as rd

    empty_partial = pd.DataFrame(
        {
            "label": pd.Series([], dtype=np.int64),
            "dim": pd.Series([], dtype=np.int64),
            "sum_q": pd.Series([], dtype=np.int64),
            "n": pd.Series([], dtype=np.int64),
        }
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        lab = np.asarray(t["label"], dtype=np.int64)
        if len(lab) == 0:
            return empty_partial
        col = t["embedding"].combine_chunks() if isinstance(t["embedding"], pa.ChunkedArray) else t["embedding"]
        # flatten() honors slice offsets for both list and fixed-size-list
        # (Array.values would ignore them)
        flat = col.flatten()
        dim = len(flat) // len(lab)
        emb = flat.to_numpy(zero_copy_only=False).astype(np.float64).reshape(-1, dim)
        q = np.floor(emb * _QSCALE).astype(np.int64)
        ulab, inv = np.unique(lab, return_inverse=True)
        acc = np.zeros((len(ulab), dim), dtype=np.int64)
        np.add.at(acc, inv, q)
        cnt = np.bincount(inv, minlength=len(ulab)).astype(np.int64)
        k = len(ulab)
        return pd.DataFrame(
            {
                "label": np.repeat(ulab, dim),
                "dim": np.tile(np.arange(dim, dtype=np.int64), k),
                "sum_q": acc.reshape(-1),
                "n": np.repeat(cnt, dim),
            }
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "label": pd.Series([], dtype=np.int64),
                    "dim": pd.Series([], dtype=np.int64),
                    "sum_q": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        g = df.groupby(["label", "dim"], sort=False).agg(
            sum_q=("sum_q", "sum"), n=("n", "sum")
        )
        return g.reset_index()

    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()  # before read_parquet: the context binds at creation
    partials = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    ).map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    return keyed_blocks(partials, ["label"], _P()).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


# ---------------------------------------------------- approximate distinct
_HLL_P = 14  # 2^14 registers → ~0.8% standard error


def approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """One row (estimate:int64): HyperLogLog cardinality of ``user_id`` —
    the sketch path for when :func:`distinct_counts`' value shuffle is too
    expensive (billions of distinct keys).  Each block reduces to a
    16 KiB register array (mergeable partial: elementwise max), the driver
    folds blocks; no shuffle, bounded driver state, one scan.

    Standard HLL (Flajolet et al. 2007 public algorithm) with the small-
    range linear-counting correction; splitmix64 over the int64 ids is the
    engine's standard stateless hash.  Rows-only driver check (no SQL
    twin: the estimate is sketch-defined); pytest bounds the relative
    error against the exact count.
    """
    import ray.data as rd

    from raydedup.functions.hashing import splitmix64

    m = 1 << _HLL_P

    def registers(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["user_id"].dropna().to_numpy(np.int64).astype(np.uint64)
        reg = np.zeros(m, dtype=np.int8)
        if len(ids):
            h = splitmix64(ids)
            idx = (h >> np.uint64(64 - _HLL_P)).astype(np.int64)
            rest = (h << np.uint64(_HLL_P)) | np.uint64((1 << _HLL_P) - 1)
            # rho = leading zeros of the remaining bits + 1, via bit_length
            lz = np.zeros(len(rest), dtype=np.int8)
            v = rest.copy()
            for shift in (32, 16, 8, 4, 2, 1):  # branchless clz over uint64
                mask = v < (np.uint64(1) << np.uint64(64 - shift))
                lz[mask] += shift
                v[mask] = v[mask] << np.uint64(shift)
            np.maximum.at(reg, idx, lz + 1)
        return pd.DataFrame({"reg_id": np.arange(m, dtype=np.int64), "rho": reg})

    parts = (
        read_parquet_clean(f"{sf_dir}/events.parquet", columns=["user_id"])
        .map_batches(registers, batch_format="pandas")
        .to_pandas()  # m rows per block, int8 — small driver fold
    )
    reg = parts.groupby("reg_id")["rho"].max().to_numpy(np.float64)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg))
    zeros = int((reg == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear-counting small-range correction
    return pd.DataFrame({"estimate": [np.int64(round(est))]})


# ------------------------------------------------------- data profiling
_QSK_S = 1024  # summary size per partial → additive rank error ≤ n/(2S) per level


def _compress_weighted(values: np.ndarray, weights: np.ndarray, s: int):
    """Rank-stratified re-sample of a weighted sorted summary down to
    ≤ ``s`` points, each carrying total_weight/s — the MRL-style merge
    step (Manku-Rajagopalan-Lindsay, SIGMOD'98 public algorithm).
    Deterministic: pure function of the (value, weight) multiset."""
    order = np.argsort(values, kind="stable")
    values, weights = values[order], weights[order]
    total = weights.sum()
    if len(values) <= s:
        return values, weights
    cum = np.cumsum(weights)
    targets = (np.arange(s, dtype=np.float64) + 0.5) * (total / s)
    idx = np.searchsorted(cum, targets, side="left")
    idx = np.minimum(idx, len(values) - 1)
    return values[idx], np.full(s, total / s, dtype=np.float64)


def approx_value_quantiles(sf_dir: str,
                           qs: tuple = (0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)):
    """Approximate quantiles of ``events.value`` from mergeable
    rank-stratified summaries → (q, value_est), one row per requested
    quantile.

    The sketch path for continuous columns where
    :func:`docops.length_quantiles`' exact count-distribution trick
    (integer domains only) can't apply and a global sort would be an
    all-to-all exchange of every row.  Each block compresses to ≤ S
    (value, weight) points (rank error ≤ n_block/2S); a single hash
    shuffle re-compresses groups of block summaries (bounding driver
    state to ≤ groups × S rows at ANY input size — the property that
    matters at 100 TB); the driver does the final merge and reads the
    quantiles off the cumulative weights.  Two merge levels ⇒ total rank
    error ≤ N/(2S) · 3 ≈ 0.15 % at S=1024.  Deterministic for a given
    block layout (different parallelism ⇒ different block summaries ⇒
    estimates may move within the same rank-error bound); rows-only
    driver check (the estimate is sketch-defined), pytest bounds the
    observed rank error against the exact distribution.
    """
    import ray.data as rd

    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].dropna().to_numpy(np.float64)
        if len(v) == 0:
            return pd.DataFrame({"grp": pd.Series([], dtype=np.int64),
                                 "value": pd.Series([], dtype=np.float64),
                                 "weight": pd.Series([], dtype=np.float64)})
        v = np.sort(v)
        vals, wts = _compress_weighted(v, np.ones(len(v), dtype=np.float64), _QSK_S)
        # group id from the summary content: deterministic, spreads
        # block summaries across re-compression groups
        grp = np.int64(abs(hash((len(v), float(v[0]), float(v[-1])))) % 32)
        return pd.DataFrame({"grp": np.full(len(vals), grp, dtype=np.int64),
                             "value": vals, "weight": wts})

    def regroup(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"value": pd.Series([], dtype=np.float64),
                                 "weight": pd.Series([], dtype=np.float64)})
        vals, wts = _compress_weighted(df["value"].to_numpy(np.float64),
                                       df["weight"].to_numpy(np.float64), _QSK_S)
        return pd.DataFrame({"value": vals, "weight": wts})

    summaries = (
        read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])
        .map_batches(partial, batch_format="pandas")
    )
    merged = keyed_blocks(summaries, ["grp"], 8).map_batches(
        regroup, batch_size=None, batch_format="pandas"
    ).to_pandas()  # ≤ 32 groups × S rows regardless of input size

    out_q = np.asarray(qs, dtype=np.float64)
    if len(merged) == 0:
        return pd.DataFrame({"q": out_q,
                             "value_est": np.full(len(out_q), np.nan)})
    order = np.argsort(merged["value"].to_numpy(np.float64), kind="stable")
    vals = merged["value"].to_numpy(np.float64)[order]
    wts = merged["weight"].to_numpy(np.float64)[order]
    cum = np.cumsum(wts)
    idx = np.minimum(np.searchsorted(cum, out_q * cum[-1], side="left"),
                     len(vals) - 1)
    return pd.DataFrame({"q": out_q, "value_est": vals[idx]})


def value_quantiles_by_type(sf_dir: str,
                            qs: tuple = (0.25, 0.5, 0.75, 0.95)):
    """Per-group approximate quantiles → (event_type, q, value_est): the
    grouped generalization of :func:`approx_value_quantiles` for
    continuous columns (per-segment latency/value percentiles — the
    per-key analog a monitoring or curation pipeline reports).

    Each block compresses each of its types to ≤ S (value, weight)
    points; ONE hash shuffle on ``event_type`` co-locates every type's
    block summaries, and the final merge + quantile read-off happens
    entirely inside the type partition — no driver fold at all, output
    rows = types × quantiles.  Same two-merge-level rank-error bound as
    the global sketch; rows-only driver check (sketch-defined estimate),
    pytest bounds the observed per-type rank error against exact.
    """
    import ray.data as rd

    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()
    out_q = np.asarray(qs, dtype=np.float64)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series([], dtype=object),
                "value": pd.Series([], dtype=np.float64),
                "weight": pd.Series([], dtype=np.float64)}
        d = df.dropna(subset=["value"])
        if len(d) == 0:
            return pd.DataFrame(cols)
        frames = []
        for et, g in d.groupby("event_type", sort=False):
            v = np.sort(g["value"].to_numpy(np.float64))
            vals, wts = _compress_weighted(v, np.ones(len(v), dtype=np.float64), _QSK_S)
            frames.append(pd.DataFrame({"event_type": et, "value": vals, "weight": wts}))
        return pd.concat(frames, ignore_index=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series([], dtype=object),
                "q": pd.Series([], dtype=np.float64),
                "value_est": pd.Series([], dtype=np.float64)}
        if len(df) == 0:
            return pd.DataFrame(cols)
        frames = []
        for et, g in df.groupby("event_type", sort=False):
            order = np.argsort(g["value"].to_numpy(np.float64), kind="stable")
            vals = g["value"].to_numpy(np.float64)[order]
            wts = g["weight"].to_numpy(np.float64)[order]
            cum = np.cumsum(wts)
            idx = np.minimum(np.searchsorted(cum, out_q * cum[-1], side="left"),
                             len(vals) - 1)
            frames.append(pd.DataFrame({"event_type": et, "q": out_q,
                                        "value_est": vals[idx]}))
        return pd.concat(frames, ignore_index=True)

    summaries = (
        read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_type", "value"])
        .map_batches(partial, batch_format="pandas")
    )
    return keyed_blocks(summaries, ["event_type"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def events_profile(sf_dir: str) -> pd.DataFrame:
    """One row of data-quality stats over the events table: row count,
    per-column null counts, and integer-exact value aggregates
    (``sum_value_cents`` = sum of floor(value·100) as int64 — float sums
    are order-dependent, and floor on the identical float64 product
    agrees bit-for-bit between numpy and DuckDB, where round would not).

    Pure partial-aggregate shape: every block emits one tiny stats row,
    the driver folds them — no shuffle at all, the cheapest possible
    full-scan profile (the pattern a schema-validation gate runs before
    committing a 100-TB ingest).
    """
    import ray.data as rd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        val = df["value"]
        ok = val.notna()
        return pd.DataFrame(
            {
                "n_rows": [np.int64(len(df))],
                "n_null_user": [np.int64(df["user_id"].isna().sum())],
                "n_null_type": [np.int64(df["event_type"].isna().sum())],
                "n_null_value": [np.int64((~ok).sum())],
                "min_value": [val[ok].min() if ok.any() else np.nan],
                "max_value": [val[ok].max() if ok.any() else np.nan],
                "sum_value_cents": [
                    np.int64(np.floor(val[ok].to_numpy(np.float64) * 100.0).sum())
                ],
            }
        )

    parts = (
        read_parquet_clean(
            f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "value"]
        )
        .map_batches(partial, batch_format="pandas")
        .to_pandas()  # one row per block
    )
    return pd.DataFrame(
        {
            "n_rows": [np.int64(parts["n_rows"].sum())],
            "n_null_user": [np.int64(parts["n_null_user"].sum())],
            "n_null_type": [np.int64(parts["n_null_type"].sum())],
            "n_null_value": [np.int64(parts["n_null_value"].sum())],
            "min_value": [np.round(parts["min_value"].min(), 6)],
            "max_value": [np.round(parts["max_value"].max(), 6)],
            "sum_value_cents": [np.int64(parts["sum_value_cents"].sum())],
        }
    )


# -------------------------------------------------- per-group sampling
def sample_per_group(sf_dir: str, k: int = 2):
    """(lang, doc_id, rnk): a deterministic ``k``-doc sample per language,
    ordered by md5 of the doc id — the distributed analog of
    ``ROW_NUMBER() OVER (PARTITION BY lang ORDER BY md5(id), id)``:
    content-free, stable across runs and partitionings, the property an
    eval-set / inspection sample needs.

    Scale shape (cf. ``docops.top_docs_per_group``): every block pre-prunes
    to its local top-``k`` per lang, so the hash shuffle on ``lang`` moves
    ≤ blocks × langs × k rows, never the corpus.
    """
    import ray.data as rd

    def _key(ids: np.ndarray) -> pd.Series:
        return pd.Series([hashlib.md5(str(i).encode()).hexdigest() for i in ids])

    def _empty():
        return pd.DataFrame(
            {
                "lang": pd.Series([], dtype=object),
                "doc_id": pd.Series([], dtype=np.int64),
                "sk": pd.Series([], dtype=object),
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return _empty()
        df = df.assign(sk=_key(df["doc_id"].to_numpy(dtype=np.int64)))
        df = df.sort_values(["lang", "sk", "doc_id"], kind="stable")
        return df.groupby("lang", sort=False).head(k)[["lang", "doc_id", "sk"]]

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "lang": pd.Series([], dtype=object),
                    "doc_id": pd.Series([], dtype=np.int64),
                    "rnk": pd.Series([], dtype=np.int64),
                }
            )
        df = df.sort_values(["lang", "sk", "doc_id"], kind="stable")
        df = df.groupby("lang", sort=False).head(k).reset_index(drop=True)
        df["rnk"] = df.groupby("lang", sort=False).cumcount().to_numpy() + 1
        return df[["lang", "doc_id", "rnk"]].astype({"doc_id": np.int64, "rnk": np.int64})

    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()  # before read_parquet: the context binds at creation
    partials = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(partial, batch_format="pandas")
    return keyed_blocks(partials, ["lang"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


# --------------------------------------------- n-gram decontamination
# GPT-3-style benchmark decontamination: a training document is
# contaminated if it shares any length-N token window with any document
# of the held-out benchmark slice.  The benchmark slice is derived
# deterministically from the corpus itself (doc_id % DECON_MOD == 0 — no
# external benchmark files exist in this sandbox); at production scale
# the slice would be the real eval sets.
DECON_MOD = 13   # ~7.7% of docs stand in for the benchmark set
DECON_N = 4      # token-window length (13 in GPT-3; 4 exercises at sf)


def _gram_frame(df: pd.DataFrame, n: int) -> pd.DataFrame:
    """Distinct (doc_id, g) token n-gram rows per document, vectorized.

    A document's rows live entirely inside one batch, so the per-batch
    ``drop_duplicates(["doc_id", "g"])`` IS the global per-doc dedup.
    Tokenization is a single-space split — the EXACT semantics of the
    DuckDB twins' ``string_split(text, ' ')``, including empty tokens from
    runs of spaces and tabs/newlines kept inside tokens (a whitespace-run
    split would silently diverge from the contract on such texts);
    empty/NULL texts yield no grams.
    """
    toks = df["text"].fillna("").str.split(" ")
    ex = (
        pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64), "tok": toks})
        .explode("tok")
        .dropna(subset=["tok"])
    )
    tok = ex["tok"].to_numpy(dtype=object)
    did = ex["doc_id"].to_numpy(dtype=np.int64)
    if len(tok) < n:
        return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                             "g": pd.Series([], dtype=object)})
    # explode preserves in-doc token order, so a window starting at flat
    # position p is a real n-gram iff position p+n-1 is still the same doc
    valid = did[: len(did) - n + 1] == did[n - 1 :]
    gram = tok[: len(tok) - n + 1].copy()
    for k in range(1, n):
        gram = gram + " "
        gram = gram + tok[k : len(tok) - n + 1 + k]
    out = pd.DataFrame({"doc_id": did[: len(did) - n + 1][valid], "g": gram[valid]})
    return out.drop_duplicates(["doc_id", "g"]).reset_index(drop=True)


def ngram_decontaminate(sf_dir: str, bloom_bits: int | None = None, n_hashes: int = 4):
    """(doc_id, n_shared_grams, contaminated) for every non-benchmark doc:
    the count of its distinct token ``DECON_N``-grams that also occur in
    any benchmark document, and a 0/1 contamination flag.

    Scale shape (the 100-TB decontamination pattern):

    1. The benchmark side (a small fraction of the corpus; real eval sets
       are tiny) folds its distinct grams into a FIXED-SIZE Bloom filter —
       each block packs a partial bitmap, the driver OR-merges
       ``bloom_bits/8``-byte rows, ``ray.put`` ships it once.
    2. Every training block probes the filter vectorized and drops
       definite non-matches BEFORE the shuffle, so the gram exchange
       carries hits + Bloom false positives, never the full corpus's
       gram stream.
    3. One hash shuffle on the gram string co-locates surviving training
       grams with the true benchmark gram rows; exact membership inside
       the partition removes false positives (output is exact — it
       hash-matches the SQL twin).
    4. Per-doc hit counts union zero base rows and collapse in one small
       ``doc_id`` shuffle, so clean documents appear with count 0.
    """
    import ray
    import ray.data as rd

    from raydedup.functions.hashing import splitmix64
    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()  # before read_parquet: the context binds at creation
    n = DECON_N
    seeds = (np.arange(n_hashes, dtype=np.uint64) + np.uint64(1)) * np.uint64(
        0x9E3779B97F4A7C15
    )

    def _ghash(g: np.ndarray) -> np.ndarray:
        # deterministic vectorized 64-bit string hash (fixed-key siphash)
        return pd.util.hash_array(g, categorize=False)

    def _docs_cols():
        return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def bench_grams(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[(df["doc_id"].to_numpy(np.int64) % DECON_MOD) == 0]
        gf = _gram_frame(sub, n)
        # benchmark side needs gram identity only; block-level dedup
        # shrinks the shuffle (cross-block dups collapse in-partition)
        return pd.DataFrame({"g": gf["g"].unique()})

    # materialized once (the benchmark side is the SMALL side): both the
    # Bloom fold and the exact verify rows below read these blocks from the
    # object store instead of re-tokenizing the benchmark slice
    bench_ds = _docs_cols().map_batches(bench_grams, batch_format="pandas").materialize()

    # Size the Bloom from the actual benchmark gram count (~10 bits/gram,
    # FP ≈ 1% at 4 hashes) instead of a fixed 2^20: a large real benchmark
    # slice would saturate a fixed filter (FP → 1), silently degrading the
    # pre-shuffle prefilter to shipping nearly the full training gram
    # stream (output stays exact either way — the in-partition verify
    # removes false positives).  Power-of-two bits, floor 2^20, ceiling
    # 2^28 (a 32 MiB broadcast); count() on the materialized small side is
    # metadata, not an execution.
    if bloom_bits is None:
        n_bench_grams = max(1, bench_ds.count())
        bloom_bits = 1 << min(28, max(20, int(np.ceil(np.log2(10 * n_bench_grams)))))
    m = np.uint64(bloom_bits)

    def bloom_partial(df: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(int(m), dtype=bool)
        h = _ghash(df["g"].to_numpy(dtype=object))
        for s in seeds:
            bits[(splitmix64(h ^ s) % m).astype(np.int64)] = True
        return pd.DataFrame({"bloom": [np.packbits(bits).tobytes()]})

    bloom = np.zeros(int(m) // 8, dtype=np.uint8)
    for row in bench_ds.map_batches(bloom_partial, batch_format="pandas").take_all():
        bloom |= np.frombuffer(row["bloom"], dtype=np.uint8)
    bloom_ref = ray.put(np.unpackbits(bloom).view(bool))

    def bench_rows(df: pd.DataFrame) -> pd.DataFrame:
        g = df["g"].to_numpy(dtype=object)
        return pd.DataFrame({"doc_id": np.full(len(g), -1, dtype=np.int64),
                             "g": g,
                             "side": np.ones(len(g), dtype=np.int64)})

    def train_rows(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[(df["doc_id"].to_numpy(np.int64) % DECON_MOD) != 0]
        gf = _gram_frame(sub, n)
        g = gf["g"].to_numpy(dtype=object)
        h = _ghash(g)
        hit = np.ones(len(g), dtype=bool)
        blm = ray.get(bloom_ref)
        for s in seeds:
            hit &= blm[(splitmix64(h ^ s) % m).astype(np.int64)]
        return pd.DataFrame({"doc_id": gf["doc_id"].to_numpy(np.int64)[hit],
                             "g": g[hit],
                             "side": np.zeros(int(hit.sum()), dtype=np.int64)})

    gram_rows = bench_ds.map_batches(bench_rows, batch_format="pandas").union(
        _docs_cols().map_batches(train_rows, batch_format="pandas")
    )

    def count_hits(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "cnt": pd.Series([], dtype=np.int64)})
        is_bench = (df["side"] == 1).to_numpy()
        bench_set = pd.unique(df.loc[is_bench, "g"])
        hits = df[~is_bench & df["g"].isin(bench_set).to_numpy()]
        out = hits.groupby("doc_id", sort=False).size().rename("cnt").reset_index()
        return out.astype({"doc_id": np.int64, "cnt": np.int64})

    partials = keyed_blocks(gram_rows, ["g"], _P()).map_batches(
        count_hits, batch_size=None, batch_format="pandas"
    )

    def base_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        ids = ids[ids % DECON_MOD != 0]
        return pd.DataFrame({"doc_id": ids, "cnt": np.zeros(len(ids), dtype=np.int64)})

    # zero rows come from a separate doc_id-only scan (8 B/row, column
    # pruned) rather than riding the gram shuffle: emitting them there
    # would need a sentinel gram key that funnels every doc to one hot
    # partition
    base = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        base_rows, batch_format="pandas"
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": pd.Series([], dtype=np.int64),
                "n_shared_grams": pd.Series([], dtype=np.int64),
                "contaminated": pd.Series([], dtype=np.int64)}
        if len(df) == 0:
            return pd.DataFrame(cols)
        agg = df.groupby("doc_id", sort=False)["cnt"].sum().reset_index()
        return pd.DataFrame({
            "doc_id": agg["doc_id"].to_numpy(np.int64),
            "n_shared_grams": agg["cnt"].to_numpy(np.int64),
            "contaminated": (agg["cnt"].to_numpy(np.int64) > 0).astype(np.int64),
        })

    return keyed_blocks(partials.union(base), ["doc_id"], _P()).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def ngram_novelty(sf_dir: str):
    """(doc_id, n_grams, n_novel): per document, its distinct token
    ``DECON_N``-gram count and how many of those grams FIRST occur in
    this document (gram attributed to its minimum ``doc_id`` — the
    distributed first-occurrence attribution, the same canonical-owner
    semantics as the flagship's min-conv_id rule, cf. reference
    ``duplicate_face.py:64-75`` keeping the first-seen face).  A low
    novelty ratio marks documents that are mostly recombinations of
    already-seen text.

    Scale shape: distinct (doc_id, g) rows per block (a doc lives in one
    block, so per-block dedup is global), ONE hash shuffle on the gram
    string; inside each gram partition the min-doc_id owner and per-doc
    totals are exact, and they collapse with zero base rows in one small
    ``doc_id`` shuffle — no driver state, shuffle ∝ distinct grams.
    """
    import ray.data as rd

    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()  # before read_parquet: the context binds at creation
    n = DECON_N

    grams = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(lambda df: _gram_frame(df, n), batch_format="pandas")

    def per_gram(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": pd.Series([], dtype=np.int64),
                "n_grams": pd.Series([], dtype=np.int64),
                "n_novel": pd.Series([], dtype=np.int64)}
        if len(df) == 0:
            return pd.DataFrame(cols)
        tot = df.groupby("doc_id", sort=False).size().rename("n_grams").reset_index()
        owners = df.groupby("g", sort=False)["doc_id"].min()
        nov = owners.value_counts().rename("n_novel").reset_index()
        nov.columns = ["doc_id", "n_novel"]
        out = tot.merge(nov, on="doc_id", how="outer").fillna(0)
        return out.astype({"doc_id": np.int64, "n_grams": np.int64, "n_novel": np.int64})

    partials = keyed_blocks(grams, ["g"], _P()).map_batches(
        per_gram, batch_size=None, batch_format="pandas"
    )

    def base_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].to_numpy(np.int64)
        z = np.zeros(len(ids), dtype=np.int64)
        return pd.DataFrame({"doc_id": ids, "n_grams": z, "n_novel": z})

    base = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        base_rows, batch_format="pandas"
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype=np.int64),
                                 "n_grams": pd.Series([], dtype=np.int64),
                                 "n_novel": pd.Series([], dtype=np.int64)})
        agg = df.groupby("doc_id", sort=False)[["n_grams", "n_novel"]].sum().reset_index()
        return agg.astype({"doc_id": np.int64, "n_grams": np.int64, "n_novel": np.int64})

    return keyed_blocks(partials.union(base), ["doc_id"], _P()).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


def gram_df_histogram(sf_dir: str):
    """(df, n_grams): how many distinct n-grams occur in exactly ``df``
    documents — the document-frequency distribution over token
    ``DECON_N``-grams.  This is the corpus diagnostic that sizes the
    df-caps the dedup operators rely on (``ngram_jaccard_pairs``'s hot-token
    cap, the LSH bucket cap): the histogram's tail mass tells you how much
    emission a given cap drops.

    One gram shuffle (distinct (doc, g) rows, so per-partition group sizes
    ARE exact document frequencies), then the per-partition df histogram
    collapses in a second tiny shuffle — final volume ∝ distinct df values,
    never grams.
    """
    import ray.data as rd

    from raydedup.ray_utils import ensure_hash_shuffle

    ensure_hash_shuffle()  # before read_parquet: the context binds at creation
    n = DECON_N

    grams = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(lambda df: _gram_frame(df, n), batch_format="pandas")

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"df": pd.Series([], dtype=np.int64),
                                 "n_grams": pd.Series([], dtype=np.int64)})
        dfs = df.groupby("g", sort=False).size()
        vc = dfs.value_counts()
        return pd.DataFrame({"df": vc.index.to_numpy(np.int64),
                             "n_grams": vc.to_numpy(np.int64)})

    partials = keyed_blocks(grams, ["g"], _P()).map_batches(
        df_partial, batch_size=None, batch_format="pandas"
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"df": pd.Series([], dtype=np.int64),
                                 "n_grams": pd.Series([], dtype=np.int64)})
        agg = df.groupby("df", sort=False)["n_grams"].sum().reset_index()
        return agg.astype({"df": np.int64, "n_grams": np.int64})

    return keyed_blocks(partials, ["df"], 4).map_batches(
        final, batch_size=None, batch_format="pandas"
    )


# ------------------------------------------------------- partitioned sink
def export_partitioned(sf_dir: str, out_dir: str, by: str = "lang"):
    """Write the documents table as hive-partitioned Parquet
    (``out_dir/<by>=<value>/*.parquet``) — the resumable-output layout: a
    re-run (or a downstream consumer) addresses each partition
    independently instead of one giant file.  Returns the output path.
    """
    import ray.data as rd

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet")
    ds.write_parquet(out_dir, partition_cols=[by])
    return out_dir


def exact_median(sf_dir: str, n_bins: int = 65536,
                 max_band_rows: int = 2_000_000, max_depth: int = 6):
    """EXACT median of the continuous ``events.value`` column →
    one row (n, median_value) — distributed selection, no global sort.

    :func:`docops.length_quantiles` is exact only for integer domains
    and :func:`approx_value_quantiles` trades exactness for one pass;
    this operator closes the gap with iterative histogram selection:

    * phase 0 — per-block (count, min, max) partials, driver fold (a few
      rows per block);
    * refinement — per-band histogram over ``n_bins`` uniform bins,
      emitted as SPARSE (bin, count) rows and folded on the driver
      (≤ n_bins × blocks rows, corpus-size-independent); the cumulative
      histogram locates the bin holding the target order statistic, and
      the loop RE-HISTOGRAMS WITHIN that bin while it still holds more
      than ``max_band_rows`` values (≤ ``max_depth`` rounds) — so a
      skewed distribution that crowds one bin can never force an O(n)
      driver collect (the round-4 version collected the located bin
      unconditionally; ADVICE r4).  A constant band (bin min == max)
      short-circuits to that value, which is what terminates the
      one-dominant-value skew case;
    * collect — one filtered pass gathers ONLY the final band's values
      (≤ max_band_rows unless max_depth stopped refinement first) and
      the exact k-th order statistic is read off via ``np.partition``.

    Even-count medians average the two middle values exactly as DuckDB's
    ``median()`` does; the result is ROUNDed to 6 like every float twin.
    The kernel drops NaN values; SQL aggregates skip only NULL (DuckDB
    sorts NaN as the largest double), so the twin pins the same
    exclusion explicitly with ``WHERE NOT isnan(value)`` — on data whose
    only missing values are NULLs the two are identical.
    """
    import ray.data as rd

    src = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])
    sel = _OrderStatSelector(src, n_bins, max_band_rows, max_depth)
    n = sel.n
    if n == 0:
        return rd.from_pandas(pd.DataFrame(
            {"n": pd.Series([0], dtype=np.int64),
             "median_value": pd.Series([np.nan], dtype=np.float64)}))
    # order statistics needed (0-indexed): median = avg of these two
    k_lo, k_hi = (n - 1) // 2, n // 2
    med = (sel.stat(k_lo) + sel.stat(k_hi)) / 2.0
    return rd.from_pandas(pd.DataFrame(
        {"n": [np.int64(n)], "median_value": [round(med, 6)]}))


def _band_values(df: pd.DataFrame, levels, n_bins: int) -> np.ndarray:
    """Values of the current selection band: NaN-dropped, then the level
    chain (lo, width, bin) applied with the SAME clip arithmetic the
    histogram used, so band membership is bit-consistent.  Module-level so
    map closures capture only plain values, never the selector (whose
    ``src`` Dataset must not ship to workers)."""
    v = df["value"].to_numpy(dtype=np.float64)
    v = v[~np.isnan(v)]
    for l, w, b in levels:
        bi = np.clip(((v - l) / w).astype(np.int64), 0, n_bins - 1)
        v = v[bi == b]
    return v


def exact_quantile(sf_dir: str, q: float = 0.9, n_bins: int = 65536,
                   max_band_rows: int = 2_000_000, max_depth: int = 6):
    """EXACT continuous quantile of ``events.value`` → one row
    (n, q, quantile_value), with DuckDB ``quantile_cont`` interpolation:
    position p = q·(n−1), result = v⌊p⌋ + (p−⌊p⌋)·(v⌈p⌉ − v⌊p⌋) over the
    NaN-dropped sorted column.  Same selection machinery as
    :func:`exact_median` (iterative histogram refinement, bounded band
    collect, skew-safe) — the two needed order statistics share the
    selector's band cache, so the common same-bin case pays one collect."""
    import ray.data as rd

    src = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["value"])
    sel = _OrderStatSelector(src, n_bins, max_band_rows, max_depth)
    n = sel.n
    if n == 0:
        return rd.from_pandas(pd.DataFrame(
            {"n": pd.Series([0], dtype=np.int64),
             "q": pd.Series([q], dtype=np.float64),
             "quantile_value": pd.Series([np.nan], dtype=np.float64)}))
    p = q * (n - 1)
    k_lo, k_hi = int(np.floor(p)), int(np.ceil(p))
    v_lo = sel.stat(k_lo)
    v_hi = v_lo if k_hi == k_lo else sel.stat(k_hi)
    val = v_lo + (p - k_lo) * (v_hi - v_lo)
    return rd.from_pandas(pd.DataFrame(
        {"n": [np.int64(n)], "q": [float(q)],
         "quantile_value": [round(float(val), 6)]}))


class _OrderStatSelector:
    """Distributed exact order statistics over a float column by iterative
    histogram refinement (see :func:`exact_median` for the algorithm and
    its skew/termination guarantees).  ``stat(k)`` returns the exact
    k-th (0-indexed) order statistic of the NaN-dropped column; bands
    are cached so several nearby ranks share one collect."""

    def __init__(self, src, n_bins: int, max_band_rows: int, max_depth: int):
        self.src = src
        self.n_bins = n_bins
        self.max_band_rows = max_band_rows
        self.max_depth = max_depth
        self._band_cache: dict = {}
        self.n, self.lo, self.hi = self._moments([])

    def _moments(self, levels):
        band_values, n_bins = _band_values, self.n_bins

        def part(df: pd.DataFrame) -> pd.DataFrame:
            v = band_values(df, levels, n_bins)
            if len(v) == 0:
                return pd.DataFrame({"n": pd.Series([], dtype=np.int64),
                                     "lo": pd.Series([], dtype=np.float64),
                                     "hi": pd.Series([], dtype=np.float64)})
            return pd.DataFrame({"n": [np.int64(len(v))],
                                 "lo": [float(v.min())], "hi": [float(v.max())]})

        m = self.src.map_batches(part, batch_format="pandas").to_pandas()
        if len(m) == 0 or int(m["n"].sum()) == 0:
            return 0, np.nan, np.nan
        return int(m["n"].sum()), float(m["lo"].min()), float(m["hi"].max())

    def _hist(self, levels, lo_b, width):
        band_values, n_bins = _band_values, self.n_bins

        def part(df: pd.DataFrame) -> pd.DataFrame:
            v = band_values(df, levels, n_bins)
            if len(v) == 0:
                return pd.DataFrame({"bin": pd.Series([], dtype=np.int64),
                                     "c": pd.Series([], dtype=np.int64)})
            b = np.clip(((v - lo_b) / width).astype(np.int64), 0, n_bins - 1)
            cnt = np.bincount(b, minlength=0)
            nz = np.flatnonzero(cnt)
            return pd.DataFrame({"bin": nz.astype(np.int64),
                                 "c": cnt[nz].astype(np.int64)})

        return (self.src.map_batches(part, batch_format="pandas").to_pandas()
                .groupby("bin")["c"].sum().sort_index())

    def _refine(self, r: int):
        """Narrow to a ≤max_band_rows band containing rank ``r``.
        Returns (levels, in-band rank, exact value or None)."""
        levels: list = []
        while True:
            cnt, lo_b, hi_b = self._moments(levels)
            if lo_b == hi_b:
                return levels, r, lo_b  # constant band — the value itself
            if cnt <= self.max_band_rows or len(levels) >= self.max_depth:
                return levels, r, None
            width = (hi_b - lo_b) / self.n_bins
            cum = self._hist(levels, lo_b, width).cumsum()
            pos = int(np.searchsorted(cum.to_numpy(), r + 1))
            b = int(cum.index[pos])
            r -= int(cum.iloc[pos - 1]) if pos > 0 else 0
            levels = levels + [(lo_b, width, b)]

    def _band_collect(self, levels) -> np.ndarray:
        key = tuple(levels)
        if key not in self._band_cache:
            band_values, n_bins = _band_values, self.n_bins

            def part(df: pd.DataFrame) -> pd.DataFrame:
                return pd.DataFrame({"value": band_values(df, levels, n_bins)})

            self._band_cache[key] = (
                self.src.map_batches(part, batch_format="pandas")
                .to_pandas()["value"].to_numpy()
            )
        return self._band_cache[key]

    def stat(self, k: int) -> float:
        if self.lo == self.hi:
            return float(self.lo)
        levels, r, direct = self._refine(k)
        if direct is not None:
            return float(direct)
        return float(np.partition(self._band_collect(levels), r)[r])
