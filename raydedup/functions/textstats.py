"""Text-analysis kernels for the training-data operators: token counting,
quality scoring, language-ID heuristic, whole-document fingerprinting.

All vectorized over pandas Series / pyarrow arrays; integer-valued outputs
where the DuckDB oracle must hash-match exactly.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

_WS = re.compile(r"\s+")

# tiny per-language stopword lists for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "ich", "zu", "mit"},
    "fr": {"le", "la", "et", "les", "des", "est", "une", "dans", "que", "pour"},
    "es": {"el", "la", "los", "que", "de", "una", "es", "por", "con", "para"},
}


def token_counts(texts: pd.Series) -> np.ndarray:
    """Whitespace token count; matches DuckDB
    ``len(regexp_split_to_array(trim(text), '\\s+'))`` with empty → 0.

    Arrow kernels end-to-end (split_pattern_regex + list_value_length):
    ~2× the old pandas ``str.split(...).map(len)`` per-row path, and RE2's
    ASCII ``\\s`` matches the DuckDB twin's RE2 semantics exactly (Python
    ``re`` would also split on unicode spaces like U+00A0)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.Array.from_pandas(texts.fillna(""), type=pa.string())
    trimmed = pc.utf8_trim_whitespace(arr)
    n = (
        pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n[pc.equal(pc.utf8_length(trimmed), 0).to_numpy(zero_copy_only=False)] = 0
    return n


def char_class_counts(texts: pd.Series) -> dict:
    """Integer character-class counts per row (hash-safe for the oracle)."""
    t = texts.fillna("")
    return {
        "n_chars_calc": t.str.len().to_numpy(dtype=np.int64),
        "n_digits": t.str.count(r"[0-9]").to_numpy(dtype=np.int64),
        "n_punct": t.str.count(r"[.,;:!?]").to_numpy(dtype=np.int64),
        "n_upper": t.str.count(r"[A-Z]").to_numpy(dtype=np.int64),
        "n_spaces": t.str.count(r" ").to_numpy(dtype=np.int64),
    }


def quality_flags(texts: pd.Series, min_tokens: int = 5, max_digit_ratio: float = 0.3):
    """Boolean keep/drop quality gate — the text analog of the reference's
    blur gate (Laplacian var < 100 → skip, face_recognition_custom.py:73-77),
    except records are *flagged*, never silently dropped."""
    nt = token_counts(texts)
    cc = char_class_counts(texts)
    with np.errstate(divide="ignore", invalid="ignore"):
        digit_ratio = np.where(cc["n_chars_calc"] > 0, cc["n_digits"] / np.maximum(cc["n_chars_calc"], 1), 0.0)
    return (nt >= min_tokens) & (digit_ratio <= max_digit_ratio)


def langid(texts: pd.Series) -> np.ndarray:
    """Stopword-overlap language heuristic → best language code or 'und'.

    Vectorized: one explode of distinct (row, token) pairs, one stopword
    membership scan per language, bincount per row — no per-row Python.
    Ties break in ``_STOPWORDS`` declaration order (same as argmax over
    the per-row score list)."""
    langs = list(_STOPWORDS)
    n = len(texts)
    out = np.full(n, "und", dtype=object)
    if n == 0:
        return out
    ex = texts.fillna("").str.lower().reset_index(drop=True).str.split(_WS).explode()
    pairs = pd.DataFrame(
        {"row": ex.index.to_numpy(dtype=np.int64), "tok": ex.to_numpy(dtype=object)}
    ).drop_duplicates()  # set semantics: each distinct token counts once per row
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    for j, lg in enumerate(langs):
        hits = pairs.loc[pairs["tok"].isin(_STOPWORDS[lg]), "row"].to_numpy()
        scores[:, j] = np.bincount(hits, minlength=n)
    best = scores.argmax(axis=1)
    has = scores.max(axis=1) > 0
    out[has] = np.asarray(langs, dtype=object)[best[has]]
    return out


def repetition_stats(texts: pd.Series) -> dict:
    """Gopher-style intra-document repetition counters (all integer-valued
    so the DuckDB twin hash-matches exactly):

    * ``n_lines``       — line count after splitting on ``\\n`` ('' → 1 line,
                          matching ``len(string_split(text, chr(10)))``)
    * ``n_dup_lines``   — lines minus distinct lines (boilerplate repeats)
    * ``top_token_n``   — occurrences of the most frequent whitespace token
                          (0 for empty docs)
    * ``rep_keep``      — 1 iff duplicate-line fraction <= 0.3 AND (doc has
                          <10 tokens OR the top token covers <= 20% of them)

    Vectorized: one explode + groupby per metric, no per-row Python."""
    t = texts.fillna("").reset_index(drop=True)
    n = len(t)
    n_tokens = token_counts(t)
    if n == 0:
        z = np.zeros(0, dtype=np.int64)
        return {"n_lines": z, "n_dup_lines": z, "top_token_n": z, "rep_keep": z}
    lines = t.str.split("\n")
    n_lines = lines.str.len().to_numpy(dtype=np.int64)
    ex = lines.explode()
    nd = ex.groupby(level=0).nunique()
    n_distinct = np.zeros(n, dtype=np.int64)
    n_distinct[nd.index.to_numpy(dtype=np.int64)] = nd.to_numpy(dtype=np.int64)
    n_dup_lines = n_lines - n_distinct

    stripped = t.str.strip()
    toks = stripped[stripped.str.len() > 0].str.split(_WS).explode()
    top_token_n = np.zeros(n, dtype=np.int64)
    if len(toks):
        cnt = (
            pd.DataFrame(
                {"row": toks.index.to_numpy(dtype=np.int64),
                 "tok": toks.to_numpy(dtype=object)}
            )
            .groupby(["row", "tok"], sort=False)
            .size()
        )
        top = cnt.groupby(level=0).max()
        top_token_n[top.index.to_numpy(dtype=np.int64)] = top.to_numpy(dtype=np.int64)
    rep_keep = (
        (10 * n_dup_lines <= 3 * n_lines)
        & ((n_tokens < 10) | (5 * top_token_n <= n_tokens))
    ).astype(np.int64)
    return {
        "n_lines": n_lines,
        "n_dup_lines": n_dup_lines,
        "top_token_n": top_token_n,
        "rep_keep": rep_keep,
    }


def md5_fingerprints(texts: pd.Series) -> list:
    """Whole-document md5 hex fingerprint; matches DuckDB ``md5(text)``."""
    return [hashlib.md5(("" if t is None else t).encode("utf-8")).hexdigest() for t in texts]
