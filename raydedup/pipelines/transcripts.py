"""Transcript-table operators beyond the flagship dedup pipeline.

These run over the input_hint-shaped conversations table
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp) — synthesized deterministically at an sf-derived size, the
same scale rule as the flagship ``q_transcript_dedup`` entry.  The
fixture lives outside the driver's registered views, so the DuckDB twins
read the fixture parquet directly (``__ray_entry__._oracle_fixture_path``);
pytest additionally pins each against a brute-force pandas twin.

Operators:

* :func:`boilerplate_turns` — the mega-bucket diagnostic: turn texts
  shared verbatim across many conversations (system prompts, canned
  tool headers).  These are exactly the texts that explode LSH band
  buckets (the reason the flagship salts band keys, ``lsh.py``), and
  the first thing an operator inspects when a dedup run skews.
* :func:`role_profile` — per-role volume/length/coverage profile of the
  corpus (turns, conversations touched, char mass) — the sanity read
  before choosing shingle size / batch size for a new transcript dump.

Scale shape: both pre-aggregate inside ``map_batches`` so the only
all-to-all volume is (key, counters) rows — boilerplate detection
shuffles distinct (turn_md5, conv_id) pairs (∝ turns, 40-byte rows,
never text bytes); the role profile shuffles blocks × roles partial
rows through a tiny key shuffle.
"""

from __future__ import annotations

import re

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


def _turns(sf_dir: str, columns=None):
    """sf-derived deterministic transcripts fixture (same sizing rule as
    ``__ray_entry__._transcript_dedup``: 200k convs/sf, floor 200)."""
    from raydedup.sources.synth import materialize

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.01
    n_convs = max(200, int(200_000 * sf))
    fixture = materialize(seed=42, n_convs=n_convs)
    ensure_hash_shuffle()
    return read_parquet_clean(f"{fixture}/transcripts.parquet", columns=columns)


def boilerplate_turns(sf_dir: str, min_convs: int = 10,
                      num_partitions: int = 0):
    """(turn_md5, n_convs, n_turns): turn texts appearing verbatim in at
    least ``min_convs`` DISTINCT conversations, with their total turn
    count.  Blocks pre-reduce to distinct (turn_md5, conv_id, cnt) rows;
    one hash shuffle on ``turn_md5`` co-locates each text's rows, and the
    in-block fold computes the exact distinct-conversation count."""

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"turn_md5": pd.Series([], dtype=object),
                                 "conv_id": pd.Series([], dtype=object),
                                 "cnt": pd.Series([], dtype=np.int64)})
        out = (
            pd.DataFrame({"turn_md5": md5_fingerprints(df["text"]),
                          "conv_id": df["conv_id"].to_numpy(dtype=object)})
            .groupby(["turn_md5", "conv_id"], sort=False)
            .size().rename("cnt").reset_index()
        )
        return out.astype({"cnt": np.int64})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"turn_md5": pd.Series([], dtype=object),
                              "n_convs": pd.Series([], dtype=np.int64),
                              "n_turns": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        g = (df.groupby("turn_md5", sort=False)
               .agg(n_convs=("conv_id", "nunique"), n_turns=("cnt", "sum"))
               .reset_index())
        g = g[g["n_convs"] >= min_convs]
        return g.astype({"n_convs": np.int64, "n_turns": np.int64})

    pairs = _turns(sf_dir, ["conv_id", "text"]).map_batches(
        pre, batch_format="pandas"
    )
    return keyed_blocks(pairs, ["turn_md5"],
                        num_partitions or _P()).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )


def role_profile(sf_dir: str):
    """(role, n_turns, n_convs, total_chars, n_tool_turns): per-role corpus
    profile — turn volume, conversations touched, character mass, and how
    many turns carry a tool annotation.  Integer-valued so the pytest twin
    matches exactly.  One partial row per (block, role), then a tiny
    role-keyed shuffle."""

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"role": pd.Series([], dtype=object),
                              "conv_id": pd.Series([], dtype=object),
                              "n_turns": pd.Series([], dtype=np.int64),
                              "total_chars": pd.Series([], dtype=np.int64),
                              "n_tool_turns": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        t = df["text"].fillna("")
        tool = df["tool"].fillna("")
        out = (
            pd.DataFrame({"role": df["role"].to_numpy(dtype=object),
                          "conv_id": df["conv_id"].to_numpy(dtype=object),
                          "chars": t.str.len().to_numpy(dtype=np.int64),
                          "has_tool": (tool.str.len() > 0).to_numpy()})
            .groupby(["role", "conv_id"], sort=False)
            .agg(n_turns=("chars", "size"), total_chars=("chars", "sum"),
                 n_tool_turns=("has_tool", "sum"))
            .reset_index()
        )
        return out.astype({"n_turns": np.int64, "total_chars": np.int64,
                           "n_tool_turns": np.int64})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"role": pd.Series([], dtype=object),
                              "n_turns": pd.Series([], dtype=np.int64),
                              "n_convs": pd.Series([], dtype=np.int64),
                              "total_chars": pd.Series([], dtype=np.int64),
                              "n_tool_turns": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        # per-(role, conv) partials may arrive from several blocks: re-merge
        # before counting distinct conversations
        rc = (df.groupby(["role", "conv_id"], sort=False)
                .agg(n_turns=("n_turns", "sum"),
                     total_chars=("total_chars", "sum"),
                     n_tool_turns=("n_tool_turns", "sum"))
                .reset_index())
        g = (rc.groupby("role", sort=False)
               .agg(n_turns=("n_turns", "sum"), n_convs=("conv_id", "size"),
                    total_chars=("total_chars", "sum"),
                    n_tool_turns=("n_tool_turns", "sum"))
               .reset_index())
        return g.astype({"n_turns": np.int64, "n_convs": np.int64,
                         "total_chars": np.int64, "n_tool_turns": np.int64})

    partials = _turns(sf_dir, ["conv_id", "role", "text", "tool"]).map_batches(
        pre, batch_format="pandas"
    )
    return keyed_blocks(partials, ["role"], 4).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )


def stutter_turns(sf_dir: str, num_partitions: int = 0):
    """(conv_id, n_turns, n_stutter, max_run): per-conversation stutter
    profile — how many turns repeat the IMMEDIATELY preceding turn's text
    verbatim (under stable ``turn_idx`` order), and the longest run of
    identical consecutive turns.  The agent-loop detector: a transcript
    where the assistant re-emits the same message is the transcript-
    native analog of the reference's consecutive-frame duplicates
    (``duplicate_face.py`` scans video frames in order), and the first
    per-conversation quality gate a transcript curation pass applies.

    One ``conv_id`` hash shuffle (complete conversations per block, the
    flagship's reassembly invariant); the in-block kernel is one sort +
    shifted equality + run-length bincount — no Python row loop."""

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                              "n_turns": pd.Series([], dtype=np.int64),
                              "n_stutter": pd.Series([], dtype=np.int64),
                              "max_run": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        # text as the tie-break key: the fixture carries duplicate
        # (conv_id, turn_idx) rows, and only a total order keeps the
        # kernel identical to the twin's windows (ORDER BY turn_idx, text)
        df = df.assign(text=df["text"].fillna("")).sort_values(
            ["conv_id", "turn_idx", "text"], kind="mergesort")
        conv = df["conv_id"].to_numpy(dtype=object)
        text = df["text"].to_numpy(dtype=object)
        n = len(df)
        stut = np.zeros(n, dtype=bool)
        if n > 1:
            stut[1:] = (conv[1:] == conv[:-1]) & (text[1:] == text[:-1])
        # runs of identical consecutive turns: a new run starts wherever
        # the current turn does NOT repeat its predecessor
        run_id = np.cumsum(~stut) - 1
        run_len = np.bincount(run_id)
        per_turn_runlen = run_len[run_id]
        g = pd.DataFrame({"conv_id": conv,
                          "stut": stut.astype(np.int64),
                          "rl": per_turn_runlen.astype(np.int64)})
        out = (g.groupby("conv_id", sort=False)
               .agg(n_turns=("stut", "size"), n_stutter=("stut", "sum"),
                    max_run=("rl", "max"))
               .reset_index())
        return out.astype({"n_turns": np.int64, "n_stutter": np.int64,
                           "max_run": np.int64})

    turns = _turns(sf_dir, ["conv_id", "turn_idx", "text"])
    return keyed_blocks(turns, ["conv_id"],
                        num_partitions or _P()).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )


def stutter_scrub(sf_dir: str, num_partitions: int = 0):
    """(conv_id, turn_idx, text): the stutter TRANSFORM — drop every turn
    that repeats the immediately preceding turn's text verbatim, keeping
    the first occurrence of each run (original ``turn_idx`` preserved so
    downstream joins still line up).  The cleaning pass an agent-loop-
    afflicted transcript dump gets before training; companion transform
    to the :func:`stutter_turns` profile.

    One ``conv_id`` shuffle; in-block sort + shifted-equality mask —
    output carries turn text (∝ kept bytes, the rewriting lower bound)."""

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                              "turn_idx": pd.Series([], dtype=np.int32),
                              "text": pd.Series([], dtype=object)})
        if len(df) == 0:
            return empty
        # same total order as stutter_turns (text tie-break on duplicate
        # turn_idx rows) so profile and transform agree row-for-row
        df = df.assign(text=df["text"].fillna("")).sort_values(
            ["conv_id", "turn_idx", "text"], kind="mergesort")
        conv = df["conv_id"].to_numpy(dtype=object)
        text = df["text"].to_numpy(dtype=object)
        n = len(df)
        keep = np.ones(n, dtype=bool)
        if n > 1:
            keep[1:] = (conv[1:] != conv[:-1]) | (text[1:] != text[:-1])
        out = pd.DataFrame({"conv_id": conv[keep],
                            "turn_idx": df["turn_idx"].to_numpy()[keep],
                            "text": text[keep]})
        return out

    turns = _turns(sf_dir, ["conv_id", "turn_idx", "text"])
    return keyed_blocks(turns, ["conv_id"],
                        num_partitions or _P()).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )


def role_transitions(sf_dir: str, num_partitions: int = 0):
    """(role_from, role_to, n): adjacent-turn role transition counts over
    stable turn order — the dialogue-structure Markov profile (assistant→
    tool→assistant loops, user→user double-sends).  The structural sanity
    read before assuming a turn-alternation invariant in a new dump.

    One ``conv_id`` shuffle (complete conversations per block) → sorted
    shift → per-block partial (role_from, role_to, n) counts → tiny
    role² shuffle fold."""

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"role_from": pd.Series([], dtype=object),
                              "role_to": pd.Series([], dtype=object),
                              "n": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        # NULL roles fold to '' (pandas groupby DROPS None keys; SQL
        # GROUP BY keeps them), and role is the tie-break key over the
        # fixture's duplicate (conv_id, turn_idx) rows — matching the
        # twin's ORDER BY turn_idx, role
        df = df.assign(role=df["role"].fillna("")).sort_values(
            ["conv_id", "turn_idx", "role"], kind="mergesort")
        conv = df["conv_id"].to_numpy(dtype=object)
        role = df["role"].to_numpy(dtype=object)
        n = len(df)
        if n < 2:
            return empty
        same = conv[1:] == conv[:-1]
        out = (pd.DataFrame({"role_from": role[:-1][same],
                             "role_to": role[1:][same]})
               .groupby(["role_from", "role_to"], sort=False)
               .size().rename("n").reset_index())
        return out.astype({"n": np.int64})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"role_from": pd.Series([], dtype=object),
                              "role_to": pd.Series([], dtype=object),
                              "n": pd.Series([], dtype=np.int64)})
        if len(df) == 0:
            return empty
        out = (df.groupby(["role_from", "role_to"], sort=False)["n"]
               .sum().reset_index())
        return out.astype({"n": np.int64})

    turns = _turns(sf_dir, ["conv_id", "turn_idx", "role"])
    partials = keyed_blocks(turns, ["conv_id"],
                            num_partitions or _P()).map_batches(
        pre, batch_size=None, batch_format="pandas"
    )
    return keyed_blocks(partials, ["role_from", "role_to"], 4).map_batches(
        fold, batch_size=None, batch_format="pandas"
    )
