"""Transcript-table operators (transcripts.py) vs brute-force pandas twins
on the deterministic synth fixture."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"  # → 200-conv fixture via the sf scale rule


def _fixture_frame(columns):
    from raydedup.sources.synth import materialize

    fixture = materialize(seed=42, n_convs=200)
    return pq.read_table(f"{fixture}/transcripts.parquet",
                         columns=columns).to_pandas()


def test_boilerplate_turns_matches_brute_force(ray_session):
    from raydedup.pipelines.transcripts import boilerplate_turns

    got = (boilerplate_turns(SF, min_convs=10).to_pandas()
           .sort_values("turn_md5").reset_index(drop=True))
    src = _fixture_frame(["conv_id", "text"])
    src["turn_md5"] = src["text"].map(
        lambda t: hashlib.md5(("" if t is None else t).encode()).hexdigest())
    want = (src.groupby("turn_md5")
            .agg(n_convs=("conv_id", "nunique"), n_turns=("conv_id", "size"))
            .reset_index())
    want = (want[want["n_convs"] >= 10]
            .sort_values("turn_md5").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the synth fixture plants ~5 shared system prompts — they must surface
    assert len(got) >= 3
    assert (got["n_turns"] >= got["n_convs"]).all()


def test_boilerplate_threshold_monotone(ray_session):
    from raydedup.pipelines.transcripts import boilerplate_turns

    lo = boilerplate_turns(SF, min_convs=5).to_pandas()
    hi = boilerplate_turns(SF, min_convs=50).to_pandas()
    assert set(hi["turn_md5"]) <= set(lo["turn_md5"])
    assert (hi["n_convs"] >= 50).all()


def test_boilerplate_deterministic_across_partitioning(ray_session):
    from raydedup.pipelines.transcripts import boilerplate_turns

    a = (boilerplate_turns(SF, num_partitions=2).to_pandas()
         .sort_values("turn_md5").reset_index(drop=True))
    b = (boilerplate_turns(SF, num_partitions=7).to_pandas()
         .sort_values("turn_md5").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_role_profile_matches_brute_force(ray_session):
    from raydedup.pipelines.transcripts import role_profile

    got = (role_profile(SF).to_pandas()
           .sort_values("role").reset_index(drop=True))
    src = _fixture_frame(["conv_id", "role", "text", "tool"])
    src["chars"] = src["text"].fillna("").str.len()
    src["has_tool"] = src["tool"].fillna("").str.len() > 0
    want = (src.groupby("role")
            .agg(n_turns=("conv_id", "size"), n_convs=("conv_id", "nunique"),
                 total_chars=("chars", "sum"), n_tool_turns=("has_tool", "sum"))
            .reset_index().sort_values("role").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got["role"]) >= {"system", "user", "assistant"}
