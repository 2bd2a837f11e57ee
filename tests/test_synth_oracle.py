"""Synthetic fixture generator + sequential reference-semantics oracle."""

import numpy as np
import pyarrow.parquet as pq

from raydedup.pipelines.oracle import greedy_star_pairs, pair_recall
from raydedup.sources.synth import generate


def test_generate_deterministic_and_schema():
    t1, tr1 = generate(seed=11, n_convs=60)
    t2, tr2 = generate(seed=11, n_convs=60)
    assert t1.equals(t2) and tr1.equals(tr2)
    assert t1.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    t3, _ = generate(seed=12, n_convs=60)
    assert not t1.equals(t3)


def test_generate_families_present(fixture_dir):
    truth = pq.read_table(f"{fixture_dir}/truth.parquet").to_pandas()
    fams = set(truth["family"])
    assert {"singleton", "exact", "near", "chain", "longrep", "boiler", "zero", "corrupt"} <= fams
    turns = pq.read_table(f"{fixture_dir}/transcripts.parquet").to_pandas()
    assert turns["text"].isna().any()  # corrupted null-text rows exist
    # every truth conv_id appears in the turns table
    assert set(truth["conv_id"]) == set(turns["conv_id"])


def test_oracle_micro_cases():
    # star: b and c match a; d is unrelated
    base = " ".join(f"tok{i}" for i in range(40))
    docs = [
        ("a", base),
        ("b", base),                      # exact dup of a
        ("c", base + " tok40"),           # near dup of a (J = 36/37)
        ("d", " ".join(f"zzz{i}" for i in range(40))),
        ("e", "   "),                     # zero-content
    ]
    res = greedy_star_pairs(docs, shingle_k=5, threshold=0.8)
    assert res.canonicals == ["a", "d"]
    assert [(c, d) for c, d, _ in res.pairs] == [("a", "b"), ("a", "c")]
    assert res.status["e"] == "no_content"
    for _, _, sim in res.pairs:
        assert sim >= 0.8


def test_oracle_first_match_wins_order_dependence():
    # two canonicals both within threshold of the probe → first-seen wins
    base = " ".join(f"t{i}" for i in range(50))
    docs = [("c1", base), ("c2", base), ("probe", base)]
    res = greedy_star_pairs(docs, shingle_k=5, threshold=0.8)
    assert res.canonicals == ["c1"]
    assert {(c, d) for c, d, _ in res.pairs} == {("c1", "c2"), ("c1", "probe")}


def test_pair_recall_scoring():
    pairs = [("a", "b", 0.9), ("a", "c", 0.85)]
    assert pair_recall(pairs, {"a": 1, "b": 1, "c": 1}) == 1.0
    assert pair_recall(pairs, {"a": 1, "b": 1, "c": 2}) == 0.5
    assert pair_recall([], {}) == 1.0


def test_oracle_on_fixture_finds_planted_dups(fixture_dir):
    turns = pq.read_table(f"{fixture_dir}/transcripts.parquet").to_pandas()
    truth = pq.read_table(f"{fixture_dir}/truth.parquet").to_pandas()
    # assemble docs the engine way: ok turns only, sorted, joined with \n
    ok = turns.dropna(subset=["text"]).sort_values(["conv_id", "turn_idx"])
    docs = [
        (cid, "\n".join(g["text"]))
        for cid, g in ok.groupby("conv_id", sort=True)
    ]
    res = greedy_star_pairs(docs, shingle_k=5, threshold=0.8)
    pairs = {(c, d) for c, d, _ in res.pairs}
    assert len(pairs) > 10
    # every exact-family group must be paired by the oracle
    exact_groups = truth[truth.family == "exact"].groupby("group_id")["conv_id"].apply(sorted)
    hit = sum(
        1 for g in exact_groups if (g[0], g[1]) in pairs or (g[1], g[0]) in pairs
    )
    assert hit / len(exact_groups) > 0.95
    # boilerplate-only convs never pair with each other
    boiler = set(truth[truth.family == "boiler"]["conv_id"])
    assert not any(c in boiler and d in boiler for c, d in pairs)
