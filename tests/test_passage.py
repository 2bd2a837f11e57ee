"""Passage-level overlap family (passage.py) + the KL / stutter additions
vs brute-force pandas twins on the sf0.001 tables."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _docs(columns):
    return pq.read_table(f"{SF}/documents.parquet", columns=columns).to_pandas()


def _passages(text: str, k: int = 16) -> list:
    toks = ("" if text is None else text).split(" ")
    return [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(0, len(toks), k)
    ]


def _brute_passage_rows(k: int = 16) -> pd.DataFrame:
    src = _docs(["doc_id", "text"])
    rows = [
        (doc_id, ph)
        for doc_id, text in zip(src["doc_id"], src["text"])
        for ph in _passages(text, k)
    ]
    return pd.DataFrame(rows, columns=["doc_id", "ph"])


def test_passage_dedup_matches_brute_force(ray_session):
    from raydedup.pipelines.passage import passage_dedup

    got = (passage_dedup(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    flat = _brute_passage_rows()
    cnt = flat.groupby("ph").size()
    flat["dup"] = flat["ph"].map(cnt).gt(1)
    want = (flat.groupby("doc_id")
            .agg(n_passages=("ph", "size"), n_dup_passages=("dup", "sum"))
            .reset_index())
    want["dup_ratio"] = np.round(
        want["n_dup_passages"] / want["n_passages"], 6)
    want = want.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every doc appears exactly once, ratio bounded
    assert len(got) == len(_docs(["doc_id"]))
    assert got["dup_ratio"].between(0, 1).all()


def test_dup_passages_matches_brute_force(ray_session):
    from raydedup.pipelines.passage import dup_passages

    got = (dup_passages(SF).to_pandas()
           .sort_values("passage_md5").reset_index(drop=True))
    flat = _brute_passage_rows()
    want = (flat.groupby("ph")["doc_id"]
            .agg(n_docs="nunique", n_occurrences="size", canonical_id="min")
            .reset_index().rename(columns={"ph": "passage_md5"}))
    want = (want[want["n_occurrences"] >= 2]
            .sort_values("passage_md5").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_occurrences"] >= got["n_docs"]).all()


def test_dup_passages_consistent_with_profile(ray_session):
    """Σ n_dup_passages over docs == Σ n_occurrences over dup passages."""
    from raydedup.pipelines.passage import dup_passages, passage_dedup

    prof = passage_dedup(SF).to_pandas()
    hot = dup_passages(SF).to_pandas()
    assert prof["n_dup_passages"].sum() == hot["n_occurrences"].sum()


def test_split_doc_pairs_matches_brute_force(ray_session):
    from raydedup.pipelines.passage import split_doc_pairs

    k = 2  # small boundary → 237 real matches in the sf0.001 fixture
    got = (split_doc_pairs(SF, k=k).to_pandas()
           .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    src = _docs(["doc_id", "text"])
    heads, tails = {}, {}
    for doc_id, text in zip(src["doc_id"], src["text"]):
        toks = ("" if text is None else text).split(" ")
        if len(toks) < k:
            continue
        heads.setdefault(
            hashlib.md5(" ".join(toks[:k]).encode()).hexdigest(), []
        ).append(doc_id)
        tails.setdefault(
            hashlib.md5(" ".join(toks[-k:]).encode()).hexdigest(), []
        ).append(doc_id)
    rows = [
        (a, b)
        for h, alist in tails.items()
        for a in alist
        for b in heads.get(h, [])
        if a != b
    ]
    want = (pd.DataFrame(rows, columns=["doc_a", "doc_b"])
            .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    assert len(want) > 0  # the boundary size must exercise real matches
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_split_doc_pairs_empty_is_typed(ray_session):
    """A boundary size with zero matches keeps the typed schema."""
    from raydedup.pipelines.passage import split_doc_pairs

    ds = split_doc_pairs(SF, k=16)
    assert ds.schema().names == ["doc_a", "doc_b"]
    assert len(ds.to_pandas()) == 0


def test_cross_source_overlap_planted(ray_session, tmp_path):
    """Planted cross-source duplicates are counted as n_a × n_b."""
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from raydedup.pipelines.passage import cross_source_overlap

    rows = {
        "doc_id": list(range(10)),
        "text": ["shared copy"] * 5 + ["only here"] * 2 + ["shared copy"] * 3,
        "source": ["a"] * 5 + ["b"] * 2 + ["b"] * 3,
    }
    pqw.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    got = cross_source_overlap(str(tmp_path)).to_pandas()
    assert got.to_dict("records") == [
        {"source_a": "a", "source_b": "b", "n_pairs": 15}
    ]


def test_cross_source_overlap_empty_is_typed(ray_session, tmp_path):
    """No cross-source dups → 0 rows but the full schema survives."""
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from raydedup.pipelines.passage import cross_source_overlap

    rows = {"doc_id": [1, 2], "text": ["x", "y"], "source": ["a", "b"]}
    pqw.write_table(pa.table(rows), str(tmp_path / "documents.parquet"))
    ds = cross_source_overlap(str(tmp_path))
    assert ds.schema().names == ["source_a", "source_b", "n_pairs"]
    assert len(ds.to_pandas()) == 0


def test_passage_dedup_deterministic_across_partitioning(ray_session):
    from raydedup.pipelines.passage import passage_dedup

    a = (passage_dedup(SF, num_partitions=3).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (passage_dedup(SF, num_partitions=17).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_token_kl_by_source_matches_brute_force(ray_session):
    from raydedup.pipelines.vocab import token_kl_by_source

    got = (token_kl_by_source(SF).to_pandas()
           .sort_values("source").reset_index(drop=True))
    src = _docs(["text", "source"])
    toks = (src.assign(tok=src["text"].fillna("").str.lower()
                       .str.strip().str.split())
            .explode("tok").dropna(subset=["tok"]))
    st = toks.groupby(["source", "tok"]).size().rename("c").reset_index()
    ts = st.groupby("source")["c"].sum()
    cc = st.groupby("tok")["c"].sum()
    tc = float(st["c"].sum())
    p = st["c"].to_numpy(float) / st["source"].map(ts).to_numpy(float)
    q = st["tok"].map(cc).to_numpy(float) / tc
    st["t"] = p * np.log(p / q)
    want = st.groupby("source")["t"].sum().reset_index()
    want["n_tokens"] = want["source"].map(ts).astype(np.int64)
    want["kl"] = np.round(want["t"], 6)
    want = (want[["source", "n_tokens", "kl"]]
            .sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # KL is non-negative up to the 1e-6 rounding grid
    assert (got["kl"] >= -1e-6).all()


def test_stutter_turns_matches_brute_force(ray_session):
    from raydedup.pipelines.transcripts import stutter_turns

    got = (stutter_turns(SF).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    from raydedup.sources.synth import materialize

    fixture = materialize(seed=42, n_convs=200)
    src = (pq.read_table(f"{fixture}/transcripts.parquet",
                         columns=["conv_id", "turn_idx", "text"])
           .to_pandas())
    src["text"] = src["text"].fillna("")
    src = src.sort_values(["conv_id", "turn_idx", "text"])
    rows = []
    for conv_id, g in src.groupby("conv_id", sort=True):
        texts = g["text"].tolist()
        n_stut, run, max_run = 0, 1, 1
        for prev, cur in zip(texts, texts[1:]):
            if cur == prev:
                n_stut += 1
                run += 1
            else:
                run = 1
            max_run = max(max_run, run)
        rows.append((conv_id, len(texts), n_stut, max_run))
    want = (pd.DataFrame(rows, columns=["conv_id", "n_turns",
                                        "n_stutter", "max_run"])
            .sort_values("conv_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_stutter_turns_planted_loop(ray_session):
    """A conversation that repeats one message 4× in a row reads
    n_stutter=3, max_run=4 — the agent-loop signature."""
    from raydedup.pipelines.transcripts import stutter_turns

    base = stutter_turns(SF).to_pandas()
    assert (base["max_run"] >= 1).all()
    assert (base["n_stutter"] <= base["n_turns"] - 1).all()
    # kernel-level check on a synthetic conversation
    import raydedup.pipelines.transcripts as t

    df = pd.DataFrame({
        "conv_id": ["c"] * 6 + ["d"] * 2,
        "turn_idx": [0, 1, 2, 3, 4, 5, 0, 1],
        "text": ["hi", "x", "x", "x", "x", "bye", "x", "y"],
    })
    conv = df["conv_id"].to_numpy(object)
    text = df["text"].to_numpy(object)
    stut = np.zeros(len(df), bool)
    stut[1:] = (conv[1:] == conv[:-1]) & (text[1:] == text[:-1])
    run_id = np.cumsum(~stut) - 1
    rl = np.bincount(run_id)[run_id]
    g = pd.DataFrame({"conv_id": conv, "stut": stut, "rl": rl})
    out = g.groupby("conv_id").agg(n_stutter=("stut", "sum"),
                                   max_run=("rl", "max"))
    assert out.loc["c", "n_stutter"] == 3 and out.loc["c", "max_run"] == 4
    assert out.loc["d", "n_stutter"] == 0 and out.loc["d", "max_run"] == 1


def test_passage_scrub_matches_brute_force(ray_session):
    from raydedup.pipelines.passage import passage_scrub

    k = 16
    got = (passage_scrub(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    src = _docs(["doc_id", "text"]).sort_values("doc_id")
    # brute force: canonical occurrence = (min doc_id, then min offset)
    pas = []
    for doc_id, text in zip(src["doc_id"], src["text"]):
        toks = ("" if text is None else text).split(" ")
        for pidx, i in enumerate(range(0, len(toks), k)):
            pt = " ".join(toks[i:i + k])
            pas.append((doc_id, pidx, pt,
                        hashlib.md5(pt.encode()).hexdigest()))
    df = pd.DataFrame(pas, columns=["doc_id", "pidx", "ptext", "ph"])
    own = df.sort_values(["ph", "doc_id", "pidx"]).drop_duplicates("ph")
    kept_keys = set(zip(own["doc_id"], own["pidx"]))
    df["kept"] = [tuple(x) in kept_keys
                  for x in zip(df["doc_id"], df["pidx"])]
    rows = []
    for doc_id, g in df.groupby("doc_id"):
        kg = g[g["kept"]].sort_values("pidx")
        rows.append((doc_id, " ".join(kg["ptext"]), len(kg),
                     len(g) - len(kg)))
    want = (pd.DataFrame(rows, columns=["doc_id", "text", "n_kept",
                                        "n_pruned"])
            .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the scrub must actually remove something in this fixture
    assert got["n_pruned"].sum() > 0
    # every document survives as a row
    assert len(got) == len(src)


def test_passage_scrub_keeps_exactly_one_copy(ray_session):
    """After the scrub, each original passage hash survives exactly once
    across the corpus (canonical copy), never zero, never more."""
    from raydedup.pipelines.passage import passage_dedup, passage_scrub

    got = passage_scrub(SF).to_pandas()
    prof = passage_dedup(SF).to_pandas()
    assert got["n_kept"].sum() + got["n_pruned"].sum() == \
        prof["n_passages"].sum()
    # kept count == number of DISTINCT passage hashes in the corpus
    flat = _brute_passage_rows()
    assert got["n_kept"].sum() == flat["ph"].nunique()


def test_passage_scrub_unique_corpus_unchanged(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from raydedup.pipelines.passage import passage_scrub

    texts = [f"doc {i} " + " ".join(f"w{i}x{j}" for j in range(20))
             for i in range(6)]
    pqw.write_table(
        pa.table({"doc_id": list(range(6)), "text": texts}),
        str(tmp_path / "documents.parquet"))
    got = passage_scrub(str(tmp_path)).to_pandas().sort_values("doc_id")
    assert (got["n_pruned"] == 0).all()
    assert got["text"].tolist() == texts


def test_stutter_scrub_matches_brute_force(ray_session):
    from raydedup.pipelines.transcripts import stutter_scrub
    from raydedup.sources.synth import materialize

    got = (stutter_scrub(SF).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    fixture = materialize(seed=42, n_convs=200)
    src = (pq.read_table(f"{fixture}/transcripts.parquet",
                         columns=["conv_id", "turn_idx", "text"])
           .to_pandas())
    src["text"] = src["text"].fillna("")
    src = src.sort_values(["conv_id", "turn_idx", "text"])
    rows = []
    for conv_id, g in src.groupby("conv_id", sort=True):
        prev = None
        for turn_idx, text in zip(g["turn_idx"], g["text"]):
            if prev is None or text != prev:
                rows.append((conv_id, turn_idx, text))
            prev = text
    want = (pd.DataFrame(rows, columns=["conv_id", "turn_idx", "text"])
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the scrub keeps at least one turn per conversation
    assert got["conv_id"].nunique() == src["conv_id"].nunique()


def test_stutter_scrub_consistent_with_profile(ray_session):
    """rows dropped by the scrub == Σ n_stutter from the profile."""
    from raydedup.pipelines.transcripts import stutter_scrub, stutter_turns

    prof = stutter_turns(SF).to_pandas()
    scrub = stutter_scrub(SF).to_pandas()
    assert prof["n_turns"].sum() - len(scrub) == prof["n_stutter"].sum()


def test_role_transitions_matches_brute_force(ray_session):
    from raydedup.pipelines.transcripts import role_transitions
    from raydedup.sources.synth import materialize

    got = (role_transitions(SF).to_pandas()
           .sort_values(["role_from", "role_to"]).reset_index(drop=True))
    fixture = materialize(seed=42, n_convs=200)
    src = (pq.read_table(f"{fixture}/transcripts.parquet",
                         columns=["conv_id", "turn_idx", "role"])
           .to_pandas())
    src["role"] = src["role"].fillna("")
    src = src.sort_values(["conv_id", "turn_idx", "role"])
    rows = []
    for conv_id, g in src.groupby("conv_id", sort=True):
        roles = g["role"].tolist()
        rows.extend(zip(roles, roles[1:]))
    want = (pd.DataFrame(rows, columns=["role_from", "role_to"])
            .groupby(["role_from", "role_to"]).size().rename("n")
            .reset_index()
            .sort_values(["role_from", "role_to"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # transition mass == turns - conversations (one LAG-null per conv)
    assert got["n"].sum() == len(src) - src["conv_id"].nunique()


def test_split_doc_pairs_max_side_cap(ray_session):
    """max_side bounds emission deterministically: capped output is a
    subset of exact output, restricted to the lowest doc_ids per side."""
    from raydedup.pipelines.passage import split_doc_pairs

    exact = split_doc_pairs(SF, k=2).to_pandas()
    capped = split_doc_pairs(SF, k=2, max_side=2).to_pandas()
    ex = set(zip(exact["doc_a"], exact["doc_b"]))
    cp = set(zip(capped["doc_a"], capped["doc_b"]))
    assert cp <= ex
    assert len(cp) < len(ex)  # k=2 groups are hot enough to engage the cap
    # determinism of the capped variant across partitionings
    a = (split_doc_pairs(SF, k=2, max_side=2, num_partitions=3).to_pandas()
         .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    b = (split_doc_pairs(SF, k=2, max_side=2, num_partitions=17).to_pandas()
         .sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_windowed_dedup_matches_brute_force(ray_session):
    from raydedup.pipelines.docops import windowed_dedup

    got = (windowed_dedup(SF).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    src = pq.read_table(f"{SF}/events.parquet",
                        columns=["event_id", "ts", "user_id",
                                 "event_type"]).to_pandas()
    src["window_start"] = (src["ts"].dt.floor("1h")
                           .dt.strftime("%Y-%m-%d %H:%M:%S"))
    src["ts_us"] = src["ts"].astype("int64")
    want = (src.sort_values(["ts_us", "event_id"])
            .drop_duplicates(["user_id", "event_type", "window_start"],
                             keep="first")
            [["event_id", "user_id", "event_type", "window_start", "ts_us"]]
            .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # dedup keeps at most one row per key, drops something in the fixture
    assert len(got) <= len(src)
    assert not got.duplicated(["user_id", "event_type",
                               "window_start"]).any()


def test_windowed_dedup_deterministic_across_partitioning(ray_session):
    from raydedup.pipelines.docops import windowed_dedup

    a = (windowed_dedup(SF, num_partitions=3).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    b = (windowed_dedup(SF, num_partitions=17).to_pandas()
         .sort_values("event_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
