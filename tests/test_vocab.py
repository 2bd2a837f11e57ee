"""Corpus-vocabulary operators: df-based pruning, corpus-derived stopword
density, type-token ratio, count-min-sketch heavy hitters, stratified
sampling."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _docs_df() -> pd.DataFrame:
    return pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text", "source"]).to_pandas()


def _tok(s: str) -> list:
    return (s or "").lower().strip().split()


def _brute_df() -> pd.Series:
    """token → document frequency (distinct docs)."""
    docs = _docs_df()
    pairs = {(r.doc_id, t) for r in docs.itertuples() for t in set(_tok(r.text))}
    return pd.Series([t for _, t in pairs]).value_counts()


def test_vocab_prune_matches_brute_force(ray_session):
    from raydedup.pipelines.vocab import vocab_prune

    got = vocab_prune(SF, min_df=5).to_pandas().set_index("doc_id").sort_index()
    dfs = _brute_df()
    kept_vocab = set(dfs[dfs >= 5].index)
    docs = _docs_df()
    for r in docs.itertuples():
        toks = _tok(r.text)
        row = got.loc[r.doc_id]
        assert row["n_tokens"] == len(toks)
        assert row["n_kept"] == sum(t in kept_vocab for t in toks)
        assert row["n_pruned"] == row["n_tokens"] - row["n_kept"]


def test_stopword_ratio_matches_brute_force(ray_session):
    from raydedup.pipelines.vocab import stopword_ratio

    k = 32
    got = stopword_ratio(SF, k=k).to_pandas().set_index("doc_id").sort_index()
    dfs = _brute_df().rename_axis("tok").reset_index(name="df")
    top = set(dfs.sort_values(["df", "tok"], ascending=[False, True],
                              kind="stable").head(k)["tok"])
    docs = _docs_df()
    for r in docs.itertuples():
        toks = _tok(r.text)
        row = got.loc[r.doc_id]
        n_stop = sum(t in top for t in toks)
        assert row["n_tokens"] == len(toks)
        assert row["n_stop"] == n_stop
        want = round(n_stop / len(toks), 12) if toks else 0.0
        assert abs(row["stop_ratio"] - want) < 1e-12


def test_doc_ttr_matches_brute_force(ray_session):
    from raydedup.pipelines.vocab import doc_ttr

    got = doc_ttr(SF).to_pandas().set_index("doc_id").sort_index()
    for r in _docs_df().itertuples():
        toks = _tok(r.text)
        row = got.loc[r.doc_id]
        assert row["n_tokens"] == len(toks)
        assert row["n_distinct"] == len(set(toks))
        want = round(len(set(toks)) / len(toks), 12) if toks else 0.0
        assert abs(row["ttr"] - want) < 1e-12


def test_cms_top_tokens_error_bounds(ray_session):
    """CMS one-sided error: est ≥ true always; overcount ≤ ε·N with
    ε = e/w (the classic bound; deterministic hashes make this stable)."""
    from raydedup.pipelines.vocab import _CMS_W, cms_top_tokens

    got = cms_top_tokens(SF, k=50).to_pandas()
    docs = _docs_df()
    true = pd.Series([t for s in docs["text"] for t in _tok(s)]).value_counts()
    total = int(true.sum())
    eps_n = np.e / _CMS_W * total
    for r in got.itertuples():
        t = int(true.get(r.tok, 0))
        assert r.est >= t, f"CMS undercounted {r.tok!r}: {r.est} < {t}"
        assert r.est <= t + eps_n + 1, f"CMS overcount beyond bound for {r.tok!r}"
    # rank sanity: the estimated top-5 are the exact top-5 at fixture scale
    # (w=8192 >> vocabulary; collisions that reorder the head are absurd)
    want_head = (true.rename_axis("tok").reset_index(name="c")
                 .sort_values(["c", "tok"], ascending=[False, True],
                              kind="stable").head(5)["tok"].tolist())
    assert got.sort_values("rnk").head(5)["tok"].tolist() == want_head


def test_cms_top_tokens_deterministic(ray_session):
    from raydedup.pipelines.vocab import cms_top_tokens

    a = cms_top_tokens(SF, k=20).to_pandas()
    b = cms_top_tokens(SF, k=20).to_pandas()
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_stratified_sample_exact_quotas(ray_session):
    from raydedup.pipelines.sampling import stratified_sample

    got = stratified_sample(SF, group="source", num=1, den=10).to_pandas()
    docs = _docs_df()
    counts = docs["source"].value_counts()
    got_counts = got["source"].value_counts()
    for g, n in counts.items():
        assert got_counts.get(g, 0) == (int(n) + 9) // 10
    # each stratum keeps its lowest-md5(doc_id) members
    docs["sk"] = [hashlib.md5(str(i).encode()).hexdigest() for i in docs["doc_id"]]
    for g, grp in docs.groupby("source"):
        quota = (len(grp) + 9) // 10
        want = set(grp.sort_values(["sk", "doc_id"]).head(quota)["doc_id"])
        assert set(got.loc[got["source"] == g, "doc_id"]) == want


def test_unigram_logprob_matches_sequential(ray_session):
    """Kernel == the sequential numpy twin on the sf fixture: per-doc mean
    of ln(corpus_count/total) over token occurrences, 0.0 for empty docs;
    partition-count invariant."""
    import numpy as np

    from raydedup.pipelines.vocab import unigram_logprob

    got = (unigram_logprob(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = _docs_df()
    toks = docs["text"].fillna("").str.lower().str.strip().str.split()
    from collections import Counter

    counts = Counter()
    for ts in toks:
        counts.update(ts)
    total = float(sum(counts.values()))
    want = []
    for doc_id, ts in zip(docs["doc_id"], toks):
        if len(ts) == 0:
            want.append((doc_id, 0, 0.0))
        else:
            lp = float(np.mean([np.log(counts[t] / total) for t in ts]))
            want.append((doc_id, len(ts), round(lp, 6)))
    import pandas as pd

    wdf = (pd.DataFrame(want, columns=["doc_id", "n_tokens", "avg_logprob"])
           .sort_values("doc_id").reset_index(drop=True))
    assert (got["n_tokens"].to_numpy() == wdf["n_tokens"].to_numpy()).all()
    assert np.allclose(got["avg_logprob"], wdf["avg_logprob"], atol=2e-6)

    b = (unigram_logprob(SF, num_partitions=7).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, b)
