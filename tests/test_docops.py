"""Operator tests over the driver testdata tables (sf0.001) + multimodal
plumbing — small-scale correctness for the queries() surface."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def test_exact_dedup_all_assigned(ray_session):
    from raydedup.pipelines.docops import exact_dedup

    df = exact_dedup(SF).to_pandas()
    assert df.doc_id.is_unique
    assert (df.canonical_id <= df.doc_id).all()


def test_token_stats_matches_python(ray_session):
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import doc_token_stats

    df = doc_token_stats(SF).to_pandas().set_index("doc_id").sort_index()
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas().set_index("doc_id").sort_index()
    exp = src["text"].map(lambda t: len(t.split()))
    assert (df["n_tokens"] == exp).all()
    assert (df["n_chars_calc"] == src["text"].str.len()).all()


def test_ngram_jaccard_pairs_symmetric_and_thresholded(ray_session):
    from raydedup.pipelines.docops import ngram_jaccard_pairs

    df = ngram_jaccard_pairs(SF).to_pandas()
    assert (df.a < df.b).all()
    assert not df.duplicated(["a", "b"]).any()
    assert (2 * df.n_inter >= df.n_union).all()
    assert (df.n_inter <= df.n_union).all()


def test_knn_bruteforce_shape_and_rank(ray_session):
    from raydedup.pipelines.similarity import knn_bruteforce

    t = knn_bruteforce(SF, n_queries=4, k=3).to_pandas()
    assert set(t.query_id) == {0, 1, 2, 3}
    assert (t.groupby("query_id")["rnk"].apply(lambda s: sorted(s) == [1, 2, 3])).all()
    assert (t.query_id != t.neighbor_id).all()


def test_ann_lsh_subset_of_corpus(ray_session):
    from raydedup.pipelines.similarity import ann_lsh

    t = ann_lsh(SF, n_queries=4, k=3).to_pandas()
    assert (t.rnk <= 3).all()
    assert (t.query_id != t.neighbor_id).all()


def test_events_by_window_totals(ray_session):
    """Windowed counts partition the event stream: per-type window sums
    equal whole-table counts, and windows align to the hour."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import events_by_window

    df = events_by_window(SF).to_pandas()
    raw = pq.read_table(f"{SF}/events.parquet", columns=["event_type"]).to_pandas()
    assert df.n_events.sum() == len(raw)
    by_type = df.groupby("event_type")["n_events"].sum()
    for t, n in raw.value_counts("event_type").items():
        assert by_type[t] == n
    assert df.window_start.str.endswith(":00:00").all()
    assert not df.duplicated(["window_start", "event_type"]).any()


def test_user_sessions_gap_rule(ray_session):
    """Sessionization matches a sequential per-user replay of the gap rule."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import user_sessions

    df = user_sessions(SF, gap_minutes=30).to_pandas().set_index("user_id")
    raw = pq.read_table(f"{SF}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    gap = pd.Timedelta(minutes=30)
    for uid, g in raw.groupby("user_id"):
        ts = g["ts"].sort_values()
        n_sessions = int((ts.diff() > gap).sum()) + 1
        assert df.loc[uid, "n_events"] == len(g), uid
        assert df.loc[uid, "n_sessions"] == n_sessions, uid


def test_top_tokens_matches_sequential(ray_session):
    """Two-level heavy-hitter reduction equals a sequential pandas count."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import top_tokens

    df = top_tokens(SF, k=10).to_pandas()
    src = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()
    counts = {}
    for t in src["text"].fillna(""):
        for tok in set(t.lower().strip().split()):
            counts[tok] = counts.get(tok, 0) + 1
    exp = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = list(zip(df.sort_values("rnk")["tok"], df.sort_values("rnk")["df"]))
    assert got == exp
    assert list(df.sort_values("rnk")["rnk"]) == list(range(1, len(exp) + 1))


def test_length_quantiles_matches_numpy(ray_session):
    """Count-distribution quantiles equal ceil(q*n)-1 indexing per source."""
    import pyarrow.parquet as pq

    from raydedup.functions.textstats import token_counts
    from raydedup.pipelines.docops import length_quantiles

    df = length_quantiles(SF).to_pandas().set_index("source").sort_index()
    src = pq.read_table(f"{SF}/documents.parquet", columns=["source", "text"]).to_pandas()
    src["n_tok"] = token_counts(src["text"])
    for s, g in src.groupby("source"):
        vals = np.sort(g["n_tok"].to_numpy())
        for col, q in [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]:
            idx = max(0, int(np.ceil(round(q * len(vals), 9))) - 1)
            assert df.loc[s, col] == vals[idx], (s, col)


def test_sample_docs_deterministic_subset(ray_session):
    """Hash sample: deterministic, id-addressed, rate near 32/256."""
    from raydedup.pipelines.docops import sample_docs

    a = sample_docs(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = sample_docs(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    import hashlib

    for i in a["doc_id"]:
        assert hashlib.md5(str(i).encode()).hexdigest()[:2] <= "1f"


def test_docs_enriched_counts(ray_session):
    """Broadcast-join enrichment carries exact per-source totals to every row."""
    from raydedup.pipelines.docops import docs_enriched

    df = docs_enriched(SF).to_pandas()
    sizes = df.groupby("source")["doc_id"].size()
    assert (df["source_n_docs"] == df["source"].map(sizes)).all()
    assert df.doc_id.is_unique


def test_asof_attribution_matches_sequential(ray_session):
    """As-of join equals a per-user sequential replay: every purchase gets
    the user's latest click at-or-before it; purchases without one drop."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import asof_attribution

    df = asof_attribution(SF).to_pandas().set_index("event_id").sort_index()
    raw = pq.read_table(f"{SF}/events.parquet").to_pandas()
    raw = raw[raw.event_type.isin(["purchase", "click"])]
    expected = {}
    for _, g in raw.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="stable")
        last_click = None
        for _, r in g.iterrows():
            if r.event_type == "click":
                last_click = r.event_id
            elif last_click is not None:
                expected[r.event_id] = (r.user_id, last_click)
    assert len(df) == len(expected)
    for eid, (uid, cid) in expected.items():
        assert df.loc[eid, "user_id"] == uid
        assert df.loc[eid, "attributed_id"] == cid


def test_ann_ivf_recall_vs_bruteforce(ray_session):
    """IVF top-k is deterministic, well-formed, and recalls most exact
    top-k neighbors at a generous probe setting."""
    from raydedup.pipelines.similarity import ann_ivf, knn_bruteforce

    exact = knn_bruteforce(SF, n_queries=4, k=3).to_pandas()
    t = ann_ivf(SF, n_queries=4, k=3, n_cells=8, n_probe=4).to_pandas()
    t2 = ann_ivf(SF, n_queries=4, k=3, n_cells=8, n_probe=4).to_pandas()
    pd.testing.assert_frame_equal(t, t2)  # deterministic
    assert (t.rnk <= 3).all()
    assert (t.query_id != t.neighbor_id).all()
    got = set(map(tuple, t[["query_id", "neighbor_id"]].itertuples(index=False)))
    want = set(map(tuple, exact[["query_id", "neighbor_id"]].itertuples(index=False)))
    assert len(got & want) >= 0.5 * len(want)  # probing half the cells


def test_minhash_doc_clusters_cover_all(ray_session):
    import pyarrow.parquet as pq

    from raydedup.pipelines.docdedup import minhash_doc_clusters

    df = minhash_doc_clusters(SF).to_pandas()
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert len(df) == n_docs
    assert df.conv_id.is_unique
    assert df.cluster_id.notna().all()


def test_media_features_stub(ray_session):
    from raydedup.stages.multimodal import media_feature_pipeline

    df = media_feature_pipeline(SF).to_pandas()
    assert (df.status == "ok").all()
    assert (df.n_bytes > 0).all()


def test_media_features_full_vectors(ray_session):
    from raydedup.stages.multimodal import documents_as_media, extract_media_features

    feats = extract_media_features(documents_as_media(SF)).to_pandas()
    v0 = np.asarray(feats.feature.iloc[0])
    assert v0.shape == (16,)
    # deterministic: same payload → same feature
    feats2 = extract_media_features(documents_as_media(SF)).to_pandas()
    a = feats.sort_values("media_id").feature.map(tuple).tolist()
    b = feats2.sort_values("media_id").feature.map(tuple).tolist()
    assert a == b


def test_media_real_decoder_not_implemented(ray_session):
    from raydedup.stages.multimodal import MediaFeatureActor

    with pytest.raises(NotImplementedError):
        MediaFeatureActor(decoder="jpeg")


def test_ngram_df_cap_matches_duckdb(ray_session, tmp_path):
    """The document-frequency cap is mirrored by the DuckDB twin: with a
    cap small enough to drop hot tokens, engine and SQL still agree."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import ngram_jaccard_pairs

    # 'hot' appears in every doc (df=8 > cap=4); rare tokens drive pairs
    texts = [
        "hot alpha beta gamma",
        "hot alpha beta gamma",       # exact dup of 0
        "hot alpha beta delta",       # near dup of 0
        "hot epsilon zeta eta",
        "hot epsilon zeta eta theta",  # near dup of 3
        "hot iota kappa lam",
        "hot mu nu xi",
        "hot",                         # only the capped token
    ]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}),
        d / "documents.parquet",
    )
    cap = 4
    got = (
        ngram_jaccard_pairs(str(d), df_cap=cap)
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    import __ray_entry__ as entry

    sql = entry.oracle_sql()["q_ngram_jaccard_pairs"].replace(
        f"COUNT(*) <= {entry._ngram_df_cap()}", f"COUNT(*) <= {cap}"
    )
    exp = con.execute(sql).df().sort_values(["a", "b"]).reset_index(drop=True)
    assert len(exp) > 0  # the capped comparison is non-trivial
    cols = ["a", "b", "n_inter", "n_union"]
    assert (got[cols].values == exp[cols].values).all()
    # the capped token never produced the all-pairs clique: doc 7 (only
    # 'hot') pairs with nobody
    assert 7 not in set(got.a) | set(got.b)


def test_embedding_dup_pairs_lsh_recall(ray_session, tmp_path):
    """The LSH-bucketed pair-mining path finds >=90% of the exact path's
    pairs on a clustered fixture and never emits a false pair."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.pipelines.similarity import (
        embedding_dup_pairs,
        embedding_dup_pairs_lsh,
    )

    rng = np.random.RandomState(3)
    dim, n_clusters, per = 32, 40, 5
    centers = rng.randn(n_clusters, dim)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = np.repeat(centers, per, axis=0) + 0.05 * rng.randn(n_clusters * per, dim)
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array([v.tolist() for v in vecs],
                                      pa.list_(pa.float64())),
            }
        ),
        d / "embeddings.parquet",
    )
    thr = 0.9
    exact = embedding_dup_pairs(str(d), thr).to_pandas()
    lsh = embedding_dup_pairs_lsh(str(d), thr).to_pandas()
    exact_set = set(zip(exact.a, exact.b))
    lsh_set = set(zip(lsh.a, lsh.b))
    assert len(exact_set) >= 100
    assert lsh_set <= exact_set  # in-bucket verify is exact → precision 1.0
    assert len(lsh_set) / len(exact_set) >= 0.9
    # the size gate routes big inputs to the LSH path
    gated = embedding_dup_pairs(str(d), thr, max_broadcast_rows=10).to_pandas()
    assert set(zip(gated.a, gated.b)) == lsh_set


def test_top_docs_per_group_rank_semantics(ray_session):
    """Per-lang rank: k rows per lang, ordered by (n_chars desc, doc_id)."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import top_docs_per_group

    got = top_docs_per_group(SF, k=3).to_pandas().sort_values(["lang", "rnk"])
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    for lang, g in got.groupby("lang"):
        assert list(g.rnk) == list(range(1, len(g) + 1))
        exp = (
            src[src.lang == lang]
            .sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .head(3)
        )
        assert list(g.doc_id) == list(exp.doc_id)


def test_tfidf_top_terms_scoring(ray_session):
    """tf·ln(N/df) scoring vs a sequential pandas recomputation."""
    from collections import Counter

    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import tfidf_top_terms

    got = tfidf_top_terms(SF, k=5).to_pandas()
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    n = len(src)
    docs = {
        r.doc_id: Counter(r.text.lower().strip().split())
        for r in src.itertuples()
        if r.text.strip()
    }
    df_counts = Counter(t for c in docs.values() for t in c)
    for did, c in list(docs.items())[:20]:
        scored = sorted(
            (
                (-round(tf * np.log(n / df_counts[t]), 6), t)
                for t, tf in c.items()
            )
        )[:5]
        g = got[got.doc_id == did].sort_values("rnk")
        assert list(g.tok) == [t for _, t in scored]
        assert (g.rnk.to_numpy() == np.arange(1, len(g) + 1)).all()


def test_docs_events_semi_anti_partition(ray_session):
    """Semi + anti partition the documents table on event activity."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import docs_events_antijoin

    anti = docs_events_antijoin(SF).to_pandas()
    semi = docs_events_antijoin(SF, semi=True).to_pandas()
    users = set(pq.read_table(f"{SF}/events.parquet", columns=["user_id"])["user_id"].to_pylist())
    n_docs = pq.ParquetFile(f"{SF}/documents.parquet").metadata.num_rows
    assert len(anti) + len(semi) == n_docs
    assert set(semi.doc_id) <= users
    assert not (set(anti.doc_id) & users)


def test_event_value_pivot_row_sums(ray_session):
    """Pivot columns sum back to each user's total event value."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import event_value_pivot

    got = event_value_pivot(SF).to_pandas().set_index("user_id").sort_index()
    src = pq.read_table(f"{SF}/events.parquet").to_pandas()
    exp = src.groupby("user_id")["value"].sum().sort_index()
    assert np.allclose(got.sum(axis=1).to_numpy(), exp.to_numpy(), atol=1e-5)
    one = src[src.event_type == "purchase"].groupby("user_id")["value"].sum()
    assert np.allclose(got["purchase"].to_numpy(), one.reindex(got.index, fill_value=0.0), atol=1e-5)


def test_user_cumulative_value_monotone_and_total(ray_session):
    """Running sums are per-user monotone (values >= 0 in the fixture)
    and the final row equals the user's total."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import user_cumulative_value

    got = user_cumulative_value(SF).to_pandas()
    src = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert len(got) == len(src)
    m = src.set_index("event_id").loc[got.event_id]
    order = got.assign(ts=m["ts"].to_numpy()).sort_values(
        ["user_id", "ts", "event_id"], kind="stable"
    )
    for uid, g in order.groupby("user_id"):
        assert (np.diff(g.cum_value.to_numpy()) >= -1e-9).all()
        exp_total = src[src.user_id == uid]["value"].sum()
        assert abs(g.cum_value.iloc[-1] - exp_total) < 1e-5


def test_pricing_summary_cent_exact(ray_session):
    """Grouped agg with cent-exact integer sums vs a pandas recompute."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.relops import pricing_summary

    got = (
        pricing_summary(SF)
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    src = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    pc = np.round(src.l_extendedprice.to_numpy() * 100).astype(np.int64)
    dp = np.round(src.l_discount.to_numpy() * 100).astype(np.int64)
    exp = (
        pd.DataFrame(
            {
                "l_returnflag": src.l_returnflag,
                "l_linestatus": src.l_linestatus,
                "qty": np.round(src.l_quantity.to_numpy()).astype(np.int64),
                "base": pc,
                "disc": pc * (100 - dp) // 100,
            }
        )
        .groupby(["l_returnflag", "l_linestatus"])
        .agg(sum_qty=("qty", "sum"), sum_base_cents=("base", "sum"),
             sum_disc_cents=("disc", "sum"), n_rows=("qty", "size"))
        .reset_index()
    )
    assert (got[exp.columns].values == exp.values).all()


def test_segment_revenue_join(ray_session):
    """Co-shuffle join totals match a pandas merge."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.relops import segment_revenue

    got = segment_revenue(SF).to_pandas().set_index("c_mktsegment").sort_index()
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.round(j.o_totalprice.to_numpy() * 100).astype(np.int64)
    exp = j.groupby("c_mktsegment").agg(
        n_orders=("cents", "size"), revenue_cents=("cents", "sum")
    ).sort_index()
    assert (got.values == exp.values).all()
    assert got.n_orders.sum() == len(orders)  # every order has a customer


def test_priority_counts_filter_pushdown(ray_session):
    """Year-filtered scan matches a pandas filter; no rows outside."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.relops import priority_counts

    got = priority_counts(SF, year=1996).to_pandas().set_index("o_orderpriority")
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    mask = (orders.o_orderdate >= "1996-01-01") & (orders.o_orderdate < "1997-01-01")
    exp = orders[mask].groupby("o_orderpriority").size()
    assert got.n_orders.sort_index().equals(exp.sort_index().rename("n_orders"))


def test_bpe_tokens_counts(ray_session):
    """BPE-ish regex count vs a sequential re.findall recompute."""
    import re

    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import _BPE_PAT, doc_bpe_tokens

    got = doc_bpe_tokens(SF).to_pandas().set_index("doc_id").sort_index()
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas().set_index("doc_id").sort_index()
    exp = src["text"].map(lambda t: len(re.findall(_BPE_PAT, t or "")))
    assert (got["n_bpe_tokens"] == exp).all()
    assert (got["n_ws_tokens"] <= got["n_bpe_tokens"]).all()


def test_incremental_dedup_planted(ray_session, tmp_path):
    """New-batch docs that duplicate corpus docs attach to the corpus
    canonical; new-new twins cluster to their min member; unique new
    docs stay self-canonical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.functions.hashing import splitmix64
    from raydedup.pipelines.docdedup import incremental_dedup

    n = 200
    ids = np.arange(1, n + 1, dtype=np.int64)
    is_new = (splitmix64(ids.astype(np.uint64)) % np.uint64(4)) == 0
    new_ids = ids[is_new]
    old_ids = ids[~is_new]
    rng = np.random.RandomState(7)
    vocab = [f"w{i}" for i in range(3000)]
    texts = {
        int(i): " ".join(rng.choice(vocab, size=12, replace=False)) for i in ids
    }
    # plant: first 4 new ids copy texts of first 4 old ids
    planted = list(zip(new_ids[:4].tolist(), old_ids[:4].tolist()))
    for nid, oid in planted:
        texts[nid] = texts[oid]
    # plant: new ids [4] and [5] are twins of each other (unknown to corpus)
    twins = (int(new_ids[4]), int(new_ids[5]))
    texts[twins[1]] = texts[twins[0]]

    d = tmp_path / "sfx"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([texts[int(i)] for i in ids], pa.string()),
            }
        ),
        d / "documents.parquet",
    )
    got = incremental_dedup(str(d)).to_pandas().set_index("conv_id")
    conv = lambda i: f"doc-{i:010d}"
    assert len(got) == len(new_ids)
    for nid, oid in planted:
        row = got.loc[conv(nid)]
        assert row.matched_existing == 1
        assert row.canonical_id == conv(oid)
    lo, hi = min(twins), max(twins)
    assert got.loc[conv(hi)].canonical_id == conv(lo)
    assert got.loc[conv(hi)].matched_existing == 0
    # everything else self-canonical, unmatched
    others = set(map(conv, new_ids)) - {conv(a) for a, _ in planted} - {conv(t) for t in twins}
    sub = got.loc[sorted(others)]
    assert (sub.index == sub.canonical_id).all()
    assert (sub.matched_existing == 0).all()


def test_curate_corpus_composition(ray_session):
    """Curated output = quality survivors, one per exact-text group,
    with langid annotation — recomputed sequentially."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import curate_corpus

    got = curate_corpus(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    t = src.text.fillna("")
    n_tok = t.map(lambda s: len(s.split()))
    keep = (n_tok >= 5) & (10 * t.str.count(r"[0-9]") <= 3 * t.str.len())
    surv = src[keep].copy()
    surv["canon"] = surv.groupby(surv.text.fillna(""))["doc_id"].transform("min")
    exp_ids = sorted(surv[surv.doc_id == surv.canon].doc_id)
    assert list(got.doc_id) == exp_ids
    assert (got.n_tokens >= 5).all()
    assert set(got.lang_pred) <= {"en", "de", "fr", "es", "und"}


def test_frame_sample_explosion(ray_session):
    """1→N frame explosion: chunk count and sizes match payload bytes."""
    import pyarrow.parquet as pq

    from raydedup.stages.multimodal import frame_sample_pipeline

    got = frame_sample_pipeline(SF).to_pandas()
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    nb = src.text.fillna("").str.encode("utf-8").str.len()
    exp_frames = np.minimum(4, np.ceil(nb / 256.0).astype(int))[nb > 0]
    assert len(got) == int(exp_frames.sum())
    per = got.groupby("media_id")["frame_idx"].agg(["size", "max"])
    assert (per["max"] == per["size"] - 1).all()  # dense 0..k-1 per media
    assert (got.n_bytes_frame > 0).all()
    assert (got.n_bytes_frame <= 256).all()


def test_media_resize_bounds(ray_session):
    """Resize stub: output payload metadata bounded by target bytes."""
    from raydedup.stages.multimodal import media_resize_pipeline

    got = media_resize_pipeline(SF, target_bytes=100).to_pandas()
    assert (got.n_bytes_out <= 100).all()
    assert (got.n_bytes_out == np.minimum(got.n_bytes_in, 100)).all()
    assert (got.status == "ok").all()


def test_tfidf_df_cap_drops_hot_tokens(ray_session):
    """With a df cap, tokens above the document-frequency bound vanish
    from every doc's top terms; the rest keep their relative order."""
    import pyarrow.parquet as pq
    from collections import Counter

    from raydedup.pipelines.docops import tfidf_top_terms

    cap = 50
    got = tfidf_top_terms(SF, k=5, df_cap=cap).to_pandas()
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    df_counts = Counter(
        t
        for txt in src.text.fillna("")
        if txt.strip()
        for t in set(txt.lower().strip().split())
    )
    hot = {t for t, c in df_counts.items() if c > cap}
    assert hot  # the cap bites on this fixture
    assert not (set(got.tok) & hot)


def test_repetition_stats_handcrafted(ray_session, tmp_path):
    """Gopher-style repetition metrics on handcrafted docs, engine vs the
    DuckDB twin and vs hand-computed expectations."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    import __ray_entry__ as entry
    from raydedup.pipelines.docops import doc_repetition_stats

    texts = [
        "a b c\na b c\na b c\nunique line",     # 4 lines, 2 dups, top tok 'a'x3
        "one two three four five six seven eight nine ten",  # clean long doc
        "spam spam spam spam spam spam spam spam spam spam spam x",  # top-heavy
        "",                                       # empty: 1 line, 0 tokens
        "short doc",                              # <10 tokens: top-gate waived
        None,                                     # null text == ''
    ]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())}),
        d / "documents.parquet",
    )
    got = doc_repetition_stats(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    # doc 0: 4 lines, 3 distinct -> 1 dup (10*1 <= 3*4 ok); 13 tokens? a,b,c x3 + unique line
    assert got.loc[0, ["n_lines", "n_dup_lines", "top_token_n"]].tolist() == [4, 2, 3]
    assert got.loc[0, "rep_keep"] == 0  # 10*2 > 3*4: duplicate-line gate fires
    assert got.loc[1, ["n_lines", "n_dup_lines", "top_token_n", "rep_keep"]].tolist() == [1, 0, 1, 1]
    assert got.loc[2, "top_token_n"] == 11
    assert got.loc[2, "rep_keep"] == 0  # 5*11 > 12 tokens
    assert got.loc[3, ["n_lines", "n_dup_lines", "top_token_n", "rep_keep"]].tolist() == [1, 0, 0, 1]
    assert got.loc[4, "rep_keep"] == 1  # 2 tokens < 10: concentration gate waived
    assert got.loc[5, ["n_lines", "top_token_n", "rep_keep"]].tolist() == [1, 0, 1]

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = (
        con.execute(entry.oracle_sql()["q_repetition_stats"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    cols = ["doc_id", "n_lines", "n_dup_lines", "top_token_n", "rep_keep"]
    assert (got[cols].values == exp[cols].values).all()


def test_hopping_window_coverage(ray_session):
    """Each event lands in exactly size/hop windows: hopping totals are
    2x tumbling totals at (size=2h, hop=1h), and every tumbling window's
    count is contained in its two covering hopping windows."""
    from raydedup.pipelines.docops import events_by_hopping_window, events_by_window

    hop = events_by_hopping_window(SF).to_pandas()
    tum = events_by_window(SF).to_pandas()
    assert hop.n_events.sum() == 2 * tum.n_events.sum()
    m = hop.merge(tum, on=["window_start", "event_type"], how="right",
                  suffixes=("_hop", "_tum"))
    assert (m.n_events_hop >= m.n_events_tum).all()


def test_embedding_pca_matches_sequential(ray_session):
    """Distributed PCA equals a sequential numpy twin of the same
    quantized algorithm bit-for-bit; projections are decorrelated with
    descending variance."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.similarity import _PCAQ, embedding_pca

    nc = 8
    got = (embedding_pca(SF, n_components=nc).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))

    src = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().sort_values("vec_id")
    x = np.stack([np.asarray(v, dtype=np.float64) for v in src["embedding"]])
    q = float(_PCAQ)
    xq = np.floor(x * q).astype(np.int64)
    n, d = xq.shape
    s = xq.sum(axis=0).astype(np.float64)
    g = (xq.T @ xq).astype(np.float64)
    mean = s / (n * q)
    cov = (g / q**2 - np.outer(s, s) / (q**2 * n)) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:nc]
    basis = evecs[:, order]
    flip = np.sign(basis[np.abs(basis).argmax(axis=0), np.arange(nc)])
    flip[flip == 0] = 1.0
    basis = basis * flip[None, :]
    exp = (x - mean[None, :]) @ basis

    assert len(got) == n and got.vec_id.is_unique
    got_m = got[[f"pc{c}" for c in range(nc)]].to_numpy(np.float64)
    # the fitted basis is bit-deterministic (integer partials); the float
    # projection matmul rounds differently across BLAS block shapes, so
    # compare at machine epsilon
    np.testing.assert_allclose(got_m, exp, rtol=0, atol=1e-12)

    # PCA sanity: the basis diagonalizes the QUANTIZED covariance, so
    # raw-data projections decorrelate to quantization error (~1/2^12)
    centered = got_m - got_m.mean(axis=0, keepdims=True)
    pcov = centered.T @ centered / (n - 1)
    off = pcov - np.diag(np.diag(pcov))
    assert np.abs(off).max() < 1e-3 * np.diag(pcov).max()
    variances = np.diag(pcov)
    assert (np.diff(variances) <= 1e-6 * variances.max()).all()  # descending


def test_kmeans_matches_sequential(ray_session):
    """Distributed k-means equals a sequential numpy twin bit-for-bit
    (same init, quantized order-free sums, same tie rule), and every
    vector gets assigned."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.similarity import _KQ, kmeans

    k, n_iters = 8, 5
    got = kmeans(SF, k=k, n_iters=n_iters).to_pandas().sort_values("vec_id").reset_index(drop=True)

    src = pq.read_table(f"{SF}/embeddings.parquet").to_pandas().sort_values("vec_id")
    x = np.stack([np.asarray(v, dtype=np.float64) for v in src["embedding"]])
    vids = src["vec_id"].to_numpy(dtype=np.int64)
    c = x[np.argsort(vids)[:k]][np.argsort(np.sort(vids)[:k])]  # k lowest vec_ids, ordered
    for _ in range(n_iters):
        d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
        a = d2.argmin(axis=1)
        q = np.floor(x * _KQ).astype(np.int64)
        new = c.copy()
        for j in range(k):
            m = a == j
            if m.any():
                new[j] = q[m].sum(axis=0) / (m.sum() * _KQ)
        c = new
    d2 = (x * x).sum(1)[:, None] - 2.0 * (x @ c.T) + (c * c).sum(1)[None, :]
    exp = d2.argmin(axis=1)

    assert len(got) == len(src)
    assert got.vec_id.is_unique
    ref = pd.Series(exp, index=vids)
    assert (got.set_index("vec_id")["centroid_id"] == ref.sort_index()).all()
    # non-degenerate clustering on this fixture
    assert got.centroid_id.nunique() > 1


def test_ngram_containment_catches_subset_docs(ray_session, tmp_path):
    """A short doc embedded verbatim in a much longer one is found by the
    containment operator but invisible to Jaccard at the same corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import ngram_containment_pairs, ngram_jaccard_pairs

    quote = "alpha beta gamma delta"
    longdoc = quote + " " + " ".join(f"w{i}" for i in range(40))
    texts = [quote, longdoc, "unrelated text entirely different words"]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)}),
        d / "documents.parquet",
    )
    cont = ngram_containment_pairs(str(d)).to_pandas()
    jac = ngram_jaccard_pairs(str(d)).to_pandas()
    assert [tuple(r) for r in cont[["a", "b"]].values] == [(0, 1)]
    assert (cont.n_inter == 4).all() and (cont.n_min == 4).all()
    assert len(jac) == 0  # jaccard 4/44 << 1/2


def test_events_rollup_levels_consistent(ray_session):
    """ROLLUP invariants: per-type subtotals equal the sum of their day
    rows, and the grand total equals the whole-table count."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import events_rollup

    df = events_rollup(SF).to_pandas()
    n_total = pq.ParquetFile(f"{SF}/events.parquet").metadata.num_rows
    fine = df[(df.event_type != "ALL") & (df.day != "ALL")]
    sub = df[(df.event_type != "ALL") & (df.day == "ALL")].set_index("event_type")
    grand = df[(df.event_type == "ALL") & (df.day == "ALL")]
    assert len(grand) == 1 and grand.n_events.iloc[0] == n_total
    per_type = fine.groupby("event_type").n_events.sum()
    assert (sub.n_events.sort_index() == per_type.sort_index()).all()
    assert fine.n_events.sum() == n_total


def test_cluster_canonicals_longest_wins(ray_session):
    """Canonical selection invariants: every doc appears once, the
    canonical is a member of its own cluster, has maximal n_chars there
    (ties -> lowest conv_id), and every cluster has exactly one."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docdedup import cluster_canonicals

    df = cluster_canonicals(SF).to_pandas()
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]).to_pandas()
    src["conv_id"] = src.doc_id.map(lambda i: f"doc-{i:010d}")
    assert df.conv_id.is_unique and len(df) == len(src)
    m = df.merge(src[["conv_id", "n_chars"]], on="conv_id")
    per = m.groupby("cluster_id")
    assert (per.is_canonical.sum() == 1).all()
    canon = m[m.is_canonical == 1].set_index("cluster_id")
    maxlen = per.n_chars.max()
    assert (canon.n_chars == maxlen.loc[canon.index]).all()
    # canonical_id is consistent across members
    assert (m.groupby("cluster_id").canonical_id.nunique() == 1).all()
    assert (canon.conv_id == canon.canonical_id).all()
    # tie rule: among max-length members, lowest conv_id wins
    top = m[m.n_chars == m.groupby("cluster_id").n_chars.transform("max")]
    expect = top.groupby("cluster_id").conv_id.min()
    assert (canon.canonical_id.sort_index() == expect.sort_index()).all()


def test_longest_docs_ranked_topk(ray_session):
    """Global two-level top-k equals a full pandas sort of the source."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import longest_docs

    df = longest_docs(SF, k=25).to_pandas().sort_values("rnk").reset_index(drop=True)
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"]).to_pandas()
    exp = src.sort_values(["n_chars", "doc_id"], ascending=[False, True]).head(25)
    assert list(df.rnk) == list(range(1, 26))
    assert list(df.doc_id) == list(exp.doc_id)
    assert list(df.n_chars) == list(exp.n_chars)


def test_bigram_collocations_exact_counts(ray_session):
    """Distributed pair/unigram counts + double co-shuffle attach match a
    single-process recount over the same tokenization."""
    from collections import Counter

    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import bigram_collocations

    df = bigram_collocations(SF, min_pair=5).to_pandas()
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).to_pandas()["text"]
    uni, pairs = Counter(), Counter()
    for t in texts.fillna(""):
        if not t:
            continue
        ws = t.split(" ")
        uni.update(ws)
        pairs.update(zip(ws, ws[1:]))
    exp = {k: v for k, v in pairs.items() if v >= 5}
    got = {(r.w1, r.w2): r.n_pair for r in df.itertuples()}
    assert got == exp
    for r in df.itertuples():
        assert r.n_w1 == uni[r.w1] and r.n_w2 == uni[r.w2]


def test_customer_order_distribution_left_join(ray_session):
    """Zero-order customers appear in the n_orders=0 bucket and bucket
    totals account for every customer exactly once."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.relops import customer_order_distribution

    df = customer_order_distribution(SF).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet", columns=["o_custkey"]).to_pandas()
    per = orders.groupby("o_custkey").size()
    n_zero = int((~cust.c_custkey.isin(per.index)).sum())
    assert df.n_custs.sum() == len(cust)
    got_zero = df.loc[df.n_orders == 0, "n_custs"]
    assert (int(got_zero.iloc[0]) if len(got_zero) else 0) == n_zero
    exp = per.value_counts().sort_index()
    got = df[df.n_orders > 0].set_index("n_orders")["n_custs"].sort_index()
    assert dict(got) == {int(k): int(v) for k, v in exp.items()}


def test_events_recent_activity_range_join(ray_session):
    """Composite-axis searchsorted equals a brute-force per-event interval
    count (inclusive both ends, same-user only, self counted)."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import events_recent_activity

    df = events_recent_activity(SF, window_minutes=60).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts"]).to_pandas()
    win = pd.Timedelta(minutes=60)
    exp = {}
    for uid, g in ev.groupby("user_id"):
        ts = g["ts"].to_numpy()
        for eid, t in zip(g["event_id"], ts):
            exp[int(eid)] = int(((ts >= t - win) & (ts <= t)).sum())
    got = dict(zip(df.event_id.astype(int), df.n_recent.astype(int)))
    assert got == exp
    assert (df.n_recent >= 1).all()


def test_ann_lsh_recall_vs_bruteforce(ray_session):
    """Hyperplane-LSH top-k is deterministic and recalls most exact
    neighbors at a generous table count (the pytest oracle for the
    no-SQL q_ann_lsh row)."""
    from raydedup.pipelines.similarity import ann_lsh, knn_bruteforce

    exact = knn_bruteforce(SF, n_queries=4, k=3).to_pandas()
    t = ann_lsh(SF, n_queries=4, k=3, n_planes=6, n_tables=8).to_pandas()
    t2 = ann_lsh(SF, n_queries=4, k=3, n_planes=6, n_tables=8).to_pandas()
    pd.testing.assert_frame_equal(t, t2)  # deterministic
    assert (t.rnk <= 3).all()
    assert (t.query_id != t.neighbor_id).all()
    got = set(map(tuple, t[["query_id", "neighbor_id"]].itertuples(index=False)))
    want = set(map(tuple, exact[["query_id", "neighbor_id"]].itertuples(index=False)))
    assert len(got & want) >= 0.5 * len(want)


def test_region_revenue_star_join(ray_session):
    """Broadcast-dim star join equals a single-process pandas recount."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.relops import region_revenue

    df = region_revenue(SF).to_pandas().set_index("region").sort_index()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey", "o_totalprice"]).to_pandas()
    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"]).to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"]).to_pandas()
    region = pq.read_table(f"{SF}/region.parquet",
                           columns=["r_regionkey", "r_name"]).to_pandas()
    j = (orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
         .merge(nation, left_on="c_nationkey", right_on="n_nationkey")
         .merge(region, left_on="n_regionkey", right_on="r_regionkey"))
    j["cents"] = np.round(j["o_totalprice"].to_numpy(np.float64) * 100).astype(np.int64)
    exp = (j.groupby("r_name").agg(n_orders=("cents", "size"),
                                   revenue_cents=("cents", "sum")))
    exp.index.name = "region"
    exp = exp.sort_index()
    assert (df["n_orders"] == exp["n_orders"]).all()
    assert (df["revenue_cents"] == exp["revenue_cents"]).all()


def test_semijoin_bloom_exact(ray_session):
    """Bloom-prefiltered semi-join equals the exact-broadcast semi-join,
    including with a deliberately tiny filter (heavy false positives all
    removed by the verify shuffle)."""
    from raydedup.pipelines.docops import (
        docs_events_antijoin,
        docs_events_semijoin_bloom,
    )

    exact = (docs_events_antijoin(SF, semi=True).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
    for bits in (1 << 17, 64):  # 64 bits → almost every probe is a false positive
        got = (docs_events_semijoin_bloom(SF, bloom_bits=bits).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exact)


def test_segment_priority_counts_native_join(ray_session):
    """Ray-native Dataset.join path equals a pandas recount."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.relops import segment_priority_counts

    got = (segment_priority_counts(SF).to_pandas()
           .set_index(["c_mktsegment", "o_orderpriority"]).sort_index())
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    exp = (j.groupby(["c_mktsegment", "o_orderpriority"]).size()
           .rename("n_orders").sort_index())
    assert (got["n_orders"] == exp).all() and len(got) == len(exp)


def test_supplier_and_brand_revenue(ray_session):
    """Broadcast-dim and co-shuffle-dim fact joins equal pandas recounts."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.relops import brand_revenue, supplier_nation_revenue

    lines = pq.read_table(f"{SF}/lineitem.parquet",
                          columns=["l_suppkey", "l_partkey",
                                   "l_extendedprice", "l_discount"]).to_pandas()
    pc = np.round(lines["l_extendedprice"].to_numpy(np.float64) * 100).astype(np.int64)
    dp = np.round(lines["l_discount"].to_numpy(np.float64) * 100).astype(np.int64)
    lines["cents"] = pc * (100 - dp) // 100

    supp = pq.read_table(f"{SF}/supplier.parquet").to_pandas()
    nation = pq.read_table(f"{SF}/nation.parquet").to_pandas()
    j = (lines.merge(supp, left_on="l_suppkey", right_on="s_suppkey")
         .merge(nation, left_on="s_nationkey", right_on="n_nationkey"))
    exp = (j.groupby("n_name").agg(n_items=("cents", "size"),
                                   revenue_cents=("cents", "sum")).sort_index())
    got = (supplier_nation_revenue(SF).to_pandas()
           .set_index("nation").sort_index())
    assert (got["n_items"].to_numpy() == exp["n_items"].to_numpy()).all()
    assert (got["revenue_cents"].to_numpy() == exp["revenue_cents"].to_numpy()).all()

    part = pq.read_table(f"{SF}/part.parquet",
                         columns=["p_partkey", "p_brand"]).to_pandas()
    j2 = lines.merge(part, left_on="l_partkey", right_on="p_partkey")
    exp2 = (j2.groupby("p_brand").agg(n_items=("cents", "size"),
                                      revenue_cents=("cents", "sum")).sort_index())
    got2 = brand_revenue(SF).to_pandas().set_index("p_brand").sort_index()
    assert (got2["n_items"].to_numpy() == exp2["n_items"].to_numpy()).all()
    assert (got2["revenue_cents"].to_numpy() == exp2["revenue_cents"].to_numpy()).all()


def test_user_funnel_sequence_match(ray_session, tmp_path):
    """Greedy-earliest funnel: same-instant steps, window expiry,
    pre-view clicks ignored, earliest qualifying candidate chosen."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import user_funnel

    US_DAY = 86400 * 1_000_000
    rows = [
        # u1: full funnel, click same instant as view (>= qualifies)
        (1, 0, "view"), (1, 0, "click"), (1, 2 * US_DAY, "purchase"),
        # u2: click BEFORE the first view never counts; later click ok,
        # but purchase lands 8 days after the click → window expired
        (2, 1 * US_DAY, "click"), (2, 2 * US_DAY, "view"),
        (2, 3 * US_DAY, "click"), (2, 11 * US_DAY, "purchase"),
        # u3: view only
        (3, 0, "view"),
        # u4: greedy-earliest — the FIRST view (day 0) anchors; its
        # window ends day 7, the only click is day 9 → funnel stops at
        # step 1 even though the day-8 view would have matched
        (4, 0, "view"), (4, 8 * US_DAY, "view"), (4, 9 * US_DAY, "click"),
        # u5: no view at all
        (5, 0, "click"), (5, 1, "purchase"),
    ]
    pq.write_table(
        pa.table({"event_id": pa.array(range(len(rows)), pa.int64()),
                  "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                  "user_id": pa.array([r[0] for r in rows], pa.int64()),
                  "event_type": pa.array([r[2] for r in rows], pa.string()),
                  "value": pa.array([0.0] * len(rows), pa.float64()),
                  "props": pa.array(["{}"] * len(rows), pa.string())}),
        tmp_path / "events.parquet",
    )
    df = user_funnel(str(tmp_path)).to_pandas().set_index("step").sort_index()
    assert df.loc[1, "n_users"] == 4   # u1 u2 u3 u4
    assert df.loc[2, "n_users"] == 2   # u1 u2
    assert df.loc[3, "n_users"] == 1   # u1 only (u2 window expired)
    assert list(df["step_type"]) == ["view", "click", "purchase"]


def test_event_props_stats_extraction(ray_session, tmp_path):
    """JSON extraction: regex fast path, json.loads fallback (escaped
    needle in another field), missing key, malformed JSON, empty group."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import event_props_stats

    props = [
        '{"k": 7}',                      # fast path
        '{ "k" :\n 3 }',                 # fast path, whitespace
        '{"other": 1, "k": -2}',         # fast path, negative
        '{"note": "mentions \\"k\\" here"}',  # fallback → no real k field
        '{"k": {"nested": 1}}',          # fallback → k not an int
        '{"j": 5}',                      # no k at all
        'not json "k":',                 # malformed → fallback fails
        None,                            # null props
    ]
    types = ["a", "a", "a", "a", "b", "b", "b", "c"]
    pq.write_table(
        pa.table({"event_id": pa.array(range(8), pa.int64()),
                  "ts": pa.array([0] * 8, pa.timestamp("us")),
                  "user_id": pa.array([1] * 8, pa.int64()),
                  "event_type": pa.array(types, pa.string()),
                  "value": pa.array([0.0] * 8, pa.float64()),
                  "props": pa.array(props, pa.string())}),
        tmp_path / "events.parquet",
    )
    df = (event_props_stats(str(tmp_path)).to_pandas()
          .set_index("event_type").sort_index())
    assert df.loc["a", "n_events"] == 4 and df.loc["a", "n_with_k"] == 3
    assert df.loc["a", "sum_k"] == 8 and df.loc["a", "min_k"] == -2
    assert df.loc["a", "max_k"] == 7
    assert df.loc["b", "n_with_k"] == 0 and df.loc["b", "sum_k"] == 0
    assert df.loc["b", "min_k"] == 0 and df.loc["b", "max_k"] == 0
    assert df.loc["c", "n_events"] == 1 and df.loc["c", "n_with_k"] == 0


def test_shipping_priority_topk(ray_session):
    """Two-co-shuffle join chain + global top-k equals a pandas recount."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.relops import shipping_priority

    seg, cutoff, k = "BUILDING", "1998-06-01", 10
    df = shipping_priority(SF, segment=seg, cutoff=cutoff, k=k).to_pandas()

    cust = pq.read_table(f"{SF}/customer.parquet",
                         columns=["c_custkey", "c_mktsegment"]).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
    lines = pq.read_table(f"{SF}/lineitem.parquet",
                          columns=["l_orderkey", "l_extendedprice",
                                   "l_discount", "l_shipdate"]).to_pandas()
    cut = pd.Timestamp(cutoff)
    cust = cust[cust["c_mktsegment"] == seg]
    orders = orders[orders["o_orderdate"] < cut]
    orders = orders[orders["o_custkey"].isin(set(cust["c_custkey"]))]
    lines = lines[lines["l_shipdate"] > cut]
    pc = np.round(lines["l_extendedprice"].to_numpy(np.float64) * 100).astype(np.int64)
    dp = np.round(lines["l_discount"].to_numpy(np.float64) * 100).astype(np.int64)
    lines = pd.DataFrame({"o_orderkey": lines["l_orderkey"].to_numpy(np.int64),
                          "revenue_cents": pc * (100 - dp) // 100})
    lines = lines[lines["o_orderkey"].isin(set(orders["o_orderkey"]))]
    exp = (lines.groupby("o_orderkey").agg(revenue_cents=("revenue_cents", "sum"))
           .reset_index()
           .sort_values(["revenue_cents", "o_orderkey"], ascending=[False, True])
           .head(k).reset_index(drop=True))
    exp["rnk"] = np.arange(1, len(exp) + 1, dtype=np.int64)
    assert len(df) == len(exp)
    assert (df["o_orderkey"].to_numpy() == exp["o_orderkey"].to_numpy()).all()
    assert (df["revenue_cents"].to_numpy() == exp["revenue_cents"].to_numpy()).all()
    assert (df["rnk"].to_numpy() == exp["rnk"].to_numpy()).all()


def test_null_ts_matches_duckdb_twin(ray_session, tmp_path):
    """NaT timestamps follow the SQL twins' NULL semantics: gap_us=-1 when
    either LAG endpoint is NULL (COALESCE), and a NULL window group row in
    window_active_users (DuckDB GROUP BY groups NULLs) instead of a
    silently-dropped pandas NaN group.  The sf fixtures carry no null ts,
    so this pins the divergence path directly."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import event_interarrival, window_active_users

    ts = pa.array(
        [
            "2026-01-01 10:00:00", None, "2026-01-01 10:10:00",
            "2026-01-01 11:00:00", "2026-01-01 11:30:00", None,
        ],
    ).cast(pa.timestamp("us"))
    t = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
            "user_id": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
            "ts": ts,
        }
    )
    sf = str(tmp_path)
    pq.write_table(t, f"{sf}/events.parquet")

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")

    gaps = event_interarrival(sf).to_pandas().sort_values("event_id").reset_index(drop=True)
    want = con.execute(
        "SELECT event_id, user_id, CAST(COALESCE(date_diff('microsecond', "
        "LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts), -1) "
        "AS BIGINT) AS gap_us FROM events ORDER BY event_id"
    ).df()
    pd.testing.assert_frame_equal(gaps, want, check_dtype=False)

    act = window_active_users(sf).to_pandas()
    want2 = con.execute(
        "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_active FROM events GROUP BY 1"
    ).df()
    key = lambda df: df.fillna("\0").sort_values("window_start").reset_index(drop=True)
    a, b = key(act), key(want2)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_chunk_docs_reassembles_and_sizes(ray_session):
    """Joining a doc's chunks in chunk_idx order reproduces the original
    text exactly; all chunks except the last are exactly CHUNK_TOKENS."""
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import CHUNK_TOKENS, chunk_docs

    got = chunk_docs(SF).to_pandas().sort_values(["doc_id", "chunk_idx"])
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    src = src[src["text"].notna() & (src["text"] != "")]
    joined = got.groupby("doc_id")["chunk_text"].agg(" ".join)
    assert joined.to_dict() == dict(zip(src["doc_id"], src["text"]))
    last_idx = got.groupby("doc_id")["chunk_idx"].transform("max")
    assert (got.loc[got["chunk_idx"] < last_idx, "n_toks"] == CHUNK_TOKENS).all()
    assert (got["n_toks"] == got["chunk_text"].str.split(" ").str.len()).all()
    assert got["n_toks"].between(1, CHUNK_TOKENS).all()


def test_source_dup_profile_matches_brute_force(ray_session):
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import source_dup_profile

    got = (source_dup_profile(SF).to_pandas()
           .sort_values("source").reset_index(drop=True))
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["source", "text"]).to_pandas()
    want = (src.groupby("source")
               .agg(n_docs=("text", "size"), n_distinct=("text", "nunique"))
               .reset_index().sort_values("source").reset_index(drop=True))
    want["n_dups"] = want["n_docs"] - want["n_distinct"]
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dup_degree_profile_matches_brute_force(ray_session):
    from raydedup.pipelines.docops import NGRAM_DF_CAP, dup_degree_profile

    got = (dup_degree_profile(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    import pyarrow.parquet as pq
    import re as _re
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    toksets = {
        r.doc_id: set(_re.split(r"\s+", r.text.lower().strip()))
        for r in src.itertuples() if r.text.strip()
    }
    # df-capped inverted index, same rule as the operator
    from collections import Counter, defaultdict
    df_ct = Counter(t for s in toksets.values() for t in s)
    inter = Counter()
    idx = defaultdict(list)
    for d, s in sorted(toksets.items()):
        for t in s:
            if df_ct[t] <= NGRAM_DF_CAP:
                idx[t].append(d)
    for t, docs in idx.items():
        for i in range(len(docs)):
            for j in range(i + 1, len(docs)):
                inter[(docs[i], docs[j])] += 1
    deg = Counter()
    for (a, b), n_i in inter.items():
        union = len(toksets[a]) + len(toksets[b]) - n_i
        if 2 * n_i >= union:
            deg[a] += 1
            deg[b] += 1
    want = pd.DataFrame({
        "doc_id": src["doc_id"].to_numpy(np.int64),
        "dup_degree": [deg.get(d, 0) for d in src["doc_id"]],
    }).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["dup_degree"] == 0).any()  # clean docs keep rows


def test_user_rolling_value_matches_pandas(ray_session):
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import user_rolling_value

    got = (user_rolling_value(SF, n=5).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "user_id", "ts", "value"]).to_pandas()
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    want = (ev.groupby("user_id", sort=False)["value"]
            .rolling(5, min_periods=1).mean().reset_index(level=0, drop=True))
    ev["roll_avg"] = want.round(6)
    ev = ev.sort_values("event_id").reset_index(drop=True)
    assert list(got["event_id"]) == list(ev["event_id"])
    assert np.allclose(got["roll_avg"], ev["roll_avg"], rtol=0, atol=1e-9)


def test_source_zscore_matches_pandas(ray_session):
    import pyarrow.parquet as pq

    from raydedup.pipelines.docops import source_zscore

    got = (source_zscore(SF).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "source", "n_chars"]).to_pandas()
    mu = docs.groupby("source")["n_chars"].transform("mean")
    sd = docs.groupby("source")["n_chars"].transform(lambda s: s.std(ddof=0))
    docs["z"] = np.where(sd > 0, ((docs["n_chars"] - mu) / sd).round(6), 0.0)
    docs = docs.sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(docs["doc_id"])
    assert np.allclose(got["z"], docs["z"], rtol=0, atol=1e-9)
    # z-scores within each stratum are mean-0 (population normalization)
    assert got.groupby("source")["z"].mean().abs().max() < 1e-6
