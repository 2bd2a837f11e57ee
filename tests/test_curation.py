"""Curation-operator tests (decontamination, splits, distinct counts,
PII scrub, centroids, partitioned export) over the sf0.001 tables."""

import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_decontaminate_flags_probe_docs(ray_session):
    from raydedup.pipelines.curation import (
        N_PROBES,
        PROBE_MIN_CHARS,
        decontaminate,
        _probe_list,
    )

    probes = _probe_list(SF)
    assert len(probes) == N_PROBES
    df = decontaminate(SF).to_pandas().set_index("doc_id")
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    # the probe source docs must flag themselves (each contains its prefix)
    probe_ids = (
        src[src.n_chars >= PROBE_MIN_CHARS].nsmallest(N_PROBES, "doc_id")["doc_id"].tolist()
    )
    assert (df.loc[probe_ids, "contaminated"] == 1).all()
    # n_hits is an exact per-probe indicator sum
    exp = src.set_index("doc_id")["text"].fillna("").map(
        lambda t: sum(p in t for p in probes)
    )
    assert (df["n_hits"] == exp).all()


def test_train_split_deterministic_and_complete(ray_session):
    from raydedup.pipelines.curation import train_split

    a = train_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = train_split(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)  # stable across runs
    assert set(a["split"].unique()) <= {"train", "valid", "test"}
    n = len(a)
    frac_train = (a["split"] == "train").mean()
    assert 0.6 < frac_train < 0.95  # ≈ 204/256, loose at n=500
    assert a.doc_id.is_unique and n == 500


def test_distinct_counts_exact(ray_session):
    from raydedup.pipelines.curation import distinct_counts

    row = distinct_counts(SF).iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert row["n_users"] == ev["user_id"].nunique()
    assert row["n_event_types"] == ev["event_type"].nunique()


def test_pii_scrub_counts_and_redaction():
    # kernel-level check on crafted rows (the sf corpus may contain no PII)
    from raydedup.pipelines.curation import EMAIL_RE, LONGNUM_RE

    s = pd.Series(["contact a@b.com or c.d+x@e.org, id 1234567", "clean", None])
    n_em = s.fillna("").str.count(EMAIL_RE)
    assert list(n_em) == [2, 0, 0]
    n_num = s.fillna("").str.count(LONGNUM_RE)
    assert list(n_num) == [1, 0, 0]
    clean = (
        s.fillna("")
        .str.replace(EMAIL_RE, "<EMAIL>", regex=True)
        .str.replace(LONGNUM_RE, "<NUM>", regex=True)
    )
    assert clean[0] == "contact <EMAIL> or <EMAIL>, id <NUM>"


def test_pii_scrub_preserves_rows(ray_session):
    from raydedup.pipelines.curation import pii_scrub

    df = pii_scrub(SF).to_pandas()
    assert len(df) == 500 and df.doc_id.is_unique
    assert (df["n_emails"] >= 0).all() and (df["n_longnums"] >= 0).all()


def test_label_centroids_match_numpy(ray_session):
    from raydedup.pipelines.curation import _QSCALE, label_centroids

    df = label_centroids(SF).to_pandas().set_index(["label", "dim"]).sort_index()
    t = pq.read_table(f"{SF}/embeddings.parquet")
    lab = t["label"].to_numpy()
    emb = np.vstack(t["embedding"].to_pylist()).astype(np.float64)
    q = np.floor(emb * _QSCALE).astype(np.int64)
    for ulab in np.unique(lab):
        m = lab == ulab
        exp = q[m].sum(axis=0)
        got = df.loc[int(ulab)]["sum_q"].to_numpy()
        assert (got == exp).all()
        assert (df.loc[int(ulab)]["n"] == m.sum()).all()


def test_events_profile_matches_pandas(ray_session):
    from raydedup.pipelines.curation import events_profile

    row = events_profile(SF).iloc[0]
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    assert row["n_rows"] == len(ev)
    assert row["n_null_value"] == ev["value"].isna().sum()
    assert row["min_value"] == round(ev["value"].min(), 6)
    assert row["max_value"] == round(ev["value"].max(), 6)
    assert row["sum_value_cents"] == int(
        np.floor(ev["value"].dropna().to_numpy(np.float64) * 100.0).sum()
    )


def test_approx_distinct_users_error_bounded(ray_session):
    from raydedup.pipelines.curation import approx_distinct_users

    est = int(approx_distinct_users(SF).iloc[0]["estimate"])
    exact = pq.read_table(f"{SF}/events.parquet").to_pandas()["user_id"].nunique()
    assert abs(est - exact) <= max(2, 0.05 * exact), (est, exact)


def test_approx_value_quantiles_rank_error(ray_session):
    """Sketch estimates must sit within 2% rank error of the exact
    quantiles; the compress kernel must be exact below its capacity."""
    import numpy as np

    from raydedup.pipelines.curation import _compress_weighted, approx_value_quantiles

    df = approx_value_quantiles(SF)
    vals = np.sort(pq.read_table(f"{SF}/events.parquet").to_pandas()["value"]
                   .dropna().to_numpy(np.float64))
    n = len(vals)
    for q, est in zip(df["q"], df["value_est"]):
        rank = np.searchsorted(vals, est, side="left") / n
        assert abs(rank - q) <= 0.02, (q, est, rank)

    # below capacity the summary is lossless
    v = np.sort(np.random.RandomState(7).rand(100))
    out_v, out_w = _compress_weighted(v, np.ones(100), 1024)
    assert (out_v == v).all() and (out_w == 1.0).all()


def test_hll_register_kernel_exact_small():
    # the clz ladder: rho(first-1-bit position) checked against int.bit_length
    import numpy as np

    from raydedup.functions.hashing import splitmix64

    ids = np.arange(1000, dtype=np.uint64)
    h = splitmix64(ids)
    P = 14
    rest = (h << np.uint64(P)) | np.uint64((1 << P) - 1)
    lz = np.zeros(len(rest), dtype=np.int8)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        v[mask] = v[mask] << np.uint64(shift)
    exp = np.array([64 - int(x).bit_length() for x in rest], dtype=np.int8)
    assert (lz == exp).all()


def test_sample_per_group_deterministic_and_bounded(ray_session):
    from raydedup.pipelines.curation import sample_per_group

    a = sample_per_group(SF).to_pandas().sort_values(["lang", "rnk"]).reset_index(drop=True)
    b = sample_per_group(SF).to_pandas().sort_values(["lang", "rnk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    sizes = src.groupby("lang").size()
    for lang, grp in a.groupby("lang"):
        assert len(grp) == min(2, sizes[lang])
        assert sorted(grp["rnk"]) == list(range(1, len(grp) + 1))


def test_suffix_doc_pairs_share_long_span(ray_session):
    from raydedup.config import DedupConfig
    from raydedup.functions.textnorm import normalize_array
    from raydedup.pipelines.docdedup import suffix_doc_pairs

    import pyarrow as pa

    df = suffix_doc_pairs(SF).to_pandas()
    assert not df.duplicated(["a", "b"]).any()
    if len(df) == 0:
        pytest.skip("no long repeats in fixture")
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    norm = pd.Series(
        normalize_array(pa.array(src["text"].fillna(""), pa.string())).to_pylist(),
        index="doc-" + src["doc_id"].map("{:010d}".format),
    )
    w = DedupConfig().suffix_window
    for _, row in df.iterrows():
        ta, tb = norm[row["a"]], norm[row["b"]]
        grams_a = {ta[i : i + w] for i in range(len(ta) - w + 1)}
        assert any(tb[i : i + w] in grams_a for i in range(len(tb) - w + 1))


def test_export_partitioned_roundtrip(ray_session, tmp_path):
    import ray.data as rd

    from raydedup.pipelines.curation import export_partitioned

    out = str(tmp_path / "docs_by_lang")
    export_partitioned(SF, out, by="lang")
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    # hive layout: one directory per lang value, independently addressable
    parts = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert parts == sorted(f"lang={v}" for v in src["lang"].unique())
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == len(src)
    assert sorted(back["doc_id"]) == sorted(src["doc_id"])
    # partition pruning: a PathPartitionFilter on the hive key must read
    # ONLY that directory's files (file-level pruning before any I/O,
    # not post-read filtering)
    from ray.data.datasource.partitioning import PathPartitionFilter

    lang0 = str(src["lang"].iloc[0])
    pruned = rd.read_parquet(
        out,
        partition_filter=PathPartitionFilter.of(
            lambda p: p.get("lang") == lang0, style="hive"
        ),
    )
    want = src[src["lang"] == lang0]
    assert pruned.count() == len(want)
    n_files_lang0 = sum(
        1 for _, _, fs in os.walk(os.path.join(out, f"lang={lang0}")) for f in fs
    )
    assert pruned.input_files() and len(pruned.input_files()) == n_files_lang0
    got = pruned.to_pandas()
    assert (got["lang"] == lang0).all()
    assert sorted(got["doc_id"]) == sorted(want["doc_id"])


def test_value_quantiles_by_type_rank_error(ray_session):
    """Per-type sketch estimates sit within 2% rank error of each type's
    exact distribution, for every type in the table."""
    import numpy as np

    from raydedup.pipelines.curation import value_quantiles_by_type

    got = value_quantiles_by_type(SF).to_pandas()
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas().dropna(subset=["value"])
    types = set(ev["event_type"])
    assert set(got["event_type"]) == types
    for et, g in got.groupby("event_type"):
        vals = np.sort(ev.loc[ev["event_type"] == et, "value"].to_numpy(np.float64))
        n = len(vals)
        for q, est in zip(g["q"], g["value_est"]):
            rank = np.searchsorted(vals, est, side="left") / n
            assert abs(rank - q) <= 0.02, (et, q, est, rank)


def test_exact_median_matches_numpy(ray_session):
    """Two-phase distributed selection == numpy's exact median, including
    the even-count two-middle average."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from raydedup.pipelines.curation import exact_median

    got = exact_median("/root/testdata/sf0.001").to_pandas()
    v = (pq.read_table("/root/testdata/sf0.001/events.parquet",
                       columns=["value"]).to_pandas()["value"]
         .dropna().to_numpy(float))
    assert int(got.loc[0, "n"]) == len(v)
    assert got.loc[0, "median_value"] == round(float(np.median(v)), 6)


def test_exact_median_straddling_bins(ray_session, tmp_path):
    """Even count whose two middle values land in DIFFERENT histogram
    bins — both bins must be collected."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from raydedup.pipelines.curation import exact_median

    # 4 values: middles 1.0 and 1000.0 are far apart (distinct bins)
    vals = [0.0, 1.0, 1000.0, 2000.0]
    pqw.write_table(pa.table({"value": vals}),
                    str(tmp_path / "events.parquet"))
    got = exact_median(str(tmp_path)).to_pandas()
    assert got.loc[0, "median_value"] == round((1.0 + 1000.0) / 2, 6)
    # constant column short-circuit
    pqw.write_table(pa.table({"value": [7.5] * 5}),
                    str(tmp_path / "events.parquet"))
    got = exact_median(str(tmp_path)).to_pandas()
    assert got.loc[0, "median_value"] == 7.5 and int(got.loc[0, "n"]) == 5


def test_exact_median_skewed_band_stays_bounded(ray_session, tmp_path):
    """A distribution where one value dominates the median's histogram bin
    must refine WITHIN the bin instead of collecting O(n) rows: with
    max_band_rows tiny, the loop either bottoms out on the constant-band
    short-circuit or a sub-max_depth band, and the median stays exact."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from raydedup.pipelines.curation import exact_median

    rng = np.random.RandomState(3)
    # 5000 copies of 5.0 (the skewed bin) + spread tails so lo != hi
    vals = np.concatenate([np.full(5000, 5.0),
                           rng.uniform(0.0, 4.0, 300),
                           rng.uniform(6.0, 10.0, 300)])
    pqw.write_table(pa.table({"value": vals}),
                    str(tmp_path / "events.parquet"))
    got = exact_median(str(tmp_path), n_bins=16, max_band_rows=50,
                       max_depth=6).to_pandas()
    assert got.loc[0, "median_value"] == round(float(np.median(vals)), 6)
    assert int(got.loc[0, "n"]) == len(vals)

    # odd-count variant with NaNs interleaved (kernel must drop them)
    vals2 = np.concatenate([vals, [np.nan, np.nan, 11.0]])
    pqw.write_table(pa.table({"value": vals2}),
                    str(tmp_path / "events.parquet"))
    got = exact_median(str(tmp_path), n_bins=16, max_band_rows=50).to_pandas()
    clean = vals2[~np.isnan(vals2)]
    assert got.loc[0, "median_value"] == round(float(np.median(clean)), 6)
    assert int(got.loc[0, "n"]) == len(clean)


def test_exact_quantile_matches_numpy(ray_session, tmp_path):
    """quantile_cont interpolation (p = q*(n-1), linear between the two
    order statistics) == numpy's linear percentile, including under the
    tiny-band refinement config."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pqw

    from raydedup.pipelines.curation import exact_quantile

    rng = np.random.RandomState(5)
    vals = np.concatenate([rng.uniform(0, 100, 2000), np.full(3000, 42.0)])
    pqw.write_table(pa.table({"value": vals}), str(tmp_path / "events.parquet"))
    for q in (0.1, 0.5, 0.9, 0.99):
        got = exact_quantile(str(tmp_path), q=q, n_bins=16,
                             max_band_rows=64).to_pandas()
        assert got.loc[0, "quantile_value"] == round(
            float(np.percentile(vals, q * 100, method="linear")), 6), q
        assert int(got.loc[0, "n"]) == len(vals)
