"""Exact-family dedup ladder (tiers.py): planted-fixture semantics + sf
brute-force parity for bow_dedup / prefix_dup_groups / dedup_tiers."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _planted_docs(tmp_path):
    """Docs exercising every tier: verbatim copies, token-permuted copies,
    shared 16-token openings with distinct tails, and uniques."""
    boiler = " ".join(f"tok{i}" for i in range(16))  # shared 16-token opening
    texts = [
        "alpha beta gamma delta",          # 0: exact dup of 1
        "alpha beta gamma delta",          # 1
        "delta gamma beta alpha",          # 2: bow dup of 0/1, not exact
        boiler + " tail one here",         # 3: prefix dup of 4
        boiler + " different tail words",  # 4
        "completely unique document text", # 5: unique
        "",                                # 6: empty — exact dup of 7
        "",                                # 7
    ]
    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["t"] * len(texts), pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }),
        d / "documents.parquet",
    )
    return str(d), texts


def _brute_tiers(texts, k=16):
    exact = pd.Series(texts).map(lambda t: t)
    bow = pd.Series(texts).map(lambda t: " ".join(sorted(t.split(" "))))
    pfx = pd.Series(texts).map(lambda t: " ".join(t.split(" ")[:k]))
    out = []
    for i in range(len(texts)):
        if (exact == exact[i]).sum() > 1:
            out.append("exact")
        elif (bow == bow[i]).sum() > 1:
            out.append("bow")
        elif (pfx == pfx[i]).sum() > 1:
            out.append("prefix")
        else:
            out.append("unique")
    return out


def test_dedup_tiers_planted(ray_session, tmp_path):
    from raydedup.pipelines.tiers import dedup_tiers

    d, texts = _planted_docs(tmp_path)
    got = dedup_tiers(d).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == list(range(len(texts)))
    assert list(got["tier"]) == _brute_tiers(texts)
    # the planted fixture hits every tier value
    assert set(got["tier"]) == {"exact", "bow", "prefix", "unique"}


def test_bow_dedup_planted(ray_session, tmp_path):
    from raydedup.pipelines.tiers import bow_dedup

    d, texts = _planted_docs(tmp_path)
    got = (bow_dedup(d).to_pandas().sort_values("doc_id")
           .set_index("doc_id")["canonical_id"])
    bow = [" ".join(sorted(t.split(" "))) for t in texts]
    for i, b in enumerate(bow):
        want = min(j for j, bj in enumerate(bow) if bj == b)
        assert got[i] == want
    assert got[2] == 0  # the permuted copy folds into the verbatim group


def test_prefix_dup_groups_planted(ray_session, tmp_path):
    from raydedup.pipelines.tiers import prefix_dup_groups

    d, texts = _planted_docs(tmp_path)
    got = prefix_dup_groups(d).to_pandas().sort_values("canonical_id")
    pfx = [" ".join(t.split(" ")[:16]) for t in texts]
    want = (pd.DataFrame({"doc_id": range(len(texts)), "p": pfx})
            .groupby("p").agg(n_docs=("doc_id", "size"), canonical_id=("doc_id", "min"))
            .query("n_docs > 1").reset_index())
    want["prefix_md5"] = want["p"].map(
        lambda s: hashlib.md5(s.encode()).hexdigest())
    got = got.reset_index(drop=True)
    want = (want[["prefix_md5", "n_docs", "canonical_id"]]
            .sort_values("canonical_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_dedup_tiers_sf_brute_force(ray_session):
    from raydedup.pipelines.tiers import dedup_tiers

    got = dedup_tiers(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    src = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id", "text"]).to_pandas()
    src = src.sort_values("doc_id").reset_index(drop=True)
    want = _brute_tiers(list(src["text"]))
    assert list(got["doc_id"]) == list(src["doc_id"])
    assert list(got["tier"]) == want


def test_dedup_tiers_deterministic_across_partitioning(ray_session):
    from raydedup.pipelines.tiers import dedup_tiers

    a = dedup_tiers(SF, num_partitions=2).to_pandas().sort_values("doc_id")
    b = dedup_tiers(SF, num_partitions=7).to_pandas().sort_values("doc_id")
    pd.testing.assert_frame_equal(a.reset_index(drop=True), b.reset_index(drop=True))
