"""Cross-run incremental ingest: a new batch against the persisted
signature checkpoints of previous runs — the durable analog of the
reference's growing dedup index (``duplicate_face.py:147-155``)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from raydedup.config import DedupConfig


def _cfg():
    return DedupConfig(num_partitions=4, sig_concurrency=(1, 2))


def _reid(tbl: pa.Table, conv_ids: list, prefix: str) -> pa.Table:
    """Exact copies of the chosen conversations under fresh conv_ids
    ``{prefix}{orig}`` (planted duplicates with a recoverable source)."""
    sub = tbl.filter(pc.is_in(tbl["conv_id"], value_set=pa.array(conv_ids)))
    new_ids = pc.binary_join_element_wise(
        pa.array([prefix] * sub.num_rows), sub["conv_id"].cast(pa.string()), ""
    )
    return sub.set_column(0, "conv_id", new_ids)


@pytest.fixture(scope="module")
def corpus_run(ray_session, fixture_dir, tmp_path_factory):
    from raydedup.pipelines.dedup import run_pipeline

    out = str(tmp_path_factory.mktemp("corpus"))
    res = run_pipeline(f"{fixture_dir}/transcripts.parquet", out, _cfg())
    cl = res["clusters"].to_pandas()
    ok_ids = sorted(cl[cl["status"] == "ok"]["conv_id"])
    return fixture_dir, out, ok_ids


def test_incremental_ingest_cross_run(ray_session, corpus_run, tmp_path):
    from raydedup.pipelines.incremental import incremental_ingest

    fixture_dir, corpus_out, ok_ids = corpus_run
    turns = pq.read_table(f"{fixture_dir}/transcripts.parquet")

    # batch 2: 20 exact copies of corpus convs + 40 convs from a foreign
    # seed (different vocab -> no corpus matches)
    dup_src = ok_ids[:20]
    from raydedup.sources.synth import materialize

    foreign = pq.read_table(
        f"{materialize(seed=7, n_convs=40)}/transcripts.parquet"
    )
    uniq_ids = sorted(set(foreign["conv_id"].to_pylist()))
    batch2 = pa.concat_tables(
        [_reid(turns, dup_src, "newdup-"), _reid(foreign, uniq_ids, "newuniq-")]
    )
    b2_path = str(tmp_path / "batch2.parquet")
    pq.write_table(batch2, b2_path)

    sig_man = os.path.join(corpus_out, "signatures", "_MANIFEST.json")
    man_mtime = os.stat(sig_man).st_mtime_ns

    out2 = str(tmp_path / "ingest2")
    res = incremental_ingest(b2_path, corpus_out, out2, _cfg())
    asg = res["assignments"].to_pandas().set_index("conv_id")

    n_new = len(set(batch2["conv_id"].to_pylist()))
    assert len(asg) == n_new

    # every planted duplicate matched the corpus; canonical is a corpus id
    for src in dup_src:
        row = asg.loc[f"newdup-{src}"]
        assert row["matched_existing"] == 1
        assert not str(row["canonical_id"]).startswith(("newdup-", "newuniq-"))
    # foreign convs never match the corpus
    uniq_rows = asg[asg.index.str.startswith("newuniq-")]
    assert (uniq_rows["matched_existing"] == 0).all()
    assert uniq_rows["canonical_id"].str.startswith("newuniq-").all()

    # the corpus index was READ, never recomputed: its manifest is
    # untouched and the ingest's signature stage covers only the new batch
    assert os.stat(sig_man).st_mtime_ns == man_mtime
    ev = {e["stage"]: e for e in res["events"]}
    assert ev["signatures"]["action"] == "computed"
    assert ev["signatures"]["rows"] == n_new

    # resume: a second identical call reads every checkpoint back
    res_b = incremental_ingest(b2_path, corpus_out, out2, _cfg())
    assert all(e["action"] == "resumed" for e in res_b["events"])

    # chained ingest: batch 3 duplicates batch-2 uniques; with
    # corpus_dirs=[corpus, out2] the growing index finds them
    b3_src = [f"newuniq-{u}" for u in uniq_ids[:5]]
    b3 = _reid(batch2, b3_src, "b3-")
    b3_path = str(tmp_path / "batch3.parquet")
    pq.write_table(b3, b3_path)
    out3 = str(tmp_path / "ingest3")
    res3 = incremental_ingest(b3_path, [corpus_out, out2], out3, _cfg())
    asg3 = res3["assignments"].to_pandas().set_index("conv_id")
    matched3 = asg3[asg3["matched_existing"] == 1]
    # foreign-seed corpora contain corrupted/no_content convs that can
    # never match; every OK copy must resolve to its batch-2 source
    assert len(matched3) > 0
    assert matched3["canonical_id"].str.startswith("newuniq-").all()


def test_incremental_ingest_config_guards(ray_session, corpus_run, tmp_path):
    import dataclasses

    from raydedup.pipelines.incremental import incremental_ingest

    fixture_dir, corpus_out, _ = corpus_run
    src = f"{fixture_dir}/transcripts.parquet"
    with pytest.raises(ValueError, match="signature-relevant"):
        incremental_ingest(
            src, corpus_out, str(tmp_path / "x"), _cfg(),
            corpus_cfg=dataclasses.replace(_cfg(), shingle_k=7),
        )
    with pytest.raises(ValueError, match="manifest hash mismatch"):
        wrong = dataclasses.replace(_cfg(), num_partitions=16)
        incremental_ingest(src, corpus_out, str(tmp_path / "y"), wrong)
    with pytest.raises(ValueError, match="disk"):
        incremental_ingest(
            src, corpus_out, str(tmp_path / "z"),
            dataclasses.replace(_cfg(), checkpoint_mode="memory"),
        )
    with pytest.raises(FileNotFoundError):
        incremental_ingest(src, str(tmp_path / "nocorpus"), str(tmp_path / "w"), _cfg())
