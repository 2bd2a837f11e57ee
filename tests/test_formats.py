"""JSONL / CSV source-format round-trips onto the canonical transcript
schema (the engine's parquet-native pipeline must be format-agnostic
after the read-and-cast)."""

import pandas as pd
import pyarrow.parquet as pq


def _fixture(n_convs=200):
    from raydedup.sources.synth import materialize

    return materialize(seed=42, n_convs=n_convs)


def test_jsonl_roundtrip_lossless(ray_session, tmp_path):
    import ray.data as rd

    from raydedup.sources.formats import (
        TRANSCRIPT_SCHEMA,
        export_jsonl,
        transcripts_from_jsonl,
    )

    fix = _fixture()
    src = rd.read_parquet(f"{fix}/transcripts.parquet")
    out = export_jsonl(src, str(tmp_path / "jsonl"))
    back = transcripts_from_jsonl(out)
    assert back.schema().base_schema.equals(TRANSCRIPT_SCHEMA)
    a = (
        pq.read_table(f"{fix}/transcripts.parquet")
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = back.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(a) == len(b)
    assert (a["text"].fillna("") == b["text"].fillna("")).all()
    assert (a["ts"] == b["ts"]).all()  # epoch-us round-trip is lossless


def test_csv_source_normalizes_schema(ray_session, tmp_path):
    from raydedup.sources.formats import TRANSCRIPT_SCHEMA, transcripts_from_csv

    fix = _fixture()
    df = pq.read_table(f"{fix}/transcripts.parquet").to_pandas()
    csv_path = str(tmp_path / "transcripts.csv")
    df.to_csv(csv_path, index=False)
    ds = transcripts_from_csv(csv_path)
    assert ds.schema().base_schema.equals(TRANSCRIPT_SCHEMA)
    back = ds.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    a = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert len(back) == len(a)
    assert (back["text"].fillna("") == a["text"].fillna("")).all()


def test_jsonl_source_feeds_pipeline(ray_session, tmp_path):
    """A JSONL-read Dataset drives the reassembly stage identically to the
    parquet path (format-agnostic downstream)."""
    import ray.data as rd

    from raydedup.sources.formats import export_jsonl, transcripts_from_jsonl
    from raydedup.stages.reassemble import reassemble

    fix = _fixture()
    src = rd.read_parquet(f"{fix}/transcripts.parquet")
    out = export_jsonl(src, str(tmp_path / "jsonl"))
    docs_j = reassemble(transcripts_from_jsonl(out), 4, 1).to_pandas()
    docs_p = reassemble(rd.read_parquet(f"{fix}/transcripts.parquet"), 4, 1).to_pandas()
    j = docs_j.sort_values("conv_id").reset_index(drop=True)
    p = docs_p.sort_values("conv_id").reset_index(drop=True)
    assert (j["doc_text"] == p["doc_text"]).all()
    assert (j["status"] == p["status"]).all()
