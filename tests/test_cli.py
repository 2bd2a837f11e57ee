"""CLI surface tests: run + CSV report export (S6/S7/S10 CSV analog)."""

import json
import os


def test_cli_run_with_csv_export(ray_session, tmp_path, capsys):
    from raydedup.cli import main
    from raydedup.sources.synth import materialize

    fix = materialize(seed=13, n_convs=60, base_dir=str(tmp_path / "fx"))
    out = str(tmp_path / "out")
    rc = main([
        "run", "--input", f"{fix}/transcripts.parquet", "--out", out,
        "--partitions", "2", "--csv",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["clusters"] > 0
    for name in ("clusters", "pairs"):
        d = os.path.join(out, "csv", name)
        files = [f for f in os.listdir(d) if f.endswith(".csv")]
        assert files, name
        header = [
            c.strip('"')
            for c in open(os.path.join(d, files[0])).readline().strip().split(",")
        ]
        assert "a" in header or "conv_id" in header

    # the session Ray must survive the CLI call (CLI only shuts down a
    # session it started itself)
    import ray

    assert ray.is_initialized()


def test_cli_run_memory_mode(ray_session, tmp_path, capsys):
    """--checkpoint-mode memory: same summary, no stage checkpoint dirs."""
    from raydedup.cli import main
    from raydedup.sources.synth import materialize

    fix = materialize(seed=13, n_convs=60, base_dir=str(tmp_path / "fx"))
    out = str(tmp_path / "out_mem")
    rc = main([
        "run", "--input", f"{fix}/transcripts.parquet", "--out", out,
        "--partitions", "2", "--checkpoint-mode", "memory",
        "--verify-mode", "estimate",
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["clusters"] > 0
    assert not os.path.exists(os.path.join(out, "signatures"))
