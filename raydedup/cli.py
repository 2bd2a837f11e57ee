"""CLI entry point — usable standalone or under ``ray job submit``:

    python -m raydedup.cli run --input turns.parquet --out /tmp/out \
        [--threshold 0.8] [--bands 32] [--rows 4] [--partitions 32]
    python -m raydedup.cli label --input turns.parquet --out /tmp/out
    python -m raydedup.cli synth --n-convs 2000 --out /tmp/fixture

The reference's only orchestration surface is a shell script running two
hardcoded-path scripts (``run_program.sh:13,27``); here the pipeline is a
single parameterized job whose stages checkpoint and resume
(``raydedup.state.checkpoint``).
"""

from __future__ import annotations

from raydedup.ray_utils import read_parquet_clean

import argparse
import json
import sys


_OWNS_RAY = False  # shut down only a session this process started


def _ensure_ray():
    global _OWNS_RAY
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
        _OWNS_RAY = True
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def _cfg_from_args(args):
    from raydedup.config import DedupConfig

    return DedupConfig(
        jaccard_threshold=args.threshold,
        bands=args.bands,
        rows=args.rows,
        num_perm=args.bands * args.rows,
        num_partitions=args.partitions,
        verify_mode=getattr(args, "verify_mode", "exact"),
        checkpoint_mode=getattr(args, "checkpoint_mode", "disk"),
    )


def cmd_run(args) -> int:
    _ensure_ray()
    from raydedup.pipelines.dedup import run_pipeline

    res = run_pipeline(args.input, args.out, _cfg_from_args(args))
    if getattr(args, "csv", False):
        # CSV report surface (the reference's duplicate/unique CSV writers,
        # duplicate_face.py:114-134 and final consolidated CSV :200-229);
        # parquet checkpoints stay the source of truth — these are exports
        for name in ("clusters", "pairs"):
            res[name].write_csv(f"{args.out}/csv/{name}")
    summary = {
        "clusters": res["clusters"].count(),
        "pairs": res["pairs"].count(),
        "events": res["events"],
    }
    print(json.dumps(summary))
    return 0


def cmd_label(args) -> int:
    """Join cluster labels back onto the turns table → ``<out>/labeled/``."""
    _ensure_ray()
    import ray.data as rd

    from raydedup.pipelines.dedup import label_turns, run_pipeline

    cfg = _cfg_from_args(args)
    res = run_pipeline(args.input, args.out, cfg)
    labeled = label_turns(read_parquet_clean(args.input), res["clusters"], cfg)
    labeled.write_parquet(f"{args.out}/labeled")
    print(json.dumps({"labeled_rows": read_parquet_clean(f"{args.out}/labeled").count()}))
    return 0


def cmd_synth(args) -> int:
    from raydedup.sources.synth import materialize

    path = materialize(seed=args.seed, n_convs=args.n_convs, base_dir=args.out)
    print(json.dumps({"fixture": path}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="raydedup")
    sub = p.add_subparsers(dest="cmd", required=True)

    for name, fn in (("run", cmd_run), ("label", cmd_label)):
        sp = sub.add_parser(name)
        sp.add_argument("--input", required=True)
        sp.add_argument("--out", required=True)
        sp.add_argument("--threshold", type=float, default=0.8)
        sp.add_argument("--bands", type=int, default=32)
        sp.add_argument("--rows", type=int, default=4)
        sp.add_argument("--partitions", type=int, default=32)
        sp.add_argument("--csv", action="store_true",
                        help="also export clusters/pairs as CSV reports")
        sp.add_argument("--verify-mode", dest="verify_mode",
                        choices=("exact", "estimate"), default="exact",
                        help="estimate = MinHash-agreement verify, skips "
                             "shingle storage (the big-run default)")
        sp.add_argument("--checkpoint-mode", dest="checkpoint_mode",
                        choices=("disk", "memory"), default="disk",
                        help="memory = ephemeral one-shot run, no resumable "
                             "checkpoints, ~2x faster at small scale")
        sp.set_defaults(fn=fn)

    sp = sub.add_parser("synth")
    sp.add_argument("--n-convs", type=int, default=2000)
    sp.add_argument("--seed", type=int, default=42)
    sp.add_argument("--out", default="/tmp/raydedup_fixtures")
    sp.set_defaults(fn=cmd_synth)

    args = p.parse_args(argv)
    rc = args.fn(args)
    import ray

    if _OWNS_RAY and ray.is_initialized():
        ray.shutdown()
    return rc


if __name__ == "__main__":
    sys.exit(main())
