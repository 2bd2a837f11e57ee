"""Print Ray Data execution stats for a ``queries()`` entry — the
measure-don't-guess loop: run one operator, materialize it, and dump
Ray's per-operator wall/CPU/row/bytes breakdown (``Dataset.stats()``)
so slow stages are identified from measurements, not intuition.

Usage: python tools/stage_stats.py [query ...] [--sf SF_DIR | --sf=SF_DIR]
Defaults to the three heaviest headline operators at sf0.01.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    args = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf" and i + 1 < len(argv):
            sf_dir = argv[i + 1]
            i += 2
            continue
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif not a.startswith("--"):
            args.append(a)
        i += 1
    names = args or ["q_minhash_doc_clusters", "q_tfidf_top_terms", "q_exact_dedup"]

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    qs = e.queries()
    for name in names:
        t0 = time.time()
        res = qs[name](sf_dir)
        if hasattr(res, "materialize"):
            res = res.materialize()
            stats = res.stats()
            rows = res.count()
        else:
            stats = "(non-Dataset result: no Ray stats)"
            rows = len(res)
        print(f"===== {name}  rows={rows}  wall={time.time() - t0:.2f}s =====")
        print(stats)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
