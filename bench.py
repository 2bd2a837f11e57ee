"""Benchmark harness (driver-run per round; also the scaling evidence).

Default mode: runs the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) plus the transcript-dedup flagship over the
deterministic synthetic transcripts table at the matching scale, and
prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...},
     "sf": ..., "num_cpus": N}

``--scaling``: runs the flagship twice in fresh processes at
``num_cpus=8`` and ``num_cpus=32`` on the same input and reports both
throughputs (turns/sec) plus the scaling efficiency
``(T_32/T_8)/(32/8)`` — the sandbox proxy for the north rule's N→4N-node
cluster criterion (see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_of(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.01


def _transcripts_fixture(sf: float) -> tuple:
    from raydedup.sources.synth import materialize

    n_convs = max(200, int(200_000 * sf))
    return materialize(seed=42, n_convs=n_convs), n_convs


def run_flagship(sf_dir: str, num_cpus: int, fresh: bool = True,
                 n_convs: int | None = None, checkpoint_mode: str | None = None,
                 cfg_overrides: dict | None = None) -> dict:
    """Full transcript dedup at the sf-matched synthetic scale; returns
    timing + turns/sec.  Checkpoints go to a throwaway dir (cold run)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    import pyarrow.parquet as pq

    from raydedup.config import DedupConfig
    from raydedup.pipelines.dedup import run_pipeline

    if n_convs is None:
        fixture, n_convs = _transcripts_fixture(_sf_of(sf_dir))
    else:
        from raydedup.sources.synth import materialize

        fixture = materialize(seed=42, n_convs=n_convs)
    n_turns = pq.ParquetFile(f"{fixture}/transcripts.parquet").metadata.num_rows
    out_dir = f"/tmp/raydedup_bench/n{n_convs}_c{num_cpus}"
    if fresh and os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    # Scale configuration: estimate-mode verification is the documented
    # big-run default — it skips storing shingle sets entirely (the
    # signature checkpoint drops from ~6 GB to ~150 MB per 1M convs) and
    # verifies on MinHash agreement; recall vs the oracle stays >= 0.98
    # (tests/test_verify_modes.py::test_estimate_mode_pipeline_recall).
    # checkpoint_mode=None → auto: small corpora default to the ephemeral
    # (object-store) path, where nine disk-checkpointed stage executions
    # would otherwise be ~60% fixed spin-up/IO cost; big corpora keep the
    # resumable disk path (results are identical either way — the resume
    # tests pin the disk path explicitly).
    if checkpoint_mode is None:
        checkpoint_mode = "memory" if n_convs <= 100_000 else "disk"
    cfg = DedupConfig(
        num_partitions=max(8, num_cpus),
        sig_concurrency=(2, max(2, num_cpus // 2)),
        verify_mode="estimate",
        checkpoint_mode=checkpoint_mode,
        **(cfg_overrides or {}),
    )
    t0 = time.time()
    res = run_pipeline(f"{fixture}/transcripts.parquet", out_dir, cfg)
    n_clusters = res["clusters"].count()
    dt = time.time() - t0
    return {
        "sec": round(dt, 2),
        "turns": int(n_turns),
        "convs": int(n_convs),
        "clusters": int(n_clusters),
        "turns_per_sec": round(n_turns / dt, 1),
        "stages": {
            e["stage"]: e["sec"] for e in res["events"] if e.get("action") == "computed"
        },
    }


def run_doc_queries(sf_dir: str) -> dict:
    """Headline document/embedding operators over the sf dir."""
    from raydedup.pipelines import (
        curation,
        docdedup,
        docops,
        relops,
        sampling,
        passage,
        similarity,
        tiers,
        transcripts,
        vocab,
    )

    out = {}
    # ngram-Jaccard runs with a tight document-frequency cap: this
    # fixture's 31-token vocabulary is all hot tokens, so the uncapped
    # exact join's output is Θ(N²) by construction; the cap bounds
    # per-token emission (the sketch-based q_minhash_doc_clusters is the
    # uncapped scale path).
    for name, fn in [
        ("q_exact_dedup", docops.exact_dedup),
        ("q_minhash_doc_clusters", docdedup.minhash_doc_clusters),
        ("q_ngram_jaccard_capped", lambda sf: docops.ngram_jaccard_pairs(sf, df_cap=256)),
        ("q_token_stats", docops.doc_token_stats),
        ("q_knn_bruteforce", similarity.knn_bruteforce),
        ("q_top_tokens", docops.top_tokens),
        ("q_user_sessions", docops.user_sessions),
        ("q_asof_attribution", docops.asof_attribution),
        ("q_tfidf_top_terms", docops.tfidf_top_terms),
        ("q_decontaminate", curation.decontaminate),
        ("q_label_centroids", curation.label_centroids),
        ("q_bigram_collocations", docops.bigram_collocations),
        ("q_customer_order_distribution", relops.customer_order_distribution),
        ("q_region_revenue", relops.region_revenue),
        ("q_shipping_priority", relops.shipping_priority),
        ("q_event_props_stats", docops.event_props_stats),
        ("q_user_funnel", docops.user_funnel),
        ("q_approx_value_quantiles", curation.approx_value_quantiles),
        ("q_embedding_pca", similarity.embedding_pca),
        ("q_docs_events_semijoin_bloom", docops.docs_events_semijoin_bloom),
        ("q_supplier_nation_revenue", relops.supplier_nation_revenue),
        ("q_brand_revenue", relops.brand_revenue),
        ("q_segment_priority_counts", relops.segment_priority_counts),
        ("q_events_recent_activity", docops.events_recent_activity),
        ("q_ngram_decontaminate", curation.ngram_decontaminate),
        ("q_doc_length_rank", docops.doc_length_rank),
        ("q_event_interarrival", docops.event_interarrival),
        ("q_dedup_tiers", tiers.dedup_tiers),
        ("q_shuffle_rank", sampling.shuffle_rank),
        ("q_dup_degree_profile", lambda sf: docops.dup_degree_profile(sf, df_cap=256)),
        ("q_boilerplate_turns", transcripts.boilerplate_turns),
        ("q_embedding_clusters", similarity.embedding_clusters),
        ("q_embedding_dbscan", similarity.embedding_dbscan),
        ("q_vocab_prune", vocab.vocab_prune),
        ("q_stopword_ratio", vocab.stopword_ratio),
        ("q_passage_dedup", passage.passage_dedup),
        ("q_token_kl_by_source", vocab.token_kl_by_source),
        ("q_stutter_turns", transcripts.stutter_turns),
    ]:
        t0 = time.time()
        res = fn(sf_dir)
        n = res.count() if hasattr(res, "count") else len(res)
        out[name] = round(time.time() - t0, 2)
        _ = n
    return out


def main_bench():
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False, logging_level="ERROR"
    )
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    # warm the worker pool so the first timed query doesn't absorb Ray
    # session startup (first-execution penalty measured at up to tens of
    # seconds on a cold session under host contention)
    ray.data.range(100_000).map_batches(lambda b: b).count()

    # headline flagship: auto checkpoint mode (ephemeral below the
    # 100k-conv gate — see run_flagship); the resumable disk path is
    # measured separately so both modes stay tracked round-over-round
    flag = run_flagship(SF_DIR, NUM_CPUS)
    flag_disk = run_flagship(SF_DIR, NUM_CPUS, checkpoint_mode="disk")
    queries = {
        "flagship_transcript_dedup": flag["sec"],
        "flagship_disk": flag_disk["sec"],
    }
    queries.update(run_doc_queries(SF_DIR))
    total = round(sum(queries.values()), 2)
    # The checkpoint mode behind each flagship key is recorded explicitly:
    # 'flagship_transcript_dedup' follows the auto gate (ephemeral
    # object-store boundaries at bench scale, disk above 100k convs), so a
    # round that moves the gate would otherwise silently change what the
    # long-lived key measures; 'flagship_disk' pins the resumable disk
    # path for mode-stable round-over-round comparison.
    auto_mode = "memory" if flag["convs"] <= 100_000 else "disk"
    print(
        json.dumps(
            {
                "metric": "end-to-end dedup wall time (flagship + headline operators)",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": _sf_of(SF_DIR),
                "num_cpus": NUM_CPUS,
                "flagship": flag,
                "flagship_modes": {
                    "flagship_transcript_dedup": f"{auto_mode} (auto)",
                    "flagship_disk": "disk",
                },
            }
        )
    )
    ray.shutdown()


def main_scaling():
    # Scaling evidence runs on a compute-dominated input (default 1M
    # conversations ≈ 12M turns): per-execution fixed costs (~4-6 s per
    # stage regardless of data size) would otherwise swamp the comparison.
    #
    # Each leg is pinned to exactly `cpus` physical cores with CPU
    # affinity (taskset), not just ray.init(num_cpus=...): Ray's num_cpus
    # only bounds task *slots*, while pyarrow I/O threads, shuffle
    # aggregator actors (0.05 CPU each) and object-store workers would
    # otherwise spill onto the host's idle cores and flatter the
    # small-"cluster" leg.
    scale_n = int(os.environ.get("RAYDEDUP_SCALE_CONVS", "1000000"))
    attempts = int(os.environ.get("RAYDEDUP_SCALE_ATTEMPTS", "1"))
    # RAYDEDUP_SCALE_MODE=memory measures the ephemeral path: stage
    # boundaries in the object store, no shared-disk checkpoint writes
    # (the dominant non-scaling resource on this single-node proxy)
    mode = os.environ.get("RAYDEDUP_SCALE_MODE", "disk")
    # RAYDEDUP_SCALE_CPUS="small,large" picks the N / 4N proxy pair.  The
    # default 8,32 saturates every VM core on the large leg; on an
    # oversubscribed shared host that exposes only the large leg to
    # noisy-neighbor steal (the small leg's idle cores concentrate the
    # VM's physical shares), deflating measured efficiency.  4,16 leaves
    # headroom on both legs and is the cleaner proxy on a noisy host.
    pair = os.environ.get("RAYDEDUP_SCALE_CPUS", "8,32")
    cpu_small, cpu_large = (int(x) for x in pair.split(","))
    results = {}
    for cpus in (cpu_small, cpu_large):
        best = None
        for _attempt in range(attempts):
            code = (
                "import json, bench; "
                "r = bench.run_flagship(bench.SF_DIR, %d, n_convs=%d, "
                "checkpoint_mode=%r); "
                "print('SCALEJSON ' + json.dumps(r))" % (cpus, scale_n, mode)
            )
            cmd = [sys.executable, "-c", code]
            if shutil.which("taskset") and (os.cpu_count() or 0) >= cpus:
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            p = subprocess.run(
                cmd,
                capture_output=True,
                text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                env={**os.environ, "PYTHONPATH": os.path.dirname(os.path.abspath(__file__))},
            )
            line = [l for l in p.stdout.splitlines() if l.startswith("SCALEJSON ")]
            if not line:
                print(json.dumps({"error": "scaling run failed", "cpus": cpus,
                                  "stderr": p.stderr[-2000:]}))
                sys.exit(1)
            r = json.loads(line[-1][len("SCALEJSON "):])
            if best is None or r["sec"] < best["sec"]:
                best = r
        results[cpus] = best
    t8, t32 = results[cpu_small]["turns_per_sec"], results[cpu_large]["turns_per_sec"]
    eff = (t32 / t8) / (cpu_large / cpu_small)
    # per-stage efficiency decomposition: stage wall at 8 cpus / (4 × wall
    # at 32 cpus) — isolates which stages are CPU-bound (≈1.0) vs bounded
    # by the shared disk / fixed per-execution costs this single-node
    # sandbox cannot scale (see BASELINE.md caveats)
    stage_eff = {}
    s8 = results[cpu_small].get("stages", {})
    s32 = results[cpu_large].get("stages", {})
    ratio = cpu_large / cpu_small
    for k in s32:
        if k in s8 and s32[k] > 0:
            stage_eff[k] = round(s8[k] / (ratio * s32[k]), 3)
    print(
        json.dumps(
            {
                "metric": f"scaling efficiency (num_cpus {cpu_small} -> {cpu_large}, same input)",
                "value": round(eff, 3),
                "unit": "efficiency",
                f"throughput_{cpu_small}": t8,
                f"throughput_{cpu_large}": t32,
                "stage_efficiency": stage_eff,
                "checkpoint_mode": mode,
                "detail": results,
                "sf": _sf_of(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        main_scaling()
    else:
        main_bench()
