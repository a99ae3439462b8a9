#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) in a fresh local Ray session with
``num_cpus=$RAY_GRAFT_CPUS`` (default 32) and print ONE JSON line::

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": .., "num_cpus": N,
     "images_per_sec": .., "violation_rows_per_sec": ..}

``--scaling``: run the same job twice in fresh subprocesses at num_cpus=8 and
32 on the same input and report both throughputs + scaling efficiency
(the sandbox proxy for the north rule's N vs 4N cluster criterion).

The headline is the flagship image-table validation pipeline (full rule set +
decode + sketches + shuffle rules) over a cached synthetic table of
``sf × 1e6`` images; table generation is excluded from timing.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _bench_files(n: int) -> int:
    """More files for big tables: generation parallelism + partition count."""
    return 8 if n <= 400_000 else 32


def _sf(sf_dir: str) -> float:
    name = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(name.replace("sf", ""))
    except ValueError:
        return 0.1


def run_bench(sf_dir: str, num_cpus: int) -> dict:
    import ray
    import ray.data as rd
    # log_to_driver=False: worker log lines (e.g. Ray Data's benign
    # "Failed to hash the schemas" warning) must not interleave with the
    # single JSON line this script prints on stdout
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR",
             log_to_driver=False)
    ctx = rd.DataContext.get_current()
    ctx.enable_progress_bars = False

    from faang_pydantics_validation_ray.imagetable import datagen
    from faang_pydantics_validation_ray.pipelines import queries as Q
    from faang_pydantics_validation_ray.pipelines.profile import (
        build_reference_profile,
    )
    from faang_pydantics_validation_ray.pipelines.validate import (
        ValidationOptions, validate_images,
    )

    sf = _sf(sf_dir)
    n_mult = int(os.environ.get("FPV_N_MULT", "1"))
    n = max(2000, int(sf * 1_000_000)) * n_mult
    # table generation + reference profile are setup, not benchmark
    nf = _bench_files(n)
    dirty = datagen.ensure_image_table(n=n, seed=42, n_files=nf, use_ray=True)
    clean = datagen.ensure_image_table(n=n, seed=42, n_files=nf,
                                       violations=False, drift=False,
                                       use_ray=True)
    ref = build_reference_profile(rd.read_parquet(f"{clean}/images"))
    import pyarrow.parquet as pq
    vocab = pq.read_table(f"{dirty}/vocab.parquet").column("label").to_pylist()
    # warm OS page cache so we measure compute+shuffle, not first disk read
    rd.read_parquet(f"{dirty}/images",
                    columns=["image_id"]).count()

    # leave ≥2 slots for read/shuffle tasks: a pool equal to the session's
    # full CPU count starves upstream reads and stalls (seen at num_cpus=4)
    opts = ValidationOptions(batch_size=512,
                             concurrency=max(2, num_cpus - 2))

    def _flagship():
        return validate_images(
            rd.read_parquet(f"{dirty}/images", override_num_blocks=4 * num_cpus),
            captions_ds=rd.read_parquet(f"{dirty}/captions.parquet",
                                        override_num_blocks=num_cpus),
            narrow_ds=rd.read_parquet(f"{dirty}/images",
                                      columns=["image_id", "phash"],
                                      override_num_blocks=num_cpus),
            ref_profile=ref, opts=opts,
            catalog_ds=rd.read_parquet(f"{dirty}/catalog.parquet"),
            vocab=vocab)

    # one untimed warm-up by default (worker-process fork + import +
    # page-cache warm): the cold first execution in a fresh process measured
    # up to 3× the warmed steady state on the sandbox VM, which is startup
    # cost a long-lived cluster never pays. RAY_GRAFT_NO_WARMUP=1 disables.
    if not os.environ.get("RAY_GRAFT_NO_WARMUP"):
        import gc
        _flagship()          # warm worker processes / imports / page cache
        gc.collect()
        time.sleep(2)
    # median of N timed runs (default 1 for the per-round headline; the
    # scaling harness sets FPV_BENCH_RUNS=3 — the sandbox VM shows ±50%
    # run-to-run variance, so single-shot legs swamp the true N-vs-4N ratio)
    n_runs = int(os.environ.get("FPV_BENCH_RUNS", "1"))
    times, phase_runs = [], []
    for _ in range(max(1, n_runs)):
        t0 = time.perf_counter()
        res = _flagship()
        times.append(time.perf_counter() - t0)
        phase_runs.append(res.summary.get("phase_sec", {}))
    times_sorted = sorted(times)
    headline = times_sorted[len(times_sorted) // 2]
    med_idx = times.index(headline)
    res_phases = phase_runs[med_idx]
    total_rows = res.summary["total"]
    violation_rows = int(res.rule_counts["count"].sum())

    qtimes: dict[str, float] = {"flagship_validate": round(headline, 3)}
    for qname in ("rules_lineitem", "q1_pricing", "unique_lineitem",
                  "ref_events_customer", "dedup_exact_documents",
                  "token_stats_documents", "ann_topk",
                  "minhash_neardup_documents", "simhash_neardup_documents",
                  "asof_events_orders", "vocab_documents",
                  "cluster_embeddings", "docfreq_documents",
                  "quantiles_lineitem", "tfidf_documents"):
        tq = time.perf_counter()
        Q.QUERIES[qname](sf_dir)
        qtimes[qname] = round(time.perf_counter() - tq, 3)

    out = {
        "metric": "flagship image validation wall time (full rule set + "
                  "decode + sketches + shuffle rules)",
        "value": round(headline, 3), "unit": "sec",
        "queries": qtimes, "sf": sf, "num_cpus": num_cpus,
        "rows": total_rows,
        "images_per_sec": round(total_rows / headline, 1),
        "violation_rows_per_sec": round(violation_rows / headline, 1),
        "phase_sec": res_phases,
        "timed_runs": [round(t, 3) for t in times],
    }
    ray.shutdown()
    return out


def run_scaling(sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Same job, same input, fresh process per parallelism level, one warmup
    run per process (worker-process/import/page-cache warm — on a long-lived
    cluster startup amortizes to zero). Reports full-pipeline and fused-stage
    (per-row compute) efficiencies.

    Default input is 16× the headline table (1.6M images at sf0.1) so compute
    dominates the ~7 s per-run orchestration floor — the faithful proxy for
    the N vs 4N node criterion (see BASELINE.md workload-size sweep). First
    run generates the table (~10 min); afterwards it is cached under /tmp.
    Override with FPV_N_MULT."""
    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SF_DIR=sf_dir,
                   FPV_N_MULT=os.environ.get("FPV_N_MULT", "16"),
                   FPV_BENCH_RUNS=os.environ.get("FPV_BENCH_RUNS", "3"))
        p = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True, check=True)
        return json.loads(p.stdout.strip().splitlines()[-1])

    r_lo, r_hi = one(lo), one(hi)
    tput_lo, tput_hi = r_lo["images_per_sec"], r_hi["images_per_sec"]
    eff = (tput_hi / tput_lo) / (hi / lo)
    p1_lo = r_lo["phase_sec"].get("pass1 fused stage")
    p1_hi = r_hi["phase_sec"].get("pass1 fused stage")
    p1_eff = round((p1_lo / p1_hi) / (hi / lo), 3) if p1_lo and p1_hi else None
    return {
        "metric": "scaling efficiency (images/sec at num_cpus "
                  f"{lo} vs {hi}, fresh processes, same input, warmed)",
        "sf": r_lo["sf"], "rows": r_lo["rows"],
        f"sec_{lo}": r_lo["value"], f"sec_{hi}": r_hi["value"],
        f"images_per_sec_{lo}": tput_lo, f"images_per_sec_{hi}": tput_hi,
        "scaling_efficiency": round(eff, 3),
        f"pass1_sec_{lo}": p1_lo, f"pass1_sec_{hi}": p1_hi,
        "pass1_scaling_efficiency": p1_eff,
        "target": 0.8,
        f"phases_{lo}": r_lo["phase_sec"], f"phases_{hi}": r_hi["phase_sec"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    else:
        print(json.dumps(run_bench(SF_DIR, NUM_CPUS)))
