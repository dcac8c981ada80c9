#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32) and print ONE JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
     "events": N, "events_per_sec": N}

--scaling: run the headline replay twice in fresh processes
(num_cpus=8 then num_cpus=32) on the same input and report both
throughputs + scaling efficiency (the sandbox evidence for the
N → 4N-node rule, SURVEY §4.2.8); also refreshes the results table in
BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time


def sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def n_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_bench() -> dict:
    import ray

    cpus = n_cpus()
    ray.init(
        address="local",
        num_cpus=cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow.parquet as pq

    from connect_smts_ray.pipelines.replay import (
        ReplayConfig,
        final_state,
        replay,
    )

    d = sf_dir()
    # warm the page cache so we measure compute + shuffle, not first disk read
    n_docs = pq.read_table(f"{d}/documents.parquet").num_rows
    events_per_key = int(os.environ.get("GRAFT_EVENTS_PER_KEY", "100"))
    total_events = n_docs * events_per_key

    pool = max(2, cpus // 4)
    lake = tempfile.mkdtemp(prefix="csr_bench_lake_")
    cfg = ReplayConfig(
        sf_dir=d,
        lake_dir=lake,
        events_per_key=events_per_key,
        num_partitions=32,
        expand_concurrency=pool,
        crypto_concurrency=pool,
        actor_num_cpus=1.0,
        batch_size=4096,
    )

    queries: dict = {}

    t0 = time.perf_counter()
    replay(cfg, fresh=True)
    state = final_state(cfg)
    replay_sec = time.perf_counter() - t0
    queries["cdc_replay"] = round(replay_sec, 3)
    assert state.num_rows > 0
    shutil.rmtree(lake, ignore_errors=True)

    # secondary pipelines (skippable with GRAFT_BENCH_HEADLINE_ONLY=1)
    if not os.environ.get("GRAFT_BENCH_HEADLINE_ONLY"):
        import __ray_entry__ as e

        for name in ("dedup_exact", "token_count", "lww_upsert_events",
                     "knn_bruteforce", "dedup_minhash"):
            t0 = time.perf_counter()
            res = e.queries()[name](d)
            # consume lazily-built datasets
            import ray.data as rd

            if isinstance(res, rd.Dataset):
                res = res.materialize()
                _ = res.count()
            queries[name] = round(time.perf_counter() - t0, 3)

    result = {
        "metric": "cdc_replay_wall_seconds",
        "value": round(replay_sec, 3),
        "unit": "sec",
        "queries": queries,
        "sf": d,
        "num_cpus": cpus,
        "events": total_events,
        "events_per_sec": round(total_events / replay_sec, 1),
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_HEADLINE_ONLY="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpu, hi_cpu = 8, 32
    lo, hi = run(lo_cpu), run(hi_cpu)
    eff = (lo["value"] / hi["value"]) / (hi_cpu / lo_cpu)
    result = {
        "metric": "scaling_efficiency",
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "events": lo["events"],
        "events_per_sec_8": lo["events_per_sec"],
        "events_per_sec_32": hi["events_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "sf": sf_dir(),
    }
    _update_baseline_md(result)
    return result


def _update_baseline_md(result: dict) -> None:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.md")
    marker = "## Measured scaling (bench.py --scaling)"
    try:
        text = open(path).read()
    except FileNotFoundError:
        text = ""
    if marker in text:
        text = text[: text.index(marker)].rstrip() + "\n"
    text += f"""
{marker}

Same input ({result['sf']}), identical replay pipeline, fresh processes:

| num_cpus | wall sec | events/s |
|---|---|---|
| 8 | {result['sec_8']} | {result['events_per_sec_8']} |
| 32 | {result['sec_32']} | {result['events_per_sec_32']} |

Scaling efficiency (8→32 CPUs, 4×): **{result['scaling_efficiency']}**
(rule: ≥ 0.8). Events per run: {result['events']}.
"""
    with open(path, "w") as f:
        f.write(text)


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
