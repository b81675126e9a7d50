"""Wait for a quiet host-weather window, then launch one paired cluster
scaling session (BENCH/probes/cluster_run.py).

Why: the paired-session protocol tolerates weather that is STATIONARY
across a session's lo→hi halves, but a sample taken inside a memory storm
still measures the neighbor's workload, not this plan (observed while
gating: the 8-worker LLC-busting stream at 157 iters/s vs 594–925 in the
quiet windows the committed sessions ran in — a 4–6× bandwidth collapse).
The 2-second single-threaded probe (bench._weather_probe) misses these
storms (BENCH/BASELINE.md drift note), so the gate uses the SAME
multi-worker membw kernel as the protocol calibration, at the hi level's
total core count, and requires two consecutive quiet readings 60 s apart
before launching. All samples the launched session records are kept as
usual — the gate only chooses WHEN to start sampling, which the protocol
already does implicitly by reporting min-wall / median-of-pairs.

Usage: python BENCH/probes/quiet_gate.py [reps] [lo_workers] [hi_workers]
Env: SPARK_GRAFT_EXEC_CORES (executor size family, default 4),
     SPARK_GRAFT_GATE_MEMBW (min iters/s at hi*cores workers, default 430),
     SPARK_GRAFT_GATE_ALLOC (min single-stream alloc MB/s, default 900),
     SPARK_GRAFT_GATE_TIMEOUT_S (give up after, default 7200 — exits 3).
"""
from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def probe(workers: int) -> tuple[float, dict]:
    """One ~6 s weather reading: multi-worker membw rate + the 2 s probe."""
    mask = os.sched_getaffinity(0)
    try:
        os.sched_setaffinity(0, set(range(workers)))
        with mp.Pool(workers) as p:
            t0 = time.time()
            its = p.map(bench._mem_burn, range(workers))
            rate = sum(its) / (time.time() - t0)
    finally:
        os.sched_setaffinity(0, mask)
    return rate, bench._weather_probe()


def main() -> None:
    exec_cores = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "4"))
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    hi_cores = exec_cores * hi
    membw_min = float(os.environ.get("SPARK_GRAFT_GATE_MEMBW", "430"))
    alloc_min = float(os.environ.get("SPARK_GRAFT_GATE_ALLOC", "900"))
    deadline = time.time() + float(
        os.environ.get("SPARK_GRAFT_GATE_TIMEOUT_S", "7200"))
    quiet_streak = 0
    while True:
        rate, w = probe(hi_cores)
        quiet = rate >= membw_min and w["alloc_mbps"] >= alloc_min
        print(f"gate: membw@{hi_cores}w={rate:.1f} it/s "
              f"(min {membw_min}) alloc={w['alloc_mbps']:.0f} MB/s "
              f"(min {alloc_min}) pyloop={w['pyloop_s']}s -> "
              f"{'QUIET' if quiet else 'stormy'} (streak {quiet_streak})",
              flush=True)
        quiet_streak = quiet_streak + 1 if quiet else 0
        if quiet_streak >= 2:
            break
        if time.time() > deadline:
            print("gate: timeout waiting for a quiet window", flush=True)
            sys.exit(3)
        time.sleep(60)
    print("gate: quiet window confirmed — launching session", flush=True)
    os.execv(sys.executable, [
        sys.executable,
        os.path.join(REPO, "BENCH", "probes", "cluster_run.py"),
        *sys.argv[1:],
    ])


if __name__ == "__main__":
    main()
