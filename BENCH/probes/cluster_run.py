"""Stand up a local Spark STANDALONE cluster and measure the production job
at two cluster sizes — N and 4N EXECUTORS — via spark-submit --py-files,
exactly as the north rule states it.

Topology per level (on this 32-core box):

  * master JVM (unpinned; negligible CPU)
  * W workers, each `taskset`-pinned to its own disjoint 4-core block
    (worker i -> cpus 4i..4i+3), each offering 4 cores / 8g
  * one executor per worker (spark.executor.cores=4) — so W executors,
    each cgroup-faithfully capped at 4 physical cores, with its OWN heap,
    own Python workers, and localhost-TCP shuffle between JVMs
  * the driver (spark-submit, client mode) unpinned — on a real cluster
    the driver node is separate hardware

Levels: W=1 (N=1 executor) vs W=4 (4N) by default. Samples append to
BENCH/cluster_samples.jsonl; interleave reps like the local protocol.

Usage: python BENCH/probes/cluster_run.py [reps] [lo_workers] [hi_workers]
"""
from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

import pyspark  # noqa: E402

SPARK_BIN = os.path.join(os.path.dirname(pyspark.__file__), "bin")
MASTER_URL = "spark://127.0.0.1:7077"
# Executor size is configurable: the north rule fixes the RATIO (N vs 4N
# executors), not the executor core count. On this shared-memory box the
# 4-core pair (4->16 total cores) runs into the measured memory-bandwidth
# saturation knee (~8-16 streams); a 2-core pair (2->8 total) stays below
# it, so both families are measured and reported separately.
EXEC_CORES = int(os.environ.get("SPARK_GRAFT_EXEC_CORES", "4"))
EXEC_MEM = "8g"


def _port_open(port: int) -> bool:
    with socket.socket() as s:
        return s.connect_ex(("127.0.0.1", port)) == 0


def _spawn(cmd: list[str], log: str, env: dict | None = None) -> subprocess.Popen:
    f = open(log, "ab")
    return subprocess.Popen(
        cmd, stdout=f, stderr=subprocess.STDOUT,
        env={**os.environ, **(env or {})},
    )


def run_level(n_workers: int, log_dir: str) -> dict:
    procs: list[subprocess.Popen] = []
    try:
        procs.append(_spawn(
            [os.path.join(SPARK_BIN, "spark-class"),
             "org.apache.spark.deploy.master.Master",
             "--host", "127.0.0.1", "--port", "7077", "--webui-port", "8090"],
            os.path.join(log_dir, "master.log"),
        ))
        for _ in range(120):
            if _port_open(7077):
                break
            time.sleep(0.5)
        else:
            raise RuntimeError("standalone master did not come up")
        for i in range(n_workers):
            lo, hi = i * EXEC_CORES, (i + 1) * EXEC_CORES - 1
            procs.append(_spawn(
                ["taskset", "-c", f"{lo}-{hi}",
                 os.path.join(SPARK_BIN, "spark-class"),
                 "org.apache.spark.deploy.worker.Worker", MASTER_URL,
                 "--cores", str(EXEC_CORES), "--memory", EXEC_MEM,
                 "--webui-port", str(8190 + i), "--host", "127.0.0.1"],
                os.path.join(log_dir, f"worker{i}.log"),
                # executors (and their Python workers) inherit the worker's
                # taskset mask: the cgroup-faithful 4-cores-per-executor cap
            ))
        time.sleep(5)
        out = subprocess.run(
            [os.path.join(SPARK_BIN, "spark-submit"),
             "--master", MASTER_URL,
             "--deploy-mode", "client",
             "--py-files", os.path.join(REPO, "dist", "micro_lab_ocr_spark.zip"),
             "--conf", f"spark.executor.cores={EXEC_CORES}",
             "--conf", f"spark.executor.memory={EXEC_MEM}",
             "--conf", f"spark.cores.max={EXEC_CORES * n_workers}",
             "--conf", "spark.sql.shuffle.partitions="
                       f"{max(8, 2 * EXEC_CORES * n_workers)}",
             "--conf", "spark.sql.adaptive.enabled=true",
             "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=512",
             "--conf", "spark.driver.memory=6g",
             os.path.join(REPO, "BENCH", "probes", "cluster_scale.py"),
             str(n_workers)],
            capture_output=True, text=True, timeout=5400,
        )
        for line in out.stdout.splitlines():
            if line.startswith("CLUSTER_SCALE_RESULT "):
                return json.loads(line[len("CLUSTER_SCALE_RESULT "):])
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-5000:] + "\n")
        raise RuntimeError(f"no result line from spark-submit (rc={out.returncode})")
    finally:
        for p in procs:
            p.terminate()
        for p in procs:
            try:
                p.wait(timeout=15)
            except subprocess.TimeoutExpired:
                p.kill()
        time.sleep(2)


def _gate_level(gate_workers: int) -> dict | None:
    """Bounded wait for a quiet host window immediately before ONE level's
    runs — the same multi-worker membw kernel and thresholds as
    quiet_gate.py, applied SYMMETRICALLY before every level.

    Why: the session-start gate (quiet_gate.py) proved insufficient in the
    eighth 2-core session — a bandwidth regime change arrived ~15 min in,
    after the lo half, degrading only the hi half (118.5 s vs 93.4 s for
    identical code in the prior session) and reading 0.741 where the two
    quiet-window sessions read 0.846/0.847. Gating both halves with the
    same criterion keeps the pair's two weather windows comparable without
    cherry-picking: the gate (as before) only chooses WHEN to sample, every
    sample taken is recorded, and the readings land in the jsonl row.

    Proceeds anyway after SPARK_GRAFT_GATE_LEVEL_TIMEOUT_S (default 1800 s)
    so a session never strands its lo half — the recorded `gate` field
    (timed_out: true) makes that sample auditable.
    """
    if os.environ.get("SPARK_GRAFT_GATE_EACH_LEVEL", "1") != "1":
        return None
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from quiet_gate import probe
    membw_min = float(os.environ.get("SPARK_GRAFT_GATE_MEMBW", "430"))
    alloc_min = float(os.environ.get("SPARK_GRAFT_GATE_ALLOC", "900"))
    deadline = time.time() + float(
        os.environ.get("SPARK_GRAFT_GATE_LEVEL_TIMEOUT_S", "1800"))
    t0, streak, readings = time.time(), 0, []
    while True:
        rate, w = probe(gate_workers)
        readings.append(round(rate, 1))
        quiet = rate >= membw_min and w["alloc_mbps"] >= alloc_min
        print(f"level-gate: membw@{gate_workers}w={rate:.1f} it/s "
              f"(min {membw_min}) alloc={w['alloc_mbps']:.0f} MB/s -> "
              f"{'QUIET' if quiet else 'stormy'} (streak {streak})",
              flush=True)
        streak = streak + 1 if quiet else 0
        if streak >= 2:
            return {"membw": readings, "waited_s": round(time.time() - t0, 1),
                    "timed_out": False}
        if time.time() > deadline:
            print("level-gate: timeout — proceeding in current weather",
                  flush=True)
            return {"membw": readings, "waited_s": round(time.time() - t0, 1),
                    "timed_out": True}
        time.sleep(30)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    import bench  # weather probe, same estimator discipline as local protocol

    # materialize the scaling corpus BEFORE standing anything up: it is a
    # gitignored build artifact, and a cleaned workspace would otherwise burn
    # a whole session on PATH_NOT_FOUND inside the submitted driver
    bench._ensure_media_corpus()
    log_dir = "/tmp/cluster_scale_logs"
    os.makedirs(log_dir, exist_ok=True)
    samples_path = os.path.join(REPO, "BENCH", "cluster_samples.jsonl")
    # hardware-ceiling calibration at this family's TOTAL core pair (same
    # kernels as the local protocol), so the report can state where this
    # pair sits relative to the box's memory-bandwidth saturation knee
    cal = bench._calibrate((lo * EXEC_CORES, hi * EXEC_CORES))
    with open(samples_path, "a") as f:
        f.write(json.dumps({"calibration": cal, "exec_cores": EXEC_CORES}) + "\n")
    # record the code version under measurement: sessions are only
    # comparable within a commit (e.g. the round-5 OCR vectorization moved
    # the lo-level wall ~35%), so the report groups paired sessions by it
    try:
        commit = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or None
    except Exception:
        commit = None
    walls: dict[int, list[float]] = {lo: [], hi: []}
    # Optional hi-first ordering (SPARK_GRAFT_HI_FIRST=1): the hi level is
    # the weather-sensitive half (8 active cores want ~4x the aggregate
    # bandwidth of the lo level's 2 — measured hi walls track the gate's
    # membw reading nearly linearly: ~700 it/s -> 93.4 s, ~505 -> 118.1 s,
    # while lo moved only 316->330 s across the same regimes) and it is
    # ~2.5x shorter, so it is the half most likely to FIT inside a
    # confirmed-quiet window. Ordering does not bias the estimator — both
    # levels still pass the same symmetric gate before running.
    order = (hi, lo) if os.environ.get("SPARK_GRAFT_HI_FIRST") == "1" \
        else (lo, hi)
    for rep in range(reps):
        for w in order:
            gate = _gate_level(hi * EXEC_CORES)
            pre = bench._weather_probe()
            r = run_level(w, log_dir)
            rec = {"rep": rep, "workers": w,
                   "exec_cores": EXEC_CORES, "commit": commit,
                   "gate": gate, "weather_pre": pre,
                   "weather": bench._weather_probe(), **r}
            walls[w].extend(r["walls"])
            with open(samples_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
            print(json.dumps(rec))
    eff = (min(walls[lo]) / min(walls[hi])) / (hi / lo)
    print(json.dumps({
        "executors": f"{lo}->{hi}",
        "min_wall": {str(lo): min(walls[lo]), str(hi): min(walls[hi])},
        "scaling_efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
