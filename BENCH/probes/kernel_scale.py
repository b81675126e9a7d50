"""Isolated decode-kernel scaling probe (no Spark).

The production decomposition (BENCH/BASELINE.md, probe_2_8.jsonl) convicts
the MapInPandas decode stage: its executor core-seconds inflate ~3x going
2->8 workers on this box. That stage is JVM scan + Arrow IPC + the Python
decode kernel; this probe isolates the LAST term by running the exact
kernel (ocr.decode_image over the real fixture media mix) across K
OS processes with the total workload FIXED — the same shape Spark gives it.

For each K it reports min wall over reps, aggregate process-CPU-seconds
(sum of per-worker time.process_time deltas — the direct analogue of the
executor "run core-s" column), and throughput.  If CPU-seconds inflate with
K, the kernel's own memory traffic is the contended resource and kernel
optimization moves the production number; if they stay flat, the inflation
lives in the JVM/Arrow half of the stage.

Usage: python BENCH/probes/kernel_scale.py [lo] [hi] [reps]
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import pickle
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

BLOBS_CACHE = "/tmp/kernel_scale_blobs.pkl"


def _ensure_blobs(n_docs: int = 4000) -> list[bytes]:
    if os.path.exists(BLOBS_CACHE):
        with open(BLOBS_CACHE, "rb") as f:
            return pickle.load(f)
    from micro_lab_ocr_spark.sources import fixtures

    _, media, _ = fixtures.generate_corpus(
        n_docs=n_docs, seed=42, mix=fixtures.MEDIA_HEAVY_MIX
    )
    # keep only rasters the OCR kernel actually decodes (MLIMG + PNG),
    # mirroring the image branch's decodable-magic filter
    blobs = [
        m["content"]
        for m in media
        if m["content"].startswith((b"MLIMG", b"\x89PNG"))
    ]
    with open(BLOBS_CACHE, "wb") as f:
        pickle.dump(blobs, f)
    return blobs


def _worker(blob_slice: list[bytes], out_q) -> None:
    from micro_lab_ocr_spark.kernels import ocr

    t0p = time.process_time()
    t0w = time.monotonic()
    n_cells = 0
    for b in blob_slice:
        n_cells += len(ocr.decode_image(b))
    out_q.put({
        "cpu_s": time.process_time() - t0p,
        "wall_s": time.monotonic() - t0w,
        "n_cells": n_cells,
    })


def run_level(blobs: list[bytes], k: int) -> dict:
    slices = [blobs[i::k] for i in range(k)]
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(s, q)) for s in slices]
    t0 = time.monotonic()
    for p in procs:
        p.start()
    results = [q.get() for _ in procs]
    for p in procs:
        p.join()
    wall = time.monotonic() - t0
    return {
        "k": k,
        "wall_s": round(wall, 3),
        "cpu_s_total": round(sum(r["cpu_s"] for r in results), 2),
        "worker_wall_max": round(max(r["wall_s"] for r in results), 3),
        "cells": sum(r["n_cells"] for r in results),
        "blobs_per_sec": round(len(blobs) / wall, 1),
    }


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    blobs = _ensure_blobs()
    print(f"{len(blobs)} decodable blobs, {sum(map(len, blobs))/1e6:.1f} MB packed")
    samples: dict[int, list[dict]] = {lo: [], hi: []}
    # one warmup at lo to page everything in
    run_level(blobs[: max(64, len(blobs) // 8)], lo)
    for rep in range(reps):
        for k in (lo, hi):  # interleaved, same weather window per rep
            r = run_level(blobs, k)
            samples[k].append(r)
            print(json.dumps({"rep": rep, **r}))
    wl, wh = min(s["wall_s"] for s in samples[lo]), min(s["wall_s"] for s in samples[hi])
    cl = min(s["cpu_s_total"] for s in samples[lo])
    ch = min(s["cpu_s_total"] for s in samples[hi])
    print(json.dumps({
        "eff": round((wl / wh) / (hi / lo), 3),
        "cpu_inflation": round(ch / cl, 3),
        "min_wall": {lo: wl, hi: wh},
        "min_cpu_total": {lo: cl, hi: ch},
    }))


if __name__ == "__main__":
    main()
