#!/usr/bin/env python
"""Benchmark harness (driver contract + scaling protocol).

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:
    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

``--scaling`` additionally runs the flagship pipeline at two parallelism
levels (N and 4N cores, same input — the sandbox stand-in for N vs 4N
executors per BASELINE.md) in clean subprocesses and writes
BENCH/BASELINE.md with throughput + scaling efficiency.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "w1_filldown",
    "sessionize",
    "r3_pivot",
    "t_quality",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_brute_cosine_topk",
    "ann_lsh_cosine_topk",
    "f6_f7_clean_chain",
    "f3_id_extraction",
]


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_suite(parallelism: int, sf_dir: str, include_queries: bool = True) -> dict:
    from micro_lab_ocr_spark import queries as Q
    from micro_lab_ocr_spark.session import get_spark

    spark = get_spark("bench", parallelism=parallelism)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    # flagship pipeline: interleaved extraction over the documents table
    n_docs = Q.load(spark, sf_dir, "documents").count()
    t0 = time.perf_counter()
    Q.flagship_entry(spark, sf_dir).write.format("noop").mode("overwrite").save()
    t_pipe = time.perf_counter() - t0
    timings["flagship_extract"] = round(t_pipe, 3)

    if include_queries:
        qd = Q.queries_dict()
        for name in HEADLINE:
            t0 = time.perf_counter()
            qd[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "extraction+query suite wall time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(sf_dir),
        "cpus": parallelism,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / t_pipe, 2),
    }
    spark.stop()
    return result


def run_scaling(sf_dir: str) -> None:
    """Two-parallelism scaling protocol (BASELINE.md): same job, same input,
    local[N] vs local[4N]; efficiency = (T_N / T_4N) / 4."""
    lo, hi = 8, 32
    results = {}
    for n in (lo, hi):
        out = subprocess.run(
            [sys.executable, __file__, "--single-flagship", str(n)],
            capture_output=True, text=True, env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
            timeout=3600,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[n] = json.loads(line)
    t_lo = results[lo]["queries"]["flagship_extract"]
    t_hi = results[hi]["queries"]["flagship_extract"]
    docs = results[hi]["docs"]
    eff = (t_lo / t_hi) / (hi / lo)
    md = f"""# BENCH/BASELINE — scaling protocol results

Same flagship extraction job (interleaved spans → normalized spans over the
`documents` table at {sf_dir}), same input, two parallelism levels — the
sandbox stand-in for N vs 4N executors (BASELINE.md protocol).

| parallelism | wall (s) | docs/sec | docs/sec/core |
|---|---|---|---|
| local[{lo}] | {t_lo:.2f} | {docs / t_lo:.1f} | {docs / t_lo / lo:.2f} |
| local[{hi}] | {t_hi:.2f} | {docs / t_hi:.1f} | {docs / t_hi / hi:.2f} |

**Scaling efficiency (T_{lo}/T_{hi})/{hi // lo} = {eff:.3f}** (target ≥ 0.8).

Shuffle partitions scale with the core count (2×cores); Arrow batch size
fixed. The reference's ~5 s/page is external-API latency; this engine's local
kernels make shuffle + window + Arrow serialization the measured costs.
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"scaling_efficiency": round(eff, 3), "t_lo": t_lo, "t_hi": t_hi,
                      "lo": lo, "hi": hi, "docs": docs}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--single-flagship":
        print(json.dumps(run_suite(int(sys.argv[2]), SF_DIR, include_queries=False)))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling(SF_DIR)
    else:
        print(json.dumps(run_suite(CPUS, SF_DIR)))
