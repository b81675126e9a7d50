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
    mult = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_MULT", "1"))
    n_docs = Q.load(spark, sf_dir, "documents").count() * mult
    if os.environ.get("SPARK_GRAFT_WARMUP"):
        Q.flagship_entry(spark, sf_dir).write.format("noop").mode("overwrite").save()
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


CORPUS_DIR = os.path.join(REPO, ".bench_corpus")


def _ensure_media_corpus(n_docs: int = 36000) -> str:
    """Materialize the media-heavy interleaved fixture corpus as parquet once
    — the scaling job reads it like any production input. The media-heavy mix
    makes the OCR/table kernels (the north-star workload) dominate wall time
    so the measurement reflects data-parallel compute, not stage latency."""
    marker = os.path.join(CORPUS_DIR, f".done_{n_docs}")
    if os.path.exists(marker):
        return CORPUS_DIR
    from micro_lab_ocr_spark.session import get_spark
    from micro_lab_ocr_spark.sources import fixtures

    docs, media, _ = fixtures.generate_corpus(
        n_docs=n_docs, seed=42, mix=fixtures.MEDIA_HEAVY_MIX
    )
    spark = get_spark("corpus-gen", parallelism=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs_df = spark.createDataFrame(
        [(d["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
         for d in docs],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    media_df = spark.createDataFrame(
        [(m["media_ref"], bytearray(m["content"])) for m in media],
        "media_ref string, content binary",
    )
    docs_df.repartition(64).write.mode("overwrite").parquet(f"{CORPUS_DIR}/docs.parquet")
    media_df.repartition(64).write.mode("overwrite").parquet(f"{CORPUS_DIR}/media.parquet")
    spark.stop()
    open(marker, "w").write("ok")
    return CORPUS_DIR


def run_scaling_single(parallelism: int) -> dict:
    """One timed run of the full media pipeline at a parallelism level."""
    import time as _t

    from micro_lab_ocr_spark.pipeline.extract import normalize_spans
    from micro_lab_ocr_spark.session import get_spark

    spark = get_spark("scaling", parallelism=parallelism)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{CORPUS_DIR}/docs.parquet")
    media = spark.read.parquet(f"{CORPUS_DIR}/media.parquet")
    n_docs = docs.count()
    normalize_spans(docs, media).write.format("noop").mode("overwrite").save()  # warmup
    t0 = _t.perf_counter()
    normalize_spans(docs, media).write.format("noop").mode("overwrite").save()
    wall = _t.perf_counter() - t0
    spark.stop()
    return {"cores": parallelism, "wall": round(wall, 3), "docs": n_docs}


def run_scaling(sf_dir: str) -> None:
    """Two-parallelism scaling protocol (BASELINE.md): same job, same input,
    local[N] vs local[4N]; efficiency = (T_N / T_4N) / 4.

    The job is the full interleaved pipeline over the media-rich fixture
    corpus (the north-star workload: OCR/table kernels dominate). Each level
    does a warmup pass (codegen/plan/python-worker warm) then a timed pass,
    in a clean subprocess per level."""
    _ensure_media_corpus()
    lo, hi = 8, 32
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "3"))
    walls: dict[int, list[float]] = {lo: [], hi: []}
    docs = 0
    # interleave repetitions so host noise hits both levels evenly; take the
    # min wall per level (standard noise-resistant estimator)
    for _ in range(reps):
        for n in (lo, hi):
            out = subprocess.run(
                [sys.executable, __file__, "--single-scaling", str(n)],
                capture_output=True, text=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
                timeout=3600,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            walls[n].append(r["wall"])
            docs = r["docs"]
    t_lo = min(walls[lo])
    t_hi = min(walls[hi])
    eff = (t_lo / t_hi) / (hi / lo)
    md = f"""# BENCH/BASELINE — scaling protocol results

Same job (full interleaved extraction: text/html/table_html/image/pdf spans →
normalized spans, incl. the OCR grid path) over the same materialized fixture
corpus ({docs} docs with media), two parallelism levels — the sandbox
stand-in for N vs 4N executors (BASELINE.md protocol).

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
                      "lo": lo, "hi": hi, "docs": docs,
                      "walls_lo": walls[lo], "walls_hi": walls[hi]}))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--single-flagship":
        print(json.dumps(run_suite(int(sys.argv[2]), SF_DIR, include_queries=False)))
    elif len(sys.argv) > 1 and sys.argv[1] == "--single-scaling":
        print(json.dumps(run_scaling_single(int(sys.argv[2]))))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling(SF_DIR)
    else:
        print(json.dumps(run_suite(CPUS, SF_DIR)))
