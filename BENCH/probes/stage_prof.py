"""Production decode-stage probe with Python-side time attribution.

kernel_scale.py proved the decode kernel's own CPU is flat 4->16 workers
(inflation 1.08x), so the 3x core-second inflation of the MapInPandas stage
(probe_2_8.jsonl) lives in the JVM/Arrow half. This probe runs the REAL
stage shape — parquet scan -> mapInPandas(_ocr_grids) -> exchange — at one
core count per invocation with SPARK_GRAFT_KERNEL_PROF enabled, then sums
the per-task attribution lines:

  fetch  = blocked in next(it): JVM scan/feed + Arrow->pandas conversion
  decode = our kernel loop
  emit   = pandas->Arrow output serialization (consumer side of our yield)
  idle   = task wall not in the generator at all (worker startup, handshake)

Usage: python BENCH/probes/stage_prof.py <cores> [reps]
Interleave levels yourself: for r in 1 2 3; do ... 4; ... 16; done
"""
from __future__ import annotations

import glob
import json
import os
import pickle
import shutil
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

MEDIA_PARQUET = "/tmp/stage_prof_media"
PROF_DIR = "/tmp/stage_prof_out"


def _ensure_media(spark) -> None:
    if os.path.exists(os.path.join(MEDIA_PARQUET, "_SUCCESS")):
        return
    from BENCH.probes.kernel_scale import _ensure_blobs

    blobs = _ensure_blobs()
    df = spark.createDataFrame(
        [(f"m://p{i}", bytearray(b)) for i, b in enumerate(blobs)],
        "media_ref string, content binary",
    )
    df.repartition(64).write.mode("overwrite").parquet(MEDIA_PARQUET)


def main() -> None:
    cores = int(sys.argv[1])
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    os.makedirs(PROF_DIR, exist_ok=True)
    os.environ["SPARK_GRAFT_KERNEL_PROF"] = PROF_DIR

    from pyspark.sql import functions as F

    from micro_lab_ocr_spark.pipeline.extract import _ocr_grids
    from micro_lab_ocr_spark.session import get_spark

    spark = get_spark("stage-prof", parallelism=cores)
    spark.sparkContext.setLogLevel("ERROR")
    _ensure_media(spark)

    media = spark.read.parquet(MEDIA_PARQUET)
    for rep in range(reps):
        shutil.rmtree(PROF_DIR, ignore_errors=True)
        os.makedirs(PROF_DIR, exist_ok=True)
        grids = (
            media.select(
                F.col("media_ref").alias("doc_id"),
                F.lit(0).alias("offset"),
                "media_ref",
                F.lit("").alias("span_text"),
                "content",
            ).mapInPandas(
                _ocr_grids,
                "doc_id string, offset int, media_ref string, span_text string, "
                "ok boolean, cells array<struct<row:int,col:int,text:string>>",
            )
        )
        # force the exchange write + a full consume, like the production stage
        t0 = time.monotonic()
        out = (
            grids.groupBy(F.pmod(F.hash("doc_id"), F.lit(256)).alias("g"))
            .agg(F.sum(F.size("cells")).alias("n"))
            .agg(F.sum("n"))
            .collect()
        )
        wall = time.monotonic() - t0
        tasks = []
        for path in glob.glob(os.path.join(PROF_DIR, "*.jsonl")):
            with open(path) as f:
                tasks.extend(json.loads(line) for line in f)
        tot = lambda k: round(sum(t[k] for t in tasks), 1)  # noqa: E731
        print(json.dumps({
            "cores": cores,
            "rep": rep,
            "wall": round(wall, 2),
            "cells": out[0][0],
            "n_tasks": len(tasks),
            "n_workers": len({t["pid"] for t in tasks}),
            "py_wall": tot("wall"),
            "py_cpu": tot("cpu"),
            "fetch": tot("fetch"),
            "decode": tot("decode"),
            "emit": tot("emit"),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
