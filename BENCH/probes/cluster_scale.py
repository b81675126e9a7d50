"""Driver script for the TRUE multi-executor scaling sample (north rule:
"two cluster sizes, N and 4N executors, via spark-submit --py-files").

Submitted by cluster_run.py against a local Spark STANDALONE cluster —
separate master/worker/executor JVMs, localhost-TCP shuffle, per-executor
memory pools, each worker taskset-pinned to its own physical-core block —
i.e. the closest a single box gets to a real executor cluster. Runs the
same PRODUCTION job as bench.py's local[N] protocol (checkpointed
per-bucket extraction over the bucketed docs + co-partitioned media) and
prints one JSON line: warmup + two timed passes, min wall.

Never run directly; see BENCH/probes/cluster_run.py.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)


def main() -> None:
    n_executors = int(sys.argv[1])
    corpus = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, ".bench_corpus")

    from pyspark.sql import SparkSession

    from micro_lab_ocr_spark.pipeline.checkpoint import CheckpointedExtraction
    from micro_lab_ocr_spark.sources import catalog

    spark = SparkSession.builder.appName(f"cluster-scale-{n_executors}x").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    buckets = int(os.environ.get("SPARK_GRAFT_SCALING_BUCKETS", "8"))

    docs = catalog.read_docs(spark, f"{corpus}/docs_bucketed", keep_bucket=True)
    media = spark.read.parquet(f"{corpus}/media_cp")
    n_docs = docs.count()
    # sanity: the cluster must actually have granted the executors we claim —
    # measuring on fewer would silently corrupt the published scaling sample,
    # so an under-provisioned level ABORTS instead of recording a wall
    execs = set()
    for _ in range(60):
        execs = {
            e.host() + ":" + str(e.port())
            for e in spark.sparkContext._jsc.sc().statusTracker().getExecutorInfos()
        }
        if len(execs) - 1 >= n_executors:  # -1: the driver row
            break
        time.sleep(1)
    else:
        spark.stop()
        raise RuntimeError(
            f"requested {n_executors} executors but only {len(execs) - 1} "
            "registered within 60 s — refusing to record a scaling sample "
            "on an under-provisioned cluster")

    def one_pass() -> float:
        work = tempfile.mkdtemp(prefix=f"cluster_{n_executors}_")
        try:
            ck = CheckpointedExtraction(
                os.path.join(work, "ckpt"), os.path.join(work, "out"),
                n_buckets=buckets, media_copartitioned=True,
                bucket_batch_size=buckets,
            )
            t0 = time.perf_counter()
            ck.run(spark, docs, media)
            return round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(work, ignore_errors=True)

    one_pass()  # warmup: codegen, python workers, broadcast paths
    walls = [one_pass(), one_pass()]
    print("CLUSTER_SCALE_RESULT " + json.dumps({
        "executors_requested": n_executors,
        "executors_seen": max(0, len(execs) - 1),
        "docs": n_docs,
        "walls": walls,
        "wall": min(walls),
        "docs_per_sec": round(n_docs / min(walls), 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
