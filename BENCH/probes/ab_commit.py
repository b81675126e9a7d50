"""One session of the production checkpointed job with the ENGINE imported
from an arbitrary repo root (a git worktree pinned to another commit), so two
commits can be paired-A/B'd on the same corpus and the same host weather.

Usage: python BENCH/probes/ab_commit.py <repo_root> <cores> [timed_passes]

Prints one JSON line: {"root": ..., "cores": N, "walls": [...], "stages":
[...top-5 stage groups of the best pass...]}. Orchestrate the pairing from a
shell loop that alternates roots round-by-round (same estimator as
ab_conf.py: interleaved sessions, min wall per variant, stage core-seconds
as the stable verdict signal).
"""
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.abspath(sys.argv[1])
CORES = int(sys.argv[2])
PASSES = int(sys.argv[3]) if len(sys.argv) > 3 else 1

sys.path.insert(0, ROOT)
os.chdir("/root/repo")  # the shared bench corpus lives here

from micro_lab_ocr_spark.pipeline.checkpoint import CheckpointedExtraction  # noqa: E402
from micro_lab_ocr_spark.session import get_spark  # noqa: E402
from micro_lab_ocr_spark.sources import catalog  # noqa: E402

ev_dir = tempfile.mkdtemp(prefix=f"abc_ev_{CORES}_")
spark = get_spark(
    f"ab-commit-{os.path.basename(ROOT)}",
    parallelism=CORES,
    extra_conf={
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{ev_dir}",
        "spark.eventLog.compress": "false",
        "spark.eventLog.rolling.enabled": "false",
    },
)
spark.sparkContext.setLogLevel("ERROR")
docs = catalog.read_docs(spark, ".bench_corpus/docs_bucketed", keep_bucket=True)
media = spark.read.parquet(".bench_corpus/media_cp")


def one_pass():
    work = tempfile.mkdtemp(prefix="abc_")
    try:
        ck = CheckpointedExtraction(
            os.path.join(work, "ckpt"), os.path.join(work, "out"),
            n_buckets=8, media_copartitioned=True, bucket_batch_size=8,
        )
        w0 = int(time.time() * 1000)
        t0 = time.perf_counter()
        ck.run(spark, docs, media)
        return round(time.perf_counter() - t0, 2), (w0, int(time.time() * 1000))
    finally:
        shutil.rmtree(work, ignore_errors=True)


one_pass()  # warmup
walls, best = [], None
for _ in range(PASSES):
    w, win = one_pass()
    walls.append(w)
    if best is None or w < best[0]:
        best = (w, win)
spark.stop()

# stage decomposition comes from the CURRENT repo's parser (works on any
# event log), not the pinned worktree's
sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

stages = bench._parse_event_log(ev_dir, best[1])
shutil.rmtree(ev_dir, ignore_errors=True)
print(json.dumps({
    "root": ROOT, "cores": CORES, "walls": walls,
    "weather": bench._weather_probe(),
    "stages": [
        {k: round(v, 1) if isinstance(v, float) else v for k, v in s.items()}
        for s in stages[:5]
    ],
}), flush=True)
