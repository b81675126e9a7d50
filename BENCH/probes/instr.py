import os, sys, time, tempfile, shutil, json, glob
sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
cores = int(sys.argv[1])
from micro_lab_ocr_spark.session import get_spark
from micro_lab_ocr_spark.pipeline.checkpoint import CheckpointedExtraction
from micro_lab_ocr_spark.sources import catalog

spark = get_spark("instr", parallelism=cores, extra_conf={
    "spark.eventLog.enabled": "true",
    "spark.eventLog.dir": f"file:///tmp/evlog{cores}",
    "spark.eventLog.compress": "false",
})
spark.sparkContext.setLogLevel("ERROR")
docs = catalog.read_docs(spark, ".bench_corpus/docs_bucketed", keep_bucket=True)
media = spark.read.parquet(".bench_corpus/media_cp")
def one_pass():
    work = tempfile.mkdtemp(prefix="instr_")
    ck = CheckpointedExtraction(os.path.join(work,"ckpt"), os.path.join(work,"out"),
        n_buckets=8, media_copartitioned=True, bucket_batch_size=8)
    t0 = time.perf_counter(); ck.run(spark, docs, media); t = time.perf_counter()-t0
    shutil.rmtree(work, ignore_errors=True)
    return t
print("warmup:", round(one_pass(),1), flush=True)
t0=time.time()
print("timed:", round(one_pass(),1), flush=True)
print("WINDOW", t0, time.time(), flush=True)
spark.stop()
