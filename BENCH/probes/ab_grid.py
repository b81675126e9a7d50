"""Paired A/B: old two-branch grid consumption vs fused extract_pages.

Materializes the OCR-kernel grids output once, then interleaves timed
consumptions of both shapes in one local[16] session. Host noise hits both
variants equally; report min + all walls.
"""
import importlib.util
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from micro_lab_ocr_spark.session import get_spark
from micro_lab_ocr_spark import spanspec
from micro_lab_ocr_spark.operators import grid_extract as gnew

spec = importlib.util.spec_from_file_location("grid_old", "/tmp/grid_old.py")
gold = importlib.util.module_from_spec(spec)
sys.modules["grid_old"] = gold
spec.loader.exec_module(gold)

GRIDS = "/tmp/ab_grids_parquet"

spark = get_spark("ab-grid", parallelism=16)
spark.sparkContext.setLogLevel("ERROR")

if not os.path.exists(GRIDS):
    from micro_lab_ocr_spark.sources import catalog
    from micro_lab_ocr_spark.pipeline import extract as px
    from micro_lab_ocr_spark.operators import drm

    docs = catalog.read_docs(spark, "/root/repo/.bench_corpus/docs_bucketed", keep_bucket=True)
    media = spark.read.parquet("/root/repo/.bench_corpus/media_cp")
    spans = docs.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", F.col("s.kind").alias("kind"), F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"), F.col("s.offset").alias("offset"))
    image_spans = spans.where(F.col("kind") == "image").select(
        "doc_id", "offset", "media_ref", "text")
    m = media.where(F.col("content").isNotNull())
    grids = (
        m.where(drm.is_decodable_image(F.col("content")))
        .join(F.broadcast(image_spans), "media_ref")
        .select("doc_id", "offset", "media_ref",
                F.col("text").alias("span_text"), "content")
        .mapInPandas(
            px._ocr_grids,
            "doc_id string, offset int, media_ref string, span_text string, "
            "ok boolean, cells array<struct<row:int,col:int,text:string>>",
        )
    )
    grids.write.mode("overwrite").parquet(GRIDS)

grids_df = spark.read.parquet(GRIDS)
print("grids rows:", grids_df.count(), flush=True)


def consume_old():
    records, pages = gold.extract(grids_df)
    collected = F.collect_list(
        F.struct(
            "r.group_id", "r.strain_rank", "r.row",
            F.concat_ws("|", *[F.col(f"r.{f}") for f in spanspec.RECORD_FIELDS]).alias("line"),
        )
    )
    page_text = (
        records.alias("r").groupBy("doc_id", "offset")
        .agg(F.array_join(
            F.transform(F.array_sort(collected), lambda s: s.getField("line")), "\n"
        ).alias("lines"))
    )
    out = pages.join(page_text, ["doc_id", "offset"], "left").select(
        "doc_id", "offset",
        F.when(F.col("ok"), F.lit("table")).otherwise(F.lit("image")).alias("kind"),
        F.when(F.col("ok"), F.concat(F.lit("x"), F.coalesce("lines", F.lit(""))))
        .otherwise(F.col("span_text")).alias("text"),
        "media_ref",
    )
    out.write.format("noop").mode("overwrite").save()


def consume_new():
    page_out = gnew.extract_pages(grids_df)
    out = page_out.select(
        "doc_id", "offset",
        F.when(F.col("ok"), F.lit("table")).otherwise(F.lit("image")).alias("kind"),
        F.when(F.col("ok"), F.concat(F.lit("x"), F.coalesce("lines", F.lit(""))))
        .otherwise(F.col("span_text")).alias("text"),
        "media_ref",
    )
    out.write.format("noop").mode("overwrite").save()


variants = {"old": consume_old, "new": consume_new}
walls = {k: [] for k in variants}
for k, fn in variants.items():  # warmup
    fn()
reps = int(os.environ.get("AB_REPS", "5"))
for i in range(reps):
    for k, fn in variants.items():
        t0 = time.perf_counter()
        fn()
        walls[k].append(round(time.perf_counter() - t0, 2))
for k in variants:
    print(k, "min", min(walls[k]), walls[k], flush=True)
spark.stop()
