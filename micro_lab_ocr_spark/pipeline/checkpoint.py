"""Partition-granular checkpoint / lineage / resume (SURVEY §4.2, north rule).

The reference saves its workbook after every page (`backend.py:998-1003`) so
an interrupted run resumes where it stopped. The engine's scale analogue:

* the doc keyspace is split into ``n_buckets`` deterministic partitions
  (``pmod(hash(doc_id), n)`` — the same bucketing an Iceberg
  ``bucket(n, doc_id)`` table gives for free);
* each bucket is processed and written independently and IDEMPOTENTLY
  (output path keyed by bucket id, overwrite mode);
* a checkpoint table records, per bucket: status, input snapshot id, row
  counts and extraction metrics (lineage);
* a resumed run reads the checkpoint table and skips buckets already DONE.

No custom Catalyst machinery — ordinary application code around idempotent
writes, exactly what a production lakehouse job does. On Iceberg the
checkpoint table would be MERGE'd; on plain parquet we write one small
checkpoint file per bucket (atomic enough at bucket granularity because the
data write completes before the checkpoint row appears).
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F


def _layout_bucket_count(docs: DataFrame) -> int | None:
    """Bucket count of the directory-bucketed layout a scan reads, from the
    driver-side file listing (metadata only — no job). None when the paths
    carry no ``bucket=N`` partition directories (e.g. the column was computed
    in-flight), in which case the caller must not trust the column."""
    import re

    buckets = set()
    try:
        files = docs.inputFiles()
    except Exception:
        return None
    for f in files:
        m = re.search(r"/bucket=(\d+)/", f)
        if not m:
            return None
        buckets.add(int(m.group(1)))
    return (max(buckets) + 1) if buckets else None


@dataclass
class BucketLineage:
    bucket: int
    status: str               # RUNNING | DONE
    snapshot_id: str          # input snapshot identifier
    n_docs: int
    n_spans: int
    wall_sec: float
    finished_at: str


class CheckpointedExtraction:
    def __init__(
        self,
        checkpoint_dir: str,
        output_dir: str,
        n_buckets: int = 16,
        media_join: str = "broadcast",
    ):
        self.checkpoint_dir = checkpoint_dir
        self.output_dir = output_dir
        self.n_buckets = n_buckets
        # per checkpoint bucket the span-ref projection is bounded by the
        # bucket size, so broadcast is the right default; pass "shuffle_refs"
        # for very large buckets / bucketed media tables (see
        # pipeline.extract.normalize_spans). "auto" would fire a media count
        # per bucket — counted once here instead if requested.
        self.media_join = media_join
        os.makedirs(checkpoint_dir, exist_ok=True)

    # -- checkpoint table ---------------------------------------------------

    def _ckpt_path(self, bucket: int) -> str:
        return os.path.join(self.checkpoint_dir, f"bucket_{bucket:05d}.json")

    def done_buckets(self) -> set[int]:
        done = set()
        for bucket in range(self.n_buckets):
            p = self._ckpt_path(bucket)
            if os.path.exists(p):
                with open(p) as f:
                    if json.load(f).get("status") == "DONE":
                        done.add(bucket)
        return done

    def lineage(self) -> list[dict]:
        rows = []
        for bucket in range(self.n_buckets):
            p = self._ckpt_path(bucket)
            if os.path.exists(p):
                with open(p) as f:
                    rows.append(json.load(f))
        return rows

    # -- run ------------------------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        docs: DataFrame,
        media: DataFrame,
        snapshot_id: str = "unversioned",
        fail_at_bucket: int | None = None,
    ) -> list[BucketLineage]:
        """Process all not-yet-done buckets; each bucket's write is idempotent
        (per-bucket output path, overwrite). ``fail_at_bucket`` injects a
        failure for resume tests."""
        from micro_lab_ocr_spark.pipeline.extract import normalize_spans
        from micro_lab_ocr_spark.sources.catalog import bucket_expr

        done = self.done_buckets()
        results: list[BucketLineage] = []
        # If the docs table carries the catalog layout's `bucket` partition
        # column (sources/catalog.write_docs), filtering on it gives
        # PARTITION PRUNING — each bucket's run scans only its directory
        # (Iceberg bucket(N, doc_id) metadata pruning on a real cluster).
        # The layout's bucket count may DIFFER from this checkpoint's
        # n_buckets (write_docs defaults to 64, jobs default to 16):
        # trusting `bucket == b` for b in range(n_buckets) would then
        # silently drop every doc in layout buckets >= n_buckets while
        # recording DONE checkpoints. Detect the layout width from the scan's
        # file listing; when it is a multiple of n_buckets, pmod folds each
        # layout bucket onto exactly one checkpoint bucket (h mod KN mod N =
        # h mod N) and the filter STAYS a partition-prunable expression of
        # the partition column; otherwise fall back to re-hashing doc_id
        # (full scan per bucket, but correct).
        pruned = "bucket" in docs.columns
        layout_n = _layout_bucket_count(docs) if pruned else None
        if pruned and layout_n == self.n_buckets:
            bucket_col = F.col("bucket")
        elif pruned and layout_n is not None and layout_n % self.n_buckets == 0:
            bucket_col = F.pmod(F.col("bucket"), F.lit(self.n_buckets))
        else:
            pruned = False
            bucket_col = bucket_expr("doc_id", self.n_buckets)
        if "bucket" in docs.columns and not pruned:
            docs = docs.drop("bucket")
        # probe the media side ONCE — normalize_spans would otherwise fire a
        # driver-side isEmpty() action per bucket (16+ eager scans per job);
        # under media_join="auto" the same single pass supplies the count.
        media_join, media_count = self.media_join, None
        if media_join == "auto":
            media_count = 0 if media is None else media.count()
            media_present = media_count > 0
        else:
            media_present = media is not None and not media.isEmpty()
        for bucket in range(self.n_buckets):
            if bucket in done:
                continue
            if fail_at_bucket is not None and bucket == fail_at_bucket:
                raise RuntimeError(f"injected failure at bucket {bucket}")
            t0 = time.perf_counter()
            bucket_docs = docs.where(bucket_col == bucket)
            if pruned:
                bucket_docs = bucket_docs.drop("bucket")
            out = normalize_spans(
                bucket_docs, media, media_present=media_present,
                media_join=media_join, media_count=media_count,
            )
            path = os.path.join(self.output_dir, f"bucket={bucket}")
            out.write.mode("overwrite").parquet(path)
            written = spark.read.parquet(path)
            n_docs = written.count()
            n_spans = written.select(F.sum(F.size("spans"))).collect()[0][0] or 0
            row = BucketLineage(
                bucket=bucket,
                status="DONE",
                snapshot_id=snapshot_id,
                n_docs=n_docs,
                n_spans=int(n_spans),
                wall_sec=round(time.perf_counter() - t0, 3),
                finished_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            )
            with open(self._ckpt_path(bucket), "w") as f:
                json.dump(asdict(row), f)
            results.append(row)
        return results

    # -- S11: keyed corrections upsert ---------------------------------------

    def apply_corrections(
        self,
        spark: SparkSession,
        corrected_docs: DataFrame,
        media: DataFrame,
        snapshot_id: str = "corrections",
    ) -> list[BucketLineage]:
        """Re-extract CHANGED documents and replace them in place, keyed on
        doc_id — the scale analogue of the reference's same-test# sheet
        replacement (`backend_preservation.py:1953-1956`: an existing sheet
        for the test number is deleted and rewritten, not duplicated).

        Only the buckets containing corrected docs are touched (everything
        else keeps its bytes and its checkpoint row). Within a touched
        bucket: prior output rows for corrected doc_ids are dropped, the
        corrected docs re-extract, the bucket rewrites via a
        write-rename-swap (crash mid-swap leaves either the old or the new
        complete bucket, never a mix), and the lineage row records the
        corrected counts. Re-applying the same corrections is idempotent.
        On Iceberg this whole method is one ``MERGE INTO … WHEN MATCHED
        THEN UPDATE`` keyed on doc_id.
        """
        import shutil

        from micro_lab_ocr_spark.pipeline.extract import normalize_spans
        from micro_lab_ocr_spark.sources.catalog import bucket_expr

        keyed = corrected_docs.withColumn(
            "_bucket", bucket_expr("doc_id", self.n_buckets)
        )
        affected = sorted(
            r["_bucket"] for r in keyed.select("_bucket").distinct().collect()
        )
        media_present = media is not None and not media.isEmpty()
        results: list[BucketLineage] = []
        for bucket in affected:
            t0 = time.perf_counter()
            path = os.path.join(self.output_dir, f"bucket={bucket}")
            bucket_corrected = keyed.where(F.col("_bucket") == bucket).drop("_bucket")
            new_rows = normalize_spans(
                bucket_corrected, media,
                media_present=media_present, media_join=self.media_join,
            )
            if os.path.exists(path):
                old = spark.read.parquet(path)
                kept = old.join(
                    F.broadcast(bucket_corrected.select("doc_id")), "doc_id", "left_anti"
                )
                merged = kept.unionByName(new_rows)
            else:
                merged = new_rows
            tmp = path + ".tmp"
            merged.write.mode("overwrite").parquet(tmp)
            bak = path + ".old"
            if os.path.exists(bak):
                shutil.rmtree(bak)
            if os.path.exists(path):
                os.rename(path, bak)
            os.rename(tmp, path)
            if os.path.exists(bak):
                shutil.rmtree(bak)
            written = spark.read.parquet(path)
            n_docs = written.count()
            n_spans = written.select(F.sum(F.size("spans"))).collect()[0][0] or 0
            row = BucketLineage(
                bucket=bucket,
                status="DONE",
                snapshot_id=snapshot_id,
                n_docs=n_docs,
                n_spans=int(n_spans),
                wall_sec=round(time.perf_counter() - t0, 3),
                finished_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            )
            with open(self._ckpt_path(bucket), "w") as f:
                json.dump(asdict(row), f)
            results.append(row)
        return results
