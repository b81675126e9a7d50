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
    """Bucket count of the directory-bucketed layout a scan reads. The
    AUTHORITATIVE source is the ``_bucket_layout.json`` marker recorded at
    write time (catalog.write_layout_marker — the parquet analogue of an
    Iceberg partition spec): inferring the width from observed ``bucket=N``
    directories under-reports when trailing buckets are empty, and a
    wrong-but-divisible inferred width would silently route docs to wrong
    output buckets. The file-listing inference remains only as a fallback
    for pre-marker layouts, None when the paths carry no ``bucket=N``
    partition directories (e.g. the column was computed in-flight), in
    which case the caller must not trust the column."""
    import re

    from micro_lab_ocr_spark.sources.catalog import read_layout_marker

    buckets = set()
    try:
        files = docs.inputFiles()
    except Exception:
        return None
    roots = set()
    for f in files:
        m = re.search(r"/bucket=(\d+)/", f)
        if not m:
            return None
        buckets.add(int(m.group(1)))
        roots.add(re.sub(r"^file:/*", "/", f[: m.start()]))
    if len(roots) == 1:
        marked = read_layout_marker(next(iter(roots)))
        if marked is not None:
            return marked
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
        media_copartitioned: bool = False,
        max_concurrent_buckets: int = 4,
        bucket_batch_size: int = 1,
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
        # Set ONLY when the media table was written co-partitioned with the
        # docs layout (catalog.write_media_copartitioned: media rows bucketed
        # by their OWNING doc_id). Each bucket run then prunes the media scan
        # to its own partition directory instead of re-reading the whole
        # media table once per bucket (N× media IO). Never set it for media
        # bucketed on any other key — pruning on a non-owner bucketing would
        # silently degrade matched spans to pass-throughs.
        self.media_copartitioned = media_copartitioned
        # >1 pipelines bucket jobs from a driver thread pool so per-bucket
        # plan compile overlaps executor compute (see run()); 1 = strictly
        # sequential (deterministic bucket order, simplest failure story)
        self.max_concurrent_buckets = max_concurrent_buckets
        # >1 processes buckets in batches of this size: ONE plan + ONE
        # dynamic-partition-overwrite write per batch (amortizes the
        # per-bucket plan-compile fixed cost; see run_batch) at the price of
        # batch-granular crash re-work instead of bucket-granular
        self.bucket_batch_size = bucket_batch_size
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
        # media-side pruning: only under the co-partitioned layout (see
        # __init__), with the same divisible-fold rule as the docs side
        media_bucket_col = None
        if (
            self.media_copartitioned
            and media is not None
            and "bucket" in media.columns
        ):
            m_layout = _layout_bucket_count(media)
            if m_layout == self.n_buckets:
                media_bucket_col = F.col("bucket")
            elif m_layout is not None and m_layout % self.n_buckets == 0:
                media_bucket_col = F.pmod(F.col("bucket"), F.lit(self.n_buckets))
        if media is not None and "bucket" in media.columns and media_bucket_col is None:
            media = media.drop("bucket")
        # probe the media side ONCE — normalize_spans would otherwise fire a
        # driver-side isEmpty() action per bucket (16+ eager scans per job);
        # under media_join="auto" the same single pass supplies the count.
        media_join, media_count = self.media_join, None
        if media_join == "auto":
            media_count = 0 if media is None else media.count()
            media_present = media_count > 0
        else:
            media_present = media is not None and not media.isEmpty()
        def run_bucket(bucket: int) -> BucketLineage:
            t0 = time.perf_counter()
            bucket_docs = docs.where(bucket_col == bucket)
            if pruned:
                bucket_docs = bucket_docs.drop("bucket")
            bucket_media = media
            if media_bucket_col is not None:
                bucket_media = media.where(media_bucket_col == bucket).drop("bucket")
            out = normalize_spans(
                bucket_docs, bucket_media, media_present=media_present,
                media_join=media_join, media_count=media_count,
            )
            # lineage metrics ride the WRITE itself (Observation), exactly
            # like the batched path — the previous shape re-read the bucket
            # it had just written, one extra full decompress pass per bucket
            # on the batch_size=1 path
            from pyspark.sql import Observation

            obs = Observation(f"bucket_stats_single_{bucket}_{snapshot_id}")
            out = out.observe(
                obs,
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.size("spans")).alias("n_spans"),
            )
            path = os.path.join(self.output_dir, f"bucket={bucket}")
            out.write.mode("overwrite").parquet(path)
            stats = obs.get
            row = BucketLineage(
                bucket=bucket,
                status="DONE",
                snapshot_id=snapshot_id,
                n_docs=int(stats["n_docs"] or 0),
                n_spans=int(stats["n_spans"] or 0),
                wall_sec=round(time.perf_counter() - t0, 3),
                finished_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            )
            # the checkpoint row lands only AFTER the data write completed —
            # unchanged under concurrency, so resume semantics hold
            with open(self._ckpt_path(bucket), "w") as f:
                json.dump(asdict(row), f)
            return row

        def run_batch(batch: list[int]) -> list[BucketLineage]:
            """ONE Spark plan + ONE dynamic-partition-overwrite write for a
            whole batch of buckets. Per-bucket plan compile is driver work
            (seconds for this DAG, serialized on the Python side) — at B
            buckets a bucket-at-a-time loop pays it B times per run, a fixed
            cost that throttles every parallelism level equally. Batching
            amortizes it to once; dynamic overwrite keeps per-bucket output
            dirs + idempotency, and per-bucket lineage rows come from one
            grouped aggregate over the written partitions. Trade-off vs
            bucket-at-a-time: a crash mid-batch leaves NO checkpoint rows
            for the batch (resume redoes the whole batch, not just the
            unfinished bucket) — batch_size bounds that re-work."""
            t0 = time.perf_counter()
            batch_docs = docs.where(bucket_col.isin([int(b) for b in batch]))
            if pruned:
                batch_docs = batch_docs.drop("bucket")
            batch_media = media
            if media_bucket_col is not None:
                batch_media = media.where(
                    media_bucket_col.isin([int(b) for b in batch])
                ).drop("bucket")
            out = normalize_spans(
                batch_docs, batch_media, media_present=media_present,
                media_join=media_join, media_count=media_count,
            ).withColumn("bucket", bucket_expr("doc_id", self.n_buckets))
            # per-bucket lineage metrics ride the WRITE itself (Observation /
            # CollectMetrics) — re-reading the written output for stats would
            # cost a second full decompress pass over every output byte
            from pyspark.sql import Observation

            obs = Observation(f"bucket_stats_{batch[0]}")
            aggs = []
            for b in batch:
                is_b = F.col("bucket") == int(b)
                aggs.append(F.sum(is_b.cast("long")).alias(f"docs_{b}"))
                aggs.append(
                    F.sum(F.when(is_b, F.size("spans")).otherwise(0)).alias(f"spans_{b}")
                )
            out = out.observe(obs, aggs[0], *aggs[1:])
            (
                out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("bucket")
                .parquet(self.output_dir)
            )
            wall = round(time.perf_counter() - t0, 3)
            m = obs.get
            # dynamic overwrite only replaces partitions that RECEIVE rows: a
            # batch bucket producing zero output would leave a previous run's
            # stale bucket=N files on disk while its checkpoint row records
            # DONE with n_docs=0 (run_bucket's per-dir overwrite clears even
            # empty buckets — keep the two modes equivalent)
            import shutil as _shutil

            for b in batch:
                if int(m.get(f"docs_{b}") or 0) == 0:
                    stale = os.path.join(self.output_dir, f"bucket={b}")
                    if os.path.exists(stale):
                        _shutil.rmtree(stale)
            rows = []
            for b in batch:
                row = BucketLineage(
                    bucket=b,
                    status="DONE",
                    snapshot_id=snapshot_id,
                    n_docs=int(m.get(f"docs_{b}") or 0),
                    n_spans=int(m.get(f"spans_{b}") or 0),
                    wall_sec=wall,  # shared batch wall (documented)
                    finished_at=time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
                )
                with open(self._ckpt_path(b), "w") as f:
                    json.dump(asdict(row), f)
                rows.append(row)
            return rows

        todo = []
        for bucket in range(self.n_buckets):
            if bucket in done:
                continue
            if fail_at_bucket is not None and bucket == fail_at_bucket:
                # run everything scheduled before the injected failure, then
                # die — mirrors a mid-job crash for resume tests
                for b in todo:
                    results.append(run_bucket(b))
                raise RuntimeError(f"injected failure at bucket {bucket}")
            todo.append(bucket)

        if self.bucket_batch_size > 1:
            for i in range(0, len(todo), self.bucket_batch_size):
                results.extend(run_batch(todo[i : i + self.bucket_batch_size]))
            return results
        if self.max_concurrent_buckets <= 1:
            for b in todo:
                results.append(run_bucket(b))
            return results
        # Pipelined submission: Catalyst analysis/codegen of a bucket's plan
        # is DRIVER work (~seconds for the grid DAG) that a sequential loop
        # serializes with executor compute — at N buckets that fixed cost
        # dominates small-bucket runs and burdens every parallelism level
        # equally. Submitting buckets from a small thread pool overlaps the
        # next plan's compile with the current bucket's execution (the JVM
        # releases the GIL during py4j calls; Spark's scheduler interleaves
        # the jobs). Each bucket's write+checkpoint stays atomic per bucket,
        # so failure/resume semantics are unchanged — some buckets may finish
        # after another fails, which a resume simply skips.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=self.max_concurrent_buckets) as pool:
            futures = [pool.submit(run_bucket, b) for b in todo]
            errs = []
            for fut in futures:
                try:
                    results.append(fut.result())
                except Exception as exc:  # surface after draining the pool
                    errs.append(exc)
            if errs:
                raise errs[0]
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
            bak = path + ".old"
            # recover an interrupted swap BEFORE reading: a crash between
            # rename(path→bak) and rename(tmp→path) leaves path absent with
            # the complete old bucket stranded in .old — merging against a
            # missing path would then permanently drop every non-corrected
            # doc in the bucket. Restoring .old first makes the swap's
            # "old or new complete bucket, never a mix" contract hold across
            # crashes at ANY point (tmp/.old remnants are re-derivable).
            if not os.path.exists(path) and os.path.exists(bak):
                os.rename(bak, path)
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
