"""J1 — enrichment broadcast join (`backend_preservation.py:1708-1728`).

The reference does a per-record dict lookup against the progress master
(~hundreds of rows); the Spark form is a broadcast hash join with
empty-string fill for misses (`:1720-1726`)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ENRICH_FIELDS = ["product_name", "formulation", "preservative_info"]


def enrich_records(records: DataFrame, progress: DataFrame) -> DataFrame:
    """Left broadcast join on prescription_number; unmatched → '' (not null),
    mirroring the reference exactly."""
    dim = progress.select(
        "prescription_number",
        *[F.col(f).alias(f"_enr_{f}") for f in ENRICH_FIELDS],
    ).dropDuplicates(["prescription_number"])
    out = records.join(F.broadcast(dim), "prescription_number", "left")
    for f in ENRICH_FIELDS:
        out = out.withColumn(f, F.coalesce(F.col(f"_enr_{f}"), F.lit(""))).drop(f"_enr_{f}")
    return out
