"""Catalyst Column-expression library: the reference's scalar banks (F1–F21)
plus training-data text/similarity functions — all JVM-side, whole-stage
codegen'd, zero Python UDFs."""

from micro_lab_ocr_spark.functions import cleaners, text  # noqa: F401
