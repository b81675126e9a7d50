"""micro_lab_ocr_spark — a PySpark-native main-content extraction engine.

A from-scratch re-creation of the query/data-processing capabilities of the
reference application ``hwanJP/micro-lab-ocr`` (a single-process Python
document-extraction app), re-expressed Spark-first:

* the reference's scalar cleaning banks (SURVEY.md §2.7, F1–F21) live as
  Catalyst ``Column`` expressions in :mod:`micro_lab_ocr_spark.functions`
  (whole-stage-codegen'd, zero Python in the hot path);
* order-dependent extraction state (fill-down, fallback FIFO, date carry —
  SURVEY.md §2.5 W1–W8) is declarative window algebra in
  :mod:`micro_lab_ocr_spark.operators`;
* media/DOM kernels (HTML boilerplate strip, table parse, OCR decode, PDF
  XY-cut layout) are vectorized pandas/Arrow UDFs in
  :mod:`micro_lab_ocr_spark.kernels` — never per-row Python UDFs;
* the end-to-end interleaved-document pipeline (spans → records → normalized
  spans) with partition checkpoint/lineage is in
  :mod:`micro_lab_ocr_spark.pipeline`;
* a pure-Python oracle restating the reference math (the executable spec used
  by pytest) is in :mod:`micro_lab_ocr_spark.oracle`.
"""

__version__ = "0.1.0"
