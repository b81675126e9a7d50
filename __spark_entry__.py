"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship interleaved-extraction pipeline over the
sf0.001 documents table; ``queries()``/``oracle_sql()`` expose one entry per
implemented SURVEY §2 operator family (see micro_lab_ocr_spark/queries.py —
each oracle SQL is an exact DuckDB mirror, the cleaner banks generated from
the same constants as the Catalyst expressions).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from micro_lab_ocr_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved spans (text + boilerplate html + preservation
    table_html per doc) → normalized spans, on sf0.001."""
    return Q.flagship_entry(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return Q.queries_dict()


def oracle_sql() -> dict[str, str]:
    return Q.oracle_sql_dict()
