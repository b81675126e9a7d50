"""W3/W4 + J3 — the FIFO fallback queue as declarative window algebra
(SURVEY §4.3 rewrite of `backend.py:115-171,379-389`).

Semantics proved equivalent to the mutable FIFO under the reference's actual
usage (`get_fallback_data(None, None)` at `backend.py:386` — pure front-pop at
the k≥2nd E.coli row, with all surplus pairs enqueued by bulk rows that
precede their consumers — the "adds-precede-pops" regime every observed page
satisfies; the grouped-kernel path in pipeline/extract.py implements the
unrestricted sequential semantics and fixtures referee both):

1. each page row may carry ``pairs: array<struct<test,presc>>`` (the surplus
   beyond the first pair, J2) and an ``is_ecoli`` flag;
2. the page's queue = surplus pairs exploded in row order, numbered 0..;
3. the k-th E.coli row with k ≥ 2 consumes queue ordinal k-2;
4. a consumption is valid only if its pair was enqueued on an earlier row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

PAGE = ["doc_id", "page_no"]


def apply_fallback(rows: DataFrame) -> DataFrame:
    """rows(doc_id, page_no, row_idx, is_ecoli: boolean,
    pairs: array<struct<test:string, presc:string>>) →
    rows + (fallback_test, fallback_presc) for rows that pop the queue.

    Pure window/ordinal algebra: a running E.coli counter (W4), a positional
    explode of the queue (J3's posexplode side), and an ordinal equi-join.
    """
    w = Window.partitionBy(*PAGE).orderBy("row_idx")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)

    numbered = rows.withColumn(
        "ecoli_k", F.sum(F.col("is_ecoli").cast("int")).over(wc)
    ).withColumn(
        "pop_ordinal",
        F.when(F.col("is_ecoli") & (F.col("ecoli_k") >= 2), F.col("ecoli_k") - 2),
    )

    queue = (
        rows.select(*PAGE, "row_idx", F.posexplode_outer("pairs").alias("local_pos", "pair"))
        .where(F.col("pair").isNotNull())
        .withColumn(
            "queue_pos",
            F.row_number().over(Window.partitionBy(*PAGE).orderBy("row_idx", "local_pos")) - 1,
        )
        .select(
            *PAGE,
            F.col("row_idx").alias("enqueued_at"),
            "queue_pos",
            F.col("pair.test").alias("fallback_test"),
            F.col("pair.presc").alias("fallback_presc"),
        )
    )

    return (
        numbered.join(
            queue,
            [
                numbered["doc_id"] == queue["doc_id"],
                numbered["page_no"] == queue["page_no"],
                numbered["pop_ordinal"] == queue["queue_pos"],
                queue["enqueued_at"] < numbered["row_idx"],
            ],
            "left",
        )
        .select(
            numbered["doc_id"], numbered["page_no"], numbered["row_idx"],
            numbered["is_ecoli"], numbered["pairs"], numbered["ecoli_k"],
            "fallback_test", "fallback_presc",
        )
    )
