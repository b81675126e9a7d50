"""Approximate-nearest-neighbor search over an embedding column.

* brute-force cosine top-k — the exact baseline: broadcast the (small) query
  set against the corpus; one narrow pass + per-query top-k via window.
* LSH-bucketed variant (random hyperplane signs) — the scale path: corpus and
  queries hash to sign-pattern buckets; only same-bucket candidates are
  scored. Probes > 1 multiply recall by scoring neighboring buckets.

All arithmetic in doubles with explicit rounding so the DuckDB oracle matches
bit-for-bit at the rounded precision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from micro_lab_ocr_spark.functions import text as T


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _cosine_np(pairs: DataFrame) -> DataFrame:
    """Score (query_id, corpus_id, qvec, cvec) pairs with a vectorized numpy
    kernel (mapInPandas): row-wise einsum dot products in float64, rounded to
    4 dp — Catalyst higher-order-function dots are ~10× slower per pair.
    """
    from collections.abc import Iterator

    import pandas as pd

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            if len(pdf) == 0:
                continue
            q = np.stack(pdf["qvec"].to_numpy()).astype(np.float64)
            c = np.stack(pdf["cvec"].to_numpy()).astype(np.float64)
            dots = np.einsum("ij,ij->i", q, c)
            cos = dots / (np.sqrt(np.einsum("ij,ij->i", q, q))
                          * np.sqrt(np.einsum("ij,ij->i", c, c)))
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "corpus_id": pdf["corpus_id"],
                    "cosine": np.round(cos, 4),
                }
            )

    return pairs.mapInPandas(score, "query_id long, corpus_id long, cosine double")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k. queries is expected to be small → broadcast; the
    scan over the corpus stays partition-parallel with no shuffle until the
    final per-query top-k (tiny)."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    )
    pairs = c.join(F.broadcast(q), F.col("query_id") != F.col("corpus_id")).select(
        "query_id", "corpus_id", "qvec", "cvec"
    )
    scored = _cosine_np(pairs)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def hyperplane_signature(vec, planes: list[list[float]]):
    """Sign pattern of the vector against fixed hyperplanes → bucket string."""
    bits = []
    for p in planes:
        dot = None
        for i, w in enumerate(p):
            term = F.element_at(vec, i + 1).cast("double") * F.lit(w)
            dot = term if dot is None else dot + term
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def deterministic_planes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Fixed pseudo-random hyperplanes (seeded, reproducible across engines)."""
    import random

    rng = random.Random(seed)
    return [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n_planes)]


def multi_table_buckets(vec, dim: int, n_tables: int, n_planes: int):
    """(table, bucket) pairs for multi-table sign LSH → array<struct>."""
    entries = []
    for t in range(n_tables):
        planes = deterministic_planes(dim, n_planes, seed=42 + t)
        entries.append(
            F.struct(
                F.lit(t).alias("table"),
                hyperplane_signature(vec, planes).alias("bucket"),
            )
        )
    return F.array(*entries)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table LSH cosine top-k: a pair is a candidate when its sign
    pattern matches in ANY of ``n_tables`` hash tables (the classical
    recall-boosting construction). At 100 TB this avoids the full cross
    product — fan-in per query ≈ n_tables · corpus / 2^n_planes."""
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        _as_double(F.col(vec_col)).alias("cvec"),
    ).select(
        "corpus_id", "cvec",
        F.explode(multi_table_buckets(F.col("cvec"), dim, n_tables, n_planes)).alias("tb"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qvec"),
    ).select(
        "query_id", "qvec",
        F.explode(multi_table_buckets(F.col("qvec"), dim, n_tables, n_planes)).alias("tb"),
    )
    # dedup candidates as bare id pairs FIRST (don't shuffle vectors through
    # the distinct), then re-attach vectors and score with the numpy kernel
    candidates = (
        c.select("corpus_id", "tb")
        .join(F.broadcast(q.select("query_id", "tb")), "tb")
        .where(F.col("query_id") != F.col("corpus_id"))
        .select("query_id", "corpus_id")
        .dropDuplicates(["query_id", "corpus_id"])
    )
    corpus_vecs = corpus.select(
        F.col(id_col).alias("corpus_id"), _as_double(F.col(vec_col)).alias("cvec")
    )
    query_vecs = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qvec")
    )
    pairs = candidates.join(corpus_vecs, "corpus_id").join(F.broadcast(query_vecs), "query_id")
    scored = _cosine_np(pairs.select("query_id", "corpus_id", "qvec", "cvec"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("corpus_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)
