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


def _signatures_np(df: DataFrame, id_out: str, dim: int, n_tables: int, n_planes: int,
                   id_col: str, vec_col: str) -> DataFrame:
    """(id, table, bucket) rows via one numpy matmul over all tables' planes
    — the Catalyst expression form (n_tables·n_planes·dim terms) blows past
    Janino's 64 KB method limit and falls back to slow interpreted eval."""
    from collections.abc import Iterator

    import pandas as pd

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        planes = np.array(
            [p for t in range(n_tables) for p in deterministic_planes(dim, n_planes, seed=42 + t)],
            dtype=np.float64,
        ).T  # dim × (n_tables·n_planes)
        for pdf in it:
            if len(pdf) == 0:
                continue
            v = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            signs = (v @ planes) >= 0  # n × (n_tables·n_planes)
            ids, tables, buckets = [], [], []
            chars = np.where(signs, "1", "0")
            for t in range(n_tables):
                block = chars[:, t * n_planes:(t + 1) * n_planes]
                keys = ["".join(row) for row in block]
                ids.extend(pdf["id"].tolist())
                tables.extend([t] * len(pdf))
                buckets.extend(keys)
            yield pd.DataFrame({"id": ids, "table": tables, "bucket": buckets})

    base = df.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec"))
    out = base.mapInPandas(kernel, "id long, table int, bucket string")
    return out.select(F.col("id").alias(id_out), "table", "bucket")


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
    c = _signatures_np(corpus, "corpus_id", dim, n_tables, n_planes, id_col, vec_col)
    q = _signatures_np(queries, "query_id", dim, n_tables, n_planes, id_col, vec_col)
    # dedup candidates as bare id pairs FIRST (don't shuffle vectors through
    # the distinct), then re-attach vectors and score with the numpy kernel
    candidates = (
        c.join(F.broadcast(q), ["table", "bucket"])
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


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_blocks: int | None = None,
    max_block_rows: int = 4096,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — EXACT: every (id_a < id_b)
    with round(cosine, 4) ≥ threshold (the correctness baseline the LSH path
    is judged against, task brief §dedup).

    A self theta-join would plan as a BroadcastNestedLoopJoin pushing O(n²)
    rows through Catalyst. Instead the classic block-grid matmul: vectors
    hash into B blocks, each block packs into ONE row (map-side groupBy),
    the B×(B+1)/2 unordered block-pair KEYS (two ints each) form the only
    broadcast, and a numpy kernel scores each block pair as a single matrix
    product. Compute stays O(n²) — exactness requires it — but it's
    distributed over block pairs with bounded-size matrices and zero
    per-pair Catalyst rows.

    Scale guards: block contents flow ONLY through shuffle joins (hinted
    shuffle_hash — never broadcast, so neither the driver nor any executor
    holds the corpus). B defaults to ceil(n / max_block_rows) from a bare
    count over ids, so a packed block row is bounded (~max_block_rows·d·8
    bytes ≪ the 2 GB row / Arrow limits) no matter the corpus size; an
    explicit ``n_blocks`` below that bound raises instead of failing later
    with an opaque Arrow error. At web scale you run the LSH candidates +
    this kernel on candidates only."""
    import math
    from collections.abc import Iterator

    import pandas as pd

    idtype = emb.schema[id_col].dataType.simpleString()
    n = emb.count()
    min_blocks = max(1, math.ceil(n / max_block_rows))
    if n_blocks is None:
        n_blocks = min_blocks
    elif n_blocks < min_blocks:
        raise ValueError(
            f"n_blocks={n_blocks} packs ~{math.ceil(n / n_blocks)} rows/block "
            f"(> max_block_rows={max_block_rows}) — raise n_blocks to "
            f"≥ {min_blocks}, or use the LSH candidate path "
            f"(ann.lsh_topk / dedup.minhash_lsh_pairs) for corpora this size"
        )
    v = emb.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("vec")
    ).withColumn("blk", F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks)).cast("int"))
    packed = v.groupBy("blk").agg(
        F.collect_list(F.struct("id", "vec")).alias("items")
    )
    spark = emb.sparkSession
    keys = spark.createDataFrame(
        [(a, b) for a in range(n_blocks) for b in range(a, n_blocks)],
        "blk_a int, blk_b int",
    )
    grid = (
        keys.join(
            packed.select(F.col("blk").alias("blk_a"), F.col("items").alias("items_a"))
            .hint("shuffle_hash"),
            "blk_a",
        )
        .join(
            packed.select(F.col("blk").alias("blk_b"), F.col("items").alias("items_b"))
            .hint("shuffle_hash"),
            "blk_b",
        )
        # spread the B(B+1)/2 heavy pair rows over both key columns — the
        # last join leaves them clustered on blk_b alone (≤ B busy tasks)
        .repartition(F.col("blk_a"), F.col("blk_b"))
    )

    def score(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out_a, out_b, out_c = [], [], []
            for blk_a, blk_b, items_a, items_b in zip(
                pdf["blk_a"], pdf["blk_b"], pdf["items_a"], pdf["items_b"]
            ):
                same = blk_a == blk_b
                ids_a = [r["id"] for r in items_a]
                ids_b = [r["id"] for r in items_b]
                A = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in items_a])
                B = np.stack([np.asarray(r["vec"], dtype=np.float64) for r in items_b])
                An = A / np.linalg.norm(A, axis=1, keepdims=True)
                Bn = B / np.linalg.norm(B, axis=1, keepdims=True)
                S = np.round(An @ Bn.T, 4)
                for i, j in zip(*np.nonzero(S >= threshold)):
                    a, b = ids_a[i], ids_b[j]
                    if a == b:
                        continue
                    if same and not a < b:
                        continue  # symmetric matrix: keep the i<j triangle once
                    lo, hi = (a, b) if a < b else (b, a)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_c.append(S[i, j])
            if out_a:  # empty frames confuse Arrow dtype inference
                yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    return grid.mapInPandas(
        score, f"id_a {idtype}, id_b {idtype}, cosine double"
    )
