"""Driver-contract queries: one entry per SURVEY §2 operator family, each with
a Spark implementation and an equivalent DuckDB oracle SQL string.

Numeric-compare discipline (driver hashes values order-insensitively):
* money/quantity sums go through DECIMAL(18,2) so addition is exact and
  engine-order-independent, then cast back to DOUBLE for a stable dtype;
* ratios/averages are ``round(exact_sum / count, 4)``;
* cosine similarities are rounded to 4 dp; ranking uses the rounded value
  with id tie-breaks so both engines rank identically.

The cleaner-bank oracle SQL (F6/F7 chains) is GENERATED from
micro_lab_ocr_spark.banks — the same constants the Catalyst expressions use —
so the two cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from micro_lab_ocr_spark import banks
from micro_lab_ocr_spark.functions import cleaners as C
from micro_lab_ocr_spark.functions import text as T
from micro_lab_ocr_spark.operators import ann, dedup, sampling


def _scan_row_groups(path: str) -> int:
    """Total parquet row groups at ``path`` (file or directory of files).

    A parquet scan cannot parallelize below row-group granularity: Spark
    plans byte-range splits, but every row group is read whole by the split
    containing its start, so a table written as one fat row group runs its
    entire map stage on ONE core no matter how many splits the planner makes
    (``spark.sql.files.minPartitionNum`` only multiplies empty tasks).
    Metadata-only read (footer), a few ms per file; no data is touched.
    """
    import glob as _glob
    import os as _os

    import pyarrow.parquet as _pq

    files = (
        [path]
        if _os.path.isfile(path)
        else sorted(_glob.glob(_os.path.join(path, "*.parquet")))
    )
    return sum(_pq.ParquetFile(f).metadata.num_row_groups for f in files)


# "auto" spread threshold: below this compressed size the one-off exchange
# costs more than the single-task compute it parallelizes (measured at
# sf1.0: spreading 6–16 MB corpora LOST 0.1–1.3 s per query); above it a
# row-group-starved scan strands seconds of map compute on one core and
# the exchange amortizes. $SPARK_GRAFT_SPREAD_AUTO_BYTES overrides.
_SPREAD_AUTO_BYTES = 64 * 1024 * 1024


def load(
    spark: SparkSession, sf_dir: str, name: str, spread: bool | str = False
) -> DataFrame:
    """Read one input table; when its file layout cannot feed every core
    (fewer row groups than scheduler slots), spread it with one round-robin
    repartition so downstream map work uses the whole machine.

    Scale-adaptive by construction (guide §2): a production-size table has
    thousands of row groups, so the condition is false and the plan is an
    unmodified scan — the repartition only fires for small/single-row-group
    inputs. Modes, each chosen per call site from interleaved A/Bs:

    * ``spread=True`` — always spread when row-group-starved: heavy per-row
      map compute that scales (numpy kernels, allocation-light codegen —
      t_quality counting, quantize, simhash).
    * ``spread="auto"`` — spread only when the file is also ≥
      ``_SPREAD_AUTO_BYTES``: map-heavy paths where the sf1.0-size A/B
      showed the exchange losing on a small corpus but single-task compute
      must dominate once the input grows (ANN corpus passes, dedup corpus
      fingerprint/shingle kernels). Keeps today's measured-best plan at
      sf1.0 AND stays parallel if the driver escalates the scale factor.
    * ``spread=False`` (default) — shuffle-first queries (their first
      exchange already redistributes; a pre-exchange cannot parallelize the
      scan task itself), broadcast-destined dims, operators that pin their
      own exchange layout.

    ``$SPARK_GRAFT_NO_SPREAD=1`` disables all spreading (A/B knob).
    """
    import os as _os

    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if spread and not _os.environ.get("SPARK_GRAFT_NO_SPREAD"):
        if spread == "auto":
            floor = int(_os.environ.get(
                "SPARK_GRAFT_SPREAD_AUTO_BYTES", _SPREAD_AUTO_BYTES))
            if _path_bytes(path) < floor:
                return df
        slots = spark.sparkContext.defaultParallelism
        if _scan_row_groups(path) < slots:
            df = df.repartition(slots)
    return df


def _path_bytes(path: str) -> int:
    """Compressed on-disk size of a parquet file or directory (cheap stat)."""
    import glob as _glob
    import os as _os

    if _os.path.isfile(path):
        return _os.path.getsize(path)
    return sum(
        _os.path.getsize(f) for f in _glob.glob(_os.path.join(path, "*.parquet"))
    )


def _dsum(col) -> F.Column:
    """Exact (decimal) sum, surfaced as double."""
    return F.sum(col.cast("decimal(18,2)")).cast("double")


# ===========================================================================
# relational core (A/J/P families over the TPC-H-ish tables)
# ===========================================================================


def q1_pricing_summary(spark, sf_dir):
    """TPC-H Q1 flavor: scan-heavy multi-aggregate with filter pushdown."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dsum(F.col("l_quantity")).alias("sum_qty"),
            _dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("double").alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(18,2)")) / F.count("*"), 4
            ).cast("double").alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))) / COUNT(*), 4) AS DOUBLE) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(spark, sf_dir):
    """TPC-H Q3 flavor: 3-way join + agg + deterministic top-10."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_region_revenue(spark, sf_dir):
    """TPC-H Q5 flavor: 6-way star join with small-dim broadcasts."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (1 - F.col("l_discount").cast("decimal(18,2)"))
            ).cast("double").alias("revenue")
        )
    )


Q5_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
"""


def j1_enrich_broadcast(spark, sf_dir):
    """J1 — left broadcast-enrichment join with ''-fill on miss
    (`backend_preservation.py:1708-1728`): orders enriched by customer."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_mktsegment")
    out = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey, "left")
    return out.select(
        "o_orderkey",
        F.coalesce("c_name", F.lit("")).alias("customer_name"),
        F.coalesce("c_mktsegment", F.lit("")).alias("segment"),
    )


J1_SQL = """
SELECT o_orderkey,
       COALESCE(c_name, '') AS customer_name,
       COALESCE(c_mktsegment, '') AS segment
FROM orders LEFT JOIN customer ON o_custkey = c_custkey
"""


def a3_distinct_stats(spark, sf_dir):
    """A3/A5 — distinct + session stats over events."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum(F.col("value").cast("decimal(18,2)")) / F.count("*"), 4)
        .cast("double")
        .alias("avg_value"),
    )


A3_SQL = """
SELECT event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))) / COUNT(*), 4) AS DOUBLE) AS avg_value
FROM events GROUP BY event_type
"""


def r3_pivot(spark, sf_dir):
    """R3 — pivot (strain×day analogue): per-user event_type count matrix."""
    ev = load(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "error"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
        )
    )


R3_SQL = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error
FROM events GROUP BY user_id
"""


# ===========================================================================
# window family (W1/W2/W4/W6/W7 as SQL-checkable analogues over events)
# ===========================================================================


def w1_filldown(spark, sf_dir):
    """W1 — fill-down last non-null over an ordered per-user window
    (`backend.py:337-367` semantics)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return ev.select(
        "event_id",
        "user_id",
        F.coalesce(F.round(F.last(purchase_val, ignorenulls=True).over(w), 2), F.lit(-1.0)).alias(
            "last_purchase_value"
        ),
    )


W1_SQL = """
SELECT event_id, user_id,
       COALESCE(ROUND(LAST_VALUE(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
                      OVER (PARTITION BY user_id ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2), -1.0)
       AS last_purchase_value
FROM events
"""


def w4_running_count(spark, sf_dir):
    """W4 — running occurrence counter (`backend.py:168-171`)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum((F.col("event_type") == "click").cast("int")).over(w).alias("clicks_so_far"),
    )


W4_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS clicks_so_far
FROM events
"""
# NB the BIGINT cast: DuckDB's SUM over integers yields HUGEINT, which lands
# in pandas as float64 and breaks the driver's dtype-sensitive value hash
# even when every value matches Spark's int64 (round-1 CORRECTNESS red cell).


def w6_lag_blank(spark, sf_dir):
    """W6 — blank-on-equal-lag display dedup (`app.py:588-614`)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    lagged = F.lag("event_type").over(w)
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == lagged, F.lit("")).otherwise(F.col("event_type")).alias(
            "display_type"
        ),
    )


W6_SQL = """
SELECT event_id, user_id,
       CASE WHEN event_type = LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
            THEN '' ELSE event_type END AS display_type
FROM events
"""


def w7_fill_up_restore(spark, sf_dir):
    """W7 — inverse of W6: restore blanked values from the last non-empty
    (`app.py:653-669`), applied on top of the W6 output."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    blanked = F.when(F.col("event_type") == F.lag("event_type").over(w), F.lit("")).otherwise(
        F.col("event_type")
    )
    restored = F.last(F.nullif(blanked, F.lit("")), ignorenulls=True).over(wc)
    return ev.select("event_id", "user_id", restored.alias("restored_type"))


W7_SQL = """
WITH blanked AS (
  SELECT event_id, user_id,
         CASE WHEN event_type = LAG(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
              THEN '' ELSE event_type END AS display_type
  FROM events
)
SELECT event_id, user_id,
       LAST_VALUE(NULLIF(display_type, '') IGNORE NULLS)
         OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS restored_type
FROM blanked
"""


def sessionize(spark, sf_dir):
    """Sessionization: a >30-minute gap starts a new session; per-user session
    count + longest session (streaming-analytics staple; W-family window)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, 0)
    ts_s = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = ts_s - F.lag(ts_s).over(w)
    new_session = (gap.isNull() | (gap > 1800)).cast("int")
    sess = ev.withColumn("session_id", F.sum(new_session).over(wc))
    return (
        sess.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"), F.max("n").alias("longest_session"))
    )


SESSIONIZE_SQL = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN LAG(ts) OVER w IS NULL
                OR date_diff('second', LAG(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM gaps
), per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n FROM sessions GROUP BY user_id, session_id
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(n) AS longest_session
FROM per_session GROUP BY user_id
"""


# ===========================================================================
# text analysis over documents (training-data pipeline ops)
# ===========================================================================

_NORM_SQL = "trim(regexp_replace(lower({v}), '[^a-z0-9]+', ' ', 'g'))"
_TOKENS_SQL = (
    "list_filter(string_split(" + _NORM_SQL + ", ' '), x -> x != '')"
)


def t_token_stats(spark, sf_dir):
    """Token counting + length stats per doc (text-analysis op)."""
    docs = load(spark, sf_dir, "documents", spread="auto")
    toks = T.tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.length(T.normalize_text(F.col("text"))).alias("norm_len"),
    )


T_TOKENS_SQL = f"""
SELECT doc_id,
       len({_TOKENS_SQL.format(v='text')}) AS n_tokens,
       len(list_distinct({_TOKENS_SQL.format(v='text')})) AS n_distinct_tokens,
       len({_NORM_SQL.format(v='text')}) AS norm_len
FROM documents
"""


def t_quality(spark, sf_dir):
    """Quality scoring: stopword ratio + composite score per doc. Uses the
    HOF-free staged form (text.quality_staged) — pure whole-stage-codegen
    expressions, which unlike interpreted HOF subtrees actually scale with
    the spread scan (guide §4.1: prefer built-ins)."""
    docs = load(spark, sf_dir, "documents", spread=True)
    return T.quality_staged(docs, "text").select(
        "doc_id", "stopword_ratio", "quality"
    )


_SW_LIST = "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS) + "]"
_SW_RATIO_SQL = f"""
CASE WHEN len({_TOKENS_SQL.format(v='text')}) = 0 THEN 0.0
     ELSE len(list_filter({_TOKENS_SQL.format(v='text')}, x -> list_contains({_SW_LIST}, x)))
          / CAST(len({_TOKENS_SQL.format(v='text')}) AS DOUBLE) END
"""
T_QUALITY_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         len({_TOKENS_SQL.format(v='text')}) AS n_tok,
         len({_NORM_SQL.format(v='text')}) AS norm_len,
         length(regexp_replace(text, '[^!?.,;:]', '', 'g')) AS punct,
         greatest(length(text), 1) AS total,
         {_SW_RATIO_SQL} AS swr
  FROM documents
)
SELECT doc_id,
       ROUND(swr, 4) AS stopword_ratio,
       ROUND((least(n_tok / 100.0, 1.0)
              + (1.0 - least(punct * 5.0 / total, 1.0))
              + least(swr * 4, 1.0)
              + CASE WHEN norm_len / CAST(greatest(n_tok, 1) AS DOUBLE) BETWEEN 3 AND 10
                     THEN 1.0 ELSE 0.5 END) / 4, 4) AS quality
FROM base
"""


def t_langid(spark, sf_dir):
    """Heuristic language ID per doc."""
    docs = load(spark, sf_dir, "documents", spread="auto")
    return docs.select("doc_id", T.detect_language(F.col("text")).alias("lang_detected"))


T_LANGID_SQL = f"""
SELECT doc_id,
       CASE WHEN length(regexp_replace(text, '[^가-힣]', '', 'g'))
                 / CAST(greatest(length(text), 1) AS DOUBLE) > 0.2 THEN 'ko'
            WHEN {_SW_RATIO_SQL} >= 0.05 THEN 'en'
            ELSE 'unknown' END AS lang_detected
FROM documents
"""


def t_fingerprint(spark, sf_dir):
    """Document fingerprinting (md5 of normalized text)."""
    docs = load(spark, sf_dir, "documents", spread="auto")
    return docs.select("doc_id", T.doc_fingerprint(F.col("text")).alias("fingerprint"))


T_FINGERPRINT_SQL = f"""
SELECT doc_id, md5({_NORM_SQL.format(v='text')}) AS fingerprint FROM documents
"""


# ===========================================================================
# dedup family — planted near-duplicates (doc_id+1000000 = truncated copy)
# make the results non-trivial; the planting is part of the query in BOTH
# engines so inputs stay identical.
# ===========================================================================


def _with_planted_dups(spark, sf_dir, spread: bool | str = "auto"):
    docs = load(spark, sf_dir, "documents", spread=spread).select("doc_id", "text")
    planted = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(
            F.substring(F.col("text"), 1, F.floor(F.length("text") * 0.9).cast("int")),
            F.lit(" tail marker"),
        ).alias("text"),
    )
    return docs.unionByName(planted)


_PLANTED_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 1000000 AS doc_id,
       substring(text, 1, CAST(floor(length(text) * 0.9) AS INT)) || ' tail marker' AS text
FROM documents WHERE doc_id % 7 = 0
"""


def dedup_exact_q(spark, sf_dir):
    # spread="auto": at sf1.0 sizes the spread exchange only added traffic
    # (A/B: 2.6 s spread vs 1.4 s unspread with the fingerprint kernel) so
    # auto resolves to no exchange; a larger corpus crosses the auto floor
    # and parallelizes the kernel. Fingerprints are computed ONCE over the
    # planted corpus; the exact-copy branch reuses them (identical text ⇒
    # identical md5 by definition), saving a third normalize+md5 pass.
    corpus = _with_planted_dups(spark, sf_dir)
    from micro_lab_ocr_spark.kernels import texthash as TH

    fps = corpus.select("doc_id", "text").mapInPandas(
        TH.make_fingerprint_kernel("doc_id"), "doc_id long, fingerprint string"
    )
    # plant exact dups too: doc_id+2000000 = identical copy for doc_id%11==0
    exact = fps.where((F.col("doc_id") % 11 == 0) & (F.col("doc_id") < 1000000)).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "fingerprint"
    )
    return dedup.dedup_exact(
        fps.unionByName(exact), id_col="doc_id", fingerprint_col="fingerprint"
    )


DEDUP_EXACT_SQL = f"""
WITH corpus AS (
  {_PLANTED_SQL}
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, text FROM ({_PLANTED_SQL})
  WHERE doc_id % 11 = 0 AND doc_id < 1000000
)
SELECT md5({_NORM_SQL.format(v='text')}) AS fingerprint,
       COUNT(*) AS n_docs, MIN(doc_id) AS keeper_id
FROM corpus
GROUP BY 1 HAVING COUNT(*) >= 2
"""


def dedup_minhash_q(spark, sf_dir):
    corpus = _with_planted_dups(spark, sf_dir)
    return dedup.minhash_lsh_pairs(
        corpus, shingle_k=3, num_hashes=8, bands=4, jaccard_threshold=0.5
    )


def _shingles3_sql(rel: str) -> str:
    """3-word shingles of normalized text as a DuckDB list expression."""
    toks = _TOKENS_SQL.format(v="text")
    return (
        f"list_distinct(CASE WHEN len({toks}) >= 3 THEN "
        f"list_transform(range(1, len({toks}) - 1), "
        f"i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2]) "
        f"ELSE [] END)"
    )


def _minhash_sql(h: int) -> str:
    return f"list_min(list_transform(shingles, s -> md5(s || '#{h}')))"


# shared by DEDUP_MINHASH_SQL and DEDUP_CLUSTERS_SQL (the cluster oracle
# re-derives the SAME pairs, then closes them transitively)
_MINHASH_CTES = f"""corpus AS ({_PLANTED_SQL}),
sh AS (
  SELECT doc_id AS id, {_shingles3_sql('corpus')} AS shingles FROM corpus
  WHERE len({_shingles3_sql('corpus')}) > 0
),
sigs AS (
  SELECT id, shingles,
         {", ".join(f"{_minhash_sql(h)} AS h{h}" for h in range(8))}
  FROM sh
),
buckets AS (
  SELECT id, shingles, b.band, b.key
  FROM sigs, UNNEST([
    {{'band': 0, 'key': md5(h0 || '|' || h1)}},
    {{'band': 1, 'key': md5(h2 || '|' || h3)}},
    {{'band': 2, 'key': md5(h4 || '|' || h5)}},
    {{'band': 3, 'key': md5(h6 || '|' || h7)}}
  ]) AS t(b)
),
pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         ROUND(CASE WHEN len(list_distinct(a.shingles || b.shingles)) = 0 THEN 0.0
              ELSE len(list_intersect(a.shingles, b.shingles))
                   / CAST(len(list_distinct(a.shingles || b.shingles)) AS DOUBLE) END, 4)
         AS jaccard
  FROM buckets a JOIN buckets b ON a.key = b.key AND a.id < b.id
)"""

DEDUP_MINHASH_SQL = f"""
WITH {_MINHASH_CTES}
SELECT id_a, id_b, jaccard FROM pairs WHERE jaccard >= 0.5
"""


def dedup_clusters_q(spark, sf_dir):
    """Near-dup CLUSTERS: minhash pairs → connected components → one row per
    clustered doc with its canonical keeper (min id reachable) and cluster
    size. The downstream training-data move is `WHERE is_canon = 1`."""
    corpus = _with_planted_dups(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(
        corpus, shingle_k=3, num_hashes=8, bands=4, jaccard_threshold=0.5
    )
    comp = dedup.connected_components(pairs)
    w = Window.partitionBy("comp")
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("canon_id"),
        (F.col("id") == F.col("comp")).cast("int").alias("is_canon"),
        F.count("*").over(w).alias("cluster_size"),
    )


DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {_MINHASH_CTES},
good AS (SELECT id_a, id_b FROM pairs WHERE jaccard >= 0.5),
edges AS (
  SELECT id_a AS u, id_b AS v FROM good
  UNION
  SELECT id_b AS u, id_a AS v FROM good
),
reach(id, r) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, t.r FROM edges e JOIN reach t ON e.v = t.id
),
comp AS (SELECT id, MIN(r) AS canon_id FROM reach GROUP BY id)
SELECT id AS doc_id, canon_id,
       CAST(id = canon_id AS INT) AS is_canon,
       COUNT(*) OVER (PARTITION BY canon_id) AS cluster_size
FROM comp
"""


def dedup_ngram_q(spark, sf_dir):
    corpus = _with_planted_dups(spark, sf_dir)
    return dedup.ngram_jaccard_pairs(corpus, ngram_n=5, threshold=0.7)


def _grams5_sql() -> str:
    norm = _NORM_SQL.format(v="text")
    return (
        f"list_distinct(CASE WHEN len({norm}) >= 5 THEN "
        f"list_transform(range(1, len({norm}) - 3), i -> substring({norm}, i, 5)) "
        f"ELSE [] END)"
    )


DEDUP_NGRAM_SQL = f"""
WITH corpus AS ({_PLANTED_SQL}),
base AS (
  SELECT doc_id AS id, {_grams5_sql()} AS grams, len({_NORM_SQL.format(v='text')}) AS l
  FROM corpus WHERE len({_grams5_sql()}) > 0
)
SELECT a.id AS id_a, b.id AS id_b,
       ROUND(len(list_intersect(a.grams, b.grams))
             / CAST(len(list_distinct(a.grams || b.grams)) AS DOUBLE), 4) AS jaccard
FROM base a JOIN base b
  ON a.id < b.id AND abs(a.l - b.l) <= a.l * 0.2
WHERE ROUND(len(list_intersect(a.grams, b.grams))
      / CAST(len(list_distinct(a.grams || b.grams)) AS DOUBLE), 4) >= 0.7
"""


def dedup_simhash_q(spark, sf_dir):
    """SimHash signatures (hex) per planted-dup corpus doc; pairing is
    covered by the Spark-side operator test (non-SQL-friendly bit kernel).
    spread=True: the numpy signature kernel scales across cores (A/B at
    sf1.0: 0.77 s spread vs 2.8 s unspread)."""
    corpus = _with_planted_dups(spark, sf_dir, spread=True)
    sigs = dedup.simhash_signatures(corpus)
    return sigs.select("id", F.lpad(F.hex("simhash"), 16, "0").alias("simhash_hex"))


def _sql_simhash_bit(bit: int) -> str:
    toks = _TOKENS_SQL.format(v="text")
    salt = bit // 32
    pos = bit % 32
    vote = (
        f"list_sum(list_transform({toks}, t -> CASE WHEN "
        f"substring(md5(t || '#s{salt}'), {pos + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END))"
    )
    return f"(CASE WHEN {vote} > 0 THEN 1 ELSE 0 END)"


def _simhash_hex_sql() -> str:
    """16 hex nibbles MSB-first (avoids any 64-bit shift overflow)."""
    nibbles = []
    for k in range(15, -1, -1):
        b0 = _sql_simhash_bit(4 * k)
        b1 = _sql_simhash_bit(4 * k + 1)
        b2 = _sql_simhash_bit(4 * k + 2)
        b3 = _sql_simhash_bit(4 * k + 3)
        nibbles.append(
            f"substring('0123456789ABCDEF', {b0} + 2*{b1} + 4*{b2} + 8*{b3} + 1, 1)"
        )
    return " || ".join(nibbles)


DEDUP_SIMHASH_SQL = f"""
WITH corpus AS ({_PLANTED_SQL})
SELECT doc_id AS id, {_simhash_hex_sql()} AS simhash_hex
FROM corpus
"""


_EMB_DEDUP_THRESHOLD = 0.4  # fixture-calibrated near-dup band (synthetic
                            # embeddings top out at cosine ≈ 0.51)


def dedup_embedding_cosine_q(spark, sf_dir):
    """Embedding-cosine near-dup pairs — the 5th dedup modality (task brief):
    EXACT pairs ≥ threshold via the block-grid matmul kernel (no BNLJ)."""
    emb = load(spark, sf_dir, "embeddings")  # operator pins its own single exchange
    return ann.embedding_cosine_pairs(emb, threshold=_EMB_DEDUP_THRESHOLD)


DEDUP_EMB_COSINE_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
       AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE ROUND(list_dot_product(a.v, b.v)
            / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 4)
      >= {_EMB_DEDUP_THRESHOLD}
"""


# ===========================================================================
# similarity search over embeddings
# ===========================================================================


def ann_brute_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings", spread="auto")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return ann.brute_force_topk(emb, queries, k=5)


ANN_BRUTE_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS corpus_id, embedding::DOUBLE[] AS cvec FROM embeddings),
scored AS (
  SELECT query_id, corpus_id,
         ROUND(list_dot_product(qvec, cvec)
               / (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(cvec, cvec))), 4)
         AS cosine
  FROM q JOIN c ON query_id != corpus_id
),
ranked AS (
  SELECT query_id, corpus_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
  FROM scored
)
SELECT query_id, corpus_id, cosine, rank FROM ranked WHERE rank <= 5
"""


_LSH_TABLES, _LSH_PLANES = 6, 6


def ann_lsh_topk(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings", spread="auto")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return ann.lsh_topk(emb, queries, dim=64, k=5,
                        n_planes=_LSH_PLANES, n_tables=_LSH_TABLES)


def _table_sig_sql(table: int) -> str:
    planes = ann.deterministic_planes(64, _LSH_PLANES, seed=42 + table)
    bits = []
    for p in planes:
        dot = " + ".join(f"v[{i+1}] * ({w!r})" for i, w in enumerate(p))
        bits.append(f"CASE WHEN ({dot}) >= 0 THEN '1' ELSE '0' END")
    return " || ".join(bits)


def _ann_lsh_sql() -> str:
    sig_cols = ", ".join(f"{_table_sig_sql(t)} AS s{t}" for t in range(_LSH_TABLES))
    tb_list = ", ".join(
        f"{{'t': {t}, 'b': s{t}}}" for t in range(_LSH_TABLES)
    )
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, v, {sig_cols} FROM base),
buckets AS (
  SELECT vec_id, v, tb.t AS t, tb.b AS b
  FROM sig, UNNEST([{tb_list}]) AS u(tb)
),
q AS (SELECT vec_id AS query_id, v AS qvec, t, b FROM buckets WHERE vec_id % 50 = 0),
c AS (SELECT vec_id AS corpus_id, v AS cvec, t, b FROM buckets),
cand AS (
  SELECT DISTINCT query_id, corpus_id
  FROM q JOIN c USING (t, b) WHERE query_id != corpus_id
),
scored AS (
  SELECT query_id, corpus_id,
         ROUND(list_dot_product(qv.v, cv.v)
               / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))), 4)
         AS cosine
  FROM cand
  JOIN base qv ON qv.vec_id = cand.query_id
  JOIN base cv ON cv.vec_id = cand.corpus_id
),
ranked AS (
  SELECT query_id, corpus_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
  FROM scored
)
SELECT query_id, corpus_id, cosine, rank FROM ranked WHERE rank <= 5
"""


ANN_LSH_SQL = _ann_lsh_sql()


_IVF_STRIDE, _IVF_PROBE = 25, 3


def ann_ivf_topk(spark, sf_dir):
    """IVF-flat cosine top-k: sampled-centroid inverted file, n_probe cells
    per query — the cell-partitioned ANN scale path (operators/ann.ivf_topk)."""
    emb = load(spark, sf_dir, "embeddings", spread="auto")
    queries = emb.where(F.col("vec_id") % 50 == 0)
    return ann.ivf_topk(emb, queries, k=5,
                        centroid_stride=_IVF_STRIDE, n_probe=_IVF_PROBE)


def _ann_ivf_sql() -> str:
    cos = ("ROUND(list_dot_product(b.v, c.cvec) "
           "/ (sqrt(list_dot_product(b.v, b.v)) * sqrt(list_dot_product(c.cvec, c.cvec))), 4)")
    return f"""
WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (SELECT vec_id AS cid, v AS cvec FROM base WHERE vec_id % {_IVF_STRIDE} = 0),
asn AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid ASC) AS rn
  FROM (SELECT b.vec_id, c.cid, {cos} AS cos FROM base b CROSS JOIN cents c)
),
corpus_cells AS (SELECT vec_id AS corpus_id, cid AS cell FROM asn WHERE rn = 1),
query_cells AS (
  SELECT vec_id AS query_id, cid AS cell FROM asn
  WHERE rn <= {_IVF_PROBE} AND vec_id % 50 = 0
),
cand AS (
  SELECT query_id, corpus_id
  FROM query_cells JOIN corpus_cells USING (cell)
  WHERE query_id != corpus_id
),
scored AS (
  SELECT query_id, corpus_id,
         ROUND(list_dot_product(qv.v, cv.v)
               / (sqrt(list_dot_product(qv.v, qv.v)) * sqrt(list_dot_product(cv.v, cv.v))), 4)
         AS cosine
  FROM cand
  JOIN base qv ON qv.vec_id = cand.query_id
  JOIN base cv ON cv.vec_id = cand.corpus_id
),
ranked AS (
  SELECT query_id, corpus_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, corpus_id ASC) AS rank
  FROM scored
)
SELECT query_id, corpus_id, cosine, rank FROM ranked WHERE rank <= 5
"""


ANN_IVF_SQL = _ann_ivf_sql()



# ===========================================================================
# scalar-bank queries (F-family) — oracle SQL GENERATED from banks so the two
# engines share one source of truth. SQL uses staged subqueries (one stage per
# cleaner pass) to keep text linear, mirroring functions.cleaners.let().
# ===========================================================================


def _q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _sql_in(v: str, items: list[str]) -> str:
    return f"{v} IN ({', '.join(_q(i) for i in items)})"


def _sql_split_merged(v: str) -> str:
    return f"""
CASE WHEN {v} IS NULL OR {v} = '' THEN {v}
     WHEN len(regexp_extract_all({v}, {_q(banks.MERGED_SCIENTIFIC)}, 1)) >= 2
          THEN regexp_extract_all({v}, {_q(banks.MERGED_SCIENTIFIC)}, 1)[1]
     WHEN len(regexp_extract_all({v}, {_q(banks.MERGED_LESS_THAN)})) >= 2
          THEN regexp_extract_all({v}, {_q(banks.MERGED_LESS_THAN)})[1]
     ELSE {v} END"""


# DuckDB expression for C.PY_WHITESPACE — the full Python str.strip() char
# set, built from codepoints so no control characters land in the SQL text.
_SQL_WS = " || ".join(f"chr({ord(c)})" for c in C.PY_WHITESPACE)


def _sql_remove_noise(v: str) -> str:
    # NB only chr(10) is replaced: the reference replaces ONLY '\n'
    # (`backend_preservation.py:1270-1271`) — '\r' survives mid-string.
    # The final strip mirrors Python str.strip() on its FULL whitespace set
    # (ASCII + NEL/NBSP/Unicode spaces), not DuckDB trim()'s spaces-only.
    inner = (
        f"trim(replace(replace(replace(replace(replace("
        f"regexp_replace({v}, ':selected:|:unselected:', '', 'g'),"
        f" '\"', ''), '''', ''), '°', ''), '€', ''), chr(10), ' '), {_SQL_WS})"
    )
    return f"CASE WHEN {v} IS NULL OR {v} = '' THEN {v} ELSE {inner} END"


def _sql_strip(v: str) -> str:
    """Python str.strip() semantics in DuckDB: trim the full str.isspace()
    char set (ASCII + NEL/NBSP/Unicode spaces) at both ends, matching the
    reference's str.strip() and the Catalyst pystrip btrim — DuckDB's 1-arg
    trim is spaces-only."""
    return f"trim({v}, {_SQL_WS})"


def _sql_fix_lt10(v: str) -> str:
    """F6 CASE chain, tier order identical to the oracle/Catalyst versions."""
    t = _sql_strip(v)
    tiers = [
        (f"{_sql_in(t, banks.MEANINGLESS_LITERALS)}", "''"),
        (f"{_sql_in(t, banks.LESS_THAN_10_LITERALS)}", "'<10'"),
        (f"regexp_matches({t}, '^<\\s*10[\\?\\-\\)]+$')", "'<10'"),
        (f"regexp_matches({t}, '(?i)^<\\s*[czsCZS]ion')", "'<10'"),
        (f"regexp_matches({t}, '^\\d$')", "'<10'"),
        (f"{t} = '00'", "'<10'"),
        (f"regexp_matches({t}, '^<\\s*10[\\^]?2$')", "'<10^2'"),
        (f"regexp_matches({t}, '^<\\s*10[\\^]?2,?$')", "'<10^2'"),
        (f"regexp_matches({t}, '^<\\s*10\\s+2$')", "'<10^2'"),
        (f"{_sql_in(t, banks.LT10E2_LITERALS)}", "'<10^2'"),
        (f"regexp_matches({t}, '(?i)^[SC]I0?2,?$')", "'<10^2'"),
        (f"regexp_matches({t}, '^[5C6]/0?2$')", "'<10^2'"),
        (f"regexp_matches({t}, '^\\(\\s*10?2,?$')", "'<10^2'"),
        (f"regexp_matches({t}, '(?i)^[SC]I0?2\\s+2$')", "'<10^2'"),
        (f"regexp_matches({t}, '^\\d+[45]102$')", "'<10^2'"),
        (f"{_sql_in(t, banks.LT10_TIER3_LITERALS)}", "'<10'"),
        (f"regexp_matches({t}, '^\\d+\\s*<\\s*10')", "'<10'"),
        (f"{t} = '103'", "'<10^3'"),
        (f"regexp_matches({t}, '^<\\s*10\\s*[\"''\\s\\?\\-\\)]*$')", "'<10'"),
        (f"{t} IN ('<10', '< 10')", "'<10'"),
    ]
    whens = "\n     ".join(f"WHEN {cond} THEN {res}" for cond, res in tiers)
    return f"""
CASE WHEN {v} IS NULL OR {v} = '' THEN {v}
     {whens}
     ELSE {t} END"""


def _sql_normalize_sci(v: str) -> str:
    t = f"replace(replace({_sql_strip(v)}, 'X', '×'), 'x', '×')"
    prefix = (
        f"CASE WHEN starts_with({t}, '<') THEN '<' "
        f"WHEN starts_with({t}, '≤') THEN '≤' ELSE '' END"
    )
    b1 = f"regexp_extract({t}, {_q(banks.SCIENTIFIC_SPACED)}, 1)"
    e1 = f"regexp_extract({t}, {_q(banks.SCIENTIFIC_SPACED)}, 2)"
    b2 = f"regexp_extract({t}, {_q(banks.SCIENTIFIC_TIGHT)}, 1)"
    e2 = f"regexp_extract({t}, {_q(banks.SCIENTIFIC_TIGHT)}, 2)"
    return f"""
CASE WHEN {v} IS NULL OR {v} = '' THEN {v}
     WHEN {b1} != '' THEN {prefix} || {b1} || '×10^' ||
          CASE WHEN {e1} = '' THEN '0' ELSE {e1} END
     WHEN {b2} != '' THEN {prefix} || {b2} || '×10^' || {e2}
     ELSE {t} END"""


def _sql_fix_7day(v: str, orig: str) -> str:
    clear = sorted({p for pat in banks.CLEAR_LT10_ORIGINALS for p in (pat, pat.replace(" ", ""))})
    amb = " OR ".join(f"contains({_sql_strip(orig)}, {_q(p)})" for p in banks.AMBIGUOUS_LT10_ORIGINALS)
    return f"""
CASE WHEN contains({v}, '^') THEN {v}
     WHEN {v} != '<10' THEN {v}
     WHEN {_sql_in(_sql_strip(orig), clear)} THEN '<10'
     WHEN {amb} THEN '<10^2'
     ELSE '<10' END"""


# fixed raw-value corpus for the bank queries: every bank literal + noisy forms
_CFU_RAW = (
    banks.LESS_THAN_10_LITERALS
    + banks.LT10E2_LITERALS
    + banks.LT10_TIER3_LITERALS
    + banks.MEANINGLESS_LITERALS
    + [
        "5.5X105", "7.0X102 1.0 ×103", "6.0 × 10", "<6.1 × 100", "< 10 2",
        "<10?", "< cion", "1", "103", "2 <10", "SI02 2", "( 102", "5/02",
        ":selected:40", "≤3", "5.5 × 10 5", "1.0×103", "9.9X10^9", "45102",
        '" <10', "hello",
        # \r-bearing forms: the reference strips only '\n' — a mid-string
        # '\r' must SURVIVE remove_noise (round-2 oracle drift regression)
        "5.5\rX105", "<10\r", "\r2.0\n×102\r",
        # Unicode-whitespace ends: Python str.strip() eats NBSP / NEL /
        # IDEOGRAPHIC SPACE; Java regex \\s and 1-arg trim would not — these
        # literals make the full-char-set agreement reachable in the gate
        "\xa0<10\xa0", "　negative　", "1.0×103\x85",
    ]
)


def _cfu_values_sql() -> str:
    lits = ", ".join(_q(s) for s in _CFU_RAW)
    return f"""
SELECT o_orderkey AS key, ([{lits}])[CAST(o_orderkey % {len(_CFU_RAW)} AS INT) + 1] AS raw
FROM orders
"""


def f6_f7_clean_chain(spark, sf_dir):
    """F4→F5→F6→F7(→F11) integrated clean chain over the full misread bank,
    keyed off orders (so the driver exercises it at every sf).

    DICTIONARY execution: ``raw`` takes exactly ``len(_CFU_RAW)`` (=105)
    distinct values, so the staged F4→F11 chain (clean_cfu_staged — shared
    prefix computed once, banks in whole-stage codegen) runs ONCE per bank
    entry on a 105-row frame, which then broadcast-joins back onto the fact
    rows by ``key % 105``. Per row the regex banks collapse to one int hash
    probe — the classic low-cardinality-argument rewrite (guide §1.2 step 1:
    don't compute things twice); measured 2.5 s → ~0.4 s at sf1.0 with
    results identical by construction (same deterministic function of the
    same value)."""
    orders = load(spark, sf_dir, "orders")
    n = len(_CFU_RAW)
    bank = spark.createDataFrame(
        [(i, v) for i, v in enumerate(_CFU_RAW)], "idx int, raw string"
    )
    bank = C.clean_cfu_staged(
        bank,
        {"raw": F.col("raw")},
        [("raw", "0", "clean_0"), ("raw", "7", "clean_7"), ("raw", "14", "clean_14")],
    )
    keys = orders.select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_orderkey") % n).cast("int").alias("idx"),
    )
    return keys.join(F.broadcast(bank), "idx").select(
        "key", "raw", "clean_0", "clean_7", "clean_14"
    )


def _f6_sql() -> str:
    return f"""
WITH base AS ({_cfu_values_sql()}),
s1 AS (SELECT key, raw, {_sql_split_merged('raw')} AS v1 FROM base),
s2 AS (SELECT key, raw, {_sql_remove_noise('v1')} AS v2 FROM s1),
s3 AS (SELECT key, raw, v2, {_sql_fix_lt10('v2')} AS v3 FROM s2),
s4 AS (SELECT key, raw,
              {_sql_normalize_sci('v2')} AS c0,
              {_sql_normalize_sci('v3')} AS c7n,
              {_sql_normalize_sci('v3')} AS c14 FROM s3),
s5 AS (SELECT key, raw, c0, {_sql_fix_7day('c7n', 'raw')} AS c7, c14 FROM s4)
SELECT key, raw,
       CASE WHEN raw IS NULL OR raw = '' THEN '' ELSE c0 END AS clean_0,
       CASE WHEN raw IS NULL OR raw = '' THEN '' ELSE c7 END AS clean_7,
       CASE WHEN raw IS NULL OR raw = '' THEN '' ELSE c14 END AS clean_14
FROM s5
"""


def f20_log_convert(spark, sf_dir):
    """F20 — CFU→log₁₀ over canonical cleaned values."""
    vals = ["5.5×10^5", "<10", "<10^2", "<10^3", "1000", "100", "≤3", "9.9×10^9",
            "1.0×10^0", "7.5×10^3", "2.2×10^2", "oops"]
    orders = load(spark, sf_dir, "orders")
    v = F.element_at(F.lit(vals), (F.col("o_orderkey") % len(vals)).cast("int") + 1)
    return orders.select(
        F.col("o_orderkey").alias("key"), v.alias("cfu"), C.convert_to_log(v).alias("log_cfu")
    )


def _sql_log(v: str) -> str:
    """DuckDB mirror of ``C.convert_to_log`` applied to expression ``v``
    (shared by the F20 oracle and the J4 template log block)."""
    ce = f"regexp_extract({v}, '<10\\^(\\d+)', 1)"
    base = f"try_cast(regexp_extract({v}, '^([0-9.]+)×10\\^(\\d+)', 1) AS DOUBLE)"
    expn = f"try_cast(regexp_extract({v}, '^([0-9.]+)×10\\^(\\d+)', 2) AS INT)"
    return (
        f"CASE WHEN {v} IS NULL OR {v} = '' THEN ''\n"
        f"       WHEN contains({v}, '<') AND {ce} != '' THEN '<' || {ce} || '.0'\n"
        f"       WHEN contains({v}, '<') THEN '<1.0'\n"
        f"       WHEN {base} IS NOT NULL\n"
        f"            THEN CAST(ROUND({expn} + log10({base}), 1) AS VARCHAR)\n"
        f"       WHEN try_cast({v} AS DOUBLE) IS NOT NULL\n"
        f"            THEN CAST(ROUND(log10(try_cast({v} AS DOUBLE)), 1) AS VARCHAR)\n"
        f"       ELSE {v} END"
    )


def _f20_sql() -> str:
    vals = ["5.5×10^5", "<10", "<10^2", "<10^3", "1000", "100", "≤3", "9.9×10^9",
            "1.0×10^0", "7.5×10^3", "2.2×10^2", "oops"]
    lits = ", ".join(_q(s) for s in vals)
    return f"""
WITH base AS (
  SELECT o_orderkey AS key, ([{lits}])[CAST(o_orderkey % {len(vals)} AS INT) + 1] AS cfu
  FROM orders
)
SELECT key, cfu,
  {_sql_log("cfu")} AS log_cfu
FROM base
"""


_BULK_FORMS = [
    "어린이버블클렌저 {p} {t}",
    "수분크림 {p} {t}",
    "선크림 {t} {p}",
    "에센스 {p}- {t}",
    "{p} 크림 {t}",
]


def f3_id_extraction(spark, sf_dir):
    """F1/F2/F3 — bulk-name preprocess + test#/prescription# extraction with
    OCR repair, over synthesized noisy bulk strings keyed off orders.

    DICTIONARY execution (same rewrite as f6_f7): every modulus in the
    synthesized bulk (12, 4, 3, 20, 90, 9000, 5) divides 9000, so the bulk
    string — and therefore both extractions — is a pure function of
    ``key % 9000``. The staged extraction (extract_ids_staged: F1 preprocess
    materialized once, banks in whole-stage codegen) runs on a 9000-row
    domain frame that broadcast-joins back onto the fact rows; per row the
    16-regex bank collapses to an int hash probe. Results identical by
    construction; measured 2.5 s → ~0.5 s at sf1.0."""
    orders = load(spark, sf_dir, "orders")
    bank = spark.range(9000).select(F.col("id").cast("int").alias("idx"))
    k = F.col("idx")
    letter = F.chr((k % 12) + 65)
    marker = F.element_at(F.lit(["I", "1", "|", "!"]), (k % 4).cast("int") + 1)
    test = F.concat(
        F.lit("2"), ((k % 3) + 4).cast("string"), letter,
        F.lpad(((k % 20) + 10).cast("string"), 2, "0"), marker,
        F.lpad(((k % 90) + 10).cast("string"), 2, "0"),
    )
    presc = F.concat(
        F.element_at(F.lit(["GB", "CCA", "LAF", "WC"]), (k % 4).cast("int") + 1),
        ((k % 9000) + 1000).cast("string"),
        F.lit("-"),
        F.element_at(F.lit(["ZMB", "VAA", "OZ2A", "AZLY1", "11F"]), (k % 5).cast("int") + 1),
    )
    form = F.element_at(F.lit(_BULK_FORMS), (k % len(_BULK_FORMS)).cast("int") + 1)
    bulk = F.replace(F.replace(form, F.lit("{p}"), presc), F.lit("{t}"), test)
    bank = bank.select(F.col("idx"), bulk.alias("bulk"))
    bank = C.extract_ids_staged(
        bank, F.col("bulk"), "test_number", "prescription_number"
    )
    keys = orders.select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_orderkey") % 9000).cast("int").alias("idx"),
    )
    return keys.join(F.broadcast(bank), "idx").select(
        "key", "bulk", "test_number", "prescription_number"
    )


def _f3_sql() -> str:
    forms = ", ".join(_q(s) for s in _BULK_FORMS)
    pre = (
        "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
        "replace(replace(upper(bulk), '!', 'I'), '|', 'I'),"
        " '-\\s+', '-', 'g'), '\\s+-', '-', 'g'), '-+', '-', 'g'), '\\s+', ' ', 'g')"
    )
    test_pats = [
        r"\b(2[0-9][A-Z]\d{2}[I!|1]\d{2})\b",
        r"\b(2[0-9][E]\d{2}1\d{2})\b",
    ]
    presc_pats = [
        r"\b([A-Z]{2,4}\d{4,5}[A-Z]?-[A-Z]{1,5}\d?)\b",
        r"\b([A-Z]{3}\d{5}-[A-Z]{2,4})\b",
        r"\b(M-[A-Z]{2,4}\d{4,5}-[A-Z]{1,4}\d?)\b",
        r"\b([A-Z]{2,4}\d{3,6}-[A-Z]{1,5})\b",
        r"\b([A-Z]{2,5}\d{4}-[A-Z]{1,3}\d{0,2})\b",
        r"\b([A-Z]{1,3}\d{4,5}-[A-Z]{2,4}[A-Z]?)\b",
        r"\b([A-Z]{2,4}\d{4}-[A-Z]\d[A-Z]{1,3})\b",
        r"\b([A-Z]{2,4}\d{3,4}[A-Z]?-[A-Z]{1,4}\d*)\b",
        r"\b([A-Z]{2,4}\d{4}-\d{1,2}[A-Z]{1,2})\b",
        r"\b([A-Z]{2,4}\d{4,5}[A-Z]?-\s*[A-Z]{1,5}\d?)\b",
        r"\b([A-Z]{2,4}\d{4,5}[A-Z]?-\s*[A-Z]+\d+[A-Z]+)\b",
        r"\b([A-Z]{2,4}\d{4,5}[A-Z]?-[A-Z]{1,5}\d[A-Z]+)\b",
        r"\b([A-Z]{2,4}\d{3,5}-[A-Z]{1,4}\d{1,2})\b",
        r"\b([A-Z]{2,5}\d{3,5}-[A-Z]{2,5}[A-Z\d]*)\b",
    ]
    tchain = "COALESCE(" + ", ".join(
        f"NULLIF(regexp_extract(t, {_q(p)}, 1), '')" for p in test_pats
    ) + ", '')"
    pchain = "COALESCE(" + ", ".join(
        f"NULLIF(regexp_extract(t, {_q(p)}, 1), '')" for p in presc_pats
    ) + ", '')"
    return f"""
WITH base AS (
  SELECT o_orderkey AS key,
         replace(replace(
           (['{"', '".join(s.replace("'", "''") for s in _BULK_FORMS)}'])
             [CAST(o_orderkey % {len(_BULK_FORMS)} AS INT) + 1],
           '{{p}}',
           (['GB','CCA','LAF','WC'])[CAST(o_orderkey % 4 AS INT) + 1]
             || CAST((o_orderkey % 9000) + 1000 AS VARCHAR) || '-'
             || (['ZMB','VAA','OZ2A','AZLY1','11F'])[CAST(o_orderkey % 5 AS INT) + 1]),
           '{{t}}',
           '2' || CAST((o_orderkey % 3) + 4 AS VARCHAR)
             || chr(CAST((o_orderkey % 12) + 65 AS INT))
             || lpad(CAST((o_orderkey % 20) + 10 AS VARCHAR), 2, '0')
             || (['I','1','|','!'])[CAST(o_orderkey % 4 AS INT) + 1]
             || lpad(CAST((o_orderkey % 90) + 10 AS VARCHAR), 2, '0'))
         AS bulk
  FROM orders
),
pp AS (SELECT key, bulk, {pre} AS t FROM base)
SELECT key, bulk,
       replace(replace(
         regexp_replace({tchain}, '([A-Z])(\\d{{2}})1(\\d{{2}})', '\\1\\2I\\3'),
         '|', 'I'), '!', 'I') AS test_number,
       trim({pchain}) AS prescription_number
FROM pp
"""


def f17_date_ladder(spark, sf_dir):
    """F17/F21 — +7/+14/+28-day ladder as MM/dd strings from o_orderdate."""
    orders = load(spark, sf_dir, "orders")
    d0 = F.to_date("o_orderdate")
    return orders.select(
        F.col("o_orderkey").alias("key"),
        F.date_format(d0, "MM/dd").alias("date_0"),
        F.date_format(F.date_add(d0, 7), "MM/dd").alias("date_7"),
        F.date_format(F.date_add(d0, 14), "MM/dd").alias("date_14"),
        F.date_format(F.date_add(d0, 28), "MM/dd").alias("date_28"),
    )


F17_SQL = """
SELECT o_orderkey AS key,
       strftime(CAST(o_orderdate AS DATE), '%m/%d') AS date_0,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY, '%m/%d') AS date_7,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 14 DAY, '%m/%d') AS date_14,
       strftime(CAST(o_orderdate AS DATE) + INTERVAL 28 DAY, '%m/%d') AS date_28
FROM orders
"""


_F16_TEMPLATES = [
    "{m} {d}", "{m}-{d}", "{m}/{d}", "{m}.{d}",
    "{m}월{d}일", "{m}월 {d}일",
    "{big}/{m}", "{big}-{m}", "{big} {m}",
    "02 29",        # valid shape, invalid date in year 1900 → ''
    "no date",      # unparseable → ''
    "{mp}/{dp}",    # zero-padded month-day
]


def f16_date_parse(spark, sf_dir):
    """F16 — 9-format strptime-equivalent date parse with the year-1900
    quirk, over synthesized date strings covering every format + invalids."""
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    m = ((k % 12) + 1).cast("string")
    d = ((k % 28) + 1).cast("string")
    big = ((k % 16) + 13).cast("string")  # 13..28: forces the day-month forms
    mp = F.lpad(m, 2, "0")
    dp = F.lpad(d, 2, "0")
    tpl = F.element_at(F.lit(_F16_TEMPLATES), (k % len(_F16_TEMPLATES)).cast("int") + 1)
    raw = tpl
    for name, col in (("{m}", m), ("{d}", d), ("{big}", big), ("{mp}", mp), ("{dp}", dp)):
        raw = F.replace(raw, F.lit(name), col)
    return orders.select(
        k.alias("key"), raw.alias("raw"), C.parse_date_multi(raw).alias("parsed")
    )


def _f16_sql() -> str:
    tpls = ", ".join(_q(s) for s in _F16_TEMPLATES)
    raw = (
        f"replace(replace(replace(replace(replace("
        f"([{tpls}])[CAST(key % {len(_F16_TEMPLATES)} AS INT) + 1],"
        f" '{{m}}', m), '{{d}}', d), '{{big}}', big), '{{mp}}', lpad(m, 2, '0')),"
        f" '{{dp}}', lpad(d, 2, '0'))"
    )
    branches = []
    for pat, order in banks.DATE_FORMATS:
        gm, gd = (1, 2) if order == "md" else (2, 1)
        mm = f"TRY_CAST(regexp_extract(raw, {_q(pat)}, {gm}) AS INT)"
        dd = f"TRY_CAST(regexp_extract(raw, {_q(pat)}, {gd}) AS INT)"
        maxd = (
            f"CASE WHEN {mm} = 2 THEN 28 WHEN {mm} IN (4, 6, 9, 11) THEN 30 ELSE 31 END"
        )
        branches.append(
            f"CASE WHEN {dd} <= {maxd} THEN "
            f"'1900-' || lpad(CAST({mm} AS VARCHAR), 2, '0') || '-' "
            f"|| lpad(CAST({dd} AS VARCHAR), 2, '0') END"
        )
    chain = "COALESCE(" + ",\n  ".join(branches) + ", '')"
    return f"""
WITH base AS (
  SELECT o_orderkey AS key,
         CAST((o_orderkey % 12) + 1 AS VARCHAR) AS m,
         CAST((o_orderkey % 28) + 1 AS VARCHAR) AS d,
         CAST((o_orderkey % 16) + 13 AS VARCHAR) AS big
  FROM orders
),
raws AS (SELECT key, {raw} AS raw FROM base)
SELECT key, raw, {chain} AS parsed FROM raws
"""


def f15_consecutive_dates(spark, sf_dir):
    """F15 — consecutive 'MM DD ×4' date-string parse, synthesized from keys."""
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    m = (k % 12) + 1
    d = (k % 20) + 1
    raw = F.concat_ws(
        " ",
        F.lpad(m.cast("string"), 2, "0"), F.lpad(d.cast("string"), 2, "0"),
        F.lpad(m.cast("string"), 2, "0"), F.lpad((d + 7).cast("string"), 2, "0"),
        F.lpad(((m % 12) + 1).cast("string"), 2, "0"), F.lpad(d.cast("string"), 2, "0"),
        F.lpad(((m % 12) + 1).cast("string"), 2, "0"), F.lpad((d + 7).cast("string"), 2, "0"),
    )
    # every 5th row gets a junk string (non-parse path)
    raw = F.when(k % 5 == 0, F.lit("no dates here")).otherwise(raw)
    return orders.select(
        k.alias("key"),
        raw.alias("raw"),
        F.concat_ws(",", C.parse_consecutive_dates(raw)).alias("dates"),
    )


F15_SQL = """
WITH base AS (
  SELECT o_orderkey AS key,
         CASE WHEN o_orderkey % 5 = 0 THEN 'no dates here'
              ELSE lpad(CAST((o_orderkey % 12) + 1 AS VARCHAR), 2, '0') || ' ' ||
                   lpad(CAST((o_orderkey % 20) + 1 AS VARCHAR), 2, '0') || ' ' ||
                   lpad(CAST((o_orderkey % 12) + 1 AS VARCHAR), 2, '0') || ' ' ||
                   lpad(CAST((o_orderkey % 20) + 8 AS VARCHAR), 2, '0') || ' ' ||
                   lpad(CAST(((o_orderkey % 12) + 1) % 12 + 1 AS VARCHAR), 2, '0') || ' ' ||
                   lpad(CAST((o_orderkey % 20) + 1 AS VARCHAR), 2, '0') || ' ' ||
                   lpad(CAST(((o_orderkey % 12) + 1) % 12 + 1 AS VARCHAR), 2, '0') || ' ' ||
                   lpad(CAST((o_orderkey % 20) + 8 AS VARCHAR), 2, '0')
         END AS raw
  FROM orders
),
toks AS (
  SELECT key, raw, list_filter(string_split(trim(raw), ' '), x -> x != '') AS parts
  FROM base
)
SELECT key, raw,
       CASE WHEN len(parts) >= 8
                 AND len(list_filter(parts, p -> NOT regexp_matches(p, '^\\d{2}$'))) = 0
            THEN parts[1] || '/' || parts[2] || ',' || parts[3] || '/' || parts[4] || ','
                 || parts[5] || '/' || parts[6] || ',' || parts[7] || '/' || parts[8]
            ELSE '' END AS dates
FROM toks
"""


# ===========================================================================
# flagship entry: interleaved extraction over testdata documents
# ===========================================================================


def _flagship_test(k):
    """Raw synthesized test# with an OCR-noised marker (I/1/|/!) by k%4."""
    return F.concat(
        F.lit("2"), ((k % 3) + 4).cast("string"), F.chr((k % 12) + 65),
        F.lpad(((k % 20) + 10).cast("string"), 2, "0"),
        F.element_at(F.lit(["I", "1", "|", "!"]), (k % 4).cast("int") + 1),
        F.lpad(((k % 90) + 10).cast("string"), 2, "0"),
    )


def _flagship_presc(k):
    return F.concat(
        F.element_at(F.lit(["GB", "CCA", "LAF", "WC"]), (k % 4).cast("int") + 1),
        ((k % 9000) + 1000).cast("string"), F.lit("-"),
        F.element_at(F.lit(["ZMB", "VAA", "OZ2A", "AZLY1", "11F"]), (k % 5).cast("int") + 1),
    )


_FLAGSHIP_CFU7 = ["40", "CIO", "<10", "110", "4102"]


def _flagship_table_html(k, test, presc):
    cfu7 = F.element_at(F.lit(_FLAGSHIP_CFU7), (k % 5).cast("int") + 1)
    return F.concat(
        F.lit("<table><tr><td>보존력 시험</td></tr><tr><td>"),
        F.lpad(((k % 12) + 1).cast("string"), 2, "0"), F.lit("/"),
        F.lpad(((k % 20) + 1).cast("string"), 2, "0"),
        F.lit("</td><td>일자</td></tr>"),
        F.lit('<tr><td rowspan="2">제품명 '), presc, F.lit(" "), test,
        F.lit("</td><td>E.coli</td><td>≤3</td><td>5.5X105</td><td>"), cfu7,
        F.lit("</td><td>40</td><td>110</td><td>0</td><td>X</td></tr>"),
        F.lit("<tr><td>C.albicans</td><td>≤3</td><td>6.1X104</td><td>"), cfu7,
        F.lit("</td><td>CIO</td><td>&lt;1&gt;</td><td></td><td>0</td></tr></table>"),
    )


def flagship_entry(spark, sf_dir, mult: int | None = None):
    """Build an interleaved (doc_id, spans) corpus from the documents table —
    one text span + one boilerplate-html span + one preservation table_html
    span per doc, all synthesized with JVM-side expressions — and run the full
    normalize_spans pipeline over it.

    ``mult`` (or $SPARK_GRAFT_FLAGSHIP_MULT) replicates each doc with distinct
    ids — used by the scaling protocol to amortize fixed costs over enough
    work; the default contract run keeps mult=1.
    """
    import os as _os

    from micro_lab_ocr_spark.pipeline import extract as px

    if mult is None:
        mult = int(_os.environ.get("SPARK_GRAFT_FLAGSHIP_MULT", "1"))
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = load(spark, sf_dir, "documents")  # repartitioned on doc_id below
    if mult > 1:
        docs = docs.withColumn(
            "rep", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
        ).withColumn("doc_id", F.col("doc_id") * mult + F.col("rep"))
    # small files scan into 1-2 splits; spread the kernel work over all cores
    docs = docs.repartition(n_part, "doc_id")
    k = F.col("doc_id")
    test = _flagship_test(k)
    presc = _flagship_presc(k)
    table_html = _flagship_table_html(k, test, presc)
    html = F.concat(
        F.lit("<html><body><nav><div><a href='/x'>nav one</a> <a href='/y'>nav two</a></div></nav>"
              "<div id='c'><p>"),
        F.col("text"),
        F.lit("</p></div><footer><div>footer text</div></footer></body></html>"),
    )
    interleaved = docs.select(
        k.cast("string").alias("doc_id"),
        F.array(
            F.struct(F.lit("text").alias("kind"), F.col("text").alias("text"),
                     F.lit("").alias("media_ref"), F.lit(0).alias("offset")),
            F.struct(F.lit("html").alias("kind"), html.alias("text"),
                     F.lit("").alias("media_ref"), F.lit(1).alias("offset")),
            F.struct(F.lit("table_html").alias("kind"), table_html.alias("text"),
                     F.lit("").alias("media_ref"), F.lit(2).alias("offset")),
        ).alias("spans"),
    )
    return px.normalize_spans(interleaved, None)


# ===========================================================================
# records path: flagship table_html spans → REAL Upstage kernel → 9-field
# records → J1 enrichment join + R3 per-test pivot over actual extraction
# output (`backend_preservation.py:1708-1728`, `backend.py:1059-1116`).
# The oracle SQL re-derives the expected records arithmetically from the
# documents keys, with the cleaned-value literals computed AT GENERATION TIME
# by the pure-Python oracle (single source of truth; empirically probed:
# marker '|' defeats test# extraction, suffix '11F' defeats prescription
# extraction — both expected blanks, not bugs).
# ===========================================================================

_UPSTAGE_SCHEMA = (
    "doc_id string, offset int, lines string, ok boolean, "
    "d0 string, d7 string, d14 string, d28 string"
)


def _flagship_records(spark, sf_dir):
    """(key, 9 record fields) rows out of the real table_html kernel path."""
    from micro_lab_ocr_spark import spanspec
    from micro_lab_ocr_spark.pipeline import extract as px

    n_part = int(spark.conf.get("spark.sql.shuffle.partitions"))
    docs = load(spark, sf_dir, "documents").repartition(n_part, "doc_id")
    k = F.col("doc_id")
    pages = docs.select(
        k.cast("string").alias("doc_id"),
        F.lit(0).alias("offset"),
        _flagship_table_html(k, _flagship_test(k), _flagship_presc(k)).alias("text"),
    )
    up = pages.mapInPandas(px._upstage_pages, _UPSTAGE_SCHEMA)
    lines = up.select(
        F.col("doc_id").cast("long").alias("key"),
        F.explode(F.split("lines", "\n")).alias("line"),
    ).where(F.col("line") != "")
    parts = F.split(F.col("line"), r"\|")
    return lines.select(
        "key",
        *[F.element_at(parts, i + 1).alias(f) for i, f in enumerate(spanspec.RECORD_FIELDS)],
    )


def _records_sql_ctes() -> str:
    """Expected-records CTE: two rows per doc key, literals from the oracle."""
    from micro_lab_ocr_spark.oracle import cleaners as ocl

    c7 = [ocl.clean_cfu_value_upstage(v, "E.coli", "7") for v in _FLAGSHIP_CFU7]
    cfu7_map = (
        "CASE CAST(doc_id % 5 AS INT) "
        + " ".join(f"WHEN {i} THEN {_q(v)}" for i, v in enumerate(c7))
        + " END"
    )
    e = {
        "cfu0": ocl.clean_cfu_value_upstage("5.5X105", "E.coli", "0"),
        "cfu14": ocl.clean_cfu_value_upstage("40", "E.coli", "14"),
        "cfu28": ocl.clean_cfu_value_upstage("110", "E.coli", "28"),
        "judg": ocl.extract_judgment_upstage("0"),
        "final": ocl.extract_judgment_upstage("X"),
    }
    a = {
        "cfu0": ocl.clean_cfu_value_upstage("6.1X104", "C.albicans", "0"),
        "cfu14": ocl.clean_cfu_value_upstage("CIO", "C.albicans", "14"),
        "cfu28": ocl.clean_cfu_value_upstage("&lt;1&gt;", "C.albicans", "28"),
        "judg": ocl.extract_judgment_upstage(""),
        "final": ocl.extract_judgment_upstage("0"),
    }
    # marker k%4==2 ('|') → test extraction misses; suffix k%5==4 ('11F') →
    # prescription extraction misses (probed against the oracle)
    test = (
        "CASE WHEN doc_id % 4 = 2 THEN '' ELSE "
        "'2' || CAST((doc_id % 3) + 4 AS VARCHAR) || chr(CAST((doc_id % 12) + 65 AS INT)) "
        "|| lpad(CAST((doc_id % 20) + 10 AS VARCHAR), 2, '0') || 'I' "
        "|| lpad(CAST((doc_id % 90) + 10 AS VARCHAR), 2, '0') END"
    )
    presc_raw = (
        "(['GB','CCA','LAF','WC'])[CAST(doc_id % 4 AS INT) + 1] "
        "|| CAST((doc_id % 9000) + 1000 AS VARCHAR) || '-' "
        "|| (['ZMB','VAA','OZ2A','AZLY1','11F'])[CAST(doc_id % 5 AS INT) + 1]"
    )
    presc = f"CASE WHEN doc_id % 5 = 4 THEN '' ELSE {presc_raw} END"

    def row(strain: str, lits: dict) -> str:
        return (
            f"SELECT doc_id AS key, {test} AS test_number, {presc} AS prescription_number, "
            f"{_q(strain)} AS strain, {_q(lits['cfu0'])} AS cfu_0day, {cfu7_map} AS cfu_7day, "
            f"{_q(lits['cfu14'])} AS cfu_14day, {_q(lits['cfu28'])} AS cfu_28day, "
            f"{_q(lits['judg'])} AS judgment, {_q(lits['final'])} AS final_judgment "
            f"FROM documents"
        )

    return f"recs AS (\n{row('E.coli', e)}\nUNION ALL\n{row('C.albicans', a)}\n)"


def j1_records_enrich(spark, sf_dir):
    """J1 over real extraction output: kernel-extracted records left-join a
    broadcast progress-master dimension on prescription#, misses → ''."""
    recs = _flagship_records(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id")
    k = F.col("doc_id")
    presc = _flagship_presc(k)
    dim = (
        docs.where(k % 5 < 2)  # suffixes ZMB/VAA form the master table
        .select(
            presc.alias("prescription_number"),
            F.concat(F.lit("PROD-"), presc).alias("product_name"),
            F.element_at(
                F.lit(["O/W", "W/O", "Gel"]), (F.length(presc) % 3).cast("int") + 1
            ).alias("formulation"),
        )
        .distinct()
    )
    return recs.join(F.broadcast(dim), "prescription_number", "left").select(
        "key",
        "strain",
        "test_number",
        "prescription_number",
        "cfu_7day",
        F.coalesce("product_name", F.lit("")).alias("product_name"),
        F.coalesce("formulation", F.lit("")).alias("formulation"),
    )


def _j1_records_sql() -> str:
    presc_dim = (
        "(['GB','CCA','LAF','WC'])[CAST(doc_id % 4 AS INT) + 1] "
        "|| CAST((doc_id % 9000) + 1000 AS VARCHAR) || '-' "
        "|| (['ZMB','VAA'])[CAST(doc_id % 5 AS INT) + 1]"
    )
    return f"""
WITH {_records_sql_ctes()},
dim AS (
  SELECT DISTINCT {presc_dim} AS prescription_number,
         'PROD-' || {presc_dim} AS product_name,
         (['O/W','W/O','Gel'])[CAST(length({presc_dim}) % 3 AS INT) + 1] AS formulation
  FROM documents WHERE doc_id % 5 < 2
)
SELECT key, strain, test_number, prescription_number, cfu_7day,
       COALESCE(product_name, '') AS product_name,
       COALESCE(formulation, '') AS formulation
FROM recs LEFT JOIN dim USING (prescription_number)
"""


def r3_records_pivot(spark, sf_dir):
    """R3 over real extraction output: per-test strain pivot of kernel
    records (P8 gate: blank test# can't be sheeted, mirrored here)."""
    recs = _flagship_records(spark, sf_dir).where(F.col("test_number") != "")
    p = (
        recs.groupBy("test_number")
        .pivot("strain", ["E.coli", "C.albicans"])
        .agg(F.min("cfu_7day").alias("cfu7"), F.min("final_judgment").alias("final"))
    )
    return p.select(
        "test_number",
        F.col("`E.coli_cfu7`").alias("ecoli_cfu7"),
        F.col("`E.coli_final`").alias("ecoli_final"),
        F.col("`C.albicans_cfu7`").alias("calbicans_cfu7"),
        F.col("`C.albicans_final`").alias("calbicans_final"),
    )


def _r3_records_sql() -> str:
    return f"""
WITH {_records_sql_ctes()}
SELECT test_number,
       MIN(CASE WHEN strain = 'E.coli' THEN cfu_7day END) AS ecoli_cfu7,
       MIN(CASE WHEN strain = 'E.coli' THEN final_judgment END) AS ecoli_final,
       MIN(CASE WHEN strain = 'C.albicans' THEN cfu_7day END) AS calbicans_cfu7,
       MIN(CASE WHEN strain = 'C.albicans' THEN final_judgment END) AS calbicans_final
FROM recs WHERE test_number != ''
GROUP BY test_number
"""





# ===========================================================================
# S2 — DRM detect (`drm_utils.py:19-134`)
# ===========================================================================

_DRM_CASES = [
    "%PDF-1.4 1 0 obj << /Type /Catalog >> stream ",   # clear pdf
    "%PDF-1.5 trailer << /Encrypt 9 0 R >> ",           # encrypted pdf
    'MLPDF[{"text":"block"}] ',                          # decodable fixture container
    "GARBAGE-NO-HEADER ",                                # suspect bytes
]


def s2_drm_detect(spark, sf_dir):
    """S2 — 3-tier DRM detection over synthesized binary content keyed off
    orders; the binary predicates (header magic + /Encrypt scan) run
    JVM-side on a BinaryType column."""
    from micro_lab_ocr_spark.operators import drm

    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    raw = F.concat(
        F.element_at(F.lit(_DRM_CASES), (k % 4).cast("int") + 1), k.cast("string")
    )
    det = drm.drm_detect(F.encode(raw, "UTF-8"))
    return orders.select(
        k.alias("key"),
        raw.alias("raw"),
        det.getField("is_drm").alias("is_drm"),
        det.getField("method").alias("method"),
        det.getField("confidence").alias("confidence"),
    )


def _s2_sql() -> str:
    lits = ", ".join(_q(s) for s in _DRM_CASES)
    return f"""
WITH base AS (
  SELECT o_orderkey AS key,
         ([{lits}])[CAST(o_orderkey % 4 AS INT) + 1] || CAST(o_orderkey AS VARCHAR) AS raw
  FROM orders
)
SELECT key, raw,
       CASE WHEN starts_with(raw, '%PDF') AND contains(raw, '/Encrypt') THEN TRUE
            WHEN starts_with(raw, '%PDF') THEN FALSE
            WHEN starts_with(raw, 'MLPDF') THEN FALSE
            ELSE TRUE END AS is_drm,
       CASE WHEN starts_with(raw, '%PDF') AND contains(raw, '/Encrypt') THEN 'binary_encrypt_flag'
            WHEN starts_with(raw, '%PDF') THEN 'opens_clean'
            WHEN starts_with(raw, 'MLPDF') THEN 'opens_clean'
            ELSE 'no_pdf_header' END AS method,
       CASE WHEN starts_with(raw, '%PDF') OR starts_with(raw, 'MLPDF') THEN 'high'
            ELSE 'medium' END AS confidence
FROM base
"""


# ===========================================================================
# F12/F13/J2 — strain normalize, judgment decode, positional pair match
# ===========================================================================

_STRAIN_INPUTS = [
    "E.coli", "Escherichia coli", "E. coli", "escherichia", "Pseudomonas aeruginosa",
    "Pseudomonas", "S.aureus", "Staphylococcus aureus", "Candida albicans", "Candida",
    "A.brasiliensis", "Aspergillus", "unknown bug", "E.COLI", "c. albicans",
]


def f12_strain_normalize(spark, sf_dir):
    """F12 — synonym-map normalize, Azure (''-on-miss) and Upstage
    (passthrough) variants side by side."""
    orders = load(spark, sf_dir, "orders")
    v = F.element_at(F.lit(_STRAIN_INPUTS), (F.col("o_orderkey") % len(_STRAIN_INPUTS)).cast("int") + 1)
    return orders.select(
        F.col("o_orderkey").alias("key"),
        v.alias("raw"),
        C.normalize_strain(v).alias("strain_azure"),
        C.normalize_strain(v, passthrough=True).alias("strain_upstage"),
    )


def _f12_sql() -> str:
    lits = ", ".join(_q(s) for s in _STRAIN_INPUTS)
    whens = "\n".join(
        f"WHEN contains(lower(raw), {_q(syn.lower())}) THEN {_q(canon)}"
        for syn, canon in banks.STRAIN_SYNONYMS
    )
    return f"""
WITH base AS (
  SELECT o_orderkey AS key,
         ([{lits}])[CAST(o_orderkey % {len(_STRAIN_INPUTS)} AS INT) + 1] AS raw
  FROM orders
)
SELECT key, raw,
       CASE {whens} ELSE '' END AS strain_azure,
       CASE {whens} ELSE raw END AS strain_upstage
FROM base
"""


_JUDGMENT_INPUTS = ["", "0", "X", "×", "V", "v", "0 :selected:", "부적합", "적합", "ok", "x"]


def f13_judgment(spark, sf_dir):
    """F13 — judgment decode (Azure variant: upper-cased scan incl. 부적합)."""
    orders = load(spark, sf_dir, "orders")
    v = F.element_at(F.lit(_JUDGMENT_INPUTS), (F.col("o_orderkey") % len(_JUDGMENT_INPUTS)).cast("int") + 1)
    return orders.select(
        F.col("o_orderkey").alias("key"), v.alias("raw"), C.extract_judgment(v).alias("judgment")
    )


def _f13_sql() -> str:
    lits = ", ".join(_q(s) for s in _JUDGMENT_INPUTS)
    fail = " OR ".join(
        [f"contains(upper({_sql_strip('raw')}), {_q(c)})" for c in banks.JUDGMENT_FAIL_CHARS]
        + [f"contains(upper({_sql_strip('raw')}), '부적합')"]
    )
    return f"""
WITH base AS (
  SELECT o_orderkey AS key,
         ([{lits}])[CAST(o_orderkey % {len(_JUDGMENT_INPUTS)} AS INT) + 1] AS raw
  FROM orders
)
SELECT key, raw,
       CASE WHEN raw IS NULL OR raw = '' THEN '적합'
            WHEN {fail} THEN '부적합' ELSE '적합' END AS judgment
FROM base
"""


def j2_pair_match(spark, sf_dir):
    """J2 — positional zip of two variable-length ID lists with one-sided
    surplus (`backend.py:584-625`): pure array algebra, no shuffle."""
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    n_tests = (k % 3 + 1).cast("int")
    n_prescs = (k % 4).cast("int")
    tests = F.transform(
        F.sequence(F.lit(1), n_tests), lambda i: F.concat(F.lit("T"), (k + i).cast("string"))
    )
    prescs = F.transform(
        F.sequence(F.lit(1), n_prescs), lambda i: F.concat(F.lit("P"), (k + i).cast("string"))
    )
    prescs = F.when(n_prescs > 0, prescs).otherwise(F.array().cast("array<string>"))
    pairs = F.zip_with(tests, prescs, lambda t, p: F.concat_ws(":", F.coalesce(t, F.lit("-")),
                                                               F.coalesce(p, F.lit("-"))))
    return orders.select(
        k.alias("key"), F.concat_ws(",", pairs).alias("pairs")
    )


J2_SQL = """
WITH base AS (
  SELECT o_orderkey AS key,
         CAST(o_orderkey % 3 + 1 AS INT) AS n_t,
         CAST(o_orderkey % 4 AS INT) AS n_p
  FROM orders
),
lists AS (
  SELECT key,
         list_transform(range(1, n_t + 1), i -> 'T' || CAST(key + i AS VARCHAR)) AS tests,
         CASE WHEN n_p > 0
              THEN list_transform(range(1, n_p + 1), i -> 'P' || CAST(key + i AS VARCHAR))
              ELSE [] END AS prescs
  FROM base
)
SELECT key,
       array_to_string(
         list_transform(range(1, greatest(len(tests), len(prescs)) + 1),
           i -> coalesce(tests[i], '-') || ':' || coalesce(prescs[i], '-')),
         ',') AS pairs
FROM lists
"""


# ===========================================================================
# registry
# ===========================================================================

REGISTRY: dict[str, tuple] = {
    # name: (spark_fn, oracle_sql_or_None)
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q3_top_orders": (q3_top_orders, Q3_SQL),
    "q5_region_revenue": (q5_region_revenue, Q5_SQL),
    "j1_enrich_broadcast": (j1_enrich_broadcast, J1_SQL),
    "a3_distinct_stats": (a3_distinct_stats, A3_SQL),
    "r3_pivot": (r3_pivot, R3_SQL),
    "w1_filldown": (w1_filldown, W1_SQL),
    "w4_running_count": (w4_running_count, W4_SQL),
    "w6_lag_blank": (w6_lag_blank, W6_SQL),
    "w7_fill_up_restore": (w7_fill_up_restore, W7_SQL),
    "sessionize": (sessionize, SESSIONIZE_SQL),
    "t_token_stats": (t_token_stats, T_TOKENS_SQL),
    "t_quality": (t_quality, T_QUALITY_SQL),
    "t_langid": (t_langid, T_LANGID_SQL),
    "t_fingerprint": (t_fingerprint, T_FINGERPRINT_SQL),
    "dedup_exact": (dedup_exact_q, DEDUP_EXACT_SQL),
    "dedup_minhash_lsh": (dedup_minhash_q, DEDUP_MINHASH_SQL),
    "dedup_clusters": (dedup_clusters_q, DEDUP_CLUSTERS_SQL),
    "dedup_ngram_jaccard": (dedup_ngram_q, DEDUP_NGRAM_SQL),
    "dedup_simhash": (dedup_simhash_q, DEDUP_SIMHASH_SQL),
    "dedup_embedding_cosine": (dedup_embedding_cosine_q, DEDUP_EMB_COSINE_SQL),
    "ann_brute_cosine_topk": (ann_brute_topk, ANN_BRUTE_SQL),
    "ann_lsh_cosine_topk": (ann_lsh_topk, ANN_LSH_SQL),
    "ann_ivf_cosine_topk": (ann_ivf_topk, ANN_IVF_SQL),
    "f6_f7_clean_chain": (f6_f7_clean_chain, None),  # SQL generated lazily
    "f20_log_convert": (f20_log_convert, None),
    "f3_id_extraction": (f3_id_extraction, None),
    "f17_date_ladder": (f17_date_ladder, F17_SQL),
    "f15_consecutive_dates": (f15_consecutive_dates, F15_SQL),
    "f16_date_parse": (f16_date_parse, None),  # SQL generated lazily
    "f12_strain_normalize": (f12_strain_normalize, None),
    "f13_judgment": (f13_judgment, None),
    "j2_pair_match": (j2_pair_match, J2_SQL),
    "s2_drm_detect": (s2_drm_detect, None),  # SQL generated lazily
    "j1_records_enrich": (j1_records_enrich, None),
    "r3_records_pivot": (r3_records_pivot, None),
}


def queries_dict():
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql_dict():
    out = {}
    for name, (_, sql) in REGISTRY.items():
        if sql is not None:
            out[name] = sql
    out["f6_f7_clean_chain"] = _f6_sql()
    out["f20_log_convert"] = _f20_sql()
    out["f3_id_extraction"] = _f3_sql()
    out["f12_strain_normalize"] = _f12_sql()
    out["f13_judgment"] = _f13_sql()
    out["s2_drm_detect"] = _s2_sql()
    out["f16_date_parse"] = _f16_sql()
    out["j1_records_enrich"] = _j1_records_sql()
    out["r3_records_pivot"] = _r3_records_sql()
    out["j4_template_cells"] = _j4_sql()
    out["j5_merge_edits"] = _j5_sql()
    return out


# ===========================================================================
# P1 — largest-table select; F14 — display validators
# ===========================================================================


def p1_largest_table(spark, sf_dir):
    """P1 — `max(tables, key=rows*cols)` (`backend_preservation.py:271`) as
    array algebra over synthesized per-page table-metadata arrays."""
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    n_tables = (k % 3 + 1).cast("int")
    tables = F.transform(
        F.sequence(F.lit(1), n_tables),
        lambda i: F.struct(
            ((k + i * 7) % 40 + 1).cast("int").alias("rows"),
            ((k + i * 3) % 9 + 1).cast("int").alias("cols"),
            i.cast("int").alias("table_idx"),
        ),
    )
    # max by rows*cols, first-wins on ties (mirror python max() semantics:
    # strictly-greater replaces, so the FIRST maximal element wins)
    best = F.aggregate(
        tables,
        F.expr("named_struct('rows', 0, 'cols', 0, 'table_idx', -1)"),
        lambda acc, t: F.when(
            t.getField("rows") * t.getField("cols") > acc.getField("rows") * acc.getField("cols"),
            t,
        ).otherwise(acc),
    )
    return orders.select(
        k.alias("key"),
        best.getField("rows").alias("best_rows"),
        best.getField("cols").alias("best_cols"),
        best.getField("table_idx").alias("best_idx"),
    )


P1_SQL = """
WITH base AS (
  SELECT o_orderkey AS key, CAST(o_orderkey % 3 + 1 AS INT) AS n_tables FROM orders
),
tables AS (
  SELECT key,
         list_transform(range(1, n_tables + 1),
           i -> {'rows': CAST((key + i * 7) % 40 + 1 AS INT),
                 'cols': CAST((key + i * 3) % 9 + 1 AS INT),
                 'table_idx': CAST(i AS INT)}) AS ts
  FROM base
),
best AS (
  SELECT key,
         list_reduce(ts,
           (acc, t) -> CASE WHEN t['rows'] * t['cols'] > acc['rows'] * acc['cols']
                            THEN t ELSE acc END) AS b
  FROM tables
)
SELECT key, b['rows'] AS best_rows, b['cols'] AS best_cols, b['table_idx'] AS best_idx
FROM best
"""


def f14_display_validators(spark, sf_dir):
    """F14 — display validators (`app.py:522-573`): missing → '❌';
    A.brasiliensis values get a '⚠️ ' prefix; save strips the marks."""
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    strain = F.element_at(
        F.lit(["E.coli", "A.brasiliensis", "S.aureus"]), (k % 3).cast("int") + 1
    )
    value = F.element_at(F.lit(["<10", "", "5.5×10^5", "<10^2"]), (k % 4).cast("int") + 1)
    display = (
        F.when(value == "", F.lit("❌"))
        .when(strain == "A.brasiliensis", F.concat(F.lit("⚠️ "), value))
        .otherwise(value)
    )
    stripped = F.trim(F.regexp_replace(display, "[❌⚠️]", ""))
    return orders.select(
        k.alias("key"), strain.alias("strain"), value.alias("value"),
        display.alias("display"), stripped.alias("saved"),
    )


F14_SQL = """
WITH base AS (
  SELECT o_orderkey AS key,
         (['E.coli','A.brasiliensis','S.aureus'])[CAST(o_orderkey % 3 AS INT) + 1] AS strain,
         (['<10','','5.5×10^5','<10^2'])[CAST(o_orderkey % 4 AS INT) + 1] AS value
  FROM orders
)
SELECT key, strain, value,
       CASE WHEN value = '' THEN '❌'
            WHEN strain = 'A.brasiliensis' THEN '⚠️ ' || value
            ELSE value END AS display,
       trim(regexp_replace(
         CASE WHEN value = '' THEN '❌'
              WHEN strain = 'A.brasiliensis' THEN '⚠️ ' || value
              ELSE value END, '[❌⚠️]', '', 'g')) AS saved
FROM base
"""

REGISTRY["p1_largest_table"] = (p1_largest_table, P1_SQL)
REGISTRY["f14_display_validators"] = (f14_display_validators, F14_SQL)


# ===========================================================================
# J4 — template-cell join; J5 — edit merge (`backend.py:1040-1115`,
# `app_preservation.py:693-704,846` — see operators/sheet.py)
# ===========================================================================


def j4_template_cells(spark, sf_dir):
    """J4 — kernel-extracted records placed at the reference's fixed
    template cell addresses (strain-row map + F20 log block), plus the
    date-cell block over a per-doc date ladder (date_7 blanked on a slice
    of docs to exercise the reference's ``if date_val`` skip)."""
    from micro_lab_ocr_spark.operators import sheet

    cells = sheet.template_cells(_flagship_records(spark, sf_dir))
    docs = load(spark, sf_dir, "documents")
    k = F.col("doc_id")
    d = C.date_ladder((k % 12 + 1).cast("int"), (k % 28 + 1).cast("int"))
    pages = docs.select(
        k.cast("long").alias("key"),
        d.getField("date_0").alias("date_0"),
        F.when(k % 5 != 0, d.getField("date_7")).alias("date_7"),
        d.getField("date_14").alias("date_14"),
        d.getField("date_28").alias("date_28"),
    )
    return cells.unionByName(sheet.template_dates(pages))


def _j4_sql() -> str:
    from micro_lab_ocr_spark.operators.sheet import (
        _CFU_FIELDS,
        _DATE_CELLS_LOG,
        _DATE_CELLS_ORIG,
        _DATE_FIELDS,
        _LOG_COLS,
        _ORIG_COLS,
        TEMPLATE_STRAIN_ROW,
    )

    idx = (
        "CASE strain "
        + " ".join(f"WHEN {_q(s)} THEN {i}" for s, i in TEMPLATE_STRAIN_ROW.items())
        + " END"
    )
    orig = ", ".join(
        f"{{'cell': '{c}' || CAST(idx + 20 AS VARCHAR), 'value': {f}}}"
        for c, f in zip(_ORIG_COLS, _CFU_FIELDS + ["judgment"])
    )
    logc = ", ".join(
        f"{{'cell': '{c}' || CAST(idx + 50 AS VARCHAR), 'value': {_sql_log(f)}}}"
        for c, f in zip(_LOG_COLS, _CFU_FIELDS)
    )
    dcells = ", ".join(
        f"{{'cell': '{cell}', 'value': {f}}}"
        for cells in (_DATE_CELLS_ORIG, _DATE_CELLS_LOG)
        for cell, f in zip(cells, _DATE_FIELDS)
    )
    return f"""
WITH {_records_sql_ctes()},
placed AS (
  SELECT key, u.cell AS cell, u.value AS value
  FROM (SELECT key, {idx} AS idx, cfu_0day, cfu_7day, cfu_14day, cfu_28day, judgment
        FROM recs) r,
       UNNEST([{orig}, {logc}]) AS t(u)
  WHERE idx IS NOT NULL
),
pages AS (
  SELECT doc_id AS key,
         make_date(2024, CAST(doc_id % 12 + 1 AS INT), CAST(doc_id % 28 + 1 AS INT)) AS d0
  FROM documents
),
dated AS (
  SELECT key,
         strftime(d0, '%m/%d') AS date_0,
         CASE WHEN key % 5 != 0 THEN strftime(d0 + INTERVAL 7 DAY, '%m/%d') END AS date_7,
         strftime(d0 + INTERVAL 14 DAY, '%m/%d') AS date_14,
         strftime(d0 + INTERVAL 28 DAY, '%m/%d') AS date_28
  FROM pages
),
dcells AS (
  SELECT key, u.cell AS cell, u.value AS value
  FROM dated, UNNEST([{dcells}]) AS t(u)
  WHERE u.value IS NOT NULL AND u.value != ''
)
SELECT key, cell, value FROM placed
UNION ALL
SELECT key, cell, value FROM dcells
"""


def j5_merge_edits(spark, sf_dir):
    """J5 — a user-edit frame (an edited E.coli row per doc_id%3==0 doc and
    a brand-new S.aureus row per doc_id%7==0 doc) overrides the kernel
    records by (key, strain) position via a broadcast anti-join."""
    from micro_lab_ocr_spark import spanspec
    from micro_lab_ocr_spark.operators import sheet

    recs = _flagship_records(spark, sf_dir)
    docs = load(spark, sf_dir, "documents")
    k = F.col("doc_id")

    def edit_rows(pred, test_prefix, strain, vals):
        return docs.where(pred).select(
            k.cast("long").alias("key"),
            F.concat(F.lit(test_prefix), k.cast("string")).alias("test_number"),
            F.lit("").alias("prescription_number"),
            F.lit(strain).alias("strain"),
            *[F.lit(v).alias(f) for f, v in zip(spanspec.RECORD_FIELDS[3:], vals)],
        )

    edited = edit_rows(k % 3 == 0, "ED", "E.coli",
                       ["1.0×10^3", "<10", "<10", "<10", "적합", "적합"])
    added = edit_rows(k % 7 == 0, "NEW", "S.aureus", ["", "", "", "", "", ""])
    return sheet.merge_edits(recs, edited.unionByName(added), on=["key", "strain"])


def _j5_sql() -> str:
    cols = ("key, test_number, prescription_number, strain, cfu_0day, "
            "cfu_7day, cfu_14day, cfu_28day, judgment, final_judgment")
    return f"""
WITH {_records_sql_ctes()},
edits AS (
  SELECT doc_id AS key, 'ED' || CAST(doc_id AS VARCHAR) AS test_number,
         '' AS prescription_number, 'E.coli' AS strain,
         '1.0×10^3' AS cfu_0day, '<10' AS cfu_7day, '<10' AS cfu_14day,
         '<10' AS cfu_28day, '적합' AS judgment, '적합' AS final_judgment
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT doc_id, 'NEW' || CAST(doc_id AS VARCHAR), '', 'S.aureus',
         '', '', '', '', '', ''
  FROM documents WHERE doc_id % 7 = 0
)
SELECT {cols} FROM recs r
WHERE NOT EXISTS (SELECT 1 FROM edits e WHERE e.key = r.key AND e.strain = r.strain)
UNION ALL
SELECT {cols} FROM edits
"""


REGISTRY["j4_template_cells"] = (j4_template_cells, None)  # SQL generated lazily
REGISTRY["j5_merge_edits"] = (j5_merge_edits, None)


# ===========================================================================
# T — deterministic stratified sampling; EMB — int8 quantization audit
# ===========================================================================


def t_sample_stratified(spark, sf_dir):
    """Deterministic md5-prefix sample (~10.2%) of the documents table,
    audited per language stratum — the resumable-job-safe replacement for
    ``TABLESAMPLE``/``rand()`` (operators/sampling.py). Map-side flag, one
    low-cardinality shuffle on the stratum key."""
    docs = load(spark, sf_dir, "documents")
    return sampling.stratified_sample_summary(
        docs, strata_col="lang", id_col="doc_id", threshold_hex="1a",
        measure_col="n_chars",
    )


T_SAMPLE_SQL = """
WITH flagged AS (
  SELECT lang, n_chars,
         substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a' AS f
  FROM documents
)
SELECT lang AS stratum,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN f THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       ROUND(AVG(CASE WHEN f THEN n_chars END), 2) AS sampled_mean
FROM flagged
GROUP BY lang
"""


def emb_quantize_int8(spark, sf_dir):
    """Int8 embedding quantization audit (operators/ann.quantize_int8):
    per-vector scale + exact integer checksum + sparsity + worst
    reconstruction error. The qvec itself stays library-side (arrays don't
    hash portably across engines); the audit columns pin the codes exactly
    via q_sum/n_zero."""
    emb = load(spark, sf_dir, "embeddings", spread=True)  # staged HOFs scale (A/B 0.19 vs 0.67 s)
    return ann.quantize_int8(emb, id_col="vec_id", vec_col="embedding").select(
        "vec_id", "absmax", "q_sum", "n_zero", "max_err"
    )


EMB_QUANTIZE_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec
  FROM embeddings
),
s AS (
  SELECT vec_id, vec, list_max(list_transform(vec, x -> abs(x))) AS am
  FROM v
),
q AS (
  SELECT vec_id, vec, am, am / 127.0 AS scale,
         list_transform(vec, x -> CASE WHEN am = 0 THEN CAST(0 AS BIGINT)
                                       ELSE CAST(round(x / (am / 127.0)) AS BIGINT) END) AS codes
  FROM s
)
SELECT vec_id,
       ROUND(am, 4) AS absmax,
       CAST(list_sum(codes) AS BIGINT) AS q_sum,
       CAST(len(list_filter(codes, c -> c = 0)) AS BIGINT) AS n_zero,
       ROUND(list_max(list_transform(range(1, len(vec) + 1),
             i -> abs(vec[i] - codes[i] * scale))), 4) AS max_err
FROM q
"""

REGISTRY["t_sample_stratified"] = (t_sample_stratified, T_SAMPLE_SQL)
REGISTRY["emb_quantize_int8"] = (emb_quantize_int8, EMB_QUANTIZE_SQL)
