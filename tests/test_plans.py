"""Physical-plan audits (SURVEY §4): the optimizations we rely on at 100 TB
must actually appear in the plan — pinned here so regressions are loud.

* filter pushdown reaches the parquet scan (PushedFilters),
* column pruning reaches the scan (ReadSchema ⊂ table schema),
* dimension joins broadcast (BroadcastHashJoin),
* the grid-extraction DAG reuses ONE repartition exchange (ReusedExchange),
* no row-at-a-time Python UDFs anywhere (BatchEvalPython absent),
* cleaner banks stay inside WholeStageCodegen.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import micro_lab_ocr_spark.queries as Q

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_filter_pushdown_and_pruning(spark):
    df = Q.q1_pricing_summary(spark, SF)
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the 5 needed columns are read, not all 11
    assert "l_partkey" not in plan.split("ReadSchema")[1][:400]


def test_q5_broadcasts_small_dims(spark):
    plan = plan_of(Q.q5_region_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2  # nation & region broadcast


def test_j1_broadcast(spark):
    plan = plan_of(Q.j1_enrich_broadcast(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_no_row_python_udfs_anywhere(spark):
    """North-rule: no per-row Python. BatchEvalPython = row UDF; the only
    Python nodes allowed are Arrow-vectorized (MapInPandas / ArrowEval)."""
    for name, fn in Q.queries_dict().items():
        plan = plan_of(fn(spark, SF))
        assert "BatchEvalPython" not in plan, f"row-wise Python UDF in {name}"
    entry_plan = plan_of(Q.flagship_entry(spark, SF))
    assert "BatchEvalPython" not in entry_plan


def test_grid_extract_no_extra_shuffles(spark):
    """Every groupBy/window/join in the grid DAG reuses the page-key
    partitioning (requireAllClusterKeysForCoPartition=false): zero
    ENSURE_REQUIREMENTS exchanges — the only shuffles are the explicit
    page repartitions (one per self-join branch)."""
    from micro_lab_ocr_spark.operators import grid_extract
    from micro_lab_ocr_spark.sources import fixtures
    import random

    rng = random.Random(3)
    rows = [(f"g{i}", 0, [tuple(c) for c in fixtures.make_grid(rng)]) for i in range(4)]
    df = spark.createDataFrame(
        rows, "doc_id string, offset int, cells array<struct<row:int,col:int,text:string>>"
    )
    records, pages = grid_extract.extract(df)
    records.write.format("noop").mode("overwrite").save()  # materialize w/ AQE
    plan = plan_of(records)
    assert plan.count("ENSURE_REQUIREMENTS") == 0, "unexpected implicit re-shuffle"
    assert plan.count("REPARTITION_BY_NUM") >= 1
    # the records path computes ALL page metadata (header detect, column
    # map, spec vote) as window aggregates over the single page partitioning
    # — a join would mean a branch re-reading the cells exchange (measured
    # ~6x read amplification before the window rewrite)
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join_op not in plan, f"{join_op} crept back into the records DAG"


def test_extract_page_lines_fused_single_pass(spark):
    """The production grid consumer (extract_page_lines) must stay FUSED:
    one page-key exchange with ONE consumer — per-row window enrichment
    feeding a single final groupBy(page). The previous two-consumer shape
    (records→page_text groupBy ⋈ pages groupBy) read the exchange twice and
    ran the cells→rows aggregate twice (654 MB shuffle read vs 338 MB
    written on the scaling corpus, in the stage that caps scaling
    efficiency — BENCH/BASELINE.md)."""
    from micro_lab_ocr_spark.operators import grid_extract
    from micro_lab_ocr_spark.sources import fixtures
    import random

    rng = random.Random(7)
    rows = [(f"g{i}", 0, [tuple(c) for c in fixtures.make_grid(rng)]) for i in range(4)]
    df = spark.createDataFrame(
        rows, "doc_id string, offset int, cells array<struct<row:int,col:int,text:string>>"
    )
    paged = grid_extract.extract_page_lines(df)
    paged.write.format("noop").mode("overwrite").save()  # materialize w/ AQE
    plan = plan_of(paged)
    assert plan.count("ENSURE_REQUIREMENTS") == 0, "unexpected implicit re-shuffle"
    assert plan.count("REPARTITION_BY_NUM") == 1, "page-key exchange must be single"
    assert "ReusedExchange" not in plan, "exchange consumed twice — fusion regressed"
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join_op not in plan, f"{join_op} crept back into the fused grid DAG"
    # exactly ONE cells→rows aggregate pair (partial+final ObjectHashAggregate
    # on (page, row)) and one final page aggregate — no duplicated rollup
    assert plan.count("ObjectHashAggregate") <= 4, "duplicated rollup aggregate"


def test_ngram_jaccard_is_hash_join(spark):
    """The length-band pairing must plan as an equi hash join on the block
    key — never a BroadcastNestedLoopJoin / cartesian (O(n²) at scale)."""
    plan = plan_of(Q.dedup_ngram_q(spark, SF))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_no_window_over_shingles(spark):
    """The bucket-size guard must count on a (bucket)-only projection — a
    Window over rows carrying the shingle arrays would shuffle the dominant
    payload bytes twice."""
    plan = plan_of(Q.dedup_minhash_q(spark, SF))
    assert "Window" not in plan


def test_embedding_pairs_single_shuffle_no_broadcast(spark):
    """The exact cosine triangle-grid must move vectors through exactly ONE
    hash shuffle (the pa/pb groupBy) — no broadcast (the corpus must never
    sit on the driver or whole on an executor), no join, and no second
    exchange repacking block rows (the round-3 shape double-evaluated a
    collect_list aggregate through two shuffle joins + a repartition and
    cost 10× on the bench)."""
    plan = plan_of(Q.dedup_embedding_cosine_q(spark, SF))
    assert "BroadcastExchange" not in plan
    assert "Join" not in plan
    assert plan.count("Exchange") - plan.count("ReusedExchange") == 1


def test_cleaners_stay_jvm_side(spark):
    """F-banks must be pure Catalyst expressions — no Python nodes at all.

    Note: the let()-bound chains use higher-order functions, which Catalyst
    evaluates interpreted (outside WholeStageCodegen) — the deliberate trade
    for linear plan size (see functions.cleaners.let). Simple regex queries
    (f17 ladder) still codegen."""
    plan = plan_of(Q.f6_f7_clean_chain(spark, SF))
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
    assert "Project" in plan
    df17 = Q.f17_date_ladder(spark, SF)
    df17.collect()  # materialize: the spread scan makes this an AQE plan,
    # whose pre-execution string hides WholeStageCodegen markers
    plan17 = plan_of(df17)
    assert "*(1)" in plan17  # the WholeStageCodegen stage marker


def test_shuffle_refs_media_join_content_stationary(spark, tmp_path):
    """media_join="shuffle_refs" over a bucketed media table: identical
    results to broadcast mode, NO broadcast of the span-ref projections, and
    the media side of the decode joins plans NO exchange (content bytes stay
    in the scan stage — only narrow ref rows cross the wire)."""
    from micro_lab_ocr_spark.oracle import extract as ox
    from micro_lab_ocr_spark.pipeline.extract import normalize_spans
    from micro_lab_ocr_spark.sources import catalog, fixtures

    docs, media, _ = fixtures.generate_corpus(n_docs=25, seed=11)
    docs_df = spark.createDataFrame(
        [(d["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
         for d in docs],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    media_df = spark.createDataFrame(
        [(m["media_ref"], bytearray(m["content"])) for m in media],
        "media_ref string, content binary",
    )
    bucketed = catalog.write_media_bucketed(
        spark, media_df, "media_bkt_test", str(tmp_path / "media_bkt"), n_buckets=4
    )
    try:
        # turn off auto-broadcast so small test sizes don't re-introduce a
        # BroadcastExchange that would vanish at scale anyway
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            out = normalize_spans(docs_df, bucketed, media_join="shuffle_refs")
            plan = plan_of(out)
            assert "BroadcastExchange" not in plan
            # the bucketed media scans feed their joins without an exchange:
            # every Exchange in the plan partitions on doc_id/page keys or
            # the narrow ref projection — never a plan where the scan of the
            # bucketed table is a child of an Exchange. Bucketed scans print
            # "SelectedBucketsCount"; assert none sits under an Exchange by
            # checking the textual plan has bucketed scans at all and that
            # the number of exchanges over 'content' is zero.
            assert "SelectedBucketsCount" in plan  # bucketed scan used
            for frag in plan.split("Exchange hashpartitioning")[1:]:
                head = frag[:300]
                assert "content" not in head.split("\n")[0], "content column shuffled"
            got = {r["doc_id"]: [s.asDict() for s in r["spans"]] for r in out.collect()}
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        media_map = {m["media_ref"]: m["content"] for m in media}
        for d in docs:
            assert got[d["doc_id"]] == ox.normalize_document(d["doc_id"], d["spans"], media_map)
    finally:
        spark.sql("DROP TABLE IF EXISTS media_bkt_test")


def test_image_kernel_evaluates_once(spark):
    """The OCR kernel must decode each media row exactly ONCE at runtime.
    Exchange reuse is fragile: consumers that prune different columns (or
    acquire different inferred not-null filters) canonicalize to DIFFERENT
    exchanges and silently re-run the kernel per branch — measured 3x media
    decodes before the passthrough-keys structure (pipeline/extract.py,
    grid_extract.extract). Counted with an accumulator, not plan text,
    because AQE prints reused stages with their full subtree."""
    from micro_lab_ocr_spark.pipeline import extract as px
    from micro_lab_ocr_spark.sources import fixtures

    acc = spark.sparkContext.accumulator(0)
    orig = px._ocr_grids

    def counting(it):
        def gen():
            for pdf in it:
                acc.add(len(pdf))
                yield pdf
        return orig(gen())

    docs, media, _ = fixtures.generate_corpus(n_docs=12, seed=5)
    docs_df = spark.createDataFrame(
        [(d["doc_id"], [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]])
         for d in docs],
        "doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    media_df = spark.createDataFrame(
        [(m["media_ref"], bytearray(m["content"])) for m in media],
        "media_ref string, content binary",
    )
    media_map = {m["media_ref"]: m["content"] for m in media}
    expected = sum(
        1 for d in docs for s in d["spans"]
        if s["kind"] == "image" and media_map.get(s["media_ref"]) is not None
        and (media_map[s["media_ref"]].startswith(b"MLIMG")
             or media_map[s["media_ref"]].startswith(b"\x89PNG")
             or media_map[s["media_ref"]].startswith(b"\xff\xd8\xff"))
    )
    assert expected > 0
    old = px._ocr_grids
    px._ocr_grids = counting
    try:
        out = px.normalize_spans(docs_df, media_df)
        out.collect()
    finally:
        px._ocr_grids = old
    assert acc.value == expected, (
        f"OCR kernel processed {acc.value} rows for {expected} media rows — "
        "a consumer branch re-evaluates the decode stage"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
