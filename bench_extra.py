"""Per-query isolation bench (guide §1.4) — NOT the driver's frozen bench.py.

Times individual declared queries with the noop sink so the computation is
measured without the sink, and optionally dumps ``explain("formatted")`` for
each query to a directory (plans/r06/...). Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        --queries ann_brute_cosine_topk,emb_quantize_int8 --reps 2 \
        --explain-dir plans/r06 --explain-suffix _before

All numbers printed here are cited in OPTIMIZATION_r06.md; the round's
official numbers come from the driver's round-start bench.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default="",
                    help="comma list; empty = all headline queries + flagship")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--explain-suffix", default="")
    ap.add_argument("--explain-only", action="store_true")
    args = ap.parse_args()

    from micro_lab_ocr_spark import queries as Q
    from micro_lab_ocr_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = get_spark("bench-extra", parallelism=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    qd = Q.queries_dict()
    if args.queries:
        names = [n for n in args.queries.split(",") if n]
    else:
        import bench
        names = ["flagship_extract"] + bench.HEADLINE

    def build(name):
        if name == "flagship_extract":
            return Q.flagship_entry(spark, args.sf_dir)
        return qd[name](spark, args.sf_dir)

    if args.explain_dir:
        os.makedirs(args.explain_dir, exist_ok=True)
        for name in names:
            df = build(name)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.explain_dir, f"{name}{args.explain_suffix}.txt"), "w") as f:
                f.write(txt)
        print(f"wrote plans for {len(names)} queries to {args.explain_dir}",
              file=sys.stderr)
        if args.explain_only:
            spark.stop()
            return

    walls: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(args.reps):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}:rep{rep}")
            t0 = time.perf_counter()
            build(name).write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
    out = {
        "sf_dir": args.sf_dir,
        "cpus": cpus,
        "reps": args.reps,
        "min": {n: min(w) for n, w in walls.items()},
        "raw": walls,
        "total_min": round(sum(min(w) for w in walls.values()), 3),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
