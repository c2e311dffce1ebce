"""spark-submit entrypoint: batch query-set evaluation (SURVEY.md §3.3).

    spark-submit --py-files ... run_queries.py --index /index/dir \
        --queries fixtures/queries.json [--k 10] [--out results.parquet]

Prints per-query top-k and (optionally) writes a tagged union parquet
(query_id, rank, doc_id, score) — the golden-comparison shape
(FIXTURES.md §3).

With ``--golden golden.parquet --metrics`` the run is scored against
the golden frame with precision@k / MAP@40 (engine/metrics.py — the
reference family's evaluation idiom, SURVEY.md §5.1) and a one-line
JSON metrics report is printed.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--exhaustive", action="store_true")
    ap.add_argument("--batch", action="store_true",
                    help="evaluate the whole query set in one Spark job")
    ap.add_argument("--cores", default=None)
    ap.add_argument("--golden", default=None,
                    help="golden (query_id, rank, doc_id, score) parquet")
    ap.add_argument("--metrics", action="store_true",
                    help="score the run vs --golden: precision@k, MAP@40")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from engine.session import get_spark
    from engine.index import IndexReader

    spark = get_spark("run_queries", cores=args.cores)
    reader = IndexReader(spark, args.index)
    with open(args.queries) as f:
        queries = json.load(f)

    def _report_metrics(run_pdf) -> None:
        if not (args.metrics and args.golden):
            return
        import pandas as pd

        from engine.metrics import evaluate_run

        golden = pd.read_parquet(args.golden)
        rep = evaluate_run(run_pdf, golden, k=args.k)
        print("metrics:", json.dumps(rep))

    if args.batch:
        # one job for the whole set (SURVEY.md §3.3) — amortizes the
        # fixed per-job cost that dominates single-query latency
        qmap = {str(q["query_id"]): q["text"] for q in queries}
        t = time.perf_counter()
        df = reader.bm25_topk_batch(qmap, args.k, prune=not args.exhaustive)
        n = df.count()
        dt = time.perf_counter() - t
        print(
            f"batch: {len(qmap)} queries in {dt:.2f}s "
            f"({len(qmap)/dt:.1f} q/s), {n} result rows"
        )
        if args.out:
            df.write.mode("overwrite").parquet(args.out)
            print("wrote", args.out)
        _report_metrics(df.toPandas())
        return

    results = []
    for q in queries:
        t = time.perf_counter()
        df = reader.bm25_topk(q["text"], args.k, prune=not args.exhaustive)
        rows = df.collect()
        dt = time.perf_counter() - t
        print(f"[{q['query_id']}] {q['text']!r} k={args.k} {dt*1e3:.0f}ms "
              f"-> {[(r['doc_id'], round(r['score'], 4)) for r in rows[:3]]}...")
        results.append(df.withColumn("query_id", F.lit(q["query_id"])))

    if results and (args.out or (args.metrics and args.golden)):
        union = results[0]
        for r in results[1:]:
            union = union.unionByName(r)
        union = union.select("query_id", "rank", "doc_id", "score")
        if args.out:
            union.write.mode("overwrite").parquet(args.out)
            print("wrote", args.out)
        _report_metrics(union.toPandas())


if __name__ == "__main__":
    main()
