"""Interleaved same-session A/B for the r3 WAND bench regression
(VERDICT r3 What's-wrong #2 / Next-round #3).

BENCH_r03 showed bm25_wand_* 1.27-1.31x slower than r02, but round 3
also added exactly two things to this path: eps-aware θ-pruning
(engine/wand.py) and the in-job idf broadcast join (engine/index.py
_qtf_topk). This script separates code from host-steal with the same
protocol used to exonerate fusion_topk in r3 (BENCH/BASELINE.md): all
variants interleaved in ONE session on ONE index, so any steal window
hits them equally.

Variants (identical ranked output, checked once):
  A  serving shape  — eps-aware pruning ON (round_scores=6) + in-job
                      idf broadcast join (the r3 code)
  B  eps off        — same in-job idf join, round_scores=None (the
                      eps-pruning delta in isolation)
  C  r2 shape       — driver-side idf collect round-trip, weights in
                      the kernel closure, eps=0 (the exact pre-r3 plan)

Usage: python scripts/ab_wand.py [--docs 600000] [--cores 32] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()

QUERIES = [
    "inverted index compression",
    "posting list merge",
    "query scan",
    "distributed merge sort",
]


def bm25_topk_r2shape(reader, query: str, k: int = 10):
    """The pre-r3 query plan: idf fetched by a separate driver collect
    (the query_weights round-trip r3 removed), weights captured in the
    kernel closure, no eps relaxation."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from engine.tokenizer import tokenize

    qtf = Counter(tokenize(query, use_stem=reader.use_stem))
    terms = list(qtf)
    stats = reader.manifest["stats"]
    n, avgdl = stats["n_docs"], stats["avgdl"]
    rows = (
        reader.dictionary().where(F.col("term").isin(terms))
        .select("term", "df").collect()
    )
    weights = {
        r["term"]: float(qtf[r["term"]])
        * math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
        for r in rows
    }
    k_ = k

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        from engine.wand import topk_shard

        ids, sc = topk_shard(pdf, weights, avgdl, k_, prune=True, eps=0.0)
        return pd.DataFrame({"doc_id": ids, "score": sc})

    blocks = reader.postings().where(F.col("term").isin(terms))
    per_shard = blocks.groupBy("shard").applyInPandas(
        kern, "doc_id long, score double"
    )
    topk = per_shard.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=600_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--shards", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.index import IndexReader, build_index
    from engine.io import read_corpus, with_identity
    from engine.session import get_spark
    from fixtures.gen_corpus import gen_corpus

    d = tempfile.mkdtemp(prefix="ab_corpus_", dir=SHM)
    corpus_path = os.path.join(d, "corpus.parquet")
    os.makedirs(corpus_path, exist_ok=True)
    print(f"generating {args.docs} docs ...", flush=True)
    pdf = gen_corpus(args.docs)
    n_files = 32
    step = (len(pdf) + n_files - 1) // n_files
    for i in range(n_files):
        part = pdf.iloc[i * step:(i + 1) * step]
        if len(part):
            pq.write_table(
                pa.Table.from_pandas(part, preserve_index=False),
                os.path.join(corpus_path, f"part-{i:03d}.parquet"),
                row_group_size=4096,
            )
    del pdf

    local_dir = tempfile.mkdtemp(prefix="ab_local_", dir=SHM)
    spark = get_spark(
        "ab_wand", cores=args.cores,
        extra_conf={
            "spark.local.dir": local_dir,
            "spark.sql.files.maxPartitionBytes": "16m",
        },
    )
    idx_dir = tempfile.mkdtemp(prefix="ab_idx_", dir=SHM)
    try:
        corpus = with_identity(read_corpus(spark, corpus_path))
        build_index(
            spark, corpus, idx_dir, use_stem=False,
            n_shards=args.shards, n_chunks=2,
        )
        reader = IndexReader(spark, idx_dir, cache=True)
        reader.bm25_topk(QUERIES[0], 10).collect()  # warm cache

        variants = {
            "A_eps_idfjoin": lambda q: reader.bm25_topk(q, 10, round_scores=6),
            "B_noeps_idfjoin": lambda q: reader.bm25_topk(q, 10),
            "C_r2_collect_noeps": lambda q: bm25_topk_r2shape(reader, q, 10),
        }
        # rank identity across variants (once, untimed)
        for q in QUERIES:
            ranked = {
                name: [r["doc_id"] for r in fn(q).collect()]
                for name, fn in variants.items()
            }
            base = ranked["A_eps_idfjoin"]
            assert all(v == base for v in ranked.values()), (q, ranked)
        print("rank identity across variants: OK", flush=True)

        times: dict[str, list[float]] = {v: [] for v in variants}
        for rep in range(args.reps):
            for name, fn in variants.items():  # interleaved
                t0 = time.perf_counter()
                for q in QUERIES:
                    fn(q).collect()
                times[name].append(round(time.perf_counter() - t0, 3))
            print(f"rep {rep}: " + json.dumps({v: times[v][-1] for v in times}),
                  flush=True)
    finally:
        spark.stop()
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(local_dir, ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)

    rep = {
        "metric": "ab_wand_eps_idf",
        "docs": args.docs,
        "cores": args.cores,
        "reps": args.reps,
        "per_variant_sec_4q": times,
        "min_sec": {v: min(t) for v, t in times.items()},
        "median_sec": {v: sorted(t)[len(t) // 2] for v, t in times.items()},
    }
    print(json.dumps(rep))
    stamp = time.strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## WAND eps/idf A/B ({args.docs} docs, local[{args.cores}], "
            f"{stamp}, interleaved, 4 queries per timing)\n\n"
            "| variant | min | median | all reps |\n|---|---|---|---|\n"
            + "".join(
                f"| {v} | {min(t):.3f} | {sorted(t)[len(t)//2]:.3f} | {t} |\n"
                for v, t in times.items()
            )
        )


if __name__ == "__main__":
    main()
