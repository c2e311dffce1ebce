"""Interleaved same-session A/B for filtered_topk's round-4 upgrade
(filter-aware keep-mask WAND vs the r3 exhaustive-then-join shape),
with unfiltered WAND as the yardstick — the VERDICT r3 #4 done
condition is "filtered within ~1.2x of unfiltered WAND at 1.2M docs",
which single-shot cross-window numbers cannot establish on this host
(documented steal windows scale every surface by up to ~1.6x).

Variants, all rank-identical (checked in-run):
  W  unfiltered WAND      reader.bm25_topk (the yardstick)
  N  new filtered         reader.filtered_topk (keep-mask kernel)
  O  r3 filtered shape    exhaustive bm25_scores_all + semi-join on
                          sigma(doc_stats) (reconstructed here)
Two filters: broad (repo equality, ~1/n_repos of the corpus — the
keep-mask's worst case) and narrow (path_prefix point filter — where
block skipping shines).

Usage: python scripts/ab_filtered.py [--docs 1200000] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
Q = "inverted index compression"


def filtered_r3shape(reader, query, k=10, repo=None, path_prefix=None):
    """The pre-round-4 plan: exhaustive union scoring (no theta), then
    a semi-join with the filtered doc_stats projection."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    scored = reader._live(reader.bm25_scores_all(query))
    keep = reader.doc_stats()
    if repo is not None:
        keep = keep.where(F.col("repo") == repo)
    if path_prefix is not None:
        keep = keep.where(F.col("path").startswith(path_prefix))
    scored = scored.join(keep.select("doc_id"), "doc_id")
    topk = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "score"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_200_000)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--shards", type=int, default=256)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.index import IndexReader, build_index
    from engine.io import read_corpus, with_identity
    from engine.session import get_spark
    from fixtures.gen_corpus import gen_corpus

    d = tempfile.mkdtemp(prefix="abf_corpus_", dir=SHM)
    corpus_path = os.path.join(d, "corpus.parquet")
    os.makedirs(corpus_path, exist_ok=True)
    print(f"generating {args.docs} docs ...", flush=True)
    pdf = gen_corpus(args.docs)
    n_files = 64
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

    local_dir = tempfile.mkdtemp(prefix="abf_local_", dir=SHM)
    spark = get_spark(
        "ab_filtered", cores=args.cores,
        extra_conf={
            "spark.local.dir": local_dir,
            "spark.sql.files.maxPartitionBytes": "16m",
        },
    )
    idx_dir = tempfile.mkdtemp(prefix="abf_idx_", dir=SHM)
    try:
        corpus = with_identity(read_corpus(spark, corpus_path))
        build_index(
            spark, corpus, idx_dir, use_stem=False,
            n_shards=args.shards, n_chunks=2,
        )
        reader = IndexReader(spark, idx_dir, cache=True)
        reader.bm25_topk(Q, 10).collect()  # warm

        narrow_path = "src/dir4/"  # prefix matching a small slice
        cases = {
            "W_unfiltered_wand": lambda: reader.bm25_topk(Q, 10),
            "N_filtered_broad": lambda: reader.filtered_topk(
                Q, 10, repo="org1/repo1"),
            "O_r3_broad": lambda: filtered_r3shape(
                reader, Q, 10, repo="org1/repo1"),
            "N_filtered_narrow": lambda: reader.filtered_topk(
                Q, 10, path_prefix=narrow_path),
            "O_r3_narrow": lambda: filtered_r3shape(
                reader, Q, 10, path_prefix=narrow_path),
        }
        # rank identity new-vs-old per filter (once, untimed)
        for fnew, fold in [("N_filtered_broad", "O_r3_broad"),
                           ("N_filtered_narrow", "O_r3_narrow")]:
            a = [r["doc_id"] for r in cases[fnew]().collect()]
            b = [r["doc_id"] for r in cases[fold]().collect()]
            assert a == b, (fnew, a, b)
        print("rank identity new vs r3 shape: OK", flush=True)

        times: dict[str, list[float]] = {c: [] for c in cases}
        for rep in range(args.reps):
            for name, fn in cases.items():  # interleaved
                t0 = time.perf_counter()
                fn().collect()
                times[name].append(round(time.perf_counter() - t0, 3))
            print(f"rep {rep}: " + json.dumps({c: times[c][-1] for c in times}),
                  flush=True)
    finally:
        spark.stop()
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(local_dir, ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)

    rep = {
        "metric": "ab_filtered",
        "docs": args.docs,
        "cores": args.cores,
        "reps": args.reps,
        "per_case_sec": times,
        "min_sec": {c: min(t) for c, t in times.items()},
        "median_sec": {c: sorted(t)[len(t) // 2] for c, t in times.items()},
    }
    print(json.dumps(rep))
    stamp = time.strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## filtered_topk A/B ({args.docs} docs, local[{args.cores}], "
            f"{stamp}, interleaved)\n\n"
            "| case | min | median | all reps |\n|---|---|---|---|\n"
            + "".join(
                f"| {c} | {min(t):.3f} | {sorted(t)[len(t)//2]:.3f} | {t} |\n"
                for c, t in times.items()
            )
        )


if __name__ == "__main__":
    main()
