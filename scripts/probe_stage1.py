"""Decompose stage-1 (tokens) scaling: which component stops scaling 2->8?

The full-build bench (scripts/bench_scaling.py) shows the tokens stage
scaling ~2x from local[2] to local[8] while the same tokenize kernel under
plain multiprocessing scales ~3.7x (mp_ceiling 0.92).  This probe runs the
stage's components CUMULATIVELY in one pinned child per level and times
each step, so the per-component delta is visible:

  scan        full corpus read + sum(length(content))    [JVM only]
  shuffle     + repartition(n_shards, shard)             [JVM shuffle]
  tokenize    + doc_tokens_df -> sum(doc_len)            [+ Python kernel]
  write       + sortWithinPartitions + partitionBy(shard)
                zstd parquet to tmpfs                    [+ sort + encode]

Usage:  python scripts/probe_stage1.py [--docs 1200000] [--pair 2,8]
Child:  taskset-pinned, heap = cores GB (same protocol as bench_scaling).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def child(args) -> None:
    from pyspark.sql import functions as F

    from engine.build import doc_tokens_df
    from engine.io import read_corpus, with_identity
    from engine.session import get_spark

    cores = args.cores
    local_dir = tempfile.mkdtemp(prefix="probe_local_", dir=SHM)
    spark = get_spark(
        f"probe_{cores}",
        cores=cores,
        extra_conf={
            "spark.local.dir": local_dir,
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cores}",
            "spark.sql.files.maxPartitionBytes": "16m",
        },
    )
    corpus = with_identity(read_corpus(spark, args.corpus))
    corpus.count()  # warm scan + JIT outside the timed steps
    t: dict[str, float] = {}

    t0 = time.perf_counter()
    corpus.agg(F.sum(F.length("content"))).collect()
    t["scan"] = round(time.perf_counter() - t0, 2)

    sharded = corpus.withColumn(
        "shard", F.pmod(F.xxhash64("doc_id"), F.lit(args.shards)).cast("int")
    ).repartition(args.shards, "shard")
    t0 = time.perf_counter()
    sharded.agg(F.sum(F.length("content"))).collect()
    t["shuffle"] = round(time.perf_counter() - t0, 2)

    toks = doc_tokens_df(
        sharded, use_stem=True,
        passthrough=["shard", "repo", "path", "content_sha256"],
    )
    t0 = time.perf_counter()
    toks.agg(F.sum("doc_len")).collect()
    t["tokenize"] = round(time.perf_counter() - t0, 2)

    out = tempfile.mkdtemp(prefix="probe_tokens_", dir=SHM)
    t0 = time.perf_counter()
    (
        toks.sortWithinPartitions("shard", "doc_id")
        .write.mode("overwrite").partitionBy("shard")
        .option("compression", "zstd").parquet(out)
    )
    t["write"] = round(time.perf_counter() - t0, 2)

    print("CHILD_RESULT " + json.dumps(t), flush=True)
    spark.stop()
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(local_dir, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_200_000)
    ap.add_argument("--shards", type=int, default=256)
    ap.add_argument("--pair", default="2,8")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()
    if args.child:
        child(args)
        return

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fixtures.gen_corpus import gen_corpus

    d = tempfile.mkdtemp(prefix="probe_corpus_", dir=SHM)
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

    lo, hi = (int(x) for x in args.pair.split(","))
    res = {}
    try:
        for cores in (lo, hi):
            env = dict(os.environ)
            env["SPARK_DRIVER_MEM"] = f"{cores}g"
            cmd = [
                sys.executable, os.path.abspath(__file__), "--child",
                "--cores", str(cores), "--corpus", corpus_path,
                "--shards", str(args.shards),
            ]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
            print(f"probing local[{cores}] ...", flush=True)
            p = subprocess.run(cmd, env=env, cwd=REPO, capture_output=True,
                               text=True, timeout=3600)
            for ln in p.stdout.splitlines():
                if ln.startswith("CHILD_RESULT "):
                    res[cores] = json.loads(ln[len("CHILD_RESULT "):])
                    break
            else:
                raise RuntimeError(p.stdout[-2000:] + p.stderr[-2000:])
            print(f"local[{cores}]: {res[cores]}", flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)

    print("\ncomponent | t_lo | t_hi | speedup (ideal %.1f)" % (hi / lo))
    for k in res[lo]:
        sp = res[lo][k] / res[hi][k] if res[hi][k] else float("inf")
        print(f"{k:9s} | {res[lo][k]:7.1f} | {res[hi][k]:7.1f} | {sp:.2f}x")


if __name__ == "__main__":
    main()
