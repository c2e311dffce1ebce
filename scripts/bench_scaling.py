"""N-vs-4N scaling-efficiency evidence (BASELINE.md sandbox protocol).

Runs the SAME index build on the SAME generated corpus at local[8] and
local[32], reports docs/sec at both and
efficiency = (tput@32 / tput@8) / 4. Appends results to
BENCH/BASELINE.md.

Protocol decisions (each mirrors what a real N->4N cluster provides,
so the measurement isolates the JOB's scaling behavior from sandbox
artifacts):

- **Separate process per parallelism level.** PySpark reuses the first
  session's JVM; a shared heap would give both levels identical memory
  and carry JIT/page-cache state between runs.
- **Memory proportional to cores** (driver/executor heap = 1g/core).
  4N executors bring 4x aggregate memory; pinning both levels to one
  heap size makes the wide run GC-bound and measures nothing real.
- **tmpfs (/dev/shm) for corpus, index output, and spark.local.dir.**
  The sandbox has ONE shared virtio disk; real clusters add disks with
  nodes. On ext4 the tokenize+checkpoint stage took 2.7x LONGER at
  local[32] than local[8] purely from disk-queue contention.
- **Same input, same code, same shard/chunk config** at both levels.

Usage:
    python scripts/bench_scaling.py [--docs 600000] [--shards 64] [--chunks 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SHM = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()


def _shm_dir(prefix: str) -> str:
    return tempfile.mkdtemp(prefix=prefix + "_", dir=SHM)


def child(args) -> None:
    """One build + query-latency measurement at one parallelism level;
    prints a single JSON line for the parent."""
    from engine.session import get_spark
    from engine.io import read_corpus, with_identity
    from engine.index import IndexReader, build_index

    cores = args.cores
    local_dir = _shm_dir("spark_local")
    spark = get_spark(
        f"scaling_{cores}",
        cores=cores,
        extra_conf={
            "spark.local.dir": local_dir,
            # size GC/compiler/netty pools for the pinned cpuset, not
            # the host's 32 vCPUs (a 2-cpu cpuset with 23 GC threads
            # thrashes; a containerized executor JVM sees this value
            # from its cgroup automatically)
            "spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cores}",
            # Spark bin-packs small input files up to maxPartitionBytes
            # per split: at the 128m default the ~540 MB corpus scans
            # ~5-wide no matter how many files it has, starving the
            # wide level's first stage. 16m ≈ 34 splits — proportional
            # parallelism at every level in the pair.
            "spark.sql.files.maxPartitionBytes": "16m",
        },
    )
    corpus = with_identity(read_corpus(spark, args.corpus))
    n_docs = corpus.count()  # warm the scan outside the timed window
    idx_dir = _shm_dir(f"scaling_idx_{cores}")
    t = time.perf_counter()
    reader = build_index(
        spark, corpus, idx_dir, use_stem=True,
        n_shards=args.shards, n_chunks=args.chunks,
    )
    dt = time.perf_counter() - t

    # query latencies — warm-serving protocol: postings+dictionary
    # cached (the reference serves pickled dicts from RAM), one untimed
    # warmup query to materialize the cache
    import pathlib

    reader2 = IndexReader(spark, idx_dir, cache=True)
    queries = json.loads(
        (pathlib.Path(REPO) / "fixtures" / "queries.json").read_text()
    )
    reader2.bm25_topk(queries[0]["text"], 10).collect()
    lat = []
    for q in queries[:15]:
        t0 = time.perf_counter()
        reader2.bm25_topk(q["text"], 10).collect()
        lat.append(time.perf_counter() - t0)

    out = {
        "build_sec": round(dt, 2),
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / dt, 1),
        "p50_ms": round(statistics.median(lat) * 1e3, 1),
        "p95_ms": round(sorted(lat)[int(0.95 * len(lat)) - 1] * 1e3, 1),
        "stage_times": reader.manifest.get("stage_times", {}),
    }
    print("CHILD_RESULT " + json.dumps(out), flush=True)
    spark.stop()
    shutil.rmtree(idx_dir, ignore_errors=True)
    shutil.rmtree(local_dir, ignore_errors=True)


def run_child(cores: int, corpus_path: str, shards: int, chunks: int) -> dict:
    env = dict(os.environ)
    env["SPARK_DRIVER_MEM"] = f"{cores}g"  # heap scales with cores, like a cluster
    # Pin the whole child tree (JVM task threads + GC/netty pools +
    # Python workers) to exactly `cores` CPUs — the cpuset a cluster
    # container gives an N-core executor. Without it local[N] leaks
    # extra parallelism into the narrow baseline (measured: the
    # "local[2]" child consumed 2.6-3 cores steady, 5.6 peak, because
    # 2 task threads pipeline with 2 Python workers + GC), which
    # violates the N-vs-4N premise the north rule measures.
    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--child", "--cores", str(cores), "--corpus", corpus_path,
        "--shards", str(shards), "--chunks", str(chunks),
    ]
    if shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cores - 1}"] + cmd
    proc = subprocess.run(
        cmd, env=env, cwd=REPO, capture_output=True, text=True, timeout=3600,
    )
    for ln in proc.stdout.splitlines():
        if ln.startswith("CHILD_RESULT "):
            return json.loads(ln[len("CHILD_RESULT "):])
    raise RuntimeError(
        f"child local[{cores}] produced no result\nstdout:\n{proc.stdout[-2000:]}"
        f"\nstderr:\n{proc.stderr[-2000:]}"
    )


def _mp_work(args):
    (docs,) = args
    import pandas as pd

    from engine.tokenizer import term_frequencies

    return len(term_frequencies(pd.Series(docs), use_stem=True))


def mp_ceiling(lo: int, hi: int, n_docs: int = 300_000) -> dict:
    """Same-hour hardware ceiling: the engine's own tokenize kernel
    under plain multiprocessing.Pool (no Spark) at the same core pair.
    The VM's steal/bandwidth state drifts hour to hour (measured 0.84
    one session, 0.71 another), so the Spark efficiency number is only
    interpretable against a ceiling measured in the SAME window."""
    import multiprocessing as mp

    from fixtures.gen_corpus import gen_corpus

    texts = gen_corpus(n_docs)["content"].tolist()
    chunks = [(texts[i:i + 500],) for i in range(0, len(texts), 500)]
    times: dict[int, list[float]] = {lo: [], hi: []}
    for _ in range(2):
        for procs in (lo, hi):
            with mp.Pool(procs) as p:
                t = time.perf_counter()
                p.map(_mp_work, chunks, chunksize=1)
                times[procs].append(time.perf_counter() - t)
    eff = (min(times[lo]) / min(times[hi])) / (hi / lo)
    return {
        f"t{lo}": round(min(times[lo]), 1),
        f"t{hi}": round(min(times[hi]), 1),
        "ceiling_eff": round(eff, 3),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=600_000)
    ap.add_argument("--shards", type=int, default=256)
    ap.add_argument("--chunks", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--pair", default="8,32",
                    help="N,4N core counts, e.g. 4,16 or 8,32")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()

    if args.child:
        child(args)
        return

    from fixtures.gen_corpus import gen_corpus
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = _shm_dir("scaling_corpus")
    corpus_path = os.path.join(d, "corpus.parquet")
    print(f"generating {args.docs} docs ...", flush=True)
    # Write the corpus as MANY files (a 1.2M-doc corpus is ~540 MB; one
    # file = ~5 scan splits at the 128 MB default, so the scan +
    # shuffle-write stage of the build — fingerprint, identity hash,
    # corpus exchange — ran ~5-wide regardless of cores, capping the
    # wide level. Real 100 TB inputs are thousands of files; 64 files
    # restores input parallelism at every level we measure.)
    os.makedirs(corpus_path, exist_ok=True)
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
    assert hi == 4 * lo, "pair must be N,4N"
    # interleave repeats and keep each level's FASTEST run: the host VM
    # shows sporadic one-sided steal/contention events (identical
    # configs measured 0.50-0.73 efficiency run-to-run); min-time per
    # level removes one-sided noise without favoring either level
    results = {}
    rep_pairs = []  # per-rep (narrow, wide) efficiency — both levels of a
    # pair run back-to-back in the SAME host window, so the rep-matched
    # ratio is immune to the host-state drift that can pair a lucky
    # narrow from one window with a wide from another (observed: a
    # narrow child 12% faster AND a wide child 24% slower in the same
    # late window → min-pairing 0.692 where both rep-matched pairs read
    # 0.806 / 0.525). Both views are reported; neither is discarded.
    try:
        for rep in range(args.repeats):
            pair = {}
            for cores in (lo, hi):
                print(f"building at local[{cores}] (rep {rep}) ...", flush=True)
                r = run_child(cores, corpus_path, args.shards, args.chunks)
                print(f"local[{cores}] rep{rep}: {r}", flush=True)
                pair[cores] = r
                if cores not in results or r["build_sec"] < results[cores]["build_sec"]:
                    results[cores] = r
            rep_pairs.append(
                round((pair[hi]["docs_per_sec"] / pair[lo]["docs_per_sec"]) / 4.0, 3)
            )
    finally:
        shutil.rmtree(d, ignore_errors=True)

    print("measuring same-hour hardware ceiling ...", flush=True)
    ceil = mp_ceiling(lo, hi)
    eff = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / 4.0
    out = {
        "n_docs": args.docs,
        "n_shards": args.shards,
        "pair": [lo, hi],
        f"local{lo}": results[lo],
        f"local{hi}": results[hi],
        "scaling_efficiency": round(eff, 3),
        "rep_matched_efficiencies": rep_pairs,
        "mp_ceiling_same_hour": ceil,
        "spark_vs_ceiling": round(eff / ceil["ceiling_eff"], 3)
        if ceil["ceiling_eff"]
        else None,
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(out))

    os.makedirs("BENCH", exist_ok=True)
    stamp = time.strftime("%Y-%m-%d %H:%M")
    hdr_needed = not os.path.exists("BENCH/BASELINE.md")
    with open("BENCH/BASELINE.md", "a") as f:
        if hdr_needed:
            f.write(
                "# BENCH/BASELINE — measured scaling evidence\n\n"
                "Protocol: BASELINE.md 'Sandbox scaling protocol' + the\n"
                "docstring of scripts/bench_scaling.py (fresh process per\n"
                "level, heap proportional to cores, tmpfs storage) — same\n"
                "index build, same input; efficiency =\n"
                "(docs_per_sec@32 / docs_per_sec@8) / 4, target >= 0.8.\n\n"
                "| date | docs | shards | pair | local[N] docs/s | local[4N] docs/s | "
                "efficiency | q p50/p95 ms @N |\n|---|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {stamp} | {args.docs} | {args.shards} | {lo},{hi} | "
            f"{results[lo]['docs_per_sec']} | {results[hi]['docs_per_sec']} | "
            f"{out['scaling_efficiency']} (ceiling {ceil['ceiling_eff']}, "
            f"spark/ceiling {out['spark_vs_ceiling']}) | "
            f"{results[lo]['p50_ms']}/{results[lo]['p95_ms']} |\n"
        )


if __name__ == "__main__":
    main()
