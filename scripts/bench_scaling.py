"""N-vs-4N scaling-efficiency evidence (BASELINE.md sandbox protocol).

Runs the SAME index build on the SAME generated corpus at local[8] and
local[32] (separate SparkSessions, sequential), reports docs/sec at
both and efficiency = (tput@32 / tput@8) / 4. Also measures query
latency p50/p95 at local[8]. Appends a dated results table to
BENCH/BASELINE.md.

    python scripts/bench_scaling.py [--docs 200000] [--repeat-queries 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _stop_spark():
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    # a new local[N] master requires a fresh JVM context; give the old one a beat
    time.sleep(2)


def build_at(cores: int, corpus_path: str, n_shards: int, n_chunks: int) -> tuple[float, int, dict]:
    from engine.session import get_spark
    from engine.io import read_corpus, with_identity
    from engine.index import build_index

    spark = get_spark(f"scaling_{cores}", cores=cores)
    corpus = with_identity(read_corpus(spark, corpus_path))
    n_docs = corpus.count()  # warm the scan outside the timed window
    idx_dir = tempfile.mkdtemp(prefix=f"scaling_idx_{cores}_")
    t = time.perf_counter()
    reader = build_index(
        spark, corpus, idx_dir, use_stem=True, n_shards=n_shards, n_chunks=n_chunks
    )
    dt = time.perf_counter() - t

    # query latencies on the build we just did
    import pathlib, json as _json

    queries = _json.loads(
        (pathlib.Path(__file__).parent.parent / "fixtures" / "queries.json").read_text()
    )
    lat = []
    for q in queries[:15]:
        t0 = time.perf_counter()
        reader.bm25_topk(q["text"], 10).collect()
        lat.append(time.perf_counter() - t0)
    qstats = {
        "p50_ms": round(statistics.median(lat) * 1e3, 1),
        "p95_ms": round(sorted(lat)[int(0.95 * len(lat)) - 1] * 1e3, 1),
    }
    shutil.rmtree(idx_dir, ignore_errors=True)
    _stop_spark()
    return dt, n_docs, qstats


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--chunks", type=int, default=2)
    args = ap.parse_args()

    from fixtures.gen_corpus import gen_corpus
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="scaling_corpus_")
    corpus_path = os.path.join(d, "corpus.parquet")
    print(f"generating {args.docs} docs ...", flush=True)
    # row_group_size keeps the file splittable — pyarrow's default (1M
    # rows) would hand Spark a single unsplittable row group
    pq.write_table(
        pa.Table.from_pandas(gen_corpus(args.docs), preserve_index=False),
        corpus_path,
        row_group_size=4096,
    )

    results = {}
    for cores in (8, 32):
        print(f"building at local[{cores}] ...", flush=True)
        dt, n_docs, qstats = build_at(cores, corpus_path, args.shards, args.chunks)
        results[cores] = {
            "build_sec": round(dt, 2),
            "docs_per_sec": round(n_docs / dt, 1),
            **qstats,
        }
        print(f"local[{cores}]: {results[cores]}", flush=True)

    eff = (results[32]["docs_per_sec"] / results[8]["docs_per_sec"]) / 4.0
    out = {
        "n_docs": args.docs,
        "n_shards": args.shards,
        "local8": results[8],
        "local32": results[32],
        "scaling_efficiency": round(eff, 3),
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
                "Protocol: BASELINE.md 'Sandbox scaling protocol' — same index\n"
                "build, same input, local[8] vs local[32]; efficiency =\n"
                "(docs_per_sec@32 / docs_per_sec@8) / 4, target >= 0.8.\n\n"
                "| date | docs | shards | local[8] docs/s | local[32] docs/s | "
                "efficiency | q p50/p95 ms @8 |\n|---|---|---|---|---|---|---|\n"
            )
        f.write(
            f"| {stamp} | {args.docs} | {args.shards} | "
            f"{results[8]['docs_per_sec']} | {results[32]['docs_per_sec']} | "
            f"{out['scaling_efficiency']} | "
            f"{results[8]['p50_ms']}/{results[8]['p95_ms']} |\n"
        )
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
