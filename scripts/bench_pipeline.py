"""Hygiene/pipeline-operator throughput at serving scale (1.2 M docs).

The sf0.1 bench exercises these ops at 5 000 docs; this harness times
them on the same 1.2 M-doc generated corpus the serving-latency tables
use (fixtures.gen_corpus, multi-file parquet in tmpfs), so
BENCH/BASELINE.md can show the 240x scale-up holds the linear shapes
claimed in each operator's docstring.

Usage:
    python scripts/bench_pipeline.py [--docs 1200000] [--cpus 32]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_200_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--steps", default="", help="comma list; default all")
    args = ap.parse_args()

    # local mode = ONE JVM: the 8g default heap dies in hygiene_keep's
    # clustering stage at 1.2M docs (GCLocker alloc failures, then the
    # JVM is killed). Must be set before the session starts.
    os.environ.setdefault("SPARK_DRIVER_MEM", "48g")

    import pyarrow as pa
    import pyarrow.parquet as pq

    from fixtures.gen_corpus import gen_corpus

    d = tempfile.mkdtemp(prefix="pipe_corpus_", dir=SHM)
    try:
        print(f"generating {args.docs} docs ...", flush=True)
        pdf = gen_corpus(args.docs)
        per = (len(pdf) + args.files - 1) // args.files
        for i in range(args.files):
            part = pdf.iloc[i * per : (i + 1) * per]
            if len(part):
                pq.write_table(
                    pa.Table.from_pandas(part, preserve_index=False),
                    os.path.join(d, f"part-{i:04d}.parquet"),
                )
        del pdf

        from pyspark.sql import functions as F

        from engine.cluster import dedup_canonical, dup_clusters, hygiene_keep
        from engine.decontam import decontaminate
        from engine.dedup import dup_ngram_stats
        from engine.io import read_corpus, with_identity
        from engine.lm import lm_score
        from engine.sampling import chunk_plan, source_mix_weights
        from engine.session import get_spark

        spark = get_spark("pipeline_bench", cores=args.cpus)
        corpus = (
            with_identity(read_corpus(spark, d))
            .select("doc_id", "content", F.col("repo").alias("source"))
        )
        n = corpus.count()  # warm the scan outside the timed window
        print(f"corpus ready: {n} docs", flush=True)

        def _clusters(c):
            from engine.dedup import minhash_candidate_edges

            return dup_clusters(c, minhash_candidate_edges(c))

        from engine.build import tokens_df
        from engine.pii import pii_redact
        from engine.sketch import cms_heavy_hitters, hll_distinct
        from engine.textops import token_budget

        def _hll():
            sha = corpus.select(
                F.sha2(F.coalesce(F.col("content"), F.lit("")), 256)
                .alias("sha")
            )
            return hll_distinct(sha, "sha")

        def _cms():
            toks = tokens_df(corpus, use_stem=False)
            return cms_heavy_hitters(
                toks, ["index", "merge", "partition", "query"]
            )

        steps = {
            # sketch family at 1.2 M docs (round-5: every 100 TB claim
            # gets an up-scale row — r4 VERDICT #7); kmv + the agg
            # twins are index-backed and measured in bench_serving.py
            # projection-only ops forced through a checksum aggregate —
            # a bare count() row-counts off parquet metadata without
            # evaluating the regexp columns (measured 0.2 s "for" 1.2 M
            # redactions, i.e. nothing ran)
            "hll_distinct": _hll,
            "cms_heavy_hitters": _cms,
            "pii_redact": lambda: pii_redact(corpus).agg(
                F.sum("n_pii"), F.sum(F.length("redacted"))
            ),
            "token_budget": lambda: token_budget(corpus).agg(
                F.sum("n_ws"), F.sum("n_bpe"), F.sum("n_words")
            ),
            "decontaminate": lambda: decontaminate(corpus),
            "lm_score": lambda: lm_score(corpus),
            "dup_ngram_stats": lambda: dup_ngram_stats(corpus),
            "chunk_plan": lambda: chunk_plan(corpus),
            "source_mix_weights": lambda: source_mix_weights(corpus),
            "hygiene_keep": lambda: hygiene_keep(corpus),
            "dup_clusters": lambda: _clusters(corpus),
            "minhash_pairs": lambda: __import__(
                "engine.dedup", fromlist=["minhash_candidate_pairs"]
            ).minhash_candidate_pairs(corpus),
            "dedup_canonical": lambda: dedup_canonical(corpus, _clusters(corpus)),
        }
        if args.steps:
            want = {s.strip() for s in args.steps.split(",")}
            steps = {k: v for k, v in steps.items() if k in want}
        out = {}
        for name, mk in steps.items():
            t = time.perf_counter()
            c = mk().count()
            out[name] = {
                "sec": round(time.perf_counter() - t, 2),
                "rows": c,
                "docs_per_sec": round(n / (time.perf_counter() - t), 1),
            }
            print(name, out[name], flush=True)
        print(json.dumps({"n_docs": n, "cpus": args.cpus, "steps": out}))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
