"""Large-corpus serving-latency evidence: every index-backed surface
measured on a 1.2 M-doc index (sf0.1's 5 000-doc bench is job-launch
bound; this shows the artifact-only serving paths at 240× that corpus).

Builds one full-featured index (positions + docstore) on tmpfs at
local[N], then times each IndexReader surface warm (one untimed warmup
of the BM25 path to materialize the postings/dictionary cache). Prints
one JSON line and appends a section to BENCH/BASELINE.md.

Usage: python scripts/bench_serving.py [--docs 1200000] [--cores 32]
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
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--shards", type=int, default=256)
    args = ap.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.index import IndexReader, build_index
    from engine.io import read_corpus, with_identity
    from engine.session import get_spark
    from fixtures.gen_corpus import gen_corpus

    d = tempfile.mkdtemp(prefix="serv_corpus_", dir=SHM)
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

    local_dir = tempfile.mkdtemp(prefix="serv_local_", dir=SHM)
    spark = get_spark(
        "bench_serving",
        cores=args.cores,
        extra_conf={
            "spark.local.dir": local_dir,
            "spark.sql.files.maxPartitionBytes": "16m",
        },
    )
    corpus = with_identity(read_corpus(spark, corpus_path))
    idx_dir = tempfile.mkdtemp(prefix="serv_idx_", dir=SHM)
    t: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        # unstemmed so the suggest-family surfaces (fuzzy/wildcard/MLT/
        # boolean) are all servable from the same artifacts
        build_index(
            spark, corpus, idx_dir, use_stem=False,
            n_shards=args.shards, n_chunks=2,
            with_positions=True, with_docstore=True, with_fields=True,
        )
        t["index_build"] = round(time.perf_counter() - t0, 2)

        reader = IndexReader(spark, idx_dir, cache=True)
        reader.bm25_topk("inverted index compression", 10).collect()  # warm

        def timed(name, fn):
            t0 = time.perf_counter()
            n = len(fn().collect())
            t[name] = round(time.perf_counter() - t0, 3)
            print(f"{name}: {t[name]} s ({n} rows)", flush=True)

        # Vocabulary-true queries (2026-08-18 fix): the historical
        # query "inverted index compression" matched the fixture vocab
        # only on the hot term "index" — phrase/proximity/fuzzy/
        # wildcard/snippets were timing EMPTY results, and every other
        # surface was effectively a 1-hot-term query. These terms all
        # exist in fixtures/gen_corpus.py's vocabulary and co-occur
        # (~30% of docs contain all of q's terms), so each surface now
        # measures real result assembly; numbers before/after this fix
        # are not comparable.
        q = "index merge partition"
        timed("bm25_wand", lambda: reader.bm25_topk(q, 10))
        timed("bm25_batch_4q", lambda: reader.bm25_topk_batch(
            {f"q{i}": s for i, s in enumerate(
                [q, "shuffle partition join", "query engine index",
                 "vectorized decode buffer"]
            )}, 10))
        timed("tfidf", lambda: reader.tfidf_topk(q, 10))
        timed("title", lambda: reader.title_topk("index merge", 100))
        timed("fusion_2sig", lambda: reader.fusion_topk(q, 10))
        reader.fusion_pv_topk(q, 10).collect()  # warm prior artifacts +
        # prior-top caches + let the adaptive TA dispatch settle
        timed("fusion_3sig", lambda: reader.fusion_pr_topk(q, 10))
        timed("fusion_4sig", lambda: reader.fusion_pv_topk(q, 10))
        timed("phrase", lambda: reader.phrase_topk("index merge", 20))
        timed("proximity", lambda: reader.proximity_topk(q, 20))
        timed("boolean", lambda: reader.boolean_topk(
            must="index merge", should="broadcast varint", must_not="zebra", k=20))
        timed("fuzzy_suggest", lambda: reader.fuzzy_terms("merg", 10))
        timed("wildcard", lambda: reader.wildcard_topk("str", 10, 8))
        timed("snippets", lambda: reader.snippet_topk(q, 10))
        timed("more_like_this", lambda: reader.more_like_this(10, 5))
        timed("filtered", lambda: reader.filtered_topk(q, 10, repo="org1/repo1"))
        timed("hit_counts_4q", lambda: reader.hit_counts(
            {f"q{i}": s for i, s in enumerate(
                [q, "posting list merge", "query scan", "distributed merge sort"]
            )}))
        # round-4 session-5: KMV sketch artifact + approximate total
        # hits (postings untouched at query time — the header cost is
        # independent of match count)
        t0 = time.perf_counter()
        reader.kmv_sketches_df().count()
        t["kmv_artifact_build"] = round(time.perf_counter() - t0, 3)
        print(f"kmv_artifact_build: {t['kmv_artifact_build']} s", flush=True)
        timed("hit_counts_approx_4q", lambda: reader.hit_counts_approx(
            {f"q{i}": s for i, s in enumerate(
                [q, "posting list merge", "query scan", "distributed merge sort"]
            )}))
        # round-4 additions: query-string front door, field collapsing,
        # cursor paging, explain, two-phase rescore, field sort
        timed("qstring", lambda: reader.query_string_topk(
            'index merge -zebra "index merge"', 10))
        timed("collapse", lambda: reader.collapse_topk(q, 10))
        cur = reader.bm25_topk(q, 10, round_scores=6).collect()[-1]
        timed("search_after_p2", lambda: reader.search_after(
            q, cur["score"], cur["doc_id"], 10, round_scores=6))
        timed("paged_p2_fromsize", lambda: reader.bm25_topk_paged(
            q, 10, offset=10, round_scores=6))

        from engine.explain import explain_from_index
        from engine.rescore import rescore_from_index
        from engine.sortby import match_sorted_from_index

        timed("explain", lambda: explain_from_index(reader, q, 10))
        timed("rescore", lambda: rescore_from_index(
            reader, q, "index merge", 10))
        timed("match_sorted", lambda: match_sorted_from_index(
            reader, "index merge", 10, by="repo"))

        from engine.synonyms import synonym_topk_from_index

        timed("synonyms", lambda: synonym_topk_from_index(
            reader, q, {"merge": ["merge", "compaction"]}, 10))

        # round-4 session-3 additions: regexp, did-you-mean, index
        # stats, and the modifier family (now TA-served with exhaustive
        # fallback — function_score/fvf time IndexReader's real serving
        # path, candidates from the pruned kernel certified by the
        # θ_b·f_max bound, not a hand-rolled exhaustive plan)
        from pyspark.sql import functions as F

        timed("regexp", lambda: reader.regexp_topk("st[a-z]*m", 10, 8))
        timed("did_you_mean", lambda: reader.did_you_mean(
            "indxe merg partiton"))
        timed("index_stats", lambda: reader.stats_df())

        # the modifier field as a MATERIALIZED metadata column — the
        # 100 TB deployment shape (a doc_stats-like stored column, not
        # a per-query derivation over content); cache+count so the
        # timings measure the serving path, not corpus re-reads
        fs_meta = corpus.select(
            "doc_id", F.length("content").cast("long").alias("n_chars")
        ).cache()
        fs_meta.count()
        timed("function_score", lambda: reader.function_score_topk(
            q, fs_meta, 10, value_col="n_chars",
            origin=300.0, scale=150.0, decay=0.5,
        ))
        # near-flat decay: the factor envelope passes the dispatch gate
        # and the TA bound certifies — the regime modifier TA exists for
        timed("function_score_flat", lambda: reader.function_score_topk(
            q, fs_meta, 10, value_col="n_chars",
            origin=300.0, scale=1e6, decay=0.5,
        ))
        timed("fvf", lambda: reader.field_value_factor_topk(
            q, fs_meta, 10, value_col="n_chars", factor=1.0))
        timed("mlt_text", lambda: reader.mlt_text(
            "index merge partition scan", 10, 5))
        timed("msm", lambda: reader.msm_topk(q, 10, min_should_match=2))
        timed("boosting", lambda: reader.boosting_topk(
            q, "merge", 10, negative_boost=0.5))

        # round-4c additions: typo-tolerant BM25 + trailing-prefix phrase
        timed("fuzzy_match", lambda: reader.fuzzy_match_topk(
            "indxe merge partiton", 10))
        timed("phrase_prefix", lambda: reader.match_phrase_prefix_topk(
            "index mer", 20))

        # round-5: fielded serving from the stage-9 title_postings
        # artifact (VERDICT weak #1 — target ≤ ~1.5x bm25_wand) ...
        timed("bm25f_indexed", lambda: reader.bm25f_topk(
            q, 10, round_scores=6))
        timed("dismax_indexed", lambda: reader.dismax_topk(
            q, 10, round_scores=6))
        timed("most_fields_indexed", lambda: reader.most_fields_topk(
            q, 10, round_scores=6))
        # ... and index-served aggs (VERDICT weak #2): posting-block
        # match set + doc_stats doc-values, no corpus access
        from engine.aggs import (
            adjacency_matrix_from_index,
            cardinality_from_index,
            composite_from_index,
            filters_from_index,
            histogram_from_index,
            percentiles_from_index,
            range_stats_from_index,
            top_hits_from_index,
        )

        timed("range_agg_indexed", lambda: range_stats_from_index(
            reader, q, "n_chars", [0, 200, 400, 800, 1600]))
        timed("histogram_indexed", lambda: histogram_from_index(
            reader, q, "n_chars", 200))
        timed("cardinality_indexed", lambda: cardinality_from_index(
            reader, q, "lang"))
        timed("percentiles_indexed", lambda: percentiles_from_index(
            reader, q, "n_chars", [0.25, 0.5, 0.75, 0.95]))
        timed("top_hits_indexed", lambda: top_hits_from_index(
            reader, q, "lang", 3, 5))
        timed("composite_indexed", lambda: composite_from_index(
            reader, q, ["lang", "repo"], 12))
        timed("filters_indexed", lambda: filters_from_index(
            reader, {"scans": "index scan", "merges": "merge sort",
                     "misses": "zzznotaterm"}))
        timed("adjacency_indexed", lambda: adjacency_matrix_from_index(
            reader, {"idx": "index", "mrg": "merge", "prt": "partition"}))
    finally:
        spark.stop()
        shutil.rmtree(idx_dir, ignore_errors=True)
        shutil.rmtree(local_dir, ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)

    out = {
        "metric": "serving_latency_1p2m",
        "n_docs": args.docs,
        "cores": args.cores,
        "timings_sec": t,
    }
    print(json.dumps(out))
    stamp = time.strftime("%Y-%m-%d %H:%M")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n## Serving latency at {args.docs} docs "
            f"(local[{args.cores}], {stamp}, warm cache)\n\n"
            "| surface | sec |\n|---|---|\n"
            + "".join(f"| {k} | {v} |\n" for k, v in t.items())
        )


if __name__ == "__main__":
    main()
