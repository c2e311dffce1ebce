"""Hybrid lexical + vector retrieval — reciprocal-rank fusion (RRF)
of a BM25 top-N list and a cosine-ANN top-N list, plus metadata-
filtered kNN. The two surfaces every current-generation search engine
(Elasticsearch 8 `rrf`/`knn.filter`, OpenSearch hybrid query, Vespa)
serves next to plain BM25, re-expressed Spark-first.

Pinned semantics (the DuckDB mirrors in engine/driver_queries.py are
the oracles)
-----------------------------------------------------------------
- RRF (Cormack, Clarke & Buettcher, SIGIR 2009): each retriever
  contributes 1/(rrf_k + rank) for the docs in ITS top-``n_deep``
  list; docs missing from a list contribute 0 from it.

      rrf(d) = [d ∈ bm25 top-N] / (rrf_k + rank_bm25(d))
             + [d ∈ cos  top-N] / (rrf_k + rank_cos(d))

  with the standard rrf_k = 60. The two addends are computed and
  summed IN FIXED ORDER (bm25 + cosine) in both engines, so the float
  result is bit-reproducible; the rounded value is the sort key and
  ties break by doc_id ASC (engine-wide float discipline).
- The embeddings table's ``vec_id`` IS the corpus ``doc_id`` (the
  driver testdata pins this 1:1; a production deployment stores the
  doc key in the vector table the same way).
- Filtered kNN uses PRE-filter semantics (ES ``knn.filter``): the
  metadata predicate restricts the candidate set BEFORE scoring, so
  the query returns exactly k matching docs (post-filtering a top-k
  can return fewer — the documented ES trade-off this avoids).

Scale shape
-----------
Both input lists are top-N cuts (TakeOrderedAndProject in the
exhaustive path; the block-max WAND kernel + bucketed ANN in the
indexed path), so the fusion itself is a full-outer join of two
N-row frames — driver-trivial at any corpus size; the retrieval cost
is each retriever's own (already measured) cost. Filtered kNN is a
broadcast semi-join of the filter's doc_ids onto the vector scan —
at IVF scale the cell pruning composes with the filter join
unchanged (the filter does not disturb partition pruning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

RRF_K = 60
N_DEEP = 50
ROUND = 6


def _rrf_fuse(bm25: DataFrame, cos: DataFrame, k: int, rrf_k: int) -> DataFrame:
    """Fuse two (rank, doc_id, …) lists; fixed bm25+cos addend order."""
    b = bm25.select("doc_id", F.col("rank").alias("rb"))
    c = cos.select(F.col("vec_id").alias("doc_id"), F.col("rank").alias("rc"))
    fused = (
        b.join(c, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(
                F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rb")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rc")), F.lit(0.0)),
                ROUND,
            ).alias("rrf"),
        )
    )
    topk = fused.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "rank", "doc_id", "rrf"
    )


def rrf_hybrid_topk(
    spark: SparkSession,
    corpus: DataFrame,
    emb: DataFrame,
    query: str,
    qvec: list[float],
    k: int = 10,
    *,
    n_deep: int = N_DEEP,
    rrf_k: int = RRF_K,
    use_stem: bool = False,
) -> DataFrame:
    """(rank, doc_id, rrf) — recompute path: exhaustive BM25 top-n_deep
    fused with brute-force cosine top-n_deep. DuckDB mirror:
    engine/driver_queries.rrf_hybrid_sql."""
    from .query import bm25_topk_exhaustive
    from .sim import cosine_topk

    bm25 = bm25_topk_exhaustive(
        spark, corpus, query, n_deep, use_stem=use_stem, round_scores=ROUND
    )
    cos = cosine_topk(emb, qvec, n_deep)
    return _rrf_fuse(bm25, cos, k, rrf_k)


def rrf_hybrid_from_index(
    reader,
    emb: DataFrame,
    query: str,
    qvec: list[float],
    k: int = 10,
    *,
    n_deep: int = N_DEEP,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Indexed twin: the BM25 list comes from the block-max WAND kernel
    (rank-identical to the exhaustive list by the engine's standing
    rank-safety contract), the cosine list from the same brute oracle
    path — at scale swap in ivf_topk_indexed; RRF consumes ranks, so
    any rank-identical retriever pair serves. Same oracle as
    rrf_hybrid_topk."""
    from .sim import cosine_topk

    bm25 = reader.bm25_topk(query, n_deep, prune=True, round_scores=ROUND)
    cos = cosine_topk(emb, qvec, n_deep)
    return _rrf_fuse(bm25, cos, k, rrf_k)


def cosine_filtered_topk(
    emb: DataFrame,
    meta: DataFrame,
    qvec: list[float],
    k: int = 20,
    *,
    lang: str | None = None,
    repo: str | None = None,
) -> DataFrame:
    """(rank, vec_id, cos) — PRE-filtered kNN: restrict the vector scan
    to docs passing the metadata predicate (semi-join on
    vec_id == doc_id), THEN exact cosine top-k, so exactly k matching
    docs return. ``meta`` carries (doc_id, lang[, repo]) — the corpus
    metadata projection or an index's doc_stats doc-values frame.
    DuckDB mirror: engine/sim.cosine_filtered_sql."""
    from .sim import cosine_topk

    keep = meta.select(F.col("doc_id").alias("vec_id"), *(
        [F.col("lang")] if lang is not None else []
    ), *([F.col("repo")] if repo is not None else []))
    if lang is not None:
        keep = keep.where(F.col("lang") == lang)
    if repo is not None:
        keep = keep.where(F.col("repo") == repo)
    cand = emb.join(F.broadcast(keep.select("vec_id")), "vec_id", "semi")
    return cosine_topk(cand, qvec, k)
